"""Split the stem kernel cost: A-build vs MXU dot vs IO.

    python scripts/prof_stem_kernel2.py
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import H, W, K, _timed
from prof_common import scan_loop
from panoptic_forecasting_tpu.kernels.stem import onehot_stem_conv

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)

seg = jnp.asarray(rng.randint(0, 14, (1, 3, H, W)).astype(np.int32))
dep = jnp.asarray(rng.randn(1, 3, H, W).astype(np.float32))
kern = jnp.asarray(rng.randn(3, 3, 36, 16).astype(np.float32) * 0.2)
bias = jnp.asarray(rng.randn(16).astype(np.float32))


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


for skip in ("dot", "build", "none"):
    def run(x, s, skip=skip):
        sg = (x[0] + s.astype(jnp.int32)) % 14
        dp = x[1] + 0.001 * s
        return onehot_stem_conv(
            sg, dp, kern, bias, num_classes=11,
            debug_skip=skip if skip != "none" else "",
        )
    timed(f"stem_skip_{skip}", run, ((seg, dep),))

# no-depth variant: 2/3 fewer small row copies in the build
def run_nd(x, s):
    sg = (x[0] + s.astype(jnp.int32)) % 14
    return onehot_stem_conv(
        sg, None, kern[:, :, :33, :], bias, num_classes=11
    )
timed("stem_nodepth", run_nd, ((seg, dep),))
print("DONE", flush=True)
