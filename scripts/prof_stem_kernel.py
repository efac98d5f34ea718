"""Time the fused Pallas stem kernel vs the XLA assembly+conv (8.4 ms).

    python scripts/prof_stem_kernel.py
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
from panoptic_forecasting_tpu.kernels.stem import (
    onehot_stem_conv, stem_reference,
)

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


# correctness on-device first
ref = stem_reference(seg, dep, kern, bias, num_classes=11)
got = onehot_stem_conv(seg, dep, kern, bias, num_classes=11)
print("maxerr", float(jnp.max(jnp.abs(ref - got))), flush=True)


def run(x, s):
    sg = (x[0] + s.astype(jnp.int32)) % 14
    dp = x[1] + 0.001 * s
    return onehot_stem_conv(sg, dp, kern, bias, num_classes=11)


timed("stem_kernel", run, ((seg, dep),))


def run_ref(x, s):
    sg = (x[0] + s.astype(jnp.int32)) % 14
    dp = x[1] + 0.001 * s
    return stem_reference(sg, dp, kern, bias, num_classes=11)


timed("stem_xla_ref", run_ref, ((seg, dep),))

# sweep block/slab tunables
for bh in (8, 16, 32):
    for r in (1, 2, 4):
        if bh % r:
            continue

        def run_t(x, s, bh=bh, r=r):
            sg = (x[0] + s.astype(jnp.int32)) % 14
            dp = x[1] + 0.001 * s
            return onehot_stem_conv(
                sg, dp, kern, bias, num_classes=11,
                block_rows=bh, slab_rows=r,
            )

        timed(f"stem_kernel_bh{bh}_r{r}", run_t, ((seg, dep),))
print("DONE", flush=True)
