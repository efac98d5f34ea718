import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
import jax.numpy as jnp
from bench import K, _timed
from prof_common import scan_loop
print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(16, 512, 2048).astype(np.float32))
def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
timed("lane_stride2_slice_67MB", lambda x, s: (x + 0.001 * s)[:, :, 0::2], (x,))
x2 = jnp.asarray(rng.rand(16, 512, 1024).astype(np.float32))
timed("copy_33MB_ref", lambda x, s: x + 0.001 * s, (x2,))
# the planned post-op: (B,c_out,H2,W) -> even cols -> transpose NHWC
timed("slice_then_nhwc", lambda x, s: (x + 0.001 * s)[None, :, :, 0::2].transpose(0, 2, 3, 1), (x,))
# reference: plain NCHW->NHWC transpose at half width
timed("nhwc_transpose_33MB", lambda x, s: (x + 0.001 * s)[None].transpose(0, 2, 3, 1), (x2,))
print("DONE", flush=True)
