import sys, os
sys.path.insert(0, "/root/repo/scripts"); sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
import jax.numpy as jnp
from bench import K, _timed
from prof_bg_stem import scan_loop
print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)
def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
for shape, lbl in [((8, 128), "tiny_8x128"), ((16, 64, 128), "small_128K"),
                   ((16, 512, 1024), "copy_33MB"), ((16, 512, 2048), "copy_67MB")]:
    x = jnp.asarray(rng.rand(*shape).astype(np.float32))
    timed("addconst_" + lbl, lambda x, s: x + 0.001 * s, (x,))
# reduce variant: full sum instead of strided pick (isolates the gather)
def scan_loop_fullsum(body, k=K):
    @jax.jit
    def run(x, salt):
        def step(c, i):
            out = body(x, i + salt)
            return c + out.astype(jnp.float32).sum(), ()
        return jax.lax.scan(step, jnp.float32(0), jnp.arange(k, dtype=jnp.float32))[0]
    return run
x = jnp.asarray(rng.rand(16, 512, 1024).astype(np.float32))
r = _timed(scan_loop_fullsum(lambda x, s: x + 0.001 * s), (x,), K)
print("addconst_33MB_fullsum", round(r * 1e3, 3), flush=True)
print("DONE", flush=True)
