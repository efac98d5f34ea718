"""Stable vs unstable lax.sort at z-buffer shapes.

The fused-program trace shows each 2-operand packed-z-buffer sort
emitting THREE s32[2097152] arrays: XLA lowers is_stable=True (the
lax.sort default) by appending an iota tiebreaker operand — +50% sort
traffic. The packed z-buffer doesn't need stability: entries tied on
(group, packed key) are bit-interchangeable (the payload IS the key),
so the min-canvas is order-independent.

    python scripts/prof_sort_stability.py
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import K, _timed
from prof_common import scan_loop

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)
N = 2 * 1024 * 1024

g = jnp.asarray(rng.randint(0, 4 * N, N).astype(np.int32))
k = jnp.asarray(rng.randint(0, 1 << 30, N).astype(np.int32))


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


timed("sort_stable", lambda x, s: jax.lax.sort(
    (x + s.astype(jnp.int32), k), num_keys=2), (g,))
timed("sort_unstable", lambda x, s: jax.lax.sort(
    (x + s.astype(jnp.int32), k), num_keys=2, is_stable=False), (g,))

# canvas-level equivalence on a real collision-heavy stream: min per
# group of the packed key must be identical regardless of stability.
gs, ks = jax.jit(lambda: jax.lax.sort((g, k), num_keys=2))()
gu, ku = jax.jit(
    lambda: jax.lax.sort((g, k), num_keys=2, is_stable=False)
)()
print("sorted pairs identical:",
      bool((np.asarray(gs) == np.asarray(gu)).all()
           and (np.asarray(ks) == np.asarray(ku)).all()), flush=True)
