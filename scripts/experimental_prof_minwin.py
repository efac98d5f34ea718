"""place_minwin vs sort+place_sorted on realistic 6.3M streams.

    python scripts/prof_minwin.py
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
from panoptic_forecasting_tpu.kernels.experimental.minwin import place_minwin
from panoptic_forecasting_tpu.kernels.placement import place_sorted

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)

# Raster-coherent unsorted stream shaped like the pc z-buffer's:
# 3 frames x 2.1M entries, groups drift monotonically with +-300 jitter
# (projection locality), ~1.5% border-pile jumps, 10% duplicates.
H, W = 1024, 2048
P = H * W
N = 3 * P
G = 3 * P  # one canvas per frame (disjoint planes)
parts = []
for f in range(3):
    base = np.linspace(0, P - 400, P).astype(np.int64)
    g = np.clip(base + rng.randint(-300, 300, P), 0, P - 1)
    pile = rng.rand(P) < 0.015
    g = np.where(pile, rng.randint(0, W, P), g)
    parts.append(g + f * P)
group_np = np.concatenate(parts).astype(np.int32)
key_np = rng.randint(0, 2**30, N).astype(np.int32)
group = jnp.asarray(group_np)
key = jnp.asarray(key_np)


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


PK = dict(plane_size=P, pile_width=2 * W)

# correctness on-device vs sorted reference
canvas_mw, ov = place_minwin(group, key, num_groups=G, **PK)
order = np.lexsort((key_np, group_np))
gs = jnp.asarray(group_np[order])
ks = jnp.asarray(key_np[order])
canvas_ps = place_sorted(gs, ks, num_groups=G)
eq = int(jnp.sum(canvas_mw != canvas_ps))
print("overflow:", int(ov), "mismatches:", eq, flush=True)

# minwin on the raw (unsorted) stream — includes chunk-list build
timed("minwin_unsorted",
      lambda x, s: place_minwin(
          x[0], x[1] + s.astype(jnp.int32) % 7, num_groups=G, **PK)[0],
      ((group, key),))

# v2: per-frame sorts + place_sorted (the current production path)
def sorted_path(x, s):
    g, k = x[0], x[1] + s.astype(jnp.int32) % 7
    g2 = g.reshape(3, P)
    k2 = k.reshape(3, P)
    parts = [jax.lax.sort((g2[i], k2[i]), num_keys=2) for i in range(3)]
    return place_sorted(
        jnp.concatenate([p[0] for p in parts]),
        jnp.concatenate([p[1] for p in parts]),
        num_groups=G, runs=3,
    )


timed("sort3_place_sorted", sorted_path, ((group, key),))

# minwin on the PRE-SORTED stream (isolates kernel core vs v2 kernel)
timed("minwin_on_sorted",
      lambda x, s: place_minwin(
          x[0], x[1] + s.astype(jnp.int32) % 7, num_groups=G, **PK)[0],
      ((gs, ks),))
timed("place_sorted_only",
      lambda x, s: place_sorted(
          x[0], x[1] + s.astype(jnp.int32) % 7, num_groups=G),
      ((gs, ks),))

# tuning sweep on the unsorted stream
for blk in (2048, 4096, 8192):
    for win in (256, 384, 512):
        timed(f"minwin_blk{blk}_win{win}",
              lambda x, s, b=blk, w=win: place_minwin(
                  x[0], x[1] + s.astype(jnp.int32) % 7,
                  num_groups=G, block=b, win=w, **PK)[0],
              ((group, key),))
print("DONE", flush=True)

# debug bisect on the sorted stream
for mode in ("nofix", "alwaysfix"):
    timed(f"minwin_sorted_{mode}",
          lambda x, s, m=mode: place_minwin(
              x[0], x[1] + s.astype(jnp.int32) % 7, num_groups=G,
              debug_mode=m, **PK)[0],
          ((gs, ks),))
print("DONE2", flush=True)
