"""pc stage decomposition + placement tuning sweep on realistic streams.

Round-4 target: pc_stage_ms <= 16 (VERDICT r03 #2). This measures, on the
SAME projected stream shapes bench.py uses (3x1024x2048 per-frame
canvases), the three pc sub-costs in isolation:

  a) project+key build (backproject -> ego transform -> project -> pack)
  b) the 3 per-frame lax.sorts
  c) place_sorted at several (block, sub, win) configs

plus the full per-frame pc stage for cross-checking against bench.py.

    python scripts/prof_place_sweep.py
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import H, W, T_IN, INTR, K, _timed
from prof_common import scan_loop
from panoptic_forecasting_tpu.geometry import (
    backproject_pixels,
    project_points,
    unicycle_now_T_prev,
)
from panoptic_forecasting_tpu.geometry.camera import pixel_grid, transform_points
from panoptic_forecasting_tpu.kernels.placement import place_sorted
from panoptic_forecasting_tpu.kernels.zbuffer import _depth_sort_bits

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)

depth = jnp.asarray(rng.rand(T_IN, H, W).astype(np.float32) * 50 + 2)
seg = jnp.asarray(rng.randint(0, 19, size=(T_IN, H, W)).astype(np.int32))
speeds = jnp.asarray(np.array([8.0, 8.2, 8.4], np.float32))
yaws = jnp.asarray(np.array([0.01, 0.0, -0.01], np.float32))
P = H * W


def project_and_key(depth, salt):
    """Stage (a): everything before the sort, per-frame group layout."""
    d = depth + 0.001 * salt
    uv0 = pixel_grid(H, W)
    Ts = unicycle_now_T_prev(speeds, yaws, 0.18)
    pts = backproject_pixels(uv0[None], d, INTR)
    pts = jax.vmap(transform_points)(
        Ts.astype(jnp.float32), pts.reshape(T_IN, -1, 3)
    )
    uv, z = project_points(pts, INTR)
    dbits = _depth_sort_bits(z)
    key = (dbits & jnp.int32(~0xFF)) | (seg.reshape(T_IN, -1) & 0xFF)
    uf = jnp.floor(uv[..., 0])
    vf = jnp.floor(uv[..., 1])
    gu = (jnp.ceil(uv[..., 0]) != uf).astype(jnp.int32)
    gv = (jnp.ceil(uv[..., 1]) != vf).astype(jnp.int32)
    ui = uf.astype(jnp.int32)
    vi = vf.astype(jnp.int32)
    cu0 = jnp.clip(ui, 0, W - 1)
    cv0 = jnp.clip(vi, 0, H - 1)
    fu = jnp.clip(ui + gu, 0, W - 1) - cu0
    fv = jnp.clip(vi + gv, 0, H - 1) - cv0
    group = (fv * 2 + fu) * P + (cv0 * W + cu0)
    group = group + (jnp.arange(T_IN, dtype=jnp.int32) * (4 * P))[:, None]
    return group, key


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


timed("a_project_key", project_and_key, (depth,))


def sorts(depth, salt):
    group, key = project_and_key(depth, salt)
    parts = [
        jax.lax.sort((group[i], key[i]), num_keys=2) for i in range(T_IN)
    ]
    return tuple(p[0] for p in parts) + tuple(p[1] for p in parts)


timed("ab_project_key_sorts", sorts, (depth,))

# Pre-sorted static stream for placement-only sweeps (salt perturbs the
# KEYS only — groups stay sorted, placement work is unchanged, and the
# perturbation defeats scan hoisting).
group, key = project_and_key(depth, np.float32(0))
parts = [jax.lax.sort((group[i], key[i]), num_keys=2) for i in range(T_IN)]
g_s = jnp.concatenate([p[0] for p in parts])
k_s = jnp.concatenate([p[1] for p in parts])


def place_cfg(**cfg):
    def body(k_in, salt):
        k2 = jnp.abs(k_in + (salt.astype(jnp.int32) << 8))
        return place_sorted(
            g_s, k2, num_groups=T_IN * 4 * P, runs=T_IN, disjoint=True,
            **cfg,
        )
    return body


import itertools

cfgs = [
    (4096, 128, 384, 65536),   # shipped default
    (4096, 128, 256, 65536),
    (4096, 256, 384, 65536),
    (8192, 128, 384, 65536),
    (2048, 128, 384, 65536),
    (4096, 128, 512, 65536),
    # Round-4: doubled supertiles (10-bit window offsets) — fewer
    # chunks and fewer block-boundary revisits.
    (4096, 128, 384, 131072),
    (2048, 128, 384, 131072),
]
if "--sw2-only" in sys.argv:
    cfgs = [c for c in cfgs if c[3] == 131072]
for block, sub, win, sw in cfgs:
    timed(f"c_place_blk{block}_sub{sub}_win{win}_sw{sw}",
          place_cfg(block=block, sub=sub, win=win, sw=sw), (k_s,))

# Correctness: doubled supertiles must be bit-identical to the shipped
# config on the real projected stream.
a = jax.jit(lambda: place_sorted(g_s, k_s, num_groups=T_IN * 4 * P,
                                 runs=T_IN, disjoint=True, sw=65536))()
b = jax.jit(lambda: place_sorted(g_s, k_s, num_groups=T_IN * 4 * P,
                                 runs=T_IN, disjoint=True, sw=131072))()
print("sw131072 bit-identical:", bool((a == b).all()), flush=True)
