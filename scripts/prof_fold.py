"""Corner-fold formulations after placement: flat-P shifts vs 2-D shifts.

The fused-program trace (scripts/prof_fused_trace.py, round 4) shows the
zbuffer corner fold costing ~1 ms/frame in layout churn: XLA rewrites the
placement's (n_super, 1024, 128) T(8,128) canvas into a (3, 4, 2.1M)
T(4,128) transposed copy (reshape.3338 0.22 + copy.3121 0.20 +
fold fusions ~0.5) to serve the flat-P plane slices + pad/slice shifts.
Hypothesis: folding in (b, 4, H, W) with genuine 2-D row/col shifts keeps
the (8,128) tiling and kills the relayout. Flat shifts are equivalent by
the clamped-offset guard (fu=1 never in the last column, fv=1 never in
the last row — zbuffer.py fold comment).

    python scripts/prof_fold.py
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import H, W, T_IN, K, _timed
from prof_common import scan_loop

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)

EMPTY = jnp.int32(0x7FFFFFFF)
B = T_IN
P = H * W
# Placement-shaped canvas: (n_super, sw//128, 128) == flat (B*4*P,)
n_super = (B * 4 * P) // 131072
canvas_np = rng.randint(1, 2**30, (n_super, 1024, 128)).astype(np.int32)
canvas0 = jnp.asarray(canvas_np)


def unpack(canvas, label_dtype=jnp.int32):
    touched = canvas != EMPTY
    lab = jnp.where(touched, canvas & 0xFF, 0).astype(label_dtype)
    dep = jax.lax.bitcast_convert_type(canvas & jnp.int32(~0xFF), jnp.float32)
    dep = jnp.where(touched, dep, -1.0)
    return lab, dep


def fold_flat(canvas4, salt):
    canvas4 = canvas4 + salt.astype(jnp.int32)
    g = canvas4.reshape(B, 4, P)
    g0, g1, g2, g3 = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    m00 = jnp.minimum(jnp.minimum(g0, g1), jnp.minimum(g2, g3))
    m10 = jnp.minimum(g1, g3)
    m01 = jnp.minimum(g2, g3)
    m11 = g3

    def shift(c, off):
        pad = [(0, 0)] * (c.ndim - 1) + [(off, 0)]
        return jnp.pad(c, pad, constant_values=EMPTY)[..., :-off]

    canvas = jnp.minimum(
        jnp.minimum(m00, shift(m10, 1)),
        jnp.minimum(shift(m01, W), shift(m11, W + 1)),
    )
    lab, dep = unpack(canvas)
    return lab.reshape(B, H, W), dep.reshape(B, H, W)


def fold_2d(canvas4, salt):
    canvas4 = canvas4 + salt.astype(jnp.int32)
    g = canvas4.reshape(B, 4, H, W)
    g0, g1, g2, g3 = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    m00 = jnp.minimum(jnp.minimum(g0, g1), jnp.minimum(g2, g3))
    m10 = jnp.minimum(g1, g3)
    m01 = jnp.minimum(g2, g3)
    m11 = g3

    def shift2(c, dv, du):
        pad = [(0, 0), (dv, 0), (du, 0)]
        return jnp.pad(c, pad, constant_values=EMPTY)[:, :H, :W]

    canvas = jnp.minimum(
        jnp.minimum(m00, shift2(m10, 0, 1)),
        jnp.minimum(shift2(m01, 1, 0), shift2(m11, 1, 1)),
    )
    return unpack(canvas)


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


timed("fold_flat", fold_flat, (canvas0,))
timed("fold_2d", fold_2d, (canvas0,))

# bit-equality of the two formulations
a = jax.jit(lambda c: fold_flat(c, np.float32(0)))(canvas0)
b2 = jax.jit(lambda c: fold_2d(c, np.float32(0)))(canvas0)
print("labels equal:", bool((a[0] == b2[0]).all()),
      "depths equal:", bool((a[1] == b2[1]).all()), flush=True)
