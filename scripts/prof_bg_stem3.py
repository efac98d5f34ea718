"""BG stem ladder #3: why is the 36->16 stride-2 3x3 conv 7.5 ms?

Probes the conv op in isolation: channel counts, stride, resolution,
s2d-shaped conv on random input, and matmul decompositions.

    python scripts/prof_bg_stem3.py
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

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(2)


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


def conv(x, w, stride, pad=None):
    p = w.shape[0] // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def mk(shape, dtype=np.float32):
    return jnp.asarray(rng.rand(*shape).astype(dtype))


x36 = mk((1, H, W, 36))
w_36_16 = mk((3, 3, 36, 16))

# A. baseline: the stem conv as-is
timed("conv36_s2", lambda x, s: conv(x + 0.001 * s, w_36_16, 2), (x36,))

# B. same FLOPs-ish, stride 1 at half res (isolate stride-2 input handling)
xh36 = mk((1, H // 2, W // 2, 36))
timed("conv36_s1_halfres", lambda x, s: conv(x + 0.001 * s, w_36_16, 1),
      (xh36,))

# C. full-res stride-1 (4x FLOPs of A; is cost ~resolution-bound?)
timed("conv36_s1_fullres", lambda x, s: conv(x + 0.001 * s, w_36_16, 1),
      (x36,))

# D. 128 input channels, stride 2 (aligned lanes; 3.5x the FLOPs of A)
x128 = mk((1, H, W, 128))
w_128_16 = mk((3, 3, 128, 16))
timed("conv128_s2", lambda x, s: conv(x + 0.001 * s, w_128_16, 2), (x128,))

# E. 36 -> 128 outputs stride 2 (output-lane alignment; 8x FLOPs of A)
w_36_128 = mk((3, 3, 36, 128))
timed("conv36to128_s2", lambda x, s: conv(x + 0.001 * s, w_36_128, 2), (x36,))

# F. s2d-shaped conv on RANDOM packed input (no assembly cost):
#    (1, H/2, W/2, 144) 2x2 stride-1 -> 16
x144 = mk((1, H // 2, W // 2, 144))
w_144_16 = mk((2, 2, 144, 16))
timed("conv144_2x2_s1",
      lambda x, s: jax.lax.conv_general_dilated(
          x + 0.001 * s, w_144_16, (1, 1), ((1, 0), (1, 0)),
          dimension_numbers=("NHWC", "HWIO", "NHWC")), (x144,))

# G. bf16 variants of A and F
timed("conv36_s2_bf16",
      lambda x, s: conv((x + 0.001 * s).astype(jnp.bfloat16),
                        w_36_16.astype(jnp.bfloat16), 2), (x36,))
timed("conv144_2x2_s1_bf16",
      lambda x, s: jax.lax.conv_general_dilated(
          (x + 0.001 * s).astype(jnp.bfloat16),
          w_144_16.astype(jnp.bfloat16), (1, 1), ((1, 0), (1, 0)),
          dimension_numbers=("NHWC", "HWIO", "NHWC")), (x144,))

# H. 9-tap matmul decomposition of A on the same x36
w9 = [[jnp.asarray(np.asarray(w_36_16)[r, c]) for c in range(3)]
      for r in range(3)]


def tap_matmul(x, s):
    xp = jnp.pad(x + 0.001 * s, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((1, H // 2, W // 2, 16), jnp.float32)
    for r in range(3):
        for c in range(3):
            sl = xp[:, r:r + H:2, c:c + W:2, :]  # (1,H/2,W/2,36)
            out = out + sl @ w9[r][c]
    return out


timed("tap9_matmul", tap_matmul, (x36,))

# I. plain matmul reference points
a1 = mk((H // 2 * W // 2, 36))
b1 = mk((36, 16))
timed("mm_524288x36x16", lambda x, s: (x + 0.001 * s) @ b1, (a1,))
a2 = mk((H // 2 * W // 2, 324))
b2 = mk((324, 16))
timed("mm_524288x324x16", lambda x, s: (x + 0.001 * s) @ b2, (a2,))

# J. stride-2 via reshape-slice then stride-1 conv: pack rows/cols first
def reshape_then_conv(x, s):
    x = x + 0.001 * s
    # gather even output taps only approximation is NOT parity; this is a
    # pure layout-cost probe: 2x2-pool the input then 3x3 s1 at half res
    xp = x.reshape(1, H // 2, 2, W // 2, 2, 36).mean(axis=(2, 4))
    return conv(xp, w_36_16, 1)


timed("pool_then_conv36", reshape_then_conv, (x36,))
print("DONE", flush=True)
