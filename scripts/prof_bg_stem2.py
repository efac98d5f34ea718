"""BG stem ladder #2: lane-padding-aware assembly formulations.

Ladder #1 (prof_bg_stem.py) showed the stem is ~8.5 of bg's 15 ms, and
that even a pre-materialized 36-ch stride-2 conv is 7.5 ms (~300x off
roofline). Hypothesis: the (B,H,W,T,11) one-hot intermediate is
lane-padded 11->128 (~3 GB hidden HBM traffic), and the 36-ch conv input
pads 36->128. Variants here build the one-hot with its trailing axis
ALREADY the full channel axis (33/36/144) and test s2d packing done on
the cheap int maps instead of the f32 tensor.

    python scripts/prof_bg_stem2.py
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import H, W, K, _timed
from prof_bg_stem import StemN, rand_vars, scan_loop, assemble, seg, dep

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(1)

C = 11
T = 3
LANES = jnp.arange(T * C, dtype=jnp.int32)  # 33
FRAME = LANES // C  # which input frame each channel reads
CLS = LANES % C


def norm_dep(dep, s):
    return (jnp.transpose(dep, (0, 2, 3, 1)) + 0.001 * s - 30.0) / 20.0


def assemble_direct(seg, dep, s, dtype=jnp.float32):
    """One-hot emitted directly on a 33-lane trailing axis (no (...,T,11)
    intermediate): ch c fires iff seg[frame(c)] == cls(c) and < C."""
    sg = (seg + s.astype(jnp.int32)) % 13
    seg_t = jnp.transpose(sg, (0, 2, 3, 1))  # (B,H,W,T)
    rep = seg_t[..., FRAME]  # (B,H,W,33)
    oh = ((rep == CLS) & (rep < C)).astype(dtype)
    return jnp.concatenate([oh, norm_dep(dep, s).astype(dtype)], axis=-1)


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


mod1 = StemN(n=1)
v1 = rand_vars(mod1, 36)
mod4 = StemN(n=4)
v4 = rand_vars(mod4, 36)
v4["params"]["base_0"] = v1["params"]["base_0"]

# sanity: assemble_direct == assemble
ref = assemble(seg, dep, jnp.float32(0))
got = assemble_direct(seg, dep, jnp.float32(0))
print("direct_maxerr", float(jnp.max(jnp.abs(ref - got))), flush=True)

# V1: direct-36 assembly + stem1 (vs asm_stem1 8.5)
timed("dir_stem1",
      lambda x, s: mod1.apply(v1, assemble_direct(x[0], x[1], s)),
      ((seg, dep),))

# V2: direct assembly in bf16 + bf16 stem1
v1h = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v1)
timed("dir_stem1_bf16",
      lambda x, s: mod1.apply(
          v1h, assemble_direct(x[0], x[1], s, jnp.bfloat16)),
      ((seg, dep),))


# V3: s2d assembly from the int maps -> (B,H/2,W/2,144) + 2x2 s1 conv.
def assemble_s2d(seg, dep, s, dtype=jnp.float32):
    sg = (seg + s.astype(jnp.int32)) % 13
    seg_t = jnp.transpose(sg, (0, 2, 3, 1))  # (B,H,W,T) int, 24MB
    dn = norm_dep(dep, s).astype(dtype)  # (B,H,W,T)
    blocks = []
    for dr in (0, 1):
        for dc in (0, 1):
            sub = seg_t[:, dr::2, dc::2, :]
            rep = sub[..., FRAME]
            oh = ((rep == CLS) & (rep < C)).astype(dtype)
            blocks.append(
                jnp.concatenate([oh, dn[:, dr::2, dc::2, :]], axis=-1))
    return jnp.concatenate(blocks, axis=-1)  # (B,H/2,W/2,144)


def pack_w2(k0, b0):
    """(3,3,36,16) stride-2 kernel -> (2,2,144,16) s2d kernel (same packing
    as hardnet._space_to_depth_conv)."""
    c_in, c_out = k0.shape[2], k0.shape[3]
    w2 = np.zeros((2, 2, 4 * c_in, c_out), np.float32)
    for p in (0, 1):
        for dr in (0, 1):
            r = 2 * p + dr - 1
            if not 0 <= r <= 2:
                continue
            for q in (0, 1):
                for dc in (0, 1):
                    cc = 2 * q + dc - 1
                    if not 0 <= cc <= 2:
                        continue
                    sl = (dr * 2 + dc) * c_in
                    w2[p, q, sl:sl + c_in] = k0[r, cc]
    return w2, b0


k0 = np.asarray(v1["params"]["base_0"]["conv"]["kernel"])
b0 = np.asarray(v1["params"]["base_0"]["conv"]["bias"])
w2np, _ = pack_w2(k0, b0)
w2 = jnp.asarray(w2np)
b2 = jnp.asarray(b0)


def s2d_stem1(x, s, dtype=jnp.float32):
    xp = assemble_s2d(x[0], x[1], s, dtype)
    out = jax.lax.conv_general_dilated(
        xp, w2.astype(dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(out + b2.astype(dtype))


timed("s2d_stem1", s2d_stem1, ((seg, dep),))
timed("s2d_stem1_bf16",
      lambda x, s: s2d_stem1(x, s, jnp.bfloat16), ((seg, dep),))

# correctness of the s2d stem1 vs reference stem1
r1 = mod1.apply(v1, assemble(seg, dep, jnp.float32(0)))
g1 = s2d_stem1((seg, dep), jnp.float32(0))
print("s2d_stem1_maxerr", float(jnp.max(jnp.abs(r1 - g1))), flush=True)


# V5: best assembly + full 4-conv stem (vs asm_stem4 8.5)
def full_stem_via(asm):
    def f(x, s):
        return mod4.apply(v4, asm(x[0], x[1], s))
    return f


timed("dir_stem4", full_stem_via(assemble_direct), ((seg, dep),))


def s2d_stem4(x, s):
    y = s2d_stem1(x, s)
    # remaining convs base_1..3 on the half-res tensor
    class Rest(type(mod4)):
        pass
    from panoptic_forecasting_tpu.models.hardnet import ConvLayer
    import flax.linen as nn

    class Rest3(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, (ch, st) in enumerate([(24, 1), (32, 2), (48, 1)]):
                x = ConvLayer(ch, kernel=3, stride=st, folded=True,
                              name=f"base_{i + 1}")(x)
            return x

    return Rest3().apply(
        {"params": {k: v4["params"][k]
                    for k in ("base_1", "base_2", "base_3")}}, y)


timed("s2d_stem4", s2d_stem4, ((seg, dep),))

# V6: direct assembly feeding hardnet's existing s2d conv path (f32 relayout)
from panoptic_forecasting_tpu.models.hardnet import _space_to_depth_conv


def oldstyle_s2d_stem1(x, s):
    xin = assemble_direct(x[0], x[1], s)
    return jax.nn.relu(_space_to_depth_conv(xin, jnp.asarray(k0),
                                            jnp.asarray(b0), jnp.float32))


timed("olds2d_stem1", oldstyle_s2d_stem1, ((seg, dep),))
print("DONE", flush=True)
