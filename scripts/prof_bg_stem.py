"""Fine-grained HarDNet stem ladder: where do bg's ~13 ms go, layer by layer?

Production-shaped: every variant assembles the 36-ch input IN-JIT from int
seg maps + f32 depths (BGModel._assemble semantics), matching bench.py's
bg_step. Run on the attached TPU:

    python scripts/prof_bg_stem.py [--trace /tmp/bg_trace]

With --trace, also captures a jax.profiler trace of the full bg step for
op-level attribution (open with xprof / tensorboard).
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import flax.linen as nn

from bench import H, W, K, _timed
from panoptic_forecasting_tpu.models.hardnet import (
    ConvLayer,
    HarDNet,
    fold_batchnorm_variables,
)

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)


def scan_loop(body, k=K):
    @jax.jit
    def run(x, salt):
        def step(c, i):
            out = body(x, i + salt)
            return c + jax.tree_util.tree_reduce(
                lambda a, b: a + b.ravel()[::65536].astype(jnp.float32).sum(),
                out, jnp.float32(0)), ()
        return jax.lax.scan(step, jnp.float32(0),
                            jnp.arange(k, dtype=jnp.float32))[0]
    return run


seg = jnp.asarray(rng.randint(0, 12, (1, 3, H, W)).astype(np.int32))
dep = jnp.asarray((rng.rand(1, 3, H, W) * 50).astype(np.float32))


def assemble(seg, dep, s):
    """BGModel._assemble: 3x11 one-hot + 3 normalized depth = 36 ch."""
    sg = (seg + s.astype(jnp.int32)) % 13
    seg_t = jnp.transpose(sg, (0, 2, 3, 1))
    mask = seg_t < 11
    oh = jax.nn.one_hot(jnp.where(mask, seg_t, 0), 11, dtype=jnp.float32)
    oh = oh * mask[..., None]
    b, hh, ww = oh.shape[:3]
    dn = (jnp.transpose(dep, (0, 2, 3, 1)) + 0.001 * s - 30.0) / 20.0
    return jnp.concatenate([oh.reshape(b, hh, ww, 33), dn], axis=-1)


class StemN(nn.Module):
    """First ``n`` stem convs (folded), names matching HarDNet."""
    n: int = 4

    @nn.compact
    def __call__(self, x):
        specs = [(16, 2), (24, 1), (32, 2), (48, 1)]
        for i, (ch, st) in enumerate(specs[: self.n]):
            x = ConvLayer(ch, kernel=3, stride=st, folded=True,
                          name=f"base_{i}")(x)
        return x


def rand_vars(mod, cin):
    v = jax.eval_shape(mod.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 128, cin)))
    return jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.randn(*s.shape).astype(s.dtype) * 0.05), v)


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


# 0. assembly alone (sum-reduced so nothing is dead)
timed("assemble_only", lambda x, s: assemble(x[0], x[1], s), ((seg, dep),))

# 1..4: assembly + first n stem convs
for n in (1, 2, 3, 4):
    mod = StemN(n=n)
    v = rand_vars(mod, 36)
    timed(f"asm_stem{n}",
          lambda x, s, mod=mod, v=v: mod.apply(v, assemble(x[0], x[1], s)),
          ((seg, dep),))

# 5. base_0 on a PRE-MATERIALIZED f32 input (the relayout-overstated form)
x36 = jnp.asarray(rng.rand(1, H, W, 36).astype(np.float32))
mod1 = StemN(n=1)
v1 = rand_vars(mod1, 36)
timed("mat_stem1", lambda x, s, : mod1.apply(v1, x + 0.001 * s), (x36,))

# 6. bf16 assembly + full stem
def asm_bf16(x, s):
    return assemble(x[0], x[1], s).astype(jnp.bfloat16)

mod4 = StemN(n=4)
v4 = rand_vars(mod4, 36)
v4h = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v4)
timed("asm_stem4_bf16",
      lambda x, s: mod4.apply(v4h, asm_bf16(x, s)), ((seg, dep),))

# 7. parity-decomposed base_0: stride-2 3x3 conv as 4 quarter-res
#    embedding-sums (no 36-ch full-res tensor ever materializes).
k0 = np.asarray(v4["params"]["base_0"]["conv"]["kernel"])  # (3,3,36,16)
b0 = np.asarray(v4["params"]["base_0"]["conv"]["bias"])


def parity_base0(x, s):
    sg = (x[0] + s.astype(jnp.int32)) % 13  # (1,3,H,W)
    dn = (x[1] + 0.001 * s - 30.0) / 20.0
    sg = sg[0]
    dn = dn[0]
    mask = (sg < 11)
    sgc = jnp.where(mask, sg, 11)  # class 11 = all-zero embedding row
    out = jnp.zeros((H // 2, W // 2, 16), jnp.float32) + b0
    # taps: output(y,x) <- input(2y+dy-1, 2x+dx-1), dy,dx in {0,1,2}
    for dy in range(3):
        for dx in range(3):
            # input rows 2y+dy-1: parity (dy-1)&1; plane row index y + (dy-1==-1? -? )
            ry, oy = (dy - 1) % 2, (dy - 1) // 2  # row = 2*(y+oy)+ry
            rx, ox = (dx - 1) % 2, (dx - 1) // 2
            pl_s = sgc[:, ry::2, rx::2]  # (3, H/2, W/2)
            pl_d = dn[:, ry::2, rx::2]
            # shift by oy, ox (-1 or 0): pad at the low edge
            if oy:
                pl_s = jnp.pad(pl_s[:, :-1], ((0, 0), (1, 0), (0, 0)),
                               constant_values=11)
                pl_d = jnp.pad(pl_d[:, :-1], ((0, 0), (1, 0), (0, 0)))
            if ox:
                pl_s = jnp.pad(pl_s[:, :, :-1], ((0, 0), (0, 0), (1, 0)),
                               constant_values=11)
                pl_d = jnp.pad(pl_d[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
            for f in range(3):
                # assembled channel order is [3x11 one-hot | 3 depth]:
                # embedding rows 0..10 = Woh[dy,dx,f*11..f*11+10,:],
                # row 11 = 0 (masked classes); depth col = 33+f
                tab = jnp.asarray(
                    np.concatenate([k0[dy, dx, f * 11: (f + 1) * 11, :],
                                    np.zeros((1, 16), np.float32)]))
                oh = jax.nn.one_hot(pl_s[f], 12, dtype=jnp.float32)
                out = out + oh @ tab
                out = out + pl_d[f][..., None] * jnp.asarray(
                    k0[dy, dx, 33 + f, :])
    return jax.nn.relu(out)


timed("parity_base0", parity_base0, ((seg, dep),))

# correctness: parity_base0 == stem1 on the same inputs
ref1 = mod1.apply(
    {"params": {"base_0": v4["params"]["base_0"]}},
    assemble(seg, dep, jnp.float32(0)))
got = parity_base0((seg, dep), jnp.float32(0))
err = float(jnp.max(jnp.abs(ref1[0] - got)))
print("parity_base0_maxerr", err, flush=True)

# 8. full folded net, production assembly (= bench bg_step)
net_f = HarDNet(n_classes=11, folded=True)
vf = rand_vars(HarDNet(n_classes=11), 36)
vf = jax.tree_util.tree_map_with_path(
    lambda path, x: jnp.abs(x) + 0.5
    if any(getattr(k, "key", None) == "var" for k in path) else x, vf)
vf = fold_batchnorm_variables(vf)


def full(x, s):
    lg = net_f.apply(vf, assemble(x[0], x[1], s))
    return jnp.argmax(lg, axis=-1).astype(jnp.int32)


timed("full_argmax", full, ((seg, dep),))

# 9. full net WITHOUT the final full-res resize+argmax (decoder cost probe)
def noresize(x, s):
    _, lg = net_f.apply(vf, assemble(x[0], x[1], s), return_orig_size=True)
    return lg


timed("full_origsize", noresize, ((seg, dep),))

if "--trace" in sys.argv:
    tdir = sys.argv[sys.argv.index("--trace") + 1]
    run = scan_loop(full, k=5)
    run((seg, dep), jnp.float32(3.0)).block_until_ready()
    with jax.profiler.trace(tdir):
        run((seg, dep), jnp.float32(4.0)).block_until_ready()
    print("trace written to", tdir, flush=True)
print("DONE", flush=True)
