"""bf16-activation BG stage: resolve the HBM-bound contradiction.

docs/perf_notes.md simultaneously claims HarDNet is HBM-roofline-bound
(15.8 GB ~= 19 ms at 819 GB/s) and that `compute_dtype: bfloat16` is "a
memory knob, not speed" because f32 convs already ride bf16 MXU passes.
Both cannot hold: if the stage is HBM-bound, halving activation bytes
must cut time. This measures the shipped serving configuration (folded
conv+BN, fused one-hot Pallas stem, CHW-resize argmax output) at
1024x2048 with f32 vs bf16 activations.

    python scripts/prof_bg_bf16.py
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
from panoptic_forecasting_tpu.kernels.stem import onehot_stem_conv
from panoptic_forecasting_tpu.models.hardnet import (
    HarDNet,
    fold_batchnorm_variables,
)

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)


def build_vars():
    net = HarDNet(n_classes=11)
    v = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 36))
    )
    v = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.randn(*s.shape).astype(s.dtype) * 0.05), v
    )
    v = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.abs(x) + 0.5
        if any(getattr(k, "key", None) == "var" for k in path) else x,
        v,
    )
    return fold_batchnorm_variables(v)


vars_f = build_vars()
seg = jnp.asarray(rng.randint(0, 12, (1, 3, H, W)).astype(np.int32))
dep = jnp.asarray((rng.rand(1, 3, H, W) * 50).astype(np.float32))


def bg_step(dtype):
    # round-5: measure on the shipped packed serving graph
    net = HarDNet(n_classes=11, folded=True, skip_stem0=True, dtype=dtype,
                  packed_stem=True, packed_levels=1)

    def step(x, s):
        seg, dep = x
        seg = (seg + s.astype(jnp.int32)) % 13
        dn = (dep + 0.001 * s - 30.0) / 20.0
        p0 = vars_f["params"]["base_0"]["conv"]
        y0 = onehot_stem_conv(seg, dn, p0["kernel"], p0["bias"],
                              num_classes=11)
        return net.apply(vars_f, y0, return_argmax=True)

    return step


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


x = (seg, dep)
f32 = timed("bg_argmax_f32", bg_step(jnp.float32), (x,))
bf16 = timed("bg_argmax_bf16", bg_step(jnp.bfloat16), (x,))
print(f"speedup: {f32 / bf16:.3f}x", flush=True)

# argmax agreement at serving res: how many pixels flip class under bf16?
net32 = HarDNet(n_classes=11, folded=True, skip_stem0=True,
                dtype=jnp.float32)
net16 = HarDNet(n_classes=11, folded=True, skip_stem0=True,
                dtype=jnp.bfloat16)
p0 = vars_f["params"]["base_0"]["conv"]
y0 = onehot_stem_conv(seg, (dep - 30.0) / 20.0, p0["kernel"], p0["bias"],
                      num_classes=11)
a32 = np.asarray(jax.jit(lambda y: net32.apply(vars_f, y, return_argmax=True))(y0))
a16 = np.asarray(jax.jit(lambda y: net16.apply(vars_f, y, return_argmax=True))(y0))
print("argmax flip fraction:", float((a32 != a16).mean()), flush=True)
