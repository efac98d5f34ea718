"""Measure the packed-stem (space-to-depth base_1/base_2) bg variant.

VERDICT r04 item 7: attack the ~1.5 ms/frame of HarDNet conv layout
copies. Hypothesis from the per-layer trace attribution
(scripts/prof_bg_attrib.py): base_1 costs 1.07 ms/frame (0.48 conv +
0.59 copies) because its 16→24-channel conv makes XLA's emitter pick
bespoke blocked layouts; running it over 2×2-packed space (64→96
channels) should remove the relayouts for 4× structural-zero MACs that
are ~free (the layer sits ~15× above its MXU floor).

    python scripts/prof_bg_pack.py
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


def bg_step(packed_out=False, **net_kw):
    net = HarDNet(n_classes=11, folded=True, skip_stem0=True, **net_kw)

    def step(x, s):
        seg, dep = x
        seg = (seg + s.astype(jnp.int32)) % 13
        dn = (dep + 0.001 * s - 30.0) / 20.0
        p0 = vars_f["params"]["base_0"]["conv"]
        y0 = onehot_stem_conv(seg, dn, p0["kernel"], p0["bias"],
                              num_classes=11, packed_out=packed_out)
        return net.apply(vars_f, y0, return_argmax=True)

    return step


def timed(label, body, args):
    r = _timed(scan_loop(body), args, K)
    print(label, round(r * 1e3, 3), flush=True)
    return r


x = (seg, dep)
plain = timed("bg_plain", bg_step(), (x,))
packed = timed("bg_packed_stem", bg_step(packed_stem=True), (x,))
lv1 = timed("bg_packed_lv1",
            bg_step(packed_stem=True, packed_levels=1), (x,))
lv2 = timed("bg_packed_lv2",
            bg_step(packed_stem=True, packed_levels=2), (x,))
lv3 = timed("bg_packed_lv3",
            bg_step(packed_stem=True, packed_levels=3), (x,))
print(f"speedup xla-pack: {plain / packed:.3f}x  lv1: {plain / lv1:.3f}x  "
      f"lv2: {plain / lv2:.3f}x  lv3: {plain / lv3:.3f}x", flush=True)

# Full-res argmax agreement.
p0 = vars_f["params"]["base_0"]["conv"]
y0 = onehot_stem_conv(seg, (dep - 30.0) / 20.0, p0["kernel"], p0["bias"],
                      num_classes=11)
a = np.asarray(jax.jit(
    lambda y: HarDNet(n_classes=11, folded=True, skip_stem0=True)
    .apply(vars_f, y, return_argmax=True))(y0))
b = np.asarray(jax.jit(
    lambda y: HarDNet(n_classes=11, folded=True, skip_stem0=True,
                      packed_stem=True, packed_levels=2)
    .apply(vars_f, y, return_argmax=True))(y0))
print("argmax flip fraction:", float((a != b).mean()), flush=True)

if "--trace" in sys.argv:
    out = "/tmp/pf_bg_pack_trace"
    os.makedirs(out, exist_ok=True)
    run = scan_loop(bg_step(packed_stem=True, packed_levels=1))
    jax.profiler.start_trace(out)
    run(x, jnp.float32(1.0)).block_until_ready()
    import time
    time.sleep(0.5)
    jax.profiler.stop_trace()
    print("trace written to", out, flush=True)
