"""Dump the optimized HLO of the bg serving step to locate layout copies.

    python scripts/prof_bg_hlo.py > /tmp/bg_hlo.txt
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import H, W
from prof_common import scan_loop
from panoptic_forecasting_tpu.kernels.stem import onehot_stem_conv
from panoptic_forecasting_tpu.models.hardnet import (
    HarDNet,
    fold_batchnorm_variables,
)

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
net = HarDNet(n_classes=11, folded=True, skip_stem0=True)


def step(x, s):
    seg, dep = x
    seg = (seg + s.astype(jnp.int32)) % 13
    dn = (dep + 0.001 * s - 30.0) / 20.0
    p0 = vars_f["params"]["base_0"]["conv"]
    y0 = onehot_stem_conv(seg, dn, p0["kernel"], p0["bias"], num_classes=11)
    return net.apply(vars_f, y0, return_argmax=True)


x = (seg, dep)
run = scan_loop(step)
lowered = run.lower(x, jnp.float32(1.0))
compiled = lowered.compile()
print(compiled.as_text())
