"""Batched fused serving: per-frame throughput at B = 1, 2, 4.

Round-3 found batched pc does NOT amortize (sort+placement are
bandwidth-bound) and recommended B=1 for latency serving. With the
round-4 doubled supertiles (sw=131072) and disjoint owner-run placement
this re-checks whether a THROUGHPUT-serving batch pays: ms/frame =
fused_ms(B) / B.

    python scripts/prof_fused_batch.py [B ...]
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import H, W, T_IN, INTR, K, _timed
import __graft_entry__ as ge
from panoptic_forecasting_tpu.eval.forecast import build_forecast_step
from panoptic_forecasting_tpu.geometry import rdf_T_flu, unicycle_now_T_prev
from panoptic_forecasting_tpu.models.base import merge_variables
from panoptic_forecasting_tpu.models.bg import BGModel

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)

_, fg_model, fg_params, fg_state, batch = ge._build_fg(batch_size=8)
fg_vars = merge_variables(fg_params, fg_state)
inp = batch["inputs"]
n = np.asarray(inp["trajectories"]).shape[0]
out_t = int(np.asarray(batch["labels"]["trajectories"]).shape[1])

K_m = np.array(
    [[INTR[0], 0, INTR[2]], [0, INTR[1], INTR[3]], [0, 0, 1]], np.float32
)
E = (np.array(
    [[1, 0, 0, 0.3], [0, 1, 0, 0.0], [0, 0, 1, 1.2], [0, 0, 0, 1]],
    np.float32) @ rdf_T_flu()).astype(np.float32)
Ts = np.asarray(
    unicycle_now_T_prev(
        np.array([8.0, 8.2, 8.4], np.float32),
        np.array([0.01, 0.0, -0.01], np.float32), 0.18,
    ), np.float32,
)

bg_model = BGModel(
    {"model": {"num_inputs": T_IN, "convert2onehot": True,
               "use_depth_inps": True},
     "data": {"num_classes": 11}}
)
bg_vars = jax.jit(
    lambda r: bg_model.init(
        r,
        {"inputs": {
            "seg": jnp.zeros((1, T_IN, 64, 128), jnp.int32),
            "depth": jnp.zeros((1, T_IN, 64, 128)),
            "depth_mask": jnp.zeros((1, T_IN, 64, 128), bool),
        }},
    )
)(jax.random.PRNGKey(1))
bg_vars = bg_model.fold_variables(bg_vars)

bs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4]
for B in bs:
    seg = rng.randint(0, 11, size=(B, T_IN, H, W)).astype(np.int32)
    depth = (rng.rand(B, T_IN, H, W) * 50 + 2).astype(np.float32)
    pc_in = {
        "seg": jnp.asarray(seg),
        "depth": jnp.asarray(depth),
        "depth_mask": jnp.asarray(np.ones_like(depth, bool)),
        "intrinsics": jnp.asarray(np.tile(K_m[None], (B, 1, 1))),
        "extrinsics": jnp.asarray(np.tile(E[None], (B, 1, 1))),
        "target_T": jnp.asarray(np.tile(Ts[None], (B, 1, 1, 1))),
    }
    fg_in = {
        k2: jnp.asarray(np.tile(np.asarray(v)[None], (B,) + (1,) * np.asarray(v).ndim))
        for k2, v in inp.items()
    }
    fg_in["output_inds"] = jnp.asarray(
        np.tile(np.asarray(batch["labels"]["output_inds"])[None], (B, 1))
    )
    fg_in["valid"] = jnp.ones((B, n), bool)
    step = build_forecast_step(bg_model, fg_model, height=H, width=W,
                               out_t=out_t)

    @jax.jit
    def loop(bg_vars, fg_vars, pc_in, fg_in, depth, salt):
        def body(c, i):
            out = step(bg_vars, fg_vars,
                       dict(pc_in, depth=depth + 0.001 * (i + salt)), fg_in)
            return c + out["panoptic"].ravel()[::65536].astype(
                jnp.float32).sum(), ()
        return jax.lax.scan(
            body, jnp.float32(0), jnp.arange(K, dtype=jnp.float32))[0]

    ms = _timed(loop, (bg_vars, fg_vars, pc_in, fg_in,
                       jnp.asarray(depth)), K) * 1e3
    print(f"fused_B{B}: {ms:.2f} ms total, {ms / B:.2f} ms/frame, "
          f"{1000.0 * B / ms:.1f} fps", flush=True)
