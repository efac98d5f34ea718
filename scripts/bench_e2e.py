"""End-to-end panoptic forecast benchmark with per-stage breakdown.

Measures, on the attached accelerator, the full Cityscapes-scale forecast
path for one target frame:

  1. pc     — 3x1024x2048 backproject -> ego transform -> z-buffer splat
  2. bg     — FCHarDNet-70 over the 36-channel one-hot + depth stack
  3. fg     — 8-instance coupled GRU/ConvLSTM rollout + mask head
  4. fusion — paste + depth-ordered composite onto the bg canvas

Each stage runs K iterations inside one jitted scan (device-side input
perturbation; single tunnel readback). Run:  python scripts/bench_e2e.py
"""

from __future__ import annotations

import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, args, K):
    import jax

    _ = int(fn(*args, np.float32(0)))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        _ = int(fn(*args, np.float32(i + 1)))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from panoptic_forecasting_tpu.geometry import (
        backproject_pixels,
        project_points,
        unicycle_now_T_prev,
    )
    from panoptic_forecasting_tpu.geometry.camera import (
        pixel_grid,
        transform_points,
    )
    from panoptic_forecasting_tpu.kernels import zbuffer_splat
    from panoptic_forecasting_tpu.kernels.mask_paste import paste_and_composite
    from panoptic_forecasting_tpu.models.hardnet import HarDNet
    from panoptic_forecasting_tpu.models.fg import FGCore

    H, W, T = 1024, 2048, 3
    K_pc, K_bg, K_fg, K_fu = 10, 10, 10, 10
    intr = (2262.52, 2265.30, 1096.98, 513.137)
    rng = np.random.RandomState(0)
    results = {}

    # ---- 1. pc ------------------------------------------------------------
    depth = jnp.asarray(rng.rand(T, H, W).astype(np.float32) * 50 + 2)
    seg = jnp.asarray(rng.randint(0, 19, size=(T, H, W)).astype(np.int32))
    speeds = jnp.asarray(np.array([8.0, 8.2, 8.4], np.float32))
    yaws = jnp.asarray(np.array([0.01, 0.0, -0.01], np.float32))

    def pc_forecast(depth):
        uv = pixel_grid(H, W)
        Ts = unicycle_now_T_prev(speeds, yaws, 0.18)
        pts = backproject_pixels(uv[None], depth, intr)
        pts = jax.vmap(transform_points)(
            Ts.astype(jnp.float32), pts.reshape(T, -1, 3)
        )
        uv2, z2 = project_points(pts, intr)
        valid = (
            (z2 > 0)
            & (uv2[..., 0] >= 0) & (uv2[..., 0] < W)
            & (uv2[..., 1] >= 0) & (uv2[..., 1] < H)
        )
        return zbuffer_splat(
            uv2.reshape(-1, 2), z2.reshape(-1), seg.reshape(-1),
            valid.reshape(-1), height=H, width=W,
        )

    @jax.jit
    def pc_loop(depth, salt):
        def body(c, k):
            lab, dep = pc_forecast(depth + 0.001 * (k + salt))
            return c + lab.sum() + dep.sum().astype(jnp.int32), ()
        return jax.lax.scan(
            body, jnp.int32(0), jnp.arange(1.0, K_pc + 1, dtype=jnp.float32)
        )[0]

    results["pc_ms"] = timed(pc_loop, (depth,), K_pc) * 1e3

    # ---- 2. bg -------------------------------------------------------------
    net = HarDNet(n_classes=11)
    x_bg = jnp.asarray(rng.rand(1, H, W, 36).astype(np.float32))
    bg_vars = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 36))
    )
    bg_vars = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.randn(*s.shape).astype(s.dtype) * 0.05),
        bg_vars,
    )

    @jax.jit
    def bg_loop(x, salt):
        def body(c, k):
            out = net.apply(bg_vars, x + 0.001 * (k + salt))
            return c + out.sum().astype(jnp.int32), ()
        return jax.lax.scan(
            body, jnp.int32(0), jnp.arange(1.0, K_bg + 1, dtype=jnp.float32)
        )[0]

    results["bg_ms"] = timed(bg_loop, (x_bg,), K_bg) * 1e3

    # ---- 3. fg -------------------------------------------------------------
    N, T_in, OUT = 8, 3, 3
    core = FGCore(rnn_hidden=128)
    enc_inp = jnp.asarray(rng.randn(N, T_in, 94).astype(np.float32))
    feats = jnp.asarray(rng.randn(N, T_in, 14, 14, 256).astype(np.float32))
    odom_out = jnp.asarray(rng.randn(N, OUT, 5).astype(np.float32))
    fg_vars = core.init(jax.random.PRNGKey(0), enc_inp, feats, odom_out, OUT)

    @jax.jit
    def fg_loop(enc_inp, feats, salt):
        def body(c, k):
            tr, fe = core.apply(
                fg_vars, enc_inp + 0.001 * (k + salt), feats, odom_out, OUT
            )
            return c + tr.sum().astype(jnp.int32) + fe.sum().astype(
                jnp.int32
            ), ()
        return jax.lax.scan(
            body, jnp.int32(0), jnp.arange(1.0, K_fg + 1, dtype=jnp.float32)
        )[0]

    results["fg_ms"] = timed(fg_loop, (enc_inp, feats), K_fg) * 1e3

    # ---- 4. fusion ---------------------------------------------------------
    masks = jnp.asarray(rng.rand(N, 28, 28).astype(np.float32))
    boxes = jnp.asarray(
        (rng.rand(N, 4) * [W, H, W, H]).astype(np.float32)
    )
    depths_i = jnp.asarray((rng.rand(N) * 50 + 2).astype(np.float32))
    ids = jnp.asarray(np.arange(1, N + 1).astype(np.int32) + 26000)
    valid_i = jnp.ones((N,), bool)
    bg_lab = jnp.asarray(rng.randint(0, 11, (H, W)).astype(np.int32))
    bg_dep = jnp.asarray((rng.rand(H, W) * 80 + 2).astype(np.float32))

    @jax.jit
    def fu_loop(masks, salt):
        def body(c, k):
            seg, _ = paste_and_composite(
                masks + 0.0001 * (k + salt), boxes, depths_i, ids, valid_i,
                bg_lab, bg_dep, img_h=H, img_w=W, threshold=0.5,
                use_depth=True,
            )
            return c + seg.sum().astype(jnp.int32), ()
        return jax.lax.scan(
            body, jnp.int32(0), jnp.arange(1.0, K_fu + 1, dtype=jnp.float32)
        )[0]

    results["fusion_ms"] = timed(fu_loop, (masks,), K_fu) * 1e3

    total_ms = sum(results.values())
    results["total_ms"] = total_ms
    results["e2e_fps"] = 1000.0 / total_ms
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
