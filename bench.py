"""Benchmark: end-to-end panoptic forecast throughput on the attached TPU.

Prints a sequence of flushed JSON lines, each a COMPLETE headline record
(``e2e_forecast_fps``) enriched as measurements land — the LAST line is
the result, and a driver kill at any point leaves the latest complete
record standing. The headline is the full Cityscapes-scale forecast path
for one target frame:

  1. pc     — 3x1024x2048 backproject -> ego transform -> z-buffer splat
              (Pallas placement kernel; reference hot path
              pc_transform_model.py:100-139)
  2. bg     — FCHarDNet-70 over the 36-channel one-hot + depth stack
  3. fg     — 8-instance coupled GRU/ConvLSTM rollout + mask head
  4. fusion — paste + depth-ordered composite onto the bg canvas

``vs_baseline`` is the speedup over the REFERENCE'S OWN code
(/root/reference/panoptic_forecasting, imported with stubbed
cityscapesscripts/torchvision) running the same four stages at the same
shapes on this host's CPU — the only hardware the reference can run on
here (its CUDA torch_scatter build is unavailable; that one call is
replaced by an equivalent NumPy scatter-min, see _baseline_pc). The
reference publishes no numbers of its own (BASELINE.md), so its measured
runtime here is the only executable baseline.

Each TPU stage runs K iterations inside one jitted scan (device-side
input perturbation; single tunnel readback — plain block_until_ready
does not synchronize through the axon tunnel).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

H, W, T_IN = 1024, 2048, 3
N_INST, T_OUT = 8, 3
INTR = (2262.52, 2265.30, 1096.98, 513.137)
# 20 iterations per timed call: the tunneled attachment adds ~23 ms of
# fixed dispatch+readback per call, so small K overstates stage times.
K = 20


# ---------------------------------------------------------------------------
# TPU side
# ---------------------------------------------------------------------------


def _timed(fn, args, k):
    _ = float(fn(*args, np.float32(0)))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        _ = float(fn(*args, np.float32(i + 1)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


# v5e peaks for the roofline fields (VERDICT r04 item 6): bf16 MXU peak
# and HBM bandwidth per chip. MFU uses the bf16 peak (same convention as
# docs/perf_notes.md's ~19% bg-train figure) even for f32 programs.
PEAK_TFLOPS_BF16 = 197.0
HBM_GBPS = 819.0


def _cost_analysis(jitted, args, k):
    """(gflops, gb) per loop iteration from the compiled program's XLA
    cost analysis; None when the backend doesn't report it.

    The TPU compiler counts a while/scan BODY once regardless of trip
    count (verified: k=1 and k=20 scans report identical flops, and the
    K=10 bg-train program reports 613.9 GFLOPs ≈ the independently
    derived 612.7 GFLOPs/step) — so the scan-harness numbers are already
    per-iteration and k is NOT divided out."""
    del k
    try:
        comp = jitted.lower(*args, np.float32(0)).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        fl = float(ca.get("flops", -1.0))
        by = float(ca.get("bytes accessed", -1.0))
        if fl <= 0 and by <= 0:
            return None
        return max(fl, 0.0) / 1e9, max(by, 0.0) / 1e9
    except Exception:
        return None


def _roofline_fields(gflops: float, gb: float, ms: float) -> dict:
    return {
        "gflops": round(gflops, 2),
        "gb": round(gb, 3),
        "achieved_tflops": round(gflops / ms, 3),
        "achieved_gbps": round(gb / ms * 1e3, 1),
        "pct_hbm_peak": round(gb / ms * 1e3 / HBM_GBPS * 100, 1),
        # gflops/ms == TFLOP/s; MFU against the v5e bf16 MXU peak
        "mfu_pct": round(gflops / ms / PEAK_TFLOPS_BF16 * 100, 2),
    }


def _emit_roofline(name: str, fn, args, k, ms: float) -> dict | None:
    """Stream a per-stage roofline line (utilization lives in the driver
    record, not just prose — VERDICT r04 item 6). The compile is a cache
    hit: ``fn`` was just executed by ``_timed``."""
    r = _cost_analysis(fn, args, k)
    if not r or ms <= 0:
        return None
    fields = _roofline_fields(*r, ms)
    print(json.dumps({"roofline_stage": name, **fields}), flush=True)
    return fields


def _emit_stage(name: str, ms: float) -> None:
    """Stream a per-stage result line so the parent can salvage partial
    measurements if this subprocess is killed at its deadline."""
    print(json.dumps({"stage": name, "ms": round(ms, 3)}), flush=True)


def measure_tpu_stages(k: int = K) -> dict:
    """Per-stage best-of milliseconds on the attached accelerator.

    Stages run in chain-priority order (per-frame pc -> bg -> fg ->
    fusion -> combined-canvas pc) and each result is printed+flushed as
    it lands, so a timeout partway through still yields the staged
    chain."""
    import jax

    # Persistent compile cache: repeat bench runs skip the ~2-4 min of
    # stage compiles (first compile through the tunnel is the slow part).
    jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

    rng = np.random.RandomState(0)
    results = {}

    def scan_loop(body):
        @jax.jit
        def run(x, salt):
            def step(c, i):
                out = body(x, i + salt)
                return c + jax.tree_util.tree_reduce(
                    lambda a, b: a
                    + b.ravel()[::65536].astype(jnp.float32).sum(),
                    out,
                    jnp.float32(0),
                ), ()
            return jax.lax.scan(
                step, jnp.float32(0), jnp.arange(k, dtype=jnp.float32)
            )[0]
        return run

    # ---- 1. pc ----
    depth = jnp.asarray(rng.rand(T_IN, H, W).astype(np.float32) * 50 + 2)
    seg = jnp.asarray(rng.randint(0, 19, size=(T_IN, H, W)).astype(np.int32))
    speeds = jnp.asarray(np.array([8.0, 8.2, 8.4], np.float32))
    yaws = jnp.asarray(np.array([0.01, 0.0, -0.01], np.float32))

    def pc_forecast(depth, salt):
        depth = depth + 0.001 * salt
        uv = pixel_grid(H, W)
        Ts = unicycle_now_T_prev(speeds, yaws, 0.18)
        pts = backproject_pixels(uv[None], depth, INTR)
        pts = jax.vmap(transform_points)(
            Ts.astype(jnp.float32), pts.reshape(T_IN, -1, 3)
        )
        uv2, z2 = project_points(pts, INTR)
        valid = (
            (z2 > 0)
            & (uv2[..., 0] >= 0) & (uv2[..., 0] < W)
            & (uv2[..., 1] >= 0) & (uv2[..., 1] < H)
        )
        return zbuffer_splat(
            uv2.reshape(-1, 2), z2.reshape(-1), seg.reshape(-1),
            valid.reshape(-1), height=H, width=W, sort_runs=T_IN,
        )

    # The staged CHAIN cost: the bg model consumes THREE per-frame
    # reprojections (the reference's ind0/1/2 exports feed
    # configs/bg/bg_train.yaml), so the honest staged pipeline builds 3
    # separate canvases (batched: one sort+placement pass), not the
    # combined one. ``pc_ms`` above (combined canvas = the reference
    # model's no-ind predict, pc_transform_model.py:33-150) is kept for
    # the model benchmark and the CPU-baseline comparison.
    def pc_forecast_perframe(depth, salt):
        depth = depth + 0.001 * salt
        uv = pixel_grid(H, W)
        Ts = unicycle_now_T_prev(speeds, yaws, 0.18)
        pts = backproject_pixels(uv[None], depth, INTR)
        pts = jax.vmap(transform_points)(
            Ts.astype(jnp.float32), pts.reshape(T_IN, -1, 3)
        )
        uv2, z2 = project_points(pts, INTR)
        valid = (
            (z2 > 0)
            & (uv2[..., 0] >= 0) & (uv2[..., 0] < W)
            & (uv2[..., 1] >= 0) & (uv2[..., 1] < H)
        )
        return zbuffer_splat(
            uv2.reshape(T_IN, -1, 2), z2.reshape(T_IN, -1),
            seg.reshape(T_IN, -1), valid.reshape(T_IN, -1),
            height=H, width=W,
        )

    fn_pc_pf = scan_loop(pc_forecast_perframe)
    results["pc_stage_ms"] = _timed(fn_pc_pf, (depth,), k) * 1e3
    _emit_stage("pc_stage_ms", results["pc_stage_ms"])
    _emit_roofline("pc_stage_ms", fn_pc_pf, (depth,), k,
                   results["pc_stage_ms"])

    # ---- 2. bg ----
    net = HarDNet(n_classes=11)
    # Production-shaped inputs: the bg stage consumes per-frame INT seg
    # maps + depths (BGModel.forward -> _assemble one-hots them INSIDE
    # the jit). Feeding a pre-materialized (1,H,W,36) f32 tensor instead
    # overstates the stage by ~5 ms of pure HBM read+relayout that no
    # production caller pays (stem ablation, docs/perf_notes.md).
    seg_bg = jnp.asarray(rng.randint(0, 12, (1, 3, H, W)).astype(np.int32))
    dep_bg = jnp.asarray((rng.rand(1, 3, H, W) * 50).astype(np.float32))
    x_bg = (seg_bg, dep_bg)
    bg_vars = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 36))
    )
    bg_vars = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.randn(*s.shape).astype(s.dtype) * 0.05),
        bg_vars,
    )
    # BN variances must be positive: fold_batchnorm_variables computes
    # gamma/sqrt(var+eps), and a randn-initialized var is negative ~half
    # the time -> NaN folded weights -> a NaN-saturated graph under test.
    bg_vars = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.abs(x) + 0.5
        if any(getattr(k, "key", None) == "var" for k in path) else x,
        bg_vars,
    )
    # Serving configuration: conv+BN folded (models/hardnet.py
    # fold_batchnorm_variables) — the BN-free inference graph.
    from panoptic_forecasting_tpu.models.hardnet import (
        fold_batchnorm_variables,
    )

    net_f = HarDNet(n_classes=11, folded=True, skip_stem0=True,
                    packed_stem=True,
                    packed_levels=1)  # BGModel's serving default (r05)
    bg_vars_f = fold_batchnorm_variables(bg_vars)
    from panoptic_forecasting_tpu.kernels.stem import onehot_stem_conv

    def bg_step(x, s):
        # Production consumer: argmax seg map for the fusion stage
        # (BGModel.predict), not raw logits. Serving path: the fused
        # one-hot Pallas stem (kernels/stem.py) computes assembly +
        # base_0 from the INT maps directly (the XLA one-hot + 36-ch
        # stride-2 conv costs ~6.5 ms; the kernel ~1.9 ms), then the
        # folded net runs from base_1 — exactly BGModel.forward's
        # folded-TPU route.
        seg, dep = x
        # Vary the int map per iteration: a loop-invariant seg lets XLA
        # hoist the stem out of the scan, which is NOT what production
        # does (each batch is fresh).
        seg = (seg + s.astype(jnp.int32)) % 13
        dn = (dep + 0.001 * s - 30.0) / 20.0  # assembled depth channels
        p0 = bg_vars_f["params"]["base_0"]["conv"]
        y0 = onehot_stem_conv(
            seg, dn, p0["kernel"], p0["bias"], num_classes=11
        )
        # return_argmax: CHW resize + in-graph argmax skips the
        # lane-padded (B, H, W, 11) full-res logits (~1 GB).
        return net_f.apply(bg_vars_f, y0, return_argmax=True)

    fn_bg = scan_loop(bg_step)
    results["bg_ms"] = _timed(fn_bg, (x_bg,), k) * 1e3
    _emit_stage("bg_ms", results["bg_ms"])
    _emit_roofline("bg_ms", fn_bg, (x_bg,), k, results["bg_ms"])

    # ---- 3. fg ----
    core = FGCore(rnn_hidden=128)
    enc_inp = jnp.asarray(rng.randn(N_INST, T_IN, 94).astype(np.float32))
    feats = jnp.asarray(
        rng.randn(N_INST, T_IN, 14, 14, 256).astype(np.float32)
    )
    odom_out = jnp.asarray(rng.randn(N_INST, T_OUT, 5).astype(np.float32))
    # jit the init: eager init through the tunneled attachment is one
    # ~0.5 s HTTP compile round-trip PER op (docs/perf_notes.md).
    fg_vars = jax.jit(
        lambda r: core.init(r, enc_inp, feats, odom_out, T_OUT)
    )(jax.random.PRNGKey(0))
    fn_fg = scan_loop(
        lambda x, s: core.apply(fg_vars, x + 0.001 * s, feats,
                                odom_out, T_OUT)
    )
    results["fg_ms"] = _timed(fn_fg, (enc_inp,), k) * 1e3
    _emit_stage("fg_ms", results["fg_ms"])
    _emit_roofline("fg_ms", fn_fg, (enc_inp,), k, results["fg_ms"])

    # ---- 4. fusion ----
    masks = jnp.asarray(rng.rand(N_INST, 28, 28).astype(np.float32))
    boxes = jnp.asarray((rng.rand(N_INST, 4) * [W, H, W, H]).astype(np.float32))
    depths_i = jnp.asarray((rng.rand(N_INST) * 50 + 2).astype(np.float32))
    ids = jnp.asarray(np.arange(1, N_INST + 1).astype(np.int32) + 26000)
    valid_i = jnp.ones((N_INST,), bool)
    bg_lab = jnp.asarray(rng.randint(0, 11, (H, W)).astype(np.int32))
    bg_dep = jnp.asarray((rng.rand(H, W) * 80 + 2).astype(np.float32))

    def fuse(m, s):
        seg_out, dep_out = paste_and_composite(
            m + 0.0001 * s, boxes, depths_i, ids, valid_i, bg_lab, bg_dep,
            img_h=H, img_w=W, threshold=0.5, use_depth=True,
        )
        return seg_out, dep_out

    fn_fuse = scan_loop(fuse)
    results["fusion_ms"] = _timed(fn_fuse, (masks,), k) * 1e3
    _emit_stage("fusion_ms", results["fusion_ms"])
    _emit_roofline("fusion_ms", fn_fuse, (masks,), k, results["fusion_ms"])

    # Combined-canvas pc (the reference model's no-ind predict,
    # pc_transform_model.py:33-150): a separate model benchmark, measured
    # last because the staged chain above does not consume it.
    fn_pc = scan_loop(pc_forecast)
    results["pc_ms"] = _timed(fn_pc, (depth,), k) * 1e3
    _emit_stage("pc_ms", results["pc_ms"])
    _emit_roofline("pc_ms", fn_pc, (depth,), k, results["pc_ms"])

    # Staged chain = per-frame pc canvases (what bg consumes) + bg + fg
    # + fusion; the combined-canvas pc_ms is a separate model benchmark.
    results["total_ms"] = (
        results["pc_stage_ms"] + results["bg_ms"] + results["fg_ms"]
        + results["fusion_ms"]
    )
    results["e2e_fps"] = 1000.0 / results["total_ms"]
    return results


def measure_fused(k: int = K) -> float:
    """ms/frame for the single-jit fused forecast (eval/forecast.py):
    per-frame pc reprojection -> one-hot+HarDNet -> FG rollout -> in-graph
    fusion, one XLA program, zero host hops."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from panoptic_forecasting_tpu.eval.forecast import build_forecast_step
    from panoptic_forecasting_tpu.geometry import (
        rdf_T_flu,
        unicycle_now_T_prev,
    )
    from panoptic_forecasting_tpu.models.base import merge_variables
    from panoptic_forecasting_tpu.models.bg import BGModel

    rng = np.random.RandomState(0)
    _, fg_model, fg_params, fg_state, batch = ge._build_fg(batch_size=8)
    fg_vars = merge_variables(fg_params, fg_state)
    inp = batch["inputs"]
    n = np.asarray(inp["trajectories"]).shape[0]
    fg_in = {k2: np.asarray(v)[None] for k2, v in inp.items()}
    fg_in["output_inds"] = np.asarray(batch["labels"]["output_inds"])[None]
    fg_in["valid"] = np.ones((1, n), bool)
    out_t = int(np.asarray(batch["labels"]["trajectories"]).shape[1])

    seg = rng.randint(0, 11, size=(1, T_IN, H, W)).astype(np.int32)
    depth = (rng.rand(1, T_IN, H, W) * 50 + 2).astype(np.float32)
    K_m = np.array(
        [[INTR[0], 0, INTR[2]], [0, INTR[1], INTR[3]], [0, 0, 1]],
        np.float32,
    )
    E = (np.array(
        [[1, 0, 0, 0.3], [0, 1, 0, 0.0], [0, 0, 1, 1.2], [0, 0, 0, 1]],
        np.float32) @ rdf_T_flu()).astype(np.float32)
    Ts = np.asarray(
        unicycle_now_T_prev(
            np.array([8.0, 8.2, 8.4], np.float32),
            np.array([0.01, 0.0, -0.01], np.float32),
            0.18,
        ),
        np.float32,
    )
    pc_in = {
        "seg": jnp.asarray(seg),
        "depth": jnp.asarray(depth),
        "depth_mask": jnp.asarray(np.ones_like(depth, bool)),
        "intrinsics": jnp.asarray(K_m[None]),
        "extrinsics": jnp.asarray(E[None]),
        "target_T": jnp.asarray(Ts[None]),
    }
    bg_model = BGModel(
        {
            "model": {
                "num_inputs": T_IN,
                "convert2onehot": True,
                "use_depth_inps": True,
            },
            "data": {"num_classes": 11},
        }
    )
    bg_vars = jax.jit(
        lambda r: bg_model.init(
            r,
            {
                "inputs": {
                    "seg": jnp.zeros((1, T_IN, 64, 128), jnp.int32),
                    "depth": jnp.zeros((1, T_IN, 64, 128)),
                    "depth_mask": jnp.zeros((1, T_IN, 64, 128), bool),
                }
            },
        )
    )(jax.random.PRNGKey(1))
    # Serving configuration: folded conv+BN inference graph.
    bg_vars = bg_model.fold_variables(bg_vars)
    step = build_forecast_step(
        bg_model, fg_model, height=H, width=W, out_t=out_t
    )
    fg_in = {k2: jnp.asarray(v) for k2, v in fg_in.items()}

    # Everything is a real argument, not a closure: multi-MB constants
    # embedded in the HLO blow up compile time and appear to defeat the
    # persistent compile cache.
    @jax.jit
    def loop(bg_vars, fg_vars, pc_in, fg_in, depth, salt):
        def body(c, i):
            out = step(
                bg_vars, fg_vars,
                dict(pc_in, depth=depth + 0.001 * (i + salt)), fg_in,
            )
            return c + out["panoptic"].ravel()[::65536].astype(
                jnp.float32
            ).sum(), ()
        return jax.lax.scan(
            body, jnp.float32(0), jnp.arange(k, dtype=jnp.float32)
        )[0]

    args = (bg_vars, fg_vars, pc_in, fg_in, jnp.asarray(depth))
    ms = _timed(loop, args, k) * 1e3
    _emit_roofline("fused", loop, args, k, ms)
    return ms


# ---------------------------------------------------------------------------
# Baseline: the reference's own code, CPU torch
# ---------------------------------------------------------------------------


def measure_train_step(k: int = 10, b: int = 8, t_in: int = 3,
                       crop: int = 800, packed: bool = False) -> dict:
    """ms/step of the production BG TRAINING step (heaviest train program):
    FCHarDNet-70 forward+backward+SGD(momentum, wd, clip-norm 5) at the
    shipped config's shapes (configs/bg/bg_train.yaml: batch 8, crop 800,
    3 reprojected frames, 36-ch one-hot+depth assembly, 11 classes, BN in
    train mode). K steps run inside one jitted scan carrying
    (params, batch_stats, opt_state), with the seg maps perturbed per step
    so the one-hot assembly is not hoisted."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from panoptic_forecasting_tpu.models.base import split_variables
    from panoptic_forecasting_tpu.models.bg import BGModel
    from panoptic_forecasting_tpu.train.optim import build_optimizer

    cfg = {
        "task": "bg",
        "model": {"num_inputs": t_in, "convert2onehot": True,
                  "use_depth_inps": True, "hardnet": {},
                  "packed_train": packed},
        "data": {"num_classes": 11},
        "training": {"batch_size": b, "lr": 2.0e-3, "mom": 0.9,
                     "wd": 1.0e-4, "clip_grad_norm": 5.0},
    }
    model = BGModel(cfg)
    rng = np.random.RandomState(7)
    seg = jnp.asarray(rng.randint(0, 13, (b, t_in, crop, crop)), jnp.int32)
    dep = jnp.asarray(
        (rng.rand(b, t_in, crop, crop) * 40 + 1).astype(np.float32)
    )
    dmask = jnp.asarray(rng.rand(b, t_in, crop, crop) > 0.2)
    lab_np = rng.randint(0, 11, (b, crop, crop))
    lab_np[rng.rand(b, crop, crop) > 0.9] = 255
    lab = jnp.asarray(lab_np, jnp.int32)
    batch0 = {"inputs": {"seg": seg, "depth": dep, "depth_mask": dmask},
              "labels": {"seg": lab}}

    # jitted init: eager init through the tunnel pays ~0.5 s per op
    variables = jax.jit(lambda r: model.init(r, batch0))(
        jax.random.PRNGKey(0)
    )
    params, state = split_variables(variables)
    opt = build_optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def run_k(p, s, o, salt):
        def step(carry, i):
            p, s, o = carry
            bt = {"inputs": {"seg": (seg + i) % 13, "depth": dep + salt,
                             "depth_mask": dmask},
                  "labels": {"seg": lab}}

            def loss_fn(p, s):
                loss, _, new_s = model.loss(p, s, bt, train=True)
                return loss, new_s

            (loss, s), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p, s)
            updates, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, updates), s, o), loss

        (p, s, o), losses = jax.lax.scan(
            step, (p, s, o), jnp.arange(k, dtype=jnp.int32)
        )
        return losses[-1]

    _ = float(run_k(params, state, opt_state, np.float32(0)))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        _ = float(run_k(params, state, opt_state, np.float32(i + 1)))
        best = min(best, (time.perf_counter() - t0) / k)
    ms = best * 1e3
    out = {
        "bg_train_step_ms": round(ms, 3),
        "bg_train_imgs_per_s": round(b * 1000.0 / ms, 2),
    }
    # MFU/roofline of the heaviest train program in the driver record
    # itself (VERDICT r04 item 6), from the same compiled executable.
    ca = _cost_analysis(run_k, (params, state, opt_state), k)
    if ca:
        rf = _roofline_fields(*ca, ms)
        out["bg_train_mfu_pct"] = rf["mfu_pct"]
        out["bg_train_achieved_gbps"] = rf["achieved_gbps"]
        out["bg_train_gflops_per_step"] = rf["gflops"]
    return out


def measure_train_step_odom(k: int = 20, b: int = 32) -> dict:
    """ms/step of the shipped odom TRAINING step (configs/odom/
    odom_train.yaml: GRU-128, bs 32, 9-in/9-out, Adam 5e-4, clip-norm 5,
    normalized MSE). Reference step: training/train.py:196-222 on
    odom_model.py:104-115."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from panoptic_forecasting_tpu.models.base import split_variables
    from panoptic_forecasting_tpu.models.odom import OdomModel
    from panoptic_forecasting_tpu.train.optim import build_optimizer

    cfg = {
        "task": "odom",
        "model": {"predict_type": "direct", "normalize_input": True,
                  "use_normalized_loss": True, "rnn_hidden": 128,
                  "loss_fn": "mse"},
        "data": {"output_len": 9},
        "training": {"batch_size": b, "use_adam": True, "lr": 5.0e-4,
                     "clip_grad_norm": 5.0},
    }
    model = OdomModel(cfg)
    rng = np.random.RandomState(3)
    x = jnp.asarray((rng.rand(b, 9, 2) * 8).astype(np.float32))
    y = jnp.asarray((rng.rand(b, 9, 2) * 8).astype(np.float32))
    batch0 = {"inputs": {"odometry": x}, "labels": {"odometry": y}}
    variables = jax.jit(lambda r: model.init(r, batch0))(
        jax.random.PRNGKey(0)
    )
    params, state = split_variables(variables)
    opt = build_optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def run_k(p, o, salt):
        def step(carry, i):
            p, o = carry
            bt = {"inputs": {"odometry": x + 0.001 * (i + salt)},
                  "labels": {"odometry": y}}

            def loss_fn(p):
                loss, _, _ = model.loss(p, state, bt, train=True)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(
            step, (p, o), jnp.arange(k, dtype=jnp.float32)
        )
        return losses[-1]

    _ = float(run_k(params, opt_state, np.float32(0)))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        _ = float(run_k(params, opt_state, np.float32(i + 1)))
        best = min(best, (time.perf_counter() - t0) / k)
    ms = best * 1e3
    return {
        "odom_train_step_ms": round(ms, 3),
        "odom_train_seqs_per_s": round(b * 1000.0 / ms, 2),
    }


def measure_train_step_fg(k: int = 10) -> dict:
    """ms/step of the shipped fg TRAINING step (configs/fg/fg_train.yaml:
    bs 32 instance tracks, GRU-128, 2-layer ConvLSTM over 256x14x14
    feats, traj 0.1 + distill 1.0 losses, Adam 5e-4, clip-norm 5).
    Batch comes through the real fg_instance pipeline (synthetic fixture)
    tiled up to batch 32. Reference step: training/train.py:196-222 on
    fg_model.py:341-386."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from panoptic_forecasting_tpu.train.optim import build_optimizer

    b = 32
    cfg, model, params, state, batch = ge._build_fg(
        batch_size=8, model_overrides={"rnn_hidden": 128}
    )
    cfg = dict(cfg, training=dict(cfg["training"], batch_size=b))

    def tile_to_b(x):
        x = np.asarray(x)
        reps = (b + x.shape[0] - 1) // x.shape[0]
        return jnp.asarray(np.tile(x, (reps,) + (1,) * (x.ndim - 1))[:b])

    batch = jax.tree_util.tree_map(tile_to_b, batch)
    opt = build_optimizer(cfg)
    opt_state = opt.init(params)
    # Per-step perturbation: shift trajectories (the cheap-to-vary input)
    # so nothing hoists out of the scan.
    base_tr = batch["inputs"]["trajectories"]

    @jax.jit
    def run_k(p, o, salt):
        def step(carry, i):
            p, o = carry
            bt = {
                "inputs": dict(batch["inputs"],
                               trajectories=base_tr + 0.01 * (i + salt)),
                "labels": batch["labels"],
            }

            def loss_fn(p):
                loss, _, _ = model.loss(p, state, bt, train=True)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(
            step, (p, o), jnp.arange(k, dtype=jnp.float32)
        )
        return losses[-1]

    _ = float(run_k(params, opt_state, np.float32(0)))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        _ = float(run_k(params, opt_state, np.float32(i + 1)))
        best = min(best, (time.perf_counter() - t0) / k)
    ms = best * 1e3
    return {
        "fg_train_step_ms": round(ms, 3),
        "fg_train_tracks_per_s": round(b * 1000.0 / ms, 2),
    }


def _install_reference_stubs():
    import collections
    import types

    if "cityscapescripts" in sys.modules:  # pragma: no cover
        return
    if "cityscapesscripts.helpers.labels" not in sys.modules:
        from panoptic_forecasting_tpu.data.cityscapes import LABELS

        CsLabel = collections.namedtuple(
            "Label",
            ["name", "id", "trainId", "category", "categoryId",
             "hasInstances", "ignoreInEval", "color"],
        )
        cs = [
            CsLabel(l.name, l.id, l.train_id, l.category, 0,
                    l.has_instances, l.ignore_in_eval, l.color)
            for l in LABELS
        ]
        mod = types.ModuleType("cityscapesscripts.helpers.labels")
        mod.labels = cs
        mod.id2label = {l.id: l for l in cs}
        mod.trainId2label = {l.trainId: l for l in cs}
        mod.name2label = {l.name: l for l in cs}
        pkg = types.ModuleType("cityscapesscripts")
        helpers = types.ModuleType("cityscapesscripts.helpers")
        pkg.helpers = helpers
        helpers.labels = mod
        sys.modules["cityscapesscripts"] = pkg
        sys.modules["cityscapesscripts.helpers"] = helpers
        sys.modules["cityscapesscripts.helpers.labels"] = mod
    if "torchvision" not in sys.modules:
        import types as _t

        tv = _t.ModuleType("torchvision")
        tvt = _t.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _baseline_pc(torch, rng):
    """The reference pc hot path (pc_transform_model.py:26-150) on CPU:
    torch backproject/transform/project; the torch_scatter.scatter_min
    z-buffer (CUDA-only here) replaced by NumPy minimum.at with identical
    4-neighbor splat semantics."""
    depth = torch.from_numpy(rng.rand(T_IN, H, W).astype(np.float32) * 50 + 2)
    seg = torch.from_numpy(
        rng.randint(0, 19, size=(T_IN, H, W)).astype(np.int64)
    )
    K_m = torch.tensor(
        [[INTR[0], 0, INTR[2]], [0, INTR[1], INTR[3]], [0, 0, 1]],
        dtype=torch.float32,
    )
    Tm = torch.eye(4).unsqueeze(0).repeat(T_IN, 1, 1)
    Tm[:, 0, 3] = torch.tensor([1.44, 2.95, 4.4])  # fwd ego translations

    t0 = time.perf_counter()
    v, u = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    ones = torch.ones_like(u)
    pix = torch.stack([u, v, ones], dim=-1).reshape(-1, 3)
    Kinv = torch.inverse(K_m)
    pts = (pix @ Kinv.T).unsqueeze(0) * depth.reshape(T_IN, -1, 1)
    hom = torch.cat([pts, torch.ones(T_IN, pts.shape[1], 1)], dim=-1)
    pts2 = torch.einsum("tij,tnj->tni", Tm, hom)[..., :3]
    proj = pts2 @ K_m.T
    z = proj[..., 2].clamp(min=1e-8)
    uv = proj[..., :2] / z.unsqueeze(-1)
    # 4-neighbor z-buffer splat (NumPy stand-in for torch_scatter CUDA)
    uvn = uv.reshape(-1, 2).numpy()
    zn = z.reshape(-1).numpy()
    labn = seg.reshape(-1).numpy()
    best = np.full(H * W, np.inf, np.float32)
    out_lab = np.zeros(H * W, labn.dtype)
    for cu in (np.floor, np.ceil):
        for cv in (np.floor, np.ceil):
            ui = np.clip(cu(uvn[:, 0]).astype(np.int64), 0, W - 1)
            vi = np.clip(cv(uvn[:, 1]).astype(np.int64), 0, H - 1)
            flat = vi * W + ui
            np.minimum.at(best, flat, zn)
    for cu in (np.floor, np.ceil):
        for cv in (np.floor, np.ceil):
            ui = np.clip(cu(uvn[:, 0]).astype(np.int64), 0, W - 1)
            vi = np.clip(cv(uvn[:, 1]).astype(np.int64), 0, H - 1)
            flat = vi * W + ui
            won = zn == best[flat]
            out_lab[flat[won]] = labn[won]
    return (time.perf_counter() - t0), float(out_lab.sum())


def measure_reference_cpu() -> dict:
    """Time the reference's own modules at bench shapes on this host's CPU."""
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        return _measure_reference_cpu()


def _measure_reference_cpu() -> dict:
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    _install_reference_stubs()
    from panoptic_forecasting.models.bg import hardnet as ref_hardnet
    from panoptic_forecasting.models.fg.fg_model import FGModel
    from panoptic_forecasting.models.fg import model_utils as ref_mu

    rng = np.random.RandomState(0)
    results = {}

    # pc (best of 2 — single-core CPU timings jitter ~2x)
    results["pc_ms"] = min(
        _baseline_pc(torch, rng)[0] for _ in range(2)
    ) * 1e3

    # bg: FCHarDNet-70, 36-ch stem / 11-class head like the shipped config
    net = ref_hardnet.hardnet(n_classes=19).eval()
    net.expand_first_layer(36)
    net.expand_last_layer(11)
    x = torch.from_numpy(rng.rand(1, 36, H, W).astype(np.float32))
    with torch.no_grad():
        best = 1e12
        for _ in range(2):
            t0 = time.perf_counter()
            _ = net(x)
            best = min(best, time.perf_counter() - t0)
        results["bg_ms"] = best * 1e3

    # fg: reference FGModel forward (coupled GRU/ConvLSTM + mask head)
    stats2 = (torch.zeros(8), torch.ones(8))
    params = {
        "model": {
            "rnn_hidden": 128, "loss_type": "smoothl1",
            "instance_feat_channels": 8, "traj_feat_channels": 16,
            "instance_feat_hidden": 64, "use_odometry": True,
            "rnn_type": "gru", "use_depth_inp": True,
            "use_depth_sorting": True, "num_traj_out_layers": 1,
            "num_convlstm_layers": 2, "mask_head": {},
        },
        "data": {
            "odom_size": 5,
            "norm_params": stats2,
            "depth_norm_params": (torch.zeros(2), torch.ones(2)),
            "odom_norm_params": (torch.zeros(5), torch.ones(5)),
        },
    }
    torch.manual_seed(0)
    fg = FGModel(params).eval()
    n = N_INST
    trajs = torch.from_numpy(rng.randn(n, T_IN, 8).astype(np.float32))
    bmask = torch.ones(n, T_IN)
    bvmask = torch.ones(n, T_IN)
    feats = torch.from_numpy(
        rng.randn(n, T_IN, 256, 14, 14).astype(np.float32)
    )
    out_inds = torch.full((n,), T_OUT - 1, dtype=torch.long)
    odom = torch.from_numpy(
        rng.randn(n, T_IN + T_OUT, 5).astype(np.float32)
    )
    depths = torch.from_numpy(rng.randn(n, T_IN, 2).astype(np.float32))
    dmask = torch.ones(n, T_IN)
    classes = torch.from_numpy(rng.randint(0, 8, n).astype(np.int64))
    with torch.no_grad():
        t0 = time.perf_counter()
        _ = fg(trajs, bmask, bvmask, feats, out_inds, odom, depths, dmask,
               classes, T_OUT)
        results["fg_ms"] = (time.perf_counter() - t0) * 1e3

    # fusion: per-instance paste_mask + depth-sorted composite
    # (fg_model.py:557-588 inner loop, reference model_utils.paste_mask)
    masks = torch.from_numpy(rng.rand(n, 28, 28).astype(np.float32))
    boxes = torch.from_numpy(
        (rng.rand(n, 4) * [W, H, W, H]).astype(np.float32)
    )
    inst_depths = rng.rand(n) * 50 + 2
    bg_lab = torch.from_numpy(rng.randint(0, 11, (H, W)).astype(np.int64))
    bg_dep = torch.from_numpy((rng.rand(H, W) * 80 + 2).astype(np.float32))
    with torch.no_grad():
        t0 = time.perf_counter()
        order = np.argsort(-inst_depths)
        seg_c = bg_lab.clone()
        dep_c = bg_dep.clone()
        for idx, j in enumerate(order):
            pasted = ref_mu.paste_mask(
                masks[j].reshape(1, 1, 28, 28), boxes[j].unsqueeze(0),
                H, W, True,
            )[0, 0]
            on = (pasted >= 0.5) & (
                torch.tensor(inst_depths[j], dtype=torch.float32) < dep_c
            )
            seg_c[on] = 26000 + idx
            dep_c[on] = float(inst_depths[j])
        results["fusion_ms"] = (time.perf_counter() - t0) * 1e3

    results["total_ms"] = sum(results.values())
    results["e2e_fps"] = 1000.0 / results["total_ms"]
    return results


# Driver-verified round-2 measurement of the reference's own code on this
# host's CPU (BENCH_r02.json, committed). The baseline does not change
# round-to-round; a live re-measure only runs when wall-clock budget
# remains, otherwise these stand in (labeled as cached).
_CACHED_BASELINE = {
    "e2e_fps": 0.1986,
    "pc_ms": 1632.0, "bg_ms": 1811.8, "fg_ms": 1409.5, "fusion_ms": 181.3,
}
_BASELINE_DESC = (
    "reference's own code (/root/reference) on this host's CPU, same "
    "stages/shapes; torch_scatter CUDA z-buffer replaced by an equivalent "
    "NumPy scatter-min"
)

# Most recent SELF-measured numbers (this bench, run by the builder on the
# attached v5e; see docs/perf_notes.md round-4 section for the per-op trace
# decomposition). NOT driver-verified — attached to the record only when
# the live measurement fails to land (e.g. a tunnel outage; observed
# outages run 7+ hours), so an outage-time record still says what the code
# measured last instead of a bare -1. The headline ``value`` stays -1 in
# that case: only live numbers count.
def _prior_verified() -> dict:
    """Latest driver-captured headline from the BENCH_r*.json the driver
    writes at the repo root — read at runtime so it can never go stale,
    and emitted under ``unverified_``-prefixed keys so no parser can
    mistake it for a live measurement (advisor r04). Returns a pointer
    record when no prior driver file parsed."""
    import glob as _glob

    best_n, parsed, src = -1, None, None
    for path in _glob.glob(os.path.join(os.path.dirname(__file__) or ".",
                                        "BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            p = rec.get("parsed") or {}
            n = int(rec.get("n", -1))
            if float(p.get("value", -1)) > 0 and n > best_n:
                best_n, parsed, src = n, p, os.path.basename(path)
        except (ValueError, OSError):
            continue
    out = {"caveat": "prior round's driver-verified numbers, NOT measured "
                     "in this run; see PROGRESS.jsonl / docs/perf_notes.md"}
    if parsed is None:
        out["source"] = "none parsed; see docs/perf_notes.md"
        return out
    out["source"] = src
    for key in ("fused_ms", "fused_fps", "staged_fps", "stages_ms",
                "bg_train_step_ms", "bg_train_imgs_per_s"):
        if key in parsed:
            out[f"unverified_{key}"] = parsed[key]
    return out

# Global wall-clock budget. The round-3 bench was killed by the driver
# with ZERO output (BENCH_r03.json rc=124) because its worst case was
# ~75 min of silence. Everything below subtracts elapsed time from every
# later phase and prints+flushes a complete headline record after each
# phase, so whenever the run is killed the last complete line stands.
# 840 s: the round-2 bench ran >=10 min to rc=0, so the driver tolerates
# at least that; staying near it keeps a clean exit likely while the
# flushed per-phase records cover a harsher deadline.
BUDGET_S = float(os.environ.get("PF_BENCH_BUDGET_S", "840"))
_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


CANARY_LINE = '{"canary": 1}'
# How long a fresh child may stay COMPLETELY silent before it is judged
# wedged. Every measurement mode prints CANARY_LINE right after its
# first trivial device op, well before any big compile, so silence past
# this window is the known first-device-op hang, not a slow compile.
CANARY_S = float(os.environ.get("PF_BENCH_CANARY_S", "150"))


def _emit_canary() -> None:
    """First-device-op liveness marker for measurement subprocesses."""
    import jax.numpy as jnp

    assert float(jnp.ones(2).sum()) == 2.0
    print(CANARY_LINE, flush=True)


def _run_tpu_subprocess(mode: str, timeout: float, retries: int = 0,
                        _argv=None, _canary_s: float | None = None):
    """Run a TPU measurement in a subprocess with a timeout.

    The tunneled attachment occasionally hangs a fresh process's first
    device call (especially right after another TPU process exited) —
    observed repeatedly, sometimes for 10+ minutes. Children print
    ``CANARY_LINE`` right after their first device op; a child still
    silent after ``CANARY_S`` is wedged and gets killed + retried
    immediately instead of burning the whole phase deadline. Returns
    ALL stdout lines produced (even on timeout/kill, so streamed
    per-stage records survive), or [].

    ``_argv`` / ``_canary_s`` exist for the unit tests (fake children).
    """
    import subprocess

    import os as _os
    import selectors

    canary_s = CANARY_S if _canary_s is None else _canary_s
    out: list[str] = []
    for attempt in range(retries + 1):
        deadline = time.monotonic() + max(10, timeout)
        proc = subprocess.Popen(
            _argv or [sys.executable, "-u", __file__, mode],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
        fd = proc.stdout.fileno()
        lines: list[str] = []
        canary_deadline = time.monotonic() + canary_s
        wedged = False
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        buf = b""
        while True:
            now = time.monotonic()
            if now >= deadline or (not lines and now >= canary_deadline):
                wedged = not lines
                proc.kill()
                break
            if not sel.select(timeout=min(5.0, deadline - now)):
                continue
            chunk = _os.read(fd, 65536)
            if chunk == b"":
                break  # EOF: child exited
            buf += chunk
            while b"\n" in buf:
                ln, buf = buf.split(b"\n", 1)
                ln = ln.decode("utf-8", "replace").strip()
                if ln:
                    lines.append(ln)
        sel.close()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        out = [ln for ln in lines if ln != CANARY_LINE]
        if proc.returncode == 0 and out:
            return out
        if attempt < retries:
            # A wedged child never touched the chip — retry immediately;
            # otherwise give the chip/tunnel a moment to settle.
            if not wedged:
                time.sleep(15)
    return out


def _tpu_reachable(patience_s: float = 240, timeout: float | None = None) -> bool:
    """Pre-flight: can a fresh process complete one device op?

    When the tunnel is down, every measurement subprocess burns its full
    timeout. Tunnel outages are usually transient (docs/perf_notes.md,
    extended-outage notes), so probes repeat every ~20 s until one
    succeeds or ``patience_s`` elapses.

    Two hard-won rules (round-4 dress rehearsal, 2026-08-20):

    * ``timeout`` must exceed a SLOW-BUT-ALIVE tunnel's first-op latency
      — 69.5 s was measured on a probe that succeeded; at the old 60 s
      the whole bench declared a working chip unreachable and burned its
      entire budget probing. It defaults to ``CANARY_S``: any tunnel a
      measurement child would survive must also pass the pre-flight.
    * No pipes + ``subprocess.run``: after the kill it blocks in
      ``communicate()`` until every inheritor of the pipe exits, and the
      axon plugin forks helpers — a "60 s" probe cycle was observed
      overrunning by minutes. Output goes to a temp file and the kill
      hits the whole process group, so a cycle is strictly bounded.
    """
    import signal
    import subprocess
    import tempfile

    if timeout is None:
        timeout = CANARY_S
    deadline = time.monotonic() + patience_s

    def _kill_group(proc):
        """Bounded teardown of the probe's whole session: killpg, fall
        back to killing the direct child if the group kill is refused,
        and never wait unboundedly (advisor r04)."""
        for kill in (lambda: os.killpg(proc.pid, signal.SIGKILL),
                     proc.kill):
            try:
                kill()
            except (ProcessLookupError, PermissionError):
                pass
            try:
                proc.wait(timeout=10)
                return
            except subprocess.TimeoutExpired:
                continue

    while True:
        # A cycle may exceed patience_s by at most 30 s: the per-probe
        # wait is capped by the remaining patience (+grace) so the last
        # cycle cannot eat a full CANARY_S past the deadline and starve
        # the stages phase downstream (advisor r04).
        this_timeout = min(
            timeout, max(deadline - time.monotonic(), 0) + 30
        )
        with tempfile.TemporaryFile() as fout:
            proc = subprocess.Popen(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.ones(3).sum()))"],
                stdout=fout, stderr=subprocess.DEVNULL,
                start_new_session=True,
            )
            try:
                proc.wait(timeout=this_timeout)
            except subprocess.TimeoutExpired:
                pass
            # ALWAYS kill the probe's session, success included: axon
            # helper processes forked by the probe can outlive it holding
            # the TPU attachment — the post-exit wedge condition
            # _run_tpu_subprocess documents (next child's first device op
            # hangs).
            _kill_group(proc)
            fout.seek(0)
            if proc.returncode == 0 and fout.read().strip():
                return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(20)


def _emit(record: dict) -> None:
    print(json.dumps(record), flush=True)


def _build_record(stages: dict, fused: dict, train: dict,
                  base: dict, base_desc: str, note: str = "",
                  roofline: dict | None = None) -> dict:
    chain = ("pc_stage_ms", "bg_ms", "fg_ms", "fusion_ms")
    record = {
        "metric": "e2e_forecast_fps",
        "value": -1.0,
        "unit": "frames/sec (pc+bg+fg+fusion panoptic forecast, 1024x2048)",
        "stages_ms": {k2: round(v, 3) for k2, v in stages.items()},
    }
    staged_fps = None
    if all(s in stages for s in chain):
        staged_fps = 1000.0 / sum(stages[s] for s in chain)
        record["staged_fps"] = round(staged_fps, 3)
    if fused.get("fused_ms", -1.0) > 0:
        record["fused_ms"] = round(fused["fused_ms"], 3)
        record["fused_fps"] = round(1000.0 / fused["fused_ms"], 3)
    # Headline = the fastest serving path: the single-jit fused forecast
    # (eval/forecast.py — one XLA program for pc+bg+fg+fusion) when
    # measured, else the staged chain.
    best = max(
        [staged_fps or -1.0, record.get("fused_fps", -1.0)]
    )
    if best > 0:
        record["value"] = round(best, 3)
    record.update(train)
    record["vs_baseline"] = (
        round(best / base["e2e_fps"], 2) if best > 0 else -1.0
    )
    record["baseline_fps"] = round(base["e2e_fps"], 4)
    record["baseline_stages_ms"] = {
        s: round(base[s], 1)
        for s in ("pc_ms", "bg_ms", "fg_ms", "fusion_ms")
    }
    record["baseline"] = base_desc
    if roofline:
        # Per-stage achieved TFLOP/s + GB/s + %-of-roofline from the
        # compiled programs' own XLA cost analysis (VERDICT r04 item 6):
        # utilization lives in the driver record, not just perf_notes.
        record["roofline"] = {
            name: dict(v) for name, v in sorted(roofline.items())
        }
    if note:
        record["note"] = note
    if best <= 0:
        # No live headline landed (tunnel outage / wedge): carry the last
        # driver-verified numbers, clearly labeled and key-prefixed, so
        # the record is not a bare -1. ``value`` stays -1 — only live
        # numbers count.
        record["last_self_measured"] = _prior_verified()
    return record


def _parse_stream(lines: list[str], stages: dict, misc: dict,
                  roofline: dict | None = None) -> None:
    """Fold streamed child lines into the stage/misc/roofline dicts."""
    for ln in lines:
        try:
            obj = json.loads(ln)
        except ValueError:
            continue
        if not isinstance(obj, dict):
            continue
        if "stage" in obj and "ms" in obj:
            stages[obj["stage"]] = float(obj["ms"])
        elif "roofline_stage" in obj:
            if roofline is not None:
                name = obj.pop("roofline_stage")
                roofline[name] = obj
        else:  # the child's final full dict, or train-step keys
            misc.update(obj)


def main() -> None:
    stages: dict = {}
    fused: dict = {}
    train: dict = {}
    roofline: dict = {}
    base = dict(_CACHED_BASELINE)
    base_desc = _BASELINE_DESC + " (cached from driver-verified BENCH_r02)"

    _emit(_build_record(stages, fused, train, base, base_desc,
                        note="startup — no measurement landed yet"))

    # Probe until the tunnel answers or only a minimal warm-cache stages
    # attempt would still fit (~270 s reserve: observed warm-cache stages
    # ~90-150 s + emits). Outages are often transient (docs/perf_notes.md)
    # and giving up early wastes budget that costs nothing to spend
    # waiting — a late recovery can still land the headline.
    if not _tpu_reachable(patience_s=min(90.0, _remaining() - 270)):
        _emit(_build_record(
            stages, fused, train, base, base_desc,
            note="TPU attachment not answering; continuing to probe "
                 "while budget lasts — see bench.py _tpu_reachable"))
        if not _tpu_reachable(patience_s=_remaining() - 270):
            _emit(_build_record(
                stages, fused, train, base, base_desc,
                note="TPU attachment unreachable for the whole budget "
                     "(device-op probes kept failing; tunnel down)"))
            return

    def run_stages():
        # Streamed per-stage lines survive a deadline kill, and the phase
        # runs up to two attempts with SHORT deadlines — a tunnel stall
        # mid-run (observed: the child hung on its 3rd stage for 8 min on
        # a warm cache) then costs one short attempt, and the retry reuses
        # the persistent compile cache for every stage the first attempt
        # finished.
        # Retry only for the HEADLINE chain; the combined-canvas pc_ms is
        # a secondary model benchmark not worth a second attempt (a
        # validation run burned 150 s re-running everything for it and
        # starved the fused phase).
        chain = ("pc_stage_ms", "bg_ms", "fg_ms", "fusion_ms")
        misc: dict = {}
        for _attempt in range(2):
            if all(s in stages for s in chain) or _remaining() < 200:
                break
            lines = _run_tpu_subprocess(
                "--stages-only", timeout=min(_remaining() - 150, 360))
            _parse_stream(lines, stages, misc, roofline)
            _emit(_build_record(stages, fused, train, base, base_desc,
                                roofline=roofline))

    def run_fused():
        # The flagship number: the single-jit fused forecast. Cold compile
        # through the tunnel is ~3-4 min; warm cache ~30 s. Two attempts
        # so one tunnel stall doesn't lose the headline.
        for _attempt in range(2):
            if fused or _remaining() < 90:
                break
            flines = _run_tpu_subprocess(
                "--fused-only", timeout=min(_remaining() - 40, 360))
            _parse_stream(flines, {}, {}, roofline)
            for ln in reversed(flines):
                try:
                    fused["fused_ms"] = float(ln)
                    break
                except ValueError:
                    continue
            if fused:
                _emit(_build_record(stages, fused, train, base, base_desc,
                                    roofline=roofline))

    # Phase order is budget-adaptive. Truly ample budget: stages first
    # (their streamed lines are the salvage floor), then fused. Anything
    # less: fused FIRST — it is the headline (value = max(staged, fused))
    # and costs ~90 s warm. Two validation runs mis-ordered this: one
    # landed 27.8 staged and never ran the faster fused; another chose
    # stages-first at 540 s remaining, re-ran stages, and starved fused —
    # hence the 650 s bar.
    if _remaining() >= 650:
        run_stages()
        run_fused()
    else:
        run_fused()
        run_stages()

    # Supplementary: production bg TRAINING step throughput.
    if _remaining() > 120:
        tlines = _run_tpu_subprocess(
            "--train-only", timeout=min(_remaining() - 40, 360))
        _parse_stream(tlines, {}, train, roofline)
        train = {k2: v for k2, v in train.items() if "_train_" in k2}
        if train:
            _emit(_build_record(stages, fused, train, base, base_desc,
                                roofline=roofline))

    # Live CPU baseline re-measure only with ample budget left; the
    # cached record above otherwise stands.
    if _remaining() > 150:
        try:
            base = measure_reference_cpu()
            base_desc = _BASELINE_DESC
            _emit(_build_record(stages, fused, train, base, base_desc,
                                roofline=roofline))
        except Exception:  # pragma: no cover — cached baseline stands
            pass


if __name__ == "__main__":
    if "--fused-only" in sys.argv:
        _emit_canary()
        print(measure_fused())
    elif "--train-only" in sys.argv:
        _emit_canary()
        # One line per model, flushed in priority order, so a deadline
        # kill still salvages everything already printed. bg measures the
        # SHIPPED config's packed training graph (configs/bg/bg_train.yaml
        # packed_train: true — 1.26x the plain graph, r05).
        rec = measure_train_step(packed=True)
        rec["bg_train_graph"] = "packed (model.packed_train, r05)"
        print(json.dumps(rec), flush=True)
        print(json.dumps(measure_train_step_odom()), flush=True)
        print(json.dumps(measure_train_step_fg()), flush=True)
    elif "--stages-only" in sys.argv:
        _emit_canary()
        print(json.dumps(measure_tpu_stages()))
    else:
        main()
