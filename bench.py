"""Benchmark: hot-kernel throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current headline: full-resolution point-cloud reprojection + z-buffer splat
(the reference's torch_scatter CUDA hot path, pc_transform_model.py:100-139)
at Cityscapes scale — 3 input frames x 1024x2048, 4-neighbor fan-out (25.2M
splatted points per forecast frame). ``vs_baseline`` is the speedup over a
vectorized NumPy implementation of the same semantics measured on this
host's CPU (the reference publishes no numbers and its CUDA dependency is
unavailable here — BASELINE.md). As the build widens this will switch to
end-to-end panoptic forecast fps.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _numpy_splat(pix, depth4, label4, hw):
    """Vectorized NumPy z-buffer splat (same semantics as the kernel)."""
    best = np.full(hw, np.inf, np.float32)
    np.minimum.at(best, pix, depth4)
    won = depth4 == best[pix]
    n = pix.shape[0]
    win_idx = np.full(hw, n, np.int64)
    np.minimum.at(win_idx, pix[won], np.nonzero(won)[0])
    touched = win_idx < n
    out = np.zeros(hw, label4.dtype)
    out[touched] = label4[win_idx[touched]]
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from panoptic_forecasting_tpu.geometry import (
        backproject_pixels,
        project_points,
        unicycle_now_T_prev,
    )
    from panoptic_forecasting_tpu.geometry.camera import pixel_grid, transform_points
    from panoptic_forecasting_tpu.kernels import zbuffer_splat
    from panoptic_forecasting_tpu.kernels.zbuffer import splat_four_neighbors

    H, W, T = 1024, 2048, 3
    intr = (2262.52, 2265.30, 1096.98, 513.137)
    rng = np.random.RandomState(0)
    depth = (rng.rand(T, H, W).astype(np.float32) * 50 + 2).astype(np.float32)
    seg = rng.randint(0, 19, size=(T, H, W)).astype(np.int32)
    speeds = np.array([8.0, 8.2, 8.4], np.float32)
    yaws = np.array([0.01, 0.0, -0.01], np.float32)

    def forecast(depth, seg, speeds, yaws):
        uv = pixel_grid(H, W)
        Ts = unicycle_now_T_prev(speeds, yaws, 0.18)
        pts = backproject_pixels(uv[None], depth, intr)  # (T, H, W, 3)
        pts = jax.vmap(transform_points)(Ts.astype(jnp.float32), pts.reshape(T, -1, 3))
        uv2, z2 = project_points(pts, intr)
        valid = (
            (z2 > 0)
            & (uv2[..., 0] >= 0)
            & (uv2[..., 0] < W)
            & (uv2[..., 1] >= 0)
            & (uv2[..., 1] < H)
        )
        return zbuffer_splat(
            uv2.reshape(-1, 2),
            z2.reshape(-1),
            seg.reshape(-1),
            valid.reshape(-1),
            height=H,
            width=W,
        )

    # NOTE on methodology: this platform memoizes identical (executable,
    # args) calls, block_until_ready alone does not force execution through
    # the device tunnel, and host<->device transfers ride a network tunnel
    # (25 MB input upload ≈ 200 ms — would swamp the kernel). So: K
    # forecasts over on-device-perturbed inputs run inside ONE jitted scan
    # (distinct inputs defeat memoization, zero per-iter uploads), the clock
    # stops after fetching a scalar checksum, and the single tunnel RTT is
    # amortized over K.
    K = 20

    @jax.jit
    def bench_loop(depth, seg, speeds, yaws, salt):
        def body(carry, k):
            lab, dep = forecast(
                depth + 0.001 * (k.astype(jnp.float32) + salt), seg,
                speeds, yaws,
            )
            return carry + lab.astype(jnp.int32).sum() + dep.sum().astype(
                jnp.int32
            ), ()

        total, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(1, K + 1)
        )
        return total

    args = (jnp.asarray(depth), jnp.asarray(seg), jnp.asarray(speeds), jnp.asarray(yaws))
    _ = int(bench_loop(*args, jnp.float32(0)))  # compile + warm
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = int(bench_loop(*args, jnp.float32(i + 1)))
        times.append((time.perf_counter() - t0) / K)
    dt = min(times)
    fps = 1.0 / dt

    # NumPy baseline proxy: same splat semantics, one frame, on host CPU.
    uv_np = np.stack(
        np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32)),
        axis=-1,
    )
    uvs = np.tile(uv_np.reshape(-1, 2), (T, 1)) + rng.rand(T * H * W, 2) * 3
    depths_np = depth.reshape(-1)
    pix = np.asarray(
        splat_four_neighbors(jnp.asarray(uvs), H, W)
    ).astype(np.int64)
    d4 = np.tile(depths_np, 4)
    l4 = np.tile(seg.reshape(-1), 4)
    np_dt = 1e9
    for _ in range(3):  # best-of-3: conservative ratio on a noisy 1-core host
        t0 = time.perf_counter()
        _numpy_splat(pix, d4, l4, H * W)
        np_dt = min(np_dt, time.perf_counter() - t0)
    np_fps = 1.0 / np_dt

    print(
        json.dumps(
            {
                "metric": "pc_splat_fps",
                "value": round(fps, 3),
                "unit": "frames/sec (3x1024x2048 reproject+zbuffer)",
                "vs_baseline": round(fps / np_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
