"""Point-cloud transform model: reproject past segmentations into a future
camera using depth + cumulative ego-motion.

Reference capability: ``PCTransformModel.predict``
(models/pc_transform/pc_transform_model.py:26-150): back-project every pixel
of T input frames (K⁻¹·[u,v,1]·depth), camera(RDF)→vehicle(FLU) via
extrinsics, transform to the target frame's vehicle coords with cumulative
ego transforms, re-project with K, and z-buffer-splat each point to its 4
surrounding pixels keeping the nearest (torch_scatter.scatter_min).

TPU re-design: the whole 4-matrix chain collapses per (batch, frame) into
one affine map A = E⁻¹·target_T·E applied in camera space, precombined with
K⁻¹ so the per-pixel work is a fused multiply-add over a dense grid; the
z-buffer is the packed single-sort kernel (kernels/zbuffer.py). Everything
is one jit; no host↔device chatter per frame.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..kernels.zbuffer import zbuffer_splat
from .base import TaskModel

_HP = jax.lax.Precision.HIGHEST


def _reproject_points(depth, K, extrinsics, target_T, height, width):
    """Project every pixel of (T, H, W) depth into the target camera.

    Returns (uv (T, H, W, 2), z (T, H, W)).
    """
    t = depth.shape[0]
    E_inv = jnp.linalg.inv(extrinsics)
    K_inv = jnp.linalg.inv(K)
    # A maps homogeneous camera points at input frame i to the target camera.
    A = jnp.einsum("ij,tjk,kl->til", E_inv, target_T, extrinsics, precision=_HP)
    R = A[:, :3, :3]
    trans = A[:, :3, 3]
    B = jnp.einsum("tij,jk->tik", R, K_inv, precision=_HP)  # (T, 3, 3)

    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    p = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)  # (H, W, 3)
    # per-pixel: x_target = depth * (B @ p) + trans
    Bp = jnp.einsum("tij,hwj->thwi", B, p)  # (T, H, W, 3)
    pts = depth[..., None] * Bp + trans[:, None, None, :]
    z = pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    uv = jnp.stack(
        [
            pts[..., 0] / safe_z * K[0, 0] + K[0, 2],
            pts[..., 1] / safe_z * K[1, 1] + K[1, 2],
        ],
        axis=-1,
    )
    return uv, z


@functools.partial(
    jax.jit, static_argnames=("height", "width", "is_img", "method")
)
def pc_transform_predict(seg, depth, depth_mask, K, extrinsics, target_T,
                         *, height: int, width: int, is_img: bool = False,
                         method: str = "auto"):
    """Batched reprojection. seg (B,T,H,W[,3]), depth/depth_mask (B,T,H,W),
    K (B,3,3), extrinsics (B,4,4), target_T (B,T,4,4)."""

    def project_one(depth, depth_mask, K, extrinsics, target_T):
        uv, z = _reproject_points(depth, K, extrinsics, target_T, height, width)
        valid = (
            depth_mask.astype(bool)
            & (z > 0)
            & (uv[..., 0] >= 0)
            & (uv[..., 0] < width)
            & (uv[..., 1] >= 0)
            & (uv[..., 1] < height)
        )
        return uv, z, valid

    # vmap only the (elementwise) projection; the splat handles the batch
    # natively with per-batch group offsets — one sort + one placement for
    # the whole batch (a vmapped sort lowers to XLA's much slower batched
    # sort).
    uv, z, valid = jax.vmap(project_one)(
        depth, depth_mask, K, extrinsics, target_T
    )
    b = depth.shape[0]
    n = depth.shape[1] * height * width
    # Each input frame's H·W points are contiguous in the flattened
    # stream: sort them as independent runs (several small lax.sorts beat
    # one big one; the Pallas placement min-combines the runs).
    lab, dep = zbuffer_splat(
        uv.reshape(b, n, 2),
        z.reshape(b, n),
        seg.reshape((b, n) + seg.shape[4:]),
        valid.reshape(b, n),
        height=height,
        width=width,
        method=method,
        sort_runs=depth.shape[1],
    )
    return {"seg": lab, "depth": dep}


class PCTransformModel(TaskModel):
    """Stateless geometry engine (no learned parameters; predict-only)."""

    def __init__(self, cfg: Dict[str, Any], data_card=None):
        m = cfg.get("model", {})
        self.only_this_ind: Optional[int] = m.get("only_this_ind")
        self.is_img = bool(m.get("is_img"))
        self.method = m.get("zbuffer_method", "auto")

    def init(self, rng, batch):
        return {}

    def predict(self, variables, batch) -> Dict[str, Any]:
        inp = batch["inputs"]
        seg = jnp.asarray(inp["seg"])
        depth = jnp.asarray(inp["depth"])
        depth_mask = jnp.asarray(inp["depth_mask"])
        target_T = jnp.asarray(inp["target_T"], jnp.float32)
        if self.only_this_ind is not None:
            i = self.only_this_ind
            seg = seg[:, i : i + 1]
            depth = depth[:, i : i + 1]
            depth_mask = depth_mask[:, i : i + 1]
            target_T = target_T[:, i : i + 1]
        height, width = depth.shape[-2:]
        return pc_transform_predict(
            seg,
            depth,
            depth_mask,
            jnp.asarray(inp["intrinsics"], jnp.float32),
            jnp.asarray(inp["extrinsics"], jnp.float32),
            target_T,
            height=height,
            width=width,
            is_img=self.is_img,
            method=self.method,
        )

    def loss(self, params, state, batch, rng=None, train=True):
        raise NotImplementedError("pc_transform has no training objective")
