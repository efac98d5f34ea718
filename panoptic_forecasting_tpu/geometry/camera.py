"""Camera models: intrinsics, extrinsics, coordinate frames, (back)projection.

Reference capability: ``data_utils.py:52-114`` (Cityscapes camera JSON →
intrinsics 4-vector and vehicle←camera extrinsics; FLU↔RDF frame changes)
and the per-pixel backproject/reproject math inside
``pc_transform_model.py:41-78``. Re-designed as vectorized jnp functions that
operate on whole pixel grids at once so XLA can fuse them with the z-buffer
splat kernel.

Frames:
  RDF — camera optical frame: x-right, y-down, z-forward (OpenCV convention).
  FLU — vehicle frame: x-front, y-left, z-up.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Intrinsics(NamedTuple):
    """Pinhole intrinsics (fx, fy, u0, v0); all floats."""

    fx: float
    fy: float
    u0: float
    v0: float

    def as_vector(self) -> np.ndarray:
        return np.array([self.fx, self.fy, self.u0, self.v0], dtype=np.float64)


def intrinsics_from_cityscapes_camera(camera: dict) -> Intrinsics:
    """Parse a Cityscapes ``camera.json`` dict. Ref: data_utils.py:52-71."""
    k = camera["intrinsic"]
    fx, fy, u0, v0 = float(k["fx"]), float(k["fy"]), float(k["u0"]), float(k["v0"])
    if fx <= 0.0 or fy <= 0.0:
        raise ValueError(f"non-positive focal length in camera intrinsics: {k}")
    return Intrinsics(fx, fy, u0, v0)


def intrinsics_matrix(intr) -> np.ndarray:
    """[fx, fy, u0, v0] -> 3x3 K. Ref: data_utils.build_intrinsics_mat:207."""
    fx, fy, u0, v0 = (float(x) for x in tuple(intr))
    return np.array(
        [[fx, 0.0, u0], [0.0, fy, v0], [0.0, 0.0, 1.0]], dtype=np.float64
    )


def _affine(R: np.ndarray | None = None, t: np.ndarray | None = None) -> np.ndarray:
    T = np.eye(4, dtype=np.float64)
    if R is not None:
        T[:3, :3] = R
    if t is not None:
        T[:3, 3] = t
    return T


def rdf_T_flu() -> np.ndarray:
    """FLU point -> RDF coords (same origin). Ref: data_utils.py:100-105."""
    return _affine(R=np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64))


def flu_T_rdf() -> np.ndarray:
    """RDF point -> FLU coords (same origin). Ref: data_utils.py:109-114."""
    return _affine(R=np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64))


def _vehicle_T_camera_flu(camera: dict) -> np.ndarray:
    """FLU-camera -> vehicle transform from yaw/pitch/roll + xyz.

    ZYX Euler composition as in the Cityscapes calibration doc
    (ref: data_utils.py:170-203).
    """
    e = camera["extrinsic"]
    sy, cy = np.sin(e["yaw"]), np.cos(e["yaw"])
    sp, cp = np.sin(e["pitch"]), np.cos(e["pitch"])
    sr, cr = np.sin(e["roll"]), np.cos(e["roll"])
    R = np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ],
        dtype=np.float64,
    )
    t = np.array([e["x"], e["y"], e["z"]], dtype=np.float64)
    return _affine(R=R, t=t)


def extrinsics_from_cityscapes_camera(camera: dict) -> np.ndarray:
    """vehicle_T_camera for an RDF camera. Ref: data_utils.py:74-78."""
    return _vehicle_T_camera_flu(camera) @ flu_T_rdf()


# ---------------------------------------------------------------------------
# Batched (back)projection — the jnp compute path used by pc_transform.
# ---------------------------------------------------------------------------


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) grid of (u, v) pixel coordinates."""
    u = jnp.arange(width, dtype=dtype)
    v = jnp.arange(height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu, vv], axis=-1)


def backproject_pixels(uv: jnp.ndarray, depth: jnp.ndarray, intr) -> jnp.ndarray:
    """Pixels + depth -> 3D RDF camera points.

    uv: (..., 2) pixel coords; depth: (...,) metric z; intr: (fx, fy, u0, v0).
    Returns (..., 3) points with z = depth. Ref math: pc_transform_model.py:41-59.
    """
    fx, fy, u0, v0 = intr
    x = (uv[..., 0] - u0) / fx * depth
    y = (uv[..., 1] - v0) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def project_points(pts: jnp.ndarray, intr) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3D RDF points -> (uv (..., 2), depth (...,)).

    Division guards z≈0 with a tiny epsilon of the same sign so invalid points
    stay finite; callers mask on depth > 0. Ref math: pc_transform_model.py:71-78.
    """
    fx, fy, u0, v0 = intr
    z = pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    u = pts[..., 0] / safe_z * fx + u0
    v = pts[..., 1] / safe_z * fy + v0
    return jnp.stack([u, v], axis=-1), z


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (..., 3) points."""
    return pts @ T[:3, :3].T + T[:3, 3]
