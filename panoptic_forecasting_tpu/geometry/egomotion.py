"""Unicycle ego-motion model, jit/vmap-friendly.

Reference capability: ``data_utils.get_vehicle_now_T_prev`` (data_utils.py:117-165):
given (speed, yaw_rate, Δt), compute the SE(3) transform mapping points in the
*previous* vehicle frame into the *current* vehicle frame, assuming planar
constant-twist motion. The reference builds prev_T_now then inverts with
``np.linalg.inv``; here we compose the inverse in closed form (rigid inverse:
Rᵀ, −Rᵀt) and replace the data-dependent straight-line branch with a
numerically stable ``sinc`` formulation so the whole thing vmaps over
trajectories with no host sync.
"""

from __future__ import annotations

import jax.numpy as jnp

# Reference threshold for "driving straight" (~0.01 deg): data_utils.py:137.
_ANGLE_EPS = 0.000175


def unicycle_pose_delta(speed, yaw_rate, delta_t):
    """Planar pose of the vehicle *now* in the *previous* vehicle frame.

    Returns (x, y, theta) with the constant-twist arc model
        x = r·sin(ωΔt), y = r·(1−cos(ωΔt)), θ = ωΔt,  r = v/ω,
    degrading to straight-line motion (x = vΔt, y = θ = 0) below the
    reference's yaw-rate epsilon. All inputs broadcast.
    """
    speed = jnp.asarray(speed)
    yaw_rate = jnp.asarray(yaw_rate)
    delta_t = jnp.asarray(delta_t)
    straight = jnp.abs(yaw_rate) < _ANGLE_EPS
    # Guard the division; the straight branch result is selected where needed.
    w = jnp.where(straight, 1.0, yaw_rate)
    r = speed / w
    wt = yaw_rate * delta_t
    x = jnp.where(straight, delta_t * speed, r * jnp.sin(wt))
    y = jnp.where(straight, 0.0, r * (1.0 - jnp.cos(wt)))
    theta = jnp.where(straight, 0.0, wt)
    return x, y, theta


def unicycle_now_T_prev(speed, yaw_rate, delta_t):
    """SE(3) mapping previous-frame points into the current vehicle frame.

    Broadcasts over leading dims: scalar inputs give (4, 4); (N,) inputs give
    (N, 4, 4). Matches ``np.linalg.inv(prev_T_now)`` from the reference
    (data_utils.py:150-165) via the closed-form rigid inverse.
    """
    x, y, theta = unicycle_pose_delta(speed, yaw_rate, delta_t)
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    # prev_T_now has R = Rz(theta), t = (x, y, 0); inverse is (Rᵀ, −Rᵀ t).
    tx = -(c * x + s * y)
    ty = -(-s * x + c * y)
    rows = [
        jnp.stack([c, s, zero, tx], axis=-1),
        jnp.stack([-s, c, zero, ty], axis=-1),
        jnp.stack([zero, zero, one, zero], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def compose_transforms(transforms: jnp.ndarray) -> jnp.ndarray:
    """Left-fold a (T, 4, 4) stack into cumulative products.

    ``out[i] = transforms[i] @ transforms[i-1] @ ... @ transforms[0]`` — the
    cumulative target_T composition the pc_transform dataset builds per input
    frame (ref: pc_transform_dataset.py:103-186). Uses an associative scan so
    long chains stay parallel on device.
    """
    import jax

    def combine(a, b):
        # associative_scan applies combine(earlier, later) elementwise over
        # the leading axis; we want newer transforms applied on the left.
        # Geometry must stay exact f32 — don't let the MXU drop to bf16.
        return jnp.matmul(b, a, precision=jax.lax.Precision.HIGHEST)

    return jax.lax.associative_scan(combine, transforms)


# ---------------------------------------------------------------------------
# Host-side (numpy) twins for dataset code — single source of truth for the
# unicycle constants (straight-line threshold 1e-2 deg/s = 0.000175 rad/s,
# data_utils.py:123).
# ---------------------------------------------------------------------------

STRAIGHT_YAW_EPS = 0.000175


def unicycle_pose_delta_np(speed: float, yaw_rate: float, dt: float):
    """(dx, dy, dθ) of the vehicle over dt — numpy scalar twin of
    unicycle_pose_delta."""
    import numpy as _np

    if abs(yaw_rate) < STRAIGHT_YAW_EPS:
        return dt * speed, 0.0, 0.0
    r = speed / yaw_rate
    wt = yaw_rate * dt
    return r * _np.sin(wt), r * (1 - _np.cos(wt)), wt


def unicycle_now_T_prev_np(speed: float, yaw_rate: float, dt: float):
    """4x4 now_T_prev — numpy scalar twin of unicycle_now_T_prev."""
    import numpy as _np

    x, y, th = unicycle_pose_delta_np(speed, yaw_rate, dt)
    c, s = _np.cos(th), _np.sin(th)
    T = _np.eye(4)
    T[:2, :2] = [[c, s], [-s, c]]
    T[0, 3] = -(c * x + s * y)
    T[1, 3] = -(-s * x + c * y)
    return T
