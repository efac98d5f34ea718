import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panoptic_forecasting_tpu.geometry import (
    backproject_pixels,
    bbox_cwh_to_ulbr,
    bbox_ulbr_to_cwh,
    compose_transforms,
    extrinsics_from_cityscapes_camera,
    flu_T_rdf,
    intrinsics_matrix,
    project_points,
    rdf_T_flu,
    unicycle_now_T_prev,
    unicycle_pose_delta,
)
from panoptic_forecasting_tpu.geometry.camera import pixel_grid, transform_points


def test_bbox_roundtrip():
    boxes = np.random.RandomState(0).rand(5, 3, 4) * 100
    back = bbox_cwh_to_ulbr(bbox_ulbr_to_cwh(boxes))
    np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_bbox_known_values():
    b = np.array([10.0, 20.0, 30.0, 60.0])  # ulbr
    cwh = bbox_ulbr_to_cwh(b)
    np.testing.assert_allclose(cwh, [20.0, 40.0, 20.0, 40.0])


def test_flu_rdf_inverse():
    np.testing.assert_allclose(flu_T_rdf() @ rdf_T_flu(), np.eye(4), atol=1e-12)


def test_flu_rdf_axes():
    # RDF forward (z) is FLU front (x).
    p = flu_T_rdf()[:3, :3] @ np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(p, [1.0, 0.0, 0.0], atol=1e-12)
    # RDF right (x) is FLU -left (-y).
    p = flu_T_rdf()[:3, :3] @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(p, [0.0, -1.0, 0.0], atol=1e-12)


def test_unicycle_straight_matches_closed_form():
    x, y, th = unicycle_pose_delta(10.0, 0.0, 0.5)
    assert float(x) == pytest.approx(5.0)
    assert float(y) == pytest.approx(0.0)
    assert float(th) == pytest.approx(0.0)


def test_unicycle_arc_matches_numpy_reference():
    # Closed-form constant-twist arc, independently computed.
    v, w, dt = 8.0, 0.3, 0.4
    r = v / w
    wt = w * dt
    exp_x, exp_y = r * np.sin(wt), r * (1 - np.cos(wt))
    x, y, th = unicycle_pose_delta(v, w, dt)
    assert float(x) == pytest.approx(exp_x)
    assert float(y) == pytest.approx(exp_y)
    assert float(th) == pytest.approx(wt)

    # now_T_prev must equal inv(prev_T_now) built from (x, y, theta).
    c, s = np.cos(wt), np.sin(wt)
    prev_T_now = np.eye(4)
    prev_T_now[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    prev_T_now[:3, 3] = [exp_x, exp_y, 0]
    T = np.asarray(unicycle_now_T_prev(v, w, dt))
    np.testing.assert_allclose(T, np.linalg.inv(prev_T_now), atol=1e-5)


def test_unicycle_batched():
    v = jnp.array([1.0, 2.0, 3.0])
    w = jnp.array([0.0, 0.1, -0.2])
    T = unicycle_now_T_prev(v, w, 0.1)
    assert T.shape == (3, 4, 4)
    # Each batched entry matches the scalar call.
    for i in range(3):
        np.testing.assert_allclose(
            T[i], unicycle_now_T_prev(v[i], w[i], 0.1), atol=1e-6
        )


def test_compose_transforms_matches_fold():
    rng = np.random.RandomState(1)
    Ts = []
    for _ in range(4):
        T = np.eye(4)
        th = rng.rand()
        T[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        T[:3, 3] = rng.rand(3)
        Ts.append(T)
    Ts = jnp.asarray(np.stack(Ts), dtype=jnp.float32)
    out = compose_transforms(Ts)
    acc = np.eye(4)
    for i in range(4):
        acc = np.asarray(Ts[i]) @ acc
        np.testing.assert_allclose(out[i], acc, atol=1e-4)


def test_backproject_project_roundtrip():
    intr = (100.0, 120.0, 32.0, 24.0)
    uv = pixel_grid(8, 16)
    depth = jnp.full((8, 16), 5.0)
    pts = backproject_pixels(uv, depth, intr)
    uv2, z = project_points(pts, intr)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), 5.0, atol=1e-5)


def test_transform_points_identity_and_translation():
    pts = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(transform_points(jnp.eye(4), pts), pts)
    T = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, -1.0, 2.0]))
    np.testing.assert_allclose(
        transform_points(T, pts), jnp.array([[2.0, 1.0, 5.0]])
    )


def test_cityscapes_camera_parsing():
    cam = {
        "intrinsic": {"fx": 2262.52, "fy": 2265.3017905988554, "u0": 1096.98, "v0": 513.137},
        "extrinsic": {
            "baseline": 0.209313,
            "pitch": 0.038,
            "roll": 0.0,
            "yaw": -0.0195,
            "x": 1.7,
            "y": 0.1,
            "z": 1.22,
        },
    }
    K = intrinsics_matrix([2262.52, 2265.3017905988554, 1096.98, 513.137])
    assert K[0, 0] == pytest.approx(2262.52)
    assert K[1, 2] == pytest.approx(513.137)
    E = extrinsics_from_cityscapes_camera(cam)
    # A point 10m in front of the camera (RDF z) should land ~10m in front of
    # the vehicle (FLU x), offset by mounting position.
    p = E @ np.array([0, 0, 10.0, 1.0])
    assert p[0] > 10.0  # forward of the vehicle origin
    assert abs(p[2] - 1.22) < 1.0  # roughly camera height
    # Rotation block must be orthonormal.
    R = E[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
