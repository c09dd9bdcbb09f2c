"""Geometry core vs. scipy / PIL / reference formulas."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from efgh_tpu.geometry import (
    compute_cam_T_velo,
    depth_image_from_pc,
    matrix_3x3_to_4x4,
    normal_vector_from_abs_sign,
    quaternion_angular_distance,
    range_image_from_pc,
    rotate_image,
    rotation_matrix_between_vectors,
    rpy_to_matrix,
    rre_rte,
    translation_matrix_from_vector,
    vector_from_radian,
    xyz_to_matrix,
)


def test_rotation_between_vectors_general(rng):
    for _ in range(50):
        a = rng.randn(3).astype(np.float32)
        b = rng.randn(3).astype(np.float32)
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        r = np.asarray(rotation_matrix_between_vectors(jnp.asarray(a), jnp.asarray(b)))
        assert r.shape == (4, 4)
        out = r[:3, :3] @ a
        np.testing.assert_allclose(out, b, atol=1e-5)
        np.testing.assert_allclose(r[:3, :3] @ r[:3, :3].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(r[:3, :3]) - 1) < 1e-4
        assert r[3, 3] == 1.0


def test_rotation_between_vectors_degenerate():
    a = jnp.array([0.0, 0.0, 1.0])
    r_same = np.asarray(rotation_matrix_between_vectors(a, a))
    np.testing.assert_allclose(r_same, np.eye(4), atol=1e-6)
    r_anti = np.asarray(rotation_matrix_between_vectors(a, -a))
    np.testing.assert_allclose(r_anti[:3, :3] @ np.array([0, 0, 1.0]),
                               [0, 0, -1.0], atol=1e-5)
    assert abs(np.linalg.det(r_anti[:3, :3]) - 1) < 1e-5


def test_rpy_matches_scipy(rng):
    for _ in range(20):
        r, p, y = rng.uniform(-np.pi, np.pi, 3)
        ours = np.asarray(rpy_to_matrix(r, p, y))[:3, :3]
        ref = Rotation.from_euler("ZYX", [y, p, r]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_translation_and_compose():
    t = np.asarray(xyz_to_matrix(1.0, 2.0, 3.0))
    np.testing.assert_allclose(t[:3, 3], [1, 2, 3])
    t2 = np.asarray(translation_matrix_from_vector(jnp.array([[1.0], [2.0], [3.0]])))
    np.testing.assert_allclose(t, t2)


def test_vector_from_radian():
    v = np.asarray(vector_from_radian(jnp.array([0.0, np.pi / 2])))
    np.testing.assert_allclose(v[0, :, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(v[1, :, 0], [0, 1, 0], atol=1e-6)


def test_normal_vector_from_abs_sign():
    # class bits MSB-first (x, y, z): class 0b101 = 5 -> signs (+,-,+)
    abs_val = jnp.ones((1, 3, 1))
    logits = jnp.zeros((1, 8)).at[0, 5].set(10.0)
    v = np.asarray(normal_vector_from_abs_sign(abs_val, logits))
    np.testing.assert_allclose(v[0, :, 0], [1, -1, 1])
    # 2-d variant: class 0b10 = 2 -> (+, -)
    abs2 = jnp.ones((1, 2, 1))
    logits2 = jnp.zeros((1, 4)).at[0, 2].set(10.0)
    v2 = np.asarray(normal_vector_from_abs_sign(abs2, logits2))
    np.testing.assert_allclose(v2[0, :, 0], [1, -1])


def test_compute_cam_T_velo_matches_formula(rng):
    c_T = Rotation.from_euler("z", 0.3).as_matrix()[None].astype(np.float32)
    l_T = np.eye(4, dtype=np.float32)[None]
    l_T[0, :3, 3] = [1, 2, 3]
    calib = rng.randn(1, 3, 4).astype(np.float32)
    A = np.array([[[1, 0, -800.0], [0, 1, -450.0], [0, 0, 1]]], np.float32)
    ours = np.asarray(compute_cam_T_velo(*map(jnp.asarray, (c_T, l_T, calib, A))))
    ref = np.linalg.inv(A[0]) @ c_T[0] @ A[0] @ calib[0] @ l_T[0]
    np.testing.assert_allclose(ours[0], ref, atol=1e-3)


def test_metrics(rng):
    gt = np.eye(4, dtype=np.float32)
    ang = 10.0
    pred = np.eye(4, dtype=np.float32)
    pred[:3, :3] = Rotation.from_euler("z", ang, degrees=True).as_matrix()
    pred[:3, 3] = [3, 4, 0]
    rre, rte = rre_rte(jnp.asarray(gt), jnp.asarray(pred))
    np.testing.assert_allclose(float(rre), ang, atol=1e-3)
    np.testing.assert_allclose(float(rte), 5.0, atol=1e-5)
    qd = quaternion_angular_distance(jnp.asarray(gt[:3, :3]), jnp.asarray(pred[:3, :3]))
    np.testing.assert_allclose(float(qd), ang, atol=1e-3)


def test_range_image_basic():
    # single point straight ahead (+x) at range 10 -> center column, mid row
    pc = jnp.array([[10.0], [0.0], [0.0]])
    img = np.asarray(range_image_from_pc(pc, (64, 512), (0.125, -0.125)))
    assert img.shape == (4, 64, 512)
    nz = np.argwhere(img[3] > 0)
    assert len(nz) == 1
    u, v = nz[0]
    assert abs(v - 255) <= 1  # yaw 0 -> middle
    assert abs(u - 31) <= 1  # pitch 0 -> middle
    np.testing.assert_allclose(img[3, u, v], 10.0, atol=1e-5)
    np.testing.assert_allclose(img[0, u, v], 10.0, atol=1e-5)


def test_range_image_nearest_wins():
    pc = jnp.array([[10.0, 5.0], [0.0, 0.0], [0.0, 0.0]])
    img = np.asarray(range_image_from_pc(pc, (64, 512), (0.125, -0.125), mode="near"))
    nz = np.argwhere(img[3] > 0)
    assert len(nz) == 1
    np.testing.assert_allclose(img[3, nz[0][0], nz[0][1]], 5.0, atol=1e-5)


def test_depth_image_basic():
    # pinhole: K = [[100,0,32],[0,100,24],[0,0,1]], point at z=5 in cam frame
    K = np.array([[100.0, 0, 32, 0], [0, 100.0, 24, 0], [0, 0, 1, 0]], np.float32)
    pc = jnp.array([[0.0], [0.0], [5.0]])
    img = np.asarray(depth_image_from_pc(pc, jnp.asarray(K[:3]), (48, 64)))
    assert img.shape == (4, 48, 64)
    np.testing.assert_allclose(img[3, 24, 32], 5.0, atol=1e-5)
    np.testing.assert_allclose(img[2, 24, 32], 5.0, atol=1e-5)  # pz channel


def test_sparse_depth_matches_full_render():
    """Depth-only fast path == channel 3 of the full render, both modes."""
    from efgh_tpu.geometry import sparse_depth_from_pc

    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.uniform(-8, 8, size=(3, 4096)).astype(np.float32)
                     + np.array([[12.0], [0.0], [0.0]], np.float32))
    K = jnp.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], jnp.float32)
    R = jnp.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]], jnp.float32)
    cam = K @ jnp.concatenate([R, jnp.zeros((3, 1))], axis=1)
    for mode in ("near", "far"):
        full = np.asarray(depth_image_from_pc(pc, cam, (48, 64), mode=mode))
        fast = np.asarray(sparse_depth_from_pc(pc, cam, (48, 64), mode=mode))
        np.testing.assert_allclose(fast, full[3], atol=1e-6)


def _pil_match_rate(PIL, img, deg):
    pil_out = np.array(PIL.fromarray(img).rotate(deg))
    theta = math.radians(deg)
    mat = jnp.array(
        [
            [math.cos(theta), -math.sin(theta), 0.0],
            [math.sin(theta), math.cos(theta), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    ours = np.asarray(
        rotate_image(jnp.asarray(img.transpose(2, 0, 1), jnp.float32), mat)
    ).transpose(1, 2, 0)
    return np.mean(np.all(np.abs(ours - pil_out) < 1e-3, axis=-1))


def test_rotate_image_matches_pil():
    # the nearest path replicates PIL's 16.16 fixed-point affine scheme;
    # residual divergence is only f32-vs-double rounding of the fixed-point
    # parameters at half-integer ties (measured: >=99.99% pixels exact at
    # 450x800 across the full ±30° decalibration range, worst F-tower
    # feature delta 1.3e-3 — see PARITY.md)
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(1)
    img = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    for deg in [0.0, 7.5, -13.0, 27.3, -29.9, 90.0]:
        match = _pil_match_rate(PIL, img, deg)
        assert match > 0.999, f"deg={deg}: match={match:.4f}"


def test_rotate_image_matches_pil_production_size():
    # Hnet's mid-forward rotate runs at 450x800 (reference nets/hnet.py:75-79)
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(2)
    img = (rng.rand(450, 800, 3) * 255).astype(np.uint8)
    for deg in [-18.0, 1.2, 23.7]:
        match = _pil_match_rate(PIL, img, deg)
        assert match > 0.9999, f"deg={deg}: match={match:.5f}"
