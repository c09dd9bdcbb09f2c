"""Rigid-transform math as pure, branchless, jit-able JAX functions.

Replaces the reference's per-sample Python loops and data-dependent branches
(reference common/torch_utils.py:105-307, common/numpy_utils.py:519-574) with
vectorized `jnp.where` selects so everything traces once under `jax.jit` and
batches with `vmap`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def rotation_matrix_between_vectors(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Rotation (4x4 homogeneous) mapping `src` onto `dst`.

    Branchless Rodrigues formula; the reference computes this per-sample in a
    Python loop with `if (1-c)==0` exact-equality branches (reference
    common/torch_utils.py:170-200).  Degenerate cases:
      * src ~ dst           -> identity
      * src ~ -dst          -> 180-degree rotation about an axis orthogonal to
                               src (the reference's -eye() construction is not
                               a valid homogeneous rotation; we fix it and note
                               the divergence — it is only hit at exact
                               antipodality, which never occurs in training).

    Args:
      src: (..., 3) source vectors (need not be unit length).
      dst: (..., 3) destination vectors.
    Returns:
      (..., 4, 4) homogeneous rotation matrices.
    """
    v = jnp.cross(src, dst)
    c = jnp.sum(src * dst, axis=-1)
    s2 = jnp.sum(v * v, axis=-1)

    k = _skew(v)
    kk = jnp.einsum("...ij,...jk->...ik", k, k)
    coef = (1.0 - c) / jnp.maximum(s2, _EPS)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), k.shape)
    rot_general = eye3 + k + kk * coef[..., None, None]

    # Antipodal fallback: 180-degree rotation about axis orthogonal to src.
    # Pick the coordinate axis least aligned with src, orthogonalize.
    src_n = src / jnp.maximum(jnp.linalg.norm(src, axis=-1, keepdims=True), _EPS)
    abs_s = jnp.abs(src_n)
    least = jnp.argmin(abs_s, axis=-1)
    basis = jnp.eye(3, dtype=src.dtype)[least]
    axis = basis - jnp.sum(basis * src_n, axis=-1, keepdims=True) * src_n
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    # R_180(axis) = 2*axis*axis^T - I
    rot_pi = 2.0 * axis[..., :, None] * axis[..., None, :] - eye3

    parallel = s2 < _EPS
    same_dir = c >= 0.0
    rot3 = jnp.where(
        parallel[..., None, None],
        jnp.where(same_dir[..., None, None], eye3, rot_pi),
        rot_general,
    )

    out = jnp.zeros(rot3.shape[:-2] + (4, 4), dtype=src.dtype)
    out = out.at[..., :3, :3].set(rot3)
    out = out.at[..., 3, 3].set(1.0)
    return out


def rotation_matrix_between_vectors_batched(
    src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """Reference-shaped wrapper: (B, 3, 1) x (B|1, 3, 1) -> (B, 4, 4)."""
    src3 = src[..., 0]
    dst3 = jnp.broadcast_to(dst[..., 0], src3.shape)
    return rotation_matrix_between_vectors(src3, dst3)


def rpy_to_matrix(roll, pitch, yaw) -> jnp.ndarray:
    """Roll/pitch/yaw -> 4x4 rotation, R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    (reference common/numpy_utils.py:519-547)."""
    roll, pitch, yaw = (jnp.asarray(a, jnp.float32) for a in (roll, pitch, yaw))
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    one = jnp.ones_like(cr)
    zero = jnp.zeros_like(cr)
    rz = jnp.stack(
        [
            jnp.stack([cy, -sy, zero], -1),
            jnp.stack([sy, cy, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    ry = jnp.stack(
        [
            jnp.stack([cp, zero, sp], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sp, zero, cp], -1),
        ],
        -2,
    )
    rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cr, -sr], -1),
            jnp.stack([zero, sr, cr], -1),
        ],
        -2,
    )
    r3 = rz @ ry @ rx
    out = jnp.zeros(r3.shape[:-2] + (4, 4), jnp.float32)
    out = out.at[..., :3, :3].set(r3)
    out = out.at[..., 3, 3].set(1.0)
    return out


def xyz_to_matrix(tx, ty, tz) -> jnp.ndarray:
    """Translation 4x4 (reference common/numpy_utils.py:549-558)."""
    t = jnp.stack([jnp.asarray(tx, jnp.float32), jnp.asarray(ty, jnp.float32),
                   jnp.asarray(tz, jnp.float32)], -1)
    out = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), t.shape[:-1] + (4, 4))
    return out.at[..., :3, 3].set(t)


def translation_matrix_from_vector(vec: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 1) or (..., 3) -> (..., 4, 4) translation matrix
    (reference common/torch_utils.py:220-233)."""
    if vec.shape[-1] == 1:
        vec = vec[..., 0]
    return xyz_to_matrix(vec[..., 0], vec[..., 1], vec[..., 2])


def vector_from_radian(rad: jnp.ndarray) -> jnp.ndarray:
    """(B,) or (B,1) yaw radians -> (B, 3, 1) forward vectors
    (reference common/torch_utils.py:286-296)."""
    rad = rad.reshape(rad.shape[0])
    v = jnp.stack([jnp.cos(rad), jnp.sin(rad), jnp.zeros_like(rad)], axis=-1)
    return v[..., None]


def matrix_3x3_to_4x4(mat: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4, 4) homogeneous
    (reference common/torch_utils.py:298-307)."""
    out = jnp.zeros(mat.shape[:-2] + (4, 4), mat.dtype)
    out = out.at[..., :3, :3].set(mat)
    out = out.at[..., 3, 3].set(1.0)
    return out


def sign_bits_to_class(sgn01: jnp.ndarray) -> jnp.ndarray:
    """(..., D) of {0,1} sign bits -> (...,) class id, MSB-first
    (reference losses/loss_utils.py:36-41)."""
    d = sgn01.shape[-1]
    weights = 2 ** jnp.arange(d - 1, -1, -1, dtype=jnp.int32)
    return jnp.sum(sgn01.astype(jnp.int32) * weights, axis=-1)


def normal_vector_from_abs_sign(abs_val: jnp.ndarray, sign_logits: jnp.ndarray) -> jnp.ndarray:
    """Decode |n| + octant-class logits into a signed vector.

    The D-dim vector's sign pattern is one of 2**D classes, encoded MSB-first
    (x is the highest bit).  Mirrors reference common/torch_utils.py:105-146
    without the per-sample Python loop.

    Args:
      abs_val: (B, D, 1) absolute values.
      sign_logits: (B, 2**D) class logits.
    Returns:
      (B, D, 1) signed vectors.
    """
    d = abs_val.shape[1]
    cls = jnp.argmax(sign_logits, axis=-1)  # (B,)
    shifts = jnp.arange(d - 1, -1, -1, dtype=jnp.int32)  # MSB first
    bits = (cls[:, None] >> shifts[None, :]) & 1  # (B, D) in {0,1}
    sgn = jnp.where(bits == 0, -1.0, 1.0).astype(abs_val.dtype)
    return abs_val * sgn[..., None]


def compute_cam_T_velo(c_T: jnp.ndarray, l_T: jnp.ndarray, calib: jnp.ndarray,
                       A: jnp.ndarray) -> jnp.ndarray:
    """cam_T_velo = A^-1 @ c_T @ A @ calib @ l_T.

    Args:
      c_T: (B, 3, 3) camera in-plane rotation.
      l_T: (B, 4, 4) LiDAR-side rigid transform.
      calib: (B, 3, 4) initial extrinsic.
      A: (B, 3, 3) principal-point recentering matrix.
    Returns:
      (B, 3, 4).  (reference common/torch_utils.py:256-269)
    """
    mat1 = calib @ l_T
    mat1 = A @ mat1
    mat1 = c_T @ mat1
    return jnp.linalg.inv(A) @ mat1
