"""Registration error metrics (RRE/RTE and quaternion distance).

Matches the reference's evaluation oracle exactly:
  * RRE = arccos((tr(R_pred^T R_gt) - 1) / 2) in degrees,
    RTE = ||t_pred - t_gt||_2  (reference common/helper.py:199-207)
  * KITTI_RAW variant: quaternion angular distance (deg) + mean-abs
    translation (reference common/helper.py:166-197)
"""

from __future__ import annotations

import jax.numpy as jnp


def rre_rte(gt: jnp.ndarray, pred: jnp.ndarray):
    """Relative rotation error (deg) and translation error (m).

    Args:
      gt, pred: (..., 4, 4) or (..., 3, 4) transforms.
    Returns:
      (rre_deg, rte) arrays of shape (...,).
    """
    gt_r, gt_t = gt[..., :3, :3], gt[..., :3, 3]
    pr_r, pr_t = pred[..., :3, :3], pred[..., :3, 3]
    tmp = (jnp.trace(jnp.swapaxes(pr_r, -1, -2) @ gt_r, axis1=-2, axis2=-1) - 1.0) / 2.0
    tmp = jnp.clip(tmp, -1.0, 1.0)
    rre = jnp.degrees(jnp.arccos(tmp))
    rte = jnp.linalg.norm(pr_t - gt_t, axis=-1)
    return rre, rte


def matrix_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 4) quaternion in (w, x, y, z), branchless.

    Uses the numerically-stable four-candidate construction, selecting the
    candidate with the largest pivot via where-selects (jit/vmap friendly).
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-20))

    # candidate 0: trace pivot
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # candidate 1: x pivot
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # candidate 2: y pivot
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # candidate 3: z pivot
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_angular_distance(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Angular distance in degrees between two rotations via quaternions
    (reference common/helper.py:181-197)."""
    q1 = matrix_to_quaternion(r1)
    q2 = matrix_to_quaternion(r2)
    # t = q1 * conj(q2)
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    # conjugate of q2
    x2, y2, z2 = -x2, -y2, -z2
    tw = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    tx = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    ty = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    tz = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    vec_norm = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    return 2.0 * jnp.arctan2(vec_norm, jnp.abs(tw)) * (180.0 / jnp.pi)


def raw_errors(gt: jnp.ndarray, pred: jnp.ndarray):
    """KITTI_RAW-style errors: quaternion angle (deg) + mean-abs translation
    (reference common/helper.py:166-179)."""
    rot_err = quaternion_angular_distance(gt[..., :3, :3], pred[..., :3, :3])
    trs_err = jnp.mean(jnp.abs(gt[..., :3, 3] - pred[..., :3, 3]), axis=-1)
    return rot_err, trs_err
