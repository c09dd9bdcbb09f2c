"""Projective matching readout for G's translation head.

Why this exists (docs/ACCURACY.md, the t_y campaign): G's reference readout
— 1x1 convs + a global mean pool over the fused feature map (reference
nets/gnet.py:142-166) — can average per-pixel VALUE comparisons, which is
how the depth axis (t_x) and the vertical (t_z) are learned, but it cannot
express a DISPLACEMENT between where image structure is and where the
projected cloud lands.  The lateral axis (t_y) is exactly such a
correspondence problem, and it stayed at zero regression slope through
three falsification experiments (4x loss up-weighting, CoordConv (u,v),
CoordConv uvprod value channels) while t_x/t_z converged.

This module computes the displacement EXPLICITLY, the optical-flow
correlation idea specialized to a known camera model: scan K candidate
translations along a velo axis, re-project the cloud at the EF-aligned pose
shifted by each candidate (a depth-dependent pixel shift — a uniform image
shift would be wrong), and score the masked robust mismatch between the
candidate sparse depth and G's own dense depth prediction.  The soft-argmin
of the resulting cost curve is the translation estimate; a zero-init dense
head folds it into g_trs, so at load time a migrated snapshot computes
EXACTLY the knob-off function (same contract as g_coord_channels).

Candidate poses derive from in-`ret` quantities only:
    cam(d) = efh_cam_T_velo @ (l^-1 T(d) l) = efh_cam_T_velo @ T(R_l^T d)
with l = f_l @ e_l, because conjugating a pure translation by a rigid
transform is a pure translation by the rotated vector.  T(d) composing on
the LEFT of l matches G's target semantics (gt_g = gt_T @ l^-1,
losses/efghloss.py).

All pose/feature inputs arrive stop-gradded: the curves are a pure FEATURE
(segment-7a semantics) — only the zero-init head trains, so the trunk, the
depth head, and the mask head keep their reference gradients.  Validated
zero-training by benchmarks/ty_matching_probe.py before being built.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from efgh_tpu.geometry import sparse_depth_from_pc


def _block_mean(x: jnp.ndarray, ds: int) -> jnp.ndarray:
    """(B, H, W) -> (B, H//ds, W//ds) mean over ds x ds blocks."""
    if ds == 1:
        return x
    b, h, w = x.shape
    return x.reshape(b, h // ds, ds, w // ds, ds).mean(axis=(2, 4))


class LateralMatching(nn.Module):
    """Cost curves over candidate translations + their soft/hard argmins.

    Returns (feats, aux): feats (B, 4*len(axes)) float32 —
    [softmin E[delta], grid argmin delta, min score, score(0) - min score]
    per scanned axis — and aux {"t_hat": (B, len(axes)), "curves":
    (B, len(axes), K)} for diagnostics/telemetry.
    """

    raw_cam_img_size: Tuple[int, int] = (900, 1600)
    span: float = 3.0       # scan +-span meters (dclb l_trs_range is 2)
    k: int = 25             # candidates per axis
    clip: float = 3.0       # robust |depth diff| clip, meters
    tau: float = 0.25       # softmin temperature, meters of mean mismatch
    downsample: int = 4     # compare at (H/ds, W/ds): denser sparse coverage
    axes: Tuple[int, ...] = (0, 1)   # velo x (control), velo y (the target)
    projection_mode: str = "near"

    @nn.compact
    def __call__(self, pc: jnp.ndarray, dimg: jnp.ndarray,
                 gmask: jnp.ndarray, efh_cam: jnp.ndarray,
                 l_mat: jnp.ndarray, t_base: jnp.ndarray | None = None):
        """Args (caller stop-grads every one of these):
          pc:      (B, 3, N) decalibrated cloud.
          dimg:    (B, H, W) G's dense depth prediction, float32.
          gmask:   (B, H, W) G's validity probability in [0, 1].
          efh_cam: (B, 3, 4) EF(H)-aligned projection.
          l_mat:   (B, 4, 4) f_l @ e_l (the accumulated rigid correction).
          t_base:  (B, 3) base translation the scan is centered on — the
            pooled head's own prediction.  The gt residual is 3D (each axis
            up to dclb.l_trs_range); scanning one axis with the others left
            at the EF(H) error corrupts the cost landscape (measured:
            benchmarks/ty_matching_probe.py "efh-base" arms), so each axis
            scans with the other two held at the model's best estimate —
            the matching stage REFINES the pooled readout.  None = zeros.
        """
        h, w = self.raw_cam_img_size
        ds = int(self.downsample)
        if h % ds or w % ds:
            raise ValueError(f"raw_cam_img_size {(h, w)} not divisible by "
                             f"match downsample {ds}")
        hd, wd = h // ds, w // ds
        deltas = jnp.linspace(-self.span, self.span, self.k,
                              dtype=jnp.float32)

        if t_base is None:
            t_base = jnp.zeros((pc.shape[0], 3), jnp.float32)
        dimg_d = _block_mean(dimg.astype(jnp.float32), ds)
        gmask_d = _block_mean(gmask.astype(jnp.float32), ds)
        # scale pixel rows of the projection for the low-res render
        scale = jnp.asarray([1.0 / ds, 1.0 / ds, 1.0], jnp.float32)
        rl_t = jnp.transpose(l_mat[:, :3, :3], (0, 2, 1))  # rigid: R^-1=R^T

        def axis_curves(axis_idx: int) -> jnp.ndarray:
            e_axis = jnp.zeros((3,), jnp.float32).at[axis_idx].set(1.0)
            # the scanned axis REPLACES the base component (the candidate
            # grid stays absolute, not base-relative, so argmin features
            # share units with g_trs)
            base = t_base.astype(jnp.float32) * (1.0 - e_axis)[None]

            def score(delta):
                t = (rl_t @ (base + delta * e_axis)[..., None])[..., 0]
                # efh_cam @ T(t): only the last column moves
                shift = efh_cam[:, :, :3] @ t[..., None]  # (B, 3, 1)
                cam = jnp.concatenate(
                    [efh_cam[:, :, :3], efh_cam[:, :, 3:] + shift], axis=-1)
                cam = cam * scale[None, :, None]
                # depth-only render: 2-array sort payload instead of the
                # full 6-array winner scatter (bit-equal depth channel,
                # tests/test_geometry.py sparse-depth parity)
                wdep = jax.vmap(lambda p, m: sparse_depth_from_pc(
                    p, m, (hd, wd), mode=self.projection_mode))(pc, cam)
                valid = (wdep > 0).astype(jnp.float32) * gmask_d
                rob = jnp.minimum(jnp.abs(dimg_d - wdep), self.clip)
                return (jnp.sum(rob * valid, axis=(1, 2))
                        / jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1.0))

            return jax.lax.map(score, deltas)  # (K, B)

        curves = jnp.stack([axis_curves(a) for a in self.axes],
                           axis=-1)  # (K, B, A)
        curves = jnp.transpose(curves, (1, 2, 0))  # (B, A, K)

        soft = jax.nn.softmax(-curves / self.tau, axis=-1)
        t_soft = jnp.sum(soft * deltas[None, None, :], axis=-1)  # (B, A)
        t_hard = deltas[jnp.argmin(curves, axis=-1)]  # (B, A)
        s_min = jnp.min(curves, axis=-1)  # (B, A)
        s_zero = curves[:, :, self.k // 2]  # score at delta = 0
        feats = jnp.concatenate(
            [t_soft, t_hard, s_min, s_zero - s_min], axis=-1)  # (B, 4A)
        return feats, {"t_hat": t_soft, "curves": curves}
