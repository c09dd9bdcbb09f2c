"""EFGH training criterion: E -> H -> F -> G losses as pure jit-able functions.

Functional port of reference losses/efghloss.py + losses/loss_utils.py.  Each
stage derives its targets from the gt dict and *augments* it (the reference
mutates gt in place; we return the augmented dict).  Reference quirks that
the published checkpoints were trained with are preserved deliberately:

  * the criterion total double-counts the E/H losses: Eloss emits `e_gn`
    (= abs+sgn) *and* `e_gn_abs`/`e_gn_sgn` separately, and the total sums
    every key (reference losses/efghloss.py:33-36);
  * Gloss multiplies the mask loss by lambda_g_mask *inside* and
    lambda_g_depth *outside* (reference losses/loss_utils.py:199-204);
  * Floss builds the yaw-score target from the *predicted* E rotation
    (self-conditioned curriculum, reference losses/loss_utils.py:82-86), and
    Gloss builds the translation target from predicted E/F (residual
    learning, reference losses/loss_utils.py:170-175).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from efgh_tpu.geometry import (
    depth_image_from_pc,
    matrix_3x3_to_4x4,
    rotation_matrix_between_vectors_batched,
    sign_bits_to_class,
    translation_matrix_from_vector,
)

Arrays = Dict[str, jnp.ndarray]


def bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on probabilities.

    Probabilities are clamped to [1e-12, 1-1e-12] so both the value and the
    gradient stay finite when a sigmoid saturates to exactly 0/1 (torch's
    BCELoss clamps the log at -100 and its grad internally; an f32
    1/p at p<1e-38 overflows to inf and poisons the backward pass).
    """
    # 1e-7 is the largest epsilon with 1-eps representable in float32
    # (1 - 1e-12 rounds back to exactly 1.0 -> log(0) = -inf)
    p = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def smooth_l1(a: jnp.ndarray, b: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def _cosine_abs_loss(pred_abs: jnp.ndarray, gt_abs: jnp.ndarray) -> jnp.ndarray:
    """mean(1 - cos_sim(dim=1)) over (B, D, 1) tensors."""
    p = pred_abs[..., 0]
    g = gt_abs[..., 0]
    num = jnp.sum(p * g, axis=1)
    den = jnp.maximum(jnp.linalg.norm(p, axis=1) * jnp.linalg.norm(g, axis=1), 1e-8)
    return jnp.mean(1.0 - num / den)


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )


class EFGHCriterion:
    """Stateless criterion; construct from config
    (reference losses/efghloss.py:3-19)."""

    def __init__(self, cfg):
        lam = cfg["lambda"]
        self.lambda_e_gn = float(lam["e_gn"])
        self.lambda_h_hrzn = float(lam["h_hrzn"])
        self.lambda_fov = float(lam["fov"])
        self.lambda_g_trs = float(lam["g_trs"])
        self.lambda_g_depth = float(lam["g_depth"])
        self.lambda_g_mask = float(lam["g_mask"])
        self.lambda_abs = 10.0
        self.lambda_sgn = 1.0
        self.fov_pos_num = int(cfg["fov_pos_num"])
        self.fov_neg_ratio = int(cfg["fov_neg_ratio"])
        # per-axis g_trs weights, normalized to mean 1 (config
        # g_trs_axis_weights; [1,1,1] reproduces the reference's
        # axis-uniform smooth_l1_loss, losses/loss_utils.py:181)
        w = [float(v) for v in
             (cfg.get("g_trs_axis_weights", None) or [1.0, 1.0, 1.0])]
        s = sum(w)
        self.g_trs_axis_w = tuple(v * len(w) / s for v in w)
        self.raw_cam_img_size = tuple(cfg["raw_cam_img_size"])
        self.projection_mode = getattr(cfg, "projection_mode", "near")
        self.loss_name = [
            "total", "e_gn", "e_gn_sgn", "e_gn_abs",
            "h_hrzn", "h_hrzn_abs", "h_hrzn_sgn",
            "fov", "g_trs", "g_depth", "g_mask",
        ]

    # ---- E (reference losses/loss_utils.py:7-58) ----
    def _eloss(self, gt: Arrays, pred: Arrays) -> Tuple[Arrays, Arrays]:
        e3 = jnp.array([0.0, 0.0, 1.0])[None, :, None]
        rot = gt["rand_init_l"][:, :3, :3]
        gn = rot @ jnp.broadcast_to(e3, (rot.shape[0], 3, 1))
        gn = gn / jnp.linalg.norm(gn, axis=1, keepdims=True)
        gt = dict(gt)
        gt["e_gn"] = gn
        gt["e_l"] = rotation_matrix_between_vectors_batched(
            gn, jnp.broadcast_to(e3, gn.shape)
        )
        gt_abs = jnp.abs(gn)
        sgn01 = (jnp.sign(gn[..., 0]) > 0).astype(jnp.int32)  # -1/0 -> 0
        gt_cls = sign_bits_to_class(sgn01)
        gt["e_gn_abs"] = gt_abs
        gt["e_gn_sgn"] = gt_cls

        l_abs = _cosine_abs_loss(pred["e_gn_abs"], gt_abs) * self.lambda_abs
        l_sgn = _cross_entropy(pred["e_gn_sgn"], gt_cls) * self.lambda_sgn
        losses = {
            "e_gn": (l_abs + l_sgn) * self.lambda_e_gn,
            "e_gn_abs": l_abs * self.lambda_e_gn,
            "e_gn_sgn": l_sgn * self.lambda_e_gn,
        }
        return losses, gt

    # ---- H (reference losses/loss_utils.py:209-262) ----
    def _hloss(self, gt: Arrays, pred: Arrays) -> Tuple[Arrays, Arrays]:
        e2 = jnp.array([0.0, 1.0, 0.0])[None, :, None]
        rot = gt["rand_init_c"][:, :3, :3]
        hz = rot @ jnp.broadcast_to(e2, (rot.shape[0], 3, 1))
        hz = hz / jnp.linalg.norm(hz, axis=1, keepdims=True)
        gt = dict(gt)
        gt["h_hrzn"] = hz
        h_c = rotation_matrix_between_vectors_batched(
            hz, jnp.broadcast_to(e2, hz.shape)
        )
        gt["h_c"] = h_c[:, :3, :3]
        gt_abs = jnp.abs(hz)[:, :2, :]
        sgn01 = (jnp.sign(hz[:, :2, 0]) > 0).astype(jnp.int32)
        gt_cls = sign_bits_to_class(sgn01)
        gt["h_hrzn_abs"] = gt_abs
        gt["h_hrzn_sgn"] = gt_cls

        l_abs = _cosine_abs_loss(pred["h_hrzn_abs"], gt_abs) * self.lambda_abs
        l_sgn = _cross_entropy(pred["h_hrzn_sgn"], gt_cls) * self.lambda_sgn
        losses = {
            "h_hrzn": (l_abs + l_sgn) * self.lambda_h_hrzn,
            "h_hrzn_abs": l_abs * self.lambda_h_hrzn,
            "h_hrzn_sgn": l_sgn * self.lambda_h_hrzn,
        }
        return losses, gt

    # ---- F (reference losses/loss_utils.py:60-144) ----
    def _gt_fov(self, gt_f_axis: jnp.ndarray, fov_width: int) -> jnp.ndarray:
        """Circular positive band of width fov_pos_num around the gt yaw bin
        (reference losses/loss_utils.py:119-144)."""
        yaw = jnp.arctan2(gt_f_axis[:, 1, 0], gt_f_axis[:, 0, 0])  # (B,)
        f_idx = ((-yaw + math.pi) / (2.0 * math.pi)) * fov_width
        xmin = jnp.floor(f_idx).astype(jnp.int32) - self.fov_pos_num // 2
        pos = jnp.arange(fov_width, dtype=jnp.int32)[None, :]
        rel = jnp.mod(pos - xmin[:, None], fov_width)
        return (rel < self.fov_pos_num).astype(jnp.float32)

    def _floss(self, gt: Arrays, pred: Arrays) -> Tuple[Arrays, Arrays]:
        e1 = jnp.array([1.0, 0.0, 0.0])[None, :, None]
        gt_r = gt["sensor2_T_sensor1"][:, :3, :3]
        gt_r_inv = jnp.linalg.inv(gt_r)

        pred_e = jax.lax.stop_gradient(pred["e_l"][:, :3, :3])
        gt_f_axis = (pred_e @ gt_r_inv) @ jnp.broadcast_to(
            e1, (gt_r.shape[0], 3, 1)
        )
        width = pred["f_score"].shape[-1]
        gt = dict(gt)
        gt["f_score"] = self._gt_fov(gt_f_axis, width)

        gt_e = gt["e_l"][:, :3, :3]
        gt_f_l_inv = gt_e @ gt_r_inv
        gt["f_l"] = matrix_3x3_to_4x4(jnp.linalg.inv(gt_f_l_inv))

        pos = gt["f_score"] > 0
        loss_c = bce(pred["f_score"], gt["f_score"])
        loss_c = jnp.where(pos, 0.0, loss_c)

        # hard negative mining: keep neg_ratio * num_pos highest-loss negatives
        # (reference losses/loss_utils.py:98-105)
        order = jnp.argsort(-loss_c, axis=1)
        rank = jnp.argsort(order, axis=1)
        num_pos = jnp.sum(pos, axis=1, keepdims=True)
        num_neg = jnp.clip(self.fov_neg_ratio * num_pos, max=pos.shape[1] - 1)
        neg = rank < num_neg

        weighted = pos | neg
        full_bce = bce(pred["f_score"], gt["f_score"])
        # select (not multiply) so an inf at an unselected position can never
        # produce inf*0 = NaN
        loss_fov = jnp.sum(jnp.where(weighted, full_bce, 0.0)) / jnp.maximum(
            jnp.sum(weighted.astype(jnp.float32)), 1.0
        )
        return {"fov": loss_fov * self.lambda_fov}, gt

    # ---- G (reference losses/loss_utils.py:146-207) ----
    def _gloss(self, gt: Arrays, pred: Arrays, pc: jnp.ndarray
               ) -> Tuple[Arrays, Arrays]:
        origin = jnp.array([0.0, 0.0, 0.0, 1.0])[None, :, None]
        gt_T = gt["sensor2_T_sensor1"]
        b = gt_T.shape[0]

        pred_ef = jax.lax.stop_gradient(pred["f_l"] @ pred["e_l"])
        gt_g_l = gt_T @ jnp.linalg.inv(pred_ef)
        gt_g_cp = gt_g_l @ jnp.broadcast_to(origin, (b, 4, 1))
        gt = dict(gt)
        gt["g_trs"] = gt_g_cp[:, :3, :]

        gt_ef = gt["f_l"] @ gt["e_l"]
        gt_g_l2 = gt_T @ jnp.linalg.inv(gt_ef)
        gt_g_cp2 = gt_g_l2 @ jnp.broadcast_to(origin, (b, 4, 1))
        gt["g_l"] = translation_matrix_from_vector(gt_g_cp2[:, :3, :])

        gt_depth_img = jax.vmap(
            lambda p, m: depth_image_from_pc(
                p, m, self.raw_cam_img_size, mode=self.projection_mode
            )
        )(pc, gt["cam_T_velo"])  # (B, 4, H, W)
        gt_depth = gt_depth_img[:, -1:, :, :]
        gt["g_depth"] = gt_depth
        gt["g_mask"] = (gt_depth > 0).astype(jnp.float32)
        valid = (gt_depth > 0) & (gt["img_mask"][:, :1] > 0)

        # axis-weighted smooth-L1 (== smooth_l1 at the default [1,1,1]
        # weights; see g_trs_axis_weights in config.py)
        d = jnp.abs(gt["g_trs"] - pred["g_trs"])
        elem = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
        axis_w = jnp.asarray(self.g_trs_axis_w)[None, :, None]
        loss_trs = jnp.mean(elem * axis_w)

        diff = (gt_depth - pred["g_depth"]) * valid
        loss_depth = jnp.sum(diff * diff) / jnp.maximum(jnp.sum(valid), 1.0)

        loss_mask = (
            jnp.mean(bce(pred["g_mask"][:, 0], gt["g_mask"][:, 0]))
            * self.lambda_g_mask
        )
        losses = {
            "g_trs": loss_trs * self.lambda_g_trs,
            "g_depth": loss_depth * self.lambda_g_depth,
            # double-lambda quirk preserved (reference losses/loss_utils.py:204)
            "g_mask": loss_mask * self.lambda_g_depth,
        }
        return losses, gt

    def compute_loss(self, pc: jnp.ndarray, gt: Arrays, pred: Arrays
                     ) -> Tuple[Arrays, Arrays]:
        """Args:
          pc: (B, 3, N) decalibrated cloud (for the gt depth render).
          gt: ground-truth dict (rand_init_l/c, sensor2_T_sensor1,
            cam_T_velo, img_mask).
          pred: model output dict.
        Returns:
          (losses dict incl. 'total', augmented gt dict).
        """
        losses: Arrays = {}
        le, gt = self._eloss(gt, pred)
        losses.update(le)
        lh, gt = self._hloss(gt, pred)
        losses.update(lh)
        lf, gt = self._floss(gt, pred)
        losses.update(lf)
        lg, gt = self._gloss(gt, pred, pc)
        losses.update(lg)
        losses["total"] = sum(losses.values())
        return losses, gt
