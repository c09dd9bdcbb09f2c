"""G-net: translation refinement.

An image U-Net (ResNet18 encoder + deconv decoder) predicts dense depth and a
validity mask; the EF-aligned cloud is projected to a sparse camera-frame
depth image and fused with the image features through a second ResNet18
trunk, ending in a 3-vector translation (reference nets/gnet.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from efgh_tpu.geometry import depth_image_from_pc, translation_matrix_from_vector
from efgh_tpu.models.layers import (
    Conv,
    ConvBNRelu,
    ConvTBNRelu,
    concat_crop,
    maybe_remat,
    normal_init,
)
from efgh_tpu.models.resnet import ResNet18Encoder, ResNet18Trunk


class Gnet(nn.Module):
    raw_cam_img_size: Tuple[int, int] = (900, 1600)
    projection_mode: str = "near"
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # CoordConv channels on the fusion input (config.py g_coord_channels):
    # the t_y residual ~ py - (u - cx)*w/fx needs the pixel column u as a
    # VALUE next to the projected point's (py, w) values; without it the
    # mean-pooled trs head has no lateral cue (docs/ACCURACY.md).
    # False = reference semantics; True/"uv" = +2 channels (u, v);
    # "uvprod" = +4 channels (u, v, u*w, v*w) — the products the lateral
    # residual is LINEAR in, so the trunk need not synthesize a
    # multiplication out of ReLUs.  Channel order nests: a 4-channel
    # (off) or 6-channel ("uv") snapshot migrates to any wider mode by
    # zero-padding conv_d1's kernel (loop.py load_pretrained).
    coord_channels: Any = False
    # Projective matching readout (config.py g_matching): scan candidate
    # lateral/depth translations, score candidate re-projections against
    # the model's own dense depth, and fold the soft-argmin into g_trs
    # through a ZERO-INIT dense head — the displacement readout the global
    # mean pool cannot express (models/matching.py; docs/ACCURACY.md).
    # False = reference semantics; True = defaults; a tuple of (key, value)
    # pairs overrides LateralMatching fields (kept hashable for linen).
    matching: Any = False

    @nn.compact
    def __call__(self, pc: jnp.ndarray, img: jnp.ndarray, ret: dict,
                 train: bool = True):
        """Args:
          pc: (B, 3, N) cloud (LiDAR frame, decalibrated).
          img: (B, 3, H, W) input image.
          ret: running dict with 'sensor2_T_sensor1' and 'efh_cam_T_velo'.
        Returns:
          ret updated with g_depth, g_mask, g_trs, g_l, composed transform.
        """
        x = jnp.transpose(img, (0, 2, 3, 1)).astype(self.compute_dtype)
        CT = maybe_remat(ConvTBNRelu, self.remat)

        # ---- image U-Net (reference nets/gnet.py:103-124) ----
        c1 = ConvBNRelu(64, (3, 3), (1, 1), (1, 1), name="conv_i0")(x, train)
        c2, c3, c4, c5 = maybe_remat(ResNet18Encoder, self.remat)(
            name="img_encoder")(c1, train)

        d4 = CT(256, (3, 3), (2, 2), (1, 1), (1, 1), name="convt_img4")(
            c5, train
        )
        d3 = CT(128, (3, 3), (2, 2), (1, 1), (1, 1), name="convt_img3")(
            concat_crop(c4, d4), train
        )
        d2 = CT(64, (3, 3), (2, 2), (1, 1), (1, 1), name="convt_img2")(
            concat_crop(c3, d3), train
        )
        convt = jnp.concatenate([d2, c2], axis=-1)
        dimg = CT(1, (3, 3), (2, 2), (1, 1), (1, 1), name="convt_dimg")(
            convt, train
        )
        mask = CT(2, (3, 3), (2, 2), (1, 1), (1, 1), name="convt_mask")(
            convt, train
        )
        mask = jax.nn.softmax(mask.astype(jnp.float32), axis=-1)

        # ---- sparse depth from the EF-aligned pose ----
        f_depth = jax.vmap(
            lambda p, m: depth_image_from_pc(
                p, m, self.raw_cam_img_size, mode=self.projection_mode
            )
        )(pc, jax.lax.stop_gradient(ret["efh_cam_T_velo"]))  # (B, 4, H, W)
        f_depth = jnp.transpose(f_depth, (0, 2, 3, 1)).astype(self.compute_dtype)
        mode = {False: None, True: "uv"}.get(self.coord_channels,
                                             self.coord_channels)
        if mode is not None:
            if mode not in ("uv", "uvprod"):
                raise ValueError(f"g_coord_channels: unknown mode {mode!r}")
            # normalized pixel-center coordinates in (-0.5, 0.5); appended
            # AFTER the reference's 4 (px, py, pz, w) channels so 4-channel
            # snapshots load by zero-padding conv_d1's kernel (loop.py
            # load_pretrained) — bit-identical to the knob-off model until
            # the padded weights train away from zero.
            b_, hh, ww = f_depth.shape[0], f_depth.shape[1], f_depth.shape[2]
            uu = (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww - 0.5
            vv = (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh - 0.5
            grid = jnp.stack(
                [jnp.broadcast_to(uu[None, :], (hh, ww)),
                 jnp.broadcast_to(vv[:, None], (hh, ww))], axis=-1
            ).astype(self.compute_dtype)
            extra = [jnp.broadcast_to(grid[None], (b_, hh, ww, 2))]
            if mode == "uvprod":
                # u*w, v*w with w = projective depth (channel 3; 0 at empty
                # pixels, so the products stay 0 where there is no point).
                # u = fx*x_cam/z_cam + cx makes y_velo a LINEAR function of
                # {u*w, w}: y_velo = (cx*w - u*w)/fx — handing the trunk the
                # exact terms the lateral residual needs instead of asking
                # ReLU stacks to synthesize the multiplication.
                extra.append(extra[0] * f_depth[..., 3:4])
            f_depth = jnp.concatenate([f_depth] + extra, axis=-1)

        # ---- fusion branch (reference nets/gnet.py:142-166) ----
        ci = ConvBNRelu(32, (1, 1), (1, 1), (0, 0), name="conv_i1")(d2, train)
        cd = ConvBNRelu(32, (3, 3), (2, 2), (1, 1), name="conv_d1")(f_depth, train)
        fused = jnp.concatenate([ci, cd], axis=-1)
        f5 = maybe_remat(ResNet18Trunk, self.remat)(
            name="fusion_encoder")(fused, train)

        t = ConvBNRelu(512, (1, 1), (1, 1), (0, 0), name="conv_trs_1")(f5, train)
        t = ConvBNRelu(512, (1, 1), (1, 1), (0, 0), name="conv_trs_2")(t, train)
        t = ConvBNRelu(512, (1, 1), (1, 1), (0, 0), name="conv_trs_3")(t, train)
        b = t.shape[0]
        t = t.reshape(b, -1, 512).astype(jnp.float32)  # (B, HW, 512)
        t = Conv1dTorch(3, name="conv_trs_4")(t)  # (B, HW, 3)
        trs = jnp.mean(t, axis=1)[..., None]  # (B, 3, 1)

        if self.matching:
            from efgh_tpu.models.matching import LateralMatching

            kw = {k: (tuple(v) if k == "axes" else v)
                  for k, v in (self.matching
                               if isinstance(self.matching, tuple) else ())}
            # every input stop-gradded: the cost curves are a pure feature;
            # only the zero-init head below trains (segment-7a semantics),
            # so at snapshot-migration time the model computes EXACTLY the
            # knob-off function until the head moves away from zero
            feats, match_aux = LateralMatching(
                raw_cam_img_size=self.raw_cam_img_size,
                projection_mode=self.projection_mode,
                name="matching", **kw)(
                jax.lax.stop_gradient(pc),
                jax.lax.stop_gradient(dimg[..., 0].astype(jnp.float32)),
                jax.lax.stop_gradient(mask[..., 0]),
                jax.lax.stop_gradient(ret["efh_cam_T_velo"]),
                jax.lax.stop_gradient(ret["sensor2_T_sensor1"]),
                # each axis scans with the other two at the pooled head's
                # own estimate (the gt residual is 3D; matching.py docstring)
                t_base=jax.lax.stop_gradient(trs[..., 0]),
            )
            # AXIS-MASKED head: the scan features for axis a may only
            # correct component a.  Segments 7/7b both measured feature
            # leakage through a full 3-column head — the y-upweighted
            # loss happily trades x error for y fit through whatever
            # train-batch correlations the features carry, degrading the
            # already-solved axes (val trs_x 0.28 -> 0.73 in 500 iters
            # with a y-only scan, docs/ACCURACY.md).  One output per
            # scanned axis, scattered into place by a constant one-hot:
            # the un-scanned components revert to EXACT pooled behavior.
            scan_axes = kw.get("axes", (0, 1))
            corr_ax = nn.Dense(len(scan_axes),
                               kernel_init=nn.initializers.zeros,
                               bias_init=nn.initializers.zeros,
                               name="matching_head")(feats)  # (B, A)
            scatter = jnp.zeros((len(scan_axes), 3), corr_ax.dtype)
            for row, ax in enumerate(scan_axes):
                scatter = scatter.at[row, ax].set(1.0)
            corr = corr_ax @ scatter  # (B, 3), zero off the scanned axes
            trs = trs + corr[..., None]
            ret = dict(ret)
            ret["g_match_t"] = match_aux["t_hat"]

        g_T = translation_matrix_from_vector(jax.lax.stop_gradient(trs))

        ret = dict(ret)
        ret["g_depth"] = jnp.transpose(dimg.astype(jnp.float32), (0, 3, 1, 2))
        ret["g_mask"] = jnp.transpose(mask, (0, 3, 1, 2))
        ret["g_trs"] = trs
        ret["g_l"] = g_T
        ret["sensor2_T_sensor1"] = g_T @ ret["sensor2_T_sensor1"]
        return ret


class Conv1dTorch(nn.Module):
    """Conv1d k1 with torch default init (plain dense over the last axis)."""

    features: int

    @nn.compact
    def __call__(self, x):
        from efgh_tpu.models.layers import DenseTorch

        return DenseTorch(self.features)(x)
