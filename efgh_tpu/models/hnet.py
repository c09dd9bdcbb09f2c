"""H-net: horizon alignment of the camera image.

VGG11-bn features -> abs/sign head -> 2-d horizon vector -> in-plane roll
matrix, and the input image is physically rotated by it (reference
nets/hnet.py).  The reference's mid-forward GPU->CPU->PIL rotation detour
(reference nets/hnet.py:79, common/torch_utils.py:235-254) becomes an
on-device nearest-resample affine warp.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from efgh_tpu.geometry import (
    normal_vector_from_abs_sign,
    rotate_image,
    rotation_matrix_between_vectors_batched,
)
from efgh_tpu.models.layers import BatchNorm, DenseTorch
from efgh_tpu.models.layers import maybe_remat
from efgh_tpu.models.vgg import VGGFeatures


class Hnet(nn.Module):
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = True):
        """Args:
          img: (B, 3, H, W) image, 0..255 floats (reference convention).
        Returns:
          dict with h_hrzn_abs/sgn, h_hrzn, h_img, h_c, intrinsic_sensor2.
        """
        x = jnp.transpose(img, (0, 2, 3, 1)).astype(self.compute_dtype)  # NHWC
        feat = maybe_remat(VGGFeatures, self.remat)(
            cfg="A", name="vgg")(x, train)  # (B, h, w, 512)
        b = feat.shape[0]
        h = feat.reshape(b, -1, feat.shape[-1]).astype(jnp.float32)  # (B, hw, 512)

        for i, w in enumerate([256, 128, 128]):
            h = DenseTorch(w, name=f"conv_hrzn_{i + 1}")(h)
            h = BatchNorm(name=f"bn_hrzn_{i + 1}")(h, train=train)
            h = nn.relu(h)
        pooled = jnp.max(h, axis=1)  # (B, 128)

        g = nn.relu(DenseTorch(128, name="lin_hrzn_1")(pooled))
        g = nn.relu(DenseTorch(128, name="lin_hrzn_2")(g))
        g = nn.relu(DenseTorch(32, name="lin_hrzn_3")(g))
        hrzn_sgn = DenseTorch(4, name="lin_hrzn_sgn")(g)
        hrzn_abs0 = jax.nn.softmax(DenseTorch(2, name="lin_hrzn_abs")(g), axis=1)
        hrzn_abs = hrzn_abs0 / jnp.linalg.norm(hrzn_abs0, axis=1, keepdims=True)
        hrzn_abs = hrzn_abs[..., None]  # (B, 2, 1)

        h_hrzn = jax.lax.stop_gradient(
            normal_vector_from_abs_sign(hrzn_abs, hrzn_sgn)
        )  # (B, 2, 1)
        h_hrzn_3d = jnp.concatenate(
            [h_hrzn, jnp.zeros((h_hrzn.shape[0], 1, 1), h_hrzn.dtype)], axis=1
        )
        target_e2 = jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0])[None, :, None], h_hrzn_3d.shape
        )
        h_T4 = rotation_matrix_between_vectors_batched(h_hrzn_3d, target_e2)
        h_T = h_T4[:, :3, :3]

        h_img = jax.vmap(lambda im, m: rotate_image(im, m))(
            img.astype(jnp.float32), h_T
        )

        return {
            "h_hrzn_abs": hrzn_abs,
            "h_hrzn_sgn": hrzn_sgn,
            "h_hrzn": h_hrzn,
            "h_img": h_img,
            "h_c": h_T,
            "intrinsic_sensor2": h_T,
        }
