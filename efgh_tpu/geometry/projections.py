"""Fixed-shape point-cloud projections and image warps.

TPU projections must keep static shapes: instead of boolean filtering like
the reference (reference common/torch_utils.py:11-103), every point is kept
and invalid points are routed to a dump slot.  Collisions are resolved
deterministically by a sort-based winner selection (nearest point wins by
default); the reference's `index_put` is last-writer-wins over a *randomly
shuffled* point order (reference data_loader/rellis3d_loader.py:252), i.e.
effectively random — we document the divergence and keep a knob.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _scatter_winner(pixel_idx: jnp.ndarray, order_key: jnp.ndarray,
                    values: jnp.ndarray, num_pixels: int) -> jnp.ndarray:
    """Scatter values (N, C) to (num_pixels, C); per-pixel winner = min order_key.

    pixel_idx entries >= num_pixels are dropped.  Deterministic: points are
    lexicographically sorted by (pixel, order_key); the first point of each
    pixel run wins and winners write to unique indices.
    """
    n, c = values.shape
    pix = pixel_idx.astype(jnp.int32)
    # lexicographic sort by (pixel, order_key)
    sort_in = (pix, order_key) + tuple(values[:, i] for i in range(c))
    sorted_out = jax.lax.sort(sort_in, num_keys=2)
    pix_s = sorted_out[0]
    vals_s = jnp.stack(sorted_out[2:], axis=-1)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]]
    )
    write_idx = jnp.where(first & (pix_s < num_pixels), pix_s, num_pixels)
    out = jnp.zeros((num_pixels + 1, c), values.dtype)
    out = out.at[write_idx].set(vals_s, mode="drop")
    return out[:num_pixels]


def range_image_from_pc(pc: jnp.ndarray, range_img_size, lidar_fov_rad,
                        mode: str = "near") -> jnp.ndarray:
    """Panoramic range image from a cartesian cloud.

    Args:
      pc: (3, N) or (4, N) points (extra rows ignored beyond xyz).
      range_img_size: (H, W).
      lidar_fov_rad: (up, down) in units of pi (e.g. (0.125, -0.125)).
      mode: "near" (closest point wins a pixel) or "far".
    Returns:
      (4, H, W) image with channels (x, y, z, range).
    (reference common/torch_utils.py:11-59; reference keeps only in-FoV points
    via boolean indexing and writes last-writer-wins — here every point is
    masked, shapes are static.)
    """
    h, w = range_img_size
    fov_up = lidar_fov_rad[0] * math.pi
    fov_down = lidar_fov_rad[1] * math.pi

    xyz = pc[:3].astype(jnp.float32)
    x, y, z = xyz[0], xyz[1], xyz[2]
    r = jnp.sqrt(jnp.sum(xyz * xyz, axis=0))
    pitch = jnp.arcsin(z / jnp.maximum(r, 1e-12))
    yaw = jnp.arctan2(y, x)
    valid = (pitch < fov_up) & (pitch > fov_down) & (r > 1e-12)

    u = ((fov_up - pitch) / (fov_up - fov_down)) * (h - 1)
    v = ((-yaw + math.pi) / (2 * math.pi)) * (w - 1)
    ui = jnp.clip(u.astype(jnp.int32), 0, h - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, w - 1)
    pix = jnp.where(valid, ui * w + vi, h * w)

    order = r if mode == "near" else -r
    vals = jnp.stack([x, y, z, r], axis=-1)
    img = _scatter_winner(pix, order, vals, h * w)
    return img.reshape(h, w, 4).transpose(2, 0, 1)


def depth_image_from_pc(pc: jnp.ndarray, cam_T_velo: jnp.ndarray, cam_img_size,
                        mode: str = "near") -> jnp.ndarray:
    """Sparse camera-frame depth image.

    Args:
      pc: (3, N) cloud in LiDAR frame.
      cam_T_velo: (3, 4) projection (intrinsics folded in).
      cam_img_size: (H, W).
      mode: "near" or "far" pixel winner rule.
    Returns:
      (4, H, W) image with channels (px, py, pz, w) of the winning point
      (original LiDAR-frame xyz plus projective depth w), matching reference
      common/torch_utils.py:61-103.
    """
    h, w_sz = cam_img_size
    pts = jnp.concatenate(
        [pc[:3].astype(jnp.float32), jnp.ones((1, pc.shape[1]), jnp.float32)], axis=0
    )
    xyw = cam_T_velo.astype(jnp.float32) @ pts  # (3, N)
    wd = xyw[2]
    safe_w = jnp.where(jnp.abs(wd) > 1e-12, wd, 1e-12)
    x = xyw[0] / safe_w
    y = xyw[1] / safe_w
    valid = (x < w_sz) & (x > 0) & (y < h) & (y > 0) & (wd > 0)
    xi = jnp.clip(x.astype(jnp.int32), 0, w_sz - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    pix = jnp.where(valid, yi * w_sz + xi, h * w_sz)

    order = wd if mode == "near" else -wd
    vals = jnp.stack([pts[0], pts[1], pts[2], wd], axis=-1)
    img = _scatter_winner(pix, order, vals, h * w_sz)
    return img.reshape(h, w_sz, 4).transpose(2, 0, 1)


def sparse_depth_from_pc(pc: jnp.ndarray, cam_T_velo: jnp.ndarray,
                         cam_img_size, mode: str = "near") -> jnp.ndarray:
    """Depth-only `depth_image_from_pc`: (H, W) projective depth w of the
    winning point, 0 at empty pixels.

    Same projection + winner rule, but sorts only the (pixel, depth) pair
    instead of the full 6-array payload — ~3x less `lax.sort` traffic.
    Built for the matching scan's K-candidate re-renders
    (models/matching.py), which consume nothing but the depth channel.
    """
    h, w_sz = cam_img_size
    pts = jnp.concatenate(
        [pc[:3].astype(jnp.float32), jnp.ones((1, pc.shape[1]), jnp.float32)],
        axis=0)
    xyw = cam_T_velo.astype(jnp.float32) @ pts
    wd = xyw[2]
    safe_w = jnp.where(jnp.abs(wd) > 1e-12, wd, 1e-12)
    x = xyw[0] / safe_w
    y = xyw[1] / safe_w
    valid = (x < w_sz) & (x > 0) & (y < h) & (y > 0) & (wd > 0)
    xi = jnp.clip(x.astype(jnp.int32), 0, w_sz - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    pix = jnp.where(valid, yi * w_sz + xi, h * w_sz)

    order = wd if mode == "near" else -wd
    pix_s, ord_s = jax.lax.sort((pix, order), num_keys=2)
    first = jnp.concatenate([jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]])
    write_idx = jnp.where(first & (pix_s < h * w_sz), pix_s, h * w_sz)
    depth_s = ord_s if mode == "near" else -ord_s
    out = jnp.zeros((h * w_sz + 1,), jnp.float32)
    out = out.at[write_idx].set(depth_s, mode="drop")
    return out[: h * w_sz].reshape(h, w_sz)


@partial(jax.jit, static_argnames=("method",))
def rotate_image(img: jnp.ndarray, rot_mat: jnp.ndarray,
                 method: str = "nearest") -> jnp.ndarray:
    """Rotate an image in-plane by the angle encoded in a rotation matrix.

    On-device replacement for the reference's mid-forward GPU->CPU->PIL->GPU
    detour (reference common/torch_utils.py:235-254, nets/hnet.py:79).  Uses
    PIL-compatible conventions: counterclockwise by atan2(m10, m00), rotation
    about the image center (W/2, H/2), zero fill, nearest resampling by
    default (PIL `Image.rotate` defaults to NEAREST).

    Args:
      img: (C, H, W) image.
      rot_mat: (3, 3) (only the in-plane angle atan2(m10, m00) is used).
      method: "nearest" | "bilinear".
    Returns:
      (C, H, W) rotated image.
    """
    c, h, w = img.shape
    theta = jnp.arctan2(rot_mat[1, 0], rot_mat[0, 0])
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0

    if method == "nearest":
        # PIL's NEAREST affine path is 16.16 fixed-point: the per-axis column
        # increment, row increment, and origin (source coordinate of output
        # pixel (0,0) center) are each rounded to the nearest 1/65536, then
        # accumulated in integers with floor via an arithmetic >>16.  This
        # quantization drifts up to ~0.01 px from the exact affine map across
        # a 1600-px row, so replicating it (rather than the exact map) is
        # what makes h_img bit-identical to the reference's PIL detour
        # (reference common/torch_utils.py:235-254; scheme reverse-engineered
        # empirically — see tests/test_geometry.py).
        def fix(v):  # round-to-nearest 1/65536, floor tie-break like PIL
            return jnp.floor(v * 65536.0 + 0.5).astype(jnp.int32)

        # inverse-map coefficients, PIL convention:
        #   x_src = a0*(x+.5) + a1*(y+.5) + a2,  a2 = cx*(1-ct) + st*cy
        #   y_src = a3*(x+.5) + a4*(y+.5) + a5,  a5 = cy*(1-ct) - st*cx
        # Origin v0 = a0*.5 + a1*.5 + a2 is O(image size); v0*65536 exceeds
        # f32 integer precision, so split v0 into an exact integer part and
        # a small fractional remainder before fixing.
        one_m_ct = 2.0 * jnp.sin(theta * 0.5) ** 2  # 1-cos, accurate near 0
        vx0 = 0.5 * ct - 0.5 * st + (cx * one_m_ct + st * cy)
        vy0 = 0.5 * st + 0.5 * ct + (cy * one_m_ct - st * cx)

        def fix_origin(v):
            k = jnp.floor(v)
            return k.astype(jnp.int32) * 65536 + fix(v - k)

        xcol = jnp.arange(w, dtype=jnp.int32)[None, :]
        yrow = jnp.arange(h, dtype=jnp.int32)[:, None]
        xfix = fix_origin(vx0) + fix(-st) * yrow + fix(ct) * xcol
        yfix = fix_origin(vy0) + fix(ct) * yrow + fix(st) * xcol
        xi = jnp.floor_divide(xfix, 65536)
        yi = jnp.floor_divide(yfix, 65536)
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        out = img[:, yi, xi]
        return jnp.where(inb[None], out, 0.0)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    # inverse map (output -> input), PIL affine convention
    x_src = ct * (xs - cx) - st * (ys - cy) + cx
    y_src = st * (xs - cx) + ct * (ys - cy) + cy
    # bilinear
    x0 = jnp.floor(x_src - 0.5)
    y0 = jnp.floor(y_src - 0.5)
    fx = (x_src - 0.5) - x0
    fy = (y_src - 0.5) - y0
    acc = jnp.zeros((c, h, w), img.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = (x0 + dx).astype(jnp.int32)
            yi = (y0 + dy).astype(jnp.int32)
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi = jnp.clip(xi, 0, w - 1)
            yi = jnp.clip(yi, 0, h - 1)
            acc = acc + jnp.where(inb[None], img[:, yi, xi] * wgt[None], 0.0)
    return acc
