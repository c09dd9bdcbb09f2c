"""Visualization panels for tensorboard summaries and test-time dumps.

Numpy port of reference common/numpy_utils.py:8-297, vectorized: the
reference colorizes depth maps with per-pixel Python loops
(reference common/numpy_utils.py:377-400); we use a grayscale dilation
(`maximum_filter`), which reproduces the intended nearest-point-wins splat
rendering without the raster-order dependence.  The reference's
`eval_image_draw` crash (missing `px` argument when `save_image: True`,
reference test.py:57 vs common/numpy_utils.py:181) is fixed here: px
defaults to 2.
"""

from __future__ import annotations

import math
from math import pi
from typing import Dict

import numpy as np
from PIL import Image
from scipy.ndimage import maximum_filter

from efgh_tpu.data.loader_utils import (
    crop_image,
    resize_image,
    rotate_image_expand,
)


def _cmap(name="plasma"):
    import matplotlib.pyplot as plt

    return plt.get_cmap(name)


def range_img_np(pc, transform, range_img_size, lidar_fov_rad):
    """(3, N) cloud -> (H, W) range image (numpy, host-side)."""
    fov_up = lidar_fov_rad[0] * pi
    fov_down = lidar_fov_rad[1] * pi
    pts = np.concatenate([pc[:3], np.ones((1, pc.shape[1]))], 0)
    pts = transform @ pts
    r = np.sqrt(np.sum(pts[:3] ** 2, 0))
    with np.errstate(invalid="ignore", divide="ignore"):
        pitch = np.arcsin(np.clip(pts[2] / np.maximum(r, 1e-9), -1, 1))
    yaw = np.arctan2(pts[1], pts[0])
    mask = (pitch < fov_up) & (pitch > fov_down) & (r > 1e-9)
    u = ((fov_up - pitch[mask]) / (fov_up - fov_down)) * (range_img_size[0] - 1)
    v = ((-yaw[mask] + pi) / (2 * pi)) * (range_img_size[1] - 1)
    img = np.zeros(range_img_size)
    img[u.astype(int), v.astype(int)] = r[mask]
    return img


def depth_img_np(pc, cam_T_velo, img_size):
    """(3, N) cloud -> (H, W) projective-depth image (numpy, host-side)."""
    pts = np.concatenate([pc[:3], np.ones((1, pc.shape[1]))], 0)
    xyw = np.asarray(cam_T_velo)[:3] @ pts
    w = xyw[2]
    with np.errstate(invalid="ignore", divide="ignore"):
        x = xyw[0] / np.where(np.abs(w) > 1e-9, w, 1e-9)
        y = xyw[1] / np.where(np.abs(w) > 1e-9, w, 1e-9)
    mask = (w > 0) & (x >= 0) & (x < img_size[1]) & (y >= 0) & (y < img_size[0])
    img = np.zeros(img_size)
    img[y[mask].astype(int), x[mask].astype(int)] = w[mask]
    return img


def minmax_color_img(img, cmap=None, px=2, valid_mask=False):
    """Normalize, splat-dilate by px, colorize (vectorized version of
    reference common/numpy_utils.py:377-400)."""
    cmap = cmap or _cmap()
    img = np.asarray(img, dtype=np.float64)
    rng = np.max(img) - np.min(img)
    img = (img - np.min(img)) / (rng if rng > 0 else 1.0)
    dil = maximum_filter(img, size=2 * px + 1) if px > 0 else img
    v_mask = dil != 0
    colored = (255 * cmap(dil)[:, :, :3]).astype("uint8")
    return (colored, v_mask) if valid_mask else colored


def depth_with_cam(colored_depth, valid_mask, cam_img, img_size):
    """Overlay colored depth on the camera image where depth is valid."""
    cam = resize_image(cam_img, img_size)
    cam = np.asarray(cam)
    if cam.ndim == 3 and cam.shape[2] != 3:
        cam = np.transpose(cam, (1, 2, 0))
    out = np.where(valid_mask[..., None], colored_depth, cam)
    return out.astype("uint8")


def score_image(score, range_img_size, cmap=None):
    img = np.tile(score[None, :], (8, 1))
    colored = minmax_color_img(img, cmap=cmap, px=2)
    resized = Image.fromarray(colored).resize(
        (range_img_size[1], range_img_size[0])
    )
    return np.array(resized, dtype="uint8")


def save_image(img, fname):
    img = np.asarray(img).astype("uint8")
    if img.ndim == 3 and img.shape[2] != 3:
        img = np.transpose(img, (1, 2, 0))
    Image.fromarray(img).save(fname)


# fixed debug camera (the reference's hard-coded open3d viewpoint,
# reference common/numpy_utils.py:590-593)
_DBG_FRONT = np.array([0.9288, -0.2951, -0.2242])
_DBG_UP = np.array([-0.3402, -0.9189, -0.1996])
_DBG_SRC_COLOR = (255, 180, 0)      # open3d [1, 0.706, 0]
_DBG_TGT_COLOR = (0, 166, 237)      # open3d [0, 0.651, 0.929]


def render_registration_result(source, target=None, size: int = 800,
                               px: int = 1, path: str = None) -> np.ndarray:
    """Headless analog of the reference's open3d registration viewers
    (reference common/numpy_utils.py:579-606): orthographic render of one
    or two (3, N) clouds from the same hard-coded viewpoint with the same
    source/target colors, nearest-point-wins, returned as (size, size, 3)
    uint8 (optionally saved as PNG).  Works without open3d — this
    environment (and most TPU pods) has no display or open3d wheel."""
    f = -_DBG_FRONT / np.linalg.norm(_DBG_FRONT)       # view direction
    u = _DBG_UP - _DBG_UP.dot(f) * f
    u = u / np.linalg.norm(u)
    r = np.cross(u, f)
    rot = np.stack([r, u, f])  # rows: right, up, forward

    clouds = [(np.asarray(source, np.float64), _DBG_SRC_COLOR)]
    if target is not None:
        clouds.append((np.asarray(target, np.float64), _DBG_TGT_COLOR))
    pts = np.concatenate([c.T for c, _ in clouds])          # (N, 3)
    cols = np.concatenate(
        [np.tile(np.array(col, np.uint8), (c.shape[1], 1))
         for c, col in clouds])
    cam = pts @ rot.T
    lo, hi = cam[:, :2].min(0), cam[:, :2].max(0)
    span = float(max((hi - lo).max(), 1e-6))
    xy = ((cam[:, :2] - (lo + hi) / 2) / span * (size * 0.9)
          + size / 2).astype(np.int64)
    img = np.zeros((size, size, 3), np.uint8)
    order = np.argsort(-cam[:, 2])  # far first -> near overwrites
    xs = np.clip(xy[order, 0], px, size - 1 - px)
    ys = np.clip(size - 1 - xy[order, 1], px, size - 1 - px)
    for dy in range(-px, px + 1):
        for dx in range(-px, px + 1):
            img[ys + dy, xs + dx] = cols[order]
    if path:
        save_image(img, path)
    return img


def draw_registration_result(source, target):
    """Interactive open3d viewer for a pair of clouds (debug aid; reference
    common/numpy_utils.py:579-594).  Falls back to the headless
    render_registration_result PNG when open3d is absent."""
    try:
        import open3d as o3d  # optional; not in the production env
    except ImportError:
        path = "registration_debug.png"
        render_registration_result(source, target, path=path)
        print(f"[viz] open3d unavailable; wrote {path}")
        return

    def _cloud(pts, color):
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(np.transpose(pts))
        pc.paint_uniform_color(color)
        return pc

    o3d.visualization.draw_geometries(
        [_cloud(source, [1.0, 0.706, 0.0]), _cloud(target, [0.0, 0.651, 0.929])]
    )


def draw_single_registration_result(source):
    """Interactive open3d viewer for one cloud (reference
    common/numpy_utils.py:596-606).  Headless PNG fallback as above."""
    try:
        import open3d as o3d
    except ImportError:
        path = "registration_debug_single.png"
        render_registration_result(source, path=path)
        print(f"[viz] open3d unavailable; wrote {path}")
        return

    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.transpose(source))
    pc.paint_uniform_color([1.0, 0.706, 0.0])
    o3d.visualization.draw_geometries([pc])


def _depth_panel(pc, mat, cam_rot, raw, cmap, px=2):
    d = depth_img_np(pc, mat, raw)
    colored, valid = minmax_color_img(d, cmap=cmap, px=px, valid_mask=True)
    return depth_with_cam(colored, valid, cam_rot, raw)


def image_draw(pcd, img, calib, A, gt, pred, raw_cam_img_size, lidar_fov_rad,
               cmap=None) -> Dict[str, np.ndarray]:
    """Tensorboard panels (reference common/numpy_utils.py:8-179): composited
    range / depth / camera / yaw-score / dense-depth / mask strips comparing
    input, per-stage predictions, and ground truth.

    All tensors are host numpy; batched inputs use sample 0.
    """
    cmap = cmap or _cmap()
    pc = np.asarray(pcd)[0]
    in_img = np.asarray(img)[0].astype("uint8")
    calib = np.asarray(calib)[0]
    a_mat = np.asarray(A)[0]
    raw = tuple(raw_cam_img_size)
    net_size = (raw[0] // 2, raw[1] // 2)
    rng_size = (raw[0] // 2, raw[1] * 2)

    def g(key):
        return np.asarray(gt[key])[0]

    def p(key):
        return np.asarray(pred[key])[0]

    in_img = crop_image(in_img, net_size)
    cam_rot = resize_image(g("img_rot").astype("uint8"), raw) \
        if "img_rot" in gt else np.zeros((*raw, 3), "uint8")

    in_depth = _depth_panel(pc, calib, cam_rot, raw, cmap)

    gt_e, gt_f, gt_g, gt_h = g("e_l"), g("f_l"), g("g_l"), g("h_c")
    gt_s2s1 = gt_g @ gt_f @ gt_e
    gt_ctv = np.linalg.inv(a_mat) @ gt_h @ a_mat @ calib @ gt_s2s1
    gt_depth = _depth_panel(pc, gt_ctv, cam_rot, raw, cmap)

    gt_img = crop_image(rotate_image_expand(in_img, gt_h), net_size)
    in_range = minmax_color_img(
        range_img_np(pc, np.eye(4), rng_size, lidar_fov_rad), cmap=cmap)
    gt_range = minmax_color_img(
        range_img_np(pc, gt_s2s1, rng_size, lidar_fov_rad), cmap=cmap)

    out: Dict[str, np.ndarray] = {}

    rng_e = minmax_color_img(
        range_img_np(pc, p("e_l"), rng_size, lidar_fov_rad), cmap=cmap)
    depth_eh = _depth_panel(pc, p("eh_cam_T_velo"), cam_rot, raw, cmap)

    img_h = crop_image(rotate_image_expand(in_img, p("h_c")), net_size)
    out["cam"] = np.concatenate([in_img, img_h, gt_img], 0)

    ef_l = p("f_l") @ p("e_l")
    rng_ef = minmax_color_img(
        range_img_np(pc, ef_l, rng_size, lidar_fov_rad), cmap=cmap)
    depth_efh = _depth_panel(pc, p("efh_cam_T_velo"), cam_rot, raw, cmap)

    out["score"] = np.concatenate([
        score_image(np.asarray(gt["f_score"])[0], rng_size, cmap),
        score_image(np.asarray(pred["f_score"])[0], rng_size, cmap),
    ], 0)

    efg_l = p("g_l") @ ef_l
    rng_efg = minmax_color_img(
        range_img_np(pc, efg_l, rng_size, lidar_fov_rad), cmap=cmap)
    depth_efgh = _depth_panel(pc, p("efgh_cam_T_velo"), cam_rot, raw, cmap)

    out["dimage"] = np.concatenate([
        minmax_color_img(p("g_depth")[0], cmap=cmap, px=0),
        minmax_color_img(g("g_depth")[0], cmap=cmap, px=2),
    ], 0)
    out["mask"] = np.concatenate([
        minmax_color_img(p("g_mask")[0], cmap=cmap, px=0),
        minmax_color_img(g("g_mask")[0], cmap=cmap, px=0),
    ], 0)

    out["range"] = np.concatenate(
        [in_range, rng_e, rng_ef, rng_efg, gt_range], 0)
    out["depth"] = np.concatenate(
        [in_depth, depth_eh, depth_efh, depth_efgh, gt_depth], 0)
    return out


def eval_image_draw(pcd, img, calib, A, gt, pred, raw_cam_img_size,
                    lidar_fov_rad, px=2, cmap=None) -> Dict[str, np.ndarray]:
    """Test-time panels (reference common/numpy_utils.py:181-297): per-stage
    depth overlays, each counter-rotated by the predicted roll."""
    cmap = cmap or _cmap("jet")
    pc = np.asarray(pcd)[0]
    raw = tuple(raw_cam_img_size)
    net_size = (raw[0] // 2, raw[1] // 2)

    cam_rot = resize_image(np.asarray(gt["img_rot"])[0].astype("uint8"), raw) \
        if "img_rot" in gt else np.zeros((*raw, 3), "uint8")

    def p(key):
        return np.asarray(pred[key])[0]

    out = {
        "pred_depth_EH": _depth_panel(pc, p("eh_cam_T_velo"), cam_rot, raw,
                                      cmap, px),
        "pred_depth_EFH": _depth_panel(pc, p("efh_cam_T_velo"), cam_rot, raw,
                                       cmap, px),
        "pred_depth_EFGH": _depth_panel(pc, p("efgh_cam_T_velo"), cam_rot,
                                        raw, cmap, 2),
    }
    h_c = p("h_c")
    for k in list(out.keys()):
        out[k] = crop_image(rotate_image_expand(out[k], h_c), net_size)
    return out
