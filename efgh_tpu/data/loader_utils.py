"""Host-side sample preprocessing shared by all dataset loaders.

Functional port of reference data_loader/loader_utils.py +
common/numpy_utils.py image helpers.  Everything here runs in loader worker
threads/processes on numpy/PIL; the output sample contract is fixed-shape
arrays ready for `jax.device_put`:

    (pc[3, num_points] f32, img[3, H/2, W/2] f32, calib[3, 4] f32,
     A[3, 3] f32, gts dict, fname str)
"""

from __future__ import annotations

import math
import os
import random
from math import cos, pi, sin
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import yaml
from PIL import Image
from scipy.spatial.transform import Rotation


# ---------------------------------------------------------------------------
# file readers (reference data_loader/loader_utils.py:12-61)
# ---------------------------------------------------------------------------

def pose_read(line: str) -> np.ndarray:
    vals = np.array([float(p) for p in line.split()], dtype=float)
    pose = np.eye(4)
    pose[:3, :] = vals.reshape(3, 4)
    return pose


def calib_read(calib_path: str) -> Dict[str, np.ndarray]:
    """KITTI-odometry calib.txt -> P2/Tr homogeneous matrices + inverses."""
    data = {}
    with open(calib_path) as f:
        for line in f.readlines():
            key, value = line.split(":", 1)
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                pass
    p2 = np.eye(4)
    p2[:3, :] = np.reshape(data["P2"], (3, 4))
    tr = np.eye(4)
    tr[:3, :] = np.reshape(data["Tr"], (3, 4))
    return {
        "Tr": tr,
        "Tr_inv": np.linalg.inv(tr),
        "P2": p2,
        "P2_inv": np.linalg.inv(p2),
    }


def rgb_read(filename: str) -> np.ndarray:
    assert os.path.exists(filename), f"file not found: {filename}"
    return np.array(Image.open(filename), dtype="uint8")


def pcd_read(filename: str) -> np.ndarray:
    return np.fromfile(filename, dtype=np.float32).reshape(-1, 4)


# ---------------------------------------------------------------------------
# image helpers (reference common/numpy_utils.py:426-517)
# ---------------------------------------------------------------------------

def _hwc(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] != 3:
        img = np.transpose(img, (1, 2, 0))
    return img


def zero_pad_image(img: np.ndarray, target_size) -> np.ndarray:
    img = _hwc(img)
    h, w = img.shape[0], img.shape[1]
    i = int(math.floor((target_size[0] - h) / 2.0))
    j = int(math.floor((target_size[1] - w) / 2.0))
    out = np.zeros((target_size[0], target_size[1], 3))
    out[i:i + h, j:j + w, :] = img
    return out.astype("uint8")


def crop_image(img: np.ndarray, target_size, init: bool = False) -> np.ndarray:
    img = _hwc(img)
    pad_h = max(img.shape[0], target_size[0])
    pad_w = max(img.shape[1], target_size[1])
    img = zero_pad_image(img, (pad_h, pad_w))
    i = int(math.floor((img.shape[0] - target_size[0]) / 2.0))
    j = int(math.floor((img.shape[1] - target_size[1]) / 2.0))
    if init:
        i, j = 0, 0
    return img[i:i + target_size[0], j:j + target_size[1]].astype("uint8")


def resize_image(img: np.ndarray, target_size) -> np.ndarray:
    img = _hwc(img)
    return np.array(Image.fromarray(img).resize((target_size[1], target_size[0])))


def rotate_image_expand(img: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """PIL rotate with expand=True by the in-plane angle of `mat`
    (reference common/numpy_utils.py:426-445)."""
    img = _hwc(img).astype("uint8")
    deg = math.degrees(np.arctan2(mat[1, 0], mat[0, 0]))
    return np.array(Image.fromarray(img).rotate(deg, expand=True)).astype("uint8")


def image_valid_mask(img: np.ndarray, target_size) -> np.ndarray:
    img = _hwc(img)
    mask = np.ones((target_size[0], target_size[1], 1))
    zero = (img[:, :, 0] == 0) & (img[:, :, 1] == 0) & (img[:, :, 2] == 0)
    mask[zero] = 0
    return mask.astype("uint8")


def rpy_to_matrix_np(roll: float, pitch: float, yaw: float) -> np.ndarray:
    r = Rotation.from_euler("ZYX", [yaw, pitch, roll]).as_matrix()
    out = np.eye(4)
    out[:3, :3] = r
    return out


def xyz_to_matrix_np(tx: float, ty: float, tz: float) -> np.ndarray:
    out = np.eye(4)
    out[:3, 3] = [tx, ty, tz]
    return out


# ---------------------------------------------------------------------------
# decalibration model (reference data_loader/loader_utils.py:63-103)
# ---------------------------------------------------------------------------

def rand_init_params(
    rand_init: Optional[Sequence[float]],
    rpy_range: Optional[float],
    xyz_range: Optional[float],
    t_range: Optional[float],
    rng: Optional[random.Random] = None,
) -> Tuple[float, float, float, float, float, float, float]:
    """7-tuple (rr, rp, ry, tx, ty, tz, rt): fixed (test CSV) or random."""
    if rand_init is not None:
        return tuple(rand_init)  # type: ignore[return-value]
    r = rng or random
    rr = (r.random() * 2.0 - 1.0) * pi * rpy_range
    rp = (r.random() * 2.0 - 1.0) * pi * rpy_range
    ry = (r.random() * 2.0 - 1.0) * pi * rpy_range
    tx = (r.random() * 2.0 - 1.0) * xyz_range
    ty = (r.random() * 2.0 - 1.0) * xyz_range
    tz = (r.random() * 2.0 - 1.0) * xyz_range
    rt = (r.random() * 2.0 - 1.0) * pi * t_range
    return rr, rp, ry, tx, ty, tz, rt


def preproc_gt(rr, rp, ry, tx, ty, tz, rt, posej_T_posei=None) -> Dict[str, np.ndarray]:
    """The decalibration model: rand_init_l = R(rpy) @ T(xyz);
    sensor2_T_sensor1 = posej_T_posei @ rand_init_l^-1;
    intrinsic_sensor2 = rand_init_c^-1."""
    if posej_T_posei is None:
        posej_T_posei = np.eye(4)
    lrot = rpy_to_matrix_np(rr, rp, ry)
    ltrs = xyz_to_matrix_np(tx, ty, tz)
    rand_init_l = lrot @ ltrs
    rand_init_c = np.array(
        [[cos(rt), -sin(rt), 0], [sin(rt), cos(rt), 0], [0, 0, 1]]
    )
    return {
        "rand_init_l": rand_init_l,
        "rand_init_c": rand_init_c,
        "sensor2_T_sensor1": posej_T_posei @ np.linalg.inv(rand_init_l),
        "intrinsic_sensor2": np.linalg.inv(rand_init_c),
    }


# ---------------------------------------------------------------------------
# image pipelines (reference data_loader/loader_utils.py:105-161)
# ---------------------------------------------------------------------------

def _finish_imgs(img_raw, img_rot, raw_cam_img_size):
    img_input = resize_image(
        img_rot, (img_rot.shape[0] // 2, img_rot.shape[1] // 2)
    )
    img_input = zero_pad_image(
        img_input, (raw_cam_img_size[0] // 2, raw_cam_img_size[1] // 2)
    )
    img_input = np.ascontiguousarray(
        np.transpose(np.array(img_input, dtype="uint8"), (2, 0, 1)),
        dtype=np.float32,
    )
    img_mask = image_valid_mask(img_rot, raw_cam_img_size)
    img_mask = np.ascontiguousarray(np.transpose(img_mask, (2, 0, 1)))
    return {
        "in": img_input,
        "raw": np.transpose(img_raw, (2, 0, 1)),
        "rot": np.transpose(img_rot, (2, 0, 1)),
        "img_mask": img_mask,
    }


def preproc_img(img, gts, raw_cam_img_size):
    """Generic pipeline: center-crop the raw image (KITTI/nuScenes)."""
    img_raw = crop_image(img, raw_cam_img_size, init=True)
    img_rot = rotate_image_expand(img, gts["rand_init_c"])
    img_rot = crop_image(img_rot, raw_cam_img_size)
    return _finish_imgs(img_raw, img_rot, raw_cam_img_size)


def preproc_img_rellis(img, gts, raw_cam_img_size):
    """RELLIS variant: resize 1920x1200 -> 1600x900 for the raw panel; rotate
    the full-res image and center-crop (reference
    data_loader/loader_utils.py:134-161)."""
    img_raw = resize_image(img, raw_cam_img_size)
    img_rot = rotate_image_expand(img, gts["rand_init_c"])
    img_rot = crop_image(img_rot, raw_cam_img_size)
    return _finish_imgs(img_raw, img_rot, raw_cam_img_size)


# ---------------------------------------------------------------------------
# point pipeline (reference data_loader/loader_utils.py:163-202)
# ---------------------------------------------------------------------------

def reduce_lidar_line(xyz: np.ndarray, target_lines: int) -> np.ndarray:
    """Beam decimation assuming row-major 64-beam layout, preserving the
    reference's wrap-around window per beam (reference
    data_loader/loader_utils.py:165-177; negative j wraps via numpy
    indexing — behavior preserved)."""
    orig_lines = 64
    pt_num = xyz.shape[0]
    down_rate = orig_lines // target_lines
    line_num = pt_num // orig_lines
    js = np.arange(int(-line_num / 2), int(line_num / 2))  # trunc like int()
    rows = []
    for i in range(orig_lines):
        if i % down_rate == 0:
            idx = (js + i * line_num) % pt_num  # negative j wraps array-wide
            rows.append(xyz[idx])
    return np.concatenate(rows, axis=0)


def preproc_pcd(
    pcd: np.ndarray,
    gts: Dict[str, np.ndarray],
    num_points: int,
    lidar_line: Optional[int] = None,
    radius: Optional[float] = 50.0,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Decimate/crop/subsample to exactly num_points, then decalibrate.

    Returns (4, num_points); caller takes [:3].  Padding points are zeros
    (which the decalibration maps to its translation) — matching the
    reference exactly (reference data_loader/loader_utils.py:189-201).
    """
    if lidar_line is not None:
        pcd = reduce_lidar_line(pcd, lidar_line)

    if radius is not None:
        mask = (
            (pcd[:, 0] >= -radius) & (pcd[:, 0] < radius)
            & (pcd[:, 1] >= -radius) & (pcd[:, 1] < radius)
        )
        pcd = pcd[np.where(mask)[0]]

    r = rng or np.random
    if num_points < pcd.shape[0]:
        sel = r.choice(range(pcd.shape[0]), size=num_points, replace=False)
        pcd_ = pcd[sel].T
    else:
        pcd_ = np.zeros((3, num_points))
        pcd_[:3, : pcd.shape[0]] = pcd[:, :3].T

    pc = np.ones((4, pcd_.shape[1]))
    pc[:3, :] = pcd_[:3, :]
    return np.array(gts["rand_init_l"] @ pc)


# ---------------------------------------------------------------------------
# RELLIS calib files (reference data_loader/loader_utils.py:206-230)
# ---------------------------------------------------------------------------

def get_lidar2cam_mtx(filepath: str) -> np.ndarray:
    with open(filepath) as f:
        data = yaml.load(f, Loader=yaml.Loader)
    node = data["os1_cloud_node-pylon_camera_node"]
    q = node["q"]
    t = node["t"]
    rt = np.eye(4)
    rt[:3, :3] = Rotation.from_quat([q["x"], q["y"], q["z"], q["w"]]).as_matrix()
    rt[:3, 3] = [t["x"], t["y"], t["z"]]
    return np.linalg.inv(rt)


def get_cam_mtx(filepath: str) -> np.ndarray:
    data = np.loadtxt(filepath)
    p = np.zeros((3, 3))
    p[0, 0], p[1, 1], p[2, 2] = data[0], data[1], 1.0
    p[0, 2], p[1, 2] = data[2], data[3]
    return p


# ---------------------------------------------------------------------------
# KITTI-raw calib chain (reference data_loader/pykitti_utils.py:26-90)
# ---------------------------------------------------------------------------

def read_calib_file(filepath: str) -> Dict[str, np.ndarray]:
    data = {}
    with open(filepath) as f:
        for line in f.readlines():
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                pass
    return data


def transform_from_rot_trans(r: np.ndarray, t: np.ndarray) -> np.ndarray:
    out = np.eye(4)
    out[:3, :3] = r.reshape(3, 3)
    out[:3, 3] = t.reshape(3)
    return out


def load_oxts_packets_and_poses(oxts_files: Sequence[str]):
    """KITTI-raw OXTS (GPS/IMU) packets -> IMU poses via the Mercator
    projection (pykitti-style helper vendored by the reference,
    reference data_loader/pykitti_utils.py:93-165; unused on its main path
    but part of the public loader API).

    Returns a list of (values, pose 4x4) with poses relative to the first
    frame's Mercator origin.
    """
    earth_radius = 6378137.0
    scale = None
    origin = None
    out = []
    for path in oxts_files:
        with open(path) as f:
            for line in f.readlines():
                vals = [float(x) for x in line.split()]
                lat, lon, alt = vals[0], vals[1], vals[2]
                roll, pitch, yaw = vals[3], vals[4], vals[5]
                if scale is None:
                    scale = math.cos(lat * math.pi / 180.0)
                mx = scale * lon * math.pi * earth_radius / 180.0
                my = scale * earth_radius * math.log(
                    math.tan((90.0 + lat) * math.pi / 360.0)
                )
                t = np.array([mx, my, alt])
                r = rpy_to_matrix_np(roll, pitch, yaw)[:3, :3]
                if origin is None:
                    origin = t
                pose = transform_from_rot_trans(r, t - origin)
                out.append((vals, pose))
    return out
