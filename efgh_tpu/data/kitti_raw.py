"""KITTI-raw extrinsic-calibration benchmark loader
(reference data_loader/kitti_raw_loader.py).

Same-frame camera+LiDAR (no pose pair); hard-coded drive lists per mode; the
full pykitti-style calibration chain produces T_cam2_velo.
"""

from __future__ import annotations

import csv
import os
import random
from typing import Dict, List

import numpy as np

from efgh_tpu.data.loader_utils import (
    pcd_read,
    preproc_gt,
    preproc_img,
    preproc_pcd,
    rand_init_params,
    read_calib_file,
    rgb_read,
    transform_from_rot_trans,
)

TRAIN_DRIVES = [
    "0001", "0002", "0009", "0011", "0013", "0014", "0015", "0017", "0018",
    "0019", "0020", "0022", "0023", "0027", "0028", "0029", "0032", "0035",
    "0036", "0039", "0046", "0048", "0051", "0052", "0056", "0057", "0059",
    "0060", "0061", "0064", "0079", "0084", "0086", "0087", "0091", "0093",
    "0095", "0096", "0101", "0104", "0106", "0113", "0117", "0119",
]
VALID_DRIVES = ["0005", "0070"]
TEST_DRIVES = ["0028"]


def load_kitti_raw_calib(calib_path: str) -> Dict[str, np.ndarray]:
    """velo->rectified-cam projection chain (reference
    data_loader/kitti_raw_loader.py:113-215)."""
    d = read_calib_file(os.path.join(calib_path, "calib_velo_to_cam.txt"))
    t_cam0unrect_velo = transform_from_rot_trans(d["R"], d["T"])
    cc = read_calib_file(os.path.join(calib_path, "calib_cam_to_cam.txt"))
    out: Dict[str, np.ndarray] = {"T_cam0_velo_unrect": t_cam0unrect_velo}
    r_rect_00 = np.eye(4)
    r_rect_00[:3, :3] = np.reshape(cc["R_rect_00"], (3, 3))
    out["R_rect_00"] = r_rect_00
    for cam in range(4):
        p_rect = np.reshape(cc[f"P_rect_{cam:02d}"], (3, 4))
        out[f"P_rect_{cam}0"] = p_rect
        out[f"T_cam{cam}_velo"] = p_rect @ r_rect_00 @ t_cam0unrect_velo
    imu = read_calib_file(os.path.join(calib_path, "calib_imu_to_velo.txt"))
    out["T_velo_imu"] = transform_from_rot_trans(imu["R"], imu["T"])
    return out


class KITTI_RAW:
    def __init__(self, mode: str, args):
        self.mode = mode
        self.process = ProcessKITTIRAW(args)
        self.data_path = args["data_root"]
        self.cams = ["image_02"]
        if mode == "train":
            self.dates = ["2011_09_26"]
            self.drive_list = TRAIN_DRIVES
            self.num_samples = args["train_samples"]
        elif mode == "valid":
            self.dates = ["2011_09_26"]
            self.drive_list = VALID_DRIVES
            self.num_samples = args["val_samples"]
        elif mode == "test":
            self.dates = ["2011_09_30"]
            self.drive_list = TEST_DRIVES
            self.num_samples = args["val_samples"]
        else:
            raise ValueError(f"wrong mode: {mode}")
        self.samples = self.make_sample_dataset()
        if mode == "test":
            self.rand_init: Dict[str, List[float]] = {}
            with open(args["rand_init"]) as f:
                for line in csv.reader(f):
                    self.rand_init[line[0]] = [float(x) for x in line[1:]]
        if not self.samples:
            raise RuntimeError(f"Found 0 files under {self.data_path}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        pcd, img, calibs, cam, fname = self.file_reader(self.samples[index])
        if self.mode != "test":
            rand_init = None
        else:
            rand_init = self.rand_init[fname.split("/")[-1]]
        return self.process(pcd, img, calibs, cam, fname, rand_init=rand_init)

    def make_sample_dataset(self):
        samples = []
        for date in self.dates:
            for dnum in self.drive_list:
                drive = f"{date}_drive_{dnum}_sync"
                vdir = os.path.join(self.data_path, date, drive,
                                    "velodyne_points", "data")
                for fname in os.listdir(vdir):
                    fname = fname[:-4]
                    for cam in self.cams:
                        samples.append({
                            "image": os.path.join(self.data_path, date, drive,
                                                  cam, "data", fname + ".png"),
                            "velodyne_raw": os.path.join(vdir, fname + ".bin"),
                            "calib_path": os.path.join(self.data_path, date),
                            "fname": os.path.join(date, drive, fname),
                            "cam": cam,
                        })
        if self.mode == "train":
            random.shuffle(samples)
        elif self.mode == "test":
            samples.sort(key=lambda s: int(s["image"].split("/")[-1][:-4]))
        if self.num_samples > 0:
            samples = samples[: self.num_samples]
        return samples

    def file_reader(self, sample):
        pcd = pcd_read(sample["velodyne_raw"])[:, :3]
        img = rgb_read(sample["image"])
        calibs = load_kitti_raw_calib(sample["calib_path"])
        return pcd, img, calibs, sample["cam"], sample["fname"]


class ProcessKITTIRAW:
    def __init__(self, args):
        self.raw_cam_img_size = tuple(args["raw_cam_img_size"])
        self.lidar_line = args["lidar_line"]
        self.num_points = args["num_points"]
        if not args["test"]:
            self.l_rot_range = args["dclb"]["l_rot_range"]
            self.l_trs_range = args["dclb"]["l_trs_range"]
            self.c_rot_range = args["dclb"]["c_rot_range"]
        else:
            self.l_rot_range = self.l_trs_range = self.c_rot_range = None

    def __call__(self, pcd, img, calibs, cam, fname, rand_init=None):
        rr, rp, ry, tx, ty, tz, rt = rand_init_params(
            rand_init, self.l_rot_range, self.l_trs_range, self.c_rot_range
        )
        gts = preproc_gt(rr, rp, ry, tx, ty, tz, rt)  # same-frame: no pose pair
        imgs = preproc_img(img, gts, self.raw_cam_img_size)
        pc = preproc_pcd(pcd, gts, self.num_points, self.lidar_line)

        img_in = imgs["in"]
        gts["img_raw"] = imgs["raw"]
        gts["img_rot"] = imgs["rot"]
        gts["img_mask"] = imgs["img_mask"]

        calib = calibs["T_cam2_velo" if cam == "image_02" else "T_cam3_velo"]
        a = np.array([
            [1, 0, -self.raw_cam_img_size[1] / 2],
            [0, 1, -self.raw_cam_img_size[0] / 2],
            [0, 0, 1],
        ])
        gts["cam_T_velo"] = (
            np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
            @ gts["sensor2_T_sensor1"]
        )
        return pc[:3, :], img_in, calib, a, gts, fname
