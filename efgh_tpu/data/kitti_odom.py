"""KITTI-odometry dataset loader (reference data_loader/kitti_odom_loader.py).

Same pair-sampling pattern as RELLIS over KITTI odometry sequences; calib
from calib.txt (P2/Tr); the pose pair is conjugated by Tr:
posej_T_posei = Tr^-1 @ Pj^-1 @ Pi @ Tr.
"""

from __future__ import annotations

import csv
import os
import random
from typing import Dict, List

import numpy as np

from efgh_tpu.data.loader_utils import (
    calib_read,
    pcd_read,
    pose_read,
    preproc_gt,
    preproc_img,
    preproc_pcd,
    rand_init_params,
    rgb_read,
)


class KITTI_ODOM:
    def __init__(self, mode: str, args):
        self.mode = mode
        self.process = ProcessKITTIODOM(args)
        self.data_path = os.path.join(args["data_root"], "dataset")
        self.accumulation_frame_num = args["accumulation_frame_num"]
        self.accumulation_frame_skip = args["accumulation_frame_skip"]

        sequences = args.get("sequences") or {
            "train": list(range(9)), "valid": [9], "test": [10],
        }
        if mode in ("train", "valid"):
            self.num_samples = (
                args["train_samples"] if mode == "train" else args["val_samples"]
            )
            self.sequences = sequences[mode]
            self.delta_ij_max = args["delta_ij_max"]
            self.translation_max = args["translation_max"]
            self.samples = self.make_sample_dataset()
        elif mode == "test":
            self.num_samples = args["val_samples"]
            self.sequences = sequences["test"]
            self.rand_init_params: Dict[str, List[float]] = {}
            with open(args["rand_init"]) as f:
                for line in csv.reader(f):
                    self.rand_init_params[line[0]] = [float(x) for x in line[1:]]
            self.samples = self.make_test_sample_dataset(self.rand_init_params)
        else:
            raise ValueError(f"wrong mode: {mode}")
        if not self.samples:
            raise RuntimeError(f"Found 0 files under {self.data_path}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        pcd, img, calibs, posej_T_posei, fname = self.file_reader(
            self.samples[index]
        )
        rand_init = self.rand_init_params[fname] if self.mode == "test" else None
        return self.process(pcd, img, calibs, posej_T_posei, fname,
                            rand_init=rand_init)

    def get_sequence_j(self, poses, calibs, seq_i):
        seq_j_min = max(seq_i - self.delta_ij_max, 0)
        seq_j_max = min(seq_i + self.delta_ij_max, len(poses) - 1)
        pi_ = pose_read(poses[seq_i])
        while True:
            seq_j = random.randint(seq_j_min, seq_j_max)
            pj = pose_read(poses[seq_j])
            posej_T_posei = (
                calibs["Tr_inv"] @ np.linalg.inv(pj) @ pi_ @ calibs["Tr"]
            )
            if np.linalg.norm(posej_T_posei[:3, 3]) < self.translation_max:
                return seq_j, posej_T_posei

    def _seq_paths(self, seq):
        seq = "{0:02d}".format(int(seq))
        calibs = calib_read(
            os.path.join(self.data_path, "sequences", seq, "calib.txt")
        )
        with open(os.path.join(self.data_path, "poses", seq + ".txt")) as f:
            poses = f.readlines()
        return seq, calibs, poses

    def make_sample_dataset(self):
        samples = []
        for seq in self.sequences:
            seq, calibs, poses = self._seq_paths(seq)
            file_list = os.listdir(
                os.path.join(self.data_path, "sequences", seq, "velodyne")
            )
            for seq_i in range(len(file_list)):
                seq_j, posej_T_posei = self.get_sequence_j(poses, calibs, seq_i)
                si, sj = str(seq_i).zfill(6), str(seq_j).zfill(6)
                samples.append({
                    "image": os.path.join(self.data_path, "sequences", seq,
                                          "image_2", sj + ".png"),
                    "velodyne_raw": os.path.join(self.data_path, "sequences",
                                                 seq, "velodyne", si + ".bin"),
                    "calib": calibs,
                    "posej_T_posei": posej_T_posei,
                    "fname": f"{seq}_{si}_{sj}",
                })
        if self.mode == "train":
            random.shuffle(samples)
        if self.num_samples > 0:
            samples = samples[: self.num_samples]
        return samples

    def make_test_sample_dataset(self, rand_init):
        samples = []
        for seq in self.sequences:
            seq, calibs, poses = self._seq_paths(seq)
            for k in rand_init.keys():
                seq1, seq_i, seq_j = (
                    k.split("_")[0], int(k.split("_")[1]), int(k.split("_")[2])
                )
                if seq1 != seq:
                    continue
                pi_ = pose_read(poses[seq_i])
                pj = pose_read(poses[seq_j])
                posej_T_posei = (
                    calibs["Tr_inv"] @ np.linalg.inv(pj) @ pi_ @ calibs["Tr"]
                )
                si, sj = str(seq_i).zfill(6), str(seq_j).zfill(6)
                samples.append({
                    "image": os.path.join(self.data_path, "sequences", seq,
                                          "image_2", sj + ".png"),
                    "velodyne_raw": os.path.join(self.data_path, "sequences",
                                                 seq, "velodyne", si + ".bin"),
                    "calib": calibs,
                    "posej_T_posei": posej_T_posei,
                    "fname": k,
                })
        if self.num_samples > 0:
            samples = samples[: self.num_samples]
        return samples

    def search_for_accumulation(self, pcd_dir, seq, seq_i, seq_sample_num,
                                calibs, p_oi, stride):
        with open(os.path.join(self.data_path, "poses", seq + ".txt")) as f:
            poses = f.readlines()
        p_io = np.linalg.inv(p_oi)
        pc_list = []
        counter = 0
        while len(pc_list) < self.accumulation_frame_num:
            counter += 1
            seq_j = seq_i + stride * counter
            if seq_j < 0 or seq_j >= seq_sample_num:
                break
            pc_j = pcd_read(
                os.path.join(pcd_dir, str(seq_j).zfill(6) + ".bin")
            ).T
            p_ij = p_io @ pose_read(poses[seq_j])
            pc_j = np.concatenate(
                [pc_j[:3], np.ones((1, pc_j.shape[1]), pc_j.dtype)], axis=0
            )
            pc_j = calibs["Tr_inv"] @ p_ij @ calibs["Tr"] @ pc_j
            pc_list.append(pc_j[:3])
        return pc_list

    def get_accumulated_pc(self, pcd_path, seq, seq_i, calibs):
        pc_np = pcd_read(pcd_path).T
        pc_np = pc_np[:, np.random.permutation(pc_np.shape[1])][:3]
        if self.accumulation_frame_num <= 0.5:
            return pc_np.T
        with open(os.path.join(self.data_path, "poses", seq + ".txt")) as f:
            poses = f.readlines()
        p_oi = pose_read(poses[seq_i])
        pcd_dir = os.path.dirname(pcd_path)
        pc_list = [pc_np]
        pc_list += self.search_for_accumulation(
            pcd_dir, seq, seq_i, len(poses), calibs, p_oi,
            -self.accumulation_frame_skip)
        pc_list += self.search_for_accumulation(
            pcd_dir, seq, seq_i, len(poses), calibs, p_oi,
            self.accumulation_frame_skip)
        return np.concatenate(pc_list, axis=1).T

    def file_reader(self, sample):
        seq, si = sample["fname"].split("_")[0], sample["fname"].split("_")[1]
        pcd = self.get_accumulated_pc(sample["velodyne_raw"], seq, int(si),
                                      sample["calib"])
        img = rgb_read(sample["image"])
        return pcd, img, sample["calib"], sample["posej_T_posei"], sample["fname"]


class ProcessKITTIODOM:
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

    def __call__(self, pcd, img, calibs, posej_T_posei, fname, rand_init=None):
        rr, rp, ry, tx, ty, tz, rt = rand_init_params(
            rand_init, self.l_rot_range, self.l_trs_range, self.c_rot_range
        )
        gts = preproc_gt(rr, rp, ry, tx, ty, tz, rt, posej_T_posei)
        imgs = preproc_img(img, gts, self.raw_cam_img_size)
        pc = preproc_pcd(pcd, gts, self.num_points, self.lidar_line)

        img_in = imgs["in"]
        gts["img_raw"] = imgs["raw"]
        gts["img_rot"] = imgs["rot"]
        gts["img_mask"] = imgs["img_mask"]

        a = np.array([
            [1, 0, -self.raw_cam_img_size[1] / 2],
            [0, 1, -self.raw_cam_img_size[0] / 2],
            [0, 0, 1],
        ])
        calib = (calibs["P2"] @ calibs["Tr"])[:3, :]
        gts["cam_T_velo"] = (
            np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
            @ gts["sensor2_T_sensor1"]
        )
        return pc[:3, :], img_in, calib, a, gts, fname
