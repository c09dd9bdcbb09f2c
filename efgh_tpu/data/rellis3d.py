"""RELLIS-3D dataset loader (reference data_loader/rellis3d_loader.py).

Pairs a LiDAR frame i with a camera frame j within `delta_ij_max` frames and
< `translation_max` meters; calib comes from transforms.yaml (inverted
quaternion lidar->cam) and camera_info.txt intrinsics scaled 1920x1200 ->
1600x900.  Test mode is keyed off the frozen rand-init CSV for deterministic
evaluation.
"""

from __future__ import annotations

import csv
import os
import random
from typing import Dict, List, Optional

import numpy as np

from efgh_tpu.data.loader_utils import (
    get_cam_mtx,
    get_lidar2cam_mtx,
    pcd_read,
    pose_read,
    preproc_gt,
    preproc_img_rellis,
    preproc_pcd,
    rand_init_params,
    rgb_read,
)

TEST_SEQS = [0, 1, 2, 3, 4]


class RELLIS_3D:
    def __init__(self, mode: str, args):
        self.mode = mode
        self.args = args
        self.data_path = args["data_root"]
        self.process = ProcessRELLIS(args)
        self.accumulation_frame_num = args["accumulation_frame_num"]
        self.accumulation_frame_skip = args["accumulation_frame_skip"]

        if mode in ("train", "valid"):
            self.num_samples = (
                args["train_samples"] if mode == "train" else args["val_samples"]
            )
            self.delta_ij_max = args["delta_ij_max"]
            self.translation_max = args["translation_max"]
            self.samples = self.make_sample_dataset()
        elif mode == "test":
            self.num_samples = args["val_samples"]
            self.rand_init: Dict[str, List[float]] = {}
            with open(args["rand_init"]) as f:
                for line in csv.reader(f):
                    self.rand_init[line[0]] = [float(x) for x in line[1:]]
            self.samples = self.make_test_sample_dataset(self.rand_init)
        else:
            raise ValueError(f"wrong mode: {mode}")
        if not self.samples:
            raise RuntimeError(f"Found 0 files under {self.data_path}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        pcd, img, calib_seq, posej_T_posei, fname = self.file_reader(
            self.samples[index]
        )
        rand_init = self.rand_init[fname] if self.mode == "test" else None
        return self.process(pcd, img, calib_seq, posej_T_posei, fname,
                            rand_init=rand_init)

    # -- dataset assembly --

    def _cam_name_dict(self, seqs):
        out = {}
        for seq in seqs:
            out[int(seq)] = {}
            d = os.path.join(self.data_path, "Rellis-3D", str(seq).zfill(5),
                             "pylon_camera_node")
            for fn in os.listdir(d):
                out[int(seq)][fn[5:11]] = fn[:-4]
        return out

    def _calib_dict(self, seqs):
        k_scale = np.eye(4)
        k_scale[0, 0] = 1600.0 / 1920.0
        k_scale[1, 1] = 900.0 / 1200.0
        out = {}
        for seq in seqs:
            seq = int(seq)
            # note: the reference reads transforms.yaml from a "Rellis_3D"
            # sibling tree (underscore) and everything else from "Rellis-3D"
            # (reference data_loader/rellis3d_loader.py:105,110); preserved.
            tr = get_lidar2cam_mtx(
                os.path.join(self.data_path, "Rellis_3D", str(seq).zfill(5),
                             "transforms.yaml")
            )
            p = np.eye(4)
            p[:3, :3] = get_cam_mtx(
                os.path.join(self.data_path, "Rellis-3D", str(seq).zfill(5),
                             "camera_info.txt")
            )
            p = k_scale @ p
            out[seq] = {
                "Tr": tr, "Tr_inv": np.linalg.inv(tr),
                "P": p, "P_inv": np.linalg.inv(p),
            }
        return out

    def _read_poses(self, seq):
        with open(os.path.join(self.data_path, "Rellis-3D",
                               str(seq).zfill(5), "poses.txt")) as f:
            return f.readlines()

    def get_sequence_j(self, poses, seq_i):
        seq_j_min = max(seq_i - self.delta_ij_max, 0)
        seq_j_max = min(seq_i + self.delta_ij_max, len(poses) - 1)
        pi_ = pose_read(poses[seq_i])
        while True:
            seq_j = random.randint(seq_j_min, seq_j_max)
            pj = pose_read(poses[seq_j])
            posej_T_posei = np.linalg.inv(pj) @ pi_
            if np.linalg.norm(posej_T_posei[:3, 3]) < self.translation_max:
                return seq_j, posej_T_posei

    def make_sample_dataset(self):
        ptname = "pt_train.lst" if self.mode == "train" else "pt_val.lst"
        with open(os.path.join(self.data_path, ptname)) as f:
            split_list = f.readlines()

        split_dict: Dict[int, List[int]] = {}
        for line in split_list:
            seq, _, fn = line.split(" ")[0].split("/")
            split_dict.setdefault(int(seq), []).append(int(fn[:-4]))

        cam_names = self._cam_name_dict(split_dict.keys())
        calibs = self._calib_dict(split_dict.keys())

        samples = []
        for seq, file_list in split_dict.items():
            seq_str = str(seq).zfill(5)
            poses = self._read_poses(seq)
            for seq_i in file_list:
                seq_j, posej_T_posei = self.get_sequence_j(poses, seq_i)
                si, sj = str(seq_i).zfill(6), str(seq_j).zfill(6)
                samples.append({
                    "image": os.path.join(
                        self.data_path, "Rellis-3D", seq_str,
                        "pylon_camera_node", cam_names[seq][sj] + ".jpg"),
                    "os1": os.path.join(
                        self.data_path, "Rellis-3D", seq_str,
                        "os1_cloud_node_kitti_bin", si + ".bin"),
                    "calib": calibs[seq],
                    "posej_T_posei": posej_T_posei,
                    "fname": f"{seq_str}_{si}_{sj}",
                })
        random.shuffle(samples)
        if self.num_samples > 0:
            samples = samples[: self.num_samples]
        return samples

    def make_test_sample_dataset(self, rand_init):
        cam_names = self._cam_name_dict(TEST_SEQS)
        calibs = self._calib_dict(TEST_SEQS)
        samples = []
        for seq in TEST_SEQS:
            seq_str = str(seq).zfill(5)
            poses = self._read_poses(seq)
            for k in rand_init.keys():
                seq_key, seq_i, seq_j = (int(x) for x in k.split("_"))
                if seq_key != seq:
                    continue
                pi_ = pose_read(poses[seq_i])
                pj = pose_read(poses[seq_j])
                posej_T_posei = np.linalg.inv(pj) @ pi_
                si, sj = str(seq_i).zfill(6), str(seq_j).zfill(6)
                samples.append({
                    "image": os.path.join(
                        self.data_path, "Rellis-3D", seq_str,
                        "pylon_camera_node", cam_names[seq][sj] + ".jpg"),
                    "os1": os.path.join(
                        self.data_path, "Rellis-3D", seq_str,
                        "os1_cloud_node_kitti_bin", si + ".bin"),
                    "calib": calibs[seq],
                    "posej_T_posei": posej_T_posei,
                    "fname": f"{seq_str}_{si}_{sj}",
                })
        if self.num_samples > 0:
            samples = samples[: self.num_samples]
        return samples

    # -- multi-frame accumulation (reference rellis3d_loader.py:218-280) --

    def search_for_accumulation(self, pcd_dir, poses, seq_i, seq_sample_num,
                                p_oi, stride):
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
            pc_list.append((p_ij @ pc_j)[:3])
        return pc_list

    def get_accumulated_pc(self, pcd_path, seq, seq_i):
        pc_np = pcd_read(pcd_path).T
        pc_np = pc_np[:, np.random.permutation(pc_np.shape[1])][:3]
        if self.accumulation_frame_num <= 0.5:
            return pc_np.T
        poses = self._read_poses(int(seq))
        p_oi = pose_read(poses[seq_i])
        pcd_dir = os.path.dirname(pcd_path)
        pc_list = [pc_np]
        pc_list += self.search_for_accumulation(
            pcd_dir, poses, seq_i, len(poses), p_oi,
            -self.accumulation_frame_skip)
        pc_list += self.search_for_accumulation(
            pcd_dir, poses, seq_i, len(poses), p_oi,
            self.accumulation_frame_skip)
        return np.concatenate(pc_list, axis=1).T

    def file_reader(self, sample):
        seq, si = sample["fname"].split("_")[0], sample["fname"].split("_")[1]
        pcd = self.get_accumulated_pc(sample["os1"], seq, int(si))
        img = rgb_read(sample["image"])
        return pcd, img, sample["calib"], sample["posej_T_posei"], sample["fname"]


class ProcessRELLIS:
    """Per-sample transform (reference rellis3d_loader.py:292-339): axis-flip
    R = diag(-1,-1,1) applied to the cloud with R^-1 folded into calib."""

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

    def __call__(self, pcd, img, calib_seq, posej_T_posei, fname, rand_init=None):
        rr, rp, ry, tx, ty, tz, rt = rand_init_params(
            rand_init, self.l_rot_range, self.l_trs_range, self.c_rot_range
        )
        r_flip = np.diag([-1.0, -1.0, 1.0, 1.0])
        pc = np.ones((4, pcd.shape[0]))
        pc[:3, :] = pcd.T[:3, :]
        pcd = (r_flip @ pc)[:3].T

        gts = preproc_gt(rr, rp, ry, tx, ty, tz, rt, posej_T_posei)
        imgs = preproc_img_rellis(img, gts, self.raw_cam_img_size)
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
        calib = (calib_seq["P"] @ calib_seq["Tr"] @ np.linalg.inv(r_flip))[:3, :]
        gts["cam_T_velo"] = (
            np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
            @ gts["sensor2_T_sensor1"]
        )
        return pc[:3, :], img_in, calib, a, gts, fname
