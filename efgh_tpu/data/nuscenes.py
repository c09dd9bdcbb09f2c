"""nuScenes dataset loader (reference data_loader/nusc_loader.py +
nusc_utils.py).

Scene -> LiDAR-token list with frame_skip=20; pairs each LiDAR sweep with a
nearby CAM_FRONT frame within 10 m through the ego poses; ego-car points
removed; optional sweep accumulation via prev/next links.
T_cam_velo = K @ camera_calib^-1.

The nuscenes-devkit is imported lazily: constructing the dataset without it
raises a clear error, and everything else in the framework works without it.
"""

from __future__ import annotations

import csv
import os
import random
from typing import Dict, List

import numpy as np

from efgh_tpu.data.loader_utils import (
    preproc_gt,
    preproc_img,
    preproc_pcd,
    rand_init_params,
    rgb_read,
)


def _require_nuscenes():
    try:
        from nuscenes.nuscenes import NuScenes  # noqa: F401
        from nuscenes.utils.data_classes import LidarPointCloud  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the NUSC dataset requires the nuscenes-devkit package"
        ) from e


def _quat_to_rot(q) -> np.ndarray:
    """nuScenes stores quaternions as (w, x, y, z)."""
    from scipy.spatial.transform import Rotation

    w, x, y, z = q
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def _p_from_rt(r: np.ndarray, t: np.ndarray) -> np.ndarray:
    p = np.identity(4)
    p[:3, :3] = r
    p[:3, 3] = t
    return p


def get_sample_data_ego_pose_P(nusc, sample_data) -> np.ndarray:
    pose = nusc.get("ego_pose", sample_data["ego_pose_token"])
    return _p_from_rt(
        _quat_to_rot(pose["rotation"]).astype(np.float32),
        np.asarray(pose["translation"], np.float32),
    )


def get_calibration_P(nusc, sample_data) -> np.ndarray:
    calib = nusc.get("calibrated_sensor", sample_data["calibrated_sensor_token"])
    return _p_from_rt(
        _quat_to_rot(calib["rotation"]).astype(np.float32),
        np.asarray(calib["translation"], np.float32),
    )


def get_camera_K(nusc, camera) -> np.ndarray:
    calib = nusc.get("calibrated_sensor", camera["calibrated_sensor_token"])
    return np.asarray(calib["camera_intrinsic"], np.float32)


def transform_pc_np(p: np.ndarray, pc_np: np.ndarray) -> np.ndarray:
    homo = np.concatenate(
        [pc_np, np.ones((1, pc_np.shape[1]), pc_np.dtype)], axis=0
    )
    return (p @ homo)[:3]


def get_scene_lidar_token(nusc, scene_token, frame_skip=2) -> List[str]:
    scene = nusc.get("scene", scene_token)
    first = nusc.get("sample", scene["first_sample_token"])
    lidar = nusc.get("sample_data", first["data"]["LIDAR_TOP"])
    tokens = [lidar["token"]]
    counter = 1
    while lidar["next"] != "":
        lidar = nusc.get("sample_data", lidar["next"])
        counter += 1
        if counter % frame_skip == 0:
            tokens.append(lidar["token"])
    return tokens


def get_lidar_token_list(nusc, frame_skip, mode) -> List[str]:
    scenes = [s["token"] for s in nusc.scene]
    scenes = scenes[:700] if mode == "train" else scenes[700:]
    tokens: List[str] = []
    for t in scenes:
        tokens += get_scene_lidar_token(nusc, t, frame_skip=frame_skip)
    return tokens


def search_nearby_cameras(nusc, init_camera, max_translation, direction,
                          lidar_p_inv, out):
    if init_camera[direction] == "":
        return out
    camera = nusc.get("sample_data", init_camera[direction])
    while True:
        token = camera[direction]
        if token == "":
            break
        camera = nusc.get("sample_data", token)
        p_lc = lidar_p_inv @ get_sample_data_ego_pose_P(nusc, camera)
        if np.linalg.norm(p_lc[:3, 3]) < max_translation:
            out.append(token)
        else:
            break
    return out


def get_nearby_camera_token_list(nusc, lidar_token, max_translation,
                                 camera_name) -> List[str]:
    lidar = nusc.get("sample_data", lidar_token)
    lidar_p_inv = np.linalg.inv(get_sample_data_ego_pose_P(nusc, lidar))
    sample = nusc.get("sample", lidar["sample_token"])
    init_token = sample["data"][camera_name]
    init_camera = nusc.get("sample_data", init_token)
    out = [init_token]
    out = search_nearby_cameras(nusc, init_camera, max_translation, "next",
                                lidar_p_inv, out)
    out = search_nearby_cameras(nusc, init_camera, max_translation, "prev",
                                lidar_p_inv, out)
    return out


def make_nuscenes_dataset(nusc, frame_skip, max_translation, mode):
    dataset = []
    for lidar_token in get_lidar_token_list(nusc, frame_skip, mode):
        nearby = get_nearby_camera_token_list(nusc, lidar_token,
                                              max_translation, "CAM_FRONT")
        dataset.append((lidar_token, random.choice(nearby)))
    return dataset


class NUSC:
    def __init__(self, mode: str, args):
        _require_nuscenes()
        from nuscenes.nuscenes import NuScenes

        self.mode = mode
        self.process = ProcessNUSC(args)
        self.data_path = args["data_root"]
        self.accumulation_frame_num = args["accumulation_frame_num"]
        self.accumulation_frame_skip = args["accumulation_frame_skip"]

        if mode in ("train", "valid"):
            self.nusc = NuScenes(version="v1.0-trainval",
                                 dataroot=self.data_path, verbose=False)
            self.num_samples = (
                args["train_samples"] if mode == "train" else args["val_samples"]
            )
            self.samples = self.make_sample_dataset()
        elif mode == "test":
            self.nusc = NuScenes(version="v1.0-test",
                                 dataroot=self.data_path, verbose=False)
            self.num_samples = -1
            self.rand_init_params: Dict[str, List[float]] = {}
            with open(args["rand_init"]) as f:
                for line in csv.reader(f):
                    self.rand_init_params[line[0]] = [float(x) for x in line[1:]]
            self.samples = [
                (k.split("_")[0], k.split("_")[1])
                for k in self.rand_init_params.keys()
            ]
        else:
            raise ValueError(f"wrong mode: {mode}")
        if not self.samples:
            raise RuntimeError(f"Found 0 files under {self.data_path}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        lidar_token, camera_token = self.samples[index]
        pcd, img, calibs = self.file_reader(lidar_token, camera_token)
        key = lidar_token + "_" + camera_token
        rand_init = self.rand_init_params[key] if self.mode == "test" else None
        return self.process(pcd, img, calibs, key, rand_init=rand_init)

    def make_sample_dataset(self):
        samples = make_nuscenes_dataset(self.nusc, frame_skip=20,
                                        max_translation=10, mode=self.mode)
        random.shuffle(samples)
        if self.num_samples > 0:
            samples = samples[: self.num_samples]
        return samples

    def get_lidar_pc_by_token(self, lidar_token):
        from nuscenes.utils.data_classes import LidarPointCloud

        lidar = self.nusc.get("sample_data", lidar_token)
        pc = LidarPointCloud.from_file(
            os.path.join(self.nusc.dataroot, lidar["filename"])
        )
        pc_np = pc.points[:3, :]
        # remove ego-car points (reference nusc_loader.py:88-93)
        inside = (
            (pc_np[0] < 0.8) & (pc_np[0] > -0.8)
            & (pc_np[1] < 2.7) & (pc_np[1] > -2.7)
        )
        pc_np = pc_np[:, ~inside]
        return pc_np, get_sample_data_ego_pose_P(self.nusc, lidar)

    def _accumulate_direction(self, lidar, p_io, p_lidar_vehicle,
                              p_vehicle_lidar, direction, pc_list):
        counter = 1
        accumulated = 0
        while accumulated < self.accumulation_frame_num:
            if lidar[direction] == "":
                break
            if counter % self.accumulation_frame_skip != 0:
                counter += 1
                lidar = self.nusc.get("sample_data", lidar[direction])
                continue
            pc_j, p_oj = self.get_lidar_pc_by_token(lidar[direction])
            p_ij = p_io @ p_oj
            p_trans = p_lidar_vehicle @ p_ij @ p_vehicle_lidar
            pc_list.append(transform_pc_np(p_trans, pc_j))
            counter += 1
            lidar = self.nusc.get("sample_data", lidar[direction])
            accumulated += 1
        return pc_list

    def accumulate_lidar_points(self, lidar):
        pc_i, p_oi = self.get_lidar_pc_by_token(lidar["token"])
        pc_list = [pc_i]
        if self.accumulation_frame_num > 0:
            p_io = np.linalg.inv(p_oi)
            p_vehicle_lidar = get_calibration_P(self.nusc, lidar)
            p_lidar_vehicle = np.linalg.inv(p_vehicle_lidar)
            pc_list = self._accumulate_direction(
                lidar, p_io, p_lidar_vehicle, p_vehicle_lidar, "next", pc_list)
            pc_list = self._accumulate_direction(
                lidar, p_io, p_lidar_vehicle, p_vehicle_lidar, "prev", pc_list)
        return np.concatenate(pc_list, axis=1)

    def file_reader(self, lidar_token, camera_token):
        pointsensor = self.nusc.get("sample_data", lidar_token)
        pcd = self.accumulate_lidar_points(pointsensor)[:3].T

        lidar_calib_p = get_calibration_P(self.nusc, pointsensor)
        lidar_pose_p = get_sample_data_ego_pose_P(self.nusc, pointsensor)

        cam = self.nusc.get("sample_data", camera_token)
        img = rgb_read(os.path.join(self.data_path, cam["filename"]))
        k = get_camera_K(self.nusc, cam)
        camera_calib_p_inv = np.linalg.inv(get_calibration_P(self.nusc, cam))
        camera_pose_p_inv = np.linalg.inv(
            get_sample_data_ego_pose_P(self.nusc, cam)
        )
        calibs = {
            "T_cam_velo": k @ camera_calib_p_inv[:3, :],
            "posej_T_posei": camera_pose_p_inv @ lidar_pose_p @ lidar_calib_p,
        }
        return pcd, img, calibs


class ProcessNUSC:
    def __init__(self, args):
        self.raw_cam_img_size = tuple(args["raw_cam_img_size"])
        self.num_points = args["num_points"]
        if not args["test"]:
            self.l_rot_range = args["dclb"]["l_rot_range"]
            self.l_trs_range = args["dclb"]["l_trs_range"]
            self.c_rot_range = args["dclb"]["c_rot_range"]
        else:
            self.l_rot_range = self.l_trs_range = self.c_rot_range = None

    def __call__(self, pcd, img, calibs, tokeni_tokenj, rand_init=None):
        rr, rp, ry, tx, ty, tz, rt = rand_init_params(
            rand_init, self.l_rot_range, self.l_trs_range, self.c_rot_range
        )
        gts = preproc_gt(rr, rp, ry, tx, ty, tz, rt, calibs["posej_T_posei"])
        imgs = preproc_img(img, gts, self.raw_cam_img_size)
        pc = preproc_pcd(pcd, gts, self.num_points)  # no beam decimation

        img_in = imgs["in"]
        gts["img_raw"] = imgs["raw"]
        gts["img_rot"] = imgs["rot"]
        gts["img_mask"] = imgs["img_mask"]

        a = np.array([
            [1, 0, -self.raw_cam_img_size[1] / 2],
            [0, 1, -self.raw_cam_img_size[0] / 2],
            [0, 0, 1],
        ])
        calib = calibs["T_cam_velo"]
        gts["cam_T_velo"] = (
            np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
            @ gts["sensor2_T_sensor1"]
        )
        return pc[:3, :], img_in, calib, a, gts, tokeni_tokenj
