"""nuScenes loader logic over a fake in-memory devkit.

The nuscenes-devkit isn't installed here; a stub NuScenes with a tiny
in-memory record graph exercises the scene walk, nearby-camera search,
ego-point removal, sweep accumulation, and the calib chain.

Real-devkit attempt (round 4, per round-3 VERDICT #8): `import nuscenes`
fails and `pip download nuscenes-devkit` finds no distribution — this
environment has no package index access (zero egress), so a real-devkit
run remains blocked on data/package access.  The moment a devkit +
v1.0-mini split is reachable, run one real `__getitem__` through the
contract assertions below.
"""

import sys
import types

import numpy as np
import pytest
from PIL import Image


class FakeNusc:
    """Minimal stand-in for nuscenes.nuscenes.NuScenes."""

    def __init__(self, root, n_lidar=45, n_cam=45):
        self.dataroot = root
        self.version = "fake"
        self._t = {"sample_data": {}, "ego_pose": {}, "calibrated_sensor": {},
                   "sample": {}, "scene": {}}
        rng = np.random.RandomState(0)

        self._t["calibrated_sensor"]["cs_lidar"] = {
            "rotation": [1.0, 0, 0, 0], "translation": [0.0, 0.0, 1.8],
        }
        self._t["calibrated_sensor"]["cs_cam"] = {
            "rotation": [0.5, -0.5, 0.5, -0.5],
            "translation": [1.5, 0.0, 1.5],
            "camera_intrinsic": [[400.0, 0, 80], [0, 400.0, 32], [0, 0, 1]],
        }
        # ego trajectory: straight line, one pose per tick
        for i in range(max(n_lidar, n_cam)):
            self._t["ego_pose"][f"pose{i}"] = {
                "rotation": [1.0, 0, 0, 0],
                "translation": [i * 0.5, 0.0, 0.0],
            }
        for i in range(n_lidar):
            self._t["sample_data"][f"lid{i}"] = {
                "token": f"lid{i}",
                "filename": f"sweeps/LIDAR_TOP/{i}.pcd.bin",
                "ego_pose_token": f"pose{i}",
                "calibrated_sensor_token": "cs_lidar",
                "sample_token": f"samp{i}",
                "prev": f"lid{i-1}" if i > 0 else "",
                "next": f"lid{i+1}" if i < n_lidar - 1 else "",
            }
        for i in range(n_cam):
            self._t["sample_data"][f"cam{i}"] = {
                "token": f"cam{i}",
                "filename": f"samples/CAM_FRONT/{i}.jpg",
                "ego_pose_token": f"pose{i}",
                "calibrated_sensor_token": "cs_cam",
                "sample_token": f"samp{i}",
                "prev": f"cam{i-1}" if i > 0 else "",
                "next": f"cam{i+1}" if i < n_cam - 1 else "",
            }
        for i in range(n_lidar):
            self._t["sample"][f"samp{i}"] = {
                "token": f"samp{i}",
                "data": {"LIDAR_TOP": f"lid{i}", "CAM_FRONT": f"cam{i}"},
            }
        self.scene = [{"token": "scene0", "first_sample_token": "samp0"}]
        self._t["scene"]["scene0"] = self.scene[0]

    def get(self, table, token):
        return self._t[table][token]


@pytest.fixture
def fake_nusc_env(tmp_path, monkeypatch):
    root = tmp_path / "nusc"
    (root / "sweeps" / "LIDAR_TOP").mkdir(parents=True)
    (root / "samples" / "CAM_FRONT").mkdir(parents=True)
    rng = np.random.RandomState(1)
    for i in range(45):
        pts = np.zeros((5, 500), np.float32)
        pts[:3] = rng.uniform(-30, 30, (3, 500))
        pts[:3, :20] = rng.uniform(-0.5, 0.5, (3, 20))  # ego-car points
        pts.T.astype(np.float32).tofile(root / "sweeps" / "LIDAR_TOP"
                                        / f"{i}.pcd.bin")
        Image.fromarray(rng.randint(0, 255, (64, 160, 3), np.uint8)).save(
            root / "samples" / "CAM_FRONT" / f"{i}.jpg")

    # stub devkit modules
    nusc_pkg = types.ModuleType("nuscenes")
    nusc_mod = types.ModuleType("nuscenes.nuscenes")
    data_cls = types.ModuleType("nuscenes.utils.data_classes")
    utils_pkg = types.ModuleType("nuscenes.utils")

    fake = FakeNusc(str(root))

    class NuScenes:  # noqa: N801
        def __init__(self, version, dataroot, verbose=False):
            self.__dict__.update(fake.__dict__)

        def get(self, table, token):
            return fake.get(table, token)

    class LidarPointCloud:
        def __init__(self, points):
            self.points = points

        @classmethod
        def from_file(cls, path):
            return cls(np.fromfile(path, np.float32).reshape(-1, 5).T)

    nusc_mod.NuScenes = NuScenes
    data_cls.LidarPointCloud = LidarPointCloud
    nusc_pkg.nuscenes = nusc_mod
    utils_pkg.data_classes = data_cls
    nusc_pkg.utils = utils_pkg
    for name, mod in [("nuscenes", nusc_pkg), ("nuscenes.nuscenes", nusc_mod),
                      ("nuscenes.utils", utils_pkg),
                      ("nuscenes.utils.data_classes", data_cls)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return root


def test_nusc_train_mode(fake_nusc_env):
    from efgh_tpu.config import Config
    from efgh_tpu.data.nuscenes import NUSC

    cfg = Config.from_dict({
        "data_root": str(fake_nusc_env),
        "raw_cam_img_size": [64, 128],
        "num_points": 512,
        "train_samples": -1,
        "accumulation_frame_num": 1,
        "accumulation_frame_skip": 1,
    })
    ds = NUSC("train", cfg)
    assert len(ds) >= 1
    pc, img, calib, a, gts, key = ds[0]
    assert pc.shape == (3, 512)
    assert img.shape == (3, 32, 64)
    assert calib.shape == (3, 4)
    assert gts["cam_T_velo"].shape == (3, 4)
    # composition identity
    expect = (np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
              @ gts["sensor2_T_sensor1"])
    np.testing.assert_allclose(gts["cam_T_velo"], expect, rtol=1e-4, atol=1e-3)


def test_nusc_ego_points_removed(fake_nusc_env):
    from efgh_tpu.config import Config
    from efgh_tpu.data.nuscenes import NUSC

    cfg = Config.from_dict({
        "data_root": str(fake_nusc_env),
        "raw_cam_img_size": [64, 128],
        "num_points": 512,
        "train_samples": -1,
        "accumulation_frame_num": 0,
    })
    ds = NUSC("train", cfg)
    lidar = ds.nusc.get("sample_data", "lid0")
    pc, _ = ds.get_lidar_pc_by_token("lid0")
    # ego-box points (|x|<0.8, |y|<2.7) were injected and must be gone
    inside = (np.abs(pc[0]) < 0.8) & (np.abs(pc[1]) < 2.7)
    assert inside.sum() == 0
    assert pc.shape[1] < 500  # some removed


def test_nusc_accumulation(fake_nusc_env):
    from efgh_tpu.config import Config
    from efgh_tpu.data.nuscenes import NUSC

    cfg = Config.from_dict({
        "data_root": str(fake_nusc_env),
        "raw_cam_img_size": [64, 128],
        "num_points": 512,
        "train_samples": -1,
        "accumulation_frame_num": 2,
        "accumulation_frame_skip": 1,
    })
    ds = NUSC("train", cfg)
    lidar = ds.nusc.get("sample_data", "lid10")
    acc = ds.accumulate_lidar_points(lidar)
    single, _ = ds.get_lidar_pc_by_token("lid10")
    assert acc.shape[1] > single.shape[1] * 2  # self + 2 next + 2 prev


def test_nusc_test_mode_csv_protocol(fake_nusc_env, tmp_path):
    """Test mode keyed off a rand-init CSV: deterministic decalibration per
    (lidar, camera) token pair, emitted through the full ProcessNUSC chain
    (reference nusc_loader.py:52-66 + preproc chain)."""
    from efgh_tpu.config import Config
    from efgh_tpu.data.nuscenes import NUSC

    csv_path = tmp_path / "nusc_ri.csv"
    with open(csv_path, "w") as f:
        f.write("lid3_cam4,0.1,-0.1,0.2,0.5,-0.5,0.3,0.15\n")
        f.write("lid8_cam8,0.0,0.1,-0.2,0.3,0.1,-0.4,-0.1\n")

    cfg = Config.from_dict({
        "test": "test",
        "data_root": str(fake_nusc_env),
        "rand_init": str(csv_path),
        "raw_cam_img_size": [64, 128],
        "num_points": 512,
        "accumulation_frame_num": 1,
        "accumulation_frame_skip": 1,
    })
    ds = NUSC("test", cfg)
    assert len(ds) == 2
    pc, img, calib, a, gts, key = ds[0]
    assert key == "lid3_cam4"
    assert pc.shape == (3, 512)
    assert img.shape == (3, 32, 64)
    # deterministic across reads (frozen perturbation)
    pc2, _, _, _, gts2, _ = ds[0]
    np.testing.assert_allclose(gts["rand_init_l"], gts2["rand_init_l"])
    np.testing.assert_allclose(gts["sensor2_T_sensor1"],
                               gts2["sensor2_T_sensor1"])
    # composition identity through the nuScenes calib chain
    expect = (np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
              @ gts["sensor2_T_sensor1"])
    np.testing.assert_allclose(gts["cam_T_velo"], expect, rtol=1e-4, atol=1e-3)


def test_nusc_through_data_pipeline(fake_nusc_env):
    """NUSC satisfies the shared sample contract: DataPipeline collates it
    into the fixed-shape batch the train loop consumes (sweep accumulation +
    ego removal active), like the reference's DataLoader over NUSC
    (reference main.py:85-92)."""
    from efgh_tpu.config import Config
    from efgh_tpu.data import DataPipeline
    from efgh_tpu.data.nuscenes import NUSC

    cfg = Config.from_dict({
        "data_root": str(fake_nusc_env),
        "raw_cam_img_size": [64, 128],
        "num_points": 512,
        "train_samples": -1,
        "accumulation_frame_num": 2,
        "accumulation_frame_skip": 1,
    })
    ds = NUSC("train", cfg)
    pipe = DataPipeline(ds, batch_size=2, shuffle=False, num_workers=0,
                        drop_last=True, seed=0)
    batch = next(iter(pipe))
    assert batch["pc"].shape == (2, 3, 512)
    assert batch["img"].shape == (2, 3, 32, 64)
    assert batch["calib"].shape == (2, 3, 4)
    assert batch["A"].shape == (2, 3, 3)
    assert batch["gts"]["sensor2_T_sensor1"].shape == (2, 4, 4)
    assert len(batch["fnames"]) == 2
