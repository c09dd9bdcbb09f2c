"""Data loaders exercised end-to-end over tiny synthetic fixture trees."""

import os

import numpy as np
import pytest
from PIL import Image

from efgh_tpu.config import Config
from efgh_tpu.data import DataPipeline, SyntheticDataset, build_dataset, collate

RAW = (64, 128)


def _cfg(**kw):
    d = {
        "raw_cam_img_size": list(RAW),
        "num_points": 512,
        "lidar_line": 64,
        "train_samples": -1,
        "val_samples": -1,
        "lattice_capacity": [1024, 1024, 512, 256, 128],
    }
    d.update(kw)
    return Config.from_dict(d)


def _write_img(path, h=80, w=160):
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def _write_bin(path, n=3000):
    rng = np.random.RandomState(1)
    pts = np.zeros((n, 4), np.float32)
    pts[:, :3] = rng.uniform(-40, 40, (n, 3))
    pts.tofile(path)


def _poses_lines(n=12):
    lines = []
    for i in range(n):
        p = np.eye(4)
        p[0, 3] = i * 0.5
        lines.append(" ".join(str(x) for x in p[:3].reshape(-1)) + "\n")
    return lines


@pytest.fixture
def rellis_tree(tmp_path):
    root = tmp_path / "rellis"
    for seq in range(5):
        s = f"{seq:05d}"
        cam = root / "Rellis-3D" / s / "pylon_camera_node"
        os1 = root / "Rellis-3D" / s / "os1_cloud_node_kitti_bin"
        cam.mkdir(parents=True)
        os1.mkdir(parents=True)
        for i in range(4):
            _write_img(cam / f"frame{i:06d}-000.jpg")
            _write_bin(os1 / f"{i:06d}.bin")
        with open(root / "Rellis-3D" / s / "poses.txt", "w") as f:
            f.writelines(_poses_lines(4))
        np.savetxt(root / "Rellis-3D" / s / "camera_info.txt",
                   [100.0, 100.0, 80.0, 32.0, 0, 0, 0])
        tdir = root / "Rellis_3D" / s
        tdir.mkdir(parents=True)
        with open(tdir / "transforms.yaml", "w") as f:
            f.write(
                "os1_cloud_node-pylon_camera_node:\n"
                "  q: {x: 0.0, y: 0.0, z: 0.0, w: 1.0}\n"
                "  t: {x: 0.1, y: 0.0, z: -0.2}\n"
            )
    with open(root / "pt_train.lst", "w") as f:
        for i in range(4):
            f.write(f"00000/os1_cloud_node_kitti_bin/{i:06d}.bin x\n")
    with open(root / "pt_val.lst", "w") as f:
        f.write("00001/os1_cloud_node_kitti_bin/000000.bin x\n")
    # fixed test perturbations
    with open(root / "rand_init.csv", "w") as f:
        f.write("00000_000000_000001,0.1,-0.1,0.2,0.5,-0.5,0.3,0.15\n")
        f.write("00002_000001_000002,0.0,0.1,-0.2,0.3,0.1,-0.4,-0.1\n")
    return root


def _check_sample(sample, n_points=512, raw=RAW):
    pc, img, calib, a, gts, fname = sample
    assert pc.shape == (3, n_points)
    assert img.shape == (3, raw[0] // 2, raw[1] // 2)
    assert calib.shape == (3, 4)
    assert a.shape == (3, 3)
    for k in ["rand_init_l", "rand_init_c", "sensor2_T_sensor1",
              "intrinsic_sensor2", "cam_T_velo", "img_mask"]:
        assert k in gts, k
    assert gts["cam_T_velo"].shape == (3, 4)
    assert gts["img_mask"].shape == (1, raw[0], raw[1])
    assert isinstance(fname, str)
    # cam_T_velo composition identity
    expect = (np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
              @ gts["sensor2_T_sensor1"])
    np.testing.assert_allclose(gts["cam_T_velo"], expect, rtol=1e-5, atol=1e-4)


def test_rellis_train(rellis_tree):
    cfg = _cfg(data_root=str(rellis_tree))
    ds = build_dataset("RELLIS_3D", "train", cfg)
    assert len(ds) == 4
    _check_sample(ds[0])


def test_rellis_test_mode_deterministic(rellis_tree):
    cfg = _cfg(data_root=str(rellis_tree), test="test",
               rand_init=str(rellis_tree / "rand_init.csv"))
    ds = build_dataset("RELLIS_3D", "test", cfg)
    assert len(ds) == 2
    s1 = ds[0]
    s2 = ds[0]
    _check_sample(s1)
    # fixed perturbation -> identical gt transforms across reads
    np.testing.assert_allclose(s1[4]["rand_init_l"], s2[4]["rand_init_l"])
    assert s1[5] == "00000_000000_000001"


@pytest.fixture
def kitti_odom_tree(tmp_path):
    root = tmp_path / "kitti"
    seqdir = root / "dataset" / "sequences" / "10"
    (seqdir / "velodyne").mkdir(parents=True)
    (seqdir / "image_2").mkdir(parents=True)
    (root / "dataset" / "poses").mkdir(parents=True)
    for i in range(4):
        _write_bin(seqdir / "velodyne" / f"{i:06d}.bin")
        _write_img(seqdir / "image_2" / f"{i:06d}.png")
    with open(seqdir / "calib.txt", "w") as f:
        p2 = "P2: 100 0 80 0 0 100 32 0 0 0 1 0\n"
        tr = "Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
        f.write("P0: 1 0 0 0 0 1 0 0 0 0 1 0\n" + p2 + tr)
    with open(root / "dataset" / "poses" / "10.txt", "w") as f:
        f.writelines(_poses_lines(4))
    return root


def test_kitti_odom_test_mode(kitti_odom_tree, tmp_path):
    csv_path = tmp_path / "ri.csv"
    with open(csv_path, "w") as f:
        f.write("10_000000_000001,0.1,-0.1,0.2,0.5,-0.5,0.3,0.15\n")
    cfg = _cfg(data_root=str(kitti_odom_tree), test="test",
               rand_init=str(csv_path))
    cfg.extra["sequences"] = {"train": [], "valid": [], "test": [10]}
    ds = build_dataset("KITTI_ODOM", "test", cfg)
    assert len(ds) == 1
    _check_sample(ds[0])


def test_synthetic_and_pipeline():
    ds = SyntheticDataset(num_samples=6, num_points=256, raw_cam_img_size=RAW)
    _check_sample(ds[0], n_points=256)
    pipe = DataPipeline(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(pipe)
    assert len(batches) == 3
    b = batches[0]
    assert b["pc"].shape == (2, 3, 256)
    assert b["img"].shape == (2, 3, RAW[0] // 2, RAW[1] // 2)
    assert b["gts"]["cam_T_velo"].shape == (2, 3, 4)
    assert len(b["fnames"]) == 2
    assert b["pc"].dtype == np.float32


def test_synthetic_points_project_into_image():
    """Sanity: a healthy fraction of synthetic points project into the image
    under the gt cam_T_velo."""
    ds = SyntheticDataset(num_samples=1, num_points=2048, raw_cam_img_size=RAW)
    pc, img, calib, a, gts, _ = ds[0]
    pts = np.concatenate([pc, np.ones((1, pc.shape[1]))], axis=0)
    xyw = gts["cam_T_velo"] @ pts
    w = xyw[2]
    x = xyw[0] / np.where(np.abs(w) > 1e-9, w, 1e-9)
    y = xyw[1] / np.where(np.abs(w) > 1e-9, w, 1e-9)
    frac = np.mean((w > 0) & (x > 0) & (x < RAW[1]) & (y > 0) & (y < RAW[0]))
    assert frac > 0.05, frac


def test_synthetic_disk_cache_roundtrip(tmp_path):
    """Disk-cached samples (sample_cache_dir) reload bit-identically, so the
    RSS-watchdog restart cycle trains on the same data it would regenerate."""
    kw = dict(num_samples=2, num_points=256, raw_cam_img_size=RAW, seed=3,
              cache=False, cache_dir=str(tmp_path))
    fresh = SyntheticDataset(**kw)[0]
    assert any(f.endswith(".npy") for f in os.listdir(tmp_path))
    loaded = SyntheticDataset(**kw)[0]
    for a, b in zip(fresh, loaded):
        if isinstance(a, dict):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]))
        elif isinstance(a, str):
            assert a == b
        else:
            np.testing.assert_array_equal(a, b)
            assert a.dtype == b.dtype
