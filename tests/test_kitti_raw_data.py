"""KITTI-raw loader over a tiny synthetic fixture tree."""

import numpy as np
import pytest
from PIL import Image

from efgh_tpu.config import Config
from efgh_tpu.data import build_dataset
from tests.test_data import RAW, _cfg, _write_bin, _write_img


@pytest.fixture
def kitti_raw_tree(tmp_path):
    root = tmp_path / "kraw"
    date = "2011_09_30"
    drive = f"{date}_drive_0028_sync"
    vdir = root / date / drive / "velodyne_points" / "data"
    idir = root / date / drive / "image_02" / "data"
    vdir.mkdir(parents=True)
    idir.mkdir(parents=True)
    for i in range(3):
        _write_bin(vdir / f"{i:010d}.bin")
        _write_img(idir / f"{i:010d}.png")
    with open(root / date / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0.1 -0.05 -0.3\n")
    with open(root / date / "calib_imu_to_velo.txt", "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    with open(root / date / "calib_cam_to_cam.txt", "w") as f:
        for cam in range(4):
            f.write(f"P_rect_{cam:02d}: 100 0 80 0 0 100 32 0 0 0 1 0\n")
            f.write(f"R_rect_{cam:02d}: 1 0 0 0 1 0 0 0 1\n")
    return root


def test_kitti_raw_test_mode(kitti_raw_tree, tmp_path):
    csv_path = tmp_path / "ri.csv"
    with open(csv_path, "w") as f:
        for i in range(3):
            f.write(f"{i:010d},0.1,-0.1,0.2,0.5,-0.5,0.3,0.15\n")
    cfg = _cfg(data_root=str(kitti_raw_tree), test="test",
               rand_init=str(csv_path))
    ds = build_dataset("KITTI_RAW", "test", cfg)
    assert len(ds) == 3
    pc, img, calib, a, gts, fname = ds[0]
    assert pc.shape == (3, cfg.num_points)
    assert calib.shape == (3, 4)
    assert gts["cam_T_velo"].shape == (3, 4)
    # test mode sorts by frame id
    assert fname.endswith("0000000000")
    # same-frame benchmark: no pose pair folded in
    expect = (np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
              @ gts["sensor2_T_sensor1"])
    np.testing.assert_allclose(gts["cam_T_velo"], expect, rtol=1e-5, atol=1e-4)
