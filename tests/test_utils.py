"""Viz panels, preflight checks, profiling helpers."""

import numpy as np
import pytest

from efgh_tpu.config import Config
from efgh_tpu.utils.preflight import check as preflight_check
from efgh_tpu.utils.profiling import StepTimer, device_memory_stats
from efgh_tpu.utils.viz import eval_image_draw, image_draw, minmax_color_img

RAW = (64, 128)


def _fake_batch_and_dicts(rng):
    n = 256
    pc = rng.randn(1, 3, n).astype(np.float32) * 10
    img = rng.randint(0, 255, (1, 3, RAW[0] // 2, RAW[1] // 2)).astype(np.float32)
    calib = np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0], [0, 0, 1, 0]]],
                     np.float32)
    a_mat = np.array([[[1, 0, -64.0], [0, 1, -32.0], [0, 0, 1]]], np.float32)
    eye4 = np.eye(4, dtype=np.float32)[None]
    eye3 = np.eye(3, dtype=np.float32)[None]
    width = 117
    common = {
        "e_l": eye4, "f_l": eye4, "g_l": eye4, "h_c": eye3,
        "f_score": rng.rand(1, width).astype(np.float32),
        "g_depth": rng.rand(1, 1, *RAW).astype(np.float32),
        "g_mask": rng.rand(1, 2, *RAW).astype(np.float32),
    }
    gt = dict(common)
    gt["g_mask"] = gt["g_depth"] > 0.5
    gt["img_rot"] = rng.randint(0, 255, (1, 3, RAW[0], RAW[1])).astype("uint8")
    gt["img_raw"] = gt["img_rot"]
    pred = dict(common)
    pred.update({
        "eh_cam_T_velo": calib, "efh_cam_T_velo": calib,
        "efgh_cam_T_velo": calib,
    })
    return pc, img, calib, a_mat, gt, pred


def test_image_draw_panels(rng):
    pc, img, calib, a_mat, gt, pred = _fake_batch_and_dicts(rng)
    panels = image_draw(pc, img, calib, a_mat, gt, pred, RAW, (0.125, -0.125))
    for k in ["cam", "score", "dimage", "mask", "range", "depth"]:
        assert k in panels, k
        assert panels[k].dtype == np.uint8
        assert panels[k].ndim == 3 and panels[k].shape[2] == 3
    # the range strip stacks 5 rows of half-height panels
    assert panels["range"].shape[0] == 5 * (RAW[0] // 2)


def test_eval_image_draw_panels(rng):
    pc, img, calib, a_mat, gt, pred = _fake_batch_and_dicts(rng)
    panels = eval_image_draw(pc, img, calib, a_mat, gt, pred, RAW,
                             (0.125, -0.125))
    for k in ["pred_depth_EH", "pred_depth_EFH", "pred_depth_EFGH"]:
        assert panels[k].shape == (RAW[0] // 2, RAW[1] // 2, 3)


def test_minmax_color_img(rng):
    img = np.zeros((32, 48))
    img[10, 20] = 5.0
    colored, mask = minmax_color_img(img, px=2, valid_mask=True)
    assert colored.shape == (32, 48, 3)
    assert mask[10, 20] and mask[12, 22] and not mask[0, 0]


def test_preflight_ok():
    cfg = Config.from_dict({"batch_size": 1, "mesh_data": 1})
    report = preflight_check(cfg)
    assert report.ok
    assert report.est_activation_bytes > 0


def test_preflight_bad_batch():
    cfg = Config.from_dict({"batch_size": 3, "mesh_data": 2})
    report = preflight_check(cfg)
    assert not report.ok
    with pytest.raises(RuntimeError):
        report.raise_on_error()


def test_preflight_train_backward_estimate():
    """The measured round-3 OOM (batch-2 900x1600 train WITHOUT remat needed
    16.87 GiB on a 15.75 GiB v5e) must be predicted by the train-mode
    estimate, and the remat config that actually ran must stay quiet."""
    v5e = int(15.75 * 2**30)
    base = {"batch_size": 2, "mesh_data": 1, "compute_dtype": "bfloat16",
            "raw_cam_img_size": [900, 1600],
            "lattice_capacity": [98304, 49152, 24576, 8192, 2048]}
    oom = preflight_check(Config.from_dict({**base, "remat": False}),
                          train=True, hbm_limit_bytes=v5e)
    assert any("OOM" in w for w in oom.warnings), oom.warnings
    ok = preflight_check(Config.from_dict({**base, "remat": True}),
                         train=True, hbm_limit_bytes=v5e)
    assert not any("HBM" in w or "OOM" in w for w in ok.warnings), ok.warnings
    # inference estimate unchanged by the flag
    inf = preflight_check(Config.from_dict({**base, "remat": False}),
                          hbm_limit_bytes=v5e)
    assert inf.est_activation_bytes < ok.est_activation_bytes \
        < oom.est_activation_bytes


def test_step_timer():
    t = StepTimer(window=2)
    t.tick()
    t.tick()
    assert t.steps_per_sec > 0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_shape_check_abstract():
    from efgh_tpu.utils.summary import shape_check

    cfg = Config.from_dict({
        "raw_cam_img_size": [64, 128], "num_points": 256,
        "lattice_capacity": [1024, 1024, 512, 256, 128],
        "compute_dtype": "float32",
    })
    shapes = shape_check(cfg)
    assert shapes["cam_T_velo"] == (1, 3, 4)
    assert shapes["sensor2_T_sensor1"] == (1, 4, 4)
    assert shapes["g_depth"] == (1, 1, 64, 128)
    assert shapes["f_score"][0] == 1


def test_pipeline_process_workers_match_thread_workers():
    """worker_mode='process' (reference-style worker processes) yields the
    same batches as thread mode (reference main.py:85-92 analog)."""
    from efgh_tpu.data import DataPipeline, SyntheticDataset

    ds = SyntheticDataset(num_samples=4, num_points=256,
                          raw_cam_img_size=(32, 64), seed=3)
    a = next(iter(DataPipeline(ds, batch_size=2, shuffle=False,
                               num_workers=2, seed=0,
                               worker_mode="thread")))
    b = next(iter(DataPipeline(ds, batch_size=2, shuffle=False,
                               num_workers=2, seed=0,
                               worker_mode="process")))
    import numpy as np

    for k in ("pc", "img", "calib", "A"):
        np.testing.assert_array_equal(a[k], b[k])
    for k in a["gts"]:
        np.testing.assert_array_equal(a["gts"][k], b["gts"][k])
    assert a["fnames"] == b["fnames"]


def test_render_registration_result(tmp_path):
    """Headless analog of the reference's open3d debug viewers (reference
    common/numpy_utils.py:579-606): both cloud colors land in the render,
    and the PNG round-trips."""
    from efgh_tpu.utils.viz import (
        _DBG_SRC_COLOR,
        _DBG_TGT_COLOR,
        render_registration_result,
    )

    r = np.random.default_rng(0)
    src = r.standard_normal((3, 500)) * 5.0
    tgt = src + np.array([8.0, 0.0, 0.0])[:, None]
    path = str(tmp_path / "reg.png")
    img = render_registration_result(src, tgt, size=256, path=path)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    flat = img.reshape(-1, 3)
    assert (flat == np.array(_DBG_SRC_COLOR)).all(axis=1).any()
    assert (flat == np.array(_DBG_TGT_COLOR)).all(axis=1).any()
    from PIL import Image
    assert Image.open(path).size == (256, 256)

    single = render_registration_result(src, size=128)
    assert (single.reshape(-1, 3) == np.array(_DBG_SRC_COLOR)).all(1).any()
    assert not (single.reshape(-1, 3) == np.array(_DBG_TGT_COLOR)).all(1).any()
