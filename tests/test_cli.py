"""CLI-composition integration test: drive ``efgh_tpu.main`` end-to-end
(train a few iterations, then test) on the tiny RELLIS fixture tree, and
assert the prediction-CSV row format byte-matches the reference writer's
(reference test.py:46-53: ``fname`` + 12 flattened 3x4 floats, every field
followed by a comma, including a trailing one).

The library paths are unit-tested elsewhere; this covers the composition
the user actually invokes: config parse -> dataset reflection -> model
build -> train loop (validate + checkpoint) -> test() restore -> CSV.
"""

import os

import numpy as np
import pytest
import yaml

from efgh_tpu.main import main as cli_main

from test_data import rellis_tree  # noqa: F401  (fixture)

RAW = (64, 128)


def _base_cfg(root, ckpt_dir):
    return {
        "dataset": "RELLIS_3D",
        "data_root": str(root),
        "ckpt_dir": str(ckpt_dir),
        "raw_cam_img_size": list(RAW),
        "num_points": 512,
        "lidar_line": 64,
        "train_samples": -1,
        "val_samples": -1,
        "lattice_capacity": [1024, 1024, 512, 256, 128],
        "batch_size": 1,
        "mesh_data": 1,
        "workers": 0,
        "epochs": 1,
        "iter_iterval": 2,
        "log_every": 1,
        "compute_dtype": "float32",
        "seed": 0,
    }


@pytest.mark.slow
def test_cli_train_then_test_pred_csv(rellis_tree, tmp_path, monkeypatch):  # noqa: F811
    ckpt_dir = tmp_path / "ckpt"
    train_yaml = tmp_path / "train.yaml"
    with open(train_yaml, "w") as f:
        yaml.safe_dump(_base_cfg(rellis_tree, ckpt_dir), f)

    # run the CSV writer relative to tmp_path (test() writes ./test/preds/...)
    monkeypatch.chdir(tmp_path)
    cli_main([str(train_yaml), "--fresh"])

    # train() must have validated + checkpointed at iter_iterval and written
    # the config snapshot (reference main.py:74, helper.py:40-61)
    assert (ckpt_dir / "config.yaml").exists()
    assert (ckpt_dir / "checkpoint").exists()

    test_cfg = _base_cfg(rellis_tree, ckpt_dir)
    test_cfg.update({
        "test": "test",
        "ckpt_path": str(ckpt_dir / "checkpoint"),
        "rand_init": str(rellis_tree / "rand_init.csv"),
    })
    test_yaml = tmp_path / "test.yaml"
    with open(test_yaml, "w") as f:
        yaml.safe_dump(test_cfg, f)

    cli_main([str(test_yaml)])

    pred_path = tmp_path / "test" / "preds" / "ckpt" / "pred.csv"
    assert pred_path.exists(), list((tmp_path / "test").rglob("*"))
    lines = pred_path.read_text().splitlines()
    # one row per rand-init CSV case, in CSV order
    assert [ln.split(",")[0] for ln in lines] == [
        "00000_000000_000001", "00002_000001_000002"]
    for ln in lines:
        # reference row format: every value comma-terminated -> trailing
        # empty field after the final comma (reference test.py:46-53)
        assert ln.endswith(",")
        fields = ln.split(",")
        assert len(fields) == 14  # fname + 12 floats + trailing empty
        assert fields[-1] == ""
        vals = np.array([float(x) for x in fields[1:13]])
        assert vals.shape == (12,)
        assert np.all(np.isfinite(vals))
        # the 3x4 is a rigid transform estimate: rotation block near-orthonormal
        R = vals.reshape(3, 4)[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
