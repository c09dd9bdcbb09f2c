"""Config system: reference YAML compatibility and round-trips."""

import os

import pytest

from efgh_tpu.config import Config

REF_CFG = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference absent")
def test_reference_train_yaml_parses():
    cfg = Config.from_yaml(os.path.join(REF_CFG, "train_rellis.yaml"))
    assert cfg.dataset == "RELLIS_3D"
    assert cfg.num_points == 65536
    assert cfg["lambda"]["g_trs"] == 1000.0
    assert cfg.scale_map[4] == [0.125, 1]
    assert cfg.dclb["l_trs_range"] == 2
    assert not cfg.is_test
    # unknown reference keys are preserved in extra
    assert cfg["DEVICE"] == "cuda"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference absent")
def test_reference_test_yaml_parses():
    cfg = Config.from_yaml(os.path.join(REF_CFG, "test_rellis.yaml"))
    assert cfg.is_test
    assert cfg.rand_init.endswith("rellis3d_rand_init_30_30.csv")


def test_our_configs_parse():
    for name in ("train_rellis.yaml", "test_rellis.yaml",
                 "train_synthetic.yaml"):
        cfg = Config.from_yaml(os.path.join("configs", name))
        assert len(cfg.lattice_capacity) == len(cfg.scale_map)


def test_every_shipped_config_parses():
    """Every YAML under configs/ must parse into a coherent Config —
    segment configs are staged faster than they are run, and a typo'd
    knob otherwise surfaces hours later, mid-device-window."""
    import glob

    paths = sorted(glob.glob(os.path.join("configs", "*.yaml")))
    assert len(paths) >= 18
    for path in paths:
        cfg = Config.from_yaml(path)
        assert len(cfg.lattice_capacity) == len(cfg.scale_map), path
        assert len(cfg.g_trs_axis_weights) == 3, path
        # test-mode configs must point at a weights source; train configs
        # at a checkpoint dir
        if cfg.is_test:
            assert cfg.get("ckpt_path"), path
        else:
            assert cfg.ckpt_dir, path


def test_roundtrip(tmp_path):
    cfg = Config.from_dict({"lr": 0.5, "custom_key": 7})
    path = tmp_path / "c.yaml"
    cfg.save_yaml(str(path))
    cfg2 = Config.from_yaml(str(path))
    assert cfg2.lr == 0.5
    assert cfg2["custom_key"] == 7
    assert cfg2.range_img_size == (450, 3200)
    assert cfg2.input_img_size == (450, 800)
