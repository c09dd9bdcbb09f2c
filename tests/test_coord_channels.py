"""CoordConv fusion channels (`g_coord_channels`, PARITY.md #15).

Off (default) = reference semantics (reference nets/gnet.py:142-166:
image features fused with the 4-channel projected cloud only).  On, G's
fusion input grows normalized (u, v) pixel-coordinate channels; a
pre-knob 4-channel snapshot must load by zero-padding conv_d1's kernel
and compute EXACTLY the knob-off function until trained.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from efgh_tpu.config import Config
from efgh_tpu.models.gnet import Gnet
from efgh_tpu.train.loop import load_pretrained
from efgh_tpu.train.state import TrainState

RAW = (32, 64)


def _inputs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    # cloud in front of a forward-looking camera (velo x fwd -> cam z)
    pc = jax.random.uniform(k1, (1, 3, 256), minval=-4.0, maxval=4.0)
    pc = pc + jnp.array([12.0, 0.0, 0.0])[None, :, None]
    # the driver feeds G a half-resolution image (f_depth is at raw res)
    img = jax.random.uniform(k2, (1, 3, RAW[0] // 2, RAW[1] // 2),
                             maxval=255.0)
    K = jnp.array([[40.0, 0, RAW[1] / 2], [0, 40.0, RAW[0] / 2], [0, 0, 1]])
    R = jnp.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]])
    cam_T_velo = (K @ jnp.concatenate([R, jnp.zeros((3, 1))], axis=1))
    ret = {
        "efh_cam_T_velo": cam_T_velo[None],
        "sensor2_T_sensor1": jnp.eye(4)[None],
    }
    return pc, img, ret


def _zero_coord_slice(params):
    p = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    k = np.array(p["conv_d1"]["Conv_0"]["Conv_0"]["kernel"])
    k[:, :, 4:, :] = 0.0
    p["conv_d1"]["Conv_0"]["Conv_0"]["kernel"] = k
    return p


def _slice_to_reference(params):
    p = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    p["conv_d1"]["Conv_0"]["Conv_0"]["kernel"] = np.array(
        p["conv_d1"]["Conv_0"]["Conv_0"]["kernel"])[:, :, :4, :]
    return p


def test_zero_padded_coord_model_matches_reference_model():
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, coord_channels=True)
    g_off = Gnet(raw_cam_img_size=RAW, coord_channels=False)
    variables = g_on.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    params_on = _zero_coord_slice(variables["params"])
    params_off = _slice_to_reference(params_on)
    bs = variables["batch_stats"]

    out_on = g_on.apply({"params": params_on, "batch_stats": bs},
                        pc, img, ret, train=False)
    out_off = g_off.apply({"params": params_off, "batch_stats": bs},
                          pc, img, ret, train=False)
    np.testing.assert_array_equal(np.asarray(out_on["g_trs"]),
                                  np.asarray(out_off["g_trs"]))
    np.testing.assert_array_equal(np.asarray(out_on["g_depth"]),
                                  np.asarray(out_off["g_depth"]))


def test_coord_channels_are_wired():
    """Nonzero coord-slice weights must change the output (the channels
    actually reach the trunk)."""
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, coord_channels=True)
    variables = g_on.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    params0 = _zero_coord_slice(variables["params"])
    params1 = jax.tree_util.tree_map(np.copy, params0)
    k = params1["conv_d1"]["Conv_0"]["Conv_0"]["kernel"]
    k[:, :, 4:, :] = 0.5
    bs = variables["batch_stats"]
    # train-mode BN: the N(0,1e-3)-init trunk attenuates eval-mode
    # activations to ~1e-8 where the head output is bias-dominated; batch
    # statistics renormalize per layer so the coord signal survives
    out0, _ = g_on.apply({"params": params0, "batch_stats": bs},
                         pc, img, ret, train=True, mutable=["batch_stats"])
    out1, _ = g_on.apply({"params": params1, "batch_stats": bs},
                         pc, img, ret, train=True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out0["g_trs"]),
                           np.asarray(out1["g_trs"]))


def test_npz_migration_zero_pads_conv_d1(tmp_path):
    """A 4-channel (knob-off) snapshot loads into a knob-on state with the
    conv_d1 kernel zero-padded along the input-channel axis."""
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, coord_channels=True)
    g_off = Gnet(raw_cam_img_size=RAW, coord_channels=False)
    v_off = g_off.init(jax.random.PRNGKey(1), pc, img, ret, train=False)

    # flat snapshot in the scripts/export_weights.py layout
    from flax.traverse_util import flatten_dict
    flat = {}
    for head, tree in (("params", v_off["params"]),
                       ("batch_stats", v_off["batch_stats"])):
        for path, leaf in flatten_dict(jax.device_get(tree)).items():
            flat[f"{head}/{'/'.join(path)}"] = np.asarray(leaf)
    npz = tmp_path / "snap.npz"
    np.savez(str(npz), **flat)

    v_on = g_on.init(jax.random.PRNGKey(2), pc, img, ret, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=v_on["params"],
                       batch_stats=v_on["batch_stats"], opt_state=())
    cfg = Config.from_dict({"g_coord_channels": True})
    loaded = load_pretrained(str(npz), state, cfg)

    k = np.asarray(loaded.params["conv_d1"]["Conv_0"]["Conv_0"]["kernel"])
    assert k.shape[2] == 6
    np.testing.assert_array_equal(k[:, :, 4:, :], 0.0)
    np.testing.assert_array_equal(
        k[:, :, :4, :], np.asarray(v_off["params"]["conv_d1"]["Conv_0"]["Conv_0"]["kernel"]))

    # and the migrated model computes the snapshot's function exactly
    out_on = g_on.apply({"params": loaded.params,
                         "batch_stats": loaded.batch_stats},
                        pc, img, ret, train=False)
    out_off = g_off.apply(v_off, pc, img, ret, train=False)
    np.testing.assert_array_equal(np.asarray(out_on["g_trs"]),
                                  np.asarray(out_off["g_trs"]))


def test_backbone_wires_the_config_knob():
    from efgh_tpu.models import build_model

    cfg_on = Config.from_dict({"g_coord_channels": True})
    cfg_off = Config.from_dict({})
    assert build_model(cfg_on).g_coord_channels is True
    assert build_model(cfg_off).g_coord_channels is False
    cfg_prod = Config.from_dict({"g_coord_channels": "uvprod"})
    assert build_model(cfg_prod).g_coord_channels == "uvprod"


def test_uvprod_zero_padded_matches_uv_model():
    """An "uv" (6-channel) model's function must be exactly reproduced by a
    "uvprod" (8-channel) model whose product-slice weights are zero — the
    s5 -> s6 migration path."""
    pc, img, ret = _inputs()
    g_prod = Gnet(raw_cam_img_size=RAW, coord_channels="uvprod")
    g_uv = Gnet(raw_cam_img_size=RAW, coord_channels="uv")
    variables = g_prod.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    p = jax.tree_util.tree_map(np.asarray, jax.device_get(variables["params"]))
    k = np.array(p["conv_d1"]["Conv_0"]["Conv_0"]["kernel"])
    assert k.shape[2] == 8
    k[:, :, 6:, :] = 0.0
    p["conv_d1"]["Conv_0"]["Conv_0"]["kernel"] = k
    p_uv = jax.tree_util.tree_map(np.copy, p)
    p_uv["conv_d1"]["Conv_0"]["Conv_0"]["kernel"] = k[:, :, :6, :]
    bs = variables["batch_stats"]

    out_prod = g_prod.apply({"params": p, "batch_stats": bs},
                            pc, img, ret, train=False)
    out_uv = g_uv.apply({"params": p_uv, "batch_stats": bs},
                        pc, img, ret, train=False)
    np.testing.assert_array_equal(np.asarray(out_prod["g_trs"]),
                                  np.asarray(out_uv["g_trs"]))


def test_uvprod_channels_are_wired_and_depth_gated():
    """Nonzero product-slice weights must change the output, and the product
    channels must be exactly u*w / v*w (zero wherever w is zero)."""
    pc, img, ret = _inputs()
    g_prod = Gnet(raw_cam_img_size=RAW, coord_channels="uvprod")
    variables = g_prod.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    p0 = jax.tree_util.tree_map(np.asarray,
                                jax.device_get(variables["params"]))
    k = np.array(p0["conv_d1"]["Conv_0"]["Conv_0"]["kernel"])
    k[:, :, 6:, :] = 0.0
    p0["conv_d1"]["Conv_0"]["Conv_0"]["kernel"] = k
    p1 = jax.tree_util.tree_map(np.copy, p0)
    k1 = p1["conv_d1"]["Conv_0"]["Conv_0"]["kernel"]
    k1[:, :, 6:, :] = 0.5
    bs = variables["batch_stats"]
    out0, _ = g_prod.apply({"params": p0, "batch_stats": bs},
                           pc, img, ret, train=True, mutable=["batch_stats"])
    out1, _ = g_prod.apply({"params": p1, "batch_stats": bs},
                           pc, img, ret, train=True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out0["g_trs"]),
                           np.asarray(out1["g_trs"]))

    # the product channels themselves: u*w with w = f_depth depth channel
    from efgh_tpu.geometry import depth_image_from_pc

    f = jax.vmap(lambda P, m: depth_image_from_pc(P, m, RAW))(
        pc, ret["efh_cam_T_velo"])
    w = np.asarray(f)[0, 3]  # (H, W)
    hh, ww = RAW
    uu = (np.arange(ww) + 0.5) / ww - 0.5
    expect_uw = uu[None, :] * w
    assert np.any(w != 0)
    np.testing.assert_allclose(expect_uw[w == 0], 0.0)


def test_unknown_mode_raises():
    import pytest

    pc, img, ret = _inputs()
    g_bad = Gnet(raw_cam_img_size=RAW, coord_channels="uw")
    with pytest.raises(ValueError, match="unknown mode"):
        g_bad.init(jax.random.PRNGKey(0), pc, img, ret, train=False)


def test_npz_migration_uv_to_uvprod(tmp_path):
    """A 6-channel ("uv", segment-5) snapshot loads into an 8-channel
    ("uvprod") state with the product slice zeroed — bit-exact function."""
    pc, img, ret = _inputs()
    g_uv = Gnet(raw_cam_img_size=RAW, coord_channels="uv")
    g_prod = Gnet(raw_cam_img_size=RAW, coord_channels="uvprod")
    v_uv = g_uv.init(jax.random.PRNGKey(1), pc, img, ret, train=False)

    from flax.traverse_util import flatten_dict
    flat = {}
    for head, tree in (("params", v_uv["params"]),
                       ("batch_stats", v_uv["batch_stats"])):
        for path, leaf in flatten_dict(jax.device_get(tree)).items():
            flat[f"{head}/{'/'.join(path)}"] = np.asarray(leaf)
    npz = tmp_path / "snap.npz"
    np.savez(str(npz), **flat)

    v_prod = g_prod.init(jax.random.PRNGKey(2), pc, img, ret, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=v_prod["params"],
                       batch_stats=v_prod["batch_stats"], opt_state=())
    cfg = Config.from_dict({"g_coord_channels": "uvprod"})
    loaded = load_pretrained(str(npz), state, cfg)

    k = np.asarray(loaded.params["conv_d1"]["Conv_0"]["Conv_0"]["kernel"])
    assert k.shape[2] == 8
    np.testing.assert_array_equal(k[:, :, 6:, :], 0.0)
    out_prod = g_prod.apply({"params": loaded.params,
                             "batch_stats": loaded.batch_stats},
                            pc, img, ret, train=False)
    out_uv = g_uv.apply(v_uv, pc, img, ret, train=False)
    np.testing.assert_array_equal(np.asarray(out_prod["g_trs"]),
                                  np.asarray(out_uv["g_trs"]))


def test_npz_mismatch_still_fails_without_knob(tmp_path):
    """Without g_coord_channels the loader must keep failing loudly on any
    shape mismatch (no silent padding)."""
    import pytest

    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, coord_channels=True)
    g_off = Gnet(raw_cam_img_size=RAW, coord_channels=False)
    v_off = g_off.init(jax.random.PRNGKey(1), pc, img, ret, train=False)

    from flax.traverse_util import flatten_dict
    flat = {}
    for head, tree in (("params", v_off["params"]),
                       ("batch_stats", v_off["batch_stats"])):
        for path, leaf in flatten_dict(jax.device_get(tree)).items():
            flat[f"{head}/{'/'.join(path)}"] = np.asarray(leaf)
    npz = tmp_path / "snap.npz"
    np.savez(str(npz), **flat)

    v_on = g_on.init(jax.random.PRNGKey(2), pc, img, ret, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=v_on["params"],
                       batch_stats=v_on["batch_stats"], opt_state=())
    cfg = Config.from_dict({})
    with pytest.raises(ValueError, match="snapshot shape"):
        load_pretrained(str(npz), state, cfg)
