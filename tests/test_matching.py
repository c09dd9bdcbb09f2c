"""Projective matching readout (`g_matching`, models/matching.py).

Off (default) = reference semantics (reference nets/gnet.py:142-166: 1x1
convs + global mean pool).  On, G scans candidate translations, scores
candidate re-projections against its own dense depth, and folds soft/hard
argmin features into g_trs through a ZERO-INIT dense head — so a migrated
pre-knob snapshot computes EXACTLY the knob-off function at load time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.config import Config
from efgh_tpu.models.gnet import Gnet
from efgh_tpu.models.matching import LateralMatching
from efgh_tpu.train.loop import load_pretrained
from efgh_tpu.train.state import TrainState

RAW = (32, 64)


def _inputs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    pc = jax.random.uniform(k1, (1, 3, 256), minval=-4.0, maxval=4.0)
    pc = pc + jnp.array([12.0, 0.0, 0.0])[None, :, None]
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


def _strip_matching(params):
    p = {k: v for k, v in jax.device_get(params).items()
         if k != "matching_head"}
    return p


def test_zero_head_matches_reference_model():
    """At init (zero head) the knob-on model computes the knob-off
    function bit-exactly — the snapshot-migration contract."""
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, matching=True)
    g_off = Gnet(raw_cam_img_size=RAW, matching=False)
    v_on = g_on.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    head = v_on["params"]["matching_head"]
    np.testing.assert_array_equal(np.asarray(head["kernel"]), 0.0)
    np.testing.assert_array_equal(np.asarray(head["bias"]), 0.0)

    out_on = g_on.apply(v_on, pc, img, ret, train=False)
    out_off = g_off.apply(
        {"params": _strip_matching(v_on["params"]),
         "batch_stats": v_on["batch_stats"]}, pc, img, ret, train=False)
    np.testing.assert_array_equal(np.asarray(out_on["g_trs"]),
                                  np.asarray(out_off["g_trs"]))
    assert "g_match_t" in out_on and out_on["g_match_t"].shape == (1, 2)


def test_matching_head_is_wired():
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, matching=True)
    v = g_on.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    p1 = jax.tree_util.tree_map(np.asarray, jax.device_get(v["params"]))
    p1["matching_head"]["kernel"] = np.full_like(
        p1["matching_head"]["kernel"], 0.5)
    out0 = g_on.apply(v, pc, img, ret, train=False)
    out1 = g_on.apply({"params": p1, "batch_stats": v["batch_stats"]},
                      pc, img, ret, train=False)
    assert not np.allclose(np.asarray(out0["g_trs"]),
                           np.asarray(out1["g_trs"]))


def test_masked_head_cannot_move_unscanned_axes():
    """The axis-masked head (gnet.py): with axes=(1,), even a NONZERO
    head may only shift trs component 1 — x/z must equal the knob-off
    output bit-exactly.  Pins the segment-7/7b leak fix: a full 3-column
    head let y features degrade the already-solved axes
    (docs/ACCURACY.md)."""
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, matching=(("axes", (1,)), ("k", 7)))
    g_off = Gnet(raw_cam_img_size=RAW, matching=False)
    v = g_on.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    assert v["params"]["matching_head"]["kernel"].shape == (4, 1)
    p1 = jax.tree_util.tree_map(np.asarray, jax.device_get(v["params"]))
    p1["matching_head"]["kernel"] = np.full_like(
        p1["matching_head"]["kernel"], 0.7)
    p1["matching_head"]["bias"] = np.full_like(
        p1["matching_head"]["bias"], 0.3)
    out_on = g_on.apply({"params": p1, "batch_stats": v["batch_stats"]},
                        pc, img, ret, train=False)
    out_off = g_off.apply(
        {"params": _strip_matching(p1), "batch_stats": v["batch_stats"]},
        pc, img, ret, train=False)
    trs_on = np.asarray(out_on["g_trs"])[..., 0]
    trs_off = np.asarray(out_off["g_trs"])[..., 0]
    np.testing.assert_array_equal(trs_on[:, 0], trs_off[:, 0])
    np.testing.assert_array_equal(trs_on[:, 2], trs_off[:, 2])
    assert not np.allclose(trs_on[:, 1], trs_off[:, 1])


def test_matching_recovers_known_translation():
    """Functional test of the cost scan itself: when the dense target is
    the true-pose render of the same cloud, the argmin must sit at the
    true offset (sub-grid via the oracle's exact zero minimum)."""
    k = jax.random.PRNGKey(3)
    pc = jax.random.uniform(k, (1, 3, 2048), minval=-6.0, maxval=6.0)
    pc = pc + jnp.array([15.0, 0.0, 0.0])[None, :, None]
    K = jnp.array([[40.0, 0, RAW[1] / 2], [0, 40.0, RAW[0] / 2], [0, 0, 1]])
    R = jnp.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]])
    cam_gt = (K @ jnp.concatenate([R, jnp.zeros((3, 1))], axis=1))

    from efgh_tpu.geometry import depth_image_from_pc

    dimg = depth_image_from_pc(pc[0], cam_gt, RAW)[3][None]  # (1, H, W)
    gmask = jnp.ones_like(dimg)

    for axis, t_true in ((0, 1.0), (1, -1.5)):
        t_vec = jnp.zeros((3,)).at[axis].set(t_true)
        # efh pose = gt pose de-shifted so cam(t_true) == cam_gt
        c = -(cam_gt[:, :3] @ t_vec)[:, None]
        efh = jnp.concatenate([cam_gt[:, :3], c], axis=1)[None]
        m = LateralMatching(raw_cam_img_size=RAW, span=3.0, k=25,
                            downsample=1, axes=(axis,))
        feats, aux = m.apply({}, pc, dimg, gmask, efh, jnp.eye(4)[None])
        t_hard = float(feats[0, 1])
        step = 6.0 / 24
        assert abs(t_hard - t_true) <= step / 2 + 1e-6, \
            f"axis {axis}: argmin {t_hard} vs true {t_true}"
        # the curve minimum is a (near-)exact match => well below clip
        assert float(feats[0, 2]) < 0.1


def test_l_mat_rotation_is_applied():
    """Candidate translations act in the EF-aligned frame: with l a 90-deg
    yaw, scanning velo-y must shift the projection the way velo-x would
    under identity."""
    k = jax.random.PRNGKey(4)
    pc = jax.random.uniform(k, (1, 3, 2048), minval=-6.0, maxval=6.0)
    pc = pc + jnp.array([15.0, 0.0, 0.0])[None, :, None]
    K = jnp.array([[40.0, 0, RAW[1] / 2], [0, 40.0, RAW[0] / 2], [0, 0, 1]])
    R = jnp.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]])
    cam = (K @ jnp.concatenate([R, jnp.zeros((3, 1))], axis=1))[None]
    from efgh_tpu.geometry import depth_image_from_pc

    dimg = depth_image_from_pc(pc[0], cam[0], RAW)[3][None]
    gmask = jnp.ones_like(dimg)
    yaw90 = jnp.array([[0.0, -1, 0, 0], [1, 0, 0, 0],
                       [0, 0, 1, 0], [0, 0, 0, 1]])[None]
    m_y = LateralMatching(raw_cam_img_size=RAW, span=3.0, k=25,
                          downsample=1, axes=(1,))
    m_x = LateralMatching(raw_cam_img_size=RAW, span=3.0, k=25,
                          downsample=1, axes=(0,))
    _, aux_y = m_y.apply({}, pc, dimg, gmask, cam, yaw90)
    _, aux_x = m_x.apply({}, pc, dimg, gmask, cam, jnp.eye(4)[None])
    # R_l^T (d * e_y) with a +90deg yaw = d * e_x under identity
    np.testing.assert_allclose(np.asarray(aux_y["curves"]),
                               np.asarray(aux_x["curves"]), rtol=1e-5)


def test_npz_migration_fills_matching_head(tmp_path):
    """A pre-knob snapshot loads into a knob-on state: the head keeps its
    zero init and the migrated model computes the snapshot's function."""
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, matching=True)
    g_off = Gnet(raw_cam_img_size=RAW, matching=False)
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
    cfg = Config.from_dict({"g_matching": True})
    loaded = load_pretrained(str(npz), state, cfg)

    np.testing.assert_array_equal(
        np.asarray(loaded.params["matching_head"]["kernel"]), 0.0)
    out_on = g_on.apply({"params": loaded.params,
                         "batch_stats": loaded.batch_stats},
                        pc, img, ret, train=False)
    out_off = g_off.apply(v_off, pc, img, ret, train=False)
    np.testing.assert_array_equal(np.asarray(out_on["g_trs"]),
                                  np.asarray(out_off["g_trs"]))


def test_npz_missing_params_still_fail_without_knob(tmp_path):
    """Without g_matching the loader must keep failing loudly on a missing
    subtree (no silent filling)."""
    pc, img, ret = _inputs()
    g_on = Gnet(raw_cam_img_size=RAW, matching=True)
    g_off = Gnet(raw_cam_img_size=RAW, matching=False)
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
    with pytest.raises((ValueError, KeyError)):
        load_pretrained(str(npz), state, Config.from_dict({}))


def test_full_snapshot_fills_matching_opt_state(tmp_path):
    """Lossless resume across the s6a -> s7 migration: restored Adam
    moments for every pre-existing param, fresh zeros for the new head."""
    import os

    from efgh_tpu.train import create_optimizer, save_checkpoint
    from efgh_tpu.train.state import flat_path_leaves

    cfg_old = Config.from_dict({"lr": 1e-4, "lr_scale_keys": {"G/": 10.0}})
    cfg_new = Config.from_dict({"lr": 1e-4, "lr_scale_keys": {"G/": 10.0},
                                "g_matching": True})

    def tiny(with_head, seed):
        k = jax.random.PRNGKey(seed)
        params = {"G": {"conv": {"kernel": jax.random.normal(k, (4, 3))}}}
        if with_head:
            params["G"]["matching_head"] = {
                "kernel": jnp.zeros((8, 3)), "bias": jnp.zeros((3,))}
        tx = create_optimizer(cfg_new if with_head else cfg_old)
        return TrainState(step=jnp.asarray(55, jnp.int32), params=params,
                          batch_stats={"G": {"bn": {"mean": jnp.ones(3)}}},
                          opt_state=tx.init(params))

    saved = tiny(False, 0)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(saved, ckpt_dir, is_best=False, iter_iterval=10**9)
    out = str(tmp_path / "full.npz")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.export_weights import export
    export(os.path.join(ckpt_dir, "checkpoint"), out, with_opt=True)

    fresh = tiny(True, 1)
    loaded = load_pretrained(out, fresh, cfg_new)
    assert int(loaded.step) == 55
    got = dict(flat_path_leaves(loaded.opt_state))
    # pre-existing param moments restored, new head moments exist
    assert any("matching_head" in k for k in got)
    for k_, v in got.items():
        if "matching_head" in k_ and hasattr(v, "shape") and v.ndim:
            np.testing.assert_array_equal(np.asarray(v), 0.0)


def test_backbone_wires_the_config_knob():
    from efgh_tpu.models import build_model

    assert build_model(Config.from_dict({"g_matching": True})).g_matching \
        is True
    assert build_model(Config.from_dict({})).g_matching is False
    m = build_model(Config.from_dict(
        {"g_matching": {"k": 33, "axes": [0, 1]}})).g_matching
    assert dict(m)["k"] == 33 and dict(m)["axes"] == (0, 1)
