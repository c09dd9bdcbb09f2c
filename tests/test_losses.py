"""Loss functions vs. straightforward numpy re-derivations of the reference
formulas (reference losses/loss_utils.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.config import Config
from efgh_tpu.losses import EFGHCriterion, bce
from tests.conftest import *  # noqa


RAW = (64, 128)


def _cfg():
    return Config.from_dict({"raw_cam_img_size": list(RAW)})


def _gt_pred(rng, b=2, width=117, n=128):
    from scipy.spatial.transform import Rotation

    gt = {}
    rl = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    for i in range(b):
        rl[i, :3, :3] = Rotation.random(random_state=i).as_matrix()
        rl[i, :3, 3] = rng.randn(3)
    gt["rand_init_l"] = jnp.asarray(rl)
    rc = np.eye(3, dtype=np.float32)[None].repeat(b, 0)
    for i in range(b):
        th = rng.uniform(-0.5, 0.5)
        rc[i, :2, :2] = [[math.cos(th), -math.sin(th)], [math.sin(th), math.cos(th)]]
    gt["rand_init_c"] = jnp.asarray(rc)
    s2s1 = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    for i in range(b):
        s2s1[i, :3, :3] = Rotation.random(random_state=100 + i).as_matrix()
        s2s1[i, :3, 3] = rng.randn(3) * 0.5
    gt["sensor2_T_sensor1"] = jnp.asarray(s2s1)
    ctv = rng.randn(b, 3, 4).astype(np.float32)
    ctv[:, 2, :3] = 0.01
    ctv[:, 2, 3] = 1.0
    gt["cam_T_velo"] = jnp.asarray(ctv)
    gt["img_mask"] = jnp.ones((b, 1, RAW[0], RAW[1]), jnp.float32)

    pred = {
        "e_gn_abs": jnp.asarray(np.abs(rng.randn(b, 3, 1)).astype(np.float32)),
        "e_gn_sgn": jnp.asarray(rng.randn(b, 8).astype(np.float32)),
        "h_hrzn_abs": jnp.asarray(np.abs(rng.randn(b, 2, 1)).astype(np.float32)),
        "h_hrzn_sgn": jnp.asarray(rng.randn(b, 4).astype(np.float32)),
        "e_l": jnp.asarray(
            np.stack([np.eye(4, dtype=np.float32)] * b)
        ),
        "f_l": jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * b)),
        "f_score": jax.nn.sigmoid(jnp.asarray(rng.randn(b, width).astype(np.float32))),
        "g_trs": jnp.asarray(rng.randn(b, 3, 1).astype(np.float32)),
        "g_depth": jnp.asarray(rng.rand(b, 1, RAW[0], RAW[1]).astype(np.float32)),
        "g_mask": jax.nn.softmax(
            jnp.asarray(rng.randn(b, 2, RAW[0], RAW[1]).astype(np.float32)), axis=1
        ),
    }
    pc = jnp.asarray(rng.randn(b, 3, n).astype(np.float32) * 5)
    return gt, pred, pc


def test_total_and_finiteness(rng):
    crit = EFGHCriterion(_cfg())
    gt, pred, pc = _gt_pred(rng)
    losses, gt2 = jax.jit(crit.compute_loss)(pc, gt, pred)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # double-count quirk: total includes e_gn plus its components again
    expect = sum(float(v) for k, v in losses.items() if k != "total")
    np.testing.assert_allclose(float(losses["total"]), expect, rtol=1e-5)
    # augmented targets present
    for k in ["e_gn", "e_l", "f_score", "f_l", "g_trs", "g_l", "g_depth", "g_mask"]:
        assert k in gt2


def test_gt_fov_band_matches_loop(rng):
    crit = EFGHCriterion(_cfg())
    width = 117
    for yaw in [-3.0, -1.0, 0.0, 0.5, 3.1]:
        axis = jnp.asarray(
            np.array([[[math.cos(yaw)], [math.sin(yaw)], [0.0]]], np.float32)
        )
        band = np.asarray(crit._gt_fov(axis, width))[0]
        # loop re-derivation (reference losses/loss_utils.py:126-141)
        f_idx = ((-yaw + math.pi) / (2 * math.pi)) * width
        xmin = int(f_idx) - crit.fov_pos_num // 2
        xmax = xmin + crit.fov_pos_num
        zz = np.zeros(width)
        for j in range(width):
            if xmin <= j < xmax or xmin <= j - width < xmax or xmin <= j + width < xmax:
                zz[j] = 1
        np.testing.assert_array_equal(band, zz)
        assert band.sum() == crit.fov_pos_num


def test_floss_hard_negative_mining_matches_numpy(rng):
    crit = EFGHCriterion(_cfg())
    gt, pred, pc = _gt_pred(rng, b=1)
    losses, gt2 = crit.compute_loss(pc, gt, pred)

    # numpy oracle of the mining (reference losses/loss_utils.py:92-112)
    f_pred = np.asarray(pred["f_score"])[0]
    f_gt = np.asarray(gt2["f_score"])[0]
    eps = 0
    bce_np = -(f_gt * np.log(f_pred) + (1 - f_gt) * np.log(1 - f_pred))
    loss_c = bce_np.copy()
    loss_c[f_gt > 0] = 0
    order = np.argsort(-loss_c)
    rank = np.argsort(order)
    num_pos = int((f_gt > 0).sum())
    num_neg = min(crit.fov_neg_ratio * num_pos, len(f_gt) - 1)
    neg = rank < num_neg
    sel = (f_gt > 0) | neg
    expect = bce_np[sel].mean() * crit.lambda_fov
    np.testing.assert_allclose(float(losses["fov"]), expect, rtol=1e-4)


def test_bce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    p = rng.rand(64).astype(np.float32) * 0.98 + 0.01
    t = (rng.rand(64) > 0.5).astype(np.float32)
    ref = torch.nn.BCELoss(reduction="none")(
        torch.from_numpy(p), torch.from_numpy(t)
    ).numpy()
    ours = np.asarray(bce(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gloss_perfect_prediction_zero(rng):
    """If predictions equal the derived targets, the G losses vanish."""
    crit = EFGHCriterion(_cfg())
    gt, pred, pc = _gt_pred(rng, b=1)
    losses, gt2 = crit.compute_loss(pc, gt, pred)
    pred2 = dict(pred)
    pred2["g_trs"] = gt2["g_trs"]
    pred2["g_depth"] = gt2["g_depth"]
    losses2, _ = crit.compute_loss(pc, gt, pred2)
    assert float(losses2["g_trs"]) < 1e-6
    assert float(losses2["g_depth"]) < 1e-6


def test_g_trs_axis_weights(rng):
    """g_trs_axis_weights: [1,1,1] reproduces the unweighted reference
    smooth-L1; upweighting one axis scales that axis's contribution while
    the mean-1 normalization preserves the loss scale for equal errors."""
    gt, pred, pc = _gt_pred(rng, b=2)
    base = EFGHCriterion(_cfg())
    losses_base, gt2 = base.compute_loss(pc, gt, pred)

    cfg_w = Config.from_dict(
        {"raw_cam_img_size": list(RAW),
         "g_trs_axis_weights": [1.0, 1.0, 1.0]}
    )
    losses_eq, _ = EFGHCriterion(cfg_w).compute_loss(pc, gt, pred)
    np.testing.assert_allclose(
        float(losses_eq["g_trs"]), float(losses_base["g_trs"]), rtol=1e-6
    )

    # pure y-error: with weights [1,4,1] (mean 2 -> normalized [0.5,2,0.5])
    # the y-axis smooth-L1 contribution doubles
    pred_y = dict(pred)
    pred_y["g_trs"] = gt2["g_trs"] + jnp.asarray(
        np.array([0.0, 2.0, 0.0], np.float32)[None, :, None]
    )
    l_unw, _ = base.compute_loss(pc, gt, pred_y)
    cfg_y = Config.from_dict(
        {"raw_cam_img_size": list(RAW), "g_trs_axis_weights": [1.0, 4.0, 1.0]}
    )
    l_w, _ = EFGHCriterion(cfg_y).compute_loss(pc, gt, pred_y)
    np.testing.assert_allclose(
        float(l_w["g_trs"]), 2.0 * float(l_unw["g_trs"]), rtol=1e-5
    )

    # equal per-axis errors: normalization keeps the total invariant
    pred_e = dict(pred)
    pred_e["g_trs"] = gt2["g_trs"] + 0.5
    l_e_unw, _ = base.compute_loss(pc, gt, pred_e)
    l_e_w, _ = EFGHCriterion(cfg_y).compute_loss(pc, gt, pred_e)
    np.testing.assert_allclose(
        float(l_e_w["g_trs"]), float(l_e_unw["g_trs"]), rtol=1e-5
    )
