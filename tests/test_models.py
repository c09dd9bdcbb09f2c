"""Stage-by-stage and full-backbone shape/compile tests at tiny sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.models import EFGHBackbone
from efgh_tpu.models.enet import Enet
from efgh_tpu.models.fnet import Fnet
from efgh_tpu.models.gnet import Gnet
from efgh_tpu.models.hnet import Hnet

# tiny geometry: raw cam (64,128) -> input img (32,64), range img (32,256)
RAW = (64, 128)
IMG = (32, 64)
N = 256
SCALE_MAP = ((1.0, 1), (0.75, 1), (0.5, 1), (0.25, 1), (0.125, 1))
CAPS = (1024, 1024, 512, 256, 128)


def _cloud(b=1):
    rng = np.random.RandomState(0)
    pc = rng.randn(b, 3, N).astype(np.float32) * 10
    return jnp.asarray(pc)


def _img(b=1, size=IMG):
    rng = np.random.RandomState(1)
    return jnp.asarray(rng.rand(b, 3, *size).astype(np.float32) * 255)


def test_enet_shapes():
    model = Enet(scale_map=SCALE_MAP, capacities=CAPS)
    pc = _cloud()
    vars_ = model.init(jax.random.PRNGKey(0), pc, train=False)
    out = model.apply(vars_, pc, train=False)
    assert out["e_gn_abs"].shape == (1, 3, 1)
    assert out["e_gn_sgn"].shape == (1, 8)
    assert out["e_gn"].shape == (1, 3, 1)
    assert out["e_l"].shape == (1, 4, 4)
    r = np.asarray(out["e_l"])[0, :3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    # rotated normal points to +z
    n = np.asarray(out["e_gn"])[0, :, 0]
    z = r @ (n / np.linalg.norm(n))
    np.testing.assert_allclose(z, [0, 0, 1], atol=1e-4)


def test_hnet_shapes():
    model = Hnet()
    img = _img()
    vars_ = model.init(jax.random.PRNGKey(0), img, train=False)
    out = model.apply(vars_, img, train=False)
    assert out["h_hrzn_abs"].shape == (1, 2, 1)
    assert out["h_hrzn_sgn"].shape == (1, 4)
    assert out["h_img"].shape == img.shape
    assert out["h_c"].shape == (1, 3, 3)


def test_fnet_shapes():
    model = Fnet(range_img_size=(RAW[0] // 2, RAW[1] * 2))
    pc = _cloud()
    ret = {
        "e_l": jnp.eye(4)[None],
        "h_img": _img(),
        "sensor2_T_sensor1": jnp.eye(4)[None],
    }
    vars_ = model.init(jax.random.PRNGKey(0), pc, ret, train=False)
    out = model.apply(vars_, pc, ret, train=False)
    assert out["f_l"].shape == (1, 4, 4)
    assert out["f_score"].ndim == 2
    assert out["f_score"].shape[0] == 1
    # sigmoid output in (0, 1)
    s = np.asarray(out["f_score"])
    assert np.all((s > 0) & (s < 1))


def test_gnet_shapes():
    model = Gnet(raw_cam_img_size=RAW)
    pc = _cloud()
    img = _img()
    ret = {
        "sensor2_T_sensor1": jnp.eye(4)[None],
        "efh_cam_T_velo": jnp.asarray(
            np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0], [0, 0, 1, 0]]],
                     np.float32)
        ),
    }
    vars_ = model.init(jax.random.PRNGKey(0), pc, img, ret, train=False)
    out = model.apply(vars_, pc, img, ret, train=False)
    assert out["g_trs"].shape == (1, 3, 1)
    assert out["g_depth"].shape == (1, 1, RAW[0], RAW[1])
    assert out["g_mask"].shape == (1, 2, RAW[0], RAW[1])
    assert out["g_l"].shape == (1, 4, 4)


@pytest.fixture(scope="module")
def backbone_setup():
    model = EFGHBackbone(
        scale_map=SCALE_MAP,
        capacities=CAPS,
        raw_cam_img_size=RAW,
    )
    pc = _cloud()
    img = _img()
    calib = jnp.asarray(
        np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0], [0, 0, 1, 0]]],
                 np.float32)
    )
    A = jnp.asarray(
        np.array([[[1.0, 0, -RAW[1] / 2], [0, 1, -RAW[0] / 2], [0, 0, 1]]],
                 np.float32)
    )
    vars_ = model.init(jax.random.PRNGKey(0), pc, img, calib, A, train=False)
    return model, vars_, (pc, img, calib, A)


def test_backbone_forward(backbone_setup):
    model, vars_, (pc, img, calib, A) = backbone_setup
    out = model.apply(vars_, pc, img, calib, A, train=False)
    for k in ["eh_cam_T_velo", "efh_cam_T_velo", "efgh_cam_T_velo", "cam_T_velo"]:
        assert out[k].shape == (1, 3, 4), k
    assert out["sensor2_T_sensor1"].shape == (1, 4, 4)
    np.testing.assert_allclose(
        np.asarray(out["cam_T_velo"]), np.asarray(out["efgh_cam_T_velo"])
    )
    # composition: sensor2_T_sensor1 = g_l @ f_l @ e_l
    comp = np.asarray(out["g_l"] @ out["f_l"] @ out["e_l"])
    np.testing.assert_allclose(
        np.asarray(out["sensor2_T_sensor1"]), comp, atol=1e-4
    )


def test_backbone_jit_and_train_mode(backbone_setup):
    model, vars_, (pc, img, calib, A) = backbone_setup

    @jax.jit
    def fwd(v, pc, img, calib, A):
        return model.apply(v, pc, img, calib, A, train=True,
                           mutable=["batch_stats"])

    out, new_state = fwd(vars_, pc, img, calib, A)
    assert "batch_stats" in new_state
    assert out["cam_T_velo"].shape == (1, 3, 4)
    assert np.all(np.isfinite(np.asarray(out["cam_T_velo"])))


def test_batch_stats_pinned_f32_under_bf16(backbone_setup):
    """BN running statistics must stay float32 even when compute_dtype is
    bfloat16 (the bf16 long-horizon recipe, docs/PERFORMANCE.md): low-
    precision accumulation of momentum-0.9 EMAs drifts over 10k+ iters."""
    _, _, (pc, img, calib, A) = backbone_setup
    model = EFGHBackbone(scale_map=SCALE_MAP, capacities=CAPS,
                         raw_cam_img_size=RAW, compute_dtype=jnp.bfloat16)
    vars_ = model.init(jax.random.PRNGKey(0), pc, img, calib, A, train=True)
    leaves = jax.tree_util.tree_leaves_with_path(vars_["batch_stats"])
    assert leaves
    for path, leaf in leaves:
        assert leaf.dtype == jnp.float32, (path, leaf.dtype)
