"""Robustness: batch consistency, degenerate inputs, converter completeness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.models import EFGHBackbone
from efgh_tpu.ops import lattice as L

RAW = (64, 128)
SCALE_MAP = ((1.0, 1), (0.75, 1), (0.5, 1), (0.25, 1), (0.125, 1))
CAPS = (1024, 1024, 512, 256, 128)


def _model():
    return EFGHBackbone(scale_map=SCALE_MAP, capacities=CAPS,
                        raw_cam_img_size=RAW)


@pytest.mark.slow
def test_batch_consistency(rng):
    """A batch-2 forward equals two stacked batch-1 forwards (vmapped lattice
    + masking behave per-sample; the reference hard-codes batch 1)."""
    model = _model()
    pc = jnp.asarray(rng.randn(2, 3, 256).astype(np.float32) * 10)
    img = jnp.asarray(rng.rand(2, 3, 32, 64).astype(np.float32) * 255)
    calib = jnp.asarray(
        np.tile(np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0],
                           [0, 0, 1, 0]]], np.float32), (2, 1, 1)))
    a = jnp.asarray(
        np.tile(np.array([[[1, 0, -64.0], [0, 1, -32.0], [0, 0, 1]]],
                         np.float32), (2, 1, 1)))
    v = model.init(jax.random.PRNGKey(0), pc, img, calib, a, train=False)
    out2 = model.apply(v, pc, img, calib, a, train=False)
    for b in range(2):
        out1 = model.apply(v, pc[b:b+1], img[b:b+1], calib[b:b+1], a[b:b+1],
                           train=False)
        np.testing.assert_allclose(
            np.asarray(out2["cam_T_velo"])[b],
            np.asarray(out1["cam_T_velo"])[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out2["e_gn"])[b], np.asarray(out1["e_gn"])[0],
            rtol=1e-4, atol=1e-5)


def test_lattice_identical_points(rng):
    """All points identical -> d1 cells (one simplex), no NaNs."""
    pc = jnp.asarray(np.tile(rng.randn(3, 1).astype(np.float32), (1, 128)))
    lat = L.build_lattice_scale(pc, jnp.ones((128,), bool), 256, 1, 1.0)
    assert int(lat.num_cells) <= 4 + 1
    assert np.all(np.isfinite(np.asarray(lat.barycentric)))
    np.testing.assert_allclose(np.asarray(lat.barycentric).sum(0), 1.0,
                               atol=1e-4)


def test_lattice_all_invalid(rng):
    pc = jnp.asarray(rng.randn(3, 64).astype(np.float32) * 10)
    lat = L.build_lattice_scale(pc, jnp.zeros((64,), bool), 128, 1, 1.0)
    assert int(np.asarray(lat.cell_valid).sum()) == 0
    assert np.all(np.asarray(lat.barycentric) == 0)


def test_lattice_capacity_overflow(rng):
    """Tiny capacity: offsets stay in range, overflowing weights drop."""
    pc = jnp.asarray(rng.randn(3, 512).astype(np.float32) * 30)
    lat = L.build_lattice_scale(pc, jnp.ones((512,), bool), 16, 1, 1.0)
    off = np.asarray(lat.lattice_offset)
    assert off.min() >= 0 and off.max() < 16
    assert int(lat.num_cells) == 16
    nb = np.asarray(lat.blur_neighbors)
    assert nb.min() >= -1 and nb.max() < 16
    # splat stays finite
    splat = L.bcl_splat(jnp.ones((2, 512)), lat.barycentric,
                        lat.lattice_offset, 16)
    assert np.all(np.isfinite(np.asarray(splat)))


def test_lattice_out_of_envelope_points(rng):
    """Points outside the packing envelope clamp into boundary cells without
    corrupting in-range geometry."""
    pc = rng.randn(3, 128).astype(np.float32) * 10
    pc[:, :8] = 5000.0  # way outside
    lat = L.build_lattice_scale(jnp.asarray(pc), jnp.ones((128,), bool),
                                512, 1, 1.0)
    assert np.all(np.isfinite(np.asarray(lat.next_points)))
    assert int(lat.num_cells) > 0


def test_converter_completeness():
    """Every torch tensor is consumed and every flax leaf is produced."""
    pytest.importorskip("torch")
    from tests.reference_harness import install_reference, reference_args

    if not install_reference():
        pytest.skip("reference absent")
    import torch

    from nets import EFGHBackbone as TorchBackbone

    from efgh_tpu.train.convert import convert_torch_state_dict
    from flax.traverse_util import flatten_dict

    torch.manual_seed(0)
    tmodel = TorchBackbone(reference_args(RAW, [list(s) for s in SCALE_MAP]))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_torch_state_dict(sd)

    model = _model()
    rng_np = np.random.RandomState(0)
    pc = jnp.asarray(rng_np.randn(1, 3, 64).astype(np.float32) * 10)
    img = jnp.asarray(rng_np.rand(1, 3, 32, 64).astype(np.float32))
    calib = jnp.asarray(np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0],
                                   [0, 0, 1, 0]]], np.float32))
    a = jnp.asarray(np.array([[[1, 0, -64.0], [0, 1, -32.0], [0, 0, 1]]],
                             np.float32))
    ref = model.init(jax.random.PRNGKey(0), pc, img, calib, a, train=False)

    got_p = set(flatten_dict(params).keys())
    want_p = set(flatten_dict(ref["params"]).keys())
    assert got_p == want_p, (
        f"missing={sorted(want_p - got_p)[:5]} extra={sorted(got_p - want_p)[:5]}"
    )
    got_b = set(flatten_dict(batch_stats).keys())
    want_b = set(flatten_dict(ref["batch_stats"]).keys())
    assert got_b == want_b
    # every torch tensor participates except bookkeeping buffers:
    # num_batches_tracked (BN counters) and feat_indices/out_indices (the
    # reference BCL's arange gather helpers, reference nets/bilateralNN.py:99)
    skip = ("num_batches_tracked", "feat_indices", "out_indices")
    n_torch_used = sum(1 for k in sd if not any(s in k for s in skip))
    n_leaves = len(got_p) + len(got_b)
    # BN contributes 4 torch tensors -> 2 params + 2 stats; conv/linear map 1:1
    assert n_leaves == n_torch_used
