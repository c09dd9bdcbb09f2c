"""Pallas BCL blur-gather kernel: interpret-mode regression tests.

Contract: bit-identity with the XLA gather `splat[blur_neighbors.T + 1]`
(efgh_tpu/ops/lattice.py:bcl_gather_neighbors) — exact, no tolerances.
Interpret mode stands in for the Mosaic compile on CPU (SURVEY §5
sanitizer-style checks for hand-written kernels); on TPU the same code
replaces the random-HBM-row gather of the blur stage (the neighbor
indexing of reference nets/bilateralNN.py:223-246).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.ops.lattice import (
    bcl_gather_neighbors,
    build_lattice_scale,
    filter_size,
)
from efgh_tpu.ops.pallas_bcl import bcl_gather_neighbors_pallas


def _synthetic(rng, h, f, c, cap, dtype, missing_frac=0.2):
    """Random (splat, blur_neighbors) with -1 holes; indices unsorted is
    allowed by the kernel (predication is an optimization, not a
    correctness requirement)."""
    splat = rng.standard_normal((cap + 1, c)).astype(dtype)
    splat[0] = 0.0
    bn = rng.integers(0, cap, size=(f, h)).astype(np.int32)
    # per-offset sorted columns mimic the real monotone structure
    bn = np.sort(bn, axis=1)
    holes = rng.random((f, h)) < missing_frac
    bn[holes] = -1
    return splat, bn


@pytest.mark.parametrize(
    "h,f,c,cap,dtype,tile,chunk",
    [
        (2048, 15, 36, 2048, np.float32, 512, 1024),   # multi-chunk
        (2048, 15, 36, 2048, "bfloat16", 512, 1024),   # bf16 bit-exactness
        (1000, 7, 68, 1536, np.float32, 256, 4096),    # single chunk, pad H
        (512, 15, 260, 512, np.float32, 512, 256),     # many tiny chunks
    ],
)
def test_matches_xla_gather(h, f, c, cap, dtype, tile, chunk):
    rng = np.random.default_rng(h + f)
    dt = jnp.bfloat16 if dtype == "bfloat16" else dtype
    splat, bn = _synthetic(rng, h, f, c, cap, np.float32)
    splat = jnp.asarray(splat, dt)
    bn = jnp.asarray(bn)
    want = np.asarray(bcl_gather_neighbors(splat, bn))
    got = np.asarray(bcl_gather_neighbors_pallas(
        splat, bn, tile=tile, chunk_rows=chunk, interpret=True))
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_matches_on_real_lattice(rng_cloud=None):
    """End-to-end on a real lattice scale: the actual monotone-with-holes
    blur_neighbors structure the kernel is optimized for."""
    rng = np.random.default_rng(7)
    pts = (rng.standard_normal((3, 1500)) * 20.0).astype(np.float32)
    lat = build_lattice_scale(jnp.asarray(pts), jnp.ones(1500, bool),
                              capacity=2048, radius=1, scale=1.0)
    f = filter_size(1, 3)
    assert lat.blur_neighbors.shape == (f, 2048)
    c = 36
    splat = jnp.asarray(
        np.random.default_rng(8).standard_normal((2049, c)), jnp.float32)
    splat = splat.at[0].set(0.0)
    want = np.asarray(bcl_gather_neighbors(splat, lat.blur_neighbors))
    got = np.asarray(bcl_gather_neighbors_pallas(
        splat, lat.blur_neighbors, tile=256, chunk_rows=512, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_backend_knob_dispatches():
    """set_bcl_gather_backend routes the production bcl_gather_neighbors
    call through the kernel (and back), mirroring the merge-backend gate."""
    from efgh_tpu.ops import lattice

    rng = np.random.default_rng(11)
    splat, bn = _synthetic(rng, 512, 7, 20, 512, np.float32)
    splat, bn = jnp.asarray(splat), jnp.asarray(bn)
    want = np.asarray(lattice.bcl_gather_neighbors(splat, bn))
    lattice.set_bcl_gather_backend("pallas_interpret")
    try:
        got = np.asarray(lattice.bcl_gather_neighbors(splat, bn))
    finally:
        lattice.set_bcl_gather_backend("xla")
    np.testing.assert_array_equal(got, want)


def test_vmaps_over_batch():
    """The BCL module vmaps the gather over the batch axis; the pallas_call
    batching rule must produce the same stacked result."""
    rng = np.random.default_rng(3)
    b, h, f, c, cap = 2, 512, 7, 20, 512
    splats, bns = [], []
    for i in range(b):
        s_, n_ = _synthetic(rng, h, f, c, cap, np.float32)
        splats.append(s_)
        bns.append(n_)
    splats = jnp.asarray(np.stack(splats))
    bns = jnp.asarray(np.stack(bns))
    want = jax.vmap(bcl_gather_neighbors)(splats, bns)
    got = jax.vmap(lambda s_, n_: bcl_gather_neighbors_pallas(
        s_, n_, tile=256, chunk_rows=256, interpret=True))(splats, bns)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_fused_blur_matches_gather_einsum(dtype):
    """bcl_blur_fused_pallas == einsum over the gathered tensor (the first
    matmul of BilateralConvFlex) within f32 reassociation tolerance."""
    from efgh_tpu.ops.pallas_bcl import bcl_blur_fused_pallas

    rng = np.random.default_rng(5)
    h, f, c, cap, w = 1024, 15, 36, 1024, 32
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    splat, bn = _synthetic(rng, h, f, c, cap, np.float32)
    splat = jnp.asarray(splat, dt)
    bn = jnp.asarray(bn)
    kernel = jnp.asarray(rng.standard_normal((f * c, w)) * 0.05, dt)

    gathered = bcl_gather_neighbors(splat, bn).reshape(h, f * c)
    want = np.asarray(jnp.einsum("hc,cw->hw", gathered, kernel,
                                 preferred_element_type=jnp.float32))
    got = np.asarray(bcl_blur_fused_pallas(
        splat, bn, kernel, tile=256, chunk_rows=512, interpret=True))
    assert got.dtype == np.float32
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0),
                               rtol=1e-5)


def test_pallas_bcl_config_knob():
    """build_model resolves the pallas_bcl knob like pallas_merge: off/on
    set the backend, bad values raise, CPU auto resolves to xla."""
    from efgh_tpu.config import Config
    from efgh_tpu.models import build_model
    from efgh_tpu.ops import lattice

    base = {"raw_cam_img_size": [64, 128], "num_points": 256,
            "lattice_capacity": [1024, 1024, 512, 256, 128]}
    try:
        build_model(Config.from_dict({**base, "pallas_bcl": "on"}))
        assert lattice._BCL_GATHER_BACKEND == "pallas"
        build_model(Config.from_dict({**base, "pallas_bcl": "auto"}))
        assert lattice._BCL_GATHER_BACKEND == "xla"  # CPU: no probe
        build_model(Config.from_dict({**base, "pallas_bcl": "off"}))
        assert lattice._BCL_GATHER_BACKEND == "xla"
        with pytest.raises(ValueError):
            build_model(Config.from_dict({**base, "pallas_bcl": "nope"}))
    finally:
        lattice.set_bcl_gather_backend("xla")
