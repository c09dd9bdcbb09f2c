"""On-device lattice build vs. the dict-based CPU oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.ops import lattice as L
from tests.oracle_lattice import build_lattice_np, keys_and_barycentric_np


def _rand_cloud(rng, n=512, spread=50.0):
    pc = rng.randn(3, n) * spread / 3
    pc = np.clip(pc, -spread, spread)
    return pc.astype(np.float32)


def test_keys_and_barycentric_match_oracle(rng):
    pc = _rand_cloud(rng, 256)
    keys_o, bary_o, emg_o = keys_and_barycentric_np(pc)
    keys_j, bary_j, emg_j = L.get_keys_and_barycentric(jnp.asarray(pc))
    np.testing.assert_array_equal(np.asarray(keys_j), keys_o)
    np.testing.assert_allclose(np.asarray(bary_j), bary_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(emg_j), emg_o, atol=1e-4)
    # barycentric weights of each point sum to 1
    np.testing.assert_allclose(np.asarray(bary_j).sum(0), 1.0, atol=1e-4)
    # lattice keys live on the sum-zero hyperplane (the uint32 packing
    # reconstructs k3 from this invariant)
    np.testing.assert_array_equal(np.asarray(keys_j).sum(-1), 0)
    # each point's simplex vertices are mutually distinct and near each other
    spread = np.abs(keys_o - keys_o[0:1]).max()
    assert spread <= 2 * 4 + 4


def test_build_scale_matches_oracle(rng):
    pc = _rand_cloud(rng, 300)
    cap = 2048
    oracle = build_lattice_np(pc, radius=1, scale=1.0)
    lat = L.build_lattice_scale(
        jnp.asarray(pc), jnp.ones((300,), bool), cap, 1, 1.0
    )

    assert int(lat.num_cells) == oracle["num_cells"]
    u = oracle["num_cells"]

    # map oracle cell id -> key tuple, ours -> key tuple; offsets must point
    # to the same key for every point-vertex.
    keys_o, _, _ = keys_and_barycentric_np(pc)
    ours_off = np.asarray(lat.lattice_offset)

    # reconstruct our cell keys from any vertex pointing at them
    our_cell_key = {}
    for j in range(pc.shape[1]):
        for v in range(4):
            our_cell_key[ours_off[v, j]] = tuple(int(x) for x in keys_o[v, j])
    oracle_cells = {i: tuple(k) for i, k in enumerate(oracle["cells"])}

    for j in range(0, pc.shape[1], 7):
        for v in range(4):
            assert our_cell_key[ours_off[v, j]] == oracle_cells[
                oracle["offsets"][v, j]
            ]

    # neighbor structure: for each cell, the *set of neighbor keys found*
    # must match, independent of cell numbering.
    ours_nb = np.asarray(lat.blur_neighbors)
    key_to_ours = {v: k for k, v in our_cell_key.items()}
    # our slot h key
    for h_o in range(0, u, 5):
        k = oracle_cells[h_o]
        h_ours = key_to_ours[k]
        for fi in range(15):
            nb_o = oracle["neighbors"][fi, h_o]
            nb_j = ours_nb[fi, h_ours]
            if nb_o == -1:
                assert nb_j == -1
            else:
                assert nb_j != -1
                assert our_cell_key[nb_j] == oracle_cells[nb_o]

    # valid mask covers exactly U slots
    assert int(np.asarray(lat.cell_valid).sum()) == u

    # next_points agree as a set (rounded columns; ordering differs by design)
    nx_j = np.asarray(lat.next_points)[:, :u]
    nx_o = oracle["next_points"]
    set_j = set(map(tuple, np.round(nx_j.T, 3)))
    set_o = set(map(tuple, np.round(nx_o.T, 3)))
    assert set_j == set_o


def test_invalid_points_are_isolated(rng):
    pc = _rand_cloud(rng, 200)
    valid = np.ones(200, bool)
    valid[150:] = False
    lat = L.build_lattice_scale(jnp.asarray(pc), jnp.asarray(valid), 1024, 1, 1.0)
    bary = np.asarray(lat.barycentric)
    assert np.all(bary[:, 150:] == 0)
    # phantom cells exist but are marked invalid
    nvalid = int(np.asarray(lat.cell_valid).sum())
    ntotal = int(lat.num_cells)
    assert nvalid < ntotal
    # no valid cell has a phantom neighbor
    nb = np.asarray(lat.blur_neighbors)
    cv = np.asarray(lat.cell_valid)
    for h in np.nonzero(cv)[0]:
        for x in nb[:, h]:
            if x != -1:
                assert cv[x], "valid cell adjacent to phantom cell"


def test_splat_matches_oracle(rng):
    n, c, cap = 300, 8, 2048
    pc = _rand_cloud(rng, n)
    feats = rng.randn(c, n).astype(np.float32)
    oracle = build_lattice_np(pc)
    lat = L.build_lattice_scale(jnp.asarray(pc), jnp.ones((n,), bool), cap, 1, 1.0)

    splat_j = np.asarray(
        L.bcl_splat(jnp.asarray(feats), lat.barycentric, lat.lattice_offset, cap,
                    normalize=True)
    )

    # oracle splat
    u = oracle["num_cells"]
    acc = np.zeros((u, c))
    cnt = np.zeros(u)
    for j in range(n):
        for v in range(4):
            w = oracle["bary"][v, j]
            acc[oracle["offsets"][v, j]] += w * feats[:, j]
            cnt[oracle["offsets"][v, j]] += w
    acc = acc / (cnt[:, None] + 1e-5)

    # match cells by key
    keys_o, _, _ = keys_and_barycentric_np(pc)
    ours_off = np.asarray(lat.lattice_offset)
    key_to_ours = {}
    for j in range(n):
        for v in range(4):
            key_to_ours[tuple(int(x) for x in keys_o[v, j])] = ours_off[v, j]
    for h_o in range(0, u, 3):
        h_j = key_to_ours[tuple(oracle["cells"][h_o])]
        np.testing.assert_allclose(splat_j[h_j + 1], acc[h_o], atol=1e-3)
    # zero row stays zero
    np.testing.assert_array_equal(splat_j[0], 0)


def test_pyramid_shapes_and_jit(rng):
    pc = jnp.asarray(_rand_cloud(rng, 512))
    scale_map = [[1.0, 1], [0.5, 1], [0.25, 1]]
    caps = [2048, 1024, 512]

    @jax.jit
    def build(p):
        return L.build_lattice_pyramid(p, scale_map, caps)

    pyr = build(pc)
    assert len(pyr) == 3
    assert pyr[0].barycentric.shape == (4, 512)
    assert pyr[1].barycentric.shape == (4, 2048)
    assert pyr[2].barycentric.shape == (4, 1024)
    assert pyr[0].blur_neighbors.shape == (15, 2048)
    # cells shrink with coarser scales
    n0, n1, n2 = (int(s.num_cells) for s in pyr)
    assert n0 >= n1 >= n2 > 0


def test_pyramid_vmap(rng):
    pcs = jnp.asarray(np.stack([_rand_cloud(rng, 256) for _ in range(3)]))
    scale_map = [[1.0, 1], [0.5, 1]]
    caps = [1024, 512]
    pyr = jax.vmap(lambda p: L.build_lattice_pyramid(p, scale_map, caps))(pcs)
    assert pyr[0].barycentric.shape == (3, 4, 256)
    assert pyr[1].lattice_offset.shape == (3, 4, 1024)


def test_pyramid_map_matches_vmap(rng):
    """lax.map batching (the bounded-compile path used at batch >= 8 —
    docs/PERFORMANCE.md 'Batch-8 compile blowup') agrees with the vmapped
    default wherever the result is numerically well-defined.

    At the FIRST scale the two lower to the same quantization of the same
    inputs: integer outputs must be bit-identical and float outputs agree
    to ulp-level.  At coarser scales exact parity is unattainable by
    construction — the coarsening feeds cell CENTERS of the fine lattice,
    which land exactly on the next scale's remainder-plane boundaries, so
    ulp-level reassociation differences between the vmap and map lowerings
    legitimately flip tie-breaks (either rounding is a valid lattice).
    There we assert structural validity + statistical agreement instead."""
    # moderate spread: keeps every scale well under capacity (no overflow
    # masking, which would legitimately de-normalize barycentric rows)
    pcs = jnp.asarray(np.stack([_rand_cloud(rng, 256, spread=4.0)
                                for _ in range(3)]))
    scale_map = [[1.0, 1], [0.5, 1]]
    caps = [1024, 512]
    one = lambda p: L.build_lattice_pyramid(p, scale_map, caps)
    via_vmap = jax.vmap(one)(pcs)
    via_map = jax.lax.map(one, pcs)

    # scale 0: same quantization
    np.testing.assert_array_equal(np.asarray(via_vmap[0].lattice_offset),
                                  np.asarray(via_map[0].lattice_offset))
    np.testing.assert_array_equal(np.asarray(via_vmap[0].num_cells),
                                  np.asarray(via_map[0].num_cells))
    np.testing.assert_allclose(np.asarray(via_vmap[0].barycentric),
                               np.asarray(via_map[0].barycentric),
                               atol=1e-5)

    # scale 1: valid, similarly-sized lattices (tie-breaks may differ)
    nv = np.asarray(via_vmap[1].num_cells).astype(np.int64)
    nm = np.asarray(via_map[1].num_cells).astype(np.int64)
    assert (nv > 0).all() and (nm > 0).all()
    assert (np.abs(nv - nm) <= np.maximum(4, nv // 4)).all(), (nv, nm)
    # barycentric weights stay well-formed under the map path: every
    # input row's weights sum to ~1 (real input) or ~0 (padding), and at
    # least num_cells-of-scale-0 rows are real
    bm = np.asarray(via_map[1].barycentric)
    sums = bm.sum(axis=1)  # (B, N_in)
    near1 = np.abs(sums - 1.0) < 1e-4
    near0 = np.abs(sums) < 1e-4
    assert (near1 | near0).all()
    assert (near1.sum(axis=1) >= np.asarray(via_map[0].num_cells)).all()


def test_pyramid_batching_knob(rng):
    """Enet.build_pyramid honors pyramid_batching: auto selects map at
    batch >= 8 (compile-bound regime), explicit modes run, bad values
    raise."""
    from efgh_tpu.models.enet import Enet

    pcs = jnp.asarray(np.stack([_rand_cloud(rng, 64) for _ in range(8)]))
    scale_map = ((1.0, 1), (0.5, 1))
    caps = (256, 128)
    kw = dict(scale_map=scale_map, capacities=caps)
    p_vmap = Enet(pyramid_batching="vmap", **kw).build_pyramid(pcs)
    p_auto = Enet(pyramid_batching="auto", **kw).build_pyramid(pcs)
    # auto at batch 8 = map: scale-0 quantization matches vmap exactly
    np.testing.assert_array_equal(np.asarray(p_vmap[0].lattice_offset),
                                  np.asarray(p_auto[0].lattice_offset))
    assert p_auto[1].barycentric.shape == p_vmap[1].barycentric.shape
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Enet(pyramid_batching="nope", **kw).build_pyramid(pcs)


def test_pyramid_auto_keys_on_per_device_batch(monkeypatch, rng):
    """`pyramid_batching: auto` must decide on the PER-DEVICE batch (the
    compile blowup is per device; lax.map across a sharded axis would
    serialize what the mesh parallelizes): global batch 8 on a 2-device
    mesh is per-device 4 -> vmap; the same batch single-device -> map."""
    from efgh_tpu.models.enet import Enet

    map_batches = []
    real_map = jax.lax.map

    def spy(f, xs, *a, **kw):
        map_batches.append(int(xs.shape[0]))
        return real_map(f, xs, *a, **kw)

    monkeypatch.setattr(jax.lax, "map", spy)
    pcs = jnp.asarray(np.stack([_rand_cloud(rng, 64) for _ in range(8)]))
    kw = dict(scale_map=((1.0, 1), (0.5, 1)), capacities=(256, 128))
    Enet(pyramid_batching="auto", mesh_devices=2, **kw).build_pyramid(pcs)
    assert map_batches == []  # per-device batch 4 < 8 -> vmap
    Enet(pyramid_batching="auto", mesh_devices=1, **kw).build_pyramid(pcs)
    assert map_batches == [8]  # single device: global batch 8 -> map


def test_slice_roundtrip(rng):
    """Splat a constant field then slice it back: constants are reproduced."""
    n, cap = 400, 4096
    pc = _rand_cloud(rng, n)
    lat = L.build_lattice_scale(jnp.asarray(pc), jnp.ones((n,), bool), cap, 1, 1.0)
    feats = jnp.ones((1, n), jnp.float32) * 3.25
    splat = L.bcl_splat(feats, lat.barycentric, lat.lattice_offset, cap, normalize=True)
    sliced = L.bcl_slice(splat[1:], lat.barycentric, lat.lattice_offset)
    np.testing.assert_allclose(np.asarray(sliced), 3.25, rtol=1e-3)
