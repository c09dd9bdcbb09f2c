"""Native C++ lattice oracle vs. the Python dict oracle and the device build."""

import numpy as np
import pytest

from efgh_tpu.ops.lattice import filter_offsets
from tests.oracle_lattice import build_lattice_np, keys_and_barycentric_np

native = pytest.importorskip("efgh_tpu.native")


def test_hash_roundtrip():
    h = native.HashInt2Int(4)
    for i in range(1000):
        h.set(i * 7919 - 500, i)
    for i in range(1000):
        assert h.get(i * 7919 - 500) == i
    assert h.get(123456789, -42) == -42
    h.close()


def test_native_build_matches_dict_oracle(rng):
    pc = (rng.randn(3, 400) * 15).astype(np.float32)
    oracle = build_lattice_np(pc, radius=1)
    keys, _, _ = keys_and_barycentric_np(pc)
    offs = filter_offsets(1, 3)
    lattice_offset, blur_neighbors, cell_coords, cnt = native.build_lattice_native(
        keys, offs, h_max=4096
    )
    assert cnt == oracle["num_cells"]
    # identical insertion order -> identical ids
    np.testing.assert_array_equal(lattice_offset, oracle["offsets"])
    np.testing.assert_array_equal(blur_neighbors[:, :cnt], oracle["neighbors"])
    np.testing.assert_array_equal(cell_coords[:cnt], oracle["cells"])


def test_native_build_speed_sanity(rng):
    """65k-point build should complete quickly (native, not Python)."""
    import time

    pc = (rng.randn(3, 65536) * 15).astype(np.float32)
    keys, _, _ = keys_and_barycentric_np(pc)
    offs = filter_offsets(1, 3)
    t0 = time.time()
    *_, cnt = native.build_lattice_native(keys, offs, h_max=262144)
    dt = time.time() - t0
    assert cnt > 0
    assert dt < 5.0, f"native build too slow: {dt:.2f}s"
