"""Pallas bitonic multi-merge kernel: interpret-mode regression tests.

The kernel's contract is byte-identity with ``lax.sort(..., num_keys=2)``
over the padded input (efgh_tpu/ops/pallas_merge.py), which makes the tests
exact — no tolerances.  Interpret mode stands in for the Mosaic compile on
CPU (the SURVEY §5 sanitizer-style check for hand-written kernels); the same
code path is compiled on TPU where it replaces the neighbor-table lax.sort
(reference nets/transforms.py:126-183's role).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import efgh_tpu.ops.lattice as lattice
from efgh_tpu.ops.merge import ID_PAD, KEY_PAD, _next_pow2
from efgh_tpu.ops.pallas_merge import merge_rows_pallas


def _sorted_rows(rng, k, l, key_max=2**32 - 2):
    keys = np.sort(
        rng.randint(0, key_max, size=(k, l)).astype(np.uint64), axis=1
    ).astype(np.uint32)
    ids = rng.permutation(k * l).astype(np.int32).reshape(k, l)
    for r in range(k):
        o = np.lexsort((ids[r], keys[r]))
        keys[r], ids[r] = keys[r][o], ids[r][o]
    return keys, ids


def _reference(keys, ids):
    k, l = keys.shape
    lp, kp = _next_pow2(l), _next_pow2(k)
    fk = np.pad(keys, ((0, kp - k), (0, lp - l)),
                constant_values=np.uint32(KEY_PAD))
    fi = np.pad(ids, ((0, kp - k), (0, lp - l)),
                constant_values=np.int32(ID_PAD))
    return jax.lax.sort(
        (jnp.asarray(fk).reshape(-1), jnp.asarray(fi).reshape(-1)), num_keys=2
    )


@pytest.mark.parametrize(
    "k,l,blk,fl",
    [
        (16, 4096, 1024, 65536),   # fused single-launch path
        (15, 3000, 1024, 4096),    # global(m<=2) + local multi-pass, pad row
        (16, 4096, 512, 2048),     # grouped global stages (m=3)
        (3, 130, 512, 2048),       # tiny-fallback lax.sort path
        (5, 2048, 1024, 4096),     # non-pow2 row count, odd grouping
        (2, 8192, 2048, 8192),     # single merge level
    ],
)
def test_matches_lax_sort(k, l, blk, fl):
    rng = np.random.RandomState(k * 1000 + l)
    keys, ids = _sorted_rows(rng, k, l)
    mk, mi = merge_rows_pallas(
        jnp.asarray(keys), jnp.asarray(ids),
        block_elems=blk, fused_limit=fl, interpret=True,
    )
    rk, ri = _reference(keys, ids)
    assert bool(jnp.all(mk == rk))
    assert bool(jnp.all(mi == ri))


def test_duplicate_keys_tiebreak_by_id():
    """Equal keys across rows must still order by id (cells before queries)."""
    rng = np.random.RandomState(7)
    keys, ids = _sorted_rows(rng, 8, 512, key_max=37)  # heavy duplication
    mk, mi = merge_rows_pallas(jnp.asarray(keys), jnp.asarray(ids),
                               block_elems=512, fused_limit=2048,
                               interpret=True)
    rk, ri = _reference(keys, ids)
    assert bool(jnp.all(mk == rk))
    assert bool(jnp.all(mi == ri))


def test_sentinel_tail():
    """Rows ending in sentinel runs (the lattice's padded-slot pattern)."""
    rng = np.random.RandomState(11)
    keys, ids = _sorted_rows(rng, 15, 1024)
    keys[:, 700:] = np.uint32(0xFFFFFFFF)  # sorted: sentinel tail
    for r in range(15):  # re-establish (key, id) lex order in the tail
        o = np.lexsort((ids[r], keys[r]))
        keys[r], ids[r] = keys[r][o], ids[r][o]
    mk, mi = merge_rows_pallas(jnp.asarray(keys), jnp.asarray(ids),
                               block_elems=1024, fused_limit=4096,
                               interpret=True)
    rk, ri = _reference(keys, ids)
    assert bool(jnp.all(mk == rk))
    assert bool(jnp.all(mi == ri))


def test_lattice_backends_identical():
    """build_lattice_pyramid is bit-identical across merge backends,
    including under vmap (how the model invokes it)."""
    rng = np.random.RandomState(0)
    pcs = jnp.asarray(rng.uniform(-40, 40, size=(2, 3, 1500)).astype(np.float32))
    valid = jnp.asarray(rng.rand(2, 1500) > 0.1)
    scale_map = [[1.0, 1], [0.5, 1]]
    caps = [3072, 1024]

    def build(pc, v):
        return lattice.build_lattice_pyramid(pc, scale_map, caps, valid=v)

    try:
        lattice.set_merge_backend("sort")
        ref = jax.vmap(build)(pcs, valid)
        lattice.set_merge_backend("pallas_interpret")
        out = jax.vmap(build)(pcs, valid)
    finally:
        lattice.set_merge_backend(None)
    for a, b in zip(ref, out):
        for f in a._fields:
            assert bool(jnp.all(getattr(a, f) == getattr(b, f))), f
