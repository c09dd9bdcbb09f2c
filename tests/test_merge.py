"""Bitonic multi-merge vs lax.sort ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.ops.merge import ID_PAD, KEY_PAD, merge_sorted_multi


@pytest.mark.parametrize("k,l", [(2, 8), (3, 16), (15, 64), (16, 96), (5, 100)])
def test_merge_matches_sort(rng, k, l):
    rows_k = np.sort(
        rng.randint(0, 1 << 20, (k, l)).astype(np.uint32), axis=1
    )
    rows_i = rng.randint(0, 1 << 20, (k, l)).astype(np.int32)
    mk, mi = merge_sorted_multi(jnp.asarray(rows_k), jnp.asarray(rows_i))
    mk, mi = np.asarray(mk), np.asarray(mi)

    ref_k, ref_i = jax.lax.sort(
        (jnp.asarray(rows_k.reshape(-1)), jnp.asarray(rows_i.reshape(-1))),
        num_keys=2,
    )
    n = k * l
    # merged stream: real elements first (padding keys are the max sentinel
    # and sort to the tail among equal-key real entries... verify by mask)
    real = mi != int(ID_PAD)
    np.testing.assert_array_equal(mk[real], np.asarray(ref_k))
    np.testing.assert_array_equal(mi[real], np.asarray(ref_i))


def test_merge_tie_break(rng):
    """Equal keys order by id ascending (cells-before-queries invariant)."""
    a = np.array([[5, 5, 9, 9]], np.uint32)
    b = np.array([[5, 9, 9, 9]], np.uint32)
    ia = np.array([[0, 1, 2, 3]], np.int32)
    ib = np.array([[10, 11, 12, 13]], np.int32)
    mk, mi = merge_sorted_multi(
        jnp.asarray(np.concatenate([a, b])),
        jnp.asarray(np.concatenate([ia, ib])),
    )
    mk, mi = np.asarray(mk), np.asarray(mi)
    np.testing.assert_array_equal(mk, [5, 5, 5, 9, 9, 9, 9, 9])
    np.testing.assert_array_equal(mi, [0, 1, 10, 2, 3, 11, 12, 13])
