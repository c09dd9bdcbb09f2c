"""Pallas TPU kernel: bitonic multi-way merge of pre-sorted (key, id) rows.

The lattice neighbor-table build (efgh_tpu/ops/lattice.py) merges the sorted
cell-key array with 14 offset-shifted copies of itself — 15 already-sorted
sequences.  `lax.sort` re-sorts from scratch: O(n log^2 n) compare-exchange
stages (~33 ms at the flagship scale).  A bitonic *merge* needs only the
last log2(k) phases of the network — O(n log n log k) — but the pure-JAX
form (efgh_tpu/ops/merge.py) loses 4x because every stage round-trips HBM as
its own fusion.

This kernel runs the merge network on VMEM-resident tiles:

  * rows are pre-sorted in ALTERNATING directions (odd rows flipped once in
    XLA, fused with the padding), so every phase is a plain bitonic
    compare-exchange network with a per-window direction bit — no data
    reversal inside any kernel;
  * compare-exchange at distance d is two circular rolls + a select:
    sublane rolls for d >= 128, lane rolls for d < 128 — never a gather;
  * stages with distance >= the tile size stream (lo, hi) plane pairs
    through one grid program each via a (windows, 2, d/128, 128) view
    (one bandwidth-bound HBM pass per stage);
  * all stages with distance < tile run fused in ONE pass per phase;
  * small problems (whole array <= `fused_limit` elements) run the entire
    network in a single kernel launch.

Keys are compared as order-preserving int32 (uint32 ^ 0x80000000) so only
signed compares reach Mosaic.  The output is byte-identical to
`lax.sort((keys, ids), num_keys=2)` over the padded input (ids are unique
for real entries; padding carries the maximal (KEY_PAD, ID_PAD) pair), which
the regression tests assert exactly.

Replaces the role of the reference's CPU hash probe loop (reference
nets/transforms.py:126-183) on the TPU fast path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efgh_tpu.ops.merge import ID_PAD, KEY_PAD, _next_pow2

_LANES = 128
_SIGN = jnp.uint32(0x80000000)

# default tile: 64K elements/plane -> key+id in+out = 1 MB VMEM per program
_BLOCK_ELEMS = 1 << 16
# whole-array single-launch threshold: 128K elements.  The fused kernel's
# unrolled stage temporaries cost ~10x the array in scoped VMEM stack
# (measured: 2^19 elements wants 53 MB vs the 16 MB limit), so this stays
# well under 2^18.
_FUSED_LIMIT = 1 << 17


def _lex_le(k, i, pk, pi):
    """(k, i) <= (pk, pi) lexicographic, int32."""
    return (k < pk) | ((k == pk) & (i <= pi))


def _roll_to(x, delta: int, axis: int):
    """out[j] = x[j + delta] along axis (circular; delta may be negative)."""
    size = x.shape[axis]
    return pltpu.roll(x, shift=(-delta) % size, axis=axis)


def _stage(k, i, idx, d: int, dir_up):
    """One compare-exchange stage at element distance d on (R, 128) tiles.

    idx: (R, 128) int32 flat element index (row*128 + lane).
    dir_up: bool scalar or (R, 128) mask — the ascending-window bit.
    Groups of 2d elements are aligned, so the circular rolls never mix
    values across a compare window for the lanes/rows that consume them.
    """
    if d >= _LANES:
        axis, delta = 0, d // _LANES
    else:
        axis, delta = 1, d
    up_k, dn_k = _roll_to(k, delta, axis), _roll_to(k, -delta, axis)
    up_i, dn_i = _roll_to(i, delta, axis), _roll_to(i, -delta, axis)
    is_lo = (idx & d) == 0
    pk = jnp.where(is_lo, up_k, dn_k)
    pi = jnp.where(is_lo, up_i, dn_i)
    # keep self iff (self <= partner) matches wanting the min — expressed as
    # boolean equalities (Mosaic rejects i1-valued selects)
    want_min = is_lo == dir_up
    keep = _lex_le(k, i, pk, pi) == want_min
    return jnp.where(keep, k, pk), jnp.where(keep, i, pi)


def _flat_idx(rows: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    return r * _LANES + c


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def _global_group_kernel(k_ref, i_ref, ok_ref, oi_ref,
                         *, s: int, d: int, m: int):
    """Stages d, d/2, ..., d/2^(m-1) fused in one pass (all >= tile size).

    The 2d-window is viewed as P = 2^m planes; the stage at distance d/2^j
    compare-exchanges plane p with plane p ^ (P >> (j+1)) — plain plane
    pairings, no rolls.  Block = (1, P, rows_chunk, 128): one chunk of every
    plane of one window.
    """
    w = pl.program_id(0)  # 2d-window index
    dir_up = ((w * (2 * d)) & s) == 0
    p_count = 1 << m
    ks = [k_ref[0, p] for p in range(p_count)]
    is_ = [i_ref[0, p] for p in range(p_count)]
    for j in range(m):
        x = p_count >> (j + 1)
        for p in range(p_count):
            if p & x:
                continue
            q = p | x
            lo_le = _lex_le(ks[p], is_[p], ks[q], is_[q])
            keep_lo = lo_le == dir_up  # ascending: lo keeps min
            ks[p], ks[q] = (jnp.where(keep_lo, ks[p], ks[q]),
                            jnp.where(keep_lo, ks[q], ks[p]))
            is_[p], is_[q] = (jnp.where(keep_lo, is_[p], is_[q]),
                              jnp.where(keep_lo, is_[q], is_[p]))
    for p in range(p_count):
        ok_ref[0, p] = ks[p]
        oi_ref[0, p] = is_[p]


def _local_phase_kernel(k_ref, i_ref, ok_ref, oi_ref,
                        *, s: int, d_start: int, blk: int):
    """All stages d = d_start .. 1 of phase s, fused on one VMEM tile."""
    b = pl.program_id(0)
    dir_up = ((b * blk) & s) == 0  # the whole tile shares the s-window bit
    k, i = k_ref[...], i_ref[...]
    idx = _flat_idx(blk // _LANES)
    d = d_start
    while d >= 1:
        k, i = _stage(k, i, idx, d, dir_up)
        d //= 2
    ok_ref[...] = k
    oi_ref[...] = i


def _fused_kernel(k_ref, i_ref, ok_ref, oi_ref, *, lp: int, n: int):
    """The whole merge network in one launch (n elements, VMEM-resident)."""
    k, i = k_ref[...], i_ref[...]
    idx = _flat_idx(n // _LANES)
    s = 2 * lp
    while s <= n:
        dir_up = (idx & s) == 0  # identically True at the final phase s == n
        d = s // 2
        while d >= 1:
            k, i = _stage(k, i, idx, d, dir_up)
            d //= 2
        s *= 2
    ok_ref[...] = k
    oi_ref[...] = i


# --------------------------------------------------------------------------
# drivers
# --------------------------------------------------------------------------


def _call_global(k2d, i2d, s: int, d: int, m: int, blk: int, interpret: bool):
    n = k2d.size
    p_count = 1 << m
    plane = (2 * d) // p_count  # = d / 2^(m-1), >= blk by construction
    # cap per-program VMEM: P planes x chunk x 4 B x 2 arrays, in + out
    chunk = min(blk, plane, (1 << 17) // p_count)
    view = (n // (2 * d), p_count, plane // _LANES, _LANES)
    kv, iv = k2d.reshape(view), i2d.reshape(view)
    spec = pl.BlockSpec((1, p_count, chunk // _LANES, _LANES),
                        index_map=lambda w, j: (w, 0, j, 0),
                        memory_space=pltpu.VMEM)
    ok, oi = pl.pallas_call(
        functools.partial(_global_group_kernel, s=s, d=d, m=m),
        grid=(n // (2 * d), plane // chunk),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(view, jnp.int32)] * 2,
        interpret=interpret,
    )(kv, iv)
    shape2d = k2d.shape
    return ok.reshape(shape2d), oi.reshape(shape2d)


def _call_local(k2d, i2d, s: int, d_start: int, blk: int, interpret: bool):
    n = k2d.size
    rows_blk = blk // _LANES
    spec = pl.BlockSpec((rows_blk, _LANES), index_map=lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_local_phase_kernel, s=s, d_start=d_start, blk=blk),
        grid=(n // blk,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(k2d.shape, jnp.int32)] * 2,
        interpret=interpret,
    )(k2d, i2d)


def _call_fused(k2d, i2d, lp: int, interpret: bool):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_kernel, lp=lp, n=k2d.size),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(k2d.shape, jnp.int32)] * 2,
        interpret=interpret,
    )(k2d, i2d)


def merge_rows_pallas(
    keys: jnp.ndarray,
    ids: jnp.ndarray,
    *,
    block_elems: int = _BLOCK_ELEMS,
    fused_limit: int = _FUSED_LIMIT,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge k individually (key asc, id asc)-sorted rows into one stream.

    Args:
      keys: (k, L) uint32, each row lexicographically sorted ascending by
        (key, id).
      ids: (k, L) int32 payload (unique for non-padding entries).
    Returns:
      (keys_flat, ids_flat) of length next_pow2(k) * next_pow2(L), identical
      to lax.sort((padded_keys, padded_ids), num_keys=2); padding sorts to
      the tail with (KEY_PAD, ID_PAD).
    """
    k, l = keys.shape
    lp, kp = _next_pow2(l), _next_pow2(k)
    if lp * kp < 2 * _LANES * _LANES:
        # tiny problems: a kernel is not worth the launch + tile constraints
        fk = jnp.pad(keys, ((0, kp - k), (0, lp - l)), constant_values=KEY_PAD)
        fi = jnp.pad(ids, ((0, kp - k), (0, lp - l)), constant_values=ID_PAD)
        return jax.lax.sort((fk.reshape(-1), fi.reshape(-1)), num_keys=2)

    if lp != l:
        keys = jnp.pad(keys, ((0, 0), (0, lp - l)), constant_values=KEY_PAD)
        ids = jnp.pad(ids, ((0, 0), (0, lp - l)), constant_values=ID_PAD)
    if kp != k:
        keys = jnp.pad(keys, ((0, kp - k), (0, 0)), constant_values=KEY_PAD)
        ids = jnp.pad(ids, ((0, kp - k), (0, 0)), constant_values=ID_PAD)

    # alternate directions (odd rows descending) + order-preserving signed
    # view of the uint32 keys — both fuse into the pads above
    odd = (jnp.arange(kp) % 2 == 1)[:, None]
    keys = jnp.where(odd, keys[:, ::-1], keys)
    ids = jnp.where(odd, ids[:, ::-1], ids)
    ik = jax.lax.bitcast_convert_type(keys ^ _SIGN, jnp.int32)

    n = kp * lp
    ik = ik.reshape(n // _LANES, _LANES)
    ii = ids.reshape(n // _LANES, _LANES)

    if n <= fused_limit:
        ik, ii = _call_fused(ik, ii, lp, interpret)
    else:
        blk = min(block_elems, 2 * lp, n)
        s = 2 * lp
        while s <= n:
            d = s // 2
            while d >= blk:
                # fuse up to 3 consecutive global stages into one pass
                m = min(3, (d // blk).bit_length())
                ik, ii = _call_global(ik, ii, s, d, m, blk, interpret)
                d >>= m
            ik, ii = _call_local(ik, ii, s, d, blk, interpret)
            s *= 2

    out_k = jax.lax.bitcast_convert_type(ik.reshape(n), jnp.uint32) ^ _SIGN
    return out_k, ii.reshape(n)
