"""Pallas TPU kernel: BCL blur neighbor gather through VMEM.

`bcl_gather_neighbors` (efgh_tpu/ops/lattice.py) is the #2 device-time
block after the sorts: `splat[blur_neighbors.T + 1]` issues H*F random row
reads of C*2 bytes each straight from HBM, which TPUs execute at ~90 MB/s
(37.6 ms/pair-2 across bcn1-3, docs/PERFORMANCE.md).  The reference's
equivalent is the blur-neighbor indexing inside its chunked Conv2d blur
(reference nets/bilateralNN.py:223-246).

This kernel restructures the gather so HBM only ever sees sequential
streams:

  * the (H+1, C) splat table is streamed through VMEM in row chunks of S
    (inner grid dim); chunk reads are sequential DMA at full bandwidth;
  * each grid program holds one cell tile's (T, F) neighbor indices in
    VMEM and, PER OFFSET f, gathers that offset's T indices from the
    chunk (`jnp.take` -> VPU-speed VMEM access), masked to the rows that
    live in this chunk;
  * offsets whose index range misses the chunk entirely are skipped with
    `pl.when` — cell keys are sorted and each blur offset shifts keys by a
    constant delta, so the F index columns are each (nearly) monotonic in
    the cell index and a tile's column touches ~1-2 chunks, not all of
    them.  This predication is what keeps VMEM gather traffic ~the output
    size instead of n_chunks x that;
  * the (T, F, C) output tile accumulates across the chunk grid dim; every
    index is in-window for exactly one chunk, so the accumulation (adding
    exact zeros elsewhere) reconstructs the gather BIT-exactly.

The gather runs on the table's own dtype; bf16 rows are returned as-is, so
outputs are bit-identical to the XLA `splat[blur_neighbors.T + 1]` path
(asserted by tests/test_pallas_bcl.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _select_rows(rel_f, tbl, tile: int, s: int):
    """(T,) relative indices -> (T, C) f32 selected rows via a one-hot MXU
    matmul.  Mosaic's `tpu.dynamic_gather` cannot cross vregs along the
    gather dimension (verified on this toolchain: "Not implemented:
    Multiple source vregs along gather dimension"), so the selection runs
    as (rel == iota) @ chunk instead — BIT-exact even for bf16 tables
    (0*x = 0 and 1*x = x exactly; each output row sums one nonzero term),
    and out-of-window rows (rel outside [0, S)) select nothing -> exact
    zeros, which is what the cross-chunk accumulation needs."""
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (tile, s), 1)
    onehot = (rel_f[:, None] == iota_s).astype(tbl.dtype)  # (T, S)
    return jnp.dot(onehot, tbl, preferred_element_type=jnp.float32)


def _gather_kernel(idx_ref, chunk_ref, out_ref, *, s: int, f_dim: int,
                   tile: int):
    """One (cell-tile, table-chunk) program.

    idx_ref: (T, F) int32 — +1-shifted neighbor ids of this cell tile.
    chunk_ref: (S, C) — rows [c*S, (c+1)*S) of the padded splat table.
    out_ref: (T, F, C) — accumulated across the chunk grid dim.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rel = idx_ref[...] - c * s  # (T, F)
    ok = (rel >= 0) & (rel < s)
    tbl = chunk_ref[...]  # (S, C)
    for f in range(f_dim):  # static unroll over the offset axis
        ok_f = ok[:, f]

        @pl.when(jnp.any(ok_f))
        def _(f=f):
            g = _select_rows(rel[:, f], tbl, tile, s)  # (T, C) f32
            out_ref[:, f, :] += g.astype(out_ref.dtype)


def _fused_kernel(idx_ref, chunk_ref, w_ref, out_ref, *, s: int, f_dim: int,
                  c_dim: int, tile: int):
    """Gather + first blur matmul fused: out[T, W] += sum_f
    select_f(chunk)[T, C] @ w[f*C:(f+1)*C, W], f32 accumulation.

    Fusing the contraction means the (H, F, C) gathered tensor never
    exists in HBM at all — the blur's HBM traffic drops to the table
    stream + the (H, W) result."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rel = idx_ref[...] - c * s  # (T, F)
    ok = (rel >= 0) & (rel < s)
    tbl = chunk_ref[...]  # (S, C)
    for f in range(f_dim):
        ok_f = ok[:, f]

        @pl.when(jnp.any(ok_f))
        def _(f=f):
            g = _select_rows(rel[:, f], tbl, tile, s)  # (T, C) f32
            w_f = w_ref[f * c_dim:(f + 1) * c_dim, :]  # (C, W)
            out_ref[...] += jnp.dot(g.astype(w_f.dtype), w_f,
                                    preferred_element_type=jnp.float32)


def bcl_blur_fused_pallas(
    splat: jnp.ndarray,
    blur_neighbors: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    tile: int = 512,
    chunk_rows: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused BLUR: gather + first conv contraction in one kernel.

    Numerically equivalent (f32 accumulation, per-offset partial-sum order)
    to `einsum("hfc,(fc)w->hw", splat[bn.T+1], kernel, preferred f32)` —
    the first matmul of BilateralConvFlex (models/bcl.py; reference
    nets/bilateralNN.py:233-246).  Not bit-identical: XLA's single dot
    accumulates in a different order; tests bound the drift.

    Args:
      splat: (H+1, C) cell table (row 0 = zero row).
      blur_neighbors: (F, H) int32, -1 where absent.
      kernel: (F*C, W) first blur-conv weight.
    Returns:
      (H, W) float32 (caller adds bias / activation / downcast).
    """
    rows, c_dim = splat.shape
    f_dim, h = blur_neighbors.shape
    fc, w_dim = kernel.shape
    assert fc == f_dim * c_dim, (kernel.shape, f_dim, c_dim)
    s = chunk_rows
    rows_p = _ceil_to(rows, s)
    h_p = _ceil_to(h, tile)

    table = splat
    if rows_p != rows:
        table = jnp.pad(table, ((0, rows_p - rows), (0, 0)))
    idx = blur_neighbors.T + 1
    if h_p != h:
        idx = jnp.pad(idx, ((0, h_p - h), (0, 0)))

    grid = (h_p // tile, rows_p // s)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, s=s, f_dim=f_dim, c_dim=c_dim,
                          tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, f_dim), lambda t, c: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c_dim), lambda t, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fc, w_dim), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w_dim), lambda t, c: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_p, w_dim), jnp.float32),
        interpret=interpret,
    )(idx, table, kernel)
    return out[:h]


def bcl_gather_neighbors_pallas(
    splat: jnp.ndarray,
    blur_neighbors: jnp.ndarray,
    *,
    tile: int = 512,
    chunk_rows: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bit-exact replacement for `bcl_gather_neighbors` (lattice.py).

    Args:
      splat: (H+1, C) float32/bfloat16 cell table (row 0 = zero row).
      blur_neighbors: (F, H) int32 neighbor ids, -1 where absent.
      tile: cells per grid program (T).
      chunk_rows: table rows per VMEM chunk (S); VMEM cost is
        S x 128(lane-padded) x itemsize, double-buffered.
    Returns:
      (H, F, C): splat[blur_neighbors.T + 1].
    """
    rows, c_dim = splat.shape
    f_dim, h = blur_neighbors.shape
    s = chunk_rows
    rows_p = _ceil_to(rows, s)
    h_p = _ceil_to(h, tile)

    table = splat
    if rows_p != rows:
        table = jnp.pad(table, ((0, rows_p - rows), (0, 0)))
    idx = blur_neighbors.T + 1  # (H, F); 0 = the zero row
    if h_p != h:
        idx = jnp.pad(idx, ((0, h_p - h), (0, 0)))  # pads gather row 0

    grid = (h_p // tile, rows_p // s)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, s=s, f_dim=f_dim, tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, f_dim), lambda t, c: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c_dim), lambda t, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, f_dim, c_dim), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_p, f_dim, c_dim), splat.dtype),
        interpret=interpret,
    )(idx, table)
    return out[:h]
