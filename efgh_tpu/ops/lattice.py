"""Permutohedral bilateral-convolution lattice, built on-device.

The reference builds its lattice on the CPU inside every forward pass with a
khash int64 hash table driven by numba-JIT loops (reference
nets/transforms.py:126-183, nets/generate_data.py:117-193, lib/khash.h).
That design forces a device->host->device round trip per step.

TPU-native redesign — built around what the hardware is actually good at
(sorts, scans, dense math) and avoiding what it is terrible at (random
gather; a 2M-element gather measures ~90 MB/s on v5e):

  * each simplex-vertex key packs into ONE uint32: 3 coords x 10 bits + a
    2-bit sum class (the 4th permutohedral coordinate is determined by the
    coordinate sum, which lattice/blur offsets never change);
  * deduplication = one `lax.sort` + neighbor-compare + cumsum;
  * the blur neighbor table = a second sort that MERGES cell keys with all
    offset-shifted cell keys, then a forward-fill associative scan recovers
    each query's matching cell — zero random gathers (offset shifts are
    order-preserving, so +delta keys merge monotonically);
  * barycentric weights and rank inversion use one-hot contractions over the
    tiny d1 axis instead of scatters;
  * dynamic cell counts pad to a static per-scale capacity with a validity
    mask; invalid points are teleported far away (but inside the packing
    range) so their phantom cells can never neighbor real cells.

Cell ordering is sorted-key order (vs. the reference's hash insertion
order) — a permutation that is provably irrelevant: features are consumed
either per-point (via lattice_offset) or through a permutation-invariant
max-pool (reference nets/enet.py:154).
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Packing: 10-bit coordinate fields biased by _BIAS, valid range [0, _COORD_MAX].
# With the production +-50 m crop and scale <= 1 the elevated coordinates stay
# within ~+-300 (see elevate_matrix) — comfortably inside the +-512 window.
# Out-of-range coordinates (teleported invalid points, rare outliers) clamp to
# the _COORD_MAX boundary and collapse into boundary cells.
_BIAS = 512
_COORD_MAX = 1000
_SENTINEL = jnp.uint32(0xFFFFFFFF)
_FAR = 140.0  # invalid-point teleport (inside packing range, > any real cell)

# neighbor-merge backend: None = auto (Pallas kernel on TPU, lax.sort
# elsewhere); "sort" / "pallas" / "pallas_interpret" force a path
_MERGE_BACKEND: Optional[str] = None


def set_merge_backend(mode: Optional[str]) -> None:
    """Select the neighbor-table merge backend (None = auto)."""
    global _MERGE_BACKEND
    assert mode in (None, "sort", "pallas", "pallas_interpret"), mode
    _MERGE_BACKEND = mode


_AUTO_RESOLVED: Optional[str] = None


def _merge_backend() -> str:
    if _MERGE_BACKEND is not None:
        return _MERGE_BACKEND
    # auto: run the once-per-host Pallas self-test (merge_probe.py) — some
    # TPU transports mis-execute Pallas executables on repeated runs
    # (crashes or stale results — CLAUDE.md); healthy hosts get the 2.57x
    # kernel, broken ones degrade to lax.sort.  Resolved lazily so pure-CPU
    # use (tests, dryrun) never pays for it; build_model() resolves it
    # eagerly before any tracing.
    global _AUTO_RESOLVED
    if _AUTO_RESOLVED is None:
        from efgh_tpu.ops.merge_probe import resolve_auto_backend

        _AUTO_RESOLVED = resolve_auto_backend()
    return _AUTO_RESOLVED


class LatticeScale(NamedTuple):
    """Static-shape lattice data for one scale.

    Attributes:
      barycentric: (d1, P) float32 — barycentric splat weights (0 for invalid
        points).
      el_minus_gr: (d1, P) float32 — elevated-minus-greedy remainder features.
      lattice_offset: (d1, P) int32 — cell index of each point's d1 simplex
        vertices, in [0, capacity).
      blur_neighbors: (F, H) int32 — cell index of each of the F lattice
        neighbors of each cell; -1 where absent (matches reference semantics,
        reference nets/transforms.py:168-180).
      num_cells: () int32 — number of real (unique) cells, <= capacity.
      cell_valid: (H,) bool — slot holds a real cell reachable from valid
        points.
      next_points: (d0, H) float32 — coarsened point positions for the next
        scale (lattice cells projected back to d0 space, reference
        nets/generate_data.py:175-179); FAR for invalid slots.
    """

    barycentric: jnp.ndarray
    el_minus_gr: jnp.ndarray
    lattice_offset: jnp.ndarray
    blur_neighbors: jnp.ndarray
    num_cells: jnp.ndarray
    cell_valid: jnp.ndarray
    next_points: jnp.ndarray


@functools.lru_cache(maxsize=None)
def _elevate_matrix_np(d0: int) -> np.ndarray:
    """The (d0+1, d0) permutohedral embedding matrix E (maps R^d0 into the
    hyperplane sum(x)=0 of R^{d0+1}); reference nets/generate_data.py:15-20."""
    d1 = d0 + 1
    left = np.triu(np.ones((d1, d0), np.float64))
    left[1:, :] += np.diag(np.arange(-1, -d0 - 1, -1, dtype=np.float64))
    right = np.diag(1.0 / np.sqrt(np.arange(1, d0 + 1, dtype=np.float64)
                                  * np.arange(2, d0 + 2, dtype=np.float64)))
    return (left @ right).astype(np.float32)


def elevate_matrix(d0: int) -> jnp.ndarray:
    return jnp.asarray(_elevate_matrix_np(d0))


def expected_std(d0: int) -> float:
    return (d0 + 1) * math.sqrt(2.0 / 3.0)


@functools.lru_cache(maxsize=None)
def _canonical_np(d0: int) -> np.ndarray:
    """Canonical simplex of the permutohedral lattice (d1, d1); reference
    nets/generate_data.py:26-35."""
    d1 = d0 + 1
    canonical = np.tile(np.arange(d1, dtype=np.int32)[None, :], (d1, 1))
    for i in range(1, d1):
        canonical[-i:, i] = i - d1
    return canonical


@functools.lru_cache(maxsize=None)
def filter_offsets(radius: int, d0: int) -> np.ndarray:
    """Neighbor key offsets of the blur filter, (F, d1) int32.

    Enumerates i in [0..radius]^{d1} minus the all-positive corner, offset =
    sum_d i_d * (d1*e_d - 1), in lexicographic order — the same set and order
    produced by the reference's recursive Traverse.walk_cuboid (reference
    nets/transforms.py:104-122).  All offsets are zero-sum (they stay on the
    lattice hyperplane), which the uint32 packing relies on.
    """
    d1 = d0 + 1
    offs = []
    for idx in itertools.product(range(radius + 1), repeat=d1):
        if min(idx) > 0:
            continue  # the reference's has_zero constraint
        off = -np.sum(idx) * np.ones(d1, np.int64)
        for d, i in enumerate(idx):
            off[d] += i * d1
        offs.append(off)
    out = np.stack(offs).astype(np.int32)
    assert out.shape[0] == (radius + 1) ** d1 - radius ** d1
    assert np.all(out.sum(axis=1) == 0)
    return out


def filter_size(radius: int, d0: int) -> int:
    return (radius + 1) ** (d0 + 1) - radius ** (d0 + 1)


def get_keys_and_barycentric(
    pc: jnp.ndarray, d0: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Enclosing-simplex keys and barycentric weights for each point.

    Scatter-free port of reference nets/generate_data.py:56-112: the rank is
    computed by pairwise comparison counting (stable, descending) and the
    barycentric rows by one-hot contraction over the tiny d1 axis — TPU
    scatters cost ~10 ms at this size, the one-hot math is free.

    Args:
      pc: (d0, N) scaled points.
    Returns:
      keys: (d1, N, d1) int32 lattice coordinates of the d1 simplex vertices.
      barycentric: (d1, N) float32.
      el_minus_gr: (d1, N) float32.
    """
    d1 = d0 + 1
    n = pc.shape[1]

    elevated = (elevate_matrix(d0) @ pc.astype(jnp.float32)) * expected_std(d0)
    greedy = jnp.round(elevated / d1) * d1
    el_minus_gr = elevated - greedy

    # stable descending rank via comparison counting:
    # rank[v] = #{u : el[u] > el[v]} + #{u < v : el[u] == el[v]}
    el_u = el_minus_gr[:, None, :]  # (u, 1, N)
    el_v = el_minus_gr[None, :, :]  # (1, v, N)
    gt = (el_u > el_v).astype(jnp.int32).sum(0)
    lower = jnp.tril(jnp.ones((d1, d1), jnp.int32), k=-1)  # u < v
    eq_prior = jnp.einsum("uvn,uv->vn", (el_u == el_v).astype(jnp.int32), lower)
    rank = gt + eq_prior  # (d1, N)

    remainder_sum = jnp.sum(greedy, axis=0, keepdims=True) / d1  # (1, N)
    rank_f = rank.astype(jnp.float32)
    cond_mask = (
        ((rank_f >= d1 - remainder_sum) & (remainder_sum > 0))
        | ((rank_f < -remainder_sum) & (remainder_sum < 0))
    ).astype(jnp.float32)
    sign_mask = -1.0 * (remainder_sum > 0) + 1.0 * (remainder_sum < 0)

    greedy = greedy + d1 * sign_mask * cond_mask
    rank = rank + (d1 * sign_mask * cond_mask).astype(jnp.int32)
    rank = rank + remainder_sum.astype(jnp.int32)

    el_minus_gr = elevated - greedy
    greedy_i = greedy.astype(jnp.int32)

    # barycentric rows by one-hot contraction (reference
    # nets/generate_data.py:99-104):
    #   bary[r] += el[v] where rank[v] == d0 - r
    #   bary[r] -= el[v] where rank[v] == d1 - r
    rows = jnp.arange(d1 + 1, dtype=jnp.int32)
    plus = jnp.einsum(
        "vn,rvn->rn", el_minus_gr,
        (rank[None, :, :] == (d0 - rows)[:, None, None]).astype(jnp.float32),
    )
    minus = jnp.einsum(
        "vn,rvn->rn", el_minus_gr,
        (rank[None, :, :] == (d1 - rows)[:, None, None]).astype(jnp.float32),
    )
    bary = (plus - minus) / d1
    bary = bary.at[0, :].add(1.0 + bary[d1, :])
    bary = bary[:-1, :]

    # The key of simplex vertex ("remainder") r of point n is the COORDINATE
    # vector keys[r, n, :] with keys[r, n, v] = greedy[v, n] +
    # canonical[rank[v, n], r]  (reference indexes pc1_keys_np[:, point,
    # remainder], reference nets/transforms.py:155 — coordinate axis first).
    # One-hot contraction instead of a table gather:
    canonical = jnp.asarray(_canonical_np(d0))  # (d1, d1): [rank_row, remainder]
    rank_oh = (
        rank[:, :, None] == jnp.arange(d1, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.int32)  # (v, N, rank_row)
    keys_vnr = greedy_i[:, :, None] + jnp.einsum(
        "vnj,jr->vnr", rank_oh, canonical
    )  # (coord v, N, remainder r)
    keys = jnp.transpose(keys_vnr, (2, 1, 0))  # (remainder, N, coord)
    return keys, bary, el_minus_gr


def _pack_keys(keys: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) int32 lattice coords -> (...,) uint32 packed key.

    Layout: k0[10] | k1[10] | k2[10] | sum_class[2].  Lattice keys sum to 0
    (the elevation hyperplane; canonical columns and the fixed greedy both
    sum to zero), so k3 is recoverable from k0..k2 and the class bits are a
    constant guard; blur offsets are zero-sum so +delta stays monotonic in
    packed-key order.
    """
    s_idx = keys.sum(-1).astype(jnp.uint32) & 0x3  # 0 for on-lattice keys
    k = jnp.clip(keys[..., :3] + _BIAS, 0, _COORD_MAX).astype(jnp.uint32)
    return (k[..., 0] << 22) | (k[..., 1] << 12) | (k[..., 2] << 2) | s_idx


def _unpack_keys(packed: jnp.ndarray) -> jnp.ndarray:
    """(...,) uint32 -> (..., 4) int32 lattice coords (sum-zero assumption)."""
    k0 = ((packed >> 22) & 0x3FF).astype(jnp.int32) - _BIAS
    k1 = ((packed >> 12) & 0x3FF).astype(jnp.int32) - _BIAS
    k2 = ((packed >> 2) & 0x3FF).astype(jnp.int32) - _BIAS
    k3 = -(k0 + k1 + k2)
    return jnp.stack([k0, k1, k2, k3], axis=-1)


def _pack_offset_deltas(offs: np.ndarray) -> np.ndarray:
    """Static (F,) int64 packed-key deltas of the (zero-sum) blur offsets."""
    o = offs.astype(np.int64)
    return (o[:, 0] << 22) + (o[:, 1] << 12) + (o[:, 2] << 2)


def build_lattice_scale(
    pc: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
    radius: int,
    scale: float,
    build_next: bool = True,
) -> LatticeScale:
    """Build one lattice scale with static shapes (see module docstring).

    Args:
      pc: (d0, P) points in the *unscaled* metric of this stage.
      valid: (P,) bool point-validity mask.
      capacity: static max unique cells H for this scale.
      radius: blur filter radius (-1 = no blur table).
      scale: coordinate scale applied before elevation (reference
        nets/generate_data.py:130).
      build_next: compute coarsened next_points.
    """
    d0 = pc.shape[0]
    d1 = d0 + 1
    p = pc.shape[1]

    # Teleport invalid points far away (but inside the packing range) so
    # their cells are isolated from real geometry.
    pts = jnp.where(valid[None, :], pc, _FAR / max(scale, 1e-6))
    keys, bary, el_minus_gr = get_keys_and_barycentric(pts * scale, d0)
    bary = jnp.where(valid[None, :], bary, 0.0)

    # ---- dedup: one sort over packed keys ----
    u = _pack_keys(keys).reshape(d1 * p)
    m = d1 * p
    perm = jnp.arange(m, dtype=jnp.int32)
    s_key, s_perm = jax.lax.sort((u, perm), num_keys=1)
    is_new = jnp.concatenate([jnp.ones((1,), bool), s_key[1:] != s_key[:-1]])
    rank_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # (M,)
    num_cells = rank_sorted[-1] + 1

    rank_c = jnp.minimum(rank_sorted, capacity - 1)
    offsets_flat = jnp.zeros((m,), jnp.int32).at[s_perm].set(rank_c)
    lattice_offset = offsets_flat.reshape(d1, p)
    # capacity overflow: overflowing cells alias the last slot; their splat
    # weights are dropped so they contribute nothing
    overflow_flat = jnp.zeros((m,), bool).at[s_perm].set(rank_sorted >= capacity)
    bary = jnp.where(overflow_flat.reshape(d1, p), 0.0, bary)

    # unique cell keys in rank (=sorted) order via a unique-index scatter
    uidx = jnp.where(is_new & (rank_sorted < capacity), rank_sorted, capacity)
    cell_key = jnp.full((capacity + 1,), _SENTINEL).at[uidx].set(
        s_key, mode="drop"
    )[:capacity]
    slot_ids = jnp.arange(capacity, dtype=jnp.int32)
    in_use = slot_ids < num_cells

    # which cells are reachable from *valid* points (phantom-cell mask)
    touched = jnp.zeros((capacity,), jnp.float32).at[
        lattice_offset.reshape(-1)
    ].add(
        jnp.broadcast_to(valid[None, :], (d1, p)).reshape(-1).astype(jnp.float32),
        mode="drop",
    )
    cell_valid = in_use & (touched > 0)

    # ---- blur neighbor table: sort-merge, no random gathers ----
    if radius >= 0:
        offs = filter_offsets(radius, d0)
        deltas = _pack_offset_deltas(offs)  # static int64 (F,)
        f = offs.shape[0]
        zero_row = int(np.nonzero(deltas == 0)[0][0])  # identity offset
        nz = [i for i in range(f) if i != zero_row]
        fq = len(nz)
        # queries: every cell key shifted by every nonzero offset delta (exact
        # uint32 arithmetic: fields have >= 200 units of margin, offsets <= d1).
        # Shifted sentinels are re-pinned to the sentinel so each query row
        # stays sorted ascending (required by the Pallas merge; in the sort
        # path it only renames junk queries for slots masked out below).
        q = jnp.where(
            in_use[None, :],
            cell_key[None, :] + jnp.asarray(
                deltas[nz].astype(np.int64) % (1 << 32), np.uint32
            )[:, None],
            _SENTINEL,
        )  # (Fq, H)
        q_ids = capacity + jnp.arange(fq * capacity, dtype=jnp.int32)
        backend = _merge_backend()
        if backend.startswith("pallas"):
            # rows are individually sorted: one bitonic multi-merge on VMEM
            # tiles instead of a from-scratch lax.sort (docs/PERFORMANCE.md)
            from efgh_tpu.ops.pallas_merge import merge_rows_pallas

            rows_k = jnp.concatenate([cell_key[None, :], q], axis=0)
            rows_i = jnp.concatenate(
                [slot_ids[None, :], q_ids.reshape(fq, capacity)], axis=0
            )
            mk, mi = merge_rows_pallas(
                rows_k, rows_i, interpret=backend == "pallas_interpret"
            )
            # the merged stream equals lax.sort's on the first (1+Fq)*H
            # entries: padding carries the maximal (key, id) pair and every
            # real entry precedes the sentinel tail
            sk = mk[: (1 + fq) * capacity]
            sid = mi[: (1 + fq) * capacity]
        else:
            all_key = jnp.concatenate([cell_key, q.reshape(fq * capacity)])
            all_id = jnp.concatenate([slot_ids, q_ids])
            # cells first on ties
            sk, sid = jax.lax.sort((all_key, all_id), num_keys=2)
        is_cell = sid < capacity

        # Match queries to cells WITHOUT the generic 2-carry forward-fill
        # scan (its log-depth slice/concat stages were the profile's
        # pad+slice block, ~20 ms/pair-2 — docs/PERFORMANCE.md):  equal
        # keys are contiguous in the sorted stream and the cell (ids <
        # capacity) sorts FIRST within its key group, so
        #   * a query matches iff its own key group STARTS with a cell —
        #     one cummax over a group-start marker that encodes
        #     (position << 1) | is_cell recovers that bit for every
        #     element; and
        #   * the matched cell's id is simply (#cells so far) - 1, because
        #     cell ids equal their key rank — one cumsum.
        n_stream = sk.shape[0]
        pos = jnp.arange(n_stream, dtype=jnp.int32)
        group_start = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        enc = jnp.where(group_start,
                        (pos << 1) | is_cell.astype(jnp.int32),
                        -1)
        start_enc = jax.lax.cummax(enc)
        group_has_cell = (start_enc & 1) == 1
        cell_rank = jnp.cumsum(is_cell.astype(jnp.int32)) - 1
        found = ((~is_cell) & group_has_cell & (cell_rank >= 0)
                 & (cell_rank < num_cells))
        neighbor = jnp.where(found, cell_rank, -1)
        out_idx = jnp.where(~is_cell, sid - capacity, fq * capacity)
        blur_flat = jnp.full((fq * capacity,), -1, jnp.int32).at[out_idx].set(
            neighbor, mode="drop"
        )
        nb_rows = list(blur_flat.reshape(fq, capacity))
        identity_row = jnp.where(in_use, slot_ids, -1)
        nb_rows.insert(zero_row, identity_row)
        blur_neighbors = jnp.stack(nb_rows)
        blur_neighbors = jnp.where(in_use[None, :], blur_neighbors, -1)
    else:
        blur_neighbors = jnp.full((1, capacity), -1, jnp.int32)

    # ---- coarsened next-scale points (coords unpacked, no gather) ----
    if build_next:
        coords = _unpack_keys(cell_key).astype(jnp.float32)  # (H, d1)
        denom = expected_std(d0) * scale
        next_pts = elevate_matrix(d0).T @ (coords.T / denom)  # (d0, H)
        next_pts = jnp.where(cell_valid[None, :], next_pts, _FAR * 2.0)
    else:
        next_pts = jnp.zeros((d0, capacity), jnp.float32)

    return LatticeScale(
        barycentric=bary,
        el_minus_gr=el_minus_gr,
        lattice_offset=lattice_offset,
        blur_neighbors=blur_neighbors,
        num_cells=jnp.minimum(num_cells, capacity),
        cell_valid=cell_valid,
        next_points=next_pts,
    )


def build_lattice_pyramid(
    pc: jnp.ndarray,
    scale_map: Sequence[Sequence[float]],
    capacities: Sequence[int],
    valid: Optional[jnp.ndarray] = None,
) -> List[LatticeScale]:
    """Build the multi-scale lattice pyramid for one cloud.

    Each scale's input points are the previous scale's lattice cells
    (coarsening chain, reference nets/generate_data.py:153-179).

    Args:
      pc: (3, N) point cloud.
      scale_map: [[scale, radius], ...].
      capacities: static per-scale cell capacities.
      valid: optional (N,) mask for the input points.
    """
    pts = pc
    v = valid if valid is not None else jnp.ones((pc.shape[1],), bool)
    out: List[LatticeScale] = []
    for idx, ((scale, radius), cap) in enumerate(zip(scale_map, capacities)):
        last = idx == len(scale_map) - 1
        lat = build_lattice_scale(
            pts, v, int(cap), int(radius), float(scale), build_next=not last
        )
        out.append(lat)
        pts = lat.next_points
        v = lat.cell_valid
    return out


# ---------------------------------------------------------------------------
# BCL stage primitives (SPLAT / neighbor-gather for BLUR / SLICE)
# ---------------------------------------------------------------------------


def bcl_splat(
    features: jnp.ndarray,
    barycentric: jnp.ndarray,
    lattice_offset: jnp.ndarray,
    capacity: int,
    normalize: bool = True,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """SPLAT: barycentric-weighted scatter-add of point features onto cells.

    Returns (capacity + 1, C): row 0 is the all-zero row gathered by missing
    (-1) blur neighbors, mirroring the reference's +1 shift (reference
    nets/bilateralNN.py:183-211).  The XLA transpose of scatter-add is gather,
    which is exactly the reference's hand-written SparseSum backward
    (reference nets/bilateralNN.py:29-37) — no custom VJP needed.

    Args:
      features: (C, P).
      barycentric: (d1, P) weights (0 for invalid points).
      lattice_offset: (d1, P) cell indices in [0, capacity).
      normalize: density normalization 1/(hit-count + eps).
    """
    c, p = features.shape
    d1 = barycentric.shape[0]
    w = barycentric[:, :, None]  # (d1, P, 1)
    vals = (w * features.T[None, :, :]).reshape(d1 * p, c)
    idx = (lattice_offset + 1).reshape(d1 * p)
    splat = jnp.zeros((capacity + 1, c), features.dtype).at[idx].add(vals)
    if normalize:
        cnt = jnp.zeros((capacity + 1,), features.dtype).at[idx].add(
            barycentric.reshape(d1 * p)
        )
        splat = splat * (1.0 / (cnt + eps))[:, None]
    return splat


# BCL blur-gather backend: "xla" = plain advanced indexing (random HBM row
# reads, ~90 MB/s on TPU); "pallas" = the VMEM-chunk streaming kernel
# (ops/pallas_bcl.py, bit-identical output).  Like the merge backend, the
# default stays "xla" until the kernel is validated on the target host
# (benchmarks/bcl_gather_bench.py).
_BCL_GATHER_BACKEND = "xla"


def set_bcl_gather_backend(mode: str) -> None:
    assert mode in ("xla", "pallas", "pallas_interpret"), mode
    global _BCL_GATHER_BACKEND
    _BCL_GATHER_BACKEND = mode


def bcl_gather_neighbors(
    splat: jnp.ndarray, blur_neighbors: jnp.ndarray
) -> jnp.ndarray:
    """BLUR gather: (H+1, C) cells x (F, H) neighbor ids -> (H, F, C).

    Missing neighbors (-1) gather the zero row.  The caller contracts the
    (F, C) axes with an MXU matmul (the reference's Conv2d over the neighbor
    axis, reference nets/bilateralNN.py:233-246).
    """
    if _BCL_GATHER_BACKEND != "xla":
        from efgh_tpu.ops.pallas_bcl import bcl_gather_neighbors_pallas

        return bcl_gather_neighbors_pallas(
            splat, blur_neighbors,
            interpret=_BCL_GATHER_BACKEND == "pallas_interpret")
    return splat[blur_neighbors.T + 1]  # (H, F, C)


def bcl_slice(
    cell_feats: jnp.ndarray,
    out_barycentric: jnp.ndarray,
    out_lattice_offset: jnp.ndarray,
) -> jnp.ndarray:
    """SLICE: gather cell features back to points with barycentric weights.

    Args:
      cell_feats: (H, C).
      out_barycentric: (d1, P).
      out_lattice_offset: (d1, P).
    Returns:
      (C, P).  (reference nets/bilateralNN.py:248-262)
    """
    gathered = cell_feats[out_lattice_offset]  # (d1, P, C)
    return jnp.einsum("dp,dpc->cp", out_barycentric, gathered)
