"""Permutohedral bilateral-convolution lattice, built on-device.

The reference builds its lattice on the CPU inside every forward pass with a
khash int64 hash table driven by numba-JIT loops (reference
nets/transforms.py:126-183, nets/generate_data.py:117-193, lib/khash.h).
That design forces a device->host->device round trip per step.

TPU-native redesign (no hash table, no dynamic shapes):
  * every point's d+1 simplex-vertex keys are packed into a (hi, lo) uint32
    pair (4 coords x 16 bits);
  * deduplication = one `lax.sort` + neighbor-compare + cumsum, giving each
    key its unique-cell rank in sorted order;
  * the blur neighbor table = vectorized binary search of offset keys in the
    sorted unique-key array;
  * dynamic cell counts are padded to a static per-scale capacity with a
    validity mask; padded/invalid points are teleported far away so their
    phantom cells can never be lattice-neighbors of real cells.

Cell ordering differs from the reference (sorted-key order vs. hash insertion
order) — a permutation that is provably irrelevant: features are consumed
either per-point (via lattice_offset gathers) or through a permutation-
invariant max-pool (reference nets/enet.py:154).
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Coordinate packing: each lattice coordinate is offset by _BIAS and must fit
# in 16 bits.  With a +-50 m crop and scale <= 1 the elevated coordinates stay
# within a few hundred (see elevate_matrix) — far inside +-32767.
_BIAS = 32768
_FAR = 1.0e6  # teleport distance for invalid points (cells never adjacent)


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
    nets/transforms.py:104-122).
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
    return out


def filter_size(radius: int, d0: int) -> int:
    return (radius + 1) ** (d0 + 1) - radius ** (d0 + 1)


def get_keys_and_barycentric(
    pc: jnp.ndarray, d0: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Enclosing-simplex keys and barycentric weights for each point.

    Vectorized port of reference nets/generate_data.py:56-112 (already
    loop-free there; runs on-device here).

    Args:
      pc: (d0, N) scaled points.
    Returns:
      keys: (d1, N, d1) int32 lattice coordinates of the d1 simplex vertices.
      barycentric: (d1, N) float32.
      el_minus_gr: (d1, N) float32.
    """
    d1 = d0 + 1
    n = pc.shape[1]
    pidx = jnp.arange(n)

    elevated = (elevate_matrix(d0) @ pc.astype(jnp.float32)) * expected_std(d0)
    greedy = jnp.round(elevated / d1) * d1
    el_minus_gr = elevated - greedy

    order = jnp.argsort(-el_minus_gr, axis=0)  # descending
    rank = jnp.zeros((d1, n), jnp.int32).at[order, pidx[None, :]].set(
        jnp.broadcast_to(jnp.arange(d1, dtype=jnp.int32)[:, None], (d1, n))
    )

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

    bary = jnp.zeros((d1 + 1, n), jnp.float32)
    bary = bary.at[d0 - rank, pidx[None, :]].add(el_minus_gr)
    bary = bary.at[d1 - rank, pidx[None, :]].add(-el_minus_gr)
    bary = bary / d1
    bary = bary.at[0, :].add(1.0 + bary[d1, :])
    bary = bary[:-1, :]

    canonical = jnp.asarray(_canonical_np(d0))
    keys = greedy_i[:, :, None] + canonical[rank, :]  # (d1, N, d1)
    return keys, bary, el_minus_gr


def _pack_keys(keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 4) int32 lattice coords -> ((...,) uint32 hi, (...,) uint32 lo)."""
    k = (keys + _BIAS).astype(jnp.uint32)
    hi = (k[..., 0] << 16) | k[..., 1]
    lo = (k[..., 2] << 16) | k[..., 3]
    return hi, lo


def _searchsorted_pair(
    s_hi: jnp.ndarray, s_lo: jnp.ndarray, q_hi: jnp.ndarray, q_lo: jnp.ndarray
) -> jnp.ndarray:
    """Lower-bound binary search of query pairs in a lexicographically sorted
    pair array.  Shapes: s_* (H,), q_* (...,); returns (...,) int32 positions."""
    h = s_hi.shape[0]
    steps = max(1, int(math.ceil(math.log2(max(h, 2)))))
    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, h, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) // 2
        mh = s_hi[mid]
        ml = s_lo[mid]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
        return lo_b, hi_b

    lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b


def build_lattice_scale(
    pc: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
    radius: int,
    scale: float,
    build_next: bool = True,
) -> LatticeScale:
    """Build one lattice scale with static shapes.

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

    # Teleport invalid points far away so their cells are isolated.
    pts = jnp.where(valid[None, :], pc, _FAR)
    keys, bary, el_minus_gr = get_keys_and_barycentric(pts * scale, d0)
    bary = jnp.where(valid[None, :], bary, 0.0)

    # ---- dedup: sort packed keys ----
    hi, lo = _pack_keys(keys)  # (d1, P) each
    m = d1 * p
    hi_f = hi.reshape(m)
    lo_f = lo.reshape(m)
    coords = keys.reshape(m, d1)
    perm = jnp.arange(m, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        (hi_f, lo_f, perm) + tuple(coords[:, i].astype(jnp.int32) for i in range(d1)),
        num_keys=2,
    )
    s_hi, s_lo, s_perm = sorted_ops[0], sorted_ops[1], sorted_ops[2]
    s_coords = jnp.stack(sorted_ops[3:], axis=-1)  # (M, d1)

    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1])]
    )
    rank_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # (M,)
    num_cells = rank_sorted[-1] + 1

    # cell index per original flat key -> (d1, P)
    offsets_flat = jnp.zeros((m,), jnp.int32).at[s_perm].set(rank_sorted)
    lattice_offset = offsets_flat.reshape(d1, p)
    # Clamp to capacity (overflow cells alias the dump cell; see cell_valid).
    overflowed = lattice_offset >= capacity
    lattice_offset = jnp.where(overflowed, capacity - 1, lattice_offset)
    bary = jnp.where(overflowed, 0.0, bary)

    # unique cell coords (sorted order), padded with +inf sentinel
    first_pos = jnp.full((capacity,), m, jnp.int32).at[
        jnp.minimum(rank_sorted, capacity - 1)
    ].min(jnp.arange(m, dtype=jnp.int32), mode="drop")
    slot_ids = jnp.arange(capacity, dtype=jnp.int32)
    in_use = slot_ids < jnp.minimum(num_cells, capacity)
    gather_pos = jnp.where(in_use, jnp.minimum(first_pos, m - 1), 0)
    cell_coords = jnp.where(
        in_use[:, None], s_coords[gather_pos], _BIAS - 1  # sentinel = max coord
    )  # (H, d1)

    # which cells are reachable from *valid* points (phantom-cell mask)
    touched = jnp.zeros((capacity,), jnp.float32).at[lattice_offset.reshape(-1)].add(
        jnp.broadcast_to(valid[None, :], (d1, p)).reshape(-1).astype(jnp.float32),
        mode="drop",
    )
    cell_valid = in_use & (touched > 0)

    # ---- blur neighbor table ----
    if radius >= 0:
        offs = jnp.asarray(filter_offsets(radius, d0))  # (F, d1)
        qkeys = cell_coords[None, :, :] + offs[:, None, :]  # (F, H, d1)
        q_hi, q_lo = _pack_keys(qkeys)
        c_hi, c_lo = _pack_keys(cell_coords)
        pos = _searchsorted_pair(c_hi, c_lo, q_hi, q_lo)
        pos_c = jnp.minimum(pos, capacity - 1)
        found = (
            (c_hi[pos_c] == q_hi)
            & (c_lo[pos_c] == q_lo)
            & (pos < capacity)
            & in_use[pos_c]
        )
        blur_neighbors = jnp.where(found, pos_c, -1).astype(jnp.int32)
        blur_neighbors = jnp.where(in_use[None, :], blur_neighbors, -1)
    else:
        blur_neighbors = jnp.full((1, capacity), -1, jnp.int32)

    # ---- coarsened next-scale points ----
    if build_next:
        denom = expected_std(d0) * scale
        next_pts = elevate_matrix(d0).T @ (
            cell_coords.T.astype(jnp.float32) / denom
        )  # (d0, H)
        next_pts = jnp.where(cell_valid[None, :], next_pts, _FAR)
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


def bcl_gather_neighbors(
    splat: jnp.ndarray, blur_neighbors: jnp.ndarray
) -> jnp.ndarray:
    """BLUR gather: (H+1, C) cells x (F, H) neighbor ids -> (H, F, C).

    Missing neighbors (-1) gather the zero row.  The caller contracts the
    (F, C) axes with an MXU matmul (the reference's Conv2d over the neighbor
    axis, reference nets/bilateralNN.py:233-246).
    """
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
