"""Clean-room CPU oracle for the permutohedral lattice build.

Implements the same *semantics* as the reference's khash/numba pipeline
(reference nets/generate_data.py + nets/transforms.py) using plain Python
dicts, for cross-checking the on-device sort-based build in
efgh_tpu/ops/lattice.py.  Written from the algorithm description, not
translated from the C.
"""

import math

import numpy as np

from efgh_tpu.ops.lattice import _canonical_np, _elevate_matrix_np, expected_std, filter_offsets


def keys_and_barycentric_np(pc, d0=3):
    """pc: (d0, N) float -> keys (d1,N,d1) int, bary (d1,N), el_minus_gr (d1,N)."""
    d1 = d0 + 1
    n = pc.shape[1]
    # float32 throughout: the reference computes in torch.FloatTensor
    # (reference nets/generate_data.py:65-70) and so does the device build.
    elevate = _elevate_matrix_np(d0).astype(np.float32)
    elevated = ((elevate @ pc.astype(np.float32))
                * np.float32(expected_std(d0))).astype(np.float32)
    greedy = (np.round(elevated / np.float32(d1)) * d1).astype(np.float32)
    el_minus_gr = elevated - greedy

    order = np.argsort(-el_minus_gr, axis=0, kind="stable")
    rank = np.empty((d1, n), np.int64)
    for j in range(n):
        rank[order[:, j], j] = np.arange(d1)

    remainder_sum = greedy.sum(axis=0, keepdims=True) / d1
    cond = ((rank >= d1 - remainder_sum) & (remainder_sum > 0)) | (
        (rank < -remainder_sum) & (remainder_sum < 0)
    )
    sign = -1.0 * (remainder_sum > 0) + 1.0 * (remainder_sum < 0)
    greedy = greedy + d1 * sign * cond
    rank = rank + (d1 * sign * cond).astype(np.int64) + remainder_sum.astype(np.int64)

    el_minus_gr = elevated - greedy
    bary = np.zeros((d1 + 1, n))
    for v in range(d1):
        for j in range(n):
            bary[d0 - rank[v, j], j] += el_minus_gr[v, j]
            bary[d1 - rank[v, j], j] -= el_minus_gr[v, j]
    bary /= d1
    bary[0] += 1.0 + bary[d1]
    bary = bary[:-1]

    # key of remainder r of point n = coordinate vector over v:
    # greedy[v, n] + canonical[rank[v, n], r]  (reference uses
    # pc1_keys_np[:, point, remainder] — coordinate axis first); returned
    # as (remainder, N, coord)
    canonical = _canonical_np(d0)
    keys_vnr = greedy.astype(np.int64)[:, :, None] + canonical[rank, :]
    keys = np.transpose(keys_vnr, (2, 1, 0))
    return keys, bary.astype(np.float32), el_minus_gr.astype(np.float32)


def build_lattice_np(pc, radius=1, d0=3, scale=1.0):
    """Dict-based lattice build: returns a dict with
      offsets (d1, N), neighbors (F, U), cells (U, d1), num_cells, bary,
      el_minus_gr, next_points (d0, U).
    Insertion order: point-major then vertex (same as reference build_it).
    """
    d1 = d0 + 1
    keys, bary, emg = keys_and_barycentric_np(pc * scale, d0)
    n = pc.shape[1]
    table = {}
    cells = []
    offsets = np.empty((d1, n), np.int64)
    for j in range(n):
        for v in range(d1):
            k = tuple(int(x) for x in keys[v, j])
            if k not in table:
                table[k] = len(cells)
                cells.append(k)
            offsets[v, j] = table[k]
    u = len(cells)
    offs = filter_offsets(radius, d0)
    f = offs.shape[0]
    neighbors = np.full((f, u), -1, np.int64)
    for h, ck in enumerate(cells):
        base = np.array(ck, np.int64)
        for fi in range(f):
            nk = tuple(int(x) for x in (base + offs[fi]))
            neighbors[fi, h] = table.get(nk, -1)
    cells_arr = np.array(cells, np.int64)
    denom = expected_std(d0) * scale
    next_points = (_elevate_matrix_np(d0).T.astype(np.float64) @ (cells_arr.T / denom))
    return {
        "offsets": offsets,
        "neighbors": neighbors,
        "cells": cells_arr,
        "num_cells": u,
        "bary": bary,
        "el_minus_gr": emg,
        "next_points": next_points.astype(np.float32),
    }
