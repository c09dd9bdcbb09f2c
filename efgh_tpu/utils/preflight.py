"""Pre-flight checks before compiling a training/eval run.

The reference's failure handling is a per-batch CUDA-OOM catch-and-continue
(reference iterater.py:108-118).  On TPU, memory problems surface at compile
time, so we check up front: estimated HBM footprint vs. device limits,
batch/mesh divisibility, lattice capacity sanity, and the coordinate-packing
envelope.  Checkpoint-based restart covers runtime failures.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax

from efgh_tpu.config import Config
from efgh_tpu.ops.lattice import _BIAS, _COORD_MAX, expected_std, filter_size


@dataclasses.dataclass
class PreflightReport:
    ok: bool
    warnings: List[str]
    errors: List[str]
    est_activation_bytes: int

    def raise_on_error(self):
        if not self.ok:
            raise RuntimeError("preflight failed:\n" + "\n".join(self.errors))


# Backward-pass activation footprint, calibrated against the one measured
# OOM: batch-2 900x1600 bf16 train WITHOUT remat reserved 16.87 GiB on a
# 15.75 GiB v5e (docs/PERFORMANCE.md) — dominated by f32 conv-tower temps
# (G U-Net f32[450,·,·,64] and friends) held for the backward.  Subtracting
# the ~0.9e9 forward estimate leaves ~5.9 KB of stored temps per raw image
# pixel per sample.  With remat over the conv towers only block-boundary
# activations survive; 0.15 reproduces "batch-2 remat fits comfortably".
_BWD_BYTES_PER_PIXEL = 5900
_REMAT_BWD_FRACTION = 0.15


def check(cfg: Config, crop_radius: float = 50.0, train: bool = False,
          hbm_limit_bytes: int = 0) -> PreflightReport:
    """`train=True` adds the backward-pass HBM estimate (the round-3 batch-2
    OOM was invisible to the inference-only model).  `hbm_limit_bytes`
    overrides the device-reported limit (testability on CPU hosts)."""
    warnings: List[str] = []
    errors: List[str] = []

    devices = jax.local_devices()
    n_dev = len(devices) if cfg.mesh_data == -1 else cfg.mesh_data
    if cfg.batch_size % max(n_dev, 1) != 0:
        errors.append(
            f"batch_size {cfg.batch_size} not divisible by mesh size {n_dev}"
        )
    per_dev_batch = max(cfg.batch_size // max(n_dev, 1), 1)

    # coordinate-packing envelope: elevated coords must stay inside the
    # 10-bit packed fields (see efgh_tpu/ops/lattice.py)
    row_l1_max = 1.4040301  # max L1 norm of the elevation rows (d0=3)
    max_scale = max(s for s, _ in cfg.scale_map)
    max_coord = crop_radius * max_scale * row_l1_max * expected_std(cfg.dim)
    headroom = (_COORD_MAX - _BIAS) - max_coord
    if headroom < 8:
        errors.append(
            f"lattice coordinate envelope exceeded: max |coord| ~{max_coord:.0f}"
            f" vs packing range {_COORD_MAX - _BIAS}; reduce crop radius or"
            " scales"
        )
    elif headroom < 64:
        warnings.append(
            f"lattice coordinate headroom is small ({headroom:.0f} units)"
        )

    # capacity sanity: capacities must be nonincreasing-ish and bounded by
    # the candidate-key count of their scale
    pts = cfg.num_points
    for i, cap in enumerate(cfg.lattice_capacity):
        cand = (cfg.dim + 1) * pts
        if cap > cand:
            warnings.append(
                f"scale {i}: capacity {cap} exceeds candidate keys {cand}"
            )
        pts = cap

    # rough activation HBM estimate for the biggest buffers (bf16 path):
    h, w = cfg.raw_cam_img_size
    f = filter_size(int(cfg.scale_map[0][1]), cfg.dim)
    cap0 = cfg.lattice_capacity[0]
    bytes_per = 2 if cfg.compute_dtype == "bfloat16" else 4
    est = per_dev_batch * (
        f * cap0 * 36 * bytes_per          # BCL neighbor gather, scale 0
        + (h // 2) * (w // 2) * 64 * bytes_per * 6  # G image trunk activations
        + (h // 2) * (w * 2) * 4 * 4       # range image f32
        + h * w * 4 * 4                    # depth image f32
    )
    if train:
        # stored-for-backward conv-tower temps (f32 regardless of
        # compute_dtype — XLA keeps the accumulating temps wide)
        bwd = per_dev_batch * h * w * _BWD_BYTES_PER_PIXEL
        if bool(cfg.get("remat", False)):
            bwd = int(bwd * _REMAT_BWD_FRACTION)
        est += bwd
    limit = hbm_limit_bytes or None
    if limit is None:
        try:
            stats = devices[0].memory_stats()
            limit = stats.get("bytes_limit") if stats else None
        except Exception:
            pass
    if limit and est > 0.6 * limit:
        warnings.append(
            f"estimated {'train-step' if train else 'activation'} HBM "
            f"{est/1e9:.1f} GB vs device limit {limit/1e9:.1f} GB"
            + (" — will very likely OOM; enable remat: true or reduce batch"
               if est > limit else
               "; consider smaller batch or capacities")
        )

    return PreflightReport(ok=not errors, warnings=warnings, errors=errors,
                           est_activation_bytes=int(est))
