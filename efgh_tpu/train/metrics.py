"""Loss/error aggregation (reference common/helper.py:95-207)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from efgh_tpu.geometry.metrics import quaternion_angular_distance, rre_rte


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count


class Lss:
    """Running averages for every loss key."""

    def __init__(self, keys):
        self.keys = list(keys)
        self.dict: Dict[str, AverageMeter] = {}
        self.flush()

    def flush(self):
        for k in self.keys:
            self.dict[k] = AverageMeter()

    def update(self, losses, batch: int):
        for k, v in losses.items():
            if k in self.dict:
                self.dict[k].update(float(v), batch)


class Err:
    """Per-dataset registration error tracker: KITTI_RAW uses quaternion
    distance + mean-abs translation, everything else RRE/RTE
    (reference common/helper.py:128-207)."""

    def __init__(self, dataset: str):
        self.dataset = dataset
        self.error_dict: Dict[str, List[float]] = {}
        self.dict: Dict[str, float] = {}

    def flush(self):
        self.error_dict = {}
        self.dict = {}

    def update_batch(self, gt_s2s1: np.ndarray, pred_s2s1: np.ndarray):
        """gt/pred sensor2_T_sensor1: (B, 4, 4) numpy."""
        for b in range(gt_s2s1.shape[0]):
            g, p = gt_s2s1[b], pred_s2s1[b]
            if self.dataset == "KITTI_RAW":
                rot = float(quaternion_angular_distance(g[:3, :3], p[:3, :3]))
                trs = float(np.mean(np.abs(g[:3, 3] - p[:3, 3])))
            else:
                rre, rte = rre_rte(g, p)
                rot, trs = float(rre), float(rte)
            for k, v in (("rot", rot), ("trs", trs)):
                self.error_dict.setdefault(k, []).append(v)
            # per-axis translation residuals: the headline RTE hides
            # axis-staged convergence (t_z learns long before t_x/t_y on
            # the synthetic benchmark — docs/ACCURACY.md), so track each
            # axis so a frozen axis is visible in tensorboard mid-run
            for ax, nm in enumerate("xyz"):
                self.error_dict.setdefault("trs_" + nm, []).append(
                    float(abs(g[ax, 3] - p[ax, 3])))
        for k, vals in self.error_dict.items():
            self.dict[k + "_mean"] = float(np.mean(vals))
            self.dict[k + "_std"] = float(np.std(vals))
