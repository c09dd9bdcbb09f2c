"""Batching + background prefetching, and a synthetic dataset.

The reference feeds the step with `torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)` (reference main.py:85-92).  Here a thread-pool prefetcher
assembles fixed-shape numpy batches ahead of the device so host preprocessing
overlaps TPU compute; `jax.device_put` with a sharding does the host->device
transfer (see efgh_tpu/parallel).
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from efgh_tpu.data.loader_utils import preproc_gt

# gt entries shipped to the device (the rest — img_raw/img_rot — are host-side
# visualization panels)
DEVICE_GT_KEYS = (
    "rand_init_l",
    "rand_init_c",
    "sensor2_T_sensor1",
    "intrinsic_sensor2",
    "cam_T_velo",
    "img_mask",
)


def collate(samples: Sequence) -> Dict:
    """Stack a list of (pc, img, calib, A, gts, fname) samples into one batch
    of float32 arrays + the fname list."""
    pcs, imgs, calibs, a_s, gts_list, fnames = zip(*samples)
    gts = {
        k: np.stack([np.asarray(g[k], np.float32) for g in gts_list])
        for k in DEVICE_GT_KEYS
        if k in gts_list[0]
    }
    return {
        "pc": np.stack(pcs).astype(np.float32),
        "img": np.stack(imgs).astype(np.float32),
        "calib": np.stack(calibs).astype(np.float32),
        "A": np.stack(a_s).astype(np.float32),
        "gts": gts,
        "fnames": list(fnames),
    }


class DataPipeline:
    """Thread-pool prefetching batch iterator over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, prefetch: int = 2,
                 drop_last: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size
        )

    def _batch_indices(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        return [
            idx[i * self.batch_size:(i + 1) * self.batch_size].tolist()
            for i in range(nb)
        ]

    def __iter__(self) -> Iterator[Dict]:
        self._epoch += 1
        batches = self._batch_indices()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(collate(samples))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()


class SyntheticDataset:
    """Geometrically-consistent synthetic samples (no files needed).

    Generates a ground-plane + scatter cloud, a pinhole calib, and a random
    decalibration through the same `preproc_gt` contract as the real loaders.
    Used by unit tests, the bench, and the graft entry.
    """

    def __init__(self, num_samples: int = 16, num_points: int = 65536,
                 raw_cam_img_size=(900, 1600), seed: int = 0,
                 l_rot_range: float = 1.0 / 6.0, l_trs_range: float = 2.0,
                 c_rot_range: float = 1.0 / 6.0):
        self.num_samples = num_samples
        self.num_points = num_points
        self.raw = tuple(raw_cam_img_size)
        self.seed = seed
        self.l_rot_range = l_rot_range
        self.l_trs_range = l_trs_range
        self.c_rot_range = c_rot_range

    def __len__(self):
        return self.num_samples

    def __getitem__(self, index):
        rng = np.random.RandomState(self.seed * 100003 + index)
        n = self.num_points
        # ground plane + scattered structure within the 50 m crop
        n_ground = n // 2
        ground = np.stack([
            rng.uniform(-50, 50, n_ground),
            rng.uniform(-50, 50, n_ground),
            rng.normal(-1.6, 0.05, n_ground),
        ], axis=0)
        scatter = np.stack([
            rng.uniform(-50, 50, n - n_ground),
            rng.uniform(-50, 50, n - n_ground),
            rng.uniform(-1.5, 4.0, n - n_ground),
        ], axis=0)
        pc_clean = np.concatenate([ground, scatter], axis=1)  # (3, N)

        h, w = self.raw
        fx = fy = 0.6 * w
        k = np.array([[fx, 0, w / 2, 0], [0, fy, h / 2, 0], [0, 0, 1, 0]])
        # lidar->cam axes swap (x fwd, y left, z up -> cam z fwd, x right, y dn)
        tr = np.array([
            [0, -1, 0, 0],
            [0, 0, -1, 0],
            [1, 0, 0, 0],
            [0, 0, 0, 1],
        ], float)
        calib = (k @ tr)[:3, :]

        rr, rp, ry = rng.uniform(-1, 1, 3) * np.pi * self.l_rot_range
        tx, ty, tz = rng.uniform(-1, 1, 3) * self.l_trs_range
        rt = rng.uniform(-1, 1) * np.pi * self.c_rot_range
        gts = preproc_gt(rr, rp, ry, tx, ty, tz, rt)

        pc_h = np.ones((4, n))
        pc_h[:3] = pc_clean
        pc = (gts["rand_init_l"] @ pc_h)[:3]

        img = rng.randint(0, 255, (3, h // 2, w // 2)).astype(np.float32)
        gts["img_mask"] = np.ones((1, h, w), np.uint8)

        a = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]], float)
        gts["cam_T_velo"] = (
            np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
            @ gts["sensor2_T_sensor1"]
        )
        return (pc.astype(np.float32), img, calib.astype(np.float32),
                a.astype(np.float32), gts, f"synthetic_{index:06d}")
