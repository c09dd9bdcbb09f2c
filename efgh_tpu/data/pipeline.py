"""Batching + background prefetching, and a synthetic dataset.

The reference feeds the step with `torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)` (reference main.py:85-92).  Here a thread-pool prefetcher
assembles fixed-shape numpy batches ahead of the device so host preprocessing
overlaps TPU compute; `jax.device_put` with a sharding does the host->device
transfer (see efgh_tpu/parallel).
"""

from __future__ import annotations

import math
import os
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


_WORKER_DS = None


def _worker_init(ds):
    # worker-process global, installed once per worker (the dataset is
    # pickled once per worker via initargs, not once per task)
    global _WORKER_DS
    _WORKER_DS = ds


def _worker_get(i):
    return _WORKER_DS[i]


class DataPipeline:
    """Prefetching batch iterator over a map-style dataset.

    worker_mode "thread" (default) runs __getitem__ in a thread pool —
    PIL decode and numpy preprocessing release the GIL, and samples need no
    IPC serialization.  worker_mode "process" matches the reference's
    DataLoader worker processes (reference main.py:85-92): full parallelism
    for GIL-holding Python preprocessing, at the cost of pickling each
    sample back to the parent.  Thread mode wins on few-core hosts and
    numpy-heavy datasets; process mode wins when per-sample Python time
    dominates and cores are plentiful.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, prefetch: int = 2,
                 drop_last: bool = True, seed: int = 0,
                 worker_mode: str = "thread"):
        assert worker_mode in ("thread", "process"), worker_mode
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.seed = seed
        self.worker_mode = worker_mode
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
            if self.worker_mode == "process":
                import multiprocessing as mp

                # forkserver: children fork from a clean non-threaded server
                # process (forking the jax-threaded parent directly can
                # deadlock); the dataset is shipped once per worker through
                # the initializer
                methods = mp.get_all_start_methods()
                ctx = mp.get_context(
                    "forkserver" if "forkserver" in methods else "spawn")
                with ctx.Pool(self.num_workers, initializer=_worker_init,
                              initargs=(self.dataset,)) as pool:
                    for batch_idx in batches:
                        samples = pool.map(_worker_get, batch_idx)
                        q.put(collate(samples))
            else:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        samples = list(
                            pool.map(self.dataset.__getitem__, batch_idx))
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
    """Geometrically-consistent, *learnable* synthetic samples (no files).

    A procedural scene — ground plane, vertical walls, pillars — is observed
    twice: a dense sampling is z-buffer-rendered into the camera image
    through the pinhole calib, and a sparse independent sampling becomes the
    lidar cloud.  Both then go through the exact real-loader contract
    (preproc_gt / preproc_img_rellis / preproc_pcd, reference
    data_loader/loader_utils.py + rellis3d_loader.py:292-339): the image is
    rotated by rand_init_c and the cloud decalibrated by rand_init_l.
    Because image and cloud show the same scene, the registration task is
    end-to-end learnable — this backs the dataset-free convergence +
    RRE/RTE proof, the bench, unit tests, and the graft entry.

    Samples are a pure function of (seed, index): a dataset with a different
    seed is a disjoint, frozen split.
    """

    def __init__(self, num_samples: int = 16, num_points: int = 65536,
                 raw_cam_img_size=(900, 1600), seed: int = 0,
                 l_rot_range: float = 1.0 / 6.0, l_trs_range: float = 2.0,
                 c_rot_range: float = 1.0 / 6.0, cache: bool = True,
                 cache_dir: str = ""):
        self.num_samples = num_samples
        self.num_points = num_points
        self.raw = tuple(raw_cam_img_size)
        self.seed = seed
        self.l_rot_range = l_rot_range
        self.l_trs_range = l_trs_range
        self.c_rot_range = c_rot_range
        # samples are deterministic, so multi-epoch runs cache them (~3.5 MB
        # each at production shapes; this host has one CPU core, so epoch 2+
        # would otherwise be render-bound)
        self._cache = {} if cache else None
        # optional disk cache: generation costs seconds/sample on a 1-core
        # host and the RSS-watchdog restart cycle (train/loop.py,
        # scripts/train_until_done.sh) starts a fresh process that would
        # otherwise regenerate every sample each restart
        self._cache_dir = str(cache_dir) if cache_dir else ""
        if self._cache_dir:
            os.makedirs(self._cache_dir, exist_ok=True)
        h, w = self.raw
        # render at the RELLIS native-camera ratio (1200x1920 vs 900x1600,
        # reference rellis3d_loader.py:318: k_scale) so preproc_img_rellis
        # sees the same resize/rotate/crop geometry as the real loader
        self.render_hw = (max(8, int(round(h * 1200 / 900))),
                          max(8, int(round(w * 1920 / 1600))))
        self.n_render = int(min(400_000, max(20_000, 2 * h * w)))

    def _disk_path(self, index):
        h, w = self.raw
        tag = (f"s{self.seed}_n{self.num_points}_{h}x{w}"
               f"_r{self.l_rot_range:.6g}_t{self.l_trs_range:.6g}"
               f"_c{self.c_rot_range:.6g}_i{index:06d}")
        return os.path.join(self._cache_dir, tag + ".npy")

    def _disk_get(self, index):
        if not self._cache_dir:
            return None
        path = self._disk_path(index)
        if not os.path.exists(path):
            return None
        try:
            return tuple(np.load(path, allow_pickle=True))
        except Exception:
            return None  # partial/corrupt write; regenerate

    def _disk_put(self, index, sample):
        if not self._cache_dir:
            return
        path = self._disk_path(index)
        tmp = path + f".{os.getpid()}.tmp.npy"  # .npy suffix: np.save keeps it
        arr = np.empty(len(sample), dtype=object)
        arr[:] = sample
        try:
            np.save(tmp, arr, allow_pickle=True)
            os.replace(tmp, path)
        except OSError:
            pass

    def __len__(self):
        return self.num_samples

    # -- scene --------------------------------------------------------------

    @staticmethod
    def _scene_params(rng):
        z0 = -1.6
        nw = rng.randint(8, 15)
        npil = rng.randint(5, 11)
        return {
            "z0": z0,
            "wall_c": rng.uniform(-38, 38, (nw, 2)),
            "wall_yaw": rng.uniform(0, 2 * np.pi, nw),
            "wall_len": rng.uniform(4, 16, nw),
            "wall_h": rng.uniform(2, 6, nw),
            "wall_col": rng.uniform(60, 255, (nw, 3)),
            "pil_c": rng.uniform(-38, 38, (npil, 2)),
            "pil_r": rng.uniform(0.3, 1.2, npil),
            "pil_h": rng.uniform(2, 8, npil),
            "pil_col": rng.uniform(60, 255, (npil, 3)),
            "ground_col": rng.uniform(90, 170, 3),
        }

    @staticmethod
    def _sample_scene(params, n, rng):
        """Sample n surface points + RGB albedo from the scene."""
        z0 = params["z0"]
        n_g = n // 2
        n_w = int(n * 0.35)
        n_p = n - n_g - n_w

        gx = rng.uniform(-50, 50, n_g)
        gy = rng.uniform(-50, 50, n_g)
        gz = z0 + rng.normal(0, 0.03, n_g)
        g_pts = np.stack([gx, gy, gz], 1)
        # checker-ish ground texture so the image has trackable features
        tex = 0.75 + 0.25 * np.sign(np.sin(0.8 * gx) * np.sin(0.8 * gy))
        g_col = params["ground_col"][None, :] * tex[:, None]

        nw = len(params["wall_len"])
        areas = params["wall_len"] * params["wall_h"]
        wid = rng.choice(nw, size=n_w, p=areas / areas.sum())
        s = (rng.uniform(-0.5, 0.5, n_w)) * params["wall_len"][wid]
        zw = z0 + rng.uniform(0, 1, n_w) * params["wall_h"][wid]
        d = np.stack([np.cos(params["wall_yaw"][wid]),
                      np.sin(params["wall_yaw"][wid])], 1)
        w_xy = params["wall_c"][wid] + s[:, None] * d
        w_pts = np.concatenate([w_xy, zw[:, None]], 1)
        stripe = 0.7 + 0.3 * np.sign(np.sin(4.0 * s))
        w_col = params["wall_col"][wid] * stripe[:, None]

        npil = len(params["pil_r"])
        pid = rng.randint(0, npil, n_p)
        th = rng.uniform(0, 2 * np.pi, n_p)
        zp = z0 + rng.uniform(0, 1, n_p) * params["pil_h"][pid]
        p_xy = params["pil_c"][pid] + params["pil_r"][pid][:, None] * \
            np.stack([np.cos(th), np.sin(th)], 1)
        p_pts = np.concatenate([p_xy, zp[:, None]], 1)
        p_col = params["pil_col"][pid]

        pts = np.concatenate([g_pts, w_pts, p_pts], 0)
        col = np.concatenate([g_col, w_col, p_col], 0)
        return pts, col

    @staticmethod
    def _render(pts, col, calib34, hw):
        """Z-buffer point-splat render: far-to-near painter with a 2x2
        splat over a sky/ground gradient background."""
        h, w = hw
        uvw = calib34 @ np.concatenate(
            [pts.T, np.ones((1, len(pts)))], 0)
        z = uvw[2]
        keep = z > 0.5
        u = np.round(uvw[0][keep] / z[keep]).astype(np.int64)
        v = np.round(uvw[1][keep] / z[keep]).astype(np.int64)
        zk = z[keep]
        shade = np.clip(1.0 - 0.006 * zk, 0.3, 1.0)
        c = (col[keep] * shade[:, None])

        # 2x2 splat
        du = np.array([0, 1, 0, 1])
        dv = np.array([0, 0, 1, 1])
        u4 = (u[:, None] + du[None, :]).ravel()
        v4 = (v[:, None] + dv[None, :]).ravel()
        z4 = np.repeat(zk, 4)
        c4 = np.repeat(c, 4, axis=0)
        inb = (u4 >= 0) & (u4 < w) & (v4 >= 0) & (v4 < h)
        u4, v4, z4, c4 = u4[inb], v4[inb], z4[inb], c4[inb]
        order = np.argsort(-z4, kind="stable")  # far first; near paints last

        grad = np.linspace(0, 1, h)[:, None]
        sky = np.array([150, 170, 200.0])
        dirt = np.array([70, 75, 65.0])
        img = np.broadcast_to(
            (sky[None] * (1 - grad) + dirt[None] * grad)[:, None, :], (h, w, 3)
        ).copy()
        flat = img.reshape(-1, 3)
        flat[v4[order] * w + u4[order]] = c4[order]
        return np.clip(img, 1, 255).astype(np.uint8)  # 1: keep mask valid

    # -- sample -------------------------------------------------------------

    def __getitem__(self, index):
        if self._cache is not None and index in self._cache:
            pc, img_u8, calib, a, gts, fname = self._cache[index]
            return pc, img_u8.astype(np.float32), calib, a, gts, fname
        disk = self._disk_get(index)
        if disk is not None:
            if self._cache is not None:
                self._cache[index] = disk
            pc, img_u8, calib, a, gts, fname = disk
            return pc, img_u8.astype(np.float32), calib, a, gts, fname

        from efgh_tpu.data.loader_utils import preproc_img_rellis, preproc_pcd

        rng = np.random.RandomState(
            (self.seed * 100003 + index) % (2 ** 31 - 1))
        params = self._scene_params(rng)

        h, w = self.raw
        rh, rw = self.render_hw
        fx = fy = 0.6 * rw
        k_render = np.array([[fx, 0, rw / 2, 0], [0, fy, rh / 2, 0],
                             [0, 0, 1, 0]])
        # lidar->cam axes swap (x fwd, y left, z up -> cam z fwd/x right/y dn)
        tr = np.array([
            [0, -1, 0, 0],
            [0, 0, -1, 0],
            [1, 0, 0, 0],
            [0, 0, 0, 1],
        ], float)
        # model calib is expressed for the raw (h, w) frame: fold in the
        # render->raw scale exactly like the reference's k_scale
        k_scale = np.diag([w / rw, h / rh, 1.0])
        calib = np.concatenate(
            [k_scale @ k_render[:, :3], np.zeros((3, 1))], 1) @ tr

        # dense view -> camera image (clean scene, lidar frame)
        d_pts, d_col = self._sample_scene(params, self.n_render, rng)
        img_full = self._render(d_pts, d_col, k_render @ tr,
                                (rh, rw))

        # decalibration draw (same contract as ProcessRELLIS)
        rr, rp, ry = rng.uniform(-1, 1, 3) * np.pi * self.l_rot_range
        tx, ty, tz = rng.uniform(-1, 1, 3) * self.l_trs_range
        rt = rng.uniform(-1, 1) * np.pi * self.c_rot_range
        gts = preproc_gt(rr, rp, ry, tx, ty, tz, rt)

        imgs = preproc_img_rellis(img_full, gts, self.raw)
        img_in = imgs["in"]
        # img_raw/img_rot host panels are dropped (viz falls back cleanly) to
        # keep cached samples compact
        gts["img_mask"] = imgs["img_mask"]

        # sparse independent view -> lidar cloud, decalibrated
        n_src = int(self.num_points * 1.5) + 2048
        l_pts, _ = self._sample_scene(params, n_src, rng)
        pc = preproc_pcd(l_pts, gts, self.num_points, lidar_line=None,
                         rng=rng)

        a = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]], float)
        gts["cam_T_velo"] = (
            np.linalg.inv(a) @ gts["intrinsic_sensor2"] @ a @ calib
            @ gts["sensor2_T_sensor1"]
        )
        sample = (pc[:3].astype(np.float32), img_in.astype(np.uint8),
                  calib.astype(np.float32), a.astype(np.float32), gts,
                  f"synthetic_{index:06d}")
        if self._cache is not None:
            self._cache[index] = sample
        self._disk_put(index, sample)
        return (sample[0], sample[1].astype(np.float32), *sample[2:])
