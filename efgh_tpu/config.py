"""Typed configuration for EFGH-TPU.

The reference drives everything off a flat YAML dict loaded with
``yaml.safe_load`` (reference main.py:31-32).  We keep the same YAML schema
(same key names) so reference configs port over unchanged, but wrap it in a
dataclass with defaults, validation, and a couple of TPU-only knobs
(lattice capacities, mesh shape, dtype policy).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


def _as_tuple2(x) -> Tuple[float, float]:
    return (x[0], x[1])


@dataclasses.dataclass
class Config:
    # ---- general ----
    test: Any = False                      # False | "test"
    ckpt_dir: str = "./ckpts/rellis"
    ckpt_path: str = ""                    # test-mode checkpoint
    resume_path: Any = False
    pretrained_path: Any = False
    arch: str = "EFGH"
    last_relu: bool = False
    use_leaky: bool = True
    bcn_use_bias: bool = True
    bcn_use_norm: bool = True

    # ---- dataset ----
    dataset: str = "RELLIS_3D"
    data_root: str = "/data/RELLIS-3D"
    num_points: int = 65536
    lidar_line: int = 64
    lidar_fov_rad: Tuple[float, float] = (0.125, -0.125)
    raw_cam_img_size: Tuple[int, int] = (900, 1600)
    train_samples: int = -1
    val_samples: int = -1
    delta_ij_max: int = 40
    translation_max: float = 10.0
    accumulation_frame_num: int = 0
    accumulation_frame_skip: int = 1
    rand_init: str = ""                    # test-mode fixed perturbation CSV
    save_image: bool = False

    # ---- model ----
    dim: int = 3
    batch_size: int = 1
    # [[scale, bcn_filter_radius], ...] — 5 lattice scales
    # (reference configs/train_rellis.yaml:30-35)
    scale_map: List[List[float]] = dataclasses.field(
        default_factory=lambda: [[1.0, 1], [0.75, 1], [0.5, 1], [0.25, 1], [0.125, 1]]
    )

    # ---- loss ----
    # lambda weights (reference configs/train_rellis.yaml:49-55)
    lambda_: Dict[str, float] = dataclasses.field(
        default_factory=lambda: {
            "e_gn": 100.0,
            "h_hrzn": 100.0,
            "fov": 100.0,
            "g_trs": 1000.0,
            "g_depth": 0.1,
            "g_mask": 1000.0,
        }
    )
    fov_pos_num: int = 30
    fov_neg_ratio: int = 5
    # per-axis weights on the g_trs smooth-L1, lidar frame [x fwd, y left,
    # z up]; normalized to mean 1 inside the criterion so lambda.g_trs
    # keeps its meaning.  No reference equivalent (the reference's
    # smooth_l1_loss weights axes equally, losses/loss_utils.py:181);
    # opt-in lever for the measured t_y signal starvation — the lateral
    # axis only appears as a positional (not value) cue in G's fusion
    # input and stayed at zero regression slope through 9k iters of equal
    # weighting (docs/ACCURACY.md).  Default [1,1,1] = reference
    # semantics.
    g_trs_axis_weights: List[float] = dataclasses.field(
        default_factory=lambda: [1.0, 1.0, 1.0]
    )
    # append normalized (u, v) pixel-coordinate channels to G's sparse-depth
    # fusion input (CoordConv).  No reference equivalent (reference
    # nets/gnet.py:142-166 fuses image features with the 4-channel projected
    # cloud only).  Motivation: the t_y residual is, to first order,
    # py - (u - cx)*w/fx — the projected point's LiDAR-frame lateral value
    # (py, a channel) against its pixel COLUMN (u, positional only); the
    # trs head mean-pools over space, so without an explicit u channel the
    # trunk cannot form the u*w product the residual needs, and t_y stayed
    # at zero regression slope through >12k iters while t_x/t_z converged
    # (docs/ACCURACY.md).  Old 4-channel snapshots load by zero-padding the
    # conv_d1 kernel (exactly the knob-off function at load time).
    # False = off (reference), True/"uv" = +(u, v), "uvprod" = +(u, v,
    # u*w, v*w) — the products the lateral residual is linear in
    # (models/gnet.py); snapshots migrate forward between modes by the
    # same zero-padding.
    g_coord_channels: Any = False
    # projective matching readout on G's translation head (models/
    # matching.py).  No reference equivalent (reference nets/gnet.py:142-166
    # mean-pools 1x1-conv features).  Motivation: lateral translation is a
    # cross-modal DISPLACEMENT between image structure and the projected
    # cloud; a global mean pool can read per-pixel value comparisons (t_x,
    # t_z both work) but not displacement, and t_y stayed at zero regression
    # slope through the s4 (loss re-weighting) and s6a (uvprod value
    # channels) falsifications (docs/ACCURACY.md).  The module scans K
    # candidate translations per axis, scores each candidate re-projection
    # against G's own dense depth, and folds soft/hard argmin features into
    # g_trs through a ZERO-INIT dense head — so a migrated snapshot computes
    # exactly the knob-off function at load time (same contract as
    # g_coord_channels; loop.py load_pretrained fills the missing head
    # params with their zero init).  False = off (reference), True = on
    # with defaults, or a dict of LateralMatching field overrides
    # (span/k/clip/tau/downsample/axes).
    g_matching: Any = False

    # ---- training ----
    weight_decay: float = 0.0
    lr: float = 1e-4
    epochs: int = 25
    iter_iterval: int = 5000
    workers: int = 4
    convert_dict: Dict[str, str] = dataclasses.field(default_factory=dict)
    grad_false_keys: List[str] = dataclasses.field(default_factory=list)
    # linear LR warmup over the first N iters (0 = off).  No reference
    # equivalent (the reference starts at full lr); opt-in training-quality
    # knob, default off preserves the reference recipe.
    lr_warmup: int = 0
    # exponential moving average of the weights (0 = off).  When on, the
    # EMA shadow rides in TrainState/checkpoints and test() evaluates the
    # EMA weights.  No reference equivalent; opt-in, default off.
    ema_decay: float = 0.0
    # per-branch LR multipliers: {path-substring: factor} scales the
    # post-Adam update of every param whose path contains the substring
    # (same path/matching semantics as grad_false_keys).  Adam is
    # per-parameter scale-invariant, so loss-lambda changes cannot speed a
    # lagging branch up — this can (docs/ACCURACY.md).  No reference
    # equivalent; opt-in, default off preserves the reference recipe.
    # NOTE: enabling it changes the optimizer (and so checkpoint opt_state)
    # structure — start a fresh segment from an .npz via pretrained_path
    # rather than resuming an old checkpoint with a different setting.
    lr_scale_keys: Dict[str, float] = dataclasses.field(default_factory=dict)

    # decalibration ranges (reference configs/train_rellis.yaml:66-69)
    dclb: Dict[str, float] = dataclasses.field(
        default_factory=lambda: {
            "l_rot_range": 1.0 / 6.0,
            "l_trs_range": 2.0,
            "c_rot_range": 1.0 / 6.0,
        }
    )

    # ---- TPU-only knobs (no reference equivalent) ----
    # Static per-scale lattice capacities (max unique lattice points). The
    # reference's hash_cnt is data-dependent (reference
    # nets/generate_data.py:139); TPU needs padded static shapes.
    lattice_capacity: List[int] = dataclasses.field(
        default_factory=lambda: [98304, 49152, 24576, 8192, 2048]
    )
    # dtype for conv trunks: "float32" (parity) or "bfloat16" (fast)
    compute_dtype: str = "bfloat16"
    # mesh: data-parallel axis size; -1 = all local devices
    mesh_data: int = -1
    seed: int = 0
    log_every: int = 50
    # depth/range scatter winner rule: "near" (min depth, physical) or "far"
    projection_mode: str = "near"
    # lattice neighbor-table merge backend: "auto" runs a once-per-host
    # self-test on TPU (efgh_tpu/ops/merge_probe.py) and enables the Pallas
    # kernel only if it survives repeated execution (some transports
    # mis-execute it; lax.sort elsewhere / on CPU) — EXCEPT in the train()
    # and test() drivers, which force lax.sort under auto because the probe
    # is not sufficient on at least one transport (see
    # train/loop.py:_force_sort_merge_under_auto).  "on" forces Pallas
    # everywhere, "off" forces lax.sort.  Quote the value in YAML (bare
    # on/off are booleans).  Process-global; must be set before the model
    # is traced.
    pallas_merge: str = "auto"
    # BCL blur-gather backend (ops/pallas_bcl.py): "off" = XLA random-row
    # gather (always correct, ~90 MB/s on TPU), "auto" = probe the Pallas
    # VMEM-streaming kernel per host (bit-exact repeated-execution
    # self-test, ops/bcl_probe.py) and enable it if it survives, "on" =
    # force it.  Default off until the kernel has device mileage; quote
    # the value in YAML.  Process-global; set before tracing.
    pallas_bcl: str = "off"
    # batch axis strategy for the lattice pyramid build: "vmap" (vectorized;
    # XLA compile explodes at batch >= 8), "map" (lax.map: body compiled
    # once, bounded compile), "auto" = vmap below a PER-DEVICE batch of 8
    # (global batch / mesh_data), map at or above.
    # docs/PERFORMANCE.md "Batch-8 compile blowup".
    pyramid_batching: str = "vmap"
    # rematerialize the conv towers' activations in backward: the HBM
    # fix for batch>=2 training at production shapes
    remat: bool = False
    # split-executable forward for train()/test(): the lattice pyramid
    # compiles + executes as its own jit and the towers consume it as an
    # input.  Bounds the batch>=8 fused-compile blowup for training and
    # lets hosts whose transport only runs small Pallas executables
    # reliably combine pallas_merge with the drivers (bisect evidence:
    # benchmarks/pallas_bisect.py).  Output is bit-identical to the fused
    # forward (same build ops/backends, tests/test_train.py).
    split_forward: bool = False
    # test-mode: re-estimate BN running stats over N train batches first
    bn_recalibrate: int = 0
    # host-RSS watchdog (GB, 0 = off): some remote-device transports leak
    # host memory per executed step (~13 MB/iter measured on this project's
    # tunnel — a 22k-iter run reached 128 GB and was OOM-killed by the
    # kernel, losing 430 iters of work).  When the train loop's RSS crosses
    # this limit it checkpoints and exits cleanly (exit code 75) so an
    # outer loop can resume with a fresh process.
    rss_limit_gb: float = 0.0
    # force a jax platform for this process ("" = default).  This host
    # prepends its TPU plugin to jax_platforms, so CPU smoke runs of the
    # CLI trainer need an explicit "cpu" HERE — the env var alone is
    # ignored (CLAUDE.md); honored by efgh_tpu/main.py before any tracing.
    platform: str = ""
    # disk cache directory for generated SYNTHETIC samples ("" = memory
    # only).  Samples are a pure function of (seed, index); on a 1-core
    # host generation costs seconds/sample and every RSS-watchdog restart
    # (fresh process) would otherwise regenerate all of them.
    sample_cache_dir: str = ""
    # test-mode BN: "running" (reference parity) | "batch" (per-sample
    # statistics — what the batch-1 training recipe optimizes)
    eval_bn: str = "running"
    # loader workers: "thread" (GIL-releasing preprocessing, no IPC) |
    # "process" (reference-style worker processes, reference main.py:85-92)
    loader_mode: str = "thread"

    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # -- dict-style access for reference-flavoured call sites --
    def __getitem__(self, k):
        if k == "lambda":
            return self.lambda_
        if hasattr(self, k):
            return getattr(self, k)
        return self.extra[k]

    def get(self, k, default=None):
        try:
            return self[k]
        except KeyError:
            return default

    def __contains__(self, k):
        return k == "lambda" or hasattr(self, k) or k in self.extra

    @property
    def is_test(self) -> bool:
        return bool(self.test)

    @property
    def range_img_size(self) -> Tuple[int, int]:
        # (H/2, 2W) panoramic range image (reference nets/fnet.py:19)
        return (self.raw_cam_img_size[0] // 2, self.raw_cam_img_size[1] * 2)

    @property
    def input_img_size(self) -> Tuple[int, int]:
        # network image input is half-res of the raw camera image
        # (reference data_loader/loader_utils.py:111-112)
        return (self.raw_cam_img_size[0] // 2, self.raw_cam_img_size[1] // 2)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        d = dict(d)
        if "lambda" in d:
            d["lambda_"] = d.pop("lambda")
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        extra = {k: v for k, v in d.items() if k not in known}
        cfg = cls(**kwargs, extra=extra) if "extra" not in kwargs else cls(**kwargs)
        if extra and "extra" in kwargs:
            cfg.extra.update(extra)
        cfg.lidar_fov_rad = _as_tuple2(cfg.lidar_fov_rad)
        cfg.raw_cam_img_size = _as_tuple2(cfg.raw_cam_img_size)
        cfg.validate()
        return cfg

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["lambda"] = d.pop("lambda_")
        extra = d.pop("extra")
        d.update(extra)
        return d

    def save_yaml(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    def validate(self) -> None:
        assert self.dim == 3, "only 3-d point clouds are supported"
        assert len(self.scale_map) == len(self.lattice_capacity), (
            f"scale_map has {len(self.scale_map)} scales but lattice_capacity "
            f"has {len(self.lattice_capacity)} entries"
        )
        assert self.num_points > 0
        assert self.raw_cam_img_size[0] % 2 == 0 and self.raw_cam_img_size[1] % 2 == 0
