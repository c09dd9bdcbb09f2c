"""Training / validation / test drivers (reference iterater.py, valid.py,
test.py), with one compiled step function and data-parallel sharding.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efgh_tpu.config import Config
from efgh_tpu.losses import EFGHCriterion
from efgh_tpu.parallel import create_mesh, replicate, shard_batch
from efgh_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from efgh_tpu.train.metrics import Err, Lss
from efgh_tpu.train.state import TrainState, create_optimizer, create_state


def make_train_step(model, criterion: EFGHCriterion,
                    tx: optax.GradientTransformation,
                    ema_decay: float = 0.0):
    """One compiled SGD step: forward, loss, backward, Adam update.
    Donated state buffers keep HBM flat.  When state.ema_params is set
    (cfg.ema_decay > 0), the EMA shadow is folded into the same fused
    step."""

    def train_step(state: TrainState, batch):
        def loss_fn(params):
            pred, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pc"], batch["img"], batch["calib"], batch["A"],
                pyramid=batch.get("pyramid"),
                train=True, mutable=["batch_stats"],
            )
            losses, gt = criterion.compute_loss(batch["pc"], batch["gts"], pred)
            aux = (losses, mut["batch_stats"],
                   pred["sensor2_T_sensor1"], gt["sensor2_T_sensor1"])
            return losses["total"], aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_bs, pred_t, gt_t)), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = jnp.asarray(ema_decay, jnp.float32)
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                ema, params)
        new_state = TrainState(
            step=state.step + 1, params=params,
            batch_stats=new_bs, opt_state=opt_state, ema_params=ema,
        )
        return new_state, {"losses": losses, "pred_s2s1": pred_t,
                           "gt_s2s1": gt_t}

    return jax.jit(train_step, donate_argnums=(0,))


_PANEL_PRED_KEYS = ("e_l", "f_l", "g_l", "h_c", "eh_cam_T_velo",
                    "efh_cam_T_velo", "efgh_cam_T_velo", "f_score",
                    "g_depth", "g_mask")
_PANEL_GT_KEYS = ("e_l", "f_l", "g_l", "h_c", "f_score", "g_depth", "g_mask")


def make_eval_step(model, criterion: Optional[EFGHCriterion] = None,
                   with_loss: bool = True, with_panels: bool = False,
                   bn_mode: str = "running"):
    """bn_mode "running" evaluates with BN running statistics (reference
    parity); "batch" normalizes each sample by its own batch statistics —
    the semantics the batch-1 training recipe actually optimizes.  The
    reference inherits a large train/eval BN gap from that recipe
    (measured: 27deg vs 4deg RRE on identical data at 12k iters, synthetic);
    "batch" is the documented opt-in divergence that closes it (PARITY.md).
    """
    def eval_step(state: TrainState, batch):
        if bn_mode == "batch":
            pred, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["pc"], batch["img"], batch["calib"], batch["A"],
                pyramid=batch.get("pyramid"),
                train=True, mutable=["batch_stats"],
            )
        else:
            pred = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["pc"], batch["img"], batch["calib"], batch["A"],
                pyramid=batch.get("pyramid"),
                train=False,
            )
        out = {"pred_s2s1": pred["sensor2_T_sensor1"],
               "cam_T_velo": pred["cam_T_velo"]}
        if with_loss and criterion is not None:
            losses, gt = criterion.compute_loss(batch["pc"], batch["gts"], pred)
            out["losses"] = losses
            out["gt_s2s1"] = gt["sensor2_T_sensor1"]
            if with_panels:
                out["panel_pred"] = {k: pred[k] for k in _PANEL_PRED_KEYS}
                out["panel_gt"] = {k: gt[k] for k in _PANEL_GT_KEYS}
        elif "gts" in batch and "sensor2_T_sensor1" in batch["gts"]:
            out["gt_s2s1"] = batch["gts"]["sensor2_T_sensor1"]
            if with_panels:
                out["panel_pred"] = {k: pred[k] for k in _PANEL_PRED_KEYS}
        return out

    return jax.jit(eval_step)


def _device_batch(batch, mesh, pyr_fn=None):
    db = {k: batch[k] for k in ("pc", "img", "calib", "A")}
    db["gts"] = batch["gts"]
    db = shard_batch(db, mesh)
    if pyr_fn is not None:
        # split-executable forward (cfg.split_forward): the lattice pyramid
        # compiles and executes separately from the towers.  Bounds the
        # batch>=8 fused-compile blowup for TRAINING (docs/PERFORMANCE.md)
        # and lets a host whose transport only executes small
        # Pallas-containing executables reliably ship the Pallas merge for
        # the pyramid stage alone (benchmarks/pallas_bisect.py evidence).
        db["pyramid"] = pyr_fn(db["pc"])
    return db


def make_pyramid_fn(cfg: Config, mesh):
    """Jitted standalone pyramid builder matching the model's in-forward
    build (same scale_map/capacities/batching => bit-identical lattice)."""
    from efgh_tpu.models.enet import batched_pyramid

    return jax.jit(lambda pc: batched_pyramid(
        pc, tuple(tuple(s) for s in cfg.scale_map),
        tuple(cfg.lattice_capacity),
        str(cfg.get("pyramid_batching", "vmap")), mesh.size))


def validate(pipeline, state, eval_step, mesh, dataset_name: str,
             loss_names, pyr_fn=None) -> Dict:
    """No-grad pass accumulating losses + errors (reference valid.py:13-68).
    Keeps the last batch/output pair for image-panel summaries (the reference
    logs panels from the last val batch, reference valid.py:56)."""
    lss = Lss(loss_names)
    err = Err(dataset_name)
    last = (None, None)
    for batch in pipeline:
        out = jax.device_get(
            eval_step(state, _device_batch(batch, mesh, pyr_fn)))
        bsz = batch["pc"].shape[0]
        lss.update(out["losses"], bsz)
        err.update_batch(np.asarray(out["gt_s2s1"]),
                         np.asarray(out["pred_s2s1"]))
        last = (batch, out)
    return {"loss": lss.dict, "err": err.dict, "last": last}


def summarize_panels(summary, mode: str, it: int, batch, out, cfg: Config):
    """Render and log the tensorboard image panels
    (reference common/helper.py:11-26 -> common/numpy_utils.py:8-179)."""
    if "panel_pred" not in out:
        return
    try:
        from efgh_tpu.utils.viz import image_draw
    except ImportError:
        return
    pred = {k: np.asarray(v) for k, v in out["panel_pred"].items()}
    gt = {k: np.asarray(v) for k, v in out.get("panel_gt", {}).items()}
    gt.update({k: np.asarray(v) for k, v in batch["gts"].items()})
    panels = image_draw(batch["pc"], batch["img"], batch["calib"], batch["A"],
                        gt, pred, cfg.raw_cam_img_size, cfg.lidar_fov_rad)
    for k, img in panels.items():
        arr = img if img.ndim == 2 else np.transpose(img, (2, 0, 1))
        summary.add_image(f"{mode}_image/{k}", arr, it)


def _rss_gb() -> float:
    """Current process resident set size in GB (0.0 if unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:
        pass
    return 0.0


class RssLimitExceeded(SystemExit):
    """Raised (as a clean SystemExit 75) when cfg.rss_limit_gb is crossed;
    the loop checkpoints first, so resume_path continues losslessly."""

    def __init__(self, rss_gb: float, limit_gb: float):
        super().__init__(75)
        self.rss_gb = rss_gb
        self.limit_gb = limit_gb


def _checkpoint_and_close(state, cfg: Config, meta, it, tracer) -> None:
    """Shared exit sequence for the RSS-watchdog, STOP-file, and loop-tail
    paths: write the latest checkpoint (+ meta) and close the tracer."""
    save_checkpoint(state, cfg.ckpt_dir, False, cfg.iter_iterval,
                    meta=meta, step=it)
    if tracer is not None:
        tracer.close()


def _pad_eval_batch(batch, bsz: int):
    """Pad a partial batch to `bsz` rows by repeating the final sample, so
    the leading axis always divides the mesh (parallel/mesh.py:38-41 —
    test() runs drop_last=False and a split not divisible by
    batch x devices would otherwise crash at the last batch).  Returns
    (padded_batch, n_real); callers must ignore rows >= n_real.  `fnames`
    keeps its true length — iterating it is the natural mask."""
    n_real = int(batch["pc"].shape[0])
    if n_real == bsz:
        return batch, n_real
    pad = bsz - n_real

    def _pad(a):
        a = np.asarray(a)
        return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)

    out = {}
    for k, v in batch.items():
        if k == "fnames":
            out[k] = list(v)
        elif isinstance(v, dict):
            out[k] = {kk: _pad(vv) for kk, vv in v.items()}
        else:
            out[k] = _pad(v)
    return out, n_real


def _force_sort_merge_under_auto(cfg: Config) -> None:
    """Long-running driver paths (train/test) force the lax.sort merge when
    `pallas_merge: auto`.  The per-host Pallas self-test (merge_probe.py) is
    necessary but NOT sufficient: on this project's remote-tunnel host the
    small-kernel probe passes 3/3 while the full forward executable still
    fails readback with INVALID_ARGUMENT (observed 2026-08-17).  Explicit
    `pallas_merge: "on"` still overrides; bench.py keeps the probe-resolved
    auto path (its exact loop is verified reliable on this transport)."""
    raw = cfg.get("pallas_merge", "auto")
    if raw in ("auto", None):
        from efgh_tpu.ops.lattice import set_merge_backend

        set_merge_backend("sort")


def train(cfg: Config, model, train_ds, val_ds, summary=None):
    """Main training driver (reference main.py:178-209 + iterater.py)."""
    from efgh_tpu.utils.preflight import check as preflight_check

    _force_sort_merge_under_auto(cfg)

    report = preflight_check(cfg, train=True)
    for w in report.warnings:
        print(f"[preflight][w] {w}")
    report.raise_on_error()

    # seed host-side sampling (pair choice, decalibration draws, subsampling)
    # — the analog of the reference's DataLoader worker_init_fn reseed
    # (reference main.py:85-92)
    import random as _random

    _random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    mesh = create_mesh(cfg.mesh_data)
    criterion = EFGHCriterion(cfg)
    tx = create_optimizer(cfg)
    pyr_fn = make_pyramid_fn(cfg, mesh) if cfg.get("split_forward") else None

    train_pipe = _pipeline(cfg, train_ds, shuffle=True)
    val_pipe = _pipeline(cfg, val_ds, shuffle=False)

    rng = jax.random.PRNGKey(cfg.seed)
    init_batch = next(iter(_pipeline(cfg, train_ds, shuffle=False)))
    state = create_state(model, cfg, init_batch, rng)
    state = replicate(state, mesh)
    start_meta = {"min_val_loss": float("inf"), "best_val_iter": -1}

    pretrained_only_start = False
    if cfg.pretrained_path:
        state = load_pretrained(str(cfg.pretrained_path), state, cfg)
        print(f"=> loaded pretrained weights from {cfg.pretrained_path}")
        # a FULL-state snapshot (opt_state + step in the npz) is a lossless
        # resume, not a fresh-Adam start: keep best-model tracking live and
        # skip the re-warm is_best suppression
        pretrained_only_start = int(state.step) == 0

    if cfg.resume_path:
        # The reference aborts when resume_path names no file
        # (reference main.py:149-160); here a missing file falls through to
        # fresh training instead so one config works for the whole lifetime
        # of a scripts/train_until_done.sh run (first launch fresh, every
        # RSS-limit restart resumes).
        rp = str(cfg.resume_path)
        rp_ckpt = rp
        if os.path.isdir(os.path.join(rp, "checkpoint")):
            rp_ckpt = os.path.join(rp, "checkpoint")
        if os.path.exists(rp_ckpt):
            state, meta = restore_checkpoint(rp, state)
            state = replicate(state, mesh)
            if meta:
                start_meta.update(meta)
            print(f"=> resumed from {rp} at iter {int(state.step)}")
            pretrained_only_start = False
        else:
            print(f"=> no checkpoint found at '{rp}' — starting fresh")

    trace_dir = cfg.get("trace_dir")
    tracer = None
    if trace_dir:
        from efgh_tpu.utils.profiling import TraceWindow

        tracer = TraceWindow(str(trace_dir), start=int(cfg.get("trace_start", 10)))

    from efgh_tpu.train.state import param_count
    print(f"=> total model parameters: {param_count(state.params)/1e6:.2f}M")

    train_step = make_train_step(
        model, criterion, tx,
        ema_decay=float(cfg.get("ema_decay", 0.0) or 0.0))
    eval_step = make_eval_step(model, criterion,
                               with_panels=summary is not None)

    lss = Lss(criterion.loss_name)
    err = Err(cfg.dataset)
    max_iter = cfg.epochs * len(train_pipe)
    rss_limit = float(cfg.get("rss_limit_gb", 0.0) or 0.0)
    # One-shot cooperative stop: `touch <ckpt_dir>/STOP` checkpoints at the
    # next logged iter and returns cleanly (exit 0 — also ends a
    # train_until_done.sh watchdog loop).  Without this, harvesting a live
    # run means SIGKILL, losing up to iter_iterval iters of progress.  The
    # marker is consumed (deleted) so the next launch trains normally.
    stop_file = os.path.join(str(cfg.ckpt_dir), "STOP")
    t_last = time.time()

    while int(state.step) < max_iter:
        for batch in train_pipe:
            it = int(state.step)
            if it >= max_iter:
                break
            if tracer is not None:
                tracer.step(it)
            state, out = train_step(state,
                                    _device_batch(batch, mesh, pyr_fn))
            bsz = batch["pc"].shape[0]
            out = jax.device_get(out)  # one transfer for all step metrics
            lss.update(out["losses"], bsz)
            err.update_batch(np.asarray(out["gt_s2s1"]),
                             np.asarray(out["pred_s2s1"]))

            if it % cfg.log_every == 0:
                dt = time.time() - t_last
                t_last = time.time()
                print(f"[i] iter {it} total {lss.dict['total'].avg:.2f} "
                      f"rot {err.dict.get('rot_mean', 0):.3f} "
                      f"trs {err.dict.get('trs_mean', 0):.3f} ({dt:.1f}s)")

            if it % cfg.iter_iterval == 0 and it != 0:
                if summary is not None:
                    _summarize(summary, "train", it, lss, err)
                    # the reference logs image panels for the train batch too
                    # (reference iterater.py:48-51 -> helper.py:11-26); the
                    # train step doesn't carry panels, so render them from an
                    # eval-step pass on the current batch
                    tb = _device_batch(batch, mesh, pyr_fn)
                    tout = jax.device_get(eval_step(state, tb))
                    summarize_panels(summary, "train", it, batch, tout, cfg)
                val = validate(val_pipe, state, eval_step, mesh, cfg.dataset,
                               criterion.loss_name, pyr_fn)
                if summary is not None:
                    _summarize_val(summary, it, val)
                    vb, vo = val["last"]
                    if vb is not None:
                        summarize_panels(summary, "valid", it, vb, vo, cfg)
                val_total = val["loss"]["total"].avg
                is_best = val_total < start_meta["min_val_loss"]
                if is_best and pretrained_only_start:
                    # an npz/pretrained-only start resets min_val_loss to
                    # inf AND sits inside the optimizer re-warm transient
                    # (docs/ACCURACY.md) — the first validation would crown
                    # regressed weights as model_best.  Skip that crowning
                    # once; later validations compete against inf normally.
                    print("[i] first validation after a pretrained-only "
                          "start: not updating model_best (re-warm "
                          "transient; docs/ACCURACY.md)")
                    is_best = False
                pretrained_only_start = False
                if is_best:
                    start_meta["min_val_loss"] = val_total
                    start_meta["best_val_iter"] = it
                    print("New min val loss!")
                save_checkpoint(state, cfg.ckpt_dir, is_best,
                                cfg.iter_iterval, meta=start_meta, step=it)
                print(f"Best val loss: {start_meta['min_val_loss']:.5f} at "
                      f"iter {start_meta['best_val_iter']}")
                lss.flush()
                err.flush()

            # RSS/STOP harvesting runs AFTER the boundary validation block so
            # a STOP landing on an iter_iterval boundary checkpoints the
            # refreshed meta/model_best instead of skipping them (ADVICE r3)
            if it % cfg.log_every == 0:
                if rss_limit:
                    rss = _rss_gb()
                    if rss > rss_limit:
                        _checkpoint_and_close(state, cfg, start_meta, it,
                                              tracer)
                        print(f"[w] host RSS {rss:.1f} GB > rss_limit_gb "
                              f"{rss_limit:g}; checkpointed at iter {it}, "
                              "exiting 75 — resume via resume_path in a "
                              "fresh process")
                        raise RssLimitExceeded(rss, rss_limit)
                if os.path.exists(stop_file):
                    _checkpoint_and_close(state, cfg, start_meta, it, tracer)
                    os.remove(stop_file)
                    print(f"[i] STOP file seen; checkpointed at iter {it} "
                          "and exiting cleanly")
                    return state

    _checkpoint_and_close(state, cfg, start_meta, None, tracer)
    return state


def load_pretrained(path: str, state: TrainState, cfg: Config) -> TrainState:
    """Load pretrained weights: a reference torch .pth.tar (converted with
    the `convert_dict` key remap, reference main.py:162-176,212-225) or an
    orbax checkpoint directory."""
    import dataclasses as _dc
    import os as _os

    if path.endswith((".pth", ".pth.tar", ".pt")):
        from efgh_tpu.train.convert import (
            convert_torch_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        params, batch_stats = convert_torch_state_dict(
            sd, num_bcn=len(cfg.scale_map), convert_dict=cfg.convert_dict
        )
        return _dc.replace(state, params=params, batch_stats=batch_stats)
    if path.endswith(".npz"):
        # git-committed weight snapshot (scripts/export_weights.py):
        # flat "params/<path>" / "batch_stats/<path>" arrays
        import numpy as _np
        from flax.traverse_util import unflatten_dict as _unflat

        with _np.load(path) as z:
            trees = {"params": {}, "batch_stats": {}, "ema_params": {}}
            opt_arrays = {}
            snap_step = int(z["__step__"]) if "__step__" in z.files else 0
            for key in z.files:
                head, _, rest = key.partition("/")
                if head in trees:
                    trees[head][tuple(rest.split("/"))] = z[key]
                elif head == "opt_state":
                    opt_arrays[rest] = z[key]
        params = _unflat(trees["params"])
        batch_stats = _unflat(trees["batch_stats"])
        snap_ema = _unflat(trees["ema_params"]) if trees["ema_params"] else None
        # structural check against the fresh-init trees: a wrong-arch
        # snapshot should fail loudly here, not at apply time.  One sanctioned
        # migration: with g_coord_channels on, a pre-knob 4-channel snapshot's
        # G/conv_d1 kernel is zero-padded along the input-channel axis — the
        # padded model computes EXACTLY the knob-off function at load time
        # (config.py g_coord_channels).
        coord_pad = bool(cfg.get("g_coord_channels", False))
        # Second sanctioned migration: with g_matching on, the zero-init
        # matching head's params don't exist in pre-knob snapshots — keep
        # their fresh (zero) init, which makes the migrated model compute
        # EXACTLY the knob-off function at load time (config.py g_matching).
        match_fill = bool(cfg.get("g_matching", False))

        def _is_matching_path(parts) -> bool:
            return any(p == "matching" or p.startswith("matching")
                       for p in parts)

        def _fill_matching(fresh_tree, snap_tree, label):
            from flax.traverse_util import flatten_dict as _flatten

            fresh_flat = _flatten(jax.device_get(fresh_tree))
            snap_flat = _flatten(snap_tree) if snap_tree else {}
            filled = [k for k in fresh_flat
                      if k not in snap_flat and _is_matching_path(k)]
            for kpath in filled:
                snap_flat[kpath] = _np.asarray(fresh_flat[kpath])
            if filled:
                print(f"=> g_matching: {len(filled)} {label} arrays absent "
                      "from the snapshot keep their fresh (zero) init")
            return _unflat(snap_flat)

        if match_fill:
            params = _fill_matching(state.params, params, "param")
            if snap_ema is not None and state.ema_params is not None:
                snap_ema = _fill_matching(state.ema_params, snap_ema,
                                          "ema")

        def _check(path, t, v):
            if t.shape != v.shape:
                names = [str(getattr(k, "key", k)) for k in path]
                if (coord_pad and "conv_d1" in names and v.ndim == 4
                        and t.shape[:2] + t.shape[3:] == v.shape[:2] + v.shape[3:]
                        and t.shape[2] > v.shape[2]):
                    pad = [(0, 0)] * 4
                    pad[2] = (0, t.shape[2] - v.shape[2])
                    print(f"=> zero-padding {'/'.join(names)} "
                          f"{v.shape} -> {t.shape} (g_coord_channels)")
                    return _np.pad(v, pad)
                raise ValueError(
                    f"snapshot shape {v.shape} != {t.shape} at {names}")
            return v

        params = jax.tree_util.tree_map_with_path(
            _check, jax.device_get(state.params), params)
        # EMA shadow (cfg.ema_decay > 0): restore it from the snapshot when
        # present; a weights-only snapshot seeds it from the loaded params
        # (fresh segment start).  A FULL-state snapshot without ema_params
        # is an error — test() preferentially evaluates the shadow, and a
        # fresh-init shadow would silently poison the resume (ADVICE r4).
        ema = state.ema_params
        if ema is not None:
            if snap_ema is not None:
                ema = jax.tree_util.tree_map_with_path(
                    _check, jax.device_get(ema), snap_ema)
            elif opt_arrays:
                raise ValueError(
                    "full-state snapshot carries opt_state but no ema_params "
                    "while cfg.ema_decay > 0 — resuming would continue with "
                    "a stale EMA shadow; re-export from a checkpoint that "
                    "has ema_params, or set ema_decay: 0")
            else:
                ema = jax.tree_util.tree_map(jnp.copy, params)
        elif snap_ema is not None:
            print("[w] snapshot has ema_params but cfg.ema_decay is 0 — "
                  "ignoring the shadow")
        if not opt_arrays:
            return _dc.replace(state, params=params, batch_stats=batch_stats,
                               ema_params=ema)
        # FULL-state snapshot (scripts/export_weights.py --with-opt):
        # restore the Adam moments + step so a resumed run continues the
        # segment losslessly instead of paying the documented ~1k-iter
        # fresh-Adam re-warm transient (docs/ACCURACY.md).  Matched by
        # named path, never by leaf order — mu/nu are shape-identical.
        from efgh_tpu.train.state import flat_path_leaves

        live = flat_path_leaves(state.opt_state)
        leaves = []
        for pstr, leaf in live:
            if pstr not in opt_arrays:
                if match_fill and _is_matching_path(pstr.split("/")):
                    # migrated matching head: fresh Adam moments (zeros)
                    # for the new params, lossless resume for the rest
                    leaves.append(jax.device_get(leaf))
                    continue
                raise ValueError(
                    f"full-state snapshot missing opt_state/{pstr} — was it "
                    "exported with the same optimizer config "
                    "(lr_scale_keys/grad_false_keys/weight_decay)?")
            v = opt_arrays.pop(pstr)
            shape = tuple(getattr(leaf, "shape", ()))
            if tuple(v.shape) != shape:
                raise ValueError(
                    f"opt_state/{pstr}: snapshot shape {v.shape} != {shape}")
            if hasattr(leaf, "dtype"):
                v = v.astype(leaf.dtype)
            leaves.append(v)
        if opt_arrays:
            raise ValueError(
                f"full-state snapshot has {len(opt_arrays)} opt_state arrays "
                f"the current optimizer lacks, e.g. {sorted(opt_arrays)[:3]}")
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state), leaves)
        print(f"=> full-state snapshot: optimizer moments + step "
              f"{snap_step} restored (lossless resume)")
        return _dc.replace(state, params=params, batch_stats=batch_stats,
                           ema_params=ema, opt_state=opt_state,
                           step=jnp.asarray(snap_step, jnp.int32))
    # orbax checkpoint: the saved opt_state was written with the PLAIN
    # optimizer (no grad_false_keys wrapping — the source run trained all
    # parameters), so restore against a plain-optimizer template and keep
    # only the weights.  This is what makes the reference's
    # pretrained_path + grad_false_keys combination (reference
    # main.py:162-176,226-235) work for our own checkpoints too.
    if cfg.grad_false_keys:
        plain_cfg = _dc.replace(cfg, grad_false_keys=[])
        plain_tx = create_optimizer(plain_cfg)
        template = _dc.replace(
            state, opt_state=plain_tx.init(jax.device_get(state.params)))
    else:
        template = state
    loaded, _ = restore_checkpoint(path, template)
    return _dc.replace(state, params=loaded.params,
                       batch_stats=loaded.batch_stats)


def test(cfg: Config, model, test_ds, state=None):
    """Deterministic evaluation writing the per-sample pred CSV
    (reference test.py:13-85)."""
    _force_sort_merge_under_auto(cfg)
    mesh = create_mesh(cfg.mesh_data)
    bn_mode = str(cfg.get("eval_bn", "running"))
    if bn_mode == "batch" and cfg.batch_size != 1:
        # "batch" means per-SAMPLE statistics (the batch-1 training
        # semantics); at batch>1 the result would depend on batch
        # composition and the padded last batch (drop_last=False here)
        raise ValueError(
            "eval_bn: 'batch' requires batch_size: 1 (per-sample statistics);"
            f" got batch_size={cfg.batch_size}")
    eval_step = make_eval_step(model, criterion=None, with_loss=False,
                               with_panels=bool(cfg.save_image),
                               bn_mode=bn_mode)

    pyr_fn = make_pyramid_fn(cfg, mesh) if cfg.get("split_forward") else None
    pipe = _pipeline(cfg, test_ds, shuffle=False, drop_last=False)
    if state is None:
        rng = jax.random.PRNGKey(0)
        init_batch = next(iter(pipe))
        state = create_state(model, cfg, init_batch, rng)
        if str(cfg.ckpt_path).endswith(".npz"):
            # git-committed weight snapshot (scripts/export_weights.py)
            state = load_pretrained(str(cfg.ckpt_path), state, cfg)
        else:
            state, _ = restore_checkpoint(str(cfg.ckpt_path), state)
    if getattr(state, "ema_params", None) is not None:
        # evaluate the EMA shadow weights (cfg.ema_decay > 0 at train time)
        import dataclasses as _dc

        state = _dc.replace(state, params=state.ema_params)
        print("=> evaluating EMA weights")
    state = replicate(state, mesh)

    n_recal = int(cfg.get("bn_recalibrate", 0))
    if n_recal:
        # SWA-style BN re-estimation: batch-1 training leaves the BN running
        # statistics far from the final weights' activation statistics (the
        # reference trains batch 1 and inherits the same eval-mode gap);
        # rebuild them with train-mode forwards over the train split before
        # evaluating.  Opt-in divergence from the reference — PARITY.md.
        from efgh_tpu.data import build_dataset

        recal_ds = build_dataset(cfg.dataset, "train", cfg)
        rpipe = _pipeline(cfg, recal_ds, shuffle=True)
        recal_step = jax.jit(lambda s, b: model.apply(
            {"params": s.params, "batch_stats": s.batch_stats},
            b["pc"], b["img"], b["calib"], b["A"],
            train=True, mutable=["batch_stats"])[1]["batch_stats"])
        seen = 0
        while seen < n_recal:
            got_any = False
            for batch in rpipe:
                got_any = True
                state = state.replace(
                    batch_stats=recal_step(state, _device_batch(batch, mesh)))
                seen += 1
                if seen >= n_recal:
                    break
            if not got_any:  # empty pipeline (e.g. split < batch_size)
                print(f"[w] bn_recalibrate: train pipeline yielded no "
                      f"batches; recalibrated over {seen} instead of "
                      f"{n_recal}")
                break
        print(f"=> BN statistics re-estimated over {n_recal} train batches")

    ckpt_name = os.path.basename(os.path.dirname(str(cfg.ckpt_path))) or "ckpt"
    rand_init_name = os.path.basename(str(cfg.rand_init)) or "rand_init.csv"
    save_dir = os.path.join("test", "preds", ckpt_name)
    os.makedirs(save_dir, exist_ok=True)
    if cfg.dataset == "KITTI_RAW":
        suffix = rand_init_name[20:-4]
        pred_path = os.path.join(save_dir, f"kitti_raw_pred_{suffix}.csv")
    else:
        pred_path = os.path.join(save_dir,
                                 rand_init_name.replace("rand_init", "pred"))
    print("Prediction csv:", pred_path)

    # KITTI_RAW predictions are reported in the unrectified-cam0 frame
    # (reference test.py:91-100,130-132)
    kitti_raw_premul = np.array(
        [[7.027555e-03, -9.999753e-01, 2.599616e-05, -7.137748e-03],
         [-2.254837e-03, -4.184312e-05, -9.999975e-01, -7.482656e-02],
         [9.999728e-01, 7.027479e-03, -2.255075e-03, -3.336324e-01],
         [0.0, 0.0, 0.0, 1.0]])
    kitti_raw_premul = np.array(
        [[0.999928, 0.00808599, -0.0088668, 0.0],
         [-0.0081232, 0.9999583, -0.00416975, 0.0],
         [0.00883271, 0.00424148, 0.999952, 0.0],
         [0.0, 0.0, 0.0, 1.0]]) @ kitti_raw_premul

    err = Err(cfg.dataset)
    with open(pred_path, "w") as f:
        for batch in pipe:
            # drop_last=False: pad a partial last batch to batch_size (mesh
            # divisibility) and mask the padded rows out of metrics/CSV
            batch, n_real = _pad_eval_batch(batch, cfg.batch_size)
            out = eval_step(state, _device_batch(batch, mesh, pyr_fn))
            pred = np.asarray(out["pred_s2s1"])[:n_real]
            gt = np.asarray(batch["gts"]["sensor2_T_sensor1"])[:n_real]
            err.update_batch(gt, pred)
            for b, fname in enumerate(batch["fnames"]):
                if cfg.dataset == "KITTI_RAW":
                    row = (kitti_raw_premul @ pred[b])[:3, :].flatten()
                    fname = fname.split("/")[-1]
                else:
                    row = pred[b, :3, :].flatten()
                f.write(fname + "," + ",".join(str(x) for x in row) + ",\n")

            if cfg.save_image and "panel_pred" in out:
                # per-sample PNG dumps (reference test.py:56-61; the
                # reference's missing-px crash is fixed in eval_image_draw)
                from efgh_tpu.utils.viz import eval_image_draw, save_image

                panels = eval_image_draw(
                    batch["pc"], batch["img"], batch["calib"], batch["A"],
                    batch["gts"],
                    {k: np.asarray(v) for k, v in out["panel_pred"].items()},
                    cfg.raw_cam_img_size, cfg.lidar_fov_rad,
                )
                base = batch["fnames"][0].replace("/", "_")
                for k, im in panels.items():
                    save_image(im, os.path.join(save_dir, f"{base}_{k}.png"))
    print("Error; ", " ".join(f"{k} {v:.4f}" for k, v in err.dict.items()))
    print("[i] Test finished.")
    return err.dict


def _pipeline(cfg: Config, ds, shuffle: bool, drop_last: bool = True):
    from efgh_tpu.data import DataPipeline

    return DataPipeline(ds, batch_size=cfg.batch_size, shuffle=shuffle,
                        num_workers=cfg.workers, drop_last=drop_last,
                        seed=cfg.seed,
                        worker_mode=str(cfg.get("loader_mode", "thread")))


def _summarize(summary, mode, it, lss, err):
    for k, m in lss.dict.items():
        summary.add_scalar(f"{mode}_loss/{k}", m.avg, it)
    for k, v in err.dict.items():
        summary.add_scalar(f"{mode}_error/{k}", v, it)


def _summarize_val(summary, it, val):
    for k, m in val["loss"].items():
        summary.add_scalar(f"valid_loss/{k}", m.avg, it)
    for k, v in val["err"].items():
        summary.add_scalar(f"valid_error/{k}", v, it)
