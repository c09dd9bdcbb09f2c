"""Orbax checkpointing with the reference's rotation policy.

Logical contents mirror the reference's torch checkpoint
{iter, state_dict, min_loss, optimizer} (reference iterater.py:82-89):
here {step, params, batch_stats, opt_state} plus a small metadata dict.
Rotation: latest copy under 'checkpoint', interval-stamped copies
'checkpoint_<iter>' with copies older than 5 intervals rolled off, and a
'model_best' copy (reference common/helper.py:40-61).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(state, ckpt_dir: str, is_best: bool, iter_iterval: int,
                    meta: Optional[Dict[str, Any]] = None,
                    step: Optional[int] = None) -> None:
    """`step` is the driver's iteration counter; state.step is one ahead of
    it at save time (the optimizer update increments first), which would
    never satisfy `step % iter_iterval == 0` — so interval-stamped copies
    only happen when the caller passes the true iteration."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else int(step)
    ckptr = _ckptr()

    latest = os.path.join(ckpt_dir, "checkpoint")
    if os.path.exists(latest):
        shutil.rmtree(latest)
    ckptr.save(latest, jax.device_get(state))
    ckptr.wait_until_finished()
    with open(latest + ".meta.json", "w") as f:
        json.dump(meta or {}, f)

    def _copy(dst):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(latest, dst)
        shutil.copyfile(latest + ".meta.json", dst + ".meta.json")

    if step % iter_iterval == 0:
        _copy(os.path.join(ckpt_dir, f"checkpoint_{step}"))

    if is_best:
        _copy(os.path.join(ckpt_dir, "model_best"))

    if step > 5 * iter_iterval:
        old = os.path.join(ckpt_dir, f"checkpoint_{step - 5 * iter_iterval}")
        if os.path.exists(old):
            shutil.rmtree(old)


def restore_checkpoint(path: str, target_state) -> tuple:
    """Returns (state, meta).  `target_state` provides the pytree structure.

    Checkpoints written before the TrainState.ema_params field existed lack
    that key in their on-disk tree; restore those against the legacy 4-field
    layout and graft the target's ema_params (None unless cfg.ema_decay > 0)
    back on."""
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "checkpoint")):
        path = os.path.join(path, "checkpoint")
    ckptr = _ckptr()
    target = jax.device_get(target_state)
    try:
        state = ckptr.restore(path, target=target)
    except ValueError as e:
        if "ema_params" not in str(e):
            raise
        from efgh_tpu.train.state import TrainState

        legacy = {"step": target.step, "params": target.params,
                  "batch_stats": target.batch_stats,
                  "opt_state": target.opt_state}
        r = ckptr.restore(path, target=legacy)
        # seed an enabled EMA shadow from the RESTORED weights (the legacy
        # run had no shadow; the template's is a copy of fresh-init params)
        ema = target.ema_params
        if ema is not None:
            ema = jax.tree_util.tree_map(lambda x: x.copy(), r["params"])
        state = TrainState(step=r["step"], params=r["params"],
                           batch_stats=r["batch_stats"],
                           opt_state=r["opt_state"],
                           ema_params=ema)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta
