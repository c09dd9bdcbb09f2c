"""Full-state (.npz + Adam moments) snapshot round-trip.

Pins the lossless-resume path: orbax checkpoint -> export_weights.py
--with-opt -> load_pretrained restores params, batch_stats, optimizer
moments, AND step bit-exactly, so a resumed run skips the fresh-Adam
re-warm transient (docs/ACCURACY.md).  Uses a hand-built param tree (no
model init) to stay cheap; the optimizer includes the lr_scale_keys chain
wrapper so the named-path matching is exercised on the real segment-6a
optimizer topology.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.config import Config
from efgh_tpu.train import create_optimizer, save_checkpoint
from efgh_tpu.train.loop import load_pretrained
from efgh_tpu.train.state import TrainState, flat_path_leaves


def _tiny_state(cfg, seed=0):
    k = jax.random.PRNGKey(seed)
    params = {
        "E": {"Conv_0": {"kernel": jax.random.normal(k, (3, 3, 4, 8)),
                         "bias": jnp.zeros((8,))}},
        "G": {"Dense_0": {"kernel": jax.random.normal(k, (8, 2))}},
    }
    batch_stats = {"E": {"BatchNorm_0": {"mean": jnp.ones((8,)),
                                         "var": jnp.full((8,), 2.0)}}}
    tx = create_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


@pytest.fixture(scope="module")
def cfg():
    return Config.from_dict({"lr": 1e-4, "lr_scale_keys": {"G/": 10.0}})


def _export(ckpt_dir, out, with_opt):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.export_weights import export

    return export(os.path.join(ckpt_dir, "checkpoint"), out,
                  with_opt=with_opt)


def _saved_state(cfg, tmp, step=777):
    state = _tiny_state(cfg)
    # make the moments non-trivial so a mu/nu mixup would be caught
    mu = jax.tree_util.tree_map(lambda x: x * 0 + 0.25, state.params)
    nu = jax.tree_util.tree_map(lambda x: x * 0 + 9.0, state.params)
    adam = state.opt_state[0][0]
    new_adam = adam._replace(count=jnp.asarray(step, jnp.int32), mu=mu, nu=nu)
    opt = ((new_adam,) + tuple(state.opt_state[0][1:]),) + \
        tuple(state.opt_state[1:])
    return state.replace(step=jnp.asarray(step, jnp.int32), opt_state=opt)


def test_full_snapshot_roundtrip(cfg, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    saved = _saved_state(cfg, tmp_path)
    save_checkpoint(saved, ckpt_dir, is_best=False, iter_iterval=10**9)
    out = str(tmp_path / "full.npz")
    _export(ckpt_dir, out, with_opt=True)

    fresh = _tiny_state(cfg, seed=1)
    loaded = load_pretrained(out, fresh, cfg)

    assert int(loaded.step) == 777
    for (pa, a), (pb, b) in zip(flat_path_leaves(saved.opt_state),
                                flat_path_leaves(loaded.opt_state)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=pa)
    for (pa, a), (pb, b) in zip(flat_path_leaves(saved.params),
                                flat_path_leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=pa)


def test_weights_only_snapshot_keeps_fresh_opt(cfg, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    saved = _saved_state(cfg, tmp_path)
    save_checkpoint(saved, ckpt_dir, is_best=False, iter_iterval=10**9)
    out = str(tmp_path / "weights.npz")
    _export(ckpt_dir, out, with_opt=False)

    fresh = _tiny_state(cfg, seed=1)
    loaded = load_pretrained(out, fresh, cfg)
    # weights land, but step stays 0 (-> pretrained_only_start semantics)
    # and the optimizer is untouched fresh state
    assert int(loaded.step) == 0
    adam = loaded.opt_state[0][0]
    assert int(adam.count) == 0
    assert float(jax.tree_util.tree_leaves(adam.mu)[0].sum()) == 0.0


def test_ema_shadow_roundtrip(cfg, tmp_path):
    """ema_decay > 0 lineages: the shadow rides in the --with-opt snapshot
    and restores bit-exactly (ADVICE r4 — a missing shadow would silently
    poison test(), which preferentially evaluates ema_params)."""
    ckpt_dir = str(tmp_path / "ckpt")
    saved = _saved_state(cfg, tmp_path)
    ema = jax.tree_util.tree_map(lambda x: x + 1.0, saved.params)
    saved = saved.replace(ema_params=ema)
    save_checkpoint(saved, ckpt_dir, is_best=False, iter_iterval=10**9)
    out = str(tmp_path / "full.npz")
    _export(ckpt_dir, out, with_opt=True)

    fresh = _tiny_state(cfg, seed=1)
    fresh = fresh.replace(ema_params=jax.tree_util.tree_map(
        jnp.copy, fresh.params))
    loaded = load_pretrained(out, fresh, cfg)
    for (pa, a), (pb, b) in zip(flat_path_leaves(saved.ema_params),
                                flat_path_leaves(loaded.ema_params)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=pa)


def test_full_snapshot_without_ema_rejected_for_ema_run(cfg, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    saved = _saved_state(cfg, tmp_path)  # no shadow in the source run
    save_checkpoint(saved, ckpt_dir, is_best=False, iter_iterval=10**9)
    out = str(tmp_path / "full.npz")
    _export(ckpt_dir, out, with_opt=True)

    fresh = _tiny_state(cfg, seed=1)
    fresh = fresh.replace(ema_params=jax.tree_util.tree_map(
        jnp.copy, fresh.params))
    with pytest.raises(ValueError, match="ema_params"):
        load_pretrained(out, fresh, cfg)


def test_weights_only_snapshot_seeds_ema_from_params(cfg, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    saved = _saved_state(cfg, tmp_path)
    save_checkpoint(saved, ckpt_dir, is_best=False, iter_iterval=10**9)
    out = str(tmp_path / "weights.npz")
    _export(ckpt_dir, out, with_opt=False)

    fresh = _tiny_state(cfg, seed=1)
    fresh = fresh.replace(ema_params=jax.tree_util.tree_map(
        jnp.copy, fresh.params))
    loaded = load_pretrained(out, fresh, cfg)
    # a fresh segment start: the shadow tracks the LOADED weights, not the
    # fresh-init ones
    for (pa, a), (pb, b) in zip(flat_path_leaves(loaded.params),
                                flat_path_leaves(loaded.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=pa)


def test_full_snapshot_rejects_optimizer_mismatch(cfg, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    saved = _saved_state(cfg, tmp_path)
    save_checkpoint(saved, ckpt_dir, is_best=False, iter_iterval=10**9)
    out = str(tmp_path / "full.npz")
    _export(ckpt_dir, out, with_opt=True)

    # a different optimizer config (weight_decay adds a chain stage) must
    # fail loudly, not silently misalign moments
    other = Config.from_dict({"lr": 1e-4, "weight_decay": 0.01})
    fresh = _tiny_state(other, seed=1)
    with pytest.raises(ValueError):
        load_pretrained(out, fresh, other)
