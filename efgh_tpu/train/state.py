"""Train state + optimizer (reference main.py:178-198, common/helper.py:28-38)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from efgh_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA shadow of params when cfg.ema_decay > 0, else None (an empty
    # pytree subtree — checkpoints stay compatible either way)
    ema_params: Any = None


def lr_schedule(cfg: Config):
    """lr * 0.7^(iter // 50000), decay-only
    (reference common/helper.py:28-38), with an optional linear warmup
    over the first cfg.lr_warmup iters (no reference equivalent)."""

    warmup = int(getattr(cfg, "lr_warmup", 0) or 0)

    def schedule(step):
        lr = cfg.lr * (0.7 ** (step // 50000))
        if warmup:
            lr = lr * jnp.minimum(1.0, (step + 1.0) / warmup)
        return lr

    return schedule


def _scale_updates_by_path(scale_keys: Dict[str, float]
                           ) -> optax.GradientTransformation:
    """Stateless per-branch update scaling: multiply the (post-Adam) update
    of every param whose '/'-joined path contains a key by its factor.
    Scaling UPDATES is the only way to speed a branch up under Adam —
    gradient/loss-lambda scaling is normalized away per-parameter."""
    keys = dict(scale_keys)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def walk(path, u):
            p = "/".join(str(k.key) for k in path if hasattr(k, "key"))
            f = 1.0
            for key, fac in keys.items():
                if key in p:
                    f *= float(fac)
            return u * f if f != 1.0 else u

        return jax.tree_util.tree_map_with_path(walk, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def create_optimizer(cfg: Config) -> optax.GradientTransformation:
    tx = optax.adam(learning_rate=lr_schedule(cfg))
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    scale_keys = dict(getattr(cfg, "lr_scale_keys", {}) or {})
    if scale_keys:
        tx = optax.chain(tx, _scale_updates_by_path(scale_keys))
    if cfg.grad_false_keys:
        # freeze parameter subtrees whose path contains any listed key
        # (reference main.py:226-235)
        frozen_keys = tuple(cfg.grad_false_keys)

        def label(params):
            def walk(path, x):
                p = "/".join(str(k.key) for k in path if hasattr(k, "key"))
                return "frozen" if any(f in p for f in frozen_keys) else "train"

            return jax.tree_util.tree_map_with_path(walk, params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label
        )
    return tx


def create_state(model, cfg: Config, sample_batch, rng) -> TrainState:
    # jit the init: an eager linen init dispatches thousands of small device
    # ops (very slow over remote-device links)
    init = jax.jit(
        lambda r, pc, img, calib, A: model.init(r, pc, img, calib, A,
                                                train=False)
    )
    variables = init(
        rng,
        jnp.asarray(sample_batch["pc"]),
        jnp.asarray(sample_batch["img"]),
        jnp.asarray(sample_batch["calib"]),
        jnp.asarray(sample_batch["A"]),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = create_optimizer(cfg)
    # the shadow must be distinct buffers: the train step donates the whole
    # state, and aliased params/ema leaves would be donated twice
    ema = (jax.tree_util.tree_map(jnp.copy, params)
           if float(getattr(cfg, "ema_decay", 0.0) or 0.0) > 0 else None)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=ema,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def flat_path_leaves(tree):
    """(path-string, leaf) pairs for any pytree, with path elements drawn
    from dict keys, namedtuple FIELD NAMES, and sequence indices.

    The point of naming fields (instead of flattening positionally) is that
    the same optax state produces the SAME path strings whether it is the
    live namedtuple structure (GetAttrKey) or its orbax raw-restore image
    (nested dicts keyed by field name) — so a full-state .npz snapshot can
    be matched key-by-key against a freshly initialized optimizer without
    trusting leaf order (ScaleByAdamState's mu/nu are shape-identical, so
    an order mixup would corrupt moments silently)."""
    out = []
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for k in kpath:
            if hasattr(k, "key"):  # DictKey / FlattenedIndexKey
                parts.append(str(k.key))
            elif hasattr(k, "name"):  # GetAttrKey (namedtuple fields)
                parts.append(str(k.name))
            elif hasattr(k, "idx"):  # SequenceKey (tuples / chain stages)
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        out.append(("/".join(parts), leaf))
    return out
