"""Model introspection.

The reference's debugging aid is a `check` flag that prints every
intermediate tensor shape on the first training iteration (reference
iterater.py:35, nets/enet.py:143-148 etc.).  Here: an abstract-evaluation
tabulation (no device compute) of the full module tree with shapes and
parameter counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tabulate_model(cfg, depth: int = 3) -> str:
    """Module table (name, input/output shapes, params) at config shapes."""
    import flax.linen as nn

    from efgh_tpu.models import build_model

    model = build_model(cfg)
    h, w = cfg.input_img_size
    pc = jnp.zeros((1, 3, cfg.num_points), jnp.float32)
    img = jnp.zeros((1, 3, h, w), jnp.float32)
    calib = jnp.zeros((1, 3, 4), jnp.float32)
    a = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    return nn.tabulate(
        model, jax.random.PRNGKey(0), depth=depth,
        compute_flops=False, compute_vjp_flops=False,
    )(pc, img, calib, a, train=False)


def shape_check(cfg) -> dict:
    """Abstract shapes of every backbone output at config sizes (the
    reference's `check=True` print pass, without running anything)."""
    from efgh_tpu.models import build_model

    model = build_model(cfg)
    h, w = cfg.input_img_size

    def fwd(rng):
        pc = jnp.zeros((1, 3, cfg.num_points), jnp.float32)
        img = jnp.zeros((1, 3, h, w), jnp.float32)
        calib = jnp.zeros((1, 3, 4), jnp.float32)
        a = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        variables = model.init(rng, pc, img, calib, a, train=False)
        return model.apply(variables, pc, img, calib, a, train=False)

    out = jax.eval_shape(fwd, jax.random.PRNGKey(0))
    return {k: tuple(v.shape) for k, v in out.items()
            if hasattr(v, "shape")}
