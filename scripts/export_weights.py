"""Export model weights from an orbax checkpoint to a git-friendly .npz.

The training checkpoints live in the gitignored ckpt_dir and die with the
host (this environment rebuilds VMs between rounds — the round-2 trained
lineage was lost exactly this way).  This script snapshots the restorable
part of a run — params + batch_stats + step — into one compressed .npz
that can be committed, and that `pretrained_path: <file>.npz` loads back
(efgh_tpu/train/loop.py:load_pretrained).

Usage:
    python scripts/export_weights.py ckpts/synth/model_best params/foo.npz
    python scripts/export_weights.py ckpts/synth/checkpoint params/foo_full.npz --with-opt

By default optimizer state is not exported (Adam moments triple the size
and weights-only is right for cross-segment recipe changes).  `--with-opt`
additionally snapshots the optimizer state + step, keyed by NAMED tree
path (efgh_tpu/train/state.py:flat_path_leaves); `pretrained_path` then
restores it as a lossless resume — no fresh-Adam re-warm transient
(docs/ACCURACY.md) — provided the optimizer config (lr_scale_keys /
grad_false_keys / weight_decay) is unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export(ckpt_path: str, out_path: str, with_opt: bool = False) -> dict:
    import orbax.checkpoint as ocp
    from flax.traverse_util import flatten_dict

    ckpt_path = os.path.abspath(ckpt_path)
    if os.path.isdir(os.path.join(ckpt_path, "checkpoint")):
        ckpt_path = os.path.join(ckpt_path, "checkpoint")
    raw = ocp.StandardCheckpointer().restore(ckpt_path)

    flat = {}
    # ema_params rides along whenever the checkpoint carries it (ema_decay
    # > 0 runs): test() preferentially evaluates the EMA shadow, so a
    # snapshot without it would silently resume with a fresh-init shadow
    # (ADVICE r4).
    for tree_name in ("params", "batch_stats", "ema_params"):
        tree = raw.get(tree_name)
        if not tree:
            continue
        for kpath, leaf in flatten_dict(tree).items():
            flat[tree_name + "/" + "/".join(kpath)] = np.asarray(leaf)
    if with_opt:
        # named-path flatten so the loader can match against a freshly
        # initialized optax tree regardless of container types / leaf order
        from efgh_tpu.train.state import flat_path_leaves

        for pstr, leaf in flat_path_leaves(raw["opt_state"]):
            flat["opt_state/" + pstr] = np.asarray(leaf)
    flat["__step__"] = np.asarray(int(np.asarray(raw["step"])))

    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **flat)
    os.replace(tmp, out_path)
    return flat


def main():
    ckpt_path, out_path = sys.argv[1], sys.argv[2]
    flat = export(ckpt_path, out_path, with_opt="--with-opt" in sys.argv[3:])
    n_params = sum(int(v.size) for k, v in flat.items()
                   if k.startswith("params/"))
    mb = os.path.getsize(out_path) / 1e6
    print(f"wrote {out_path}: {len(flat) - 1} arrays, "
          f"{n_params / 1e6:.2f}M params, {mb:.1f} MB, "
          f"step {int(flat['__step__'])}")


if __name__ == "__main__":
    main()
