"""CLI entry point: python -m efgh_tpu.main <config.yaml>
(reference main.py:23-238; the interactive ckpt-dir wipe is replaced by a
non-interactive --fresh flag so headless runs never block).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

from efgh_tpu.config import Config


def main(argv=None):
    parser = argparse.ArgumentParser(description="EFGH-TPU")
    parser.add_argument("config", help="YAML config path")
    parser.add_argument("--fresh", action="store_true",
                        help="wipe the checkpoint dir before training")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize the JAX multi-host runtime (run one "
                             "process per host; mesh spans all hosts' devices)")
    args = parser.parse_args(argv)

    if args.distributed:
        import jax

        # multi-host over ICI/DCN: coordinator/process env comes from the
        # launcher (GKE/TPU-VM metadata); collectives compile through XLA —
        # no NCCL/MPI analog to configure
        jax.distributed.initialize()

    cfg = Config.from_yaml(args.config)

    if cfg.get("platform"):
        import jax

        # must land before anything traces; the env var alone is ignored on
        # hosts that prepend their device plugin to jax_platforms
        jax.config.update("jax_platforms", str(cfg.platform))

    from efgh_tpu.data import build_dataset
    from efgh_tpu.models import build_model
    from efgh_tpu.train import test as run_test
    from efgh_tpu.train import train as run_train

    model = build_model(cfg)

    if cfg.is_test:
        test_ds = build_dataset(cfg.dataset, "test", cfg)
        run_test(cfg, model, test_ds)
        return

    if args.fresh and os.path.isdir(cfg.ckpt_dir):
        shutil.rmtree(cfg.ckpt_dir)
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    cfg.save_yaml(os.path.join(cfg.ckpt_dir, "config.yaml"))

    summary = None
    try:
        from tensorboardX import SummaryWriter

        summary = SummaryWriter(cfg.ckpt_dir)
    except ImportError:
        print("[w] tensorboardX unavailable; scalar logging to stdout only")

    train_ds = build_dataset(cfg.dataset, "train", cfg)
    val_ds = build_dataset(cfg.dataset, "valid", cfg)
    run_train(cfg, model, train_ds, val_ds, summary=summary)


if __name__ == "__main__":
    main()
