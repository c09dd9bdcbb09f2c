#!/usr/bin/env python
"""Print the last N values of tensorboard scalars from a run directory.

Usage: python scripts/tb_scalars.py CKPT_DIR [TAG_SUBSTR] [N]

Host-side monitor for live training runs (reads the event files the
trainer's summary writer appends; never touches the TPU).  Typical use
while a segment trains: watch the per-axis validation translation errors
(valid_error/trs_*) that decide whether to extend the segment
(docs/DEVICE_WINDOW_R4.md).
"""
import sys

from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)


def main() -> None:
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "ckpts/synth_s3"
    substr = sys.argv[2] if len(sys.argv) > 2 else "valid"
    last_n = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    ea = EventAccumulator(run_dir, size_guidance={"scalars": 0})
    ea.Reload()
    tags = [t for t in ea.Tags()["scalars"] if substr in t]
    if not tags:
        print(f"no scalar tags matching {substr!r} in {run_dir}")
        return
    for tag in sorted(tags):
        events = ea.Scalars(tag)
        vals = ", ".join(f"{e.step}: {e.value:.4g}" for e in events[-last_n:])
        print(f"{tag:32s} {vals}")


if __name__ == "__main__":
    main()
