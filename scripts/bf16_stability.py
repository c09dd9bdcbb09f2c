"""Scan a run's tensorboard events for bf16 numerical-stability evidence.

ROADMAP #6 / round-3 VERDICT #9: the synthetic recipe trains the whole
network in bfloat16 with loss lambdas up to 1000 (g_trs/g_mask); this
script audits every scalar the run logged — total and per-head losses,
errors, validation — for NaN/Inf events and prints per-tag summaries
(count, finite fraction, windowed first/last means) so the long-horizon
stability claim in docs/PERFORMANCE.md is backed by the actual series
rather than eyeballed log lines.

Usage: python scripts/bf16_stability.py [ckpt_dir ...]   (default ckpts/synth_s2)
"""

import math
import os
import sys


def scan(ckpt_dir: str):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    series = {}
    files = sorted(
        f for f in os.listdir(ckpt_dir) if f.startswith("events.out"))
    for f in files:
        acc = EventAccumulator(os.path.join(ckpt_dir, f),
                               size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            for ev in acc.Scalars(tag):
                series.setdefault(tag, []).append((ev.step, ev.value))

    rows = []
    bad_total = 0
    for tag in sorted(series):
        pts = sorted(series[tag])
        vals = [v for _, v in pts]
        bad = sum(1 for v in vals if not math.isfinite(v))
        bad_total += bad
        w = max(1, len(vals) // 10)
        rows.append((tag, len(vals), bad,
                     sum(vals[:w]) / w, sum(vals[-w:]) / w,
                     pts[0][0], pts[-1][0]))
    print(f"{'tag':38s} {'n':>5s} {'nonfinite':>9s} {'first10%':>12s} "
          f"{'last10%':>12s} {'steps':>15s}")
    for tag, n, bad, head, tail, s0, s1 in rows:
        print(f"{tag:38s} {n:5d} {bad:9d} {head:12.4f} {tail:12.4f} "
              f"{s0:7d}-{s1:<7d}")
    print(f"\nTOTAL nonfinite scalar events: {bad_total} across "
          f"{sum(r[1] for r in rows)} points in {len(rows)} tags")
    return bad_total


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["ckpts/synth_s2"]
    code = 0
    for d in dirs:
        print(f"== {d} ==")
        code |= 1 if scan(d) else 0
    sys.exit(code)
