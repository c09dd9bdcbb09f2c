"""Batch-scaling study driver: throughput + compile time vs batch size,
whole-forward jit vs the two-stage split (lattice pyramid jitted separately
from the conv towers, `EFGH_BENCH_SPLIT=1` in bench.py).

Round-2 finding this quantifies: the fused batch-8 forward hits a
pathological XLA compile (>30 min, aborted); the split is the planned
mitigation (ROADMAP r2 #4).  Each configuration runs in a fresh subprocess
under a hard timeout so one pathological compile can't wedge the study.

Usage (TPU host): python benchmarks/batch_scaling.py
Writes benchmarks/batch_scaling.json.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CONFIGS = [
    (1, 0), (2, 0), (4, 0), (8, 0),
    (2, 1), (4, 1), (8, 1),
]
TIMEOUT = {8: 1500}  # seconds; default 900


def main():
    results = []
    for batch, split in CONFIGS:
        env = dict(os.environ)
        env.update({
            "EFGH_BENCH_BATCH": str(batch),
            "EFGH_BENCH_SPLIT": str(split),
            "EFGH_BENCH_RUNS": "2",
            "EFGH_BENCH_ITERS": "12",
        })
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                env=env, cwd=ROOT, capture_output=True, text=True,
                timeout=TIMEOUT.get(batch, 900),
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("{")]
            rec = json.loads(line[-1]) if line else {
                "error": p.stderr[-500:]}
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout after {TIMEOUT.get(batch, 900)}s "
                            "(pathological compile)"}
        rec.update({"batch": batch, "split": bool(split),
                    "wall_s": round(time.time() - t0, 1)})
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(os.path.join(HERE, "batch_scaling.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
