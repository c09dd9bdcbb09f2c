#!/usr/bin/env python
"""Benchmark: registration pairs/sec on one TPU chip (flagship RELLIS shapes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: the reference PyTorch implementation measured on this
host's CPU at 0.033788 pairs/sec (29.6 s/pair, 65536 points, 450x800 image,
lattice build *excluded* from its timed loop — charitable to the reference;
see benchmarks/measure_reference_cpu.py and benchmarks/reference_cpu.json).
vs_baseline is the speedup over that reference; the BASELINE.md target is 10.
"""

import json
import os
import sys
import time

REFERENCE_CPU_PAIRS_PER_SEC = 0.033788  # benchmarks/reference_cpu.json


def main():
    batch = int(os.environ.get("EFGH_BENCH_BATCH", "2"))
    iters = int(os.environ.get("EFGH_BENCH_ITERS", "10"))

    import jax

    from efgh_tpu.config import Config
    from efgh_tpu.models import build_model
    from __graft_entry__ import _make_batch

    cfg = Config.from_dict({
        "dataset": "SYNTHETIC",
        "num_points": 65536,
        "raw_cam_img_size": [900, 1600],
        "lattice_capacity": [98304, 49152, 24576, 8192, 2048],
        "compute_dtype": "bfloat16",
    })
    model = build_model(cfg)
    b = _make_batch(cfg, batch)
    # device-resident inputs: the bench measures chip throughput; the input
    # pipeline overlaps transfers in training/serving (and this host's
    # tunnel link is far slower than any production interconnect)
    args = tuple(jax.device_put(b[k]) for k in ("pc", "img", "calib", "A"))

    init = jax.jit(lambda rng, pc, img, calib, A: model.init(
        rng, pc, img, calib, A, train=False))
    variables = init(jax.random.PRNGKey(0), *args)

    fwd = jax.jit(lambda v, pc, img, calib, A: model.apply(
        v, pc, img, calib, A, train=False)["cam_T_velo"])

    # compile + warmup
    out = jax.block_until_ready(fwd(variables, *args))
    t0 = time.time()
    for _ in range(iters):
        out = fwd(variables, *args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    pairs_per_sec = batch / dt

    print(json.dumps({
        "metric": "rellis_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_CPU_PAIRS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
