"""Roofline / MFU accounting for the flagship forward (and train step).

Publishes the numbers VERDICT r2 asked for: a per-op device-time table
(framework_op_stats from a one-shot `jax.profiler` trace — immune to this
host's tunnel wall-clock noise), the XLA whole-program FLOP count, and an
MFU estimate against the chip's bf16 peak.

Usage (on the TPU host):
    python benchmarks/roofline.py [batch] [infer|train]

Writes benchmarks/roofline_b{B}_{mode}.json and prints a markdown table for
docs/PERFORMANCE.md.

Measurement notes:
  * single traced execution per CLAUDE.md (repeated Pallas executions are
    unreliable through this tunnel; sort path is the default anyway);
  * device self-time only (host_or_device == device);
  * FLOPs come from the compiled executable's cost_analysis — XLA's static
    count of the optimized HLO (fusion changes the op mix, not the total
    meaningfully);
  * peak: v5e = 197 TFLOP/s bf16 per chip (2x for int8).  Other chips:
    override with EFGH_PEAK_TFLOPS.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = float(os.environ.get("EFGH_PEAK_TFLOPS", "197"))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mode = sys.argv[2] if len(sys.argv) > 2 else "infer"

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
        "remat": mode == "train",
        "pallas_merge": "off",
    })
    model = build_model(cfg)
    full = _make_batch(cfg, batch)
    keys = ("pc", "img", "calib", "A")
    args = tuple(jax.device_put(full[k]) for k in keys)

    init = jax.jit(lambda rng, pc, img, calib, A: model.init(
        rng, pc, img, calib, A, train=False))
    variables = init(jax.random.PRNGKey(0), *args)

    if mode == "train":
        from efgh_tpu.losses import EFGHCriterion
        from efgh_tpu.train import create_optimizer, create_state, \
            make_train_step

        state = create_state(model, cfg, full, jax.random.PRNGKey(0))
        criterion = EFGHCriterion(cfg)
        step = make_train_step(model, criterion, create_optimizer(cfg))
        db = {k: full[k] for k in keys}
        db["gts"] = full["gts"]
        db = jax.device_put(db)

        def run():
            nonlocal state
            state, out = step(state, db)
            jax.block_until_ready(out["losses"]["total"])

        lowered = None  # donated-state step: cost analysis via jit cache
        t0 = time.time()
        run()  # compile + warmup (also refreshes donated buffers)
        compile_s = time.time() - t0
        cost = None
    else:
        fwd = jax.jit(lambda v, pc, img, calib, A: model.apply(
            v, pc, img, calib, A, train=False)["cam_T_velo"])
        t0 = time.time()
        compiled = fwd.lower(variables, *args).compile()
        compile_s = time.time() - t0
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}

        def run():
            jax.block_until_ready(compiled(variables, *args))

        run()  # warmup execution outside the trace

    tdir = f"/tmp/roofline_b{batch}_{mode}"
    with jax.profiler.trace(tdir):
        run()

    from xprof.convert import raw_to_tool_data as rtd

    xs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
    table = json.loads(data)[0]
    cols = [c["id"] for c in table["cols"]]
    ops = []
    total_us = 0.0
    for row in table["rows"]:
        d = dict(zip(cols, [cc.get("v") if cc else None for cc in row["c"]]))
        if not str(d.get("host_or_device", "")).lower().startswith("d"):
            continue
        st = float(d.get("total_self_time") or 0.0)
        total_us += st
        ops.append({
            "operation": str(d.get("operation", "")),
            "category": str(d.get("category", "")),
            "occurrences": d.get("occurrences"),
            "self_time_us": st,
        })
    ops.sort(key=lambda o: -o["self_time_us"])

    device_s = total_us / 1e6
    result = {
        "batch": batch,
        "mode": mode,
        "compile_s": round(compile_s, 1),
        "device_time_ms": round(device_s * 1e3, 2),
        "device_ms_per_pair": round(device_s * 1e3 / batch, 2),
        "top_ops": [
            {**o, "self_time_us": round(o["self_time_us"], 1),
             "pct": round(100 * o["self_time_us"] / total_us, 1)}
            for o in ops[:25]
        ],
    }
    if cost:
        flops = float(cost.get("flops", 0.0))
        byt = float(cost.get("bytes accessed", 0.0))
        result["xla_flops"] = flops
        result["xla_bytes_accessed"] = byt
        result["gflops_per_pair"] = round(flops / batch / 1e9, 2)
        result["achieved_tflops"] = round(flops / device_s / 1e12, 3)
        result["mfu_pct_vs_bf16_peak"] = round(
            100 * flops / device_s / (PEAK_TFLOPS * 1e12), 2)
        if byt:
            result["achieved_GBps"] = round(byt / device_s / 1e9, 1)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"roofline_b{batch}_{mode}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "top_ops"}))
    print(f"\n| op | category | n | self ms | % |\n|---|---|---|---|---|")
    for o in result["top_ops"][:15]:
        print(f"| {o['operation'][:60]} | {o['category']} | "
              f"{o['occurrences']} | {o['self_time_us']/1e3:.2f} | "
              f"{o['pct']} |")
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
