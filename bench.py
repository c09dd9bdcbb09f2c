#!/usr/bin/env python
"""Benchmark: registration pairs/sec on one TPU chip (flagship RELLIS shapes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: the reference PyTorch implementation measured on this
host's CPU at 0.033788 pairs/sec (29.6 s/pair, 65536 points, 450x800 image,
lattice build *excluded* from its timed loop — charitable to the reference;
see benchmarks/measure_reference_cpu.py and benchmarks/reference_cpu.json).
vs_baseline is the speedup over that reference; the BASELINE.md target is 10.

Timing discipline (CLAUDE.md): the remote backend returns CACHED results for
a repeated (executable, argument-buffers) pair — measured 0.5 ms/call for a
300 ms forward.  Cycling distinct pre-staged batches is NOT enough (the cycle
repeats); every timed call must consume the previous call's output so no
argument tuple ever repeats.  The infer loop threads out[0,0,0]*0 into an
input (bit-identical values, fresh buffer + true data dependency); the train
loop is inherently chained through the donated state.

Modes (env):
  EFGH_BENCH_MODE=infer (default) — jitted forward pass, pairs/s.
  EFGH_BENCH_MODE=train           — full train step (fwd+loss+bwd+Adam),
                                    pairs/s; reported vs the same reference
                                    inference baseline (conservative: the
                                    reference never published a train rate).
  EFGH_BENCH_BATCH / EFGH_BENCH_ITERS / EFGH_BENCH_VARIANTS tune shape/loop.
"""

import json
import os
import sys
import time

REFERENCE_CPU_PAIRS_PER_SEC = 0.033788  # benchmarks/reference_cpu.json


def enable_compile_cache():
    """Persistent XLA compile cache (works through this host's tunnel —
    CLAUDE.md): a repeated identical invocation loads executables in ~10 s
    instead of recompiling for ~5 min.  Must run before the first
    compilation; safe to call whether or not jax is already imported."""
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".cache", "xla"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)


def _measure(mode: str, batch: int, iters: int, n_runs: int,
             n_variants: int, force_sort: bool) -> dict:
    """One full measurement: build the model, stage inputs, compile, time.

    Everything jitted is (re)built HERE so a retry gets fresh function
    objects — jax's trace cache is keyed on the function object, and
    re-jitting the same body after set_merge_backend would silently reuse
    the OLD backend's jaxpr (CLAUDE.md).  `force_sort` pins the lax.sort
    merge regardless of env/probe (the degraded-retry path after an
    implausible-rate guard trip)."""
    t_start = time.time()
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
        # EFGH_BENCH_REMAT=1: rematerialize tower activations in backward
        # (the batch>=2 train-mode HBM fix, docs/PERFORMANCE.md)
        "remat": os.environ.get("EFGH_BENCH_REMAT", "0") == "1",
    })
    model = build_model(cfg)
    merge = os.environ.get("EFGH_BENCH_MERGE")  # sort | pallas (A/B knob)
    from efgh_tpu.ops.lattice import set_merge_backend

    if force_sort:
        merge = "sort"
        set_merge_backend("sort")
    elif merge:
        set_merge_backend(merge)
    else:
        # probe-resolved auto.  History: round 2-3 observed stale results /
        # client panics on REPEATED Pallas executions through one tunnel
        # host, so bench forced lax.sort.  Round 4's executable-size bisect
        # (benchmarks/pallas_bisect.py) re-ran every stage up to the FULL
        # forward 4x on chained inputs against the sort build — all
        # bit-exact on the current host — so auto (probe + cached verdict)
        # is the default again.  The implausible-rate guard below still
        # refuses stale-result garbage if a future transport regresses.
        set_merge_backend(None)
    # device-resident inputs: the bench measures chip throughput; the input
    # pipeline overlaps transfers in training/serving (and this host's
    # tunnel link is far slower than any production interconnect).
    # n_variants DISTINCT batches, cycled, per the timing-discipline rule.
    keys = ("pc", "img", "calib", "A")
    variants = []
    for seed in range(n_variants):
        b = _make_batch(cfg, batch, seed=seed)
        variants.append(tuple(jax.device_put(b[k]) for k in keys))

    # init at batch 1: params are batch-independent, and a full-batch init
    # would trace the fused whole-forward at the target batch — exactly the
    # pathological batch-8 compile the split mode exists to avoid
    init = jax.jit(lambda rng, pc, img, calib, A: model.init(
        rng, pc, img, calib, A, train=False))
    variables = init(jax.random.PRNGKey(0),
                     *(v[:1] for v in variants[0]))
    _stage = time.time()
    if os.environ.get("EFGH_BENCH_VERBOSE"):
        print(f"[bench] init done t={_stage - t_start:.0f}s",
              file=sys.stderr, flush=True)

    if mode == "train":
        from efgh_tpu.losses import EFGHCriterion
        from efgh_tpu.train import create_optimizer, create_state, \
            make_train_step

        tgt = _make_batch(cfg, batch, seed=0)
        state = create_state(model, cfg, tgt, jax.random.PRNGKey(0))
        criterion = EFGHCriterion(cfg)
        step = make_train_step(model, criterion, create_optimizer(cfg))
        batches = []
        for seed in range(n_variants):
            full = _make_batch(cfg, batch, seed=seed)
            db = {k: full[k] for k in keys}
            db["gts"] = full["gts"]
            batches.append(jax.device_put(db))
        # compile + warmup (donated buffers: step returns a fresh state)
        t_c = time.time()
        state, out = step(state, batches[0])
        jax.block_until_ready(out["losses"]["total"])
        compile_s = time.time() - t_c
        dts = []
        for _ in range(n_runs):
            t0 = time.time()
            for i in range(iters):
                state, out = step(state, batches[(i + 1) % n_variants])
            jax.block_until_ready(out["losses"]["total"])
            dts.append((time.time() - t0) / iters)
        metric = "rellis_train_pairs_per_sec_per_chip"
    else:
        if os.environ.get("EFGH_BENCH_SPLIT", "0") == "1":
            # two-stage jit: the 5-scale vmapped lattice pyramid compiles
            # separately from the conv towers.  At batch >= 8 the fused
            # whole-forward graph hits a pathological XLA compile
            # (docs/PERFORMANCE.md batch table); splitting bounds it.
            import jax.numpy as jnp

            def build_pyr(pc):
                from efgh_tpu.ops.lattice import build_lattice_pyramid

                sm = tuple((float(s), int(r)) for s, r in cfg.scale_map)
                caps = tuple(int(c) for c in cfg.lattice_capacity)
                one = lambda p: build_lattice_pyramid(p, sm, caps)
                # the batch-vmapped pyramid is THE pathological compile at
                # batch >= 8 (> 16 min alone; conv towers take 58 s —
                # benchmarks/pyramid_compile_repro.py); lax.map compiles
                # the body once and loops, bounding it
                if pc.shape[0] >= 8:
                    return jax.lax.map(one, pc)
                return jax.vmap(one)(pc)

            pyr_fn = jax.jit(build_pyr)
            net_fn = jax.jit(
                lambda v, pc, img, calib, A, pyr, prev: model.apply(
                    v, pc + prev[0, 0, 0] * 0.0, img, calib, A, pyramid=pyr,
                    train=False)["cam_T_velo"])

            def fwd(v, pc, img, calib, A, prev):
                return net_fn(v, pc, img, calib, A, pyr_fn(pc), prev)

            split_merge = (None if force_sort
                           else os.environ.get("EFGH_BENCH_SPLIT_MERGE"))
            if split_merge:
                # ship the Pallas merge for the PYRAMID executable alone:
                # the backend is read at trace time, so trace pyr_fn now
                # under the requested backend, then restore for net_fn
                # (which takes the pyramid as an input and contains no
                # merge).  This is the executable-size exploit from the
                # round-3 verdict: the small pyramid executable may execute
                # Pallas reliably where the fused full forward does not
                # (bisect evidence: benchmarks/pallas_bisect.py).
                set_merge_backend(split_merge)
                t_p = time.time()
                jax.block_until_ready(pyr_fn(variants[0][0]))
                set_merge_backend(merge or "sort")
                print(f"[bench] pyramid stage traced with merge="
                      f"{split_merge} ({time.time() - t_p:.0f}s)",
                      file=sys.stderr, flush=True)
            elif os.environ.get("EFGH_BENCH_VERBOSE"):
                t_p = time.time()
                jax.block_until_ready(pyr_fn(variants[0][0]))
                print(f"[bench] pyramid-stage compile "
                      f"{time.time() - t_p:.0f}s", file=sys.stderr,
                      flush=True)
        else:
            # the previous output chains into this call's input INSIDE the
            # jit (same values: x + y*0; fresh buffer + a true data
            # dependency).  This defeats the remote backend's
            # per-(executable, buffers) result cache without issuing eager
            # chaining ops — each eager op is its own tunnel round-trip
            # and was costing ~100 ms/call of phantom "wall clock"
            fwd = jax.jit(lambda v, pc, img, calib, A, prev: model.apply(
                v, pc + prev[0, 0, 0] * 0.0, img, calib, A,
                train=False)["cam_T_velo"])
        # compile + warmup (prev has the output's own (B,3,4) shape/dtype so
        # the timed calls reuse this exact executable)
        import jax.numpy as jnp

        prev0 = jnp.zeros((batch, 3, 4), jnp.float32)
        t_c = time.time()
        out = jax.block_until_ready(fwd(variables, *variants[0], prev0))
        compile_s = time.time() - t_c
        if out.shape != prev0.shape or out.dtype != prev0.dtype:
            raise RuntimeError(
                f"chain mismatch: out {out.shape}/{out.dtype} vs "
                f"prev {prev0.shape}/{prev0.dtype}")
        dts = []
        step_i = 0
        for _ in range(n_runs):
            t0 = time.time()
            for _ in range(iters):
                step_i += 1
                pc, img, calib, a = variants[step_i % n_variants]
                out = fwd(variables, pc, img, calib, a, out)
            jax.block_until_ready(out)
            dts.append((time.time() - t0) / iters)
        metric = "rellis_pairs_per_sec_per_chip"

    dt = sorted(dts)[len(dts) // 2]  # median run
    return {
        "metric": metric,
        "value": round(batch / dt, 3),
        "unit": "pairs/s",
        "vs_baseline": round(batch / dt / REFERENCE_CPU_PAIRS_PER_SEC, 1),
        "runs_pairs_per_sec": [round(batch / d, 3) for d in dts],
        "batch": batch,
        "iters_per_run": iters,
        "compile_s": round(compile_s, 1),
    }


def main():
    enable_compile_cache()
    mode = os.environ.get("EFGH_BENCH_MODE", "infer")
    # train at production shapes OOMs HBM at batch 2 (G U-Net activations in
    # the backward pass); batch 1 fits. docs/PERFORMANCE.md tracks this.
    default_batch = "1" if mode == "train" else "2"
    batch = int(os.environ.get("EFGH_BENCH_BATCH", default_batch))
    iters = int(os.environ.get("EFGH_BENCH_ITERS", "24"))
    # the official number is the MEDIAN of n_runs timed loops: single-run
    # wall clock through this host's tunnel varies up to 1.8x between
    # identical invocations (docs/PERFORMANCE.md), which is how r01/r02
    # recorded 6.1 vs 4.3 pairs/s for the same code
    n_runs = int(os.environ.get("EFGH_BENCH_RUNS", "3"))
    n_variants = int(os.environ.get("EFGH_BENCH_VARIANTS", "4"))

    # plausibility guard: device self-time alone bounds this workload at
    # ~6.2 pairs/s/chip on v5e (docs/PERFORMANCE.md roofline); a rate far
    # above that means the transport served stale/cached results and the
    # number is garbage.  Round 4 lost its scoreboard entry to exactly this
    # (BENCH_r04.json: 2202->3891 "pairs/s", rc 1), so a guard trip now
    # DEGRADES instead of aborting: force the lax.sort merge, rebuild every
    # jitted closure fresh (trace-cache gotcha), re-run once, and report
    # with "degraded": true.  Exit 1 only if the retry is also garbage.
    max_sane = float(os.environ.get("EFGH_BENCH_MAX_SANE", "50"))
    res = _measure(mode, batch, iters, n_runs, n_variants, force_sort=False)
    if res["value"] > max_sane:
        first = res
        print(f"[bench] implausible rate {first['value']:.1f} pairs/s "
              f"(> {max_sane}): transport served stale results; retrying "
              "once with forced sort merge", file=sys.stderr, flush=True)
        res = _measure(mode, batch, iters, n_runs, n_variants,
                       force_sort=True)
        if res["value"] > max_sane:
            print(json.dumps({
                "error": f"implausible rate {res['value']:.1f} pairs/s "
                         f"(> {max_sane}) even after the forced-sort retry: "
                         "transport is serving stale results",
                "metric": res["metric"],
                "runs_pairs_per_sec": res["runs_pairs_per_sec"],
                "first_attempt_runs": first["runs_pairs_per_sec"],
            }))
            raise SystemExit(1)
        res["degraded"] = True
        res["first_attempt_runs"] = first["runs_pairs_per_sec"]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
