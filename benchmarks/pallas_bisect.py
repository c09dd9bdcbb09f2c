#!/usr/bin/env python
"""Bisect the full-forward Pallas failure by executable size (VERDICT r3 #3).

Context: the Pallas bitonic-merge kernel passes the repeated-execution
probe (16x16384, 3 runs) on this host, but round-2/3 observed that the
FULL forward executable with the kernel inside fails on repeated
executions through the tunnel (client panic "index out of bounds" or
INVALID_ARGUMENT readback).  Never root-caused: executable-size- or
op-count-dependent (docs/PERFORMANCE.md).

This script grows the Pallas-containing executable toward the full
forward, one stage at a time.  Each stage is jitted once per merge
backend (sort, then pallas) and executed REPEATEDLY (default 4x) with a
fresh chained scalar input per run (fresh buffer -> no transport-level
result cache can serve it); the pallas run sequence must match the sort
run sequence exactly:

  stage 0  merge_only   the kernel alone at the probe scale (known-pass)
  stage 1  scale0       one build_lattice_scale at 65536 pts / cap 98304
  stage 2  pyramid      the full 5-scale pyramid (bench split executable)
  stage 3  pyramid_e    pyramid + E-net BCL towers (standalone Enet)
  stage 4  full         the complete forward (the known-bad endpoint)

The first failing stage (wrong bits, INVALID_ARGUMENT, client panic) pins
the regime.  If stage 2 passes, bench.py's split mode can ship the Pallas
merge for the pyramid executable alone.

Usage:  python benchmarks/pallas_bisect.py [--runs 4] [--stages 0,1,2,3,4]
Writes: benchmarks/pallas_bisect_result.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--stages", default="0,1,2,3,4")
    args = ap.parse_args()
    wanted = [int(s) for s in args.stages.split(",")]

    from bench import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from efgh_tpu.config import Config
    from efgh_tpu.models import build_model
    from efgh_tpu.models.enet import Enet
    from efgh_tpu.ops.lattice import (
        build_lattice_pyramid,
        build_lattice_scale,
        set_merge_backend,
    )
    from efgh_tpu.ops.pallas_merge import merge_rows_pallas
    from __graft_entry__ import _make_batch

    cfg = Config.from_dict({
        "dataset": "SYNTHETIC",
        "num_points": 65536,
        "raw_cam_img_size": [900, 1600],
        "lattice_capacity": [98304, 49152, 24576, 8192, 2048],
        "compute_dtype": "bfloat16",
    })
    sm = tuple((float(s), int(r)) for s, r in cfg.scale_map)
    caps = tuple(int(c) for c in cfg.lattice_capacity)
    model = build_model(cfg)
    batch = _make_batch(cfg, 1, seed=0)
    keys = ("pc", "img", "calib", "A")
    dev_args = {k: jax.device_put(batch[k]) for k in keys}
    pc = dev_args["pc"]

    set_merge_backend("sort")
    init = jax.jit(lambda rng, pc_, img, calib, A: model.init(
        rng, pc_, img, calib, A, train=False))
    variables = init(jax.random.PRNGKey(0), *(batch[k] for k in keys))

    enet = Enet(scale_map=sm, capacities=caps, use_leaky=cfg.use_leaky,
                bcn_use_bias=cfg.bcn_use_bias, bcn_use_norm=cfg.bcn_use_norm,
                last_relu=cfg.last_relu, compute_dtype=jnp.bfloat16)
    einit = jax.jit(lambda rng, p: enet.init(rng, p, train=False))
    evars = None  # lazy: only stage 3 pays the E-net init

    # --- stage bodies: (pc..., prev scalar) -> small f32 vector -----------
    def merge_only(pc_, prev):
        from efgh_tpu.ops.lattice import _merge_backend

        flat = jax.lax.bitcast_convert_type(pc_[0].reshape(-1), jnp.uint32)
        k = jnp.concatenate([flat, flat ^ jnp.uint32(0x9E3779B9)])
        k = k[: 16 * 16384].reshape(16, 16384)  # probe shape: streamed path
        k = jax.lax.sort(k, dimension=1) ^ (prev.astype(jnp.uint32) * 0)
        i = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        if _merge_backend() == "pallas":
            ok, oi = merge_rows_pallas(k, i)
        else:  # pow2 shape: the merge contract == lax.sort of the flat pairs
            ok, oi = jax.lax.sort((k.reshape(-1), i.reshape(-1)), num_keys=2)
        # fold the full output down losslessly enough to detect stale bits
        return jnp.stack([
            (ok >> 16).astype(jnp.float32).sum(),
            (ok & 0xFFFF).astype(jnp.float32).sum(),
            oi.astype(jnp.float32).sum(),
            ok[123456].astype(jnp.float32), oi[123456].astype(jnp.float32),
        ])

    def scale0(pc_, prev):
        p = pc_[0] + prev * 0.0
        lat = build_lattice_scale(p, jnp.ones(p.shape[1], bool),
                                  capacity=caps[0], radius=int(sm[0][1]),
                                  scale=float(sm[0][0]))
        return jnp.stack([
            lat.barycentric.sum(), lat.el_minus_gr.sum(),
            lat.lattice_offset.sum().astype(jnp.float32),
            lat.blur_neighbors.sum().astype(jnp.float32),
            lat.num_cells.astype(jnp.float32),
        ])

    def pyramid(pc_, prev):
        p = pc_ + prev * 0.0
        pyr = jax.vmap(lambda q: build_lattice_pyramid(q, sm, caps))(p)
        outs = []
        for lat in pyr:
            outs += [lat.lattice_offset.sum().astype(jnp.float32),
                     lat.blur_neighbors.sum().astype(jnp.float32),
                     lat.barycentric.sum().astype(jnp.float32)]
        return jnp.stack(outs)

    def pyramid_e(pc_, prev):
        ret = enet.apply(evars, pc_ + prev * 0.0, train=False)
        return ret["e_l"].reshape(-1).astype(jnp.float32)

    def full(pc_, prev):
        out = model.apply(variables, pc_ + prev * 0.0, dev_args["img"],
                          dev_args["calib"], dev_args["A"], train=False)
        return out["cam_T_velo"].reshape(-1).astype(jnp.float32)

    stages = [("merge_only", merge_only), ("scale0", scale0),
              ("pyramid", pyramid), ("pyramid_e", pyramid_e),
              ("full", full)]

    results = {}
    panicked = False
    for si, (name, body) in enumerate(stages):
        if si not in wanted or panicked:
            continue
        print(f"== stage {si}: {name} ==", flush=True)
        if name == "pyramid_e" and evars is None:
            set_merge_backend("sort")
            evars = einit(jax.random.PRNGKey(1), batch["pc"])
        rec = {"runs": [], "out": {}, "error": None, "pass": None}
        try:
            for backend in ("sort", "pallas"):
                set_merge_backend(backend)
                # fresh closure per backend: jax's trace cache is keyed on
                # the function object, so jitting the SAME body twice would
                # silently reuse the first backend's jaxpr (the merge
                # backend is read at trace time)
                fn = jax.jit(lambda pc_, prev, _b=body: _b(pc_, prev))
                seq = []
                prev = 0.0
                for r in range(args.runs):
                    t0 = time.time()
                    out = jax.block_until_ready(
                        fn(pc, jnp.float32(prev)))
                    dt = time.time() - t0
                    vec = [float(x) for x in jax.device_get(out).ravel()[:16]]
                    seq.append(vec)
                    prev = (abs(vec[0]) % 7.0)  # fresh chained host scalar
                    rec["runs"].append(
                        {"backend": backend, "run": r, "s": round(dt, 2)})
                    print(f"  [{backend}] run {r}: {dt:.2f}s", flush=True)
                rec["out"][backend] = seq
            rec["pass"] = rec["out"]["sort"] == rec["out"]["pallas"]
        except BaseException as e:  # client panics are BaseExceptions
            rec["pass"] = False
            rec["error"] = f"{type(e).__name__}: {e}"[:500]
            print(f"  FAILED: {rec['error'][:300]}", flush=True)
            if not isinstance(e, Exception):
                panicked = True
        results[name] = rec
        print(f"  -> pass={rec['pass']}", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "pallas_bisect_result.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v["pass"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
