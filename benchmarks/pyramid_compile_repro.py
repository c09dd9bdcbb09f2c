"""Minimal repro + mitigation study for the batch-8 XLA compile blowup.

Round-2/3 finding chain (docs/PERFORMANCE.md batch table):
  * the fused whole-forward at batch 8 compiles > 30 min (aborted);
  * two-stage split (bench.py EFGH_BENCH_SPLIT=1) localizes it: the
    vmapped 5-scale lattice pyramid ALONE exceeds 16 min at batch 8,
    before the conv towers even start compiling;
  * this script times the three candidate batchings of the pyramid in
    isolation, each in-process and hard-bounded by the caller's timeout:
      vmap    — batch axis vectorized through every sort/scan (status quo)
      map     — lax.map over the batch: XLA compiles the body ONCE and
                loops, trading sort amortization for bounded compile
      scan1   — same but unrolled=1 spelling via lax.map's underlying scan

Usage (TPU host):  python benchmarks/pyramid_compile_repro.py [batch] [which]
  which in {vmap, map, towers}; default map.  "towers" compiles the full
  net with a precomputed pyramid (lax.map-built), isolating the conv-tower
  compile from the pyramid's.  Prints one JSON line per stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = sys.argv[2] if len(sys.argv) > 2 else "map"

    import jax
    import numpy as np

    from efgh_tpu.config import Config
    from efgh_tpu.ops.lattice import build_lattice_pyramid
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
    full = _make_batch(cfg, batch)
    pc = jax.device_put(np.asarray(full["pc"]))

    def one(p):
        return build_lattice_pyramid(p, sm, caps)

    if which == "towers":
        from efgh_tpu.models import build_model

        model = build_model(cfg)
        args = tuple(jax.device_put(np.asarray(full[k]))
                     for k in ("pc", "img", "calib", "A"))
        init = jax.jit(lambda rng, pc, img, calib, A: model.init(
            rng, pc, img, calib, A, train=False))
        variables = init(jax.random.PRNGKey(0), *(a[:1] for a in args))
        pyr = jax.block_until_ready(
            jax.jit(lambda x: jax.lax.map(one, x))(pc))
        print(json.dumps({"stage": "towers-setup-done"}), flush=True)
        fn = jax.jit(lambda v, pc, img, calib, A, pyr: model.apply(
            v, pc, img, calib, A, pyramid=pyr,
            train=False)["cam_T_velo"])
        t0 = time.time()
        jax.block_until_ready(fn(variables, *args, pyr))
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(
            fn(variables, args[0] * 1.0000001, *args[1:], pyr))
        exec_s = time.time() - t0
        print(json.dumps({
            "stage": "towers", "batch": batch,
            "compile_plus_first_exec_s": round(compile_s, 1),
            "second_exec_wall_s": round(exec_s, 3),
        }), flush=True)
        return

    if which == "vmap":
        fn = jax.jit(lambda x: jax.vmap(one)(x))
    else:
        fn = jax.jit(lambda x: jax.lax.map(one, x))

    t0 = time.time()
    out = jax.block_until_ready(fn(pc))
    compile_s = time.time() - t0

    # one more distinct execution for a rough post-compile step time
    pc2 = jax.device_put(np.asarray(full["pc"]) * 1.0000001)
    t0 = time.time()
    jax.block_until_ready(fn(pc2))
    exec_s = time.time() - t0

    print(json.dumps({
        "stage": f"pyramid-{which}", "batch": batch,
        "compile_plus_first_exec_s": round(compile_s, 1),
        "second_exec_wall_s": round(exec_s, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
