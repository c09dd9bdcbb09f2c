#!/usr/bin/env python
"""A/B the Pallas BCL blur gather vs the XLA random-row gather (VERDICT r3 #4).

Measures the isolated flagship scale-0 blur gather (15 x 98304 x C) on the
real device, bit-compares the outputs, and reports ms per call for both
paths.  Timing discipline per CLAUDE.md: every call chains the previous
output into the splat table (x + prev*0) so no (executable, buffers) tuple
repeats.

Usage:  python benchmarks/bcl_gather_bench.py [--iters 8] [--c 36]
Writes: benchmarks/bcl_gather_result.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--c", type=int, default=36)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--cap", type=int, default=98304)
    args = ap.parse_args()

    from bench import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from efgh_tpu.ops.lattice import (
        bcl_gather_neighbors,
        build_lattice_scale,
        filter_size,
    )
    from efgh_tpu.ops.pallas_bcl import bcl_gather_neighbors_pallas

    rng = np.random.default_rng(0)
    pts = (rng.standard_normal((3, args.points)) * 20.0).astype(np.float32)

    print("[bench] building flagship scale-0 lattice on device...",
          flush=True)
    lat = jax.jit(lambda p: build_lattice_scale(
        p, jnp.ones(args.points, bool), capacity=args.cap, radius=1,
        scale=1.0))(jnp.asarray(pts))
    bn = jax.block_until_ready(lat.blur_neighbors)  # (F, H) device-resident
    f = filter_size(1, 3)
    print(f"[bench] lattice ready: F={f}, H={args.cap}, "
          f"cells={int(lat.num_cells)}", flush=True)

    splat = jnp.asarray(
        rng.standard_normal((args.cap + 1, args.c)), jnp.bfloat16)
    splat = splat.at[0].set(0.0)

    from efgh_tpu.ops.pallas_bcl import bcl_blur_fused_pallas

    w_dim = 32  # scale-0 first blur conv width
    kernel = jnp.asarray(
        rng.standard_normal((f * args.c, w_dim)) * 0.05, jnp.bfloat16)

    # the chain scalar rides inside the jit (fresh buffer + data dependency
    # per call, zero eager tunnel ops in the timed loop — CLAUDE.md)
    def xla_path(s, prev):
        s = s + prev * 0
        r = bcl_gather_neighbors(s, bn)
        return r, r[0, 0, 0]

    def pallas_path(s, prev):
        s = s + prev * 0
        r = bcl_gather_neighbors_pallas(s, bn, tile=args.tile,
                                        chunk_rows=args.chunk)
        return r, r[0, 0, 0]

    # gather + first matmul (what the BCL blur actually computes) A/B
    def xla_blur(s, prev):
        s = s + prev * 0
        g = bcl_gather_neighbors(s, bn).reshape(args.cap, f * args.c)
        r = jnp.einsum("hc,cw->hw", g, kernel,
                       preferred_element_type=jnp.float32)
        return r, r[0, 0]

    def pallas_blur(s, prev):
        s = s + prev * 0
        r = bcl_blur_fused_pallas(s, bn, kernel, tile=args.tile,
                                  chunk_rows=args.chunk)
        return r, r[0, 0]

    out = {"f": f, "h": args.cap, "c": args.c, "tile": args.tile,
           "chunk": args.chunk}
    ref_first = None
    for name, path in (("xla", xla_path), ("pallas", pallas_path),
                       ("xla_blur", xla_blur), ("pallas_blur", pallas_blur)):
        fn = jax.jit(path)
        chain = jnp.bfloat16(0)
        t0 = time.time()
        try:
            r, chain = fn(splat, chain)
            jax.block_until_ready(chain)
        except BaseException as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:400]}
            print(f"[{name}] FAILED compile/first-run: {out[name]['error']}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        if name.startswith("xla"):
            ref_first = np.asarray(r)
        elif name == "pallas":
            match = bool((np.asarray(r) == ref_first).all())
            out["bit_match_first"] = match
            print(f"[bench] first-run bit match vs xla: {match}", flush=True)
        else:  # fused blur: f32 reassociation tolerance, not bit-exact
            got = np.asarray(r)
            scale = float(np.abs(ref_first).max() or 1.0)
            out["blur_max_abs_err"] = float(
                np.abs(got - ref_first).max())
            out["blur_match"] = bool(
                out["blur_max_abs_err"] <= 1e-4 * scale)
            print(f"[bench] fused blur max|err| {out['blur_max_abs_err']:.2e}"
                  f" (match={out['blur_match']})", flush=True)
        dts = []
        for i in range(args.iters):
            t0 = time.time()
            r, chain = fn(splat, chain)
            jax.block_until_ready(chain)
            dts.append(time.time() - t0)
        dts = sorted(dts)
        med = dts[len(dts) // 2]
        out[name] = {"median_ms": round(med * 1e3, 2),
                     "all_ms": [round(d * 1e3, 2) for d in dts],
                     "compile_s": round(compile_s, 1)}
        print(f"[{name}] median {med*1e3:.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)

    for a, b, key in (("xla", "pallas", "speedup"),
                      ("xla_blur", "pallas_blur", "speedup_blur")):
        if "median_ms" in out.get(a, {}) and "median_ms" in out.get(b, {}):
            out[key] = round(
                out[a]["median_ms"] / out[b]["median_ms"], 2)
            print(f"[bench] {key}: {out[key]}x", flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bcl_gather_result.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
