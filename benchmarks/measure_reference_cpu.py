"""Measure the reference (PyTorch, /root/reference) CPU forward throughput.

This sets the denominator for the 10x pairs/sec target (BASELINE.md).  The
environment has no numba, so the reference's numba+khash lattice build cannot
run at its native speed; we therefore stub numba (pure-Python execution),
build the lattice ONCE, cache it, and time forwards with the lattice
precomputed.  This measurement is *charitable to the reference*: its real
per-forward time includes the CPU lattice rebuild (reference
nets/enet.py:107), so true reference throughput is lower than reported here.

Usage: python benchmarks/measure_reference_cpu.py [--iters 5] [--points 65536]
Writes benchmarks/reference_cpu.json.
"""

import argparse
import json
import os
import sys
import time
import types


def _stub_numba():
    """Install a minimal numba shim: @njit runs pure Python; cffi_support
    registers a dict-backed int64->int64 'hash table'."""
    numba = types.ModuleType("numba")

    class _Sig:
        def __call__(self, *a, **k):
            return self
        def __getitem__(self, item):
            return self

    def njit(*args, **kwargs):
        # bare @njit on a function; @njit(signature) returns a decorator
        if len(args) == 1 and callable(args[0]) and not isinstance(args[0], _Sig):
            return args[0]
        def deco(f):
            return f
        return deco

    numba.njit = njit
    numba.int64 = _Sig()
    cffi_support = types.ModuleType("numba.cffi_support")
    cffi_support.register_module = lambda m: None
    numba.cffi_support = cffi_support
    sys.modules["numba"] = numba
    sys.modules["numba.cffi_support"] = cffi_support

    # dict-backed khash
    tables = {}
    counter = [0]

    lib = types.SimpleNamespace()

    def khash_init():
        counter[0] += 1
        tables[counter[0]] = {}
        return counter[0]

    def khash_get(h, k, default):
        return tables[h].get(k, default)

    def khash_set(h, k, v):
        tables[h][k] = v

    def khash_destroy(h):
        tables.pop(h, None)

    lib.khash_int2int_init = khash_init
    lib.khash_int2int_get = khash_get
    lib.khash_int2int_set = khash_set
    lib.khash_int2int_destroy = khash_destroy
    khash_mod = types.ModuleType("_khash_ffi")
    khash_mod.lib = lib
    sys.modules["_khash_ffi"] = khash_mod


def _patch_torch_cpu():
    import torch

    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.pin_memory = lambda self: self
    if not hasattr(torch.cuda, "LongTensor"):
        torch.cuda.LongTensor = torch.LongTensor
        torch.cuda.FloatTensor = torch.FloatTensor
    else:
        torch.cuda.LongTensor = torch.LongTensor
        torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.empty_cache = lambda: None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--include-lattice", action="store_true",
                    help="time the (pure-Python, numba-stubbed) lattice "
                         "build inside the loop too")
    args = ap.parse_args()

    _stub_numba()
    _patch_torch_cpu()
    # stub open3d (debug-viewer import at reference common/numpy_utils.py:576)
    sys.modules.setdefault("open3d", types.ModuleType("open3d"))
    sys.path.insert(0, "/root/reference")

    import numpy as np
    import torch
    import yaml

    with open("/root/reference/configs/train_rellis.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["DEVICE"] = "cpu"
    cfg["num_points"] = args.points

    from nets import EFGHBackbone

    torch.set_grad_enabled(False)
    model = EFGHBackbone(cfg)
    model.eval()

    rng = np.random.RandomState(0)
    n = args.points
    pc = np.zeros((1, 3, n), np.float32)
    pc[0, 0] = rng.uniform(-50, 50, n)
    pc[0, 1] = rng.uniform(-50, 50, n)
    pc[0, 2] = rng.normal(-1.6, 0.3, n)
    img = rng.randint(0, 255, (1, 3, 450, 800)).astype(np.float32)
    calib = np.array([[[960.0, 0, 800, 0], [0, 960.0, 450, 0], [0, 0, 1, 0]]],
                     np.float32)
    a_mat = np.array([[[1, 0, -800.0], [0, 1, -450.0], [0, 0, 1]]], np.float32)

    pc_t = torch.from_numpy(pc)
    img_t = torch.from_numpy(img)
    calib_t = torch.from_numpy(calib)
    a_t = torch.from_numpy(a_mat)

    # one full forward (includes the pure-Python lattice build) to warm up
    t0 = time.time()
    model(pc_t, img_t, calib_t, a_t)
    t_full_first = time.time() - t0
    print(f"first forward (with pure-python lattice build): {t_full_first:.1f}s")

    if not args.include_lattice:
        # precompute the lattice once and patch it in, so the timed loop is
        # the torch compute only (charitable to the reference)
        gd = model.E.generate_data
        cached = gd(pc_t[0])

        class _Cached:
            def __call__(self, _pc):
                return cached

        model.E.generate_data = _Cached()

    times = []
    for i in range(args.iters):
        t0 = time.time()
        model(pc_t, img_t, calib_t, a_t)
        times.append(time.time() - t0)
        print(f"iter {i}: {times[-1]:.2f}s")

    mean_t = float(np.mean(times))
    result = {
        "pairs_per_sec_cpu": 1.0 / mean_t,
        "sec_per_pair": mean_t,
        "iters": args.iters,
        "num_points": args.points,
        "lattice_included_in_loop": bool(args.include_lattice),
        "first_forward_with_lattice_sec": t_full_first,
        "note": "torch CPU forward, lattice precomputed (charitable upper "
                "bound on reference speed; no numba in env)",
    }
    out = os.path.join(os.path.dirname(__file__), "reference_cpu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
