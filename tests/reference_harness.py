"""Import machinery for running the reference PyTorch model on CPU in tests.

The environment lacks numba/open3d/CUDA; this installs the same stubs used by
benchmarks/measure_reference_cpu.py so `/root/reference` imports cleanly and
the lattice build runs as pure Python (fine at test sizes).
"""

from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"


def install_reference(monkeypatch=None):
    """Make the reference importable; returns True on success."""
    import os

    if not os.path.isdir(REFERENCE):
        return False
    if "numba" not in sys.modules:
        _stub_numba()
    sys.modules.setdefault("open3d", types.ModuleType("open3d"))
    _patch_torch_cpu()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return True


def _stub_numba():
    numba = types.ModuleType("numba")

    class _Sig:
        def __call__(self, *a, **k):
            return self

        def __getitem__(self, item):
            return self

    def njit(*args, **kwargs):
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

    tables = {}
    counter = [0]

    def khash_init():
        counter[0] += 1
        tables[counter[0]] = {}
        return counter[0]

    lib = types.SimpleNamespace(
        khash_int2int_init=khash_init,
        khash_int2int_get=lambda h, k, d: tables[h].get(k, d),
        khash_int2int_set=lambda h, k, v: tables[h].__setitem__(k, v),
        khash_int2int_destroy=lambda h: tables.pop(h, None),
    )
    mod = types.ModuleType("_khash_ffi")
    mod.lib = lib
    sys.modules["_khash_ffi"] = mod


def _patch_torch_cpu():
    import torch

    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.pin_memory = lambda self: self
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.empty_cache = lambda: None


def reference_args(raw=(64, 128), scale_map=None):
    """Minimal args dict for constructing reference nets on CPU."""
    return {
        "DEVICE": "cpu",
        "dim": 3,
        "scale_map": scale_map or [[1.0, 1], [0.75, 1], [0.5, 1],
                                   [0.25, 1], [0.125, 1]],
        "use_leaky": True,
        "bcn_use_bias": True,
        "bcn_use_norm": True,
        "last_relu": False,
        "raw_cam_img_size": list(raw),
        "lidar_fov_rad": [0.125, -0.125],
        "dataset": "RELLIS_3D",
    }
