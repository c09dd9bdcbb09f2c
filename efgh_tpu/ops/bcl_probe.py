"""Startup self-test that resolves `pallas_bcl: auto` per host.

Mirrors ops/merge_probe.py for the BCL blur-gather kernel
(ops/pallas_bcl.py): at least one TPU transport mis-executes
Pallas-containing executables on REPEATED runs (stale results / client
panics — CLAUDE.md), so `auto` never enables the kernel blindly.  The
probe executes the jitted kernel three times on DISTINCT chained inputs
(fresh buffers, true data dependency — no transport result cache can
serve them) and requires bit-identity with the XLA gather each time; the
verdict is cached per device kind next to the merge probe's.
"""

from __future__ import annotations

import json
import os

from efgh_tpu.ops import merge_probe as _merge_probe

_PROBE_H = 8192
_PROBE_F = 15
_PROBE_C = 36
_PROBE_RUNS = 3


def _cache_path(device_kind: str) -> str:
    base = os.environ.get("EFGH_CACHE_DIR")
    if not base:
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".cache",
        )
    tag = "".join(c if c.isalnum() else "_" for c in device_kind)
    return os.path.join(base, f"pallas_bcl_probe-{tag}.json")


def _run_probe() -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efgh_tpu.ops.pallas_bcl import bcl_gather_neighbors_pallas

    # chunk_rows < H exercises the multi-chunk accumulate path production
    # shapes use
    kernel = jax.jit(lambda s, n: bcl_gather_neighbors_pallas(
        s, n, tile=512, chunk_rows=2048))
    ref = jax.jit(lambda s, n: s[n.T + 1])

    chain = jnp.bfloat16(0)
    for run in range(_PROBE_RUNS):
        rng = np.random.default_rng(run)
        splat = rng.standard_normal((_PROBE_H + 1, _PROBE_C))
        splat[0] = 0.0
        bn = np.sort(rng.integers(0, _PROBE_H, (_PROBE_F, _PROBE_H)),
                     axis=1).astype(np.int32)
        bn[rng.random(bn.shape) < 0.2] = -1
        s = jnp.asarray(splat, jnp.bfloat16) + chain * 0
        n = jnp.asarray(bn)
        out = kernel(s, n)
        exp = ref(s, n)
        if not bool(jnp.all(out == exp)):
            return False
        chain = out[0, 0, 0]
    return True


def resolve_bcl_auto_backend() -> str:
    """Resolve `pallas_bcl: auto` to "pallas" or "xla" for this host."""
    env = os.environ.get("EFGH_PALLAS_BCL")
    if env in ("xla", "pallas", "pallas_interpret"):
        return env

    import jax

    try:
        dev = jax.devices()[0]
        platform = dev.platform
        kind = getattr(dev, "device_kind", platform)
    except Exception:
        return "xla"
    if platform == "cpu":
        return "xla"  # interpret-mode Pallas is slower than the XLA gather

    path = _cache_path(str(kind))
    try:
        with open(path) as f:
            cached = json.load(f)
        if cached.get("host") == _merge_probe._host_id():
            return cached["backend"]
    except Exception:
        pass

    try:
        backend = "pallas" if _run_probe() else "xla"
    except BaseException as e:  # client panics are BaseExceptions
        print(f"[pallas-bcl-probe] kernel self-test raised "
              f"{type(e).__name__}; falling back to the XLA gather")
        backend = "xla"
    print(f"[pallas-bcl-probe] resolved: {backend}")
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"host": _merge_probe._host_id(), "backend": backend,
                       "runs": _PROBE_RUNS}, f)
    except Exception:
        pass
    return backend
