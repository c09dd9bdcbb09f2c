"""Startup self-test that resolves `pallas_merge: auto` per host.

The Pallas bitonic-merge kernel (efgh_tpu/ops/pallas_merge.py) is 2.57x
faster than `lax.sort` on the lattice neighbor-table merge, but at least one
TPU transport (this project's remote tunnel) mis-executes Pallas-containing
executables on REPEATED runs: the 2nd-3rd execution either panics the client
or silently returns stale results (docs/PERFORMANCE.md).  Hard-coding the
safe backend would deny healthy hosts the speedup; hard-coding Pallas would
corrupt results here.  So `auto` runs this self-test once per host:

  * execute the jitted merge THREE times on DISTINCT inputs (each chained on
    the previous output, so no (executable, buffers) tuple ever repeats and
    no transport-level result cache can satisfy the call);
  * compare every run bit-exactly against `lax.sort` over the same padded
    input;
  * any exception (including client panics surfaced as BaseException) or any
    mismatch -> "sort"; three exact matches -> "pallas".

The verdict is cached in a JSON file keyed by device kind (next to the
package by default, `EFGH_CACHE_DIR` to override), so the ~30 s probe
compile and the one-time risk of tickling a broken transport are paid once
per host, not once per process.

The probe shape (16 rows x 16384) exceeds the kernel's single-launch fused
limit, so it exercises the streamed global/local stage path that production
shapes (15 x 98304) use.

Replaces the round-2 behavior where `auto` resolved to "sort"
unconditionally and no user ever got the fast path (VERDICT r2).
"""

from __future__ import annotations

import json
import os
import socket
from typing import Optional

_PROBE_ROWS = 16


def _host_id() -> str:
    """Identity of THIS boot of THIS host.

    Hostname alone is not enough: the VMs here are rebuilt with the same
    hostname ("vm"), and the failure the probe guards against lives in the
    host-side transport stack, which changes with the rebuild.  Including
    the kernel boot_id invalidates the cached verdict on every
    reboot/rebuild, which is exactly the cadence CLAUDE.md prescribes for
    re-running the bisect.
    """
    boot = ""
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:
        pass
    return f"{socket.gethostname()}:{boot}"
_PROBE_LEN = 16384
_PROBE_RUNS = 3


def _cache_path(device_kind: str) -> str:
    base = os.environ.get("EFGH_CACHE_DIR")
    if not base:
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".cache",
        )
    tag = "".join(c if c.isalnum() else "_" for c in device_kind)
    return os.path.join(base, f"pallas_probe-{tag}.json")


def _make_rows(seed: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    keys = rng.randint(0, 1 << 30, size=(_PROBE_ROWS, _PROBE_LEN),
                       dtype=np.int64).astype(np.uint32)
    ids = rng.permutation(_PROBE_ROWS * _PROBE_LEN).astype(np.int32)
    ids = ids.reshape(_PROBE_ROWS, _PROBE_LEN)
    # rows must be lexicographically sorted ascending by (key, id)
    order = np.lexsort((ids, keys), axis=-1)
    return (np.take_along_axis(keys, order, axis=-1),
            np.take_along_axis(ids, order, axis=-1))


def _run_probe() -> bool:
    """Execute the kernel _PROBE_RUNS times on distinct chained inputs and
    verify each against lax.sort.  True = trustworthy."""
    import jax
    import jax.numpy as jnp

    from efgh_tpu.ops.pallas_merge import merge_rows_pallas

    merge = jax.jit(merge_rows_pallas)

    def reference(keys, ids):
        fk = jnp.asarray(keys).reshape(-1)
        fi = jnp.asarray(ids).reshape(-1)
        return jax.lax.sort((fk, fi), num_keys=2)

    ref = jax.jit(reference)

    chain_k = jnp.uint32(0)
    chain_i = jnp.int32(0)
    for run in range(_PROBE_RUNS):
        keys, ids = _make_rows(seed=run)
        # chain the previous run's output in (xor/add of 0: values unchanged,
        # sortedness preserved, fresh buffers + a true data dependency)
        jk = jnp.asarray(keys) ^ chain_k
        ji = jnp.asarray(ids) + chain_i
        out_k, out_i = merge(jk, ji)
        exp_k, exp_i = ref(jk, ji)
        ok = bool(jnp.all(out_k == exp_k)) and bool(jnp.all(out_i == exp_i))
        if not ok:
            return False
        chain_k = out_k[-1] & jnp.uint32(0)
        chain_i = out_i[-1] & jnp.int32(0)
    return True


def resolve_auto_backend() -> str:
    """Resolve `pallas_merge: auto` to "pallas" or "sort" for this host."""
    env = os.environ.get("EFGH_PALLAS_MERGE")
    if env in ("sort", "pallas", "pallas_interpret"):
        return env

    import jax

    try:
        dev = jax.devices()[0]
        platform = dev.platform
        kind = getattr(dev, "device_kind", platform)
    except Exception:
        return "sort"
    if platform == "cpu":
        # interpret-mode Pallas is far slower than lax.sort; nothing to probe
        return "sort"

    path = _cache_path(str(kind))
    try:
        with open(path) as f:
            cached = json.load(f)
        if cached.get("host") == _host_id():
            return cached["backend"]
    except Exception:
        pass

    try:
        backend = "pallas" if _run_probe() else "sort"
    except BaseException as e:  # client panics are BaseExceptions
        print(f"[pallas-probe] kernel self-test raised {type(e).__name__}; "
              "falling back to lax.sort merge")
        backend = "sort"
    if backend == "sort":
        print("[pallas-probe] Pallas merge failed the repeated-execution "
              "self-test on this host; using lax.sort")
    else:
        print("[pallas-probe] Pallas merge verified; enabling fast path")

    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"host": _host_id(), "backend": backend,
                       "runs": _PROBE_RUNS}, f)
    except Exception:
        pass
    return backend
