"""Pallas bitonic multi-merge kernel: interpret-mode regression tests.

The kernel's contract is byte-identity with ``lax.sort(..., num_keys=2)``
over the padded input (efgh_tpu/ops/pallas_merge.py), which makes the tests
exact — no tolerances.  Interpret mode stands in for the Mosaic compile on
CPU (the SURVEY §5 sanitizer-style check for hand-written kernels); the same
code path is compiled on TPU where it replaces the neighbor-table lax.sort
(reference nets/transforms.py:126-183's role).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import efgh_tpu.ops.lattice as lattice
from efgh_tpu.ops.merge import ID_PAD, KEY_PAD, _next_pow2
from efgh_tpu.ops.pallas_merge import merge_rows_pallas


def _sorted_rows(rng, k, l, key_max=2**32 - 2):
    keys = np.sort(
        rng.randint(0, key_max, size=(k, l)).astype(np.uint64), axis=1
    ).astype(np.uint32)
    ids = rng.permutation(k * l).astype(np.int32).reshape(k, l)
    for r in range(k):
        o = np.lexsort((ids[r], keys[r]))
        keys[r], ids[r] = keys[r][o], ids[r][o]
    return keys, ids


def _reference(keys, ids):
    k, l = keys.shape
    lp, kp = _next_pow2(l), _next_pow2(k)
    fk = np.pad(keys, ((0, kp - k), (0, lp - l)),
                constant_values=np.uint32(KEY_PAD))
    fi = np.pad(ids, ((0, kp - k), (0, lp - l)),
                constant_values=np.int32(ID_PAD))
    return jax.lax.sort(
        (jnp.asarray(fk).reshape(-1), jnp.asarray(fi).reshape(-1)), num_keys=2
    )


@pytest.mark.parametrize(
    "k,l,blk,fl",
    [
        (16, 4096, 1024, 65536),   # fused single-launch path
        (15, 3000, 1024, 4096),    # global(m<=2) + local multi-pass, pad row
        (16, 4096, 512, 2048),     # grouped global stages (m=3)
        (3, 130, 512, 2048),       # tiny-fallback lax.sort path
        (5, 2048, 1024, 4096),     # non-pow2 row count, odd grouping
        (2, 8192, 2048, 8192),     # single merge level
    ],
)
def test_matches_lax_sort(k, l, blk, fl):
    rng = np.random.RandomState(k * 1000 + l)
    keys, ids = _sorted_rows(rng, k, l)
    mk, mi = merge_rows_pallas(
        jnp.asarray(keys), jnp.asarray(ids),
        block_elems=blk, fused_limit=fl, interpret=True,
    )
    rk, ri = _reference(keys, ids)
    assert bool(jnp.all(mk == rk))
    assert bool(jnp.all(mi == ri))


def test_duplicate_keys_tiebreak_by_id():
    """Equal keys across rows must still order by id (cells before queries)."""
    rng = np.random.RandomState(7)
    keys, ids = _sorted_rows(rng, 8, 512, key_max=37)  # heavy duplication
    mk, mi = merge_rows_pallas(jnp.asarray(keys), jnp.asarray(ids),
                               block_elems=512, fused_limit=2048,
                               interpret=True)
    rk, ri = _reference(keys, ids)
    assert bool(jnp.all(mk == rk))
    assert bool(jnp.all(mi == ri))


def test_sentinel_tail():
    """Rows ending in sentinel runs (the lattice's padded-slot pattern)."""
    rng = np.random.RandomState(11)
    keys, ids = _sorted_rows(rng, 15, 1024)
    keys[:, 700:] = np.uint32(0xFFFFFFFF)  # sorted: sentinel tail
    for r in range(15):  # re-establish (key, id) lex order in the tail
        o = np.lexsort((ids[r], keys[r]))
        keys[r], ids[r] = keys[r][o], ids[r][o]
    mk, mi = merge_rows_pallas(jnp.asarray(keys), jnp.asarray(ids),
                               block_elems=1024, fused_limit=4096,
                               interpret=True)
    rk, ri = _reference(keys, ids)
    assert bool(jnp.all(mk == rk))
    assert bool(jnp.all(mi == ri))


def test_lattice_backends_identical():
    """build_lattice_pyramid is bit-identical across merge backends,
    including under vmap (how the model invokes it)."""
    rng = np.random.RandomState(0)
    pcs = jnp.asarray(rng.uniform(-40, 40, size=(2, 3, 1500)).astype(np.float32))
    valid = jnp.asarray(rng.rand(2, 1500) > 0.1)
    scale_map = [[1.0, 1], [0.5, 1]]
    caps = [3072, 1024]

    def build(pc, v):
        return lattice.build_lattice_pyramid(pc, scale_map, caps, valid=v)

    try:
        lattice.set_merge_backend("sort")
        ref = jax.vmap(build)(pcs, valid)
        lattice.set_merge_backend("pallas_interpret")
        out = jax.vmap(build)(pcs, valid)
    finally:
        lattice.set_merge_backend(None)
    for a, b in zip(ref, out):
        for f in a._fields:
            assert bool(jnp.all(getattr(a, f) == getattr(b, f))), f


class TestAutoProbe:
    """`pallas_merge: auto` resolution (efgh_tpu/ops/merge_probe.py)."""

    def test_cpu_resolves_to_sort(self, tmp_path, monkeypatch):
        from efgh_tpu.ops import merge_probe

        monkeypatch.setenv("EFGH_CACHE_DIR", str(tmp_path))
        monkeypatch.delenv("EFGH_PALLAS_MERGE", raising=False)
        assert merge_probe.resolve_auto_backend() == "sort"

    def test_env_override(self, monkeypatch):
        from efgh_tpu.ops import merge_probe

        monkeypatch.setenv("EFGH_PALLAS_MERGE", "pallas")
        assert merge_probe.resolve_auto_backend() == "pallas"

    def test_cache_roundtrip(self, tmp_path, monkeypatch):
        import json

        from efgh_tpu.ops import merge_probe

        monkeypatch.setenv("EFGH_CACHE_DIR", str(tmp_path))
        monkeypatch.delenv("EFGH_PALLAS_MERGE", raising=False)
        path = merge_probe._cache_path("faketpu")
        import os

        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"host": merge_probe._host_id(), "backend": "pallas"}, f)
        monkeypatch.setattr(
            merge_probe, "_cache_path", lambda kind: path)

        class FakeDev:
            platform = "tpu"
            device_kind = "faketpu"

        import jax

        monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
        assert merge_probe.resolve_auto_backend() == "pallas"

    def test_stale_boot_cache_ignored(self, tmp_path, monkeypatch):
        """A cache entry from a previous boot (same hostname, different
        boot_id — the VM-rebuild signature) must NOT be trusted: the probe
        re-runs instead of returning the stale verdict."""
        import json
        import socket

        from efgh_tpu.ops import merge_probe

        monkeypatch.setenv("EFGH_CACHE_DIR", str(tmp_path))
        monkeypatch.delenv("EFGH_PALLAS_MERGE", raising=False)
        path = merge_probe._cache_path("faketpu")
        import os

        os.makedirs(os.path.dirname(path), exist_ok=True)
        # bare hostname = the pre-boot_id cache format; also covers a
        # different boot_id on the rebuilt host
        with open(path, "w") as f:
            json.dump({"host": socket.gethostname(), "backend": "pallas"}, f)
        monkeypatch.setattr(merge_probe, "_cache_path", lambda kind: path)
        probed = {"n": 0}

        def fake_probe():
            probed["n"] += 1
            return False  # this boot's transport is bad

        monkeypatch.setattr(merge_probe, "_run_probe", fake_probe)

        class FakeDev:
            platform = "tpu"
            device_kind = "faketpu"

        import jax

        monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
        assert merge_probe.resolve_auto_backend() == "sort"
        assert probed["n"] == 1
        # and the re-probe result was re-cached under THIS boot's id
        with open(path) as f:
            assert json.load(f)["host"] == merge_probe._host_id()

    def test_probe_detects_corruption(self, monkeypatch):
        """A backend returning wrong results must fail the self-test."""
        from efgh_tpu.ops import merge_probe
        from efgh_tpu.ops import pallas_merge

        calls = {"n": 0}
        real = pallas_merge.merge_rows_pallas

        def flaky(keys, ids, **kw):
            out_k, out_i = real(keys, ids, interpret=True)
            calls["n"] += 1
            if calls["n"] >= 2:  # stale/corrupt from the 2nd execution on
                out_i = out_i[::-1]
            return out_k, out_i

        monkeypatch.setattr(pallas_merge, "merge_rows_pallas", flaky)
        monkeypatch.setattr(merge_probe, "_PROBE_ROWS", 4)
        monkeypatch.setattr(merge_probe, "_PROBE_LEN", 64)
        # the real probe jits the kernel; stateful flakiness would be
        # frozen into the cached trace, so run it eagerly here (the
        # transport bug being simulated lives below the trace level)
        monkeypatch.setattr(jax, "jit", lambda f, **kw: f)
        assert merge_probe._run_probe() is False

    def test_probe_accepts_correct_backend(self, monkeypatch):
        from efgh_tpu.ops import merge_probe
        from efgh_tpu.ops import pallas_merge

        real = pallas_merge.merge_rows_pallas

        def interp(keys, ids, **kw):
            return real(keys, ids, interpret=True)

        monkeypatch.setattr(pallas_merge, "merge_rows_pallas", interp)
        monkeypatch.setattr(merge_probe, "_PROBE_ROWS", 4)
        monkeypatch.setattr(merge_probe, "_PROBE_LEN", 64)
        monkeypatch.setattr(jax, "jit", lambda f, **kw: f)
        assert merge_probe._run_probe() is True


def test_build_model_normalizes_yaml_bools():
    """Unquoted YAML on/off arrive as bools; build_model must accept them
    (and reject junk with a clear error), ADVICE r2."""
    from efgh_tpu.config import Config
    from efgh_tpu.models import build_model

    cfg = Config.from_dict({"pallas_merge": False, "num_points": 256,
                            "lattice_capacity": [512, 256],
                            "scale_map": [[1.0, 1], [0.5, 1]]})
    model = build_model(cfg)
    assert model is not None
    assert lattice._merge_backend() == "sort"

    cfg2 = Config.from_dict({"pallas_merge": "junk"})
    with pytest.raises(ValueError, match="pallas_merge"):
        build_model(cfg2)
    lattice.set_merge_backend(None)
