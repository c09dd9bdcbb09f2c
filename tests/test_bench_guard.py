"""bench.py implausible-rate guard: degrade to forced sort, then report.

Round 4's driver bench recorded stale-transport garbage (2202->3891
"pairs/s") and exited 1, erasing the round's scoreboard entry.  The guard
now retries ONCE with the lax.sort merge forced in fresh closures and
reports with "degraded": true; only a second garbage result aborts.
"""

import json

import pytest

import bench


def _fake_measure(values):
    """A _measure stub returning values[i] on call i, recording force_sort."""
    calls = []

    def fake(mode, batch, iters, n_runs, n_variants, force_sort):
        v = values[len(calls)]
        calls.append(force_sort)
        return {
            "metric": "rellis_pairs_per_sec_per_chip", "value": v,
            "unit": "pairs/s", "vs_baseline": round(v / 0.033788, 1),
            "runs_pairs_per_sec": [v], "batch": batch,
            "iters_per_run": iters, "compile_s": 0.0,
        }

    return fake, calls


def test_plausible_rate_reports_directly(monkeypatch, capsys):
    fake, calls = _fake_measure([4.9])
    monkeypatch.setattr(bench, "_measure", fake)
    monkeypatch.setattr(bench, "enable_compile_cache", lambda: None)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 4.9
    assert "degraded" not in out
    assert calls == [False]


def test_guard_trip_degrades_to_forced_sort(monkeypatch, capsys):
    fake, calls = _fake_measure([2202.0, 4.9])
    monkeypatch.setattr(bench, "_measure", fake)
    monkeypatch.setattr(bench, "enable_compile_cache", lambda: None)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the retry ran with force_sort=True and its plausible value is reported
    assert calls == [False, True]
    assert out["value"] == 4.9
    assert out["degraded"] is True
    assert out["first_attempt_runs"] == [2202.0]


def test_double_garbage_still_exits_nonzero(monkeypatch, capsys):
    fake, calls = _fake_measure([2202.0, 3891.0])
    monkeypatch.setattr(bench, "_measure", fake)
    monkeypatch.setattr(bench, "enable_compile_cache", lambda: None)
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "error" in out
    assert calls == [False, True]
