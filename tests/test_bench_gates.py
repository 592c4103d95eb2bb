"""Unit tests for bench.py's r13 load gates (r12 verdict what's-wrong #1).

The r12 bench runs were polluted mid-run (start gate 0.13, ramp to
8.22; auto-A/B probes at loads up to 10.87) because the only gate was
at process start. The r13 machinery — `_wait_for_quiet` under the
probes and the settled-end check behind `--round-artifact` — is what
keeps a verdict like AMBIENT/CONFIRMED-ELEVATED from inheriting the
noise it exists to remove, so the primitive's behavior is pinned here
(no Spark session; load and sleep are simulated).
"""

from __future__ import annotations

import bench


def _fake_loads(monkeypatch, sequence):
    """getloadavg returns successive 1-min values from ``sequence``
    (last value repeats); sleep advances instantly and is recorded."""
    state = {"i": 0, "slept": []}

    def loadavg():
        i = min(state["i"], len(sequence) - 1)
        return (sequence[i], 0.0, 0.0)

    def sleep(sec):
        state["slept"].append(sec)
        state["i"] += 1

    monkeypatch.setattr(bench.os, "getloadavg", loadavg)
    monkeypatch.setattr(bench.time, "sleep", sleep)
    return state


def test_wait_for_quiet_immediate(monkeypatch):
    state = _fake_loads(monkeypatch, [0.3])
    quiet, load, waited = bench._wait_for_quiet(100.0)
    assert quiet and load == 0.3 and waited == 0.0
    assert state["slept"] == []  # never sleeps when already quiet


def test_wait_for_quiet_decays(monkeypatch):
    # a post-bench self-load ramp decaying through the threshold
    state = _fake_loads(monkeypatch, [8.0, 4.0, 2.0, 1.2])
    quiet, load, waited = bench._wait_for_quiet(100.0)
    assert quiet and load == 1.2
    assert waited == 30.0  # three 10 s polls
    assert state["slept"] == [10.0, 10.0, 10.0]


def test_wait_for_quiet_budget_exhausted(monkeypatch):
    # co-tenant load that never drops: the budget bounds the stall and
    # the caller must report UNPROBED-HOT instead of a verdict
    state = _fake_loads(monkeypatch, [6.0])
    quiet, load, waited = bench._wait_for_quiet(25.0)
    assert not quiet and load == 6.0
    assert waited == 25.0
    # the final partial poll is clamped to the remaining budget
    assert state["slept"] == [10.0, 10.0, 5.0]


def test_wait_for_quiet_threshold_boundary(monkeypatch):
    # exactly AT the threshold counts as quiet (<=), matching the
    # start gate's strict > refusal: a 1.50 box passes both
    _fake_loads(monkeypatch, [bench.PROBE_QUIET_LOAD1])
    quiet, _, waited = bench._wait_for_quiet(50.0)
    assert quiet and waited == 0.0


def test_auto_ab_cap_covers_r12_overflow():
    """The r12 run left +30% movers unprobed at cap 3 (v8/d11,
    overflow_not_probed). The raised cap must cover every mover count
    any round has produced (max observed: 3 flagged + 2 overflow)."""
    assert bench.AUTO_AB_MAX >= 5


def test_alltime_min_per_rank(tmp_path):
    """The r14 mover field's source (r13 verdict #3): per-rank minimum
    across every prior artifact, skipping unreadable files and
    non-numeric entries."""
    import json

    a = tmp_path / "bench_local_r11.json"
    b = tmp_path / "bench_local_r12.json"
    c = tmp_path / "bench_local_r13.json"
    a.write_text(json.dumps({"queries": {"v9": 0.61, "j14": 0.95}}))
    b.write_text(json.dumps({"queries": {"v9": 0.80, "j14": 0.91, "x": "n/a"}}))
    c.write_text("{not json")
    got = bench._alltime_min_per_rank([str(a), str(b), str(c), str(tmp_path / "missing.json")])
    assert got == {"v9": 0.61, "j14": 0.91}


def test_alltime_min_per_rank_scans_artifacts(tmp_path):
    """_alltime_min_per_rank must take the per-rank MINIMUM across all
    readable artifacts, ignore non-numeric query values, and skip
    unreadable files (scratch runs, partial writes) — and the mover
    predicate `old <= alltime.get(k, old)` over its output must mark
    exactly the all-time-floor priors (r14 review: the previous test
    asserted literals and exercised no bench.py code)."""
    import json as _json

    import bench

    a1 = tmp_path / "bench_local_r1.json"
    a1.write_text(_json.dumps({"queries": {"v9": 0.80, "j14": 1.20}}))
    a2 = tmp_path / "bench_local_r2.json"
    a2.write_text(
        _json.dumps({"queries": {"v9": 0.61, "j14": 1.50, "bad": "n/a"}})
    )
    broken = tmp_path / "bench_local_r3.json"
    broken.write_text("{not json")
    missing = tmp_path / "bench_local_r4.json"

    alltime = bench._alltime_min_per_rank(
        [str(a1), str(a2), str(broken), str(missing)]
    )
    assert alltime == {"v9": 0.61, "j14": 1.20}

    # the _auto_ab entry predicate over the real dict: the floor prior
    # flags True, an above-floor prior False, an unknown rank defaults
    # to True (its only figure IS its minimum)
    assert (0.61 <= alltime.get("v9", 0.61)) is True
    assert (1.50 <= alltime.get("j14", 1.50)) is False
    assert (1.0 <= alltime.get("new_rank", 1.0)) is True


def test_start_quiet_wait_hot_box(monkeypatch):
    """r14 verdict #2: the driver's r14 bench started at 1-min load
    16.02 (ungated — no --round-artifact) and poisoned ~50 comparisons.
    Every run now waits, bounded, for the box to settle before the
    first measurement."""
    state = _fake_loads(monkeypatch, [16.0, 6.0, 2.0, 1.1])
    monkeypatch.delenv("SPARK_GRAFT_START_QUIET_BUDGET", raising=False)
    prewait, waited = bench._start_quiet_wait()
    assert prewait[0] == 16.0
    assert waited == 30.0  # decayed through the threshold in 3 polls
    assert state["slept"] == [10.0, 10.0, 10.0]


def test_start_quiet_wait_quiet_box(monkeypatch):
    state = _fake_loads(monkeypatch, [0.4])
    monkeypatch.delenv("SPARK_GRAFT_START_QUIET_BUDGET", raising=False)
    prewait, waited = bench._start_quiet_wait()
    assert prewait[0] == 0.4 and waited == 0.0 and state["slept"] == []


def test_start_quiet_wait_opt_out(monkeypatch):
    state = _fake_loads(monkeypatch, [16.0])
    monkeypatch.setenv("SPARK_GRAFT_START_QUIET_BUDGET", "0")
    prewait, waited = bench._start_quiet_wait()
    assert prewait[0] == 16.0 and waited == 0.0 and state["slept"] == []
