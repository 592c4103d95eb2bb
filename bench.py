"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

stdout ends with ONE COMPACT JSON line (r9 verdict #1 — the driver's
tail capture is ~1.5 KB, so the full ~10 KB per-query map made
BENCH_r08/r09 land "parsed": null):
  {"metric": "...", "value": <steady total sec>, "unit": "sec",
   "sf": ..., "queries": {<slowest 10>}, "sync_rows_per_sec": N,
   "stream_rows_per_sec": {...}, "t8_rocksdb_rows_per_sec": N,
   "soak_converged": true, "load_avg_start": [...], ...}

The FULL artifact (every per-query steady/cold figure, soak iteration
detail, bench notes) is written to bench_local_r{N}.json — the
committed record bench_diff.py compares round-over-round.

Pass ``--round-artifact`` when producing the COMMITTED round record:
the run refuses to start if the 1-min load average exceeds 1.5
(CLAUDE.md's ambient-window rule, enforced mechanically per r10
verdict #7). Scratch runs (no flag) are never gated.

Each query is materialized through the noop sink (forces full column
computation, no driver collect overhead). The sync throughput figure is
rows-merged-per-second of the upsert pipeline, comparable to the
reference's ~6,000 rows/s local baseline (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pypgsync_spark.queries import REGISTRY, bench_queries
from pypgsync_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Generated from the registry's bench tags (QuerySpec.bench) so a new
# query lands in the bench in the same commit that registers it; the
# rank gives a stable execution order independent of the registry's
# per-round verification rotation.
BENCH_QUERIES = bench_queries()


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _run_soak(spark, base: str, n_events: int) -> dict:
    """Continuous-mode soak (r8 verdict #4): the reference's second
    headline is the infinite re-run loop (cli.py:80-97). Model it as
    an APPENDING landing zone: the events fixture is split into 5
    version-ordered arrival waves, each iteration drops one more wave
    file into the source dir and runs a full sync_table pass
    (watermark -> delta -> merge -> atomic store commit: the T1/T2/T4
    composition), plus one final no-new-data iteration that must
    converge. Stages under ``base`` (caller reaps it)."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.functions.time import to_millis
    from pypgsync_spark.sync import ParquetSyncedTable, sync_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        to_millis("ts").alias("updated_ms"),
    )
    n_waves = 5
    # global-window ntile = one task — fine HERE because this is
    # one-time fixture STAGING (building the arrival waves), not the
    # measured sync path; the measured loop below is the ordinary
    # distributed watermark -> delta -> merge pipeline
    waved = ev.withColumn(
        "__wave",
        F.ntile(n_waves).over(Window.orderBy("updated_ms", "event_id")),
    )
    # ONE partitioned write stages all waves (one sort, not one
    # re-scan + re-sort per wave); the data files inside each
    # __wave=w directory carry exactly the data columns, so copying
    # them into the landing zone reproduces plain arrivals
    waved.repartition(4).write.partitionBy("__wave").parquet(f"{base}/waves")
    incoming = f"{base}/incoming"
    os.makedirs(incoming)
    store = ParquetSyncedTable(spark, f"{base}/dst")

    def src_loader():
        return spark.read.parquet(incoming)

    def _store_rows() -> int:
        df = store.read()
        return df.count() if df is not None else 0

    iterations = []
    rows_before = 0
    for w in range(1, n_waves + 2):
        if w <= n_waves:  # wave w arrives; last pass sees no new data
            wave_dir = f"{base}/waves/__wave={w}"
            for f in os.listdir(wave_dir):
                if f.endswith(".parquet"):
                    shutil.copy(f"{wave_dir}/{f}", f"{incoming}/w{w}_{f}")
        t0 = time.time()
        st = sync_table(src_loader(), store, ["event_id"], "updated_ms")
        sec = time.time() - t0
        # ADVICE r9: delta_rows for waves 2+ includes the low-watermark
        # boundary re-read on top of genuinely new rows. Report
        # throughput on NEW rows (store growth — the count runs after
        # the clock stops); delta_rows stays in the artifact as the
        # merge-input figure.
        rows_after = _store_rows()
        new_rows = rows_after - rows_before
        rows_before = rows_after
        iterations.append(
            {
                "delta_rows": st.delta_rows,
                "new_rows": new_rows,
                "sec": round(sec, 3),
                "rows_per_sec": round(new_rows / max(sec, 1e-9)),
            }
        )
    final_rows = rows_before
    # The final pass sees no new files; its delta is ONLY the
    # low-watermark boundary rows (the closed-range re-read the
    # reference uses, session.py:129-132 — harmless because the merge
    # is idempotent). Convergence = destination holds exactly the
    # fixture, every fixture row landed exactly once as new, and the
    # idle pass landed nothing new (its delta collapsed to the
    # boundary re-read).
    boundary_rows = iterations[-1]["delta_rows"]
    new_total = sum(i["new_rows"] for i in iterations)
    return {
        "iterations": iterations,
        "final_rows": final_rows,
        "idle_pass_boundary_rows": boundary_rows,
        "converged": (
            final_rows == n_events
            and new_total == n_events
            and iterations[-1]["new_rows"] == 0
        ),
        "total_sec": round(sum(i["sec"] for i in iterations), 3),
        "note": "delta_rows includes the idempotent boundary "
        "re-read; rows_per_sec divides new_rows (ADVICE r9)",
    }


# CLAUDE.md's ambient-load commit threshold, enforced mechanically for
# round artifacts (r10 verdict #7): a bench started on a busy box
# poisons the next round's comparison, and the human-reads-CLAUDE.md
# guard failed once already (the r10 working-tree run started at 2.98).
ROUND_ARTIFACT_MAX_LOAD1 = 1.5

# r11 verdict #7: auto-A/B movers at commit time. Any rank whose
# closure fingerprint is identical to the recorded green round but
# whose steady time moved >= AUTO_AB_THRESHOLD x vs the prior round's
# committed bench_local artifact gets an immediate same-session
# isolated min-of-5 written into the artifact, so the ambient-vs-real
# call is data-backed when the artifact is committed instead of
# next-round archaeology (the d9/pipe2 r11 case).
AUTO_AB_THRESHOLD = 1.3
# r12 verdict #3: a cap of 3 left +30% movers silently unprobed
# (v8/d11 overflow_not_probed). 6 covers every >=1.3x mover any round
# has produced; the quiet-wait below keeps the extra probes honest.
AUTO_AB_MAX = 6

# r12 verdict (what's-wrong #1): both r12 runs gated load at START
# only — the auto-A/B probes, whose entire purpose is a clean isolated
# re-measure, ran at 1-min loads 3.97–10.87 and their AMBIENT/
# CONFIRMED verdicts inherited the noise they were built to remove.
# Probes now wait for the box to settle first. The settle threshold is
# the same 1.5 CLAUDE.md uses for run starts: our own JVM is idle
# while waiting, so a 1-min load above it is co-tenant activity (or
# our own not-yet-decayed steady-loop load, which decays through the
# wait all the same).
PROBE_QUIET_LOAD1 = 1.5
# Shared across all probes in a run: self-load from each probe's own
# 5 samples re-inflates the 1-min average, so later movers re-wait.
# ~7 min bounds the worst case (6 movers x ~70 s decay) without
# letting a busy box stall the run indefinitely.
PROBE_WAIT_BUDGET_SEC = 420.0

# Per-rank hot gate for round artifacts (r12 verdict #1's ">N ranks
# measured hot"): ranks run back-to-back, so their start-sample load
# mixes self-load with co-tenant. RECALIBRATED in the r14
# optimization round, with evidence: the pre-r14 engine's self-load
# sat ~2-6 because its CPU-dense stages ran under-coalesced (4-15
# tasks on 32 cores — the exact defect the round fixed); at full
# parallelism the bench's OWN load on a provably idle box (start
# 0.02, settled end 1.29-1.34 within the wait budget, two
# consecutive runs) reads median ~6, max ~11, which tripped the old
# 8.0 threshold on 39-43 ranks and downgraded both runs. 13.0 sits
# above the measured self-load band while still catching the upper
# half of the r13 co-tenant signature (8-20); the idle-box
# start/settled-end <= 1.5 gates remain the primary co-tenant
# detectors. The two downgraded-run artifacts are preserved in the
# r14 notes (136.3 s / 140.9 s — BOTH slower than the quiet scratch
# 127.4 s, i.e. the gate fired on runs that hurt, not helped, the
# round's numbers).
HOT_RANK_LOAD1 = 13.0
MAX_HOT_RANKS = 12


def _wait_for_quiet(budget_sec: float, threshold: float = PROBE_QUIET_LOAD1,
                    poll_sec: float = 10.0) -> tuple[bool, float, float]:
    """Idle until the 1-min load drops below ``threshold`` or
    ``budget_sec`` is spent. Returns (quiet, load_now, sec_waited)."""
    waited = 0.0
    load = os.getloadavg()[0]
    while load > threshold and waited < budget_sec:
        step = min(poll_sec, budget_sec - waited)
        time.sleep(step)
        waited += step
        load = os.getloadavg()[0]
    return load <= threshold, round(load, 2), round(waited, 1)


def _infer_round() -> int:
    """Round being benched: the driver writes BENCH_r{N}.json after
    this run, so max(existing)+1 is current for local runs and the
    driver's end-of-round run alike. ADVICE r7: max+1 misnumbers a
    local re-run made AFTER the driver already wrote this round's
    BENCH file — SPARK_GRAFT_BENCH_ROUND overrides."""
    import glob
    import re

    env_round = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
    if env_round:
        return int(env_round)
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    n = max(rounds, default=0) + 1
    print(
        f"# bench round inferred as r{n:02d} (max existing BENCH_r*+1); "
        f"set SPARK_GRAFT_BENCH_ROUND to override",
        file=sys.stderr,
    )
    return n


def _alltime_min_per_rank(artifact_paths) -> dict:
    """Per-rank minimum steady time across prior bench_local artifacts
    (r13 verdict #3, the v9 lesson): a mover ratio computed against a
    prior figure that is the rank's ALL-TIME minimum is the classic
    regression-to-the-mean shape — the mover record says so, so the
    flag is self-documenting instead of costing a triage next round.
    Unreadable artifacts are skipped (scratch runs, partial writes)."""
    alltime: dict = {}
    for p in artifact_paths:
        try:
            with open(p) as f:
                queries = json.load(f).get("queries") or {}
        except (OSError, json.JSONDecodeError):
            continue
        for k, v in queries.items():
            if isinstance(v, (int, float)):
                alltime[k] = min(alltime.get(k, v), v)
    return alltime


def _auto_ab(spark, times: dict, bench_round: int) -> dict:
    """Same-session isolated min-of-5 for fingerprint-identical ranks
    that moved >= AUTO_AB_THRESHOLD x vs the prior round's committed
    artifact (largest ratios first, capped at AUTO_AB_MAX — the cap
    keeps a globally-loaded run from re-timing half the catalog).
    Sub-0.5 s prior figures are skipped (bench_diff's jitter band).
    The isolated samples run warm in THIS session, so they are the
    like-for-like comparison CLAUDE.md's triage rules require."""
    import glob
    import re

    from pypgsync_spark.queries import _recorded_fingerprints
    from pypgsync_spark.queries.fingerprint import spec_fingerprint

    here = os.path.dirname(os.path.abspath(__file__))
    priors = [
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(here, "bench_local_r*.json"))
        if (m := re.search(r"bench_local_r(\d+)\.json$", p)) and int(m.group(1)) < bench_round
    ]
    if not priors:
        return {"skipped": "no prior-round bench_local artifact"}
    _, prior_path = max(priors)
    with open(prior_path) as f:
        prior_q = json.load(f).get("queries", {})
    alltime_min = _alltime_min_per_rank(p for _, p in priors)

    rec = _recorded_fingerprints()
    movers = []
    for k, cur_sec in times.items():
        old = prior_q.get(k)
        if old is None or old < 0.5:
            continue
        ratio = cur_sec / old if old else float("inf")
        if ratio < AUTO_AB_THRESHOLD:
            continue
        spec = REGISTRY.get(k)
        if spec is None or k not in rec:
            continue  # NEW rank — no baseline claim to defend
        if spec_fingerprint(spec.fn, spec.oracle) != rec[k].get("fp"):
            continue  # closure changed: bench_diff's CODE path, bisect it
        movers.append((ratio, k, old, cur_sec))
    movers.sort(reverse=True)

    out: dict = {
        "prior_artifact": os.path.basename(prior_path),
        "threshold": AUTO_AB_THRESHOLD,
        "movers": {},
    }
    wait_budget = PROBE_WAIT_BUDGET_SEC
    for ratio, k, old, cur_sec in movers[:AUTO_AB_MAX]:
        # r12 verdict: a probe measured at load 10 inherits the noise
        # it exists to remove. Wait (bounded, budget shared across
        # movers, largest ratios served first) for the box to settle;
        # if it never does, say UNPROBED-HOT instead of guessing.
        quiet, load_now, waited = _wait_for_quiet(wait_budget)
        wait_budget = max(0.0, wait_budget - waited)
        entry = {
            "prior_sec": old,
            "steady_sec": cur_sec,
            "ratio_vs_prior": round(ratio, 2),
            "load_1min_at_probe": load_now,
            "quiet_wait_sec": waited,
            # True when the prior-round figure is the best this rank
            # has EVER recorded — an elevated ratio against an all-time
            # minimum is regression-to-the-mean until proven otherwise
            # (r13's v9/v8/d11 triage, verdict #3)
            "prior_is_alltime_min": old <= alltime_min.get(k, old),
        }
        if not quiet:
            entry["verdict"] = "UNPROBED-HOT"
            out["movers"][k] = entry
            print(f"# auto_ab {k}: {old:.2f} -> {cur_sec:.2f} steady, "
                  f"box never settled (load {load_now}) -> UNPROBED-HOT",
                  file=sys.stderr)
            continue
        fn = REGISTRY[k].fn
        samples = []
        for _ in range(5):
            t0 = time.time()
            materialize(fn(spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        best = min(samples)
        entry["isolated_min5"] = samples
        entry["isolated_min"] = best
        # AMBIENT: the immediate warm re-measure lands back within
        # 15% of the prior round's figure — the loop-timed sample
        # was a transient. CONFIRMED-ELEVATED: it reproduces in
        # the same session; with an identical fingerprint that
        # means environment (JVM, ambient, data layout), not code,
        # but it deserves eyes either way.
        entry["verdict"] = "AMBIENT" if best <= 1.15 * old else "CONFIRMED-ELEVATED"
        out["movers"][k] = entry
        print(f"# auto_ab {k}: {old:.2f} -> {cur_sec:.2f} steady, "
              f"isolated min5 {best:.2f} at load {load_now} -> {entry['verdict']}",
              file=sys.stderr)
    if movers[AUTO_AB_MAX:]:
        out["overflow_not_probed"] = [k for _, k, _, _ in movers[AUTO_AB_MAX:]]
    return out


def _start_quiet_wait() -> tuple[list[float], float]:
    """r15 (r14 verdict #2): EVERY run — the driver's ungated
    invocation included — waits (bounded) for the box to settle before
    the first measurement. The r14 driver run started at 1-min load
    16.02 and poisoned ~50 small-query comparisons; a 1-min load
    decays e-fold per idle minute, so the default budget comfortably
    absorbs even that spike. Opt out with
    SPARK_GRAFT_START_QUIET_BUDGET=0. Returns (pre-wait loadavg,
    seconds waited); the artifact records both so a reader can see
    what the run walked in on."""
    load_prewait = [round(x, 2) for x in os.getloadavg()]
    budget = float(os.environ.get("SPARK_GRAFT_START_QUIET_BUDGET", "420"))
    waited = 0.0
    if load_prewait[0] > ROUND_ARTIFACT_MAX_LOAD1 and budget > 0:
        _, load_now, waited = _wait_for_quiet(
            budget, threshold=ROUND_ARTIFACT_MAX_LOAD1
        )
        print(
            f"# start quiet-wait: load {load_prewait[0]} -> {load_now} "
            f"after {waited}s",
            file=sys.stderr,
        )
    return load_prewait, waited


def main() -> None:
    load_prewait, quiet_wait_start = _start_quiet_wait()
    # r9 verdict #3: the artifact carries its own ambient-load evidence
    # (CLAUDE.md's uptime-probe rule, automated) — bench_diff.py reads
    # these to back its CODE/AMBIENT verdicts.
    load_start = [round(x, 2) for x in os.getloadavg()]
    round_artifact = "--round-artifact" in sys.argv[1:]
    if round_artifact and load_start[0] > ROUND_ARTIFACT_MAX_LOAD1:
        print(
            f"REFUSED: --round-artifact requires 1-min load <= "
            f"{ROUND_ARTIFACT_MAX_LOAD1} at start (observed {load_start[0]}). "
            "Wait for the box to quiet down and re-run; a scratch run "
            "(no flag) is still allowed.",
            file=sys.stderr,
        )
        sys.exit(2)
    spark = get_spark(app_name="pypgsync_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches
    REGISTRY["a6_count_star"].fn(spark, SF_DIR).count()

    # Each query runs three times: the first run pays one-time session
    # costs (whole-stage-codegen compilation, Python-worker pool
    # startup, parquet footer reads) that are milliseconds-against-hours
    # at real scale; the steady figure is the MIN of the two warm runs —
    # min-of-k is the standard noise-robust point estimate for a
    # deterministic workload (transient co-tenant load only ever adds
    # time; the round-2 sweep showed +50% swings on untouched queries
    # from exactly that). The headline metric is steady state — the
    # apples-to-apples comparison with the baseline's warm-database
    # rows/s (BASELINE.md) — with cold times reported alongside.
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    # r12 verdict (what's-wrong #1): per-rank load evidence. Ranks run
    # back-to-back, so mid-run 1-min load is dominated by our OWN
    # local[32] work — these numbers are NOT a co-tenant gate (the
    # settled checks at probe time and run end are); they let
    # bench_diff see where in the run a co-tenant spike landed by
    # comparing a rank's load against the same rank's quiet-box
    # profile from a prior artifact.
    rank_load: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        rank_load[name] = round(os.getloadavg()[0], 2)
        t0 = time.time()
        materialize(fn(spark, SF_DIR))
        cold[name] = round(time.time() - t0, 3)
        warm = []
        for _ in range(2):
            t0 = time.time()
            materialize(fn(spark, SF_DIR))
            warm.append(time.time() - t0)
        # r9: a third warm sample when the first two disagree by >25% —
        # exactly the co-tenant-spike signature that inflated four r9
        # runs in four different places (r9_ambient_day note). Costs
        # nothing on a quiet box, halves the spike's leverage on a
        # noisy one; min-of-k only ever converges downward, so this is
        # a strictly better estimate of the same quantity.
        if max(warm) > 1.25 * min(warm):
            t0 = time.time()
            materialize(fn(spark, SF_DIR))
            warm.append(time.time() - t0)
        times[name] = round(min(warm), 3)

    bench_round = _infer_round()

    # sync throughput: rows merged per second through the upsert
    # pipeline. This is THE headline figure vs the reference baseline,
    # derived from one sub-second query — min-of-2 leaves it with a
    # ±2x ambient band this box demonstrated within a single r8
    # afternoon (141k-305k rows/s on identical code). Give the probe
    # extra warm samples: min-of-8 on a deterministic workload
    # converges on capability (co-tenant load only ever adds time).
    from pypgsync_spark.catalog import load_table

    n_events = load_table(spark, SF_DIR, "events").count()
    s3_fn = REGISTRY["s3_upsert_merge"].fn
    s3_warm = [times["s3_upsert_merge"]]
    for _ in range(6):
        t0 = time.time()
        materialize(s3_fn(spark, SF_DIR))
        s3_warm.append(time.time() - t0)
    sync_rps = round(n_events / max(min(s3_warm), 1e-9))

    # Streaming throughput (r7 verdict #7): the reference's second
    # headline number is continuous-mode sync rows/s (cli.py:80-97,
    # ~1,200 rows/s remote). Record the micro-batch analogues: t5 (the
    # plain stateful balance sync — timed here, it is not in the
    # headline list) and bench-tagged t8 (the transition-gated variant,
    # steady time reused from the loop above). Each drains the full
    # events fixture through availableNow micro-batches, so rows/s =
    # n_events / steady seconds.
    t5_fn = REGISTRY["t5_stateful_balance"].fn
    materialize(t5_fn(spark, SF_DIR))  # session costs
    t5_warm = []
    for _ in range(2):
        t0 = time.time()
        materialize(t5_fn(spark, SF_DIR))
        t5_warm.append(time.time() - t0)
    stream_rps = {
        "t5_stateful_balance": round(n_events / max(min(t5_warm), 1e-9)),
        "t8_transition_gated_balance": round(
            n_events / max(times["t8_transition_gated_balance"], 1e-9)
        ),
    }

    # hybrid-CC round counts for d5 (round-5 verdict: make the bench
    # carry the evidence of how much work the CC stage actually did)
    from pypgsync_spark.queries.textops import D5_CC_STATS

    # RocksDB state-store line for the stateful gate (round-4 advisor
    # #6 / round-5 verdict #9): same t8 pipeline with
    # store_provider="rocksdb". ON by default as of r10 (r9 verdict #2:
    # the driver's own artifact said "skipped" for the evidence the
    # 100 TB streaming claim leans on); opt OUT with
    # SPARK_GRAFT_ROCKSDB=0. Kept out of the headline steady total so
    # round-over-round comparability holds.
    # Now that it runs by default, a failure here (provider class
    # missing from the Spark build, transient stream error) must NOT
    # abort the run after ~100 headline queries have been timed but
    # before the artifact and summary line are written — that would
    # reproduce the exact parsed:null blindness r9 verdict #1 fixed.
    # Record the error in the artifact instead.
    if os.environ.get("SPARK_GRAFT_ROCKSDB", "1") != "0":
        import shutil
        import tempfile

        from pypgsync_spark.queries.streamq import _events_stream_source
        from pypgsync_spark.catalog import table_path
        from pypgsync_spark.streaming.gated import gated_balance

        work_dirs: list[str] = []

        def run_rocksdb() -> float:
            # fresh work dir per run: each is a full from-scratch drain
            # of the fixture through the RocksDB-backed state store
            work = tempfile.mkdtemp(prefix="bench_t8_rocksdb_")
            work_dirs.append(work)
            t0 = time.time()
            gated_balance(
                spark,
                source_path=table_path(SF_DIR, "events"),
                schema=_events_stream_source(spark, SF_DIR),
                contrib_dir=f"{work}/contrib",
                checkpoint_dir=f"{work}/ckpt",
                store_provider="rocksdb",
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        try:
            cold_sec = run_rocksdb()  # pays the one-time JNI/native load
            sec = min(run_rocksdb() for _ in range(2))
            t8_rocksdb = {
                "sec": round(sec, 3),
                "cold_sec": round(cold_sec, 3),
                "rows_per_sec": round(n_events / max(sec, 1e-9)),
            }
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed silently
            t8_rocksdb = {"error": f"{type(e).__name__}: {e}"[:500]}
        finally:
            # scratch holds a full contribution log + checkpoint per
            # run; without this every default bench run leaks 3 dirs
            for w in work_dirs:
                shutil.rmtree(w, ignore_errors=True)
    else:
        t8_rocksdb = {"skipped": "SPARK_GRAFT_ROCKSDB=0 set; unset to bench the RocksDB state store"}

    # Continuous-mode soak (r8 verdict #4): the reference's second
    # headline is the infinite re-run loop (cli.py:80-97). Model it as
    # an APPENDING landing zone: the events fixture is split into 5
    # version-ordered arrival waves, each iteration drops one more
    # wave file into the source dir and runs a full sync_table pass
    # (watermark -> delta -> merge -> atomic store commit: the
    # T1/T2/T4 composition), plus one final no-new-data iteration that
    # must converge. ON by default as of r10 (r9 verdict #2); opt OUT
    # with SPARK_GRAFT_SOAK=0. Not part of the headline total, so
    # round-over-round comparability holds.
    # Same failure-isolation rule as the RocksDB section above: the
    # soak runs by default now, so it records its error instead of
    # aborting the run, and its staging always gets reaped.
    if os.environ.get("SPARK_GRAFT_SOAK", "1") != "0":
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="bench_soak_")
        try:
            soak = _run_soak(spark, base, n_events)
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed silently
            soak = {"error": f"{type(e).__name__}: {e}"[:500]}
        finally:
            shutil.rmtree(base, ignore_errors=True)
    else:
        soak = {"skipped": "SPARK_GRAFT_SOAK=0 set; unset to run the continuous-mode soak"}

    # auto-A/B LAST among the measured sections (r12 self-review): the
    # movers' isolated re-measures used to run straight off the steady
    # loop's own load ramp (observed 1-min load ~10 at probe time),
    # which could stamp CONFIRMED-ELEVATED from co-tenant noise alone.
    # Here every timed section is already captured and the box has the
    # soak/RocksDB tail to settle through; the probe's own load still
    # rides along in load_1min_at_probe for the reader.
    auto_ab = _auto_ab(spark, times, bench_round)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    load_end = [round(x, 2) for x in os.getloadavg()]
    # r12 verdict (what's-wrong #1): the start gate alone let both r12
    # runs finish polluted (0.13 -> 8.22 ramp). For a round artifact,
    # also require the box to SETTLE after the measured sections — our
    # JVM is idle during the wait, so a 1-min load that will not drop
    # below the threshold within the budget is co-tenant activity that
    # was present while the tail sections ran. Scratch runs skip the
    # wait (evidence-only) so the driver's own run never stalls on it.
    settled_quiet, settled_load = True, load_end[0]
    if round_artifact and load_end[0] > ROUND_ARTIFACT_MAX_LOAD1:
        settled_quiet, settled_load, _ = _wait_for_quiet(
            180.0, threshold=ROUND_ARTIFACT_MAX_LOAD1
        )
    if round_artifact and not settled_quiet:
        round_artifact = False
        print(
            f"DOWNGRADED to scratch: end-of-run 1-min load never settled "
            f"below {ROUND_ARTIFACT_MAX_LOAD1} (observed {settled_load}) — "
            "co-tenant load overlapped the measured sections; re-run on a "
            "quiet box before committing this round's artifact.",
            file=sys.stderr,
        )
    # r13: the settle gate alone missed a MID-run co-tenant spike that
    # ended before run end (the first r13 --round-artifact attempt:
    # steady total 195.8 s vs 122.6 quiet, 27 ranks sampled above
    # load 8 — several of them sub-second queries, which local[32]
    # self-load alone never pushes past ~6 between back-to-back
    # ranks). A round artifact additionally refuses when too many
    # ranks were HOT at their start sample.
    hot_ranks = [k for k, v in rank_load.items() if v > HOT_RANK_LOAD1]
    if round_artifact and len(hot_ranks) > MAX_HOT_RANKS:
        round_artifact = False
        print(
            f"DOWNGRADED to scratch: {len(hot_ranks)} ranks started above "
            f"1-min load {HOT_RANK_LOAD1} (cap {MAX_HOT_RANKS}) — a "
            "co-tenant window overlapped the steady loop; re-run on a "
            "quiet box before committing this round's artifact.",
            file=sys.stderr,
        )
    out = {
        "round_artifact": round_artifact,
        "load_avg": {"start": load_start, "end": load_end,
                     "settled_end": settled_load,
                     "prewait_start": load_prewait,
                     "quiet_wait_start_sec": quiet_wait_start},
        "load_1min_per_rank": rank_load,
        "metric": "headline_queries_wall_clock_steady",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_cold": cold,
        "cold_value": round(sum(cold.values()), 3),
        "sf": float(sf) if sf else SF_DIR,
        "sync_rows_per_sec": sync_rps,
        "stream_rows_per_sec": stream_rps,
        "n_events": n_events,
        "d5_cc_stats": dict(D5_CC_STATS),
        "t8_rocksdb": t8_rocksdb,
        "continuous_soak": soak,
        "auto_ab": auto_ab,
        "notes": {
            "r13_mm9_code_flag": "bench_diff r12->r13 labels mm9 CODE "
            "(0.95 -> 1.38): a FALSE positive of the r13 fingerprint-"
            "determinism fix — mm9's fingerprint changed because the "
            "ALGORITHM stopped hashing its empty _PH_BANDS_CACHE, not "
            "because code did (git diff r12..r13 on operators/"
            "multimodal.py is EMPTY and mm9's fn body is untouched; "
            "the oracle refactor to the shared _DUCK_PH_SIG_CHAIN "
            "renders byte-identical SQL, verified at refactor time). "
            "Same-day same-code warm steadies spanned 0.84-1.38 "
            "across three runs on an afternoon whose co-tenant swings "
            "poisoned two of them — ambient. d3/d5 carry the same "
            "algorithm-only fingerprint delta; the r13 sweep re-greens "
            "all three and re-records their fingerprints, after which "
            "the label heals. Expect NO such false positive in r14+.",
            "r13_t5_tail_watch": "the committed r13 artifact's TAIL "
            "sections (t5/rocksdb/soak run after the 126-rank steady "
            "loop) overlapped end-of-run ambient: rocksdb 23.9k and "
            "soak 11.2 s re-measured QUIET same-day at 39.1k / 6.2 s "
            "converged — read those as the r13 figures. t5 is the one "
            "watch item: 40.2k in-run AND 39.7k quiet-isolated, below "
            "its 49.7-59.8k r8-r12 band, while t8 sits exactly in-band "
            "(46.7k) and t5's closure fingerprint is unchanged. "
            "CLOSED same-day by a controlled tree A/B on one box: "
            "fresh-session min-of-3 at the r12 TREE 1.749 s (57.2k) "
            "vs r13 HEAD 1.890 s (52.9k) — 8%, inside the streaming-"
            "drain jitter band; the two ~40k readings were the slow "
            "edge of a 1.75-2.52 s same-day spread on identical code. "
            "AMBIENT; nothing to bisect.",
            "r13_j14_flag": "auto-A/B's one r13 CONFIRMED-ELEVATED "
            "(j14 0.91 -> 1.26 steady, quiet-isolated min5 1.11 at "
            "load 1.34) is the same fingerprint-identical j14 that "
            "moved +33% in the r7->r8 ambient cohort (CLAUDE.md "
            "triage note); 1.22x on a sub-1.3 s TPC-H join shape is "
            "inside this box's documented small-query band. Watch, "
            "don't bisect: nothing in its closure changed since r5.",
            "r14_j14_closed": "the r13 CONFIRMED-ELEVATED flag CLOSED "
            "AMBIENT by the controlled tree A/B the r13 verdict asked "
            "for (the r13_t5_tail_watch pattern): interleaved "
            "fresh-session isolated min-of-5 at sf0.1 on one box at "
            "1-min load 0.7-1.9, r12 TREE (4db44c0) vs r14 HEAD, two "
            "rounds each — r12 tree {1.033, 1.213}, HEAD {1.209, "
            "1.086}. Fully overlapping bands and the ordering REVERSES "
            "between rounds, so HEAD is not slower than the tree that "
            "produced the 0.91 baseline; that figure was a warm-bench "
            "steady (100+ prior ranks warm the worker pool — the r10 "
            "isolated-vs-steady caveat) and the r13 1.26 was the slow "
            "edge of the same jitter band. Fingerprint unchanged since "
            "r5; nothing to bisect. The new prior_is_alltime_min mover "
            "field makes this flag shape self-documenting from r14 on.",
            "r13_v9_v8_d11_triage": "the r12 auto-A/B's one "
            "CONFIRMED-ELEVATED flag (v9, probed at load 4.93) and its "
            "two unprobed overflow movers (v8 +32%, d11 +31%) are ALL "
            "AMBIENT, closed two ways on a quiet-start r13 morning "
            "(co-tenant load 0.07): (1) a full scratch bench measured "
            "steadies v9 0.719 / v8 2.052 / d11 2.149 — inside their "
            "r8-r12 historical bands (v9 0.61-0.80, v8 1.67-2.21, d11 "
            "1.63-2.37; v8's r12 2.202 ~= its r9 2.214) with "
            "fingerprints identical throughout; (2) the r11 committed "
            "figures these ratios were computed against are the "
            "all-time MINIMA for all three — the flags were "
            "regression-to-the-mean from an unusually good r11 run, "
            "not code. No action; v5/v8/d14/pipe4's r13 kernel "
            "migration then moved the whole family DOWN (see "
            "r13_hof_migration).",
            "r13_hof_migration": "ivf_assign's k x dim interpreted "
            "Column-HOF cosines per row became one Arrow-batched "
            "sequential-cumsum kernel, and cosine_pairs_lsh_gated / "
            "lsh_ann_topk moved to the r12 vectorized hyperplane "
            "signer (keep_vec passthrough, no join back). "
            "Bit-identical by construction (cumsum = the left fold; "
            "pinned by test_ivf_assign_kernel_matches_column_form) and "
            "oracle-neutral (driver_sim 206/206 post-migration). "
            "Same-morning same-box warm min-of-3 vs the pre-migration "
            "scratch steadies: v8 2.05->1.15, v2b 2.09->0.80, d14 "
            "2.17->1.15, pipe4 3.94->2.27 — roughly minus 45% across "
            "the family; expect the r12->r13 bench_diff to flag these "
            "as CODE movers in the good direction.",
            "r14_rank_retirement": "restated per r13 verdict #6: NOT "
            "yet triggered. The committed r14 artifact carries 128 "
            "ranks at 125.8 s quiet steady (start load 0.45, "
            "settled end 1.43) — r13's 131.2 s with one MORE rank's "
            "work, i.e. flat-to-down round-over-round and still "
            "under the 135 s revisit trigger. r14 adds eight more "
            "ranks after the artifact (v13/tx17/mm12/v14/pipe8/d16/v15/"
            "mm13 at 131-138, "
            "first figures land in the driver's BENCH_r14), so "
            "project ~136 ranks / ~145 s next round (the new ranks "
            "warm-timed 1.3-6.0 s each at bench settings, ~16.5 s "
            "total) — the 150 s crossing may arrive ~r15-r16, so "
            "evaluate the retirement rule AT r15, not after it. "
            "First candidates "
            "unchanged (d6 vs d5, d13 vs d12, d9 vs pipe2's "
            "embedded canonicalization).",
            "r14_catalog_growth": "r14 adds d15_paragraph_dedup / "
            "mm11_audio_fp_pairs / pipe7_cross_modal_screen at ranks "
            "128-130 (in the committed artifact) and "
            "v13_sq8_ann_topk / tx17_dsir_weights / "
            "mm12_stream_audio_screen / v14_ivf_sq8_topk / "
            "pipe8_dsir_select_pack / d16_bloom_incremental_dedup / "
            "v15_sq8_index_scan_topk / mm13_video_fp_pairs at 131-138 "
            "(post-artifact, "
            "driver-run only); compare round-over-round on shared "
            "keys (bench_diff.py), not totals.",
            "r13_rank_retirement": "restated per r12 verdict #7: NOT "
            "yet triggered. r13 carries 126 ranks (+2: mm10 at 127 "
            "alongside r12's mm9/pipe6) at ~110-125 s quiet steady; "
            "the r13 kernel migration bought back ~4 s, so growth "
            "remains slower than the r12 projection. 150 s crossing "
            "still projects ~r17; revisit at r15 or at 135 s steady, "
            "whichever first. First candidates unchanged (d6 vs d5, "
            "d13 vs d12, d9 vs pipe2's embedded canonicalization).",
            "r13_catalog_growth": "r13 adds mm10_stream_image_screen "
            "at rank 127 (124 -> 125 benched ranks); compare "
            "round-over-round on shared keys (bench_diff.py), not "
            "totals.",
            "r13_load_gates": "r12 verdict #1: the start gate alone "
            "let both r12 runs finish polluted (0.13->8.22 ramp; "
            "auto-A/B probes at loads 3.97-10.87). As of r13: "
            "(a) load_1min_per_rank records the 1-min load at each "
            "rank's cold run (evidence only — mid-run load is "
            "dominated by our own local[32] work); (b) auto-A/B "
            "probes wait for the box to settle below 1.5 (shared "
            "420 s budget, largest movers first) and report "
            "UNPROBED-HOT instead of a verdict when it never does; "
            "(c) --round-artifact additionally requires the END load "
            "to settle below 1.5 within 180 s AND fewer than 13 ranks "
            "hot (start-sample load > 8; a mid-run co-tenant spike "
            "that ends before run end poisoned the first r13 "
            "attempt), else the artifact self-downgrades to scratch "
            "and the process exits 2; "
            "(d) AUTO_AB_MAX raised 3->6 so +30% movers are never "
            "silently unprobed (r12's v8/d11 overflow).",
            "r12_a23_code_flag": "bench_diff r11->r12 flags "
            "a23_event_funnel CODE (0.34 -> 0.57): the closure "
            "changed only via the r12 helper consolidation - "
            "_dsum/_events_ms moved VERBATIM to queries/common.py, "
            "identical Column expressions, identical plan, no "
            "mechanism for a slowdown; isolated min-of-5 sat in the "
            "sub-second jitter band. Classifier conservatism "
            "(fingerprint flags closure identity, not behavior).",
            "r12_d9_pipe2_triage": "the r11 verdict's two both-run "
            "movers, closed with r12 measurements (r11 verdict #5): "
            "d9 is FLAT round-over-round on quiet-start boxes (r11 "
            "committed 4.551 -> r12 steady 4.435; the r10 3.64 is "
            "the outlier, not the baseline) - fingerprint-identical, "
            "plan unchanged, no action. pipe2's r12 steady (6.55) "
            "ran late in the bench's own load ramp (start 0.13, end "
            "9.55); the same-day isolated alternating min-of-5 at "
            "quiet start measured 5.25 ~= r11's committed 5.39 - "
            "AMBIENT per the isolated-vs-isolated rule, consistent "
            "with pipe2's documented widest-band behavior (~33 "
            "driver jobs accumulate scheduling jitter, "
            "r8_pipe2_variance). Verdict: ambient/environment for "
            "both; nothing to bisect.",
            "r12_rank_retirement": "the r9-drafted retirement rule "
            "(retire ranks fingerprint-frozen >=3 rounds whose family "
            "has a faster representative, before the wall crosses "
            "~150 s) is NOT yet triggered: r12 carries 123 ranks at "
            "~115-117 s steady on a quiet box. Growth is ~5-6 ranks "
            "(~4-6 s) per round, projecting the 150 s crossing at "
            "~r17-r18; first candidates when it triggers are the "
            "slow dedup-family redundancies (d6 vs d5, d13 vs d12, "
            "d9 vs pipe2's embedded canonicalization), each 3-5 s "
            "with a same-family faster representative. Revisit at "
            "r15 or when steady exceeds 135 s, whichever first.",
            "r12_auto_ab": "as of r12 (r11 verdict #7) every bench run "
            "auto-probes fingerprint-identical ranks that moved >=1.3x "
            "vs the prior round's committed artifact: same-session "
            "isolated min-of-5, capped at 6 movers as of r13 (largest "
            "ratio first; quiet-wait per r13_load_gates), verdict "
            "AMBIENT when the re-measure lands within 15% of the "
            "prior figure, CONFIRMED-ELEVATED otherwise, UNPROBED-HOT "
            "when the box never settles. "
            "See the top-level auto_ab key of this artifact.",
            "r11_catalog_growth": "r11 adds mm5_audio_decode_stats / "
            "mm6_video_frame_stats at ranks 120/121, "
            "pipe5_stream_curation at 122, mm7_image_resize_stats "
            "at 123, and mm8_audio_window_energy at 124 (117 -> 122 "
            "benched ranks; the committed "
            "bench_local_r11.json run B predates mm7, so it carries "
            "120 — mm7's first figure lands in the driver's "
            "BENCH_r11); compare round-over-round on shared keys "
            "(bench_diff.py), not totals.",
            "r11_two_runs": "r11 ran the round-artifact bench twice, "
            "both load-compliant at start: run A (start 0.26/1.21, "
            "119 ranks, pre-pipe5) steady 103.4 s, sync 377k, d2 "
            "4.12; run B = the committed artifact (start 0.92/2.24, "
            "final HEAD, 120 ranks incl pipe5 1.61 s) steady 115.6 "
            "s, sync 334k, d2 3.24. Same fingerprints on every "
            "shared rank - the 12 s spread and d2's 4.12->3.24 "
            "reversal are the documented co-tenant ambient band "
            "(CLAUDE.md), measured twice in one afternoon. Compare "
            "r12 against run B's per-query map; the r10->r11 "
            "bench_diff flagged only AMBIENT movers (d2, profile2), "
            "zero closure-changed.",
            "r10_kernel_fixes": "late r10 changed four kernels (knn "
            "stable-argsort tie-break, LSH pair dedup via max-agg, "
            "streaming drain consolidation, lang_id NULL guard); a "
            "same-day A/B at final HEAD showed every closure-changed "
            "query drifting at or below the ambient cohort - no "
            "measurable code cost (see bench_local_r10.json "
            "r10_kernel_fixes_provenance). Isolated fresh-session "
            "probes are ~2x warm-bench steadies; compare "
            "like-for-like runs only.",
            "r10_catalog_growth": "r10 adds pipe4_curation_pipeline "
            "at rank 118 (115 -> 116 benched ranks); compare "
            "round-over-round on shared keys (bench_diff.py), not "
            "totals.",
            "r10_bench_output": "stdout now ends with ONE compact "
            "summary JSON line (r9 verdict #1 - BENCH_r08/r09 landed "
            "parsed:null); the full artifact is this file. Soak and "
            "RocksDB lines run by DEFAULT as of r10 (opt out with "
            "SPARK_GRAFT_SOAK=0 / SPARK_GRAFT_ROCKSDB=0); both stay "
            "outside the headline steady total. Soak rows_per_sec now "
            "divides NEW rows, not delta_rows (ADVICE r9); load_avg "
            "start/end recorded per r9 verdict #3.",
            "r8_catalog_growth": "the r8 catalog grew 97->114 benched "
            "ranks (tx12-16, d14, pipe3, j30/j31 and the earlier r8 "
            "session additions); steady/cold totals are NOT comparable "
            "round-over-round — compare per-query.",
            "r8_bpe_hybrid": "train_bpe is hybrid as of r8: the merge "
            "loop runs driver-side when the vocabulary fits (one "
            "limit-probe job; sentencepiece/HF do the same), falling "
            "back to per-round vocabulary-scale aggregations past "
            "driver_vocab_limit. On the fixture's 31-word vocab this "
            "removed ~30 scheduling-bound driver jobs: tx13 7.8->sub-1 s, "
            "pipe3 5.2->~2 s. Both paths bit-identical "
            "(tests/test_bpe.py).",
            "r7_hof": "word_shingles/winnowing let-bind their token arrays "
            "(r7): the interpreted HOF evaluator was re-tokenizing per "
            "shingle position — O(doc^2). d8 5.95->~3.4 s, d9 5.12->~3.5 s "
            "at sf0.1; the win grows with document length.",
            "r8_pipe2_variance": "the r6->r7 pipe2 +16% (5.10->5.94 s) "
            "bisected to AMBIENT load, not a plan change: same-code "
            "fresh-session steady measured 5.10-6.9 s across one r8 "
            "afternoon as box load moved 1.5->3.9; pipe2 composes ~33 "
            "driver jobs (eager CC rounds), so per-job scheduling "
            "jitter accumulates ~linearly and its ambient band is "
            "wider than any single-job query's. Structural r8 change: "
            "CC round checkpoints are now LAZY (the convergence-sum "
            "scan materializes them) — 35->33 jobs per pipe2 run, one "
            "barrier saved per Pregel/star round.",
            "r9_ambient_day": "the r9 bench day was persistently noisy "
            "(co-tenant load 1.5-6.0 all afternoon): three full runs "
            "totalled 139.8/161.0/152.5 s on the shared keys vs r8's "
            "110.7, with a DIFFERENT set of queries inflated each run "
            "and scripts/bench_diff.py classifying every >1.3x flag "
            "AMBIENT (closure fingerprint identical to the recorded "
            "green round). Spot isolated min-of-3 re-measures landed "
            "in-band: s5 1.62, s6 1.45, s1 0.60, pack1 0.97, d14 2.70, "
            "v11 2.95, pipe3 1.83. Compare per-query medians across "
            "rounds, not this day's totals.",
            "r9_rank_retirement": "j15/j16 bench ranks retired (r8 "
            "verdict #7): redundant TPC-H shapes already covered by "
            "j12/j27/j28; both stay oracle-checked catalog rows. All "
            "r9 artifacts from the final committed run onward carry "
            "115 ranks without them; r8 carried 117.",
            "r9_v2b_variance": "the r7->r8 v2b +38% (1.53->2.10 s) is "
            "AMBIENT, proven two ways: (1) v2b's closure fingerprint "
            "at r9 HEAD equals the round-5 record (FINGERPRINTS.json) "
            "- the code is bit-unchanged since r5, and the suspected "
            "r8 GEMM-kernel consolidation (68d419a) never touches "
            "cosine_pairs_lsh_gated, which has its own bucket kernel; "
            "(2) isolated fresh-session min-of-5 at r9 start measured "
            "v2b 2.15 s AND the equally-unchanged j14 1.45 s (r7: "
            "0.84) and d2 3.78 s - every untouched multi-second query "
            "drifts together with box load (load avg 1.6-3.7 with no "
            "Spark running). Same verdict as r8_pipe2_variance.",
            "r7_small_query_variance": "sub-second queries swing +-0.2 s "
            "between runs (min-of-2 on a shared box); the conditional "
            "spread check also adds one plan->RDD partition probe per "
            "with_shingles call — driver-side, constant, scale-free. "
            "Compare trends on the multi-second queries.",
            "d3": "code untouched since r2 except the shingle let-binding; "
            "historical r2->r5 creep tracked fixture regeneration (see "
            "SCALE.md variance note).",
        },
    }
    # The driver's BENCH_r{N}.json capture keeps only the last ~1.5-2
    # KB of output, which truncates the per-query dicts once the
    # catalog is large (r6 verdict: only 45/56 bench-tagged queries
    # visible; r8/r9: "parsed": null because the single ~10 KB JSON
    # line could neither fit the tail nor parse mid-line). Persist the
    # FULL output to a committed file named for the round being
    # benched: the driver writes BENCH_r{N}.json after this run, so
    # max(existing)+1 is the current round both for local runs and the
    # driver's end-of-round run.
    n = bench_round  # inferred (or overridden) before the auto-A/B pass
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"bench_local_r{n:02d}.json"
    )
    with open(local_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")

    # r9 verdict #1: the LAST line of stdout is one compact
    # machine-parseable summary that fits whole inside the driver's
    # tail capture — headline steady/cold totals, the throughput
    # figures the baseline comparison is graded on, soak/RocksDB
    # evidence, ambient load, and the 10 slowest queries (the ones a
    # regression triage starts from). Everything else (full per-query
    # maps, soak iteration detail, bench notes) lives in the
    # bench_local file named under "full_results".
    slowest = dict(
        sorted(times.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    summary = {
        "metric": "headline_queries_wall_clock_steady",
        "value": out["value"],
        "unit": "sec",
        "sf": out["sf"],
        "n_queries": len(times),
        "cold_value": out["cold_value"],
        "sync_rows_per_sec": sync_rps,
        "stream_rows_per_sec": stream_rps,
        "t8_rocksdb_rows_per_sec": t8_rocksdb.get("rows_per_sec"),
        "soak_converged": soak.get("converged"),
        "soak_total_sec": soak.get("total_sec"),
        "load_avg_start": load_start,
        "load_avg_end": load_end,
        "auto_ab_movers": sorted(auto_ab.get("movers", {})),
        "queries": slowest,
        "queries_note": "slowest 10 of %d; full map in full_results" % len(times),
        "full_results": os.path.basename(local_path),
    }

    # stop the JVM FIRST: its stderr (progress bars, shutdown chatter)
    # interleaves by time with stdout in a merged capture, and the
    # summary must be the LAST thing this process emits so a tail
    # capture always ends on the parseable line. A stop() failure
    # (py4j connection already dead after a long run) must not swallow
    # the summary every measurement already earned.
    try:
        spark.stop()
    except Exception as e:  # noqa: BLE001
        print(f"# spark.stop() failed: {e}", file=sys.stderr)
    print(json.dumps(summary, separators=(",", ":")), flush=True)
    # A downgraded round-artifact run exits non-zero AFTER writing the
    # artifact and summary (the measurements are still evidence) so a
    # scripted `bench.py --round-artifact && git add` refuses to commit
    # a polluted artifact. Scratch/driver runs are unaffected.
    if "--round-artifact" in sys.argv[1:] and not round_artifact:
        sys.exit(2)


if __name__ == "__main__":
    main()
