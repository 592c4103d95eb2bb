"""Fingerprint sensitivity contract (queries/fingerprint.py).

The staleness rule's whole value is its precision: it must trip on any
behavior-relevant change in a query's transitive closure and must NOT
trip on cosmetic edits or on unrelated code in the same module (the
round-5 verdict's 51-query false-stale treadmill). These tests build a
throwaway package on disk and mutate it between fingerprint runs.
"""

from __future__ import annotations

import linecache
import sys
import textwrap

import pytest

from pypgsync_spark.queries import fingerprint as fp
from pypgsync_spark.queries import QuerySpec, _is_stale


PKG = "fppkg_test"

V1 = {
    "__init__.py": "",
    "helper.py": """
        BUCKET_WIDTH = 10

        def shingle(text):
            # split into fixed-width shingles
            return [text[i : i + BUCKET_WIDTH] for i in range(len(text))]
    """,
    "q.py": """
        from fppkg_test import helper

        def my_query(spark, sf_dir):
            '''Docstring prose.'''
            return helper.shingle(sf_dir)

        def unrelated(spark, sf_dir):
            return 42
    """,
}


def _materialize(tmp_path, files):
    pkg = tmp_path / PKG
    pkg.mkdir(exist_ok=True)
    for name, src in files.items():
        (pkg / name).write_text(textwrap.dedent(src))
    # purge every cached view of the package so inspect re-reads disk
    for mod in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
        del sys.modules[mod]
    linecache.clearcache()
    sys.path.insert(0, str(tmp_path))
    try:
        import importlib

        q = importlib.import_module(f"{PKG}.q")
    finally:
        sys.path.remove(str(tmp_path))
    return q


@pytest.fixture()
def pkg_fp(tmp_path, monkeypatch):
    monkeypatch.setattr(fp, "PACKAGE", PKG)

    def compute(files):
        q = _materialize(tmp_path, files)
        return fp.callable_fingerprint(q.my_query)

    return compute


def test_stable_across_recompute(pkg_fp):
    assert pkg_fp(V1) == pkg_fp(V1)


def test_cosmetic_edits_do_not_trip(pkg_fp):
    base = pkg_fp(V1)
    cosmetic = dict(V1)
    cosmetic["q.py"] = V1["q.py"].replace(
        "'''Docstring prose.'''", "'''Totally different docstring.'''"
    )
    cosmetic["helper.py"] = V1["helper.py"].replace(
        "# split into fixed-width shingles", "# a rewritten, much longer comment"
    )
    assert pkg_fp(cosmetic) == base


def test_unrelated_sibling_function_does_not_trip(pkg_fp):
    base = pkg_fp(V1)
    grown = dict(V1)
    grown["q.py"] = V1["q.py"] + textwrap.indent(
        "\ndef newcomer(spark, sf_dir):\n    return 99\n", " " * 8
    )
    assert pkg_fp(grown) == base


def test_callee_body_change_trips(pkg_fp):
    base = pkg_fp(V1)
    changed = dict(V1)
    changed["helper.py"] = V1["helper.py"].replace(
        "range(len(text))", "range(0, len(text), 2)"
    )
    assert pkg_fp(changed) != base


def test_constant_change_trips(pkg_fp):
    base = pkg_fp(V1)
    changed = dict(V1)
    changed["helper.py"] = V1["helper.py"].replace("BUCKET_WIDTH = 10", "BUCKET_WIDTH = 12")
    assert pkg_fp(changed) != base


def test_own_body_change_trips(pkg_fp):
    base = pkg_fp(V1)
    changed = dict(V1)
    changed["q.py"] = V1["q.py"].replace(
        "return helper.shingle(sf_dir)", "return helper.shingle(sf_dir)[:5]"
    )
    assert pkg_fp(changed) != base


def test_oracle_text_participates():
    f = lambda spark, sf_dir: None  # noqa: E731 — source-less is fine here
    a = fp.spec_fingerprint(f, "SELECT 1 AS x")
    b = fp.spec_fingerprint(f, "SELECT 2 AS x")
    ws = fp.spec_fingerprint(f, "SELECT   1\n  AS x")
    assert a != b
    assert a == ws  # whitespace-only SQL reformat does not un-verify


def test_is_stale_decision_table():
    f = lambda spark, sf_dir: None  # noqa: E731
    spec = QuerySpec(name="x", fn=f, oracle="SELECT 1", survey="", doc="")
    good = fp.spec_fingerprint(f, "SELECT 1")
    # never verified
    assert _is_stale("x", spec, 0, {})
    # green round has no recorded fingerprint
    assert _is_stale("x", spec, 5, {})
    # recorded for a different round than the last green one
    assert _is_stale("x", spec, 5, {"x": {"fp": good, "round": 4}})
    # fingerprint drifted
    assert _is_stale("x", spec, 5, {"x": {"fp": "dead", "round": 5}})
    # fresh
    assert not _is_stale("x", spec, 5, {"x": {"fp": good, "round": 5}})


def test_registry_invariants():
    """Registry-wide structural invariants the sweep and bench depend
    on: bench ranks are unique (ordering ambiguity would make
    round-over-round per-query comparison unstable), every rows-only
    query (no oracle) is either golden-pinned or explicitly a
    plumbing/streaming shape, and names are globally unique by
    construction of the dict."""
    import json
    import os

    from pypgsync_spark.queries import REGISTRY

    ranks = {}
    for n, s in REGISTRY.items():
        b = getattr(s, "bench", None)
        if b is not None:
            assert b not in ranks, f"duplicate bench rank {b}: {ranks[b]} vs {n}"
            ranks[b] = n

    golden_path = os.path.join(
        os.path.dirname(__file__), "goldens", "rows_only_families.json"
    )
    with open(golden_path) as f:
        golden = set(json.load(f))
    no_oracle = {n for n, s in REGISTRY.items() if s.oracle is None}
    unpinned = no_oracle - golden
    # every unpinned rows-only query must carry its own pytest cover;
    # keep this list EXPLICIT so a new oracle-less query without a
    # golden is a conscious decision, not an accident
    allowed_unpinned = {
        # bound-tested vs exact a7 within rsd (tests/test_oracle.py)
        "a7b_approx_distinct_users",
    }
    assert unpinned <= allowed_unpinned, (
        f"rows-only queries with neither golden nor explicit allowance: "
        f"{sorted(unpinned - allowed_unpinned)}"
    )


def test_const_payload_hashes_config_containers():
    """r10 review: module-level config containers were invisible to
    fingerprints, so editing a behavior-bearing map never staled its
    queries. Pure-constant containers now hash by value (order-
    insensitive for set/dict); anything holding runtime objects still
    contributes nothing."""
    from pypgsync_spark.queries.fingerprint import _const_payload

    assert _const_payload({"a": 1, "b": [1, 2]}) is not None
    assert _const_payload({"b": [1, 2], "a": 1}) == _const_payload(
        {"a": 1, "b": [1, 2]}
    )
    assert _const_payload(frozenset({"x", "y"})) == _const_payload(
        frozenset({"y", "x"})
    )
    assert _const_payload({1: object()}) is None      # runtime value
    assert _const_payload([1, object()]) is None      # runtime element
    assert _const_payload((1, "a", None, 2.5)) is not None


def test_config_map_edit_changes_dependent_fingerprint(monkeypatch):
    """End-to-end: a query-shaped callable reading a module-level dict
    re-fingerprints when the dict's CONTENT changes (pre-fix the dict
    was silently dropped from the closure payload)."""
    import pypgsync_spark.sources.pysource as ps
    from pypgsync_spark.queries.fingerprint import callable_fingerprint

    # a REAL in-package function whose body reads _TYPE_MAP as a
    # module-global name (the shape every config-map consumer has)
    fn = ps.SqlSliceDataSource.schema
    fp1 = callable_fingerprint(fn)
    monkeypatch.setitem(ps._TYPE_MAP, "XXPROBE", "string")
    fp2 = callable_fingerprint(fn)
    assert fp1 != fp2


# --- r11: sweep-order promotion rule (r10 verdict #1a) ---------------


def _dummy_fn(spark, sf_dir):
    return None


def _mk_items(n_green_stale, n_new, new_oracle=True, start_rank=1):
    """(items, last, recorded): n_green_stale previously-green queries
    whose recorded fingerprint no longer matches (stale), then n_new
    never-verified queries, oracle-checked per new_oracle."""
    from pypgsync_spark.queries import QuerySpec

    items, last, recorded = [], {}, {}
    rank = start_rank
    for i in range(n_green_stale):
        name = f"g{i:03d}"
        items.append(
            (len(items), (name, QuerySpec(name, _dummy_fn, "SELECT 1", "", "", rank)))
        )
        last[name] = 5
        recorded[name] = {"round": 5, "fp": "stale-mismatch"}
        rank += 1
    for i in range(n_new):
        name = f"new{i:03d}"
        oracle = "SELECT 1" if new_oracle else None
        items.append(
            (len(items), (name, QuerySpec(name, _dummy_fn, oracle, "", "", rank)))
        )
        rank += 1
    return items, last, recorded


def test_sweep_promotion_when_greens_fill_the_window():
    """60 re-staled greens (the r10 end-state shape) would fill all 50
    sweep rows; the never-verified oracle-checked query must be
    promoted into the window's LAST slot, displacing exactly one
    green."""
    from pypgsync_spark.queries import SWEEP_CAP, _sweep_order

    items, last, recorded = _mk_items(60, 1)
    names = [t[1][0] for t in _sweep_order(items, last, recorded)]
    assert names.index("new000") == SWEEP_CAP - 1
    # everything else keeps the regression-risk-first relative order
    greens = [n for n in names if n.startswith("g")]
    assert greens == sorted(greens)


def test_sweep_no_promotion_when_already_inside_window():
    from pypgsync_spark.queries import _sweep_order

    items, last, recorded = _mk_items(10, 1)
    names = [t[1][0] for t in _sweep_order(items, last, recorded)]
    # greens (regression risk) first, the new query right behind them
    assert names.index("new000") == 10


def test_sweep_oracle_less_never_promoted():
    """An oracle-less spec's driver row can only report no_oracle (r7
    verdict #9) — it must never claim a hash-checkable slot, even via
    the promotion rule."""
    from pypgsync_spark.queries import _sweep_order

    items, last, recorded = _mk_items(60, 1, new_oracle=False)
    names = [t[1][0] for t in _sweep_order(items, last, recorded)]
    assert names.index("new000") == len(names) - 1


def test_sweep_promotes_at_most_one():
    from pypgsync_spark.queries import SWEEP_CAP, _sweep_order

    items, last, recorded = _mk_items(60, 3)
    names = [t[1][0] for t in _sweep_order(items, last, recorded)]
    assert names.index("new000") == SWEEP_CAP - 1  # oldest rank wins the slot
    assert names.index("new001") > 60  # the rest wait behind every green
    assert names.index("new002") > 60


def test_fingerprint_ignores_runtime_container_state():
    """r13 determinism fix: a query's fingerprint must not depend on
    what already RAN in the process. The single-slot persist caches
    (operators/dedup._SHINGLE_CACHE and friends) are module-level
    lists a closure reads — empty on a fresh import, holding a
    DataFrame once warm — and the stats Counter (queries/textops.
    D5_CC_STATS) accumulates run-dependent tallies. Before the fix an
    empty cache hashed as the constant 'list[]' and vanished when
    warm, so gen_goldens (computes warm) and record_fingerprints
    (computes fresh) pinned DIFFERENT fingerprints for the same HEAD
    (found as a flaky golden-pin test). Simulate both states and
    assert the fingerprint is identical."""
    from collections import Counter

    from pypgsync_spark.operators import dedup
    from pypgsync_spark.queries import REGISTRY
    from pypgsync_spark.queries.fingerprint import spec_fingerprint

    spec = REGISTRY["d3_minhash_lsh_pairs"]
    fresh = spec_fingerprint(spec.fn, spec.oracle)

    class _FakeDF:  # stands in for the persisted DataFrame a warm run leaves
        def unpersist(self):
            return self

    saved = list(dedup._SHINGLE_CACHE)
    try:
        dedup._SHINGLE_CACHE.append(_FakeDF())
        warm = spec_fingerprint(spec.fn, spec.oracle)
    finally:
        dedup._SHINGLE_CACHE.clear()
        dedup._SHINGLE_CACHE.extend(saved)
    assert warm == fresh, "fingerprint must not see cache occupancy"

    # the Counter case: exact-type rule — accumulator subclasses of
    # dict contribute nothing whatever they momentarily hold
    from pypgsync_spark.queries import textops

    spec5 = REGISTRY["d5_near_dup_components"]
    fresh5 = spec_fingerprint(spec5.fn, spec5.oracle)
    saved5 = Counter(textops.D5_CC_STATS)
    try:
        textops.D5_CC_STATS["rounds"] = 7
        warm5 = spec_fingerprint(spec5.fn, spec5.oracle)
    finally:
        textops.D5_CC_STATS.clear()
        textops.D5_CC_STATS.update(saved5)
    assert warm5 == fresh5, "fingerprint must not see Counter tallies"


def test_const_payload_nested_empty_still_hashes():
    """r13 review: the empty-accumulator rule applies at DEPTH 0 only.
    An empty container nested inside a config constant is part of the
    config's value — a blanket rule would let sibling fields change
    without staling anything (the r10 hole, reopened one level down)."""
    from pypgsync_spark.queries.fingerprint import _const_payload

    # module-global accumulator at rest: contributes nothing
    assert _const_payload([]) is None
    assert _const_payload({}) is None
    assert _const_payload(set()) is None
    # nested empties inside a real config: hash by value, and sibling
    # edits change the payload
    a = _const_payload({"stopwords": [], "min": 50})
    b = _const_payload({"stopwords": [], "min": 80})
    assert a is not None and b is not None and a != b
    assert _const_payload(("x", ())) is not None  # immutable empties too


def test_no_container_subclass_config_constants_in_package():
    """r13 ADVICE (low): exact-type hashing means container SUBCLASSES
    (namedtuple, OrderedDict, ...) contribute nothing to fingerprints.
    That is deliberate for the accumulator types (Counter, defaultdict,
    deque — runtime state must not leak into fingerprints), but a
    CONFIG constant of such a type could then change behavior without
    staling any query. Lint: no module-level value anywhere in the
    package may be a container-subclass instance outside the
    accumulator allowlist."""
    import collections
    import importlib
    import pkgutil

    import pypgsync_spark

    allowed = (collections.Counter, collections.defaultdict, collections.deque)
    builtin_containers = (list, tuple, set, frozenset, dict)
    offenders = []
    for info in pkgutil.walk_packages(
        pypgsync_spark.__path__, prefix="pypgsync_spark."
    ):
        mod = importlib.import_module(info.name)
        for attr, val in vars(mod).items():
            if attr.startswith("__"):
                continue
            if not isinstance(val, builtin_containers):
                continue
            if type(val) in builtin_containers:
                continue
            if isinstance(val, allowed):
                continue
            offenders.append(f"{info.name}.{attr} = {type(val).__name__}")
    assert not offenders, (
        "container-subclass module constants would fingerprint as "
        f"nothing — use exact builtin types or add to the accumulator "
        f"allowlist knowingly: {offenders}"
    )
