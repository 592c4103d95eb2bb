"""Pinned-output goldens for the rows-only families (d3/d4/v2b/v4/v5, plus the tx13 BPE merge table).

These are the registry entries with no exact SQL oracle — the driver
only row-count-checks them, and the existing pytest coverage asserts
recall/subset properties. Both would stay green if the signature math
drifted (different perm coefficients, band layout, bit votes) while
recall happened to hold. The goldens close that hole: all hashing is
seed-fixed, so the EXACT output at sf0.001 is deterministic and any
change fails loudly (round-4/5 verdict carry). Regenerate with
scripts/gen_goldens.py only for an intentional algorithm change.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest

from pypgsync_spark.queries import REGISTRY

_GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "goldens", "rows_only_families.json"
)


@pytest.fixture(scope="module")
def golden() -> dict:
    with open(_GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "name",
    [
        "d3_minhash_lsh_pairs",
        "v2b_cosine_pairs_lsh_gated",
        "v4_lsh_ann_topk",
        "v5_ivf_topk",
        "tx13_bpe_merges",
        "pipe3_bpe_tokenize_pack",
        "v11_ivf_kmeans_build",
    ],
)
def test_rows_only_family_exact_golden(spark, sf_small, golden, name):
    rows = REGISTRY[name].fn(spark, sf_small).collect()
    got_cols = list(rows[0].asDict().keys()) if rows else []
    got = sorted([list(r) for r in rows])
    assert got_cols == golden[name]["columns"]
    assert got == golden[name]["rows"]


def test_golden_fingerprints_current(golden):
    """The goldens are the ONLY correctness artifact the rows-only
    queries have (no SQL oracle, driver row-count-checks only). If a
    query's closure fingerprint changed since the golden file was last
    written, the pinned rows may describe code that no longer exists —
    fail loudly and demand a regeneration (r8 verdict #8). Cheap: pure
    static analysis, no Spark session."""
    from pypgsync_spark.queries.fingerprint import spec_fingerprint

    pinned = golden["_fingerprints"]
    for name, fp in sorted(pinned.items()):
        spec = REGISTRY[name]
        cur = spec_fingerprint(spec.fn, spec.oracle)
        assert cur == fp, (
            f"{name}: closure fingerprint changed since the golden file "
            "was written — if the algorithm change is intentional, "
            "regenerate with scripts/gen_goldens.py (and say so in the "
            "commit); if not, you just changed a rows-only kernel "
            "without noticing."
        )
    # and the pin set itself tracks the golden's query set
    assert set(pinned) == {k for k in golden if k in REGISTRY}


def test_d4_simhash_golden_histogram(spark, sf_small, golden):
    rows = REGISTRY["d4_simhash_pairs"].fn(spark, sf_small).collect()
    g = golden["d4_simhash_pairs"]
    assert len(rows) == g["total"]
    hist = sorted(Counter(r["hamming"] for r in rows).items())
    assert [list(h) for h in hist] == g["hamming_histogram"]
    zero = sorted([r["id_a"], r["id_b"]] for r in rows if r["hamming"] == 0)
    assert zero == g["zero_distance_pairs"]
