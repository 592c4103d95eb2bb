"""(Re)generate the pinned golden outputs for the rows-only query
families (d3/d4/v2b/v4/v5, plus the tx13 BPE merge table) at sf0.001.

These queries have no exact SQL oracle (their correctness is
signature-math + recall), so the driver only row-count-checks them.
The goldens pin their EXACT output on the tiny fixture: every hash,
permutation coefficient and band layout is seed-fixed, so any change
to the signature math shows up as a loud diff instead of silently
shifted recall (round-4/5 verdict carry).

Run ONLY when an intentional algorithm change makes the old goldens
obsolete — and say so in the commit that updates them.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.001"
OUT = os.path.join(ROOT, "tests", "goldens")


def main() -> None:
    from pypgsync_spark.queries import REGISTRY
    from pypgsync_spark.session import get_spark

    spark = get_spark(app_name="golden_gen", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    golden: dict = {"sf_dir": SF}
    for name in (
        "d3_minhash_lsh_pairs",
        "v2b_cosine_pairs_lsh_gated",
        "v4_lsh_ann_topk",
        "v5_ivf_topk",
        "tx13_bpe_merges",
        "pipe3_bpe_tokenize_pack",
        "v11_ivf_kmeans_build",
    ):
        rows = REGISTRY[name].fn(spark, SF).collect()
        golden[name] = {
            "columns": list(rows[0].asDict().keys()) if rows else [],
            "rows": sorted([list(r) for r in rows]),
        }

    # d4 emits ~12k pairs at sf0.001 — pin the hamming-distance
    # histogram plus the exact distance-0 pair set (a full re-hash of
    # the signature math; any bit-vote change moves the histogram)
    d4 = REGISTRY["d4_simhash_pairs"].fn(spark, SF).collect()
    golden["d4_simhash_pairs"] = {
        "total": len(d4),
        "hamming_histogram": sorted(Counter(r["hamming"] for r in d4).items()),
        "zero_distance_pairs": sorted([r["id_a"], r["id_b"]] for r in d4 if r["hamming"] == 0),
    }

    # Pin each query's closure fingerprint alongside its rows: the
    # goldens are the ONLY correctness artifact rows-only queries have,
    # so a kernel edit that forgets to regenerate this file must fail
    # loudly (tests/test_goldens.py::test_golden_fingerprints_current),
    # not ship silently behind stale pinned rows (r8 verdict #8).
    from pypgsync_spark.queries.fingerprint import spec_fingerprint

    golden["_fingerprints"] = {
        name: spec_fingerprint(REGISTRY[name].fn, REGISTRY[name].oracle)
        for name in golden
        if name in REGISTRY
    }

    path = os.path.join(OUT, "rows_only_families.json")
    with open(path, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
