"""Similarity-search correctness: approximate paths (hyperplane LSH,
IVF) recall-checked against the brute-force truth; GEMM pair search
cross-checked against the exact expression formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs,
    cosine_pairs_expr,
    cosine_pairs_lsh_gated,
    ivf_assign,
    ivf_topk,
    lsh_ann_topk,
)


def _emb(spark, sf):
    return load_table(spark, sf, "embeddings")


def _qvec(spark, sf, vec_id=0):
    return list(_emb(spark, sf).filter(F.col("vec_id") == vec_id).first()["embedding"])


def test_bruteforce_topk_exact(spark, sf_small):
    q = _qvec(spark, sf_small)
    top = brute_force_topk(_emb(spark, sf_small), q, k=10).collect()
    assert len(top) == 10
    assert top[0]["vec_id"] == 0 and abs(top[0]["cos_sim"] - 1.0) < 1e-6
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_ann_recall(spark, sf_small):
    q = _qvec(spark, sf_small)
    emb = _emb(spark, sf_small)
    truth = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_ann_topk(emb, q, k=10).collect()]
    recall = len(set(truth) & set(approx)) / 10
    assert recall >= 0.5, f"LSH ANN recall {recall} too low"
    # every approx hit must carry the true cosine (exact re-rank)
    t = {r["vec_id"]: r["cos_sim"] for r in brute_force_topk(emb, q, k=500).collect()}
    for r in lsh_ann_topk(emb, q, k=10).collect():
        assert abs(t[r["vec_id"]] - r["cos_sim"]) < 1e-6


def test_ivf_recall(spark, sf_small):
    emb = _emb(spark, sf_small)
    q = _qvec(spark, sf_small)
    cents = [list(r["embedding"]) for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()]
    assigned = ivf_assign(emb, cents)
    # every vector lands in exactly one of the 8 cells
    assert assigned.filter((F.col("cell") < 0) | (F.col("cell") >= 8)).count() == 0
    approx = [r["vec_id"] for r in ivf_topk(assigned, cents, q, k=10, n_probe=8).collect()]
    truth = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    # probing ALL cells must reproduce the exact result
    assert approx == truth


def test_cosine_pairs_is_distributed(spark, sf_small):
    """The registered all-pairs path must not materialize the table on
    the driver (round-1 verdict: collect()+broadcast was the one
    genuine scale-killer). Building the plan triggers no job, the
    physical plan is a grouped-GEMM (FlatMapGroupsInPandas after a
    hash shuffle), and the source has no collect/broadcast."""
    import inspect

    src = inspect.getsource(cosine_pairs)
    assert ".collect(" not in src and "broadcast(" not in src
    df = cosine_pairs(_emb(spark, sf_small), threshold=0.4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_lsh_gated_pairs_recall(spark, sf_small):
    """Banded-LSH gated pairs: every emitted pair is exact-verified
    (subset of the exact result, identical cosine), recall bounded."""
    emb = _emb(spark, sf_small)
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_pairs(emb, threshold=0.4).collect()
    }
    gated = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_pairs_lsh_gated(emb, threshold=0.4).collect()
    }
    assert set(gated) <= set(exact), "gated pairs must be exact-verified"
    for k, v in gated.items():
        assert abs(v - exact[k]) < 1e-9
    recall = len(gated) / max(1, len(exact))
    assert recall >= 0.7, f"banded-LSH recall {recall} too low"


def test_gemm_pairs_match_expression_pairs(spark, sf_small):
    emb = _emb(spark, sf_small).limit(120)
    fast = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_pairs(emb, threshold=0.3).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_pairs_expr(emb, threshold=0.3).collect()
    }
    assert set(fast) == set(exact)
    for k in fast:
        assert abs(fast[k] - exact[k]) < 1e-5


def test_knn_join_matches_bruteforce(spark, sf_small):
    """The local-top-k/global-top-k split is lossless: for every block
    count (including B=1, a block count that doesn't divide N, and
    more blocks than needed) the k-NN graph equals the brute-force
    per-row ranking."""
    import numpy as np

    from pypgsync_spark.operators.similarity import knn_join

    emb = _emb(spark, sf_small).limit(80)
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    k = 3
    want = {}
    for i in range(len(ids)):
        # sort by (-cos, nbr_id): same deterministic tie-break as the op
        order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))[:k]
        want[int(ids[i])] = [(int(ids[j]), round(float(sims[i, j]), 6)) for j in order]

    for n_blocks in (1, 3, 8):
        got = {}
        for r in knn_join(emb, k=k, n_blocks=n_blocks).collect():
            got.setdefault(int(r["vec_id"]), []).append(
                (int(r["nbr_id"]), r["cos_sim"])
            )
        for vid in got:
            got[vid].sort(key=lambda t: (-t[1], t[0]))
        assert set(got) == set(want), f"n_blocks={n_blocks}: id set differs"
        for vid in want:
            g, w = got[vid], want[vid]
            assert [x[0] for x in g] == [x[0] for x in w], (
                f"n_blocks={n_blocks} vec {vid}: {g} != {w}"
            )
            for (gn, gc), (wn, wc) in zip(g, w):
                assert abs(gc - wc) < 1e-5


def test_knn_join_k_larger_than_blocks(spark, sf_small):
    """k bigger than some blocks' populations still returns k global
    neighbors (candidates from other blocks fill in)."""
    from pypgsync_spark.operators.similarity import knn_join

    emb = _emb(spark, sf_small).limit(40)
    out = knn_join(emb, k=10, n_blocks=8).groupBy("vec_id").count().collect()
    assert all(r["count"] == 10 for r in out)


def test_ivf_persisted_index_prunes_partitions(spark, sf_small, tmp_path):
    """The persisted IVF index (SCALE.md's write-once-assignment scale
    path, now executable): querying it must (1) return exactly what the
    inline ivf_topk returns for the same centroids/probes, and (2) scan
    ONLY the probed cells — the cell filter lands in the parquet scan's
    PartitionFilters, so unprobed directories are never read."""
    from pypgsync_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_from_index,
    )

    emb = _emb(spark, sf_small)
    q = _qvec(spark, sf_small)
    cents = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, cents)

    got = ivf_topk_from_index(spark, path, q, k=10, n_probe=2)
    want = ivf_topk(ivf_assign(emb, cents), cents, q, k=10, n_probe=2)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # the pruned scan reads at most n_probe of the 8 cell directories
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:500]
