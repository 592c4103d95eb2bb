"""Similarity-search queries over ``embeddings`` (extension layer).

The cosine kernel accumulates in double, sequentially, on both engines
(Spark ``aggregate``/``zip_with`` vs DuckDB ``list_dot_product`` on
DOUBLE[]), so brute-force results hash-match exactly after rounding.
The approximate paths are hash-checked too (v5 since r10; v4/v2b since
r11 — their seed-pinned hyperplanes are plan literals the oracles
embed exactly); only the iterative k-means build (v11) is rows-only.
pytest additionally asserts every approximate path's recall against
the brute-force truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.functions.text import gopher_gate_sql
from pypgsync_spark.operators.similarity import (
    _hyperplanes,
    brute_force_topk,
    cosine,
    dot,
    cosine_pairs,
    cosine_pairs_lsh_gated,
    ivf_assign,
    ivf_topk,
    lsh_ann_topk,
    norm,
    sq8_approx_scores,
)
from pypgsync_spark.queries import register

_QUERY_VEC_ID = 0
_TOPK = 10

_DUCK_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = _emb(spark, sf_dir).filter(F.col("vec_id") == _QUERY_VEC_ID).first()
    return list(row["embedding"])


def _duck_vec_literal(p) -> str:
    """DOUBLE[] literal for a plane vector. repr(float) round-trips the
    exact binary64, and both engines' decimal parsers are correctly
    rounded, so the literal lands on the identical double."""
    return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"


def _duck_hyperplane_sig(vec_expr: str, nbits: int) -> str:
    """SQL for operators.similarity.hyperplane_signature: bit i set iff
    list_dot_product(vec, plane_i) > 0 — the seed-42 planes embedded as
    exact literals (r10 verdict #3: the 'engine-specific' label on the
    LSH queries was wrong; fixed hyperplanes make the signature plain
    deterministic float arithmetic both engines share bit-for-bit)."""
    planes = _hyperplanes(64, nbits, seed=42)
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_duck_vec_literal(p)}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + "\n         + ".join(terms) + ")::BIGINT"


@register(
    "v1_ann_bruteforce",
    bench=19,
    survey="ext:similarity",
    doc="Exact top-10 by cosine against the vec_id=0 query vector — "
    "the ANN exactness baseline (TakeOrderedAndProject, no global sort).",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT v FROM e WHERE vec_id = {_QUERY_VEC_ID})
    SELECT e.vec_id,
           round(list_dot_product(e.v, q.v)
                 / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))),
                 6) AS cos_sim
    FROM e, q
    -- rank by the ROUNDED similarity (r10 review): brute_force_topk's
    -- sort key is the rounded cos_sim, so ordering by the raw value
    -- here could pick a different top-10 at a 6-dp rounding tie
    ORDER BY cos_sim DESC,
             e.vec_id
    LIMIT {_TOPK}
    """,
)
def v1_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brute_force_topk(_emb(spark, sf_dir), _query_vec(spark, sf_dir), k=_TOPK)


@register(
    "v2_cosine_pairs",
    bench=20,
    survey="ext:dedup,ext:similarity",
    doc="Embedding near-dup: all pairs with cosine > 0.4 — exact "
    "block-nested GEMM self-join, no driver collect/broadcast "
    "(v2b is the LSH-gated approximate scale path).",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_DUCK_COS}, 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_DUCK_COS} > 0.4
    """,
)
def v2_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_pairs(_emb(spark, sf_dir), threshold=0.4)


@register(
    "v2b_cosine_pairs_lsh_gated",
    bench=21,
    survey="ext:dedup,ext:similarity",
    doc="Embedding near-dup, approximate: hyperplane-LSH banding gates "
    "candidate pairs (16 bits, 8 bands), exact GEMM verifies inside "
    "buckets — the 100 TB path. Hash-checked as of r11: the seed-42 "
    "hyperplanes are plan literals the oracle reproduces exactly, so "
    "the banded candidate set is deterministic; recall vs v2 stays "
    "pytest-asserted.",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, {_duck_hyperplane_sig("v", 16)} AS sig FROM e),
    bands AS (
      SELECT vec_id, band, (sig >> (2 * band)) & 3 AS val
      FROM s, (SELECT unnest(range(8)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
      FROM bands l JOIN bands r USING (band, val)
      WHERE l.vec_id < r.vec_id
    )
    SELECT c.id_a, c.id_b, round({_DUCK_COS}, 6) AS cos_sim
    FROM cand c
    JOIN e a ON a.vec_id = c.id_a
    JOIN e b ON b.vec_id = c.id_b
    WHERE {_DUCK_COS} > 0.4
    """,
)
def v2b_cosine_pairs_lsh_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_pairs_lsh_gated(_emb(spark, sf_dir), threshold=0.4)


@register(
    "v3_norm_stats",
    survey="ext:similarity",
    doc="Per-label vector-norm statistics (decimal-exact avg).",
    oracle="""
    WITH e AS (SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      AS nrm FROM embeddings)
    SELECT label, count(*) AS n,
           round(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_norm
    FROM e GROUP BY label
    """,
)
def v3_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).withColumn("nrm", norm(F.col("embedding")))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("nrm").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_norm"),
    )


@register(
    "v4_lsh_ann_topk",
    survey="ext:similarity",
    doc="Approximate top-10 via random-hyperplane LSH "
    "(lsh_ann_topk defaults: 10 bits, multi-probe hamming ≤ 4 — "
    "~38% candidate fraction, see its docstring). Hash-checked as of "
    "r11: sign bits of 10 seed-42 plane dots (driver side uses the "
    "sequential seq_dot fold, bit-identical to list_dot_product), "
    "hamming gate via bit_count(xor), then v1's exact re-rank over "
    "the candidates. Recall vs v1 stays pytest-asserted.",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {_QUERY_VEC_ID}),
    s AS (
      SELECT e.vec_id, e.v,
             {_duck_hyperplane_sig("e.v", 10)} AS sig,
             {_duck_hyperplane_sig("q.qv", 10)} AS qsig
      FROM e, q
    )
    SELECT s.vec_id,
           round(list_dot_product(s.v, q.qv)
                 / (sqrt(list_dot_product(s.v, s.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM s, q
    WHERE bit_count(xor(s.sig, s.qsig)) <= 4
    ORDER BY cos_sim DESC, s.vec_id
    LIMIT {_TOPK}
    """,
)
def v4_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_ann_topk(_emb(spark, sf_dir), _query_vec(spark, sf_dir), k=_TOPK)


@register(
    "v5_ivf_topk",
    survey="ext:similarity",
    doc="IVF-style cell-probed top-10 (8 deterministic centroids, "
    "2 probes). Oracle-checked as of r10 (was rows-only): every step "
    "is deterministic — first-max-wins assignment (d14's oracle CTE), "
    "probe ranking by centroid cosine with lowest-cell-id ties "
    "(driver-side seq_cosine, the math.sqrt/DuckDB-sqrt bit-parity "
    "kernel), exact re-rank ordered by the ROUNDED similarity then "
    "vec_id (brute_force_topk's exact sort key). Recall vs brute "
    "force additionally pytest-asserted.",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY
                 list_dot_product(c.cv, q.qv)
                 / (sqrt(list_dot_product(c.cv, c.cv))
                    * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                 c.cid) AS rn
        FROM c, q
      ) WHERE rn <= 2
    ),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.cid) AS rn
        FROM e CROSS JOIN c
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT e.vec_id, e.v FROM e JOIN a USING (vec_id)
      WHERE a.cid IN (SELECT cid FROM probe)
    )
    SELECT vec_id,
           round(list_dot_product(cand.v, q.qv)
                 / (sqrt(list_dot_product(cand.v, cand.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM cand, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def v5_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # deterministic centroid seed: the 8 lowest vec_ids
    cent_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = [list(r["embedding"]) for r in cent_rows]
    assigned = ivf_assign(emb, centroids)
    return ivf_topk(assigned, centroids, _query_vec(spark, sf_dir), k=_TOPK, n_probe=2)


@register(
    "d6_embedding_near_dup",
    bench=22,
    survey="ext:dedup,ext:similarity",
    doc="Embedding-cosine near-dup CLUSTERS — the fifth dedup family "
    "closed end-to-end: exact cosine pairs (> 0.4, block-GEMM "
    "self-join, v2's kernel) -> adaptive connected components "
    "(Pregel prefix + large-star/small-star fallback) -> one canonical "
    "keeper per cluster (min vec_id). Oracle computes the same "
    "transitive closure with a recursive CTE over "
    "list_dot_product-derived edges.",
    oracle=f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE {_DUCK_COS} > 0.4
    ),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
    )
    SELECT id AS vec_id,
           CAST(min(r) AS BIGINT) AS component,
           (id = min(r)) AS keep
    FROM reach GROUP BY id
    """,
)
def d6_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.dedup import connected_components_hybrid

    emb = _emb(spark, sf_dir)
    edges = cosine_pairs(emb, threshold=0.4)
    comp = connected_components_hybrid(edges)
    return (
        emb.select("vec_id")
        .join(
            comp.select(F.col("id").alias("vec_id"), "component"),
            on="vec_id",
            how="left",
        )
        .select(
            "vec_id",
            F.coalesce("component", "vec_id").cast("long").alias("component"),
        )
        .withColumn("keep", F.col("vec_id") == F.col("component"))
    )


@register(
    "v6_label_centroids",
    bench=28,
    survey="ext:similarity,A4",
    doc="Per-label embedding centroids in LONG form (label, dimension, "
    "mean) — the cluster-summarization step an IVF index build or a "
    "near-dup-cluster representative picker runs over the full corpus. "
    "posexplode fans each vector to (label, pos, value) rows that "
    "aggregate map-side into label×64 partial sums, so the shuffle "
    "carries one row per (label, dimension) — centroid computation "
    "never moves the vectors themselves. Long form keeps the driver "
    "hash on scalars (no array-serialization ambiguity) and is what "
    "the IVF assign step consumes anyway.",
    oracle="""
    WITH e AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS v
      FROM embeddings
    )
    SELECT label, CAST(pos - 1 AS INT) AS pos,
           round(CAST(SUM(CAST(v AS DECIMAL(18,12))) AS DOUBLE)
                 / count(*), 6) AS centroid_val
    FROM e GROUP BY label, pos
    """,
)
def v6_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # decimal-exact component sums (the CLAUDE.md float-aggregate
    # rule, v3/v9's pattern — r10 review: plain avg() sums doubles in
    # partition-dependent order, so a reassociation error straddling
    # the 1e-6 rounding boundary could flip a component between
    # engines or between Spark runs); the division happens in double
    # on the identical exact sum on both sides.
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("double").cast("decimal(18,12)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("centroid_val")
        )
        .select(F.col("label"), F.col("pos").cast("int").alias("pos"), "centroid_val")
    )


@register(
    "v7_knn_join",
    bench=30,
    survey="ext:similarity",
    doc="Exact cosine k-NN graph (top-3 neighbors of EVERY vector) via "
    "block-GEMM with per-group local top-k: each block-pair group "
    "emits B·k candidates per row, a row_number window reduces to k — "
    "shuffle carries B·N·k candidate rows, never the O(N²) score "
    "matrix. The k-NN graph is what embedding clustering, diversity "
    "sampling and near-dup analysis consume downstream.",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id, nbr_id, cos_sim FROM (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) DESC,
                 b.vec_id) AS rn
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ) WHERE rn <= 3
    """,
)
def v7_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.similarity import knn_join

    return knn_join(_emb(spark, sf_dir), k=3)


@register(
    "v8_ivf_recall_audit",
    bench=90,
    survey="ext:similarity,A4",
    doc="In-engine ANN quality audit: recall@10 of the IVF probe path "
    "(v5: 8 deterministic centroids = the vec_id<8 embeddings, 2 "
    "probed cells, exact re-rank) against the brute-force truth (v1) "
    "— the index-quality gate a 100 TB embedding pipeline runs after "
    "every IVF build. Everything is deterministic (cosine ties break "
    "to the LOWEST centroid/vector id, matching ivf_assign's strict "
    "`>` comparison), so the full audit — assignment, probe choice, "
    "both top-k sets, the overlap — is replicated in the DuckDB "
    "oracle. All-lazy plan: candidate census and overlap are two "
    "1-row aggregates cross-joined; nothing but the 8 centroids and "
    "the query vector ever reaches the driver.",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {_QUERY_VEC_ID}),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.cid) AS rn
        FROM e CROSS JOIN c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT cid FROM (
        SELECT c.cid, row_number() OVER (ORDER BY
          list_dot_product(c.cv, q.qv)
          / (sqrt(list_dot_product(c.cv, c.cv))
             * sqrt(list_dot_product(q.qv, q.qv))) DESC,
          c.cid) AS rn
        FROM c CROSS JOIN q
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT e.vec_id, e.v FROM e JOIN a USING (vec_id)
      JOIN probes USING (cid)
    ),
    -- approx/truth rank by the ROUNDED similarity (r10 review): the
    -- Spark side (ivf_topk/brute_force_topk) sorts on the rounded
    -- cos_sim, so a raw-value rank here could disagree at a 6-dp
    -- rounding tie on the rank-{_TOPK} boundary
    approx AS (
      SELECT vec_id FROM (
        SELECT cand.vec_id, row_number() OVER (ORDER BY
          round(list_dot_product(cand.v, q.qv)
          / (sqrt(list_dot_product(cand.v, cand.v))
             * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
          cand.vec_id) AS rn
        FROM cand CROSS JOIN q
      ) WHERE rn <= {_TOPK}
    ),
    truth AS (
      SELECT vec_id FROM (
        SELECT e.vec_id, row_number() OVER (ORDER BY
          round(list_dot_product(e.v, q.qv)
          / (sqrt(list_dot_product(e.v, e.v))
             * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
          e.vec_id) AS rn
        FROM e CROSS JOIN q
      ) WHERE rn <= {_TOPK}
    )
    SELECT {_TOPK} AS k,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM approx JOIN truth USING (vec_id))
                AS BIGINT) AS n_overlap,
           round((SELECT count(*) FROM approx JOIN truth USING (vec_id))
                 / {_TOPK}.0, 6) AS recall
    """,
)
def v8_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.similarity import brute_force_topk, probe_cells

    emb = _emb(spark, sf_dir)
    cent_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = [list(r["embedding"]) for r in cent_rows]
    qvec = _query_vec(spark, sf_dir)
    # lazily checkpointed (pipe4's pattern): the assignment feeds BOTH
    # the ivf_topk branch and the candidate census below — without it
    # the plan runs the Arrow assign kernel once per branch (observed
    # as MapInPandas x2 in the r13 executed plan)
    assigned = ivf_assign(emb, centroids).localCheckpoint(eager=False)
    # THE shared probe selector (similarity.probe_cells) — the census
    # below and ivf_topk's internal probing must agree on the cells
    probe = probe_cells(centroids, qvec, 2)
    approx = ivf_topk(assigned, centroids, qvec, k=_TOPK, n_probe=2).select(
        "vec_id"
    )
    truth = brute_force_topk(emb, qvec, k=_TOPK).select("vec_id")
    # the candidate census and the overlap count collapse into ONE
    # 1-row aggregate over a tagged union — joining two 1-row
    # aggregates (even on a constant equi key, which Catalyst folds
    # away) would plan BroadcastNestedLoopJoin, the one join strategy
    # the registry-wide sweep (test_plans) bans
    cand_rows = assigned.filter(F.col("cell").isin(probe)).select(
        F.lit(1).alias("is_cand"), F.lit(0).alias("is_over")
    )
    over_rows = approx.join(truth, on="vec_id").select(
        F.lit(0).alias("is_cand"), F.lit(1).alias("is_over")
    )
    return cand_rows.unionByName(over_rows).agg(
        F.lit(_TOPK).alias("k"),
        F.sum("is_cand").cast("long").alias("n_candidates"),
        F.sum("is_over").cast("long").alias("n_overlap"),
        F.round(F.sum("is_over") / float(_TOPK), 6).alias("recall"),
    )


@register(
    "v9_quantization_error",
    bench=101,
    survey="ext:similarity,A4",
    doc="Int8 scalar-quantization audit: each vector is quantized to "
    "256 uniform levels over its own [min, max] (the per-vector "
    "scalar quantizer an ANN index or embedding cache applies before "
    "storage), reconstructed, and the per-label mean/max "
    "reconstruction MSE reported — the ship-or-hold check before "
    "shipping 4x-smaller vectors. min/max come from array_min/"
    "array_max BEFORE the posexplode (per-row, no window, no extra "
    "shuffle); the rounding is floor(x+0.5) on BOTH engines (no "
    "engine-native round whose half-even behavior could differ); "
    "squared errors round to 14 and sum through DECIMAL(30,16) so "
    "the per-vector MSE is exact and order-independent. The exploded "
    "rows map-side combine straight back to one partial per vector, "
    "so the shuffle carries ~|vectors| rows, never |vectors| x dim.",
    oracle="""
    WITH l AS (
      SELECT vec_id, label,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             CAST(list_max(embedding) AS DOUBLE) AS mx,
             CAST(unnest(embedding) AS DOUBLE) AS xd
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, label,
             CASE WHEN mx = mn THEN 0.0
                  ELSE (xd - (floor((xd - mn) / ((mx - mn) / 255.0) + 0.5)
                              * ((mx - mn) / 255.0) + mn))
                       * (xd - (floor((xd - mn) / ((mx - mn) / 255.0) + 0.5)
                                * ((mx - mn) / 255.0) + mn))
             END AS se
      FROM l
    ),
    p AS (
      SELECT vec_id, label,
             round(CAST(SUM(CAST(round(se, 14) AS DECIMAL(30,16))) AS DOUBLE)
                   / count(*), 9) AS mse
      FROM s GROUP BY vec_id, label
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(CAST(mse AS DECIMAL(18,12))) AS DOUBLE)
                 / count(*), 9) AS avg_mse,
           round(max(mse), 9) AS max_mse
    FROM p GROUP BY label
    """,
)
def v9_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    base = emb.select(
        "vec_id",
        "label",
        F.array_min("embedding").cast("double").alias("mn"),
        F.array_max("embedding").cast("double").alias("mx"),
        F.posexplode("embedding").alias("pos", "x"),
    )
    xd = F.col("x").cast("double")
    mn, mx = F.col("mn"), F.col("mx")
    scale = (mx - mn) / F.lit(255.0)
    rec = F.floor((xd - mn) / scale + F.lit(0.5)) * scale + mn
    se = F.when(mx == mn, F.lit(0.0)).otherwise((xd - rec) * (xd - rec))
    per_vec = (
        base.select("vec_id", "label", se.alias("se"))
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum(F.round(F.col("se"), 14).cast("decimal(30,16)"))
                .cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mse")
        )
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(
            F.sum(F.col("mse").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("avg_mse"),
        F.round(F.max("mse"), 9).alias("max_mse"),
    )


@register(
    "v10_mips_topk",
    bench=102,
    survey="ext:similarity",
    doc="Maximum-inner-product retrieval: exact top-10 by RAW dot "
    "product against the vec_id=0 query vector — the magnitude-aware "
    "ranking recommendation/retrieval systems use where popular items "
    "carry larger norms (cosine, v1, would erase that signal). The "
    "query vector is a plan literal, the kernel accumulates "
    "sequentially in double on both engines, and both engines order "
    "by the ROUNDED score with vec_id tie-break, so the page is "
    "deterministic; Catalyst plans TakeOrderedAndProject (per-"
    "partition heaps, no global sort). At 100 TB the ANN path is the "
    "standard norm-augmentation reduction (append "
    "sqrt(max_norm^2-|x|^2) as an extra dimension) which turns MIPS "
    "into the cosine problem v4/v5 already index.",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT v FROM e WHERE vec_id = {_QUERY_VEC_ID})
    SELECT e.vec_id, round(list_dot_product(e.v, q.v), 6) AS dot_sim
    FROM e, q
    ORDER BY dot_sim DESC, e.vec_id LIMIT {_TOPK}
    """,
)
def v10_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in _query_vec(spark, sf_dir)])
    return (
        emb.select(
            "vec_id", F.round(dot(F.col("embedding"), q), 6).alias("dot_sim")
        )
        .orderBy(F.col("dot_sim").desc(), "vec_id")
        .limit(_TOPK)
    )


@register(
    "d14_semdedup_cells",
    bench=113,
    survey="ext:dedup,ext:similarity",
    doc="SemDeDup (Abbas et al. 2023): semantic dedup restricted to "
    "IVF/k-means cells — assign every embedding to its nearest of the "
    "8 deterministic centroids (v5/v8's convention: vec_id<8 vectors, "
    "first-max-wins ties), then find cosine>0.35 pairs ONLY within "
    "cells via the block-nested GEMM with the cell prepended to the "
    "grouping key (one hot cell splits into bounded sub-blocks — the "
    "power-law-cluster skew story). Census per cell: vectors, dup "
    "pairs, dropped (higher id of any pair, the min-id-keeper rule), "
    "kept. Work is Σ n_cell²·d, not N²·d — the property that makes "
    "embedding dedup feasible at 10⁸+ vectors.",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.cid) AS rn
        FROM e CROSS JOIN c
      ) WHERE rn = 1
    ),
    m AS (SELECT e.vec_id, e.v, a.cid AS cell FROM e JOIN a USING (vec_id)),
    p AS (
      SELECT x.cell, x.vec_id AS id_a, y.vec_id AS id_b
      FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v))
               * sqrt(list_dot_product(y.v, y.v))) > 0.35
    ),
    pa AS (
      SELECT cell, count(*) AS n_pairs, count(DISTINCT id_b) AS n_dropped
      FROM p GROUP BY cell
    )
    SELECT m.cell,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(coalesce(any_value(pa.n_pairs), 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(any_value(pa.n_dropped), 0) AS BIGINT) AS n_dropped,
           CAST(count(*) - coalesce(any_value(pa.n_dropped), 0) AS BIGINT)
             AS n_kept
    FROM m LEFT JOIN pa USING (cell)
    GROUP BY m.cell
    """,
)
def d14_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.similarity import cell_cosine_pairs

    emb = _emb(spark, sf_dir)
    cent_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = [list(r["embedding"]) for r in cent_rows]
    assigned = ivf_assign(emb, centroids).localCheckpoint(eager=False)
    pairs = cell_cosine_pairs(assigned, threshold=0.35)
    pa = pairs.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("id_b").cast("long").alias("n_dropped"),
    )
    census = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    return (
        census.join(pa, on="cell", how="left")
        .select(
            "cell",
            "n_vectors",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_dropped"), F.lit(0))
            .cast("long")
            .alias("n_dropped"),
            (
                F.col("n_vectors")
                - F.coalesce(F.col("n_dropped"), F.lit(0))
            )
            .cast("long")
            .alias("n_kept"),
        )
    )


@register(
    "v11_ivf_kmeans_build",
    bench=116,
    survey="ext:similarity",
    doc="Trained IVF build: deterministic Lloyd k-means by cosine "
    "(operators/similarity.py::kmeans_fit — k lowest-id seeds, "
    "first-max-wins assignment, decimal(38,18)-exact order-independent "
    "means; 3 iterations) followed by one full assignment pass. Output "
    "is the build census: per cell, member count and the mean cosine "
    "to the trained centroid (the index-quality figure an ANN build "
    "reports). Rows-only — the trainer is an iterative driver loop no "
    "single SQL statement expresses — but bit-stable under any input "
    "partitioning (pytest asserts repartition-invariance), so it is "
    "golden-pinned like tx13/d3. At 100 TB: fit on a hash-sample "
    "(samp1 composes), assign the corpus once, write partitioned by "
    "cell (v5's persisted layout).",
    oracle=None,
)
def v11_ivf_kmeans_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.similarity import kmeans_fit

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit(emb, k=8, n_iter=3)
    # ONE cosine array per row, aliased in its own select (the tx6
    # CollapseProject discipline), yields BOTH the cell (first-max
    # argmax, ivf_assign's exact semantics) and the member's cosine to
    # it (array_max) — halving the interpreted-fold work vs
    # assign-then-rescore.
    # hoist the row norm (shared by all k cosines) and fold the
    # centroid norms driver-side with the bit-identical sequential
    # kernel — 3x fewer interpreted lambda evaluations than k full
    # cosine() calls, same bits (golden-pinned).
    import math as _math

    ncents = [
        _math.sqrt(sum((float(x) * float(x) for x in c), 0.0)) for c in cents
    ]
    sims = F.array(
        *[
            dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c]))
            / (F.col("__n") * F.lit(nc))
            for c, nc in zip(cents, ncents)
        ]
    )
    scored = (
        emb.select("embedding", norm(F.col("embedding")).alias("__n"))
        .select(sims.alias("__s"))
        .select(
            (
                F.array_position(F.col("__s"), F.array_max(F.col("__s"))) - 1
            )
            .cast("int")
            .alias("cell"),
            F.array_max(F.col("__s")).alias("cos_own"),
        )
    )
    return scored.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(
            F.sum(F.col("cos_own").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_cos_to_centroid"),
    )


_DUCK_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "pipe4_curation_pipeline",
    bench=118,
    survey="ext:quality,ext:dedup,ext:similarity,ext:text",
    doc="End-to-end curation pipeline (r9 verdict #6): Gopher "
    "structural-quality filter -> SemDeDup within k-means cells -> "
    "token-budget packing, composing tx14 + d14 + pack1 (each green "
    "individually) into the shape a real pretraining-data build runs. "
    "Stage 1 keeps documents passing the four STRUCTURAL Gopher rules "
    "(word count in [50,100000], mean word length in [3,10], "
    "symbol-to-word <= 0.1, >= 80% alphabetic words; the fifth "
    "'required stopwords' rule is deliberately omitted — the synthetic "
    "fixture corpus is stopword-free word soup, so including it keeps "
    "zero documents and the pipeline would be untestable; tx14 still "
    "reports all five flags). Stage 2 drops the higher-id member of "
    "every same-cell cosine>0.35 pair among SURVIVORS' embeddings "
    "(d14's centroid/tie conventions; docs without an embedding pass "
    "through — the realistic partial-coverage case). Stage 3 packs "
    "the kept stream into 2048-token chunks per source via the "
    "distributed two-level prefix sum. Scale: stage 1 is map-only "
    "over one let-bound token array; stage 2 is the bounded per-cell "
    "block GEMM (work after filtering is SMALLER than d14's); stage 3 "
    "never plans a global window. The gopher metrics are "
    "lazily checkpointed so the anti-join and the embedding semi-join "
    "read ONE materialization.",
    oracle=f"""
    WITH tkd AS (SELECT doc_id, source, {_DUCK_TOKENS} AS tk FROM documents),
    m AS (
      SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
             round(list_sum(list_transform(tk, w -> length(w))) * 1.0
                   / greatest(len(tk), 1), 6) AS mwl,
             round(len(list_filter(tk, w -> regexp_matches(w, '#|\\.\\.\\.'))) * 1.0
                   / greatest(len(tk), 1), 6) AS swr,
             round(len(list_filter(tk, w -> regexp_matches(w, '[a-z]'))) * 1.0
                   / greatest(len(tk), 1), 6) AS awf
      FROM tkd
    ),
    surv AS (
      SELECT doc_id, source, n_tokens FROM m
      WHERE {gopher_gate_sql()}
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    se AS (SELECT e.vec_id, e.v FROM e JOIN surv s ON e.vec_id = s.doc_id),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT se.vec_id, c.cid,
               row_number() OVER (PARTITION BY se.vec_id ORDER BY
                 list_dot_product(se.v, c.cv)
                 / (sqrt(list_dot_product(se.v, se.v))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.cid) AS rn
        FROM se CROSS JOIN c
      ) WHERE rn = 1
    ),
    mm AS (SELECT se.vec_id, se.v, a.cid AS cell FROM se JOIN a USING (vec_id)),
    p AS (
      SELECT y.vec_id AS id_b
      FROM mm x JOIN mm y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v))
               * sqrt(list_dot_product(y.v, y.v))) > 0.35
    ),
    kept AS (
      SELECT s.* FROM surv s
      WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.id_b = s.doc_id)
    ),
    off AS (
      SELECT source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM kept
    )
    SELECT source, CAST(off // 2048 AS BIGINT) AS chunk_id,
           count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
    FROM off GROUP BY source, chunk_id
    """,
)
def pipe4_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.functions.text import (
        gopher_metrics,
        gopher_structural_gate,
        tokens,
    )
    from pypgsync_spark.operators.packing import pack_chunks
    from pypgsync_spark.operators.similarity import cell_cosine_pairs

    docs = load_table(spark, sf_dir, "documents")
    # token array aliased in its own select (tx6 CollapseProject
    # discipline): the split runs once for all four derived metrics,
    # which come from THE shared formulation (gopher_metrics — r10
    # review: an inline copy of tx14's lambdas would drift)
    tkd = docs.select("doc_id", "source", tokens(F.col("text")).alias("tk"))
    gm = gopher_metrics(F.col("tk"))
    m = tkd.select(
        "doc_id",
        "source",
        gm["n_words"].alias("n_tokens"),
        gm["mean_word_len"].alias("mwl"),
        gm["symbol_word_ratio"].alias("swr"),
        gm["alpha_word_frac"].alias("awf"),
    )
    # survivors materialized once (lazy checkpoint): read by BOTH the
    # embedding semi-join and the final anti-join — without it the
    # interpreted HOF metrics above would run twice
    surv = (
        m.filter(
            gopher_structural_gate(
                F.col("n_tokens"), F.col("mwl"), F.col("swr"), F.col("awf")
            )
        )
        .select("doc_id", "source", "n_tokens")
        .localCheckpoint(eager=False)
    )

    emb = _emb(spark, sf_dir)
    # d14's centroid convention: the 8 lowest-id vectors of the FULL
    # table (a fixed reference frame, independent of the text filter)
    cent_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = [list(r["embedding"]) for r in cent_rows]
    semb = emb.join(surv.select(F.col("doc_id").alias("vec_id")), "vec_id").select(
        "vec_id", "embedding"
    )
    assigned = ivf_assign(semb, centroids)
    pairs = cell_cosine_pairs(assigned, threshold=0.35)
    # min-id keeper: any doc that is the HIGHER id of a near-dup pair
    # is dropped; docs with no embedding never appear in pairs → kept
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = surv.join(dropped, "doc_id", "left_anti")
    return pack_chunks(kept, "source", "doc_id", "n_tokens", budget=2048, bucket_size=1000)


@register(
    "v13_sq8_ann_topk",
    bench=131,
    survey="ext:similarity",
    doc="SQ8 quantized-scan ANN top-10: every corpus vector is "
    "int8-scalar-quantized over its own [min, max] (v9's quantizer — "
    "v9 audits the reconstruction error, this query runs the search "
    "it gates), candidates come from the approximate cosine of the "
    "RECONSTRUCTED vector against the exact query (one Arrow-batched "
    "map, np.cumsum sequential folds = list_dot_product bit-parity), "
    "the top-50 by ROUNDED approx score (TakeOrderedAndProject heap, "
    "vec_id tie-break) are exact-reranked by v1's brute-force kernel. "
    "The faiss-SQ8 / Lucene-int8 search shape: a quarter of the "
    "float32 scan bandwidth, exactness restored on the shortlist. "
    "Embedding rides the kernel through to the rerank, so there is "
    "no join back to the corpus. Recall vs v1 pytest-asserted.",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {_QUERY_VEC_ID}),
    m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
    r AS (
      SELECT vec_id, v,
             CASE WHEN mx = mn THEN v
                  ELSE list_transform(v, x ->
                         floor((x - mn) / ((mx - mn) / 255.0) + 0.5)
                         * ((mx - mn) / 255.0) + mn)
             END AS rv
      FROM m
    ),
    a AS (
      SELECT r.vec_id, r.v,
             round(list_dot_product(r.rv, q.qv)
                   / (sqrt(list_dot_product(r.rv, r.rv))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS acos_sim
      FROM r, q
    ),
    cand AS (SELECT vec_id, v FROM a ORDER BY acos_sim DESC, vec_id LIMIT 50)
    SELECT cand.vec_id,
           round(list_dot_product(cand.v, q.qv)
                 / (sqrt(list_dot_product(cand.v, cand.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM cand, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT {_TOPK}
    """,
)
def v13_sq8_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    cand = (
        sq8_approx_scores(emb, qv)
        .select(
            "vec_id",
            "embedding",
            F.round(F.col("acos_sim"), 6).alias("acos_r"),
        )
        # rank by the ROUNDED score (v1's rounding-tie lesson), vec_id
        # tie-break — TakeOrderedAndProject, no global sort
        .orderBy(F.col("acos_r").desc(), "vec_id")
        .limit(50)
    )
    return brute_force_topk(cand, qv, k=_TOPK)


@register(
    "v14_ivf_sq8_topk",
    bench=134,
    survey="ext:similarity",
    doc="IVF + SQ8 composite ANN top-10 — the faiss 'IVF8,SQ8' index "
    "shape: v5's cell pruning bounds WHICH vectors are scanned (8 "
    "deterministic centroids, first-max-wins assignment, 2 probed "
    "cells by driver-side seq_cosine with lowest-cell-id ties), v13's "
    "int8 scalar quantization bounds the BANDWIDTH of that scan (the "
    "Arrow kernel scores reconstructed vectors against the exact "
    "query), and the top-50 shortlist by ROUNDED approx score is "
    "exact-reranked. Every stage is deterministic, so the oracle "
    "restates the full composite: assignment, probe ranking, "
    "quantize-reconstruct-score, shortlist, rerank. At 100 TB the "
    "assignment is the write-once partitionBy(cell) table and the "
    "int8 codes are materialized alongside it — a query touches "
    "n_probe cells at a quarter of the float32 bytes. Recall vs v1 "
    "pytest-asserted.",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY
                 list_dot_product(c.cv, q.qv)
                 / (sqrt(list_dot_product(c.cv, c.cv))
                    * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                 c.cid) AS rn
        FROM c, q
      ) WHERE rn <= 2
    ),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.cid) AS rn
        FROM e CROSS JOIN c
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT e.vec_id, e.v FROM e JOIN a USING (vec_id)
      WHERE a.cid IN (SELECT cid FROM probe)
    ),
    m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM cand),
    r AS (
      SELECT vec_id, v,
             CASE WHEN mx = mn THEN v
                  ELSE list_transform(v, x ->
                         floor((x - mn) / ((mx - mn) / 255.0) + 0.5)
                         * ((mx - mn) / 255.0) + mn)
             END AS rv
      FROM m
    ),
    ax AS (
      SELECT r.vec_id, r.v,
             round(list_dot_product(r.rv, q.qv)
                   / (sqrt(list_dot_product(r.rv, r.rv))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS acos_sim
      FROM r, q
    ),
    short AS (SELECT vec_id, v FROM ax ORDER BY acos_sim DESC, vec_id LIMIT 50)
    SELECT short.vec_id,
           round(list_dot_product(short.v, q.qv)
                 / (sqrt(list_dot_product(short.v, short.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM short, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def v14_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    # v5's deterministic centroid seed + probe selection
    cent_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = [list(r["embedding"]) for r in cent_rows]
    from pypgsync_spark.operators.similarity import probe_cells

    probes = probe_cells(centroids, qv, n_probe=2)
    cand_cells = ivf_assign(emb, centroids).filter(F.col("cell").isin(probes))
    shortlist = (
        sq8_approx_scores(cand_cells, qv)
        .select(
            "vec_id",
            "embedding",
            F.round(F.col("acos_sim"), 6).alias("acos_r"),
        )
        .orderBy(F.col("acos_r").desc(), "vec_id")
        .limit(50)
    )
    return brute_force_topk(shortlist, qv, k=_TOPK)


@register(
    "v15_sq8_index_scan_topk",
    bench=137,
    survey="ext:similarity,S4,S7",
    doc="The MATERIALIZED form of v14 — the index table v13/v14's "
    "docstrings promise: one build pass writes (vec_id, mn, mx, "
    "dim-byte int8 code BINARY) partitionBy(cell) — a quarter of the "
    "float32 bytes, the parquet layout IS the index — then the query "
    "probes 2 of 8 cells, and the read PRUNES to those partition "
    "directories before any row is read (s9's partition-pruning "
    "story applied to ANN; plan-asserted). The code-only scan "
    "decodes+scores in one Arrow kernel (code·scale + mn reproduces "
    "v13's reconstruction BIT-FOR-BIT: codes 0..255 are exact "
    "doubles), heaps the top-50 by rounded approx score, and "
    "LATE-MATERIALIZES: only those 50 rows join back to the float "
    "vectors for the exact re-rank — full-precision data is touched "
    "for |shortlist| rows, never |corpus|. Same oracle as v14 (the "
    "math never sees the stored bytes); result pinned identical to "
    "the unmaterialized composite. Build+query both run per call — "
    "at 100 TB the build is the write-once index job and only the "
    "query side recurs.",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY
                 list_dot_product(c.cv, q.qv)
                 / (sqrt(list_dot_product(c.cv, c.cv))
                    * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                 c.cid) AS rn
        FROM c, q
      ) WHERE rn <= 2
    ),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.cid) AS rn
        FROM e CROSS JOIN c
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT e.vec_id, e.v FROM e JOIN a USING (vec_id)
      WHERE a.cid IN (SELECT cid FROM probe)
    ),
    m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM cand),
    r AS (
      SELECT vec_id, v,
             CASE WHEN mx = mn THEN v
                  ELSE list_transform(v, x ->
                         floor((x - mn) / ((mx - mn) / 255.0) + 0.5)
                         * ((mx - mn) / 255.0) + mn)
             END AS rv
      FROM m
    ),
    ax AS (
      SELECT r.vec_id, r.v,
             round(list_dot_product(r.rv, q.qv)
                   / (sqrt(list_dot_product(r.rv, r.rv))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS acos_sim
      FROM r, q
    ),
    short AS (SELECT vec_id, v FROM ax ORDER BY acos_sim DESC, vec_id LIMIT 50)
    SELECT short.vec_id,
           round(list_dot_product(short.v, q.qv)
                 / (sqrt(list_dot_product(short.v, short.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM short, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def v15_sq8_index_scan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pypgsync_spark.operators.similarity import (
        sq8_index_topk,
        sq8_index_write,
    )
    from pypgsync_spark.queries.syncq import _pid_scratch_dir

    emb = _emb(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    cent_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = [list(r["embedding"]) for r in cent_rows]
    # fresh index dir per call nested under the pid-scoped reaped
    # parent (t8's /tmp discipline): a stale index written by older
    # code must never serve a newer query's scan
    parent = _pid_scratch_dir("v15_sq8_index", sf_dir)
    os.makedirs(parent, exist_ok=True)
    path = os.path.join(tempfile.mkdtemp(prefix="run_", dir=parent), "idx")
    sq8_index_write(emb, centroids, path)
    return sq8_index_topk(
        spark, path, emb, centroids, qv, k=_TOPK, n_probe=2
    )
