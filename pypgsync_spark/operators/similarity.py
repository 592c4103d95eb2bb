"""Vector similarity search over embedding columns (array<float>).

Kernels are pure Column expressions (``zip_with`` + ``aggregate``,
double precision, sequential accumulation — bit-compatible with the
DuckDB oracle's ``list_dot_product`` on DOUBLE[]). No Python in the
hot path; an optional Pandas-UDF kernel exists for very wide vectors
where Arrow-batched numpy beats expression codegen.

Three search strategies:

- brute-force top-k: cross-join against a broadcast query vector →
  ``TakeOrderedAndProject``. O(N) per query — the exactness baseline.
- random-hyperplane LSH ANN: sign-bit signature over ``nbits`` fixed
  hyperplanes → candidates share the signature bucket (optionally with
  multi-probe on neighboring buckets) → exact re-rank inside buckets.
- IVF-style partition search: assign every vector to its nearest of
  ``n_cells`` deterministic centroid vectors (one shuffle, reusable),
  probe the ``n_probe`` nearest cells at query time, exact re-rank.

At 100 TB: brute force is a full scan per query (only for offline
batch scoring); LSH/IVF bound the scan to a bucket/cell subset and the
assignment tables are write-once, query-many.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential order (oracle-compatible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_col: str = "cos_sim",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    The query vector is a plan literal (implicitly broadcast); the scan
    is embarrassingly parallel and Catalyst plans the order+limit as
    TakeOrderedAndProject (heap top-k, no global sort).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        vectors.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias(sim_col),
        )
        .orderBy(F.col(sim_col).desc(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine > threshold — embedding
    near-dup detection.

    Physical strategy: broadcast the full normalized matrix (N×d
    float64 — fine up to ~1M×64, ~500 MB) and stream the row side
    through an Arrow-batched ``mapInPandas`` doing a blocked GEMM
    (``batch @ all.T``): each executor emits only the above-threshold
    pairs of its batch. O(N²d) FLOPs distributed over partitions at
    BLAS speed — ~100× the expression-per-pair cross join. Beyond the
    broadcastable size, gate candidates with
    :func:`hyperplane_signature` buckets first and run this within
    buckets (or block both sides of the GEMM).

    The expression-based exact-sequential-sum variant is
    :func:`cosine_pairs_expr` (bit-identical to the DuckDB oracle;
    this one agrees to ~1e-15, far inside the 1e-6 output rounding).
    """
    import pandas as pd
    from pyspark.sql import types as T

    rows = vectors.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = vectors.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def block_pairs(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.stack(pdf[vec_col].map(np.asarray)).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ all_mat.T  # blocked GEMM
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            ai, bj = np.nonzero((sims > threshold) & (qids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": qids[ai],
                    "id_b": all_ids[bj],
                    "cos_sim": np.round(sims[ai, bj], 6),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(block_pairs, schema)


def cosine_pairs_expr(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Expression-based exact variant of :func:`cosine_pairs`
    (sequential-sum dot product; matches DuckDB bit-for-bit, but the
    per-pair interpreted lambdas make it ~100× slower — keep for
    oracle-fidelity tests and small inputs)."""
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos_sim") > threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed → stable buckets)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def hyperplane_signature(
    vec: Column, dim: int, nbits: int = 16, seed: int = 42
) -> Column:
    """LSH signature: bit i = sign(vec · hyperplane_i). Returns a long."""
    planes = _hyperplanes(dim, nbits, seed)
    sig = F.lit(0).cast("long")
    for i in range(nbits):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        sig = sig + F.when(dot(vec, h) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int = 64,
    nbits: int = 10,
    max_hamming: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_col: str = "cos_sim",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict exact re-rank to vectors whose
    hyperplane signature is within ``max_hamming`` bits of the query's
    (multi-probe LSH). Recall/latency tradeoff via nbits/max_hamming.

    Defaults scan ~38% of the corpus (Σ_{i≤4} C(10,i)/2^10) — tuned
    for near-uniform embeddings like the fixture's (top-10 cosine
    ≈0.33, near-orthogonal), where sign bits correlate weakly with
    rank. On real clustered embeddings the same radius yields far
    higher recall at far smaller candidate fractions, and nbits can
    rise (16–24) to sharpen the filter.
    """
    planes = _hyperplanes(dim, nbits, seed)
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i in range(nbits):
        if float(planes[i] @ qv) > 0:
            qsig |= 1 << i
    sig = hyperplane_signature(F.col(vec_col), dim, nbits, seed)
    cand = vectors.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col, sim_col)


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (IVF build
    step). Centroids are plan literals — at real scale they come from a
    sampled k-means and are broadcast. Write the result partitioned by
    ``cell`` so query-time probes prune partitions."""
    best_cell = F.lit(0)
    best_sim = F.lit(-2.0)
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        sim = cosine(F.col(vec_col), carr)
        better = sim > best_sim
        best_cell = F.when(better, F.lit(ci)).otherwise(best_cell)
        best_sim = F.when(better, sim).otherwise(best_sim)
    return vectors.withColumn(cell_col, best_cell)


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    sim_col: str = "cos_sim",
) -> DataFrame:
    """Probe the ``n_probe`` nearest cells to the query, exact re-rank."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qv)
    sims = [
        float(np.dot(c, qv) / (np.linalg.norm(c) * qn)) for c in np.asarray(centroids)
    ]
    probe = sorted(range(len(centroids)), key=lambda i: -sims[i])[:n_probe]
    cand = assigned.filter(F.col(cell_col).isin(probe))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col, sim_col)
