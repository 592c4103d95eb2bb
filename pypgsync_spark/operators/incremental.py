"""Incremental dedup — dedup a DELTA against an existing corpus.

At 100 TB nobody re-deduplicates the whole corpus per ingest batch: the
operational contract is "collapse the incoming batch internally, then
drop everything the corpus already has". That is two relational steps,
both fingerprint-keyed:

1. intra-delta collapse: one keeper per normalized-content fingerprint,
   min id wins (same deterministic rule as operators/dedup.dedup_exact);
2. corpus screen: LEFT ANTI join of the keepers against the corpus's
   fingerprint set.

Plan shape: the anti join shuffles both sides on the fingerprint — the
corpus side ships ONLY (fingerprint) after column pruning, and when the
delta is small relative to the corpus (the normal case) Spark/AQE can
instead broadcast the delta-side build. No pass ever touches corpus
text; the fingerprint column is the only thing read (at deploy scale it
would be a precomputed, bucketed column of the corpus table, making the
screen a no-shuffle bucket join — the same layout trick as
sources/bucketed.py).

The near-dup analogue composes the same screen with signature buckets:
minhash-band keys (operators/dedup.minhash_lsh_pairs' banding) replace
the fingerprint, delta bands semi-join corpus bands, and only colliding
pairs get verified — still delta-proportional work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pypgsync_spark.functions.text import content_fingerprint


def incremental_dedup_exact(
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``delta`` that survive exact dedup against ``corpus``
    (and against the rest of the delta — min ``id_col`` keeps).

    Output: the surviving delta rows, original columns.
    """
    fp = content_fingerprint(F.col(text_col))
    d = delta.withColumn("__fp", fp)
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    keepers = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    corpus_fps = corpus.select(fp.alias("__fp"))
    return keepers.join(corpus_fps, on="__fp", how="left_anti").drop("__fp")


def cross_jaccard_pairs(
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.3,
    materialize_shingles: bool = True,
    hashed_verify: bool = True,
) -> DataFrame:
    """Exact cross-collection near-dup pairs: every (delta doc, corpus
    doc) pair with n-gram Jaccard > ``threshold`` — the NEAR-dup
    counterpart of :func:`incremental_dedup_exact`'s corpus screen,
    complete (no candidate loss) and delta-proportional.

    Same AllPairs/PPJoin prefix filter as the self-join form
    (operators/dedup.ngram_jaccard_pairs): both collections' shingles
    sort by ONE shared canonical order (ascending frequency over the
    UNION corpus, ties by value — the lemma needs a single total
    order), each doc keeps its (size − ⌈θ·size⌉ + 1)-prefix, and the
    candidate join is delta-prefix ⋈ corpus-prefix on the shingle —
    never delta × corpus. The PPJoin length filter prunes cross-size
    collisions inside the join; the exact Jaccard verify finishes.

    ``hashed_verify`` (r14 optimization round) mirrors the self-join
    form's flag verbatim: each shingle string is replaced by its
    xxhash64 before the prefix build and the pairwise intersections —
    Jaccard depends only on set sizes, which 64-bit hashing preserves
    (collision odds ~|sh|²/2⁶⁴), the PPJoin lemma only needs SOME
    shared total order (frequency ties now break by hash value
    instead of string value — a different, equally total order), and
    long-array intersects run ~2× faster than string-array ones.

    Output: (delta_id, corpus_id, jaccard).
    """
    import os

    from pypgsync_spark.operators.dedup import (
        hashed_shingles,
        jaccard,
        with_shingles,
    )

    use_kernel = hashed_verify and os.environ.get(
        "SPARK_GRAFT_SHINGLE_KERNEL", "1"
    ) != "0"

    def sh(side: DataFrame) -> DataFrame:
        if use_kernel:
            # fused Arrow kernel (r15) — see ngram_jaccard_pairs
            s = hashed_shingles(side, id_col, text_col, n)
        else:
            s = with_shingles(side.select(id_col, text_col), text_col, n)
            if hashed_verify:
                s = s.withColumn(
                    "shingles",
                    F.array_distinct(
                        F.transform("shingles", lambda x: F.xxhash64(x))
                    ),
                )
        return s.filter(F.size("shingles") > 0)

    sd = sh(delta)
    sc = sh(corpus)
    if materialize_shingles:
        # lazy (r8): the shared-frequency aggregate below full-scans
        # both collections as its first job and materializes the
        # checkpoints as a side effect — same stored blocks, two fewer
        # driver-barrier jobs than eager persists
        sd = sd.localCheckpoint(eager=False)
        sc = sc.localCheckpoint(eager=False)

    def exploded(s: DataFrame, side: str) -> DataFrame:
        return s.select(
            F.col(id_col).alias(f"id_{side}"),
            F.size("shingles").alias(f"sz_{side}"),
            F.explode("shingles").alias("sh"),
        )

    ed, ec = exploded(sd, "d"), exploded(sc, "c")
    # one shared canonical order: frequency over BOTH collections.
    # Checkpointed because BOTH prefix branches join it — without it
    # each branch re-runs the union+explode+aggregate over both
    # collections (at fixture scale the saving is within noise; at
    # corpus scale it is one full token-stream pass). Vocabulary-scale
    # (distinct shingles), the cheapest table in the pipeline to hold.
    freq = (
        ed.select("sh")
        .unionByName(ec.select("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )
    if materialize_shingles:
        # lazy: materializes inside the first branch's job rather than
        # as its own barrier; the second branch then reads the stored
        # partitions
        freq = freq.localCheckpoint(eager=False)

    # shared AllPairs/PPJoin kernel (r10 review: this was a second
    # inline copy of the prefix build; a bound/tie-order fix in one
    # place would have silently left the other incomplete)
    from pypgsync_spark.operators.dedup import (
        PPJOIN_FREQ_BROADCAST_MAX,
        _collect_freq_if_small,
        ppjoin_length_filter,
        ppjoin_positional_filter,
        ppjoin_prefixes,
        ppjoin_prefixes_bcast,
    )

    freq_np = (
        _collect_freq_if_small(freq, PPJOIN_FREQ_BROADCAST_MAX)
        if use_kernel
        else None
    )

    def prefixes(ex: DataFrame, side: str) -> DataFrame:
        if freq_np is not None:
            # union vocabulary fits the broadcast cap: map-side prefix
            # kernel, no freq join / rank-window shuffle per side (r15
            # — see ngram_jaccard_pairs; rows identical by test)
            src = sd if side == "d" else sc
            return ppjoin_prefixes_bcast(
                src, freq_np, threshold, id_col
            ).select(
                F.col("id").alias(f"id_{side}"),
                F.col("sz").alias(f"sz_{side}"),
                "sh",
                F.col("__rk").alias(f"__rk_{side}"),
            )
        return ppjoin_prefixes(
            ex, freq, threshold, id_col=f"id_{side}", sz_col=f"sz_{side}"
        ).withColumnRenamed("__rk", f"__rk_{side}")

    # candidate dedup doubles as the positional-filter aggregation —
    # same lemma and shuffle shape as the self-join form in
    # operators/dedup.ngram_jaccard_pairs (r14)
    cand = (
        prefixes(ed, "d")
        .join(prefixes(ec, "c"), on="sh")
        .filter(ppjoin_length_filter("sz_d", "sz_c", threshold))
        .groupBy("id_d", "id_c")
        .agg(
            F.min("__rk_d").alias("__rd"),
            F.min("__rk_c").alias("__rc"),
            F.first("sz_d").alias("sz_d"),
            F.first("sz_c").alias("sz_c"),
        )
        .filter(
            ppjoin_positional_filter("sz_d", "sz_c", "__rd", "__rc", threshold)
        )
        .select("id_d", "id_c")
    )
    return (
        cand.join(
            sd.select(F.col(id_col).alias("id_d"), F.col("shingles").alias("sh_d")),
            on="id_d",
        )
        .join(
            sc.select(F.col(id_col).alias("id_c"), F.col("shingles").alias("sh_c")),
            on="id_c",
        )
        .withColumn("jaccard", F.round(jaccard(F.col("sh_d"), F.col("sh_c")), 6))
        .filter(F.col("jaccard") > threshold)
        .select(
            F.col("id_d").alias("delta_id"),
            F.col("id_c").alias("corpus_id"),
            "jaccard",
        )
    )


def incremental_dedup_bloom(
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits_per_key: int = 16,
    n_hashes: int = 5,
    max_bloom_keys: int = 2_000_000,
) -> DataFrame:
    """:func:`incremental_dedup_exact` with a DELTA-side Bloom filter
    pushed into the CORPUS fingerprint scan — same exact answer (the
    Bloom only prunes anti-join INPUT; the anti join still decides),
    scale-path plan. The corpus is the 100 TB side: the plain screen
    ships every corpus fingerprint into the anti-join shuffle, but a
    corpus row whose fingerprint cannot be in the delta can never
    affect a LEFT ANTI result, so a delta-keyed Bloom test at the scan
    drops ~all of the corpus before any shuffle — Spark's runtime
    row-level filtering (InjectRuntimeFilter) made explicit and
    deterministic.

    Construction: the collapsed delta's fingerprints set k seeded
    ``xxhash64`` bit positions in an m-bit bitset (m = next power of
    two ≥ bits_per_key·n → false-positive rate ~0.1% at the defaults;
    false NEGATIVES are impossible — corpus rows matching a delta
    fingerprint hash to the same positions by construction, pinned by
    test). The distinct positions are collected ONCE to the driver —
    k·|delta| values, the bounded driver-scalar class (centroid seeds,
    CC counters) — and the bitset rides the plan as an array<long>
    literal; the per-row corpus test is k codegen'd shift/AND
    expressions, no UDF, no per-row subquery.

    Cost envelope of the pushed-down gate (measured, r14): predicate
    pushdown substitutes the fingerprint alias into the scan filter,
    and filter codegen does NOT common-subexpression-eliminate across
    conjuncts — but the conjunction SHORT-CIRCUITS, so a corpus row
    usually exits at its first bit test (~73% reject there at the
    defaults: set-bit density 1 − e^(−k/bits_per_key) ≈ 0.27),
    costing ~2–3 fingerprint evaluations per rejected row; only rows
    passing every test (≈ true matches + ~0.1% false positives) pay
    all k. All of it is map-side CPU at the scan, traded against
    shipping every corpus fingerprint into the anti-join shuffle.
    Driver boundedness is delta-proportional, so the constructor
    falls back to the plain screen past ``max_bloom_keys`` (a ~10⁶-key
    delta is ~MBs of positions; a delta at CORPUS scale is not an
    ingest batch and the plain anti join is already the right plan).
    """
    fp = content_fingerprint(F.col(text_col))
    d = delta.withColumn("__fp", fp)
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    keepers = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        # consumed twice (bloom build + anti join): checkpoint lazily,
        # bloom_prune's key count materializes it
        .localCheckpoint(eager=False)
    )
    pruned = bloom_prune(
        corpus.select(fp.alias("__fp")),
        keepers.select("__fp"),
        "__fp",
        bits_per_key=bits_per_key,
        n_hashes=n_hashes,
        max_keys=max_bloom_keys,
    )
    return keepers.join(pruned, on="__fp", how="left_anti").drop("__fp")


def bloom_prune(
    probe: DataFrame,
    keys: DataFrame,
    key_col: str,
    bits_per_key: int = 16,
    n_hashes: int = 5,
    max_keys: int = 2_000_000,
) -> DataFrame:
    """Filter ``probe`` to rows whose ``key_col`` MAY appear in
    ``keys[key_col]`` — no false negatives by construction (both sides
    hash the key through the same seeded ``xxhash64`` positions), false
    positives only pass extra rows to whatever exact operator follows.

    THE generic Bloom gate (extracted from d16's exact-dedup screen so
    the LSH index probe shares one pinned implementation): the key
    side's distinct bit positions are collected ONCE to the driver —
    k·|keys| values, the bounded driver-scalar class — and the bitset
    rides the plan as an ``array<long>`` literal; the per-row probe
    test is k codegen'd shift/AND conjuncts that short-circuit on the
    first clear bit. Past ``max_keys`` the gate degrades to a no-op
    (returns ``probe`` unchanged): a key side at probe scale is not a
    delta and the ungated plan is already right.

    ``key_col`` must be a concrete column on BOTH inputs (hash
    composite keys into one column first, e.g. ``xxhash64(band,
    bucket)``).

    Physical shape (r14 optimization round, guide §1.2/§7.2): ONE
    driver action — the distinct keys' k raw ``xxhash64`` values come
    back in a single Arrow ``toPandas`` transfer (the old shape was
    two jobs over the same checkpointed key side — a count, then a
    py4j row-by-row collect of ~5·|keys| exploded positions, the
    row conversion alone ~1 s at 80k positions), and the bitset is
    folded in numpy. The mask still rides the plan as an
    ``array(...)`` SQL literal: CreateArray over foldable children
    constant-folds to ONE Literal in the first optimizer pass, and
    the parse is ~100 ms — while the py4j converters (``F.lit`` of a
    list OR of a numpy array) ship 8k elements one JVM call each,
    measured slower than the whole old path. The sizing count is now
    the DISTINCT key count (it rides the same transfer); distinct ≤
    raw count, so the degrade cap triggers no earlier, and either
    sizing only moves the false-positive rate, never correctness.
    """
    import math

    import numpy as np

    seeds = list(range(1, n_hashes + 1))
    hash_cols = [
        F.xxhash64(F.col(key_col), F.lit(s)).alias(f"__h{s}") for s in seeds
    ]
    hpdf = keys.distinct().select(*hash_cols).toPandas()
    n = len(hpdf)
    if n > max_keys:
        return probe
    m = max(64, 1 << math.ceil(math.log2(max(1, n * bits_per_key))))
    mask_np = np.zeros(m // 64, dtype=np.uint64)
    if n:
        hs = hpdf.to_numpy(dtype=np.int64)
        p = (hs & np.int64(m - 1)).ravel()
        np.bitwise_or.at(
            mask_np,
            p >> 6,
            np.left_shift(np.uint64(1), (p & 63).astype(np.uint64)),
        )
    # two's-complement view into signed BIGINT literals
    mask = mask_np.view(np.int64).tolist()
    mask_sql = "array(" + ",".join(f"{x}L" for x in mask) + ")"

    def bit_set(s: int) -> str:
        h = f"(xxhash64(`{key_col}`, {s}) & {m - 1}L)"
        return (
            f"((element_at(__bloom, cast(shiftright({h}, 6) AS INT) + 1)"
            f" & shiftleft(1L, cast({h} & 63L AS INT))) != 0L)"
        )

    cond = " AND ".join(bit_set(s) for s in seeds)
    return (
        probe.withColumn("__bloom", F.expr(mask_sql))
        .filter(F.expr(cond))
        .drop("__bloom")
    )


def lsh_index_screen(
    spark,
    index_path: str,
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
    hashed_verify: bool = True,
) -> DataFrame:
    """Near-dup pairs (delta_id, corpus_id, jaccard) between an ingest
    DELTA and a standing corpus, probed through the corpus's
    MATERIALIZED LSH band index (operators/dedup.lsh_band_index_write)
    — the near-dup analogue this module's header promises, composed
    with the v15 materialized-index and d16 Bloom-gate precedents.

    ``hashed_verify`` (r14 optimization round) is the d2/d8 flag with a
    TWO-COLUMN carry: the delta's STRING shingles must still feed the
    md5 minhash signer (the oracle-shared base hash), so only the two
    verify-side projections replace each shingle with its xxhash64 —
    Jaccard depends on set sizes alone, which 64-bit hashing preserves
    (collision odds ~|sh|²/2⁶⁴), long-array intersects run ~2× faster
    than string-array ones, and the verify joins ship 8-byte elements
    instead of n-gram strings. The signature/banding chain is
    bit-identical to the unhashed form; equality against the
    string-verify reference chain is pinned by
    tests/test_r14_queries.py::test_d17_matches_indexless_screen_and_recrawl_hits.

    Work is delta-proportional end to end:

    1. the delta (only) is shingled and signed — the corpus's signature
       cost was paid once, at index build;
    2. the delta's (band, bucket) keys build a Bloom gate
       (:func:`bloom_prune` on ``xxhash64(band, bucket)``) that drops
       ~all index rows at the scan, before the bucket join shuffles
       anything;
    3. surviving index rows equi-join the delta keys on (band, bucket)
       — identical candidate geometry to the batch self-join, so recall
       properties carry over unchanged;
    4. ONLY candidate corpus documents are shingled again for the exact
       Jaccard verify (left-semi join first, so corpus text is read for
       |candidates| documents, not |corpus|).

    False positives from the Bloom gate only widen the join input;
    false negatives are impossible (same-key rows hash to the same bit
    positions), so the result is bit-identical to the index-less,
    gate-less screen — pinned by test against exactly that formulation.

    Two documented degrade edges: (1) the Bloom gate is a no-op past
    ``bloom_prune``'s ``max_keys`` cap (|delta| × bands keys — ~125k
    docs at the defaults): the probe stays CORRECT but becomes an
    ungated index scan + join, a step-function cost change an operator
    sizing batches should know about; (2) the index must have been
    built with the SAME (n, num_perm, bands) geometry — mismatched
    band keys can never match and would silently drop every true
    pair, so the probe asserts against the geometry sidecar the
    writer records and refuses loudly instead.
    """
    import json
    import os

    from pypgsync_spark.operators.dedup import (
        band_bucket_keys,
        doc_tokens,
        hashed_shingles,
        hashed_shingles_from_tokens,
        jaccard,
        minhash_signatures,
        minhash_signatures_from_tokens,
        with_shingles,
    )

    meta_path = os.path.join(index_path, "_lsh_geometry.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        want = {"n": n, "num_perm": num_perm, "bands": bands}
        if meta != want:
            raise ValueError(
                f"LSH index at {index_path} was built with geometry "
                f"{meta}, probe requested {want} — mismatched band "
                "keys silently match nothing; rebuild the index or "
                "probe with its geometry"
            )

    use_kernel = hashed_verify and os.environ.get(
        "SPARK_GRAFT_SHINGLE_KERNEL", "1"
    ) != "0"
    if use_kernel:
        # fused kernels (r15): ONE JVM tokenization of the delta —
        # lazy-checkpointed, materialized by bloom_prune's key count —
        # feeds the signer (bit-identical signatures) and the hashed
        # verify side; corpus candidates get the hashed-shingle kernel
        # directly. Replaces the r14 two-column carry (string shingles
        # + per-element xxhash64 on both verify projections).
        tk_d = doc_tokens(
            delta.select(id_col, text_col), id_col, text_col
        ).localCheckpoint(eager=False)
        sig_d = minhash_signatures_from_tokens(tk_d, n, num_perm)
    else:
        s_d = with_shingles(delta.select(id_col, text_col), text_col, n)
        # feeds both the signature build and the exact verify: lazy
        # checkpoint, materialized by bloom_prune's key count
        s_d = s_d.localCheckpoint(eager=False)
        sig_d = minhash_signatures(s_d, id_col, "shingles", num_perm)
    keys_d = band_bucket_keys(sig_d, num_perm, bands).localCheckpoint(
        eager=False
    )
    # partition-directory inference must not widen the band column:
    # the Bloom gate hashes (band, bucket) SEPARATELY on each side, and
    # xxhash64(int) != xxhash64(long) for the same value — a silent
    # type drift would turn "no false negatives" into "all negatives".
    bk = F.xxhash64(F.col("band").cast("int"), F.col("bucket"))
    idx = spark.read.parquet(index_path).withColumn(
        "band", F.col("band").cast("int")
    )
    gated = bloom_prune(
        idx.withColumn("__bk", bk), keys_d.select(bk.alias("__bk")), "__bk"
    ).drop("__bk")
    cand = (
        gated.select(F.col("id").alias("corpus_id"), "band", "bucket")
        .join(
            keys_d.select(F.col("id").alias("delta_id"), "band", "bucket"),
            on=["band", "bucket"],
        )
        .select("delta_id", "corpus_id")
        .dropDuplicates(["delta_id", "corpus_id"])
        # consumed twice (the corpus-text semi join and the final pair
        # join): lazy checkpoint so the gated index scan runs once
        .localCheckpoint(eager=False)
    )
    corpus_cand = corpus.join(
        cand.select(F.col("corpus_id").alias(id_col)).dropDuplicates(),
        on=id_col,
        how="left_semi",
    )

    def verify_form(sh: Column) -> Column:
        if hashed_verify:
            return F.array_distinct(F.transform(sh, lambda x: F.xxhash64(x)))
        return sh

    if use_kernel:
        sh_c = hashed_shingles(
            corpus_cand.select(id_col, text_col), id_col, text_col, n
        ).select(
            F.col(id_col).alias("corpus_id"), F.col("shingles").alias("sh_c")
        )
        sh_d = hashed_shingles_from_tokens(tk_d, n).select(
            F.col("id").alias("delta_id"), F.col("shingles").alias("sh_d")
        )
    else:
        sh_c = with_shingles(
            corpus_cand.select(id_col, text_col), text_col, n
        ).select(
            F.col(id_col).alias("corpus_id"),
            verify_form(F.col("shingles")).alias("sh_c"),
        )
        sh_d = s_d.select(
            F.col(id_col).alias("delta_id"),
            verify_form(F.col("shingles")).alias("sh_d"),
        )
    return (
        cand.join(sh_d, on="delta_id")
        .join(sh_c, on="corpus_id")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_d"), F.col("sh_c")), 6))
        .filter(F.col("jaccard") > threshold)
        .select("delta_id", "corpus_id", "jaccard")
    )
