"""Deduplication operators for the documents pipeline.

Five dedup families, each a first-class operator designed for 100 TB:

- exact: hash-groupBy on the content (or its md5 fingerprint) — one
  shuffle on the fingerprint, min-id wins (deterministic).
- n-gram Jaccard: banded pairwise shingle-set similarity — exact
  similarity inside candidate bands; quadratic only within a band.
- MinHash + LSH: shingle → k minhashes → b bands of r rows →
  bucket-join candidates → verify with exact Jaccard. The scale path:
  cost is ~(docs × k) hashing + a shuffle per band union, never a
  cross join.
- SimHash: 64-bit weighted token-hash signature; candidates share at
  least one of four 16-bit chunks (pigeonhole: hamming distance ≤ 3
  guarantees a shared chunk), verified by exact hamming distance.
- embedding cosine: near-dup by vector similarity (see similarity.py
  for the kernel).

Hashing uses Spark's ``xxhash64`` with per-permutation seed mixing —
deterministic across runs/partitionings, JVM-side, no Python UDFs.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pypgsync_spark.functions.text import content_fingerprint, tokens, word_shingles

# Minhash universe: Mersenne-31. The universal-hash mix multiplies two
# values < 2^31, keeping every intermediate product < 2^62 — inside
# signed-64 range, so the arithmetic is exact (and ANSI-safe; a 2^61
# prime would overflow the multiply). Collision probability per pair
# per permutation is |shingles|/2^31 ≈ 1e-5 — noise next to the 1/64
# signature resolution.
_MERSENNE_31 = (1 << 31) - 1

# At most one live persisted shingle DataFrame (see minhash_lsh_pairs).
_SHINGLE_CACHE: list[DataFrame] = []


def _perm_coeffs(num_perm: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) pairs for the universal hash family
    h_i(x) = (a_i·x + b_i) mod 2^31-1."""
    import random

    rng = random.Random(seed)
    a = [rng.randrange(1, _MERSENNE_31) for _ in range(num_perm)]
    b = [rng.randrange(0, _MERSENNE_31) for _ in range(num_perm)]
    return a, b


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """Keep one row per distinct content: the row with the minimum id
    (deterministic, oracle-friendly — ``dropDuplicates`` would keep an
    arbitrary row). Shuffles once on the fingerprint, not the full text."""
    fp = content_fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 12,
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup — the C4/RefinedWeb
    curation pass: explode every document into paragraphs, keep the
    FIRST occurrence of each distinct paragraph corpus-wide (min
    ``(id, para_idx)`` wins — the same deterministic keep-first-by-key
    merge semantic as document-level dedup, reference
    session.py:135-151, applied at sub-document grain), and reassemble
    each document from its surviving paragraphs.

    The fixture corpus has no newlines, so "paragraph" is synthesized
    deterministically: consecutive ``para_words``-token chunks of the
    lower-cased whitespace tokenization (last chunk short; a document
    always yields at least one paragraph). Real corpora would swap the
    chunker for ``split(text, '\\n')`` — every downstream stage is
    chunker-agnostic.

    Returns one row per input document: ``(id, n_paras, kept_paras,
    removed_frac, clean_text)`` where ``clean_text`` is the surviving
    paragraphs re-joined in document order (empty string when every
    paragraph first occurred in an earlier document).

    Scale shape — exactly two shuffles, both on high-cardinality keys:
    (1) the keep-first window partitions by the paragraph string
    itself (hash-partitioned by Spark; paragraph text must ride this
    shuffle anyway because reassembly needs it on the far side, so a
    separate fingerprint column would only widen the row), and (2) the
    per-document reassembly groupBy on ``id``. Paragraph groups are
    tiny (duplicate multiplicity) and document groups are bounded by
    document length, so neither shuffle skews. Everything else is
    map-side: tokenize → chunk-index explode → slice/join, all
    whole-stage-codegen builtins, no HOF lambda captures anything
    beyond bound variables (the reassembly ``transform`` only projects
    a struct field).
    """
    k = para_words
    toks = df.select(id_col, tokens(F.col(text_col)).alias("__ws"))
    chunked = toks.select(
        id_col,
        "__ws",
        F.greatest(F.ceil(F.size("__ws") / F.lit(k)), F.lit(1))
        .cast("int")
        .alias("__np"),
    )
    paras = chunked.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.col("__np") - 1)).alias("__para_idx"),
        "__ws",
    ).select(
        id_col,
        "__para_idx",
        F.array_join(F.slice("__ws", F.col("__para_idx") * k + 1, k), " ").alias(
            "__para"
        ),
    )
    w = Window.partitionBy("__para").orderBy(id_col, "__para_idx")
    flagged = paras.withColumn("__rn", F.row_number().over(w))
    kept = F.col("__rn") == 1
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(kept.cast("int")).cast("bigint").alias("kept_paras"),
            F.sort_array(
                F.collect_list(F.when(kept, F.struct("__para_idx", "__para")))
            ).alias("__kp"),
        )
        .select(
            id_col,
            "n_paras",
            "kept_paras",
            F.round(F.lit(1.0) - F.col("kept_paras") / F.col("n_paras"), 6).alias(
                "removed_frac"
            ),
            F.array_join(
                F.transform("__kp", lambda x: x["__para"]), " "
            ).alias("clean_text"),
        )
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles"
) -> DataFrame:
    """Attach the distinct-shingle array column.

    Spreads the input across the session's default parallelism first
    IF it arrives under-split: shingle construction is interpreted
    higher-order-function work (the expensive part of every downstream
    dedup), and a small parquet input is a single split — without the
    shuffle it runs on one core. A many-split input (any real corpus)
    skips the repartition entirely: an explicit repartition() is a
    full round-robin shuffle of the raw text that AQE does NOT elide,
    and at 100 TB that is an avoidable extra pass over the corpus.
    """
    return spread_if_underpartitioned(df).withColumn(
        out, word_shingles(tokens(F.col(text_col)), n)
    )


def spread_if_underpartitioned(df: DataFrame) -> DataFrame:
    """``df.repartition(defaultParallelism)`` only when the input has
    fewer splits than cores — the single-file fixture case. Checking
    costs one plan→RDD conversion (no job)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __tk) — JVM-side tokenization, spread across cores.

    The split stays in the JVM (one codegen'd regex pass, bit-identical
    to :func:`functions.text.tokens` because it IS that expression);
    the token ARRAYS then cross the Arrow boundary into the fused
    shingle kernels below. Keeping tokenization out of Python is what
    removes the Java-vs-Python regex/lowercase parity question the r8
    md5/sqrt lesson warns about — the kernels only ever re-assemble
    tokens the JVM produced.
    """
    return spread_if_underpartitioned(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__tk")
    )


def _md5_u64(s: str) -> int:
    """Top 8 bytes of md5 as an unsigned 64-bit int — the kernels'
    string-hash primitive (hashlib runs at C speed; no xxhash module
    exists in this environment and none is needed: these hashes never
    leave Spark, so any deterministic 64-bit hash serves)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _smix64(z):
    """splitmix64 finalizer over a numpy uint64 array — a bijection on
    u64, used to combine the n token hashes of a shingle window."""
    z = (z ^ (z >> 30)) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> 27)) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> 31)


def _flat_tokens(tk_col):
    """(lengths, offsets, flat) for a list<string> Arrow column: null
    entries contribute length 0 so offsets stay aligned with
    ``pc.list_flatten`` (which skips null slots)."""
    import pyarrow.compute as pc

    lengths = pc.fill_null(pc.list_value_length(tk_col), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    flat = pc.list_flatten(tk_col)
    return lengths, offsets, flat


def hashed_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    out: str = "shingles",
) -> DataFrame:
    """(id, distinct 64-bit shingle hashes) — the fused replacement for
    ``with_shingles`` + ``array_distinct(transform(·, xxhash64))`` on
    every ``hashed_verify`` path (r15; guide §4.2, the r14 minhash
    kernel precedent).

    Jaccard, prefix ranks and set sizes depend only on shingle
    IDENTITY, so any injective-enough 64-bit hash of the shingle
    serves (collision odds ~|sh|²/2⁶⁴, the same accepted class as the
    r14 xxhash64 hashed-verify). The old chain evaluated the shingle
    construction in Spark's interpreted HOF evaluator — measured
    4.3 s of the 5000-doc fixture's CPU, the largest single block in
    the d-family (r15 profile) — and then hashed the strings anyway.
    Here the JVM only tokenizes (:func:`doc_tokens`); one map-only
    ``mapInArrow`` kernel then computes, fully vectorized: one md5
    per DISTINCT token (Arrow ``dictionary_encode``; the token
    vocabulary is tiny next to the token stream), a splitmix64
    window combine over the per-doc token-hash stream, and a per-doc
    sort-unique. Shingle equality is preserved exactly: tokens carry
    no whitespace, so the n-token window (the join-with-space string)
    and the token tuple determine each other, and equal tuples hash
    equal. Docs shorter than ``n`` tokens keep the short-slice
    semantics (ONE shingle = all tokens joined, hashed via md5 so
    equal short docs collide exactly); NULL token arrays yield NULL,
    as ``word_shingles`` does.
    """
    return hashed_shingles_from_tokens(
        doc_tokens(df, id_col, text_col), n, out
    ).withColumnRenamed("id", id_col)


def hashed_shingles_from_tokens(
    tk_df: DataFrame, n: int = 3, out: str = "shingles"
) -> DataFrame:
    """:func:`hashed_shingles` over a pre-tokenized (id, __tk) frame —
    callers that feed several kernels from one token pass (d3's signer
    + verify, d17's delta side) persist the token frame once and call
    the ``_from_tokens`` forms."""
    import pyarrow as pa

    from pyspark.sql import types as T

    df = tk_df
    id_field = df.schema["id"]

    def kernel(batches):
        import hashlib

        md5 = hashlib.md5

        def md5_u64(s: str) -> int:
            return int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big")

        import pyarrow.compute as pc

        for batch in batches:
            ids = batch.column("id")
            tk = batch.column("__tk")
            ndocs = len(ids)
            valid = tk.is_valid().to_numpy(zero_copy_only=False)
            lengths, offsets, flat = _flat_tokens(tk)
            # one md5 per DISTINCT token in the batch
            enc = pc.dictionary_encode(flat)
            vocab = enc.dictionary.to_pylist()
            uh = np.fromiter(
                (md5_u64(t) for t in vocab), dtype=np.uint64, count=len(vocab)
            )
            idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            h_flat = uh[idx] if len(idx) else np.empty(0, dtype=np.uint64)
            # sliding n-window combine over the whole flat stream;
            # windows crossing doc boundaries are simply never selected
            total = len(h_flat)
            if total >= n:
                acc = _smix64(h_flat[: total - n + 1])
                for j in range(1, n):
                    acc = _smix64(acc ^ h_flat[j : total - n + j + 1])
            else:
                acc = np.empty(0, dtype=np.uint64)
            long_doc = valid & (lengths >= n)
            wc = np.where(long_doc, lengths - (n - 1), 0)
            doc_of_w = np.repeat(np.arange(ndocs), wc)
            within = np.arange(wc.sum()) - np.repeat(np.cumsum(wc) - wc, wc)
            gpos = offsets[:-1][doc_of_w] + within
            acc_sel = acc[gpos]
            # per-doc distinct: one global lexsort, drop adjacent dups
            order = np.lexsort((acc_sel, doc_of_w))
            d_sorted = doc_of_w[order]
            a_sorted = acc_sel[order]
            keep = np.ones(len(order), dtype=bool)
            if len(order) > 1:
                keep[1:] = (d_sorted[1:] != d_sorted[:-1]) | (
                    a_sorted[1:] != a_sorted[:-1]
                )
            d_kept = d_sorted[keep]
            a_kept = a_sorted[keep]
            counts = np.bincount(d_kept, minlength=ndocs).astype(np.int64)
            # short docs (valid, < n tokens): ONE shingle = all tokens
            # joined — hashed from the STRING so equal short docs match
            short_idx = np.nonzero(valid & (lengths < n))[0]
            short_hash = {}
            for i in short_idx:
                s = " ".join(
                    flat.slice(offsets[i], lengths[i]).to_pylist()
                )
                short_hash[i] = md5_u64(s)
                counts[i] = 1
            # assemble per-doc value runs in doc order: d_kept is
            # sorted, so each doc's survivors are contiguous
            out_offsets = np.concatenate(([0], np.cumsum(counts)))
            values = np.zeros(out_offsets[-1], dtype=np.uint64)
            run_start = np.searchsorted(d_kept, np.arange(ndocs))
            within_run = np.arange(len(d_kept)) - run_start[d_kept]
            values[out_offsets[d_kept] + within_run] = a_kept
            for i, h in short_hash.items():
                values[out_offsets[i]] = h
            off_list = [None if not valid[i] else int(out_offsets[i]) for i in range(ndocs)]
            off_list.append(int(out_offsets[-1]))
            # null docs: a null offset marks the list entry null; their
            # counts are 0 so the values layout is unaffected
            shingle_arr = pa.ListArray.from_arrays(
                pa.array(off_list, type=pa.int32()),
                pa.array(values.view(np.int64), type=pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, shingle_arr], names=["id", out]
            )

    schema = T.StructType(
        [
            T.StructField("id", id_field.dataType, id_field.nullable),
            T.StructField(out, T.ArrayType(T.LongType())),
        ]
    )
    return df.mapInArrow(kernel, schema)


def ppjoin_prefixes(
    ex: DataFrame,
    freq: DataFrame,
    threshold: float,
    id_col: str = "id",
    sz_col: str = "sz",
    sh_col: str = "sh",
) -> DataFrame:
    """AllPairs/PPJoin prefix build — THE shared numerically/logically
    sensitive kernel of every exact near-dup join here (r10 review: it
    had drifted into two inline copies, the forked-kernel shape
    similarity.py's GEMM note warns about).

    Given the exploded ``(id, sz, sh)`` stream and a ``(sh, __freq)``
    canonical-frequency table, keep each doc's
    ``(size − ⌈θ·size⌉ + 1)``-prefix under the one total order
    (ascending frequency, ties by shingle value — rarest first, so
    distinct documents rarely collide on their prefixes).

    Prefix-filter lemma: J(A,B) > θ ⟹ |A∩B| > θ·max(|A|,|B|), so
    overlap t ≥ ⌈θ·|A|⌉ — and two sets sorted by one total order with
    overlap ≥ t must collide within their (size − t + 1)-prefixes.
    Partitioning the rank window by doc id is skew-free (per-doc
    shingle counts are bounded by doc length).

    Output carries ``__rk`` — the shingle's 1-based rank within the
    doc's FULL set under the canonical order — so candidate joins can
    apply :func:`ppjoin_positional_filter` (r14 optimization round).
    """
    w = Window.partitionBy(id_col).orderBy(
        F.col("__freq").asc(), F.col(sh_col).asc()
    )
    return (
        ex.join(freq, on=sh_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(
            F.col("__rk")
            <= F.col(sz_col) - F.ceil(F.lit(threshold) * F.col(sz_col)) + 1
        )
        .select(id_col, sz_col, sh_col, "__rk")
    )


# Degrade cap for the collected PPJoin frequency table (r15, guide
# §3.2's "broadcast less" + the r14 verdict's own suggestion): at or
# under this many DISTINCT shingles the canonical-frequency map is
# collected once (Arrow toPandas — the bloom_prune 2M-key driver-
# boundedness class, ~32 MB of (key, freq) int64 pairs) and broadcast
# into a map-side prefix kernel, removing the freq join and the
# per-doc rank window's shuffle outright. Past the cap the classic
# explode → freq join → window chain runs unchanged — that path's
# partial aggregation and AQE skew-join handling are what a 100 TB
# vocabulary needs, so the cap is a data-size decision, never a
# core-count one.
PPJOIN_FREQ_BROADCAST_MAX = int(
    os.environ.get("SPARK_GRAFT_PPJOIN_FREQ_MAX", "2000000")
)


def _collect_freq_if_small(freq: DataFrame, cap: int):
    """(sorted keys, freqs) numpy pair when the frequency table holds
    ≤ ``cap`` rows, else None. One Arrow-path action: ``limit(cap+1)``
    either returns the WHOLE table (fewer rows than the limit ⟹
    nothing was cut) or proves it exceeds the cap."""
    if cap <= 0:
        return None  # disabled: never spend the probe job
    pdf = freq.limit(cap + 1).toPandas()
    if len(pdf) > cap:
        return None
    keys = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
    vals = pdf.iloc[:, 1].to_numpy(dtype=np.int64)
    order = np.argsort(keys)
    return keys[order], vals[order]


def ppjoin_prefixes_bcast(
    s: DataFrame,
    freq_np,
    threshold: float,
    id_col: str = "id",
    sh_col: str = "shingles",
) -> DataFrame:
    """Map-side prefix build: same (id, sz, sh, __rk) rows as
    :func:`ppjoin_prefixes`, computed per document inside one
    ``mapInArrow`` kernel against the broadcast frequency map — no
    explode, no freq join, no rank-window shuffle (the shingle array
    is already a row; ranking within it never needed a shuffle). The
    canonical order is bit-the-same: ascending frequency, ties by
    shingle value, ranks dense from 1. Only the ≤-cap path uses this
    (see :data:`PPJOIN_FREQ_BROADCAST_MAX`)."""
    import pyarrow as pa

    from pyspark.sql import types as T

    spark = s.sparkSession
    bc = spark.sparkContext.broadcast(freq_np)
    id_field = s.schema[id_col]
    schema = T.StructType(
        [
            T.StructField("id", id_field.dataType, id_field.nullable),
            T.StructField("sz", T.IntegerType()),
            T.StructField("sh", T.LongType()),
            T.StructField("__rk", T.IntegerType()),
        ]
    )
    theta = float(threshold)

    def kernel(batches):
        keys, freqs = bc.value
        for batch in batches:
            ids = batch.column("id")
            sh = batch.column("__sh")
            ndocs = len(ids)
            valid = sh.is_valid().to_numpy(zero_copy_only=False)
            lengths, offsets, flat = _flat_tokens(sh)
            vals = flat.to_numpy(zero_copy_only=False).astype(np.int64)
            ki = np.searchsorted(keys, vals)
            f = freqs[ki]  # every shingle is in the map by construction
            doc_of = np.repeat(np.arange(ndocs), lengths)
            # doc_of is the (already grouped) primary key, so the
            # sorted doc sequence equals doc_of itself and rank within
            # doc = sorted position − the doc's run start + 1
            order = np.lexsort((vals, f, doc_of))
            run_start = np.searchsorted(doc_of, np.arange(ndocs))
            rk = (np.arange(len(doc_of)) - run_start[doc_of]) + 1
            # prefix filter: rk <= sz - ceil(theta*sz) + 1
            sz = lengths[doc_of]
            k_pref = sz - np.ceil(theta * sz).astype(np.int64) + 1
            keep = (rk <= k_pref) & valid[doc_of] & (sz > 0)
            sel = order[keep]
            out_ids = ids.take(pa.array(doc_of[sel], type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [
                    out_ids,
                    pa.array(sz[keep].astype(np.int32), type=pa.int32()),
                    pa.array(vals[sel], type=pa.int64()),
                    pa.array(rk[keep].astype(np.int32), type=pa.int32()),
                ],
                names=["id", "sz", "sh", "__rk"],
            )

    return (
        s.select(F.col(id_col).alias("id"), F.col(sh_col).alias("__sh"))
        .mapInArrow(kernel, schema)
    )


def ppjoin_positional_filter(
    sz_a: str, sz_b: str, min_rk_a: str, min_rk_b: str, threshold: float
) -> Column:
    """PPJoin positional filter (Xiao et al., WWW'08), applied per
    candidate PAIR after aggregating the matched prefix rows to
    ``min(__rk)`` per side.

    Let w be the pair's minimum-canonical-order common prefix shingle,
    at full-set ranks (i, j). No common shingle precedes w: an earlier
    common shingle u would sit at ranks < i and < j, hence inside BOTH
    prefixes (prefixes are rank-prefixes), contradicting w's
    minimality — and because one shared total order ranks every doc's
    set, ``min(rank_a)`` and ``min(rank_b)`` over the matched rows are
    achieved at that same w. So the overlap is at most
    ``o_ub = 1 + min(|A| − i, |B| − j)``, and the pair can only reach
    jaccard > θ when ``o_ub·(1+θ) > θ·(|A|+|B|)`` (from
    J = o/(|A|+|B|−o)). The ε guards float rounding toward UNDER-
    pruning: a kept non-qualifying candidate just gets vetoed by the
    exact verify, while over-pruning would lose a true pair.
    """
    o_ub = F.lit(1) + F.least(
        F.col(sz_a) - F.col(min_rk_a), F.col(sz_b) - F.col(min_rk_b)
    )
    return o_ub * F.lit(1.0 + threshold) > F.lit(threshold) * (
        F.col(sz_a) + F.col(sz_b)
    ) - F.lit(1e-9)


def ppjoin_length_filter(sz_a: str, sz_b: str, threshold: float) -> Column:
    """PPJoin length filter: J ≤ min/max ⟹ any qualifying pair has
    θ·|A| < |B| AND θ·|B| < |A| — applied inside the candidate
    equi-join to prune cross-size collisions."""
    return (F.col(sz_a) * threshold < F.col(sz_b)) & (
        F.col(sz_b) * threshold < F.col(sz_a)
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays.

    The union size is arithmetic — |a| + |b| − |a∩b| — which is exact
    precisely because the inputs are distinct-element arrays (the
    documented precondition): one hash-set pass per pair instead of
    two, measured ~20% off the verify stage that dominates every
    PPJoin-family query."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / F.greatest(union, F.lit(1))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.3,
    blocking: str | None = "prefix",
    hashed_verify: bool = True,
    materialize_shingles: bool = False,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) above ``threshold`` — exact AND
    complete: every qualifying pair is returned.

    ``blocking="prefix"`` (default — the 100 TB path) is the
    AllPairs/PPJoin prefix filter (Bayardo et al. WWW'07; Vernica et
    al. SIGMOD'10): sort every doc's shingles by one global canonical
    order (ascending corpus frequency, ties by value — rarest first),
    and keep each doc's first ``|x| − ⌈θ·|x|⌉ + 1`` shingles as its
    *prefix*. Any pair with jaccard > θ has overlap ≥ ⌈θ·max(|A|,|B|)⌉,
    and two sets sorted by the same total order whose overlap is ≥ t
    must collide within their (size − t + 1)-prefixes — so the
    equi-join on prefix shingles finds every qualifying pair. The
    PPJoin length filter (θ·|A| < |B| and θ·|B| < |A|, from
    jaccard ≤ min/max) prunes cross-size collisions inside the join,
    and the exact Jaccard verify does the rest. Unlike size blocking
    the candidate count is driven by *content* (shared rare shingles),
    not by the length histogram, so a corpus of near-uniform doc
    lengths no longer degenerates to a quadratic bucket — distinct
    documents rarely share their rarest shingles.

    ``blocking="size"`` prunes candidates with a content-derived key
    that provably loses nothing: jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|),
    so any pair above θ has distinct-shingle counts within a factor
    1/θ of each other. Bucket docs by floor(log_{1/θ}|shingles|); a
    qualifying pair's buckets differ by at most 1, so comparing same-
    and adjacent-bucket docs (left side explodes to {b−1,b,b+1}, right
    side keeps its own bucket — an equi-join, never a nested-loop
    range join) is exhaustive. This replaces the round-1 id-adjacency
    stand-in, which silently missed distant-id duplicates. Each
    qualifying pair matches exactly once after the id_a < id_b filter
    (only the smaller-id orientation survives, and the exploded side
    meets a given right row at one key), so no dedup pass is needed.
    Worst case (all docs the same length) is quadratic within a
    bucket — kept as the simpler option for corpora with a spread
    length histogram.

    ``blocking=None`` does the raw triangular cross join (tests/tiny
    inputs only).

    ``hashed_verify`` replaces each shingle string with its xxhash64
    before the pairwise intersections: Jaccard depends only on set
    sizes, which 64-bit hashing preserves (collision odds ~|sh|²/2⁶⁴),
    and long-array intersects run ~2× faster than string-array ones.
    """
    import math

    use_kernel = hashed_verify and os.environ.get(
        "SPARK_GRAFT_SHINGLE_KERNEL", "1"
    ) != "0"
    if use_kernel:
        # fused Arrow kernel (r15): tokenize in the JVM, build the
        # distinct hashed shingle sets vectorized — replaces the
        # interpreted-HOF shingling + per-element xxhash64 chain
        # (guide §4.2; bit-equal Jaccard pinned by test). The env
        # switch exists for A/B measurement and as a production guard;
        # both paths return identical rows (pinned by test).
        s = hashed_shingles(df, id_col, text_col, n)
    else:
        s = with_shingles(df.select(id_col, text_col), text_col, n)
        if hashed_verify:
            s = s.withColumn(
                "shingles",
                F.array_distinct(
                    F.transform("shingles", lambda x: F.xxhash64(x))
                ),
            )
    if materialize_shingles:
        # The shingle table feeds the prefix build once and the verify
        # join twice; without materialization each branch re-runs the
        # shingling over the full corpus (measured 2× end-to-end on
        # the fixture). localCheckpoint stores at MEMORY_AND_DISK, so
        # at scale it spills to local disk rather than OOM; the trade
        # is lineage truncation (an executor loss mid-query fails the
        # job instead of recomputing) — opt-in for that reason. LAZY
        # as of r15: the frequency probe (or, on the join path, the
        # first branch of the main action) materializes it as a side
        # effect — eager=True paid one extra driver-barrier job per
        # query for blocks the very next action would store anyway
        # (the r8 lazy-checkpoint rule).
        s = s.localCheckpoint(eager=False)
    if blocking is None:
        a = s.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
        b = s.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    elif blocking == "prefix":
        if not 0.0 < threshold < 1.0:
            raise ValueError("prefix blocking needs 0 < threshold < 1")
        sp = s.filter(F.size("shingles") > 0)
        # Global canonical order: ascending corpus frequency, ties by
        # shingle value. Rarest-first prefixes minimize candidates —
        # distinct documents rarely share their rarest shingles.
        ex = sp.select(
            F.col(id_col).alias("id"),
            F.size("shingles").alias("sz"),
            F.explode("shingles").alias("sh"),
        )
        freq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("__freq"))
        freq_np = (
            _collect_freq_if_small(freq, PPJOIN_FREQ_BROADCAST_MAX)
            if hashed_verify
            else None
        )
        if freq_np is not None:
            # vocabulary fits the broadcast cap: the prefix table is a
            # map-side kernel over the shingle rows — no freq join, no
            # rank-window shuffle (r15; guide §2.4). Rows identical to
            # ppjoin_prefixes by construction (pinned by test).
            pref = ppjoin_prefixes_bcast(sp, freq_np, threshold, id_col)
            if materialize_shingles:
                # both candidate-join sides reference pref — same
                # storage-vs-recompute trade as the join path below
                pref = pref.localCheckpoint(eager=False)
        else:
            # shared AllPairs/PPJoin kernel — see ppjoin_prefixes /
            # ppjoin_length_filter for the lemmas. This is the 100 TB
            # path: partial aggregation + AQE skew handling on the
            # freq join, no driver-side vocabulary.
            pref = ppjoin_prefixes(ex, freq, threshold)
            if materialize_shingles:
                # BOTH sides of the candidate self-join below
                # reference pref, and Spark plans the two references
                # as two full copies of the explode → freq aggregate →
                # freq join → rank window chain (r14 plan audit: zero
                # ReusedExchange, Window appears twice, ~20 s of the
                # query's ~45 s task CPU at sf0.1 was the second
                # copy). A lazy localCheckpoint computes the prefix
                # table once — the same storage-vs-recompute trade as
                # the shingle checkpoint above (guide §5.2; the
                # d10/d11 winnow-pair-index precedent), so it rides
                # the same opt-in flag.
                pref = pref.localCheckpoint(eager=False)
        # candidate dedup doubles as the positional-filter aggregation:
        # min(__rk) per side lands on the pair's min-order common
        # prefix shingle (see ppjoin_positional_filter), pruning
        # can't-qualify pairs BEFORE the shingle-array verify join —
        # same shuffle as the old dropDuplicates, strictly fewer rows
        # surviving it (r14: 596k → fewer candidates for 256 pairs on
        # the sf0.1 fixture at θ=0.3)
        cand = (
            pref.select(
                F.col("id").alias("id_a"),
                F.col("sz").alias("sz_a"),
                F.col("__rk").alias("__rk_a"),
                "sh",
            )
            .join(
                pref.select(
                    F.col("id").alias("id_b"),
                    F.col("sz").alias("sz_b"),
                    F.col("__rk").alias("__rk_b"),
                    "sh",
                ),
                on="sh",
            )
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & ppjoin_length_filter("sz_a", "sz_b", threshold)
            )
            .groupBy("id_a", "id_b")
            .agg(
                F.min("__rk_a").alias("__ra"),
                F.min("__rk_b").alias("__rb"),
                F.first("sz_a").alias("sz_a"),
                F.first("sz_b").alias("sz_b"),
            )
            .filter(
                ppjoin_positional_filter("sz_a", "sz_b", "__ra", "__rb", threshold)
            )
            .select("id_a", "id_b")
        )
        sh_tbl = sp.select(F.col(id_col).alias("id"), "shingles")
        joined = cand.join(
            sh_tbl.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
            on="id_a",
        ).join(
            sh_tbl.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
            on="id_b",
        )
    elif blocking == "size":
        if not 0.0 < threshold < 1.0:
            raise ValueError("size blocking needs 0 < threshold < 1")
        base = math.log(1.0 / threshold)
        sb = s.filter(F.size("shingles") > 0).withColumn(
            "__bkt",
            F.floor(F.log(F.size("shingles").cast("double")) / F.lit(base)).cast("long"),
        )
        a = sb.select(
            F.col(id_col).alias("id_a"),
            F.col("shingles").alias("sh_a"),
            F.explode(
                F.array(F.col("__bkt") - 1, F.col("__bkt"), F.col("__bkt") + 1)
            ).alias("__blk"),
        )
        b = sb.select(
            F.col(id_col).alias("id_b"),
            F.col("shingles").alias("sh_b"),
            F.col("__bkt").alias("__blk"),
        )
        joined = a.join(b, on="__blk").filter(F.col("id_a") < F.col("id_b"))
    else:
        raise ValueError(f"unknown blocking mode: {blocking!r}")
    return (
        joined.withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") > threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """(id, sig) — :func:`minhash_signatures` fused with the shingle
    construction (r15; guide §4.2). BIT-IDENTICAL signatures to
    ``minhash_signatures(with_shingles(df), ...)`` — pinned by test —
    but the shingle strings are assembled by Arrow's vectorized
    ``binary_join_element_wise`` over the JVM-tokenized stream
    (:func:`doc_tokens`) instead of Spark's interpreted HOF evaluator,
    which was the single largest CPU block left in the d-family (r15
    profile: 4.3 s of the sf0.1 fixture's shingle+checkpoint stage).

    The md5-top-60-bit base hash and the seed-42 permutation family
    are byte-for-byte the legacy kernel's (and the DuckDB oracle's).
    Window strings are hashed WITHOUT per-doc dedup — a min over a
    multiset equals the min over its support, so signatures are
    unchanged. Docs with NULL token arrays produce no row, exactly as
    the legacy kernel skipped NULL/empty shingle sets.
    """
    return minhash_signatures_from_tokens(
        doc_tokens(df, id_col, text_col), n, num_perm
    )


def minhash_signatures_from_tokens(
    tk_df: DataFrame, n: int = 3, num_perm: int = 64
) -> DataFrame:
    """:func:`minhash_signatures_text` over a pre-tokenized (id, __tk)
    frame (see :func:`hashed_shingles_from_tokens`)."""
    import pyarrow as pa

    from pyspark.sql import types as T

    df = tk_df
    a, b = _perm_coeffs(num_perm)
    a_arr = np.asarray(a, dtype=np.int64)
    b_arr = np.asarray(b, dtype=np.int64)
    id_field = df.schema["id"]
    schema = T.StructType(
        [
            T.StructField("id", id_field.dataType, id_field.nullable),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def kernel(batches):
        import hashlib

        import pyarrow.compute as pc

        md5 = hashlib.md5

        def h60(s: str) -> int:
            return int(md5(s.encode("utf-8")).hexdigest()[:15], 16) % _MERSENNE_31

        for batch in batches:
            ids = batch.column("id")
            tk = batch.column("__tk")
            ndocs = len(ids)
            valid = tk.is_valid().to_numpy(zero_copy_only=False)
            lengths, offsets, flat = _flat_tokens(tk)
            total = len(flat)
            # all n-token window strings over the flat stream (windows
            # crossing doc boundaries exist but are never selected)
            if total >= n:
                parts = [flat.slice(j, total - n + 1) for j in range(n)]
                win = pc.binary_join_element_wise(*parts, " ")
            else:
                win = pa.array([], type=flat.type)
            long_doc = valid & (lengths >= n)
            wc = np.where(long_doc, lengths - (n - 1), 0)
            doc_of_w = np.repeat(np.arange(ndocs), wc)
            within = np.arange(wc.sum()) - np.repeat(np.cumsum(wc) - wc, wc)
            gpos = offsets[:-1][doc_of_w] + within
            sel = pc.take(win, pa.array(gpos, type=pa.int64())).to_pylist()
            counts = wc.copy()
            short_idx = np.nonzero(valid & (lengths < n))[0]
            counts[short_idx] = 1
            out_offsets = np.concatenate(([0], np.cumsum(counts)))
            h_all = np.zeros(out_offsets[-1], dtype=np.int64)
            run_start = np.searchsorted(doc_of_w, np.arange(ndocs))
            pos = out_offsets[doc_of_w] + (np.arange(len(doc_of_w)) - run_start[doc_of_w])
            h_all[pos] = np.fromiter(
                (h60(s) for s in sel), dtype=np.int64, count=len(sel)
            )
            for i in short_idx:
                s = " ".join(flat.slice(offsets[i], lengths[i]).to_pylist())
                h_all[out_offsets[i]] = h60(s)
            doc_sel = np.nonzero(counts > 0)[0]
            if len(doc_sel) == 0:
                continue
            starts = out_offsets[doc_sel]
            sig = np.empty((len(doc_sel), num_perm), dtype=np.int64)
            for p in range(num_perm):
                sig[:, p] = np.minimum.reduceat(
                    (h_all * a_arr[p] + b_arr[p]) % _MERSENNE_31, starts
                )
            sig_arr = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(len(doc_sel) + 1, dtype=np.int64) * num_perm,
                    type=pa.int32(),
                ),
                pa.array(sig.ravel(), type=pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(doc_sel, type=pa.int64())), sig_arr],
                names=["id", "sig"],
            )

    return df.mapInArrow(kernel, schema)


def minhash_signatures(
    df: DataFrame, id_col: str, shingle_col: str, num_perm: int
) -> DataFrame:
    """(id, sig: array<long>) — minhash signature per document.

    Permutation i = min over shingles of the universal hash
    ``(a_i · h(shingle) + b_i) mod 2^31-1`` — ONE string hash per
    shingle, then ``num_perm`` multiply-adds (the classic Broder-style
    permutation family). Hashing the string once instead of
    per-permutation cuts the dominant cost 64×.

    The base hash is the top 60 bits of md5 (hex-parsed), not
    xxhash64: md5 is the one deterministic hash BOTH engines share
    bit-for-bit, which is what lets d3 carry an exact DuckDB oracle
    (r11; DuckDB side: ``CAST('0x' || substr(md5(s),1,15) AS
    BIGINT)``). md5 costs ~2-3× xxhash64 per shingle, still one hash
    per shingle — verifiability across engines is worth the constant.

    Physical shape (r14 optimization round): one Arrow-batched
    ``mapInPandas`` kernel — per document, hash each shingle once
    (``hashlib.md5`` top-60-bits, BIT-IDENTICAL to the previous
    ``conv(substring(md5(s),1,15),16,10)`` expression and to the
    DuckDB oracle's ``CAST('0x'||substr(md5(s),1,15) AS BIGINT)``),
    then one numpy broadcast computes all ``num_perm`` universal
    hashes and their column-mins (every intermediate ``a·h + b`` is
    < 2^62 — exact in int64, same arithmetic as the old codegen
    columns). This replaces the r11 explode → 64 expression columns →
    groupBy(64 mins) shape: the explode inflated the corpus
    |shingles|-fold through 64-column rows and paid a (map-combined)
    shuffle for the per-doc mins, measured ~1.0 s of the 1.4 s
    signature stage at sf0.1 — the kernel is map-only (no shuffle at
    all), ships only (id, shingles) across the Arrow boundary, and
    runs the fold at C speed (guide §4.2; the r13 ivf_assign kernel
    precedent). Docs with NULL/empty shingle sets produce no row,
    exactly as explode did. Bit-equality against the legacy
    formulation is pinned by test.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    a, b = _perm_coeffs(num_perm)
    a_arr = np.asarray(a, dtype=np.int64).reshape(1, -1)
    b_arr = np.asarray(b, dtype=np.int64).reshape(1, -1)
    id_field = T.StructField(
        "id", df.schema[id_col].dataType, df.schema[id_col].nullable
    )
    schema = T.StructType(
        [id_field, T.StructField("sig", T.ArrayType(T.LongType()))]
    )

    def sign(batches):
        import hashlib

        md5 = hashlib.md5
        for pdf in batches:
            ids, sigs = [], []
            for i, sh in zip(pdf["id"], pdf["__sh"]):
                if sh is None or len(sh) == 0:
                    continue
                h = np.fromiter(
                    (
                        int(md5(s.encode("utf-8")).hexdigest()[:15], 16)
                        % _MERSENNE_31
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                m = ((h.reshape(-1, 1) * a_arr + b_arr) % _MERSENNE_31).min(
                    axis=0
                )
                ids.append(i)
                sigs.append(m.tolist())
            if ids:  # an all-filtered batch has no typed columns to emit
                yield pd.DataFrame({"id": ids, "sig": sigs})

    return df.select(
        F.col(id_col).alias("id"), F.col(shingle_col).alias("__sh")
    ).mapInPandas(sign, schema)


def band_bucket_keys(sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(id, band, bucket) — one lean LSH key row per (document, band).

    THE one copy of the minhash band geometry (the mm9/mm10
    ``dhash_band_explode`` precedent): each of ``bands`` bands hashes
    its ``num_perm // bands`` signature slots through ``xxhash64`` into
    a bucket key, and the key rows carry ONLY (band, bucket, id) —
    signature arrays must not ride the ×bands explode or any downstream
    bucket shuffle. Shared by the batch self-join
    (:func:`minhash_lsh_pairs`) and the materialized index
    (:func:`lsh_band_index_write` / the incremental screen), so the
    index a corpus build writes is bit-compatible with the keys a later
    delta probe computes.
    """
    if num_perm % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    r = num_perm // bands
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(
                *[F.element_at(F.col("sig"), bi * r + j + 1) for j in range(r)]
            ).alias("bucket"),
        )
        for bi in range(bands)
    ]
    return sig.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )


def lsh_band_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> None:
    """Materialize the corpus's MinHash-LSH band index: shingle →
    signature → :func:`band_bucket_keys`, written ``partitionBy(band)``
    with rows range-clustered and sorted on (band, bucket) so parquet
    row-group min/max statistics can skip bucket ranges a probe never
    touches.

    This is the write-once half of the incremental near-dup contract
    (the v15 materialized-ANN-index precedent applied to dedup): the
    expensive part of LSH screening — one md5 per shingle plus
    ``num_perm`` multiply-adds over the WHOLE corpus — runs once per
    corpus version here, and every subsequent ingest batch pays only
    its own delta-proportional signature cost before probing these
    lean (id, band, bucket) rows. At 100 TB the index is ~bands rows
    of three integers per document — orders of magnitude under the
    corpus. The (band, bucket) clustering keeps each bucket's rows in
    contiguous row groups; the IMPLEMENTED probe path gates rows with
    a Bloom expression evaluated at the scan (no band/bucket predicate
    is pushed, so no partition or row-group is skipped today — the
    sorted layout is what a future IN-list/DPP probe would need, and
    what keeps the bucket join's shuffle input clustered).
    """
    import json
    import os

    if os.environ.get("SPARK_GRAFT_SHINGLE_KERNEL", "1") != "0":
        # fused signer (r15): tokenize → shingle strings → md5 → mins
        # in one Arrow kernel, bit-identical signatures (see
        # minhash_signatures_text)
        sig = minhash_signatures_text(df, id_col, text_col, n, num_perm)
    else:
        s = with_shingles(df.select(id_col, text_col), text_col, n)
        sig = minhash_signatures(s, id_col, "shingles", num_perm)
    # lazy checkpoint: repartitionByRange SAMPLES its input in a
    # separate job before the write — without this the whole
    # shingle+signature pipeline (the expensive pass the index exists
    # to amortize) runs twice per build
    keys = band_bucket_keys(sig, num_perm, bands).localCheckpoint(
        eager=False
    )
    (
        keys.repartitionByRange(2 * bands, "band", "bucket")
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(path)
    )
    # geometry sidecar: a probe built with different (n, num_perm,
    # bands) would join band keys that can never match and silently
    # return ~nothing — the probe asserts against this file instead
    with open(os.path.join(path, "_lsh_geometry.json"), "w") as f:
        json.dump({"n": n, "num_perm": num_perm, "bands": bands}, f)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: shingle → signature(num_perm) → for each of ``bands``
    bands hash the band's rows into a bucket key → union band tables →
    self-join on (band, bucket) → distinct candidate pairs → exact
    Jaccard filter. With num_perm=64, bands=16 (r=4), the S-curve
    midpoint sits near j≈(1/16)^(1/4)≈0.5; candidates well below
    threshold are discarded by the exact check.

    Scale: every stage is a narrow map except the bucket self-join,
    which shuffles on (band, bucket) — skew-safe because identical
    buckets are near-dup groups, bounded by AQE skew splitting.
    """
    from pypgsync_spark.operators.multimodal import single_slot_persist

    if os.environ.get("SPARK_GRAFT_SHINGLE_KERNEL", "1") != "0":
        # fused kernels (r15, guide §4.2): ONE JVM tokenization pass,
        # cached, feeds both the signer (bit-identical signatures —
        # pinned by test) and a hashed verify side (Jaccard equal on
        # 64-bit shingle hashes, the d2 hashed-verify precedent).
        tk = single_slot_persist(
            _SHINGLE_CACHE, doc_tokens(df, id_col, text_col)
        )
        sig = minhash_signatures_from_tokens(tk, n, num_perm)
        s = hashed_shingles_from_tokens(tk, n).withColumnRenamed(
            "id", id_col
        )
    else:
        s = with_shingles(df.select(id_col, text_col), text_col, n)
        # Cache the (id, shingles) side: it feeds both the signature
        # build and the final exact-Jaccard verification (single-slot
        # convention: bench runs every query twice; at most ONE
        # shingle cache lives).
        s = single_slot_persist(_SHINGLE_CACHE, s)
        sig = minhash_signatures(s, id_col, "shingles", num_perm)
    buckets = band_bucket_keys(sig, num_perm, bands)
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), on=["band", "bucket"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify candidates (few) with exact Jaccard: join shingles back in
    sh = s.select(F.col(id_col).alias("id"), F.col("shingles"))
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), on="id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), on="id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") > threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def connected_components(
    edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = the
    minimum node id reachable through the pair graph.

    The dedup-pipeline closer: near-dup PAIRS (from MinHash-LSH /
    SimHash / n-gram Jaccard) become near-dup CLUSTERS, from which one
    canonical document per cluster survives (min id, deterministic).

    Pregel-style min-label propagation: each iteration every node takes
    the min of its own and its neighbors' labels — one shuffle-on-id
    per iteration, converging in O(cluster diameter) rounds (near-dup
    clusters are shallow; the pathological-chain-graph O(log n)
    alternative is Kiveris et al.'s large-star/small-star, same join
    shape). ``localCheckpoint`` truncates lineage each round so plan
    depth stays O(1) instead of O(iterations); convergence is detected
    by the label-sum fixpoint (labels only ever decrease, so an
    unchanged sum means an unchanged labeling).
    """
    sym = _sym_edges(edges, id_a, id_b)
    labels = _self_labels(sym)
    labels, _converged, _rounds = _min_label_rounds(sym, labels, max_iter)
    return labels


def _sym_edges(edges: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Symmetrized, deduped edge list, materialized ONCE: it is joined
    every round, and without the checkpoint each iteration re-runs the
    (possibly expensive) upstream pair-finding pipeline that produced
    the edges."""
    e = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    return (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _self_labels(sym: DataFrame) -> DataFrame:
    return sym.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )


def _min_label_rounds(
    sym: DataFrame, labels: DataFrame, max_rounds: int
) -> tuple[DataFrame, bool, int]:
    """Up to ``max_rounds`` of min-label propagation; returns
    (labels, converged, rounds_run). One shuffle-on-id per round;
    convergence via the label-sum fixpoint (labels only ever decrease,
    so an unchanged sum means an unchanged labeling). decimal(38,0)
    accumulator: a BIGINT sum of many large ids can overflow (an
    ANSI-mode error, a silent wrap otherwise).

    One Spark JOB per round, not two (r8): the checkpoint is LAZY and
    the convergence-sum aggregate — a full scan — is the action that
    materializes it, so the round's shuffle runs once and its blocks
    are cached for the next round's join. With eager=True each round
    paid a second driver-barrier job just to persist what the very
    next action would read anyway; at O(log n) star rounds on a deep
    graph that is O(log n) saved barriers."""
    prev_sum = None
    converged = False
    rounds = 0
    for _ in range(max_rounds):
        nbr = sym.join(
            labels.select(F.col("id").alias("b"), "component"), on="b"
        ).select(F.col("a").alias("id"), "component")
        labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        rounds += 1
        s = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    return labels, converged, rounds


# Below this many edges the component closure runs as a driver-side
# union-find instead of distributed label-propagation rounds (r14
# optimization round; guide §1.2 "the distributed algorithm" + §5 "the
# driver should do almost no data work" — bounded metadata-scale work
# is the exception that proves the rule). Rationale: every distributed
# CC round is a full job (shuffle + convergence-sum collect), and on a
# near-dup graph of a few hundred edges those rounds are pure
# scheduling overhead — measured 1.3 s (Pregel, d5) to ~4 s
# (star fallback, d6) per query on the sf0.1 fixture for <1k edges.
# 500k edges ≈ 8 MB collected — the same order a broadcast-join build
# side ships to the driver anyway; past the cutoff the distributed
# path runs unchanged. Override per call (`driver_max_edges=0` forces
# the distributed path) or per deployment via
# $SPARK_GRAFT_CC_DRIVER_MAX_EDGES.
#
# The byte intuition behind the count assumes FIXED-WIDTH ids (two
# 8-byte longs per edge). The driver path is therefore gated on both
# id columns being integral types (r14 verdict #4 hardening): a
# string-id graph at the same edge count could be an order of
# magnitude more driver bytes — and the union-find's output schema is
# integer-typed anyway — so non-integral ids always take the
# distributed path, whatever the edge count. Pinned by
# tests/test_dedup.py::test_cc_hybrid_string_ids_skip_driver_path.
CC_DRIVER_MAX_EDGES = 500_000

_CC_INTEGRAL_TYPES = ("byte", "short", "integer", "long")


def _driver_union_find_labels(spark, rows) -> DataFrame:
    """(id, component) via driver-side union-find over a SMALL,
    already-collected edge list — bit-identical to the distributed
    variants: component = min reachable node id, every endpoint
    (self-loop-only nodes included) gets a row."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        # larger root attaches under smaller → the final root of every
        # tree is the component-wide min id, matching min-label Pregel
        parent[rb] = ra
    out = sorted((x, find(x)) for x in parent)
    return spark.createDataFrame(out, schema="id long, component long")


def connected_components_hybrid(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    pregel_rounds: int = 3,
    max_iter: int = 50,
    stats: dict | None = None,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Adaptive CC — the 100 TB default. Same output contract as
    :func:`connected_components` / :func:`connected_components_star`.

    Near-dup graphs are almost always shallow (clusters of mutual
    near-duplicates, diameter 1–2), where min-label Pregel converges in
    2–3 rounds of ONE cheap shuffle each and the star machinery's extra
    per-round shuffles are pure overhead. But chain-shaped graphs
    (boilerplate-heavy web text) blow Pregel up to O(diameter) rounds.
    So: run up to ``pregel_rounds`` of min-label propagation; if the
    fixpoint is reached, done. Otherwise CONTRACT the graph through the
    partial labels (endpoints → current label, drop intra-group edges —
    the quotient graph is ≥(2·pregel_rounds+1)× smaller in diameter)
    and finish with large-star/small-star in O(log n) rounds. The
    global min id of each component survives contraction as its own
    label (it is the min of its closed neighborhood), so the quotient
    roots are exactly the original component minima and the composed
    labeling matches the other variants bit-for-bit.

    ``stats`` (optional dict) reports ``pregel_rounds`` and
    ``star_rounds`` actually run (plus ``driver_edges`` when the
    small-graph driver path fired).

    Small graphs (≤ ``driver_max_edges`` raw edges, default
    :data:`CC_DRIVER_MAX_EDGES`, env-overridable) skip the distributed
    rounds entirely: the edge list — materialized exactly once either
    way — is collected and closed with a driver-side union-find. Every
    distributed round is a full Spark job whose cost on a small graph
    is pure scheduling overhead; the cutoff bounds the collect at
    broadcast-build-side scale. The cutoff's byte budget assumes
    fixed-width ids, so the driver path additionally requires both id
    columns to be integral — string-id graphs always run distributed
    (see the :data:`CC_DRIVER_MAX_EDGES` comment).
    """
    if driver_max_edges is None:
        driver_max_edges = int(
            os.environ.get(
                "SPARK_GRAFT_CC_DRIVER_MAX_EDGES", CC_DRIVER_MAX_EDGES
            )
        )
    # materialize the (possibly expensive) pair-finding pipeline ONCE;
    # both paths reuse this checkpoint. LAZY as of r15: the count probe
    # below is a full scan, so it stores the blocks as a side effect —
    # the eager variant paid a separate barrier job first (a
    # limit-collect probe was considered and rejected: CollectLimit's
    # incremental execution can spend MORE jobs than the count, and a
    # partially-computed lazy checkpoint triggers a missing-partitions
    # cleanup job on top).
    raw = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).localCheckpoint(
        eager=False
    )
    n_edges = raw.count()
    ids_integral = all(
        f.dataType.typeName() in _CC_INTEGRAL_TYPES for f in raw.schema.fields
    )
    if ids_integral and n_edges <= driver_max_edges:
        if stats is not None:
            stats["pregel_rounds"] = 0
            stats["star_rounds"] = 0
            stats["driver_edges"] = n_edges
        return _driver_union_find_labels(raw.sparkSession, raw.collect())
    sym = _sym_edges(raw, "a", "b")
    labels = _self_labels(sym)
    labels, converged, rounds = _min_label_rounds(sym, labels, pregel_rounds)
    if stats is not None:
        stats["pregel_rounds"] = rounds
        stats["star_rounds"] = 0
    if converged:
        return labels
    la = labels.select(F.col("id").alias("a"), F.col("component").alias("ca"))
    lb = labels.select(F.col("id").alias("b"), F.col("component").alias("cb"))
    contracted = (
        sym.join(la, on="a")
        .join(lb, on="b")
        .filter(F.col("ca") != F.col("cb"))
        .select(F.col("ca").alias("id_a"), F.col("cb").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The sum-fixpoint detector needs one round AFTER stabilization to
    # fire, so a graph that converges at exactly ``pregel_rounds``
    # reports converged=False (round-5 advisor). The quotient graph is
    # the cheap tiebreak: labels are a fixpoint iff every edge joins
    # two same-label nodes, i.e. the contracted graph is EMPTY — and a
    # uniform label is necessarily the component min (the min node's
    # label can never decrease below itself). The emptiness probe is a
    # limit-1 scan of the just-materialized checkpoint; the whole star
    # stage (2+ shuffle rounds on an empty edge list, plus the compose
    # join) is skipped.
    if contracted.isEmpty():
        return labels
    star_stats: dict = {}
    roots = connected_components_star(
        contracted, max_iter=max_iter, stats=star_stats
    )
    if stats is not None:
        stats["star_rounds"] = star_stats.get("rounds", 0)
    return (
        labels.join(
            roots.select(
                F.col("id").alias("component"), F.col("component").alias("root")
            ),
            on="component",
            how="left",
        )
        .select("id", F.coalesce("root", "component").alias("component"))
    )


def connected_components_star(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) via Kiveris et al.'s large-star/small-star
    (two-phase hashing, SoCC'14) — same output contract as
    :func:`connected_components`, but the round count is O(log n) on
    ANY graph, including the pathological long-chain case where
    min-label Pregel needs O(diameter) rounds.

    Each round rewrites the edge list with two local operations:

    - *large-star*: every node ``u`` attaches each strictly-larger
      neighbor ``v > u`` to ``m = min(Γ(u) ∪ {u})`` — emit ``(v, m)``.
    - *small-star*: on the larger→smaller-oriented list, every node
      ``u`` takes ``m = min(Γ⁻(u))`` of its not-larger neighbors and
      attaches ``u`` and the rest of ``Γ⁻(u)`` to ``m``.

    Both are one groupBy-shuffle on the node id plus one equi-join —
    the same shuffle shape as a Pregel round, no driver data. Edge
    endpoints only ever decrease, so the (count, endpoint-hash-sum)
    pair is a fixpoint detector: when a round leaves both unchanged,
    the graph is a forest of stars and every remaining edge is
    ``(node, component-min)``. One scalar collect per round, like the
    Pregel loop. ``stats["rounds"]``, when a dict is passed, reports
    the converged round count (the chain-fixture test asserts the
    O(log n) bound holds).
    """
    # materialize the upstream edge pipeline exactly ONCE — nodes and
    # the working edge list both derive from this checkpoint (two eager
    # checkpoints here would run the possibly-expensive pair-finding
    # pipeline twice)
    raw = edges.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    # node set from the UNFILTERED edges: a node appearing only in
    # self-loop edges (u,u) must still self-label, matching the Pregel
    # variant's output contract
    nodes = (
        raw.select(F.col("a").alias("id"))
        .unionByName(raw.select(F.col("b").alias("id")))
        .distinct()
    )
    e = raw.filter(F.col("a") != F.col("b"))

    def _large_star(ed: DataFrame) -> DataFrame:
        sym = ed.unionByName(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("mnb")).select(
            "a", F.least("a", "mnb").alias("m")
        )
        return (
            sym.join(mins, on="a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # orient larger → smaller (large-star output already is, but
        # re-orienting keeps the op self-contained)
        o = ed.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).filter(F.col("a") != F.col("b"))
        mins = o.groupBy("a").agg(F.min("b").alias("m"))
        return (
            o.join(mins, on="a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(mins.select("a", F.col("m").alias("b")))
            .distinct()
        )

    prev = None
    rounds = 0
    converged = False
    for _ in range(max_iter):
        # lazy checkpoint: the signature aggregate below is a full scan
        # and materializes it — one job per round instead of two (the
        # Pregel loop's r8 pattern)
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulator: summing 64-bit hashes overflows
            # BIGINT (an ANSI-mode error, a silent wrap otherwise)
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        cur = (sig["n"], sig["h"])
        if cur == prev:
            converged = True
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # the star fixpoint was not reached: a node may still carry
        # several surviving edges. min(component) below keeps the
        # labeling one-row-per-id (possibly coarser than the true CC),
        # mirroring the Pregel variant's silent-nonconvergence shape.
        warnings.warn(
            f"connected_components_star: no fixpoint after {max_iter} "
            "rounds; labeling may be incomplete",
            RuntimeWarning,
            stacklevel=2,
        )
    # stars: every edge is (member, root). Roots and isolated original
    # nodes label themselves. min() guards the max_iter-exhausted case
    # where an id could appear with multiple surviving edges.
    return (
        nodes.join(
            e.select(F.col("a").alias("id"), F.col("b").alias("component")),
            on="id",
            how="left",
        )
        .groupBy("id")
        .agg(F.min(F.coalesce("component", "id")).alias("component"))
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, sig: long) — 64-bit SimHash per document.

    For each bit position j, sum +1/-1 votes of each distinct token's
    64-bit hash bit j; bit j of the signature is 1 iff the vote is
    positive. Same explode + codegen'd-columns + partial-agg shape as
    :func:`minhash_signatures` (array-lambda aggregates run
    interpreted and are ~10× slower).

    The 64 hash bits come from md5's top 16 hex chars, parsed as two
    non-negative 32-bit halves (hex→int of >15 chars can overflow
    signed BIGINT; two halves avoid ever touching the sign bit, and
    every bit extraction stays on non-negative longs whose ``>>``
    semantics Spark and DuckDB share). md5, not xxhash64, for the same
    reason as :func:`minhash_signatures`: it is the hash both engines
    compute identically, making d4 exactly oracle-checkable (r11).
    """
    toks = (
        spread_if_underpartitioned(df)  # single-file inputs otherwise run one-core
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
        )
        .withColumn("__md5", F.md5(F.col("t")))
        # hhi carries hash bits 32..63, hlo bits 0..31
        .withColumn("hhi", F.conv(F.substring("__md5", 1, 8), 16, 10).cast("long"))
        .withColumn("hlo", F.conv(F.substring("__md5", 9, 8), 16, 10).cast("long"))
    )
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                (
                    F.shiftright(F.col("hlo" if j < 32 else "hhi"), j % 32)
                    .bitwiseAND(F.lit(1))
                    * 2
                    - 1
                ).cast("int")
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(64):
        bit = F.lit(1 << j).cast("long") if j < 63 else F.lit(-(1 << 63)).cast("long")
        sig = sig + F.when(F.col(f"v{j}") > 0, bit).otherwise(F.lit(0).cast("long"))
    return votes.select("id", sig.alias("sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
    n_chunks: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash with chunk-LSH candidate generation.

    Signature split into ``n_chunks`` equal chunks; by pigeonhole, any
    pair within hamming distance ``n_chunks - 1`` shares at least one
    exact chunk, so the join on (chunk_index, chunk_value) finds all
    such pairs without a cross join; exact hamming verification
    filters the rest. Defaults (8 × 8-bit chunks, radius 7) match the
    observed hamming spread of high-Jaccard fixture pairs; narrower
    chunks widen the guaranteed radius but admit more random
    collisions (~N²·chunks/2^width candidates).
    """
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"chunk-LSH only guarantees radius {n_chunks - 1} with {n_chunks} chunks"
        )
    width = 64 // n_chunks
    mask = (1 << width) - 1
    s = simhash_signatures(df, id_col, text_col)
    chunks = s.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("sig"), width * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    left = chunks.select("ci", "cv", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    right = chunks.select("ci", "cv", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        left.join(right, on=["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
