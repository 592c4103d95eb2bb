"""Distributed prefix-sum packing (operators/packing.py) and
incremental dedup (operators/incremental.py).

The packing property that matters: the two-level formulation must be
BIT-IDENTICAL to the naive one-partition window (same semantics,
scalable plan) — including across bucket sizes that split streams at
awkward places. Incremental dedup must match the set-algebra spec:
intra-delta min-id collapse, then corpus screen.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pypgsync_spark.operators.incremental import incremental_dedup_exact
from pypgsync_spark.operators.packing import pack_chunks, packed_offsets


def _fixture(spark):
    rows = [
        # (stream, id, tokens) — ids deliberately sparse / unordered
        ("a", 3, 5),
        ("a", 1, 7),
        ("a", 12, 2),
        ("a", 1005, 11),
        ("b", 2, 1),
        ("b", 2000, 3),
        ("b", 2001, 0),
        ("c", 7, 4),
    ]
    return spark.createDataFrame(rows, "stream string, id long, n_tokens int")


def _naive_offsets(spark, df):
    w = (
        Window.partitionBy("stream")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )


def test_packed_offsets_match_naive_window(spark):
    df = _fixture(spark)
    expected = {
        (r["stream"], r["id"]): r["offset"]
        for r in _naive_offsets(spark, df).collect()
    }
    for bucket_size in (1, 2, 1000, 10**9):
        got = {
            (r["stream"], r["id"]): r["offset"]
            for r in packed_offsets(
                df, "stream", "id", "n_tokens", bucket_size=bucket_size
            ).collect()
        }
        assert got == expected, f"bucket_size={bucket_size}"


def test_pack_chunks_slices_by_start_offset(spark):
    df = _fixture(spark)
    out = {
        (r["stream"], r["chunk_id"]): (r["n_docs"], r["chunk_tokens"])
        for r in pack_chunks(
            df, "stream", "id", "n_tokens", budget=10, bucket_size=2
        ).collect()
    }
    # stream a in id order: (1,7) off 0 -> chunk 0; (3,5) off 7 -> chunk 0;
    # (12,2) off 12 -> chunk 1; (1005,11) off 14 -> chunk 1
    assert out[("a", 0)] == (2, 12)
    assert out[("a", 1)] == (2, 13)
    # stream b: (2,1) off 0; (2000,3) off 1; (2001,0) off 4 -> all chunk 0
    assert out[("b", 0)] == (3, 4)
    assert out[("c", 0)] == (1, 4)
    assert len(out) == 4


def test_incremental_dedup_contract(spark):
    corpus = spark.createDataFrame(
        [(1, "the corpus doc"), (2, "shared   TEXT")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [
            (10, "Shared text"),        # normalized-equal to corpus doc 2 -> dropped
            (20, "fresh one"),
            (30, "fresh  ONE"),         # intra-delta dup of 20 -> min id keeps
            (40, "another fresh"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in incremental_dedup_exact(corpus, delta).collect()
    )
    assert kept == [20, 40]


def test_incremental_dedup_empty_corpus(spark):
    corpus = spark.createDataFrame([], "doc_id long, text string")
    delta = spark.createDataFrame(
        [(5, "x"), (6, "x")], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"] for r in incremental_dedup_exact(corpus, delta).collect()
    )
    assert kept == [5]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _corpora(draw):
    n = draw(st.integers(1, 40))
    streams = ["s0", "s1", "s2"]
    rows = []
    ids = draw(
        st.lists(
            st.integers(0, 5000), min_size=n, max_size=n, unique=True
        )
    )
    for i in ids:
        rows.append(
            (draw(st.sampled_from(streams)), i, draw(st.integers(0, 300)))
        )
    bucket = draw(st.sampled_from([1, 3, 7, 100, 10**6]))
    return rows, bucket


@given(data=_corpora())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_packed_offsets_model(spark, data):
    """Model check: on any corpus and any bucketing, the distributed
    prefix sum equals the sequential per-stream exclusive cumsum."""
    rows, bucket = data
    df = spark.createDataFrame(rows, "stream string, id long, n_tokens int")
    got = {
        (r["stream"], r["id"]): r["offset"]
        for r in packed_offsets(
            df, "stream", "id", "n_tokens", bucket_size=bucket
        ).collect()
    }
    model = {}
    for s in {r[0] for r in rows}:
        acc = 0
        for _, i, t in sorted((r for r in rows if r[0] == s), key=lambda r: r[1]):
            model[(s, i)] = acc
            acc += t
    assert got == model


def test_cross_jaccard_pairs_complete(spark):
    """Prefix-filtered cross-collection pairs must equal brute force on
    a corpus engineered with shared rare/common shingles and size
    spread (the candidate-pruning edge cases)."""
    from pypgsync_spark.operators.incremental import cross_jaccard_pairs

    def doc(i, words):
        return (i, " ".join(words))

    base = ["w%d" % k for k in range(12)]
    corpus_rows = [
        doc(1, base),                     # long doc
        doc(2, base[:6]),                 # same prefix half
        doc(3, ["x1", "x2", "x3", "x4", "x5"]),
        doc(4, ["y1", "y2", "y3"]),
    ]
    delta_rows = [
        doc(10, base),                    # exact dup of corpus 1
        doc(11, base[:7] + ["z9"]),       # near dup of 1/2
        doc(12, ["x1", "x2", "x3", "x4", "x6"]),  # near dup of 3
        doc(13, ["q1", "q2", "q3"]),      # no match
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")

    got = {
        (r["delta_id"], r["corpus_id"])
        for r in cross_jaccard_pairs(corpus, delta, threshold=0.2).collect()
    }

    def shingles(words):
        toks = words.lower().split()
        if len(toks) < 3:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    expected = set()
    for di, dt in delta_rows:
        for ci, ct in corpus_rows:
            a, b = shingles(dt), shingles(ct)
            if a and b and len(a & b) / max(len(a | b), 1) > 0.2:
                expected.add((di, ci))
    assert got == expected and expected  # non-vacuous


def test_packed_offsets_null_stream_matches_window(spark):
    """NULL stream values form one group under Window.partitionBy; the
    distributed formulation must reproduce that, not drop the rows in
    its offsets join."""
    rows = [(None, 1, 5), (None, 10, 7), ("a", 2, 3), (None, 2000, 2)]
    df = spark.createDataFrame(rows, "stream string, id long, n_tokens int")
    got = {
        (r["stream"], r["id"]): r["offset"]
        for r in packed_offsets(
            df, "stream", "id", "n_tokens", bucket_size=100
        ).collect()
    }
    expected = {
        (r["stream"], r["id"]): r["offset"]
        for r in _naive_offsets(spark, df).collect()
    }
    assert got == expected
    assert (None, 2000) in got and got[(None, 2000)] == 12
