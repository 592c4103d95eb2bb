"""BPE tokenizer trainer — bit-identity with the pure-Python Sennrich
kernel (the seq_cosine oracle pattern), encode-replay exactness, and
the algebraic invariants of the merge loop.

The DataFrame trainer (operators/bpe.py) is an iterative argmax no SQL
statement expresses, so its registry row is rows-only; these tests are
its correctness contract: the Spark merge list must equal the
reference kernel's EXACTLY (same counts, same lexicographic
tie-break), and the rank-greedy encoder must reproduce the training
segmentation of every training word (the classic BPE replay
property — if greedy-per-round and rank-greedy diverge, the learned
vocabulary does not tokenize its own training data consistently).
"""

from __future__ import annotations

import pytest

from pypgsync_spark.operators.bpe import (
    END_OF_WORD,
    bpe_tokens,
    encode_word,
    merges_df,
    train_bpe,
    train_bpe_reference,
    word_frequencies,
)

N_MERGES = 25


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


@pytest.fixture(scope="module")
def wf_dict(spark, docs) -> dict[str, int]:
    return {
        r["word"]: r["freq"]
        for r in word_frequencies(docs, "text").collect()
    }


@pytest.fixture(scope="module")
def spark_merges(spark, docs) -> list[tuple[str, str]]:
    # driver_vocab_limit=0 forces the DISTRIBUTED merge loop — the
    # bit-identity test below would otherwise be circular (the hybrid
    # default collects a small vocab and runs the reference kernel).
    return train_bpe(
        word_frequencies(docs, "text"), n_merges=N_MERGES, driver_vocab_limit=0
    )


def test_trainer_bit_identical_to_reference_kernel(wf_dict, spark_merges):
    ref = train_bpe_reference(wf_dict, n_merges=N_MERGES)
    assert spark_merges == ref


def test_hybrid_driver_path_matches_distributed(spark, docs, spark_merges):
    """The default (driver-side, vocab-fits) path must return the same
    merge list as the forced distributed loop."""
    hybrid = train_bpe(word_frequencies(docs, "text"), n_merges=N_MERGES)
    assert hybrid == spark_merges


def _replay_training(wf_dict, merges):
    vocab = {w: list(w) + [END_OF_WORD] for w in wf_dict}
    for left, right in merges:
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return vocab


def test_encode_replays_training_segmentation(wf_dict, spark_merges):
    ranks = {p: i for i, p in enumerate(spark_merges)}
    trained = _replay_training(wf_dict, spark_merges)
    for w in wf_dict:
        assert encode_word(w, ranks) == trained[w], w


def test_encode_is_lossless(spark_merges):
    ranks = {p: i for i, p in enumerate(spark_merges)}
    for w in ("hello", "aardvark", "zzz", "a", "12034", "...!", "été"):
        syms = encode_word(w, ranks)
        assert "".join(syms) == w + END_OF_WORD


def test_merges_are_frequency_monotone_per_round(wf_dict, spark_merges):
    """Round k's merged pair count (at round-k state) must be >= round
    k+1's: the argmax sequence of a BPE run is non-increasing ONLY
    per-state, so assert the direct invariant instead — each recorded
    merge was the maximum at its own round (recompute one round)."""
    vocab = {w: list(w) + [END_OF_WORD] for w in wf_dict}
    for left, right in spark_merges:
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = wf_dict[w]
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + f
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert best == (left, right)
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out


def test_bpe_tokens_udf_matches_kernel(spark, docs, spark_merges):
    """The Arrow-batched encoder equals per-word kernel encoding glued
    across the document (pre-tokens are independent under BPE)."""
    import re

    from pypgsync_spark.functions.text import BPE_ISH_PATTERN

    ranks = {p: i for i, p in enumerate(spark_merges)}
    pattern = re.compile(BPE_ISH_PATTERN)
    sample = docs.limit(20).select("doc_id", "text").collect()
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.limit(20)
        .select("doc_id", bpe_tokens("text", spark_merges).alias("toks"))
        .collect()
    }
    for r in sample:
        expect: list[str] = []
        for w in pattern.findall(r["text"].lower()):
            expect.extend(encode_word(w, ranks))
        assert got[r["doc_id"]] == expect


def test_merges_df_shape(spark, spark_merges):
    df = merges_df(spark, spark_merges)
    assert df.columns == ["rank", "left", "right", "merged"]
    rows = df.collect()
    assert [r["rank"] for r in rows] == list(range(len(spark_merges)))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_early_stop_on_min_pair_freq(spark):
    """A vocabulary whose best pair is below min_pair_freq stops the
    loop — no degenerate singleton merges."""
    wf = spark.createDataFrame([("ab", 1)], "word string, freq long")
    # both execution paths must early-stop identically
    assert train_bpe(wf, n_merges=5, min_pair_freq=2) == []
    assert train_bpe(wf, n_merges=5, min_pair_freq=2, driver_vocab_limit=0) == []
    ref = train_bpe_reference({"ab": 1}, n_merges=5, min_pair_freq=2)
    assert ref == []


def test_distributed_path_bit_identical_at_realistic_vocab(spark):
    """r8 verdict #6: the sf0.001 fixture's vocabulary is ~31 words, so
    the forced-distributed test above exercises the loop's mechanics
    but not its scale regime. Here: a generated ~9.3k-word vocabulary
    (every 3-5 letter word over a 6-letter alphabet — distinct by
    construction) with varied, tie-heavy deterministic frequencies,
    trained >=20 merges through the DISTRIBUTED loop
    (driver_vocab_limit=0) and pinned bit-identical to the pure-Python
    Sennrich kernel — counts AND lexicographic tie-breaks, at a
    vocabulary where the per-round pair aggregation actually carries
    weight."""
    from itertools import product

    alphabet = "abcdef"
    words = [
        "".join(t)
        for ln in (3, 4, 5)
        for t in product(alphabet, repeat=ln)
    ]
    assert len(words) == 6**3 + 6**4 + 6**5  # 9288 distinct words
    # deterministic, tie-heavy frequencies (997 buckets over 9288 words
    # guarantees many exact count ties -> the lexicographic tie-break
    # is genuinely exercised)
    wf = {w: (i * 2654435761) % 997 + 1 for i, w in enumerate(words)}

    n_merges = 22
    df = spark.createDataFrame(list(wf.items()), "word string, freq long")
    got = train_bpe(df.repartition(8), n_merges=n_merges, driver_vocab_limit=0)
    want = train_bpe_reference(wf, n_merges=n_merges)
    assert len(got) == n_merges
    assert got == want
