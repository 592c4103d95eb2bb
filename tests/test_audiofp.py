"""Audio fingerprint near-dup (r13 verdict #4): operator-level
invariants — the audio twin of tests/test_phash.py.

The oracle-checked query (mm11) proves Spark↔DuckDB agreement; these
pin the properties the formulation RESTS on, against a brute-force
reference the SQL side never computes:

- band-LSH completeness: the bucket join finds EXACTLY the pairs a
  brute-force all-pairs hamming scan finds at radius <= 3;
- fixture structure: exact-dup roles fingerprint identically, the
  single-sample near-dup role lands within 2 bits of its base (one
  sample changes one frame's energy, and a frame energy appears in
  exactly 2 circular comparisons);
- container round-trip: the fingerprint is computed from DECODED
  RIFF/WAVE bytes, so canonical and junk-LIST-chunk containers with
  identical samples pair at hamming 0.
"""

from __future__ import annotations

import itertools

from pypgsync_spark.operators.multimodal import (
    AFP_GROUP,
    _neardup_wav_samples,
    audio_fingerprint_bands,
    audio_near_pairs,
    with_neardup_audio_payload,
)

N_DOCS = 120  # 24 groups of 5 — small enough for the brute-force scan


def _fp_bits(doc_id: int):
    import numpy as np

    a = _neardup_wav_samples(doc_id).astype("int64").reshape(-1, 2)
    e = (a * a).sum(axis=1)
    return (e < np.roll(e, -1)).astype(np.int64)


def _brute_pairs(max_hamming=3):
    bits = {d: _fp_bits(d) for d in range(N_DOCS)}
    out = set()
    for a, b in itertools.combinations(range(N_DOCS), 2):
        h = int((bits[a] != bits[b]).sum())
        if h <= max_hamming:
            out.add((a, b, h))
    return out


def test_audio_band_lsh_matches_brute_force(spark):
    df = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    pairs = audio_near_pairs(
        audio_fingerprint_bands(with_neardup_audio_payload(df)), max_hamming=3
    )
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()}
    want = _brute_pairs(3)
    assert got == want
    assert want, "fixture must produce near-dup pairs"


def test_audio_fixture_roles_have_designed_distances():
    import numpy as np

    for g in (0, 35, 115):  # a few group bases
        base0, base1 = _fp_bits(g), _fp_bits(g + 1)
        near = _fp_bits(g + 2)
        assert (base0 == base1).all()  # roles 0/1: exact duplicates
        # role 2: one sample edited -> one frame energy moves -> at
        # most the 2 comparisons that read it flip
        assert int((base0 != near).sum()) <= 2
        far = _fp_bits(g + 3)
        assert not np.array_equal(base0, far)


def test_cross_container_exact_dup_pairs_at_zero(spark):
    # doc 10 (even -> canonical WAV) and doc 11 (odd -> junk LIST
    # chunk + pad byte) share role 0/1 samples: identical content
    # through two container layouts must decode to the same
    # fingerprint — pairing at hamming 0
    df = spark.range(10, 12).withColumnRenamed("id", "doc_id")
    pairs = audio_near_pairs(
        audio_fingerprint_bands(with_neardup_audio_payload(df)), max_hamming=3
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(10, 11, 0)]


def test_single_sample_edit_flips_at_most_two_bits():
    """The locality guarantee the near-dup design rests on: ANY
    single-sample change to ANY stream flips at most the 2 fingerprint
    bits whose circular comparisons read the edited frame's energy."""
    import numpy as np

    for doc_id in (0, 3, 47):
        base = _neardup_wav_samples(doc_id).astype("int64")
        e0 = (base.reshape(-1, 2) ** 2).sum(axis=1)
        b0 = (e0 < np.roll(e0, -1)).astype(np.int64)
        for si in (0, 1, 64, 127):
            mut = base.copy()
            mut[si] = ((int(mut[si]) + 32768 + 12345) % 65536) - 32768
            e1 = (mut.reshape(-1, 2) ** 2).sum(axis=1)
            b1 = (e1 < np.roll(e1, -1)).astype(np.int64)
            assert int((b0 != b1).sum()) <= 2


def test_group_geometry_constants():
    # the oracle hard-codes groups of 5 and the 128-sample stream —
    # a constant drift here would silently diverge Spark from SQL
    assert AFP_GROUP == 5
    assert _neardup_wav_samples(0).shape == (128,)
