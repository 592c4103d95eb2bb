"""Perceptual-hash image near-dup (r12): operator-level invariants.

The oracle-checked query (mm9) proves Spark↔DuckDB agreement; these
pin the properties the formulation RESTS on, against a brute-force
reference the SQL side never computes:

- band-LSH completeness: the bucket join finds EXACTLY the pairs a
  brute-force all-pairs hamming scan finds at radius <= 3 (pigeonhole:
  4 bands, so any pair within hamming 3 shares a band);
- fixture structure: exact-dup roles hash identically, the one-pixel
  near-dup role lands within 2 bits of its base (a single pixel touches
  at most the 2 comparisons that read it);
- container round-trip: the dHash is computed from DECODED container
  bytes, so PPM and BMP docs with identical pixels pair at hamming 0.
"""

from __future__ import annotations

import itertools

from pypgsync_spark.operators.multimodal import (
    PH_GROUP,
    _neardup_pixels,
    dhash_near_pairs,
    image_dhash_bands,
    with_neardup_image_payload,
)

N_DOCS = 120  # 24 groups of 5 — small enough for the brute-force scan


def _dhash_bits(doc_id: int):
    import numpy as np

    px = _neardup_pixels(doc_id).astype("int64")
    gray = px.sum(axis=2)
    return (gray[:, :-1] < gray[:, 1:]).astype(np.int64).reshape(-1)


def _brute_pairs(max_hamming=3):
    bits = {d: _dhash_bits(d) for d in range(N_DOCS)}
    out = set()
    for a, b in itertools.combinations(range(N_DOCS), 2):
        h = int((bits[a] != bits[b]).sum())
        if h <= max_hamming:
            out.add((a, b, h))
    return out


def test_band_lsh_matches_brute_force(spark):
    df = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    pairs = dhash_near_pairs(
        image_dhash_bands(with_neardup_image_payload(df)), max_hamming=3
    )
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()}
    want = _brute_pairs(3)
    assert got == want
    assert want, "fixture must produce near-dup pairs"


def test_fixture_roles_have_designed_distances():
    import numpy as np

    for g in (0, 35, 115):  # a few group bases
        base0, base1 = _dhash_bits(g), _dhash_bits(g + 1)
        near = _dhash_bits(g + 2)
        assert (base0 == base1).all()  # roles 0/1: exact duplicates
        # role 2: one pixel edited -> at most 2 comparison bits move
        assert int((base0 != near).sum()) <= 2
        far = _dhash_bits(g + 3)
        assert not np.array_equal(base0, far)


def test_cross_container_exact_dup_pairs_at_zero(spark):
    # doc 10 (even -> PPM) and doc 11 (odd -> BMP) share role 0/1
    # pixels: identical content through two different containers must
    # decode to the same hash — pairing at hamming 0
    df = spark.range(10, 12).withColumnRenamed("id", "doc_id")
    pairs = dhash_near_pairs(
        image_dhash_bands(with_neardup_image_payload(df)), max_hamming=3
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(10, 11, 0)]


def test_radius_guard():
    import pytest

    with pytest.raises(ValueError, match="band-LSH"):
        dhash_near_pairs(None, max_hamming=4)
