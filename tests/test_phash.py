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


def test_single_byte_edit_flips_at_most_two_bits():
    """The locality guarantee the near-dup design rests on: ANY
    single-byte change to ANY image flips at most the 2 dHash bits
    whose comparisons read the edited pixel — so a one-pixel edit is
    always within the banding's guaranteed radius. Hypothesis-driven
    over random images and edit positions."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pypgsync_spark.operators.multimodal import PH_H, PH_W

    def dhash(px):
        gray = px.astype("int64").sum(axis=2)
        return (gray[:, :-1] < gray[:, 1:]).astype(np.int8).reshape(-1)

    @settings(max_examples=200, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        pos=st.integers(0, PH_H * PH_W * 3 - 1),
        delta=st.integers(1, 255),
    )
    def check(seed, pos, delta):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(PH_H, PH_W, 3), dtype=np.uint8)
        edited = px.copy().reshape(-1)
        edited[pos] = (int(edited[pos]) + delta) % 256
        edited = edited.reshape(PH_H, PH_W, 3)
        assert int((dhash(px) != dhash(edited)).sum()) <= 2

    check()
