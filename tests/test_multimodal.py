"""Pure-Python tests for the reference image codecs (r10 verdict #4).

The Spark-side plumbing (Arrow batch shape, schema, row expansion) is
oracle-covered by mm1–mm4; these pin the codec layer itself: byte-exact
round-trips for both containers, the BMP layout traps (bottom-up rows,
BGR order, 4-byte row padding), the PPM header scanner, and the
documented ValueError seam for unsupported containers.
"""

from __future__ import annotations

import numpy as np
import pytest

from pypgsync_spark.operators.multimodal import (
    IMG_H,
    IMG_W,
    _fixture_pixels,
    decode_image,
    encode_bmp24,
    encode_ppm,
)


def _rand_pixels(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(4, 6), (1, 1), (3, 4), (5, 7)])
def test_ppm_round_trip(h, w):
    px = _rand_pixels(h, w)
    assert np.array_equal(decode_image(encode_ppm(px)), px)


@pytest.mark.parametrize("h,w", [(4, 6), (1, 1), (3, 4), (5, 7), (2, 2)])
def test_bmp_round_trip(h, w):
    """w=6 and w=7 rows need 2/3 pad bytes, w=4 none — all must invert."""
    px = _rand_pixels(h, w)
    assert np.array_equal(decode_image(encode_bmp24(px)), px)


def test_both_containers_decode_identically():
    px = _fixture_pixels(12345)
    assert np.array_equal(decode_image(encode_ppm(px)), decode_image(encode_bmp24(px)))


def test_ppm_header_comments_and_whitespace():
    px = _rand_pixels(2, 3)
    payload = b"P6\n# a comment\n3   2\n# another\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(payload), px)


def test_fixture_pixels_formula():
    px = _fixture_pixels(3)
    flat = px.reshape(-1).astype(np.int64)
    expect = [(3 * 31 + i * 7) % 256 for i in range(IMG_H * IMG_W * 3)]
    assert flat.tolist() == expect


def test_unknown_magic_is_the_deploy_seam():
    with pytest.raises(ValueError, match="unsupported container"):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_bmp_unsupported_variants_rejected():
    px = _rand_pixels(2, 2)
    payload = bytearray(encode_bmp24(px))
    payload[28] = 32  # bpp 24 -> 32
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(bytes(payload))


def test_ppm_truncated_payload_rejected():
    px = _rand_pixels(2, 2)
    with pytest.raises(ValueError, match="truncated"):
        decode_image(encode_ppm(px)[:-1])


def test_ppm_16bit_maxval_rejected():
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_ppm_truncated_header_terminates():
    """r11 self-review: an unbounded header scan looped forever on
    b'' (bytes[p:p+1] of an exhausted payload never .isspace())."""
    for payload in (b"P6", b"P6\n", b"P6\n3 ", b"P6\n3 2\n# trailing comment"):
        with pytest.raises(ValueError, match="truncated"):
            decode_image(payload)


def test_ppm_non_numeric_header_rejected():
    with pytest.raises(ValueError, match="not a number"):
        decode_image(b"P6\nabc 2\n255\n" + b"\x00" * 18)


def test_bmp_truncated_header_rejected():
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"BM" + b"\x00" * 20)
