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


# --- r11: audio (RIFF/WAVE PCM-16) and video (Y4M) reference codecs --

from pypgsync_spark.operators.multimodal import (  # noqa: E402
    AUD_CH,
    AUD_FRAMES,
    VID_FRAMES,
    VID_H,
    VID_W,
    _fixture_samples,
    _fixture_video,
    decode_wav16,
    decode_y4m,
    encode_wav16,
    encode_y4m,
)


def _rand_samples(n_frames, seed=11):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=n_frames * AUD_CH, dtype=np.int16)


@pytest.mark.parametrize("junk", [False, True])
@pytest.mark.parametrize("n_frames", [1, 64, 100])
def test_wav_round_trip(n_frames, junk):
    s = _rand_samples(n_frames)
    a, rate = decode_wav16(encode_wav16(s, rate=44100, junk_chunk=junk))
    assert rate == 44100 and a.shape == (n_frames, AUD_CH)
    assert np.array_equal(a.reshape(-1), s)


def test_wav_junk_chunk_changes_bytes_not_samples():
    """The odd-sized LIST chunk + pad byte must be walked over, not
    mistaken for data."""
    s = _fixture_samples(9)
    plain, junked = encode_wav16(s), encode_wav16(s, junk_chunk=True)
    assert plain != junked
    assert np.array_equal(decode_wav16(plain)[0], decode_wav16(junked)[0])


def test_fixture_samples_formula():
    s = _fixture_samples(5).astype(np.int64)
    expect = [((5 * 37 + i * 11) % 4096) - 2048 for i in range(AUD_FRAMES * AUD_CH)]
    assert s.tolist() == expect


def test_wav_unknown_magic_is_the_deploy_seam():
    with pytest.raises(ValueError, match="unsupported container"):
        decode_wav16(b"OggS" + b"\x00" * 40)


def test_wav_non_pcm_rejected():
    payload = bytearray(encode_wav16(_fixture_samples(1)))
    payload[20] = 3  # fmt tag PCM(1) -> IEEE float(3)
    with pytest.raises(ValueError, match="PCM-16 only"):
        decode_wav16(bytes(payload))


def test_wav_truncated_chunk_rejected():
    with pytest.raises(ValueError, match="truncated"):
        decode_wav16(encode_wav16(_fixture_samples(2))[:30])


def test_wav_missing_data_chunk_rejected():
    import struct

    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav16(b"RIFF" + struct.pack("<I", len(body)) + body)


def _rand_video(n_frames, seed=13):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n_frames, 3, VID_H * VID_W), dtype=np.uint8)


@pytest.mark.parametrize("n_frames", [0, 1, VID_FRAMES])
def test_y4m_round_trip(n_frames):
    v = _rand_video(n_frames)
    out = decode_y4m(encode_y4m(v))
    assert out.shape == (n_frames, 3, VID_H, VID_W)
    assert np.array_equal(out.reshape(n_frames, 3, VID_H * VID_W), v)


def test_y4m_frame_params_accepted():
    """The spec allows per-frame parameters (FRAME Ixyz\\n) — the
    parser must scan to the newline, not assume a bare marker."""
    v = _fixture_video(3)
    payload = encode_y4m(v).replace(b"FRAME\n", b"FRAME Ixyz\n")
    assert np.array_equal(decode_y4m(payload).reshape(VID_FRAMES, 3, -1), v)


def test_fixture_video_formula():
    v = _fixture_video(2).astype(np.int64)
    for f in range(VID_FRAMES):
        for p in range(3):
            expect = [(2 * 19 + f * 23 + p * 41 + i * 7) % 256 for i in range(24)]
            assert v[f, p].tolist() == expect


def test_y4m_unknown_magic_is_the_deploy_seam():
    with pytest.raises(ValueError, match="unsupported container"):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 40)


def test_y4m_subsampled_colorspace_rejected():
    with pytest.raises(ValueError, match="C444 only"):
        decode_y4m(b"YUV4MPEG2 W6 H4 C420\n" + b"\x00" * 200)


def test_y4m_default_colorspace_rejected():
    """No C tag means C420jpeg per spec — still the deploy seam."""
    with pytest.raises(ValueError, match="C444 only"):
        decode_y4m(b"YUV4MPEG2 W6 H4\n" + b"\x00" * 200)


def test_y4m_truncated_frame_rejected():
    with pytest.raises(ValueError, match="truncated|planes"):
        decode_y4m(encode_y4m(_fixture_video(1))[:-5])


def test_y4m_missing_frame_marker_rejected():
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(b"YUV4MPEG2 W6 H4 C444\nXRAME\n" + b"\x00" * 72)


def test_y4m_missing_dimensions_rejected():
    with pytest.raises(ValueError, match="W/H"):
        decode_y4m(b"YUV4MPEG2 C444\n")


# --- r11: pixel-accurate nearest-neighbor resize ---------------------

from pypgsync_spark.operators.multimodal import resize_nearest  # noqa: E402


@pytest.mark.parametrize("h,w,factor", [(4, 6, 2), (5, 7, 2), (6, 6, 3), (1, 1, 2)])
def test_resize_nearest_grid(h, w, factor):
    """Output pixel (y,x) must be input pixel (factor*y, factor*x),
    with ceil-division output dims — pinned against an explicit loop
    so a sampling-grid off-by-one cannot hide in numpy slicing."""
    px = _rand_pixels(h, w)
    out = resize_nearest(px, factor)
    assert out.shape == (-(-h // factor), -(-w // factor), 3)
    for y in range(out.shape[0]):
        for x in range(out.shape[1]):
            assert (out[y, x] == px[factor * y, factor * x]).all()


def test_resize_after_either_container_is_identical():
    px = _fixture_pixels(77)
    a = resize_nearest(decode_image(encode_ppm(px)))
    b = resize_nearest(decode_image(encode_bmp24(px)))
    assert np.array_equal(a, b)


def test_audio_window_energy_kernel_matches_loop():
    """Window slicing + per-channel squared sums pinned against an
    explicit loop, including the final window when frames don't divide
    evenly."""
    from pypgsync_spark.operators.multimodal import _fixture_samples

    s = _fixture_samples(7).astype(np.int64).reshape(-1, AUD_CH)
    window = 16
    for w in range(0, s.shape[0], window):
        blk = s[w : w + window]
        le = sum(int(v) ** 2 for v in blk[:, 0])
        assert le == int((blk[:, 0] ** 2).sum())


# --- ADVICE r11: channel-count seams are errors, not crashes ---------


def test_encode_wav16_derives_channels_from_2d_shape():
    mono = np.arange(10, dtype=np.int16).reshape(10, 1)
    a, _ = decode_wav16(encode_wav16(mono, n_ch=1))
    assert a.shape == (10, 1) and np.array_equal(a, mono)
    a2, _ = decode_wav16(encode_wav16(mono))  # shape wins, no param needed
    assert a2.shape == (10, 1)
    quad = np.arange(24, dtype=np.int16).reshape(6, 4)
    a4, _ = decode_wav16(encode_wav16(quad))
    assert a4.shape == (6, 4) and np.array_equal(a4, quad)


def test_encode_wav16_rejects_contradictory_layout():
    with pytest.raises(ValueError, match="contradicts"):
        encode_wav16(np.zeros((4, 2), dtype=np.int16), n_ch=1)
    with pytest.raises(ValueError, match="whole number"):
        encode_wav16(np.zeros(5, dtype=np.int16), n_ch=2)
    with pytest.raises(ValueError, match="whole number"):
        encode_wav16(np.zeros(4, dtype=np.int16), n_ch=0)


def test_stereo_stats_kernels_reject_mono_payloads(spark):
    """decode_wav16 accepts any channel count, but the l/r stats
    kernels are stereo-shaped: a mono container must fail with the
    documented seam ValueError, not a numpy IndexError."""
    from pypgsync_spark.operators.multimodal import (
        audio_decode_stats,
        audio_window_energy,
    )

    mono = encode_wav16(np.arange(8, dtype=np.int16).reshape(8, 1))
    df = spark.createDataFrame(
        [(1, bytearray(mono))], "doc_id long, payload binary"
    )
    for op in (audio_decode_stats, audio_window_energy):
        with pytest.raises(Exception, match="expects stereo"):
            op(df).collect()
