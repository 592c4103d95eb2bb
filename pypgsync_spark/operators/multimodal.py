"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a pointer to object storage) next to typed
metadata columns; run decode/feature-extraction as Arrow-batched
``mapInPandas`` stages so each Python worker touches a whole batch, not
a row. The Spark-side contract (schema, batch iteration, partition
sizing) is real and tested here; the actual media decoding is stubbed
because no image/audio libraries ship in this container — each stub is
a clearly-marked seam (`decode_image`) that a deployment replaces.

``extract_binary_features`` computes deterministic byte-level features
(length, first/last byte) so the full pipeline remains
oracle-verifiable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
    ]
)


def encode_ppm(pixels) -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array as binary PPM (P6)."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "PPM P6 is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp24(pixels) -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array as an uncompressed
    24-bit BI_RGB BMP (BGR byte order, bottom-up rows, each row padded
    to a 4-byte boundary — the classic DIB layout)."""
    import struct

    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    pad = (-3 * w) % 4
    img_size = (3 * w + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(a[y, :, ::-1].tobytes())  # RGB -> BGR
        rows.append(b"\x00" * pad)
    return header + b"".join(rows)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload into an (H, W, 3) uint8 RGB numpy array.

    Dependency-free reference decoder (r10 verdict #4 — was a
    NotImplementedError stub) for the two classic uncompressed
    containers:

    - **PPM (P6)**: header tokens split on whitespace with ``#``
      comments honored, then ``w*h*3`` raw RGB bytes.
    - **BMP (24-bit BI_RGB)**: pixel offset read from the file header,
      bottom-up BGR rows with 4-byte row padding stripped.

    Anything else raises ``ValueError`` — THAT is the deploy seam where
    production plugs PIL/ffmpeg for compressed codecs; the Arrow batch
    shape, schema contract and this function's signature are what the
    deployment keeps. Exercised end-to-end (encode → binary column →
    decode → pixel statistics) by the oracle-checked ``mm4`` query.
    """
    import numpy as np

    if payload[:2] == b"P6":
        pos = 2
        end = len(payload)
        vals: list[int] = []
        while len(vals) < 3:
            while pos < end and payload[pos : pos + 1].isspace():
                pos += 1
            if pos >= end:
                # without the bound, b""[p:p+1] is b"" forever and the
                # token scan below never terminates (r11 self-review)
                raise ValueError("PPM header truncated")
            if payload[pos : pos + 1] == b"#":  # comment to end-of-line
                while pos < end and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < end and not payload[pos : pos + 1].isspace():
                pos += 1
            tok = payload[start:pos]
            if not tok.isdigit():
                raise ValueError(f"PPM header token {tok!r} is not a number")
            vals.append(int(tok))
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
        pos += 1  # exactly one whitespace byte after maxval
        data = payload[pos : pos + w * h * 3]
        if len(data) != w * h * 3:
            raise ValueError("PPM payload truncated")
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)

    if payload[:2] == b"BM":
        import struct

        if len(payload) < 54:  # file header (14) + BITMAPINFOHEADER (40)
            raise ValueError("BMP header truncated")
        offset = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0 or h <= 0:
            raise ValueError(
                "BMP variant unsupported by the reference decoder "
                f"(bpp={bpp}, compression={compression}, height={h}); "
                "plug a production codec at this seam"
            )
        stride = 3 * w + ((-3 * w) % 4)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for y in range(h):
            row = payload[offset + y * stride : offset + y * stride + 3 * w]
            # bottom-up BGR -> top-down RGB
            out[h - 1 - y] = np.frombuffer(row, dtype=np.uint8).reshape(w, 3)[:, ::-1]
        return out

    raise ValueError(
        "unsupported container (reference decoder handles PPM P6 and "
        "24-bit BMP); plug a production codec at this seam"
    )


def with_binary_payload(df: DataFrame, text_col: str = "text", out: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (fixture stand-in: UTF-8
    bytes of the text column; production: real media bytes)."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
    ]
)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 64,
    every_k: int = 4,
) -> DataFrame:
    """Video-style frame sampling over binary payloads: slice each
    payload into consecutive ``frame_size``-byte frames, keep every
    ``every_k``-th, emit per-frame features.

    The Spark-side contract is the interesting part at 100 TB: an
    Arrow-batched ``mapInPandas`` that EXPANDS rows (one in, many out)
    — the same shape real video decode uses (container bytes → sampled
    frames), with output partitioning inherited from the input (no
    shuffle). The per-frame feature here is deterministic byte math so
    the whole path stays oracle-verifiable; a deployment swaps the
    slice step for a real codec behind :func:`decode_image`.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, firsts = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                for i in range(0, (n + frame_size - 1) // frame_size, every_k):
                    frame = payload[i * frame_size : (i + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    firsts.append(frame[0] if len(frame) else -1)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "first_byte": pd.Series(firsts, dtype="int32"),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(sample, FRAME_SCHEMA)


def extract_binary_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each batch arrives as a pandas DataFrame; returns
    (id, n_bytes, first_byte, last_byte). Deterministic, so the DuckDB
    oracle can verify the whole path (octet_length / ascii-of-ends).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("byte_val", T.IntegerType()),
    ]
)


def resize_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target: int = 16,
) -> DataFrame:
    """The 'resize' stage of the media pipeline as Arrow-batched
    ``mapInPandas``: downsample each payload to <= ``target`` strided
    byte samples (stride = ceil(n/target); sample j reads byte
    1 + j*stride, 1-based). A real image/audio resize replaces the
    sampling kernel with an interpolating one — the batch shape,
    schema contract, and row-expansion plumbing (one input row ->
    <= target output rows) are exactly what that deployment keeps.
    Deterministic integer sampling, so the DuckDB oracle verifies the
    full path byte-for-byte.
    """

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                if n == 0:
                    continue
                stride = -(-n // target)  # ceil
                for j in range(target):
                    pos = j * stride  # 0-based byte index
                    if pos >= n:
                        break
                    ids.append(doc_id)
                    idxs.append(j)
                    vals.append(payload[pos])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_idx": pd.Series(idxs, dtype="int32"),
                    "byte_val": pd.Series(vals, dtype="int32"),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        resample, RESIZE_SCHEMA
    )


# --- real-container decode path (r11): encode -> binary column ->
# decode_image -> pixel statistics, all Arrow-batched ------------------

IMG_W, IMG_H = 6, 4  # W=6 -> BMP rows need 2 pad bytes: the padding
# path is exercised, not just the aligned case

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


def _fixture_pixels(doc_id: int):
    """Deterministic (IMG_H, IMG_W, 3) uint8 image for a doc: byte i of
    the row-major RGB stream is ``(doc_id*31 + i*7) % 256`` — pure
    integer arithmetic a SQL oracle can restate, standing in for real
    image bytes the fixture cannot carry."""
    import numpy as np

    i = np.arange(IMG_H * IMG_W * 3, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 256).astype(np.uint8).reshape(IMG_H, IMG_W, 3)


def with_image_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fmt, payload): REAL container bytes per document —
    PPM P6 for even ids, 24-bit padded BMP for odd ids — so the decode
    stage downstream exercises both parsers and the magic-byte sniff.
    Arrow-batched mapInPandas; partitioning inherited (no shuffle)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            fmts, payloads = [], []
            for doc_id in ids:
                px = _fixture_pixels(int(doc_id))
                if doc_id % 2 == 0:
                    fmts.append("ppm")
                    payloads.append(encode_ppm(px))
                else:
                    fmts.append("bmp")
                    payloads.append(encode_bmp24(px))
            yield pd.DataFrame(
                {"doc_id": ids, "fmt": fmts, "payload": payloads}
            )

    return df.select(F.col(id_col)).mapInPandas(encode, PAYLOAD_SCHEMA)


def image_decode_stats(df: DataFrame) -> DataFrame:
    """Decode each payload via :func:`decode_image` and emit per-doc,
    per-channel pixel sums — the canonical decode→featurize stage. A
    container-layout bug anywhere (BMP row padding, BGR order,
    bottom-up flip, PPM header scan) lands in the sums and fails the
    oracle hash."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            r, g, b = [], [], []
            for payload in pdf["payload"]:
                px = decode_image(bytes(payload)).astype("int64")
                sums = px.sum(axis=(0, 1))
                r.append(int(sums[0]))
                g.append(int(sums[1]))
                b.append(int(sums[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pdf["fmt"],
                    "r_sum": pd.Series(r, dtype="int64"),
                    "g_sum": pd.Series(g, dtype="int64"),
                    "b_sum": pd.Series(b, dtype="int64"),
                }
            )

    return df.select("doc_id", "fmt", "payload").mapInPandas(stats, DECODE_SCHEMA)


# --- real-container AUDIO decode path (r11): 16-bit PCM RIFF/WAVE ----
# Same shape as the image path: deterministic fixture samples -> real
# container bytes in a binary column -> dependency-free chunk-walking
# decoder -> per-channel statistics the SQL oracle restates. The only
# remaining deploy seam is compressed codecs (mp3/aac/opus), exactly as
# decode_image's seam is jpeg/png.

AUD_FRAMES, AUD_CH, AUD_RATE = 64, 2, 8000

AUDIO_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("l_sum", T.LongType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def _fixture_samples(doc_id: int):
    """Deterministic interleaved stereo int16 PCM for a doc: sample i
    of the interleaved stream (i = frame*2 + channel) is
    ``((doc_id*37 + i*11) % 4096) - 2048`` — pure integer arithmetic a
    SQL oracle can restate, standing in for real audio the fixture
    cannot carry."""
    import numpy as np

    i = np.arange(AUD_FRAMES * AUD_CH, dtype=np.int64)
    return (((doc_id * 37 + i * 11) % 4096) - 2048).astype(np.int16)


def encode_wav16(
    samples, rate: int = AUD_RATE, junk_chunk: bool = False, n_ch: int | None = None
) -> bytes:
    """Serialize int16 PCM as a real RIFF/WAVE container (canonical
    16-bit PCM layout: RIFF header, ``fmt `` chunk, ``data`` chunk).
    ``samples`` is either a (frames, channels) array — the channel
    count comes from its shape — or a 1-D interleaved stream, in which
    case ``n_ch`` (default stereo) declares the layout and must divide
    the sample count; a mismatch raises rather than silently writing a
    mislabeled container whose frame count and interleave would be
    wrong on decode (ADVICE r11). With ``junk_chunk`` an odd-sized
    ``LIST`` chunk is inserted between ``fmt `` and ``data`` — plus
    the RIFF word-alignment pad byte — so decoders must actually walk
    chunks, not read fixed offsets."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 2:
        if n_ch is not None and n_ch != a.shape[1]:
            raise ValueError(
                f"n_ch={n_ch} contradicts (frames, channels) input shape {a.shape}"
            )
        n_ch = a.shape[1]
    else:
        n_ch = AUD_CH if n_ch is None else n_ch
        if n_ch < 1 or a.size % n_ch:
            raise ValueError(
                f"interleaved stream of {a.size} samples is not a whole "
                f"number of {n_ch}-channel frames"
            )
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16
    )  # PCM, block align = ch*2, 16 bits
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if junk_chunk:
        junk = b"INFOjunk"[:7]  # 7 bytes: odd size forces the pad rule
        chunks.append(b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00")
    chunks.append(b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b""))
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav16(payload: bytes):
    """Decode a 16-bit PCM RIFF/WAVE payload into ``(samples, rate)``
    where samples is an (n_frames, n_channels) int16 numpy array.

    A real chunk walker: validates the RIFF/WAVE magic, then scans
    chunks (honoring the word-alignment pad byte after odd-sized
    chunks) for ``fmt `` and ``data`` — unknown chunks (LIST, cue,
    bext...) are skipped, as the RIFF spec requires. Rejects non-PCM
    encodings and bit depths other than 16; those compressed/float
    variants are the documented deploy seam (plug a production codec
    here), mirroring decode_image's jpeg/png seam."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            "unsupported container (reference decoder handles RIFF/WAVE "
            "16-bit PCM); plug a production codec at this seam"
        )
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(f"WAV chunk {cid!r} truncated")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # odd chunks carry a pad byte
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV fmt chunk truncated")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"WAV encoding unsupported by the reference decoder "
            f"(fmt={audio_fmt}, bits={bits}; PCM-16 only) — the "
            f"compressed-audio deploy seam"
        )
    if n_ch < 1:
        raise ValueError("WAV channel count must be >= 1")
    n = len(data) // (2 * n_ch)
    a = np.frombuffer(data[: n * 2 * n_ch], dtype="<i2").reshape(n, n_ch)
    return a, rate


def with_audio_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): REAL RIFF/WAVE bytes per document — odd ids
    get an odd-sized junk LIST chunk before ``data`` so the downstream
    decode exercises the chunk walk and the pad-byte rule, not just the
    canonical layout. Arrow-batched mapInPandas; partitioning inherited
    (no shuffle)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                encode_wav16(_fixture_samples(int(d)), junk_chunk=bool(d % 2))
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(encode, AUDIO_PAYLOAD_SCHEMA)


def audio_decode_stats(df: DataFrame) -> DataFrame:
    """Decode each WAV payload via :func:`decode_wav16` and emit the
    canonical audio-featurize row: frame count, per-channel sample
    sums, and peak amplitude (max |sample| across channels). A layout
    bug anywhere (chunk walk, pad byte, little-endian int16,
    interleaving) lands in the sums and fails the oracle hash."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nf, ls, rs, pk = [], [], [], []
            for payload in pdf["payload"]:
                a, _rate = decode_wav16(bytes(payload))
                if a.shape[1] != 2:
                    # decode_wav16 accepts any channel count; THIS
                    # kernel's l/r columns are stereo-shaped — reject
                    # like the other deploy seams (ADVICE r11), don't
                    # let a mono container die in a numpy IndexError
                    raise ValueError(
                        f"audio_decode_stats expects stereo payloads; "
                        f"got {a.shape[1]} channel(s)"
                    )
                a64 = a.astype("int64")
                nf.append(a.shape[0])
                ls.append(int(a64[:, 0].sum()))
                rs.append(int(a64[:, 1].sum()))
                pk.append(int(abs(a64).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_frames": pd.Series(nf, dtype="int32"),
                    "l_sum": pd.Series(ls, dtype="int64"),
                    "r_sum": pd.Series(rs, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(stats, AUDIO_STATS_SCHEMA)


# --- real-container VIDEO decode path (r11): YUV4MPEG2 (Y4M) --------
# Y4M is the uncompressed interchange format the ffmpeg/mjpegtools
# toolchain uses: a text stream header, then per frame a FRAME marker
# line and raw YUV planes. Decode + temporal frame-sampling is the
# canonical video featurize stage; compressed codecs (h264/vp9/av1)
# remain the documented deploy seam.

VID_W, VID_H, VID_FRAMES = 6, 4, 8

VIDEO_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("u_sum", T.LongType()),
        T.StructField("v_sum", T.LongType()),
    ]
)


def _fixture_video(doc_id: int):
    """Deterministic (VID_FRAMES, 3, VID_H*VID_W) uint8 YUV444 video:
    byte i of plane p (0=Y,1=U,2=V) in frame f is
    ``(doc_id*19 + f*23 + p*41 + i*7) % 256`` — SQL-restatable integer
    arithmetic standing in for real frames."""
    import numpy as np

    f = np.arange(VID_FRAMES, dtype=np.int64)[:, None, None]
    p = np.arange(3, dtype=np.int64)[None, :, None]
    i = np.arange(VID_H * VID_W, dtype=np.int64)[None, None, :]
    return ((doc_id * 19 + f * 23 + p * 41 + i * 7) % 256).astype(np.uint8)


def encode_y4m(frames) -> bytes:
    """Serialize (n_frames, 3, H*W) uint8 YUV444 planes as a real
    YUV4MPEG2 stream: the parameterized stream header, then per frame
    a ``FRAME`` marker line followed by the raw Y, U, V planes."""
    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (VID_W, VID_H)
    return header + b"".join(b"FRAME\n" + fr.tobytes() for fr in a)


def decode_y4m(payload: bytes):
    """Decode a YUV4MPEG2 (C444) payload into an
    (n_frames, 3, H, W) uint8 numpy array.

    A real stream parser: validates the magic, reads the
    space-separated W/H/C header parameters, then walks frames —
    each ``FRAME`` marker line may carry its own parameters (the spec
    allows ``FRAME Ixyz\\n``), so the parser scans to the newline
    before reading the three raw planes. Rejects non-C444 colorspaces
    (chroma-subsampled and compressed variants are the deploy seam)
    and truncated frames."""
    import numpy as np

    magic = b"YUV4MPEG2"
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(magic):
        raise ValueError(
            "unsupported container (reference decoder handles YUV4MPEG2 "
            "C444); plug a production codec at this seam"
        )
    w = h = None
    colorspace = b"C420jpeg"  # the Y4M default when no C tag is present
    for tok in payload[len(magic) : nl].split(b" "):
        if not tok:
            continue
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok
        # F/I/A/X tags are valid but irrelevant to raw-plane layout
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if colorspace != b"C444":
        raise ValueError(
            f"Y4M colorspace {colorspace!r} unsupported by the reference "
            f"decoder (C444 only) — the chroma-subsampling deploy seam"
        )
    plane, pos, frames = w * h, nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M FRAME marker missing")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("Y4M FRAME header truncated")
        pos = fnl + 1
        if pos + 3 * plane > len(payload):
            raise ValueError("Y4M frame planes truncated")
        frames.append(
            np.frombuffer(payload[pos : pos + 3 * plane], dtype=np.uint8).reshape(
                3, h, w
            )
        )
        pos += 3 * plane
    return np.stack(frames) if frames else np.zeros((0, 3, h, w), np.uint8)


def with_video_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): REAL Y4M container bytes per document.
    Arrow-batched mapInPandas; partitioning inherited (no shuffle)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [encode_y4m(_fixture_video(int(d))) for d in ids]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(encode, VIDEO_PAYLOAD_SCHEMA)


def video_frame_stats(df: DataFrame, every_k: int = 3) -> DataFrame:
    """Decode each Y4M payload via :func:`decode_y4m`, keep every
    ``every_k``-th frame (temporal sampling — the row-EXPANDING shape
    real video featurization uses: container in, sampled frames out),
    and emit per-frame plane sums. A layout bug anywhere (plane order,
    frame stride, FRAME-marker scan) lands in the sums and fails the
    oracle hash."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ys, us, vs = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                fr = decode_y4m(bytes(payload)).astype("int64")
                for f in range(0, fr.shape[0], every_k):
                    ids.append(int(doc_id))
                    idxs.append(f)
                    ys.append(int(fr[f, 0].sum()))
                    us.append(int(fr[f, 1].sum()))
                    vs.append(int(fr[f, 2].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "y_sum": pd.Series(ys, dtype="int64"),
                    "u_sum": pd.Series(us, dtype="int64"),
                    "v_sum": pd.Series(vs, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(stats, VIDEO_STATS_SCHEMA)


# --- real pixel resize (r11): decode -> nearest-neighbor -> stats ----

RESIZE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


def resize_nearest(pixels, factor: int = 2):
    """Nearest-neighbor downsample by an integer factor: output pixel
    (y, x) is input pixel (factor*y, factor*x) — numpy strided view,
    no copy until use. Output dims are ceil(h/factor) × ceil(w/factor)
    (a[::factor] keeps the first element of each stride group)."""
    import numpy as np

    a = np.asarray(pixels)
    return a[::factor, ::factor]


def image_resize_stats(df: DataFrame, factor: int = 2) -> DataFrame:
    """The media pipeline's RESIZE stage on real pixels (mm3's
    byte-strided `resize_signature` validates the row plumbing; this
    is the pixel-accurate form now that decode is real): decode each
    container, nearest-neighbor downsample by ``factor``, emit the
    resized dims and per-channel sums. Deterministic pixel selection,
    so the oracle restates the resized sums in pure SQL — an
    off-by-one in the sampling grid (the classic resize bug) fails
    the hash. An interpolating kernel (bilinear/Lanczos) swaps in at
    this seam; the decode→transform→featurize batch shape is what it
    inherits."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs, ws, r, g, b = [], [], [], [], []
            for payload in pdf["payload"]:
                px = resize_nearest(decode_image(bytes(payload)), factor).astype(
                    "int64"
                )
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sums = px.sum(axis=(0, 1))
                r.append(int(sums[0]))
                g.append(int(sums[1]))
                b.append(int(sums[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pdf["fmt"],
                    "out_h": pd.Series(hs, dtype="int32"),
                    "out_w": pd.Series(ws, dtype="int32"),
                    "r_sum": pd.Series(r, dtype="int64"),
                    "g_sum": pd.Series(g, dtype="int64"),
                    "b_sum": pd.Series(b, dtype="int64"),
                }
            )

    return df.select("doc_id", "fmt", "payload").mapInPandas(
        stats, RESIZE_STATS_SCHEMA
    )


# --- audio temporal windows (r11): decode -> window -> energy --------

AUD_WIN = 16  # frames per analysis window (64 frames -> 4 windows)

AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("l_energy", T.LongType()),
        T.StructField("r_energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_window_energy(df: DataFrame, window: int = AUD_WIN) -> DataFrame:
    """Decode each WAV payload and emit per-window, per-channel signal
    energy (sum of squared samples — the integer-exact core of RMS;
    the oracle restates it without any float) plus the window's peak
    amplitude. The temporal decode→window→featurize shape for audio —
    mm6's frame sampling is the video twin — and row-EXPANDING like
    it: one payload in, n_frames/window feature rows out, partitioning
    inherited (no shuffle). A VAD / loudness-normalization /
    silence-trim stage swaps its kernel in here."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, le, re_, pk = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a, _rate = decode_wav16(bytes(payload))
                if a.shape[1] != 2:
                    # stereo-shaped kernel; same seam rejection as
                    # audio_decode_stats (ADVICE r11)
                    raise ValueError(
                        f"audio_window_energy expects stereo payloads; "
                        f"got {a.shape[1]} channel(s)"
                    )
                a64 = a.astype("int64")
                for w in range(0, a64.shape[0], window):
                    blk = a64[w : w + window]
                    ids.append(int(doc_id))
                    idxs.append(w // window)
                    le.append(int((blk[:, 0] ** 2).sum()))
                    re_.append(int((blk[:, 1] ** 2).sum()))
                    pk.append(int(np.abs(blk).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "l_energy": pd.Series(le, dtype="int64"),
                    "r_energy": pd.Series(re_, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(stats, AUDIO_WINDOW_SCHEMA)


# --- perceptual-hash image near-dup (r12 verdict #2) -----------------
# The one LLM-pipeline capability decode unlocked but nothing used:
# MULTIMODAL dedup. dHash over real decoded pixels (the classic
# perceptual hash: grayscale, compare horizontally adjacent cells,
# pack the comparison bits), banded LSH candidates exactly like the
# d3/d4 text formulations, exact hamming verify. Every step is
# deterministic integer arithmetic, so the DuckDB oracle restates the
# full decode -> gray -> bit -> band -> pair chain and the pair list
# is hash-checked. Production swaps the fixture encoder for real
# crawled images and (optionally) dHash for pHash/DCT at the same
# seam; the Spark plumbing (binary column -> Arrow-batched decode ->
# one equi-join shuffle on band buckets) is what carries to 100 TB.

PH_W, PH_H = 9, 8  # dHash grid: 8 comparisons per row x 8 rows = 64 bits
PH_GROUP = 5  # fixture: docs per content group (see _neardup_pixels)
PH_BANDS, PH_BAND_BITS = 4, 16

PH_PAYLOAD_SCHEMA = PAYLOAD_SCHEMA

PH_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
    ]
)


PH_MD5_BLOCKS = (PH_H * PH_W * 3 + 15) // 16  # 216 bytes -> 14 digests


def _neardup_pixels(doc_id: int):
    """Deterministic (PH_H, PH_W, 3) uint8 image with NEAR-DUP group
    structure — the dedup analogue of :func:`_fixture_pixels`, whose
    per-doc formula makes every image unique and gives a dedup query
    nothing to find. Pixel bytes are md5-derived (the d3/d4 precedent:
    md5 is the hash both engines compute identically) — arithmetic
    byte formulas were tried first and produce near-constant gray
    gradients, so thousands of docs shared one dHash and the pair
    count grew quadratically with corpus size; md5 content makes base
    images independent and the pair count exactly linear (0.6
    pairs/doc at every scale, measured to 20k docs). Docs form groups
    of ``PH_GROUP`` consecutive ids:

    - roles 0 and 1 (doc_id % 5): the group's base image — byte
      stream = md5("g:<g>:<block>") digests concatenated — EXACT
      duplicates of each other (hamming 0);
    - role 2: the base image with one channel byte bumped by +64 (mod
      256) at a group-dependent pixel — a single-pixel edit flips at
      most the 2 dHash bits that compare that pixel (a NEAR duplicate);
    - roles 3 and 4: per-doc content keyed "u:<doc_id>" — unrelated
      images that must NOT pair.
    """
    import hashlib

    import numpy as np

    role = doc_id % PH_GROUP
    g = doc_id - role
    key = f"g:{g}" if role <= 2 else f"u:{doc_id}"
    raw = b"".join(
        hashlib.md5(f"{key}:{blk}".encode()).digest()
        for blk in range(PH_MD5_BLOCKS)
    )[: PH_H * PH_W * 3]
    arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64).copy()
    if role == 2:
        p = 3 * ((g // PH_GROUP) % (PH_H * PH_W))
        arr[p] = (arr[p] + 64) % 256
    return arr.astype(np.uint8).reshape(PH_H, PH_W, 3)


def with_neardup_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fmt, payload): REAL container bytes (PPM P6 even ids,
    padded 24-bit BMP odd ids — 9px rows exercise BMP's 1-byte row
    pad) carrying the near-dup fixture images. Arrow-batched
    mapInPandas, partitioning inherited (no shuffle)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            fmts, payloads = [], []
            for doc_id in ids:
                px = _neardup_pixels(int(doc_id))
                if doc_id % 2 == 0:
                    fmts.append("ppm")
                    payloads.append(encode_ppm(px))
                else:
                    fmts.append("bmp")
                    payloads.append(encode_bmp24(px))
            yield pd.DataFrame({"doc_id": ids, "fmt": fmts, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(encode, PH_PAYLOAD_SCHEMA)


def image_dhash_bands(df: DataFrame) -> DataFrame:
    """Decode each payload and emit its 64-bit dHash as FOUR 16-bit
    band values (b0..b3) — the LSH-ready form.

    dHash: gray cell (y, x) = r+g+b (an integer luma stand-in both
    engines restate exactly; swap in 299r+587g+114b at this seam for
    production perceptual fidelity); bit k (k = y*8 + x) is set iff
    gray[y][x] < gray[y][x+1]. Band b packs bits [16b, 16b+16) with
    bit k at weight 1 << (k % 16) — bands instead of one 64-bit long
    keeps every value far from the sign bit on BOTH engines (the
    simhash_signatures lesson, operators/dedup.py:710)."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = 1 << np.arange(PH_BAND_BITS, dtype=np.int64)
        for pdf in batches:
            out = {f"b{b}": [] for b in range(PH_BANDS)}
            for payload in pdf["payload"]:
                px = decode_image(bytes(payload)).astype("int64")
                gray = px.sum(axis=2)  # (8, 9)
                bits = (gray[:, :-1] < gray[:, 1:]).astype(np.int64).reshape(-1)
                for b in range(PH_BANDS):
                    chunk = bits[PH_BAND_BITS * b : PH_BAND_BITS * (b + 1)]
                    out[f"b{b}"].append(int((chunk * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    **{
                        k: pd.Series(v, dtype="int64")
                        for k, v in out.items()
                    },
                }
            )

    return df.select("doc_id", "payload").mapInPandas(hashes, PH_BANDS_SCHEMA)


# single-slot cache for the decoded-hash side of the bucket self-join
# (the minhash _SHINGLE_CACHE convention, operators/dedup.py:382): at
# most one live copy per process, released on the next call
_PH_BANDS_CACHE: list = []


def single_slot_persist(cache: list, df: DataFrame) -> DataFrame:
    """THE single-slot persist convention (r13 review: it had grown
    four line-identical copies): release the previous occupant, persist
    and cache the new DataFrame, return it. One live copy per slot per
    process; safe under the no-concurrent-jobs bench discipline, not
    under concurrent callers (ADVICE r12 #3, accepted).

    Materializes EAGERLY (r14 optimization round): a lazily-persisted
    slot is raced by its first consumers — a streaming micro-batch's
    broadcast build and the static-side re-plan each found the cache
    cold and recomputed the full corpus signing chain from parquet
    (mm14's warm profile showed the ~6 s-of-task-time corpus stage
    TWICE per run; eager, it runs once: 6.1 → 4.5 s warm). The count
    also runs the signing as a regular 32-way cluster job instead of
    inside a broadcast-build thread. Per-CALL persist semantics are
    unchanged — every invocation still computes from the parquet
    inputs; nothing is reused across calls."""
    while cache:
        try:
            cache.pop().unpersist()
        except Exception:
            pass
    df = df.persist()
    df.count()
    cache.append(df)
    return df


def dhash_band_explode(bands: DataFrame) -> DataFrame:
    """(doc_id, b0..b3, bi, bv): each signature row fanned out to one
    row per (band index, band value) bucket key, the full signature
    riding along for the downstream exact-hamming verify. THE one copy
    of the band geometry the mm9 self-join and mm10's streaming screen
    share (r13 review: two drifting copies defeat the point of the
    shared _DUCK_PH_SIG_CHAIN oracle fragment)."""
    return bands.select(
        "doc_id",
        *[f"b{b}" for b in range(PH_BANDS)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("bi"), F.col(f"b{b}").alias("bv")
                    )
                    for b in range(PH_BANDS)
                ]
            )
        ).alias("e"),
    ).select(
        "doc_id",
        *[f"b{b}" for b in range(PH_BANDS)],
        F.col("e.bi").alias("bi"),
        F.col("e.bv").alias("bv"),
    )


def dhash_near_pairs(
    bands: DataFrame, max_hamming: int = 3, cache: list | None = None
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within ``max_hamming`` of 64 bits.

    Candidates: equi-join on (band index, band value) — by pigeonhole,
    any pair within hamming PH_BANDS - 1 = 3 differs in at most 3
    bands and therefore shares at least one exactly, so the bucket
    join finds ALL such pairs with ONE shuffle and no cross join
    (simhash_pairs' chunk-LSH argument, operators/dedup.py:765).
    Exact hamming (sum of per-band bit_count-of-xor) verifies.

    ``bands`` is persisted (single-slot, previous copy released — the
    minhash shingle-cache convention): both sides of the self-join
    consume it, and without the cache the upstream DECODE stage — the
    expensive part on real images — would run twice per action. The
    cached row is 5 longs, negligible next to the payloads it
    replaces. ``cache`` scopes the slot per signature FAMILY (r13
    verdict: a fourth single-slot user should scope, not share) —
    the audio fingerprints pass ``_AUD_BANDS_CACHE`` so the two
    modalities never evict each other across adjacent bench ranks."""
    if max_hamming > PH_BANDS - 1:
        raise ValueError(
            f"band-LSH only guarantees radius {PH_BANDS - 1} with {PH_BANDS} bands"
        )
    bands = single_slot_persist(
        _PH_BANDS_CACHE if cache is None else cache, bands
    )
    exploded = dhash_band_explode(bands)
    left = exploded.select(
        "bi", "bv", F.col("doc_id").alias("id_a"),
        *[F.col(f"b{b}").alias(f"a{b}") for b in range(PH_BANDS)],
    )
    right = exploded.select(
        "bi", "bv", F.col("doc_id").alias("id_b"),
        *[F.col(f"b{b}").alias(f"x{b}") for b in range(PH_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{b}").bitwiseXOR(F.col(f"x{b}")))
        for b in range(PH_BANDS)
    )
    return (
        left.join(right, on=["bi", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- audio fingerprint near-dup (r13 verdict #4: modality parity) ----
# Image has the full near-dup chain (mm9 batch pairs + mm10 streaming
# screen); this closes the audio side with the SAME geometry: real
# RIFF/WAVE container decode -> deterministic 64-bit fingerprint ->
# 4x16-bit bands -> banded-LSH bucket join -> exact hamming verify.
# The fingerprint is a 1-D energy-envelope dHash — bit k set iff
# frame-energy e[k] < e[(k+1) % 64], the integer-exact sign of the
# temporal energy derivative (the core comparison of Haitsma-Kalker
# audio fingerprinting, minus the FFT subbands a SQL oracle cannot
# restate; production swaps a spectral front-end in at this seam,
# the dHash-vs-pHash argument of image_dhash_bands).

AFP_GROUP = PH_GROUP  # docs per content group, image-fixture geometry
AFP_BUMP = 4096  # role-2 single-sample edit, wrapping uint16 space
AFP_MD5_BLOCKS = (AUD_FRAMES * AUD_CH * 2 + 15) // 16  # 256 bytes -> 16


def _neardup_wav_samples(doc_id: int):
    """Deterministic interleaved stereo int16 PCM with NEAR-DUP group
    structure — the audio twin of :func:`_neardup_pixels`, same roles:
    0/1 exact duplicates of the group base, 2 a single-SAMPLE edit
    (flips at most the 2 fingerprint bits whose comparisons touch that
    frame), 3/4 unrelated. Sample bytes are md5-derived for the same
    reason the image fixture's are: md5 content makes base streams
    independent (unrelated fingerprints sit ~32 bits apart; arithmetic
    formulas produced near-constant envelopes that collide), and both
    engines compute md5 identically so the oracle restates the raw
    samples. Sample s = big-endian uint16 of digest bytes (2s, 2s+1)
    minus 32768."""
    import hashlib

    import numpy as np

    role = doc_id % AFP_GROUP
    g = doc_id - role
    key = f"ag:{g}" if role <= 2 else f"au:{doc_id}"
    raw = b"".join(
        hashlib.md5(f"{key}:{blk}".encode()).digest()
        for blk in range(AFP_MD5_BLOCKS)
    )
    u = np.frombuffer(raw, dtype=">u2").astype(np.int64).copy()
    if role == 2:
        p = (g // AFP_GROUP) % (AUD_FRAMES * AUD_CH)
        u[p] = (u[p] + AFP_BUMP) % 65536
    return (u - 32768).astype(np.int16)


def with_neardup_audio_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): REAL RIFF/WAVE bytes carrying the near-dup
    fixture streams — odd ids get the odd-sized junk LIST chunk so the
    fingerprint chain exercises the chunk walk and pad-byte rule, like
    :func:`with_audio_payload`. Arrow-batched mapInPandas, partitioning
    inherited (no shuffle)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                encode_wav16(_neardup_wav_samples(int(d)), junk_chunk=bool(d % 2))
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(encode, AUDIO_PAYLOAD_SCHEMA)


def audio_fingerprint_bands(df: DataFrame) -> DataFrame:
    """Decode each WAV payload and emit its 64-bit energy-envelope
    fingerprint as FOUR 16-bit band values (b0..b3) — the same
    LSH-ready shape as :func:`image_dhash_bands`, so the banded pair
    join and its pigeonhole completeness argument are shared verbatim.

    Frame energy e[f] = l[f]² + r[f]² (integer-exact, no float); bit k
    is set iff e[k] < e[(k+1) % 64] (circular, so all 64 bits are real
    comparisons); band b packs bits [16b, 16b+16) at weight
    1 << (k % 16). A container-layout bug anywhere (chunk walk, pad
    byte, endianness, interleave) lands in the energies and fails the
    oracle hash."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = 1 << np.arange(PH_BAND_BITS, dtype=np.int64)
        for pdf in batches:
            out = {f"b{b}": [] for b in range(PH_BANDS)}
            for payload in pdf["payload"]:
                a, _rate = decode_wav16(bytes(payload))
                a64 = a.astype("int64")
                e = (a64 * a64).sum(axis=1)  # (frames,) l^2 + r^2
                bits = (e < np.roll(e, -1)).astype(np.int64)
                for b in range(PH_BANDS):
                    chunk = bits[PH_BAND_BITS * b : PH_BAND_BITS * (b + 1)]
                    out[f"b{b}"].append(int((chunk * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    **{k: pd.Series(v, dtype="int64") for k, v in out.items()},
                }
            )

    return df.select("doc_id", "payload").mapInPandas(hashes, PH_BANDS_SCHEMA)


# the audio family's own single slot (see dhash_near_pairs's cache
# param: modalities scope, not share)
_AUD_BANDS_CACHE: list = []


def audio_near_pairs(bands: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) audio near-dup pairs — the banded join of
    :func:`dhash_near_pairs` over audio fingerprint bands, with the
    audio family's own persist slot."""
    return dhash_near_pairs(bands, max_hamming=max_hamming, cache=_AUD_BANDS_CACHE)


# --- video near-dup (r14): the modality matrix's last cell ----------
# Image has mm9 pairs + mm10 screen, audio mm11 pairs + mm12 screen;
# this adds VIDEO near-dup pairs over the REAL Y4M container decode
# with the SAME banded geometry. The fingerprint is spatio-temporal:
# per frame, 8 integer block sums over the Y plane (3 px per block,
# VID_H*VID_W = 24 px), 64 values k = frame*8 + block, bit k set iff
# s[k] < s[(k+1) % 64] — the luma-derivative sign core of TIRI/
# Haitsma-Kalker-style video hashing; DCT/keyframe front-ends are the
# documented production seam (the dHash-vs-pHash argument again).

VFP_BUMP = 16  # role-2 single-PIXEL luma edit, wrapping uint8 space
_VFP_MD5_PER_FRAME = (3 * VID_H * VID_W + 15) // 16  # 72 bytes -> 5


def _neardup_video_frames(doc_id: int):
    """Deterministic (VID_FRAMES, 3, VID_H*VID_W) uint8 YUV444 clip
    with NEAR-DUP group structure — the video twin of
    :func:`_neardup_pixels` / :func:`_neardup_wav_samples`, same
    roles: 0/1 exact duplicates of the group base, 2 a single-PIXEL
    Y edit (changes ONE block sum, so at most the 2 fingerprint bits
    whose comparisons touch that block flip), 3/4 unrelated. Frame
    bytes are md5-derived (arithmetic formulas produce near-constant
    block sums that collide — the audio fixture's lesson); byte i of
    frame f is digest byte i % 16 of md5(key:f:(i // 16)), Y plane =
    bytes [0, 24), so the oracle restates every Y pixel."""
    import hashlib

    import numpy as np

    role = doc_id % PH_GROUP
    g = doc_id - role
    key = f"vg:{g}" if role <= 2 else f"vu:{doc_id}"
    n_px = VID_H * VID_W
    frames = []
    for f in range(VID_FRAMES):
        raw = b"".join(
            hashlib.md5(f"{key}:{f}:{b}".encode()).digest()
            for b in range(_VFP_MD5_PER_FRAME)
        )
        frames.append(
            np.frombuffer(raw[: 3 * n_px], dtype=np.uint8)
            .reshape(3, n_px)
            .copy()
        )
    a = np.stack(frames)  # (frames, 3, H*W)
    if role == 2:
        p = ((doc_id - 2) // PH_GROUP) % (VID_FRAMES * n_px)
        f, j = divmod(p, n_px)
        a[f, 0, j] = (int(a[f, 0, j]) + VFP_BUMP) % 256
    return a


def with_neardup_video_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): REAL YUV4MPEG2 bytes carrying the near-dup
    fixture clips. Arrow-batched mapInPandas, partitioning inherited
    (no shuffle)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                encode_y4m(_neardup_video_frames(int(d))) for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(encode, VIDEO_PAYLOAD_SCHEMA)


def video_fingerprint_bands(df: DataFrame) -> DataFrame:
    """Decode each Y4M payload and emit its 64-bit luma-envelope
    fingerprint as FOUR 16-bit band values (b0..b3) — the
    LSH-ready shape :func:`image_dhash_bands` and
    :func:`audio_fingerprint_bands` share, so the banded pair join
    and its pigeonhole completeness argument are shared verbatim.
    Block sum s[f*8+b] = Σ of the 3 Y bytes of block b in frame f
    (integer-exact); bit k set iff s[k] < s[(k+1) % 64]. A container
    bug anywhere (stream header, FRAME marker walk, plane order)
    lands in the sums and fails the oracle hash."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = 1 << np.arange(PH_BAND_BITS, dtype=np.int64)
        for pdf in batches:
            out = {f"b{b}": [] for b in range(PH_BANDS)}
            for payload in pdf["payload"]:
                a = decode_y4m(bytes(payload))  # (frames, 3, H, W)
                y = a[:, 0].reshape(VID_FRAMES, -1).astype("int64")
                s = y.reshape(VID_FRAMES, 8, -1).sum(axis=2).ravel()
                bits = (s < np.roll(s, -1)).astype(np.int64)
                for b in range(PH_BANDS):
                    chunk = bits[PH_BAND_BITS * b : PH_BAND_BITS * (b + 1)]
                    out[f"b{b}"].append(int((chunk * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    **{k: pd.Series(v, dtype="int64") for k, v in out.items()},
                }
            )

    return df.select("doc_id", "payload").mapInPandas(hashes, PH_BANDS_SCHEMA)


# the video family's own single slot (modalities scope, not share)
_VID_BANDS_CACHE: list = []


def video_near_pairs(bands: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) video near-dup pairs — the banded join of
    :func:`dhash_near_pairs` over video fingerprint bands, with the
    video family's own persist slot."""
    return dhash_near_pairs(bands, max_hamming=max_hamming, cache=_VID_BANDS_CACHE)
