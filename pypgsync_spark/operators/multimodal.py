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
