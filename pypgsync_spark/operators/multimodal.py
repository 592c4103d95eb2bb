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


def decode_image(payload: bytes) -> "object":
    """Decode an image payload into an array. STUB: media codecs are
    not available in this environment; deployments plug in PIL/ffmpeg
    here. The Spark plumbing around this seam is fully tested."""
    raise NotImplementedError("media decoding requires an image library at deploy time")


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
