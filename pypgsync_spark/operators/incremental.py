"""Incremental dedup — dedup a DELTA against an existing corpus.

At 100 TB nobody re-deduplicates the whole corpus per ingest batch: the
operational contract is "collapse the incoming batch internally, then
drop everything the corpus already has". That is two relational steps,
both fingerprint-keyed:

1. intra-delta collapse: one keeper per normalized-content fingerprint,
   min id wins (same deterministic rule as operators/dedup.dedup_exact);
2. corpus screen: LEFT ANTI join of the keepers against the corpus's
   fingerprint set.

Plan shape: the anti join shuffles both sides on the fingerprint — the
corpus side ships ONLY (fingerprint) after column pruning, and when the
delta is small relative to the corpus (the normal case) Spark/AQE can
instead broadcast the delta-side build. No pass ever touches corpus
text; the fingerprint column is the only thing read (at deploy scale it
would be a precomputed, bucketed column of the corpus table, making the
screen a no-shuffle bucket join — the same layout trick as
sources/bucketed.py).

The near-dup analogue composes the same screen with signature buckets:
minhash-band keys (operators/dedup.minhash_lsh_pairs' banding) replace
the fingerprint, delta bands semi-join corpus bands, and only colliding
pairs get verified — still delta-proportional work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pypgsync_spark.functions.text import content_fingerprint


def incremental_dedup_exact(
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``delta`` that survive exact dedup against ``corpus``
    (and against the rest of the delta — min ``id_col`` keeps).

    Output: the surviving delta rows, original columns.
    """
    fp = content_fingerprint(F.col(text_col))
    d = delta.withColumn("__fp", fp)
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    keepers = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    corpus_fps = corpus.select(fp.alias("__fp"))
    return keepers.join(corpus_fps, on="__fp", how="left_anti").drop("__fp")
