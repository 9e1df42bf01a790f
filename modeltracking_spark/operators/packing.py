"""Sequence packing for LLM pretraining pipelines.

After dedup + sampling, documents are packed into fixed-length training
sequences (context windows). Two standard strategies, both deterministic:

- ``chunk`` (GPT-style concat-and-chunk): documents are concatenated in
  a canonical order and the stream is cut every ``max_len`` tokens;
  documents may straddle cut points. Pure window arithmetic — one
  shuffle on the bucket key, fully SQL-expressible (oracled).
- ``greedy`` (first-fit within bucket): documents are placed in order
  into the current sequence until it would overflow, then a new
  sequence starts; documents never straddle. The running-reset scan is
  not expressible as a plain window (it needs a stateful fold), so it
  runs as ``applyInPandas`` per bucket — tested against a pure-Python
  reference implementation.

Both pack *within a bucket column* (e.g. ``source``, or a hash bucket
from :mod:`modeltracking_spark.operators.sampling`): a single global
ordering would serialize at 100 TB, while per-bucket packing shuffles
once on the bucket key and scales with the number of buckets. No
reference analog (extension tier per the brief's training-data scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunk(
    df: DataFrame,
    id_col: str,
    len_col: str,
    bucket_col: str,
    max_len: int,
) -> DataFrame:
    """Concat-and-chunk packing: each doc's start offset in its bucket's
    concatenated token stream decides its pack. Adds:

    - ``start_off``: running token offset of the doc within its bucket
      (exclusive prefix sum in (bucket, id) order)
    - ``pack_id``: ``floor(start_off / max_len)``
    - ``pack_off``: offset of the doc inside its pack
    """
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(len_col)).over(w)
    return (
        df.withColumn("start_off", cum - F.col(len_col))
        .withColumn(
            "pack_id", F.floor(F.col("start_off") / F.lit(max_len))
        )
        .withColumn("pack_off", F.col("start_off") % F.lit(max_len))
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    len_col: str,
    bucket_col: str,
    max_len: int,
) -> DataFrame:
    """First-fit packing: in (bucket, id) order, append each doc to the
    open sequence unless it would exceed ``max_len``; docs longer than
    ``max_len`` get a sequence of their own. Adds ``pack_id`` and
    ``pack_off`` (offset inside the pack); docs never straddle packs.

    Stateful scan per bucket via applyInPandas (Arrow, one shuffle on
    the bucket key). Each bucket's rows must fit one task — true by
    construction when buckets are hash-sized (sampling.N_BUCKETS).
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    # passthrough columns keep their input types (an int hash bucket from
    # sampling.hash_bucket is as valid a bucket as a string source label)
    in_fields = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [in_fields[bucket_col], in_fields[id_col], in_fields[len_col]]
        + [
            StructField("pack_id", LongType()),
            StructField("pack_off", LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        pack_id, fill = 0, 0
        ids, offs = [], []
        for ln in pdf[len_col]:
            ln = int(ln)
            if fill > 0 and fill + ln > max_len:
                pack_id, fill = pack_id + 1, 0
            ids.append(pack_id)
            offs.append(fill)
            fill += ln
            if fill >= max_len:
                pack_id, fill = pack_id + 1, 0
        out = pdf[[bucket_col, id_col, len_col]].copy()
        out["pack_id"] = ids
        out["pack_off"] = offs
        return out

    return (
        df.select(bucket_col, id_col, len_col)
        .groupBy(bucket_col)
        .applyInPandas(_pack, schema)
    )
