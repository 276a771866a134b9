"""Chunking stage: text → (url, chunk_id, chunk_text) rows.

Arrow UDF over the whole document (chunking is inherently sequential per
doc — the reference walks sentences with carry-over state,
text_utils.py:26-87), then ``posexplode`` so chunk lineage is a plain
column.  Chunk ids are 1-based (reference main.py:133-134).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from kgspark.kernels.textproc import chunk_text


def chunk_pages(pages: DataFrame, chunk_size: int = 100, overlap: int = 20) -> DataFrame:
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: chunk_text(t or "", max_length=chunk_size, overlap=overlap)
        )

    keep = [c for c in pages.columns if c in ("url", "bucket", "warc_ts", "lang")]
    return (
        pages.select(*keep, F.posexplode(chunk_udf(F.col("text"))).alias("_pos", "chunk_text"))
        .withColumn("chunk_id", (F.col("_pos") + F.lit(1)).cast("int"))
        .drop("_pos")
    )
