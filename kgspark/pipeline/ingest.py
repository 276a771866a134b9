"""Pages ingestion: scan, deterministic text extraction, url-hash
bucketing and hot-domain salting.

Input table shape (BASELINE.json input_hint):
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Scale design: downstream stages are keyed by ``url`` (the reference
pipeline is per-document: one doc per run — main.py:288-298), so the only
corpus-wide shuffle risk at ingest is *input skew* by domain.  We bucket by
``xxhash64(url)`` (uniform) and additionally salt hot domains when
repartitioning (reference analog: size-staged processing,
kg_generation_plan.py:16-48 — replaced by salting + AQE).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from kgspark.config import KgConfig
from kgspark.kernels.html_extract import extract_text

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper of the deterministic extraction kernel
    (reference analog: data_processor.py:88-119 XML walk + :64-86 cleanup).
    """
    return html.map(extract_text)


@F.pandas_udf(T.StringType())
def t2s_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched Traditional→Simplified conversion (S-6; reference
    analog: data_processor.py:47-62 OpenCC t2s before chunking)."""
    from kgspark.kernels.textproc import t2s_convert
    return text.map(lambda t: t2s_convert(t) if t is not None else None)


def with_t2s(pages: DataFrame) -> DataFrame:
    """Apply t2s to the ``text`` column (config-gated off by default —
    the parity configuration matches a Simplified-script corpus)."""
    return pages.withColumn("text", t2s_udf(F.col("text")))


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table.  Iceberg when the catalog/jars are present,
    parquet layout otherwise (same schema, same downstream plan)."""
    if path.startswith("iceberg:"):
        return spark.read.format("iceberg").load(path[len("iceberg:"):])
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """Replace ``text`` with the kernel output over ``html``.

    The per-row invariant (kernel(html) byte-identical to the shipped
    ``text`` per url) is asserted in tests; production path trusts the
    kernel so the pipeline works on html-only corpora.
    """
    return pages.withColumn("text", extract_text_udf(F.col("html")))


def with_bucket(pages: DataFrame, num_buckets: int) -> DataFrame:
    """Add the url-hash partition/lineage bucket column."""
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)).cast("int")
    )


def domain_of(col):
    return F.regexp_extract(col, r"^[a-z]+://([^/]+)", 1)


def repartition_salted(
    pages: DataFrame, cfg: KgConfig, num_partitions: int | None = None
) -> DataFrame:
    """Repartition by url hash with extra salt on hot domains.

    Hot domains (> cfg.hot_domain_threshold pages) get a per-url salt so a
    single domain cannot pin one partition; everything else hashes by
    domain+bucket which keeps per-domain locality for cheaper later
    dedup/linking within a domain.
    """
    n = num_partitions or pages.sparkSession.sparkContext.defaultParallelism
    hot = (
        pages.groupBy(domain_of(F.col("url")).alias("domain"))
        .count()
        .filter(F.col("count") > cfg.hot_domain_threshold)
        .select("domain")
    )
    with_dom = pages.withColumn("_domain", domain_of(F.col("url")))
    marked = with_dom.join(
        F.broadcast(hot.withColumn("_hot", F.lit(True))),
        with_dom["_domain"] == hot["domain"],
        "left",
    ).drop("domain")
    salted = marked.withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_partitions)),
        ).otherwise(F.lit(0)),
    )
    return (
        salted.repartition(n, F.col("_domain"), F.col("_salt"), F.col("url"))
        .drop("_domain", "_hot", "_salt")
    )


def with_header(pages: DataFrame, header) -> DataFrame:
    """S-7: prepend a per-document header line to the text before
    chunking (reference data_processor.py:207-208 — title + blank line
    ahead of the body; the header participates in chunk 1 and so in
    extraction).  ``header`` is any Column expression (e.g. built from
    url/warc_ts)."""
    return pages.withColumn(
        "text",
        F.concat(header, F.lit("\n\n"), F.coalesce(F.col("text"), F.lit(""))),
    )
