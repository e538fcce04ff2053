"""Text/URL source (reference operator S3, ``utils/UrlUtils.java:51-90``).

The reference fetches a document over HTTP GET or reads a local file,
charset-aware. This sandbox has no network, so http(s) URLs raise with a
clear message; ``file://`` URLs and plain paths read distributed via
Spark's text/binaryFile sources (wholetext preserves document structure
for downstream JSON parsing).
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_source(
    spark: SparkSession,
    url: str,
    charset: str = "UTF-8",
    whole: bool = True,
) -> DataFrame:
    """-> DataFrame[path string, text string]."""
    parsed = urlparse(url)
    if parsed.scheme in ("http", "https"):
        raise NotImplementedError(
            "network fetch is unavailable in this environment; mirror the "
            "URL to a mounted path (the reference's UrlUtils.java:51-90 "
            "HTTP branch maps to a driver-side fetch + distributed parse)"
        )
    path = parsed.path if parsed.scheme == "file" else url
    if whole:
        return (
            spark.read.format("binaryFile")
            .load(path)
            .select(
                "path",
                F.decode(F.col("content"), charset).alias("text"),
            )
        )
    return (
        spark.read.option("encoding", charset)
        .text(path)
        .select(F.lit(path).alias("path"), F.col("value").alias("text"))
    )
