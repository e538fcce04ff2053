"""CSV source -> point features DataFrame (reference operator S2).

Parity target: ``geojson/CsvLoaderOptions.java:96-142`` — options for
delimiter (';'/tab), header presence, comment marker, rowSkip and charset;
two axis columns become a Point geometry (with CRS transform + HALF_EVEN
rounding, ``CsvLoaderOptions.java:126``); every column lands in
``properties``; headerless files use positional keys ``"0","1",...``
(``:131-136``). Decimal-comma numbers are normalized like
``utils/UnitConverter.java:107-120``.

Spark-first: ``spark.read.csv`` handles delimiter/header/comment/charset
natively (distributed, pushdown-friendly); the axis->WGS84 point transform
is one vectorized pandas UDF; rowSkip is an ``offset`` on a monotonic id.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gjspark.sources.geojson import FEATURES_SCHEMA
from gjspark.functions import geometry as G
from gjspark.functions.crs import parse_crs, round_half_even, to_wgs84


def normalize_decimal_sql(col):
    """`1.234,56` -> `1234.56` as Column ops (UnitConverter.java:107-120)."""
    return F.when(
        col.rlike(r",\d+$"),
        F.regexp_replace(F.regexp_replace(col, r"\.", ""), ",", "."),
    ).otherwise(col)


def read_csv_points(
    spark: SparkSession,
    path: str,
    x_col: str,
    y_col: str,
    sep: str = ";",
    header: bool = True,
    comment: str = "#",
    charset: str = "UTF-8",
    row_skip: int = 0,
    crs: str | None = None,
    crs_col: str | None = None,
    flip: bool = False,
    number_scale: int = 6,
) -> DataFrame:
    reader = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("comment", comment)
        .option("encoding", charset)
    )
    if row_skip:
        # positional semantics need within-file row order. multiLine CSVs
        # are unsplittable, so each file is GUARANTEED to be one split —
        # the ordering holds by construction even for files larger than
        # spark.sql.files.maxPartitionBytes (files stay the parallelism
        # unit, which the per-file skip window needs anyway).
        reader = reader.option("multiLine", "true")
    df = reader.csv(path)
    if not header:
        df = df.toDF(*[str(i) for i in range(len(df.columns))])
    prop_cols = list(df.columns)
    # rowSkip is PER FILE positional (CsvLoaderOptions.java:118): drop the
    # first N data rows of each input file. Window partitioned by file —
    # one task per file (parallel across files), never a global total
    # sort. Within a file, monotonically_increasing_id follows split
    # order (single split per file when row_skip is active, see above).
    if row_skip:
        from pyspark.sql import Window

        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > row_skip)
            .drop("__rn")
        )

    norm_x = normalize_decimal_sql(F.col(x_col))
    norm_y = normalize_decimal_sql(F.col(y_col))
    df = df.withColumn("__x", norm_x.cast("double")).withColumn(
        "__y", norm_y.cast("double")
    )
    crs_expr = F.col(crs_col) if crs_col else F.lit(crs)
    df = df.withColumn("__crs", crs_expr)
    df = df.withColumn(
        "properties",
        F.to_json(F.struct(*[F.col(c) for c in sorted(prop_cols)])),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = 0
        for pdf in batches:
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "feature_id": pdf[prop_cols[0]].astype(str),
                    "feature_idx": np.arange(base, base + n, dtype=np.int64),
                    "geom_type": "Point",
                    "properties": pdf["properties"],
                    "source_file": path,
                }
            )
            lon = np.full(n, np.nan)
            lat = np.full(n, np.nan)
            for code, grp in pdf.groupby(pdf["__crs"].map(parse_crs), dropna=False):
                idx = grp.index.to_numpy() - pdf.index[0]
                x = grp["__x"].to_numpy(dtype=np.float64)
                y = grp["__y"].to_numpy(dtype=np.float64)
                if flip:
                    x, y = y, x
                epsg = None if (code is None or (isinstance(code, float) and np.isnan(code))) else int(code)
                lo, la = to_wgs84(x, y, epsg)
                lon[idx] = round_half_even(lo, number_scale)
                lat[idx] = round_half_even(la, number_scale)
            out["lon"] = lon
            out["lat"] = lat
            out["geometry"] = [G.point_wkb(a, b) for a, b in zip(lon, lat)]
            base += n
            yield out[[f.name for f in FEATURES_SCHEMA.fields]]

    return df.mapInPandas(build, FEATURES_SCHEMA)
