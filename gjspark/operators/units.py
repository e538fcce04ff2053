"""Unit conversion (reference operator P11, ``utils/UnitConverter.java:58-91``).

The reference looks up a (from, to) factor and multiplies (or divides for
the inverse direction). Spark translation: the conversion table is a tiny
dimension — broadcast join + one multiply, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversion_table(spark, conversions: dict[tuple[str, str], float]) -> DataFrame:
    """{(from, to): factor} -> DataFrame, with inverse directions added
    (``UnitConverter.java:80-88`` falls back to dividing by the reverse
    factor)."""
    rows = []
    for (u_from, u_to), factor in conversions.items():
        rows.append((u_from, u_to, float(factor)))
        if (u_to, u_from) not in conversions:
            rows.append((u_to, u_from, 1.0 / float(factor)))
    return spark.createDataFrame(
        rows, "unit_from string, unit_to string, factor double"
    )


def convert_units(
    df: DataFrame,
    table: DataFrame,
    value_col: str = "value",
    from_col: str = "unit",
    to_unit: str | None = None,
    to_col: str | None = None,
) -> DataFrame:
    """Append ``value_converted`` (NULL when no conversion path exists,
    like the reference returning null on unknown pairs)."""
    to_expr = F.col(to_col) if to_col else F.lit(to_unit)
    t = F.broadcast(table)
    joined = df.join(
        t,
        (df[from_col] == t["unit_from"]) & (to_expr == t["unit_to"]),
        "left",
    )
    same = df[from_col] == to_expr
    return joined.withColumn(
        "value_converted",
        F.when(same, F.col(value_col)).otherwise(
            F.col(value_col) * F.col("factor")
        ),
    ).drop("unit_from", "unit_to", "factor")
