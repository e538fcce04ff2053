"""The engine's one cross-engine-deterministic hash primitive.

``md5_prefix32``: the big-endian integer of the first 8 hex chars of
``md5(expr)`` — chosen because Spark (``conv(substr(md5(x),1,8),16,10)``)
and DuckDB (``('0x' || substr(md5(x),1,8))::BIGINT``) produce the
bit-identical value, which is what lets every hash-based operator
(HLL registers, Bloom positions, sample membership, split assignment)
carry an exact SQL twin. Widening to a 64-bit prefix (the >=10^8
cardinality scale path) is a change to THESE two functions and the
twins that call them — nowhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix32(col: Column) -> Column:
    """Column -> deterministic 32-bit hash (0 .. 2^32-1) as long."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_prefix32_sql(expr: str) -> str:
    """The DuckDB twin of :func:`md5_prefix32` over a SQL expression."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"
