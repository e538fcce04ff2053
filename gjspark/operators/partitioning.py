"""Degenerate-split guard shared by CPU-heavy operators.

A small parquet table is one or two input splits, and Spark runs maps —
including every vectorized Python kernel — on the scan partitioning, so
a heavy UDF over a single-file table serializes on one or two cores.
Worse, a broadcast join keeps the probe side's partitioning, so the
degeneracy flows through explode -> join -> filter chains untouched
(measured: the simhash band join emitted ~88M rows on two cores,
17.5 s vs ~4 s spread at sf1.0; the ANN matmul was 18-49 s on one core
vs ~1-4 s spread).

Real lake tables split by target file size (128 MB-1 GB), so the guard
is a no-op at scale: it fires only when the scan yields fewer splits
than ``defaultParallelism``, i.e. exactly when the cluster would
otherwise idle. The round-robin repartition is deterministic in result
terms for all callers here — every guarded operator is row-independent
or aggregation-commutative (partitioning-independence is pytest- and
oracle-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_degenerate_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to cluster parallelism iff its current
    partitioning would leave cores idle (see module docstring)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df
