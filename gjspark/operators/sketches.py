"""Cardinality sketches for training-data pipelines (graft-cell
requirement; no reference analogue — the importer counts exactly, which
does not exist at 10^12 rows).

HyperLogLog (Flajolet et al. 2007) as PURE Column expressions — no UDF,
no collect. The register build is an ordinary two-level aggregation
(map-side combine on (group, bucket) then max), so it shuffles at most
``groups x m`` tiny rows no matter how many input rows there are; the
estimator is one more groupBy over those registers. Registers are
mergeable by construction (max), which is exactly what a 1000-executor
rollup needs.

Determinism across engines (the contract gate) is by construction:

- the hash is the big-endian integer of the first 8 hex chars of
  ``md5(value)`` — Spark ``conv(substr(md5(x),1,8),16,10)``, DuckDB
  ``('0x' || substr(md5(x),1,8))::BIGINT`` — bit-identical;
- rho uses ``length(bin(w))`` (integer bit-length) rather than
  ``floor(log2(w))`` — no floating point anywhere in the sketch state;
- the harmonic sum is kept as an exact INTEGER ``sum(2^(K-M))`` (scaled
  by 2^K), so the only float op is one final literal/Sint division that
  both engines perform identically under IEEE-754;
- the linear-counting branch looks up a PRECOMPUTED table of the m
  possible ``m*ln(m/V)`` values (generated once in Python and embedded
  as literals in both the Column expression and the SQL twin), so no
  cross-engine ``ln`` ulp divergence can leak into the result.

The p=8 / 32-bit-hash configuration is the oracle-parity default; the
same code takes any p <= 24. Beyond ~10^8 distinct values per group a
64-bit hash variant (swap the md5 substring width) is the scale path —
the 32-bit hash saturates, which is a hash-width property, not a plan
property.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gjspark.functions.hashing import md5_prefix32, md5_prefix32_sql


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def linear_counting_table(p: int = 8) -> list[float]:
    """lc[V-1] = m * ln(m / V) for V = 1..m (V = number of empty
    registers). Embedded as literals on both engine and oracle side."""
    m = 1 << p
    return [m * math.log(m / v) for v in range(1, m + 1)]


def bucket_rho_exprs(value_col: str, p: int = 8) -> tuple[Column, Column]:
    """The (bucket, rho) Column pair shared by the batch register build
    and the streaming windowed one (streaming/sketches.py).

    bucket = top ``p`` bits of the 32-bit hash; rho = 1 + number of
    leading zeros in the remaining ``32-p`` bits (1..33-p)."""
    if not 4 <= p <= 24:
        raise ValueError("p must be in [4, 24]")
    wbits = 32 - p
    h = md5_prefix32(F.col(value_col).cast("string"))
    bucket = F.shiftrightunsigned(h, wbits).alias("bucket")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .alias("rho")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """-> one row per (group, bucket) with the max-rho register value."""
    bucket, rho = bucket_rho_exprs(value_col, p)
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )


def estimate_from_registers(
    regs: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """Fold a register frame (group..., bucket, m_reg) into estimates —
    the second half of :func:`approx_distinct_hll`, split out so
    register frames from OTHER producers (the streaming windowed build,
    a persisted register table, a union of per-day sketches max-merged
    by bucket) reuse the identical estimator."""
    m = 1 << p
    K = 33 - p  # scale exponent: 2^(K - M) >= 1 for M <= K
    gb = regs.groupBy(*group_cols) if group_cols else regs.groupBy()
    agg = gb.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr(f"cast(shiftleft(1L, {K} - m_reg) as bigint)")).alias("s_present"),
    )
    # empty registers contribute 2^-0 = 1 each -> 2^K scaled
    sint = (
        F.col("s_present") + (F.lit(m) - F.col("n_buckets")) * F.lit(1 << K)
    ).alias("harmonic_sum_scaled")
    c_lit = _alpha(m) * m * m * float(1 << K)  # one literal, one division
    lc = linear_counting_table(p)
    lc_arr = F.array(*[F.lit(v) for v in lc])
    out = agg.select(
        *group_cols,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        sint,
    )
    raw = F.lit(c_lit) / F.col("harmonic_sum_scaled")
    v_empty = F.lit(m) - F.col("n_buckets")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.element_at(lc_arr, v_empty.cast("int")),
    ).otherwise(raw)
    return out.withColumn(
        "estimate", F.floor(est * F.lit(1000.0) + F.lit(0.5)) / F.lit(1000.0)
    )


def approx_distinct_hll(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """-> per group: (n_buckets, harmonic_sum_scaled, estimate).

    estimate = alpha_m * m^2 / sum(2^-M[j]), with Flajolet's
    small-range linear-counting correction when raw <= 2.5m and empty
    registers exist. ``harmonic_sum_scaled`` = the exact integer
    ``2^K * sum(2^-M)`` (K = 33-p) that the estimate divides into — kept
    in the output so a regression anywhere in the register pipeline is
    visible as an integer mismatch, not a float blur.
    """
    return estimate_from_registers(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


# ---------------------------------------------------------------------------
# Bloom filter membership (the crawl-dedup primitive: "was this id/url/
# doc in the previous snapshot?") — formulated relationally: the filter
# is a DataFrame of SET BIT POSITIONS (<= m_bits rows no matter how many
# build rows), membership is a position join. No driver-side bitmap, no
# collect; Spark broadcasts the position table when small and
# shuffle-joins it when not — exactly the right physical plan at either
# scale, chosen by AQE, not by us.
# ---------------------------------------------------------------------------


def _bloom_pos_cols(value_col: str, m_bits: int, k: int, salt: str):
    """k deterministic bit positions per value: 32-bit md5-prefix hash of
    '{salt}:{i}:{value}', low bits (m_bits is a power of two — the mod
    is exact bit masking, no bias)."""
    return [
        md5_prefix32(
            F.concat(F.lit(f"{salt}:{i}:"), F.col(value_col).cast("string"))
        ).bitwiseAND(F.lit(m_bits - 1))
        for i in range(k)
    ]


def _check_bloom_params(m_bits: int, k: int) -> None:
    if m_bits < 2 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two >= 2")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")


def bloom_bits(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter: -> one-column frame ``pos`` of distinct set bit
    positions. By construction <= m_bits rows (8 bytes each), whatever
    the build-side row count — the shuffle is k x n position ints into a
    distinct, then the result is a dimension table."""
    _check_bloom_params(m_bits, k)
    return (
        df.select(
            F.explode(F.array(*_bloom_pos_cols(value_col, m_bits, k, salt))).alias(
                "pos"
            )
        )
        .distinct()
    )


def bloom_membership(
    df: DataFrame,
    bits: DataFrame,
    value_col: str,
    id_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Probe: -> (id, bloom_hit). A row hits iff ALL k of its positions
    are set — guaranteed true for every value the filter was built from
    (no false negatives); false-positive rate ~= (1 - e^(-k*n/m))^k.

    Plan shape: explode k positions per probe row, left-semi-count join
    against the bit table, hit = matched == k. The bit table broadcasts
    when small; either way the probe side never moves its payload —
    only (id, pos) pairs.

    ``bits`` is re-deduplicated here, so naively UNIONed position
    tables (the relational analogue of OR-ing bloom bitmaps — e.g.
    day-1 and day-2 filters concatenated without a distinct) cannot
    double-count a position and turn an inserted value into a false
    negative."""
    _check_bloom_params(m_bits, k)
    pos = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array(*_bloom_pos_cols(value_col, m_bits, k, salt))).alias(
            "pos"
        ),
    )
    bits_d = bits.select("pos").distinct()
    hits = (
        pos.join(bits_d.select(F.col("pos"), F.lit(1).alias("__set")), "pos", "left")
        .groupBy("__id")
        .agg((F.count("__set") == k).alias("bloom_hit"))
    )
    return hits.select(F.col("__id").alias(id_col), "bloom_hit")


def bloom_sql_twin(
    build_expr: str,
    probe_expr: str,
    value_col: str,
    id_col: str,
    m_bits: int,
    k: int,
    salt: str = "bloom",
) -> str:
    """DuckDB twin: same positions, same distinct-bit set, same all-k
    membership rule."""
    _check_bloom_params(m_bits, k)

    def pos(i: int, v: str) -> str:
        h = md5_prefix32_sql(f"'{salt}:{i}:' || ({v})::VARCHAR")
        return f"({h} & {m_bits - 1})"

    build_rows = " UNION ALL ".join(
        f"SELECT {pos(i, value_col)} AS pos FROM {build_expr}" for i in range(k)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {id_col} AS pid, {pos(i, value_col)} AS pos FROM {probe_expr}"
        for i in range(k)
    )
    return f"""
WITH bits AS (SELECT DISTINCT pos FROM ({build_rows})),
probe AS ({probe_rows}),
hits AS (
  SELECT probe.pid, count(bits.pos) = {k} AS bloom_hit
  FROM probe LEFT JOIN bits USING (pos)
  GROUP BY probe.pid
)
SELECT pid AS {id_col}, bloom_hit FROM hits
"""


def approx_distinct_sql_twin(
    table_expr: str,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> str:
    """The DuckDB twin of :func:`approx_distinct_hll` — same hash, same
    integer register math, same embedded linear-counting literals."""
    m = 1 << p
    wbits = 32 - p
    K = 33 - p
    c_lit = _alpha(m) * m * m * float(1 << K)
    lc = ", ".join(repr(v) for v in linear_counting_table(p))
    gsel = "".join(f"{g}, " for g in group_cols)
    gby = ", ".join(group_cols) if group_cols else ""
    gby_regs = f"GROUP BY {gsel}bucket".rstrip(", ")
    gby_agg = f"GROUP BY {gby}" if gby else ""
    return f"""
WITH h AS (
  SELECT {gsel}{md5_prefix32_sql(f"({value_col})::VARCHAR")} AS hv
  FROM {table_expr}
),
b AS (
  SELECT {gsel}hv // {1 << wbits} AS bucket,
         CASE WHEN hv % {1 << wbits} = 0 THEN {wbits + 1}
              ELSE {wbits + 1} - length(bin(hv % {1 << wbits})) END AS rho
  FROM h
),
regs AS (
  SELECT {gsel}bucket, max(rho) AS m_reg FROM b {gby_regs}
),
agg AS (
  SELECT {gsel}count(*)::BIGINT AS n_buckets,
         sum((1::BIGINT << ({K} - m_reg)))::BIGINT AS s_present
  FROM regs {gby_agg}
),
s AS (
  SELECT {gsel}n_buckets,
         s_present + ({m} - n_buckets) * {1 << K} AS harmonic_sum_scaled
  FROM agg
),
est AS (
  SELECT {gsel}n_buckets, harmonic_sum_scaled,
         CASE WHEN {c_lit!r} / harmonic_sum_scaled <= {2.5 * m!r}
                   AND {m} - n_buckets > 0
              THEN ([{lc}])[({m} - n_buckets)::INT]
              ELSE {c_lit!r} / harmonic_sum_scaled END AS e
  FROM s
)
SELECT {gsel}n_buckets, harmonic_sum_scaled,
       floor(e * 1000.0 + 0.5) / 1000.0 AS estimate
FROM est
"""
