"""HyperLogLog sketch: accuracy bands, register mergeability, pure-JVM
plan shape, and the engine/SQL-twin bit-equality the contract relies on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gjspark.operators.sketches import (
    approx_distinct_hll,
    approx_distinct_sql_twin,
    hll_registers,
    linear_counting_table,
)


def _ids(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("val")
    )


class TestHLL:
    @pytest.mark.parametrize("n", [50, 300, 2000, 20000])
    def test_accuracy_band(self, spark, n):
        # m=256 -> sigma ~6.5%; 4 sigma = 26% is a safe deterministic band
        out = approx_distinct_hll(_ids(spark, n), "val").collect()[0]
        assert abs(out["estimate"] / n - 1) < 0.26

    def test_exact_integer_state_matches_duckdb(self, spark):
        df = _ids(spark, 777)
        eng = approx_distinct_hll(df, "val").collect()[0]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT concat('v', range) AS val FROM range(777)"
        )
        twin = con.execute(approx_distinct_sql_twin("t", "val")).fetchone()
        assert (eng["n_buckets"], eng["harmonic_sum_scaled"]) == twin[:2]
        assert eng["estimate"] == twin[2]

    def test_registers_merge(self, spark):
        """max-merge of two halves' registers == whole-corpus registers
        (what a multi-stage / streaming rollup does)."""
        whole = {
            r["bucket"]: r["m_reg"]
            for r in hll_registers(_ids(spark, 1000), "val").collect()
        }
        h1 = hll_registers(_ids(spark, 500), "val")
        h2 = hll_registers(
            spark.range(500, 1000).select(
                F.concat(F.lit("v"), F.col("id")).alias("val")
            ),
            "val",
        )
        merged = {
            r["bucket"]: r["m_reg"]
            for r in h1.unionByName(h2)
            .groupBy("bucket")
            .agg(F.max("m_reg").alias("m_reg"))
            .collect()
        }
        assert merged == whole

    def test_grouped(self, spark):
        df = spark.range(600).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.concat(F.lit("u"), (F.col("id") % 150)).alias("val"),
        )
        rows = {
            r["g"]: r["estimate"]
            for r in approx_distinct_hll(df, "val", ("g",)).collect()
        }
        assert set(rows) == {"0", "1", "2"}
        for est in rows.values():
            assert abs(est / 50 - 1) < 0.3

    def test_duplicates_do_not_move_estimate(self, spark):
        a = approx_distinct_hll(_ids(spark, 400), "val").collect()[0]
        dup = _ids(spark, 400).unionAll(_ids(spark, 400))
        b = approx_distinct_hll(dup, "val").collect()[0]
        assert a["estimate"] == b["estimate"]
        assert a["harmonic_sum_scaled"] == b["harmonic_sum_scaled"]

    def test_no_python_stage(self, spark):
        plan = approx_distinct_hll(
            _ids(spark, 10), "val"
        )._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_p_validation(self, spark):
        with pytest.raises(ValueError):
            hll_registers(_ids(spark, 10), "val", p=2)

    def test_lc_table_values(self):
        import math

        t = linear_counting_table(8)
        assert len(t) == 256
        assert t[255] == 0.0  # V = m -> ln(1) = 0
        assert t[0] == 256 * math.log(256.0)
