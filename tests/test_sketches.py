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


class TestBloom:
    def test_no_false_negatives_and_fp_band(self, spark):
        from gjspark.operators.sketches import bloom_bits, bloom_membership

        m_bits, k = 4096, 3
        a = _ids(spark, 400, "a")          # build side
        b = _ids(spark, 2000, "x")         # disjoint probe side
        bits = bloom_bits(a, "val", m_bits, k)
        assert bits.count() <= m_bits
        hits_a = bloom_membership(
            a.select(F.col("val").alias("id"), "val"), bits, "val", "id",
            m_bits, k,
        )
        assert hits_a.filter(~F.col("bloom_hit")).count() == 0  # exact
        hits_b = bloom_membership(
            b.select(F.col("val").alias("id"), "val"), bits, "val", "id",
            m_bits, k,
        )
        fp = hits_b.filter(F.col("bloom_hit")).count() / 2000
        # expected (1 - e^(-kn/m))^k ~= 1.7%; 4x head room
        assert fp < 0.07

    def test_matches_duckdb_twin(self, spark):
        from gjspark.operators.sketches import (
            bloom_bits,
            bloom_membership,
            bloom_sql_twin,
        )

        df = _ids(spark, 300)
        bits = bloom_bits(df, "val", 512, 4)
        eng = {
            r["id"]: r["bloom_hit"]
            for r in bloom_membership(
                _ids(spark, 600).select(F.col("val").alias("id"), "val"),
                bits, "val", "id", 512, 4,
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE a AS SELECT concat('v', range) AS val FROM range(300)"
        )
        con.execute(
            "CREATE TABLE b AS SELECT concat('v', range) AS id,"
            " concat('v', range) AS val FROM range(600)"
        )
        twin = dict(
            con.execute(
                bloom_sql_twin("a", "b", "val", "id", 512, 4)
            ).fetchall()
        )
        assert eng == twin

    def test_param_validation(self, spark):
        from gjspark.operators.sketches import bloom_bits

        with pytest.raises(ValueError):
            bloom_bits(_ids(spark, 10), "val", m_bits=1000)  # not a power of 2
        with pytest.raises(ValueError):
            bloom_bits(_ids(spark, 10), "val", k=0)

    def test_unioned_filters_keep_no_false_negatives(self, spark):
        """bits tables concatenated WITHOUT distinct (the relational
        analogue of OR-ing bloom bitmaps) must not double-count
        positions into false negatives (review finding)."""
        from gjspark.operators.sketches import bloom_bits, bloom_membership

        day1 = _ids(spark, 100, "a")
        day2 = _ids(spark, 100, "b")
        both = bloom_bits(day1, "val", 1024, 3).unionAll(
            bloom_bits(day2, "val", 1024, 3)
        )
        probe = day1.unionAll(day2).select(F.col("val").alias("id"), "val")
        out = bloom_membership(probe, both, "val", "id", 1024, 3)
        assert out.filter(~F.col("bloom_hit")).count() == 0
