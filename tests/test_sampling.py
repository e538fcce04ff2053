"""Deterministic sampling/splitting: partitioning invariance, growth
stability, disjoint-total splits, rate concentration."""

import pytest
from pyspark.sql import functions as F

from gjspark.operators.sampling import (
    deterministic_sample,
    hash_split,
    split_case_sql,
)


def _docs(spark, n, parts=4):
    return spark.range(n).repartition(parts).select(F.col("id").alias("doc_id"))


class TestSampling:
    def test_partitioning_invariant(self, spark):
        a = {
            r["doc_id"]
            for r in deterministic_sample(_docs(spark, 2000, 1), "doc_id", 0.1).collect()
        }
        b = {
            r["doc_id"]
            for r in deterministic_sample(_docs(spark, 2000, 13), "doc_id", 0.1).collect()
        }
        assert a == b and len(a) > 0

    def test_stable_under_corpus_growth(self, spark):
        small = {
            r["doc_id"]
            for r in deterministic_sample(_docs(spark, 1000), "doc_id", 0.1).collect()
        }
        big = {
            r["doc_id"]
            for r in deterministic_sample(_docs(spark, 3000), "doc_id", 0.1).collect()
        }
        assert small == {d for d in big if d < 1000}

    def test_rate_concentrates(self, spark):
        n = 20000
        k = deterministic_sample(_docs(spark, n), "doc_id", 0.2).count()
        assert abs(k / n - 0.2) < 0.02

    def test_salts_independent(self, spark):
        a = {
            r["doc_id"]
            for r in deterministic_sample(_docs(spark, 5000), "doc_id", 0.1, salt="a").collect()
        }
        b = {
            r["doc_id"]
            for r in deterministic_sample(_docs(spark, 5000), "doc_id", 0.1, salt="b").collect()
        }
        overlap = len(a & b) / max(len(a), 1)
        assert 0.0 < overlap < 0.25  # ~10% expected under independence

    def test_fraction_validation(self, spark):
        with pytest.raises(ValueError):
            deterministic_sample(_docs(spark, 10), "doc_id", 1.5)


class TestHashSplit:
    def test_total_and_disjoint(self, spark):
        out = hash_split(_docs(spark, 5000), "doc_id")
        assert out.count() == 5000  # every row assigned exactly once
        rates = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert set(rates) == {"train", "val", "test"}
        assert abs(rates["train"] / 5000 - 0.8) < 0.03
        assert abs(rates["val"] / 5000 - 0.1) < 0.02
        assert abs(rates["test"] / 5000 - 0.1) < 0.02

    def test_assignment_deterministic(self, spark):
        a = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, 500, 1), "doc_id").collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, 500, 7), "doc_id").collect()}
        assert a == b

    def test_custom_weights_single_split(self, spark):
        out = hash_split(_docs(spark, 100), "doc_id", {"all": 1.0})
        assert out.filter(F.col("split") == "all").count() == 100
        assert split_case_sql("doc_id", {"all": 1.0}) == "'all'"

    def test_weight_validation(self, spark):
        with pytest.raises(ValueError):
            hash_split(_docs(spark, 10), "doc_id", {"a": 0.0, "b": 1.0})
        with pytest.raises(ValueError):
            hash_split(_docs(spark, 10), "doc_id", {})


class TestGroupCap:
    def test_caps_and_keeps_deterministic_order(self, spark):
        from gjspark.operators.sampling import group_cap

        df = spark.createDataFrame(
            [(g, i) for g in ("a", "b") for i in range(10)]
            + [("c", 0)],
            "grp string, item long",
        )
        out = group_cap(df, ("grp",), "item", 3)
        rows = sorted((r["grp"], r["item"]) for r in out.collect())
        assert rows == [
            ("a", 0), ("a", 1), ("a", 2),
            ("b", 0), ("b", 1), ("b", 2),
            ("c", 0),
        ]

    def test_partitioning_invariant(self, spark):
        from gjspark.operators.sampling import group_cap

        df = spark.createDataFrame(
            [(i % 7, i) for i in range(200)], "grp long, item long"
        )
        a = sorted(map(tuple, group_cap(df.repartition(1), ("grp",), "item", 5).collect()))
        b = sorted(map(tuple, group_cap(df.repartition(13), ("grp",), "item", 5).collect()))
        assert a == b and len(a) == 35

    def test_k_validation(self, spark):
        from gjspark.operators.sampling import group_cap

        with pytest.raises(ValueError):
            group_cap(spark.range(5), ("id",), "id", 0)
