"""Skew smoke (SURVEY.md §5.2.7): a Zipf-hot key distribution must (a) not
change results under salting, and (b) actually spread the hot key's rows
across tasks — the property that prevents one straggler task from pinning
pipeline wall-clock at 10^12-turn scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

K = 8  # salt fan-out
NPART = 16


@pytest.fixture(scope="module")
def skewed(spark):
    # ~45% of all rows carry one hot key (harsher than Zipf alpha=1.2)
    n = 200_000
    df = spark.range(n).select(
        F.when(F.col("id") % 20 < 9, F.lit("hot_entity"))
        .otherwise(F.concat(F.lit("e"), (F.col("id") % 997).cast("string")))
        .alias("key"),
        (F.col("id") % 13).cast("long").alias("qty"),
    )
    return df.persist()


def _plain_agg(df):
    return df.groupBy("key").agg(
        F.sum("qty").alias("total"), F.count("*").alias("n")
    )


def _salted_agg(df):
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64(F.rand(seed=7) * 1000), F.lit(K)).cast("int")
    )
    partial = salted.groupBy("key", "salt").agg(
        F.sum("qty").alias("pq"), F.count("*").alias("pn")
    )
    return partial.groupBy("key").agg(
        F.sum("pq").alias("total"), F.sum("pn").alias("n")
    )


def test_salted_agg_equals_plain(spark, skewed):
    a = _plain_agg(skewed).toPandas().sort_values("key").reset_index(drop=True)
    b = _salted_agg(skewed).toPandas().sort_values("key").reset_index(drop=True)
    assert a.equals(b)


def _max_partition_fraction(df, *cols) -> float:
    total = df.count()
    parts = (
        df.repartition(NPART, *cols)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .toPandas()
    )
    return parts["count"].max() / total


def test_salting_spreads_hot_key(spark, skewed):
    salted = skewed.withColumn(
        "salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(K)).cast("int")
    )
    frac_plain = _max_partition_fraction(skewed, "key")
    frac_salted = _max_partition_fraction(salted, "key", "salt")
    # hot key alone is ~45% of rows -> its partition dominates unsalted;
    # salted, no partition should hold much more than 45%/K + background
    assert frac_plain > 0.40
    assert frac_salted < frac_plain / 2
    assert frac_salted < 0.20


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot_entity", "H")] + [(f"e{i}", f"g{i % 5}") for i in range(997)],
        "key string, grp string",
    )
    plain = (
        skewed.join(dim, "key")
        .groupBy("grp")
        .agg(F.sum("qty").alias("total"))
        .toPandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    fact = skewed.withColumn(
        "salt", F.pmod(F.xxhash64("qty"), F.lit(K)).cast("int")
    )
    dim_ex = dim.withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(K)])))
    salted = (
        fact.join(dim_ex, ["key", "salt"])
        .groupBy("grp")
        .agg(F.sum("qty").alias("total"))
        .toPandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    assert plain.equals(salted)
