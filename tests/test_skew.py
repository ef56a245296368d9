"""Salted-join semantics: result must equal the plain equi-join for
inner and left joins, including skewed and missing keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.operators.skew import salted_join


def _rows(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def _fixture(spark):
    # one pathologically hot key (0), a normal key, and a dim-less key
    fact = spark.range(0, 3000).select(
        F.when(F.col("id") < 2800, 0)
        .when(F.col("id") < 2950, 1)
        .otherwise(2)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame([(0, "hot"), (1, "warm")], "k long, name string")
    return fact, dim


def test_salted_inner_matches_plain(spark):
    fact, dim = _fixture(spark)
    want = _rows(fact.join(dim, "k"))
    got = _rows(salted_join(fact, dim, "k", n_salts=4))
    assert got == want


def test_salted_left_matches_plain(spark):
    fact, dim = _fixture(spark)
    want = _rows(fact.join(dim, "k", "left"))
    got = _rows(salted_join(fact, dim, "k", how="left", n_salts=4))
    assert got == want


def test_salt_never_escapes(spark):
    fact, dim = _fixture(spark)
    assert salted_join(fact, dim, "k").columns == fact.join(dim, "k").columns


def test_salted_rejects_outer_shapes(spark):
    """Dim replication corrupts right/full-outer joins (unmatched dim
    rows would surface n_salts times) — the operator must refuse them."""
    import pytest

    fact, dim = _fixture(spark)
    for how in ("right", "right_outer", "full", "full_outer", "cross"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(fact, dim, "k", how=how)


def test_salted_left_semi_and_anti_match_plain(spark):
    fact, dim = _fixture(spark)
    for how in ("left_semi", "left_anti"):
        want = _rows(fact.join(dim, "k", how))
        got = _rows(salted_join(fact, dim, "k", how=how, n_salts=4))
        assert got == want, how
