"""Differential tests: every reference-surface query vs the DuckDB oracle
at sf0.001 (the driver repeats this at sf0.01), plus the reference's own
invariants (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.queries.reference import QUERIES, build_staging
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    assert spec.oracle is not None, f"{name} must declare an oracle"
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(df, duck, spec.oracle)


def test_clean_views_unique_per_account(spark):
    """Invariant (README.md:126-130): each contact view keeps <=1 row per
    account_id."""
    views = build_staging(spark, SF_DIR)
    for name in (
        "clean_contacts_primary",
        "clean_contacts_field",
        "clean_contacts_promise",
        "clean_contacts_restructure",
    ):
        dupes = (
            views[name]
            .groupBy("account_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dupes == 0, f"{name} has duplicate account_ids"


def test_reports_preserve_account_subset(spark):
    """Reports' accounts are a subset of filtered clean_accounts, and left
    joins never invent rows (README.md:20)."""
    views = build_staging(spark, SF_DIR)
    report = QUERIES["report_mortgage_portfolio"].fn(spark, SF_DIR)
    report_accounts = {r.account_id for r in report.select("account_id").collect()}
    base = (
        views["clean_accounts"]
        .filter(
            (F.col("product_type") == "MORTGAGE")
            & (F.col("business_division") == "RETAIL")
            & (F.col("containment_percentage") == 0)
        )
        .select("account_id")
        .distinct()
    )
    base_accounts = {r.account_id for r in base.collect()}
    assert report_accounts == base_accounts


def test_date_parsing_nulls_malformed(spark):
    """SQLite DATE() semantics: malformed DD/MM/YYYY -> NULL, valid parses."""
    views = build_staging(spark, SF_DIR)
    stg = views["stg_activities"]
    from multi_report_etl_pipeline_spark.staging import parse_ddmmyyyy

    parsed = stg.select(
        "activity_date", parse_ddmmyyyy("activity_date").alias("parsed")
    )
    bad = parsed.filter(F.col("activity_date").isin("31/02/2025", "GARBAGE"))
    assert bad.count() > 0, "fixture should contain malformed dates"
    assert bad.filter(F.col("parsed").isNotNull()).count() == 0
    good = parsed.filter(
        ~F.col("activity_date").isin("31/02/2025", "GARBAGE")
        & F.col("activity_date").isNotNull()
    )
    assert good.filter(F.col("parsed").isNull()).count() == 0


def test_materialized_staging_matches_lazy(spark):
    """The staging materialization (bench path / the reference's
    CREATE TABLE staging analog) must be result-identical to the lazy
    view path and must actually be read by downstream queries."""
    from multi_report_etl_pipeline_spark.queries import reference

    checked = (
        "clean_contacts_primary",
        "clean_contacts_field",
        "clean_contacts_promise",
        "clean_contacts_restructure",
        "report_mortgage_portfolio",
        "report_restructuring_pipeline",
        "report_commercial_promises",
        "quality_view_counts",
    )
    def rows_of(df):
        return sorted((tuple(map(repr, r)) for r in df.collect()))

    lazy = {n: rows_of(QUERIES[n].fn(spark, SF_DIR)) for n in checked}
    reference.materialize_staging(spark, SF_DIR, n_splits=4)
    try:
        primary = QUERIES["clean_contacts_primary"].fn(spark, SF_DIR)
        mat = {n: rows_of(QUERIES[n].fn(spark, SF_DIR)) for n in checked}
        for n in checked:
            assert mat[n] == lazy[n], f"{n}: materialized path diverges from lazy"
        plan = primary._jdf.queryExecution().executedPlan().toString()
        assert "multi_report_etl_pipeline_spark_staging" in plan, plan
    finally:
        reference.clear_materialized_staging()
