"""SQL-path vs DataFrame-path equivalence: both entry points must render
identical results (three-way agreement with the DuckDB oracle follows
from test_reference_queries)."""

from __future__ import annotations

import pytest

from multi_report_etl_pipeline_spark import sql_api
from multi_report_etl_pipeline_spark.queries.reference import QUERIES
from tests.conftest import SF_DIR


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("view", ["clean_accounts", "clean_contacts_primary", "clean_contacts_promise"])
def test_view_sql_path_matches_dataframe_path(spark, view):
    sql_df = sql_api.run_view(spark, SF_DIR, view)
    df_df = QUERIES[view].fn(spark, SF_DIR)
    assert _canon(sql_df) == _canon(df_df)


@pytest.mark.parametrize("report", sorted(sql_api.REPORT_SQL_BUILDERS))
def test_report_sql_path_matches_dataframe_path(spark, report):
    sql_df = sql_api.run_report(spark, SF_DIR, report)
    df_df = QUERIES[report].fn(spark, SF_DIR)
    assert _canon(sql_df) == _canon(df_df)
