"""Differential tests for event analytics (batch form) vs DuckDB."""

from __future__ import annotations

import pytest

from multi_report_etl_pipeline_spark.queries.events import QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    assert spec.oracle is not None
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(df, duck, spec.oracle)
