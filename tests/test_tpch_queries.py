"""Differential tests for the grouped-analytics pack vs DuckDB."""

from __future__ import annotations

import pytest

from multi_report_etl_pipeline_spark.queries.tpch import QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    assert spec.oracle is not None
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(df, duck, spec.oracle)


def test_fuzzy_matches_complete_vs_quadratic(spark):
    """For equal-length names, every levenshtein<=1 pair is a single
    substitution, so chunked-suffix blocking is pigeonhole-COMPLETE:
    the blocked operator must equal the full quadratic baseline."""
    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.operators.linkage import (
        fuzzy_self_matches,
    )
    from tests.conftest import SF_DIR

    cust = read_table(spark, SF_DIR, "customer")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in fuzzy_self_matches(cust, "c_name", "c_custkey", max_dist=1).collect()
    }
    names = {r["c_custkey"]: r["c_name"] for r in cust.collect()}
    ids = sorted(names)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            na, nb = names[a], names[b]
            if len(na) == len(nb):
                d = sum(1 for x, y in zip(na, nb) if x != y)
                if d <= 1:
                    exact.add((a, b, d))
    assert got == exact, (
        f"missing {len(exact - got)}, spurious {len(got - exact)}"
    )


def test_fuzzy_matches_rejects_unguaranteed_distance(spark):
    """max_dist beyond the pigeonhole bound (n_chunks-1) is a loud
    error, not a silent recall loss."""
    import pytest as _pytest

    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.operators.linkage import (
        fuzzy_self_matches,
    )
    from tests.conftest import SF_DIR

    cust = read_table(spark, SF_DIR, "customer")
    with _pytest.raises(ValueError, match="pigeonhole"):
        fuzzy_self_matches(cust, "c_name", "c_custkey", max_dist=3, n_chunks=3)


def test_regression_stats_matches_numpy(spark):
    """corr/slope/intercept from the exact cents moments must agree with
    numpy's reference computation on raw values to float precision."""
    import numpy as np

    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.queries.tpch import QUERIES

    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_flag: dict = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (round(r["l_quantity"] * 100), round(r["l_extendedprice"] * 100))
        )
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["lineitem_regression_stats"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == set(by_flag)
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        r = rows[flag]
        assert r["n"] == len(pts)
        assert abs(r["corr_qty_price"] - np.corrcoef(x, y)[0, 1]) < 1e-4
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r["regr_slope"] - slope) < 1e-4
        assert abs(r["regr_intercept"] - intercept / 100.0) < 1e-2
        assert abs(r["avg_qty"] - x.mean() / 100.0) < 1e-3


def test_quality_checks_count_planted_violations(spark, tmp_path):
    """Planted nulls, bad statuses, non-positive prices, orphans and a
    duplicate key must each be counted exactly once by their rule."""
    import datetime

    from multi_report_etl_pipeline_spark.queries.tpch import QUERIES

    d = datetime.datetime(2024, 1, 1)
    orders = [
        (1, 10, "O", 100.0, d, "1-URGENT"),
        (2, 10, "F", 50.0, d, "1-URGENT"),
        (2, 11, "P", 25.0, d, "1-URGENT"),     # duplicate orderkey
        (3, None, "O", 10.0, d, "1-URGENT"),    # null custkey
        (4, 99, "O", 10.0, d, "1-URGENT"),      # orphan custkey
        (5, 11, "X", 10.0, d, "1-URGENT"),      # bad status
        (6, 11, "O", 0.0, d, "1-URGENT"),       # non-positive price
        (None, 11, "O", 10.0, d, "1-URGENT"),   # null orderkey
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, "a", 0, 1.0, "BUILDING"), (11, "b", 0, 1.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    got = {
        r["rule"]: (r["violations"], r["n_rows"])
        for r in QUERIES["orders_quality_checks"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "null_orderkey": (1, 8),
        "null_custkey": (1, 8),
        "nonpositive_price": (1, 8),
        "bad_status": (1, 8),
        "orphan_custkey": (2, 8),  # the NULL custkey row is also an orphan
        "duplicate_orderkey": (1, 8),
    }, got


def test_k_anonymity_verdicts_match_brute_force(spark, duck):
    """The audit's three verdicts recomputed by brute force from the
    raw table: every QI group's size, its coarsened group's size, and
    the ok/generalizable/suppress classification."""
    import math

    from multi_report_etl_pipeline_spark.queries.tpch import (
        K_ANONYMITY_K,
        QUERIES as TQ,
    )

    duck.execute("SET search_path = 'sf_small'")
    rows = duck.execute(
        "SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer"
    ).fetchall()
    l0, l1 = {}, {}
    for n, s, bal in rows:
        l0[(n, s, math.floor(bal / 1000))] = l0.get((n, s, math.floor(bal / 1000)), 0) + 1
        l1[(n, s, math.floor(bal / 10000))] = l1.get((n, s, math.floor(bal / 10000)), 0) + 1
    got = TQ["customer_k_anonymity"].fn(spark, SF_DIR).collect()
    assert len(got) == len(l0)
    n_suppress = 0
    for r in got:
        key = (r.nationkey, r.mktsegment, r.bal_bucket)
        assert r.k_group == l0[key], key
        coarse = (r.nationkey, r.mktsegment, math.floor(r.bal_bucket / 10))
        assert r.k_generalized == l1[coarse], key
        expect = (
            "ok"
            if r.k_group >= K_ANONYMITY_K
            else "generalizable"
            if r.k_generalized >= K_ANONYMITY_K
            else "suppress"
        )
        assert r.verdict == expect, (key, r.verdict, expect)
        n_suppress += r.verdict == "suppress"
    # the sparse sf0.001 QI space (1500 customers over ~2500 cells)
    # never reaches k=5 ungeneralized — 'ok' appears from sf0.01 up
    # (exercised by the oracle differential); here the generalization
    # branch and the suppress floor must both fire
    verdicts = {r.verdict for r in got}
    assert {"generalizable", "suppress"} <= verdicts, verdicts
    assert n_suppress > 0


def test_partsupp_derivation_contract(spark):
    """The derived partsupp must honor dbgen's cardinality contract on
    ANY fixture: exactly 4 rows per part, the 4 suppliers DISTINCT per
    part, every ps_suppkey a real supplier (referential integrity —
    this is what the rank-map indirection buys on offset key spaces),
    availqty in 1..9999 and supplycost in [1.00, 1000.00)."""
    from pyspark.sql import functions as F

    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.queries.tpch import derived_partsupp

    ps = derived_partsupp(spark, SF_DIR)
    per_part = ps.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_suppkey").alias("nd"),
    )
    bad = per_part.filter((F.col("n") != 4) | (F.col("nd") != 4)).count()
    assert bad == 0
    n_parts = read_table(spark, SF_DIR, "part").count()
    assert per_part.count() == n_parts
    sup = read_table(spark, SF_DIR, "supplier").select("s_suppkey")
    orphans = ps.join(
        sup, ps.ps_suppkey == sup.s_suppkey, "left_anti"
    ).count()
    assert orphans == 0
    rng = ps.agg(
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_supplycost"), F.max("ps_supplycost"),
    ).collect()[0]
    assert 1 <= rng[0] and rng[1] <= 9999
    assert 1.0 <= rng[2] and rng[3] < 1000.0


def test_partsupp_derivation_on_offset_key_space(spark, tmp_path):
    """make_scale.py replicas have NON-contiguous key spaces (per-replica
    offsets). The rank-map indirection must keep referential integrity
    and the 4-distinct-suppliers contract there too — this is the claim
    that lets the same derivation serve every scaled fixture."""
    from pyspark.sql import functions as F

    from multi_report_etl_pipeline_spark.queries.tpch import derived_partsupp

    # two replicas: suppliers 0..9 and 10_000..10_009; parts 0..99 and
    # 100_000..100_099 (the real offset constants)
    sup = [(i,) for i in range(10)] + [(10_000 + i,) for i in range(10)]
    part = [(i,) for i in range(100)] + [(100_000 + i,) for i in range(100)]
    spark.createDataFrame(sup, "s_suppkey long").write.mode("overwrite").parquet(
        str(tmp_path / "supplier.parquet")
    )
    spark.createDataFrame(part, "p_partkey long").write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    ps = derived_partsupp(spark, str(tmp_path))
    assert ps.count() == 200 * 4
    bad = (
        ps.groupBy("ps_partkey")
        .agg(F.countDistinct("ps_suppkey").alias("nd"))
        .filter(F.col("nd") != 4)
        .count()
    )
    assert bad == 0
    valid = {r[0] for r in sup}
    emitted = {r["ps_suppkey"] for r in ps.select("ps_suppkey").distinct().collect()}
    assert emitted <= valid
