"""merge_upsert (MERGE INTO analog): semantics on adversarial toy
inputs plus the plan shape, beyond the per-row oracle differential that
test_tpch_queries.py runs on orders_snapshot_merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.operators.snapshot import merge_upsert
from multi_report_etl_pipeline_spark.plans import physical_plan

_SCHEMA = "k long, v string, version long, deleted boolean"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _merge(spark, snap, upd, **kw):
    kw.setdefault("key_cols", ["k"])
    kw.setdefault("version_cols", ["version"])
    kw.setdefault("tombstone_col", "deleted")
    out = merge_upsert(_df(spark, snap), _df(spark, upd), **kw)
    return {r.k: (r.v, r.version) for r in out.collect()}


def test_upsert_insert_delete_and_keep(spark):
    snap = [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 1, False)]
    upd = [
        (2, "b2", 2, False),   # update wins over older version
        (3, None, 2, True),    # tombstone deletes the key
        (4, "d", 2, False),    # insert: key only in updates
    ]
    assert _merge(spark, snap, upd) == {
        1: ("a", 1),
        2: ("b2", 2),
        4: ("d", 2),
    }


def test_equal_version_resolves_to_update_side(spark):
    snap = [(1, "old", 5, False)]
    upd = [(1, "new", 5, False)]
    assert _merge(spark, snap, upd) == {1: ("new", 5)}


def test_stale_update_does_not_regress_snapshot(spark):
    snap = [(1, "current", 3, False)]
    upd = [(1, "stale", 2, False)]
    assert _merge(spark, snap, upd) == {1: ("current", 3)}


def test_replay_is_idempotent_and_resurrection_works(spark):
    snap = [(1, "a", 1, False), (2, "b", 1, False)]
    upd = [(1, None, 2, True), (2, "b2", 2, False)]
    once = merge_upsert(
        _df(spark, snap), _df(spark, upd),
        key_cols=["k"], version_cols=["version"], tombstone_col="deleted",
    )
    # replaying the same batch against the merged snapshot changes nothing
    twice = merge_upsert(
        once, _df(spark, upd),
        key_cols=["k"], version_cols=["version"], tombstone_col="deleted",
    )
    want = {2: ("b2", 2)}
    assert {r.k: (r.v, r.version) for r in twice.collect()} == want
    # a later higher-version insert resurrects the tombstoned key
    back = merge_upsert(
        once, _df(spark, [(1, "again", 3, False)]),
        key_cols=["k"], version_cols=["version"], tombstone_col="deleted",
    )
    assert {r.k: (r.v, r.version) for r in back.collect()} == {
        1: ("again", 3), 2: ("b2", 2),
    }


def test_multi_column_version_order(spark):
    # version tuple (version, k) — second component breaks nothing here,
    # but a two-column order must compare lexicographically
    snap = [(1, "a", 1, False)]
    upd = [(1, "b", 1, False)]
    out = merge_upsert(
        _df(spark, snap), _df(spark, upd),
        key_cols=["k"], version_cols=["version", "v"], tombstone_col="deleted",
    )
    # 'b' > 'a' lexicographically, so the update survives on the tuple
    assert [(r.k, r.v) for r in out.collect()] == [(1, "b")]


def test_null_tombstone_means_keep(spark):
    snap = [(1, "a", 1, None)]
    upd: list = []
    assert _merge(spark, snap, upd) == {1: ("a", 1)}


def test_validates_columns(spark):
    df = _df(spark, [(1, "a", 1, False)])
    with pytest.raises(ValueError):
        merge_upsert(df, df, key_cols=[], version_cols=["version"])
    with pytest.raises(ValueError):
        merge_upsert(df, df, key_cols=["k"], version_cols=["nope"])
    with pytest.raises(ValueError):
        merge_upsert(
            df, df, key_cols=["k"], version_cols=["version"], tombstone_col="k"
        )


def test_merge_is_one_partial_agg_shuffle(spark):
    """The survivor pass must collapse map-side: one Exchange total, with
    a partial max_by below it — a window+filter plan (full shuffle of
    every version) would regress the 100 TB posture."""
    snap = _df(spark, [(1, "a", 1, False)])
    upd = _df(spark, [(1, "b", 2, False)])
    plan = physical_plan(
        merge_upsert(
            snap, upd, key_cols=["k"], version_cols=["version"],
            tombstone_col="deleted",
        )
    )
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "partial_max_by" in plan, plan[:3000]
    assert "Window" not in plan, plan[:3000]


def test_snapshot_diff_classes_and_null_safety(spark):
    """All four classes on crafted rows, including the null-safe compare:
    NULL -> NULL is unchanged, NULL -> value is changed (a naive =
    comparison would misclassify both)."""
    from multi_report_etl_pipeline_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, None), (5, "e")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (4, "d"), (6, "f")], "k long, v string"
    )
    got = {
        r.k: r.change
        for r in snapshot_diff(
            old, new, key_cols=["k"], include_unchanged=True
        ).collect()
    }
    assert got == {
        1: "unchanged", 2: "changed", 3: "unchanged",
        4: "changed", 5: "removed", 6: "added",
    }
    trimmed = {
        r.k for r in snapshot_diff(old, new, key_cols=["k"]).collect()
    }
    assert trimmed == {2, 4, 5, 6}


def test_snapshot_diff_validates_columns(spark):
    from multi_report_etl_pipeline_spark.operators.snapshot import snapshot_diff

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, key_cols=[])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, key_cols=["k"], compare_cols=["missing"])
