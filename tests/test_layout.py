"""Z-order layout: row preservation and the measured file-skipping
property vs a single-column-sorted layout of the same data."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.io import read_table
from multi_report_etl_pipeline_spark.operators import layout
from tests.conftest import SF_DIR

COLS = ("l_partkey", "l_orderkey")
N_FILES = 16


def _file_spans(duck, path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "**", "part-*.parquet"), recursive=True)):
        lo, hi = duck.execute(f"SELECT min({col}), max({col}) FROM '{f}'").fetchone()
        spans.append((lo, hi))
    return spans


def _n_intersecting(spans, lo, hi) -> int:
    return sum(1 for mn, mx in spans if mn <= hi and mx >= lo)


def test_zorder_preserves_rows_and_skips_on_both_columns(spark, duck, tmp_path):
    li = read_table(spark, SF_DIR, "lineitem").select(*COLS)
    n = li.count()
    bnd = layout.quantile_boundaries(li, COLS, 16, rel_err=0.001)

    zpath = str(tmp_path / "zorder")
    layout.write_zordered(li, zpath, COLS, N_FILES, bits=4, boundaries=bnd)
    # comparison layout: globally sorted by the FIRST column only
    xpath = str(tmp_path / "xsorted")
    (
        li.repartitionByRange(N_FILES, COLS[0])
        .sortWithinPartitions(COLS[0])
        .write.mode("overwrite")
        .parquet(xpath)
    )

    # row multiset preserved (count + per-column sums)
    back = spark.read.parquet(zpath)
    want = li.agg(*[F.sum(c).alias(c) for c in COLS]).collect()[0]
    got = back.agg(*[F.sum(c).alias(c) for c in COLS]).collect()[0]
    assert back.count() == n
    assert tuple(got) == tuple(want)
    z_files = glob.glob(os.path.join(zpath, "**", "part-*.parquet"), recursive=True)
    assert len(z_files) == N_FILES

    # a 2-bucket slab = value range [e5, e7) = buckets 5-6, inside ONE
    # 4-bucket Morton block column, on EACH clustered column
    slabs = {c: (bnd[c][4], bnd[c][6] - 1e-9) for c in COLS}

    # z-order: 16 aligned blocks tile a 4x4 bucket grid, so a slab
    # within one block-column touches at most that column's 4 blocks
    # (+1 for an edge straddle under approximate quantile edges)
    for c in COLS:
        spans = _file_spans(duck, zpath, c)
        hit = _n_intersecting(spans, *slabs[c])
        assert hit <= 6, (c, hit, spans)

    # single-column sort: near-perfect on the sort column, ~useless on
    # the other — z-order must beat it decisively there
    x_spans_y = _file_spans(duck, xpath, COLS[1])
    x_hit_y = _n_intersecting(x_spans_y, *slabs[COLS[1]])
    z_hit_y = _n_intersecting(_file_spans(duck, zpath, COLS[1]), *slabs[COLS[1]])
    assert z_hit_y <= x_hit_y // 2, (z_hit_y, x_hit_y)


def test_zorder_key_validates_boundary_count(spark):
    import pytest

    with pytest.raises(ValueError):
        layout.zorder_key(["a"], {"a": [1.0, 2.0]}, bits=4)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    """Many small commits -> few target-size files, content identical,
    and sort_within_by tightens per-file min/max spans."""
    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.operators.layout import compact_parquet

    src_dir = str(tmp_path / "landing")
    ord_ = read_table(spark, SF_DIR, "orders")
    # simulate 20 tiny stream commits
    ord_.repartition(20).write.mode("overwrite").parquet(src_dir)

    dst = str(tmp_path / "compacted")
    stats = compact_parquet(
        spark, src_dir, dst, target_file_bytes=1 << 40,
        sort_within_by=["o_orderdate"],
    )
    assert stats["files_before"] == 20
    assert stats["files_after"] == 1
    out = spark.read.parquet(dst)
    assert out.count() == ord_.count()
    # content identical (orderkey multiset)
    a = sorted(r.o_orderkey for r in out.select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in ord_.select("o_orderkey").collect())
    assert a == b
    # a small target yields multiple files
    stats2 = compact_parquet(spark, src_dir, str(tmp_path / "c2"),
                             target_file_bytes=64 * 1024)
    assert stats2["files_after"] > 1
