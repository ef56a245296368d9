"""Snapshot maintenance: latest-wins upsert merge with tombstone deletes.

The MERGE INTO analog for a pipeline whose tables live as parquet
snapshots (no transactional table format in this environment). The
reference's ETL rebuilds its staging views from full raw tables every
run (01_staging_layer.sql:23-25 — views, "no materialization",
README.md:116); at 100 TB the economic shape is the opposite: maintain a
merged snapshot and apply bounded update batches to it. This operator is
that apply step, expressed as ONE partial aggregation:

    union(snapshot tagged src=0, updates tagged src=1)
      -> groupBy(keys).agg(max_by(payload, (version..., src)))
      -> drop tombstoned survivors

``max_by`` over a payload struct collapses each key to its latest row
map-side before the exchange (the same survivor-aggregation design the
staging layer uses, staging.py:312-331), so the shuffle carries at most
one row per key per map task — not the snapshot. A window + filter would
shuffle every version of every key. The version tuple plus the source
tag is the total order: equal versions resolve to the update side, and
callers must keep (keys, versions) unique per side (append a batch
sequence number to ``version_cols`` otherwise) — ties beyond the source
tag would make the survivor nondeterministic, like any MERGE.

Deletes are data, not API: a boolean tombstone column carried by update
rows. A tombstone survives the merge like any other update (shadowing
every older version) and is dropped at the end — so a later re-insert
with a higher version resurrects the key, and replaying the same batch
is idempotent. At scale this is one shuffle of slim (key, version,
payload) rows; storage-side, pair it with ``io.write_parquet``
partitioned so unchanged partitions can be copied/skipped by the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SRC = "__src"
_PAYLOAD = "__payload"


def merge_upsert(
    snapshot: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Merge an update batch into a snapshot, keeping the latest row per
    key (latest = greatest ``version_cols`` tuple, update side winning
    ties). Keys appearing only in ``updates`` are inserts; rows whose
    ``tombstone_col`` is true delete their key from the result.

    Both inputs must share a schema (``unionByName``); output has the
    same schema, one row per surviving key.
    """
    if not key_cols or not version_cols:
        raise ValueError("key_cols and version_cols must be non-empty")
    data_cols = [c for c in snapshot.columns if c not in key_cols]
    for c in list(key_cols) + list(version_cols):
        if c not in snapshot.columns:
            raise ValueError(f"column {c!r} not in snapshot schema")
    if tombstone_col is not None and tombstone_col not in data_cols:
        raise ValueError(f"tombstone column {tombstone_col!r} not a data column")

    tagged = snapshot.withColumn(_SRC, F.lit(0)).unionByName(
        updates.withColumn(_SRC, F.lit(1))
    )
    order = F.struct(*[F.col(c) for c in version_cols], F.col(_SRC))
    payload = F.struct(*[F.col(c) for c in data_cols])
    merged = (
        tagged.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.max_by(payload, order).alias(_PAYLOAD))
        .select(*key_cols, f"{_PAYLOAD}.*")
    )
    if tombstone_col is not None:
        merged = merged.filter(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    return merged


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Reconcile two snapshot versions: one row per key present in
    either side, classified ``added`` / ``removed`` / ``changed`` (and
    ``unchanged`` when requested). The audit/validation twin of
    ``merge_upsert`` — run it after a merge to see exactly what the
    batch did, or between independently-produced snapshots to detect
    drift.

    One full-outer equi-join on the keys: both sides hash-partition on
    the same columns (co-partitioned, no broadcast needed at any size)
    and the change test is a null-safe struct equality — no per-column
    join conditions, no second pass. Output columns: keys, ``change``,
    and each compared column as ``old_<c>`` / ``new_<c>``.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    compare = list(
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in key_cols]
    )
    for c in compare:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"compare column {c!r} missing from a side")
    o = old.select(
        *key_cols, F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *key_cols, F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    joined = o.join(n, list(key_cols), "full_outer")
    old_struct = F.struct(*[F.col(f"old_{c}") for c in compare])
    new_struct = F.struct(*[F.col(f"new_{c}") for c in compare])
    change = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~old_struct.eqNullSafe(new_struct), "changed")
        .otherwise("unchanged")
    )
    out = joined.select(
        *key_cols,
        change.alias("change"),
        *[F.col(f"old_{c}") for c in compare],
        *[F.col(f"new_{c}") for c in compare],
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
