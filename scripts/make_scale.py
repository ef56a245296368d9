"""Scale a fixture directory up N-fold by unioning N key-remapped
replicas — the sf1 dataset for BASELINE.md's larger-scale bench run
(VERDICT r2 item 2: prove the floor-dominance claim with a data point
where data cost dominates Spark's ~0.2 s per-action floor).

    python scripts/make_scale.py [--src /root/testdata/sf0.1] \
        [--dst /root/repo/testdata_sf1] [--n 10]

Key remapping preserves referential integrity: every foreign key gets
the same per-replica offset as its parent (orderkey, custkey, partkey,
suppkey, user_id). region/nation are fixed-cardinality dimensions and
are NOT replicated (duplicating them would corrupt the dim joins).

Second-level scale-ups (e.g. sf100 = sf10 x 10) must pass --key-scale
so the per-replica offsets clear the already-offset key ranges of the
source: sf10's max custkey is ~99 x 100_000 + base, so scaling it
again with the raw offsets would collide replica keys. --key-scale 100
multiplies every offset by 100 (the source's own replica count),
keeping the composed key spaces disjoint. --tables restricts output to
a subset (a TPC-H-only sf100 is ~16 GB; documents/embeddings add
little to the join-ledger probe but gigabytes of regexp work).

Two columns are additionally PERTURBED per replica, deterministically,
so similarity structure scales the way a real corpus does:

- documents.text: replica i>0 prefixes every token with 'r{i}' — the
  replica shares zero shingles with the original, so near-dup pairs
  grow linearly with N. Exact replication would grow them
  quadratically (every shingle's document frequency x N => N^2 pairs
  per shingle in the self-join), a scaling artifact no real 10x corpus
  has.
- embeddings.embedding: replica i rotates the vector left by i
  positions — norm-preserving, and rotations of near-random vectors
  are uncorrelated, so cosine near-dup pairs also stay linear.

The replica count and offsets are all deterministic: the output is
reproducible bit-for-bit from the source fixtures.
"""

from __future__ import annotations

import argparse
import os

import duckdb

# Per-replica key offsets: round numbers comfortably above the sf0.1 max
# key. vec_id's offset is a multiple of 100 so the bench query-set
# predicate (vec_id % 100 = 0) selects the same per-replica density.
OFF = {
    "custkey": 100_000,
    "orderkey": 1_000_000,
    "suppkey": 10_000,
    "partkey": 100_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
    "doc_id": 100_000,
    "vec_id": 2_000,
}

COPY_AS_IS = ("region", "nation")

REPLICATED = {
    "customer": "SELECT * REPLACE (c_custkey + i * {custkey} AS c_custkey) FROM t",
    "supplier": "SELECT * REPLACE (s_suppkey + i * {suppkey} AS s_suppkey) FROM t",
    "part": "SELECT * REPLACE (p_partkey + i * {partkey} AS p_partkey) FROM t",
    "orders": (
        "SELECT * REPLACE (o_orderkey + i * {orderkey} AS o_orderkey, "
        "o_custkey + i * {custkey} AS o_custkey) FROM t"
    ),
    "lineitem": (
        "SELECT * REPLACE (l_orderkey + i * {orderkey} AS l_orderkey, "
        "l_partkey + i * {partkey} AS l_partkey, "
        "l_suppkey + i * {suppkey} AS l_suppkey) FROM t"
    ),
    "events": (
        "SELECT * REPLACE (event_id + i * {event_id} AS event_id, "
        "user_id + i * {user_id} AS user_id) FROM t"
    ),
    "documents": (
        "SELECT doc_id + i * {doc_id} AS doc_id, "
        "CASE WHEN i = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', 'r' || CAST(i AS VARCHAR) || '\\1', 'g') "
        "END AS text, "
        "lang, source, "
        "CAST(length(CASE WHEN i = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', 'r' || CAST(i AS VARCHAR) || '\\1', 'g') "
        "END) AS BIGINT) AS n_chars "
        "FROM t"
    ),
    "embeddings": (
        "SELECT vec_id + i * {vec_id} AS vec_id, "
        "CAST(embedding[(CAST(i AS INT) + 1):] || embedding[1:CAST(i AS INT)] "
        "AS FLOAT[]) AS embedding, "
        "label FROM t"
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/testdata_sf1")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--key-scale", type=int, default=1)
    ap.add_argument("--tables", default=None, help="comma-separated subset")
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    off = {k: v * args.key_scale for k, v in OFF.items()}
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in COPY_AS_IS:
        if only is not None and t not in only:
            continue
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, tmpl in REPLICATED.items():
        if only is not None and t not in only:
            continue
        # EXCLUDE the replica counter from the output: a bare SELECT *
        # over the cross join leaks r.i as a trailing column (caught in
        # round 6 when a second-level scale-up hit the ambiguous name)
        body = tmpl.format(**off).replace("SELECT * ", "SELECT t.* ").replace(
            "FROM t", f"FROM '{args.src}/{t}.parquet' t, range({args.n}) r(i)"
        )
        con.execute(
            f"COPY ({body}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{args.dst}/{t}.parquet'").fetchone()[0]
        print(t, "rows", n)


if __name__ == "__main__":
    main()
