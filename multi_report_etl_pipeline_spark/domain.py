"""Domain adapter: synthetic TPC-H-ish tables -> the reference's data model.

The reference pipeline (/root/reference) operates on two raw tables,
``stg_accounts`` (one row per account *operation*; README.md:51) and
``stg_activities`` (many activity rows per account; README.md:104). The
driver's test data is a TPC-H-ish star schema, so this module derives the
two staging tables deterministically from it:

- ``stg_accounts``  := ``orders``  (account := customer, operation := order)
- ``stg_activities``:= ``lineitem ⋈ orders`` (activity := order line,
  keyed back to the customer/account)

Every derived column is a pure key-driven expression (modular arithmetic on
keys, date reformatting of ``l_shipdate``), so the mapping is deterministic
and expressible in both Spark SQL and DuckDB — which is exactly what the
differential oracle needs. Dirty-data arms (malformed DD/MM/YYYY dates,
NULL keys, NULL notes/phones) are injected on key-derived conditions to
exercise every cleansing path of the staging layer (reference
01_staging_layer.sql:64-97; README.md:118-136).

One column spec generates BOTH dialects, so the Spark input and the DuckDB
oracle input cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fmt_ddmmyyyy_spark(col: str) -> str:
    return f"date_format({col}, 'dd/MM/yyyy')"


def _fmt_ddmmyyyy_duck(col: str) -> str:
    return f"strftime({col}, '%d/%m/%Y')"


def _plus_days_spark(col: str, days: str) -> str:
    return f"date_add(CAST({col} AS DATE), CAST({days} AS INT))"


def _plus_days_duck(col: str, days: str) -> str:
    return f"(CAST({col} AS DATE) + CAST({days} AS INT))"


def _hash60_spark(expr: str) -> str:
    return f"CAST(CONV(SUBSTRING(md5(CAST({expr} AS BINARY)), 1, 15), 16, 10) AS BIGINT)"


def _hash60_duck(expr: str) -> str:
    return f"CAST(CONCAT('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


DIALECTS = {
    "spark": {
        "fmt": _fmt_ddmmyyyy_spark,
        "plus_days": _plus_days_spark,
        "hash60": _hash60_spark,
    },
    "duckdb": {
        "fmt": _fmt_ddmmyyyy_duck,
        "plus_days": _plus_days_duck,
        "hash60": _hash60_duck,
    },
}

# String identity of a lineitem row for the activity fingerprint: the
# 7-column tuple includes every source column that feeds a window order
# key (l_shipdate drives activity_date/next_activity_date — without it,
# two rows equal on the other six but differing in shipdate would share
# row_fp and reopen the nondeterministic-survivor hole). The money
# columns enter as exact integer cents and the date as its ISO string
# (DATE -> VARCHAR renders 'yyyy-MM-dd' on both engines), so both
# dialects stringify identically. (activity_id = l_orderkey*10 +
# l_linenumber is NOT unique in the fixtures — (orderkey, linenumber)
# repeats — so dedup windows need this fingerprint as their final
# tiebreaker to have a total order; uniqueness per scale factor is
# asserted in tests/test_properties.py.)
_ROW_IDENTITY = (
    "CONCAT_WS('|', l_orderkey, l_linenumber, l_partkey, l_suppkey, "
    "CAST(ROUND(l_quantity * 100) AS BIGINT), "
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT), "
    "CAST(CAST(l_shipdate AS DATE) AS VARCHAR(32)))"
)


def _account_cols(d: dict) -> list[tuple[str, str]]:
    """stg_accounts columns (reference schema: 01_staging_layer.sql:27-39)."""
    return [
        (
            "collection_company",
            "CASE o_orderkey % 3 WHEN 0 THEN 'AGENCY_A' WHEN 1 THEN 'AGENCY_B' "
            "ELSE 'AGENCY_C' END",
        ),
        # ~0.1% NULL keys to exercise the key-integrity probe (README.md:123-124)
        (
            "account_id",
            "CASE WHEN o_orderkey % 1009 = 0 THEN CAST(NULL AS BIGINT) ELSE o_custkey END",
        ),
        ("account_checkdigit", "CAST(o_orderkey % 10 AS VARCHAR(32))"),
        ("agent_type", "CASE WHEN o_orderkey % 2 = 0 THEN 'INTERNAL' ELSE 'EXTERNAL' END"),
        ("customer_name", "CONCAT('CUSTOMER_', CAST(o_custkey AS VARCHAR(32)))"),
        (
            "product_type",
            "CASE o_orderpriority WHEN '1-URGENT' THEN 'MORTGAGE' "
            "WHEN '2-HIGH' THEN 'COMMERCIAL_LOAN' WHEN '3-MEDIUM' THEN 'CONSUMER_LOAN' "
            "WHEN '4-NOT SPECIFIED' THEN 'CREDIT_CARD' ELSE 'PERSONAL_LOAN' END",
        ),
        (
            "risk_segment",
            "CASE o_orderkey % 5 WHEN 0 THEN 'A' WHEN 1 THEN 'B' WHEN 2 THEN 'C' "
            "WHEN 3 THEN 'D' ELSE 'E' END",
        ),
        ("outstanding_balance", "o_totalprice"),
        (
            "agent_name",
            "CASE WHEN o_orderkey % 7 = 0 THEN 'AUTO_DIALER' "
            "ELSE CONCAT('AGENT_', CAST(o_orderkey % 7 AS VARCHAR(32))) END",
        ),
        ("operation_number", "o_orderkey"),
        ("containment_percentage", "o_orderkey % 4"),
        (
            "business_division",
            "CASE o_custkey % 3 WHEN 0 THEN 'RETAIL' WHEN 1 THEN 'COMMERCIAL' "
            "ELSE 'CORPORATE' END",
        ),
        (
            "customer_city",
            "CASE o_custkey % 5 WHEN 0 THEN 'METRO_AREA_1' WHEN 1 THEN 'METRO_AREA_2' "
            "WHEN 2 THEN 'METRO_AREA_3' WHEN 3 THEN 'PROVINCE_1' ELSE 'PROVINCE_2' END",
        ),
    ]


def _activity_cols(d: dict) -> list[tuple[str, str]]:
    """stg_activities columns (reference schema: 01_staging_layer.sql:61-105).

    ``activity_id`` (l_orderkey*10 + l_linenumber) is a dirty, DUPLICATED
    operational id — (orderkey, linenumber) repeats in the fixtures, like
    real operational keys. The deterministic window tiebreaker
    (SURVEY.md §2.5 hazard) is ``row_fp``, the 60-bit hash of
    ``_ROW_IDENTITY`` above, which IS unique per row.
    """
    fmt, plus = d["fmt"], d["plus_days"]
    return [
        (
            "account_id",
            "CASE WHEN l_orderkey % 1013 = 0 AND l_linenumber = 1 "
            "THEN CAST(NULL AS BIGINT) ELSE o_custkey END",
        ),
        ("activity_id", "l_orderkey * 10 + l_linenumber"),
        # deterministic 60-bit row fingerprint: the TRUE unique key
        # (activity_id is dirty — duplicated — like real operational ids);
        # windows use it as the final ORDER BY tiebreaker
        ("row_fp", d["hash60"](_ROW_IDENTITY)),
        # DD/MM/YYYY strings, ~1% malformed (impossible date) + ~0.5% garbage,
        # matching the reference's dirty-date reality (README.md:118,132-136)
        (
            "activity_date",
            "CASE WHEN l_partkey % 97 = 0 THEN '31/02/2025' "
            "WHEN l_partkey % 211 = 0 THEN 'GARBAGE' "
            f"ELSE {fmt('l_shipdate')} END",
        ),
        (
            "activity_time",
            "CONCAT(LPAD(CAST((l_suppkey * 7) % 24 AS VARCHAR(32)), 2, '0'), ':', "
            "LPAD(CAST((l_partkey * 3) % 60 AS VARCHAR(32)), 2, '0'), ':', "
            "LPAD(CAST(l_orderkey % 60 AS VARCHAR(32)), 2, '0'))",
        ),
        (
            "next_activity_date",
            "CASE WHEN l_orderkey % 11 = 0 THEN CAST(NULL AS VARCHAR(32)) "
            f"ELSE {fmt(plus('l_shipdate', '7 * l_linenumber'))} END",
        ),
        (
            "collection_channel",
            "CASE l_linenumber % 6 WHEN 0 THEN 'PHONE' WHEN 1 THEN 'FIELD' "
            "WHEN 2 THEN 'MESSAGING' WHEN 3 THEN 'EMAIL' WHEN 4 THEN 'AGENT_BANK' "
            "ELSE 'WHATSAPP' END",
        ),
        (
            "contact_type",
            "CASE l_suppkey % 7 WHEN 0 THEN 'PRIMARY' WHEN 1 THEN 'THIRD_PARTY' "
            "WHEN 2 THEN 'RELATIVE' WHEN 3 THEN 'NO_CONTACT' WHEN 4 THEN 'GUARANTOR' "
            "WHEN 5 THEN 'GUARANTOR_NO_CONTACT' ELSE 'UNKNOWN_TYPE' END",
        ),
        (
            "contact_outcome",
            "CASE l_partkey % 5 WHEN 0 THEN 'PAYMENT_PROMISE' "
            "WHEN 1 THEN 'RESTRUCTURE_REQUEST' WHEN 2 THEN 'NO_ANSWER' "
            "WHEN 3 THEN 'REFUSED' ELSE 'CALLBACK' END",
        ),
        (
            "non_payment_reason",
            "CASE l_partkey % 4 WHEN 0 THEN CAST(NULL AS VARCHAR(32)) "
            "WHEN 1 THEN 'UNEMPLOYMENT' WHEN 2 THEN 'ILLNESS' ELSE 'DISPUTE' END",
        ),
        ("contact_location", "CONCAT('LOC_', CAST(l_suppkey % 50 AS VARCHAR(32)))"),
        (
            "next_action",
            "CASE l_orderkey % 4 WHEN 0 THEN CAST(NULL AS VARCHAR(32)) "
            "WHEN 1 THEN 'CALL_BACK' WHEN 2 THEN 'VISIT' ELSE 'ESCALATE' END",
        ),
        (
            "notes",
            "CASE WHEN l_orderkey % 3 = 0 THEN CAST(NULL AS VARCHAR(32)) "
            "ELSE CONCAT('NOTE_', CAST(l_orderkey % 100 AS VARCHAR(32))) END",
        ),
        (
            "phone_number",
            "CASE WHEN l_suppkey % 5 = 0 THEN CAST(NULL AS VARCHAR(32)) "
            "ELSE CONCAT('+569', CAST(10000000 + l_partkey AS VARCHAR(32))) END",
        ),
        (
            "department",
            "CASE l_linenumber % 3 WHEN 0 THEN 'COLLECTIONS' WHEN 1 THEN 'LEGAL' "
            "ELSE 'FIELD_OPS' END",
        ),
        (
            "agent_name",
            "CASE WHEN l_suppkey % 7 = 0 THEN 'AUTO_DIALER' "
            "ELSE CONCAT('AGENT_', CAST(l_suppkey % 7 AS VARCHAR(32))) END",
        ),
    ]


def _select_list(cols: list[tuple[str, str]]) -> str:
    return ",\n    ".join(f"{expr} AS {name}" for name, expr in cols)


def stg_accounts_sql(dialect: str) -> str:
    return f"SELECT\n    {_select_list(_account_cols(DIALECTS[dialect]))}\nFROM orders"


def stg_activities_sql(dialect: str) -> str:
    return (
        f"SELECT\n    {_select_list(_activity_cols(DIALECTS[dialect]))}\n"
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    )


def stg_accounts_df(orders: DataFrame) -> DataFrame:
    """stg_accounts as a DataFrame (narrow map over the orders scan)."""
    cols = _account_cols(DIALECTS["spark"])
    return orders.selectExpr(*[f"{expr} AS {name}" for name, expr in cols])


# Raw columns the activity derivation reads — the narrow payload that
# crosses the shuffle in the repartition_by_account path below.
_ACTIVITY_SOURCE_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_shipdate",
    "l_quantity",
    "l_extendedprice",
    "o_custkey",
]


def stg_activities_df(
    lineitem: DataFrame, orders: DataFrame, repartition_by_account: int | None = None
) -> DataFrame:
    """stg_activities as a DataFrame.

    The lineitem⋈orders equi-join recovers the account key; `orders` is the
    smaller side and Spark/AQE broadcast it below the threshold — at 100 TB
    this becomes a shuffle join on l_orderkey, which is also lineitem's
    natural clustering, so no extra repartition is needed.

    ``repartition_by_account``: hash-repartition on the derived account_id
    BEFORE projecting the wide derived strings, so only the ~8 narrow raw
    columns cross the wire and every downstream account_id aggregation/
    window runs exchange-free at full parallelism (measured 2.4x faster
    than deriving first for the survivor aggregation at sf0.1).
    """
    cols = _activity_cols(DIALECTS["spark"])
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    if repartition_by_account is None:
        return joined.selectExpr(*[f"{expr} AS {name}" for name, expr in cols])
    acct_expr = dict(cols)["account_id"]
    slim = joined.selectExpr(
        *_ACTIVITY_SOURCE_COLS, f"{acct_expr} AS account_id"
    ).repartition(repartition_by_account, "account_id")
    return slim.selectExpr(
        "account_id",
        *[f"{expr} AS {name}" for name, expr in cols if name != "account_id"],
    )
