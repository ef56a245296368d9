"""Staging layer: five cleansing/dedup views, as pure DataFrame -> DataFrame
builders (reference: /root/reference/01_staging_layer.sql).

Design notes (Spark-first, not a translation):

- Each builder is a lazy logical plan; ``register_staging_views`` exposes
  them as temp views — the exact analog of the reference's
  non-materialized ``CREATE VIEW`` (01:23-25; README.md:116).
- The reference's dedup strategy — one ROW_NUMBER window per view, keep
  rank 1 (01:124-146) — maps to ``Window.partitionBy('account_id')``.
  Spark's WindowExec is sort-based and spillable, and modern Catalyst
  rewrites ``row_number() = 1`` filters into a per-group top-1 limit
  (InferWindowGroupLimit), so this is already the scalable plan at 100 TB:
  one hash exchange per view on account_id, no self-joins.
- Pre-window filters (channel/outcome; 01:190, 274, 358) stay *below* the
  window exactly as in the reference so they reach the Parquet scan as
  pushed filters.
- ⚠ Determinism: the reference's window ORDER BYs are partial orders —
  ties leave the surviving row engine-dependent (SURVEY.md §2.5). Every
  window here appends ``activity_id ASC`` (a unique key) so the order is
  total and the DuckDB differential oracle can hash-match.
- All date work is ``try_to_date(col, 'dd/MM/yyyy')``: same null-on-
  malformed behavior as SQLite's ``DATE(SUBSTR...)`` pipeline (01:64-68)
  without the string surgery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ACTIVITY_OUTPUT_COLS = [
    "account_id",
    "activity_date",
    "activity_time",
    "next_activity_date",
    "collection_channel",
    "contact_type",
    "contact_outcome",
    "non_payment_reason",
    "contact_location",
    "next_action",
    "notes",
    "phone_number",
    "department",
    "agent_name",
]

METRO_AREAS = ("METRO_AREA_1", "METRO_AREA_2", "METRO_AREA_3")

CHANNEL_PRIORITY = {
    "PHONE": "01.PHONE",
    "FIELD": "02.FIELD",
    "MESSAGING": "03.MESSAGING",
    "EMAIL": "04.EMAIL",
    "AGENT_BANK": "05.AGENT_BANK",
}


def parse_ddmmyyyy(col: Column | str) -> Column:
    """DD/MM/YYYY string -> DateType, NULL on malformed input.

    Replaces the reference's SUBSTR/concat/DATE() pipeline (01:64-68) with
    one vectorized JVM expression; `try_to_date` nulls invalid dates like
    SQLite's DATE() does, even under ANSI mode.
    """
    return F.try_to_date(F.col(col) if isinstance(col, str) else col, "dd/MM/yyyy")


def channel_priority(col: Column | str) -> Column:
    """Channel -> priority-prefixed label (01:76-83). The '01.'..'05.'
    prefixes make lexicographic ASC ordering a priority order; Spark's
    UTF8 binary string comparison matches SQLite memcmp, so the encoding
    carries over unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "PHONE", "01.PHONE")
        .when(c == "FIELD", "02.FIELD")
        .when(c == "MESSAGING", "03.MESSAGING")
        .when(c == "EMAIL", "04.EMAIL")
        .when(c == "AGENT_BANK", "05.AGENT_BANK")
        .otherwise("UNCLASSIFIED_CHANNEL")
    )


def contact_type_normalized(contact: Column, channel_raw: Column, agent: Column) -> Column:
    """Contact-type standardization, arm-for-arm with 01:85-97 (including
    the unreachable MESSAGING arms, kept for semantic parity)."""
    return (
        F.when(contact == "PRIMARY", "01.PRIMARY")
        .when(contact.isin("THIRD_PARTY", "RELATIVE"), "02.THIRD_PARTY")
        .when((contact == "NO_CONTACT") & (agent == "AUTO_DIALER"), "04.AUTO_DIALER")
        .when(contact == "NO_CONTACT", "03.NO_CONTACT")
        .when(contact.isin("GUARANTOR", "GUARANTOR_NO_CONTACT"), "GUARANTOR")
        .when(channel_raw == "FIELD", "FIELD")
        .when((channel_raw == "MESSAGING") & (contact == "PRIMARY"), "01.PRIMARY")
        .when(
            (channel_raw == "MESSAGING") & contact.isin("THIRD_PARTY", "RELATIVE"),
            "02.THIRD_PARTY",
        )
        .when((channel_raw == "MESSAGING") & (contact == "NO_CONTACT"), "03.NO_CONTACT")
        .when(channel_raw.isin("EMAIL", "AGENT_BANK"), "EMAIL")
        .otherwise("UNCLASSIFIED_CONTACT")
    )


def field_contact_type(contact: Column, agent: Column) -> Column:
    """Field-view contact normalization (01:173-180) — no channel arms."""
    return (
        F.when(contact == "PRIMARY", "01.PRIMARY")
        .when(contact.isin("THIRD_PARTY", "RELATIVE"), "02.THIRD_PARTY")
        .when((contact == "NO_CONTACT") & (agent == "AUTO_DIALER"), "04.AUTO_DIALER")
        .when(contact == "NO_CONTACT", "03.NO_CONTACT")
        .when(contact.isin("GUARANTOR", "GUARANTOR_NO_CONTACT"), "GUARANTOR")
        .otherwise("UNCLASSIFIED_CONTACT")
    )


def clean_accounts(stg_accounts: DataFrame) -> DataFrame:
    """View 1 (01:25-44): pass-through projection + coverage_area flag."""
    return stg_accounts.withColumn(
        "coverage_area",
        F.when(F.col("customer_city").isin(*METRO_AREAS), "YES").otherwise("NO"),
    )


def _preprocessed(stg_activities: DataFrame, contact_expr: Column) -> DataFrame:
    """Shared contact_preprocessing projection (01:60-107)."""
    return stg_activities.select(
        "account_id",
        "activity_id",
        "row_fp",
        parse_ddmmyyyy("activity_date").alias("activity_date"),
        "activity_time",
        parse_ddmmyyyy("next_activity_date").alias("next_activity_date"),
        channel_priority("collection_channel").alias("collection_channel"),
        contact_expr.alias("contact_type"),
        "contact_outcome",
        "non_payment_reason",
        "contact_location",
        "next_action",
        "notes",
        "phone_number",
        "department",
        "agent_name",
    )


def _top1(df: DataFrame, *order_cols: Column) -> DataFrame:
    """Keep the first row per account under a TOTAL order (activity_id,
    then the unique row_fp fingerprint appended — activity_id alone is
    duplicated in the raw data). filter(row_number()=1) compiles to a
    per-group limit (WindowGroupLimit) — no second pass over the data."""
    w = (
        Window.partitionBy("account_id")
        .orderBy(*order_cols, F.col("activity_id").asc(), F.col("row_fp").asc())
    )
    return (
        df.withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") == 1)
        .select(*ACTIVITY_OUTPUT_COLS)
    )


def clean_contacts_primary(stg_activities: DataFrame) -> DataFrame:
    """View 2 (01:59-146): latest *relevant* contact per account — channel
    priority ASC, contact-type priority ASC, recency DESC."""
    pre = _preprocessed(
        stg_activities,
        contact_type_normalized(
            F.col("contact_type"), F.col("collection_channel"), F.col("agent_name")
        ),
    )
    return _top1(
        pre,
        F.col("collection_channel").asc(),
        F.col("contact_type").asc(),
        F.col("activity_date").desc_nulls_last(),
    )


def clean_contacts_field(stg_activities: DataFrame) -> DataFrame:
    """View 3 (01:157-230): latest field visit. The channel filter sits
    below the window, as in the reference (01:190), so it pushes to scan."""
    pre = stg_activities.filter(F.col("collection_channel") == "FIELD").select(
        "account_id",
        "activity_id",
        "row_fp",
        parse_ddmmyyyy("activity_date").alias("activity_date"),
        "activity_time",
        parse_ddmmyyyy("next_activity_date").alias("next_activity_date"),
        F.lit("02.FIELD").alias("collection_channel"),
        field_contact_type(F.col("contact_type"), F.col("agent_name")).alias("contact_type"),
        "contact_outcome",
        "non_payment_reason",
        "contact_location",
        "next_action",
        "notes",
        "phone_number",
        "department",
        "agent_name",
    )
    return _top1(
        pre,
        F.col("contact_type").asc(),
        F.col("activity_date").desc_nulls_last(),
    )


def _outcome_view(stg_activities: DataFrame, outcome: str, label: str) -> DataFrame:
    """Views 4/5 (01:241-398): latest promise / restructure request."""
    pre = stg_activities.filter(F.col("contact_outcome") == outcome).select(
        "account_id",
        "activity_id",
        "row_fp",
        parse_ddmmyyyy("activity_date").alias("activity_date"),
        "activity_time",
        parse_ddmmyyyy("next_activity_date").alias("next_activity_date"),
        channel_priority("collection_channel").alias("collection_channel"),
        F.lit(label).alias("contact_type"),
        "contact_outcome",
        "non_payment_reason",
        "contact_location",
        "next_action",
        "notes",
        "phone_number",
        "department",
        "agent_name",
    )
    return _top1(
        pre,
        F.col("activity_date").desc_nulls_last(),
        F.col("activity_time").desc(),
    )


def clean_contacts_promise(stg_activities: DataFrame) -> DataFrame:
    return _outcome_view(stg_activities, "PAYMENT_PROMISE", "PROMISE")


def clean_contacts_restructure(stg_activities: DataFrame) -> DataFrame:
    return _outcome_view(stg_activities, "RESTRUCTURE_REQUEST", "RESTRUCTURE")


# ---------------------------------------------------------------------------
# Single-exchange combined ranking: all four contact views share the same
# window partition key (account_id), so their four top-1 windows can run
# over ONE hash exchange with four sorts instead of four full
# shuffle+sort passes. Filtered views (field/promise/restructure) become
# conditional ranks — the predicate leads the sort key, so rank 1 AND
# pred is exactly "top-1 among predicate rows". Used by the materialized
# staging path; the lazy per-view builders above stay the reference
# semantics (and the parity test pins the two paths equal).

def _rank_exprs() -> list[Column]:
    """The four views' conditional row_number ranks (shared account_id
    partition, per-view order keys; pred-first so rank 1 AND pred ==
    top-1 among predicate rows)."""

    def rank(*order_cols):
        w = Window.partitionBy("account_id").orderBy(
            *order_cols, F.col("activity_id").asc(), F.col("row_fp").asc()
        )
        return F.row_number().over(w)

    pred_first = lambda flag: F.when(F.col(flag), 0).otherwise(1).asc()  # noqa: E731
    return [
        rank(
            F.col("channel_prio").asc(),
            F.col("type_norm").asc(),
            F.col("activity_date").desc_nulls_last(),
        ).alias("rank_primary"),
        rank(
            pred_first("is_field"),
            F.col("type_field").asc(),
            F.col("activity_date").desc_nulls_last(),
        ).alias("rank_field"),
        rank(
            pred_first("is_promise"),
            F.col("activity_date").desc_nulls_last(),
            F.col("activity_time").desc(),
        ).alias("rank_promise"),
        rank(
            pred_first("is_restructure"),
            F.col("activity_date").desc_nulls_last(),
            F.col("activity_time").desc(),
        ).alias("rank_restructure"),
    ]


def combined_contact_ranks(stg_activities: DataFrame) -> DataFrame:
    """One logical pass over stg_activities producing every contact
    view's survivor rows: ranks for all four views over a single
    account_id exchange, keeping only rows that win at least one view
    (<=4 rows per account in the output).

    Late materialization: the exchange + four sorts run over ONLY the
    rank-key columns (parquet column pruning keeps the payload columns
    out of the scan entirely), then the tiny winner set broadcast-joins
    back to the full row on the unique activity_id. Sorting full-width
    rows four times was measured ~3x slower at sf0.1."""
    slim = stg_activities.select(
        "account_id",
        "activity_id",
        "row_fp",
        parse_ddmmyyyy("activity_date").alias("activity_date"),
        "activity_time",
        channel_priority("collection_channel").alias("channel_prio"),
        contact_type_normalized(
            F.col("contact_type"), F.col("collection_channel"), F.col("agent_name")
        ).alias("type_norm"),
        field_contact_type(F.col("contact_type"), F.col("agent_name")).alias("type_field"),
        (F.col("collection_channel") == "FIELD").alias("is_field"),
        (F.col("contact_outcome") == "PAYMENT_PROMISE").alias("is_promise"),
        (F.col("contact_outcome") == "RESTRUCTURE_REQUEST").alias("is_restructure"),
    )
    winners = (
        slim.select("*", *_rank_exprs())
        .filter(
            (F.col("rank_primary") == 1)
            | ((F.col("rank_field") == 1) & F.col("is_field"))
            | ((F.col("rank_promise") == 1) & F.col("is_promise"))
            | ((F.col("rank_restructure") == 1) & F.col("is_restructure"))
        )
        .select(
            F.col("row_fp").alias("w_row_fp"),
            "rank_primary",
            "rank_field",
            "rank_promise",
            "rank_restructure",
        )
    )
    return (
        stg_activities.join(
            F.broadcast(winners),
            stg_activities.row_fp == winners.w_row_fp,
        )
        .select(
            "account_id",
            "activity_id",
            parse_ddmmyyyy("activity_date").alias("activity_date"),
            "activity_time",
            parse_ddmmyyyy("next_activity_date").alias("next_activity_date"),
            channel_priority("collection_channel").alias("channel_prio"),
            contact_type_normalized(
                F.col("contact_type"), F.col("collection_channel"), F.col("agent_name")
            ).alias("type_norm"),
            field_contact_type(F.col("contact_type"), F.col("agent_name")).alias(
                "type_field"
            ),
            (F.col("collection_channel") == "FIELD").alias("is_field"),
            (F.col("contact_outcome") == "PAYMENT_PROMISE").alias("is_promise"),
            (F.col("contact_outcome") == "RESTRUCTURE_REQUEST").alias("is_restructure"),
            "contact_outcome",
            "non_payment_reason",
            "contact_location",
            "next_action",
            "notes",
            "phone_number",
            "department",
            "agent_name",
            "rank_primary",
            "rank_field",
            "rank_promise",
            "rank_restructure",
        )
    )


def _extract(combined: DataFrame, cond: Column, channel: Column, ctype: Column) -> DataFrame:
    out = [
        "account_id",
        "activity_date",
        "activity_time",
        "next_activity_date",
        channel.alias("collection_channel"),
        ctype.alias("contact_type"),
        "contact_outcome",
        "non_payment_reason",
        "contact_location",
        "next_action",
        "notes",
        "phone_number",
        "department",
        "agent_name",
    ]
    return combined.filter(cond).select(*out)


def clean_views_from_combined(combined: DataFrame) -> dict[str, DataFrame]:
    """The four contact views as cheap filters over the combined ranking
    (column order matches ACTIVITY_OUTPUT_COLS exactly)."""
    return {
        "clean_contacts_primary": _extract(
            combined,
            F.col("rank_primary") == 1,
            F.col("channel_prio"),
            F.col("type_norm"),
        ),
        "clean_contacts_field": _extract(
            combined,
            (F.col("rank_field") == 1) & F.col("is_field"),
            F.lit("02.FIELD"),
            F.col("type_field"),
        ),
        "clean_contacts_promise": _extract(
            combined,
            (F.col("rank_promise") == 1) & F.col("is_promise"),
            F.col("channel_prio"),
            F.lit("PROMISE"),
        ),
        "clean_contacts_restructure": _extract(
            combined,
            (F.col("rank_restructure") == 1) & F.col("is_restructure"),
            F.col("channel_prio"),
            F.lit("RESTRUCTURE"),
        ),
    }


STAGING_BUILDERS = {
    "clean_accounts": clean_accounts,
    "clean_contacts_primary": clean_contacts_primary,
    "clean_contacts_field": clean_contacts_field,
    "clean_contacts_promise": clean_contacts_promise,
    "clean_contacts_restructure": clean_contacts_restructure,
}


def register_staging_views(
    spark: SparkSession, stg_accounts: DataFrame, stg_activities: DataFrame
) -> dict[str, DataFrame]:
    """Materialize nothing; register the five lazy views (README.md:116)."""
    views = {
        "clean_accounts": clean_accounts(stg_accounts),
        "clean_contacts_primary": clean_contacts_primary(stg_activities),
        "clean_contacts_field": clean_contacts_field(stg_activities),
        "clean_contacts_promise": clean_contacts_promise(stg_activities),
        "clean_contacts_restructure": clean_contacts_restructure(stg_activities),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return views
