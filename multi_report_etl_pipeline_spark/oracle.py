"""DuckDB oracle SQL for the reference-surface queries.

The driver (and tests/) run each engine query AND this SQL side-by-side on
the same parquet tables and hash-compare. The SQL mirrors the reference
semantics (/root/reference/01_staging_layer.sql, 02_reporting_layer.sql)
with the SAME determinism fixes the engine applies (unique-key window
tiebreakers, explicit NULLS LAST on DESC date orderings — SURVEY.md §2.5).

The base tables region..embeddings are pre-registered as DuckDB views; the
stg_accounts/stg_activities CTEs come from domain.py (single spec, two
dialects — no drift possible).
"""

from __future__ import annotations

from multi_report_etl_pipeline_spark.domain import stg_accounts_sql, stg_activities_sql

_CHANNEL_CASE = """CASE
    WHEN collection_channel = 'PHONE' THEN '01.PHONE'
    WHEN collection_channel = 'FIELD' THEN '02.FIELD'
    WHEN collection_channel = 'MESSAGING' THEN '03.MESSAGING'
    WHEN collection_channel = 'EMAIL' THEN '04.EMAIL'
    WHEN collection_channel = 'AGENT_BANK' THEN '05.AGENT_BANK'
    ELSE 'UNCLASSIFIED_CHANNEL'
END"""

_CONTACT_CASE = """CASE
    WHEN contact_type = 'PRIMARY' THEN '01.PRIMARY'
    WHEN contact_type IN ('THIRD_PARTY', 'RELATIVE') THEN '02.THIRD_PARTY'
    WHEN contact_type = 'NO_CONTACT' AND agent_name = 'AUTO_DIALER' THEN '04.AUTO_DIALER'
    WHEN contact_type = 'NO_CONTACT' THEN '03.NO_CONTACT'
    WHEN contact_type IN ('GUARANTOR', 'GUARANTOR_NO_CONTACT') THEN 'GUARANTOR'
    WHEN collection_channel = 'FIELD' THEN 'FIELD'
    WHEN collection_channel = 'MESSAGING' AND contact_type = 'PRIMARY' THEN '01.PRIMARY'
    WHEN collection_channel = 'MESSAGING' AND contact_type IN ('THIRD_PARTY', 'RELATIVE') THEN '02.THIRD_PARTY'
    WHEN collection_channel = 'MESSAGING' AND contact_type = 'NO_CONTACT' THEN '03.NO_CONTACT'
    WHEN collection_channel IN ('EMAIL', 'AGENT_BANK') THEN 'EMAIL'
    ELSE 'UNCLASSIFIED_CONTACT'
END"""

_FIELD_CONTACT_CASE = """CASE
    WHEN contact_type = 'PRIMARY' THEN '01.PRIMARY'
    WHEN contact_type IN ('THIRD_PARTY', 'RELATIVE') THEN '02.THIRD_PARTY'
    WHEN contact_type = 'NO_CONTACT' AND agent_name = 'AUTO_DIALER' THEN '04.AUTO_DIALER'
    WHEN contact_type = 'NO_CONTACT' THEN '03.NO_CONTACT'
    WHEN contact_type IN ('GUARANTOR', 'GUARANTOR_NO_CONTACT') THEN 'GUARANTOR'
    ELSE 'UNCLASSIFIED_CONTACT'
END"""

# per-dialect scalar fragments; everything else in this module is shared
# ANSI that both DuckDB and Spark SQL parse identically
DIALECT_FRAGMENTS = {
    "duckdb": {
        "parse": "CAST(try_strptime({col}, '%d/%m/%Y') AS DATE)",
        "fmt_iso": "strftime({col}, '%Y-%m-%d')",
    },
    "spark": {
        "parse": "try_to_date({col}, 'dd/MM/yyyy')",
        "fmt_iso": "date_format({col}, 'yyyy-MM-dd')",
    },
}

_ACTIVITY_TAIL = """contact_outcome,
        non_payment_reason,
        contact_location,
        next_action,
        notes,
        phone_number,
        department,
        agent_name"""

_OUT_COLS = (
    "account_id, activity_date, activity_time, next_activity_date, "
    "collection_channel, contact_type, " + _ACTIVITY_TAIL.replace("\n       ", "")
)


def _pre(channel_expr: str, contact_expr: str, where: str = "", dialect: str = "duckdb") -> str:
    ad = DIALECT_FRAGMENTS[dialect]["parse"].format(col="activity_date")
    nad = DIALECT_FRAGMENTS[dialect]["parse"].format(col="next_activity_date")
    return f"""SELECT
        account_id,
        activity_id,
        row_fp,
        {ad} AS activity_date,
        activity_time,
        {nad} AS next_activity_date,
        {channel_expr} AS collection_channel,
        {contact_expr} AS contact_type,
        {_ACTIVITY_TAIL}
    FROM stg_activities{where}"""


def _top1(pre_name: str, order_by: str) -> str:
    # activity_id is duplicated in the raw data (dirty id), so the unique
    # row_fp fingerprint closes the total order — same as staging._top1
    return f"""SELECT {_OUT_COLS}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY account_id
            ORDER BY {order_by}, activity_id ASC, row_fp ASC
        ) AS row_num FROM {pre_name}
    ) ranked WHERE row_num = 1"""


def staging_ctes(dialect: str = "duckdb") -> list[tuple[str, str]]:
    """Ordered (name, body) CTEs: raw staging + the five clean views."""
    return [
        ("stg_accounts", stg_accounts_sql(dialect)),
        ("stg_activities", stg_activities_sql(dialect)),
        (
            "clean_accounts",
            "SELECT *, CASE WHEN customer_city IN "
            "('METRO_AREA_1', 'METRO_AREA_2', 'METRO_AREA_3') THEN 'YES' ELSE 'NO' END "
            "AS coverage_area FROM stg_accounts",
        ),
        ("ccp_pre", _pre(_CHANNEL_CASE, _CONTACT_CASE, dialect=dialect)),
        (
            "clean_contacts_primary",
            _top1(
                "ccp_pre",
                "collection_channel ASC, contact_type ASC, activity_date DESC NULLS LAST",
            ),
        ),
        (
            "ccf_pre",
            _pre(
                "'02.FIELD'",
                _FIELD_CONTACT_CASE,
                "\n    WHERE collection_channel = 'FIELD'",
                dialect,
            ),
        ),
        (
            "clean_contacts_field",
            _top1("ccf_pre", "contact_type ASC, activity_date DESC NULLS LAST"),
        ),
        (
            "ccpr_pre",
            _pre(
                _CHANNEL_CASE,
                "'PROMISE'",
                "\n    WHERE contact_outcome = 'PAYMENT_PROMISE'",
                dialect,
            ),
        ),
        (
            "clean_contacts_promise",
            _top1("ccpr_pre", "activity_date DESC NULLS LAST, activity_time DESC"),
        ),
        (
            "ccr_pre",
            _pre(
                _CHANNEL_CASE,
                "'RESTRUCTURE'",
                "\n    WHERE contact_outcome = 'RESTRUCTURE_REQUEST'",
                dialect,
            ),
        ),
        (
            "clean_contacts_restructure",
            _top1("ccr_pre", "activity_date DESC NULLS LAST, activity_time DESC"),
        ),
    ]


def with_prelude(
    final_select: str,
    extra_ctes: list[tuple[str, str]] | None = None,
    dialect: str = "duckdb",
) -> str:
    ctes = staging_ctes(dialect) + (extra_ctes or [])
    body = ",\n".join(f"{name} AS (\n{sql}\n)" for name, sql in ctes)
    return f"WITH {body}\n{final_select}"


_CONTACT_LABEL = """COALESCE(
            CASE
                WHEN c.contact_type = '01.PRIMARY' THEN 'PRIMARY'
                WHEN c.contact_type = '02.THIRD_PARTY' THEN 'THIRD_PARTY'
                WHEN c.contact_type = '03.NO_CONTACT' THEN 'NO_CONTACT'
                WHEN c.contact_type = '04.AUTO_DIALER' THEN 'AUTO_DIALER'
                ELSE 'NO_CONTACT'
            END,
            'NO_CONTACT'
        )"""

def _report12_payload(dialect: str) -> str:
    fmt = DIALECT_FRAGMENTS[dialect]["fmt_iso"].format(col="c.activity_date")
    return f"""a.account_id,
        a.account_checkdigit,
        a.agent_type,
        a.customer_name,
        a.product_type,
        a.risk_segment,
        a.outstanding_balance,
        a.agent_name,
        a.operation_number,
        COALESCE(c.phone_number, 'NO_CONTACT') AS contact_phone,
        COALESCE(c.notes, 'NO_CONTACT') AS activity_notes,
        {_CONTACT_LABEL} AS contact_type,
        COALESCE({fmt}, 'NO_CONTACT') AS last_activity_date,
        CASE WHEN f.account_id IS NOT NULL THEN 'YES' ELSE 'NO' END AS field_visit_completed,
        a.business_division,
        a.customer_city,
        a.coverage_area"""

_REPORT12_OUT = """company, account_id, account_checkdigit, agent_type, customer_name,
    product_type, risk_segment, outstanding_balance, agent_name, operation_number,
    contact_phone, activity_notes, contact_type, last_activity_date,
    field_visit_completed, business_division, customer_city, coverage_area"""


def report_mortgage_sql(dialect: str = "duckdb") -> str:
    extra = [
        (
            "filtered_accounts",
            f"""SELECT
        {_report12_payload(dialect)}
    FROM clean_accounts a
    LEFT JOIN clean_contacts_primary c ON a.account_id = c.account_id
    LEFT JOIN clean_contacts_field f ON a.account_id = f.account_id
    WHERE a.product_type = 'MORTGAGE'
        AND a.business_division = 'RETAIL'
        AND a.containment_percentage = 0""",
        ),
        (
            "deduplicated_accounts",
            """SELECT *, ROW_NUMBER() OVER (
        PARTITION BY account_id ORDER BY risk_segment DESC, operation_number ASC
    ) AS row_num FROM filtered_accounts""",
        ),
    ]
    final = (
        f"SELECT 'COMPANY_NAME' AS company, {_REPORT12_OUT.replace('company, ', '', 1)}\n"
        "FROM deduplicated_accounts WHERE row_num = 1"
    )
    return with_prelude(final, extra, dialect)


def report_restructuring_sql(dialect: str = "duckdb") -> str:
    extra = [
        (
            "filtered_accounts",
            f"""SELECT
        {_report12_payload(dialect)}
    FROM clean_accounts a
    LEFT JOIN clean_contacts_primary c ON a.account_id = c.account_id
    LEFT JOIN clean_contacts_field f ON a.account_id = f.account_id
    LEFT JOIN clean_contacts_restructure r ON a.account_id = r.account_id
    WHERE a.business_division = 'RETAIL'
        AND a.containment_percentage = 0
        AND r.contact_type = 'RESTRUCTURE'""",
        ),
        (
            "deduplicated_accounts",
            """SELECT *, ROW_NUMBER() OVER (
        PARTITION BY account_id ORDER BY product_type ASC, risk_segment DESC, operation_number ASC
    ) AS row_num FROM filtered_accounts""",
        ),
    ]
    final = (
        f"SELECT 'COMPANY_NAME' AS company, {_REPORT12_OUT.replace('company, ', '', 1)}\n"
        "FROM deduplicated_accounts WHERE row_num = 1"
    )
    return with_prelude(final, extra, dialect)


def report_promises_sql(dialect: str = "duckdb") -> str:
    promise_fmt = DIALECT_FRAGMENTS[dialect]["fmt_iso"].format(col="p.next_activity_date")
    extra = [
        (
            "filtered_accounts",
            f"""SELECT
        a.account_id,
        a.account_checkdigit,
        a.customer_name,
        a.agent_type,
        a.risk_segment,
        a.outstanding_balance,
        COALESCE(c.collection_channel, 'NO_CONTACT') AS collection_channel,
        {_CONTACT_LABEL} AS contact_type,
        CASE WHEN p.account_id IS NOT NULL THEN 'YES' ELSE 'NO' END AS payment_promise_active,
        COALESCE({promise_fmt}, 'NO_PROMISE_DATE') AS promise_date,
        COALESCE(c.phone_number, 'NO_CONTACT') AS contact_phone,
        COALESCE(c.notes, 'NO_CONTACT') AS activity_notes,
        a.operation_number
    FROM clean_accounts a
    LEFT JOIN clean_contacts_primary c ON a.account_id = c.account_id
    LEFT JOIN clean_contacts_promise p ON a.account_id = p.account_id
    WHERE a.business_division = 'RETAIL'
        AND a.containment_percentage = 0
        AND a.product_type = 'COMMERCIAL_LOAN'""",
        ),
        (
            "deduplicated_accounts",
            """SELECT *, ROW_NUMBER() OVER (
        PARTITION BY account_id ORDER BY risk_segment DESC, operation_number ASC
    ) AS row_num FROM filtered_accounts""",
        ),
    ]
    final = """SELECT 'COMPANY_NAME' AS company, account_id, account_checkdigit, customer_name,
    agent_type, risk_segment, outstanding_balance, collection_channel, contact_type,
    payment_promise_active, promise_date, contact_phone, activity_notes
FROM deduplicated_accounts WHERE row_num = 1"""
    return with_prelude(final, extra, dialect)


def view_sql(view_name: str, dialect: str = "duckdb") -> str:
    """Full SELECT of one staging view (for view-level differential checks)."""
    return with_prelude(f"SELECT * FROM {view_name}", dialect=dialect)


def quality_view_counts_sql() -> str:
    parts = [
        f"SELECT '{v}' AS view_name, COUNT(*) AS cnt, "
        f"COUNT(DISTINCT account_id) AS distinct_accounts FROM {v}"
        for v in (
            "clean_accounts",
            "clean_contacts_primary",
            "clean_contacts_field",
            "clean_contacts_promise",
            "clean_contacts_restructure",
        )
    ]
    return with_prelude(" UNION ALL ".join(parts))


def quality_duplicate_operations_sql() -> str:
    return with_prelude(
        "SELECT account_id, COUNT(*) AS op_count FROM clean_accounts "
        "WHERE account_id IS NOT NULL GROUP BY account_id HAVING COUNT(*) > 1"
    )


def quality_null_keys_sql() -> str:
    return with_prelude(
        "SELECT 'stg_accounts' AS table_name, COUNT(*) AS null_keys FROM stg_accounts "
        "WHERE account_id IS NULL UNION ALL "
        "SELECT 'stg_activities' AS table_name, COUNT(*) AS null_keys FROM stg_activities "
        "WHERE account_id IS NULL"
    )


def quality_date_parse_failures_sql() -> str:
    parsed = DIALECT_FRAGMENTS["duckdb"]["parse"].format(col="activity_date")
    return with_prelude(
        f"SELECT account_id, activity_id, activity_date AS raw_activity_date "
        f"FROM stg_activities WHERE {parsed} IS NULL AND activity_date IS NOT NULL "
        "ORDER BY activity_id ASC, row_fp ASC LIMIT 10"
    )
