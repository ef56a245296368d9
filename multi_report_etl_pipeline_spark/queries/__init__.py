"""Query registry.

Each submodule exposes ``QUERIES: dict[str, QuerySpec]``. ``all_queries()``
merges them; ``__spark_entry__`` (driver contract) is a thin shim over it.

ROTATION POLICY (the driver audit window)
=========================================

The verification driver audits the registry in iteration order and caps
at ``DRIVER_AUDIT_CAP`` (50) entries per round; entries past the cap get
no driver CORRECTNESS row that round. The registry holds 173 queries —
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

Round-7 window derivation:
- rule 4: the 5 reference-surface rows.
- rule 2: the round-7 TPC-H completion batch — q2/q9/q11/q16/q20, the
  five dbgen queries unblocked by the derived-partsupp construction
  (tpch.py PARTSUPP_CTES / derived_partsupp); TPC-H is now 22/22 —
  plus emb_ivf_indexed_topk (ANN served from a persisted
  cell-partitioned IVF index with a partition-pruned scan, the 100 TB
  serving layout; same unrolled value oracle as emb_ivf_topk).
- rule 1 (changed since the round-6 driver run): the ASCII-invariant
  enforcement in the _dhash_media/_wav_media/_y4m_media in-plan
  builders (commit b81f5b9) changed every consumer's plan and SQL twin
  — docs_image_dhash, docs_dhash_near_dup, streaming_image_dedup,
  docs_audio_decode, docs_audio_fingerprint, docs_audio_near_dup,
  streaming_audio_dedup, docs_video_dhash, docs_video_near_dup,
  streaming_video_dedup; emb_int8_topk (filter-before-LIMIT query-set
  alignment, same commit); docs_bpe_merges + docs_bpe_tokenize (the
  trainer now scopes AQE initialPartitionNum around its persist,
  commit aa25676); docs_minhash_near_dup (round-7 adaptive
  collapse-exact guard in minhash_near_dup_pairs — the cross-corpus
  fuzzy_contamination_pairs path has no collapse stage and is
  untouched); emb_ivf_topk (round-7 GEMM-prune rewrite of the in-cell
  scoring, bit-identical output, 27.6 -> 2.3 s at 200k vectors);
  orders_top_customers + orders_top_customers_salted (round-7
  long-cents accumulator swap — SUM(DECIMAL) left the fast path; sf10
  A/B 3.22 -> 1.53 s, sf100 72.8 -> 8.3 s); customer_rfm_segments
  (narrow->distributed flip threshold lowered to the MEASURED 1.5 GB
  sf100 crossover — the audited-scale plan is unchanged, seated as
  conservative coverage of the code change).
- rule 3: the 16 registry entries that have NEVER held a driver seat
  (VERDICT r6 item 4): orders_price_ntiles, orders_running_balance,
  tpch_q18_large_volume_customers, orders_trailing_30d_stats,
  orders_quality_checks, orders_first_last_nth, customer_abc_analysis,
  docs_minhash_estimate, docs_hashed_ngram_logreg,
  events_hourly_unique_users, events_hourly_top_users,
  events_session_paths, events_daily_type_unpivot,
  streaming_transition_matrix, streaming_cms_frequencies,
  streaming_binned_percentiles.
Demoted in exchange: everything else — all r5/r6 hash-green on code
untouched since (the staging/reports materialization surface keeps its
rule-4 representatives; every demoted entry stays pytest-oracle-checked
per round and scripts/validate.py re-proves any subset on demand).
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
    # rule 2 — the round-7 TPC-H completion batch (derived partsupp)
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q20_potential_part_promotion",
    # rule 1 — media-construction ASCII invariant (b81f5b9) changed
    # every plan + SQL twin in the multimodal dedup matrix
    "docs_image_dhash",
    "docs_dhash_near_dup",
    "streaming_image_dedup",
    "docs_audio_decode",
    "docs_audio_fingerprint",
    "docs_audio_near_dup",
    "streaming_audio_dedup",
    "docs_video_dhash",
    "docs_video_near_dup",
    "streaming_video_dedup",
    # rule 1 — int8 ANN query-set alignment (b81f5b9); IVF in-cell
    # scoring GEMM-prune rewrite (round 7)
    "emb_int8_topk",
    "emb_ivf_topk",
    # rule 2 — round-7 addition: ANN served from the persisted
    # cell-partitioned IVF index (partition-pruned scan)
    "emb_ivf_indexed_topk",
    # rule 1 — round-7 long-cents accumulator swap (decimal sum left
    # the fast path; sf10 A/B 3.22 -> 1.53 s) changed both plans
    "orders_top_customers",
    "orders_top_customers_salted",
    # rule 1 — round-7 rfm strategy-flip threshold lowered to the
    # measured 1.5 GB crossover (audited-scale plan unchanged — the
    # seat is conservative coverage of the code change)
    "customer_rfm_segments",
    # rule 1 — BPE trainer conf scoping (aa25676)
    "docs_bpe_merges",
    "docs_bpe_tokenize",
    # rule 1 — round-7 adaptive collapse-exact MinHash guard
    "docs_minhash_near_dup",
    # rule 3 — the 16 never-driver-audited entries (VERDICT r6 item 4)
    "orders_price_ntiles",
    "orders_running_balance",
    "tpch_q18_large_volume_customers",
    "orders_trailing_30d_stats",
    "orders_quality_checks",
    "orders_first_last_nth",
    "customer_abc_analysis",
    "docs_minhash_estimate",
    "docs_hashed_ngram_logreg",
    "events_hourly_unique_users",
    "events_hourly_top_users",
    "events_session_paths",
    "events_daily_type_unpivot",
    "streaming_transition_matrix",
    "streaming_cms_frequencies",
    "streaming_binned_percentiles",
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
