"""Distributed linear-model training: the quality-classifier primitive.

Every serious pretraining pipeline gates documents with a learned quality
classifier (fastText / logistic heads over cheap text features — the
FineWeb-Edu / DCLM pattern). This module trains that head IN the engine:
full-batch gradient descent where each iteration is ONE partially
aggregated Spark job over the corpus, and the model state that crosses
the driver is d+1 floats.

The 100 TB shape: per iteration the corpus-side work is a narrow map
(score every row against d+1 literal weights — whole-stage codegen, no
broadcast needed because the weights are compiled into the plan) feeding
a partial-aggregated gradient sum of d+2 cells. Nothing shuffles by key;
the only exchange is the final single-partition agg merge, and the only
driver traffic is one (d+2)-cell row per iteration. Feature projection
is persisted across iterations above a threshold, mirroring
``similarity.distributed_kmeans``'s ownership of iteration persistence.

Determinism / oracle story (the kmeans unrolled-CTE technique,
similarity.py): weights are ROUNDED to 6 decimals after every update —
the rounding is done with the same floor(x*1e6 + 0.5) half-away-from-zero
rule DuckDB's ROUND applies to doubles — so both engines iterate from
identical weight vectors and the residual float risk is a gradient sum
landing within an ulp of a rounding boundary. The DuckDB twin
(queries/llm_ops.py:_logreg_sql) unrolls the same iterations as chained
single-row CTEs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOGREG_LR = 0.5
LOGREG_ROUND = 6


def _round_half_away(x: float, digits: int = LOGREG_ROUND) -> float:
    """DuckDB ROUND semantics on doubles: half away from zero (Python's
    round() is half-even on exact decimal ties; the engines must agree
    because the rounded weights are the shared iteration state)."""
    p = 10.0**digits
    return math.floor(x * p + 0.5) / p if x >= 0 else math.ceil(x * p - 0.5) / p


def _margin(w: list[float], feature_cols: list[str]) -> F.Column:
    z = F.lit(w[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(w[j + 1]) * F.col(c)
    return z


def logistic_regression_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 3,
    lr: float = LOGREG_LR,
    persist_features: bool | None = None,
) -> list[float]:
    """Full-batch logistic regression: ``iters`` GD steps from w = 0.

    Update rule (bias first): w <- round(w - lr/n * X^T (sigmoid(Xw) - y), 6).

    ``persist_features`` mirrors distributed_kmeans: default auto-persists
    the projected feature frame when there are >= 4 corpus passes,
    released before return. Returns the trained weights — the frozen
    artifact a deployment persists and streams new data against.
    """
    d = len(feature_cols)
    feats = df.select(label_col, *feature_cols)
    do_persist = iters >= 4 if persist_features is None else persist_features
    if do_persist:
        from pyspark import StorageLevel  # noqa: PLC0415

        feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
    w = [0.0] * (d + 1)
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w, feature_cols)))
        resid = p - F.col(label_col)
        # ONE partial agg: d+2 cells cross the exchange, one row reaches
        # the driver (bounded by contract — model state, not data).
        row = feats.agg(
            F.sum(resid).alias("g0"),
            *(
                F.sum(resid * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if not row["n"]:  # empty corpus: no gradient, keep w (scores empty)
            break
        n = row["n"]
        w = [_round_half_away(w[j] - lr * row[f"g{j}"] / n) for j in range(d + 1)]
    if do_persist:
        feats.unpersist(blocking=False)
    return w


def logistic_regression_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Score rows against frozen weights: a pure narrow map (the weights
    are plan literals — no broadcast, no shuffle), so it runs unchanged
    over a batch frame OR a structured stream (streaming twin:
    streaming.quality_score_stream). ``score`` is the 6-dp-rounded
    sigmoid; ``pred`` thresholds the ROUNDED score at 0.5 so both
    engines branch on the identical value."""
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(weights, feature_cols))),
        LOGREG_ROUND,
    ).alias("score")
    return df.select(id_col, score).withColumn(
        "pred", (F.col("score") >= 0.5).cast("int")
    )


def logistic_regression_train_score(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    id_col: str = "doc_id",
    iters: int = 3,
    lr: float = LOGREG_LR,
    persist_features: bool | None = None,
) -> tuple[DataFrame, list[float]]:
    """Fit + score in one call (the batch query shape). Returns
    (scored DataFrame: id, score, pred; final weights)."""
    feats = df.select(id_col, label_col, *feature_cols)
    do_persist = (iters + 1) >= 4 if persist_features is None else persist_features
    if do_persist:
        from pyspark import StorageLevel  # noqa: PLC0415

        feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
    w = logistic_regression_fit(
        feats, feature_cols, label_col, iters=iters, lr=lr, persist_features=False
    )
    out = logistic_regression_score(feats, feature_cols, w, id_col=id_col)
    if do_persist:
        # lazy unpersist: blocks drop once the returned plan is consumed
        feats.unpersist(blocking=False)
    return out, w
