"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design:
- exact: one shuffle on the 128-bit fingerprint; keep min-id per group.
- n-gram Jaccard: shingle -> explode -> self-join on shingle -> count.
  Exact but O(sum df(shingle)^2) in pair generation; the ``max_df`` knob
  drops ubiquitous shingles (stopword runs) which is what keeps the join
  skew-free on web-scale corpora.
- MinHash-LSH (Spark ML): signatures + banded bucketing turn the
  quadratic candidate space into per-bucket joins; tune num hash tables
  vs recall. approxSimilarityJoin is the 100 TB path.
- SimHash: 64-bit signature from token hashes; band the signature into
  4x16-bit keys so candidate pairs share at least one band (Hamming<=3
  guaranteed to collide in >=1 band by pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.operators.text import (
    fingerprint,
    normalized,
    words,
)

# minhash_near_dup_pairs adaptive mode: collapse byte-equal groups only
# when the largest group has at least this many members (below it, the
# per-band candidate blowup is bounded by 4 rows per group — linear).
_GUARD_MIN_GROUP = 3


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """Keep one row per distinct normalized text (lowest id wins —
    deterministic, unlike dropDuplicates).

    ``keep`` projects the row down BEFORE the fingerprint shuffle; when
    the caller only needs (id, fingerprint), this keeps the full text
    column (the wide part of the row) out of the exchange — at corpus
    scale that is the difference between shuffling ids and shuffling the
    corpus."""
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    fp = df.withColumn("fingerprint", fingerprint(text_col))
    if keep is not None:
        fp = fp.select(*keep)
    return fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct word n-grams per document. Documents
    with fewer than n words are dropped (no shingle is defined)."""
    sh = F.expr(
        f"transform(sequence(0, size(words) - {n}), "
        f"i -> array_join(slice(words, i + 1, {n}), ' '))"
    )
    return (
        df.withColumn("words", F.split(normalized(text_col), " "))
        .filter(F.size(F.col("words")) >= n)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct word n-grams it shares with a benchmark/eval set. Any doc
    with a row here is 'contaminated' and gets dropped or audited before
    training — the standard eval-leakage guard in LLM data pipelines.
    Real deployments window at ~13 grams; the fixture's short word-salad
    documents need n=4 to exercise the path.

    Scale shape: both sides shingle into (id, ngram) rows; the benchmark
    side reduces to its DISTINCT n-gram set (bounded by the benchmark
    corpus — typically millions of rows against a 100 TB training set,
    broadcastable or hashed on the n-gram); the corpus side equi-joins
    on the n-gram and aggregates per doc. Join volume is the number of
    SHARED n-gram occurrences, never |corpus| x |benchmark|.
    """
    bench_set = shingles(benchmark, text_col, n).select("shingle").distinct()
    hits = shingles(corpus, text_col, n).join(bench_set, "shingle")
    # shingles() emits distinct n-grams per doc, so plain count == count
    # of distinct shared n-grams (no countDistinct expand needed)
    return hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared_ngrams"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard similarity >= threshold.

    ``max_df`` (document-frequency cap) drops shingles appearing in more
    than that many docs before the self-join — the skew guard for large
    corpora. Leave None for exact semantics (the oracle-checked form).
    """
    sh = shingles(df, text_col, n)
    if max_df is not None:
        rare = sh.groupBy("shingle").count().filter(F.col("count") <= max_df)
        sh = sh.join(rare.select("shingle"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc_id_1"), F.col("n_shingles").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc_id_2"), F.col("n_shingles").alias("n2"))
    jac = F.col("common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("common")
    ).cast("double")
    return (
        common.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# MinHash permutation family: pairwise-independent (a*h + b) mod 2^48
# over the 48-bit md5 base hash. a is an odd prime < 2^13 so a*h < 2^61
# stays in int64 under ANSI mode on BOTH engines (Spark longs, DuckDB
# BIGINT with overflow checking); b is a fixed Knuth-multiplier stride.
# Module-level so the DuckDB oracle (queries/llm_ops.py) embeds the SAME
# constants — the signature, bands, and final pair set are value-equal
# across engines.
MINHASH_MOD = 1 << 48
MINHASH_PERMS: tuple[tuple[int, int], ...] = tuple(
    (a, (t * 2654435761) % MINHASH_MOD)
    for t, a in enumerate((3079, 2053, 4099, 1031, 6151, 389, 769, 1543))
)


def _md5_48(col) -> F.Column:
    """First 48 bits of md5 as a non-negative int64 — the engine-portable
    hash convention (DuckDB: CAST('0x' || substr(md5(x),1,12) AS BIGINT));
    same construction as text.rolling_fingerprint's token hash."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 12), 16, 10).cast(
        "bigint"
    )


def _minhash_signatures(
    df: DataFrame, text_col: str, n: int, num_hash_tables: int
) -> DataFrame:
    """Per-doc MinHash state in ONE partial agg: the hashed-shingle set
    (``hset``, for exact-Jaccard verification) plus ``num_hash_tables``
    minhash values (m_t = min over shingles of (a_t*h + b_t) mod 2^48 —
    the classic universal-hash permutation family, map-side combine)."""
    perms = MINHASH_PERMS[:num_hash_tables]
    hs = shingles(df, text_col, n).select(
        "doc_id", _md5_48(F.col("shingle")).alias("h")
    )
    return hs.groupBy("doc_id").agg(
        F.collect_set("h").alias("hset"),
        *(
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_MOD)).alias(
                f"m{t}"
            )
            for t, (a, b) in enumerate(perms)
        ),
    )


def _minhash_banded_pairs(
    df: DataFrame,
    text_col: str,
    n: int,
    jaccard_threshold: float,
    num_hash_tables: int,
) -> DataFrame:
    """The raw banded pipeline over whatever rows it is handed (see
    ``minhash_near_dup_pairs`` for the guarded public entry):
      1. shingle -> 48-bit md5 hash per (doc, shingle);
      2. ``num_hash_tables`` minhash values per doc in ONE partial agg
         (``_minhash_signatures``);
      3. candidates = docs sharing any (table, minhash) key: explode the
         signature, slim self-join on the band key (OR-amplification,
         r=1, b=num_hash_tables, same scheme Spark ML uses);
      4. verify candidates with the exact Jaccard over the hashed
         shingle sets (array_intersect/array_union — JVM set ops).
    At corpus scale only step 3's band keys and step 4's per-doc hash
    sets shuffle; the banding keeps candidate generation sub-quadratic
    exactly like any LSH — PROVIDED the input has no large groups of
    identical texts (the caller's job; identical docs share every band
    key, so a group of m copies is m^2 candidate rows in ALL b bands)."""
    sigs = _minhash_signatures(df, text_col, n, num_hash_tables)
    return _banded_pairs_from_sigs(sigs, jaccard_threshold, num_hash_tables)


def _banded_pairs_from_sigs(
    docs: DataFrame, jaccard_threshold: float, num_hash_tables: int
) -> DataFrame:
    """Steps 3-4 over a precomputed ``_minhash_signatures`` frame. The
    signature aggregate's exchange is referenced three times here (band
    explode + both verify sides) and Spark's ReusedExchange serves all
    three from one execution — which is also why the guarded caller can
    hang its shingled-rep probe off the same frame for free."""
    bands = docs.select(
        "doc_id",
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(t).alias("t"), F.col(f"m{t}").alias("v")
                    )
                    for t in range(num_hash_tables)
                )
            )
        ).alias("band"),
    ).select("doc_id", F.col("band.t").alias("t"), F.col("band.v").alias("v"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["t", "v"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )
    h1 = docs.select(F.col("doc_id").alias("doc_id_1"), F.col("hset").alias("hs1"))
    h2 = docs.select(F.col("doc_id").alias("doc_id_2"), F.col("hset").alias("hs2"))
    jac = F.size(F.array_intersect("hs1", "hs2")).cast("double") / F.size(
        F.array_union("hs1", "hs2")
    ).cast("double")
    return (
        cand.join(h1, "doc_id_1")
        .join(h2, "doc_id_2")
        .withColumn("est_jaccard", F.round(jac, 6))
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("doc_id_1", "doc_id_2", "est_jaccard")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    jaccard_threshold: float = 0.8,
    num_hash_tables: int = 8,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """Approximate near-dup pairs via banded MinHash — pure DataFrame
    ops, no UDFs anywhere (measured ~4x faster than Spark ML's
    MinHashLSH.approxSimilarityJoin, whose distance step is a Scala UDF
    outside codegen). Pipeline shape in ``_minhash_banded_pairs``.

    ADAPTIVE by default (``collapse_exact=None``): the guard below costs
    ~1.4x on a duplicate-free corpus (round-6 A/B) but is only needed
    when a LARGE byte-equal group exists, so the default first runs one
    narrow fingerprint aggregate — groupBy(md5(text)) -> count, max —
    and collapses only when the largest group has >=
    ``_GUARD_MIN_GROUP`` (3) members. Groups of 2 put just 4 candidate
    rows into each band (linear in the group count), far below the m^2
    pathology the guard exists for, while any real boilerplate/mirror
    group trips the threshold. The decision aggregate shuffles only
    (16-byte fp, count) partials with map-side combine — a small
    fraction of either pipeline — and, like the repo's other
    strategy-flip operators (operators/ranking.py), it is an EAGER
    driver decision: merely building the DataFrame runs that one small
    job. Pass an explicit bool to skip the decision scan.

    Hot-band guard (``collapse_exact=True``): identical texts
    have identical signatures, so a group of m byte-equal copies — the
    single most common real-corpus pathology (boilerplate pages, mirror
    dumps) — puts m^2 candidate rows into EVERY band, the same quadratic
    blowup ``similarity.lsh_ann_topk`` guards with max_bucket tiling.
    The guard collapses the corpus to one REPRESENTATIVE per md5 text
    fingerprint (min doc_id) before shingling, runs the banded pipeline
    on representatives only, then expands rep-level pairs back to doc
    level with two linear joins:
      - cross-group: member(g1) x member(g2) pairs inherit the rep
        pair's est_jaccard (equal shingle sets within a group make this
        EXACT, not an approximation);
      - intra-group: all pairs inside a multi-copy group at est_jaccard
        exactly 1.0 (restricted to groups whose representative produced
        at least one shingle, matching the unguarded pipeline's drop of
        sub-n-word docs).
    The expansion's cost is proportional to the OUTPUT pair count —
    inherent to pair semantics — while the band join, the hset verify,
    and every shuffled intermediate see each distinct text once. Output
    is row-for-row identical to ``collapse_exact=False`` (pinned by
    tests/test_llm_ops.py), so the registered query's DuckDB value
    oracle is unchanged — under ANY of the three modes."""
    if collapse_exact is None:
        max_m = (
            df.select(fingerprint(text_col).alias("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(F.max("m").alias("max_m"))
            .collect()[0]["max_m"]
        )
        collapse_exact = (max_m or 1) >= _GUARD_MIN_GROUP
    if not collapse_exact:
        return _minhash_banded_pairs(
            df, text_col, n, jaccard_threshold, num_hash_tables
        )
    members = df.select(
        "doc_id", fingerprint(text_col).alias("fp")
    ).withColumn("rep_id", F.min("doc_id").over(Window.partitionBy("fp")))
    reps = members.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id")
    sigs = _minhash_signatures(
        df.join(reps, "doc_id"), text_col, n, num_hash_tables
    )
    rep_pairs = _banded_pairs_from_sigs(sigs, jaccard_threshold, num_hash_tables)
    m1 = members.select(
        F.col("rep_id").alias("doc_id_1"), F.col("doc_id").alias("d1")
    )
    m2 = members.select(
        F.col("rep_id").alias("doc_id_2"), F.col("doc_id").alias("d2")
    )
    cross = (
        rep_pairs.join(m1, "doc_id_1")
        .join(m2, "doc_id_2")
        .select(
            F.least("d1", "d2").alias("doc_id_1"),
            F.greatest("d1", "d2").alias("doc_id_2"),
            "est_jaccard",
        )
    )
    if jaccard_threshold > 1.0:
        return cross
    # intra-group pairs exist only where the rep has >= 1 shingle (docs
    # under n words never enter the unguarded pipeline). The signature
    # frame's doc_ids ARE that set (shingles() drops sub-n-word docs
    # before the agg), and its exchange is already reused three times by
    # the banded pipeline, so this fourth reference costs no extra scan —
    # measured 3.14 -> 2.13 s at sf0.1 vs re-splitting the rep texts
    # (BASELINE.md round-6 final)
    shingled = sigs.select(F.col("doc_id").alias("rep_id"))
    mm = members.join(shingled, "rep_id").select("rep_id", "doc_id")
    intra = (
        mm.alias("x")
        .join(mm.alias("y"), "rep_id")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_id_1"),
            F.col("y.doc_id").alias("doc_id_2"),
            F.lit(1.0).alias("est_jaccard"),
        )
    )
    return cross.unionByName(intra)


def fuzzy_contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 8,
) -> DataFrame:
    """FUZZY benchmark decontamination: (corpus doc, benchmark doc) pairs
    whose n-gram Jaccard >= threshold, candidates generated by banded
    MinHash ACROSS the two corpora. The near-duplicate generalization of
    ``contamination_flags`` — exact n-gram overlap misses lightly
    paraphrased eval leakage (reordered sentences, small edits), which is
    exactly what near-dup contamination scans in LLM training reports
    target; same md5-48 + (a*h+b) mod 2^48 permutation family as
    ``_minhash_banded_pairs``, so the WHOLE pipeline (signatures, band
    join, exact-Jaccard verify) is engine-portable integer arithmetic
    under the DuckDB value oracle.

    Scale shape: each side reduces to one signature row per doc (partial
    agg); the band join is corpus-bands x benchmark-bands on (table,
    minhash) — join volume is bounded by candidate matches, never
    |corpus| x |benchmark|, and the benchmark side (millions of rows vs
    a 100 TB corpus) typically broadcasts. No self-join anywhere, so the
    identical-copy band pathology of the self-dedup case cannot go
    quadratic: m byte-equal corpus copies of one benchmark doc emit m
    candidate rows (output-proportional), not m^2."""
    sig_c = _minhash_signatures(corpus, text_col, n, num_hash_tables)
    sig_b = _minhash_signatures(benchmark, text_col, n, num_hash_tables)

    def _bands(sigs: DataFrame, id_alias: str) -> DataFrame:
        return sigs.select(
            F.col("doc_id").alias(id_alias),
            F.explode(
                F.array(
                    *(
                        F.struct(F.lit(t).alias("t"), F.col(f"m{t}").alias("v"))
                        for t in range(num_hash_tables)
                    )
                )
            ).alias("band"),
        ).select(id_alias, F.col("band.t").alias("t"), F.col("band.v").alias("v"))

    cand = (
        _bands(sig_c, "doc_id")
        .join(_bands(sig_b, "bench_doc_id"), ["t", "v"])
        .select("doc_id", "bench_doc_id")
        .distinct()
    )
    h_c = sig_c.select("doc_id", F.col("hset").alias("hs1"))
    h_b = sig_b.select(
        F.col("doc_id").alias("bench_doc_id"), F.col("hset").alias("hs2")
    )
    jac = F.size(F.array_intersect("hs1", "hs2")).cast("double") / F.size(
        F.array_union("hs1", "hs2")
    ).cast("double")
    return (
        cand.join(h_c, "doc_id")
        .join(h_b, "bench_doc_id")
        .withColumn("est_jaccard", F.round(jac, 6))
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("doc_id", "bench_doc_id", "est_jaccard")
    )


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: sign-sum of the md5(token) bits.

    Pure DataFrame ops: explode tokens -> per-bit +/-1 votes via bitwise
    expressions -> sum -> reassemble signature. One shuffle on doc_id.

    The 64 bit sources are the two 32-bit halves of md5(token)'s first
    16 hex chars — engine-portable, so the DuckDB oracle reproduces the
    identical signature. Emits ``sig_lo``/``sig_hi`` (two non-negative
    32-bit halves; all banding/Hamming math runs on these, no signed
    shift tricks on either engine) plus the packed signed 64-bit
    ``simhash`` for compact storage/API use.
    """
    toks = df.select(
        "doc_id", F.explode(F.split(normalized(text_col), " ")).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("lo"),
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 9, 8), 16, 10)
        .cast("bigint")
        .alias("hi"),
    )
    # The 64 vote aggregates and the 64 packing terms are authored as
    # parsed SQL strings (one Py4J call each / one for the whole packed
    # half) instead of element-wise Column chains: the chain form cost
    # 1.7 s of driver round trips PER CONSTRUCTION (round-10 probe —
    # the pq_topk codebook lesson applied here); the parsed form is
    # semantically identical expression-for-expression (same CASE arms,
    # same left-associative sum order, `L`-suffixed long literals for
    # the bit weights), so values and the runtime plan are unchanged.
    bit_votes = [
        F.expr(
            f"SUM(CASE WHEN (SHIFTRIGHT({'lo' if i < 32 else 'hi'}, "
            f"{i % 32}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_votes)

    def _half(lo_bit: int) -> F.Column:
        return F.expr(
            " + ".join(
                f"CASE WHEN b{lo_bit + i} > 0 THEN {1 << i}L ELSE 0L END"
                for i in range(32)
            )
        )

    out = votes.select("doc_id", _half(0).alias("sig_lo"), _half(32).alias("sig_hi"))
    # pack: hi's top bit lands on the sign bit -> subtract 2^64 to stay
    # in int64 (two's-complement reinterpretation, value-preserving)
    packed = F.col("sig_lo") + (
        F.col("sig_hi").bitwiseAND(F.lit(0x7FFFFFFF)) * F.lit(1 << 32).cast("long")
    ) + F.when(
        F.shiftright(F.col("sig_hi"), 31).bitwiseAND(F.lit(1)) == 1,
        F.lit(-(1 << 63)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return out.select("doc_id", "sig_lo", "sig_hi", packed.alias("simhash"))


def hamming_banded_pairs(
    sigs: DataFrame, max_hamming: int = 3, materialize: bool = True
) -> DataFrame:
    """Pairs of 64-bit signatures within ``max_hamming`` bits, banded:
    input is (doc_id, sig_lo, sig_hi) — two non-negative 32-bit halves —
    and the signature is split into 4 x 16-bit band keys, so any pair
    within Hamming distance 3 collides on >= 1 untouched band
    (pigeonhole-complete for max_hamming <= 3). Scale: 4 narrow
    self-joins on short keys instead of a full cross join; the exact
    Hamming verify is two XOR+popcounts in codegen. Shared by SimHash
    text near-dup and dHash image near-dup.

    ``materialize`` (default on) ``localCheckpoint``-s the signature
    frame first: the band joins reference it 8x (4 bands x 2 sides),
    and without materialization each reference re-executes the
    signature lineage — an Arrow decode pass or a tokenize+md5 vote
    pipeline — past what AQE exchange reuse recovers (measured:
    simhash 12.25 -> 3.29 s at sf0.1 interleaved; audio near-dup
    21.5 -> 2.6 s at sf1 with the caller-side group checkpoint). The
    checkpointed frame is 3 int columns per signature — the same
    bounded-artifact class as the graph operators' edge checkpoint.
    Pass False when the input is already materialized.

    SIDE EFFECT (ADVICE round 6): with ``materialize=True``, merely
    BUILDING the returned DataFrame runs the full upstream signature
    job eagerly (localCheckpoint(eager=True)), and the truncated
    lineage forfeits recomputation on executor loss — on a cluster,
    a lost executor fails the job instead of recomputing the shard.
    Callers that only need the plan (explain/plan tooling) or that
    cannot accept eager execution must pass ``materialize=False``."""
    if materialize:
        sigs = sigs.select("doc_id", "sig_lo", "sig_hi").localCheckpoint(
            eager=True
        )
    bands = sigs.select(
        "doc_id",
        "sig_lo",
        "sig_hi",
        *[
            F.shiftright(F.col("sig_lo" if b < 2 else "sig_hi"), 16 * (b % 2))
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"band{b}")
            for b in range(4)
        ],
    )
    candidates = None
    for b in range(4):
        a = bands.alias("a")
        c = bands.alias("c")
        cand = a.join(
            c,
            (F.col(f"a.band{b}") == F.col(f"c.band{b}"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("c.doc_id").alias("doc_id_2"),
            F.col("a.sig_lo").alias("lo1"),
            F.col("a.sig_hi").alias("hi1"),
            F.col("c.sig_lo").alias("lo2"),
            F.col("c.sig_hi").alias("hi2"),
        )
        candidates = cand if candidates is None else candidates.unionByName(cand)
    hamming = F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2"))) + F.bit_count(
        F.col("hi1").bitwiseXOR(F.col("hi2"))
    )
    return (
        candidates.dropDuplicates(["doc_id_1", "doc_id_2"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_1", "doc_id_2", "hamming")
    )


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs whose SimHash Hamming distance <= max_hamming
    (``hamming_banded_pairs`` over ``simhash_signatures``)."""
    return hamming_banded_pairs(simhash_signatures(df, text_col), max_hamming)


def near_dup_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Connected components over near-dup pairs -> dedup groups.

    Iterative min-label propagation on DataFrames: each node adopts the
    smallest component id among itself and its neighbors until fixpoint.
    Each materialization round propagates TWO hops (two chained label
    joins before the checkpoint), so rounds are O(diameter/2) — near-dup
    graphs are unions of small cliques, so one round usually converges
    and the second confirms the fixpoint. localCheckpoint() truncates
    the lineage each round (the standard guard for iterative DataFrame
    algorithms). Output: (doc_id, group_id = min doc_id in component).
    """
    edges = (
        pairs.select(F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b"))
        .unionByName(
            pairs.select(F.col("doc_id_2").alias("a"), F.col("doc_id_1").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    def hop(lbls):
        neighbor_min = (
            edges.join(lbls, edges.b == lbls.node)
            .groupBy("a")
            .agg(F.min("comp").alias("n_comp"))
        )
        return lbls.join(neighbor_min, lbls.node == neighbor_min.a, "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias(
                "comp"
            ),
            (F.col("n_comp") < F.col("comp")).alias("_changed"),
        )

    changed = -1
    for _ in range(max_iterations):
        # two hops per materialization; convergence is judged on the
        # SECOND hop, so changed==0 certifies a true fixpoint
        updated = hop(hop(labels).drop("_changed")).localCheckpoint(eager=True)
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        # Returning partial labels would silently mis-group any component
        # with diameter > max_iterations; fail loudly instead.
        raise RuntimeError(
            f"near_dup_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); raise "
            "max_iterations for graphs with larger diameter"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("group_id"))


def span_dedup(
    docs: DataFrame,
    span_tokens: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style sub-document dedup (Raffel et al. 2020, arXiv:1910.10683
    §2.2 "deduplicating three-sentence spans"): split every doc into
    consecutive ``span_tokens``-token spans, keep only the globally FIRST
    occurrence of each span text (ordered by (doc_id, span index)), and
    reassemble the surviving spans into a cleaned document. Docs whose
    every span is a repeat disappear (their group is empty) — in both
    engines.

    Two shuffles at any scale: (1) the first-occurrence election is ONE
    ``min_by`` aggregation keyed by span text — the kept set is exactly
    one row per distinct span, so the agg RESULT is the survivor set
    (no window, no join-back), and the partial merge reduces Zipf-hot
    boilerplate spans map-side before the exchange (a window-min would
    funnel every occurrence of a hot span through one task); (2) the
    reassembly groupBy on doc id, whose per-group state is bounded by
    the document itself (reassembly inherently carries the doc, the
    same bound as reading it). The span explode is the standard
    fan-out; span text, not a hash, is the key so the oracle needs no
    hash-function parity."""
    toks = F.col("__toks")
    n_spans = F.ceil(F.size(toks) / F.lit(float(span_tokens))).cast("long")
    spans = (
        docs.select(F.col(id_col), words(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            n_spans.alias("n_spans"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), (n_spans - 1).cast("int")),
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, i * span_tokens + 1, span_tokens)
                    ),
                )
            ).alias("span_idx", "span_text"),
        )
    )
    kept = (
        spans.groupBy("span_text")
        .agg(
            F.min_by(
                F.struct(F.col(id_col), F.col("span_idx"), F.col("n_spans")),
                F.struct(F.col(id_col), F.col("span_idx")),
            ).alias("__w")
        )
        .select(
            F.col("__w")[id_col].alias(id_col),
            F.col("__w.span_idx").alias("span_idx"),
            F.col("__w.n_spans").alias("n_spans"),
            "span_text",
        )
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("span_idx").alias("i"), F.col("span_text").alias("t")))
    )
    return kept.groupBy(id_col).agg(
        F.concat_ws(" ", F.transform(ordered, lambda x: x["t"])).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
        F.min("n_spans").alias("n_spans"),
    )


def duplicate_runs(
    docs: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring dedup (Lee et al. 2021, arXiv:2107.06499
    "Deduplicating Training Data Makes Language Models Better"): find
    every MAXIMAL run of token positions whose ``k``-gram also occurs
    elsewhere in the corpus, keeping the globally first occurrence.
    Emits (id, run_start, run_end, n_dup_grams) — the token spans a
    cleaner would cut from every holder but the first. Two overlapping
    duplicated grams merge into one span, so unlike ``span_dedup``'s
    fixed non-overlapping 3-token segments this reports the Lee et al.
    semantic: contiguous duplicated substrings of ANY length >= k,
    maximally extended (suffix-array ESA semantics realized with
    k-gram anchors instead of a suffix array — the distributed-friendly
    formulation).

    Scale: (1) the first-occurrence election is the span_dedup partial
    agg keyed by gram text — map-side combine absorbs Zipf-hot
    boilerplate grams before the exchange; (2) the join-back of
    positions to their gram's election is a narrow equi-join over
    (gram, id, pos) rows — hot grams route to one task under SMJ, which
    AQE's skew split handles at scale (the election row they join is
    1 row, so the skewed side splits cleanly); (3) run assembly is a
    per-doc ordered window — O(1) state per row, parallel across docs.
    Gram TEXT is the key (no hash parity needed for the oracle); a
    production variant can key on _md5_48(gram) to shrink the exchange
    at 2^-48 collision risk."""
    toks = F.col("__toks")
    grams = (
        docs.select(F.col(id_col), words(F.col(text_col)).alias("__toks"))
        .filter(F.size(toks) >= k)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), (F.size(toks) - k).cast("int")),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
                )
            ).alias("pos", "gram"),
        )
    )
    elected = grams.groupBy("gram").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
        ).alias("first"),
        F.count(F.lit(1)).alias("c"),
    )
    dup = (
        grams.join(elected, "gram")
        .filter(
            (F.col("c") > 1)
            & ~(
                (F.col(id_col) == F.col("first.d"))
                & (F.col("pos") == F.col("first.p"))
            )
        )
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    # token ranges [p1, p1+k-1] and [p2, p2+k-1] overlap-or-touch iff
    # p2 - p1 <= k, so a gap > k in gram starts breaks the run
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
        F.lit(1)
    )
    runs = dup.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("run_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("run_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .select(id_col, "run_start", "run_end", "n_dup_grams")
    )


# Bloom filter parameters: 16384 bits packed as 512 x 32-bit words (a
# 2 KB artifact), k=3 positions per shingle from the same universal-hash
# family shape as MINHASH_PERMS (odd multiplier => bijection on Z_2^48
# before the bit-space fold). Module-level so the DuckDB oracle embeds
# the SAME constants.
BLOOM_BITS = 1 << 14
BLOOM_WORD = 32
BLOOM_PERMS: tuple[tuple[int, int], ...] = (
    (2069, 40503),
    (4513, 2654435761 % MINHASH_MOD),
    (7919, (3 * 2654435761 + 97) % MINHASH_MOD),
)


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination through a Bloom-filter pre-screen — the
    100 TB shape of the eval-leakage guard: instead of semi-joining the
    ENTIRE corpus shingle stream against the benchmark set
    (``contamination_flags``), the benchmark reduces to a 2 KB bitmask
    artifact that ships to every task as plan literals, the corpus side
    becomes a NARROW map (3 integer hashes + a bit test per shingle —
    no shuffle, no join), and only the bloom-candidate shingles reach
    the exact verification join. At web scale the candidate stream is
    orders of magnitude smaller than the corpus stream; the exact join
    then removes the filter's false positives.

    Emits (doc_id, n_candidate_ngrams, n_shared_ngrams) for docs with
    >=1 candidate shingle: n_candidate counts bloom hits (including
    false positives — the filter's measurable FP behavior), n_shared
    the exactly-verified overlap. Verification joins on the 48-bit md5
    shingle hash (the minhash-verify convention; a 48-bit collision
    against ~1e4 benchmark shingles is ~1e-10 per probe and identical
    on both engines). Every hash is md5-derived integer arithmetic, so
    the DuckDB twin — which models the bitmask as the equivalent
    distinct-position set — reproduces candidates AND verified counts
    value-for-value."""
    bench_h = (
        shingles(benchmark, text_col, n)
        .select(_md5_48(F.col("shingle")).alias("h"))
        .distinct()
    )
    pos_rows = (
        bench_h.select(
            F.explode(
                F.array(
                    *(
                        ((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_MOD))
                        % F.lit(BLOOM_BITS)
                        for a, b in BLOOM_PERMS
                    )
                )
            ).alias("p")
        )
        .distinct()
        .collect()  # bounded: <= BLOOM_BITS distinct positions (2 KB artifact)
    )
    mask = [0] * (BLOOM_BITS // BLOOM_WORD)
    for r in pos_rows:
        mask[r["p"] // BLOOM_WORD] |= 1 << (r["p"] % BLOOM_WORD)

    ch = shingles(corpus, text_col, n).select(
        "doc_id", _md5_48(F.col("shingle")).alias("h")
    )
    for idx, (a, b) in enumerate(BLOOM_PERMS):
        ch = ch.withColumn(
            f"p{idx}",
            ((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_MOD))
            % F.lit(BLOOM_BITS),
        )
    ch = ch.withColumn("mask", F.array(*[F.lit(w) for w in mask]))
    test = " AND ".join(
        f"(shiftright(element_at(mask, CAST(p{i} DIV {BLOOM_WORD} AS INT) + 1),"
        f" CAST(p{i} % {BLOOM_WORD} AS INT)) & 1) = 1"
        for i in range(len(BLOOM_PERMS))
    )
    cand = ch.filter(F.expr(test)).select("doc_id", "h")
    verified = cand.join(
        F.broadcast(bench_h.withColumn("in_bench", F.lit(1))), "h", "left"
    )
    return verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_candidate_ngrams"),
        F.sum(F.coalesce(F.col("in_bench"), F.lit(0)))
        .cast("long")
        .alias("n_shared_ngrams"),
    )
