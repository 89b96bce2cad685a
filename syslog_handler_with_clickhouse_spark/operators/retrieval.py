"""Full-text retrieval scoring over the documents corpus.

BM25 is the classic probabilistic ranking function (Robertson/Spärck
Jones, as shipped by Lucene/Elasticsearch and ClickHouse's full-text
experiments).  This implementation keeps the repo's parity contract —
EXACT integer arithmetic end to end — by

* using rational BM25 constants k1 = 1.2 = 6/5 and b = 0.75 = 3/4 and
  clearing denominators, so the tf-saturation term

      tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

  becomes the integer expression

      tf_ppm = (22·tf·am·1 000 000) div (10·tf·am + 3·am + 9000·dl)

  with am = (1000·L) div N the milli-avgdl (L = corpus token count,
  N = corpus doc count) — every quantity a bigint, identical in Spark
  and DuckDB;
* replacing the float log-idf with the integer rarity weight
  idf_int = N div df (same surrogate q156 uses; documented deviation —
  the RANKING behavior matches BM25's rare-terms-dominate shape while
  staying ulp-drift-free).

Magnitudes: am is bounded by document length (not corpus size), so
22·tf·am·1e6 stays far below int64 at any corpus scale.

Scale shape: one explode + (doc, token) aggregate for the postings,
one token-keyed aggregate for df, a broadcast of the two corpus
scalars, then a token-keyed equi-join between query terms and the
posting lists — never all-pairs.  Stop-term pruning (df > max_df·N)
caps the posting-list fan-out the same way q195's max_df cap does, so
candidate volume stays proportional to corpus size at 100 TB.

Reference semantics: the syslog reference (main.go:27-101) has no
retrieval surface; this extends the engine along the ClickHouse
full-text direction SURVEY §0 mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import TOKEN_RE
from .dedup import _size_floor, portable_hash60

#: ppm scale for the tf-saturation term.
_SCALE = 1_000_000


def _tokens(docs: DataFrame, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    max_df_num: int = 1,
    max_df_den: int = 4,
    max_df_abs: int | None = None,
    stats: list | None = None,
    hot_token_warn: int = 100_000,
) -> DataFrame:
    """Rank ``docs`` (doc_id, text) for each query doc (query_id, text)
    by exact-integer BM25; keep the top ``k`` per query.

    Query terms are the query document's DISTINCT tokens; terms whose
    document frequency exceeds ``max_df_num/max_df_den`` of the corpus
    are pruned (stop-term cap — both a quality choice and THE scale
    guard, because it bounds every posting list the join fans out
    over).  A query doc never matches itself.

    Returns (query_id, rank, doc_id, score) with score the bigint
    Σ idf_int · tf_ppm over matched terms; rank by (score DESC,
    doc_id ASC) — a total order.

    Big-corpus posture (round 13; same discipline as the dedup tier):
    the operator derives its shuffle width from the plan-estimated
    input instead of trusting the session's small-SF
    ``spark.sql.shuffle.partitions``.  When the floor exceeds the
    session width, the whole plan is materialized inside a scoped
    conf (width + 4 MB AQE advisory — conf scoping only binds at an
    ACTION, and AQE's default 64 MB advisory would re-coalesce the
    width away) and the returned frame is the checkpointed top-k,
    which is queries×k rows — tiny.  Motivating measurement
    (scripts/bm25_scale_bench.py, 2 000 queries): at session width 32
    the 10 M-doc postings build spilled 7.3 GB to disk and the
    20 M-doc point OOM'd an 8 g heap; with the derived width both run
    spill-free.  At small SF the floor is below the session width and
    the plan stays lazy and unchanged (oracle/plan pins unaffected).

    Telemetry (round 15, the star-edge ``stats=`` pattern applied to
    the token leg): pass ``stats=[]`` to receive one appended record
    {max_df, p99_df, n_tokens, n_docs, top_tokens} computed from one
    extra df aggregate (an action — opt-in, the default lazy plan is
    unchanged).  A token at or above ``hot_token_warn`` document
    frequency additionally emits a UserWarning naming it: the
    bm25_boilerplate_r14 measurement showed a 2 %-df boilerplate
    family flooding the join with ~10 GB of spill straight past the
    default 9/10 RATIO cap — ``max_df_abs`` is the matching guard (an
    absolute posting-list bound; separate oracled contract, q467)."""
    tok = _tokens(docs, "doc_id")
    spark = docs.sparkSession
    if stats is not None:
        import warnings

        dfreq = (
            tok.groupBy("doc_id", "token")
            .agg(F.lit(1))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("dfreq"))
        )
        agg = dfreq.agg(
            F.max("dfreq").alias("mx"),
            F.expr("approx_percentile(dfreq, 0.99)").alias("p99"),
            F.count(F.lit(1)).alias("nt"),
        ).collect()[0]
        top = [
            (r.token, int(r.dfreq))
            for r in dfreq.orderBy(
                F.col("dfreq").desc(), F.col("token")
            ).limit(5).collect()
        ]
        rec = {
            "max_df": int(agg["mx"] or 0),
            "p99_df": int(agg["p99"] or 0),
            "n_tokens": int(agg["nt"]),
            "n_docs": docs.count(),
            "top_tokens": top,
        }
        stats.append(rec)
        if rec["max_df"] >= hot_token_warn:
            warnings.warn(
                "bm25_topk: hottest token %r appears in %d docs (>= %d) — "
                "every query containing it fans the join out by that full "
                "posting list; consider max_df_abs or a tighter ratio cap"
                % (top[0][0] if top else "?", rec["max_df"], hot_token_warn),
                stacklevel=2,
            )
    sess = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    width = _size_floor(tok)
    if width > sess:
        from pyspark import StorageLevel

        adv_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        sess_parts = spark.conf.get("spark.sql.shuffle.partitions")
        sess_adv = spark.conf.get(adv_key)
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            spark.conf.set(adv_key, str(4 << 20))
            return _bm25_plan(
                docs, queries, k=k, max_df_num=max_df_num,
                max_df_den=max_df_den, max_df_abs=max_df_abs, width=width,
            ).localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", sess_parts)
            spark.conf.set(adv_key, sess_adv)
    return _bm25_plan(
        docs, queries, k=k, max_df_num=max_df_num, max_df_den=max_df_den,
        max_df_abs=max_df_abs,
    )


def _bm25_plan(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    max_df_num: int,
    max_df_den: int,
    max_df_abs: int | None = None,
    width: int = 0,
) -> DataFrame:
    """The BM25 plan (see bm25_topk for semantics and posture).

    NOT fully lazy since round 17 (ADVICE r18): constructing this frame
    eagerly checkpoints the postings aggregate DISK_ONLY — one
    corpus-scale tokenize job runs at DataFrame-CONSTRUCTION time, and
    the checkpointed blocks live until the returned frame is GC'd.
    Callers that only want to inspect the plan (explain-only paths) pay
    that job; every caller in this repo executes the frame, where the
    checkpoint is a measured win (see the inline comment below).

    Single-pass statistics: the token explode happens ONCE; dl and the
    corpus scalars derive FROM the postings aggregate (dl = Σ tf per
    doc; corpus_tokens = Σ dl; n_docs = |dl|) instead of re-exploding
    the corpus per statistic — identical values, two fewer scans.

    When ``width`` is set (the big-corpus path), the NARROW doc rows
    are hash-repartitioned by doc_id BEFORE the explode (dedup's
    _spread pattern): the exchange ships ~50 B rows, the token fan-out
    happens on the width-way side, and HashPartitioning(doc_id)
    satisfies the clustered distribution of BOTH the (doc_id, token)
    aggregate and the dl rollup — neither adds an exchange and neither
    builds a per-input-split aggregation map.  Both earlier shapes
    measured worse at 5 M docs: no width at all put ~1.1 M-entry
    partial maps on every input split (~0.5 GB disk spill per map
    stage, 8 g OOM at 20 M); repartitioning the EXPLODED stream moved
    the same bytes into the exchange's map-side sort buffer (same
    ~0.9 GB spill)."""
    if width:
        docs = docs.repartition(width, F.col("doc_id"))
    else:
        # widen the narrow corpus scan BEFORE the tokenize fan-out
        # (round 17 — dedup's _spread discipline): the explode runs in
        # the scan stage, so without this the whole tokenize+partial-agg
        # pipeline is bounded by the input split count (2-3 tasks at
        # sf0.1 regardless of cores).  The width path above already
        # repartitions; this is the same move for the small-corpus path.
        from .dedup import _spread

        docs = _spread(docs, "doc_id")
    tok = _tokens(docs, "doc_id")
    postings = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # materialize the postings aggregate ONCE (round 17): the scoring
    # tail consumes it through four subtrees (df_, dl, the corpus-scalar
    # stats derived from dl, and the posting join itself), and Catalyst
    # does not CSE across the broadcast boundaries between them — the
    # q394 "before" plan re-scanned and re-tokenized the corpus FIVE
    # times (plans/r17/q394_bm25_retrieval_before.txt: 5 parquet scans +
    # 5 Generates).  One DISK_ONLY checkpoint (the bm25_store_insert
    # bootstrap lesson: postings is corpus-scale, deserialized on-heap
    # caching of it blew a 24 g heap at 20 M docs) turns that into ONE
    # tokenize pass + three cheap re-reads of the narrow aggregate.
    # Values are bit-identical — pure materialization.  In the
    # big-corpus path this runs under the caller's scoped width conf
    # (conf binds at the action, and the checkpoint IS the action).
    from pyspark import StorageLevel

    postings = postings.localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    dl = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )
    df_ = postings.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    return _bm25_score(
        postings, dl, df_, queries, k=k,
        max_df_num=max_df_num, max_df_den=max_df_den, max_df_abs=max_df_abs,
    )


def _bm25_score(
    postings: DataFrame,
    dl: DataFrame,
    df_: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    max_df_num: int,
    max_df_den: int,
    max_df_abs: int | None = None,
) -> DataFrame:
    """BM25 scoring tail over prebuilt index frames (postings
    (doc_id, token, tf), dl (doc_id, dl), df_ (token, dfreq)) — shared
    by the scan path (:func:`_bm25_plan`) and the maintained-index path
    (:func:`bm25_topk_from_index`).  Corpus scalars derive from dl.

    ``max_df_abs`` (round 15) is an ABSOLUTE document-frequency cap on
    query terms, ANDed with the ratio cap: the operational guard for a
    boilerplate family whose hot tokens sit at a known df (e.g. 2 % of
    a 20 M-doc corpus = 400 k-row posting lists — far under any usable
    RATIO cap, yet each one fans the join out by its full df).  Values
    change, so the capped form is a separate oracled contract (q467),
    not a silent rewrite of q394."""
    stats = dl.agg(
        F.sum("dl").alias("corpus_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    ).select(
        "n_docs",
        (F.expr("corpus_tokens * 1000 DIV n_docs")).alias("am"),
    )

    qterms = _tokens(queries, "query_id").distinct()

    kept = qterms.join(df_, "token").join(F.broadcast(stats)).filter(
        F.col("dfreq") * max_df_den <= F.col("n_docs") * max_df_num
    )
    if max_df_abs is not None:
        kept = kept.filter(F.col("dfreq") <= max_df_abs)
    scored_terms = (
        kept.join(postings, "token")
        .filter(F.col("query_id") != F.col("doc_id"))
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.expr("n_docs DIV dfreq")
                * F.expr(
                    f"(22 * tf * am * {_SCALE}) "
                    "DIV (10 * tf * am + 3 * am + 9000 * dl)"
                )
            ).alias("term_score"),
        )
    )
    scores = scored_terms.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").cast("bigint").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "doc_id", "score")
    )


def rrf_hybrid_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k_leg: int = 20,
    k_out: int = 3,
    bm25_max_df_num: int = 9,
    bm25_max_df_den: int = 10,
    bm25_max_df_abs: int | None = None,
    jaccard_max_df: int | None = None,
    stats: list | None = None,
    hot_token_warn: int = 100_000,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack 2009) of a BM25 leg and a
    shingle-Jaccard leg — the q413/q458 composition as one operator.

    Leg A is :func:`bm25_topk` (top ``k_leg`` per query).  Leg B ranks
    by exact 3-gram shingle Jaccard in integer ppm; fusion is
    Σ 1 000 000 div (60 + rank) over a (query, doc)-keyed full outer
    join of the two ≤``k_leg``-row-per-query lists, keeping the top
    ``k_out`` fused rows per query.

    ``jaccard_max_df`` engages the q195 stop-shingle cap on leg B:
    shingles whose document frequency exceeds the cap are dropped
    BEFORE per-doc counts, so Jaccard is computed over KEPT shingles
    only (the established q195 semantic — values change, which is why
    the capped form is a separate oracled contract, q458, not a silent
    rewrite of q413).  This is leg B's scale guard: the uncapped
    shingle self-join fans out Σ df² over hot shingles —
    bm25_scale_r13 measured 11.3 GB of disk spill at 20 M docs from
    exactly this — while the cap bounds every posting list the join
    touches, the same way BM25's max_df bounds leg A.

    Big-corpus posture mirrors :func:`bm25_topk`: when the
    plan-estimated shingle explode exceeds the session shuffle width,
    the leg-B plan is materialized under a scoped width + 4 MB AQE
    advisory and the tiny fused top-k is checkpointed; at small SF the
    plan stays lazy (oracle/plan pins unaffected).

    ``bm25_max_df_abs`` / ``stats`` / ``hot_token_warn`` (round 15)
    pass through to leg A: bm25_boilerplate_r14 measured a 2 %-df
    boilerplate token family flooding BOTH RRF variants (~10 GB spill
    each) straight past the default 9/10 ratio cap — the Jaccard cap
    alone cannot save the hybrid, so the BM25 leg carries the same
    hot-key telemetry and an absolute posting-list bound.
    """
    from ..functions.text import shingles

    a = bm25_topk(
        docs, queries, k=k_leg,
        max_df_num=bm25_max_df_num, max_df_den=bm25_max_df_den,
        max_df_abs=bm25_max_df_abs, stats=stats,
        hot_token_warn=hot_token_warn,
    ).select("query_id", "doc_id", F.col("rank").alias("rk_a"))

    spark = docs.sparkSession
    sh0 = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(shingles(F.col("text"), 3)).alias("shingle"),
    )
    sess = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    width = _size_floor(sh0)
    if width > sess:
        from pyspark import StorageLevel

        adv_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        sess_parts = spark.conf.get("spark.sql.shuffle.partitions")
        sess_adv = spark.conf.get(adv_key)
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            spark.conf.set(adv_key, str(4 << 20))
            b = _rrf_jaccard_leg(
                docs, queries, k_leg, jaccard_max_df, width=width
            )
            fused = _rrf_fuse(a, b, k_out).localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
            return fused
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", sess_parts)
            spark.conf.set(adv_key, sess_adv)
    b = _rrf_jaccard_leg(docs, queries, k_leg, jaccard_max_df)
    return _rrf_fuse(a, b, k_out)


def _rrf_jaccard_leg(
    docs: DataFrame,
    queries: DataFrame,
    k_leg: int,
    jaccard_max_df: int | None,
    width: int = 0,
) -> DataFrame:
    """Leg B of :func:`rrf_hybrid_topk`: exact shingle-Jaccard top-k
    per query (query_id, doc_id, rk_b).  Shingle-keyed inverted-index
    join, never all-pairs; the optional ``jaccard_max_df`` drop happens
    before per-doc counts (Jaccard over kept shingles, q195).  When
    ``width`` is set the narrow doc rows are hash-repartitioned before
    the explode (the _bm25_plan posture — ship ~50 B rows, fan out on
    the wide side).

    Query shingles come from ``queries.text`` DIRECTLY (round 15) —
    not from joining query_id against the corpus — so a query whose id
    is not a corpus doc_id still gets a real Jaccard leg.  For queries
    that ARE corpus docs the shingle multiset is identical (same
    text), so q413/q458 values are unchanged.  The cap is applied as a
    broadcast ANTI-join against the over-cap shingle set (tiny — hot
    shingles only; eagerly materialized so the corpus df aggregate
    runs ONCE, not once per side): for corpus shingles that is exactly
    the old keep-join (df ≥ 1 there), and a query-only shingle (corpus
    df = 0, under any cap) stays in the query's denominator."""
    from ..functions.text import shingles

    if width:
        docs = docs.repartition(width, F.col("doc_id"))
    # join/aggregate on the 60-bit shingle hash, not the string — every
    # exchange in this leg becomes fixed-width 8-byte keys (the q38/q195
    # shingle_table discipline; identical pair sets barring ~2^-60
    # collisions, which those oracled contracts already accept)
    sh = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(shingles(F.col("text"), 3)).alias("sh_str"),
    ).select("doc", portable_hash60(F.col("sh_str")).alias("shingle"))
    qsh0 = queries.select(
        F.col("query_id"),
        F.explode(shingles(F.col("text"), 3)).alias("sh_str"),
    ).select("query_id", portable_hash60(F.col("sh_str")).alias("shingle"))
    if jaccard_max_df is not None:
        drop = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_cnt"))
            .filter(F.col("df_cnt") > jaccard_max_df)
            .select("shingle")
            .localCheckpoint(eager=True)
        )
        sh = sh.join(F.broadcast(drop), "shingle", "left_anti")
        qsh0 = qsh0.join(F.broadcast(drop), "shingle", "left_anti")
    n_sh = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    shn = sh.join(n_sh, "doc")
    qn_df = qsh0.groupBy("query_id").agg(F.count(F.lit(1)).alias("qn"))
    qsh = qsh0.join(qn_df, "query_id").select("query_id", "qn", "shingle")
    jp = (
        qsh.join(shn, "shingle")
        .filter(F.col("doc") != F.col("query_id"))
        .groupBy("query_id", F.col("doc").alias("doc_id"), "qn", "n_sh")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            "query_id",
            "doc_id",
            F.expr("inter * 1000000 DIV (qn + n_sh - inter)").alias(
                "score_ppm"
            ),
        )
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("score_ppm").desc(), F.col("doc_id").asc()
    )
    return (
        jp.withColumn("rk_b", F.row_number().over(wb))
        .filter(F.col("rk_b") <= k_leg)
        .select("query_id", "doc_id", "rk_b")
    )


def _rrf_fuse(a: DataFrame, b: DataFrame, k_out: int) -> DataFrame:
    """Integer RRF fusion of two ranked lists (full outer on (query,
    doc) — a doc missing from one leg contributes nothing) and the
    top-``k_out`` cut, the q413 output contract."""
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.expr("1000000 DIV (60 + rk_a)"), F.lit(0))
            + F.coalesce(F.expr("1000000 DIV (60 + rk_b)"), F.lit(0))
        )
        .cast("bigint")
        .alias("rrf_score"),
        F.coalesce("rk_a", F.lit(0)).cast("int").alias("bm25_rank"),
        F.coalesce("rk_b", F.lit(0)).cast("int").alias("jaccard_rank"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= k_out)
        .select(
            "query_id",
            F.col("fused_rank").cast("int").alias("fused_rank"),
            "doc_id",
            "rrf_score",
            "bm25_rank",
            "jaccard_rank",
        )
    )


# ---------------------------------------------------------------------
# incremental BM25 index maintenance (round 14)
# ---------------------------------------------------------------------
# The q459 discipline applied to the retrieval tier: a standing corpus
# should not re-tokenize itself per ingest batch.  The index state is
# three frames, ALL append-or-merge per batch:
#
#   postings (doc_id, token, tf) — append-only (new docs only);
#   dl       (doc_id, dl)       — append-only;
#   df       (token, dfreq)     — merged per batch (full-outer sum
#            over the batch's vocabulary — O(vocab), and vocabulary
#            grows sublinearly in corpus size).
#
# Query time is then PURE INDEX JOINS (_bm25_score) — no text ever
# re-read — and the scores are EXACTLY the scan path's: tf/dl/df/N/am
# are sums, so batch-wise accumulation commutes with the arithmetic
# (everything integer, no reassociation drift).  q461's oracle is
# q394's full-recompute SQL verbatim: the maintained index must
# reproduce it bit for bit after any batch split.


def bm25_index_init(spark) -> dict:
    """Empty maintained-index state for :func:`bm25_index_insert`."""
    return {
        "postings": spark.createDataFrame(
            [], "doc_id bigint, token string, tf bigint"
        ),
        "dl": spark.createDataFrame([], "doc_id bigint, dl bigint"),
        "df": spark.createDataFrame([], "token string, dfreq bigint"),
    }


def _bm25_batch_stats(
    batch: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Per-batch index increments from a (doc_id, text) batch: postings
    (doc_id, token, tf), dl (doc_id, dl) and the batch's df partial
    (token, dfreq) — O(batch) compute, shared by the DataFrame-state
    and stored (bucketed-table) maintenance paths."""
    tok = _tokens(batch, "doc_id")
    bp = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    bdl = bp.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    bdf = bp.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("dfreq")
    )
    return bp, bdl, bdf


def bm25_index_insert(index: dict, batch: DataFrame) -> dict:
    """Fold one (doc_id, text) batch into the maintained BM25 index
    (see the block comment).  Batch ids must be new docs.  Returns the
    new state (eagerly checkpointed); inputs are not mutated."""
    bp, bdl, bdf = _bm25_batch_stats(batch)
    postings = index["postings"].unionByName(
        bp.select("doc_id", "token", "tf")
    )
    dl = index["dl"].unionByName(bdl)
    df_ = (
        index["df"]
        .withColumnRenamed("dfreq", "a")
        .join(bdf.withColumnRenamed("dfreq", "b"), "token", "full_outer")
        .select(
            "token",
            (F.coalesce("a", F.lit(0)) + F.coalesce("b", F.lit(0)))
            .cast("bigint")
            .alias("dfreq"),
        )
    )
    return {
        "postings": postings.localCheckpoint(eager=True),
        "dl": dl.localCheckpoint(eager=True),
        "df": df_.localCheckpoint(eager=True),
    }


def bm25_topk_from_index(
    index: dict,
    queries: DataFrame,
    *,
    k: int = 5,
    max_df_num: int = 1,
    max_df_den: int = 4,
    max_df_abs: int | None = None,
) -> DataFrame:
    """:func:`bm25_topk` semantics over the maintained index — same
    output contract (query_id, rank, doc_id, score), bit-identical to
    the scan path on the same accumulated corpus."""
    return _bm25_score(
        index["postings"], index["dl"], index["df"], queries,
        k=k, max_df_num=max_df_num, max_df_den=max_df_den,
        max_df_abs=max_df_abs,
    )


# -- stored (bucketed-table) BM25 index -------------------------------
# The DataFrame-state variant above localCheckpoints the full
# postings/dl union per batch — an O(corpus) REWRITE around an
# O(batch) compute (round-14 verdict `weak`).  For a standing corpus
# the index belongs in BUCKETED TABLES, exactly the
# incremental_dedup_store_* discipline (operators/dedup.py): every
# state write is an APPEND of the batch's rows, hash-bucketed onto the
# table's layout so per-insert I/O is O(batch), and every query-time
# join reads the bucketed scan with ZERO exchange on the stored side
# (tests/test_retrieval.py pins the plans).
#
#   postings (doc_id, token, tf) — append-only, bucketed by token
#            (the query-side join key);
#   dl       (doc_id, dl)        — append-only, bucketed by doc_id;
#   df       (token, dfreq)      — append-only PARTIALS bucketed by
#            token: each insert appends the batch's per-token doc
#            counts, and the read view merges them with a groupBy-sum
#            that the bucketed layout satisfies exchange-free.
#            Integer sums commute, so the merged view is bit-equal to
#            the DataFrame-state's full-outer merge —
#            `bm25_store_compact` folds the partials back to one row
#            per token when the partial count grows.
#
# Scores through this path are therefore bit-identical to
# :func:`bm25_topk` on the accumulated corpus (the q461 contract,
# oracled by q465 against q394's full-recompute SQL verbatim).


def _bm25_store_tables(prefix: str) -> tuple[str, str, str]:
    return f"{prefix}_postings", f"{prefix}_dl", f"{prefix}_df"


def _bm25_store_phys(spark, prefix: str) -> tuple[str, str, str]:
    """The PHYSICAL tables currently backing the store: compaction
    alternates each logical table between ``t`` and ``t__alt``
    (operators/genswap.py — the one-pass compact), so every reader and
    appender resolves through here."""
    from .genswap import current_table

    tp, tl, td = _bm25_store_tables(prefix)
    return (
        current_table(spark, tp),
        current_table(spark, tl),
        current_table(spark, td),
    )


def bm25_store_init(
    spark, prefix: str, num_buckets: int = 64, location: str | None = None
) -> None:
    """Create the empty bucketed BM25 index tables for
    :func:`bm25_store_insert`.  ``location`` roots the table files
    outside the warehouse dir (external tables)."""
    tp, tl, td = _bm25_store_tables(prefix)
    # a RE-init over a previously compacted store retires any __alt
    # generations up front: the base names created below already win
    # the resolver's preference, so this only reclaims orphans
    for t in (tp, tl, td):
        spark.sql(f"DROP TABLE IF EXISTS {t}__alt")
    ep = spark.createDataFrame([], "doc_id bigint, token string, tf bigint")
    el = spark.createDataFrame([], "doc_id bigint, dl bigint")
    ed = spark.createDataFrame([], "token string, dfreq bigint")
    wp = ep.write.mode("overwrite").bucketBy(num_buckets, "token").sortBy(
        "token"
    )
    wl = el.write.mode("overwrite").bucketBy(
        num_buckets, "doc_id"
    ).sortBy("doc_id")
    wd = ed.write.mode("overwrite").bucketBy(num_buckets, "token").sortBy(
        "token"
    )
    if location is not None:
        wp = wp.option("path", f"{location}/{tp}")
        wl = wl.option("path", f"{location}/{tl}")
        wd = wd.option("path", f"{location}/{td}")
    # three independent (empty) table creations — overlap the driver's
    # per-write catalog/commit latency (guide §2.6, operators/actions.py)
    from .actions import run_actions

    run_actions(
        lambda: wp.saveAsTable(tp),
        lambda: wl.saveAsTable(tl),
        lambda: wd.saveAsTable(td),
    )


def bm25_store_insert(
    spark,
    prefix: str,
    batch: DataFrame,
    *,
    assert_new: bool = False,
    stats: list | None = None,
    auto_compact_files: int | None = None,
) -> None:
    """Fold one (doc_id, text) batch into the stored BM25 index —
    three APPENDS of O(batch) rows (see the block comment).  Batch ids
    must be new docs: a replayed doc_id double-counts its df/dl and
    duplicates its postings.  ``assert_new=True`` enforces that with
    an O(batch) semi-join probe against the doc_id-bucketed dl table
    (exchange-free on the stored side) and raises before any write;
    leave it off when the caller already guarantees uniqueness — e.g.
    the exactly-once snapshot-ingest recipe (``streaming/ingest.py``)
    whose sink dedupes replayed micro-batches by batch id.

    Each append repartitions onto the table's bucket hash first
    (repartition(n, cols) and bucketBy(n, cols) share the murmur3-pmod
    layout), so every task writes exactly one bucket file — the dedup
    store's writer-buffer lesson.

    Compaction policy (round 16, the dedup store's
    ``auto_compact_depth`` discipline): every append adds one file per
    touched bucket, and past one file per bucket the serving SMJ must
    re-sort the stored scan (the mechanism behind the retired 10 M
    spill — PERF.md round 15).  When ``auto_compact_files`` is set,
    the insert measures the bucket file depth after its appends
    (``stats`` records it either way when requested) and runs
    :func:`bm25_store_compact(full=True)` once depth exceeds the
    threshold — serving stays bit-equal (compaction is pure layout),
    so the policy is pure I/O scheduling: one O(corpus) rewrite per k
    appends buys sort-free serving in between."""
    from .dedup import _bucket_file_depth, _table_num_buckets

    from pyspark import StorageLevel

    tp, tl, td = _bm25_store_phys(spark, prefix)
    if assert_new:
        bids = (
            batch.select(F.col("doc_id").cast("bigint").alias("doc_id"))
            .distinct()
        )
        # probe the FIRST-written table (postings) — probing dl would
        # let a retry after a crash between the postings and dl
        # appends silently duplicate the orphaned postings (round-16
        # verdict, What's wrong #2).  Table writes are job-atomic, so
        # a batch's presence per table is all-or-nothing.
        replayed = (
            bids.join(spark.table(tp).select("doc_id"), "doc_id", "semi")
            .limit(5)
            .collect()
        )
        if replayed:
            ids = sorted(r.doc_id for r in replayed)
            torn = (
                bids.join(spark.table(tp).select("doc_id"),
                          "doc_id", "semi")
                .join(spark.table(tl), "doc_id", "anti")
                .limit(1)
                .collect()
            )
            if torn:
                raise ValueError(
                    f"bm25_store_insert({prefix!r}): TORN prior insert "
                    f"detected — batch doc_ids (sample: {ids}) are "
                    f"present in postings table {tp!r} but missing from "
                    f"dl table {tl!r}: a previous insert crashed between "
                    "its appends, and those docs are silently dropped by "
                    "the serving dl join.  Run bm25_store_repair(spark, "
                    "prefix, batch) with the SAME batch to append the "
                    "missing tables, then retry the remaining batches."
                )
            raise ValueError(
                f"bm25_store_insert({prefix!r}): batch replays already-"
                f"indexed doc_ids (sample: {ids}) — inserting them again "
                "would double-count df/dl and duplicate postings.  Dedupe "
                "upstream (exactly-once ingest) or anti-join the batch "
                f"against table {tp!r} first.  (After a crash mid-insert, "
                "bm25_store_fsck(spark, prefix) checks the cross-table "
                "invariants — a df-only tear has no doc_ids to probe.)"
            )
    bp = _bm25_batch_stats(batch)[0]
    # the three appends all derive from the one (doc_id, token, tf)
    # aggregate — materialize it ONCE (O(batch)) so the batch is not
    # re-tokenized per table write.  DISK_ONLY: the frame is written
    # once and read three times, and a BOOTSTRAP insert legitimately
    # passes the whole corpus as the "batch" — deserialized on-heap
    # caching of that blew a 24 g heap at 20 M docs, while disk blocks
    # cost one spill-speed pass
    bp = bp.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    bdl = bp.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    bdf = bp.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("dfreq")
    )
    nb = _table_num_buckets(spark, tp)
    # postings writes FIRST and alone — the replay/torn guard above
    # probes it as the sentinel table, which is only sound if no other
    # table can be written before it (a crash leaving dl-only rows would
    # otherwise be invisible to the probe).  The dl and df appends are
    # then independent jobs over the one checkpointed bp writing two
    # DIFFERENT tables — run concurrently so each write's straggler
    # tail and driver commit gap overlap the other's (guide §2.6,
    # operators/actions.py).  Crash states remain the detectable set:
    # {postings}, {postings,dl}, {postings,df} — bm25_store_repair
    # probes each table independently, so any subset completes.
    from .actions import run_actions

    bp.select("doc_id", "token", "tf").repartition(
        nb, "token"
    ).write.mode("append").bucketBy(nb, "token").sortBy("token").saveAsTable(
        tp
    )
    run_actions(
        lambda: bdl.select("doc_id", "dl")
        .repartition(nb, "doc_id")
        .write.mode("append")
        .bucketBy(nb, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(tl),
        lambda: bdf.select("token", "dfreq")
        .repartition(nb, "token")
        .write.mode("append")
        .bucketBy(nb, "token")
        .sortBy("token")
        .saveAsTable(td),
    )

    if stats is None and auto_compact_files is None:
        return
    # postings carries serving's SMJ; df accumulates one partial row
    # set per insert — take the worse of the two so a df-only compact
    # cannot mask postings depth (nor vice versa)
    depth = max(_bucket_file_depth(spark, tp), _bucket_file_depth(spark, td))
    compact = auto_compact_files is not None and depth > auto_compact_files
    if stats is not None:
        stats.append(
            {
                "batch_docs": bdl.count(),
                "postings_files": len(spark.table(tp).inputFiles()),
                "file_depth": depth,
                "compacted": compact,
            }
        )
    if compact:
        bm25_store_compact(spark, prefix, full=True)


def bm25_store_fsck(spark, prefix: str) -> dict:
    """Cross-table invariants of the stored BM25 index — the detection
    half of the torn-insert story (round 17).  A clean store
    satisfies: every posting row contributes exactly 1 to its token's
    accumulated dfreq (``postings_rows == sum(dfreq)``), the doc_id
    sets of postings and dl coincide, and dl carries one row per doc.
    O(corpus) aggregates over the bucketed tables — run on demand
    after a crash, not per insert (the insert guard's per-batch probes
    stay O(batch))."""
    tp, tl, td = _bm25_store_phys(spark, prefix)
    postings_rows = int(spark.table(tp).count())
    df_sum = int(
        spark.table(td).agg(F.sum("dfreq")).collect()[0][0] or 0
    )
    p_ids = spark.table(tp).select("doc_id").distinct()
    l_ids = spark.table(tl).select("doc_id")
    report = {
        "postings_rows": postings_rows,
        "df_sum": df_sum,
        "df_delta": postings_rows - df_sum,
        "docs_missing_dl": int(p_ids.join(l_ids, "doc_id", "anti").count()),
        "dl_orphans": int(l_ids.join(p_ids, "doc_id", "anti").count()),
        "dl_duplicates": int(l_ids.count() - l_ids.distinct().count()),
    }
    report["consistent"] = (
        report["df_delta"] == 0
        and report["docs_missing_dl"] == 0
        and report["dl_orphans"] == 0
        and report["dl_duplicates"] == 0
    )
    return report


def bm25_store_repair(spark, prefix: str, batch: DataFrame) -> dict:
    """Complete a TORN insert (round 17, closing the round-16 verdict's
    durability gap): a crash inside :func:`bm25_store_insert`'s appends
    leaves a SUBSET of (postings, dl, df) written — postings always
    first (the guard's sentinel), dl/df in either order (they run
    concurrently).  Given the
    SAME batch, the derived rows are recomputed (deterministic
    tokenization) and ONLY the missing tables appended — table writes
    are job-atomic, so a batch's presence per table is all-or-nothing:
    postings/dl presence is probed by doc_id, and df (token-keyed, no
    doc ids to probe) is decided by the ``postings_rows == sum(dfreq)``
    invariant, which a torn df append leaves short by exactly this
    batch's postings count.  Returns the stages written; raises if the
    df shortfall does not match this batch (a different batch is
    torn)."""
    from pyspark import StorageLevel

    from .dedup import _table_num_buckets

    tp, tl, td = _bm25_store_phys(spark, prefix)
    bp = _bm25_batch_stats(batch)[0].localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    bids = bp.select("doc_id").distinct()
    nb = _table_num_buckets(spark, tp)
    wrote = {"postings": False, "dl": False, "df": False}
    in_postings = (
        bids.join(spark.table(tp).select("doc_id"), "doc_id", "semi")
        .limit(1).count() > 0
    )
    if not in_postings:
        bp.select("doc_id", "token", "tf").repartition(
            nb, "token"
        ).write.mode("append").bucketBy(nb, "token").sortBy(
            "token"
        ).saveAsTable(tp)
        wrote["postings"] = True
    in_dl = (
        bids.join(spark.table(tl), "doc_id", "semi").limit(1).count() > 0
    )
    if not in_dl:
        bp.groupBy("doc_id").agg(
            F.sum("tf").cast("bigint").alias("dl")
        ).select("doc_id", "dl").repartition(nb, "doc_id").write.mode(
            "append"
        ).bucketBy(nb, "doc_id").sortBy("doc_id").saveAsTable(tl)
        wrote["dl"] = True
    delta = int(spark.table(tp).count()) - int(
        spark.table(td).agg(F.sum("dfreq")).collect()[0][0] or 0
    )
    if delta:
        batch_rows = int(bp.count())
        if delta != batch_rows:
            raise ValueError(
                f"bm25_store_repair({prefix!r}): df shortfall {delta} "
                f"does not match this batch's postings count "
                f"{batch_rows} — a DIFFERENT batch is torn; repair with "
                "that batch, or rebuild via bm25_store_init + bootstrap "
                "insert."
            )
        bp.groupBy("token").agg(
            F.count(F.lit(1)).cast("bigint").alias("dfreq")
        ).select("token", "dfreq").repartition(nb, "token").write.mode(
            "append"
        ).bucketBy(nb, "token").sortBy("token").saveAsTable(td)
        wrote["df"] = True
    return wrote


def bm25_store_df(spark, prefix: str) -> DataFrame:
    """Merged (token, dfreq) view over the stored df partials — the
    groupBy-sum runs exchange-free on the bucketed-by-token scan."""
    _, _, td = _bm25_store_phys(spark, prefix)
    return (
        spark.table(td)
        .groupBy("token")
        .agg(F.sum("dfreq").cast("bigint").alias("dfreq"))
    )


def bm25_store_topk(
    spark,
    prefix: str,
    queries: DataFrame,
    *,
    k: int = 5,
    max_df_num: int = 1,
    max_df_den: int = 4,
    max_df_abs: int | None = None,
    force_width: int | None = None,
) -> DataFrame:
    """:func:`bm25_topk` semantics over the stored index — pure index
    joins against the bucketed tables (no exchange on any stored
    side), bit-identical to the scan path on the accumulated corpus.

    Big-corpus posture (round 15, the bm25_topk discipline): the
    scoring tail's post-join shuffles (the (query, doc) aggregate and
    the rank window) run at the SESSION width, which a small-SF conf
    undersizes for a 20 M-row index — measured 2.4 GB of spill at
    width 32.  When the plan-estimated postings scan exceeds the
    session width (or ``force_width`` overrides the estimate — the ops
    and test hook), the plan is materialized under a scoped width +
    4 MB AQE advisory and the checkpointed queries×k result is
    returned; at small SF the plan stays lazy (plan pins unaffected).

    Concurrency (round 16, retiring the verdict's race note): the
    scoped width runs in a FORKED session — ``spark.newSession()``
    shares the SparkContext and catalog but owns a private SQLConf —
    instead of a try/finally mutation of the caller session's globals,
    so two store-topk calls racing on one session can no longer
    observe each other's width.  The caller's ``queries`` frame
    crosses sessions through a context-level global temp view (dropped
    after the eager checkpoint materializes the queries×k result)."""
    tp, tl, _ = _bm25_store_phys(spark, prefix)

    def plan(sess_, queries_):
        return _bm25_score(
            sess_.table(tp),
            sess_.table(tl),
            bm25_store_df(sess_, prefix),
            queries_,
            k=k,
            max_df_num=max_df_num,
            max_df_den=max_df_den,
            max_df_abs=max_df_abs,
        )

    sess = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    width = force_width if force_width is not None else _size_floor(
        spark.table(tp)
    )
    if width > sess:
        from uuid import uuid4

        from pyspark import StorageLevel

        ns = spark.newSession()
        ns.conf.set("spark.sql.shuffle.partitions", str(width))
        ns.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(4 << 20)
        )
        vname = f"bm25_store_q_{uuid4().hex}"
        queries.createOrReplaceGlobalTempView(vname)
        try:
            out = plan(ns, ns.table(f"global_temp.{vname}"))
            return out.localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        finally:
            spark.catalog.dropGlobalTempView(vname)
    return plan(spark, queries)


def bm25_store_compact(spark, prefix: str, full: bool = False) -> None:
    """Fold the df partials to one row per token (full rewrite of the
    df table ONLY — O(vocab), which grows sublinearly in corpus size).
    Run when the partial count has grown, not per batch.

    ``full=True`` additionally rewrites postings and dl to ONE sorted
    file per bucket — the LSM compaction that buys SORT-FREE serving:
    appends leave multiple files per bucket, so the query-time SMJ
    re-sorts the stored postings (measured 2.4 GB of spill per
    2 000-query batch at 20 M docs); after a full compact the sorted
    bucketed scan feeds the join directly (the session default
    ``bucketedTableScan.outputOrdering`` + one file per bucket).  Cost
    is one O(corpus) rewrite — ONE-PASS since round 18: each table is
    written directly from a forced-bucketed scan of its current
    physical generation into the alternate physical name and the old
    generation dropped (operators/genswap.py), instead of the old
    snapshot(localCheckpoint)+overwrite that materialized every row
    TWICE (the in-place overwrite needed the snapshot because Spark
    refuses to overwrite a table it reads from).  The bucketed scan
    gives one task per bucket and zero exchange; readers resolve the
    current generation through ``_bm25_store_phys``."""
    from .actions import run_actions
    from .dedup import _table_num_buckets
    from .genswap import compact_swap, current_table, forced_bucketed_scan

    tp, tl, td = _bm25_store_tables(prefix)

    # each table's one-pass rewrite touches only its own logical table;
    # the three run concurrently (guide §2.6) — a full compact is the
    # most job-dense operation in the store lifecycle (q469 trips two of
    # them on purpose) and the per-table rewrites otherwise serialize
    # their jobs and driver commit gaps.
    def compact_df():
        nb = _table_num_buckets(spark, current_table(spark, td))

        def write(cur_df, target, path):
            merged = cur_df.groupBy("token").agg(
                F.sum("dfreq").cast("bigint").alias("dfreq")
            )
            w = merged.write.mode("overwrite").bucketBy(
                nb, "token"
            ).sortBy("token")
            if path is not None:
                w = w.option("path", path)
            w.saveAsTable(target)

        compact_swap(spark, td, write)

    def compact_table(table, key):
        def run():
            nb_t = _table_num_buckets(spark, current_table(spark, table))

            def write(cur_df, target, path):
                w = cur_df.write.mode("overwrite").bucketBy(
                    nb_t, key
                ).sortBy(key)
                if path is not None:
                    w = w.option("path", path)
                w.saveAsTable(target)

            compact_swap(spark, table, write)

        return run

    with forced_bucketed_scan(spark):
        if full:
            run_actions(
                compact_df,
                compact_table(tp, "token"),
                compact_table(tl, "doc_id"),
            )
        else:
            compact_df()
