"""Product/experiment/customer analytics (q281-q327).

Split from the monolithic queries.py (round 8).  Importing this module
registers its queries into the shared QUERIES/ORACLE registry.
"""

from ._common import *  # noqa: F401,F403
from ._common import (  # noqa: F401
    _BUCKETED_SEQ,
    _CORRM_COLS,
    _COS_EXPR,
    _DUP_UNION,
    _GEO_PENTAGON,
    _GEO_PX,
    _GEO_PY,
    _PII_EMAIL_RE,
    _PII_IP_RE,
    _SCRIPT_AR,
    _SCRIPT_CYR,
    _SCRIPT_HAN,
    _STREAM_EXEC_SEQ,
    _corrm_oracle,
    _dec,
    _dsum,
    _events_stream,
    _geo,
    _lang_case_sql,
    _run_stream,
    _t,
)


@query(
    "q281_mad_robust_outliers",
    """
    WITH med AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS m
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), devs AS (
      SELECT e.event_type, e.value, med.m,
             abs(e.value - med.m) AS dev
      FROM events e JOIN med ON med.event_type = e.event_type
      WHERE e.value IS NOT NULL
    ), mad AS (
      SELECT event_type, m,
             quantile_cont(dev, 0.5) AS mad
      FROM devs GROUP BY event_type, m
    )
    SELECT d.event_type,
           round(mad.m, 6) AS median_val,
           round(mad.mad, 6) AS mad,
           CAST(SUM(CASE WHEN abs(d.value - mad.m)
                          > 3.0 * 1.4826 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM devs d JOIN mad ON mad.event_type = d.event_type
    GROUP BY d.event_type, mad.m, mad.mad
    """,
)
def q281(spark, sf_dir):
    """Median Absolute Deviation robust statistics — the outlier screen
    that, unlike q222's Tukey fences or z-scores, has a 50% breakdown
    point (half the data can be corrupt before it moves): per group,
    median, MAD = median(|x − median|), and the count of points beyond
    3 robust sigmas (1.4826·MAD, the normal-consistency constant).
    Two exact interpolated-percentile passes sharing one partitioning
    (the q14 precedent) with the medians broadcast back between them —
    at 100 TB the second pass is the cost of one extra scan, which is
    the honest price of exact MAD (the sketch alternative runs both
    medians through q225's t-digests).  6-dp rounding on the
    interpolated medians; the outlier threshold comparison happens on
    identically-derived doubles."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    devs = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "m",
        F.abs(F.col("value") - F.col("m")).alias("dev"),
    )
    mad = devs.groupBy("event_type", "m").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    j = devs.drop("m").join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type", "m", "mad").agg(
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("m"))
                > 3.0 * 1.4826 * F.col("mad"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers")
    ).select(
        "event_type",
        F.round("m", 6).alias("median_val"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
    )


@query(
    "q282_simhash_hamming_index",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' x' AS text
      FROM documents WHERE doc_id % 7 = 0
    ), tok AS (
      SELECT doc_id AS doc,
             CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
      FROM corpus, UNNEST(string_split(text, ' ')) AS u(w)
    ), votes AS (
      SELECT doc, i,
             SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM tok CROSS JOIN UNNEST(range(0, 60)) AS t(i)
      GROUP BY doc, i
    ), sig AS (
      SELECT doc,
             CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc
    ), blocks AS (
      SELECT doc, simhash, t.b,
             (simhash >> (15 * t.b)) & 32767 AS bv
      FROM sig CROSS JOIN UNNEST(range(0, 4)) AS t(b)
    ), cand AS (
      SELECT DISTINCT x.doc AS doc_a, x.simhash AS sa,
                      y.doc AS doc_b, y.simhash AS sb
      FROM blocks x JOIN blocks y
        ON y.b = x.b AND y.bv = x.bv AND x.doc < y.doc
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def q282(spark, sf_dir):
    """SimHash near-dup search done PROPERLY — the multi-block Hamming
    pigeonhole index (the Google/Manku WWW'07 construction) q40's
    single prefix bucket approximates: split the 60-bit signature into
    4 blocks of 15 bits; any pair within Hamming distance 3 differs in
    at most 3 blocks, so it must agree EXACTLY on at least one — an
    equi-join per block finds every such pair with zero false
    negatives (a theorem, not a heuristic; unit-testable by
    construction).  Candidates are verified with bit_count(a XOR b).
    Corpus salted with exact copies (hamming 0) and one-token-appended
    mutations (small nonzero hamming).  Scale shape: 4 index rows per
    doc, equi-join on 15-bit block values — expected chance collisions
    n²·4/2^15, linear-ish at corpus scale and embarrassingly
    shardable; no O(n²) scan anywhere.  The oracle re-derives
    signatures bit-for-bit (portable md5-60 base hash) and runs the
    identical index."""
    d = _t(spark, sf_dir, "documents")
    corpus = (
        d.select("doc_id", "text")
        .unionByName(
            d.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat("text", F.lit(" x")).alias("text"),
            )
        )
    )
    sig = dedup.simhash(corpus, "text", "doc_id")
    blocks = sig.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 15 * b).bitwiseAND(F.lit(32767))
                    for b in range(4)
                ]
            )
        ).alias("b", "bv"),
    )
    x = blocks.select(
        F.col("doc").alias("doc_a"),
        F.col("simhash").alias("sa"),
        "b",
        "bv",
    )
    y = blocks.select(
        F.col("doc").alias("doc_b"),
        F.col("simhash").alias("sb"),
        "b",
        "bv",
    )
    cand = (
        x.join(y, ["b", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "sa", "doc_b", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.filter(ham <= 3).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


@query(
    "q283_countmin_sketch",
    """
    WITH rows_h AS (
      SELECT e.user_id, t.i,
             CAST('0x' || substr(md5(CAST(e.user_id AS VARCHAR)
                  || '#' || CAST(t.i AS VARCHAR)), 1, 15) AS BIGINT)
               % 1024 AS cell
      FROM events e CROSS JOIN UNNEST(range(0, 4)) AS t(i)
      WHERE e.user_id IS NOT NULL
    ), sketch AS (
      SELECT i, cell, COUNT(*) AS c FROM rows_h GROUP BY i, cell
    ), probes AS (
      SELECT DISTINCT user_id FROM events
      WHERE user_id IS NOT NULL AND user_id % 29 = 0
    ), probe_cells AS (
      SELECT p.user_id, t.i,
             CAST('0x' || substr(md5(CAST(p.user_id AS VARCHAR)
                  || '#' || CAST(t.i AS VARCHAR)), 1, 15) AS BIGINT)
               % 1024 AS cell
      FROM probes p CROSS JOIN UNNEST(range(0, 4)) AS t(i)
    ), est AS (
      SELECT pc.user_id, MIN(s.c) AS cm_est
      FROM probe_cells pc JOIN sketch s
        ON s.i = pc.i AND s.cell = pc.cell
      GROUP BY pc.user_id
    ), exact AS (
      SELECT user_id, COUNT(*) AS exact_cnt FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT e.user_id,
           CAST(x.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(e.cm_est AS BIGINT) AS cm_est,
           CAST(e.cm_est - x.exact_cnt AS BIGINT) AS overcount,
           e.cm_est >= x.exact_cnt AS never_undercounts
    FROM est e JOIN exact x ON x.user_id = e.user_id
    """,
)
def q283(spark, sf_dir):
    """Count-Min sketch — point-frequency estimation with a one-sided
    error guarantee, ENTIRELY in native aggregates (no Python kernel —
    the sketch IS a grouped count): depth 4 × width 1024, cell =
    portable_hash60(key#row) mod width, update = the (i, cell) counts,
    point estimate = MIN over the 4 rows' cells.  Mergeability is
    integer vector addition (a groupBy-sum of sketch tables), and the
    never-undercount guarantee (est ≥ exact, always — every true
    occurrence lands in all 4 counted cells) is pinned as a
    literal-TRUE boolean.  Because update AND query are deterministic
    hash arithmetic, the oracle reproduces the EXACT estimates
    including collision overcounts — no tolerance band needed, unlike
    the probabilistic-bound framing.  Sketch state: ≤ 4096 cells
    regardless of key cardinality — the CM trade against MG (q210):
    O(1) point queries and linear merges vs provable heavy-hitter
    capture."""
    from ..operators.dedup import portable_hash60

    W, D = 1024, 4
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())

    def cells(df, key):
        return df.select(
            key,
            F.posexplode(
                F.array(
                    *[
                        portable_hash60(
                            F.concat(
                                F.col(key).cast("string"),
                                F.lit("#"),
                                F.lit(str(i)),
                            )
                        )
                        % W
                        for i in range(D)
                    ]
                )
            ).alias("i", "cell"),
        )

    sketch = (
        cells(ev, "user_id")
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        ev.filter(F.col("user_id") % 29 == 0).select("user_id").distinct()
    )
    est = (
        cells(probes, "user_id")
        .join(sketch, ["i", "cell"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cm_est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return est.join(exact, "user_id").select(
        "user_id",
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        F.col("cm_est").cast("bigint").alias("cm_est"),
        (F.col("cm_est") - F.col("exact_cnt")).cast("bigint").alias(
            "overcount"
        ),
        (F.col("cm_est") >= F.col("exact_cnt")).alias("never_undercounts"),
    )


@query(
    "q284_trimmed_winsorized_mean",
    """
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.1) AS p10,
             quantile_cont(value, 0.9) AS p90
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(AVG(CASE WHEN e.value >= b.p10 AND e.value <= b.p90
                          THEN e.value END), 6) AS trimmed_mean,
           round(AVG(CASE WHEN e.value < b.p10 THEN b.p10
                          WHEN e.value > b.p90 THEN b.p90
                          ELSE e.value END), 6) AS winsorized_mean,
           CAST(SUM(CASE WHEN e.value < b.p10 OR e.value > b.p90
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM events e JOIN bounds b ON b.event_type = e.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def q284(spark, sf_dir):
    """Trimmed and winsorized means (CH ``avgTrimmed`` analogue) — the
    robust location estimates between the mean (0% breakdown) and the
    median (50%): drop, respectively CLAMP, everything outside
    [p10, p90] and average the rest.  Two passes sharing one
    event_type partitioning — exact interpolated decile bounds (the
    q14 precedent) broadcast back onto the scan — with trimmed,
    winsorized, and the clamp count read in ONE conditional aggregate.
    Float sums round to 6 dp; the bounds comparisons happen on
    identically-derived doubles on both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.1)).alias("p10"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    inside = (F.col("value") >= F.col("p10")) & (
        F.col("value") <= F.col("p90")
    )
    wins = (
        F.when(F.col("value") < F.col("p10"), F.col("p10"))
        .when(F.col("value") > F.col("p90"), F.col("p90"))
        .otherwise(F.col("value"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg(F.when(inside, F.col("value"))), 6).alias(
            "trimmed_mean"
        ),
        F.round(F.avg(wins), 6).alias("winsorized_mean"),
        F.sum(F.when(~inside, 1).otherwise(0))
        .cast("bigint")
        .alias("n_clamped"),
    )


@query(
    "q285_deterministic_shuffle_shards",
    """
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ), sharded AS (
      SELECT doc_id, rk, CAST((rk - 1) // 64 AS BIGINT) AS shard
      FROM ranked
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(rk) AS BIGINT) AS rk_lo,
           CAST(MAX(rk) AS BIGINT) AS rk_hi,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM sharded GROUP BY shard
    """,
)
def q285(spark, sf_dir):
    """Deterministic global TRAINING-ORDER shuffle + sharding — the
    corpus-curation step that turns "randomize example order" into a
    reproducible, resumable property of the data instead of a runtime
    RNG: order = content hash of the id (md5, id tiebreak), shards =
    consecutive 64-doc ranges of that order.  Every re-run, on any
    cluster layout, produces byte-identical shard assignments — which
    is what makes mid-training restarts and A/B data ablations
    comparable.  One global sort by a 32-hex key (at 100 TB: range
    partitioning on the hash prefix gives the same total order without
    a single-node sort — the hash IS uniformly distributed by
    construction, so ranges balance).  The oracle re-derives ranks and
    shard stats bit-identically."""
    d = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select("doc_id", F.row_number().over(w).alias("rk"))
    sharded = ranked.withColumn(
        "shard", ((F.col("rk") - 1) / 64).cast("bigint")
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("rk").cast("bigint").alias("rk_lo"),
        F.max("rk").cast("bigint").alias("rk_hi"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


@query(
    "q286_run_length_encoding",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE user_id IS NOT NULL
    ), starts AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN prev IS NULL OR event_type != prev
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ), runs AS (
      SELECT user_id, event_type,
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM starts
    ), rle AS (
      SELECT user_id, run_id,
             MIN(event_type) AS t, COUNT(*) AS len
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(len) AS BIGINT) AS longest_run,
           string_agg(t || CAST(len AS VARCHAR), '>' ORDER BY run_id)
             AS rle
    FROM rle GROUP BY user_id
    """,
)
def q286(spark, sf_dir):
    """Run-length encoding of per-user event sequences (CH
    ``arrayCompact`` + run lengths): the gaps-and-islands classic —
    run boundaries from lag(), run ids from a running sum of starts,
    then one aggregate per run and an ordered reassembly into
    'v3>c1>p2' strings.  Three window/aggregate stages all sharing ONE
    user_id partitioning (no re-shuffle after the first), which is the
    property that keeps sequence compression linear at 100 TB.  RLE is
    the repetition-analysis primitive behind q220's quality signals;
    here the full encoding round-trips through the oracle's identical
    derivation (longest-run and run-count pinned alongside)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev", F.lag("event_type").over(w))
        .withColumn(
            "is_start",
            F.when(
                F.col("prev").isNull()
                | (F.col("event_type") != F.col("prev")),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("is_start").over(wcum))
    )
    rle = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("t"), F.count(F.lit(1)).alias("len")
    )
    return rle.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("len").cast("bigint").alias("longest_run"),
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "run_id",
                            F.concat(
                                F.col("t"), F.col("len").cast("string")
                            ).alias("seg"),
                        )
                    )
                ),
                lambda s: s["seg"],
            ),
        ).alias("rle"),
    )


@query(
    "q287_cohort_retention_triangle",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), cohort_size AS (
      SELECT cohort_week, COUNT(*) AS n0 FROM firsts GROUP BY cohort_week
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST((epoch(date_trunc('week', e.ts))
                   - epoch(f.cohort_week)) / 604800 AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.user_id IS NOT NULL
    )
    SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
           a.week_offset,
           CAST(cs.n0 AS BIGINT) AS cohort_size,
           CAST(COUNT(*) AS BIGINT) AS retained,
           round(CAST(COUNT(*) AS DOUBLE) / cs.n0, 6) AS retention_rate
    FROM activity a JOIN cohort_size cs ON cs.cohort_week = a.cohort_week
    GROUP BY a.cohort_week, a.week_offset, cs.n0
    """,
)
def q287(spark, sf_dir):
    """The full COHORT-RETENTION TRIANGLE — the growth-analytics table
    q99's fixed day-1/day-7 flags only sample: users bucketed into
    first-touch weekly cohorts, and for every (cohort, week-offset)
    cell, the share of the cohort active that week.  Shape: the
    first-touch aggregate (one shuffle on user), a user-level join back
    (first-touch is user-keyed, so it co-partitions with the activity
    scan), DISTINCT per (user, offset) so multi-event weeks count once,
    then a cell-level aggregate with the cohort sizes broadcast.  Week
    arithmetic runs on epoch seconds of date_trunc-ed weeks, identical
    on both engines (UTC session, Monday week start in both)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    cohort_size = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n0")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp(F.col("cohort_week").cast("timestamp"))
                )
                / 604800
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("retained"))
        .join(F.broadcast(cohort_size), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("n0").cast("bigint").alias("cohort_size"),
            F.col("retained").cast("bigint").alias("retained"),
            F.round(
                F.col("retained").cast("double") / F.col("n0").cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )


@query(
    "q288_sequence_gap_detection",
    """
    WITH ids AS (
      SELECT event_id % 100000 AS id FROM events
      WHERE event_id % 7 != 0
    ), d AS (
      SELECT DISTINCT id FROM ids
    ), gaps AS (
      SELECT lag(id) OVER (ORDER BY id) + 1 AS gap_start,
             id - 1 AS gap_end
      FROM d
    )
    SELECT CAST(gap_start AS BIGINT) AS gap_start,
           CAST(gap_end AS BIGINT) AS gap_end,
           CAST(gap_end - gap_start + 1 AS BIGINT) AS gap_len
    FROM gaps
    WHERE gap_start IS NOT NULL AND gap_end >= gap_start
    ORDER BY gap_start
    LIMIT 50
    """,
)
def q288(spark, sf_dir):
    """Sequence-completeness audit — find every MISSING id range in a
    supposedly-dense sequence (the 'did we drop messages' check a log
    pipeline runs after every backfill): distinct ids, one ordered
    lag() pass, a gap row wherever the step exceeds 1.  The fixture
    removes every 7th id, so the expected answer is a lattice of
    single-id holes plus whatever the id space genuinely lacks.  One
    sort (at 100 TB: range-partitioned, gaps detected within
    partitions plus one boundary exchange per partition edge — the
    lag() formulation parallelizes exactly that way), top-50 with a
    total order.  Both engines derive identical gap bounds from the
    same integer arithmetic."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 != 0)
    d = ev.select((F.col("event_id") % 100000).alias("id")).distinct()
    w = Window.orderBy("id")
    gaps = d.select(
        (F.lag("id").over(w) + 1).alias("gap_start"),
        (F.col("id") - 1).alias("gap_end"),
    ).filter(
        F.col("gap_start").isNotNull()
        & (F.col("gap_end") >= F.col("gap_start"))
    )
    return (
        gaps.select(
            F.col("gap_start").cast("bigint").alias("gap_start"),
            F.col("gap_end").cast("bigint").alias("gap_end"),
            (F.col("gap_end") - F.col("gap_start") + 1)
            .cast("bigint")
            .alias("gap_len"),
        )
        .orderBy("gap_start")
        .limit(50)
    )


@query(
    "q289_hierarchy_shares",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(round(o.o_totalprice * 100) AS HUGEINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE),
                 6) AS share_of_region,
           round(CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER () AS DOUBLE), 6) AS share_of_total
    FROM rev
    """,
)
def q289(spark, sf_dir):
    """Hierarchy contribution shares — every BI drill-down's backbone:
    nation revenue as a share of its REGION and of the TOTAL, computed
    with two window sums over the already-aggregated 25-row frame (no
    second scan, no self-join).  Revenue sums are exact integer cents
    (HUGEINT/DECIMAL so the global sum can't wrap), shares are float
    division rounded to 6 dp.  The dims broadcast onto the fact scan;
    at 100 TB the only heavy stage is the one fact aggregate — the
    share arithmetic is free."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint").cast(
        "decimal(38,0)"
    )
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(cents).alias("cents"))
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    cd = F.col("cents").cast("double")
    return rev.select(
        "region",
        "nation",
        (cd / 100.0).alias("revenue"),
        F.round(cd / F.sum("cents").over(wr).cast("double"), 6).alias(
            "share_of_region"
        ),
        F.round(cd / F.sum("cents").over(wt).cast("double"), 6).alias(
            "share_of_total"
        ),
    )


@query(
    "q290_pareto_abc",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cents) OVER () AS total
      FROM rev
    ), classed AS (
      SELECT l_partkey, cents,
             CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
             CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
                    THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95
                    THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS class_revenue,
           round(MIN(cum_share), 6) AS min_cum_share,
           round(MAX(cum_share), 6) AS max_cum_share
    FROM classed GROUP BY abc
    """,
)
def q290(spark, sf_dir):
    """Pareto / ABC classification — the 80-15-5 inventory cut: parts
    ranked by revenue, cumulative share over the DESC order (total-order
    tiebreak on the key), classes at the 80% and 95% cumulative
    boundaries, summarized per class.  The cumulative sum runs in EXACT
    integer cents (widened so the running total can't wrap) and only
    the final share division is float — so the class boundary decisions
    are deterministic on both engines even where two parts' revenues
    tie.  One fact aggregate, then windows over the part-level frame;
    the classic long-tail report at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint").cast(
        "decimal(38,0)"
    )
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("cents"))
    wcum = Window.orderBy(
        F.col("cents").desc(), F.col("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(wtot).alias("total"),
    )
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    classed = ranked.select(
        "l_partkey",
        "cents",
        share.alias("cum_share"),
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (F.sum("cents").cast("double") / 100.0).alias("class_revenue"),
        F.round(F.min("cum_share"), 6).alias("min_cum_share"),
        F.round(F.max("cum_share"), 6).alias("max_cum_share"),
    )


@query(
    "q291_growth_accounting",
    """
    WITH weeks AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events WHERE user_id IS NOT NULL
    ), firsts AS (
      SELECT user_id, MIN(w) AS first_w FROM weeks GROUP BY user_id
    ), marked AS (
      SELECT wk.user_id, wk.w, f.first_w,
             lag(wk.w) OVER (PARTITION BY wk.user_id ORDER BY wk.w)
               AS prev_w
      FROM weeks wk JOIN firsts f ON f.user_id = wk.user_id
    ), classed AS (
      SELECT w,
             CASE WHEN w = first_w THEN 'new'
                  WHEN prev_w = w - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM marked
    ), churn AS (
      SELECT CAST(prev_w + INTERVAL 7 DAY AS DATE) AS w,
             'churned' AS status
      FROM (
        SELECT user_id, w AS prev_w,
               lead(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
        FROM weeks)
      WHERE (next_w IS NULL OR next_w > prev_w + INTERVAL 7 DAY)
        AND prev_w + INTERVAL 7 DAY <= (SELECT MAX(w) FROM weeks)
    )
    SELECT strftime(w, '%Y-%m-%d') AS week, status,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (SELECT w, status FROM classed
          UNION ALL SELECT w, status FROM churn)
    GROUP BY w, status
    """,
)
def q291(spark, sf_dir):
    """GROWTH ACCOUNTING — the new/retained/resurrected/churned weekly
    user ledger every growth team lives by: active weeks per user
    (distinct (user, week) — the only raw-data shuffle), then lag/lead
    over each user's week sequence classify every active week (new =
    first touch, retained = also active the prior week, resurrected =
    returning after a gap) and emit a churned marker the week AFTER an
    activity streak ends (capped at the observation horizon so the
    final week can't accuse everyone of churning).  All classification
    runs on the user-week frame; by construction
    new+retained+resurrected = WAU per week — the reconciliation
    property that makes this ledger trustworthy, and which both
    engines must reproduce row-for-row."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    firsts = weeks.groupBy("user_id").agg(F.min("w").alias("first_w"))
    wseq = Window.partitionBy("user_id").orderBy("w")
    marked = weeks.join(firsts, "user_id").withColumn(
        "prev_w", F.lag("w").over(wseq)
    )
    classed = marked.select(
        "w",
        F.when(F.col("w") == F.col("first_w"), "new")
        .when(F.col("prev_w") == F.date_sub(F.col("w"), 7), "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    horizon = weeks.agg(F.max("w").alias("max_w"))
    churn = (
        weeks.withColumn("next_w", F.lead("w").over(wseq))
        .filter(
            F.col("next_w").isNull()
            | (F.col("next_w") > F.date_add(F.col("w"), 7))
        )
        .crossJoin(F.broadcast(horizon))
        .filter(F.date_add(F.col("w"), 7) <= F.col("max_w"))
        .select(
            F.date_add(F.col("w"), 7).alias("w"),
            F.lit("churned").alias("status"),
        )
    )
    return (
        classed.unionByName(churn)
        .groupBy("w", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.date_format("w", "yyyy-MM-dd").alias("week"),
            "status",
            "n_users",
        )
    )


@query(
    "q292_cooccurrence_lift",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL
    ), n_users AS (
      SELECT COUNT(DISTINCT user_id) AS n FROM ut
    ), singles AS (
      SELECT event_type, COUNT(*) AS c FROM ut GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS cab
      FROM ut a JOIN ut b
        ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.ta, p.tb,
           CAST(p.cab AS BIGINT) AS n_both,
           round(CAST(p.cab AS DOUBLE) / t.n, 6) AS support,
           round(CAST(p.cab AS DOUBLE) / sa.c, 6) AS confidence_a_to_b,
           round(CAST(p.cab AS DOUBLE) * t.n
                 / (CAST(sa.c AS DOUBLE) * sb.c), 6) AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.ta
    JOIN singles sb ON sb.event_type = p.tb
    CROSS JOIN n_users t
    """,
)
def q292(spark, sf_dir):
    """Association-rule mining lite — co-occurrence support /
    confidence / LIFT between event types at user grain (the
    market-basket analysis primitive): distinct (user, type) pairs
    (one shuffle — the only raw-data pass), a self-join per user for
    the pair counts (bounded: ≤ C(|types|,2) output rows, and the join
    fan-out per user is |types|² ≤ 25, not |events|²), then the
    support/lift arithmetic on the tiny pair frame with singles and
    the user count broadcast.  lift > 1 means the pair co-occurs more
    than independence predicts — exact 6-dp values pinned on both
    engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select("user_id", F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    sa = singles.select(
        F.col("event_type").alias("ta"), F.col("c").alias("ca")
    )
    sb = singles.select(
        F.col("event_type").alias("tb"), F.col("c").alias("cb")
    )
    nd = F.col("n").cast("double")
    return (
        pairs.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ta",
            "tb",
            F.col("cab").cast("bigint").alias("n_both"),
            F.round(F.col("cab").cast("double") / nd, 6).alias("support"),
            F.round(
                F.col("cab").cast("double") / F.col("ca").cast("double"), 6
            ).alias("confidence_a_to_b"),
            F.round(
                F.col("cab").cast("double")
                * nd
                / (F.col("ca").cast("double") * F.col("cb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "q293_conversion_latency",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' AND user_id IS NOT NULL
      GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    ), lat AS (
      SELECT s.user_id,
             CAST(floor(epoch(p.purchase_ts))
                  - floor(epoch(s.signup_ts)) AS BIGINT) AS sec
      FROM s JOIN p ON p.user_id = s.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(sec) AS BIGINT) AS min_sec,
           round(quantile_cont(sec, 0.5), 4) AS p50_sec,
           round(quantile_cont(sec, 0.9), 4) AS p90_sec,
           CAST(MAX(sec) AS BIGINT) AS max_sec,
           CAST(SUM(CASE WHEN sec <= 86400 THEN 1 ELSE 0 END) AS BIGINT)
             AS within_1d
    FROM lat
    """,
)
def q293(spark, sf_dir):
    """Conversion LATENCY distribution — time from first signup to
    first subsequent purchase per user, the funnel-velocity metric
    windowFunnel's boolean levels (q97/q163/q241/q267) never surface:
    two first-touch aggregates (the purchase side pre-filtered to
    post-signup events via a user-keyed join, so a purchase BEFORE
    signup never counts), integer-second deltas, then exact
    interpolated percentiles + a within-1-day conversion count.  Three
    shuffles all on user_id — co-partitioned end to end; latencies are
    exact integers so only the interpolated quantiles carry the 4-dp
    rounding rule."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    lat = s.join(p, "user_id").select(
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")
        ).alias("sec")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("sec").cast("bigint").alias("min_sec"),
        F.round(F.percentile("sec", F.lit(0.5)), 4).alias("p50_sec"),
        F.round(F.percentile("sec", F.lit(0.9)), 4).alias("p90_sec"),
        F.max("sec").cast("bigint").alias("max_sec"),
        F.sum(F.when(F.col("sec") <= 86400, 1).otherwise(0))
        .cast("bigint")
        .alias("within_1d"),
    )


@query(
    "q294_interarrival_rate",
    """
    WITH arr AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           round(AVG(CAST(gap AS DOUBLE)), 6) AS mean_gap_sec,
           round(1.0 / AVG(CAST(gap AS DOUBLE)), 9) AS rate_per_sec,
           round(quantile_cont(gap, 0.5), 4) AS p50_gap,
           round(STDDEV_SAMP(CAST(gap AS DOUBLE))
                 / AVG(CAST(gap AS DOUBLE)), 6) AS cv
    FROM arr WHERE gap IS NOT NULL
    GROUP BY event_type
    """,
)
def q294(spark, sf_dir):
    """Inter-arrival-time statistics — the Poisson-process health check
    for an event stream: per-type gaps from one lag() pass (integer
    seconds, total-order tiebreak), then arrival rate λ = 1/mean, the
    median gap, and the coefficient of variation (cv ≈ 1 is the
    exponential/Poisson signature; cv >> 1 means bursty, << 1 means
    metronomic — the operational question behind q77's flap detector,
    answered distributionally).  One window + one aggregate sharing the
    event_type partitioning.  Mean/cv round at 6 dp over exact integer
    gaps; λ at 9 dp because its magnitude is ~1e-3."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    tsec = F.unix_timestamp("ts")
    arr = ev.select(
        "event_type", (tsec - F.lag(tsec).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("double")
    return arr.groupBy("event_type").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.round(F.avg(gd), 6).alias("mean_gap_sec"),
        F.round(1.0 / F.avg(gd), 9).alias("rate_per_sec"),
        F.round(F.percentile("gap", F.lit(0.5)), 4).alias("p50_gap"),
        F.round(F.stddev_samp(gd) / F.avg(gd), 6).alias("cv"),
    )


@query(
    "q295_zipf_fit",
    """
    WITH tf AS (
      SELECT lower(t.w) AS w, COUNT(*) AS c
      FROM documents d, LATERAL (
        SELECT unnest(string_split(d.text, ' ')) AS w) t
      WHERE t.w != ''
      GROUP BY lower(t.w)
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk
      FROM tf
    ), pts AS (
      SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE rk <= 1000
    ), s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept
    FROM s
    """,
)
def q295(spark, sf_dir):
    """Zipf-law fit of the vocabulary — the corpus-health diagnostic
    data-curation pipelines run to catch boilerplate floods and
    tokenizer breakage (natural text has rank-frequency slope ≈ −1;
    duplicated spam flattens it): exact integer token counts (one
    shuffle), rank with a total-order tiebreak, then ordinary least
    squares of ln(freq) on ln(rank) over the top 1000 ranks via the
    q196 closed-form sums.  The float sums here ARE order-dependent in
    the last bits, but 1000 ln-magnitude terms summed to ~1e4 keep
    6-dp rounding stable (verified at all fixture scales) — the
    alternative exact path would fixed-point-quantize the logs."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(F.lower("w").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wrk = Window.orderBy(F.col("c").desc(), F.col("w"))
    pts = (
        tf.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= 1000)
        .select(
            F.log(F.col("rk").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "intercept"
        ),
    )


@query(
    "q296_gini_coefficient",
    """
    WITH act AS (
      SELECT user_id, COUNT(*) AS c FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS i,
             COUNT(*) OVER () AS n,
             SUM(c) OVER () AS tot
      FROM act
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(MAX(tot) AS BIGINT) AS total_events,
           round(CAST(SUM((2 * i - n - 1) * c) AS DOUBLE)
                 / (CAST(MAX(n) AS DOUBLE) * MAX(tot)), 6) AS gini
    FROM ranked
    """,
)
def q296(spark, sf_dir):
    """Gini coefficient of user activity — the inequality measure
    behind 'do 10% of users generate 90% of events': the exact sorted
    formula G = Σ(2i−n−1)·x_i / (n·Σx) with ascending rank i (user-id
    tiebreak).  The numerator is a sum of INTEGER products (rank
    arithmetic × integer counts), so the only float op is the final
    division — G is deterministic to the last bit before its 6-dp
    rounding.  One aggregate + one ranked pass over the
    user-cardinality frame; pairs naturally with q290's Pareto classes
    and q275's placement audit."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    act = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    wi = Window.orderBy("c", "user_id")
    wall = Window.partitionBy()
    ranked = act.select(
        "c",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("c").over(wall).alias("tot"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.max("tot").cast("bigint").alias("total_events"),
        F.round(
            F.sum(
                (2 * F.col("i") - F.col("n") - 1) * F.col("c")
            ).cast("double")
            / (
                F.max("n").cast("double") * F.max("tot").cast("double")
            ),
            6,
        ).alias("gini"),
    )


@query(
    "q297_heaps_law",
    """
    WITH ord AS (
      SELECT doc_id, text,
             row_number() OVER (ORDER BY doc_id) AS rk
      FROM documents
    ), firsts AS (
      SELECT lower(t.w) AS w, MIN(o.rk) AS first_rk
      FROM ord o, LATERAL (
        SELECT unnest(string_split(o.text, ' ')) AS w) t
      WHERE t.w != ''
      GROUP BY lower(t.w)
    ), cks AS (
      SELECT unnest([32, 64, 128, 256, 512, 1024, 2048, 4096]) AS ck
    ), vocab AS (
      SELECT c.ck, COUNT(*) AS v
      FROM cks c JOIN firsts f ON f.first_rk <= c.ck
      WHERE c.ck <= (SELECT MAX(rk) FROM ord)
      GROUP BY c.ck
    ), pts AS (
      SELECT ln(CAST(ck AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
      FROM vocab
    ), s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_checkpoints,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS heaps_beta,
           round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n), 4) AS heaps_k
    FROM s
    """,
)
def q297(spark, sf_dir):
    """Heaps'-law vocabulary growth — V(n) ≈ K·n^β, the companion
    diagnostic to q295's Zipf slope (natural corpora grow vocabulary
    at β ≈ 0.4–0.7; duplicated content pushes β toward 0): each
    token's FIRST document rank (one shuffle — the same first-touch
    identity as q268's cumulative uniques), vocabulary size at
    power-of-two checkpoints via a tiny broadcast range join, then
    log-log OLS for (K, β).  The raw corpus is scanned once; the
    curve fitting happens on ≤ 8 checkpoint rows."""
    d = _t(spark, sf_dir, "documents")
    wrk = Window.orderBy("doc_id")
    ordd = d.select("doc_id", "text", F.row_number().over(wrk).alias("rk"))
    firsts = (
        ordd.select("rk", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(F.lower("w").alias("w"))
        .agg(F.min("rk").alias("first_rk"))
    )
    max_rk = ordd.agg(F.max("rk").alias("mx"))
    cks = spark.createDataFrame(
        [(c,) for c in [32, 64, 128, 256, 512, 1024, 2048, 4096]],
        "ck long",
    )
    vocab = (
        cks.crossJoin(F.broadcast(max_rk))
        .filter(F.col("ck") <= F.col("mx"))
        .join(firsts, F.col("first_rk") <= F.col("ck"))
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    pts = vocab.select(
        F.log(F.col("ck").cast("double")).alias("x"),
        F.log(F.col("v").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_checkpoints"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round(
            F.exp((F.col("sy") - slope * F.col("sx")) / n), 4
        ).alias("heaps_k"),
    )


@query(
    "q298_session_stats",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                    - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800
                  OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE user_id IS NOT NULL
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      , tsec
      FROM ordered
    ), per_sess AS (
      SELECT user_id, sid, COUNT(*) AS depth,
             MAX(tsec) - MIN(tsec) AS dur_sec
      FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           round(AVG(CAST(depth AS DOUBLE)), 6) AS avg_depth,
           round(CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate,
           round(quantile_cont(dur_sec, 0.5), 4) AS p50_duration_sec,
           CAST(MAX(dur_sec) AS BIGINT) AS max_duration_sec
    FROM per_sess
    """,
)
def q298(spark, sf_dir):
    """Batch SESSION STATISTICS — the per-session table q50/q81's
    windowed aggregates summarize away: 30-minute-gap sessionization by
    gaps-and-islands (new-session markers from lag, session ids from
    the running sum — one user_id partitioning shared by both windows),
    then per-session depth and duration reduced to the product
    metrics: session count, average depth, BOUNCE RATE (single-event
    sessions), median duration.  Durations are exact integer seconds;
    only the interpolated median carries rounding.  Same machinery as
    q286's RLE pointed at time gaps instead of value changes."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tsec = F.unix_timestamp("ts")
    ordered = ev.select(
        "user_id", "ts", "event_id", tsec.alias("tsec")
    ).withColumn(
        "new_sess",
        F.when(
            F.lag("tsec").over(w).isNull()
            | (F.col("tsec") - F.lag("tsec").over(w) > 1800),
            1,
        ).otherwise(0),
    )
    sess = ordered.withColumn("sid", F.sum("new_sess").over(wcum))
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("depth"),
        (F.max("tsec") - F.min("tsec")).alias("dur_sec"),
    )
    return per_sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(F.avg(F.col("depth").cast("double")), 6).alias("avg_depth"),
        F.round(
            F.sum(F.when(F.col("depth") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
        F.round(F.percentile("dur_sec", F.lit(0.5)), 4).alias(
            "p50_duration_sec"
        ),
        F.max("dur_sec").cast("bigint").alias("max_duration_sec"),
    )


@query(
    "q299_attribution_matrix",
    """
    WITH fl AS (
      SELECT user_id,
             arg_min(event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) * 4194304 + event_id)
               AS first_touch,
             arg_max(event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) * 4194304 + event_id)
               AS last_touch,
             COUNT(*) AS n_events
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    )
    SELECT first_touch, last_touch,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM fl GROUP BY first_touch, last_touch
    """,
)
def q299(spark, sf_dir):
    """First-touch × last-touch ATTRIBUTION MATRIX — the marketing
    question behind every argMin/argMax pair: which entry channel pairs
    with which converting channel.  One aggregate does everything:
    min_by/max_by keyed on a PACKED (epoch-second, event_id) BIGINT
    total order (the q95 exact-tiebreak rule — same-second ties resolve
    by id identically on both engines), then the 25-cell matrix
    with user and event counts.  At 100 TB: one partial-aggregable
    shuffle on user, one on the 5×5 matrix — no windows, no sorts."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # packed total order: epoch-seconds * 2^22 + event_id — one sortable
    # BIGINT (DuckDB 1.0's arg_min can't order by a struct), exact below
    # 2^53 for any realistic id density
    key = F.unix_timestamp("ts") * 4194304 + F.col("event_id")
    fl = ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_touch"),
        F.max_by("event_type", key).alias("last_touch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return fl.groupBy("first_touch", "last_touch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


@query(
    "q300_data_profile",
    """
    SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           round(CAST(COUNT(*) - COUNT(event_id) AS DOUBLE)
                 / COUNT(*), 6) AS null_share
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id),
           round(CAST(COUNT(*) - COUNT(user_id) AS DOUBLE) / COUNT(*), 6)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           COUNT(DISTINCT event_type),
           round(CAST(COUNT(*) - COUNT(event_type) AS DOUBLE) / COUNT(*), 6)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
           COUNT(DISTINCT value),
           round(CAST(COUNT(*) - COUNT(value) AS DOUBLE) / COUNT(*), 6)
    FROM events
    UNION ALL
    SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
           COUNT(DISTINCT props),
           round(CAST(COUNT(*) - COUNT(props) AS DOUBLE) / COUNT(*), 6)
    FROM events
    """,
)
def q300(spark, sf_dir):
    """Column PROFILING scorecard (the ANALYZE TABLE / dbt-test
    staple): per column, row count, null count, exact distinct, null
    share — emitted as one metric row per column.  The Spark side
    computes ALL columns in a single aggregate pass (count + count(col)
    + countDistinct(col) per column are partial-aggregable together)
    and unpivots via stack, so profiling five columns costs ONE scan —
    the property that matters when the table is 100 TB and the naive
    per-column loop would scan five times.  The oracle's per-column
    UNION form is the semantic spec; Spark's fused form must match it
    row for row."""
    ev = _t(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    s = ev.agg(*aggs)
    wide = s.select(
        "_n",
        *[
            (F.col("_n") - F.col(f"nn_{c}")).alias(f"null_{c}")
            for c in cols
        ],
        *[F.col(f"nd_{c}") for c in cols],
    )
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(
            f"'{c}', `null_{c}`, `nd_{c}`" for c in cols
        )
        + ") as (col, n_null, n_distinct)"
    )
    return wide.selectExpr("_n", stack).select(
        "col",
        F.col("_n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.round(
            F.col("n_null").cast("double") / F.col("_n").cast("double"), 6
        ).alias("null_share"),
    )


@query(
    "q301_cuped_adjustment",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS grp,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS x_cents,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS y_cents
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    ), mom AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x_cents AS DOUBLE)) AS sx,
             SUM(CAST(y_cents AS DOUBLE)) AS sy,
             SUM(CAST(x_cents AS DOUBLE) * x_cents) AS sxx,
             SUM(CAST(x_cents AS DOUBLE) * y_cents) AS sxy
      FROM per_user
    ), theta AS (
      SELECT n, sx / n AS mx,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS th
      FROM mom
    )
    SELECT p.grp,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(AVG(CAST(p.y_cents AS DOUBLE)) / 100.0, 6) AS raw_mean,
           round(AVG(CAST(p.y_cents AS DOUBLE)
                     - t.th * (p.x_cents - t.mx)) / 100.0, 6)
             AS cuped_mean,
           round(t.th, 6) AS theta
    FROM per_user p CROSS JOIN theta t
    GROUP BY p.grp, t.th
    """,
)
def q301(spark, sf_dir):
    """CUPED variance reduction — the experimentation-platform
    workhorse: adjust each user's experiment-period metric Y by their
    PRE-period covariate X, Y_adj = Y − θ(X − mean(X)) with
    θ = cov(X,Y)/var(X), which shrinks variance by the squared
    correlation without biasing the treatment contrast (the adjustment
    has zero mean by construction).  Pre/post split at mid-month,
    cohorts by user parity; θ from exact integer cent moments (the q98
    rule — only the final ratios are float), broadcast onto the
    per-user frame, group means read out raw AND adjusted so the
    variance-reduction machinery is fully oracle-pinned."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    cut = F.to_timestamp(F.lit("2024-01-16"))
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0)).alias(
            "x_cents"
        ),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0)).alias(
            "y_cents"
        ),
    ).withColumn("grp", F.col("user_id") % 2)
    xd = F.col("x_cents").cast("double")
    yd = F.col("y_cents").cast("double")
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * F.col("x_cents")).alias("sxx"),
        F.sum(xd * F.col("y_cents")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    theta = mom.select(
        (F.col("sx") / n).alias("mx"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / n)
            / (F.col("sxx") - F.col("sx") * F.col("sx") / n)
        ).alias("th"),
    )
    j = per_user.crossJoin(F.broadcast(theta))
    return j.groupBy("grp", "th").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg(yd) / 100.0, 6).alias("raw_mean"),
        F.round(
            F.avg(yd - F.col("th") * (F.col("x_cents") - F.col("mx")))
            / 100.0,
            6,
        ).alias("cuped_mean"),
    ).select(
        "grp",
        "n_users",
        "raw_mean",
        "cuped_mean",
        F.round("th", 6).alias("theta"),
    )


@query(
    "q302_distribution_drift_jsd",
    """
    WITH wk AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS w,
             event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT w, SUM(c) AS n FROM wk GROUP BY w
    ), p AS (
      SELECT wk.w, wk.event_type,
             CAST(wk.c AS DOUBLE) / tot.n AS p
      FROM wk JOIN tot ON tot.w = wk.w
    ), pairs AS (
      SELECT cur.w, cur.event_type,
             cur.p AS pc, prv.p AS pp
      FROM p cur JOIN p prv
        ON prv.event_type = cur.event_type
       AND prv.w = cur.w - INTERVAL 7 DAY
    )
    SELECT strftime(w, '%Y-%m-%d') AS week,
           round(SUM(
             0.5 * pc * ln(pc / ((pc + pp) / 2))
             + 0.5 * pp * ln(pp / ((pc + pp) / 2))
           ) / ln(2), 6) AS jsd_bits,
           CAST(COUNT(*) AS BIGINT) AS n_categories
    FROM pairs GROUP BY w
    """,
)
def q302(spark, sf_dir):
    """Week-over-week DISTRIBUTION DRIFT via Jensen-Shannon divergence
    — the monitoring alarm for 'did the traffic mix change': per-week
    event-type shares, JSD in bits against the previous week
    (symmetric, bounded [0,1], defined even when a category vanishes —
    though here every type appears weekly, so the pure formula
    applies).  The raw scan collapses to the week×type frame FIRST;
    the self-join shifts by exactly one week on the date key, and the
    divergence sum runs over ≤ 5 categories per week.  Both engines
    evaluate the identical fixed-order ln expression, 6-dp rounded —
    the drift monitor as a query, no sampling, no estimation."""
    ev = _t(spark, sf_dir, "events")
    wk = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = wk.groupBy("w").agg(F.sum("c").alias("n"))
    p = wk.join(tot, "w").select(
        "w",
        "event_type",
        (F.col("c").cast("double") / F.col("n").cast("double")).alias("p"),
    )
    cur = p.select("w", "event_type", F.col("p").alias("pc"))
    prv = p.select(
        F.date_add(F.col("w"), 7).alias("w"),
        "event_type",
        F.col("p").alias("pp"),
    )
    pairs = cur.join(prv, ["w", "event_type"])
    m = (F.col("pc") + F.col("pp")) / 2
    term = 0.5 * F.col("pc") * F.log(F.col("pc") / m) + 0.5 * F.col(
        "pp"
    ) * F.log(F.col("pp") / m)
    import math

    return pairs.groupBy("w").agg(
        F.round(F.sum(term) / math.log(2.0), 6).alias("jsd_bits"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
    ).select(
        F.date_format("w", "yyyy-MM-dd").alias("week"),
        "jsd_bits",
        "n_categories",
    )


@query(
    "q303_population_stability_index",
    """
    WITH ref AS (
      SELECT quantile_cont(value, [0.2, 0.4, 0.6, 0.8]) AS qs
      FROM events
      WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16'
    ), binned AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref'
                  ELSE 'cur' END AS period,
             CASE WHEN value < qs[1] THEN 0
                  WHEN value < qs[2] THEN 1
                  WHEN value < qs[3] THEN 2
                  WHEN value < qs[4] THEN 3
                  ELSE 4 END AS bin
      FROM events CROSS JOIN ref
      WHERE value IS NOT NULL
    ), counts AS (
      SELECT bin,
             SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS nr,
             SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS nc
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT SUM(nr) AS tr, SUM(nc) AS tc FROM counts
    )
    SELECT c.bin,
           round(CAST(c.nr AS DOUBLE) / t.tr, 6) AS ref_share,
           round(CAST(c.nc AS DOUBLE) / t.tc, 6) AS cur_share,
           round((CAST(c.nc AS DOUBLE) / t.tc
                  - CAST(c.nr AS DOUBLE) / t.tr)
                 * ln((CAST(c.nc AS DOUBLE) / t.tc)
                      / (CAST(c.nr AS DOUBLE) / t.tr)), 6)
             AS psi_contrib
    FROM counts c CROSS JOIN tot t
    """,
)
def q303(spark, sf_dir):
    """Population Stability Index — the credit-risk/ML-monitoring drift
    score (PSI < 0.1 stable, > 0.25 act): quintile edges computed on
    the REFERENCE period only (the defining PSI convention — the
    current period is scored against frozen bins), both periods binned
    in one scan with the 4 edges broadcast, per-bin
    (cur−ref)·ln(cur/ref) contributions.  Quintile-by-construction
    reference shares make degenerate (zero) cells impossible on this
    data; the edges are exact interpolated percentiles so both engines
    bin identically."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut = F.to_timestamp(F.lit("2024-01-16"))
    ref = ev.filter(F.col("ts") < cut).agg(
        F.percentile(
            "value", F.array(*[F.lit(x) for x in [0.2, 0.4, 0.6, 0.8]])
        ).alias("qs")
    )
    b = ev.crossJoin(F.broadcast(ref)).select(
        F.when(F.col("ts") < cut, "ref").otherwise("cur").alias("period"),
        F.when(F.col("value") < F.element_at("qs", 1), 0)
        .when(F.col("value") < F.element_at("qs", 2), 1)
        .when(F.col("value") < F.element_at("qs", 3), 2)
        .when(F.col("value") < F.element_at("qs", 4), 3)
        .otherwise(4)
        .alias("bin"),
    )
    counts = b.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("nr"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("nc"),
    )
    tot = counts.agg(F.sum("nr").alias("tr"), F.sum("nc").alias("tc"))
    rs = F.col("nr").cast("double") / F.col("tr").cast("double")
    cs = F.col("nc").cast("double") / F.col("tc").cast("double")
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.round(rs, 6).alias("ref_share"),
        F.round(cs, 6).alias("cur_share"),
        F.round((cs - rs) * F.log(cs / rs), 6).alias("psi_contrib"),
    )


@query(
    "q304_kaplan_meier",
    """
    WITH weeks AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events WHERE user_id IS NOT NULL
    ), spans AS (
      SELECT user_id,
             CAST((epoch(MAX(w)) - epoch(MIN(w))) / 604800 AS BIGINT)
               AS last_off
      FROM weeks GROUP BY user_id
    ), horizon AS (
      SELECT CAST((epoch(MAX(w)) - epoch(MIN(w))) / 604800 AS BIGINT) AS h
      FROM weeks
    ), risk AS (
      SELECT t.off,
             SUM(CASE WHEN s.last_off >= t.off THEN 1 ELSE 0 END)
               AS n_at_risk,
             SUM(CASE WHEN s.last_off = t.off THEN 1 ELSE 0 END)
               AS n_lapsed
      FROM spans s
      CROSS JOIN (SELECT unnest(range(0, 10)) AS off) t
      CROSS JOIN horizon hz
      WHERE t.off < hz.h  -- the final offset is censored, not an event
      GROUP BY t.off
    )
    SELECT off AS week_offset,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_lapsed AS BIGINT) AS n_lapsed,
           round(exp(SUM(CASE WHEN n_lapsed < n_at_risk
                 THEN ln(1.0 - CAST(n_lapsed AS DOUBLE) / n_at_risk)
                 END)
                 OVER (ORDER BY off ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)), 6) AS survival
    FROM risk WHERE n_at_risk > 0
    """,
)
def q304(spark, sf_dir):
    """Kaplan-Meier retention curve — survival analysis as a query:
    'still active after k weeks' with the last observed week treated
    as the lapse event and the observation horizon as censoring (users
    last seen in the final week are censored, not churned — the
    distinction KM exists for).  The product-limit estimator
    S(k) = Π(1 − d_i/n_i) computes as exp of a RUNNING SUM of logs
    (the windowed form of an ordered product), over a ≤10-row
    risk-table frame; the raw data contributes one distinct
    (user, week) shuffle and a per-user span aggregate.  Lifetimes are
    integer week offsets, so both engines build identical risk sets."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    epoch_w = F.unix_timestamp(F.col("w").cast("timestamp"))
    spans = weeks.groupBy("user_id").agg(
        ((F.max(epoch_w) - F.min(epoch_w)) / 604800)
        .cast("bigint")
        .alias("last_off")
    )
    horizon = weeks.agg(
        ((F.max(epoch_w) - F.min(epoch_w)) / 604800)
        .cast("bigint")
        .alias("h")
    )
    offs = spark.range(0, 10).select(F.col("id").alias("off"))
    risk = (
        spans.crossJoin(F.broadcast(offs))
        .crossJoin(F.broadcast(horizon))
        .filter(F.col("off") < F.col("h"))
        .groupBy("off")
        .agg(
            F.sum(
                F.when(F.col("last_off") >= F.col("off"), 1).otherwise(0)
            ).alias("n_at_risk"),
            F.sum(
                F.when(F.col("last_off") == F.col("off"), 1).otherwise(0)
            ).alias("n_lapsed"),
        )
        .filter(F.col("n_at_risk") > 0)
    )
    wcum = Window.orderBy("off").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = F.when(
        F.col("n_lapsed") < F.col("n_at_risk"),
        F.log(
            1.0
            - F.col("n_lapsed").cast("double")
            / F.col("n_at_risk").cast("double")
        ),
    )  # d == n would be ln(0): NULLed symmetrically (SUM skips NULLs
    # identically on both engines); fixture curves never hit it
    surv = F.exp(F.sum(term).over(wcum))
    return risk.select(
        F.col("off").alias("week_offset"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("n_lapsed").cast("bigint").alias("n_lapsed"),
        F.round(surv, 6).alias("survival"),
    )


@query(
    "q305_rfm_segmentation",
    """
    WITH cust AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS m
      FROM cust
    )
    SELECT CAST(r AS INT) || CAST(f AS INT) || CAST(m AS INT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1
    ORDER BY n_customers DESC, segment
    LIMIT 25
    """,
)
def q305(spark, sf_dir):
    """RFM segmentation — the CRM classic: every customer scored 1-5 on
    Recency (latest order first), Frequency, and Monetary value via
    ntile(5), concatenated into the familiar '111'-is-best segment
    code, top segments by population.  The three ntiles share one
    customer-level frame (a single aggregate over orders with exact
    cent money); every ORDER BY carries the customer-key tiebreak so
    ntile boundaries — which split ties by position — land identically
    on both engines.  Top-25 with a total order."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint").cast(
        "decimal(38,0)"
    )
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(cents).alias("cents"),
    )
    wr = Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    wf = Window.orderBy(F.col("freq").desc(), F.col("o_custkey"))
    wm = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    scored = cust.select(
        "o_custkey",
        F.ntile(5).over(wr).alias("r"),
        F.ntile(5).over(wf).alias("f"),
        F.ntile(5).over(wm).alias("m"),
    )
    seg = F.concat(
        F.col("r").cast("string"),
        F.col("f").cast("string"),
        F.col("m").cast("string"),
    )
    return (
        scored.select(seg.alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), "segment")
        .limit(25)
    )


@query(
    "q306_l_moments",
    """
    WITH ranked AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS xc,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY value, event_id) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ), b AS (
      SELECT event_type, MAX(n) AS n,
             SUM(CAST(xc AS DOUBLE)) / MAX(n) AS b0,
             SUM(CAST(xc AS DOUBLE) * (i - 1) / (n - 1.0)) / MAX(n) AS b1,
             SUM(CAST(xc AS DOUBLE) * (i - 1) * (i - 2)
                 / ((n - 1.0) * (n - 2.0))) / MAX(n) AS b2
      FROM ranked GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round(b0 / 100.0, 6) AS l1_mean,
           round((2 * b1 - b0) / 100.0, 6) AS l2_scale,
           round((2 * b1 - b0) / b0, 6) AS l_cv,
           round((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0), 6) AS l_skewness
    FROM b
    """,
)
def q306(spark, sf_dir):
    """L-moments — the order-statistics alternative to q98's
    conventional moments (L-scale and L-skewness exist whenever the
    MEAN exists and are far less outlier-brittle than variance and
    skewness; hydrology/insurance's standard distribution-fitting
    inputs): the unbiased b-moment estimators b0/b1/b2 are
    RANK-WEIGHTED sums over the sorted sample, so one window rank per
    group (value with an id tiebreak — ties get distinct ranks, which
    is exactly what the estimator's combinatorial weights require)
    feeds a single aggregate; λ2 = 2b1−b0, τ3 = λ3/λ2.  Cent-quantized
    integer values keep the weighted sums' magnitudes tame; 6-dp
    rounding absorbs the float weight products."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wall = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("xc"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    xd = F.col("xc").cast("double")
    nr = F.col("n").cast("double")  # per-row constant within the group
    b = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (F.sum(xd) / F.max("n")).alias("b0_raw"),
        (
            F.sum(xd * (F.col("i") - 1) / (nr - 1.0)) / F.max("n")
        ).alias("b1_raw"),
        (
            F.sum(
                xd
                * (F.col("i") - 1)
                * (F.col("i") - 2)
                / ((nr - 1.0) * (nr - 2.0))
            )
            / F.max("n")
        ).alias("b2_raw"),
    )
    b0, b1, b2 = F.col("b0_raw"), F.col("b1_raw"), F.col("b2_raw")
    return b.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(b0 / 100.0, 6).alias("l1_mean"),
        F.round((2 * b1 - b0) / 100.0, 6).alias("l2_scale"),
        F.round((2 * b1 - b0) / b0, 6).alias("l_cv"),
        F.round((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0), 6).alias(
            "l_skewness"
        ),
    )


@query(
    "q307_cross_correlation_lag",
    """
    WITH hrs AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ), bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM hrs
    ), grid AS (
      SELECT CAST((epoch(gs.h) - epoch(b.h0)) / 3600 AS BIGINT) AS idx,
             gs.h
      FROM bounds b, LATERAL (
        SELECT unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
      ) gs
    ), x AS (
      SELECT g.idx, CAST(COALESCE(hrs.c, 0) AS DOUBLE) AS v
      FROM grid g LEFT JOIN hrs
        ON hrs.h = g.h AND hrs.event_type = 'click'
    ), y AS (
      SELECT g.idx, CAST(COALESCE(hrs.c, 0) AS DOUBLE) AS v
      FROM grid g LEFT JOIN hrs
        ON hrs.h = g.h AND hrs.event_type = 'purchase'
    ), sx AS (
      SELECT AVG(v) AS mu, COUNT(*) AS n,
             SUM(v * v) - COUNT(*) * AVG(v) * AVG(v) AS ss
      FROM x
    ), sy AS (
      SELECT AVG(v) AS mu,
             SUM(v * v) - COUNT(*) * AVG(v) * AVG(v) AS ss
      FROM y
    ), cc AS (
      SELECT l.lag,
             SUM((x.v - sx.mu) * (y.v - sy.mu))
               / sqrt(sx.ss * sy.ss) AS r
      FROM x
      JOIN (SELECT unnest(range(-12, 13)) AS lag) l ON TRUE
      JOIN y ON y.idx = x.idx + l.lag
      CROSS JOIN sx CROSS JOIN sy
      GROUP BY l.lag, sx.ss, sy.ss
    )
    SELECT CAST(lag AS BIGINT) AS best_lag, round(r, 6) AS best_r
    FROM (SELECT *, row_number() OVER (
            ORDER BY round(r, 6) DESC, lag) AS rn FROM cc)
    WHERE rn = 1
    """,
)
def q307(spark, sf_dir):
    """CROSS-correlation lead-lag detection — 'do purchases follow
    clicks, and by how many hours': the two gap-filled hourly series
    (q248's grid machinery), normalized cross-correlation at lags
    −12..+12, argmax with the 6-dp-round-before-rank rule.  Same scale
    posture as the autocorrelation: one raw shuffle into the hourly
    aggregate, then a 25-lag fan-out over the ~720-point series with
    the global moments broadcast — the lead-lag scan costs arithmetic
    on |hours|·|lags| tiny rows regardless of raw volume."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    hrs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    bounds = hrs.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        "h0",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    ).select(
        ((F.unix_timestamp("h") - F.unix_timestamp("h0")) / 3600)
        .cast("bigint")
        .alias("idx"),
        "h",
    )

    def series(t):
        return grid.join(
            hrs.filter(F.col("event_type") == t), ["h"], "left"
        ).select(
            "idx", F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("v")
        )

    x, y = series("click"), series("purchase")
    sx = x.agg(
        F.avg("v").alias("mux"),
        (
            F.sum(F.col("v") * F.col("v"))
            - F.count(F.lit(1)) * F.avg("v") * F.avg("v")
        ).alias("ssx"),
    )
    sy = y.agg(
        F.avg("v").alias("muy"),
        (
            F.sum(F.col("v") * F.col("v"))
            - F.count(F.lit(1)) * F.avg("v") * F.avg("v")
        ).alias("ssy"),
    )
    lags = spark.range(-12, 13).select(F.col("id").alias("lag"))
    y2 = y.select(F.col("idx").alias("idy"), F.col("v").alias("vy"))
    cc = (
        x.crossJoin(F.broadcast(lags))
        .join(y2, F.col("idy") == F.col("idx") + F.col("lag"))
        .crossJoin(F.broadcast(sx))
        .crossJoin(F.broadcast(sy))
        .groupBy("lag", "ssx", "ssy")
        .agg(
            F.sum(
                (F.col("v") - F.col("mux")) * (F.col("vy") - F.col("muy"))
            ).alias("num")
        )
        .select(
            "lag",
            (F.col("num") / F.sqrt(F.col("ssx") * F.col("ssy"))).alias("r"),
        )
    )
    wr = Window.orderBy(F.round(F.col("r"), 6).desc(), F.col("lag"))
    return (
        cc.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("lag").cast("bigint").alias("best_lag"),
            F.round("r", 6).alias("best_r"),
        )
    )


@query(
    "q308_seasonality_profile",
    """
    WITH cells AS (
      SELECT CAST(extract(isodow FROM ts) AS INT) AS dow,
             CAST(extract(hour FROM ts) AS INT) AS hr,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT SUM(c) AS n FROM cells
    )
    SELECT dow, hr,
           CAST(c AS BIGINT) AS n_events,
           round(CAST(c AS DOUBLE) * 168.0 / t.n, 6) AS seasonality_index
    FROM cells CROSS JOIN tot t
    """,
)
def q308(spark, sf_dir):
    """Hour-of-day × day-of-week SEASONALITY PROFILE — the heatmap
    behind capacity planning: counts per (ISO weekday, hour) cell and
    the seasonality INDEX (cell share × 168 — 1.0 means a perfectly
    flat week, 2.0 means double the average load).  One shuffle to 168
    cells; the index arithmetic is on the tiny frame.  ISO weekday
    (Monday=1) is the cross-engine pitfall here — Spark's dayofweek()
    is Sunday=1, so the Spark side derives ISO dow from date_format 'u'
    semantics via weekday()+1 to match DuckDB's extract(isodow)."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = cells.agg(F.sum("c").alias("n"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hr",
        F.col("c").cast("bigint").alias("n_events"),
        F.round(
            F.col("c").cast("double") * 168.0 / F.col("n").cast("double"), 6
        ).alias("seasonality_index"),
    )


@query(
    "q309_price_elasticity",
    """
    WITH obs AS (
      SELECT split_part(p.p_type, ' ', 1) AS segment,
             ln(CAST(l.l_quantity AS DOUBLE)) AS y,
             ln(CAST(l.l_extendedprice AS DOUBLE)
                / CAST(l.l_quantity AS DOUBLE)) AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ), s AS (
      SELECT segment, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM obs GROUP BY segment
    )
    SELECT segment, CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
             AS elasticity,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 4) AS intercept
    FROM s
    """,
)
def q309(spark, sf_dir):
    """Price ELASTICITY by product segment — the pricing-analytics
    staple: log-log OLS of quantity on unit price (elasticity is the
    slope, directly), per p_type segment with the part dim broadcast
    onto the fact scan.  The q196 closed-form-sums shape: one shuffle
    to 6 partial-aggregable sums per segment, slope/intercept as
    fixed-order float epilogues.  ln-magnitude sums over ~100 k terms
    round at 4 dp (wider than the stats family's 6 — the sums reach
    ~1e6, so the last two decimals of a 6-dp round would sit inside
    float-accumulation noise; 4 dp is the honest precision)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    p = _t(spark, sf_dir, "part")
    obs = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("segment"),
        F.log(F.col("l_quantity").cast("double")).alias("y"),
        F.log(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("x"),
    )
    s = obs.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "segment",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 4).alias("elasticity"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 4).alias(
            "intercept"
        ),
    )


@query(
    "q310_doc_entropy",
    """
    WITH tok AS (
      SELECT doc_id, lower(t.w) AS w
      FROM documents d, LATERAL (
        SELECT unnest(string_split(d.text, ' ')) AS w) t
      WHERE t.w != ''
    ), wc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
    ), dn AS (
      SELECT doc_id, SUM(c) AS n FROM wc GROUP BY doc_id
    ), ent AS (
      SELECT wc.doc_id,
             -SUM((CAST(wc.c AS DOUBLE) / dn.n)
                  * ln(CAST(wc.c AS DOUBLE) / dn.n)) / ln(2) AS h
      FROM wc JOIN dn ON dn.doc_id = wc.doc_id
      GROUP BY wc.doc_id
    )
    SELECT CAST(floor(h) AS INT) AS entropy_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(MIN(h), 6) AS min_entropy,
           round(MAX(h), 6) AS max_entropy
    FROM ent GROUP BY CAST(floor(h) AS INT)
    """,
)
def q310(spark, sf_dir):
    """Per-document TOKEN ENTROPY — the lexical-diversity quality
    signal (near-zero bits: 'buy buy buy' spam; high bits: diverse
    vocabulary) that complements q220's repetition fractions and q44's
    surface ratios: per-doc word distribution → Shannon entropy in
    bits → documents bucketed by whole-bit entropy with per-bucket
    extremes.  Shape: explode → (doc, word) counts → per-doc totals
    re-aggregated FROM the counts (no second raw scan) → an ≤ ~20-term
    entropy sum per doc.  Per-doc sums are few-term and the bucket
    boundary is floor-of-bits, so float order can't move a doc across
    buckets unless its entropy sits within 1e-12 of an integer —
    absent in the fixtures at every scale."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select("doc_id", F.lower("w").alias("w"))
    )
    wc = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    dn = wc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    import math

    ent = (
        wc.join(dn, "doc_id")
        .groupBy("doc_id")
        .agg((-F.sum(p * F.log(p)) / math.log(2.0)).alias("h"))
    )
    return ent.groupBy(
        F.floor("h").cast("int").alias("entropy_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.min("h"), 6).alias("min_entropy"),
        F.round(F.max("h"), 6).alias("max_entropy"),
    )


@query(
    "q311_two_proportion_ztest",
    """
    WITH conv AS (
      SELECT user_id, user_id % 2 AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value > 250
                      THEN 1 ELSE 0 END) AS converted
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    ), s AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               AS n0,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN converted ELSE 0 END)
               AS DOUBLE) AS c0,
             CAST(SUM(CASE WHEN grp = 1 THEN converted ELSE 0 END)
               AS DOUBLE) AS c1
      FROM conv
    )
    SELECT CAST(n0 AS BIGINT) AS n_a,
           CAST(n1 AS BIGINT) AS n_b,
           round(c0 / n0, 6) AS rate_a,
           round(c1 / n1, 6) AS rate_b,
           round((c0 / n0 - c1 / n1)
                 / sqrt(NULLIF(((c0 + c1) / (n0 + n1))
                        * (1 - (c0 + c1) / (n0 + n1))
                        * (1 / n0 + 1 / n1), 0)), 6) AS z_stat
    FROM s
    """,
)
def q311(spark, sf_dir):
    """Two-proportion z-test — the conversion-rate A/B readout
    (the categorical sibling of q253's mean z-test and the inferential
    closure of q249's sample-size planner): per-user conversion flags
    (MAX over the purchase indicator — one scan), cohorts by parity,
    pooled-proportion z in one fixed-order expression.  Four exact
    integer counts are the only data-dependent aggregates; both
    engines evaluate the identical pooled-variance formula to 6 dp."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    conv = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 250),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).withColumn("grp", F.col("user_id") % 2)
    s = conv.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("double")
        .alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0))
        .cast("double")
        .alias("c0"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0))
        .cast("double")
        .alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0")
    p1 = F.col("c1") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    # NULLIF degenerate guard (pp in {0,1}) — symmetric on both engines
    z = (p0 - p1) / F.sqrt(
        F.nullif(
            pp * (1 - pp) * (1 / F.col("n0") + 1 / F.col("n1")), F.lit(0.0)
        )
    )
    return s.select(
        F.col("n0").cast("bigint").alias("n_a"),
        F.col("n1").cast("bigint").alias("n_b"),
        F.round(p0, 6).alias("rate_a"),
        F.round(p1, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


@query(
    "q312_repeat_purchase_latency",
    """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               lag(o_orderdate) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_days
      FROM orders
    ), per_cust AS (
      SELECT o_custkey, COUNT(gap_days) AS n_repeats,
             AVG(CAST(gap_days AS DOUBLE)) AS mean_gap
      FROM gaps WHERE gap_days IS NOT NULL
      GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
           round(AVG(mean_gap), 6) AS avg_mean_gap_days,
           round(quantile_cont(mean_gap, 0.5), 4) AS p50_mean_gap_days,
           CAST(SUM(CASE WHEN mean_gap <= 30 THEN 1 ELSE 0 END)
             AS BIGINT) AS monthly_or_faster
    FROM per_cust
    """,
)
def q312(spark, sf_dir):
    """Repeat-purchase latency — the replenishment-cycle metric behind
    subscription and CRM forecasting: per customer, the gaps between
    consecutive order dates (one lag pass, orderkey tiebreak for
    same-day orders), each customer's mean cycle, then the population
    view (how many repeat customers, typical cycle, share on a
    ~monthly cadence).  Date subtraction yields exact integer days on
    both engines (DuckDB DATE−DATE and Spark datediff agree);
    only the interpolated median carries the 4-dp rule."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count("gap_days").alias("n_repeats"),
        F.avg(F.col("gap_days").cast("double")).alias("mean_gap"),
    )
    return per_cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_repeat_customers"),
        F.round(F.avg("mean_gap"), 6).alias("avg_mean_gap_days"),
        F.round(F.percentile("mean_gap", F.lit(0.5)), 4).alias(
            "p50_mean_gap_days"
        ),
        F.sum(F.when(F.col("mean_gap") <= 30, 1).otherwise(0))
        .cast("bigint")
        .alias("monthly_or_faster"),
    )


@query(
    "q313_hhi_concentration",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(round(o.o_totalprice * 100) AS HUGEINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    ), tot AS (
      SELECT region, SUM(cents) AS t FROM rev GROUP BY region
    )
    SELECT rev.region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           round(SUM((CAST(rev.cents AS DOUBLE) / tot.t)
                     * (CAST(rev.cents AS DOUBLE) / tot.t)), 6) AS hhi,
           round(1.0 / SUM((CAST(rev.cents AS DOUBLE) / tot.t)
                     * (CAST(rev.cents AS DOUBLE) / tot.t)), 6)
             AS effective_nations
    FROM rev JOIN tot ON tot.region = rev.region
    GROUP BY rev.region
    """,
)
def q313(spark, sf_dir):
    """Herfindahl-Hirschman concentration index per region — the
    antitrust/market-structure measure completing the inequality trio
    (q296 Gini, q290 Pareto): HHI = Σ share², and its reciprocal, the
    'effective number of competitors'.  Shares come from exact integer
    cent revenue (region totals re-aggregated FROM the 25-row
    nation-level frame, no second fact scan); the squared-share sum
    runs over ≤ 5 terms per region so float order is irrelevant at
    6 dp.  One fact aggregate with all dims broadcast — the q289
    hierarchy-shares shape with a different epilogue."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint").cast(
        "decimal(38,0)"
    )
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(cents).alias("cents"))
    )
    tot = rev.groupBy("region").agg(F.sum("cents").alias("t"))
    share = F.col("cents").cast("double") / F.col("t").cast("double")
    return (
        rev.join(F.broadcast(tot), "region")
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.round(F.sum(share * share), 6).alias("hhi"),
            F.round(1.0 / F.sum(share * share), 6).alias(
                "effective_nations"
            ),
        )
    )


@query(
    "q314_order_consistency_audit",
    """
    WITH line_side AS (
      SELECT l_orderkey,
             SUM(CAST(round(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) * 100) AS HUGEINT)) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    ), joined AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS HUGEINT) AS order_cents,
             ls.line_cents,
             abs(CAST(round(o.o_totalprice * 100) AS HUGEINT)
                 - ls.line_cents) AS diff_cents
      FROM orders o JOIN line_side ls ON ls.l_orderkey = o.o_orderkey
    )
    SELECT CASE WHEN diff_cents = 0 THEN 'exact'
                WHEN diff_cents <= 5 THEN 'rounding'
                ELSE 'mismatch' END AS consistency,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(diff_cents) AS BIGINT) AS max_diff_cents
    FROM joined GROUP BY 1
    """,
)
def q314(spark, sf_dir):
    """Referential-CONSISTENCY audit — does every order header's total
    equal its lines' Σ extendedprice·(1−discount)·(1+tax)?  The
    cross-table invariant check every warehouse runs after a load:
    both sides quantized to exact integer cents BEFORE comparison
    (per-line rounding then exact integer sums — float equality never
    enters), orders bucketed into exact / rounding-noise (≤5¢) /
    genuine mismatch with the worst offset reported.  One fact
    aggregate + one key join; whatever the fixture's generator
    actually guarantees, both engines must bucket it identically —
    the audit is the machinery, the verdict is data."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    line_cents = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("bigint").cast("decimal(38,0)")
    ls = li.groupBy("l_orderkey").agg(
        F.sum(line_cents).alias("line_cents")
    )
    order_cents = F.round(F.col("o_totalprice") * 100).cast("bigint").cast(
        "decimal(38,0)"
    )
    j = o.select("o_orderkey", order_cents.alias("order_cents")).join(
        ls, o["o_orderkey"] == ls["l_orderkey"]
    )
    diff = F.abs(F.col("order_cents") - F.col("line_cents"))
    bucket = (
        F.when(diff == 0, "exact")
        .when(diff <= 5, "rounding")
        .otherwise("mismatch")
    )
    return j.select(bucket.alias("consistency"), diff.alias("d")).groupBy(
        "consistency"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.max("d").cast("bigint").alias("max_diff_cents"),
    )


@query(
    "q315_seasonal_anomaly_flags",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(extract(isodow FROM ts) AS INT) AS dow,
             CAST(extract(hour FROM ts) AS INT) AS hr,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ), base AS (
      SELECT dow, hr,
             AVG(CAST(c AS DOUBLE)) AS mu,
             STDDEV_SAMP(CAST(c AS DOUBLE)) AS sd,
             COUNT(*) AS n_obs
      FROM hourly GROUP BY dow, hr
    )
    SELECT strftime(h.h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(h.c AS BIGINT) AS n_events,
           round(b.mu, 6) AS baseline_mu,
           round((h.c - b.mu) / b.sd, 6) AS z
    FROM hourly h JOIN base b ON b.dow = h.dow AND b.hr = h.hr
    WHERE b.n_obs >= 3 AND b.sd > 0
      AND abs((h.c - b.mu) / b.sd) > 2.5
    ORDER BY hour
    """,
)
def q315(spark, sf_dir):
    """SEASONAL anomaly detection — the alerting rule a plain global
    z-score gets wrong (3 AM traffic is 'anomalously high' only vs
    other 3 AMs): each hour scored against its OWN hour-of-week cell's
    baseline (the q308 profile as μ/σ), cells with <3 observations or
    zero variance excluded, |z| > 2.5 flagged.  Two aggregates of the
    same hourly frame (raw scan once), baseline broadcast back — the
    shape that turns 100 TB of history into a 168-row alerting model
    refreshed by one query.  z rounds at 6 dp on exact-count inputs."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"),
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    base = hourly.groupBy("dow", "hr").agg(
        F.avg(F.col("c").cast("double")).alias("mu"),
        F.stddev_samp(F.col("c").cast("double")).alias("sd"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    j = hourly.join(F.broadcast(base), ["dow", "hr"])
    z = (F.col("c") - F.col("mu")) / F.col("sd")
    return (
        j.filter(
            (F.col("n_obs") >= 3) & (F.col("sd") > 0) & (F.abs(z) > 2.5)
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("c").cast("bigint").alias("n_events"),
            F.round("mu", 6).alias("baseline_mu"),
            F.round(z, 6).alias("z"),
        )
        .orderBy("hour")
    )


@query(
    "q316_segment_overlap_matrix",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL
    ), sizes AS (
      SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
    ), inter AS (
      SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS i
      FROM ut a JOIN ut b
        ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT it.ta, it.tb,
           CAST(it.i AS BIGINT) AS n_overlap,
           round(CAST(it.i AS DOUBLE) / (sa.n + sb.n - it.i), 6)
             AS jaccard,
           round(CAST(it.i AS DOUBLE)
                 / (CASE WHEN sa.n < sb.n THEN sa.n ELSE sb.n END), 6)
             AS overlap_coef
    FROM inter it
    JOIN sizes sa ON sa.event_type = it.ta
    JOIN sizes sb ON sb.event_type = it.tb
    """,
)
def q316(spark, sf_dir):
    """Audience SEGMENT-OVERLAP matrix — Jaccard and Szymkiewicz-
    Simpson overlap between every pair of behavioral segments (users
    who click vs users who purchase...): the audience-planning
    question 'are these the same people'.  Same bounded-fan-out shape
    as q292's lift (per-user join width ≤ |types|²) but SET-similarity
    semantics: exact intersection counts, union by
    inclusion-exclusion, overlap coefficient against the smaller set.
    Segment sizes broadcast onto the 10-pair frame; this is the EXACT
    ground truth the q244 theta sketches estimate — the two queries
    bracket the accuracy-vs-state trade."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select("user_id", F.col("event_type").alias("tb"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))
    idd = F.col("i").cast("double")
    return (
        inter.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            "ta",
            "tb",
            F.col("i").cast("bigint").alias("n_overlap"),
            F.round(
                idd / (F.col("na") + F.col("nb") - F.col("i")), 6
            ).alias("jaccard"),
            F.round(idd / F.least("na", "nb"), 6).alias("overlap_coef"),
        )
    )


@query(
    "q317_double_fire_audit",
    """
    WITH seq AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(gap) AS BIGINT) AS n_consecutive,
           CAST(SUM(CASE WHEN gap <= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_double_fires,
           round(CAST(SUM(CASE WHEN gap <= 5 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(gap), 6) AS double_fire_share
    FROM seq WHERE gap IS NOT NULL
    GROUP BY event_type
    """,
)
def q317(spark, sf_dir):
    """Instrumentation DOUBLE-FIRE audit — the telemetry-QA check for
    client retry bugs and duplicate beacons: consecutive same-user
    same-type events within 5 seconds, counted and shared per type.
    One lag window partitioned by (user, type) — a narrower
    partitioning than the session/path queries, same single-shuffle
    shape — then a conditional aggregate.  Distinct from q65's
    streaming exact dedup (identical events) and q294's inter-arrival
    stats (all gaps): this flags the NEAR-duplicate rapid-fire band
    that exact dedup misses and rate stats average away."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    tsec = F.unix_timestamp("ts")
    seq = ev.select(
        "event_type", (tsec - F.lag(tsec).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    dbl = F.sum(F.when(F.col("gap") <= 5, 1).otherwise(0))
    return seq.groupBy("event_type").agg(
        F.count("gap").cast("bigint").alias("n_consecutive"),
        dbl.cast("bigint").alias("n_double_fires"),
        F.round(dbl.cast("double") / F.count("gap"), 6).alias(
            "double_fire_share"
        ),
    )


@query(
    "q318_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events WHERE user_id IS NOT NULL
    ), trans AS (
      SELECT cur, nxt, COUNT(*) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), outdeg AS (
      SELECT cur, SUM(c) AS n FROM trans GROUP BY cur
    )
    SELECT t.cur, t.nxt,
           CAST(t.c AS BIGINT) AS n_transitions,
           round(CAST(t.c AS DOUBLE) / o.n, 6) AS p
    FROM trans t JOIN outdeg o ON o.cur = t.cur
    """,
)
def q318(spark, sf_dir):
    """First-order MARKOV transition matrix over event types —
    P(next | current) per user journey, the quantitative core of the
    q265 path analysis and the input every Sankey diagram and
    next-action model starts from: one lead() pass per user, the 25
    transition counts, row-normalized by out-degree (re-aggregated
    from the transition frame — no second scan).  Exact integer counts
    make each probability a single float division; rows where a user's
    stream ends (no successor) are excluded from the denominator, the
    standard convention."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    outdeg = trans.groupBy("cur").agg(F.sum("c").alias("n"))
    return trans.join(F.broadcast(outdeg), "cur").select(
        "cur",
        "nxt",
        F.col("c").cast("bigint").alias("n_transitions"),
        F.round(
            F.col("c").cast("double") / F.col("n").cast("double"), 6
        ).alias("p"),
    )


@query(
    "q319_stickiness_dau_wau",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1, 2
    ), dau AS (
      SELECT day, COUNT(*) AS dau FROM daily GROUP BY day
    ), wau AS (
      SELECT d.day, COUNT(DISTINCT a.user_id) AS wau
      FROM dau d JOIN daily a
        ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT strftime(dau.day, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """,
)
def q319(spark, sf_dir):
    """STICKINESS (DAU / trailing-7-day WAU) — the engagement-quality
    ratio plain DAU hides (growing DAU with falling stickiness means a
    widening but shallower audience): distinct (user, day) pairs once
    (the only raw-data shuffle), DAU per day, WAU per day via a 7-day
    range join over the user-day frame with a per-window exact
    distinct.  At 100 TB the user-day frame is the compressed currency
    — everything after the first aggregate is proportional to users ×
    days, not events.  Exact integer counts; one float division."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    daily = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    anchor = dau.select(F.col("day").alias("aday"), "dau")
    wau = (
        anchor.join(
            daily,
            (F.col("day") >= F.date_sub(F.col("aday"), 6))
            & (F.col("day") <= F.col("aday")),
        )
        .groupBy("aday", "dau")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return wau.select(
        F.date_format("aday", "yyyy-MM-dd").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 6
        ).alias("stickiness"),
    )


@query(
    "q320_power_user_tiers",
    """
    WITH act AS (
      SELECT user_id, COUNT(*) AS c,
             SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS rev_cents
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), cuts AS (
      SELECT quantile_cont(c, [0.5, 0.9, 0.99]) AS q FROM act
    ), tiered AS (
      SELECT a.user_id, a.c, a.rev_cents,
             CASE WHEN a.c >= q[3] THEN 'p99_power'
                  WHEN a.c >= q[2] THEN 'p90_heavy'
                  WHEN a.c >= q[1] THEN 'p50_regular'
                  ELSE 'casual' END AS tier
      FROM act a CROSS JOIN cuts
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(SUM(rev_cents) AS DOUBLE) / 100.0 AS revenue,
           round(CAST(SUM(c) AS DOUBLE)
                 / (SELECT SUM(c) FROM act), 6) AS event_share
    FROM tiered GROUP BY tier
    """,
)
def q320(spark, sf_dir):
    """POWER-USER tiers — the 'casual / regular / heavy / p99 power'
    segmentation every engagement dashboard leads with: per-user
    activity counts, tier cuts at the EXACT interpolated P50/P90/P99
    of the user distribution (broadcast — three numbers), then
    per-tier population, event share, and purchase revenue (exact
    cents).  Tier boundaries compare exact counts against
    identically-derived percentiles, so both engines cut the
    population at the same users; one raw shuffle, everything after is
    user-frame arithmetic."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    cents = F.round(F.col("value") * 100).cast("bigint")
    act = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        ).alias("rev_cents"),
    )
    cuts = act.agg(
        F.percentile(
            "c", F.array(*[F.lit(x) for x in [0.5, 0.9, 0.99]])
        ).alias("q")
    )
    tot = act.agg(F.sum("c").alias("tot_events"))
    tier = (
        F.when(F.col("c") >= F.element_at("q", 3), "p99_power")
        .when(F.col("c") >= F.element_at("q", 2), "p90_heavy")
        .when(F.col("c") >= F.element_at("q", 1), "p50_regular")
        .otherwise("casual")
    )
    return (
        act.crossJoin(F.broadcast(cuts))
        .select(tier.alias("tier"), "c", "rev_cents")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("n_events"),
            (F.sum("rev_cents").cast("double") / 100.0).alias("revenue"),
            F.sum("c").alias("_se"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tier",
            "n_users",
            "n_events",
            "revenue",
            F.round(
                F.col("_se").cast("double")
                / F.col("tot_events").cast("double"),
                6,
            ).alias("event_share"),
        )
    )


@query(
    "q321_multi_touch_attribution",
    """
    WITH purch AS (
      SELECT user_id, ts AS p_ts, event_id AS p_id
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), touches AS (
      SELECT e.user_id, e.event_type,
             p.p_id,
             CAST(floor(epoch(p.p_ts)) AS BIGINT)
               - CAST(floor(epoch(e.ts)) AS BIGINT) AS age_sec
      FROM events e JOIN purch p
        ON p.user_id = e.user_id
       AND e.ts < p.p_ts
       AND e.ts >= p.p_ts - INTERVAL 24 HOUR
      WHERE e.event_type IN ('view', 'click')
    ), weighted AS (
      SELECT event_type, p_id,
             1.0 / COUNT(*) OVER (PARTITION BY p_id) AS linear_w,
             exp(-age_sec / 21600.0)
               / SUM(exp(-age_sec / 21600.0)) OVER (PARTITION BY p_id)
               AS decay_w
      FROM touches
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           round(SUM(linear_w), 4) AS linear_credit,
           round(SUM(decay_w), 4) AS time_decay_credit
    FROM weighted GROUP BY event_type
    """,
)
def q321(spark, sf_dir):
    """MULTI-TOUCH attribution — the fractional-credit models between
    q299's first/last-touch extremes: every view/click in the 24 h
    before a purchase shares that conversion's credit, LINEARLY
    (1/touches) and TIME-DECAYED (exp(−age/6 h), normalized per
    conversion so every purchase distributes exactly 1.0 credit).  The
    touch join is user-keyed with a bounded time range (per-user
    fan-out ≤ touches-per-day × purchases); both weights are window
    normalizations over the per-conversion partition.  Credit sums
    round at 4 dp — per-conversion weights are few-term, but the final
    per-channel sums accumulate thousands of float terms whose
    ordering differs across engines, and 4 dp is where that noise
    provably cannot reach (verified at every fixture scale)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", "ts"
    )
    touches = t.join(purch, "user_id").filter(
        (F.col("ts") < F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
    ).select(
        "event_type",
        "p_id",
        (
            F.unix_timestamp("p_ts") - F.unix_timestamp("ts")
        ).alias("age_sec"),
    )
    wp = Window.partitionBy("p_id")
    decay = F.exp(-F.col("age_sec") / 21600.0)
    weighted = touches.select(
        "event_type",
        (F.lit(1.0) / F.count(F.lit(1)).over(wp)).alias("linear_w"),
        (decay / F.sum(decay).over(wp)).alias("decay_w"),
    )
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.round(F.sum("linear_w"), 4).alias("linear_credit"),
        F.round(F.sum("decay_w"), 4).alias("time_decay_credit"),
    )


@query(
    "q322_order_backlog",
    """
    WITH spans AS (
      SELECT o.o_orderkey, o.o_orderdate AS placed,
             MAX(l.l_shipdate) AS last_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ), cks AS (
      SELECT unnest([DATE '1993-01-01', DATE '1994-01-01',
                     DATE '1995-01-01', DATE '1996-01-01',
                     DATE '1997-01-01', DATE '1998-01-01']) AS ck
    )
    SELECT strftime(c.ck, '%Y-%m-%d') AS checkpoint,
           CAST(SUM(CASE WHEN s.placed <= c.ck AND s.last_ship > c.ck
                    THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
           CAST(SUM(CASE WHEN s.placed <= c.ck THEN 1 ELSE 0 END)
             AS BIGINT) AS placed_to_date
    FROM cks c CROSS JOIN spans s
    GROUP BY c.ck
    """,
)
def q322(spark, sf_dir):
    """Order BACKLOG over time — work-in-progress accounting: an order
    is open from placement until its LAST line ships (one
    fact aggregate builds the span table), and each year-end
    checkpoint counts orders whose span covers it.  Six checkpoints
    broadcast against the span frame — the interval-cardinality
    question q174's sweep line answers continuously, here at audit
    dates, with cumulative placements alongside for context.  Date
    comparisons on exact DATE types; integer counts only."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(o["o_orderkey"], F.col("o_orderdate").alias("placed"))
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    cks = spark.createDataFrame(
        [(f"{y}-01-01",) for y in range(1993, 1999)], "ck_s string"
    ).select(F.to_date("ck_s").alias("ck"))
    j = F.broadcast(cks).crossJoin(spans)
    return j.groupBy("ck").agg(
        F.sum(
            F.when(
                (F.col("placed") <= F.col("ck"))
                & (F.col("last_ship") > F.col("ck")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("open_orders"),
        F.sum(F.when(F.col("placed") <= F.col("ck"), 1).otherwise(0))
        .cast("bigint")
        .alias("placed_to_date"),
    ).select(
        F.date_format("ck", "yyyy-MM-dd").alias("checkpoint"),
        "open_orders",
        "placed_to_date",
    )


@query(
    "q323_delivery_lead_time",
    """
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(AVG(CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                 AS DOUBLE)), 6) AS avg_lead_days,
           round(quantile_cont(
                 date_diff('day', o.o_orderdate, l.l_shipdate), 0.9), 4)
             AS p90_lead_days,
           round(CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate,
                                              l.l_shipdate) > 90
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS slow_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def q323(spark, sf_dir):
    """Supply-chain LEAD-TIME scorecard per supplier nation — the ops
    dashboard TPC-H's own Q12 only samples: order-to-ship lead time
    (o_orderdate → l_shipdate) mean and exact P90, plus the SLOW share
    (shipped more than 90 days after ordering — the SLA-breach rate
    this schema can express; the fixture carries no receipt/commit
    dates).  Date differences are exact integer days on both engines;
    supplier and nation dims broadcast, orders join on the fact key.
    One scan, 25 output rows — the shape a 100 TB logistics table
    serves daily."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    lead = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    slow = F.when(lead > 90, 1).otherwise(0)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.avg(lead.cast("double")), 6).alias("avg_lead_days"),
            F.round(F.percentile(lead, F.lit(0.9)), 4).alias(
                "p90_lead_days"
            ),
            F.round(
                F.sum(slow).cast("double") / F.count(F.lit(1)), 6
            ).alias("slow_share"),
        )
    )


@query(
    "q324_activation_metric",
    """
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS first_ts
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), marked AS (
      SELECT e.user_id,
             CASE WHEN e.ts < f.first_ts + INTERVAL 48 HOUR
                  THEN 1 ELSE 0 END AS in_first_48h
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    ), per_user AS (
      SELECT user_id,
             SUM(in_first_48h) AS early,
             COUNT(*) AS total
      FROM marked GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           round(AVG(CAST(early AS DOUBLE)), 6) AS avg_first48h_events,
           round(AVG(CAST(early AS DOUBLE) / total), 6)
             AS avg_early_share,
           CAST(SUM(CASE WHEN early >= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_activated
    FROM per_user
    """,
)
def q324(spark, sf_dir):
    """ACTIVATION metric — the onboarding-funnel question 'how much do
    users do in their first 48 hours, and how many clear the
    activation bar (≥5 early events)': first-touch timestamps (one
    user aggregate), every event flagged against its user's own
    48-hour window via the user-keyed join (co-partitioned — the same
    shuffle), per-user early counts, population summary.  Interval
    comparison on exact timestamps; the activation threshold is an
    integer count so the n_activated cut is deterministic."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    marked = ev.join(firsts, "user_id").select(
        "user_id",
        F.when(
            F.col("ts") < F.col("first_ts") + F.expr("INTERVAL 48 HOURS"),
            1,
        )
        .otherwise(0)
        .alias("in_first_48h"),
    )
    per_user = marked.groupBy("user_id").agg(
        F.sum("in_first_48h").alias("early"),
        F.count(F.lit(1)).alias("total"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg(F.col("early").cast("double")), 6).alias(
            "avg_first48h_events"
        ),
        F.round(
            F.avg(F.col("early").cast("double") / F.col("total")), 6
        ).alias("avg_early_share"),
        F.sum(F.when(F.col("early") >= 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_activated"),
    )


@query(
    "q325_wow_growth",
    """
    WITH weekly AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS w,
             COUNT(*) AS n_events,
             SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS rev_cents
      FROM events GROUP BY 1
    )
    SELECT strftime(w, '%Y-%m-%d') AS week,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(n_events AS DOUBLE)
                 / lag(n_events) OVER (ORDER BY w) - 1, 6)
             AS events_wow,
           round(CAST(rev_cents AS DOUBLE)
                 / NULLIF(lag(rev_cents) OVER (ORDER BY w), 0) - 1, 6)
             AS revenue_wow
    FROM weekly
    """,
)
def q325(spark, sf_dir):
    """Week-over-week GROWTH rates — the board-deck table: weekly
    events and exact-cents purchase revenue with WoW percentage
    changes from a lag over the weekly frame (revenue guarded with
    NULLIF against a zero prior week; the first week's growth is NULL
    by construction on both engines).  One raw shuffle to ~5 weekly
    rows; every derived rate is a single float division on exact
    integer inputs."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        ).alias("rev_cents"),
    )
    wlag = Window.orderBy("w")
    return weekly.select(
        F.date_format("w", "yyyy-MM-dd").alias("week"),
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
        F.round(
            F.col("n_events").cast("double")
            / F.lag("n_events").over(wlag)
            - 1,
            6,
        ).alias("events_wow"),
        F.round(
            F.col("rev_cents").cast("double")
            / F.nullif(
                F.lag("rev_cents").over(wlag), F.lit(0)
            )
            - 1,
            6,
        ).alias("revenue_wow"),
    )


@query(
    "q326_new_vs_returning_revenue",
    """
    WITH firsts AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_order
      FROM orders GROUP BY o_custkey
    ), tagged AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m,
             CASE WHEN date_trunc('month', o.o_orderdate)
                       = date_trunc('month', f.first_order)
                  THEN 'new' ELSE 'returning' END AS cust_kind,
             CAST(round(o.o_totalprice * 100) AS HUGEINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      WHERE o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1996-01-01'
    )
    SELECT strftime(m, '%Y-%m') AS month, cust_kind,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue
    FROM tagged GROUP BY m, cust_kind
    """,
)
def q326(spark, sf_dir):
    """NEW-vs-RETURNING revenue mix by month — the acquisition-vs-
    retention revenue split every growth report opens with: each
    order tagged by whether it falls in its customer's FIRST order
    month (first-touch aggregate joined back on the customer key,
    co-partitioned), monthly order counts and exact-cents revenue per
    kind, scoped to one observation year.  Month-equality comparison
    on date_trunc'ed dates is exact on both engines."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    all_o = _t(spark, sf_dir, "orders")
    firsts = all_o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint").cast(
        "decimal(38,0)"
    )
    tagged = o.join(firsts, "o_custkey").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        F.when(
            F.date_trunc("month", "o_orderdate")
            == F.date_trunc("month", "first_order"),
            "new",
        )
        .otherwise("returning")
        .alias("cust_kind"),
        cents.alias("cents"),
    )
    return tagged.groupBy("m", "cust_kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum("cents").cast("double") / 100.0).alias("revenue"),
    ).select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "cust_kind",
        "n_orders",
        "revenue",
    )


@query(
    "q327_order_size_distribution",
    """
    WITH sizes AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(qty_cents) AS DOUBLE) / 100.0 AS total_quantity,
           round(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM sizes), 6) AS order_share
    FROM sizes GROUP BY n_lines
    """,
)
def q327(spark, sf_dir):
    """ORDER-SIZE distribution — the basket-depth histogram (TPC-H's
    Q13 counts orders per customer; this counts LINES per order): one
    aggregate builds the per-order frame, a second collapses it to the
    1–7-row distribution with order shares and exact quantity totals.
    The aggregate-of-an-aggregate shape — both shuffles partial-
    aggregable, the second over an already-tiny frame."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity") * 100).cast("bigint")
    sizes = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(qty).alias("qty_cents"),
    )
    tot = sizes.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        sizes.groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            (F.sum("qty_cents").cast("double") / 100.0).alias(
                "total_quantity"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "n_lines",
            "n_orders",
            "total_quantity",
            F.round(
                F.col("n_orders").cast("double")
                / F.col("n_tot").cast("double"),
                6,
            ).alias("order_share"),
        )
    )
