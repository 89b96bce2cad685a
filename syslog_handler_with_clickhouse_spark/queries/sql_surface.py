"""SQL-surface depth (q111-q170): TPC-H family, subqueries, CTEs, combinators, snapshot store.

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
    "q111_left_array_join",
    """
    WITH a AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> len(w) >= 7) AS lw
      FROM documents WHERE doc_id % 13 = 0
    ), b AS (
      SELECT doc_id, CASE WHEN len(lw) = 0 THEN [NULL] ELSE lw END AS lw2 FROM a
    )
    SELECT doc_id, unnest(lw2) AS long_word FROM b
    """,
)
def q111(spark, sf_dir):
    """LEFT ARRAY JOIN semantics (ClickHouse) = `explode_outer`: docs
    whose filtered array is EMPTY survive with a NULL element instead of
    vanishing — the outer-join-shaped explode.  Same Generate node as
    explode, zero extra cost; the fixture filter (words ≥7 chars) leaves
    a mix of populated and empty arrays so both branches are exercised."""
    d = _t(spark, sf_dir, "documents")
    lw = F.filter(F.split(F.col("text"), " "), lambda w: F.length(w) >= 7)
    return (
        d.filter(F.col("doc_id") % 13 == 0)
        .select("doc_id", F.explode_outer(lw).alias("long_word"))
    )


@query(
    "q112_try_functions",
    """
    SELECT event_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE round(value / (event_id % 7), 6) END AS safe_div,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'not_a_number'
                         ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS safe_num
    FROM events WHERE event_id % 11 = 0
    """,
)
def q112(spark, sf_dir):
    """ANSI-safe error-tolerant scalar family (try_divide / TRY_CAST):
    divide-by-zero and unparseable casts yield NULL instead of failing
    the job — at 100 TB one poisoned row must never kill a 1000-executor
    stage.  All narrow projections; the oracle emulates try-semantics
    with CASE."""
    ev = _t(spark, sf_dir, "events")
    bad = F.when(F.col("event_id") % 3 == 0, F.lit("not_a_number")).otherwise(
        F.col("event_id").cast("string")
    )
    return ev.filter(F.col("event_id") % 11 == 0).select(
        "event_id",
        F.round(F.try_divide(F.col("value"), F.col("event_id") % 7), 6).alias(
            "safe_div"
        ),
        bad.try_cast("bigint").alias("safe_num"),
    )


@query(
    "q113_variant_json",
    """
    WITH j AS (
      SELECT event_id,
             '{"a":{"b":' || CAST(event_id % 10 AS VARCHAR)
               || ',"tags":["x","y"]},"inner":' || props || '}' AS doc
      FROM events WHERE event_id % 13 = 0
    )
    SELECT event_id,
           CAST(json_extract(doc, '$.a.b') AS BIGINT) AS ab,
           json_extract_string(doc, '$.a.tags[1]') AS tag1,
           CAST(json_extract(doc, '$.inner.k') AS BIGINT) AS k
    FROM j
    """,
)
def q113(spark, sf_dir):
    """Semi-structured VARIANT path access (Spark 4's parse_json +
    variant_get — the ClickHouse JSON / Snowflake VARIANT analogue):
    parse once, then typed path extraction including nested objects and
    array indexing.  Unlike get_json_object (q10), the variant is a
    binary-encoded tree: parse cost is paid once per row however many
    paths are read — the right shape for wide JSON at scale."""
    ev = _t(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"a":{"b":'),
        (F.col("event_id") % 10).cast("string"),
        F.lit(',"tags":["x","y"]},"inner":'),
        F.col("props"),
        F.lit("}"),
    )
    j = ev.filter(F.col("event_id") % 13 == 0).select(
        "event_id", F.parse_json(doc).alias("v")
    )
    return j.select(
        "event_id",
        F.variant_get("v", "$.a.b", "bigint").alias("ab"),
        F.variant_get("v", "$.a.tags[1]", "string").alias("tag1"),
        F.variant_get("v", "$.inner.k", "bigint").alias("k"),
    )


@query(
    "q114_profile",
    """
    SELECT 'event_type' AS col, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT event_type) AS n_distinct,
           MIN(CAST(event_type AS VARCHAR)) AS min_s,
           MAX(CAST(event_type AS VARCHAR)) AS max_s
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*),
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'props_k', COUNT(*),
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)),
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS VARCHAR),
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS VARCHAR)
    FROM events
    """,
)
def q114(spark, sf_dir):
    """Data-profiling sweep (the pre-training data-quality report): per
    column — row count, nulls, exact distinct, min/max as strings —
    stacked with unionByName.  One scan per column group; at scale the
    distinct counts switch to approx_count_distinct (q13) and all columns
    share one pass via grouping sets of aggregates."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")

    def prof(name: str, c: Column) -> DataFrame:
        return ev.agg(
            F.lit(name).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(c.isNull().cast("bigint")).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_s"),
            F.max(c).cast("string").alias("max_s"),
        )

    return (
        prof("event_type", F.col("event_type"))
        .unionByName(prof("user_id", F.col("user_id")))
        .unionByName(prof("props_k", k))
    )


@query(
    "q115_zscore_outliers",
    """
    WITH q AS (
      SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS xc
      FROM events
    ), s AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(xc) AS DOUBLE) AS sx, CAST(SUM(xc * xc) AS DOUBLE) AS sxx
      FROM q GROUP BY 1
    ), m AS (
      SELECT event_type, sx / nd AS mu,
             sqrt((sxx - sx * sx / nd) / (nd - 1.0)) AS sd
      FROM s
    )
    SELECT q.event_id, q.event_type,
           (CAST(q.xc AS DOUBLE) - m.mu) / m.sd AS z
    FROM q JOIN m USING (event_type)
    WHERE abs((CAST(q.xc AS DOUBLE) - m.mu) / m.sd) > 2.5
    """,
)
def q115(spark, sf_dir):
    """Per-group z-score anomaly detection (the alerting query a syslog
    store exists for): group moments from exact integer sums (q98's
    mergeable-statistics trick), broadcast the tiny per-group (μ, σ) back
    onto the fact stream, flag |z| > 2.5.  The fact side is scanned
    twice but shuffled never — the stats table is groups-sized."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("xc"),
    )
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum("xc").cast("double").alias("sx"),
        F.sum(F.col("xc") * F.col("xc")).cast("double").alias("sxx"),
    )
    m = s.select(
        "event_type",
        (F.col("sx") / F.col("nd")).alias("mu"),
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("nd"))
            / (F.col("nd") - F.lit(1.0))
        ).alias("sd"),
    )
    z = (F.col("xc").cast("double") - F.col("mu")) / F.col("sd")
    return (
        q.join(F.broadcast(m), "event_type")
        .select("event_id", "event_type", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


@query(
    "q116_tfdf_topterms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n FROM documents
    ), s AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) * CAST(n.n AS DOUBLE)
               / CAST(df.df AS DOUBLE) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM s
    )
    SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3
    """,
)
def q116(spark, sf_dir):
    """Characteristic-term extraction: top-3 terms per doc by
    tf · N / df — TF-IDF with a LINEAR inverse-document-frequency
    (deliberate: no transcendental log, so Spark and DuckDB agree to the
    bit; the ranking is order-isomorphic to tf·(N/df) monotone
    transforms for fixed doc).  Term stats are one tokenize pass feeding
    both tf and df aggregates; the df side is term-keyed and small, so
    the score join broadcasts at realistic vocabulary sizes."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.count()
    score = (
        F.col("tf").cast("double")
        * F.lit(float(n))
        / F.col("df").cast("double")
    )
    s = tf.join(df_, "term").select("doc_id", "term", "tf", "df", score.alias("score"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q117_bitmap_distinct",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users
    FROM events GROUP BY event_type
    """,
)
def q117(spark, sf_dir):
    """EXACT distinct via bitmap aggregation (ClickHouse `groupBitmap`):
    user ids are packed into per-bucket fixed-width bitmaps
    (bitmap_construct_agg), OR-merged, and popcounted — the mergeable
    exact-distinct representation that, materialized per day/segment,
    re-aggregates without rescanning raw data (cheaper and exact, vs the
    HLL sketch path of q79 which trades exactness for size).  The oracle
    is plain COUNT(DISTINCT)."""
    ev = _t(spark, sf_dir, "events")
    sub = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    return sub.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("uniq_users")
    )


@query(
    "q118_calendar",
    """
    SELECT event_id,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
           quarter(ts) AS q,
           weekofyear(ts) AS iso_week,
           strftime(CAST(date_trunc('week', ts) AS DATE), '%Y-%m-%d') AS week_start,
           strftime(CAST(ts + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS next_month
    FROM events WHERE event_id % 23 = 0
    """,
)
def q118(spark, sf_dir):
    """Calendar scalar family (last_day / quarter / ISO week / week
    truncation / month arithmetic with end-of-month clamping) — the
    reporting-date kit on top of q07/q54's date arithmetic.  Narrow
    projection; both engines agree on ISO week numbering and the
    add-month clamp (Jan 31 + 1 month = Feb 29)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 23 == 0).select(
        "event_id",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.last_day(F.to_date("ts")), "yyyy-MM-dd").alias("month_end"),
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week_start"),
        F.date_format(F.add_months(F.to_date("ts"), 1), "yyyy-MM-dd").alias(
            "next_month"
        ),
    )


@query(
    "q119_interval_range_frame",
    """
    SELECT user_id, strftime(ts, '{tsfd}') AS ts_s,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                              AND CURRENT ROW) AS DOUBLE) AS sum_10m,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                                AND CURRENT ROW) AS n_10m
    FROM events WHERE user_id < 12
    """.format(tsfd=TSF_D),
)
def q119(spark, sf_dir):
    """TIME-range window frames (`RANGE BETWEEN INTERVAL ... PRECEDING`):
    each event's trailing-10-minute running sum/count per user — the
    event-time cousin of q30's row frames, and the shape of "rate over
    the last N minutes" alerting.  One shuffle on user_id; frame
    evaluation is a sorted sliding pass per partition.  Expressed via
    SQL window syntax (the DataFrame rangeBetween API takes long offsets
    only, so interval frames are the SQL path)."""
    ev = _t(spark, sf_dir, "events")
    ev.filter(F.col("user_id") < 12).createOrReplaceTempView("ev_q119")
    return spark.sql(
        """
        SELECT user_id, date_format(ts, '{tsfs}') AS ts_s,
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                      OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                                  AND CURRENT ROW) AS DOUBLE) AS sum_10m,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                                    AND CURRENT ROW) AS n_10m
        FROM ev_q119
        """.format(tsfs=TSF_S)
    )


@query(
    "q120_tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           round(c_acctbal, 2) AS acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, round(c_acctbal, 2)
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q120(spark, sf_dir):
    """TPC-H Q10 (returned-item revenue ranking): fact-fact shuffle join
    (orders×lineitem), dim broadcasts (customer side chain, nation), agg
    on a composite key, decimal-exact revenue, top-20 with a total-order
    tiebreak.  The join tree is declared flat and AQE picks build sides
    and reorders — no hints."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    rev = F.sum(
        _dec("l_extendedprice") * (F.lit(1.00).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("acctbal"))
        .agg(rev.alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q121_tpch_q18",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    )
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN big      ON big.l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
    """,
)
def q121(spark, sf_dir):
    """TPC-H Q18 (large-volume orders): a HAVING-filtered aggregate used
    as a semi-filter on the fact table, then re-aggregated with customer
    context — the aggregate-then-join shape where the first groupBy's
    output is small enough to broadcast into the second pass, so the big
    lineitem table is shuffled once, not twice, on the same key (AQE
    reuses the exchange)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 180)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.join(big, "l_orderkey", "left_semi"), o.o_orderkey == F.col("l_orderkey"))
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
    )


@query(
    "q122_grouping_id",
    """
    SELECT n_regionkey, n_name,
           GROUPING(n_regionkey) AS g_region,
           GROUPING(n_regionkey, n_name) AS gid,
           COUNT(*) AS n
    FROM nation GROUP BY ROLLUP (n_regionkey, n_name)
    """,
)
def q122(spark, sf_dir):
    """GROUPING()/GROUPING_ID() markers on rollup rows — how a consumer
    tells a real NULL from a subtotal row (completing q18-q20's
    rollup/cube/grouping-sets trio).  Same single-pass expand+aggregate
    plan; the markers are free bit flags."""
    n = _t(spark, sf_dir, "nation")
    return n.rollup("n_regionkey", "n_name").agg(
        F.grouping("n_regionkey").cast("bigint").alias("g_region"),
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
    ).select("n_regionkey", "n_name", "g_region", "gid", "n")


@query(
    "q123_exists_subquery",
    """
    SELECT 'has_big_order' AS op, c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    UNION ALL
    SELECT 'no_big_order' AS op, c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q123(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS subqueries in SQL form: Catalyst
    decorrelates them into the same left-semi/left-anti joins q23/q24
    declare via the DataFrame API — asserting the SQL front door and the
    DataFrame door reach identical physical shapes."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c.createOrReplaceTempView("cust_q123")
    o.createOrReplaceTempView("ord_q123")
    return spark.sql(
        """
        SELECT 'has_big_order' AS op, c_custkey FROM cust_q123 c
        WHERE EXISTS (SELECT 1 FROM ord_q123 o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        UNION ALL
        SELECT 'no_big_order' AS op, c_custkey FROM cust_q123 c
        WHERE NOT EXISTS (SELECT 1 FROM ord_q123 o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        """
    )


@query(
    "q124_scalar_subquery",
    """
    SELECT o_orderkey,
           round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                 / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                           / CAST(COUNT(*) AS DOUBLE)
                    FROM orders), 6) AS ratio_to_avg
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def q124(spark, sf_dir):
    """Scalar subquery: every order priced relative to the global average
    — planned as an independent single-row subplan broadcast into the
    main scan (no join, no per-row re-evaluation).  The average is a
    decimal-sum ratio so both engines compute the identical double."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ord_q124")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                     / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                               / CAST(COUNT(*) AS DOUBLE)
                        FROM ord_q124), 6) AS ratio_to_avg
        FROM ord_q124 WHERE o_orderkey % 11 = 0
        """
    )


@query(
    "q125_nullsafe_join",
    """
    WITH a AS (
      SELECT nullif(user_id % 10, 7) AS k, COUNT(*) AS n_err
      FROM events WHERE event_type = 'error' GROUP BY 1
    ), b AS (
      SELECT nullif(user_id % 10, 7) AS k, COUNT(*) AS n_click
      FROM events WHERE event_type = 'click' GROUP BY 1
    )
    SELECT a.k, n_err, n_click
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q125(spark, sf_dir):
    """NULL-safe equality join (`<=>` / IS NOT DISTINCT FROM): the NULL
    key bucket joins to itself instead of vanishing — required when a
    grouping key legitimately contains unknown (here: masked residue 7).
    Still a hash-joinable equi-condition, unlike `a.k = b.k OR (a.k IS
    NULL AND b.k IS NULL)` which degrades to a nested loop."""
    ev = _t(spark, sf_dir, "events")
    k = F.nullif(F.col("user_id") % 10, F.lit(7)).alias("k")
    a = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(k)
        .agg(F.count(F.lit(1)).alias("n_err"))
    )
    b = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(k)
        .agg(F.count(F.lit(1)).alias("n_click"))
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(a.k.alias("k"), "n_err", "n_click")


@query(
    "q126_stream_upsert",
    """
    WITH r AS (
      SELECT user_id, event_id, round(value, 2) AS value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM r WHERE rn = 1
    """,
)
def q126(spark, sf_dir):
    """Streaming CDC upsert: a purchase-event stream drains through
    `foreachBatch` → `sinks.upsert_parquet`, so the store always holds
    the LATEST row per user (ReplacingMergeTree fed by a stream — the
    materialized "current state" table every log pipeline keeps next to
    the append-only history).  The read-back store must equal the
    oracle's latest-row-per-key window replay."""
    import tempfile

    from ..sources.sinks import upsert_parquet

    ev = _events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    upd = ev.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.round("value", 2).alias("last_value"),
    )
    base = scratch_dir("stream_upsert_")
    store = f"{base}/store"

    def sink(batch_df, batch_id):
        if batch_id == 0:
            # seed the store so upsert has a base; empty seed schema-matched
            batch_df.limit(0).write.mode("overwrite").parquet(store)
        upsert_parquet(
            spark, store, batch_df, keys=["user_id"], version_col="last_event_id"
        )

    q = (
        upd.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(store)


@query(
    "q127_ttl_expire",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS n
    FROM events
    WHERE event_id % 5 = 0 AND CAST(ts AS DATE) >= DATE '2024-01-20'
    GROUP BY 1
    """,
)
def q127(spark, sf_dir):
    """Partition TTL (ClickHouse `TTL ts + INTERVAL`): a date-partitioned
    store expires partitions older than the cutoff via O(1)-per-partition
    directory drops — no rewrite, no scan — then the surviving store must
    match the oracle's time-filtered aggregate exactly."""
    import tempfile

    from ..sources.sinks import expire_partitions

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    store = scratch_dir("ttl_q_") + "/store"
    (
        ev.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .write.partitionBy("day")
        .parquet(store)
    )
    expire_partitions(store, "day", "2024-01-20")
    back = spark.read.parquet(store)
    return back.groupBy("day").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q128_correlated_scalar",
    """
    SELECT o_orderkey, o_orderstatus,
           (SELECT CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line_qty
    FROM orders WHERE o_orderkey % 17 = 0
    """,
)
def q128(spark, sf_dir):
    """CORRELATED scalar subquery (the TPC-H Q2/Q17 shape): per-order max
    line quantity referenced as an expression.  Catalyst decorrelates it
    into an aggregate + left outer join on the correlation key — one
    shuffle, no per-row re-execution; orders with no lines yield NULL
    (scalar-subquery semantics the rewrite must preserve)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o.createOrReplaceTempView("ord_q128")
    li.createOrReplaceTempView("li_q128")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus,
               (SELECT CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                FROM li_q128 WHERE l_orderkey = o_orderkey) AS max_line_qty
        FROM ord_q128 WHERE o_orderkey % 17 = 0
        """
    )


@query(
    "q129_in_subquery",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                             WHERE l_returnflag = 'R')
    """,
)
def q129(spark, sf_dir):
    """IN / NOT IN SUBQUERY predicates (vs q03's literal lists): planned
    as left-semi and null-aware left-anti joins.  NOT IN over a column
    that could contain NULLs is the classic three-valued-logic trap —
    Spark's null-aware anti join and DuckDB must agree row-for-row."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    o.createOrReplaceTempView("ord_q129")
    c.createOrReplaceTempView("cust_q129")
    li.createOrReplaceTempView("li_q129")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM ord_q129
        WHERE o_custkey IN (SELECT c_custkey FROM cust_q129 WHERE c_acctbal > 9000)
          AND o_orderkey NOT IN (SELECT l_orderkey FROM li_q129
                                 WHERE l_returnflag = 'R')
        """
    )


@query(
    "q130_tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q130(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = shipped >60 days after the
    order date — same correlated-EXISTS-with-extra-predicate shape.  The
    non-equi part of the EXISTS rides along as a join condition on the
    left-semi join; the date filter on orders is pushed to the scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q131_tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1.00 - CAST(l_discount AS DECIMAL(18,2))) AS vol
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q131(spark, sf_dir):
    """TPC-H Q7 (volume shipping): the same dimension table joined TWICE
    under different roles (supplier nation vs customer nation) with a
    disjunctive cross-pair predicate.  Both nation sides broadcast; the
    disjunction can't be pushed below either single join, so it lands as
    a post-join filter — exactly where Catalyst should leave it."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    vol = _dec("l_extendedprice") * (F.lit(1.00).cast("decimal(18,2)") - _dec("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            pair
            & F.col("l_shipdate").between(
                F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-12-31"))
            )
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).cast("double").alias("revenue"))
    )


@query(
    "q132_tpch_q8",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1.00 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    GROUP BY o_year
    """,
)
def q132(spark, sf_dir):
    """TPC-H Q8 (national market share): an 8-table join tree where the
    measure is a RATIO of a conditional sum to the total sum in one
    aggregation pass (sum-of-CASE over sum).  Division happens after both
    decimal-exact sums are cast to double, in identical order on the
    oracle side, so the hash can't drift."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = _dec("l_extendedprice") * (F.lit(1.00).cast("decimal(18,2)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    base = (
        F.broadcast(p)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .filter(
            F.col("o_orderdate").between(
                F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-12-31"))
            )
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            F.col("supp_nation"),
        )
    )
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(zero))
    return base.groupBy("o_year").agg(
        (nat.cast("double") / F.sum("vol").cast("double")).alias("mkt_share")
    )


@query(
    "q133_tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q133(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join with
    an extra non-key join predicate (which must NOT become a post-join
    filter — that would drop order-less customers), a per-customer
    COUNT(col) that counts zero for null matches, then a second aggregate
    over the first's output.  Two shuffles by construction; the second
    input is one row per customer, tiny."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q134_tpch_q14",
    """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
             / CAST(SUM(vol) AS DOUBLE) AS promo_revenue
    FROM (
      SELECT p_type,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1.00 - CAST(l_discount AS DECIMAL(18,2))) AS vol
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
    )
    """,
)
def q134(spark, sf_dir):
    """TPC-H Q14 (promotion effect): single-row global ratio aggregate
    over a fact×dim join — the dim (part) broadcasts, the month filter
    prunes lineitem at the scan, and the whole query is one partial+final
    hash aggregate with no shuffle of raw rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    p = _t(spark, sf_dir, "part")
    vol = _dec("l_extendedprice") * (F.lit(1.00).cast("decimal(18,2)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    base = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", vol.alias("vol")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("vol")).otherwise(zero))
    return base.agg(
        (promo.cast("double") * F.lit(100.0) / F.sum("vol").cast("double")).alias(
            "promo_revenue"
        )
    )


@query(
    "q135_tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q135(spark, sf_dir):
    """TPC-H Q15 (top supplier): a derived revenue view consumed twice —
    once as the join input, once inside a scalar MAX subquery — with an
    EXACT-decimal equality between the two (double equality would be a
    parity trap; decimal is safe).  Spark plans the 1-row max as a
    broadcast and AQE reuses the revenue exchange for both consumers."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    s = _t(spark, sf_dir, "supplier")
    vol = _dec("l_extendedprice") * (F.lit(1.00).cast("decimal(18,2)") - _dec("l_discount"))
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(vol).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@query(
    "q136_tpch_q19",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q136(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three OR'd
    conjunctions mixing columns from BOTH join sides.  Catalyst derives
    the common single-side implications (p_brand IN (...), l_quantity
    BETWEEN 1 AND 30) and pushes them below the join as scan filters
    while keeping the full disjunction above — the classic CNF-extraction
    test.  part side broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    vol = _dec("l_extendedprice") * (F.lit(1.00).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm("Brand#4", 15, 20, 30))
        .agg(F.sum(vol).cast("double").alias("revenue"))
    )


@query(
    "q137_tpch_q21",
    """
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q137(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    shipped >90 days after order date on a finished order.  The shape is
    the hard part and is preserved exactly: the same derived table
    consumed three times — as the driving row set, inside an EXISTS
    (another supplier touched the order), and inside a NOT EXISTS (no
    OTHER supplier was late) — i.e. a semi join and an anti join both
    carrying a non-equi (<>) conjunct next to the equality key."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    li2 = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    late3 = late.select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    survivors = late.join(
        li2,
        (late.l_orderkey == li2.ok2) & (late.l_suppkey != li2.sk2),
        "left_semi",
    ).join(
        late3,
        (F.col("l_orderkey") == late3.ok3) & (F.col("l_suppkey") != late3.sk3),
        "left_anti",
    )
    return (
        survivors.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q138_tpch_q22",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c_custkey % 10 AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
        AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                              / CAST(COUNT(*) AS DOUBLE)
                         FROM customer c2
                         WHERE c2.c_acctbal > 0.00 AND c2.c_custkey % 10 IN (1, 3, 5, 7, 9))
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    )
    GROUP BY cntrycode
    """,
)
def q138(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity), adapted: the fixture has no
    c_phone, so "country code" = c_custkey % 10.  Combines an
    UNCORRELATED scalar average (computed as exact-decimal sum / count,
    the q98 moment rule), a NOT EXISTS anti join against orders, and a
    grouped aggregate — three different subquery kinds in one query."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    code = (F.col("c_custkey") % 10).alias("cntrycode")
    eligible = c.filter((F.col("c_custkey") % 10).isin(1, 3, 5, 7, 9))
    thresh = eligible.filter(F.col("c_acctbal") > 0.00).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_bal"
        )
    )
    return (
        eligible.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, eligible.c_custkey == o.o_custkey, "left_anti")
        .groupBy(code)
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q139_tpch_q2",
    """
    WITH supplies AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_partkey, p_brand, s_name, round(s_acctbal, 2) AS acctbal
    FROM part
    JOIN supplies ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
      AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                       FROM supplies sp2
                       JOIN supplier s2 ON s2.s_suppkey = sp2.l_suppkey
                       JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
                       JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
                       WHERE sp2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    """,
)
def q139(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table, so
    "supplies" = DISTINCT (l_partkey, l_suppkey) observed in lineitem,
    and the minimized measure is s_acctbal instead of ps_supplycost.  The
    defining shape survives intact: a correlated scalar MIN over the SAME
    multi-table join tree as the outer query, correlated on the part key.
    Catalyst decorrelates it into an aggregate over the shared join +
    equi-join back on (p_partkey, min) — the equality compares stored
    doubles (no arithmetic), so it is hash-safe."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    li.select("l_partkey", "l_suppkey").distinct().createOrReplaceTempView("supplies_q139")
    p.createOrReplaceTempView("part_q139")
    s.createOrReplaceTempView("supplier_q139")
    n.createOrReplaceTempView("nation_q139")
    r.createOrReplaceTempView("region_q139")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, s_name, round(s_acctbal, 2) AS acctbal
        FROM part_q139
        JOIN supplies_q139 ON p_partkey = l_partkey
        JOIN supplier_q139 ON s_suppkey = l_suppkey
        JOIN nation_q139   ON s_nationkey = n_nationkey
        JOIN region_q139   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                           FROM supplies_q139 sp2
                           JOIN supplier_q139 s2 ON s2.s_suppkey = sp2.l_suppkey
                           JOIN nation_q139 n2   ON s2.s_nationkey = n2.n_nationkey
                           JOIN region_q139 r2   ON n2.n_regionkey = r2.r_regionkey
                           WHERE sp2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        """
    )


@query(
    "q140_tpch_q11",
    """
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv
    WHERE val > (SELECT SUM(val) * 0.001 FROM pv)
    """,
)
def q140(spark, sf_dir):
    """TPC-H Q11 (important stock), adapted: part value = summed
    extendedprice shipped by NATION_3 suppliers (no ps_supplycost).  The
    shape: a grouped aggregate compared in HAVING position against a
    GLOBAL re-aggregate of itself scaled by a fraction — the threshold is
    kept in exact decimal on both engines (decimal × decimal literal), so
    the strict > comparison can't straddle a rounding boundary."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("val"))
    )
    thresh = pv.agg(
        (F.sum("val") * F.lit("0.001").cast("decimal(4,3)")).alias("cutoff")
    )
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("val") > F.col("cutoff"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


@query(
    "q141_tpch_q17",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q141(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG
    against the SAME fact table being filtered — decorrelates into a
    per-part aggregate joined back to lineitem.  l_quantity holds small
    integers, so the double AVG is an exact-integer sum over an exact
    count; 0.2×avg is then the identical IEEE double on both engines and
    the < comparison is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    li.createOrReplaceTempView("li_q141")
    p.createOrReplaceTempView("part_q141")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM li_q141 JOIN part_q141 ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#12'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM li_q141 l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q142_summap",
    """
    SELECT user_id,
           string_agg(event_type || ':' ||
                      CAST(CAST(sum_val * 100 AS BIGINT) AS VARCHAR),
                      ',' ORDER BY event_type) AS sum_map,
           string_agg(event_type || ':' ||
                      CAST(CAST(min_val * 100 AS BIGINT) AS VARCHAR),
                      ',' ORDER BY event_type) AS min_map,
           string_agg(event_type || ':' ||
                      CAST(CAST(max_val * 100 AS BIGINT) AS VARCHAR),
                      ',' ORDER BY event_type) AS max_map
    FROM (
      SELECT user_id, event_type,
             SUM(CAST(value AS DECIMAL(18,2))) AS sum_val,
             MIN(CAST(value AS DECIMAL(18,2))) AS min_val,
             MAX(CAST(value AS DECIMAL(18,2))) AS max_val
      FROM events GROUP BY user_id, event_type
    )
    GROUP BY user_id
    """,
)
def q142(spark, sf_dir):
    """ClickHouse sumMap / minMap / maxMap analogue: per user, a MAP from
    event_type to the per-key sum/min/max of value.  Spark side builds a
    real `map<string,decimal>` via map_from_entries(sort_array(collect_list
    (struct(k,v)))) — ClickHouse's sorted-key-array semantics — then
    serializes entries as `k:cents` for the hash compare (exact decimal
    cents, never double-to-string).  One shuffle: the (user,key) pre-agg
    and the per-user map assembly share the user_id hash partitioning."""
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id", "event_type").agg(
        F.sum(_dec("value")).alias("sum_val"),
        F.min(_dec("value")).alias("min_val"),
        F.max(_dec("value")).alias("max_val"),
    )

    def as_map(col: str):
        return F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("event_type"), F.col(col))))
        )

    def serialize(mapcol):
        return F.concat_ws(
            ",",
            F.transform(
                F.map_entries(mapcol),
                lambda e: F.concat(
                    e["key"],
                    F.lit(":"),
                    (e["value"] * 100).cast("bigint").cast("string"),
                ),
            ),
        )

    return per_key.groupBy("user_id").agg(
        serialize(as_map("sum_val")).alias("sum_map"),
        serialize(as_map("min_val")).alias("min_map"),
        serialize(as_map("max_val")).alias("max_map"),
    )


@query(
    "q143_weighted_quantile",
    """
    WITH by_value AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2))
    ), cum AS (
      SELECT l_returnflag, price,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM by_value
    )
    SELECT l_returnflag,
           CAST(MIN(price) AS DOUBLE) AS weighted_median,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE CAST(cw AS DOUBLE) >= 0.5 * CAST(tw AS DOUBLE)
    GROUP BY l_returnflag
    """,
)
def q143(spark, sf_dir):
    """ClickHouse quantileExactWeighted(0.5)(price, quantity) analogue:
    exact weighted median per group.  Weights collapse per DISTINCT value
    first (groupBy), then a cumulative-weight window ordered by value
    finds the smallest value whose cumulative weight crosses half the
    total — value-level deterministic, no tie ambiguity.  Weights are
    integer quantities, so every comparison is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    by_value = li.groupBy(
        "l_returnflag", _dec("l_extendedprice").alias("price")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    wflag = Window.partitionBy("l_returnflag")
    cum = by_value.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wflag.orderBy("price")).alias("cw"),
        F.sum("w").over(wflag).alias("tw"),
    )
    return (
        cum.filter(F.col("cw").cast("double") >= F.lit(0.5) * F.col("tw").cast("double"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("weighted_median"),
            F.max("tw").cast("bigint").alias("total_weight"),
        )
    )


@query(
    "q144_agg_combinators",
    """
    SELECT event_type,
           LEAST(COUNT(DISTINCT user_id), 11) AS uniq_upto_10,
           COUNT(CASE WHEN value > 10.00 THEN 1 END) AS count_if_gt10,
           CAST(SUM(CASE WHEN value > 10.00 THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_if_gt10,
           CAST(SUM(CASE WHEN value > 10.00 THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(COUNT(CASE WHEN value > 10.00 THEN 1 END) AS DOUBLE)
             AS avg_if_gt10,
           MIN(user_id) AS any_user
    FROM events
    GROUP BY event_type
    """,
)
def q144(spark, sf_dir):
    """ClickHouse aggregate-combinator family in one pass: uniqUpTo(10)
    (exact distinct capped at N+1 — the cheap "more than N?" probe),
    countIf / sumIf / avgIf (avg derived from the exact conditional sum
    and count, q98 moment rule), and `any` pinned to deterministic MIN
    (ClickHouse `any` is execution-order-dependent; a distributed engine
    must replace it with an order-free pick — documented deviation)."""
    ev = _t(spark, sf_dir, "events")
    zero = F.lit(0).cast("decimal(18,2)")
    cond = F.col("value") > 10.00
    sum_if = F.sum(F.when(cond, _dec("value")).otherwise(zero)).cast("double")
    count_if = F.count(F.when(cond, F.lit(1)))
    return ev.groupBy("event_type").agg(
        F.least(F.countDistinct("user_id"), F.lit(11).cast("bigint")).alias("uniq_upto_10"),
        count_if.alias("count_if_gt10"),
        sum_if.alias("sum_if_gt10"),
        (sum_if / count_if.cast("double")).alias("avg_if_gt10"),
        F.min("user_id").alias("any_user"),
    )


@query(
    "q145_topk_array",
    """
    WITH counts AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), ranked AS (
      SELECT user_id, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rn
      FROM counts
    )
    SELECT string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY rn) AS top_users,
           string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY rn) AS top_counts
    FROM ranked WHERE rn <= 5
    """,
)
def q145(spark, sf_dir):
    """ClickHouse topK(5)(user_id) analogue with EXACT semantics: the five
    most frequent users emitted as ONE array-valued aggregate row
    (ClickHouse returns Array(T), serialized here as an ordered joined
    string).  Exact top-by-count with a user_id tiebreak so the array is
    total-order deterministic; the plan is groupBy + TakeOrdered(5) — no
    global sort of the counts.  At 100 TB the approximate path is
    df.stat.freqItems / countminsketch; this is the exact reference."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("user_id")).limit(5)
    # collect_list gives no ordering guarantee — sort the collected structs
    # by (-cnt, user_id) so the emitted arrays are order-deterministic.
    ordered = F.sort_array(
        F.collect_list(F.struct((-F.col("cnt")).alias("negc"), F.col("user_id")))
    )
    return top.agg(
        F.concat_ws(
            ",", F.transform(ordered, lambda x: x["user_id"].cast("string"))
        ).alias("top_users"),
        F.concat_ws(
            ",", F.transform(ordered, lambda x: (-x["negc"]).cast("string"))
        ).alias("top_counts"),
    )


@query(
    "q146_interval_overlap_join",
    """
    WITH sessions AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(epoch_us(ts)) AS s_start, MAX(epoch_us(ts)) AS s_end
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), incidents AS (
      SELECT CAST(ts AS DATE) AS day, MIN(epoch_us(ts)) AS i_start,
             MIN(epoch_us(ts)) + 1800000000 AS i_end
      FROM events WHERE event_type = 'error' GROUP BY CAST(ts AS DATE)
    )
    SELECT user_id, strftime(s.day, '%Y-%m-%d') AS day,
           LEAST(s_end, i_end) - GREATEST(s_start, i_start) AS overlap_us
    FROM sessions s JOIN incidents i ON s.day = i.day
    WHERE s_start <= i_end AND i_start <= s_end
    """,
)
def q146(spark, sf_dir):
    """INTERVAL-OVERLAP join (range × range, not the point-in-range q26):
    per-user daily activity spans joined to daily incident windows on
    `a.start <= b.end AND b.start <= a.end`, returning overlap duration.
    The equality on `day` is the partition key, so the theta part runs
    within hash buckets (an equi+range join, not BNLJ); the incident side
    is one row per day and broadcasts.  All arithmetic in exact integer
    microseconds (unix_micros ↔ epoch_us)."""
    ev = _t(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    sessions = ev.groupBy("user_id", day).agg(
        F.min(F.unix_micros("ts")).alias("s_start"),
        F.max(F.unix_micros("ts")).alias("s_end"),
    )
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(day)
        .agg(F.min(F.unix_micros("ts")).alias("i_start"))
        .select("day", "i_start", (F.col("i_start") + 1_800_000_000).alias("i_end"))
    )
    s, i = sessions.alias("s"), F.broadcast(incidents.alias("i"))
    return (
        s.join(
            i,
            (F.col("s.day") == F.col("i.day"))
            & (F.col("s_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("s_end")),
        )
        .select(
            "user_id",
            F.date_format(F.col("s.day"), "yyyy-MM-dd").alias("day"),
            (
                F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
            ).alias("overlap_us"),
        )
    )


@query(
    "q147_moving_median",
    """
    SELECT event_id,
           l[(len(l) + 1) // 2] AS med5
    FROM (
      SELECT event_id,
             list_sort(list(value) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS l
      FROM events
    )
    """,
)
def q147(spark, sf_dir):
    """Moving EXACT median (ClickHouse medianExact over a frame): per
    user, the lower median of the last 5 values.  Built-in median()
    rejects window frames, so the frame's values are collected, sorted,
    and indexed — element selection, not arithmetic, so doubles stay
    exact.  The frame is bounded (5 rows), so the per-row array is O(1)
    and the whole thing is one window shuffle by user_id."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    sorted_l = F.array_sort(F.collect_list("value").over(w))
    return ev.select(
        "event_id",
        F.element_at(sorted_l, ((F.size(sorted_l) + 1) / 2).cast("int")).alias("med5"),
    )


@query(
    "q148_regexp_family",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
           COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '')
             AS numbers,
           CASE WHEN regexp_matches(text, '(?i)spark') THEN 1 ELSE 0 END AS mentions_spark,
           regexp_replace(text, '[0-9]+', '#', 'g') AS masked
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def q148(spark, sf_dir):
    """Regexp function family (ClickHouse extractAll / countMatches /
    match / replaceRegexpAll): extract-all with counts, boolean match,
    and global replace — all JVM-side codegen, no UDF.  Patterns kept to
    portable ASCII classes so Java and RE2-style engines agree."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    nums = F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)
    return docs.select(
        "doc_id",
        F.size(nums).alias("n_numbers"),
        F.concat_ws(",", nums).alias("numbers"),
        F.when(F.col("text").rlike("(?i)spark"), 1).otherwise(0).alias("mentions_spark"),
        F.regexp_replace("text", "[0-9]+", "#").alias("masked"),
    )


@query(
    "q149_bit_aggregates",
    """
    SELECT event_type,
           bit_and(user_id) AS band,
           bit_or(user_id) AS bor,
           bit_xor(user_id) AS bxor
    FROM events GROUP BY event_type
    """,
)
def q149(spark, sf_dir):
    """Bitwise aggregates (ClickHouse groupBitAnd/Or/Xor): associative,
    commutative, and mergeable — they partial-aggregate map-side like any
    sum, so the shuffle carries one row per (partition × event_type)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
    )


@query(
    "q150_limit_by",
    """
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn <= 2
    """,
)
def q150(spark, sf_dir):
    """ClickHouse `LIMIT 2 BY user_id`: the first two events per user in
    time order.  Maps to row_number over a per-user window — the window
    shuffle is the only exchange, and the rn <= 2 filter is applied
    inside the window operator's output before any further stage (Spark
    pushes the rank limit into the sort via WindowGroupLimit)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", "event_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@query(
    "q151_recursive_cte",
    """
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS node, c_custkey // 2 AS anc
      FROM customer WHERE c_custkey > 1
      UNION ALL
      SELECT a.node, a.anc // 2 FROM anc a WHERE a.anc > 1
    )
    SELECT node, COUNT(*) AS n_ancestors, CAST(SUM(anc) AS BIGINT) AS anc_sum
    FROM anc GROUP BY node
    """,
)
def q151(spark, sf_dir):
    """RECURSIVE CTE (Spark 4 `WITH RECURSIVE`): full ancestor closure of
    the implicit binary-tree hierarchy node -> node div 2.  Unlike q69's
    driver-side loop-to-fixpoint, this runs the iteration inside ONE SQL
    statement on both engines.  Each iteration is a narrow projection of
    the frontier (no joins), so the work per step is O(frontier) and the
    depth is log2(n) — ~17 iterations even at 10^5 customers."""
    c = _t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("cust_q151")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT c_custkey AS node, c_custkey div 2 AS anc
          FROM cust_q151 WHERE c_custkey > 1
          UNION ALL
          SELECT a.node, a.anc div 2 FROM anc a WHERE a.anc > 1
        )
        SELECT node, COUNT(*) AS n_ancestors, SUM(anc) AS anc_sum
        FROM anc GROUP BY node
        """
    )


@query(
    "q152_rfc5424_parse",
    """
    WITH lines AS (
      SELECT event_id,
             '<' || CAST((user_id % 24) * 8 + (event_id % 8) AS VARCHAR)
                 || '>1 2024-01-01T00:00:00Z host-' || CAST(user_id AS VARCHAR)
                 || ' app - - ' || event_type AS raw
      FROM events
    )
    SELECT event_id,
           CAST(regexp_extract(raw, '^<([0-9]+)>', 1) AS BIGINT) // 8 AS facility,
           CAST(regexp_extract(raw, '^<([0-9]+)>', 1) AS BIGINT) % 8 AS severity,
           regexp_extract(raw, '^<[0-9]+>1 \\S+ (\\S+)', 1) AS host,
           regexp_extract(raw, ' - - (.*)$', 1) AS msg
    FROM lines
    """,
)
def q152(spark, sf_dir):
    """RFC 5424 syslog header decode (SURVEY §2.2 tier-X extension): the
    `<PRI>` integer splits as facility = pri div 8, severity = pri mod 8,
    plus host and free-text message capture — ALL native regexp_extract +
    integer arithmetic, no UDF (the reference's ParseLog is a Go
    function; here the whole decode stays in whole-stage codegen).  Input
    lines are synthesized deterministically from the events fixture so
    both engines parse identical bytes."""
    ev = _t(spark, sf_dir, "events")
    raw = F.concat(
        F.lit("<"),
        ((F.col("user_id") % 24) * 8 + (F.col("event_id") % 8)).cast("string"),
        F.lit(">1 2024-01-01T00:00:00Z host-"),
        F.col("user_id").cast("string"),
        F.lit(" app - - "),
        F.col("event_type"),
    )
    lines = ev.select("event_id", raw.alias("raw"))
    pri = F.regexp_extract("raw", r"^<([0-9]+)>", 1).cast("bigint")
    return lines.select(
        "event_id",
        (pri / 8).cast("bigint").alias("facility"),
        (pri % 8).alias("severity"),
        F.regexp_extract("raw", r"^<[0-9]+>1 \S+ (\S+)", 1).alias("host"),
        F.regexp_extract("raw", r" - - (.*)$", 1).alias("msg"),
    )


@query(
    "q153_higher_moments",
    """
    SELECT event_type,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_val,
           (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
              - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
           / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
              * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
             AS skew_cents
    FROM (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s1,
             SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS s2,
             SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s3
      FROM events GROUP BY event_type
    )
    """,
)
def q153(spark, sf_dir):
    """Population SKEWNESS (ClickHouse skewPop) from exact mergeable
    moments — the q98 rule extended to the 3rd moment.  Values become
    integer cents; s1/s2/s3 are exact integer/decimal sums (associative,
    order-free, partial-aggregable map-side), and the final skew =
    m3_central / m2^1.5 is assembled from them in ONE deterministic
    double expression, identical token-for-token on both engines —
    built-in skewness() would drift by summation order at scale."""
    ev = _t(spark, sf_dir, "events")
    cents = (_dec("value") * 100).cast("bigint")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s1"),
        # widened like q212's s2: BIGINT-product SUM wraps silently in
        # non-ANSI Spark while DuckDB promotes to HUGEINT
        F.sum((cents * cents).cast("decimal(38,0)")).alias("s2"),
        F.sum((cents * cents).cast("decimal(38,0)") * cents).alias("s3"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    var = r2 - m1 * m1
    m3c = r3 - F.lit(3.0) * m1 * r2 + F.lit(2.0) * m1 * m1 * m1
    return base.select(
        "event_type",
        (m1 / F.lit(100.0)).alias("mean_val"),
        (m3c / (var * F.sqrt(var))).alias("skew_cents"),
    )


@query(
    "q154_token_budget_select",
    """
    WITH t AS (
      SELECT lang, doc_id, n_chars,
             len(string_split(text, ' ')) AS toks
      FROM documents
    ), c AS (
      SELECT lang, doc_id, toks,
             SUM(toks) OVER (PARTITION BY lang
                             ORDER BY n_chars DESC, doc_id) AS cum_toks
      FROM t
    )
    SELECT lang, doc_id, toks, CAST(cum_toks AS BIGINT) AS cum_toks
    FROM c WHERE cum_toks <= 5000
    """,
)
def q154(spark, sf_dir):
    """Token-budget corpus selection: per language, keep the best docs
    (longest-first as the quality proxy, doc_id tiebreak) until a 5 000-
    token budget is exhausted — the 'fill each language's share of the
    training mix' primitive.  A cumulative-sum window per stratum; all
    integer arithmetic.  One shuffle on lang; at 100 TB the same plan
    holds with lang → (lang, quality-bucket) pre-partitioning."""
    d = _t(spark, sf_dir, "documents")
    toks = token_count_ws(F.col("text")).alias("toks")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    c = d.select("lang", "doc_id", "n_chars", toks).withColumn(
        "cum_toks", F.sum("toks").over(w)
    )
    return c.filter(F.col("cum_toks") <= 5000).select(
        "lang", "doc_id", "toks", "cum_toks"
    )


@query(
    "q155_mixture_resample",
    """
    WITH quota AS (
      SELECT source,
             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                  THEN 15 ELSE 5 END AS q
      FROM (SELECT DISTINCT source FROM documents)
    ), ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS rn
      FROM documents
    )
    SELECT r.source, r.doc_id, q.q AS source_quota
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rn <= q.q
    """,
)
def q155(spark, sf_dir):
    """Source-mixture resampling: downsample each source to a TARGET
    WEIGHT (even-indexed sources get 3× the share of odd ones, the
    'more web, less forum' knob).  Per-source quotas are a tiny derived
    dim broadcast into a rank filter; ranking by content hash gives a
    deterministic, machine-independent shuffle (q89/q90 rule).  No RNG,
    no collect — the whole mixture policy is one broadcast join."""
    d = _t(spark, sf_dir, "documents")
    quota = (
        d.select("source")
        .distinct()
        .select(
            "source",
            F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, 15)
            .otherwise(5)
            .alias("q"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.md5(F.col("text")), F.col("doc_id"))
    ranked = d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rn") <= F.col("q"))
        .select("source", "doc_id", F.col("q").alias("source_quota"))
    )


@query(
    "q156_idf_doc_score",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, t AS token
      FROM documents, UNNEST(regexp_extract_all(lower(text), '{re}')) AS u(t)
    ), df AS (
      SELECT token, COUNT(*) AS dfreq FROM tok GROUP BY token
    ), n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT tok.doc_id,
           CAST(SUM(n.nd // df.dfreq) AS BIGINT) AS idf_score,
           COUNT(*) AS n_unique_tokens
    FROM tok JOIN df ON tok.token = df.token CROSS JOIN n
    GROUP BY tok.doc_id
    """.format(re=TOKEN_RE),
)
def q156(spark, sf_dir):
    """Integer-IDF document scoring (rarity-weighted quality, the
    KenLM-perplexity stand-in that stays EXACT): score(doc) = Σ over
    distinct tokens of N div df(token).  Integer division keeps both
    engines bit-identical where a float log-idf would drift ulps.  Plan:
    explode→distinct (one shuffle on (doc,token)), df aggregate (shuffle
    on token), broadcast N, then the token-keyed join back — at 100 TB
    the df table exceeds memory and the same plan degrades gracefully to
    a shuffled join on token, already its key."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
            ).alias("token"),
        )
        .distinct()
    )
    df_ = tok.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    n = d.agg(F.count(F.lit(1)).alias("nd"))
    return (
        tok.join(df_, "token")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum(F.floor(F.col("nd") / F.col("dfreq"))).alias("idf_score"),
            F.count(F.lit(1)).alias("n_unique_tokens"),
        )
    )


@query(
    "q157_alter_delete",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_id % 5 = 0
      AND NOT (user_id % 17 = 3 AND CAST(ts AS DATE) < DATE '2024-01-08')
    GROUP BY strftime(CAST(ts AS DATE), '%Y-%m-%d')
    """,
)
def q157(spark, sf_dir):
    """ClickHouse `ALTER TABLE ... DELETE WHERE` mutation (the GDPR
    right-to-erasure path): build a date-partitioned store, delete the
    target users' rows (user_id % 17 == 3) before 2024-01-08 via
    partition-targeted rewrite — only the seven matching day-partitions
    are rewritten, the remaining days keep their files untouched — then
    the surviving store must equal the oracle's NOT-filtered aggregate."""
    import tempfile

    from ..sources.sinks import delete_rows

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    store = scratch_dir("del_q_") + "/store"
    (
        ev.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .write.partitionBy("day")
        .parquet(store)
    )
    delete_rows(
        spark,
        store,
        (F.col("user_id") % 17 == 3) & (F.col("day") < "2024-01-08"),
        partition_col="day",
    )
    back = spark.read.parquet(store)
    return back.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q158_alter_update",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN user_id % 17 = 3 AND CAST(ts AS DATE) < DATE '2024-01-08'
                    THEN -1 ELSE user_id END) AS BIGINT) AS uid_sum
    FROM events
    WHERE event_id % 5 = 1
    GROUP BY strftime(CAST(ts AS DATE), '%Y-%m-%d')
    """,
)
def q158(spark, sf_dir):
    """ClickHouse `ALTER TABLE ... UPDATE` mutation (the pseudonymization
    path: overwrite the target users' id with a sentinel, keep their
    rows for aggregate integrity).  Partition-targeted like q157 — only
    partitions containing matches are rewritten; row COUNT must be
    unchanged while the uid sum reflects the in-place update."""
    import tempfile

    from ..sources.sinks import update_rows

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 1)
    store = scratch_dir("upd_q_") + "/store"
    (
        ev.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .write.partitionBy("day")
        .parquet(store)
    )
    update_rows(
        spark,
        store,
        (F.col("user_id") % 17 == 3) & (F.col("day") < "2024-01-08"),
        {"user_id": F.lit(-1).cast("bigint")},
        partition_col="day",
    )
    back = spark.read.parquet(store)
    return back.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("uid_sum")
    )


@query(
    "q159_overlap_chunking",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id, s AS chunk_start,
           array_to_string(list_slice(toks, s + 1, s + 50), ' ') AS chunk,
           len(list_slice(toks, s + 1, s + 50)) AS chunk_toks
    FROM t, UNNEST(range(0, CAST(n AS BIGINT), 40)) AS u(s)
    """,
)
def q159(spark, sf_dir):
    """Overlapping-window chunking (RAG / long-context training prep):
    each document splits into 50-token chunks with stride 40 (10-token
    overlap), keeping (doc_id, chunk_start) provenance.  Unlike q91's
    cross-doc packing, chunks never cross documents.  Pure narrow
    explode — no shuffle at all; the fan-out is bounded by
    ceil(tokens/stride) so executor memory stays flat at any corpus
    size."""
    d = _t(spark, sf_dir, "documents")
    toks = words(F.col("text"))
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    starts = F.sequence(
        F.lit(0).cast("bigint"),
        (F.col("n") - 1).cast("bigint"),
        F.lit(40).cast("bigint"),
    )
    exploded = t.select("doc_id", "toks", F.explode(starts).alias("s"))
    sl = F.slice(F.col("toks"), F.col("s").cast("int") + 1, 50)
    return exploded.select(
        "doc_id",
        F.col("s").alias("chunk_start"),
        F.concat_ws(" ", sl).alias("chunk"),
        F.size(sl).cast("bigint").alias("chunk_toks"),
    )


@query(
    "q160_ohlc_downsample",
    """
    SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '{tss}') AS bucket,
           event_type,
           CAST(arg_min(CAST(value AS DECIMAL(18,2)),
                        lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS DOUBLE)
             AS open,
           CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS high,
           CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS low,
           CAST(arg_max(CAST(value AS DECIMAL(18,2)),
                        lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS DOUBLE)
             AS close,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """.format(tss=TS_D),
)
def q160(spark, sf_dir):
    """Time-series OHLC downsampling (the ClickHouse
    `toStartOfFiveMinutes` + argMin/argMax resample): per 5-minute bucket
    per series, open/close via min_by/max_by on an EXACT zero-padded
    string composite key (µs ‖ event_id — unique, so no arg tie
    ambiguity, and lexicographic == numeric without the int64 overflow a
    µs·10^5+id product would hit; the q95 rule: never float composites),
    high/low as plain decimal extrema.
    One partial+final hash aggregate — min_by/max_by are mergeable, so
    the shuffle carries one row per (partition × bucket × series)."""
    ev = _t(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(
            F.date_format(F.window("ts", "5 minutes").getField("start"), TS_S).alias(
                "bucket"
            ),
            "event_type",
        )
        .agg(
            F.min_by(_dec("value"), key).cast("double").alias("open"),
            F.max(_dec("value")).cast("double").alias("high"),
            F.min(_dec("value")).cast("double").alias("low"),
            F.max_by(_dec("value"), key).cast("double").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q161_ewma",
    """
    SELECT event_id,
           list_sum(list_transform(l, (x, i) -> x * pow(0.5, len(l) - i)))
             / list_sum(list_transform(l, (x, i) -> pow(0.5, len(l) - i)))
             AS ewma8
    FROM (
      SELECT event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    """,
)
def q161(spark, sf_dir):
    """Exponentially-weighted moving average over a bounded 8-row frame
    (ClickHouse exponentialMovingAverage / pandas ewm): newest row gets
    weight 1, each older row halves.  alpha = 1/2 makes every weight an
    EXACT power of two, so the weighted sum is deterministic across
    engines (the reason alpha is 1/2 and not 0.3); both sides fold the
    frame list left-to-right.  One window shuffle on user_id; the frame
    list is O(8) per row."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-7, 0)
    arr = F.collect_list("value").over(w)
    t = ev.select("event_id", arr.alias("l"))
    n = F.size("l")
    num = F.aggregate(
        F.transform("l", lambda x, i: x * F.pow(F.lit(0.5), (n - 1 - i).cast("double"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(
        F.transform("l", lambda x, i: F.pow(F.lit(0.5), (n - 1 - i).cast("double"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return t.select("event_id", (num / den).alias("ewma8"))


@query(
    "q162_group_topn_array",
    """
    SELECT user_id,
           array_to_string(list_slice(list_sort(
             list(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)), 'DESC'),
             1, 3), ',') AS top3_cents
    FROM events GROUP BY user_id
    """,
)
def q162(spark, sf_dir):
    """ClickHouse groupArray-with-limit / topK-values analogue: per key,
    the 3 largest values emitted as ONE ordered array (serialized for the
    hash compare; exact integer cents).  collect_list has no ordering
    guarantee, so the sort happens on the collected array — bounded
    output per group regardless of group size.  At 100 TB, cap the
    collected array first with a windowed rank when groups are huge;
    here groups are small and one aggregate pass wins."""
    ev = _t(spark, sf_dir, "events")
    cents = (_dec("value") * 100).cast("bigint")
    top3 = F.slice(F.sort_array(F.collect_list(cents), asc=False), 1, 3)
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.transform(top3, lambda x: x.cast("string"))).alias(
            "top3_cents"
        )
    )


@query(
    "q163_windowed_funnel",
    """
    WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT v.user_id,
           COUNT(DISTINCT v.event_id) AS converted_views,
           strftime(MIN(p.ts), '{tsf}') AS first_completion
    FROM v
    JOIN c ON c.user_id = v.user_id
          AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 4 HOUR
    JOIN p ON p.user_id = v.user_id
          AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 4 HOUR
    GROUP BY v.user_id
    """.format(tsf=TSF_D),
)
def q163(spark, sf_dir):
    """TIME-BOUNDED funnel — ClickHouse windowFunnel(14400)(...) semantics
    (q97 is the unbounded ordered variant): view → click → purchase must
    ALL land inside 4 hours of the view.  Expressed as equi-joins on
    user_id with range conjuncts riding the hash join, so the quadratic
    term is bounded by events-per-user-per-window, not per-user totals.
    At 100 TB, pre-bucketing events by (user, hour) bounds each join's
    probe set by construction."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", F.col("ts").alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    horizon = F.col("v_ts") + F.expr("INTERVAL 4 HOURS")
    return (
        v.join(
            c,
            (F.col("c_uid") == F.col("user_id"))
            & (F.col("c_ts") > F.col("v_ts"))
            & (F.col("c_ts") <= horizon),
        )
        .join(
            p,
            (F.col("p_uid") == F.col("user_id"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= horizon),
        )
        .groupBy("user_id")
        .agg(
            F.countDistinct("event_id").alias("converted_views"),
            F.date_format(F.min("p_ts"), TSF_S).alias("first_completion"),
        )
    )


@query(
    "q164_format_strings",
    """
    SELECT event_id,
           printf('%s-%05d', event_type, user_id) AS tag,
           printf('%08.2f', CAST(value AS DOUBLE)) AS amount,
           printf('%x', event_id) AS id_hex
    FROM events WHERE event_id % 11 = 0
    """,
)
def q164(spark, sf_dir):
    """C-style string formatting (ClickHouse format/formatReadable
    family): zero-padded composite tags, fixed-width decimal rendering,
    hex ids — format_string ↔ printf share printf semantics, so the
    rendered bytes must agree exactly.  Pure narrow projection."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    return ev.select(
        "event_id",
        F.format_string("%s-%05d", F.col("event_type"), F.col("user_id")).alias("tag"),
        F.format_string("%08.2f", F.col("value")).alias("amount"),
        F.format_string("%x", F.col("event_id")).alias("id_hex"),
    )


@query(
    "q165_snapshot_store",
    """
    SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS uid_sum
    FROM events
    WHERE (event_id % 3 = 0 OR event_id % 3 = 1)
      AND NOT (event_id % 3 = 0 AND user_id % 5 = 0)
    GROUP BY event_type
    """,
)
def q165(spark, sf_dir):
    """Transactional snapshot store (`sources/snapshots.py` — the
    manifest-commit answer to sinks' rename-swap caveat): v1 = append of
    the %3==0 slice, v2 = append of the %3==1 slice, v3 = transactional
    delete-rewrite (drop uid%5==0 rows from the first slice only).  The
    latest snapshot must equal the oracle's equivalent filter; snapshot
    isolation and time travel are unit-tested in tests/test_snapshots.py."""
    import tempfile

    from ..sources.snapshots import read_snapshot, rewrite_snapshot, write_snapshot

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    path = scratch_dir("snapq_") + "/store"
    write_snapshot(ev.filter(F.col("event_id") % 3 == 0), path)
    write_snapshot(ev.filter(F.col("event_id") % 3 == 1), path)
    rewrite_snapshot(
        spark,
        path,
        lambda df: df.filter(
            ~((F.col("event_id") % 3 == 0) & (F.col("user_id") % 5 == 0))
        ),
    )
    back = read_snapshot(spark, path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("uid_sum")
    )


@query(
    "q166_snapshot_pruned_read",
    """
    SELECT user_id, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM events
    WHERE user_id BETWEEN 10 AND 19
    GROUP BY user_id
    """,
)
def q166(spark, sf_dir):
    """Manifest-level file pruning through the oracle gate: events are
    committed to the snapshot store in user_id ranges (per-file min/max
    recorded from parquet footers), then the read prunes to files whose
    stats can intersect [10, 19] BEFORE Spark opens anything — the
    Iceberg/Delta data-skipping pattern.  Pruning is advisory, so the
    real filter still applies on the frame; the oracle checks the result
    is byte-identical to an unpruned scan."""
    import tempfile

    from ..sources.snapshots import read_snapshot, write_snapshot

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    path = scratch_dir("snapprune_") + "/store"
    for lo, hi in ((0, 9), (10, 19), (20, 1 << 62)):
        write_snapshot(
            ev.filter(F.col("user_id").between(lo, hi)).coalesce(1),
            path,
            stat_cols=["user_id"],
        )
    pruned = read_snapshot(spark, path, prune=("user_id", 10, 19))
    return (
        pruned.filter(F.col("user_id").between(10, 19))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("id_sum"))
    )


@query(
    "q167_tpch_q9",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1.00 - CAST(l_discount AS DECIMAL(18,2)))
             - CAST(p_retailprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def q167(spark, sf_dir):
    """TPC-H Q9 (product-type profit), adapted: no ps_supplycost, so cost
    = p_retailprice × quantity (profit sign shifts; the shape — a 5-way
    join with a substring part filter and a two-term decimal measure
    grouped by supplier nation × order year — is intact).  The p_name
    LIKE filter prunes part at the scan and the part side broadcasts."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = _dec("l_extendedprice") * (
        F.lit(1.00).cast("decimal(18,2)") - _dec("l_discount")
    ) - _dec("p_retailprice") * _dec("l_quantity")
    return (
        F.broadcast(p)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "q168_tpch_q12",
    """
    SELECT ship_class,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                  THEN 'FAST' ELSE 'SLOW' END AS ship_class
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY ship_class
    """,
)
def q168(spark, sf_dir):
    """TPC-H Q12 (shipping modes / priority): no l_shipmode column, so
    the mode becomes a derived shipping-speed class (≤30 days = FAST).
    Shape preserved: fact-fact join + dual conditional counts per class —
    the countIf pair rides one aggregation pass."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ship_class = F.when(
        F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        "FAST",
    ).otherwise("SLOW")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(ship_class.alias("ship_class"), high.alias("is_high"))
        .groupBy("ship_class")
        .agg(
            F.count(F.when(F.col("is_high"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("is_high"), 1)).alias("low_line_count"),
        )
    )


@query(
    "q169_tpch_q16",
    """
    WITH supplies AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM supplies JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q169(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), adapted: supplies =
    distinct lineitem pairs (no partsupp); "complaint" suppliers =
    negative account balance.  Shape intact: negated predicates + IN
    list on the dim, a NOT IN anti-subquery against a second dim, and a
    COUNT(DISTINCT) over the surviving pairs."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    supplies = li.select("l_partkey", "l_suppkey").distinct()
    return (
        supplies.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q170_tpch_q20",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ), totals AS (
      SELECT l_partkey, SUM(sq) AS tq FROM shipped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM shipped JOIN totals USING (l_partkey)
      WHERE sq > 0.5 * tq
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'))
    """,
)
def q170(spark, sf_dir):
    """TPC-H Q20 (potential part promotion), adapted: no ps_availqty, so
    the "excess stock" test becomes dominance — a supplier who shipped
    MORE THAN HALF of a red part's total volume in the year.  The nested
    IN-subquery tower (supplier ← dominant pairs ← name-filtered parts)
    plans as stacked semi joins; the per-part total reuses the shipped
    aggregate's exchange (same key), and the comparison stays in exact
    decimal."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    s = _t(spark, sf_dir, "supplier")
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("sq")
    )
    totals = shipped.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dominant = (
        shipped.join(totals, "l_partkey")
        .filter(F.col("sq") > F.lit("0.5").cast("decimal(2,1)") * F.col("tq"))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
    )
    return s.join(
        dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q445_ttl_rollup",
    """
    WITH src AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CAST(ts AS DATE) < DATE '2024-01-15' AS old
      FROM events
    ), kept AS (
      SELECT day, event_type, cents, FALSE AS rolled FROM src WHERE NOT old
      UNION ALL
      SELECT day, event_type, CAST(SUM(cents) AS BIGINT) AS cents,
             TRUE AS rolled
      FROM src WHERE old GROUP BY day, event_type
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN NOT rolled THEN 1 ELSE 0 END) AS BIGINT)
             AS raw_rows_kept,
           CAST(SUM(CASE WHEN rolled THEN 1 ELSE 0 END) AS BIGINT)
             AS rolled_rows_stored,
           CAST(SUM(cents) AS BIGINT) AS cents_total
    FROM kept GROUP BY event_type ORDER BY event_type
    """,
)
def q445(spark, sf_dir):
    """CH ``TTL ... GROUP BY`` rollup — aging that AGGREGATES instead
    of deleting (``TTL ts + INTERVAL 14 DAY GROUP BY day, type SET
    cents = sum(cents)``): rows older than the cutoff collapse to one
    row per (day, type) carrying the aggregate, recent rows stay raw,
    and the additive measures are invariant across the rewrite (the
    cents_total column IS that invariant, oracle-checked).  The engine
    shape: one partition-pruned scan split by the age predicate, the
    old side one hash aggregation, then a cheap union — exactly how a
    store compaction job would rewrite aged partitions in place
    (q107/q127's machinery with an aggregate instead of a drop)."""
    ev = _t(spark, sf_dir, "events")
    src = ev.select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        (_dec("value") * 100).cast("bigint").alias("cents"),
        (F.col("ts").cast("date") < F.lit("2024-01-15").cast("date")).alias("old"),
    )
    fresh = src.filter(~F.col("old")).select(
        "day", "event_type", "cents", F.lit(False).alias("rolled")
    )
    rolled = (
        src.filter(F.col("old"))
        .groupBy("day", "event_type")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
        .select("day", "event_type", "cents", F.lit(True).alias("rolled"))
    )
    kept = fresh.unionByName(rolled)
    return (
        kept.groupBy("event_type")
        .agg(
            F.sum(F.when(~F.col("rolled"), 1).otherwise(0))
            .cast("bigint")
            .alias("raw_rows_kept"),
            F.sum(F.when(F.col("rolled"), 1).otherwise(0))
            .cast("bigint")
            .alias("rolled_rows_stored"),
            F.sum("cents").cast("bigint").alias("cents_total"),
        )
        .orderBy("event_type")
    )
