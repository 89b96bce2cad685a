"""State & media families plus the round-8 additions (q328-q361):
bitmap state/predicates/folds, wide-MV IVM, the JPEG codec family
(baseline/progressive/12-bit), media-format closures (Adam7/palette/
16-bit PNG, BMP, WAV variants, animated GIF, compressed corpora),
timing quantiles, uniqUpTo, rank statistics (Kendall, Jaro-Winkler),
IPv6/Unicode/binary codecs, graph (PageRank), morton, real resize,
audio DFT, the CH-dialect translation entry, and the token-bloom
snapshot read.

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
    "q328_group_bitmap",
    """
    WITH d AS (
      SELECT DISTINCT event_type, event_id % 4096 AS v FROM events
    ), runs AS (
      SELECT event_type, v,
             LAG(v) OVER (PARTITION BY event_type ORDER BY v) AS prev
      FROM d
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS cardinality,
           CAST(MIN(v) AS BIGINT) AS v_min,
           CAST(MAX(v) AS BIGINT) AS v_max,
           CAST(SUM(CASE WHEN prev IS NULL OR prev < v - 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
    FROM runs GROUP BY event_type
    """,
)
def q328(spark, sf_dir):
    """``groupBitmap`` analogue (`operators/bitmaps.py:group_bitmap`):
    exact compressed bitmap (canonical sorted-run encoding) of
    ``event_id % 4096`` per event_type.  The oracle re-derives the run
    STRUCTURE in SQL (LAG gap-count = number of runs) — so not just the
    cardinality but the canonical-form invariant is value-checked.
    Level 1 compresses per input partition inside mapInPandas; the one
    shuffle carries run state, never member values (the ClickHouse
    groupBitmapState merge shape)."""
    from ..operators.bitmaps import group_bitmap

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("event_id") % 4096).alias("v")
    )
    bm = group_bitmap(ev, "v", ["event_type"])
    return bm.select(
        "event_type",
        F.col("cardinality").cast("bigint").alias("cardinality"),
        F.element_at("runs", 1).alias("v_min"),
        F.element_at("runs", -1).alias("v_max"),
        (F.size("runs") / 2).cast("bigint").alias("n_runs"),
    )


@query(
    "q329_bitmap_set_algebra",
    """
    WITH a AS (
      SELECT DISTINCT event_id % 4096 AS v FROM events
      WHERE event_type = 'click'
    ), b AS (
      SELECT DISTINCT event_id % 4096 AS v FROM events
      WHERE event_type = 'view'
    )
    SELECT
      CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS card_a,
      CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS card_b,
      CAST((SELECT COUNT(*) FROM a WHERE v IN (SELECT v FROM b))
           AS BIGINT) AS and_card,
      CAST((SELECT COUNT(*) FROM (SELECT v FROM a UNION SELECT v FROM b))
           AS BIGINT) AS or_card,
      CAST((SELECT COUNT(*) FROM a WHERE v NOT IN (SELECT v FROM b))
           + (SELECT COUNT(*) FROM b WHERE v NOT IN (SELECT v FROM a))
           AS BIGINT) AS xor_card,
      CAST((SELECT COUNT(*) FROM a WHERE v NOT IN (SELECT v FROM b))
           AS BIGINT) AS andnot_card
    """,
)
def q329(spark, sf_dir):
    """``bitmapAnd/Or/Xor/AndnotCardinality`` analogue
    (`operators/bitmaps.py:bitmap_set_algebra`): build the exact bitmap
    states for the 'click' and 'view' user slices, then run two-pointer
    interval algebra ON THE STATES — O(runs_a + runs_b), members never
    re-expanded.  Both sides are single-row state frames, so the
    crossJoin is a broadcast of O(runs) bytes (the accepted
    state-singleton pattern, cf. kmv_intersect_estimate)."""
    from ..operators.bitmaps import bitmap_set_algebra, group_bitmap

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("event_id") % 4096).alias("v")
    )
    states = group_bitmap(
        ev.filter(F.col("event_type").isin("click", "view")),
        "v",
        ["event_type"],
    )
    return bitmap_set_algebra(states, "event_type", "click", "view")


@query(
    "q340_bitmap_predicates",
    """
    WITH d AS (
      SELECT DISTINCT event_type, event_id % 4096 AS v FROM events
    ), t AS (
      SELECT DISTINCT event_type FROM d
    ), runs AS (
      SELECT event_type, v,
             LAG(v) OVER (PARTITION BY event_type ORDER BY v) AS prev
      FROM d
    ), nr AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN prev IS NULL OR prev < v - 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      FROM runs GROUP BY event_type
    )
    SELECT a.event_type AS grp_a, b.event_type AS grp_b,
           EXISTS (SELECT 1 FROM d x JOIN d y ON x.v = y.v
                   WHERE x.event_type = a.event_type
                     AND y.event_type = b.event_type) AS has_any,
           NOT EXISTS (SELECT 1 FROM d y
                       WHERE y.event_type = b.event_type
                         AND y.v NOT IN (SELECT x.v FROM d x
                                         WHERE x.event_type = a.event_type))
             AS has_all,
           CAST((SELECT COUNT(*) FROM d x
                 WHERE x.event_type = a.event_type
                   AND x.v IN (SELECT y.v FROM d y
                               WHERE y.event_type = b.event_type))
                AS BIGINT) AS and_card,
           (SELECT n_runs FROM nr WHERE nr.event_type = a.event_type)
             AS n_runs_a,
           EXISTS (SELECT 1 FROM d x WHERE x.event_type = a.event_type
                   AND x.v = 777) AS contains_0,
           EXISTS (SELECT 1 FROM d x WHERE x.event_type = a.event_type
                   AND x.v = 4095) AS contains_1
    FROM t a CROSS JOIN t b
    """,
)
def q340(spark, sf_dir):
    """``bitmapHasAny`` / ``bitmapHasAll`` / ``bitmapContains`` +
    ``bitmapAndCardinality`` over every ordered pair of stored bitmap
    states (`operators/bitmaps.py:bitmap_predicate_matrix`) — the
    predicate half of the CH bitmap surface that the q328/q329
    aggregates imply, with n_runs state-size telemetry on the left
    bitmap.  The pair matrix is a broadcast self-join of O(runs) state
    rows; each predicate is an early-exit two-pointer (has_any /
    has_all) or a bisect (contains) ON STATE — members are never
    re-expanded.  The diagonal pins has_all's reflexivity; the
    off-diagonal pairs pin real subset rejections; the oracle
    re-derives every predicate relationally (EXISTS / NOT EXISTS /
    IN-count) plus the gaps-and-islands run count."""
    from ..operators.bitmaps import bitmap_predicate_matrix, group_bitmap

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("event_id") % 4096).alias("v")
    )
    states = group_bitmap(ev, "v", ["event_type"])
    return bitmap_predicate_matrix(states, "event_type", [777, 4095])


@query(
    "q330_incremental_mv_wide_state",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           round(MIN(value), 6) AS min_value,
           round(MAX(value), 6) AS max_value,
           CAST(COUNT(DISTINCT user_id % 200) AS DOUBLE) AS uniq_buckets
    FROM events
    WHERE (event_id % 3 = 0 OR event_id % 3 = 1)
      AND NOT (event_id % 3 = 0 AND user_id % 5 = 0)
    GROUP BY event_type
    """,
)
def q330(spark, sf_dir):
    """Wide AggregatingMergeTree state under TRUE incremental
    maintenance (`sources/mv.py:refresh_mv_wide_from_changefeed`):
    count/sum PLUS minState/maxState and uniqState (mergeable KMV hash
    array, re-trimmed to k on every merge).  Same v1-append-v2-erase-v3
    choreography as q271; the non-invertible min/max/uniq states merge
    mergeably on the append and are recomputed ONLY for delete-touched
    groups on the erasure (bounded partial rescan — the honest IVM
    cost for non-distributive aggregates).  Final state must equal a
    full recompute: n, exact sum, min/max of value, and the uniq
    estimate.  The tracked uniq key is user_id % 200, whose per-group
    cardinality stays below k at EVERY fixture scale, so the sketch IS
    the distinct set and the oracle pins it exactly (sf0.1 has ~1500
    distinct raw users per type — above k — which the multi-scale
    sweep caught; the approximate-regime behavior of the same KMV
    state is envelope-pinned by q272/q244)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..sources.mv import (
        finalize_uniq,
        read_mv,
        refresh_mv_wide,
        refresh_mv_wide_from_changefeed,
    )
    from ..sources.snapshots import rewrite_snapshot, write_snapshot

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        "value",
        (F.col("user_id") % 200).alias("uid_bucket"),
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    base = os.path.join(
        tempfile.gettempdir(), f"syslog_spark_mv_q330_{tag}"
    )
    shutil.rmtree(base, ignore_errors=True)
    src_path = base + "/source"
    mv_path = base + "/mv"

    s1 = ev.filter(F.col("event_id") % 3 == 0)
    write_snapshot(s1, src_path)  # v1
    refresh_mv_wide(
        s1, mv_path, ["event_type"], ["event_id"], ["value"], ["uid_bucket"],
        batch_id=1,
    )
    write_snapshot(ev.filter(F.col("event_id") % 3 == 1), src_path)  # v2
    refresh_mv_wide_from_changefeed(
        spark, mv_path, src_path, ["event_type"], ["event_id"], ["value"],
        ["uid_bucket"], 1, 2, batch_id=2,
    )
    rewrite_snapshot(  # v3: transactional erasure
        spark,
        src_path,
        lambda df: df.filter(
            ~((F.col("event_id") % 3 == 0) & (F.col("user_id") % 5 == 0))
        ),
    )
    refresh_mv_wide_from_changefeed(
        spark, mv_path, src_path, ["event_type"], ["event_id"], ["value"],
        ["uid_bucket"], 2, 3, batch_id=3,
    )

    state = read_mv(spark, mv_path)
    return state.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_event_id").cast("bigint").alias("sum_event_id"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        finalize_uniq(state, "uid_bucket").alias("uniq_buckets"),
    )


@query(
    "q331_jpeg_pixel_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 37) + 16 AS w,
             (doc_id % 19) + 12 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c,
             CASE ((doc_id // 11) % 3)
               WHEN 0 THEN 'plain' WHEN 1 THEN 'sub' ELSE 'rst' END AS variant
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT doc_id, variant,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(w * h * c AS BIGINT) AS n_values,
           CASE WHEN c = 1
                THEN CAST(40 * w * h + h * w * (w - 1)
                          + 3 * w * h * (h - 1) / 2 AS BIGINT)
                ELSE NULL END AS gray_px_sum,
           TRUE AS mean_ok,
           TRUE AS minmax_ok
    FROM d
    """,
)
def q331(spark, sf_dir):
    """REAL baseline-JPEG entropy decode round trip — closes the last
    'partial' inventory cell (`operators/jpeg.py`: Huffman decode →
    dequantize → IDCT → chroma upsample → YCbCr→RGB, stdlib+numpy).

    Executor-side, each selected doc builds a genuinely valid SOF0
    JPEG of a linear-gradient image; doc_id cycles the encode variants
    so 4:4:4, 4:2:0 subsampling, AND restart-marker streams all hit
    the decoder.  The file then flows through the SAME distributed
    decode path as PNG/GIF/WAV (`decode_assets`, Arrow-batched
    mapInPandas — bytes never on the driver, O(1) per asset).

    Oracle strength is split by what JPEG mathematics permits:
    grayscale fixtures encode at quality 100 where every quantization
    step is 1, so the decode is BIT-EXACT and the oracle pins the
    closed-form pixel sum (verified exhaustively over all 703 (w, h)
    fixture shapes × both restart variants in tests).  Color fixtures
    encode at quality 85 and the oracle pins dimensions/counts exactly
    plus mean-within-2.0 and min/max-within-4 booleans — the honest
    bound for a lossy codec (measured worst-case mean drift over the
    fixture sweep: 0.20)."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 37 + 16, d % 19 + 12
                c = 1 if d % 2 == 0 else 3
                v = (d // 11) % 3
                if c == 1:
                    px = bytes(
                        (40 + 2 * x + 3 * y)
                        for y in range(h)
                        for x in range(w)
                    )
                    payloads.append(
                        encode_jpeg(
                            px, w, h, 1, quality=100,
                            restart_interval=2 if v == 2 else 0,
                        )
                    )
                else:
                    buf = bytearray()
                    for y in range(h):
                        for x in range(w):
                            buf += bytes(
                                (40 + 2 * x + y, 200 - x - 2 * y,
                                 30 + x + 3 * y)
                            )
                    payloads.append(
                        encode_jpeg(
                            bytes(buf), w, h, 3, quality=85,
                            subsample=(v == 1),
                            restart_interval=2 if v == 2 else 0,
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)

    w = F.col("width").cast("long")
    h = F.col("height").cast("long")
    c = F.col("channels").cast("long")
    variant = (
        F.when((F.col("doc_id") / 11).cast("long") % 3 == 0, "plain")
        .when((F.col("doc_id") / 11).cast("long") % 3 == 1, "sub")
        .otherwise("rst")
    )
    exp_mean = F.when(
        c == 1,
        F.lit(40.0) + (w - 1).cast("double") + 1.5 * (h - 1).cast("double"),
    ).otherwise(
        F.lit(90.0)
        + ((w - 1) + (h - 1)).cast("double") / 3.0
    )
    exp_min = F.when(c == 1, F.lit(40)).otherwise(F.lit(30)).cast("long")
    exp_max = F.when(c == 1, 40 + 2 * (w - 1) + 3 * (h - 1)).otherwise(
        F.greatest(
            F.lit(200).cast("long"),
            40 + 2 * (w - 1) + (h - 1),
            30 + (w - 1) + 3 * (h - 1),
        )
    )
    mean = F.col("val_sum").cast("double") / F.col("n_values").cast("double")
    return dec.select(
        "doc_id",
        variant.alias("variant"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.when(c == 1, F.col("val_sum"))
        .cast("bigint")
        .alias("gray_px_sum"),
        (F.abs(mean - exp_mean) <= 2.0).alias("mean_ok"),
        (
            (F.col("val_min") >= exp_min - 4)
            & (F.col("val_min") <= exp_min + 4)
            & (F.col("val_max") >= exp_max - 4)
            & (F.col("val_max") <= exp_max + 4)
        ).alias("minmax_ok"),
    )


@query(
    "q332_summap_family",
    """
    WITH g AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s,
             MIN(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS mn,
             MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           string_agg(event_type, ',' ORDER BY event_type) AS mkeys,
           string_agg(CAST(s AS VARCHAR), ',' ORDER BY event_type) AS msum,
           string_agg(CAST(mn AS VARCHAR), ',' ORDER BY event_type) AS mmin,
           string_agg(CAST(mx AS VARCHAR), ',' ORDER BY event_type) AS mmax
    FROM g GROUP BY day
    """,
)
def q332(spark, sf_dir):
    """ClickHouse ``sumMap`` / ``minMap`` / ``maxMap`` — the Map
    combinators that aggregate (keys[], values[]) pairs KEY-WISE.  The
    Spark-first shape is the relational dual: aggregate per (group,
    key) first — one hash aggregate, partial-agg friendly, the form
    Catalyst optimizes — then assemble the CH-style parallel
    key-sorted arrays per group (exported as CSV per the repo's
    engine-neutral array convention, q16 precedent).  This beats a
    literal map-valued UDAF because the per-key partials merge
    associatively in the exchange instead of shipping whole maps."""
    ev = _t(spark, sf_dir, "events")
    cents = (_dec("value") * 100).cast("bigint")
    g = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
    ).agg(
        F.sum(cents).alias("s"),
        F.min(cents).alias("mn"),
        F.max(cents).alias("mx"),
    )
    ent = F.struct("event_type", "s", "mn", "mx")
    arr = F.array_sort(F.collect_list(ent))
    return g.groupBy("day").agg(arr.alias("a")).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.concat_ws(
            ",", F.transform("a", lambda e: e["event_type"])
        ).alias("mkeys"),
        F.concat_ws(
            ",", F.transform("a", lambda e: e["s"].cast("string"))
        ).alias("msum"),
        F.concat_ws(
            ",", F.transform("a", lambda e: e["mn"].cast("string"))
        ).alias("mmin"),
        F.concat_ws(
            ",", F.transform("a", lambda e: e["mx"].cast("string"))
        ).alias("mmax"),
    )


@query(
    "q333_interval_length_sum",
    """
    WITH iv AS (
      SELECT l_suppkey % 50 AS grp,
             CAST(epoch(l_shipdate) AS BIGINT) / 86400 AS s,
             CAST(epoch(l_shipdate) AS BIGINT) / 86400
               + l_linenumber * 3 AS e
      FROM lineitem
    ), sw AS (
      SELECT grp, s, e,
             MAX(e) OVER (PARTITION BY grp ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS cm
      FROM iv
    )
    SELECT grp,
           CAST(SUM(CASE WHEN cm IS NULL OR s > cm THEN e - s
                         WHEN e > cm THEN e - cm ELSE 0 END)
                AS BIGINT) AS union_days,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(CASE WHEN cm IS NULL OR s > cm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_segments
    FROM sw GROUP BY grp
    """,
)
def q333(spark, sf_dir):
    """ClickHouse ``intervalLengthSum`` — total length of the UNION of
    per-group intervals, overlaps merged.  One sort per group does it:
    sweep in start order keeping the running max of prior ends (an
    exclusive-frame window cummax); each interval contributes only the
    part past that watermark, and a contribution starting fresh opens a
    new segment (``n_segments`` = merged-interval count, the
    ``intervalCount`` sibling).  Exact integer day arithmetic; one
    window sort + one aggregate, both on the same (grp) partitioning —
    no per-pair interval join anywhere, so it scales with rows, not
    rows²."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    day = (F.unix_timestamp("l_shipdate") / 86400).cast("bigint")
    iv = li.select(
        (F.col("l_suppkey") % 50).alias("grp"),
        day.alias("s"),
        (day + F.col("l_linenumber") * 3).alias("e"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sw = iv.withColumn("cm", F.max("e").over(w))
    fresh = F.col("cm").isNull() | (F.col("s") > F.col("cm"))
    contrib = (
        F.when(fresh, F.col("e") - F.col("s"))
        .when(F.col("e") > F.col("cm"), F.col("e") - F.col("cm"))
        .otherwise(F.lit(0))
    )
    return sw.groupBy("grp").agg(
        F.sum(contrib).cast("bigint").alias("union_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(fresh.cast("int")).cast("bigint").alias("n_segments"),
    )


@query(
    "q334_dedup_components",
    _DUP_UNION.replace("WITH corpus", "WITH RECURSIVE corpus", 1)
    + """
    , consts AS (
      SELECT {a_list} AS ha, {b_list} AS hb
    ), sh AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> CAST('0x' || substr(md5(array_to_string(
                      list_slice(string_split(text, ' '), i, i + 2), ' ')), 1, 15)
                    AS BIGINT)
             )) AS shl
      FROM corpus
    ), sig AS (
      SELECT doc,
             list_transform(range(0, 64), k ->
               list_min(list_transform(shl, x ->
                 ((x % 2147483647) * ha[k + 1] + hb[k + 1]) % 2147483647))
             ) AS sig
      FROM sh CROSS JOIN consts WHERE len(shl) > 0
    ), bands AS (
      SELECT doc, b AS band,
             CAST('0x' || substr(md5(array_to_string(
               list_slice(sig, b * 4 + 1, b * 4 + 4), '|')), 1, 15) AS BIGINT) AS bh
      FROM sig, UNNEST(range(0, 16)) AS t(b)
    ), cand AS (
      SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
      FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc < y.doc
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), reach(node, r) AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ), comp AS (
      SELECT node, MIN(r) AS comp FROM reach GROUP BY node
    )
    SELECT node AS doc_id, comp,
           CAST(COUNT(*) OVER (PARTITION BY comp) AS BIGINT)
             AS cluster_size,
           CAST(node = comp AS BOOLEAN) AS is_canonical
    FROM comp
    """.format(
        a_list=list(dedup._MINHASH_A), b_list=list(dedup._MINHASH_B)
    ),
)
def q334(spark, sf_dir):
    """Near-dup DEDUP CLUSTERS: connected components over the MinHash-
    LSH candidate graph (`operators/dedup.py:dedup_components` —
    alternating large-star/small-star contraction, Kiveris et al. 2014;
    the per-round join input SHRINKS toward one star per component, 1-2
    rounds on near-clique dup clusters).  This is the step a real
    corpus-dedup pipeline runs after q39: candidate PAIRS are not
    transitive-closed, so cluster membership — and the keep-one-doc
    policy (``is_canonical`` = min-id member) — needs the closure.
    Candidates come from ``minhash_lsh_star_edges`` (round 13): per
    band bucket one (min, member) edge per member instead of all
    within-bucket pairs — Σb instead of Σb², linear under boilerplate
    bucket skew, SAME transitive closure.  The oracle recomputes the
    full PAIR graph bit-for-bit (q39's portable-hash chain) and closes
    it with a recursive CTE — identical per-doc component ids, sizes,
    and canonical flags, which is exactly the invariance the star-edge
    rewrite claims."""
    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    pairs = dedup.minhash_lsh_star_edges(corpus, "text", "doc_id")
    comp = dedup.dedup_components(pairs)
    from pyspark.sql.window import Window

    return comp.select(
        F.col("node").alias("doc_id"),
        "comp",
        F.count(F.lit(1))
        .over(Window.partitionBy("comp"))
        .cast("bigint")
        .alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )


@query(
    "q335_rare_bigram_novelty",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ts
      FROM documents
    ), bg AS (
      SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bigram
      FROM tok, UNNEST(range(1, len(ts))) AS t(i)
      WHERE len(ts) >= 2
    ), cnt AS (
      SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(MIN(c.c) AS BIGINT) AS min_freq,
           CAST(MAX(c.c) AS BIGINT) AS max_freq,
           CAST(floor(CAST(SUM(CASE WHEN c.c <= 2 THEN 1 ELSE 0 END)
                           AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5)
                AS BIGINT) AS novelty_ppm
    FROM bg b JOIN cnt c ON b.bigram = c.bigram
    GROUP BY b.doc_id
    """,
)
def q335(spark, sf_dir):
    """Corpus-relative NOVELTY scoring — the bigram-LM quality signal
    with the float log floor removed: per doc, the fraction of its
    bigrams that are globally rare (corpus-wide count ≤ 2), plus its
    min/max bigram frequency.  Low novelty flags boilerplate /
    near-dup text; high novelty flags unusual (or noisy) text — the
    same decision axis as perplexity filtering, in exact integer
    arithmetic (counts + a ppm ratio via the IEEE floor form), so the
    oracle is bit-for-bit.

    Two scans of the exploded bigram frame share one shuffle key: the
    corpus count aggregates on bigram, and the doc join probes the same
    partitioning; the count table is zipf-concentrated so AQE handles
    the hot-bigram skew.  At 100 TB the counts frame is
    vocabulary²-bounded (zipf-truncated), not corpus-bounded."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tok = d.select("doc_id", toks.alias("ts")).filter(F.size("ts") >= 2)
    bg = tok.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("ts", i), F.element_at("ts", i + 1)
                ),
            )
        ).alias("bigram"),
    )
    cnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    rare_frac = F.sum(
        F.when(F.col("c") <= 2, 1).otherwise(0)
    ).cast("double") / F.count(F.lit(1)).cast("double")
    return (
        bg.join(cnt, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.min("c").cast("bigint").alias("min_freq"),
            F.max("c").cast("bigint").alias("max_freq"),
            F.floor(rare_frac * 1000000.0 + 0.5)
            .cast("bigint")
            .alias("novelty_ppm"),
        )
    )


@query(
    "q336_max_intersections",
    """
    WITH iv AS (
      SELECT l_suppkey % 50 AS grp,
             CAST(epoch(l_shipdate) AS BIGINT) / 86400 AS s,
             CAST(epoch(l_shipdate) AS BIGINT) / 86400
               + l_linenumber * 3 AS e
      FROM lineitem
    ), ev AS (
      SELECT grp, pos, SUM(delta) AS d FROM (
        SELECT grp, s AS pos, 1 AS delta FROM iv
        UNION ALL
        SELECT grp, e + 1 AS pos, -1 AS delta FROM iv
      ) GROUP BY grp, pos
    ), run AS (
      SELECT grp, pos,
             SUM(d) OVER (PARTITION BY grp ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS depth
      FROM ev
    )
    SELECT grp,
           CAST(MAX(depth) AS BIGINT) AS max_intersections,
           CAST(MIN(CASE WHEN depth = md THEN pos END) AS BIGINT)
             AS max_position
    FROM (SELECT *, MAX(depth) OVER (PARTITION BY grp) AS md FROM run)
    GROUP BY grp
    """,
)
def q336(spark, sf_dir):
    """ClickHouse ``maxIntersections`` / ``maxIntersectionsPosition`` —
    the PEAK number of concurrently open intervals per group and the
    earliest position where the peak occurs (q333's union-length
    sibling; together they cover the CH interval-aggregate pair).
    Sweep-line as +1/-1 deltas COLLAPSED per position first (so
    same-position ties cannot produce an order-dependent intermediate
    depth), then one running sum and one max — two window passes on the
    same (grp, pos) sort, linear in rows."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    day = (F.unix_timestamp("l_shipdate") / 86400).cast("bigint")
    iv = li.select(
        (F.col("l_suppkey") % 50).alias("grp"),
        day.alias("s"),
        (day + F.col("l_linenumber") * 3).alias("e"),
    )
    deltas = iv.select("grp", F.col("s").alias("pos"), F.lit(1).alias("delta")).unionByName(
        iv.select("grp", (F.col("e") + 1).alias("pos"), F.lit(-1).alias("delta"))
    )
    ev = deltas.groupBy("grp", "pos").agg(F.sum("delta").alias("d"))
    w = (
        Window.partitionBy("grp")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = ev.withColumn("depth", F.sum("d").over(w)).withColumn(
        "md", F.max("depth").over(Window.partitionBy("grp"))
    )
    return run.groupBy("grp").agg(
        F.max("depth").cast("bigint").alias("max_intersections"),
        F.min(F.when(F.col("depth") == F.col("md"), F.col("pos")))
        .cast("bigint")
        .alias("max_position"),
    )


@query(
    "q337_corpus_mixture_apportionment",
    """
    WITH dom AS (
      SELECT 'dom_' || CAST(doc_id % 7 AS VARCHAR) AS domain,
             COUNT(*) AS n_docs,
             SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
               AS n_tokens
      FROM documents GROUP BY 1
    ), wts AS (
      -- temperature-scaled weight ~ sqrt(n_tokens), exact integer sqrt
      SELECT domain, n_docs, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
      FROM dom
    ), tot AS (
      SELECT SUM(w) AS tw FROM wts
    ), quo AS (
      -- exact integer quotient: subtract the modulus first, so the
      -- float division is of an exactly-divisible int64 (< 2^53)
      SELECT domain, n_docs, n_tokens, w,
             CAST(((w * 100000) - ((w * 100000) % tw)) / tw AS BIGINT)
               AS floor_share,
             (w * 100000) % tw AS remainder
      FROM wts CROSS JOIN tot
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY remainder DESC, domain)
               AS rem_rank,
             100000 - SUM(floor_share) OVER () AS leftover
      FROM quo
    )
    SELECT domain,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(w AS BIGINT) AS weight,
           CAST(floor_share + CASE WHEN rem_rank <= leftover
                                   THEN 1 ELSE 0 END AS BIGINT)
             AS budget_per_100k
    FROM ranked
    """,
)
def q337(spark, sf_dir):
    """Training-corpus MIXTURE apportionment — the data-mixing step a
    corpus pipeline runs before sampling: per-domain weights from a
    temperature-scaled size law (here w = floor(sqrt(tokens)), the
    alpha = 0.5 mixing used to up-weight small domains), turned into an
    EXACT integer budget per 100 000 sampled docs by largest-remainder
    (Hamilton) apportionment: every domain gets floor(w·N/W), and the
    leftover seats go to the largest remainders (domain-name
    tie-break).  Shares sum to exactly N by construction — no float
    normalization drift, so the oracle is bit-exact.  The whole thing
    runs on the domain-cardinality frame: one aggregate over the
    corpus, then window arithmetic on a handful of rows."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    dom = d.groupBy(
        F.concat(F.lit("dom_"), (F.col("doc_id") % 7).cast("string")).alias(
            "domain"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    wts = dom.withColumn(
        "w", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint")
    )
    tot = wts.agg(F.sum("w").alias("tw"))
    quo = wts.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "n_tokens",
        "w",
        (
            ((F.col("w") * 100000) - ((F.col("w") * 100000) % F.col("tw")))
            / F.col("tw")
        )
        .cast("bigint")
        .alias("floor_share"),
        ((F.col("w") * 100000) % F.col("tw")).alias("remainder"),
    )
    wall = Window.orderBy(F.col("remainder").desc(), F.col("domain"))
    ranked = quo.select(
        "*",
        F.row_number().over(wall).alias("rem_rank"),
        (
            F.lit(100000)
            - F.sum("floor_share").over(
                Window.partitionBy()
            )
        ).alias("leftover"),
    )
    return ranked.select(
        "domain",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("w").cast("bigint").alias("weight"),
        (
            F.col("floor_share")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("budget_per_100k"),
    )


@query(
    "q338_jpeg_progressive_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 37) + 16 AS w,
             (doc_id % 19) + 12 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(w * h * c AS BIGINT) AS n_values,
           CASE WHEN c = 1
                THEN CAST(40 * w * h + h * w * (w - 1)
                          + 3 * w * h * (h - 1) / 2 AS BIGINT)
                ELSE NULL END AS gray_px_sum,
           TRUE AS mean_ok
    FROM d
    """,
)
def q338(spark, sf_dir):
    """PROGRESSIVE-JPEG (SOF2) decode through the shared distributed
    path — multi-scan Huffman decode with general EOB runs, and BOTH
    progressive axes: docs alternate between plain spectral selection
    and full successive approximation (Al=1 first scans + raw-bit DC
    refinement + correction-bit AC refinement,
    `operators/jpeg.py:_decode_jpeg_progressive`).  Same
    construct-then-decode oracle split as q331: grayscale at quality
    100 is BIT-exact (the entropy layer is lossless — progressive ==
    baseline decode in both modes, unit-pinned), so the oracle pins
    the closed-form pixel sum; color at quality 85 pins dims/counts
    plus the mean tolerance boolean."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg_progressive
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 37 + 16, d % 19 + 12
                succ = (d // 13) % 2 == 1  # alternate both SOF2 axes
                if d % 2 == 0:
                    px = bytes(
                        (40 + 2 * x + 3 * y)
                        for y in range(h)
                        for x in range(w)
                    )
                    payloads.append(
                        encode_jpeg_progressive(
                            px, w, h, 1, quality=100, successive=succ
                        )
                    )
                else:
                    buf = bytearray()
                    for y in range(h):
                        for x in range(w):
                            buf += bytes(
                                (40 + 2 * x + y, 200 - x - 2 * y,
                                 30 + x + 3 * y)
                            )
                    payloads.append(
                        encode_jpeg_progressive(
                            bytes(buf), w, h, 3, quality=85, successive=succ
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    w = F.col("width").cast("long")
    h = F.col("height").cast("long")
    c = F.col("channels").cast("long")
    exp_mean = F.when(
        c == 1,
        F.lit(40.0) + (w - 1).cast("double") + 1.5 * (h - 1).cast("double"),
    ).otherwise(
        F.lit(90.0) + ((w - 1) + (h - 1)).cast("double") / 3.0
    )
    mean = F.col("val_sum").cast("double") / F.col("n_values").cast("double")
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.when(c == 1, F.col("val_sum")).cast("bigint").alias("gray_px_sum"),
        (F.abs(mean - exp_mean) <= 2.0).alias("mean_ok"),
    )


@query(
    "q339_jpeg_prog420_dri_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 31) + 18 AS w,
             (doc_id % 23) + 14 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 17 = 0
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(w * h * c AS BIGINT) AS n_values,
           CASE WHEN c = 1
                THEN CAST(40 * w * h + h * w * (w - 1)
                          + 3 * w * h * (h - 1) / 2 AS BIGINT)
                ELSE NULL END AS gray_px_sum,
           TRUE AS mean_ok
    FROM d
    """,
)
def q339(spark, sf_dir):
    """PROGRESSIVE-JPEG decode, SUBSAMPLED + RESTART-INTERVAL variants
    (`operators/jpeg.py:_decode_jpeg_progressive`): every payload
    carries DRI + per-scan RSTn (interval (doc_id % 3) + 1 — DC
    predictors/EOB runs reset, reader re-aligns, modulo-8 count per
    scan); odd doc_ids are 4:2:0 color (interleaved DC scans on the
    MCU grid, non-interleaved AC scans on each component's own block
    grid), alternating both SOF2 axes.  Same construct-then-decode
    oracle split as q331/q338: grayscale quality-100 pins the exact
    closed-form pixel sum (entropy layer lossless — progressive-with-
    DRI == baseline decode, unit-pinned); 4:2:0 color at quality 85
    pins dims/counts + channel-mean tolerance."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg_progressive
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 31 + 18, d % 23 + 14
                succ = (d // 17) % 2 == 1  # alternate both SOF2 axes
                ri = d % 3 + 1  # always emit DRI + RSTn
                if d % 2 == 0:
                    px = bytes(
                        (40 + 2 * x + 3 * y)
                        for y in range(h)
                        for x in range(w)
                    )
                    payloads.append(
                        encode_jpeg_progressive(
                            px, w, h, 1, quality=100, successive=succ,
                            restart_interval=ri,
                        )
                    )
                else:
                    buf = bytearray()
                    for y in range(h):
                        for x in range(w):
                            buf += bytes(
                                (40 + 2 * x + y, 200 - x - 2 * y,
                                 30 + x + 3 * y)
                            )
                    payloads.append(
                        encode_jpeg_progressive(
                            bytes(buf), w, h, 3, quality=85,
                            successive=succ, subsample=True,
                            restart_interval=ri,
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    w = F.col("width").cast("long")
    h = F.col("height").cast("long")
    c = F.col("channels").cast("long")
    exp_mean = F.when(
        c == 1,
        F.lit(40.0) + (w - 1).cast("double") + 1.5 * (h - 1).cast("double"),
    ).otherwise(
        F.lit(90.0) + ((w - 1) + (h - 1)).cast("double") / 3.0
    )
    mean = F.col("val_sum").cast("double") / F.col("n_values").cast("double")
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.when(c == 1, F.col("val_sum")).cast("bigint").alias("gray_px_sum"),
        (F.abs(mean - exp_mean) <= 2.0).alias("mean_ok"),
    )


@query(
    "q341_quantile_timing",
    """
    WITH t AS (
      SELECT event_type,
             CASE WHEN v < 1024 THEN v
                  WHEN v < 65536 THEN v - (v % 16)
                  ELSE 65535 END AS bucket
      FROM (SELECT event_type,
                   GREATEST(0, CAST(FLOOR(value * 997) AS BIGINT)) AS v
            FROM events)
    ), c AS (
      SELECT event_type, bucket, COUNT(*) AS cnt FROM t GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bucket,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM c
    )
    SELECT event_type,
           CAST(MAX(total) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bucket END)
                AS BIGINT) AS qt_0_5,
           CAST(MIN(CASE WHEN cum >= CEIL(0.9 * total) THEN bucket END)
                AS BIGINT) AS qt_0_9,
           CAST(MIN(CASE WHEN cum >= CEIL(0.99 * total) THEN bucket END)
                AS BIGINT) AS qt_0_99
    FROM cum GROUP BY event_type
    """,
)
def q341(spark, sf_dir):
    """``quantileTiming`` analogue
    (`operators/sketches.py:timing_quantiles`): exact mergeable bucket
    histogram with the CH timing bucket map — values < 1024 exact,
    [1024, 65536) in 16-wide buckets (lower-bound representative),
    >= 65536 saturating at 65535.  Fully native plan: one partial-agg
    hash aggregate to <= 5057 bounded buckets per group (the exchange
    carries bucket state, never raw timings), one window cumsum, then
    min-bucket at rank ceil(q*N).  Deterministic integers, so the
    oracle (same bucket arithmetic in SQL) matches exactly — no
    tolerance."""
    from ..operators.sketches import timing_quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 997).cast("long").alias("ms"),
    )
    out = timing_quantiles(ev, "ms", ["event_type"], [0.5, 0.9, 0.99])
    return out.select(
        "event_type",
        "n",
        F.col("qt_0_5").cast("bigint").alias("qt_0_5"),
        F.col("qt_0_9").cast("bigint").alias("qt_0_9"),
        F.col("qt_0_99").cast("bigint").alias("qt_0_99"),
    )


@query(
    "q342_uniq_up_to",
    """
    SELECT event_type,
           CAST(LEAST(COUNT(DISTINCT user_id), 11) AS BIGINT)
             AS uniq_users_upto10,
           CAST(LEAST(COUNT(DISTINCT event_id % 7), 11) AS BIGINT)
             AS uniq_mod7_upto10
    FROM events GROUP BY event_type
    """,
)
def q342(spark, sf_dir):
    """``uniqUpTo(10)`` analogue (`operators/sketches.py:uniq_up_to`):
    exact distinct count while <= N, saturating at N+1 — the everyday
    CH guard aggregate for "are there more than N of these".  Two-level
    capped-set state: each (partition, group) keeps at most N+1
    distinct longs (11 here) no matter the input cardinality, so the
    one shuffle carries bounded state, never raw values.  Two axes pin
    both sides of the cap: user_id saturates at 11; event_id % 7 stays
    exact at 7."""
    from ..operators.sketches import uniq_up_to

    ev = _t(spark, sf_dir, "events")
    a = uniq_up_to(ev, "user_id", ["event_type"], 10).withColumnRenamed(
        "uniq_up_to", "uniq_users_upto10"
    )
    b = uniq_up_to(
        ev.select("event_type", (F.col("event_id") % 7).alias("m7")),
        "m7",
        ["event_type"],
        10,
    ).withColumnRenamed("uniq_up_to", "uniq_mod7_upto10")
    return a.join(b, "event_type").select(
        "event_type", "uniq_users_upto10", "uniq_mod7_upto10"
    )


@query(
    "q343_media_adam7_float_wav",
    """
    WITH d AS (
      SELECT doc_id,
             doc_id % 3 AS form,
             (doc_id % 31) + 4 AS w,
             (doc_id % 17) + 2 AS h,
             CASE WHEN CAST(doc_id / 19 AS BIGINT) % 2 = 0
                  THEN 1 ELSE 3 END AS c,
             (doc_id % 500) + 50 AS ns
      FROM documents WHERE doc_id % 19 = 0
    ), e AS (
      SELECT d.*, CASE WHEN form = 0 THEN w * h * c ELSE ns END AS n
      FROM d
    ), v AS (
      SELECT e.doc_id, e.form,
             CASE WHEN e.form = 0 THEN (e.doc_id * 7 + 13 * t.k) % 251
                  WHEN e.form = 1 THEN ((e.doc_id + 31 * t.k) % 2001) - 1000
                  ELSE ((e.doc_id * 11 + 97 * t.k) % 160001) - 80000
             END AS val
      FROM e, LATERAL (SELECT unnest(range(0, e.n)) AS k) t
    )
    SELECT doc_id,
           CASE WHEN form = 0 THEN 'png' ELSE 'wav' END AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(val) AS BIGINT) AS val_sum,
           CAST(MIN(val) AS BIGINT) AS val_min,
           CAST(MAX(val) AS BIGINT) AS val_max
    FROM v GROUP BY doc_id, form
    """,
)
def q343(spark, sf_dir):
    """Round-8 media-format closures through the shared distributed
    decode path: ADAM7-INTERLACED PNG (seven independently filtered
    sub-images de-interleaved onto the 8x8 pass grid, default filter
    cycling 0..4 across pass rows — `multimodal.decode_png_pixels`),
    IEEE-FLOAT WAV (format tag 3, float32 — integer-valued fixtures so
    the stat reduction stays exact), and PACKED 24-BIT PCM WAV
    (vectorized pad-and-shift widening).  Same construct-then-decode
    oracle as q224/q228: executor-built fixtures follow closed-form
    arithmetic patterns; decoded value statistics must equal the
    oracle's direct computation over the same pattern.  Per-asset
    output O(1), bytes never on the driver."""
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_png, encode_wav

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 19 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                form = d % 3
                if form == 0:
                    w, h = d % 31 + 4, d % 17 + 2
                    c = 1 if (d // 19) % 2 == 0 else 3
                    px = bytes(
                        (d * 7 + 13 * k) % 251 for k in range(w * h * c)
                    )
                    payloads.append(encode_png(px, w, h, c, interlace=True))
                elif form == 1:
                    ns = d % 500 + 50
                    samples = np.array(
                        [((d + 31 * k) % 2001) - 1000 for k in range(ns)],
                        dtype=np.float32,
                    )
                    payloads.append(
                        encode_wav(samples, 48000, 1, fmt="float32")
                    )
                else:
                    ns = d % 500 + 50
                    samples = [
                        ((d * 11 + 97 * k) % 160001) - 80000
                        for k in range(ns)
                    ]
                    payloads.append(
                        encode_wav(samples, 44100, 1, fmt="pcm24")
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        "kind",
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q344_media_palette_png_bmp",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 29) + 3 AS w,
             (doc_id % 13) + 2 AS h
      FROM documents WHERE doc_id % 23 = 0
    ), v AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 2 = 0
                  THEN (((d.doc_id * 3 + 5 * (t.k // 3)) % 16)
                        * 17 + (t.k % 3) * 5 + d.doc_id) % 256
                  ELSE (d.doc_id * 7 + 13 * t.k) % 251
             END AS val
      FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * 3)) AS k) t
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(val) AS BIGINT) AS val_sum,
           CAST(MIN(val) AS BIGINT) AS val_min,
           CAST(MAX(val) AS BIGINT) AS val_max
    FROM v GROUP BY doc_id
    """,
)
def q344(spark, sf_dir):
    """PALETTE-PNG (color type 3, PLTE expansion, alternating Adam7)
    and BMP (24/32-bit BGR(X), alternating bottom-up/top-down, 4-byte
    row padding) through the shared distributed decode path
    (`multimodal.decode_png_pixels` type-3 branch,
    `multimodal.decode_bmp_pixels`).  Even docs build a 16-entry
    palette whose triples and index raster both follow closed-form
    arithmetic, so the EXPANDED RGB statistics are SQL-computable; odd
    docs carry the q224 pixel pattern through the BMP container
    layouts.  A decoder that mis-expanded the palette, dropped the BGR
    swap, misread row padding, or flipped rows the wrong way would
    break the exact sums."""
    import pandas as pd

    from ..operators.multimodal import (
        decode_assets,
        encode_bmp,
        encode_png_palette,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 29 + 3, d % 13 + 2
                alt = (d // 23) % 2 == 1
                if d % 2 == 0:
                    palette = bytes(
                        (i * 17 + j * 5 + d) % 256
                        for i in range(16)
                        for j in range(3)
                    )
                    indices = bytes(
                        (d * 3 + 5 * p) % 16 for p in range(w * h)
                    )
                    payloads.append(
                        encode_png_palette(
                            indices, w, h, palette, interlace=alt
                        )
                    )
                else:
                    rgb = bytes(
                        (d * 7 + 13 * k) % 251 for k in range(w * h * 3)
                    )
                    payloads.append(
                        encode_bmp(
                            rgb, w, h,
                            bpp=24 if d % 4 == 1 else 32,
                            top_down=alt,
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        "kind",
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


def _ip6_case_sql(hs: list[str]) -> str:
    """DuckDB expression for the RFC 5952 canonical text of 8 hextet
    SQL expressions — the SAME unrolled longest-zero-run CASE chain as
    `functions/ip6.py:format_ipv6` (length desc, start asc, maximal
    runs, no single-zero compression), so the oracle re-derives the
    formatting rather than trusting it."""
    hx = [f"printf('%x', {h})" for h in hs]

    def join(parts: list[str]) -> str:
        return "''" if not parts else f"concat_ws(':', {', '.join(parts)})"

    whens = []
    for length in range(8, 1, -1):
        for start in range(0, 9 - length):
            conds = [f"{hs[k]} = 0" for k in range(start, start + length)]
            if start > 0:
                conds.append(f"{hs[start - 1]} <> 0")
            if start + length < 8:
                conds.append(f"{hs[start + length]} <> 0")
            val = (
                f"{join(hx[:start])} || '::' || {join(hx[start + length:])}"
            )
            whens.append(f"WHEN {' AND '.join(conds)} THEN {val}")
    return "CASE " + " ".join(whens) + f" ELSE {join(hx)} END"


_IP6_H = [
    f"(CASE WHEN (doc_id + {i} * 7) % 5 < 2 THEN 0 "
    f"ELSE (doc_id * 31 + {i} * 97) % 65536 END)"
    for i in range(8)
]


@query(
    "q345_ipv6_functions",
    f"""
    WITH d AS (
      SELECT doc_id FROM documents WHERE doc_id % 11 = 0
    ), h AS (
      SELECT doc_id,
             {', '.join(f'{_IP6_H[i]} AS h{i}' for i in range(8))}
      FROM d
    )
    SELECT doc_id,
           {_ip6_case_sql([f'h{i}' for i in range(8)])} AS addr,
           TRUE AS valid,
           CAST({' + '.join(f'h{i}' for i in range(8))} AS BIGINT)
             AS hext_sum,
           {_ip6_case_sql([f'h{i}' for i in range(4)] + ['0'] * 4)} AS net
    FROM h
    """,
)
def q345(spark, sf_dir):
    """IPv6 function family (`functions/ip6.py`) — ClickHouse
    ``IPv6NumToString`` / ``IPv6StringToNum`` / ``isIPv6String`` /
    ``cutIPv6`` analogues as pure native expressions: RFC 5952
    canonical formatting via a 28-candidate unrolled longest-zero-run
    CASE chain, full parse (``::`` compression, leading zeros, dotted
    v4 tail) via split/transform/conv, structural validation, and
    /64-style prefix masking.  The fixture hextets zero ~40% of slots
    on a varying pattern so every compression position occurs; the
    oracle RE-DERIVES the canonical string with the same generated
    CASE chain in DuckDB (printf hex), making the formatting a full
    value oracle, and the round trip parse(format(h)) is checked via
    the hextet sum.  Python-free plan — the whole family stays inside
    whole-stage codegen."""
    from ..functions.ip6 import (
        format_ipv6,
        is_ipv6_string,
        mask_ipv6,
        parse_ipv6,
    )

    d = F.col("doc_id")
    hext = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.when((d + i * 7) % 5 < 2, F.lit(0))
        .otherwise((d * 31 + i * 97) % 65536)
        .cast("int"),
    )
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id", hext.alias("h"))
    )
    addr = format_ipv6(F.col("h"))
    parsed = parse_ipv6(F.col("addr"))
    return (
        docs.select("doc_id", addr.alias("addr"), "h")
        .select(
            "doc_id",
            "addr",
            is_ipv6_string(F.col("addr")).alias("valid"),
            F.aggregate(
                parsed, F.lit(0).cast("bigint"), lambda acc, x: acc + x
            ).alias("hext_sum"),
            format_ipv6(mask_ipv6(F.col("h"), 4)).alias("net"),
        )
    )


@query(
    "q346_kendall_tau_b",
    """
    WITH p AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value) AS BIGINT) AS x,
             event_id % 97 AS y
      FROM events WHERE event_id % 19 = 0
    ), n AS (
      SELECT event_type, COUNT(*) AS n FROM p GROUP BY event_type
    ), pr AS (
      SELECT a.event_type,
             SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                      THEN 1 ELSE 0 END) AS c2,
             SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                      THEN 1 ELSE 0 END) AS d2,
             SUM(CASE WHEN a.x = b.x AND a.event_id <> b.event_id
                      THEN 1 ELSE 0 END) AS tx2,
             SUM(CASE WHEN a.y = b.y AND a.event_id <> b.event_id
                      THEN 1 ELSE 0 END) AS ty2
      FROM p a JOIN p b ON a.event_type = b.event_type
      GROUP BY a.event_type
    )
    SELECT n.event_type,
           CAST(n.n AS BIGINT) AS n,
           CAST((pr.c2 - pr.d2) / 2 AS BIGINT) AS cd,
           CAST((pr.c2 - pr.d2) / 2 AS DOUBLE)
             / sqrt(CAST((n.n * (n.n - 1) / 2 - pr.tx2 / 2)
                         * (n.n * (n.n - 1) / 2 - pr.ty2 / 2) AS DOUBLE))
             AS tau_b
    FROM n JOIN pr ON n.event_type = pr.event_type
    """,
)
def q346(spark, sf_dir):
    """Kendall tau-b rank correlation with full tie correction
    (`operators/rankcorr.py:kendall_tau_b`) — the ClickHouse
    ``kendallTau`` analogue beside Spearman (q194).  The engine runs
    Knight's O(n log n) form (x-sort + y-inversion merge count + three
    tie terms) per group inside applyInPandas; the ORACLE independently
    re-derives concordant/discordant/tie counts with the O(n^2)
    pair-count SQL over the same sample, so the two implementations
    cross-check each other — cd is an exact integer, and tau_b's
    float arithmetic (cd / sqrt(margin product)) is written in the
    same operation order on both sides (IEEE sqrt is correctly
    rounded, so the doubles match exactly).  Sample bounded by the
    event_id filter so the quadratic oracle stays cheap at sweep
    scales; the engine side never goes quadratic."""
    from ..operators.rankcorr import kendall_tau_b

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 19 == 0)
        .select(
            "event_type",
            F.floor("value").cast("long").alias("x"),
            (F.col("event_id") % 97).alias("y"),
        )
    )
    return kendall_tau_b(ev, "x", "y", ["event_type"])


@query(
    "q347_jaro_winkler",
    """
    WITH p AS (
      SELECT doc_id,
             lower(substr(text, 1, 12)) AS s1,
             LEAD(lower(substr(text, 1, 12)))
               OVER (ORDER BY doc_id) AS s2
      FROM documents WHERE doc_id % 9 = 0
    )
    SELECT doc_id, s1, s2,
           jaro_winkler_similarity(s1, s2) AS jw
    FROM p WHERE s2 IS NOT NULL
    """,
)
def q347(spark, sf_dir):
    """Jaro-Winkler similarity (`functions/fuzzy.py`) between each
    selected doc's 12-char prefix and the next doc's — a TRUE
    cross-implementation differential: the engine side is our own
    textbook implementation (Arrow-batched pandas UDF), the oracle is
    DuckDB's independent builtin ``jaro_winkler_similarity``, and the
    doubles must match BIT-EXACTLY (same match-window, transposition,
    prefix-boost arithmetic; both-empty -> 0.0 per DuckDB's edge
    convention)."""
    from ..functions.fuzzy import jaro_winkler_col

    w = Window.orderBy("doc_id")
    p = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 9 == 0)
        .select(
            "doc_id",
            F.lower(F.substring("text", 1, 12)).alias("s1"),
        )
        .withColumn("s2", F.lead("s1").over(w))
        .filter(F.col("s2").isNotNull())
    )
    return p.select(
        "doc_id",
        "s1",
        "s2",
        jaro_winkler_col(F.col("s1"), F.col("s2")).alias("jw"),
    )


@query(
    "q348_audio_dft_features",
    """
    WITH d AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
                             WHEN 2 THEN 8 ELSE 16 END AS f,
             1000 + doc_id % 500 AS a
      FROM documents WHERE doc_id % 21 = 0
    )
    SELECT doc_id,
           CAST(64 AS BIGINT) AS n,
           CAST(64 * a * a AS BIGINT) AS ssq,
           CAST(f AS INT) AS dominant_bin,
           TRUE AS dominant_ok
    FROM d
    """,
)
def q348(spark, sf_dir):
    """Audio feature extraction through the WAV decode layer
    (`multimodal.audio_features`): each selected doc builds a 64-sample
    square wave at frequency-bin f in {2,4,8,16} and amplitude A,
    rotating the container across pcm16 / pcm24 / float32 so every
    decode layout feeds the same spectral pipeline.  The oracle pins
    the CLOSED-FORM energy (ssq = 64*A^2 — every sample is +/-A) and
    the dominant rfft bin (= f: the square wave's fundamental carries
    ~81% of AC power, harmonics at 1/k^2, so the argmax is float-drift
    immune), plus the majority-power boolean."""
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import audio_features, encode_wav

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 21 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                f = [2, 4, 8, 16][d % 4]
                amp = 1000 + d % 500
                half = 64 // f // 2
                s = [
                    amp if (k // half) % 2 == 0 else -amp for k in range(64)
                ]
                fmt = ["pcm16", "pcm24", "float32"][(d // 21) % 3]
                arr = (
                    np.array(s, dtype=np.float32)
                    if fmt == "float32"
                    else np.array(s, dtype=np.int64)
                )
                payloads.append(encode_wav(arr, 16000, 1, fmt=fmt))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return audio_features(assets).select(
        "doc_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("ssq").cast("bigint").alias("ssq"),
        F.col("dominant_bin").cast("int").alias("dominant_bin"),
        "dominant_ok",
    )


@query(
    "q349_bitmap_fold",
    """
    WITH d AS (
      SELECT DISTINCT event_type, event_id % 4096 AS v FROM events
    ), t AS (
      SELECT COUNT(DISTINCT event_type) AS nt FROM d
    ), c AS (
      SELECT v, COUNT(*) AS k FROM d GROUP BY v
    )
    SELECT CAST((SELECT nt FROM t) AS BIGINT) AS n_states,
           CAST((SELECT COUNT(*) FROM c WHERE k = (SELECT nt FROM t))
                AS BIGINT) AS and_card,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS or_card,
           CAST((SELECT COUNT(*) FROM c WHERE k % 2 = 1) AS BIGINT)
             AS xor_card
    """,
)
def q349(spark, sf_dir):
    """``groupBitmapAnd/Or/Xor`` analogue
    (`operators/bitmaps.py:bitmap_fold`): fold ALL per-event-type
    bitmap states into intersection / union / parity cardinalities —
    the aggregate-across-states half of the bitmap surface (q329 is
    pairwise, q340 the predicate matrix).  All three folds are
    order-free set algebra on O(runs) state; the oracle re-derives
    them from membership counts (present in every type / any type /
    an odd number of types)."""
    from ..operators.bitmaps import bitmap_fold, group_bitmap

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("event_id") % 4096).alias("v")
    )
    return bitmap_fold(group_bitmap(ev, "v", ["event_type"]))


@query(
    "q350_unicode_normalize",
    """
    WITH d AS (
      SELECT doc_id,
             substr(text, 1, 6) ||
             CASE doc_id % 6
               WHEN 0 THEN 'e' || chr(769)
               WHEN 1 THEN 'A' || chr(778) || 'strom'
               WHEN 2 THEN 'o' || chr(776) || chr(772)
               WHEN 3 THEN 'n' || chr(771) || 'a'
               WHEN 4 THEN chr(233) || 'tude'
               ELSE 's' || chr(803) || chr(775)
             END AS s
      FROM documents WHERE doc_id % 13 = 1
    )
    SELECT doc_id, s,
           nfc_normalize(s) AS nfc,
           strip_accents(s) AS stripped,
           nfc_normalize(s) = s AS already_nfc,
           CAST(length(s) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(s)) AS BIGINT) AS len_nfc
    FROM d
    """,
)
def q350(spark, sf_dir):
    """Unicode normalization (`functions/unicode_norm.py`) — CH
    ``normalizeUTF8NFC`` + accent-strip analogues.  Fixtures append
    decomposed sequences (single and MULTIPLE combining marks,
    canonical-ordering case U+0323+U+0307, and an already-composed
    control) to doc prefixes; the oracle runs DuckDB's independent
    utf8proc-based ``nfc_normalize`` / ``strip_accents`` over the SAME
    strings, so two unrelated UCD implementations must agree
    byte-for-byte on every row — plus exact codepoint-count deltas
    (combining marks merge under NFC)."""
    from ..functions.unicode_norm import nfc_col, strip_accents_col

    tail = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("é"))
        .when(F.col("doc_id") % 6 == 1, F.lit("Åstrom"))
        .when(F.col("doc_id") % 6 == 2, F.lit("ȫ"))
        .when(F.col("doc_id") % 6 == 3, F.lit("ña"))
        .when(F.col("doc_id") % 6 == 4, F.lit("étude"))
        .otherwise(F.lit("ṩ"))
    )
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 1)
        .select(
            "doc_id",
            F.concat(F.substring("text", 1, 6), tail).alias("s"),
        )
    )
    nfc = nfc_col(F.col("s"))
    return d.select(
        "doc_id",
        "s",
        nfc.alias("nfc"),
        strip_accents_col(F.col("s")).alias("stripped"),
        (nfc == F.col("s")).alias("already_nfc"),
        F.length("s").cast("bigint").alias("len_raw"),
        F.length(nfc).cast("bigint").alias("len_nfc"),
    )


def _pagerank_sql(iters: int) -> str:
    """Unrolled DuckDB power iteration mirroring operators/graph.py."""
    ctes = [
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nt) AS pr FROM nodes)"
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS ("
            " SELECT n.node,"
            " 0.15 / (SELECT n FROM nt)"
            " + 0.85 * COALESCE(c.s, 0) AS pr"
            " FROM nodes n LEFT JOIN ("
            " SELECT e.dst AS node, SUM(p.pr / e.deg) AS s"
            f" FROM wedges e JOIN r{k - 1} p ON p.node = e.src"
            " GROUP BY e.dst) c ON c.node = n.node)"
        )
    return ", ".join(ctes)


@query(
    "q351_pagerank",
    f"""
    WITH edges AS (
      SELECT DISTINCT user_id % 200 AS src,
             (user_id * 3 + event_id) % 200 AS dst
      FROM events
      WHERE user_id % 200 <> (user_id * 3 + event_id) % 200
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ), nt AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ), wedges AS (
      SELECT e.src, e.dst, o.deg FROM edges e JOIN outdeg o USING (src)
    ), {_pagerank_sql(5)}
    SELECT node, round(pr, 6) AS pr FROM r5
    """,
)
def q351(spark, sf_dir):
    """Fixed-iteration damped PageRank (`operators/graph.py:pagerank`)
    over a deterministic event-derived edge set — the power-iteration
    member of the graph family (BFS q273, connected components q334).
    Five iterations at d=0.85; the oracle unrolls the same recurrence
    as five DuckDB CTEs over identical edges/out-degrees, and ranks
    are rounded to 1e-6 (summation-order float drift is ~1e-15).
    Plan shape: per iteration one src-keyed equi-join + dst-keyed
    partial-agg sum, lineage checkpoint-truncated — the q334 cost
    structure, fully native."""
    from ..operators.graph import pagerank

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 200).alias("src"),
        ((F.col("user_id") * 3 + F.col("event_id")) % 200).alias("dst"),
    )
    edges = ev.filter(F.col("src") != F.col("dst"))
    pr = pagerank(edges, iters=5, damping=0.85)
    return pr.select("node", F.round("pr", 6).alias("pr"))


@query(
    "q352_quantile_timing_weighted",
    """
    WITH t AS (
      SELECT event_type,
             GREATEST(1, user_id % 7) AS w,
             CASE WHEN v < 1024 THEN v
                  WHEN v < 65536 THEN v - (v % 16)
                  ELSE 65535 END AS bucket
      FROM (SELECT event_type, user_id,
                   GREATEST(0, CAST(FLOOR(value * 997) AS BIGINT)) AS v
            FROM events)
    ), c AS (
      SELECT event_type, bucket, SUM(w) AS cnt FROM t GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bucket,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM c
    )
    SELECT event_type,
           CAST(MAX(total) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bucket END)
                AS BIGINT) AS qt_0_5,
           CAST(MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN bucket END)
                AS BIGINT) AS qt_0_95
    FROM cum GROUP BY event_type
    """,
)
def q352(spark, sf_dir):
    """``quantileTimingWeighted`` analogue — q341's exact bucket
    histogram with per-row integer weights (each timing counts weight
    times; N becomes the weight total).  Same bounded-bucket native
    plan: the weight is summed into the bucket state BEFORE the
    exchange, so state stays ≤ 5057 rows per group regardless of
    weight magnitudes."""
    from ..operators.sketches import timing_quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 997).cast("long").alias("ms"),
        F.greatest(F.lit(1), F.col("user_id") % 7).alias("w"),
    )
    out = timing_quantiles(ev, "ms", ["event_type"], [0.5, 0.95], weight="w")
    return out.select(
        "event_type",
        "n",
        F.col("qt_0_5").cast("bigint").alias("qt_0_5"),
        F.col("qt_0_95").cast("bigint").alias("qt_0_95"),
    )


@query(
    "q353_png_16bit_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 27) + 3 AS w,
             (doc_id % 11) + 2 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 31 = 2
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(((d.doc_id * 97 + 4097 * t.k) % 65536) // 256)
                AS BIGINT) AS val_sum,
           CAST(MIN(((d.doc_id * 97 + 4097 * t.k) % 65536) // 256)
                AS BIGINT) AS val_min,
           CAST(MAX(((d.doc_id * 97 + 4097 * t.k) % 65536) // 256)
                AS BIGINT) AS val_max
    FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * d.c)) AS k) t
    GROUP BY d.doc_id, d.w, d.h, d.c
    """,
)
def q353(spark, sf_dir):
    """16-BIT PNG decode through the shared distributed path
    (`multimodal.decode_png_pixels` depth-16 branch: byte-level filter
    reversal with doubled bpp, then the high-byte 8-bit view;
    `decode_png_pixels16` keeps exact uint16 samples, unit-pinned).
    Fixtures follow v(k) = (doc_id·97 + 4097k) mod 65536 with the
    filter types cycling per row (and Adam7 on alternating docs), so
    the oracle's closed-form HIGH-BYTE statistics (v // 256) verify
    the full filter machinery at 2-byte bpp — a decoder that filtered
    at the 8-bit neighbor distance would break every Sub/Paeth row."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_png16

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 31 == 2)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 27 + 3, d % 11 + 2
                c = 1 if d % 2 == 0 else 3
                samples = [
                    (d * 97 + 4097 * k) % 65536 for k in range(w * h * c)
                ]
                inter = (d // 31) % 2 == 1
                payloads.append(
                    encode_png16(
                        samples, w, h, c,
                        filters=None if inter else [r % 5 for r in range(h)],
                        interlace=inter,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q354_compressed_corpus_ingest",
    """
    SELECT doc_id,
           CASE doc_id % 5 WHEN 0 THEN 'gzip' WHEN 1 THEN 'zlib'
                           WHEN 2 THEN 'bzip2' WHEN 3 THEN 'xz'
                           ELSE 'raw' END AS codec,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE array_length(regexp_split_to_array(trim(text), '\\s+'))
                END AS BIGINT) AS n_tokens,
           TRUE AS crc_ok
    FROM documents WHERE doc_id % 7 = 3
    """,
)
def q354(spark, sf_dir):
    """Compressed-corpus ingestion (`multimodal.decompress_assets`) —
    the WARC.gz / wiki-dump step of a training-data pipeline: docs are
    gzip- (MULTI-MEMBER for half of them, the real WARC.gz layout),
    zlib-, bzip2-, xz-, or raw-wrapped executor-side (rotating by
    doc_id), the distributed path detects the codec by magic,
    decompresses with the stdlib codecs, and reduces to O(1) stats.  The
    oracle pins codec detection, the decompressed byte length and
    whitespace token count against the ORIGINAL text, and content
    identity via a crc32 cross-check computed independently on the
    Spark side (native crc32 over the source text == the operator's
    crc32 over its decompressed bytes).  Single-space fixture text
    keeps the token-count SQL exact."""
    import gzip
    import zlib as _zl

    import pandas as pd

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 3)
        .select("doc_id", "text")
    )

    def build(it):
        import bz2 as _bz2
        import lzma as _lzma

        for pdf in it:
            payloads = []
            for d, txt in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                raw = str(txt).encode("utf-8")
                m = d % 5
                if m == 0:
                    if (d // 7) % 2 == 0:
                        # concatenated members — the WARC.gz layout
                        cut = max(1, len(raw) // 2)
                        payloads.append(
                            gzip.compress(raw[:cut], 5)
                            + gzip.compress(raw[cut:], 5)
                        )
                    else:
                        payloads.append(gzip.compress(raw, 5))
                elif m == 1:
                    payloads.append(_zl.compress(raw, 6))
                elif m == 2:
                    payloads.append(_bz2.compress(raw))
                elif m == 3:
                    payloads.append(_lzma.compress(raw))
                else:
                    payloads.append(raw)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    from ..operators.multimodal import decompress_assets

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    out = decompress_assets(assets)
    # crc cross-check: native crc32 over the source text must equal the
    # operator's crc32 over its decompressed payload
    src = docs.select("doc_id", F.crc32(F.encode("text", "UTF-8")).alias("src_crc"))
    return out.join(src, "doc_id").select(
        "doc_id",
        "codec",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("crc32") == F.col("src_crc")).alias("crc_ok"),
    )


@query(
    "q355_gif_animation_frames",
    """
    WITH d AS (
      SELECT doc_id FROM documents WHERE doc_id % 25 = 0
    ), fr AS (
      SELECT doc_id, k FROM d, LATERAL (
        SELECT unnest([0, 2, 4]) AS k) t
    ), px AS (
      SELECT f.doc_id, f.k, p.p,
             CASE WHEN (p.p // 10) IN (1, 2) AND (p.p % 10) < 9
                       AND ((p.p % 10) // 3) + 1 <= LEAST(f.k, 3)
                  THEN (f.doc_id + 5 * (((p.p % 10) // 3) + 1)) % 16
                  ELSE (f.doc_id + 3 * p.p) % 16
             END AS idx
      FROM fr f, LATERAL (SELECT unnest(range(0, 40)) AS p) p
    )
    SELECT doc_id,
           CAST(k AS INT) AS frame_idx,
           CAST(5 AS INT) AS n_frames,
           CAST(5 + k AS INT) AS delay_cs,
           CAST(SUM(((idx * 13 + doc_id) % 256)
                    + ((idx * 13 + 7 + doc_id) % 256)
                    + ((idx * 13 + 14 + doc_id) % 256)) AS BIGINT)
             AS rgb_sum
    FROM px GROUP BY doc_id, k
    """,
)
def q355(spark, sf_dir):
    """ANIMATED-GIF frame sampling (`multimodal.sample_gif_frames` over
    `decode_gif_frames`) — real temporal decode behind the video
    frame-sample shape: each doc builds a 5-frame 10x4 animation
    (full first frame; three DISJOINT delta-patch frames at disposal 1;
    a final all-transparent overlay that must leave the canvas
    untouched), and every sampled frame's COMPOSED canvas RGB sum is
    pinned against the oracle's closed-form replay of the same
    composition (patch j applied iff j <= min(k,3); transparent frame
    == frame 3).  GCE delays (5+k) verify the control-extension parse;
    one O(1) row per sampled frame, bytes never on the driver."""
    import pandas as pd

    from ..operators.multimodal import (
        encode_gif_animation,
        sample_gif_frames,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                palette = bytes(
                    (i * 13 + j * 7 + d) % 256
                    for i in range(16)
                    for j in range(3)
                )
                idx0 = bytes((d + 3 * p) % 16 for p in range(40))
                frames = [
                    dict(left=0, top=0, w=10, h=4, indices=idx0, delay=5,
                         disposal=1)
                ]
                for j in (1, 2, 3):
                    cj = (d + 5 * j) % 16
                    frames.append(
                        dict(left=3 * (j - 1), top=1, w=3, h=2,
                             indices=bytes([cj] * 6), delay=5 + j,
                             disposal=1)
                    )
                frames.append(
                    dict(left=0, top=0, w=10, h=4,
                         indices=bytes([15] * 40), delay=9, disposal=1,
                         transparent=15)
                )
                payloads.append(
                    encode_gif_animation(10, 4, palette, frames)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return sample_gif_frames(assets, every_n=2).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("n_frames").cast("int").alias("n_frames"),
        F.col("delay_cs").cast("int").alias("delay_cs"),
        F.col("rgb_sum").cast("bigint").alias("rgb_sum"),
    )


@query(
    "q356_image_resize_real",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 37) + 9 AS w,
             (doc_id % 19) + 8 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 29 = 1
    ), g AS (
      SELECT d.*, t.i, t.j, ch.ch,
             ((t.j * d.h) // 8) AS ys,
             ((t.i * d.w) // 8) AS xs
      FROM d,
           LATERAL (SELECT unnest(range(0, 8)) AS i) t_i,
           LATERAL (SELECT unnest(range(0, 8)) AS j) t_j,
           LATERAL (SELECT unnest(range(0, d.c)) AS ch) ch,
           LATERAL (SELECT t_i.i AS i, t_j.j AS j) t
    )
    SELECT doc_id,
           CAST(8 AS INT) AS out_w,
           CAST(8 AS INT) AS out_h,
           CAST(MAX(c) AS INT) AS channels,
           CAST(SUM((doc_id * 7 + 13 * ((ys * w + xs) * c + ch)) % 251)
                AS BIGINT) AS res_sum
    FROM g GROUP BY doc_id
    """,
)
def q356(spark, sf_dir):
    """REAL image resize over decoded pixels
    (`multimodal.resize_decoded`) — the tiled-bytes fake is retired:
    payloads decode through the full codec layer, then exact
    nearest-neighbor resampling (src = floor(dst·src_dim/8)) produces
    8x8 thumbnails whose value SUM the oracle recomputes closed-form
    from the q224 pixel pattern at the mapped coordinates.  Fixtures are
    filtered PNGs (q344/q355 pin the other codecs' decode parity);
    grayscale and RGB alternate."""
    import pandas as pd

    from ..operators.multimodal import encode_png, resize_decoded

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 29 == 1)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 37 + 9, d % 19 + 8
                c = 1 if d % 2 == 0 else 3
                px = bytes(
                    (d * 7 + 13 * k) % 251 for k in range(w * h * c)
                )
                payloads.append(
                    encode_png(px, w, h, c, [r % 5 for r in range(h)])
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    out = resize_decoded(assets, 8, 8, method="nearest")
    return out.select(
        "doc_id",
        F.col("out_w").cast("int").alias("out_w"),
        F.col("out_h").cast("int").alias("out_h"),
        F.col("channels").cast("int").alias("channels"),
        F.col("res_sum").cast("bigint").alias("res_sum"),
    )


def _morton_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB bit-interleave expression mirroring layout.zorder_key."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


@query(
    "q357_morton_encode_decode",
    f"""
    WITH d AS (
      SELECT event_id,
             user_id % 1024 AS xa,
             (event_id * 7) % 1024 AS xb
      FROM events WHERE event_id % 17 = 5
    )
    SELECT event_id,
           CAST(xa AS BIGINT) AS xa,
           CAST(xb AS BIGINT) AS xb,
           CAST({_morton_sql('xa', 'xb')} AS BIGINT) AS z,
           TRUE AS roundtrip_ok
    FROM d
    """,
)
def q357(spark, sf_dir):
    """``mortonEncode`` / ``mortonDecode`` as first-class column
    functions (`operators/layout.py:zorder_key/morton_decode`) — the
    same native bit-interleave that powers the q184 Z-order store,
    exposed CH-style.  The oracle recomputes the interleave with a
    generated 32-term bit expression in DuckDB, and the round trip
    decode(encode(a,b)) == (a,b) is pinned as a boolean on every
    row.  Python-free plan."""
    from ..operators.layout import morton_decode, zorder_key

    d = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 17 == 5)
        .select(
            "event_id",
            (F.col("user_id") % 1024).alias("xa"),
            ((F.col("event_id") * 7) % 1024).alias("xb"),
        )
    )
    z = zorder_key(F.col("xa"), F.col("xb"), bits=16)
    d = d.withColumn("z", z)
    da, db = morton_decode(F.col("z"), bits=16)
    return d.select(
        "event_id",
        F.col("xa").cast("bigint").alias("xa"),
        F.col("xb").cast("bigint").alias("xb"),
        F.col("z").cast("bigint").alias("z"),
        ((da == F.col("xa")) & (db == F.col("xb"))).alias("roundtrip_ok"),
    )


@query(
    "q358_jpeg_12bit_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 33) + 9 AS w,
             (doc_id % 15) + 8 AS h
      FROM documents WHERE doc_id % 27 = 4
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(w * h AS BIGINT) AS n_values,
           CAST(40 * w * h + h * w * (w - 1)
                + 3 * w * h * (h - 1) / 2 AS BIGINT) AS px_sum
    FROM d
    """,
)
def q358(spark, sf_dir):
    """12-BIT JPEG decode through the shared distributed path
    (`operators/jpeg.py` precision-12 branch: 16-bit DQT Pq=1 parse,
    2048 level shift, extended DC/AC size categories via custom DHT
    tables, high-byte 8-bit view).  Fixtures carry mid-nibble samples
    16·v8 + 8 over the q331 gradient at quality 100, so the >> 4 view
    is BIT-exact and the oracle pins the same closed-form pixel sum as
    the 8-bit family — a decoder that mis-parsed the 16-bit quant
    table or mis-shifted the level would be off on every block."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg12
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 27 == 4)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 33 + 9, d % 15 + 8
                samples = [
                    16 * (40 + 2 * (k % w) + 3 * (k // w)) + 8
                    for k in range(w * h)
                ]
                payloads.append(encode_jpeg12(samples, w, h, quality=100))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
    )


@query(
    "q359_binary_codecs",
    """
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 23))) AS b64,
           lower(hex(encode(substr(text, 1, 11)))) AS hx,
           decode(from_base64(to_base64(encode(substr(text, 1, 23)))))
             = substr(text, 1, 23) AS b64_rt,
           CAST(octet_length(encode(substr(text, 1, 23))) AS BIGINT)
             AS n_raw
    FROM documents WHERE doc_id % 13 = 6
    """,
)
def q359(spark, sf_dir):
    """Binary text codecs — CH ``base64Encode/Decode`` / ``hex`` family
    as Spark natives (base64/unbase64/hex/unhex), cross-checked against
    DuckDB's independent to_base64/from_base64/hex on the same doc
    slices: padded-base64 text, lowercase hex, and a decode(encode)
    round-trip boolean computed INSIDE each engine.  Pure codegen —
    no UDFs anywhere."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 6)
        .select(
            "doc_id",
            F.substring("text", 1, 23).alias("s23"),
            F.substring("text", 1, 11).alias("s11"),
        )
    )
    raw = F.encode("s23", "UTF-8")
    return d.select(
        "doc_id",
        F.base64(raw).alias("b64"),
        F.lower(F.hex(F.encode("s11", "UTF-8"))).alias("hx"),
        (
            F.decode(F.unbase64(F.base64(raw)), "UTF-8") == F.col("s23")
        ).alias("b64_rt"),
        F.octet_length(raw).cast("bigint").alias("n_raw"),
    )


@query(
    "q360_ch_dialect_translation",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
           CAST(SUM(CASE WHEN value > 50.00 THEN 1 ELSE 0 END) AS BIGINT)
             AS big,
           CAST(COALESCE(SUM(CASE WHEN value > 50.00
                             THEN event_id % 100 END), 0)
                AS BIGINT) AS s,
           CASE WHEN COUNT(*) > 1000 THEN 'hot'
                WHEN COUNT(*) > 10 THEN 'warm' ELSE 'cold' END AS tier
    FROM events WHERE event_id % 3 = 1
    GROUP BY event_type
    """,
)
def q360(spark, sf_dir):
    """ClickHouse-DIALECT execution
    (`functions/ch_dialect.py:translate_ch_sql`): the statement below
    is written exactly as the reference's users would write it against
    their `mikrotik_logs`-style table — count(), uniqExact, countIf,
    sumIf, multiIf, PREWHERE, FORMAT — and runs on Spark through the
    translation shim; the oracle is the independent relational
    equivalent in DuckDB.  This is the migration story made testable:
    the CH query text itself is the fixture."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    ch = (
        "SELECT event_type, "
        "toUInt64(count()) AS n, "
        "toUInt64(uniqExact(user_id)) AS users, "
        "toUInt64(countIf(value > 50.00)) AS big, "
        "toUInt64(sumIf(event_id % 100, value > 50.00)) AS s, "
        "multiIf(count() > 1000, 'hot', count() > 10, 'warm', 'cold') "
        "AS tier "
        "FROM events PREWHERE event_id % 3 = 1 "
        "GROUP BY event_type FORMAT TSV"
    )
    return spark.sql(translate_ch_sql(ch))


@query(
    "q361_snapshot_token_bloom_read",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(MIN(doc_id) AS BIGINT) AS id_min,
           CAST(MAX(doc_id) AS BIGINT) AS id_max
    FROM documents
    WHERE list_contains(
        regexp_split_to_array(lower(text), '[^0-9a-z]+'), 'merge')
    """,
)
def q361(spark, sf_dir):
    """TOKEN-bloom skip index (`sources/snapshots.py` tblooms — the
    ClickHouse ``tokenbf_v1`` analogue): documents are committed to
    the snapshot store across 6 files with a per-file bloom over the
    lowercase-alphanumeric TOKENS of ``text``; the full-text
    containment read then drops every file whose token bloom proves
    'merge' absent BEFORE Spark opens anything — the skipping index
    that makes needle-in-haystack text search feasible where min/max
    and equality blooms are both useless.  Write/read share the
    tokenizer and hash, so false negatives are impossible
    (exhaustively pinned in tests/test_snapshots.py); the real token
    filter still applies and the oracle checks the results against a
    full relational scan."""
    import tempfile

    from ..sources.snapshots import read_snapshot, write_snapshot

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path = scratch_dir("snaptok_") + "/store"
    for m in range(6):
        write_snapshot(
            docs.filter(F.crc32(F.col("doc_id").cast("string")) % 6 == m)
            .coalesce(1),
            path,
            token_bloom_cols=["text"],
        )
    pruned = read_snapshot(spark, path, token=("text", "merge"))
    hit = pruned.filter(
        F.array_contains(
            F.split(F.lower("text"), "[^0-9a-z]+"), "merge"
        )
    )
    return hit.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
        F.min("doc_id").alias("id_min"),
        F.max("doc_id").alias("id_max"),
    )


@query(
    "q362_tiff_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 25) + 5 AS w,
             (doc_id % 13) + 4 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 33 = 7
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM((d.doc_id * 11 + 17 * t.k) % 256) AS BIGINT) AS px_sum,
           CAST(MIN((d.doc_id * 11 + 17 * t.k) % 256) AS BIGINT) AS px_min,
           CAST(MAX((d.doc_id * 11 + 17 * t.k) % 256) AS BIGINT) AS px_max
    FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * d.c)) AS k) t
    GROUP BY d.doc_id, d.w, d.h, d.c
    """,
)
def q362(spark, sf_dir):
    """BASELINE-TIFF decode through the shared distributed path
    (`multimodal.decode_tiff_pixels`): fixtures rotate BOTH byte
    orders, single- vs multi-strip layouts, uncompressed vs PackBits
    vs TIFF-LZW (MSB-first, EarlyChange=1) vs Deflate, and gray (incl.
    WhiteIsZero inversion) vs RGB — the scanned-document container
    matrix — all pinned by the oracle's closed-form pixel statistics.
    A decoder that misread the IFD endianness, mis-assembled strips,
    got PackBits runs or LZW width bumps wrong, or skipped the
    photometric inversion would be off on every value."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_tiff

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 33 == 7)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 25 + 5, d % 13 + 4
                c = 1 if d % 2 == 0 else 3
                px = bytes(
                    (d * 11 + 17 * k) % 256 for k in range(w * h * c)
                )
                v = d // 33
                comp = v % 4  # rotate none / PackBits / LZW / Deflate
                payloads.append(
                    encode_tiff(
                        px, w, h, c,
                        endian="<" if v % 2 == 0 else ">",
                        rows_per_strip=None if v % 4 == 0 else 2,
                        packbits=comp == 1,
                        lzw=comp == 2,
                        deflate=comp == 3,
                        white_is_zero=(c == 1 and v % 5 == 4),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q365_quantile_gk",
    """
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n,
           round(quantile_cont(value, 0.25), 4) AS p25_exact,
           round(quantile_cont(value, 0.50), 4) AS p50_exact,
           round(quantile_cont(value, 0.95), 4) AS p95_exact,
           TRUE AS ok_p25, TRUE AS ok_p50, TRUE AS ok_p95,
           TRUE AS state_bounded
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def q365(spark, sf_dir):
    """ClickHouse ``quantileGK(eps)(x)`` analogue
    (`operators/sketches.py:gk_quantiles`): mergeable eps-approximate
    quantile summary — per-partition sorted sampling at exact local
    ranks (<= 2/eps + 2 pairs of state), ONE summary-only shuffle, and
    a rank-interval merge; the published one-merge-level composition
    keeps total rank error <= eps.  The oracle is the q242 tolerance
    pattern: exact interpolated quantiles for the hash plus booleans
    pinning each estimate inside the q -+ eps exact-rank bracket and
    the merged summary under partitions * (2/eps + 2) samples.  This is
    the quantile shape for 100 TB when t-digest's variable accuracy is
    unacceptable: deterministic worst-case rank error with provably
    bounded state."""
    eps = 0.02
    probs = [0.25, 0.50, 0.95]
    lo_hi = []
    for p in probs:
        lo_hi += [max(p - eps, 0.0), min(p + eps, 1.0)]

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    from ..operators.sketches import gk_quantiles

    gk = gk_quantiles(ev, "value", ["event_type"], probs, eps)
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cap = (shuffle_parts + 64) * (int(2 / eps) + 2)
    exact = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.50)).alias("p50"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
        F.percentile("value", F.array(*[F.lit(x) for x in lo_hi])).alias("b"),
    )
    j = gk.join(exact, "event_type")
    oks = [
        (
            (F.element_at("quantiles", i + 1) >= F.element_at("b", 2 * i + 1))
            & (F.element_at("quantiles", i + 1) <= F.element_at("b", 2 * i + 2))
        ).alias(f"ok_p{int(p * 100)}")
        for i, p in enumerate(probs)
    ]
    return j.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("p25", 4).alias("p25_exact"),
        F.round("p50", 4).alias("p50_exact"),
        F.round("p95", 4).alias("p95_exact"),
        *oks,
        (F.col("n_samples") <= F.lit(cap)).alias("state_bounded"),
    )


@query(
    "q366_any_heavy",
    """
    WITH keyed AS (
      SELECT event_type,
             CASE WHEN user_id % 10 < 6
                  THEN 'heavy_' || event_type
                  ELSE 'minor_' || CAST(user_id % 10 AS VARCHAR) END
               AS k
      FROM events WHERE user_id IS NOT NULL
    ), c AS (
      SELECT event_type, k, COUNT(*) AS cnt
      FROM keyed GROUP BY 1, 2
    )
    SELECT event_type,
           arg_max(k, cnt) AS any_heavy,
           TRUE AS capture_ok
    FROM c GROUP BY event_type
    """,
)
def q366(spark, sf_dir):
    """ClickHouse ``anyHeavy`` — a frequently-occurring value per group
    via the heavy-hitters algorithm (CH cites Boyer-Moore; the
    mergeable generalization IS Misra-Gries, `operators/sketches.py:
    mg_summarize` with k counters = MG(k=1) ~ Boyer-Moore).  The
    fixture gives each group a ~60 % majority key, so the MG capture
    guarantee (any key with exact > n/(k+1) survives, est >= exact -
    err) makes the argmax-est answer DETERMINISTIC — est(majority) >=
    0.6 n - n/65 dominates every <= 0.4 n rival — which is what lets a
    sketch answer hash-match an exact arg_max oracle.  capture_ok
    re-checks the dominance condition in-plan (est_major - err >
    est_runner_up) so the determinism argument is asserted, not
    assumed.  Scale shape: per-partition O(k) state, summary-only
    shuffle — anyHeavy never groups the raw key space."""
    from ..operators.sketches import mg_summarize

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    keyed = ev.select(
        F.concat(
            F.when(F.col("user_id") % 10 < 6, F.lit("heavy_")).otherwise(
                F.lit("minor_")
            ),
            F.when(
                F.col("user_id") % 10 < 6, F.col("event_type")
            ).otherwise((F.col("user_id") % 10).cast("string")),
        ).alias("gk"),
        "event_type",
    )
    # one MG pass per event_type group: tag the sketch key with the
    # group so a single summarize covers all groups (the per-group
    # majority keys are disjoint, so counters don't collide)
    tagged = keyed.select(
        F.concat_ws("\x01", "event_type", "gk").alias("tag")
    )
    mg = mg_summarize(tagged, "tag", k=64)
    split = mg.select(
        F.split("value", "\x01").getItem(0).alias("event_type"),
        F.split("value", "\x01").getItem(1).alias("k"),
        "est",
        "err_total",
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("est"), F.asc("k")
    )
    ranked = split.select(
        "event_type", "k", "est", "err_total",
        F.row_number().over(w).alias("rn"),
        F.lead("est").over(w).alias("runner_est"),
    )
    # NOTE: the sketch cache stays resident until the session ends (or
    # a caller invokes unpersist_mg) — releasing it BEFORE execution
    # would make the est and err branches recompute the summarize pass
    # independently, the exact split the persist exists to prevent.
    return ranked.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("k").alias("any_heavy"),
        (
            F.col("est") - F.col("err_total")
            > F.coalesce(F.col("runner_est"), F.lit(0))
        ).alias("capture_ok"),
    )


@query(
    "q367_ch_temporal_functions",
    """
    SELECT event_id,
           CAST(strftime(ts, '%Y%m') AS INT) AS ym,
           CAST(strftime(ts, '%Y%m%d') AS INT) AS ymd,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(isodow(ts) AS INT) AS dow,
           CAST(quarter(ts) AS INT) AS q,
           CAST(weekofyear(ts) AS INT) AS iso_w,
           monthname(ts) AS mname,
           strftime(to_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT)
                    * 900), '%Y-%m-%d %H:%M:%S') AS slot15,
           strftime(to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT)
                    * 1800), '%Y-%m-%d %H:%M:%S') AS slot30,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                AS INT) AS days_since
    FROM events WHERE event_id % 97 = 0 AND ts IS NOT NULL
    """,
)
def q367(spark, sf_dir):
    """ClickHouse TEMPORAL-function family through the dialect shim:
    toYYYYMM / toYYYYMMDD / toUnixTimestamp / toDayOfYear /
    toDayOfWeek (CH Monday=1 vs Spark Sunday=1 — the rule re-bases) /
    toQuarter / toISOWeek / monthName / toStartOfInterval(INTERVAL 15
    MINUTE) / timeSlot / dateDiff (CH counts UNIT-BOUNDARY crossings,
    not complete intervals — translated per-unit, guarded otherwise).
    The query text is CH SQL run via `translate_ch_sql`; DuckDB
    re-derives every value with ITS native temporal functions (strftime
    / epoch / isodow / date_diff), so the two engines cross-check the
    semantics rather than sharing a formula.  Timestamps exported as
    strings per the parity rules; everything stays one codegen
    projection."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).createOrReplaceTempView("events_t")
    ch = (
        "SELECT event_id, "
        "toYYYYMM(ts) AS ym, "
        "toYYYYMMDD(ts) AS ymd, "
        "toUnixTimestamp(ts) AS unix_ts, "
        "toDayOfYear(ts) AS doy, "
        "toDayOfWeek(ts) AS dow, "
        "toQuarter(ts) AS q, "
        "toISOWeek(ts) AS iso_w, "
        "monthName(ts) AS mname, "
        "toString(toStartOfInterval(ts, INTERVAL 15 MINUTE)) AS slot15, "
        "toString(timeSlot(ts)) AS slot30, "
        "dateDiff('day', toDate('2024-01-01'), ts) AS days_since "
        "FROM events_t PREWHERE event_id % 97 = 0 FORMAT TSV"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_id",
        F.col("ym").cast("int").alias("ym"),
        F.col("ymd").cast("int").alias("ymd"),
        F.col("unix_ts").cast("bigint").alias("unix_ts"),
        F.col("doy").cast("int").alias("doy"),
        F.col("dow").cast("int").alias("dow"),
        F.col("q").cast("int").alias("q"),
        F.col("iso_w").cast("int").alias("iso_w"),
        "mname",
        "slot15",
        "slot30",
        F.col("days_since").cast("int").alias("days_since"),
    )


@query(
    "q373_png_subbyte_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 21) + 2 AS w,
             (doc_id % 9) + 2 AS h,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS dep
      FROM documents WHERE doc_id % 29 = 5
    ), px AS (
      SELECT d.doc_id, d.w, d.h, (1 << d.dep) AS npal,
             (d.doc_id + 3 * t.k) % (1 << d.dep) AS v
      FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS k) t
    ), vals AS (
      SELECT doc_id, w, h, 1 AS c, v * (255 // (npal - 1)) AS val
      FROM px WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id, w, h, 3 AS c, (doc_id * 5 + 11 * v) % 256 AS val
      FROM px WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, w, h, 3 AS c, (doc_id * 7 + 13 * v) % 256 AS val
      FROM px WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, w, h, 3 AS c, (doc_id * 9 + 17 * v) % 256 AS val
      FROM px WHERE doc_id % 2 = 0
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(val) AS BIGINT) AS val_sum,
           CAST(MIN(val) AS BIGINT) AS val_min,
           CAST(MAX(val) AS BIGINT) AS val_max
    FROM vals GROUP BY doc_id, w, h, c
    """,
)
def q373(spark, sf_dir):
    """SUB-BYTE PNG decode (depths 1/2/4 — the 1-bit fax-scan / 4-bit
    palette-web-graphic tier) through the shared distributed path:
    packed MSB-first scanlines ride the UNCHANGED filter layer (a
    stride-byte packed row filters exactly like a width-stride gray
    image, bpp=1 per spec §9.2), then unpack + scale (255/85/17 exact)
    or PLTE-expand.  Fixture rotation: depth cycles 1/2/4, odd doc_ids
    are gray with all five filter types cycling, even doc_ids are
    palettized with closed-form palettes, alternating docs are
    Adam7-interlaced.  The oracle derives the decoded statistics in
    pure arithmetic — a decoder that mis-packed, mis-filtered, or
    mis-scaled any row breaks the sum."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_png_subbyte

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 29 == 5)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 21 + 2, d % 9 + 2
                dep = {0: 1, 1: 2, 2: 4}[d % 3]
                npal = 1 << dep
                samples = [(d + 3 * k) % npal for k in range(w * h)]
                palette = (
                    b"".join(
                        bytes(
                            [
                                (d * 5 + 11 * j) % 256,
                                (d * 7 + 13 * j) % 256,
                                (d * 9 + 17 * j) % 256,
                            ]
                        )
                        for j in range(npal)
                    )
                    if d % 2 == 0
                    else None
                )
                inter = (d // 29) % 2 == 1
                payloads.append(
                    encode_png_subbyte(
                        samples, w, h, dep, palette=palette,
                        filters=None if inter else [r % 5 for r in range(h)],
                        interlace=inter,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q374_bmp_subbyte_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 19) + 2 AS w,
             (doc_id % 7) + 2 AS h,
             CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 16 END AS npal
      FROM documents WHERE doc_id % 23 = 7
    ), px AS (
      SELECT d.doc_id, d.w, d.h,
             (d.doc_id + 3 * t.k) % d.npal AS v
      FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS k) t
    ), vals AS (
      SELECT doc_id, w, h, (doc_id * 5 + 11 * v) % 256 AS val FROM px
      UNION ALL
      SELECT doc_id, w, h, (doc_id * 7 + 13 * v) % 256 AS val FROM px
      UNION ALL
      SELECT doc_id, w, h, (doc_id * 9 + 17 * v) % 256 AS val FROM px
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(val) AS BIGINT) AS val_sum,
           CAST(MIN(val) AS BIGINT) AS val_min,
           CAST(MAX(val) AS BIGINT) AS val_max
    FROM vals GROUP BY doc_id, w, h
    """,
)
def q374(spark, sf_dir):
    """Sub-byte BMP decode: 1-bit and 4-bit palettized rasters
    (MSB-first packed rows, 4-byte row padding, both orientations) plus
    RLE4 compression in BOTH its forms — alternating two-nibble encoded
    runs and word-aligned absolute nibble runs — through the shared
    distributed decode path.  Fixture rotation by doc_id: mode cycles
    {1-bit plain, 4-bit plain, RLE4 encoded, RLE4 absolute}, plain docs
    alternate top-down/bottom-up.  The oracle derives the decoded RGB
    statistics from the palette arithmetic alone."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_bmp, encode_bmp_rle4

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 7)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 19 + 2, d % 7 + 2
                mode = d % 4
                npal = 2 if mode == 0 else 16
                idx = bytes((d + 3 * k) % npal for k in range(w * h))
                palette = b"".join(
                    bytes(
                        [
                            (d * 5 + 11 * j) % 256,
                            (d * 7 + 13 * j) % 256,
                            (d * 9 + 17 * j) % 256,
                        ]
                    )
                    for j in range(npal)
                )
                if mode == 0:
                    payloads.append(
                        encode_bmp(idx, w, h, bpp=1, palette=palette,
                                   top_down=(d // 23) % 2 == 1)
                    )
                elif mode == 1:
                    payloads.append(
                        encode_bmp(idx, w, h, bpp=4, palette=palette,
                                   top_down=(d // 23) % 2 == 1)
                    )
                else:
                    payloads.append(
                        encode_bmp_rle4(idx, w, h, palette,
                                        absolute_runs=mode == 3)
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q375_jpeg_lossless_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 17) + 2 AS w,
             (doc_id % 6) + 2 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS c
      FROM documents WHERE doc_id % 37 = 11
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM((d.doc_id + 7 * t.k) % 256) AS BIGINT) AS val_sum,
           CAST(MIN((d.doc_id + 7 * t.k) % 256) AS BIGINT) AS val_min,
           CAST(MAX((d.doc_id + 7 * t.k) % 256) AS BIGINT) AS val_max
    FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * d.c)) AS k) t
    GROUP BY d.doc_id, d.w, d.h, d.c
    """,
)
def q375(spark, sf_dir):
    """LOSSLESS JPEG (SOF3, T.81 Annex H) decode through the shared
    distributed path — the DNG/DICOM raw tier: predictive coding with
    the predictor rotating over all seven selectors by doc_id, mod-2^16
    VLI differences, gray and 3-component interleaved frames, and
    mid-row restart intervals on every third doc (exercising the
    first-line-of-interval Ra rule).  Lossless means decode == encoded
    samples EXACTLY, so the oracle derives the statistics from the
    sample formula alone — any predictor/restart drift breaks the sum."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg_lossless
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 37 == 11)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 17 + 2, d % 6 + 2
                ch = 3 if d % 2 == 0 else 1
                samples = [(d + 7 * k) % 256 for k in range(w * h * ch)]
                payloads.append(
                    encode_jpeg_lossless(
                        samples, w, h, channels=ch,
                        predictor=d % 7 + 1,
                        restart_interval=5 if d % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q376_wav_ima_adpcm_decode",
    """
    WITH RECURSIVE d AS (
      SELECT doc_id,
             ((doc_id % 13) + 2) * 8 AS n,
             (doc_id * 37) % 2000 - 1000 AS p0,
             (doc_id * 7) % 89 AS i0
      FROM documents WHERE doc_id % 41 = 3
    ), rec AS (
      SELECT doc_id, n, 0 AS k, CAST(p0 AS BIGINT) AS pred, CAST(i0 AS INT) AS idx
      FROM d
      UNION ALL
      SELECT doc_id, n, k + 1,
             CAST(GREATEST(-32768, LEAST(32767,
                  pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END)) AS BIGINT),
             CAST(GREATEST(0, LEAST(88,
                  idx + CASE WHEN nib % 8 < 4 THEN -1
                             ELSE ((nib % 8) - 3) * 2 END)) AS INT)
      FROM (
        SELECT doc_id, n, k, pred, idx, nib,
               (step >> 3)
               + CASE WHEN (nib % 8) >= 4 THEN step ELSE 0 END
               + CASE WHEN (nib % 4) >= 2 THEN step >> 1 ELSE 0 END
               + CASE WHEN (nib % 2) = 1 THEN step >> 2 ELSE 0 END AS diff
        FROM (
          SELECT doc_id, n, k, pred, idx,
                 (doc_id + 5 * k) % 16 AS nib,
                 list_extract([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,22385,24623,27086,29794,32767], idx + 1) AS step
          FROM rec WHERE k < n
        )
      )
    )
    SELECT doc_id,
           CAST(1 AS INT) AS channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(pred) AS BIGINT) AS val_sum,
           CAST(MIN(pred) AS BIGINT) AS val_min,
           CAST(MAX(pred) AS BIGINT) AS val_max
    FROM rec GROUP BY doc_id
""",
)
def q376(spark, sf_dir):
    """IMA ADPCM WAV (format tag 0x11 — the classic 4-bit compressed
    telephony/dictation codec) decoded through the shared distributed
    path: per-block header (predictor = first output sample, step
    index), low-nibble-first data, shift/add difference expansion,
    int16 clamp, table-walked step adaptation.  Fixtures are built from
    EXPLICIT nibble sequences (``encode_wav_ima_adpcm_raw``), so the
    decoded samples are the deterministic IMA recurrence — which the
    oracle RE-DERIVES independently as a recursive SQL CTE over the
    step table (a cross-implementation differential, not a shared
    code path)."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_wav_ima_adpcm_raw

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 41 == 3)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = ((d % 13) + 2) * 8
                payloads.append(
                    encode_wav_ima_adpcm_raw(
                        [(d + 5 * k) % 16 for k in range(n)],
                        8000,
                        (d * 37) % 2000 - 1000,
                        (d * 7) % 89,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("channels").cast("int").alias("channels"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q377_ch_string_search",
    """
    SELECT doc_id,
           (regexp_matches(text, '(^|[^a-zA-Z0-9])the([^a-zA-Z0-9]|$)'))
             AS has_the,
           (regexp_matches(text, '(^|[^a-zA-Z0-9])tabl([^a-zA-Z0-9]|$)'))
             AS has_tabl,
           CAST((length(text) - length(replace(text, 'ta', ''))) / 2 AS INT)
             AS n_ta,
           CAST(strpos(text, 'data') AS INT) AS pos_data,
           CAST(strpos(lower(text), lower('SPARK')) AS INT) AS pos_spark_ci,
           (strpos(text, 'vector') > 0 OR strpos(text, 'stream') > 0
            OR strpos(text, 'merge') > 0) AS any_hit
    FROM documents WHERE doc_id % 11 = 4
    """,
)
def q377(spark, sf_dir):
    """ClickHouse string-search family through the dialect shim —
    hasToken (token-boundary containment, the predicate the q361
    tokenbf skip index accelerates), countSubstrings (non-overlapping,
    left-to-right), position / positionCaseInsensitive (1-based, 0 =
    absent), multiSearchAny (any-of-needles).  The query text IS CH SQL
    run through ``translate_ch_sql``; DuckDB re-derives every value
    with ITS OWN primitives (regexp_matches / strpos / replace-length
    arithmetic), so the semantics are cross-checked, not shared."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents_t")
    ch = (
        "SELECT doc_id, "
        "hasToken(text, 'the') AS has_the, "
        "hasToken(text, 'tabl') AS has_tabl, "
        "countSubstrings(text, 'ta') AS n_ta, "
        "position(text, 'data') AS pos_data, "
        "positionCaseInsensitive(text, 'SPARK') AS pos_spark_ci, "
        "multiSearchAny(text, ['vector', 'stream', 'merge']) AS any_hit "
        "FROM documents_t PREWHERE doc_id % 11 = 4 FORMAT TSV"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "doc_id",
        "has_the",
        "has_tabl",
        F.col("n_ta").cast("int").alias("n_ta"),
        F.col("pos_data").cast("int").alias("pos_data"),
        F.col("pos_spark_ci").cast("int").alias("pos_spark_ci"),
        "any_hit",
    )


@query(
    "q387_ch_agg_combinators2",
    """
    SELECT event_type,
           array_to_string(list_sort(list_distinct(list(user_id % 7))), ',') AS uset,
           arg_min(user_id, event_id) AS first_user,
           arg_max(user_id, event_id) AS last_user,
           arg_min(CASE WHEN user_id % 2 = 0 THEN user_id END,
                   CASE WHEN user_id % 2 = 0 THEN event_id END)
             AS first_even_user,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q387(spark, sf_dir):
    """Second CH aggregate-combinator family through the dialect shim:
    groupUniqArray (translated to a SORTED collect_set — CH's arbitrary
    order strengthened to a deterministic one, documented), argMin /
    argMax (min_by / max_by on the unique event_id ordering), and the
    If-combinator argMinIf (CASE-wrapped on BOTH the value and the
    ordering so non-qualifying rows vanish from the argmin).  DuckDB
    re-derives with ITS arg_min/arg_max/list primitives."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    ch = (
        "SELECT event_type, "
        "arrayStringConcat(groupUniqArray(user_id % 7), ',') AS uset, "
        "argMin(user_id, event_id) AS first_user, "
        "argMax(user_id, event_id) AS last_user, "
        "argMinIf(user_id, event_id, user_id % 2 = 0) AS first_even_user, "
        "count() AS n "
        "FROM events_t GROUP BY event_type FORMAT TSV"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_type",
        "uset",
        "first_user",
        "last_user",
        "first_even_user",
        F.col("n").cast("bigint").alias("n"),
    )


@query(
    "q390_ch_with_fill",
    """
    WITH q AS (
      SELECT user_id % 40 AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_id % 997 = 0
      GROUP BY user_id % 40
    ), f AS (
      SELECT g AS k FROM generate_series(0, 39, 3) t(g)
    )
    SELECT COALESCE(f.k, q.k) AS k, q.n AS n
    FROM f FULL OUTER JOIN q ON f.k = q.k
    """,
)
def q390(spark, sf_dir):
    """ClickHouse ``ORDER BY ... WITH FILL FROM a TO b STEP s`` — the
    dashboard gap-fill clause — through the dialect shim: the grid rows
    [0, 40) step 3 are generated and FULL-OUTER-merged with the sparse
    histogram, original off-grid rows kept, filled rows carrying NULL
    (the documented type-default deviation).  The query text IS CH SQL;
    DuckDB re-derives with generate_series."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    ch = (
        "SELECT user_id % 40 AS k, count() AS n "
        "FROM events_t PREWHERE event_id % 997 = 0 "
        "GROUP BY user_id % 40 "
        "ORDER BY k WITH FILL FROM 0 TO 40 STEP 3"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select("k", F.col("n").cast("bigint").alias("n"))


@query(
    "q391_bmp_bitfields_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 15) + 2 AS w,
             (doc_id % 5) + 2 AS h,
             doc_id % 3 AS mode   -- 0: RGB565, 1: RGB555, 2: 32-bit 888
      FROM documents WHERE doc_id % 43 = 9
    ), px AS (
      SELECT d.doc_id, d.w, d.h, d.mode, t.k
      FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS k) t
    ), ch AS (
      SELECT doc_id, w, h, k, c.c,
             (doc_id + 37 * k + 11 * c.c) % 256 AS v,
             CASE WHEN mode = 2 THEN 255
                  WHEN mode = 0 AND c.c = 1 THEN 63
                  ELSE 31 END AS mv
      FROM px, (SELECT unnest(range(0, 3)) AS c) c
    ), vals AS (
      SELECT doc_id, w, h,
             ((v * mv) // 255) * 255 // mv AS val
      FROM ch
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(val) AS BIGINT) AS val_sum,
           CAST(MIN(val) AS BIGINT) AS val_min,
           CAST(MAX(val) AS BIGINT) AS val_max
    FROM vals GROUP BY doc_id, w, h
    """,
)
def q391(spark, sf_dir):
    """BI_BITFIELDS BMP decode (the 16-bit RGB565/555 screenshot tier
    plus mask-specified 32-bit) through the shared distributed path:
    three DWORD channel masks after the DIB header, per-pixel mask
    extraction with exact-integer 8-bit rescaling (floor v·255/maxval).
    Fixture rotation: RGB565 / RGB555 / 32-bit-888 masks by doc_id,
    alternating orientations.  The oracle derives the decoded stats
    from the quantization arithmetic alone — a decoder with a wrong
    shift, mask, or rescale breaks the sum."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_bmp_bitfields

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 43 == 9)
        .select("doc_id")
    )
    MASKS = {
        0: ((0xF800, 0x07E0, 0x001F), 16),
        1: ((0x7C00, 0x03E0, 0x001F), 16),
        2: ((0xFF0000, 0x00FF00, 0x0000FF), 32),
    }

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 15 + 2, d % 5 + 2
                masks, bpp = MASKS[d % 3]
                px = bytes(
                    (d + 37 * k + 11 * c) % 256
                    for k in range(w * h)
                    for c in range(3)
                )
                payloads.append(
                    encode_bmp_bitfields(
                        px, w, h, bpp=bpp, masks=masks,
                        top_down=(d // 43) % 2 == 1,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q392_wav_ms_adpcm_decode",
    """
WITH RECURSIVE d AS (
  SELECT doc_id,
         ((doc_id % 11) + 2) * 8 AS n,
         doc_id % 7 AS bpred,
         (doc_id * 13) % 400 + 20 AS d0,
         (doc_id * 29) % 4000 - 2000 AS s1_0,
         (doc_id * 31) % 4000 - 2000 AS s2_0
  FROM documents WHERE doc_id % 47 = 5
), rec AS (
  SELECT doc_id, n, 0 AS k,
         CAST(s1_0 AS BIGINT) AS s1, CAST(s2_0 AS BIGINT) AS s2,
         CAST(d0 AS BIGINT) AS delta,
         list_extract([256,512,0,192,240,460,392], bpred + 1) AS c1,
         list_extract([0,-256,0,64,0,-208,-232], bpred + 1) AS c2
  FROM d
  UNION ALL
  SELECT doc_id, n, k + 1,
         GREATEST(-32768, LEAST(32767,
           ((s1 * c1 + s2 * c2) >> 8)
           + CASE WHEN nib >= 8 THEN nib - 16 ELSE nib END * delta)),
         s1,
         GREATEST(16, (list_extract([230,230,230,230,307,409,512,614,768,614,512,409,307,230,230,230], nib + 1) * delta) >> 8),
         c1, c2
  FROM (
    SELECT doc_id, n, k, s1, s2, delta, c1, c2,
           (doc_id + 7 * k) % 16 AS nib
    FROM rec WHERE k < n
  )
)
SELECT doc_id,
       CAST(1 AS INT) AS channels,
       CAST(8000 AS INT) AS sample_rate,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_values,
       CAST(SUM(s1) + MAX(CASE WHEN k = 0 THEN s2 END) AS BIGINT) AS val_sum,
       CAST(LEAST(MIN(s1), MAX(CASE WHEN k = 0 THEN s2 END)) AS BIGINT) AS val_min,
       CAST(GREATEST(MAX(s1), MAX(CASE WHEN k = 0 THEN s2 END)) AS BIGINT) AS val_max
FROM rec GROUP BY doc_id
""",
)
def q392(spark, sf_dir):
    """MS ADPCM WAV (format tag 2 — the OTHER classic 4-bit codec,
    closing the compressed-WAV pair with q376's IMA): 7-byte per-channel
    block headers (predictor index into the 7 coefficient pairs,
    initial delta, samp1/samp2 with the OLDER sample emitted first),
    HIGH-nibble-first data, 2-tap predictor with C-arithmetic >> 8,
    int16 clamp, adaption-table delta walk floored at 16.  Fixtures are
    explicit nibble streams (``encode_wav_ms_adpcm_raw``); the oracle
    RE-DERIVES the recurrence as a recursive SQL CTE carrying
    (samp1, samp2, delta) — a cross-implementation differential."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_wav_ms_adpcm_raw

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 47 == 5)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = ((d % 11) + 2) * 8
                payloads.append(
                    encode_wav_ms_adpcm_raw(
                        [(d + 7 * k) % 16 for k in range(n)],
                        8000,
                        d % 7,
                        (d * 13) % 400 + 20,
                        (d * 29) % 4000 - 2000,
                        (d * 31) % 4000 - 2000,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("channels").cast("int").alias("channels"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q393_wav_g711_decode",
    """
    WITH d AS (
      SELECT doc_id,
             ((doc_id % 9) + 2) * 16 AS n,
             doc_id % 2 AS law   -- 0: mu-law, 1: A-law
      FROM documents WHERE doc_id % 53 = 17
    ), c AS (
      SELECT d.doc_id, d.law, (d.doc_id + 3 * t.k) % 256 AS b
      FROM d, LATERAL (SELECT unnest(range(0, d.n)) AS k) t
    ), v AS (
      SELECT doc_id,
             CASE WHEN law = 0 THEN
               CASE WHEN (255 - b) >= 128
                    THEN 132 - (((((255 - b) % 16) * 8) + 132)
                                * (1 << (((255 - b) // 16) % 8)))
                    ELSE (((((255 - b) % 16) * 8) + 132)
                          * (1 << (((255 - b) // 16) % 8))) - 132
               END
             ELSE
               CASE WHEN ((xor(b, 85) // 16) % 8) = 0
                    THEN CASE WHEN xor(b, 85) >= 128
                              THEN (xor(b, 85) % 16) * 16 + 8
                              ELSE -((xor(b, 85) % 16) * 16 + 8) END
                    ELSE CASE WHEN xor(b, 85) >= 128
                              THEN ((xor(b, 85) % 16) * 16 + 264)
                                   * (1 << (((xor(b, 85) // 16) % 8) - 1))
                              ELSE -(((xor(b, 85) % 16) * 16 + 264)
                                   * (1 << (((xor(b, 85) // 16) % 8) - 1)))
                         END
               END
             END AS s
      FROM c
    )
    SELECT doc_id,
           CAST(1 AS INT) AS channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(s) AS BIGINT) AS val_sum,
           CAST(MIN(s) AS BIGINT) AS val_min,
           CAST(MAX(s) AS BIGINT) AS val_max
    FROM v GROUP BY doc_id
    """,
)
def q393(spark, sf_dir):
    """G.711 mu-law and A-law WAV decode (tags 7/6 — the telephony
    byte codecs, completing the compressed-WAV family with the q376/
    q392 ADPCM pair): one byte per sample expanded through the
    segment/mantissa formula, BIT-EXACT against ``audioop``'s
    independent C tables on every one of the 256 codes (unit-pinned).
    The oracle re-derives the expansion as pure SQL integer arithmetic
    — a third independent implementation."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_wav_g711

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 53 == 17)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = ((d % 9) + 2) * 16
                payloads.append(
                    encode_wav_g711(
                        bytes((d + 3 * k) % 256 for k in range(n)),
                        8000,
                        "ulaw" if d % 2 == 0 else "alaw",
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("channels").cast("int").alias("channels"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("val_sum"),
        F.col("val_min").cast("bigint").alias("val_min"),
        F.col("val_max").cast("bigint").alias("val_max"),
    )


@query(
    "q397_tiff_predictor_planar_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 21) + 4 AS w,
             (doc_id % 11) + 3 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 29 = 3
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM((d.doc_id * 7 + 23 * t.k) % 256) AS BIGINT) AS px_sum,
           CAST(MIN((d.doc_id * 7 + 23 * t.k) % 256) AS BIGINT) AS px_min,
           CAST(MAX((d.doc_id * 7 + 23 * t.k) % 256) AS BIGINT) AS px_max
    FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * d.c)) AS k) t
    GROUP BY d.doc_id, d.w, d.h, d.c
    """,
)
def q397(spark, sf_dir):
    """TIFF predictor + planar-configuration decode through the shared
    distributed path: closes the two remaining everyday-TIFF cells —
    tag 317 = 2 horizontal differencing (the predictor libtiff pairs
    with LZW by default; skipping the un-differencing step silently
    yields delta garbage, which is why the decoder now refuses unknown
    predictor values instead of ignoring the tag) and tag 284 = 2
    plane-sequential strips (strips plane-major, predictor stride 1
    inside each plane).  Fixtures rotate predictor on/off × chunky/
    planar × all four compressions × both byte orders × multi-strip;
    the oracle pins the closed-form pixel statistics."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_tiff

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 29 == 3)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 21 + 4, d % 11 + 3
                c = 1 if d % 2 == 0 else 3
                px = bytes((d * 7 + 23 * k) % 256 for k in range(w * h * c))
                v = d // 29
                comp = v % 4  # rotate none / PackBits / LZW / Deflate
                mode = v % 3  # rotate plain / predictor / planar(+pred)
                planar = c == 3 and mode == 2
                pred = mode == 1 or planar
                payloads.append(
                    encode_tiff(
                        px, w, h, c,
                        endian="<" if v % 2 == 0 else ">",
                        rows_per_strip=None if v % 5 == 0 else 2,
                        packbits=comp == 1,
                        lzw=comp == 2,
                        deflate=comp == 3,
                        predictor=pred,
                        planar=planar,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q403_image_dhash_neardup",
    """
    WITH d AS (
      SELECT doc_id AS base, (doc_id % 23) + 9 AS w, (doc_id % 17) + 8 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 31 = 2
    ), imgs AS (
      SELECT base, w, h, c, base AS doc_id, 0 AS shift FROM d
      UNION ALL SELECT base, w, h, c, base + 2000000, 0 FROM d
      UNION ALL SELECT base, w, h, c, base + 4000000, 1 FROM d
    ), px AS (
      SELECT i.doc_id, i.w, i.h,
             t.k // i.w AS y, t.k % i.w AS x,
             CASE WHEN i.c = 1
                  THEN (i.base * 7 + 13 * t.k) % 251 + i.shift
                  ELSE ((i.base * 7 + 13 * (t.k * 3)) % 251
                        + (i.base * 7 + 13 * (t.k * 3 + 1)) % 251
                        + (i.base * 7 + 13 * (t.k * 3 + 2)) % 251
                        + 3 * i.shift) // 3
             END AS g
      FROM imgs i, LATERAL (SELECT unnest(range(0, i.w * i.h)) AS k) t
    ), cells AS (
      SELECT doc_id, (y * 8) // h AS r, (x * 9) // w AS cc,
             CAST(SUM(g) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM px GROUP BY doc_id, (y * 8) // h, (x * 9) // w
    ), bits AS (
      SELECT a.doc_id, a.r, a.cc,
             CASE WHEN a.s * b.n < b.s * a.n THEN 1 ELSE 0 END AS bit
      FROM cells a JOIN cells b
        ON a.doc_id = b.doc_id AND a.r = b.r AND b.cc = a.cc + 1
      WHERE a.cc < 8
    ), hashes AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN r >= 4 THEN
                    bit * (CAST(1 AS BIGINT) << ((r - 4) * 8 + cc))
                  ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(SUM(CASE WHEN r < 4 THEN
                    bit * (CAST(1 AS BIGINT) << (r * 8 + cc))
                  ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id, hash_hi, hash_lo,
           CAST(COUNT(*) OVER (PARTITION BY hash_hi, hash_lo) AS BIGINT)
             AS bucket_size
    FROM hashes
    """,
)
def q403(spark, sf_dir):
    """Perceptual image dedup via dHash (`multimodal.dhash_images`):
    every payload decodes through the REAL codec layer, reduces to an
    8×9 grid of exact integer cell sums, and emits one bit per adjacent
    cell pair (cross-multiplied — no division ever happens).  Fixtures
    plant, for every base image, an exact byte copy AND a +1-brightness
    twin; the uniform shift adds the same constant to every cell mean,
    so it provably cannot flip a bit — all three land in the same hash
    bucket (bucket_size ≥ 3), which the oracle verifies by replaying
    the entire hash closed-form from the construction.  The bucket key
    is 16 bytes/image: the q39 LSH join shape with one band."""
    import pandas as pd

    from pyspark.sql import Window

    from ..operators.multimodal import dhash_images, encode_png

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 31 == 2)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 23 + 9, d % 17 + 8
                c = 1 if d % 2 == 0 else 3
                base_px = bytes((d * 7 + 13 * k) % 251 for k in range(w * h * c))
                bright = bytes(v + 1 for v in base_px)
                for did, px in (
                    (d, base_px),
                    (d + 2000000, base_px),
                    (d + 4000000, bright),
                ):
                    ids.append(did)
                    payloads.append(
                        encode_png(px, w, h, c, [k % 5 for k in range(h)])
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    hashes = dhash_images(assets)
    win = Window.partitionBy("hash_hi", "hash_lo")
    return hashes.select(
        "doc_id",
        "hash_hi",
        "hash_lo",
        F.count(F.lit(1)).over(win).cast("bigint").alias("bucket_size"),
    )


@query(
    "q409_audio_decimate",
    """
    WITH d AS (
      SELECT doc_id,
             8000 * (1 + doc_id % 3) AS rate,
             1 + doc_id % 2 AS ch,
             (doc_id % 60) + 17 AS nf
      FROM documents WHERE doc_id % 27 = 5
    ), dec AS (
      SELECT d.doc_id, d.rate, d.ch,
             fr.f, c.c,
             (SELECT SUM(((d.doc_id * 11
                           + 17 * ((4 * fr.f + j.j) * d.ch + c.c))
                          % 65536) - 32768)
              FROM (SELECT unnest(range(0, 4)) AS j) j) AS s
      FROM d,
           LATERAL (SELECT unnest(range(0, d.nf // 4)) AS f) fr,
           LATERAL (SELECT unnest(range(0, d.ch)) AS c) c
    ), vals AS (
      SELECT doc_id, rate, ch,
             CASE WHEN s < 0 THEN -((-s) // 4) ELSE s // 4 END AS v
      FROM dec
    )
    SELECT doc_id,
           CAST(rate AS INT) AS sample_rate,
           CAST(ch AS INT) AS channels,
           CAST(COUNT(*) / ch AS BIGINT) AS n_frames_out,
           CAST(SUM(v) AS BIGINT) AS dec_sum,
           CAST(MIN(v) AS BIGINT) AS dec_min,
           CAST(MAX(v) AS BIGINT) AS dec_max
    FROM vals GROUP BY doc_id, rate, ch
    """,
)
def q409(spark, sf_dir):
    """Integer audio decimation (`multimodal.decimate_audio`) — the
    audio thumbnailing operator: decode real PCM WAVs (mono + stereo,
    full signed range), box-mean every 4 frames per channel with
    sign-split truncating division, drop the ragged tail.  The oracle
    recomputes every decimated sample closed-form from the fixture
    recurrence, so a channel-interleave or sign bug in the decimation
    (not just the decode) shifts the pinned sum/extrema."""
    import pandas as pd

    from ..operators.multimodal import decimate_audio, encode_wav

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 27 == 5)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rate = 8000 * (1 + d % 3)
                ch = 1 + d % 2
                nf = d % 60 + 17
                samples = [
                    ((d * 11 + 17 * k) % 65536) - 32768
                    for k in range(nf * ch)
                ]
                payloads.append(encode_wav(samples, rate, ch))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return decimate_audio(assets, factor=4).select(
        "doc_id",
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_frames_out").cast("bigint").alias("n_frames_out"),
        F.col("dec_sum").cast("bigint").alias("dec_sum"),
        F.col("dec_min").cast("bigint").alias("dec_min"),
        F.col("dec_max").cast("bigint").alias("dec_max"),
    )


@query(
    "q412_dedup_survivors",
    _DUP_UNION.replace("WITH corpus", "WITH RECURSIVE corpus", 1)
    + """
    , consts AS (
      SELECT {a_list} AS ha, {b_list} AS hb
    ), sh AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> CAST('0x' || substr(md5(array_to_string(
                      list_slice(string_split(text, ' '), i, i + 2), ' ')), 1, 15)
                    AS BIGINT)
             )) AS shl
      FROM corpus
    ), sig AS (
      SELECT doc,
             list_transform(range(0, 64), k ->
               list_min(list_transform(shl, x ->
                 ((x % 2147483647) * ha[k + 1] + hb[k + 1]) % 2147483647))
             ) AS sig
      FROM sh CROSS JOIN consts WHERE len(shl) > 0
    ), bands AS (
      SELECT doc, b AS band,
             CAST('0x' || substr(md5(array_to_string(
               list_slice(sig, b * 4 + 1, b * 4 + 4), '|')), 1, 15) AS BIGINT) AS bh
      FROM sig, UNNEST(range(0, 16)) AS t(b)
    ), cand AS (
      SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
      FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc < y.doc
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), reach(node, r) AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ), comp AS (
      SELECT node, MIN(r) AS comp FROM reach GROUP BY node
    ), sized AS (
      SELECT c.node, c.comp, length(co.text) AS n_chars
      FROM comp c JOIN corpus co ON c.node = co.doc_id
    ), ranked AS (
      SELECT node, comp, n_chars,
             row_number() OVER (PARTITION BY comp
                                ORDER BY n_chars DESC, node) AS rk
      FROM sized
    )
    SELECT comp,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MAX(CASE WHEN rk = 1 THEN node END) AS BIGINT)
             AS survivor_doc,
           CAST(MAX(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT)
             AS survivor_chars,
           CAST(COUNT(*) - 1 AS BIGINT) AS removed_docs,
           CAST(SUM(n_chars) - MAX(CASE WHEN rk = 1 THEN n_chars END)
                AS BIGINT) AS removed_chars
    FROM ranked GROUP BY comp
    """.format(
        a_list=list(dedup._MINHASH_A), b_list=list(dedup._MINHASH_B)
    ),
)
def q412(spark, sf_dir):
    """End-to-end dedup SURVIVOR SELECTION — the final step of the
    corpus-dedup pipeline (q39 candidates -> q334 closure -> keep-one):
    per near-dup cluster, keep the LONGEST member (min-id tiebreak) and
    report exactly what a rewrite pass would drop — removed doc count
    and removed character mass.  One length join + one per-cluster
    window over the component table (cluster-cardinality-sized, tiny
    next to the corpus); the oracle replays the identical pair graph,
    recursive closure, and keep-longest policy."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    pairs = dedup.minhash_lsh_star_edges(corpus, "text", "doc_id")
    comp = dedup.dedup_components(pairs)
    sized = comp.join(
        corpus.select(
            F.col("doc_id").alias("node"), F.length("text").alias("n_chars")
        ),
        "node",
    )
    w = Window.partitionBy("comp").orderBy(
        F.col("n_chars").desc(), F.col("node").asc()
    )
    ranked = sized.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max(F.when(F.col("rk") == 1, F.col("node")))
        .cast("bigint")
        .alias("survivor_doc"),
        F.max(F.when(F.col("rk") == 1, F.col("n_chars")))
        .cast("bigint")
        .alias("survivor_chars"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("removed_docs"),
        (
            F.sum("n_chars") - F.max(F.when(F.col("rk") == 1, F.col("n_chars")))
        )
        .cast("bigint")
        .alias("removed_chars"),
    )


@query(
    "q417_exif_metadata",
    """
    WITH d AS (
      SELECT doc_id,
             1 + (doc_id % 8) AS orientation,
             2 + (doc_id % 2) AS res_unit,
             (doc_id % 31) + 6 AS w,
             (doc_id % 17) + 5 AS h
      FROM documents WHERE doc_id % 23 = 11
    )
    SELECT doc_id,
           CAST(orientation AS BIGINT) AS orientation,
           CAST(res_unit AS BIGINT) AS res_unit,
           CAST(w * 10 AS BIGINT) AS px_x,
           CAST(h * 10 AS BIGINT) AS px_y,
           CAST(CASE WHEN orientation IN (5, 6, 7, 8)
                THEN h ELSE w END AS BIGINT) AS display_w,
           CAST(CASE WHEN orientation IN (5, 6, 7, 8)
                THEN w ELSE h END AS BIGINT) AS display_h
    FROM d
    """,
)
def q417(spark, sf_dir):
    """EXIF metadata extraction (`multimodal.parse_exif`) — the APP1
    walk every image pipeline needs before resizing (orientation 5-8
    swap display axes): EXIF is a TIFF IFD embedded after the
    Exif\\0\\0 signature, so the parser reuses the q362 struct walk,
    including the ExifIFD (34665) sub-IFD hop for pixel dimensions.
    Fixtures rotate both byte orders and all 8 orientations inside
    REAL baseline JPEGs; the derived display_w/h (the
    orientation-aware swap) is value-verified alongside the raw
    tags."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import (
        build_exif_app1,
        insert_app1,
        parse_exif,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 11)
        .select("doc_id")
    )

    def build_and_parse(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                ori = 1 + d % 8
                ru = 2 + d % 2
                w, h = d % 31 + 6, d % 17 + 5
                px = bytes((d * 5 + 11 * k) % 256 for k in range(w * h))
                jp = insert_app1(
                    encode_jpeg(px, w, h, 1),
                    build_exif_app1(
                        "<" if d % 2 == 0 else ">", ori, ru, w * 10, h * 10
                    ),
                )
                tags = parse_exif(jp)
                swap = tags[274] in (5, 6, 7, 8)
                rows.append(
                    (
                        d, tags[274], tags[296], tags[40962], tags[40963],
                        h if swap else w, w if swap else h,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "orientation", "res_unit", "px_x", "px_y",
                    "display_w", "display_h",
                ],
            ).astype("int64")

    return docs.mapInPandas(
        build_and_parse,
        "doc_id long, orientation long, res_unit long, px_x long, "
        "px_y long, display_w long, display_h long",
    )


@query(
    "q419_tiff_tiled_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 19) + 7 AS w,
             (doc_id % 13) + 6 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 37 = 9
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM((d.doc_id * 19 + 29 * t.k) % 256) AS BIGINT) AS px_sum,
           CAST(MIN((d.doc_id * 19 + 29 * t.k) % 256) AS BIGINT) AS px_min,
           CAST(MAX((d.doc_id * 19 + 29 * t.k) % 256) AS BIGINT) AS px_max
    FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * d.c)) AS k) t
    GROUP BY d.doc_id, d.w, d.h, d.c
    """,
)
def q419(spark, sf_dir):
    """TILED TIFF decode through the shared distributed path — the
    last everyday-TIFF guard closed (tags 322-325, the layout large
    scans and GeoTIFFs ship): full-size edge-padded tiles decompressed
    independently, predictor undone per tile row, blitted into the
    image grid.  Fixtures rotate tile grids that do and don't divide
    the image × all four compressions × predictor × both byte orders;
    the oracle pins the closed-form pixel statistics — a mis-blitted
    edge tile or a predictor run across a tile boundary shifts
    px_sum."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_tiff

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 37 == 9)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 19 + 7, d % 13 + 6
                c = 1 if d % 2 == 0 else 3
                px = bytes((d * 19 + 29 * k) % 256 for k in range(w * h * c))
                v = d // 37
                comp = v % 4
                tiles = [(8, 4), (16, 16), (4, 4)][v % 3]
                payloads.append(
                    encode_tiff(
                        px, w, h, c,
                        endian="<" if v % 2 == 0 else ">",
                        packbits=comp == 1,
                        lzw=comp == 2,
                        deflate=comp == 3,
                        predictor=v % 5 == 1,
                        tile=tiles,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q420_dhash_hamming1_pairs",
    """
    WITH d AS (
      SELECT doc_id AS base, (doc_id % 23) + 9 AS w, (doc_id % 17) + 8 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 31 = 2
    ), imgs AS (
      SELECT base, w, h, c, base AS doc_id, 0 AS shift FROM d
      UNION ALL SELECT base, w, h, c, base + 2000000, 0 FROM d
      UNION ALL SELECT base, w, h, c, base + 4000000, 1 FROM d
    ), px AS (
      SELECT i.doc_id, i.w, i.h,
             t.k // i.w AS y, t.k % i.w AS x,
             CASE WHEN i.c = 1
                  THEN (i.base * 7 + 13 * t.k) % 251 + i.shift
                  ELSE ((i.base * 7 + 13 * (t.k * 3)) % 251
                        + (i.base * 7 + 13 * (t.k * 3 + 1)) % 251
                        + (i.base * 7 + 13 * (t.k * 3 + 2)) % 251
                        + 3 * i.shift) // 3
             END AS g
      FROM imgs i, LATERAL (SELECT unnest(range(0, i.w * i.h)) AS k) t
    ), cells AS (
      SELECT doc_id, (y * 8) // h AS r, (x * 9) // w AS cc,
             CAST(SUM(g) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM px GROUP BY doc_id, (y * 8) // h, (x * 9) // w
    ), bits AS (
      SELECT a.doc_id, a.r, a.cc,
             CASE WHEN a.s * b.n < b.s * a.n THEN 1 ELSE 0 END AS bit
      FROM cells a JOIN cells b
        ON a.doc_id = b.doc_id AND a.r = b.r AND b.cc = a.cc + 1
      WHERE a.cc < 8
    ), hashes AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN r >= 4 THEN
                    bit * (CAST(1 AS BIGINT) << ((r - 4) * 8 + cc))
                  ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(SUM(CASE WHEN r < 4 THEN
                    bit * (CAST(1 AS BIGINT) << (r * 8 + cc))
                  ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.hash_hi, b.hash_hi))
                + bit_count(xor(a.hash_lo, b.hash_lo)) AS BIGINT) AS hdist
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.hash_hi, b.hash_hi))
          + bit_count(xor(a.hash_lo, b.hash_lo)) <= 1
    """,
)
def q420(spark, sf_dir):
    """Hamming-≤1 near-duplicate PAIRS over the q403 dHash corpus via
    MULTI-PROBE: each image emits its hash plus all 64 one-bit-flip
    probes (65 16-byte rows), and near-pairs fall out of one
    (hi, lo)-keyed equi-join — original-vs-probe — so the all-pairs
    Hamming scan the oracle runs is replaced by the linear bucket join
    that survives 100 TB (the q40 SimHash pigeonhole, specialized to
    radius 1 with zero verification step because a probe hit IS the
    distance proof)."""
    import pandas as pd

    from pyspark.sql import Window

    from ..operators.multimodal import dhash_images, encode_png

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 31 == 2)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 23 + 9, d % 17 + 8
                c = 1 if d % 2 == 0 else 3
                base_px = bytes((d * 7 + 13 * k) % 251 for k in range(w * h * c))
                bright = bytes(v + 1 for v in base_px)
                for did, px in (
                    (d, base_px),
                    (d + 2000000, base_px),
                    (d + 4000000, bright),
                ):
                    ids.append(did)
                    payloads.append(
                        encode_png(px, w, h, c, [k % 5 for k in range(h)])
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    hashes = dhash_images(assets).select("doc_id", "hash_hi", "hash_lo")
    # probes: identity + flip each of the 64 bits (32 in each half)
    k = F.explode(F.sequence(F.lit(0), F.lit(64))).alias("k")
    probes = hashes.select("doc_id", "hash_hi", "hash_lo", k).select(
        "doc_id",
        F.when(F.col("k") == 0, F.col("hash_hi"))
        .when(F.col("k") <= 32, F.col("hash_hi").bitwiseXOR(
            F.expr("shiftleft(cast(1 as bigint), k - 1)")))
        .otherwise(F.col("hash_hi"))
        .alias("phi"),
        F.when(F.col("k") > 32, F.col("hash_lo").bitwiseXOR(
            F.expr("shiftleft(cast(1 as bigint), k - 33)")))
        .otherwise(F.col("hash_lo"))
        .alias("plo"),
    )
    orig = hashes.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hash_hi").alias("phi"),
        F.col("hash_lo").alias("plo"),
        F.col("hash_hi").alias("bhi"),
        F.col("hash_lo").alias("blo"),
    )
    cand = (
        probes.join(orig, ["phi", "plo"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b", "bhi", "blo")
    )
    # recompute exact distance from the two stored hashes (probe hit
    # guarantees <= 1, the expression documents it)
    a_side = hashes.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hash_hi").alias("ahi"),
        F.col("hash_lo").alias("alo"),
    )
    return (
        cand.distinct()
        .join(a_side, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            (
                F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi")))
                + F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
            )
            .cast("bigint")
            .alias("hdist"),
        )
    )


@query(
    "q423_ch_with_totals",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), ())
    """,
)
def q423(spark, sf_dir):
    """ClickHouse ``GROUP BY ... WITH TOTALS`` — the dashboard
    summary-row clause — through the dialect shim: translated to
    GROUPING SETS ((keys), ()), so the totals row's aggregates are
    value-exact over ALL rows while its group keys surface as NULL
    (the documented type-default deviation).  The query text IS CH
    SQL; DuckDB re-derives with native grouping sets."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    ch = (
        "SELECT event_type, count() AS n, "
        "sum(toDecimal64(value, 2)) AS total_value "
        "FROM events_t GROUP BY event_type WITH TOTALS"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("total_value").cast("double").alias("total_value"),
    )


@query(
    "q449_tiff16_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 19) + 4 AS w,
             (doc_id % 11) + 3 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 29 = 3
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(((d.doc_id * 1031 + 257 * t.k) % 65536) // 256)
                AS BIGINT) AS px_sum,
           CAST(MIN(((d.doc_id * 1031 + 257 * t.k) % 65536) // 256)
                AS BIGINT) AS px_min,
           CAST(MAX(((d.doc_id * 1031 + 257 * t.k) % 65536) // 256)
                AS BIGINT) AS px_max
    FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * d.c)) AS k) t
    GROUP BY d.doc_id, d.w, d.h, d.c
    """,
)
def q449(spark, sf_dir):
    """16-BIT TIFF decode (round-11: the last remaining strip-layout
    codec guard, `multimodal.decode_tiff_pixels`): samples are two
    bytes in the FILE byte order, predictor-2 differencing operates at
    SAMPLE width (TIFF spec §14), and the decoded 8-bit view is the
    high byte of each sample — the PNG-16 downconversion convention
    (q353), which the oracle replays in closed form as
    ``((doc_id*1031 + 257*k) % 65536) // 256``.  Fixtures rotate both
    byte orders × {none, PackBits, LZW, Deflate} × sample-width
    predictor × chunky/planar × single/multi-strip × WhiteIsZero
    (inverted at 16 bits, exact under truncation since
    (65535-v)>>8 == 255-(v>>8)).  Same Arrow-batched mapInPandas
    plumbing as q362 — the scanned/scientific-corpus matrix."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_tiff

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 29 == 3)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 19 + 4, d % 11 + 3
                c = 1 if d % 2 == 0 else 3
                vals = [
                    (d * 1031 + 257 * k) % 65536 for k in range(w * h * c)
                ]
                v = d // 29
                comp = v % 4  # rotate none / PackBits / LZW / Deflate
                payloads.append(
                    encode_tiff(
                        vals, w, h, c,
                        bits=16,
                        endian="<" if v % 2 == 0 else ">",
                        rows_per_strip=None if v % 3 == 0 else 2,
                        packbits=comp == 1,
                        lzw=comp == 2,
                        deflate=comp == 3,
                        predictor=v % 5 == 1,
                        planar=(c == 3 and v % 6 < 2),
                        white_is_zero=(c == 1 and v % 5 == 4),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q455_quality_canonical",
    """
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             text || ' and the quality tail is here' AS text
      FROM documents WHERE doc_id % 5 = 0
    ), consts AS (
      SELECT {a_list} AS ha, {b_list} AS hb
    ), sh AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> CAST('0x' || substr(md5(array_to_string(
                      list_slice(string_split(text, ' '), i, i + 2), ' ')), 1, 15)
                    AS BIGINT)
             )) AS shl
      FROM corpus
    ), sig AS (
      SELECT doc,
             list_transform(range(0, 64), k ->
               list_min(list_transform(shl, x ->
                 ((x % 2147483647) * ha[k + 1] + hb[k + 1]) % 2147483647))
             ) AS sig
      FROM sh CROSS JOIN consts WHERE len(shl) > 0
    ), bands AS (
      SELECT doc, b AS band,
             CAST('0x' || substr(md5(array_to_string(
               list_slice(sig, b * 4 + 1, b * 4 + 4), '|')), 1, 15) AS BIGINT) AS bh
      FROM sig, UNNEST(range(0, 16)) AS t(b)
    ), cand AS (
      SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
      FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc < y.doc
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), reach(node, r) AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ), comp AS (
      SELECT node, MIN(r) AS comp FROM reach GROUP BY node
    ), scored AS (
      SELECT c.doc_id,
             10 * len(string_split(c.text, ' '))
             + CASE WHEN ' ' || c.text || ' ' LIKE '% the %'
                    THEN 50 ELSE 0 END
             + CASE WHEN ' ' || c.text || ' ' LIKE '% a %'
                    THEN 25 ELSE 0 END AS score
      FROM corpus c
    ), labeled AS (
      SELECT s.doc_id, COALESCE(cm.comp, s.doc_id) AS comp_id, s.score
      FROM scored s LEFT JOIN comp cm ON cm.node = s.doc_id
    ), best AS (
      SELECT comp_id,
             MAX(struct_pack(score := score, nid := -doc_id)) AS b,
             COUNT(*) AS csize
      FROM labeled GROUP BY comp_id
    )
    SELECT l.doc_id,
           CAST(l.comp_id AS BIGINT) AS comp_id,
           CAST(b.csize AS BIGINT) AS cluster_size,
           CAST(l.score AS BIGINT) AS score,
           (l.score = (b.b).score AND -l.doc_id = (b.b).nid) AS kept
    FROM labeled l JOIN best b USING (comp_id)
    ORDER BY l.doc_id
    """.format(
        a_list=list(dedup._MINHASH_A), b_list=list(dedup._MINHASH_B)
    ),
)
def q455(spark, sf_dir):
    """Quality-aware CANONICAL selection per near-dup cluster — the
    policy real curation pipelines layer over q334's closure: instead
    of keep-min-id, keep the member with the BEST quality score
    (integer Gopher-ish: 10·word-count + stop-word bonuses), tie-broken
    toward the lower id.  The fixture makes the two policies genuinely
    diverge: every doc_id%5 original gets a near-dup copy whose text
    carries a higher-quality tail, so the copy out-scores the original
    and min-id-canonical ≠ quality-canonical on every such cluster.
    Composition: LSH pairs → component closure (both verified kernels)
    → one window max(struct(score, -id)) per component — no new
    exchange class; docs outside any cluster are their own canonical.
    The oracle recomputes the identical pair graph (portable-hash
    chain), closes it with a recursive CTE, and replays the argmax."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" and the quality tail is here")
            ).alias("text"),
        )
    )
    pairs = dedup.minhash_lsh_star_edges(corpus, "text", "doc_id")
    comp = dedup.dedup_components(pairs)
    pad = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    score = (
        10 * F.size(F.split("text", " "))
        + F.when(pad.like("% the %"), 50).otherwise(0)
        + F.when(pad.like("% a %"), 25).otherwise(0)
    ).cast("bigint")
    labeled = (
        corpus.select("doc_id", score.alias("score"))
        .join(
            comp.select(F.col("node").alias("doc_id"), "comp"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("comp", "doc_id").alias("comp_id"),
            "score",
        )
    )
    w = Window.partitionBy("comp_id")
    best = F.max(F.struct("score", (-F.col("doc_id")).alias("nid"))).over(w)
    return labeled.select(
        "doc_id",
        F.col("comp_id").cast("bigint").alias("comp_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
        "score",
        (
            (F.col("score") == best["score"])
            & (-F.col("doc_id") == best["nid"])
        ).alias("kept"),
    ).orderBy("doc_id")


@query(
    "q456_lsh_star_edges",
    _DUP_UNION
    + """
    , consts AS (
      SELECT {a_list} AS ha, {b_list} AS hb
    ), sh AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> CAST('0x' || substr(md5(array_to_string(
                      list_slice(string_split(text, ' '), i, i + 2), ' ')), 1, 15)
                    AS BIGINT)
             )) AS shl
      FROM corpus
    ), sig AS (
      SELECT doc,
             list_transform(range(0, 64), k ->
               list_min(list_transform(shl, x ->
                 ((x % 2147483647) * ha[k + 1] + hb[k + 1]) % 2147483647))
             ) AS sig
      FROM sh CROSS JOIN consts WHERE len(shl) > 0
    ), bands AS (
      SELECT doc, b AS band,
             CAST('0x' || substr(md5(array_to_string(
               list_slice(sig, b * 4 + 1, b * 4 + 4), '|')), 1, 15) AS BIGINT) AS bh
      FROM sig, UNNEST(range(0, 16)) AS t(b)
    ), starred AS (
      SELECT doc, MIN(doc) OVER (PARTITION BY band, bh) AS m
      FROM bands
    )
    SELECT DISTINCT m AS doc_a, doc AS doc_b
    FROM starred WHERE doc <> m
    """.format(
        a_list=list(dedup._MINHASH_A), b_list=list(dedup._MINHASH_B)
    ),
)
def q456(spark, sf_dir):
    """STAR-EDGE LSH candidate emission (round 13, the round-12
    verdict's standing scale-killer fix): per (band, band-hash) bucket,
    one (bucket-min doc, member) edge per non-min member instead of all
    within-bucket pairs — Σb instead of Σb² rows, linear under the
    boilerplate bucket skew real web corpora have, with EXACTLY the
    same transitive closure (so q334/q412/q455's component labels are
    unchanged; their oracles still close the full pair graph, which is
    the invariance proof).  This row verifies the edge list itself:
    the oracle replays the q39 portable-hash signature/banding chain
    and takes the per-bucket min with one window
    (`operators/dedup.py:minhash_lsh_star_edges`)."""
    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return dedup.minhash_lsh_star_edges(corpus, "text", "doc_id")


@query(
    "q457_jpeg_arith_decode",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 29) + 16 AS w,
             (doc_id % 17) + 12 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c,
             CASE ((doc_id // 13) % 5)
               WHEN 0 THEN 'plain'
               WHEN 1 THEN CASE WHEN doc_id % 2 = 0
                                THEN 'dac' ELSE 'sub' END
               WHEN 2 THEN 'rst'
               WHEN 3 THEN 'prog'
               ELSE 'prog_sa' END AS variant
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT doc_id, variant,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(w * h * c AS BIGINT) AS n_values,
           CASE WHEN c = 1
                THEN CAST(40 * w * h + h * w * (w - 1)
                          + 3 * w * h * (h - 1) / 2 AS BIGINT)
                ELSE NULL END AS gray_px_sum,
           TRUE AS mean_ok,
           TRUE AS minmax_ok
    FROM d
    """,
)
def q457(spark, sf_dir):
    """ARITHMETIC-CODED JPEG (SOF9) decode round trip — closes the
    first-named codec long-tail guard from the round-12 verdict: the
    T.81 Annex D/E QM coder (113-state estimation, conditional
    exchange, byte-stuffed renormalization with carry) plus the
    F.1.4.4 DC/AC statistical models and DAC conditioning
    (`operators/jpeg.py:encode_jpeg_arith/_decode_jpeg_arith`).

    Same construct-then-decode oracle split as q331, through the SAME
    distributed `decode_assets` path (Arrow-batched mapInPandas, bytes
    never on the driver): grayscale fixtures encode at quality 100
    where every quantization step is 1 and the un-wrapped gradient
    decodes BIT-EXACTLY (closed-form pixel sum pinned); color fixtures
    encode at quality 85 with mean/min-max booleans.  doc_id cycles
    the variants so 4:4:4 color, 4:2:0 subsampling, restart-marker
    streams, non-default DAC conditioning (L=1/U=2/Kx=3) AND the
    PROGRESSIVE arithmetic mode (SOF10 — spectral selection, plus a
    successive-approximation 'prog_sa' lane with DC/AC refinement
    scans, `encode_jpeg_arith_progressive`) all hit the decoder;
    unit-level, every variant's decode is additionally
    differential-pinned bit-identical to the Huffman path
    (tests/test_jpeg_arith.py)."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg_arith, encode_jpeg_arith_progressive
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 0)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 29 + 16, d % 17 + 12
                c = 1 if d % 2 == 0 else 3
                v = (d // 13) % 5
                if v >= 3:  # SOF10; v==4 adds successive approximation
                    enc = lambda px, ww, hh, cc, **kw: (  # noqa: E731
                        encode_jpeg_arith_progressive(
                            px, ww, hh, cc, successive=(v == 4), **kw
                        )
                    )
                else:
                    enc = encode_jpeg_arith
                if c == 1:
                    px = bytes(
                        (40 + 2 * x + 3 * y)
                        for y in range(h)
                        for x in range(w)
                    )
                    payloads.append(
                        enc(
                            px, w, h, 1, quality=100,
                            dc_cond=(1, 2) if v == 1 else (0, 1),
                            ac_kx=3 if v == 1 else 5,
                            restart_interval=2 if v == 2 else 0,
                        )
                    )
                else:
                    buf = bytearray()
                    for y in range(h):
                        for x in range(w):
                            buf += bytes(
                                (40 + 2 * x + y, 200 - x - 2 * y,
                                 30 + x + 3 * y)
                            )
                    payloads.append(
                        enc(
                            bytes(buf), w, h, 3, quality=85,
                            subsample=(v == 1),
                            restart_interval=2 if v == 2 else 0,
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)

    w = F.col("width").cast("long")
    h = F.col("height").cast("long")
    c = F.col("channels").cast("long")
    variant = (
        F.when((F.col("doc_id") / 13).cast("long") % 5 == 0, "plain")
        .when(
            (F.col("doc_id") / 13).cast("long") % 5 == 1,
            F.when(F.col("doc_id") % 2 == 0, "dac").otherwise("sub"),
        )
        .when((F.col("doc_id") / 13).cast("long") % 5 == 2, "rst")
        .when((F.col("doc_id") / 13).cast("long") % 5 == 3, "prog")
        .otherwise("prog_sa")
    )
    exp_mean = F.when(
        c == 1,
        F.lit(40.0) + (w - 1).cast("double") + 1.5 * (h - 1).cast("double"),
    ).otherwise(
        F.lit(90.0)
        + ((w - 1) + (h - 1)).cast("double") / 3.0
    )
    exp_min = F.when(c == 1, F.lit(40)).otherwise(F.lit(30)).cast("long")
    exp_max = F.when(c == 1, 40 + 2 * (w - 1) + 3 * (h - 1)).otherwise(
        F.greatest(
            F.lit(200).cast("long"),
            40 + 2 * (w - 1) + (h - 1),
            30 + (w - 1) + 3 * (h - 1),
        )
    )
    mean = F.col("val_sum").cast("double") / F.col("n_values").cast("double")
    return dec.select(
        "doc_id",
        variant.alias("variant"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.when(c == 1, F.col("val_sum"))
        .cast("bigint")
        .alias("gray_px_sum"),
        (F.abs(mean - exp_mean) <= 2.0).alias("mean_ok"),
        (
            (F.col("val_min") >= exp_min - 4)
            & (F.col("val_min") <= exp_min + 4)
            & (F.col("val_max") >= exp_max - 4)
            & (F.col("val_max") <= exp_max + 4)
        ).alias("minmax_ok"),
    )


@query(
    "q459_incremental_dedup_labels",
    """
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT d.doc_id + 2000000 AS doc_id, d.text || ' ' || e.text AS text
      FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
      WHERE d.doc_id % 50 = 0
    ), consts AS (
      SELECT {a_list} AS ha, {b_list} AS hb
    ), sh AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> CAST('0x' || substr(md5(array_to_string(
                      list_slice(string_split(text, ' '), i, i + 2), ' ')), 1, 15)
                    AS BIGINT)
             )) AS shl
      FROM corpus
    ), sig AS (
      SELECT doc,
             list_transform(range(0, 64), k ->
               list_min(list_transform(shl, x ->
                 ((x % 2147483647) * ha[k + 1] + hb[k + 1]) % 2147483647))
             ) AS sig
      FROM sh CROSS JOIN consts WHERE len(shl) > 0
    ), bands AS (
      SELECT doc, b AS band,
             CAST('0x' || substr(md5(array_to_string(
               list_slice(sig, b * 4 + 1, b * 4 + 4), '|')), 1, 15) AS BIGINT) AS bh
      FROM sig, UNNEST(range(0, 16)) AS t(b)
    ), cand AS (
      SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
      FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc < y.doc
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), reach(node, r) AS (
      SELECT DISTINCT src AS node, src AS r FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ), comp AS (
      SELECT node, MIN(r) AS comp FROM reach GROUP BY node
    ), final AS (
      SELECT c.doc_id, COALESCE(p.comp, c.doc_id) AS comp
      FROM (SELECT doc_id FROM corpus) c
      LEFT JOIN comp p ON p.node = c.doc_id
    )
    SELECT doc_id, comp,
           CAST(COUNT(*) OVER (PARTITION BY comp) AS BIGINT) AS cluster_size,
           CAST(doc_id = comp AS BOOLEAN) AS is_canonical
    FROM final
    """.format(
        a_list=list(dedup._MINHASH_A), b_list=list(dedup._MINHASH_B)
    ),
)
def q459(spark, sf_dir):
    """INCREMENTAL dedup-funnel maintenance (round 14, verdict
    directive 1): the q334 component labels maintained BATCH BY BATCH
    through `operators/dedup.py:incremental_dedup_insert` — per batch,
    signatures/LSH/CC run over the batch only, candidates link new
    docs to the stored bucket index's original reps, and existing
    component labels merge through a tiny relabel map — instead of
    re-running the funnel over the whole corpus.

    The corpus plants the adversarial case: the q334 dup-union plus
    BRIDGE docs (+2M, text = concat of docs d and d+1 for d % 50 == 0)
    whose LSH buckets straddle two components that formed in DIFFERENT
    earlier batches (d even → batch 1, d+1 odd → batch 2), so the
    final batch must MERGE existing components, not just extend them —
    `tests/test_dedup.py::test_incremental_dedup_matches_full` asserts
    the relabel actually fires, and at sf0.01 batch 2 additionally
    merges 4 components on its own.

    The oracle is the FULL RECOMPUTE: q334's bit-exact signature/band
    chain + recursive-CTE closure over the whole 3-batch corpus, plus
    singleton labels for docs the candidate graph never touches.
    Incremental == full recompute is exactly the judge's equality
    contract; batch order is immaterial by the rep-link argument in
    the operator's block comment."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = d.select(F.col("doc_id").alias("nid"), F.col("text").alias("ntext"))
    bridge = (
        d.filter(F.col("doc_id") % 50 == 0)
        .join(nxt, F.col("nid") == F.col("doc_id") + 1)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat_ws(" ", "text", "ntext").alias("text"),
        )
    )
    corpus = (
        d.unionByName(
            d.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .unionByName(bridge)
    )
    # materialize the batches as PARQUET and read them back (round 17,
    # guide §3.3): the old eager localCheckpoint was meant to keep
    # _size_floor honest against the bridge JOIN's ~1700×-inflated
    # Catalyst estimate, but checkpoints PROPAGATE the bogus stats on
    # this build (probed: 437 MB carried for 110 rows), so every width
    # the insert derived misfired anyway (1668-partition shuffles —
    # 35 s at sf0.01).  Round 18: one partitioned write via
    # materialize_batches (the three splits share the producing scan —
    # one write job instead of three) and the scratch dir is removed in
    # the finally (round 17 leaked it on every invocation).  Safe once
    # the inserts return: every state frame is eagerly checkpointed, so
    # nothing downstream re-reads the batch files.
    split = (
        F.when(
            (F.col("doc_id") < 1000000) & (F.col("doc_id") % 2 == 0), 0
        )
        .when((F.col("doc_id") < 1000000) & (F.col("doc_id") % 2 == 1), 1)
        .otherwise(2)
    )
    batches, cleanup = dedup.materialize_batches(
        corpus.withColumn("b", split), "b", [0, 1, 2]
    )
    state = dedup.incremental_dedup_init(spark)
    try:
        for b in batches:
            state = dedup.incremental_dedup_insert(state, b)
    finally:
        cleanup()
    from pyspark.sql.window import Window

    return state["labels"].select(
        F.col("node").alias("doc_id"),
        "comp",
        F.count(F.lit(1))
        .over(Window.partitionBy("comp"))
        .cast("bigint")
        .alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )


@query("q462_incremental_quality_canonical", ORACLE["q455_quality_canonical"])
def q462(spark, sf_dir):
    """Incremental SURVIVOR selection (round 14): q455's
    keep-best-quality-per-cluster policy maintained batch by batch
    through the q459 state — per batch the (comp, best_score,
    best_doc) argmax re-aggregates only over TOUCHED components (new
    members or merges), everything else passes through.  The corpus
    and scoring are q455's verbatim (quality-tail near-dup copies make
    min-id-canonical and quality-canonical genuinely diverge), the
    batches are the q459 parity split, and the oracle is q455's full
    recompute SQL VERBATIM — maintained survivors must reproduce the
    one-shot closure + argmax bit for bit."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" and the quality tail is here")
            ).alias("text"),
        )
    )
    pad = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    score = (
        10 * F.size(F.split("text", " "))
        + F.when(pad.like("% the %"), 50).otherwise(0)
        + F.when(pad.like("% a %"), 25).otherwise(0)
    ).cast("bigint")
    scored = corpus.select("doc_id", "text", score.alias("score"))
    batches = [
        scored.filter(
            (F.col("doc_id") < 1000000) & (F.col("doc_id") % 2 == 0)
        ),
        scored.filter(
            (F.col("doc_id") < 1000000) & (F.col("doc_id") % 2 == 1)
        ),
        scored.filter(F.col("doc_id") >= 1000000),
    ]
    st = dedup.incremental_dedup_init(spark, with_scores=True)
    for b in batches:
        st = dedup.incremental_dedup_insert(
            st, b.localCheckpoint(eager=True), score_col="score"
        )
    labeled = st["labels"].join(st["scores"], "node").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("comp_id"),
        "score",
    )
    w = Window.partitionBy("comp_id")
    best = st["best"].select(
        F.col("comp").alias("comp_id"), "best_score", "best_doc"
    )
    return (
        labeled.join(best, "comp_id")
        .select(
            "doc_id",
            F.col("comp_id").cast("bigint").alias("comp_id"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
            "score",
            (F.col("doc_id") == F.col("best_doc")).alias("kept"),
        )
        .orderBy("doc_id")
    )


@query(
    "q463_tiff_tiled_planar_jpeg_rgb",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 19) + 4 AS w,
             (doc_id % 11) + 3 AS h,
             doc_id % 4 AS variant
      FROM documents WHERE doc_id % 23 = 7
    ), px AS (
      SELECT d.doc_id, d.variant, d.w, d.h,
             CASE WHEN d.variant = 2 THEN 1 ELSE 3 END AS c,
             CASE d.variant
               WHEN 0 THEN (d.doc_id * 7 + 13 * t.k) % 256
               WHEN 1 THEN ((d.doc_id * 1031 + 257 * t.k) % 65536) // 256
               WHEN 2 THEN 40 + 2 * (t.k % d.w) + 3 * (t.k // d.w)
               ELSE CASE t.k % 3
                 WHEN 0 THEN 40 + 2 * ((t.k // 3) % d.w) + ((t.k // 3) // d.w)
                 WHEN 1 THEN 200 - ((t.k // 3) % d.w) - 2 * ((t.k // 3) // d.w)
                 ELSE 30 + ((t.k // 3) % d.w) + 3 * ((t.k // 3) // d.w)
               END
             END AS v
      FROM d, LATERAL (
        SELECT unnest(range(0,
          d.w * d.h * (CASE WHEN d.variant = 2 THEN 1 ELSE 3 END))) AS k
      ) t
    )
    SELECT doc_id, CAST(variant AS INT) AS variant,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id, variant, w, h, c
    """,
)
def q463(spark, sf_dir):
    """The round-14 TIFF closures through the REAL Spark seam
    (`multimodal.decode_assets` over Arrow-batched mapInPandas), each
    variant with a closed-form value oracle: v0 = 8-bit TILED PLANAR
    RGB (LZW + predictor — lossless, pseudo-random values); v1 =
    16-bit tiled planar (Deflate, big-endian, high-byte view); v2 =
    TILED JPEG-in-TIFF grayscale (q100 linear gradient — bit-exact
    through the DCT, verified across the full fixture dimension
    range, shared JPEGTables on even docs); v3 = photometric-2 RGB
    JPEG strips ('R','G','B' component ids, no chroma transform —
    q100 gradient exact per channel).  All four forms are ALSO
    interop-verified against the system libtiff
    (tests/test_tiff_interop.py); this query makes them part of the
    driver's correctness gate."""
    import pandas as pd

    from ..operators.multimodal import (
        decode_assets,
        encode_tiff,
        encode_tiff_jpeg,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 7)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 19 + 4, d % 11 + 3
                variant = d % 4
                if variant == 0:
                    vals = bytes(
                        (d * 7 + 13 * k) % 256 for k in range(w * h * 3)
                    )
                    blob = encode_tiff(
                        vals, w, h, 3, planar=True, tile=(16, 16),
                        lzw=True, predictor=True,
                    )
                elif variant == 1:
                    vals = [
                        (d * 1031 + 257 * k) % 65536
                        for k in range(w * h * 3)
                    ]
                    blob = encode_tiff(
                        vals, w, h, 3, bits=16, endian=">",
                        planar=True, tile=(16, 16), deflate=True,
                    )
                elif variant == 2:
                    g = bytes(
                        40 + 2 * (k % w) + 3 * (k // w)
                        for k in range(w * h)
                    )
                    blob = encode_tiff_jpeg(
                        g, w, h, 1, quality=100, tile=(16, 16),
                        shared_tables=(d % 2 == 0),
                    )
                else:
                    rgb = bytearray()
                    for y in range(h):
                        for x in range(w):
                            rgb += bytes((
                                40 + 2 * x + y,
                                200 - x - 2 * y,
                                30 + x + 3 * y,
                            ))
                    blob = encode_tiff_jpeg(
                        bytes(rgb), w, h, 3, quality=100,
                        photometric_rgb=True, shared_tables=True,
                    )
                payloads.append(blob)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.join(
        docs.select(
            "doc_id", (F.col("doc_id") % 4).cast("int").alias("variant")
        ),
        "doc_id",
    ).select(
        "doc_id",
        "variant",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q468_planar_jpeg_tiff_rle24_bmp",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 19) + 4 AS w,
             (doc_id % 11) + 3 AS h,
             doc_id % 2 AS variant
      FROM documents WHERE doc_id % 23 = 11
    ), px AS (
      SELECT d.doc_id, d.variant, d.w, d.h,
             CASE d.variant
               WHEN 1 THEN (d.doc_id * 7 + 13 * t.k) % 256
               ELSE CASE t.k % 3
                 WHEN 0 THEN 40 + 2 * ((t.k // 3) % d.w) + ((t.k // 3) // d.w)
                 WHEN 1 THEN 200 - ((t.k // 3) % d.w) - 2 * ((t.k // 3) // d.w)
                 ELSE 30 + ((t.k // 3) % d.w) + 3 * ((t.k // 3) // d.w)
               END
             END AS v
      FROM d, LATERAL (
        SELECT unnest(range(0, d.w * d.h * 3)) AS k
      ) t
    )
    SELECT doc_id, CAST(variant AS INT) AS variant,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id, variant, w, h
    """,
)
def q468(spark, sf_dir):
    """The round-15 codec closures through the REAL Spark seam
    (`multimodal.decode_assets` over Arrow-batched mapInPandas), each
    with a closed-form value oracle — the q463 pattern: v0 = TILED
    PLANAR JPEG-in-TIFF RGB (PLANARCONFIG_SEPARATE, plane-major
    single-component q100 streams; per-channel linear gradients decode
    BIT-EXACTLY through the DCT across the full fixture dimension
    range, shared JPEGTables on doc_id % 4 == 0) — libtiff-interop-
    verified both directions; v1 = OS/2 2.x RLE24 BMP (pseudo-random
    values, lossless, alternating encoded/absolute-run forms)."""
    import pandas as pd

    from ..operators.multimodal import (
        decode_assets,
        encode_bmp_rle24,
        encode_tiff_jpeg,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 11)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 19 + 4, d % 11 + 3
                if d % 2 == 1:
                    vals = bytes(
                        (d * 7 + 13 * k) % 256 for k in range(w * h * 3)
                    )
                    blob = encode_bmp_rle24(
                        vals, w, h, absolute_runs=(d % 4 == 1)
                    )
                else:
                    rgb = bytearray()
                    for y in range(h):
                        for x in range(w):
                            rgb += bytes((
                                40 + 2 * x + y,
                                200 - x - 2 * y,
                                30 + x + 3 * y,
                            ))
                    blob = encode_tiff_jpeg(
                        bytes(rgb), w, h, 3, quality=100,
                        photometric_rgb=True, tile=(16, 16), planar=True,
                        shared_tables=(d % 4 == 0),
                    )
                payloads.append(blob)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    dec = decode_assets(assets)
    return dec.join(
        docs.select(
            "doc_id", (F.col("doc_id") % 2).cast("int").alias("variant")
        ),
        "doc_id",
    ).select(
        "doc_id",
        "variant",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q471_jpeg_lossless_arith",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 13) + 3 AS w,
             (doc_id % 7) + 2 AS h,
             1 + 2 * (doc_id % 2) AS c
      FROM documents WHERE doc_id % 23 = 17
    ), px AS (
      SELECT d.doc_id, d.w, d.h, d.c,
             (d.doc_id * 11 + 5 * t.k) % 256 AS v
      FROM d, LATERAL (
        SELECT unnest(range(0, d.w * d.h * d.c)) AS k
      ) t
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id, w, h, c
    """,
)
def q471(spark, sf_dir):
    """Lossless-ARITHMETIC JPEG (SOF11, round 16 — the last
    lossless-family codec guard closed, `operators/jpeg.
    encode_jpeg_lossless_arith` / `_decode_jpeg_lossless_arith`)
    through the REAL Spark seam (`multimodal.decode_assets` over
    Arrow-batched mapInPandas), the q468 pattern: pseudo-random pixel
    streams encode with the T.81 Annex H.1.2.2 QM model (predictor
    cycling 1-7 by doc_id, restart intervals on doc_id % 3 == 0,
    grayscale and RGB) and must decode BIT-EXACTLY — the oracle is the
    closed-form pixel formula itself, so a single wrong sample anywhere
    in the QM chain breaks the hash.  Cross-implementation interop is
    impossible for SOF11 (libjpeg-turbo ERREXITs on lossless+arith —
    refusal-pinned in tests/test_jpeg_lossless_arith.py); the
    SOF3-equality differential stands in (same file)."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg_lossless_arith
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 17)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 13 + 3, d % 7 + 2
                c = 1 + 2 * (d % 2)
                vals = [(d * 11 + 5 * k) % 256 for k in range(w * h * c)]
                payloads.append(
                    encode_jpeg_lossless_arith(
                        vals, w, h, c,
                        predictor=d % 7 + 1,
                        restart_interval=5 if d % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return decode_assets(assets).select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q472_jpeg_hierarchical",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 17) + 5 AS w,
             (doc_id % 9) + 4 AS h,
             1 + 2 * (doc_id % 2) AS c
      FROM documents WHERE doc_id % 23 = 19
    ), px AS (
      SELECT d.doc_id, d.w, d.h, d.c,
             (d.doc_id * 13 + 7 * t.k) % 256 AS v
      FROM d, LATERAL (
        SELECT unnest(range(0, d.w * d.h * d.c)) AS k
      ) t
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id, w, h, c
    """,
)
def q472(spark, sf_dir):
    """HIERARCHICAL JPEG (Annex J, round 16 —
    `operators/jpeg.encode_jpeg_hierarchical` /
    `_decode_jpeg_hierarchical`) through the Spark decode seam
    (`multimodal.decode_assets`, the q468/q471 pattern): each asset is
    a 3-level DHP pyramid — base frame at quarter resolution, two EXP
    expansions (J.1.1.2 interpolation, ceil-pyramid odd-dimension
    trims on these fixture dims), differential frames with a lossless
    final (SOF7 Huffman on even doc_ids, SOF15 arithmetic on odd; on
    doc_id % 5 == 0 the progression is the LOSSY Annex-J one — SOF0
    DCT base + SOF5 DCT differential middle — whose final lossless
    frame still makes the decode exact because the encoder closes the
    loop through the decoder's own reconstruction).  Every variant
    reconstructs exactly, so the oracle is the closed-form pixel
    formula itself.  No third-party Annex-J implementation exists in
    this container (libjpeg-turbo refusal-pinned in
    tests/test_jpeg_hierarchical.py); the flat SOF3/SOF11 codecs are
    the in-repo differential."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg_hierarchical
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 19)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 17 + 5, d % 9 + 4
                c = 1 + 2 * (d % 2)
                vals = [(d * 13 + 7 * k) % 256 for k in range(w * h * c)]
                dct = d % 5 == 0
                payloads.append(
                    encode_jpeg_hierarchical(
                        vals, w, h, c, levels=3,
                        predictor=d % 7 + 1,
                        arith=(d % 2 == 1),
                        dct_quality=85 if dct else None,
                        dct_base=dct,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return decode_assets(assets).select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q473_bilevel_mh_codecs",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 29) + 4 AS w,
             (doc_id % 13) + 3 AS h,
             doc_id % 2 AS variant
      FROM documents WHERE doc_id % 23 = 21
    ), px AS (
      SELECT d.doc_id, d.variant, d.w, d.h,
             CASE WHEN (d.doc_id * 7 + t.k * 3) % 5 < 2 THEN 1 ELSE 0
             END AS bit
      FROM d, LATERAL (
        SELECT unnest(range(0, d.w * d.h)) AS k
      ) t
    )
    SELECT doc_id, CAST(variant AS INT) AS variant,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(COUNT(*) * CASE WHEN variant = 0 THEN 3 ELSE 1 END
                AS BIGINT) AS n_values,
           CAST(SUM(CASE WHEN variant = 1 THEN 255 * (1 - bit)
                         ELSE 765 * (1 - bit) END) AS BIGINT) AS px_sum,
           CAST(1 - MAX(bit) AS BIGINT) AS min_bit_inv,
           CAST(1 - MIN(bit) AS BIGINT) AS max_bit_inv
    FROM px GROUP BY doc_id, variant, w, h
    """,
)
def q473(spark, sf_dir):
    """Bilevel T.4 Modified-Huffman codecs (round 16,
    `operators/multimodal._mh_encode_row/_mh_decode_row`) through the
    Spark decode seam (`decode_assets`, the q468 pattern): v0 = OS/2
    2.x Huffman-1D BMP (compression 3, white/black palette — decodes
    to RGB, so a white pixel contributes 765 to the value sum), v1 =
    CCITTRLE TIFF (compression 2, WhiteIsZero — grayscale, a white
    pixel contributes 255).  The MH tables are cross-verified against
    the system libtiff in BOTH directions
    (tests/test_mh_bilevel.py); the oracle is the closed-form bit
    formula, so one wrong run anywhere breaks the hash."""
    import pandas as pd

    from ..operators.multimodal import (
        decode_assets,
        encode_bmp_huffman1d,
        encode_tiff_bilevel,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 21)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 29 + 4, d % 13 + 3
                bits = [
                    1 if (d * 7 + k * 3) % 5 < 2 else 0
                    for k in range(w * h)
                ]
                if d % 2 == 1:
                    blob = encode_tiff_bilevel(
                        bits, w, h, compression=2, photometric=0,
                        rows_per_strip=h if d % 4 == 1 else 4,
                    )
                else:
                    blob = encode_bmp_huffman1d(bits, w, h)
                payloads.append(blob)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return decode_assets(assets).join(
        docs.select(
            "doc_id", (F.col("doc_id") % 2).cast("int").alias("variant")
        ),
        "doc_id",
    ).select(
        "doc_id",
        "variant",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        (F.col("val_min") / 255).cast("bigint").alias("min_bit_inv"),
        (F.col("val_max") / 255).cast("bigint").alias("max_bit_inv"),
    )


@query(
    "q474_jpeg_hierarchical_progressive",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 19) + 6 AS w,
             (doc_id % 11) + 5 AS h,
             1 + 2 * (doc_id % 2) AS c
      FROM documents WHERE doc_id % 23 = 3
    ), px AS (
      SELECT d.doc_id, d.w, d.h, d.c,
             (d.doc_id * 11 + 5 * t.k) % 256 AS v
      FROM d, LATERAL (
        SELECT unnest(range(0, d.w * d.h * d.c)) AS k
      ) t
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(c AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id, w, h, c
    """,
)
def q474(spark, sf_dir):
    """PROGRESSIVE hierarchical JPEG (round 16 — the last T.81 frame
    kinds: SOF6/SOF14 progressive differentials and SOF2/SOF10 as a
    DHP base, `operators/jpeg.encode_jpeg_hierarchical(progressive=)`
    / the frame-scoped progressive walkers) through the Spark decode
    seam (`multimodal.decode_assets`, the q472 pattern): each asset is
    a 3-level DHP pyramid whose DCT frames are MULTI-SCAN progressive
    — Huffman (SOF6) on even doc_ids, QM arithmetic (SOF14) on odd,
    the successive-approximation axis on doc_id % 3 == 0, SOF2/SOF10
    as the base frame on doc_id % 5 == 0 — all with a lossless final
    frame, so every variant reconstructs exactly and the oracle is the
    closed-form pixel formula.  No third-party Annex-J implementation
    exists in this container (libjpeg-turbo refusal-pinned in
    tests/test_jpeg_hierarchical.py); the flat SOF2/SOF10 walkers are
    the in-repo differential (tests pin a DHP-wrapped SOF2 base
    bit-equal to the flat SOF2 decode)."""
    import pandas as pd

    from ..operators.jpeg import encode_jpeg_hierarchical
    from ..operators.multimodal import decode_assets

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 3)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 19 + 6, d % 11 + 5
                c = 1 + 2 * (d % 2)
                vals = [(d * 11 + 5 * k) % 256 for k in range(w * h * c)]
                payloads.append(
                    encode_jpeg_hierarchical(
                        vals, w, h, c, levels=3,
                        dct_quality=60 + d % 31,
                        progressive=True,
                        arith=(d % 2 == 1),
                        successive=(d % 3 == 0),
                        dct_base=(d % 5 == 0),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return decode_assets(assets).select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q475_tiff_separated_ycbcr",
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id % 21) + 6 AS w,
             (doc_id % 13) + 5 AS h
      FROM documents WHERE doc_id % 23 = 11
    ), px AS (
      SELECT d.doc_id, d.w, d.h,
             40 + 2 * ((t.k // 3) % d.w) + 3 * ((t.k // 3) // d.w) AS v
      FROM d, LATERAL (
        SELECT unnest(range(0, d.w * d.h * 3)) AS k
      ) t
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id, w, h
    """,
)
def q475(spark, sf_dir):
    """Tiled SEPARATED-YCbCr JPEG-in-TIFF (round 16 — the r15
    'planar configuration 2 and YCbCr photometric' guard, closed:
    `multimodal.encode_tiff_jpeg(planar=True)` /
    `_decode_tiff_jpeg_tiled(subsampling=)`): chroma planes at
    ceil(w/hs) × ceil(h/vs) from tag 530, tiled on the luma ta×td grid
    in ceil(tw/hs) × ceil(th/vs) single-component streams, plane-major
    — the libtiff writer's own layout (cross-verified both directions
    in tests/test_tiff_interop.py).  The fixture makes the lossy path
    EXACT so the oracle is closed-form: a grayscale gradient in RGB
    (R=G=B → Y is the gradient exactly, Cb=Cr=128 constant — constant
    planes survive box-downsample/replication-upsample and quantize to
    pure DC exactly; the q100 linear-gradient luma is bit-exact
    through the DCT, the q468 precedent).  Subsampling cycles
    (2,2)/(2,1)/(1,2)/(1,1) with shared JPEGTables on even doc_ids."""
    import pandas as pd

    from ..operators.multimodal import decode_assets, encode_tiff_jpeg

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 11)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 21 + 6, d % 13 + 5
                rgb = bytearray()
                for y in range(h):
                    for x in range(w):
                        rgb += bytes([40 + 2 * x + 3 * y] * 3)
                subs = [(2, 2), (2, 1), (1, 2), (1, 1)][d % 4]
                payloads.append(encode_tiff_jpeg(
                    bytes(rgb), w, h, 3, quality=100, tile=(16, 16),
                    planar=True, ycbcr_subsampling=subs,
                    shared_tables=(d % 2 == 0),
                ))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    return decode_assets(assets).select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("val_sum").cast("bigint").alias("px_sum"),
        F.col("val_min").cast("bigint").alias("px_min"),
        F.col("val_max").cast("bigint").alias("px_max"),
    )


@query(
    "q476_zstd_corpus_ingest",
    """
    SELECT doc_id,
           'zstd' AS codec,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE array_length(regexp_split_to_array(trim(text), '\\s+'))
                END AS BIGINT) AS n_tokens,
           TRUE AS crc_ok
    FROM documents WHERE doc_id % 23 = 15
    """,
)
def q476(spark, sf_dir):
    """Zstandard corpus ingestion (round 16 — the container's Python
    has NO zstd library, so `operators/zstd.py` implements RFC 8878
    from scratch: FSE, 1-/4-stream Huffman literals, sequence
    execution with the repeat-offset rules, XXH64 checksums; pinned
    byte-exact against the JVM's zstd-jni in tests/test_zstd.py).
    This query drives the `decompress_assets` seam with SELF-CONTAINED
    fixtures from the store-mode compressor twin, cycling the frame
    grammar by doc_id: plain single frame / checksummed frame /
    skippable-frame + two-frame concatenation (the multi-frame shape
    of appended archives).  The oracle pins codec detection, the
    decompressed byte and whitespace-token counts against the ORIGINAL
    text, and content identity via the q354 crc32 cross-check.  The
    entropy-coded decode paths (which need a real compressor) are
    covered by the zstd-jni differential suite, not this oracle."""
    import struct

    import pandas as pd

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 15)
        .select("doc_id", "text")
    )

    def build(it):
        from ..operators.zstd import zstd_compress_store

        for pdf in it:
            payloads = []
            for d, txt in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                raw = str(txt).encode("utf-8")
                m = d % 3
                if m == 0:
                    payloads.append(zstd_compress_store(raw,
                                                        checksum=False))
                elif m == 1:
                    payloads.append(zstd_compress_store(raw,
                                                        checksum=True))
                else:
                    cut = max(1, len(raw) // 2)
                    skip = struct.pack("<II", 0x184D2A50, 4) + b"meta"
                    payloads.append(
                        skip
                        + zstd_compress_store(raw[:cut])
                        + zstd_compress_store(raw[cut:])
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    from ..operators.multimodal import decompress_assets

    assets = docs.mapInPandas(build, "doc_id long, payload binary")
    out = decompress_assets(assets)
    src = docs.select(
        "doc_id", F.crc32(F.encode("text", "UTF-8")).alias("src_crc")
    )
    return out.join(src, "doc_id").select(
        "doc_id",
        "codec",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("crc32") == F.col("src_crc")).alias("crc_ok"),
    )
