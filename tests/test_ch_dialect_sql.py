"""ClickHouse-SQL dialect translation (functions/ch_dialect.py): rule
unit tests + end-to-end — CH-dialect statements run on Spark via
translation and match directly-written Spark SQL results."""

from __future__ import annotations

import pytest

from conftest import SF_DIR
from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
    ChTranslationError,
    translate_ch_sql,
)

CASES = [
    ("SELECT count() FROM t", "SELECT count(*) FROM t"),
    ("SELECT countIf(x > 3) FROM t", "SELECT count_if(x > 3) FROM t"),
    (
        "SELECT sumIf(v, t = 'a'), avgIf(v, f(x, y) > 2) FROM t",
        "SELECT coalesce(sum(CASE WHEN t = 'a' THEN v END), 0), "
        "avg(CASE WHEN f(x, y) > 2 THEN v END) FROM t",
    ),
    ("SELECT uniq(u), uniqExact(u) FROM t",
     "SELECT approx_count_distinct(u), count(DISTINCT u) FROM t"),
    ("SELECT quantile(0.9)(v) FROM t",
     "SELECT percentile_approx(v, 0.9) FROM t"),
    ("SELECT quantileExact(0.5)(v) FROM t",
     "SELECT percentile(v, 0.5) FROM t"),
    ("SELECT has(tags, 'x'), empty(tags), notEmpty(tags) FROM t",
     "SELECT array_contains(tags, 'x'), (size(tags) = 0), "
     "(size(tags) > 0) FROM t"),
    ("SELECT arrayJoin(tags) FROM t", "SELECT explode(tags) FROM t"),
    ("SELECT splitByChar('|', s) FROM t", "SELECT split(s, '\\\\|') FROM t"),
    ("SELECT match(s, '^ab') FROM t", "SELECT regexp_like(s, '^ab') FROM t"),
    ("SELECT JSONExtractString(j, 'k') FROM t",
     "SELECT get_json_object(j, '$.k') FROM t"),
    ("SELECT toStartOfMinute(ts), toStartOfDay(ts) FROM t",
     "SELECT date_trunc('minute', ts), date_trunc('day', ts) FROM t"),
    ("SELECT toUInt32(x), toFloat64(x), toString(x) FROM t",
     "SELECT CAST(x AS BIGINT), CAST(x AS DOUBLE), "
     "CAST(x AS STRING) FROM t"),
    ("SELECT multiIf(a > 1, 'x', b > 2, 'y', 'z') FROM t",
     "SELECT CASE WHEN a > 1 THEN 'x' WHEN b > 2 THEN 'y' "
     "ELSE 'z' END FROM t"),
    ("SELECT any(x), anyLast(y) FROM t",
     "SELECT first(x), last(y) FROM t"),
    ("SELECT x FROM t PREWHERE x > 1", "SELECT x FROM t WHERE x > 1"),
    ("SELECT x FROM t FORMAT JSONEachRow", "SELECT x FROM t "),
]


@pytest.mark.parametrize("ch,expected", CASES)
def test_translation_rules(ch, expected):
    assert translate_ch_sql(ch) == expected


def test_guards():
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT x FROM t SAMPLE 0.1")
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT sumIf(v) FROM t")
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT splitByChar(c, s) FROM t")  # non-literal


def test_ch_queries_run_on_spark(spark):
    """End-to-end: CH-dialect analytics over the events fixture produce
    the same results as directly-written Spark SQL."""
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")
    ch = (
        "SELECT event_type, count(), uniqExact(user_id) AS u, "
        "countIf(value > 50) AS big, "
        "sumIf(event_id % 100, value > 50) AS s, "
        "quantileExact(0.5)(event_id % 97) AS med, "
        "multiIf(count() > 1000, 'hot', count() > 10, 'warm', 'cold') "
        "AS tier "
        "FROM events PREWHERE event_id % 2 = 0 "
        "GROUP BY event_type FORMAT TSV"
    )
    direct = (
        "SELECT event_type, count(*), count(DISTINCT user_id) AS u, "
        "count_if(value > 50) AS big, "
        "sum(CASE WHEN value > 50 THEN event_id % 100 END) AS s, "
        "percentile(event_id % 97, 0.5) AS med, "
        "CASE WHEN count(*) > 1000 THEN 'hot' WHEN count(*) > 10 "
        "THEN 'warm' ELSE 'cold' END AS tier "
        "FROM events WHERE event_id % 2 = 0 GROUP BY event_type"
    )
    a = sorted(map(tuple, spark.sql(translate_ch_sql(ch)).collect()))
    b = sorted(map(tuple, spark.sql(direct).collect()))
    assert a == b and len(a) == 5
    # arrayJoin / has / splitByChar path
    ch2 = (
        "SELECT event_type, arrayJoin(splitByChar('_', event_type)) AS p "
        "FROM events WHERE has(splitByChar('_', event_type), 'click')"
    )
    out = spark.sql(translate_ch_sql(ch2))
    assert {r.p for r in out.collect()} == {"click"}


def test_settings_strip_and_totals_guard():
    assert translate_ch_sql(
        "SELECT count() FROM t SETTINGS max_threads=4, join_algorithm='hash'"
    ) == "SELECT count(*) FROM t "
    # WITH TOTALS now translates to GROUPING SETS ((keys), ())
    assert (
        "GROUPING SETS ((x), ())"
        in translate_ch_sql("SELECT x, count() FROM t GROUP BY x WITH TOTALS")
    )
    # ...but the HAVING combination depends on totals_mode -> refuse
    with pytest.raises(ChTranslationError):
        translate_ch_sql(
            "SELECT x, count() FROM t GROUP BY x WITH TOTALS HAVING count() > 2"
        )
    # and a literal mentioning WITH TOTALS is never touched
    sql = "SELECT x FROM t WHERE note = 'GROUP BY x WITH TOTALS'"
    assert translate_ch_sql(sql) == sql


def test_with_totals_multi_key_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)], "g string, h int, v int"
    )
    df.createOrReplaceTempView("tot_t")
    out = spark.sql(
        translate_ch_sql(
            "SELECT g, h, sum(v) AS s FROM tot_t GROUP BY g, h WITH TOTALS"
        )
    ).collect()
    rows = {(r.g, r.h): r.s for r in out}
    assert rows[(None, None)] == 60  # the totals row
    assert rows[("a", 1)] == 10 and len(rows) == 4


def test_reference_user_queries_over_mikrotik_logs(spark):
    """The migration loop closed end-to-end: build the reference's
    `mikrotik_logs` table through OUR native parse (P1-P8), then run
    the ClickHouse queries its users actually write — severity
    histograms, per-device top talkers, category containment, text
    search, minute windows — through the dialect shim, checking each
    against an independently computed expectation."""
    from syslog_handler_with_clickhouse_spark.functions.parse import (
        parse_syslog_columns,
    )
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").limit(2000)
    sev_tok = F.when(F.col("event_type") == "error", "error").otherwise("odd")
    raw = F.concat(
        F.col("event_type"), F.lit(","), sev_tok, F.lit(",topic"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(" msg "), F.col("event_id").cast("string"),
    )
    device = F.concat(
        F.lit("u"), F.col("user_id").cast("string"), F.lit(":514")
    )
    cols = parse_syslog_columns(raw, device, clock=F.col("ts"))
    logs = ev.select(
        cols["Timestamp"], cols["Device"], cols["Severity"],
        cols["Categories"], cols["Message"],
    )
    logs.createOrReplaceTempView("mikrotik_logs")

    # 1) severity histogram (the canonical CH log query)
    q = translate_ch_sql(
        "SELECT Severity, count() AS n FROM mikrotik_logs "
        "GROUP BY Severity FORMAT Pretty"
    )
    got = {r.Severity: r.n for r in spark.sql(q).collect()}
    exp = {
        r.Severity: r.n
        for r in logs.groupBy("Severity").agg(F.count("*").alias("n")).collect()
    }
    assert got == exp and set(got) == {3, 6}

    # 2) top talkers among error-severity devices
    q = translate_ch_sql(
        "SELECT Device, countIf(Severity <= 3) AS errs "
        "FROM mikrotik_logs GROUP BY Device "
        "HAVING errs > 0 ORDER BY errs DESC, Device LIMIT 5"
    )
    rows = spark.sql(q).collect()
    assert 0 < len(rows) <= 5
    assert all(r.errs > 0 for r in rows)
    assert [(-r.errs, r.Device) for r in rows] == sorted(
        (-r.errs, r.Device) for r in rows
    )

    # 3) category containment + uniq devices
    q = translate_ch_sql(
        "SELECT uniqExact(Device) AS d FROM mikrotik_logs "
        "PREWHERE has(Categories, 'topic3')"
    )
    got_d = spark.sql(q).collect()[0].d
    exp_d = (
        logs.filter(F.array_contains("Categories", "topic3"))
        .select("Device").distinct().count()
    )
    assert got_d == exp_d > 0

    # 4) text search + minute rollup
    q = translate_ch_sql(
        "SELECT toStartOfMinute(Timestamp) AS m, count() AS n "
        "FROM mikrotik_logs WHERE match(Message, '^msg 1') "
        "GROUP BY m ORDER BY m"
    )
    total = sum(r.n for r in spark.sql(q).collect())
    exp_total = logs.filter(F.col("Message").rlike("^msg 1")).count()
    assert total == exp_total > 0


def test_if_combinators_and_avg_weighted(spark):
    assert translate_ch_sql("SELECT uniqExactIf(u, v > 1) FROM t") == (
        "SELECT count(DISTINCT CASE WHEN v > 1 THEN u END) FROM t"
    )
    assert translate_ch_sql("SELECT avgWeighted(x, w) FROM t") == (
        "SELECT (sum((x) * (w)) / sum(w)) FROM t"
    )
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")
    got = spark.sql(
        translate_ch_sql(
            "SELECT uniqExactIf(user_id, value > 50.00) AS u, "
            "avgWeighted(event_id % 10, user_id % 7 + 1) AS aw FROM events"
        )
    ).collect()[0]
    exp = spark.sql(
        "SELECT count(DISTINCT CASE WHEN value > 50.00 THEN user_id END) "
        "AS u, sum((event_id % 10) * (user_id % 7 + 1)) "
        "/ sum(user_id % 7 + 1) AS aw FROM events"
    ).collect()[0]
    assert (got.u, got.aw) == (exp.u, exp.aw)


def test_ch_dialect_fuzz_differential(spark, duck):
    """Translation-composition fuzz: random CH statements built from
    the rule grammar run on Spark THROUGH the translator, while a
    parallel generator emits the DuckDB-direct relational equivalent —
    60 fresh-seeded statements per run, integer-only outputs, exact
    row equality.  Guards the rule interactions the pairwise unit
    tests can't (nested If-combinators inside multiIf, PREWHERE with
    rewritten predicates, FORMAT/SETTINGS suffixes)."""
    import os
    import random

    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")

    PREDS = [
        "value > 40.00",
        "event_type = 'click'",
        "user_id % 7 = 3",
        "event_id % 2 = 0",
        "event_type <> 'error'",
    ]
    KEYS = ["event_type", "user_id % 10", "event_id % 3"]
    INTS = ["event_id % 100", "user_id % 50", "event_id % 7"]

    def gen(rng):
        """Returns (ch_sql, duck_sql) with identical column aliases."""
        key = rng.choice(KEYS)
        n_aggs = rng.randint(1, 4)
        ch_aggs, dk_aggs = [], []
        for i in range(n_aggs):
            form = rng.randrange(5)
            p = rng.choice(PREDS)
            x = rng.choice(INTS)
            a = f"a{i}"
            if form == 0:
                ch_aggs.append(f"toUInt64(count()) AS {a}")
                dk_aggs.append(f"CAST(COUNT(*) AS BIGINT) AS {a}")
            elif form == 1:
                ch_aggs.append(f"toUInt64(countIf({p})) AS {a}")
                dk_aggs.append(
                    f"CAST(SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT)"
                    f" AS {a}"
                )
            elif form == 2:
                ch_aggs.append(f"toUInt64(sumIf({x}, {p})) AS {a}")
                dk_aggs.append(
                    f"CAST(COALESCE(SUM(CASE WHEN {p} THEN {x} END), 0)"
                    f" AS BIGINT) AS {a}"
                )
            elif form == 3:
                ch_aggs.append(f"toUInt64(uniqExactIf(user_id, {p})) AS {a}")
                dk_aggs.append(
                    f"CAST(COUNT(DISTINCT CASE WHEN {p} THEN user_id END)"
                    f" AS BIGINT) AS {a}"
                )
            else:
                ch_aggs.append(
                    f"multiIf(countIf({p}) > 100, 'hi', "
                    f"countIf({p}) > 10, 'mid', 'lo') AS {a}"
                )
                dk_aggs.append(
                    f"CASE WHEN SUM(CASE WHEN {p} THEN 1 ELSE 0 END) > 100 "
                    f"THEN 'hi' WHEN SUM(CASE WHEN {p} THEN 1 ELSE 0 END) "
                    f"> 10 THEN 'mid' ELSE 'lo' END AS {a}"
                )
        wp = rng.choice(PREDS)
        clause = rng.choice(["WHERE", "PREWHERE"])
        suffix = rng.choice(["", " FORMAT TSV", " SETTINGS max_threads=8"])
        ch = (
            f"SELECT {key} AS k, {', '.join(ch_aggs)} FROM events "
            f"{clause} {wp} GROUP BY {key}{suffix}"
        )
        dk = (
            f"SELECT {key} AS k, {', '.join(dk_aggs)} FROM events "
            f"WHERE {wp} GROUP BY {key}"
        )
        return ch, dk

    seed_env = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
    seed = int(seed_env) if seed_env else int.from_bytes(os.urandom(6), "big")
    rng = random.Random(seed)
    for i in range(60):
        ch, dk = gen(rng)
        sdf = spark.sql(translate_ch_sql(ch)).toPandas()
        odf = duck.execute(dk).df()
        s_rows = sorted(
            map(tuple, sdf[sorted(sdf.columns)].itertuples(index=False))
        )
        o_rows = sorted(
            map(tuple, odf[sorted(odf.columns)].itertuples(index=False))
        )
        assert s_rows == o_rows, (
            f"divergence (seed={seed}, stmt #{i}):\nCH: {ch}\nDK: {dk}\n"
            f"{s_rows[:3]} vs {o_rows[:3]}"
        )


def test_array_join_and_limit_by(spark):
    """CH clause constructs: ARRAY JOIN -> LATERAL VIEW explode (and
    LEFT ARRAY JOIN -> explode_outer); LIMIT n BY cols -> row_number
    window filter ranked by the statement's ORDER BY."""
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )
    from pyspark.sql import functions as F

    load_table(spark, SF_DIR, "events").limit(500).withColumn(
        "tags", F.split(F.col("event_type"), "")
    ).createOrReplaceTempView("tagged")

    # ARRAY JOIN
    ch = ("SELECT event_id, x FROM tagged ARRAY JOIN tags AS x "
          "WHERE x = 'c'")
    got = spark.sql(translate_ch_sql(ch)).count()
    exp = spark.sql(
        "SELECT event_id, x FROM tagged LATERAL VIEW explode(tags) t "
        "AS x WHERE x = 'c'"
    ).count()
    assert got == exp > 0
    # LEFT ARRAY JOIN -> explode_outer
    assert "explode_outer" in translate_ch_sql(
        "SELECT x FROM t LEFT ARRAY JOIN tags AS x"
    )

    # LIMIT BY: top-2 events per type by value
    ch2 = (
        "SELECT event_type, event_id, value FROM tagged "
        "ORDER BY value DESC, event_id LIMIT 2 BY event_type LIMIT 6"
    )
    rows = spark.sql(translate_ch_sql(ch2)).collect()
    assert len(rows) == 6
    assert "_rn_by" not in rows[0].asDict()
    from collections import Counter

    per_type = Counter(r.event_type for r in rows)
    assert all(v <= 2 for v in per_type.values())
    # values really are each type's top-2
    exp_top = spark.sql(
        "SELECT event_type, event_id, value FROM (SELECT *, row_number() "
        "OVER (PARTITION BY event_type ORDER BY value DESC, event_id) rn "
        "FROM tagged) WHERE rn <= 2 ORDER BY value DESC, event_id LIMIT 6"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, exp_top))

    with pytest.raises(ChTranslationError, match="ORDER BY"):
        translate_ch_sql("SELECT x FROM t LIMIT 2 BY x")


def test_url_function_rules_execute(spark):
    """URL-family rewrites (domain/domainWithoutWWW/topLevelDomain/
    protocol/path/queryString/cutQueryString/extractURLParameter)
    translate to runnable Spark SQL with CH semantics."""
    ch = (
        "SELECT protocol(u) AS p, domain(u) AS d, "
        "domainWithoutWWW(u) AS dw, topLevelDomain(u) AS tld, "
        "path(u) AS pa, queryString(u) AS qs, "
        "cutQueryString(u) AS cq, "
        "extractURLParameter(u, 'q') AS pq FROM urls"
    )
    sql = translate_ch_sql(ch)
    assert "regexp_extract" in sql and "domain(" not in sql
    spark.createDataFrame(
        [
            ("https://user:pw@www.example.co.uk:8443/a/b?q=1&z=2#f",),
            ("http://host7.com/item",),
            ("ftp://cdn.example.org:21/pub?x=9",),
            ("no-url-here",),
        ],
        "u string",
    ).createOrReplaceTempView("urls")
    rows = {r["u"]: r for r in spark.sql(
        "SELECT u, " + sql.split("SELECT ", 1)[1]
    ).collect()}
    r = rows["https://user:pw@www.example.co.uk:8443/a/b?q=1&z=2#f"]
    assert (r["p"], r["d"], r["dw"], r["tld"]) == (
        "https", "www.example.co.uk", "example.co.uk", "uk")
    assert (r["pa"], r["qs"], r["pq"]) == ("/a/b", "q=1&z=2", "1")
    assert r["cq"] == "https://user:pw@www.example.co.uk:8443/a/b#f"
    r2 = rows["http://host7.com/item"]
    assert (r2["d"], r2["pa"], r2["qs"], r2["pq"]) == (
        "host7.com", "/item", "", "")
    r4 = rows["no-url-here"]
    assert (r4["d"], r4["tld"]) == ("", "")

    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT extractURLParameter(u, name) FROM t")


def test_temporal_rules(spark):
    """Temporal family: toYYYYMM/toYYYYMMDD/toUnixTimestamp/toDayOf*/
    toQuarter/toISOWeek/monthName/timeSlot/toStartOfInterval/dateDiff
    translate and execute with CH semantics (Monday=1 weekday, unit-
    boundary-crossing dateDiff, half-hour timeSlot)."""
    ch = (
        "SELECT toYYYYMM(ts) AS ym, toYYYYMMDD(ts) AS ymd, "
        "toUnixTimestamp(ts) AS ut, toDayOfWeek(ts) AS dow, "
        "toDayOfYear(ts) AS doy, toQuarter(ts) AS q, "
        "toISOWeek(ts) AS iw, monthName(ts) AS mn, "
        "toString(timeSlot(ts)) AS slot, "
        "toString(toStartOfInterval(ts, INTERVAL 10 MINUTE)) AS s10, "
        "dateDiff('day', toDate('2024-01-01'), ts) AS dd, "
        "dateDiff('month', toDate('2023-11-15'), ts) AS dm, "
        "dateDiff('hour', toDateTime('2024-03-08 23:10:00'), ts) AS dh "
        "FROM tt"
    )
    sql = translate_ch_sql(ch)
    # the dateDiff emission must not re-match its own rule (regression:
    # datediff( matched dateDiff( case-insensitively and looped)
    assert "`datediff`" in sql
    spark.createDataFrame(
        [("2024-03-09 01:44:30.5",)], "s string"
    ).selectExpr("cast(s as timestamp) AS ts").createOrReplaceTempView("tt")
    r = spark.sql(sql).collect()[0]
    assert (r["ym"], r["ymd"]) == (202403, 20240309)
    assert r["dow"] == 6  # Saturday, CH Monday=1 base
    assert (r["q"], r["doy"]) == (1, 69)
    assert r["mn"] == "March"
    assert r["slot"] == "2024-03-09 01:30:00"
    assert r["s10"] == "2024-03-09 01:40:00"
    assert r["dd"] == 68
    assert r["dm"] == 4  # Nov->Mar month boundaries crossed
    assert r["dh"] == 2  # 23:10 -> 01:44 crosses 00:00 and 01:00
    assert r["ut"] == 1709948670
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT dateDiff('week', a, b) FROM t")
    with pytest.raises(ChTranslationError):
        translate_ch_sql(
            "SELECT toStartOfInterval(ts, INTERVAL 1 MONTH) FROM t"
        )


def test_array_manipulation_rules(spark):
    """arraySlice / arrayResize / arrayRotateLeft|Right translate and
    execute with CH 1-based offsets, including negative offsets,
    over-rotation (k > len), and the empty-array guard."""
    ch = (
        "SELECT arraySlice(a, 2, 3) AS s1, arraySlice(a, -2) AS s2, "
        "arrayResize(a, 4, 0) AS r4, arrayResize(a, 2, 0) AS r2, "
        "arrayRotateLeft(a, 7) AS rl, arrayRotateRight(a, 1) AS rr "
        "FROM ta"
    )
    sql = translate_ch_sql(ch)
    assert "arraySlice" not in sql and "arrayRotate" not in sql
    spark.createDataFrame(
        [([1, 2, 3, 4, 5],), ([],)], "a array<int>"
    ).createOrReplaceTempView("ta")
    full, empty = spark.sql(sql).collect()
    assert full["s1"] == [2, 3, 4] and full["s2"] == [4, 5]
    assert full["r4"] == [1, 2, 3, 4] and full["r2"] == [1, 2]
    assert full["rl"] == [3, 4, 5, 1, 2]  # 7 % 5 == 2
    assert full["rr"] == [5, 1, 2, 3, 4]
    assert empty["rl"] == [] and empty["rr"] == []
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT arrayResize(a, 4) FROM t")


def test_ch_dialect_scalar_fuzz_differential(spark, duck):
    """Row-level composition fuzz over the round-8 rule families
    (temporal / URL / array manipulation): random CH projections run
    on Spark through the translator against hand-paired DuckDB
    equivalents.  Catches emission bugs the unit tests miss — the
    dateDiff self-rematch loop was exactly this class."""
    import os
    import random

    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")

    # each entry: (ch_expr, duck_expr); identical outputs by design.
    URL = (
        "('http' || CAST(event_id % 2 AS VARCHAR) || '://' "
        "|| CASE WHEN event_id % 3 = 0 THEN 'www.' ELSE '' END "
        "|| 'h' || CAST(user_id % 20 AS VARCHAR) || '.org' "
        "|| CASE WHEN event_id % 5 = 0 THEN ':81' ELSE '' END "
        "|| '/p/' || CAST(event_id % 7 AS VARCHAR) "
        "|| CASE WHEN user_id % 2 = 0 THEN '?a=' "
        "|| CAST(event_id % 9 AS VARCHAR) || '&b=2' ELSE '' END)"
    )
    URL_CH = (
        "concat('http', toString(event_id % 2), '://', "
        "multiIf(event_id % 3 = 0, 'www.', ''), "
        "'h', toString(user_id % 20), '.org', "
        "multiIf(event_id % 5 = 0, ':81', ''), "
        "'/p/', toString(event_id % 7), "
        "multiIf(user_id % 2 = 0, "
        "concat('?a=', toString(event_id % 9), '&b=2'), ''))"
    )
    AUTH_DK = "'^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#]*)'"
    HOST_DK = (
        f"regexp_extract(regexp_extract({URL}, {AUTH_DK}, 1), "
        f"'^([^:]*)', 1)"
    )
    SEQ_CH = "sequence(1, CAST(event_id % 5 + 3 AS INT))"
    SEQ_DK = "generate_series(1, CAST(event_id % 5 + 3 AS INT))"
    POOL = [
        ("toYYYYMM(ts)", "CAST(strftime(ts, '%Y%m') AS INT)"),
        ("toYYYYMMDD(ts)", "CAST(strftime(ts, '%Y%m%d') AS INT)"),
        ("toDayOfWeek(ts)", "CAST(isodow(ts) AS INT)"),
        ("toDayOfYear(ts)", "CAST(dayofyear(ts) AS INT)"),
        ("toQuarter(ts)", "CAST(quarter(ts) AS INT)"),
        ("toISOWeek(ts)", "CAST(weekofyear(ts) AS INT)"),
        ("monthName(ts)", "monthname(ts)"),
        (
            "toUnixTimestamp(ts)",
            "CAST(floor(epoch(ts)) AS BIGINT)",
        ),
        (
            "toString(timeSlot(ts))",
            "strftime(to_timestamp(CAST(floor(epoch(ts) / 1800) AS "
            "BIGINT) * 1800), '%Y-%m-%d %H:%M:%S')",
        ),
        (
            "dateDiff('day', toDate('2024-01-01'), ts)",
            "CAST(date_diff('day', DATE '2024-01-01', "
            "CAST(ts AS DATE)) AS BIGINT)",
        ),
        (
            "dateDiff('hour', toDateTime('2024-01-01 00:00:00'), ts)",
            "CAST(floor(epoch(ts) / 3600) AS BIGINT) - "
            "CAST(floor(epoch(TIMESTAMP '2024-01-01 00:00:00') / 3600) "
            "AS BIGINT)",
        ),
        (f"domain({URL_CH})", HOST_DK),
        (
            f"topLevelDomain({URL_CH})",
            f"CASE WHEN {HOST_DK} = '' THEN '' ELSE "
            f"list_extract(string_split({HOST_DK}, '.'), -1) END",
        ),
        (f"path({URL_CH})",
         f"regexp_extract(regexp_replace({URL}, "
         f"'^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//(?:[^/?#@]*@)?[^/?#]*', "
         f"''), '^([^?#]*)', 1)"),
        (f"queryString({URL_CH})",
         f"regexp_extract({URL}, '\\?([^#]*)', 1)"),
        (f"extractURLParameter({URL_CH}, 'a')",
         f"regexp_extract({URL}, '[?&]a=([^&#]*)', 1)"),
        (
            f"arrayStringConcat(arraySlice({SEQ_CH}, 2, 3), ',')",
            f"array_to_string({SEQ_DK}[2:4], ',')",
        ),
        (
            f"arrayStringConcat(arrayRotateLeft({SEQ_CH}, "
            f"CAST(event_id % 4 AS INT)), ',')",
            f"array_to_string(list_concat("
            f"{SEQ_DK}[(CAST(event_id % 4 AS INT) % len({SEQ_DK}) + 1):], "
            f"{SEQ_DK}[1:(CAST(event_id % 4 AS INT) % len({SEQ_DK}))]), "
            f"',')",
        ),
        (
            f"arrayStringConcat(arrayResize({SEQ_CH}, 6, 0), ',')",
            f"array_to_string(CASE WHEN len({SEQ_DK}) >= 6 "
            f"THEN {SEQ_DK}[1:6] ELSE list_concat({SEQ_DK}, "
            f"list_transform(generate_series(1, 6 - len({SEQ_DK})), "
            f"x -> 0)) END, ',')",
        ),
    ]
    # round-9 string-search family over a synthetic haystack
    STR_CH = (
        "concat('w', toString(event_id % 9), ' the tab',"
        " toString(user_id % 5))"
    )
    STR_DK = (
        "('w' || CAST(event_id % 9 AS VARCHAR) || ' the tab'"
        " || CAST(user_id % 5 AS VARCHAR))"
    )
    POOL += [
        (
            f"hasToken({STR_CH}, 'the')",
            f"regexp_matches({STR_DK}, "
            f"'(^|[^a-zA-Z0-9])the([^a-zA-Z0-9]|$)')",
        ),
        (
            f"countSubstrings({STR_CH}, 'ta')",
            f"CAST((length({STR_DK}) - length(replace({STR_DK}, 'ta', '')))"
            f" / 2 AS INT)",
        ),
        (
            f"position({STR_CH}, 'tab')",
            f"CAST(strpos({STR_DK}, 'tab') AS INT)",
        ),
        (
            f"positionCaseInsensitive({STR_CH}, 'THE')",
            f"CAST(strpos(lower({STR_DK}), 'the') AS INT)",
        ),
        (
            f"multiSearchAny({STR_CH}, ['tab', 'zz'])",
            f"(strpos({STR_DK}, 'tab') > 0 OR strpos({STR_DK}, 'zz') > 0)",
        ),
    ]
    PREDS = [
        ("event_id % 13 = 1", "event_id % 13 = 1"),
        ("user_id % 11 = 4 AND ts IS NOT NULL",
         "user_id % 11 = 4 AND ts IS NOT NULL"),
        ("event_id % 17 = 0", "event_id % 17 = 0"),
    ]

    seed_env = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
    seed = int(seed_env) if seed_env else int.from_bytes(os.urandom(6), "big")
    rng = random.Random(seed)
    for i in range(40):
        picks = rng.sample(range(len(POOL)), rng.randint(2, 4))
        chp, wp = rng.choice(["WHERE", "PREWHERE"]), rng.choice(PREDS)
        ch_cols = ", ".join(
            f"{POOL[p][0]} AS c{j}" for j, p in enumerate(picks)
        )
        dk_cols = ", ".join(
            f"{POOL[p][1]} AS c{j}" for j, p in enumerate(picks)
        )
        ch = (
            f"SELECT event_id, {ch_cols} FROM events {chp} "
            f"{wp[0]} AND ts IS NOT NULL"
            + rng.choice(["", " FORMAT TSV", " SETTINGS max_threads=4"])
        )
        dk = (
            f"SELECT event_id, {dk_cols} FROM events WHERE "
            f"{wp[1]} AND ts IS NOT NULL ORDER BY event_id"
        )
        sdf = spark.sql(translate_ch_sql(ch)).toPandas()
        odf = duck.execute(dk).df()
        sdf = sdf.sort_values("event_id").reset_index(drop=True)
        odf = odf.sort_values("event_id").reset_index(drop=True)
        s_rows = [tuple(str(v) for v in t) for t in
                  sdf[sorted(sdf.columns)].itertuples(index=False)]
        o_rows = [tuple(str(v) for v in t) for t in
                  odf[sorted(odf.columns)].itertuples(index=False)]
        assert s_rows == o_rows, (
            f"divergence (seed={seed}, stmt #{i}):\nCH: {ch}\nDK: {dk}\n"
            f"{s_rows[:2]} vs {o_rows[:2]}"
        )


def test_join_modifier_rules(spark):
    """GLOBAL hints strip, ALL strictness strips, ANY [LEFT|INNER]
    JOIN ... USING dedupes the right side to one row per key; ASOF
    JOIN and non-USING ANY JOIN raise with pointers."""
    assert translate_ch_sql(
        "SELECT x FROM t WHERE x GLOBAL IN (SELECT y FROM u)"
    ) == "SELECT x FROM t WHERE x IN (SELECT y FROM u)"
    assert translate_ch_sql(
        "SELECT * FROM a ALL LEFT JOIN b USING (k)"
    ) == "SELECT * FROM a LEFT JOIN b USING (k)"
    spark.createDataFrame(
        [(1, "l1"), (2, "l2"), (3, "l3")], "k int, lv string"
    ).createOrReplaceTempView("lhs")
    spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k int, rv string"
    ).createOrReplaceTempView("rhs")
    sql = translate_ch_sql(
        "SELECT k, lv, rv FROM lhs GLOBAL ANY LEFT JOIN rhs USING (k) "
        "ORDER BY k"
    )
    rows = [tuple(r) for r in spark.sql(sql).collect()]
    # exactly one right row per key; CH doesn't pin which, our
    # translation picks deterministically
    assert len(rows) == 3
    assert rows[0][0] == 1 and rows[0][2] in ("a", "b")
    assert rows[2] == (3, "l3", None)
    sql_i = translate_ch_sql(
        "SELECT k, rv FROM lhs ANY INNER JOIN rhs USING (k) ORDER BY k"
    )
    assert len(spark.sql(sql_i).collect()) == 2
    with pytest.raises(ChTranslationError, match="asof_join"):
        translate_ch_sql("SELECT * FROM a ASOF JOIN b ON a.k = b.k")
    with pytest.raises(ChTranslationError, match="USING"):
        translate_ch_sql("SELECT * FROM a ANY LEFT JOIN b ON a.k = b.k")


def test_plural_quantiles_rules(spark):
    assert translate_ch_sql(
        "SELECT quantiles(0.5, 0.9)(v) FROM t"
    ) == "SELECT percentile_approx(v, array(0.5, 0.9)) FROM t"
    assert translate_ch_sql(
        "SELECT quantilesExact(0.25, 0.75)(v) FROM t"
    ) == "SELECT percentile(v, array(0.25, 0.75)) FROM t"
    spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v double"
    ).createOrReplaceTempView("tq")
    r = spark.sql(
        translate_ch_sql("SELECT quantilesExact(0.5, 0.99)(v) AS q FROM tq")
    ).collect()[0]["q"]
    assert r[0] == 50.5 and abs(r[1] - 99.01) < 1e-9


def test_string_search_rules(spark):
    """hasToken / countSubstrings / position(CaseInsensitive) /
    multiSearchAny translate and execute with CH semantics (1-based
    positions, 0 = absent, token boundaries = non-alphanumeric)."""
    assert (
        translate_ch_sql("SELECT position(s, 'ab') FROM t")
        == "SELECT locate('ab', s) FROM t"
    )
    # SQL-standard position(x IN y): the IN form is special grammar
    # (backquoting breaks it) — rewritten to the same locate
    assert (
        translate_ch_sql("SELECT position('b' IN s) FROM t")
        == "SELECT locate('b', s) FROM t"
    )
    assert "lower" in translate_ch_sql(
        "SELECT positionCaseInsensitive(s, 'AB') FROM t"
    )
    with pytest.raises(ChTranslationError, match="literal token"):
        translate_ch_sql("SELECT hasToken(s, col) FROM t")
    with pytest.raises(ChTranslationError, match="alphanumeric"):
        translate_ch_sql("SELECT hasToken(s, 'a b') FROM t")

    spark.createDataFrame(
        [("the cat sat", 1), ("theatre seats", 2), ("a THE b", 3)],
        "s string, k int",
    ).createOrReplaceTempView("tss")
    rows = {
        r.k: r
        for r in spark.sql(
            translate_ch_sql(
                "SELECT k, hasToken(s, 'the') AS ht, "
                "countSubstrings(s, 'at') AS n_at, "
                "position(s, 'cat') AS p, "
                "positionCaseInsensitive(s, 'THE') AS pci, "
                "multiSearchAny(s, ['cat', 'seat']) AS ms "
                "FROM tss"
            )
        ).collect()
    }
    # token semantics: 'theatre' does NOT contain token 'the'
    assert rows[1].ht is True and rows[2].ht is False and rows[3].ht is False
    assert rows[1].n_at == 2 and rows[2].n_at == 2  # 'theatre'+'seats'
    assert rows[1].p == 5 and rows[2].p == 0
    assert rows[1].pci == 1 and rows[3].pci == 3
    assert rows[1].ms is True and rows[2].ms is True and rows[3].ms is False


def test_string_transform_rules(spark):
    """replaceAll / replaceRegexpAll / trims / pads / startsWith /
    endsWith translate and execute; replaceRegexpOne raises (Spark's
    regexp_replace is replace-ALL only — refusing beats silently
    changing semantics)."""
    spark.createDataFrame(
        [("  ab-cd-ab  ",)], "s string"
    ).createOrReplaceTempView("tst")
    r = spark.sql(
        translate_ch_sql(
            "SELECT replaceAll(trimBoth(s), 'ab', 'X') AS r1, "
            "replaceRegexpAll(trimLeft(s), '[-]', '_') AS r2, "
            "leftPad(trimBoth(s), 12, '.') AS r3, "
            "rightPad('ab', 4, 'z') AS r4, "
            "startsWith(trimBoth(s), 'ab') AS r5, "
            "endsWith(trimRight(s), 'ab') AS r6 "
            "FROM tst"
        )
    ).first()
    assert r.r1 == "X-cd-X"
    assert r.r2 == "ab_cd_ab  "
    assert r.r3 == "....ab-cd-ab"  # lpad pads to total width 12
    assert r.r4 == "abzz"
    assert r.r5 is True
    assert r.r6 is True  # rtrim('  ab-cd-ab  ') ends with 'ab' 
    with pytest.raises(ChTranslationError, match="replaceRegexpOne"):
        translate_ch_sql("SELECT replaceRegexpOne(s, 'a', 'b') FROM t")


def test_agg_combinator2_rules(spark):
    """groupUniqArray / argMin[If] / argMax[If] / anyIf / arrayFlatten /
    arrayZip / mapKeys / mapValues translate and execute."""
    assert (
        translate_ch_sql("SELECT argMin(a, b) FROM t")
        == "SELECT min_by(a, b) FROM t"
    )
    assert "max_by(CASE WHEN c THEN a END, CASE WHEN c THEN b END)" in (
        translate_ch_sql("SELECT argMaxIf(a, b, c) FROM t")
    )
    assert (
        translate_ch_sql("SELECT arrayFlatten(x), mapKeys(m) FROM t")
        == "SELECT flatten(x), map_keys(m) FROM t"
    )
    spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (2, 5, "z"), (2, 5, "z")],
        "k int, v int, s string",
    ).createOrReplaceTempView("tac")
    r = {
        row.k: row
        for row in spark.sql(
            translate_ch_sql(
                "SELECT k, argMin(s, v) AS lo, argMax(s, v) AS hi, "
                "anyIf(s, v = 20) AS a20, "
                "arrayStringConcat(groupUniqArray(s), '|') AS us "
                "FROM tac GROUP BY k"
            )
        ).collect()
    }
    assert r[1].lo == "x" and r[1].hi == "y" and r[1].a20 == "y"
    assert r[1].us == "x|y" and r[2].us == "z"
    assert r[2].a20 is None  # no qualifying row
    # projection-side array/map functions execute
    row = spark.sql(
        translate_ch_sql(
            "SELECT arrayFlatten(array(array(1, 2), array(3))) AS f, "
            "mapValues(map('a', 1, 'b', 2)) AS mv, "
            "arrayZip(array(1, 2), array('u', 'v')) AS z"
        )
    ).first()
    assert list(row.f) == [1, 2, 3]
    assert sorted(row.mv) == [1, 2]
    assert [tuple(e) for e in row.z] == [(1, "u"), (2, "v")]


def test_with_fill_rule(spark):
    """WITH FILL generates the [FROM, TO) grid, keeps off-grid original
    rows, and fills other columns with NULL (documented deviation from
    CH's type defaults); non-literal bounds raise."""
    spark.createDataFrame(
        [(1, 5), (1, 7), (4, 2)], "k int, v int"
    ).createOrReplaceTempView("tfill")
    rows = spark.sql(
        translate_ch_sql(
            "SELECT k, count() AS n FROM tfill GROUP BY k "
            "ORDER BY k WITH FILL FROM 0 TO 6 STEP 2"
        )
    ).collect()
    assert [(r.k, r.n) for r in rows] == [
        (0, None), (1, 2), (2, None), (4, 1)
    ]
    with pytest.raises(ChTranslationError, match="literal FROM/TO"):
        translate_ch_sql("SELECT k FROM t ORDER BY k WITH FILL")
    with pytest.raises(ChTranslationError, match="final ORDER BY"):
        translate_ch_sql(
            "SELECT k FROM t ORDER BY k WITH FILL FROM 0 TO 5 LIMIT 3"
        )


def test_quantile_if_and_state_merge_guard(spark):
    assert translate_ch_sql(
        "SELECT quantileExactIf(0.5)(v, v > 3) FROM t"
    ) == "SELECT percentile(CASE WHEN v > 3 THEN v END, 0.5) FROM t"
    assert "percentile_approx(CASE WHEN c THEN v END, 0.9)" in (
        translate_ch_sql("SELECT quantileIf(0.9)(v, c) FROM t")
    )
    spark.createDataFrame(
        [(float(i),) for i in range(1, 11)], "v double"
    ).createOrReplaceTempView("tqi")
    r = spark.sql(
        translate_ch_sql("SELECT quantileExactIf(0.5)(v, v > 5) AS m FROM tqi")
    ).first()
    assert r.m == 8.0  # median of 6..10
    # -State / -Merge combinators refuse loudly
    for bad in ("uniqState(x)", "sumMerge(s)", "quantileState(v)"):
        with pytest.raises(ChTranslationError, match="State/-Merge"):
            translate_ch_sql(f"SELECT {bad} FROM t")


def test_round3_array_literals_and_indexing_guard():
    import pytest

    from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
        ChTranslationError,
        translate_ch_sql,
    )

    assert (
        translate_ch_sql("SELECT arrayMap(x -> x * 2, [1, 2])")
        == "SELECT transform(array(1, 2), x -> x * 2)"
    )
    # literal strings keep their brackets
    assert "[1]" in translate_ch_sql("SELECT x FROM t WHERE m = 'a [1] b'")
    # 1-based CH indexing must refuse, not silently shift to 0-based
    with pytest.raises(ChTranslationError, match="1-based"):
        translate_ch_sql("SELECT arr[1] FROM t")
    with pytest.raises(ChTranslationError, match="1-based"):
        translate_ch_sql("SELECT [1,2][1]")
    # sorts with key lambdas refuse rather than mis-sort
    with pytest.raises(ChTranslationError, match="arraySort"):
        translate_ch_sql("SELECT arraySort(x -> -x, [1,2])")
    # formatDateTime: unknown codes refuse; raw letters are quoted and
    # survive SQL-literal embedding
    with pytest.raises(ChTranslationError, match="%Q"):
        translate_ch_sql("SELECT formatDateTime(ts, '%Q') FROM t")
    out = translate_ch_sql("SELECT formatDateTime(ts, '%Y-%m-%dT%H') FROM t")
    assert "date_format(ts, 'yyyy-MM-dd''T''HH')" in out


def test_first_significant_subdomain_rules(spark):
    df = spark.createDataFrame(
        [
            ("http://news.clickhouse.com.tr/x",),
            ("https://www.example.co.uk/p",),
            ("http://sub.example.io/a",),
            ("http://localhost:9000/z",),
            ("mailto:user@nowhere",),
        ],
        "url string",
    )
    df.createOrReplaceTempView("fsd_t")
    out = spark.sql(
        translate_ch_sql(
            "SELECT url, firstSignificantSubdomain(url) AS f, "
            "cutToFirstSignificantSubdomain(url) AS c FROM fsd_t"
        )
    ).collect()
    got = {r.url: (r.f, r.c) for r in out}
    assert got["http://news.clickhouse.com.tr/x"] == (
        "clickhouse", "clickhouse.com.tr")
    assert got["https://www.example.co.uk/p"] == ("example", "example.co.uk")
    assert got["http://sub.example.io/a"] == ("example", "example.io")
    assert got["http://localhost:9000/z"] == ("localhost", "localhost")
    assert got["mailto:user@nowhere"] == ("", "")


def test_extract_key_value_pairs_rule(spark):
    df = spark.createDataFrame(
        [("name:neymar, age:31 team:psg;nick:mostachudo",)], "s string"
    )
    df.createOrReplaceTempView("kv_t")
    (row,) = spark.sql(
        translate_ch_sql("SELECT extractKeyValuePairs(s) AS m FROM kv_t")
    ).collect()
    # CH doc example: keys split on ',', ' ' and ';', ':' inside pairs
    got = {k.strip(): v for k, v in row.m.items() if k.strip()}
    assert got == {
        "name": "neymar", "age": "31", "team": "psg", "nick": "mostachudo"
    }
    # custom delimiters
    (row,) = spark.sql(
        translate_ch_sql(
            "SELECT extractKeyValuePairs('a=1|b=2', '=', '|') AS m FROM kv_t"
        )
    ).collect()
    assert dict(row.m) == {"a": "1", "b": "2"}
    # quoting form refuses
    with pytest.raises(ChTranslationError):
        translate_ch_sql(
            "SELECT extractKeyValuePairs(s, ':', ',', '\"') FROM kv_t"
        )
    # non-literal delimiter refuses
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT extractKeyValuePairs(s, d) FROM kv_t")


def test_sample_clause_translation_forms():
    out = translate_ch_sql(
        "SELECT count() FROM t SAMPLE 0.2", sampling_key="event_id"
    )
    assert "substring(md5(CAST(event_id AS STRING)), 1, 8) < '33333333'" in out
    assert "SAMPLE" not in out
    # k/n ratio + OFFSET window
    out = translate_ch_sql(
        "SELECT count() FROM t SAMPLE 1/10 OFFSET 1/2", sampling_key="k"
    )
    assert ">= '80000000'" in out and "< '99999999'" in out
    # SAMPLE 1 keeps everything (predicate degenerates to true)
    out = translate_ch_sql("SELECT count() FROM t SAMPLE 1", sampling_key="k")
    assert "WHERE true" in out


def test_sample_clause_guards():
    with pytest.raises(ChTranslationError):  # no sampling key supplied
        translate_ch_sql("SELECT count() FROM t SAMPLE 0.2")
    with pytest.raises(ChTranslationError):  # row-count form
        translate_ch_sql("SELECT count() FROM t SAMPLE 10000", sampling_key="k")
    with pytest.raises(ChTranslationError):  # fraction out of range
        translate_ch_sql("SELECT count() FROM t SAMPLE 1.5", sampling_key="k")
    with pytest.raises(ChTranslationError):  # FINAL still refuses
        translate_ch_sql("SELECT count() FROM t FINAL", sampling_key="k")
    # literal text containing SAMPLE is data, not a clause
    out = translate_ch_sql("SELECT x FROM t WHERE msg = 'FROM t SAMPLE 0.5'")
    assert "'FROM t SAMPLE 0.5'" in out


def test_sample_clause_nested_subsets(spark):
    """CH contract: SAMPLE 0.1 rows are a subset of SAMPLE 0.2 rows
    (same sampling key) — both are prefixes of one hash order."""
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    load_table(spark, SF_DIR, "events").createOrReplaceTempView(
        "events_sample_nest_t"
    )

    def ids(frac):
        sql = translate_ch_sql(
            f"SELECT event_id FROM events_sample_nest_t SAMPLE {frac}",
            sampling_key="event_id",
        )
        return {r[0] for r in spark.sql(sql).collect()}

    small, big = ids(0.1), ids(0.2)
    assert small and small < big  # proper, non-empty nesting
    # determinism: the same statement re-runs to the same subset
    assert ids(0.1) == small


def test_round4_temporal_and_uniq_rules():
    out = translate_ch_sql(
        "SELECT toStartOfQuarter(ts), toStartOfYear(ts), "
        "toStartOfTenMinutes(ts), toStartOfFiveMinutes(ts), "
        "toStartOfFifteenMinutes(ts) FROM t"
    )
    assert "date_trunc('quarter', ts)" in out
    assert "date_trunc('year', ts)" in out
    assert "/ 600) AS BIGINT) * 600" in out
    assert "/ 300) AS BIGINT) * 300" in out
    assert "/ 900) AS BIGINT) * 900" in out
    out = translate_ch_sql(
        "SELECT uniqCombined(u), uniqCombined64(u), uniqHLL12(u) FROM t"
    )
    assert out.count("approx_count_distinct(u)") == 3
    out = translate_ch_sql("SELECT now(), today(), yesterday() FROM t")
    assert "current_timestamp()" in out
    assert "current_date()" in out
    assert "date_sub(current_date(), 1)" in out
    # 'now' as an identifier / inside a literal is untouched
    out = translate_ch_sql("SELECT now FROM t WHERE msg = 'call now() x'")
    assert "SELECT now FROM" in out and "'call now() x'" in out


def test_round4_median_grouparray_base64_rules():
    out = translate_ch_sql(
        "SELECT median(v), medianExact(v), medianIf(v, v > 0), "
        "medianExactIf(v, v > 0) FROM t"
    )
    assert "percentile_approx(v, 0.5)" in out
    assert "percentile(v, 0.5)" in out
    assert "percentile_approx(CASE WHEN v > 0 THEN v END, 0.5)" in out
    assert "percentile(CASE WHEN v > 0 THEN v END, 0.5)" in out
    out = translate_ch_sql("SELECT groupArray(x), groupArray(3)(x) FROM t")
    assert "collect_list(x), slice(collect_list(x), 1, 3)" in out
    out = translate_ch_sql(
        "SELECT base64Encode(s), base64Decode(e), tryBase64Decode(e) FROM t"
    )
    assert "base64(s)" in out
    assert out.count("CAST(unbase64(e) AS STRING)") == 2


def test_round4_hash_and_topk_guards():
    for bad in [
        "SELECT topK(5)(x) FROM t",
        "SELECT topKWeighted(5)(x, w) FROM t",
        "SELECT cityHash64(s) FROM t",
        "SELECT sipHash64(s) FROM t",
        "SELECT xxHash64(s) FROM t",
        "SELECT halfMD5(s) FROM t",
    ]:
        with pytest.raises(ChTranslationError):
            translate_ch_sql(bad)
    # all of the above inside a literal are data, not code
    out = translate_ch_sql(
        "SELECT x FROM t WHERE m = 'median(v) topK(5)(x) cityHash64(s)'"
    )
    assert "'median(v) topK(5)(x) cityHash64(s)'" in out


def test_round5_fold_reduce_bit_interval_rules():
    out = translate_ch_sql(
        "SELECT arrayFold((acc, x) -> acc + x, arr, CAST(0 AS BIGINT)) FROM t"
    )
    assert "aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x)" in out
    out = translate_ch_sql(
        "SELECT arrayReduce('sum', arr), arrayReduce('min', arr), "
        "arrayReduce('count', arr), arrayReduce('avg', arr) FROM t"
    )
    assert "array_min(arr)" in out and "size(arr)" in out
    assert "acc + CAST(x AS DOUBLE)" in out
    out = translate_ch_sql(
        "SELECT groupBitAnd(x), groupBitOr(x), groupBitXor(x) FROM t"
    )
    assert "bit_and(x), bit_or(x), bit_xor(x)" in out
    out = translate_ch_sql(
        "SELECT quantileTDigest(0.9)(v), quantileBFloat16(0.5)(v), "
        "quantileDeterministic(0.5)(v), quantileTDigestIf(0.5)(v, v > 0) FROM t"
    )
    assert out.count("percentile_approx") == 4
    out = translate_ch_sql("SELECT addDays(ts, 3), subtractHours(ts, 2) FROM t")
    assert "(ts + make_interval(0, 0, 0, 3, 0, 0, 0))" in out
    assert "(ts - make_interval(0, 0, 0, 0, 2, 0, 0))" in out


def test_round5_order_dependent_guards():
    for bad in [
        "SELECT deltaSum(v) FROM t",
        "SELECT deltaSumTimestamp(v, ts) FROM t",
        "SELECT runningDifference(v) FROM t",
        "SELECT runningAccumulate(st) FROM t",
        "SELECT arrayReduce('median', arr) FROM t",
    ]:
        with pytest.raises(ChTranslationError):
            translate_ch_sql(bad)
    out = translate_ch_sql("SELECT x FROM t WHERE m = 'deltaSum(v) now'")
    assert "'deltaSum(v) now'" in out


def test_round6_array_and_misc_rules():
    out = translate_ch_sql("SELECT hasAll(a, b), hasAny(a, b) FROM t")
    assert "forall(b, _x -> array_contains(a, _x))" in out
    assert "arrays_overlap(a, b)" in out
    out = translate_ch_sql(
        "SELECT arrayPushBack(a, 1), arrayPopFront(a), arrayReverse(a), "
        "arrayCompact(a) FROM t"
    )
    assert "concat(a, array(1))" in out
    assert "slice(a, 2, greatest(size(a) - 1, 0))" in out
    assert "reverse(a)" in out
    assert "_x IS DISTINCT FROM element_at(a, _i)" in out
    out = translate_ch_sql("SELECT bitNot(x), toTypeName(x) FROM t")
    assert "(~(x))" in out and "typeof(x)" in out
    out = translate_ch_sql("SELECT formatReadableSize(x) FROM t")
    assert "' KiB'" in out and "' PiB'" in out and "' B'" in out
    # CH's value-mapping transform -> CASE chain; 3-arg form defaults
    # to the input itself
    out = translate_ch_sql("SELECT transform(x, [1,2], ['a','b'], 'z') FROM t")
    assert "CASE WHEN x = 1 THEN 'a' WHEN x = 2 THEN 'b' ELSE 'z' END" in out
    out = translate_ch_sql("SELECT transform(x, [1], ['a']) FROM t")
    assert "ELSE x END" in out
    # arrayMap (later in the pipeline) still emits Spark's higher-order
    # transform untouched by the mapping rule
    out = translate_ch_sql("SELECT arrayMap(v -> v * 2, a) FROM t")
    assert "transform(a, v -> v * 2)" in out


def test_round6_guards():
    for bad in [
        "SELECT intHash32(x) FROM t",
        "SELECT intHash64(x) FROM t",
        "SELECT greatCircleDistance(1.0, 2.0, 3.0, 4.0) FROM t",
        "SELECT transform(x, a, b, 'z') FROM t",  # non-literal arrays
        "SELECT transform(x, [1,2], ['a'], 'z') FROM t",  # length skew
    ]:
        with pytest.raises(ChTranslationError):
            translate_ch_sql(bad)


def test_round6_ipv4_rules(spark):
    out = translate_ch_sql("SELECT IPv4NumToString(n) FROM t")
    assert "DIV 16777216" in out
    out = translate_ch_sql(
        "SELECT isIPAddressInRange(ip, '10.1.0.0/16') FROM t"
    )
    assert "DIV 65536 = " in out
    out = translate_ch_sql("SELECT IPv4CIDRToRange(n, 24) FROM t")
    assert "array((n DIV 256) * 256, (n DIV 256) * 256 + 255)" in out
    with pytest.raises(ChTranslationError):  # non-literal cidr
        translate_ch_sql("SELECT isIPAddressInRange(ip, c) FROM t")
    with pytest.raises(ChTranslationError):  # v6 form
        translate_ch_sql("SELECT isIPAddressInRange(ip, '::1/64') FROM t")
    # executed round trip: string -> num -> string is identity, and
    # range membership agrees with the div arithmetic
    row = spark.sql(
        translate_ch_sql(
            "SELECT IPv4NumToString(IPv4StringToNum('10.1.2.3')) AS rt, "
            "isIPAddressInRange('10.1.2.3', '10.1.0.0/16') AS yes, "
            "isIPAddressInRange('10.2.2.3', '10.1.0.0/16') AS no, "
            "IPv4CIDRToRange(IPv4StringToNum('10.1.2.3'), 24) AS rng"
        )
    ).collect()[0]
    assert row["rt"] == "10.1.2.3"
    assert row["yes"] is True and row["no"] is False
    assert row["rng"] == [167838208, 167838463]


def test_round6_weighted_and_paired_aggregates(spark):
    out = translate_ch_sql("SELECT sumCount(x), anyHeavy(x), uniqTheta(x) FROM t")
    assert "named_struct('sum', sum(x), 'count', count(x))" in out
    assert "mode(x)" in out
    assert "approx_count_distinct(x)" in out
    # executed: weighted mean of a known tiny frame
    spark.createDataFrame(
        [(1.0, 1), (3.0, 3)], "x DOUBLE, w INT"
    ).createOrReplaceTempView("aw_t")
    row = spark.sql(
        translate_ch_sql(
            "SELECT avgWeighted(x, w) AS aw, sumCount(x) AS sc, "
            "anyHeavy(CAST(w AS STRING)) AS h FROM aw_t"
        )
    ).collect()[0]
    assert abs(row["aw"] - 2.5) < 1e-12
    assert row["sc"]["sum"] == 4.0 and row["sc"]["count"] == 2
    assert row["h"] in ("1", "3")


def test_selfreview_r9_fixes(spark):
    """Regression pins for the round-9 self-review findings:
    qualified-table SAMPLE aliasing, zero-denominator ratio, CIDR
    bounds, and comma-free formatReadableSize."""
    # SAMPLE on db.table: the subquery alias must be the simple name
    out = translate_ch_sql(
        "SELECT count() FROM db.events SAMPLE 0.2", sampling_key="k"
    )
    assert ") events" in out and ") db.events" not in out
    with pytest.raises(ChTranslationError):  # zero denominator
        translate_ch_sql("SELECT count() FROM t SAMPLE 1/0", sampling_key="k")
    with pytest.raises(ChTranslationError):  # prefix out of range
        translate_ch_sql("SELECT IPv4CIDRToRange(n, 40) FROM t")
    with pytest.raises(ChTranslationError):  # octet out of range
        translate_ch_sql(
            "SELECT isIPAddressInRange(ip, '300.1.0.0/16') FROM t"
        )
    # formatReadableSize: no thousands separator, CH-style value
    row = spark.sql(
        translate_ch_sql(
            "SELECT formatReadableSize(1048000) AS a, "
            "formatReadableSize(1152921504606846976) AS b, "
            "formatReadableSize(512) AS c"
        )
    ).collect()[0]
    assert row["a"] == "1023.44 KiB", row["a"]
    assert row["b"] == "1.00 EiB", row["b"]
    assert row["c"] == "512.00 B", row["c"]


def test_sq8_top1_survives_rank_disagreement(spark):
    """q434 contract: adc_top1/exact_top1 are computed over ALL ranked
    rows, so a top-1 outside the other ranking's top-10 still appears."""
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    rows = QUERIES["q434_sq8_ann"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["adc_top1"] is not None and r["exact_top1"] is not None


def test_to_monday_and_count_equal(spark):
    out = translate_ch_sql("SELECT toMonday(ts), countEqual(arr, 3) FROM t")
    assert "date_sub(to_date(ts), (dayofweek(to_date(ts)) + 5) % 7)" in out
    assert "size(filter(arr, _x -> _x <=> 3))" in out
    row = spark.sql(
        translate_ch_sql(
            "SELECT toMonday(toDate('2024-01-07')) AS sun, "  # a Sunday
            "toMonday(toDate('2024-01-08')) AS mon, "          # a Monday
            "countEqual([1, 3, 3, NULL], 3) AS c"
        )
    ).collect()[0]
    import datetime

    assert row["sun"] == datetime.date(2024, 1, 1)  # prev Monday
    assert row["mon"] == datetime.date(2024, 1, 8)  # itself
    assert row["c"] == 2


def test_operator_aggregate_guards_point_at_implementations():
    for bad, hint in [
        # round 11: windowFunnel TRANSLATES for literal windows in the
        # default / strict_increase modes — only the other modes and
        # non-literal windows still point at the operator queries
        ("SELECT windowFunnel(3600, 'strict_order')(ts, a, b) FROM t",
         "funnel"),
        ("SELECT windowFunnel(w)(ts, a, b) FROM t", "funnel"),
        # round 11: sequenceMatch TRANSLATES for literal supported
        # patterns (see test_advice_r11) — only unsupported shapes
        # still point at the operator queries
        ("SELECT sequenceMatch('(?1)(?t<5).*(?2)')(ts, a, b) FROM t",
         "sequence"),
        # round 12: adjacency sequenceCount of any length <= 8
        # translates (bitset NFA); only mixed .*/adjacency and >8-step
        # patterns still refuse
        ("SELECT sequenceCount('(?1)(?2).*(?1)')(ts, a, b) FROM t",
         "q207"),
        # round 11: uniqUpTo translates (exact value contract) — only
        # the non-literal parameter shape refuses
        ("SELECT uniqUpTo(n)(x) FROM t", "literal integer"),
        ("SELECT histogram(10)(x) FROM t", "histogram"),
        ("SELECT sumMap(k, v) FROM t", "q332"),
    ]:
        with pytest.raises(ChTranslationError) as ei:
            translate_ch_sql(bad)
        assert hint in str(ei.value)
    # the names inside literals remain data
    out = translate_ch_sql("SELECT x FROM t WHERE m = 'retention(a) sumMap'")
    assert "'retention(a) sumMap'" in out
