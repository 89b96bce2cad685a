"""CH-dialect fuzz differential: randomized CH statements run on Spark
THROUGH translate_ch_sql while an independently-derived DuckDB
statement (same semantics, no shared rewrite code) runs on the same
events fixture.  Every iteration draws fresh constants — sample
fractions, moduli, slice caps, temporal grains — so each run explores
new parameter space; failures print the seed and both SQL texts."""

from __future__ import annotations

import math
import os
import random

import pytest

from conftest import SF_DIR
from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
    translate_ch_sql,
)


def _pair_sample(rng):
    k = rng.randint(1, 999)
    frac = f"0.{k:03d}"
    ch = (
        f"SELECT event_type, count() AS n, sum(user_id % 97) AS s "
        f"FROM events_fz SAMPLE {frac} GROUP BY event_type"
    )
    hi = int(float(frac) * 16**8)
    duck = (
        f"SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(user_id % 97) AS BIGINT) AS s FROM events "
        f"WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 8) "
        f"< '{hi:08x}' GROUP BY event_type"
    )
    return ch, duck, "event_id"


def _pair_median(rng):
    m = rng.choice([11, 97, 503, 1000])
    ch = (
        f"SELECT event_type, medianExact(user_id % {m}) AS med, "
        f"count() AS n FROM events_fz GROUP BY event_type"
    )
    duck = (
        f"SELECT event_type, quantile_cont(user_id % {m}, 0.5) AS med, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type"
    )
    return ch, duck, None


def _pair_group_array(rng):
    cap = rng.randint(1, 8)
    m = rng.choice([7, 13, 101])
    ch = (
        f"SELECT event_type, "
        f"arraySlice(arraySort(groupArray(event_id % {m})), 1, {cap}) AS a "
        f"FROM events_fz GROUP BY event_type"
    )
    duck = (
        f"SELECT event_type, "
        f"list_slice(list_sort(list(event_id % {m})), 1, {cap}) AS a "
        f"FROM events GROUP BY event_type"
    )
    return ch, duck, None


def _pair_temporal(rng):
    fn, secs = rng.choice(
        [
            ("toStartOfFiveMinutes", 300),
            ("toStartOfTenMinutes", 600),
            ("toStartOfFifteenMinutes", 900),
            ("timeSlot", 1800),
        ]
    )
    ch = (
        f"SELECT {fn}(ts) AS b, count() AS n "
        f"FROM events_fz GROUP BY b"
    )
    duck = (
        f"SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / {secs}) AS BIGINT)"
        f" * {secs}) AS TIMESTAMP) AS b, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM events GROUP BY b"
    )
    return ch, duck, None


_PAIRS = [_pair_sample, _pair_median, _pair_group_array, _pair_temporal]


def _norm(df):
    df = df[sorted(df.columns)]
    out = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, float):
                row.append(round(v, 9))
            elif hasattr(v, "tolist"):
                row.append(tuple(v.tolist()))
            elif isinstance(v, list):
                row.append(tuple(v))
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def test_ch_dialect_fuzz_differential(spark, duck):
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events_fz")
    seed_env = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
    seed = int(seed_env) if seed_env else int.from_bytes(os.urandom(6), "big")
    rng = random.Random(seed)
    n = int(os.environ.get("SPARK_GRAFT_CH_FUZZ_N", "40"))
    failures = []
    for i in range(n):
        ch, ducksql, key = rng.choice(_PAIRS)(rng)
        translated = translate_ch_sql(ch, sampling_key=key)
        sdf = spark.sql(translated).toPandas()
        odf = duck.execute(ducksql).df()
        s_rows, o_rows = _norm(sdf), _norm(odf)
        if s_rows != o_rows:
            failures.append((i, ch, translated, ducksql))
    assert not failures, f"seed={seed} first={failures[0]}"


def _pair_array_family(rng):
    m1, m2 = rng.choice([5, 7, 11]), rng.choice([3, 13])
    cap = rng.randint(1, 3)
    ch = (
        f"SELECT event_type, "
        f"sum(arrayReduce('max', [user_id % {m1}, event_id % {m2}])) AS rmax, "
        f"sum(arrayReduce('count', arrayPushBack([user_id % {m1}], 9))) AS np, "
        f"sum(multiIf(hasAny([user_id % {m1}, event_id % {m2}], "
        f"[{cap}]), 1, 0)) AS ha "
        f"FROM events_fz GROUP BY event_type"
    )
    duck = (
        f"SELECT event_type, "
        f"CAST(SUM(GREATEST(user_id % {m1}, event_id % {m2})) AS BIGINT) AS rmax, "
        f"CAST(SUM(2) AS BIGINT) AS np, "
        f"CAST(SUM(CASE WHEN user_id % {m1} = {cap} OR event_id % {m2} = {cap} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS ha "
        f"FROM events GROUP BY event_type"
    )
    return ch, duck, None


def _pair_interval_fold(rng):
    nd = rng.randint(1, 30)
    nh = rng.randint(1, 23)
    m = rng.choice([5, 9])
    ch = (
        f"SELECT event_type, min(addDays(ts, {nd})) AS d, "
        f"max(subtractHours(ts, {nh})) AS h, "
        f"sum(arrayFold((acc, x) -> acc + x, [user_id % {m}, 2], "
        f"CAST(0 AS BIGINT))) AS f "
        f"FROM events_fz GROUP BY event_type"
    )
    duck = (
        f"SELECT event_type, MIN(ts + INTERVAL {nd} DAY) AS d, "
        f"MAX(ts - INTERVAL {nh} HOUR) AS h, "
        f"CAST(SUM(user_id % {m} + 2) AS BIGINT) AS f "
        f"FROM events GROUP BY event_type"
    )
    return ch, duck, None


_PAIRS.extend([_pair_array_family, _pair_interval_fold])


def _pair_param_quantile(rng):
    # round-11: parameterized-aggregate shapes through the escape-aware
    # _rewrite_param_calls lexer — the ARGUMENT deliberately contains
    # nested parens + commas (the shape the old [^()]* regexes broke on)
    q = rng.choice(["0.1", "0.25", "0.5", "0.75", "0.9"])
    m = rng.choice([97, 211, 499])
    t = rng.randint(0, 50)
    ch = (
        f"SELECT event_type, "
        f"round(quantileExact({q})(if(user_id > {t}, user_id % {m}, 0)), 4)"
        f" AS p, "
        f"round(arrayElement(quantilesExact(0.2, {q})(event_id % {m}), 2), 4)"
        f" AS p2, count() AS n "
        f"FROM events_fz GROUP BY event_type"
    )
    duck = (
        f"SELECT event_type, "
        f"round(quantile_cont(CASE WHEN user_id > {t} THEN user_id % {m} "
        f"ELSE 0 END, {q}), 4) AS p, "
        f"round(quantile_cont(event_id % {m}, {q}), 4) AS p2, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM events GROUP BY event_type"
    )
    return ch, duck, None


def _pair_sequence_match(rng):
    # round-11: sequenceMatch adjacency + time bound compiled to a
    # sorted-collect_list exists() — oracle replays it with a
    # lead()-window whose ORDER BY mirrors the struct sort (tsec, then
    # the two match booleans false<true, identical in both engines).
    bound = rng.choice([600, 1800, 3600, 7200, 14400])
    a, b = rng.choice(
        [("signup", "purchase"), ("click", "purchase"), ("view", "error")]
    )
    ch = (
        f"SELECT sum(if(m, 1, 0)) AS n_matched FROM ("
        f"SELECT user_id, sequenceMatch('(?1)(?t<={bound})(?2)')(ts, "
        f"event_type = '{a}', event_type = '{b}') AS m "
        f"FROM events_fz WHERE user_id IS NOT NULL GROUP BY user_id)"
    )
    duck = f"""
    WITH fe AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             (event_type = '{a}') AS m1, (event_type = '{b}') AS m2
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('{a}', '{b}')
    ), nx AS (
      SELECT user_id, tsec, m1,
             lead(m2) OVER (PARTITION BY user_id
                            ORDER BY tsec, m1, m2) AS nm2,
             lead(tsec) OVER (PARTITION BY user_id
                              ORDER BY tsec, m1, m2) AS ntsec
      FROM fe
    ), per_user AS (
      SELECT user_id,
             BOOL_OR(m1 AND nm2 AND ntsec - tsec <= {bound}) AS m
      FROM nx GROUP BY user_id
    )
    SELECT CAST(COALESCE(SUM(CASE WHEN m THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_matched
    FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL) u
    LEFT JOIN per_user USING (user_id)
    """
    return ch, duck, None


_PAIRS.extend([_pair_param_quantile, _pair_sequence_match])


def _pair_sequence_count(rng):
    # round-11: sequenceCount adjacency(+bound) fold — DISJOINT
    # conditions make the lead()-window pair count exact (counted pairs
    # cannot share an event), mirroring the q450 oracle argument.
    bound = rng.choice([600, 3600, 14400, 86400])
    a, b = rng.choice(
        [("click", "purchase"), ("signup", "purchase"), ("view", "error")]
    )
    ch = (
        f"SELECT sum(n) AS total FROM ("
        f"SELECT user_id, sequenceCount('(?1)(?t<={bound})(?2)')(ts, "
        f"event_type = '{a}', event_type = '{b}') AS n "
        f"FROM events_fz WHERE user_id IS NOT NULL GROUP BY user_id)"
    )
    duck = f"""
    WITH fe AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             (event_type = '{a}') AS m1, (event_type = '{b}') AS m2
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('{a}', '{b}')
    ), nx AS (
      SELECT user_id, tsec, m1,
             lead(m2) OVER (PARTITION BY user_id
                            ORDER BY tsec, m1, m2) AS nm2,
             lead(tsec) OVER (PARTITION BY user_id
                              ORDER BY tsec, m1, m2) AS ntsec
      FROM fe)
    SELECT CAST(COALESCE(SUM(CASE WHEN m1 AND nm2 AND ntsec - tsec
                <= {bound} THEN 1 ELSE 0 END), 0) AS BIGINT) AS total
    FROM nx
    """
    return ch, duck, None


def _pair_sequence_count_3step(rng):
    # round-12: >= 3-step adjacency sequenceCount (bitset-NFA fold) —
    # THREE pairwise-disjoint conditions make the lead()/lead(,2)
    # triple count exact: two valid triples can never share an event
    # (it would have to satisfy two disjoint conditions), so non-overlap
    # is structural and count-all equals the greedy restart count.
    a, b, c = rng.choice(
        [("signup", "click", "purchase"), ("view", "click", "error"),
         ("signup", "view", "purchase")]
    )
    b1 = rng.choice([None, 3600, 86400])
    b2 = rng.choice([None, 3600, 86400])
    gap1 = f"(?t<={b1})" if b1 else ""
    gap2 = f"(?t<={b2})" if b2 else ""
    ch = (
        f"SELECT sum(n) AS total FROM ("
        f"SELECT user_id, sequenceCount('(?1){gap1}(?2){gap2}(?3)')(ts, "
        f"event_type = '{a}', event_type = '{b}', event_type = '{c}') "
        f"AS n FROM events_fz WHERE user_id IS NOT NULL GROUP BY user_id)"
    )
    cond1 = f" AND ntsec - tsec <= {b1}" if b1 else ""
    cond2 = f" AND nntsec - ntsec <= {b2}" if b2 else ""
    duck = f"""
    WITH fe AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             (event_type = '{a}') AS m1, (event_type = '{b}') AS m2,
             (event_type = '{c}') AS m3
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('{a}', '{b}', '{c}')
    ), nx AS (
      SELECT user_id, tsec, m1,
             lead(m2) OVER (PARTITION BY user_id
                            ORDER BY tsec, m1, m2, m3) AS nm2,
             lead(tsec) OVER (PARTITION BY user_id
                              ORDER BY tsec, m1, m2, m3) AS ntsec,
             lead(m3, 2) OVER (PARTITION BY user_id
                               ORDER BY tsec, m1, m2, m3) AS nnm3,
             lead(tsec, 2) OVER (PARTITION BY user_id
                                 ORDER BY tsec, m1, m2, m3) AS nntsec
      FROM fe)
    SELECT CAST(COALESCE(SUM(CASE WHEN m1 AND nm2 AND nnm3{cond1}{cond2}
                THEN 1 ELSE 0 END), 0) AS BIGINT) AS total
    FROM nx
    """
    return ch, duck, None


_PAIRS.extend([_pair_sequence_count, _pair_sequence_count_3step])


def _pair_window_funnel(rng):
    # round-11: 2-step windowFunnel — level 2 iff ANY start converts
    # within the window (max over starts), level 1 iff any start at
    # all.  Oracle replays it with an exists-pair join, no folds.
    w = rng.choice([600, 3600, 14400, 86400])
    a, b = rng.choice(
        [("view", "click"), ("click", "purchase"), ("signup", "error")]
    )
    ch = (
        f"SELECT sum(lvl) AS s, count() AS n FROM ("
        f"SELECT user_id, windowFunnel({w})(ts, event_type = '{a}', "
        f"event_type = '{b}') AS lvl "
        f"FROM events_fz WHERE user_id IS NOT NULL GROUP BY user_id)"
    )
    duck = f"""
    WITH fe AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('{a}', '{b}')
    ), pu AS (
      SELECT u.user_id,
             MAX(CASE WHEN y.user_id IS NOT NULL THEN 2
                      WHEN x.user_id IS NOT NULL THEN 1
                      ELSE 0 END) AS lvl
      FROM (SELECT DISTINCT user_id FROM events
            WHERE user_id IS NOT NULL) u
      LEFT JOIN (SELECT DISTINCT user_id FROM fe
                 WHERE event_type = '{a}') x USING (user_id)
      LEFT JOIN (SELECT DISTINCT s.user_id
                 FROM fe s JOIN fe t
                   ON t.user_id = s.user_id AND s.event_type = '{a}'
                  AND t.event_type = '{b}' AND t.tsec > s.tsec
                  AND t.tsec <= s.tsec + {w}) y USING (user_id)
      GROUP BY u.user_id
    )
    SELECT CAST(SUM(lvl) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
    FROM pu
    """
    return ch, duck, None


_PAIRS.extend([_pair_window_funnel])


def _pair_uniq_up_to(rng):
    # round-11: uniqUpTo's value contract is exact — least(distinct, N+1)
    n = rng.randint(1, 40)
    m = rng.choice([7, 29, 97, 503])
    ch = (
        f"SELECT event_type, uniqUpTo({n})(user_id % {m}) AS u, "
        f"count() AS c FROM events_fz GROUP BY event_type"
    )
    duck = (
        f"SELECT event_type, "
        f"LEAST(COUNT(DISTINCT user_id % {m}), {n + 1}) AS u, "
        f"CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY event_type"
    )
    return ch, duck, None


_PAIRS.extend([_pair_uniq_up_to])
