"""Regression pins for the four round-10 ADVICE findings plus the
round-11 directive-1 wiring (parameterized CH aggregates).

1. (low) the tightened -State/-Merge guard required a LOWERCASE char
   before the suffix, so combinators whose base ends in an uppercase
   letter (topKState, quantileGKMerge) slipped through to an opaque
   Spark unresolved-function error.  Now any alphanumeric char
   qualifies, while update_state / DO_MERGE / _State stay accepted.
2. (low) _find_param_call/_rewrite_param_calls shipped dead.  They now
   carry the whole quantile family plus sequenceMatch — pinned here by
   translating shapes the old [^()]* regexes could NOT handle (nested
   parens/commas/literals inside parameters or arguments).
3. (low) bench.py ran q39_minhash_lsh twice (HEADLINE and LLM_TIER) and
   the second run overwrote the first's runs_detail — suites now reuse
   timings for overlapping names (pinned on the bench helper).
4. (low) ANY JOIN's xxhash64(struct(*)) tiebreak rejects MapType at
   analysis (spark.sql.legacy.allowHashOnMapType=false) — pinned as the
   documented-loud behavior, not silently wrong.
"""

import pytest
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
    ChTranslationError,
    translate_ch_sql,
)


# ---------------------------------------------------------------- 1
@pytest.mark.parametrize(
    "frag",
    [
        "topKState(10)(v)",
        "topKMerge(st)",
        "quantileGKState(100, 0.5)(v)",
        "sumState(x)",
        "uniqMerge(st)",
    ],
)
def test_advice1_uppercase_base_combinators_refused(frag):
    with pytest.raises(ChTranslationError, match="State|Merge"):
        translate_ch_sql(f"SELECT {frag} FROM t")


@pytest.mark.parametrize(
    "frag", ["update_state(x)", "DO_MERGE(x)", "device_state(x)"]
)
def test_advice1_user_identifiers_still_pass(frag):
    # not combinators: the guard must NOT fire (the names pass through
    # and would resolve against user functions/columns)
    out = translate_ch_sql(f"SELECT {frag} FROM t")
    assert frag in out


# ---------------------------------------------------------------- 2
def test_advice2_param_quantile_nested_args():
    # nested parens + comma INSIDE the argument — the old regex form
    # [^()]* could not match this call at all
    out = translate_ch_sql(
        "SELECT quantile(0.9)(if(a > (1 + 2), f(x, y), 0)) AS p FROM t"
    )
    assert "percentile_approx(if(a > (1 + 2), f(x, y), 0), 0.9)" in out


def test_advice2_param_quantile_literal_with_paren():
    # a string literal containing parens/commas inside the args
    out = translate_ch_sql(
        "SELECT quantileExact(0.5)(length(concat(s, '(,('))) AS p FROM t"
    )
    assert "percentile(length(concat(s, '(,('))" in out


def test_advice2_bare_shapes_mean_median():
    out = translate_ch_sql("SELECT quantile(x) AS p FROM t")
    assert "percentile_approx(x, 0.5)" in out
    out = translate_ch_sql("SELECT quantileTDigest(x) AS p FROM t")
    assert "percentile_approx(x, 0.5)" in out
    out = translate_ch_sql("SELECT quantileIf(x, c > 0) AS p FROM t")
    assert "percentile_approx(CASE WHEN c > 0 THEN x END, 0.5)" in out


def test_advice2_quantiles_shapes():
    out = translate_ch_sql("SELECT quantilesExact(0.25, 0.75)(x) FROM t")
    assert "percentile(x, array(0.25, 0.75))" in out
    with pytest.raises(ChTranslationError, match="quantiles"):
        translate_ch_sql("SELECT quantiles(x) FROM t")  # no level list


def test_advice2_sequence_match_adjacency_bound(spark):
    out = translate_ch_sql(
        "SELECT u, sequenceMatch('(?1)(?t<=3600)(?2)')(ts, a = 1, b = 2) "
        "AS m FROM t GROUP BY u"
    )
    # sorted stream bound once, pairs scanned with the time bound
    assert "array_sort(collect_list(" in out
    assert out.count("collect_list") == 1
    assert ".t) <= 3600" in out
    # end-to-end on a tiny frame: s->p within bound, p->s (wrong order),
    # s->p outside bound
    df = spark.createDataFrame(
        [
            (1, "s", 100), (1, "p", 200),       # matched
            (2, "p", 100), (2, "s", 200),       # wrong order
            (3, "s", 100), (3, "p", 99999),     # outside bound
            (4, "x", 100),                      # no conditions at all
        ],
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("seq_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, sequenceMatch('(?1)(?t<=3600)(?2)')"
            "(tsec, e = 's', e = 'p') AS m FROM seq_t GROUP BY u"
        )
    ).collect()
    assert {r.u: r.m for r in got} == {1: True, 2: False, 3: False, 4: False}


def test_advice2_sequence_match_subsequence(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1), (1, "x", 2), (1, "b", 3), (1, "a", 4),  # a..b..a
            (2, "a", 1), (2, "b", 2),                             # no 2nd a
            (3, "b", 1), (3, "a", 2), (3, "a", 3),                # b first
        ],
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("seq_sub_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, sequenceMatch('(?1).*(?2).*(?1)')"
            "(tsec, e = 'a', e = 'b') AS m FROM seq_sub_t GROUP BY u"
        )
    ).collect()
    assert {r.u: r.m for r in got} == {1: True, 2: False, 3: False}


@pytest.mark.parametrize(
    "pat",
    [
        "(?1)(?t<=5).*(?2)",  # mixed adjacency/any
        ".*(?1)",  # leading separator
        "(?1).*",  # trailing separator
        "(?1)..(?2)",  # bad token
        "(?1)" * 9,  # too many steps
    ],
)
def test_advice2_sequence_match_refusals(pat):
    with pytest.raises(ChTranslationError):
        translate_ch_sql(
            f"SELECT sequenceMatch('{pat}')(ts, a, b) FROM t GROUP BY u"
        )


def test_advice2_sequence_match_out_of_range_step():
    with pytest.raises(ChTranslationError, match=r"\(\?3\)"):
        translate_ch_sql(
            "SELECT sequenceMatch('(?1)(?3)')(ts, a, b) FROM t GROUP BY u"
        )


def test_advice2_sequence_match_nonliteral_pattern_refused():
    with pytest.raises(ChTranslationError, match="literal"):
        translate_ch_sql(
            "SELECT sequenceMatch(pat_col)(ts, a, b) FROM t GROUP BY u"
        )


# ---------------------------------------------------------------- 3
def test_advice3_bench_suites_reuse_overlap():
    import bench

    assert "q39_minhash_lsh" in bench.HEADLINE
    assert "q39_minhash_lsh" in bench.LLM_TIER
    # the reuse plan: second suite must not re-run names the first timed
    plan = bench._suite_plan(bench.LLM_TIER, set(bench.HEADLINE))
    run, reused = plan
    assert "q39_minhash_lsh" in reused and "q39_minhash_lsh" not in run
    assert "q433_line_dedup" in run


# ---------------------------------------------------------------- 4
def test_advice4_any_join_map_column_fails_loud(spark):
    left = spark.createDataFrame([(1, "a")], "k int, v string")
    right = spark.createDataFrame(
        [(1, {"x": 1})], "k int, attrs map<string,int>"
    )
    left.createOrReplaceTempView("anyl_t")
    right.createOrReplaceTempView("anyr_map_t")
    sql = translate_ch_sql(
        "SELECT * FROM anyl_t ANY LEFT JOIN anyr_map_t USING (k)"
    )
    assert "xxhash64(struct(*))" in sql
    # documented-loud: Spark refuses hashing MapType at ANALYSIS time
    with pytest.raises(Exception, match="(?i)map"):
        spark.sql(sql).collect()


# ------------------------------------------------- sequenceCount (r11)
def test_sequence_count_adjacency_non_overlap(spark):
    # '(?1)(?1)' on 3 consecutive matching events counts ONE chain:
    # the middle event is consumed by the first chain (CH: "starts to
    # search for the next chain after the current chain is matched")
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2), (1, "a", 3), (2, "a", 1), (2, "a", 2),
         (2, "a", 3), (2, "a", 4)],
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("sc_adj_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, sequenceCount('(?1)(?1)')(tsec, e = 'a') AS c "
            "FROM sc_adj_t GROUP BY u"
        )
    ).collect()
    assert {r.u: r.c for r in got} == {1: 1, 2: 2}


def test_sequence_count_adjacency_time_bound(spark):
    df = spark.createDataFrame(
        [(1, "s", 0), (1, "p", 10),      # within bound
         (1, "s", 100), (1, "p", 9999),  # outside bound
         (1, "s", 20000), (1, "p", 20010)],  # within bound
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("sc_tb_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, sequenceCount('(?1)(?t<=100)(?2)')"
            "(tsec, e = 's', e = 'p') AS c FROM sc_tb_t GROUP BY u"
        )
    ).collect()
    assert got[0].c == 2


def test_sequence_count_subsequence_restart_semantics(spark):
    # a a b b: ONE chain — the first completes at b@3 and the search
    # restarts after it (chains are sequential, never interleaved)
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2), (1, "b", 3), (1, "b", 4),
         (2, "a", 1), (2, "b", 2), (2, "a", 3), (2, "b", 4)],
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("sc_sub_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, sequenceCount('(?1).*(?2)')(tsec, e = 'a', "
            "e = 'b') AS c FROM sc_sub_t GROUP BY u"
        )
    ).collect()
    assert {r.u: r.c for r in got} == {1: 1, 2: 2}


def test_sequence_count_single_step_and_refusals(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "a")], "u int, e string"
    )
    df.createOrReplaceTempView("sc_one_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, sequenceCount('(?1)')(u, e = 'a') AS c "
            "FROM sc_one_t GROUP BY u"
        )
    ).collect()
    assert got[0].c == 2
    # round 12: pure adjacency chains of any length <= 8 translate via
    # the bitset NFA — only mixed .*/adjacency still refuses
    with pytest.raises(ChTranslationError, match="q207"):
        translate_ch_sql(
            "SELECT sequenceCount('(?1)(?2).*(?1)')(ts, a, b) FROM t"
        )


def test_sequence_count_3step_adjacency_restart_state(spark):
    """The case a naive single-slot fold gets wrong (why round 11
    refused >= 3-step adjacency): pattern (?1)(?1)(?2) over events
    a a a b — the first a,a prefix FAILS at the third a, but that third
    a is itself the second element of the real match (a@2, a@3, b@4).
    A fold that discards all progress on failure counts 0; the bitset
    NFA keeps the overlapping prefix alive and counts 1."""
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2), (1, "a", 3), (1, "b", 4),
         # group 2: two non-overlapping matches back to back
         (2, "a", 1), (2, "a", 2), (2, "b", 3),
         (2, "a", 4), (2, "a", 5), (2, "b", 6),
         # group 3: completion consumes its events (restart-after-match):
         # a a b  a b -> one match (a@1,a@2,b@3); a@4,b@5 is only 2 steps
         (3, "a", 1), (3, "a", 2), (3, "b", 3), (3, "a", 4), (3, "b", 5)],
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("sc_nfa_t")
    got = {
        r.u: r.c
        for r in spark.sql(
            translate_ch_sql(
                "SELECT u, sequenceCount('(?1)(?1)(?2)')(tsec, e = 'a', "
                "e = 'b') AS c FROM sc_nfa_t GROUP BY u"
            )
        ).collect()
    }
    assert got == {1: 1, 2: 2, 3: 1}


def test_sequence_count_3step_time_bounds(spark):
    """Per-gap bounds on a 3-step adjacency chain: each bound checks
    the gap to the SHARED previous event (all alive prefixes end at the
    same position under adjacency)."""
    df = spark.createDataFrame(
        # (a,b,c) at gaps (2, 10): passes t<=5 on gap1, fails on gap2
        [(1, "a", 0), (1, "b", 2), (1, "c", 12),
         # gaps (2, 3): both pass
         (2, "a", 0), (2, "b", 2), (2, "c", 5)],
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("sc_nfa_b_t")
    got = {
        r.u: r.c
        for r in spark.sql(
            translate_ch_sql(
                "SELECT u, sequenceCount('(?1)(?t<=5)(?2)(?t<=5)(?3)')"
                "(tsec, e = 'a', e = 'b', e = 'c') AS c "
                "FROM sc_nfa_b_t GROUP BY u"
            )
        ).collect()
    }
    assert got == {1: 0, 2: 1}


# ------------------------------------------------- windowFunnel (r11)
def test_window_funnel_semantics(spark):
    """Max depth over ALL starts, per-step strict increase, window
    anchored at the chain's FIRST event, same-second never chains."""
    df = spark.createDataFrame(
        [
            (1, "v", 0), (1, "c", 10), (1, "p", 20),   # full depth 3
            (2, "v", 0), (2, "c", 5000),               # c outside window
            (3, "v", 0), (3, "c", 10), (3, "p", 5000), # p outside -> 2
            (4, "c", 0), (4, "p", 10),                 # no start -> 0
            (5, "v", 0), (5, "v", 4000), (5, "c", 4010),
            (5, "p", 4020),                            # later start -> 3
            (6, "v", 0), (6, "c", 0),                  # same second -> 1
        ],
        "u int, e string, tsec long",
    )
    df.createOrReplaceTempView("wf_r11_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, windowFunnel(3600)(tsec, e = 'v', e = 'c', "
            "e = 'p') AS lvl FROM wf_r11_t GROUP BY u"
        )
    ).collect()
    assert sorted((r.u, r.lvl) for r in got) == [
        (1, 3), (2, 1), (3, 2), (4, 0), (5, 3), (6, 1)
    ]


def test_window_funnel_mode_and_window_refusals():
    with pytest.raises(ChTranslationError, match="funnel"):
        translate_ch_sql(
            "SELECT windowFunnel(10, 'strict_order')(ts, a, b) FROM t"
        )
    with pytest.raises(ChTranslationError, match="literal integer"):
        translate_ch_sql("SELECT windowFunnel(w)(ts, a, b) FROM t")
    # strict_increase coincides with this module's stance -> accepted
    out = translate_ch_sql(
        "SELECT windowFunnel(10, 'strict_increase')(ts, a) AS l FROM t"
    )
    assert "CASE WHEN" in out


# ------------------------------------------------- retention (r11)
def test_retention_is_order_free_and_anchored_on_cond1(spark):
    df = spark.createDataFrame(
        [
            (1, "c"), (1, "p"),            # no cond1 -> all zeros
            (2, "v"), (2, "p"),            # view + purchase, no click
            (3, "p"), (3, "v"),            # order-free: still (1,0,1)
            (4, "v"), (4, "c"), (4, "p"),  # all three
        ],
        "u int, e string",
    )
    df.createOrReplaceTempView("ret_r11_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT u, retention(e = 'v', e = 'c', e = 'p') AS r "
            "FROM ret_r11_t GROUP BY u"
        )
    ).collect()
    assert {r.u: list(r.r) for r in got} == {
        1: [0, 0, 0], 2: [1, 0, 1], 3: [1, 0, 1], 4: [1, 1, 1]
    }
    with pytest.raises(ChTranslationError, match="retention"):
        translate_ch_sql("SELECT retention() FROM t")


# ------------------------------------------------- uniqUpTo (r11)
def test_uniq_up_to_translates_exact_contract(spark):
    df = spark.createDataFrame(
        [(1, v) for v in [1, 2, 3, 4, 5, 5]] + [(2, 7)], "g int, x int"
    )
    df.createOrReplaceTempView("uut_t")
    got = spark.sql(
        translate_ch_sql(
            "SELECT g, uniqUpTo(3)(x) AS u FROM uut_t GROUP BY g"
        )
    ).collect()
    # group 1 has 5 distinct > 3 -> N+1 = 4; group 2 exact 1
    assert {r.g: r.u for r in got} == {1: 4, 2: 1}
    # round 12 (driver advice): the bare form REFUSES — CH's implicit
    # default N is not verifiable from the reference, and a wrong guess
    # silently changes values for counts near it
    with pytest.raises(ChTranslationError, match="explicit N"):
        translate_ch_sql("SELECT uniqUpTo(x) FROM t")
    with pytest.raises(ChTranslationError, match="literal integer"):
        translate_ch_sql("SELECT uniqUpTo(n)(x) FROM t")
