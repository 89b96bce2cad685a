"""Quality-filter operators (functions/text.py:gopher_rules + the q431
C4 line pipeline): boundary-exact behavior on a hand-built hostile
corpus, cross-checked against a plain-Python reference implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.functions.text import gopher_rules


def _py_gopher(t: str, min_words=30, max_words=100000) -> dict[str, bool]:
    ws = t.split(" ")
    n = len(ws)
    wl = sum(len(w) for w in ws)
    hc = t.count("#")
    non_alpha = hc // 2
    pad = f" {t} "
    return {
        "r_word_count": min_words <= n <= max_words,
        "r_mean_word_len": 3 * n <= wl <= 10 * n,
        "r_symbol_ratio": 10 * hc < n,
        "r_alpha_words": 10 * (n - non_alpha) >= 8 * n,
        "r_stop_words": " the " in pad and " a " in pad,
    }


def test_gopher_rules_match_python_reference_on_boundaries(spark):
    docs = [
        " ".join(["word"] * 29),                    # one under the floor
        " ".join(["word"] * 30),                    # exactly at the floor
        " ".join(["ab"] * 40),                      # mean len 2 (< 3)
        " ".join(["abc"] * 40),                     # mean len exactly 3
        " ".join(["abcdefghij"] * 40),              # mean len exactly 10
        " ".join(["abcdefghijk"] * 40),             # mean len 11 (> 10)
        " ".join(["the", "a"] + ["word"] * 38),     # both stop words
        " ".join(["the"] + ["word"] * 39),          # only one stop word
        " ".join(["word"] * 39 + ["##"]),           # 1 symbol token / 40
        " ".join(["word"] * 4 + ["##"] * 4),        # symbol-heavy
        " ".join(["##"] * 10),                      # all-symbol
        "the a " + " ".join(["word"] * 98),         # clean pass
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "i INT, t STRING")
    rules = gopher_rules(F.col("t"))
    got = {
        r["i"]: {k: bool(r[k]) for k in rules}
        for r in df.select("i", *[c.alias(n) for n, c in rules.items()])
        .collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == _py_gopher(t), (i, t, got[i], _py_gopher(t))


def test_gopher_rules_are_row_local(spark):
    """Composing the full rule matrix adds zero exchanges: it must plan
    as a bare projection over the scan."""
    from syslog_handler_with_clickhouse_spark.plans.explain import (
        formatted_plan,
    )

    df = spark.createDataFrame([("x y z",)], "t STRING")
    rules = gopher_rules(F.col("t"))
    plan = formatted_plan(df.select(*[c.alias(n) for n, c in rules.items()]))
    assert "Exchange" not in plan, plan


def test_c4_line_rules_python_reference(spark):
    """q431's kept-line arithmetic on one crafted document: 21 words ->
    3 lines of 7; the Python reference applies C4's rules (terminal
    '.', >= 5 words, no policy token) to the same shred."""
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    # doc_id 0: %11 == 0 injects 'javascript' on line 0 and %4 == 0
    # withholds the '.' from line 0 — line 0 fails twice over; lines
    # 1, 2 get '.' appended and pass; doc has only 2 kept lines -> doc
    # dropped (needs >= 3).
    words = ["w%d" % i for i in range(21)]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, " ".join(words), "en", "src", len(" ".join(words)))],
            "doc_id BIGINT, text STRING, lang STRING, source STRING, "
            "n_chars BIGINT",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["source"]: r.asDict()
            for r in QUERIES["q431_c4_line_filters"](spark, d).collect()
        }
    assert out["src"]["docs_total"] == 1
    assert out["src"]["lines_total"] == 3
    assert out["src"]["lines_kept"] == 2
    assert out["src"]["docs_kept"] == 0  # 2 kept lines < 3 minimum
    assert out["src"]["words_kept"] == 0  # dropped docs contribute none


def test_luhn_fold_on_canonical_test_numbers(spark):
    """The q435 Luhn fold against the classic card test vectors:
    4111111111111111 / 5500005555555559 validate; one-digit
    corruptions do not."""
    luhn_ok = """aggregate(transform(sequence(0, 15), i ->
         CASE WHEN i % 2 = 1
              THEN CASE WHEN 2 * CAST(substring(reverse(s), i + 1, 1)
                                      AS BIGINT) > 9
                   THEN 2 * CAST(substring(reverse(s), i + 1, 1)
                                 AS BIGINT) - 9
                   ELSE 2 * CAST(substring(reverse(s), i + 1, 1)
                                 AS BIGINT) END
              ELSE CAST(substring(reverse(s), i + 1, 1) AS BIGINT)
         END),
       CAST(0 AS BIGINT), (acc, x) -> acc + x) % 10 = 0"""
    rows = spark.createDataFrame(
        [("4111111111111111", True), ("4111111111111112", False),
         ("5500005555555559", True), ("5500005555555558", False),
         ("0000000000000000", True)],
        "s STRING, expect BOOLEAN",
    ).selectExpr(f"({luhn_ok}) AS got", "expect").collect()
    for r in rows:
        assert r["got"] == r["expect"], r


def test_shred_lines_reconstructs_text(spark):
    """Property of the shared shred kernel (q431/q433/scale bench):
    joining each document's lines in line_id order with single spaces
    reconstructs the original text exactly — no word lost, reordered,
    or duplicated by the posexplode/rebuild round trip."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.functions.text import (
        shred_lines,
    )
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )
    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    rebuilt = (
        shred_lines(docs)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    bad = (
        docs.join(rebuilt, "doc_id")
        .filter(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert bad == 0
