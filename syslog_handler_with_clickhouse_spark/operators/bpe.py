"""Byte-pair-encoding merge training (Sennrich et al. 2016) — the
tokenizer-training half that q380's WordPiece ENCODER presumes: learn
the merge table itself from the corpus.

Spark-first shape (the q369/q334 loop pattern):

* the corpus collapses once to DISTINCT words with occurrence counts —
  the only document-sized pass; every later round works on the word
  table, which is orders of magnitude smaller than the corpus;
* each round is (1) a pair-count aggregate (explode adjacent symbol
  pairs, word-frequency-weighted, one (l, r)-keyed shuffle), (2) a
  TakeOrdered(1) for the arg-max pair ((cnt DESC, l, r) total order),
  and (3) the merge applied as a BROADCAST of that single row plus a
  higher-order ``aggregate`` fold over each word's symbol array — the
  greedy left-to-right non-overlapping merge, fully native, no Python
  in the loop, no ``collect()``;
* ``localCheckpoint`` truncates lineage each round, so n_merges rounds
  cost n_merges shuffles, not an exponentially deep plan.

The DuckDB oracle replays every round with a DIFFERENT merge
mechanism (double-space sentinel string replace), so the greedy-merge
semantics are cross-checked by two independent implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def words_with_freq(docs: DataFrame) -> DataFrame:
    """Lower-cased alphabetic words with corpus occurrence counts, plus
    the initial character-level symbol array."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.regexp_extract_all("word", F.lit("[a-z]"), 0).alias("sym"),
        )
    )


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent symbol pairs weighted by word frequency."""
    z = words.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("sym"), 1, F.size("sym") - 1).alias("l"),
                F.slice(F.col("sym"), 2, F.size("sym") - 1).alias("r"),
            )
        ).alias("p"),
    )
    return z.groupBy(
        F.col("p.l").alias("l"), F.col("p.r").alias("r")
    ).agg(F.sum("freq").cast("bigint").alias("cnt"))


def _merge_expr():
    """Greedy left-to-right non-overlapping merge of the broadcast
    (l, r) pair inside each symbol array, as one native fold."""
    empty = F.array().cast("array<string>")
    return F.aggregate(
        F.col("sym"),
        F.struct(
            empty.alias("acc"), F.lit(None).cast("string").alias("prev")
        ),
        lambda st, s: F.when(
            st.prev.isNull(), F.struct(st.acc.alias("acc"), s.alias("prev"))
        )
        .when(
            (st.prev == F.col("l")) & (s == F.col("r")),
            F.struct(
                F.concat(
                    st.acc, F.array(F.concat(F.col("l"), F.col("r")))
                ).alias("acc"),
                F.lit(None).cast("string").alias("prev"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(st.acc, F.array(st.prev)).alias("acc"),
                s.alias("prev"),
            )
        ),
        lambda st: F.when(st.prev.isNull(), st.acc).otherwise(
            F.concat(st.acc, F.array(st.prev))
        ),
    )


def bpe_train(docs: DataFrame, n_merges: int) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns one row per round:
    (round, lhs, rhs, pair_count), the merge table in learned order.

    Stops early (fewer rows) if the corpus runs out of pairs."""
    merges, _ = _train(docs, n_merges)
    return merges


def bpe_encoded_words(docs: DataFrame, n_merges: int) -> DataFrame:
    """Train ``n_merges`` merges and return the RESULTING encoded word
    table (word, freq, sym) — each distinct corpus word segmented by
    the learned merge sequence.  Because training itself maintains the
    merged word table round by round, encoding is free: it IS the
    loop's final state (no second pass over anything)."""
    _, words = _train(docs, n_merges)
    return words


def _train(docs: DataFrame, n_merges: int):
    spark: SparkSession = docs.sparkSession
    words = words_with_freq(docs).localCheckpoint(eager=True)
    merges = []
    for rnd in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(words)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        if best.count() == 0:
            break
        merges.append(best.select(F.lit(rnd).alias("round"), "l", "r", "cnt"))
        old = words
        words = (
            words.join(F.broadcast(best.select("l", "r")))
            .select("word", "freq", _merge_expr().alias("sym"))
            .localCheckpoint(eager=True)
        )
        old.unpersist()
    if not merges:
        return (
            spark.createDataFrame(
                [], "round int, lhs string, rhs string, pair_count bigint"
            ),
            words,
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return (
        out.select(
            F.col("round").cast("int").alias("round"),
            F.col("l").alias("lhs"),
            F.col("r").alias("rhs"),
            F.col("cnt").alias("pair_count"),
        ),
        words,
    )
