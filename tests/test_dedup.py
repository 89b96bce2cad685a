"""Unit tests for dedup operators beyond the oracle parity suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different words appear here today"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = dedup.exact_dedup_clusters(_df(spark), "text", "doc_id").collect()
    clusters = {r.keeper_id: r.cnt for r in out}
    assert clusters[0] == 2  # docs 0 and 3
    assert clusters[1] == 1 and clusters[2] == 1


def test_jaccard_finds_near_dup(spark):
    pairs = dedup.jaccard_pairs(_df(spark), "text", "doc_id", n=3, threshold=0.5)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    assert (0, 3) in got and got[(0, 3)] == 1.0   # exact dup
    assert (0, 1) in got and 0.5 <= got[(0, 1)] < 1.0  # near dup
    assert (1, 3) in got
    assert not any(2 in p for p in got)


def test_jaccard_max_df_drops_stop_shingles(spark):
    # every doc shares shingles from doc 0/1/3's common prefix; max_df=2
    # drops shingles present in >2 docs, so the (0,1)/(0,3)/(1,3) overlap
    # shrinks to the rarer shingles only.
    uncapped = dedup.jaccard_pairs(_df(spark), "text", "doc_id", n=3, threshold=0.1)
    capped = dedup.jaccard_pairs(
        _df(spark), "text", "doc_id", n=3, threshold=0.1, max_df=2
    )
    un = {(r.doc_a, r.doc_b): r.inter for r in uncapped.collect()}
    cap = {(r.doc_a, r.doc_b): r.inter for r in capped.collect()}
    # shared-by-all-three shingles removed → intersections strictly smaller
    assert cap.get((0, 1), 0) < un[(0, 1)]


def test_minhash_estimates_jaccard(spark):
    est = dedup.minhash_jaccard_estimate(
        _df(spark), "text", "doc_id", n=3, threshold=0.4
    )
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in est.collect()}
    assert got.get((0, 3)) == 1.0  # identical docs → identical signatures
    assert (0, 1) in got  # near-dup caught by banding
    assert not any(2 in p for p in got)


def test_simhash_identical_docs_same_signature(spark):
    sig = {r.doc: r.simhash for r in
           dedup.simhash(_df(spark), "text", "doc_id").collect()}
    assert sig[0] == sig[3]
    assert sig[0] != sig[2]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "other")],
        "doc_id long, text string",
    )
    out = dedup.fingerprint_dedup(df, "text", "doc_id").collect()
    clusters = {r.keeper_id: r.cnt for r in out}
    assert clusters[0] == 2 and clusters[2] == 1


def test_cluster_assignments_transitive_chain(spark):
    # components: {1,2,3,4} via chain 1-2, 2-3, 3-4 (needs >1 propagation
    # round for 4 to learn label 1) and {10,11}; 99 pairs with nothing.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc: r.cluster for r in dedup.cluster_assignments(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_hll_sketch_rollup_accuracy(spark):
    # union of per-day sketches must estimate total distinct users within
    # HLL error bounds (lgConfigK=12 default → ~1.6% standard error);
    # q79 now carries the tolerance check in-query as a pinned boolean
    from conftest import SF_DIR
    from syslog_handler_with_clickhouse_spark.queries import QUERIES
    from syslog_handler_with_clickhouse_spark.sources.testdata import load_table

    row = QUERIES["q79_hll_sketch_rollup"](spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select("user_id").distinct().count()
    assert row.total_users_exact == exact
    assert row.est_within_5pct is True
    assert row.n_days >= 1


def test_winnowing_substring_guarantee(spark):
    """The winnowing theorem: any shared token run of length >= w+k-1
    (here 6) yields at least one shared fingerprint — even when the
    snippet is buried inside an otherwise unrelated document."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.operators.dedup import (
        winnow_fingerprints,
    )

    quoted = "alpha bravo charlie delta echo foxtrot golf hotel"
    host = (
        "completely different prefix words here "
        + quoted
        + " and unrelated suffix tokens follow after"
    )
    df = spark.createDataFrame(
        [(1, quoted), (2, host), (3, "nothing in common at all whatsoever")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, "text", "doc_id", k=3, w=4)
    by_doc = {
        r.doc: set(x.fp for x in rows)
        for r in fp.select("doc").distinct().collect()
        for rows in [fp.filter(F.col("doc") == r.doc).collect()]
    }
    assert by_doc[1] & by_doc[2], "quoted run must share a fingerprint"
    assert not (by_doc[1] & by_doc.get(3, set()))


def test_winnowing_density_and_short_docs(spark):
    """Selected positions ~2/(w+1) of gram count; docs shorter than one
    window still emit >=1 fingerprint; docs below k words emit none."""
    from syslog_handler_with_clickhouse_spark.operators.dedup import (
        winnow_fingerprints,
    )

    long_text = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, long_text), (2, "just four words here"), (3, "two words")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, "text", "doc_id", k=3, w=4)
    counts = {r[0]: r[1] for r in fp.groupBy("doc").count().collect()}
    # 198 distinct grams, window w=4: density ~2/(w+1) — wide slack
    assert 40 <= counts[1] <= 120, counts
    assert counts[2] >= 1  # 2 grams < w -> one window over all grams
    assert 3 not in counts  # 2 words < k -> no grams at all


def test_simhash_pigeonhole_index_no_false_negatives(spark):
    """The 4x15-bit block index must find EVERY pair within Hamming
    distance 3 — compare against a brute-force all-pairs check on a
    small corpus with planted near-identical docs."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.operators.dedup import simhash

    base = " ".join(f"tok{i}" for i in range(60))
    rows = [(1, base), (2, base + " extra"), (3, base.replace("tok5", "zzz"))]
    rows += [(10 + i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r.doc: r.simhash for r in simhash(df, "text", "doc_id").collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    truth = {
        (a, b)
        for a in sig
        for b in sig
        if a < b and ham(sig[a], sig[b]) <= 3
    }
    assert truth, "fixture must contain at least one near-dup pair"

    blocks = {}
    for doc, s in sig.items():
        for b in range(4):
            blocks.setdefault((b, (s >> (15 * b)) & 0x7FFF), []).append(doc)
    cands = {
        (a, b)
        for docs in blocks.values()
        for a in docs
        for b in docs
        if a < b
    }
    found = {(a, b) for a, b in cands if ham(sig[a], sig[b]) <= 3}
    assert truth <= found  # pigeonhole completeness: no false negatives


def test_dedup_components_transitive_closure(spark):
    """A chain (1,2),(2,3) plus a disjoint pair (10,11): components must
    transitively close the chain even though (1,3) never surfaced as a
    candidate pair, and the min-id member is the canonical keeper."""
    from syslog_handler_with_clickhouse_spark.operators.dedup import (
        dedup_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 7)], "doc_a long, doc_b long"
    )
    got = {r.node: r.comp for r in dedup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_dedup_components_long_path_converges(spark):
    """A 12-node path is the worst diameter case for label propagation:
    the min label must walk the whole chain."""
    from syslog_handler_with_clickhouse_spark.operators.dedup import (
        dedup_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    got = {r.node: r.comp for r in dedup_components(pairs).collect()}
    assert got == {i: 0 for i in range(12)}


def test_pagerank_hand_computed_star(spark):
    """3-node star a->c, b->c (+ c->a to avoid dangling-only sinks):
    one power iteration from uniform 1/3 has closed-form values —
    pins the damping, out-degree division, and no-inlink base case."""
    from syslog_handler_with_clickhouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {r.node: r.pr for r in pagerank(edges, iters=1).collect()}
    base = 0.15 / 3
    assert abs(got[0] - (base + 0.85 * (1 / 3))) < 1e-12       # from c
    assert abs(got[1] - base) < 1e-12                          # no in-links
    assert abs(got[2] - (base + 0.85 * (1 / 3 + 1 / 3))) < 1e-12
    # ranks stay a probability mass when every node has out-links
    edges2 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2)], "src long, dst long"
    )
    total = sum(
        r.pr for r in pagerank(edges2, iters=8).collect()
    )
    assert abs(total - 1.0) < 1e-9


def test_pagerank_convergence_probe(spark):
    """tol-mode: iterate to a fixpoint (cycle graph converges to the
    uniform distribution) and raise on an impossible tolerance cap."""
    import pytest as _pytest

    from syslog_handler_with_clickhouse_spark.operators.graph import pagerank

    # directed 4-cycle: stationary distribution is exactly uniform
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    got = {r.node: r.pr for r in pagerank(edges, tol=1e-10).collect()}
    for v in got.values():
        assert abs(v - 0.25) < 1e-8
    with _pytest.raises(RuntimeError, match="converge"):
        pagerank(edges, tol=0.0, max_iter=2)
