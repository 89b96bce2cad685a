"""Retrieval, corpus-duplication, and graph analytics (round-9 tail:
q394+).

Split rationale mirrors the other family modules: importing this module
registers its queries into the shared QUERIES/ORACLE registry.
"""

from ._common import *  # noqa: F401,F403
from ._common import _DUP_UNION, _lang_case_sql, _t
from ..functions.text import TOKEN_RE


@query(
    "q394_bm25_retrieval",
    """
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, UNNEST(regexp_extract_all(lower(text), '{re}')) AS u(t)
    ), postings AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs,
             (COUNT(*) * 1000) // COUNT(DISTINCT doc_id) AS am
      FROM tok
    ), df AS (
      SELECT token, COUNT(*) AS dfreq FROM postings GROUP BY token
    ), qterms AS (
      SELECT DISTINCT doc_id AS query_id, token FROM tok WHERE doc_id % 50 = 0
    ), term_scores AS (
      SELECT q.query_id, p.doc_id,
             (s.n_docs // d.dfreq)
             * ((22 * p.tf * s.am * 1000000)
                // (10 * p.tf * s.am + 3 * s.am + 9000 * l.dl)) AS term_score
      FROM qterms q
      JOIN df d ON q.token = d.token
      CROSS JOIN stats s
      JOIN postings p ON p.token = q.token
      JOIN dl l ON l.doc_id = p.doc_id
      WHERE d.dfreq * 10 <= s.n_docs * 9 AND p.doc_id <> q.query_id
    ), scores AS (
      SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score
      FROM term_scores GROUP BY query_id, doc_id
    ), ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scores
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score
    FROM ranked WHERE rank <= 5
    """.format(re=TOKEN_RE),
)
def q394(spark, sf_dir):
    """BM25 top-k retrieval (`operators/retrieval.bm25_topk`) — the
    Lucene/Elasticsearch ranking function in EXACT integer arithmetic:
    rational k1=6/5, b=3/4 with cleared denominators give a bigint
    tf-saturation term, and idf uses the q156 integer rarity surrogate
    (N div df) so both engines agree to the last bit.  Query workload:
    every doc_id % 50 == 0 document queries the corpus with its own
    distinct tokens (self-match excluded), stop terms pruned at
    df > 0.9N (the fixture corpus has a 31-token vocabulary with df
    around 0.78N, so the classic 25% stop cap would prune EVERY term;
    on a real corpus the cap parameter moves back down).  Plan: postings/df/dl are token- and doc-keyed
    aggregates, the corpus scalars broadcast, and the match is a
    token-keyed equi-join — never all-pairs; the max_df cap bounds
    posting fan-out at 100 TB exactly like q195's."""
    from ..operators.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_topk(docs, queries_df, k=5, max_df_num=9, max_df_den=10)


@query(
    "q395_dup_ngram_coverage",
    """
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{re}') AS arr
      FROM documents
    ), dd AS (
      SELECT doc_id, arr, CAST(len(arr) AS BIGINT) AS n_tok
      FROM d WHERE len(arr) >= 8
    ), grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p,
             array_to_string(list_slice(arr, i, i + 7), ' ') AS gram
      FROM dd, LATERAL (SELECT unnest(range(1, n_tok - 8 + 2)) AS i) t
    ), gc AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ), hits AS (
      SELECT g.doc_id, g.p,
             g.p - lag(g.p) OVER (PARTITION BY g.doc_id ORDER BY g.p) AS gap
      FROM grams g JOIN gc ON g.gram = gc.gram
    ), cov AS (
      SELECT doc_id, COUNT(*) AS dup_starts,
             CAST(SUM(CASE WHEN gap IS NULL OR gap >= 8 THEN 8
                           ELSE gap END) AS BIGINT) AS dup_cov
      FROM hits GROUP BY doc_id
    )
    SELECT dd.doc_id, dd.n_tok,
           CAST(COALESCE(cov.dup_starts, 0) AS BIGINT) AS dup_starts,
           CAST(COALESCE(cov.dup_cov, 0) AS BIGINT) AS dup_cov,
           (COALESCE(cov.dup_cov, 0) * 1000000) // dd.n_tok AS dup_ppm
    FROM dd LEFT JOIN cov ON dd.doc_id = cov.doc_id
    """.format(re=TOKEN_RE),
)
def q395(spark, sf_dir):
    """Exact-substring duplication coverage (Lee et al. 2022's
    suffix-array dedup measure, `operators/dedup.duplicated_ngram_
    coverage`): per document, how many token positions sit under an
    8-token window that occurs ≥2 times anywhere in the corpus, as an
    exact ppm.  The coverage union is the q333 sweep-line specialized
    to equal-length intervals (Σ min(w, gap)); duplicated windows come
    from one gram-keyed aggregate + join back — the suffix array is
    unnecessary for the coverage statistic, and the gram key hashes to
    128 bits at 100 TB without changing the plan."""
    from ..operators.dedup import duplicated_ngram_coverage

    return duplicated_ngram_coverage(
        _t(spark, sf_dir, "documents"), w=8, min_count=2
    )


@query(
    "q396_triangle_counts",
    """
    WITH raw AS (
      SELECT user_id % 150 AS src, (user_id * 7 + event_id * 3) % 150 AS dst
      FROM events
    ), e AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM raw WHERE src <> dst
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), pern AS (
      SELECT node, COUNT(*) AS tri_cnt
      FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(tri_cnt AS BIGINT) AS tri_cnt
    FROM pern
    """,
)
def q396(spark, sf_dir):
    """Per-node triangle counting (`operators/graph.triangle_counts`) —
    the clustering-coefficient numerator and the third member of the
    graph family (BFS q273, components q334, PageRank q351).  Spark
    side runs the degree-ordered compact-forward join (each triangle
    found once at its (deg,id)-minimal vertex; wedge fan-out bounded by
    oriented out-degree = O(sqrt(m)) — hub-proof at 100 TB); the
    DuckDB oracle counts the SAME triangles by the independent
    id-ordered a<b<c three-way join, so the two derivations cross-check
    each other."""
    from ..operators.graph import triangle_counts

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 150).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id") * 3) % 150).alias("dst"),
    )
    return triangle_counts(ev)


def _bpe_chain(m: int) -> str:
    """Unrolled m-round BPE CTE chain (shared by q398/q402 oracles).
    Merge mechanism is deliberately DIFFERENT from the Spark fold:
    symbols live in a space-joined string, spaces are doubled so each
    boundary owns two, and the pattern ' l  r ' consumes one space from
    each side — giving exactly the greedy left-to-right non-overlapping
    merge ('a a a a' merges twice, 'a a a' once) without regex
    lookarounds."""
    parts = [
        """
    WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
             array_to_string(regexp_extract_all(word, '[a-z]'), ' ') AS sym
      FROM (
        SELECT t AS word
        FROM documents, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS u(t)
      ) GROUP BY word
    )"""
    ]
    for i in range(1, m + 1):
        parts.append(
            f""",
    p{i} AS (
      SELECT sp[j] AS l, sp[j + 1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT string_split(sym, ' ') AS sp, freq FROM w{i - 1}) s,
           LATERAL (SELECT unnest(range(1, len(sp))) AS j) t
      GROUP BY l, r
    ),
    b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
    w{i} AS (
      SELECT word, freq,
        trim(regexp_replace(
          replace(replace(' ' || sym || ' ', ' ', '  '),
                  (SELECT ' ' || l || '  ' || r || ' ' FROM b{i}),
                  (SELECT ' ' || l || r || ' ' FROM b{i})),
          ' +', ' ', 'g')) AS sym
      FROM w{i - 1}
    )"""
        )
    return "".join(parts)


def _bpe_oracle(m: int) -> str:
    finals = [
        f"""
    SELECT {i} AS round, l AS lhs, r AS rhs, cnt AS pair_count FROM b{i}"""
        for i in range(1, m + 1)
    ]
    return (
        _bpe_chain(m)
        + "\n    SELECT CAST(round AS INTEGER) AS round, lhs, rhs, pair_count"
        + " FROM ("
        + "\n    UNION ALL".join(finals)
        + "\n    )"
    )


_BPE_MERGES = 6


@query("q398_bpe_train", _bpe_oracle(_BPE_MERGES))
def q398(spark, sf_dir):
    """BPE merge-table training (`operators/bpe.bpe_train`) — the
    tokenizer-TRAINING loop (Sennrich 2016) completing q380's WordPiece
    encoder: six rounds of (pair-count aggregate → arg-max pair →
    greedy non-overlapping merge), each round one (l,r)-keyed shuffle
    over the DISTINCT-words table plus a broadcast of the single best
    pair, the merge itself a native higher-order fold (no Python, no
    collect).  The oracle replays all six rounds with an independent
    merge mechanism (double-space sentinel replace), so the greedy
    semantics — including the 'aaaa merges twice, aaa once' edge — are
    double-derived.  Output: the learned merge table in order with
    exact weighted pair counts."""
    from ..operators.bpe import bpe_train

    return bpe_train(_t(spark, sf_dir, "documents"), _BPE_MERGES)


def _pca_oracle(iters: int) -> str:
    parts = [
        """
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      FROM embeddings
    ), cell AS (
      SELECT vec_id, CAST(i - 1 AS INTEGER) AS i, q[i] AS val
      FROM qv, LATERAL (SELECT unnest(range(1, 65)) AS i) t
    ), g AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.val * b.val) AS BIGINT) AS m
      FROM cell a JOIN cell b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ), v0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM cell)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
    u{k} AS (
      SELECT g.i, CAST(SUM(g.m * v.v) AS BIGINT) AS u
      FROM g JOIN v{k - 1} v ON g.j = v.i GROUP BY g.i
    ),
    s{k} AS (SELECT MAX(ABS(u)) // 1000 + 1 AS m1000 FROM u{k}),
    v{k} AS (
      SELECT i, CAST(CASE WHEN u < 0 THEN -(ABS(u) // m1000)
                          ELSE ABS(u) // m1000 END AS BIGINT) AS v
      FROM u{k}, s{k}
    )"""
        )
    parts.append(
        f""",
    uf AS (
      SELECT g.i, CAST(SUM(g.m * v.v) AS BIGINT) AS u
      FROM g JOIN v{iters} v ON g.j = v.i GROUP BY g.i
    )
    SELECT v{iters}.i AS dim, v{iters}.v AS v, uf.u AS mv
    FROM v{iters} JOIN uf ON v{iters}.i = uf.i"""
    )
    return "".join(parts)


_PCA_ITERS = 4


@query("q399_pca_power_iteration", _pca_oracle(_PCA_ITERS))
def q399(spark, sf_dir):
    """Top principal direction of the embedding corpus
    (`operators/pca.power_iteration_top_component`): the d×d integer
    Gram matrix in ONE corpus pass (per-vector outer product as a
    native higher-order transform, partially aggregated map-side),
    then four power-iteration rounds touching only the 4096-row Gram
    and the 64-row vector — corpus never revisited, every round
    broadcast-sized.  Exact integer arithmetic throughout (sign-split
    division so trunc-vs-floor can't diverge); the oracle unrolls all
    four rounds plus one extra mat-vec, pinning direction AND image."""
    from ..operators.pca import power_iteration_top_component

    emb = _t(spark, sf_dir, "embeddings")
    return power_iteration_top_component(emb, dim=64, iters=_PCA_ITERS)


@query(
    "q400_holt_linear_forecast",
    """
    WITH RECURSIVE cnt AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) * 1000 AS BIGINT) AS ym
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), seq AS (
      SELECT event_type, ym,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      FROM cnt
    ), mt AS (
      SELECT event_type, MAX(t) AS maxt FROM seq GROUP BY event_type
    ),
    h AS (
      SELECT a.event_type, CAST(1 AS BIGINT) AS t,
             a.ym AS lev, b.ym - a.ym AS tr, CAST(0 AS BIGINT) AS sae
      FROM seq a JOIN seq b
        ON a.event_type = b.event_type AND a.t = 1 AND b.t = 2
      UNION ALL
      SELECT event_type, t, lev,
             CASE WHEN (lev - plev) + tr < 0
                  THEN -((-((lev - plev) + tr)) // 2)
                  ELSE ((lev - plev) + tr) // 2 END AS tr,
             sae
      FROM (
        SELECT h.event_type, h.t + 1 AS t, h.lev AS plev, h.tr AS tr,
               CASE WHEN s.ym + 3 * (h.lev + h.tr) < 0
                    THEN -((-(s.ym + 3 * (h.lev + h.tr))) // 4)
                    ELSE (s.ym + 3 * (h.lev + h.tr)) // 4 END AS lev,
               h.sae + ABS(s.ym - (h.lev + h.tr)) AS sae
        FROM h JOIN seq s
          ON s.event_type = h.event_type AND s.t = h.t + 1
      )
    )
    SELECT h.event_type, CAST(h.t AS BIGINT) AS n_points,
           h.lev AS level_milli, h.tr AS trend_milli,
           h.lev + h.tr AS forecast_milli, h.sae AS sae_milli
    FROM h JOIN mt ON h.event_type = mt.event_type AND h.t = mt.maxt
    """,
)
def q400(spark, sf_dir):
    """Holt linear (double-exponential) smoothing over per-type daily
    event counts (`operators/forecast.holt_linear`): level + trend +
    one-step forecast + cumulative one-step absolute error, all in
    exact milli-integers with α=1/4, β=1/2 and sign-split truncating
    division.  Spark side is the sanctioned stateful-scan shape
    (groupBy + applyInPandas, O(1) state per series, parallel across
    series); the oracle replays the identical recurrence as a
    recursive CTE — the q392 ADPCM verification pattern applied to
    forecasting."""
    from ..operators.forecast import holt_linear

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    return holt_linear(daily, "event_type", "day", "y")


def _bpe_encode_oracle(m: int) -> str:
    return (
        _bpe_chain(m)
        + f"""
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(d.word)) AS BIGINT) AS n_chars,
           CAST(SUM(len(string_split(w.sym, ' '))) AS BIGINT) AS n_bpe_tokens,
           CAST((CAST(SUM(len(string_split(w.sym, ' '))) AS BIGINT) * 1000000)
                // CAST(SUM(length(d.word)) AS BIGINT)
                AS BIGINT) AS tokens_per_char_ppm
    FROM (
      SELECT source, t AS word
      FROM documents, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS u(t)
    ) d JOIN w{m} w ON d.word = w.word
    GROUP BY d.source"""
    )


@query("q402_bpe_encode", _bpe_encode_oracle(_BPE_MERGES))
def q402(spark, sf_dir):
    """BPE ENCODING with the learned merge table
    (`operators/bpe.bpe_encoded_words`) — the apply half completing
    q398's training half: because training maintains the merged word
    table round by round, the encoded vocabulary IS the loop's final
    state, so segmenting the corpus costs one word-keyed join, no
    second pass.  Reports per-source token accounting — words, chars,
    BPE tokens, and tokens-per-char in exact ppm (the compression the
    tokenizer actually buys on each slice), the number a data-mixture
    budget is priced in."""
    from ..operators.bpe import bpe_encoded_words

    docs = _t(spark, sf_dir, "documents")
    vocab = bpe_encoded_words(docs, _BPE_MERGES).select(
        "word", F.size("sym").cast("bigint").alias("n_sym")
    )
    per_doc = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    return (
        per_doc.join(vocab, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.expr(
                "sum(n_sym) * 1000000 DIV sum(length(word))"
            ).alias("tokens_per_char_ppm"),
        )
    )


@query(
    "q405_phrase_search",
    """
    WITH tok AS (
      SELECT doc_id, CAST(t.i AS BIGINT) AS pos, arr[t.i] AS token
      FROM (
        SELECT doc_id, regexp_extract_all(lower(text), '{re}') AS arr
        FROM documents
      ), LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS i) t
    ), phrases AS (
      SELECT doc_id AS query_id, arr[1] AS t0, arr[2] AS t1, arr[3] AS t2
      FROM (
        SELECT doc_id, regexp_extract_all(lower(text), '{re}') AS arr
        FROM documents
      )
      WHERE doc_id % 50 = 0 AND len(arr) >= 3
    ), hits AS (
      SELECT ph.query_id, p0.doc_id, p0.pos
      FROM phrases ph
      JOIN tok p0 ON p0.token = ph.t0
      JOIN tok p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
                 AND p1.token = ph.t1
      JOIN tok p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
                 AND p2.token = ph.t2
      WHERE p0.doc_id <> ph.query_id
    )
    SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM hits GROUP BY query_id, doc_id
    """.format(re=TOKEN_RE),
)
def q405(spark, sf_dir):
    """Exact phrase search over a POSITIONAL inverted index — the
    full-text operator BM25 (q394) can't express: each query doc's
    leading 3-gram is located in every other document by joining the
    (doc, pos, token) postings on token with position-shifted legs
    ((doc, pos−1) and (doc, pos−2) aliased to the anchor position), so
    all three hops are plain named-column equi-joins — the Lucene
    phrase-query plan re-expressed relationally.  No document text is
    rescanned; the only wide exchanges key on token and (doc, pos).
    Occurrence COUNTS (not just membership) are value-verified."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0).alias(
            "arr"
        ),
    )
    tok = d.select(
        "doc_id", F.posexplode("arr").alias("p0", "token")
    ).select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "token")
    phrases = d.filter(
        (F.col("doc_id") % 50 == 0) & (F.size("arr") >= 3)
    ).select(
        F.col("doc_id").alias("query_id"),
        F.col("arr")[0].alias("t0"),
        F.col("arr")[1].alias("t1"),
        F.col("arr")[2].alias("t2"),
    )
    leg = lambda name, shift: tok.select(
        F.col("doc_id").alias("m_doc"),
        (F.col("pos") - shift).alias("m_pos"),
        F.col("token").alias(name),
    )
    hits = (
        phrases.join(leg("t0", 0), "t0")
        .filter(F.col("m_doc") != F.col("query_id"))
        .join(leg("t1", 1), ["t1", "m_doc", "m_pos"])
        .join(leg("t2", 2), ["t2", "m_doc", "m_pos"])
    )
    return hits.groupBy(
        "query_id", F.col("m_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).alias("n_occurrences"))


@query(
    "q406_clustering_coefficients",
    """
    WITH raw AS (
      SELECT user_id % 150 AS src, (user_id * 7 + event_id * 3) % 150 AS dst
      FROM events
    ), e AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM raw WHERE src <> dst
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), pern AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
      FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT CAST(d.node AS BIGINT) AS node, d.deg,
           CAST(COALESCE(p.tri_cnt, 0) AS BIGINT) AS tri_cnt,
           CAST(CASE WHEN d.deg < 2 THEN 0
                ELSE (COALESCE(p.tri_cnt, 0) * 2000000)
                     // (d.deg * (d.deg - 1)) END AS BIGINT) AS cc_ppm
    FROM deg d LEFT JOIN pern p ON d.node = p.node
    """,
)
def q406(spark, sf_dir):
    """Local clustering coefficient
    (`operators/graph.clustering_coefficients`): 2·tri/(deg·(deg−1))
    in exact ppm over the q396 event graph — the neighborhood-density
    metric (community tightness / spam-graph signal) composing the
    degree-ordered triangle count with one degree aggregate and a
    node-keyed left join; degree-<2 nodes report 0, and EVERY node
    appears (the left join the oracle mirrors)."""
    from ..operators.graph import clustering_coefficients

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 150).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id") * 3) % 150).alias("dst"),
    )
    return clustering_coefficients(ev)


@query(
    "q407_cdc_chunking",
    """
    WITH d AS (
      SELECT doc_id, source, text, length(text) AS n
      FROM documents WHERE length(text) >= 8
    ), hashed AS (
      SELECT doc_id, source, text, n,
             list_transform(range(8, n + 1),
               i -> list_reduce(
                      list_transform(range(i - 7, i + 1),
                        j -> CAST(ascii(substr(text, j, 1)) AS BIGINT)),
                      (acc, x) -> (acc * 257 + x) % 1000003)) AS h
      FROM d
    ), cuts AS (
      SELECT doc_id, source, text, n,
             list_filter(range(8, n + 1),
               i -> h[i - 7] % 64 = 0 AND i < n) AS cut
      FROM hashed
    ), chunks AS (
      SELECT doc_id, source,
             substr(text,
                    CASE WHEN k = 1 THEN 1 ELSE cut[k - 1] + 1 END,
                    CASE WHEN k = len(cut) + 1 THEN n ELSE cut[k] END
                      - CASE WHEN k = 1 THEN 1 ELSE cut[k - 1] + 1 END
                      + 1) AS chunk
      FROM cuts, LATERAL (SELECT unnest(range(1, len(cut) + 2)) AS k) t
    ), dupc AS (
      SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(*) >= 2
    )
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(length(c.chunk)) AS BIGINT) AS chunk_chars,
           CAST(COUNT(*) FILTER (WHERE d2.chunk IS NOT NULL) AS BIGINT)
             AS dup_chunks,
           CAST(COALESCE(SUM(length(c.chunk))
                  FILTER (WHERE d2.chunk IS NOT NULL), 0) AS BIGINT)
             AS dup_chunk_chars
    FROM chunks c LEFT JOIN dupc d2 ON c.chunk = d2.chunk
    GROUP BY c.source
    """,
)
def q407(spark, sf_dir):
    """Content-defined chunking (the rsync/LBFS/backup-dedup primitive,
    `operators/dedup.cdc_chunks`): a Rabin-style rolling hash (Horner
    polynomial mod 1000003 over an 8-char window) marks a cut wherever
    hash % 64 == 0, and the chunks between cuts dedup by exact content
    across the corpus — insert-shift-robust, unlike fixed-size blocks.
    Reports per-source chunk counts and the duplicate chunk mass (the
    bytes a content-addressed store would NOT store twice).  Chunking
    is one Arrow pass (vectorized sliding-window hash — the native
    expression version cost 16 s at sf0.1, see operator docstring);
    the only shuffles are the chunk-keyed dedup aggregate (the q395
    shape) and the per-source rollup."""
    from pyspark import StorageLevel

    from ..operators.dedup import cdc_chunks

    # the Arrow chunking pass is the expensive stage and feeds BOTH the
    # dup-count aggregate and the join-back side — lazily it ran twice
    # (plans/r17/q407_cdc_chunking_before.txt: 4 ArrowEval nodes).  One
    # DISK_ONLY checkpoint runs it once; values bit-identical.
    chunks = cdc_chunks(
        _t(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    dupc = (
        chunks.groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("chunk", F.lit(1).alias("is_dup"))
    )
    return (
        chunks.join(dupc, "chunk", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.length("chunk")).cast("bigint").alias("chunk_chars"),
            F.count_if(F.col("is_dup").isNotNull())
            .cast("bigint")
            .alias("dup_chunks"),
            F.sum(
                F.when(F.col("is_dup").isNotNull(), F.length("chunk")).otherwise(0)
            )
            .cast("bigint")
            .alias("dup_chunk_chars"),
        )
    )


@query(
    "q408_langid_evaluation",
    """
    WITH pred AS ({lang_sql}
    ), j AS (
      SELECT d.lang AS gold, p.pred_lang AS pred
      FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    ), per_gold AS (
      SELECT gold, CAST(COUNT(*) AS BIGINT) AS n_gold,
             CAST(count_if(gold = pred) AS BIGINT) AS tp
      FROM j GROUP BY gold
    ), per_pred AS (
      SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pred FROM j GROUP BY pred
    ), m AS (
      SELECT g.gold AS lang, g.n_gold, COALESCE(p.n_pred, 0) AS n_pred, g.tp,
             CASE WHEN COALESCE(p.n_pred, 0) = 0 THEN 0
                  ELSE (g.tp * 1000000) // p.n_pred END AS precision_ppm,
             (g.tp * 1000000) // g.n_gold AS recall_ppm
      FROM per_gold g LEFT JOIN per_pred p ON g.gold = p.pred
    )
    SELECT lang, n_gold, CAST(n_pred AS BIGINT) AS n_pred, tp,
           CAST(precision_ppm AS BIGINT) AS precision_ppm,
           CAST(recall_ppm AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
                ELSE (2 * precision_ppm * recall_ppm)
                     // (precision_ppm + recall_ppm) END AS BIGINT) AS f1_ppm
    FROM m
    """.format(lang_sql=_lang_case_sql()),
)
def q408(spark, sf_dir):
    """Classifier evaluation harness applied to the q43 language-ID
    heuristic against the corpus's GOLD lang labels: per-class
    precision / recall / F1 in exact integer ppm (F1 as the harmonic
    mean computed entirely in integer arithmetic).  Classes the
    classifier can't emit (zh) surface honestly as recall 0 — the
    open-set failure mode a stopword classifier has by construction.
    One doc-keyed join + two tiny keyed aggregates; the oracle
    composes the full q43 statement as its prediction subquery, so the
    metric AND the classifier are verified together."""
    from ..queries import QUERIES as _Q

    pred = _Q["q43_langid"](spark, sf_dir).select("doc_id", "pred_lang")
    gold = _t(spark, sf_dir, "documents").select("doc_id", F.col("lang").alias("gold"))
    j = gold.join(pred, "doc_id").select("gold", F.col("pred_lang").alias("pred"))
    per_gold = j.groupBy("gold").agg(
        F.count(F.lit(1)).alias("n_gold"),
        F.count_if(F.col("gold") == F.col("pred")).alias("tp"),
    )
    per_pred = j.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pred"))
    m = per_gold.join(
        per_pred, per_gold["gold"] == per_pred["pred"], "left"
    ).select(
        F.col("gold").alias("lang"),
        "n_gold",
        F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
        "tp",
        F.when(F.coalesce("n_pred", F.lit(0)) == 0, F.lit(0))
        .otherwise(F.expr("tp * 1000000 DIV n_pred"))
        .cast("bigint")
        .alias("precision_ppm"),
        F.expr("tp * 1000000 DIV n_gold").cast("bigint").alias("recall_ppm"),
    )
    return m.select(
        "lang",
        "n_gold",
        "n_pred",
        "tp",
        "precision_ppm",
        "recall_ppm",
        F.when(F.col("precision_ppm") + F.col("recall_ppm") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "2 * precision_ppm * recall_ppm "
                "DIV (precision_ppm + recall_ppm)"
            )
        )
        .cast("bigint")
        .alias("f1_ppm"),
    )


@query(
    "q410_codec_size_advisor",
    """
    WITH s AS (
      SELECT event_type, epoch_ms(ts) AS ms,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS d1,
             row_number() OVER w AS rn
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), dd AS (
      SELECT event_type, ms, d1, rn,
             d1 - lag(d1) OVER (PARTITION BY event_type ORDER BY rn) AS d2
      FROM s
    ), bits AS (
      SELECT event_type,
             CASE WHEN rn = 1 THEN 8
                  ELSE (length(bin(CASE WHEN d1 >= 0 THEN 2 * d1
                                        ELSE -2 * d1 - 1 END)) + 6) // 7
             END AS delta_bytes,
             CASE WHEN rn <= 2 THEN 8
                  ELSE (length(bin(CASE WHEN d2 >= 0 THEN 2 * d2
                                        ELSE -2 * d2 - 1 END)) + 6) // 7
             END AS dd_bytes
      FROM dd
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
           CAST(SUM(delta_bytes) AS BIGINT) AS delta_varint_bytes,
           CAST(SUM(dd_bytes) AS BIGINT) AS double_delta_varint_bytes
    FROM bits GROUP BY event_type
    """,
)
def q410(spark, sf_dir):
    """Storage-codec size advisor — the ClickHouse Delta/DoubleDelta
    codec decision computed EXACTLY: per event_type, the epoch-ms
    timestamp column's encoded size under raw int64, zigzag-varint
    delta, and zigzag-varint delta-of-delta (first one/two values kept
    raw at 8 bytes, as the CH codecs do).  Bit widths via
    length(bin(zigzag(x))) and varint bytes = (bits+6) div 7 — pure
    integer arithmetic, identical on both engines.  Near-periodic
    event streams should show double-delta ≪ delta ≪ raw; the numbers
    let a 100 TB table pick its codec from a 1-minute sample."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ms = (F.unix_millis(F.col("ts"))).alias("ms")
    s = ev.select("event_type", "event_id", "ts", ms).select(
        "event_type",
        "ms",
        (F.col("ms") - F.lag("ms").over(w)).alias("d1"),
        F.row_number().over(w).alias("rn"),
        "ts",
        "event_id",
    )
    w2 = Window.partitionBy("event_type").orderBy("rn")
    dd = s.select(
        "event_type",
        "rn",
        "d1",
        (F.col("d1") - F.lag("d1").over(w2)).alias("d2"),
    )
    bits = dd.select(
        "event_type",
        F.when(F.col("rn") == 1, F.lit(8))
        .otherwise(F.expr("(length(bin(if(d1 >= 0, 2*d1, -2*d1 - 1))) + 6) DIV 7"))
        .cast("bigint")
        .alias("delta_bytes"),
        F.when(F.col("rn") <= 2, F.lit(8))
        .otherwise(F.expr("(length(bin(if(d2 >= 0, 2*d2, -2*d2 - 1))) + 6) DIV 7"))
        .cast("bigint")
        .alias("dd_bytes"),
    )
    return bits.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) * 8).cast("bigint").alias("raw_bytes"),
        F.sum("delta_bytes").cast("bigint").alias("delta_varint_bytes"),
        F.sum("dd_bytes").cast("bigint").alias("double_delta_varint_bytes"),
    )


@query(
    "q413_rrf_hybrid_retrieval",
    """
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, UNNEST(regexp_extract_all(lower(text), '{re}')) AS u(t)
    ), postings AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs,
             (COUNT(*) * 1000) // COUNT(DISTINCT doc_id) AS am
      FROM tok
    ), dfq AS (
      SELECT token, COUNT(*) AS dfreq FROM postings GROUP BY token
    ), qterms AS (
      SELECT DISTINCT doc_id AS query_id, token FROM tok WHERE doc_id % 50 = 0
    ), term_scores AS (
      SELECT q.query_id, p.doc_id,
             (s.n_docs // d.dfreq)
             * ((22 * p.tf * s.am * 1000000)
                // (10 * p.tf * s.am + 3 * s.am + 9000 * l.dl)) AS term_score
      FROM qterms q
      JOIN dfq d ON q.token = d.token
      CROSS JOIN stats s
      JOIN postings p ON p.token = q.token
      JOIN dl l ON l.doc_id = p.doc_id
      WHERE d.dfreq * 10 <= s.n_docs * 9 AND p.doc_id <> q.query_id
    ), bm25 AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY SUM(term_score) DESC, doc_id) AS rk_a
      FROM (SELECT query_id, doc_id, term_score FROM term_scores)
      GROUP BY query_id, doc_id
      QUALIFY rk_a <= 20
    ), sh AS (
      SELECT doc_id AS doc, len(shl) AS n_sh, unnest(shl) AS shingle
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(
                        list_slice(string_split(text, ' '), i, i + 2), ' ')
               )) AS shl
        FROM documents
      )
    ), jpairs AS (
      SELECT q.doc AS query_id, d.doc AS doc_id,
             (COUNT(*) * 1000000)
               // (q.n_sh + d.n_sh - COUNT(*)) AS score_ppm
      FROM sh q JOIN sh d ON q.shingle = d.shingle AND q.doc <> d.doc
      WHERE q.doc % 50 = 0
      GROUP BY q.doc, d.doc, q.n_sh, d.n_sh
    ), jac AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_ppm DESC, doc_id) AS rk_b
      FROM jpairs QUALIFY rk_b <= 20
    ), fused AS (
      SELECT COALESCE(a.query_id, b.query_id) AS query_id,
             COALESCE(a.doc_id, b.doc_id) AS doc_id,
             COALESCE(1000000 // (60 + a.rk_a), 0)
               + COALESCE(1000000 // (60 + b.rk_b), 0) AS rrf,
             COALESCE(a.rk_a, 0) AS bm25_rank,
             COALESCE(b.rk_b, 0) AS jaccard_rank
      FROM bm25 a FULL OUTER JOIN jac b
        ON a.query_id = b.query_id AND a.doc_id = b.doc_id
    )
    SELECT query_id, CAST(rk AS INTEGER) AS fused_rank, doc_id,
           CAST(rrf AS BIGINT) AS rrf_score,
           CAST(bm25_rank AS INTEGER) AS bm25_rank,
           CAST(jaccard_rank AS INTEGER) AS jaccard_rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rk
      FROM fused
    ) WHERE rk <= 3
    """.format(re=TOKEN_RE),
)
def q413(spark, sf_dir):
    """Reciprocal Rank Fusion — the standard hybrid-retrieval merge
    (Cormack 2009, what every BM25+vector stack runs): fuse the q394
    BM25 top-20 with an exact-Jaccard shingle top-20 by
    Σ 1 000 000 div (60 + rank) — integer RRF, ulp-proof.  A document
    missing from one list simply contributes nothing (the outer-join
    semantics RRF is loved for).  Both legs are token/shingle-keyed
    inverted-index joins; fusion is one (query, doc)-keyed full outer
    join over two ≤20-row-per-query lists — negligible at any scale.

    This is the EXACT form (uncapped Jaccard leg — the verify tier);
    q458 is the same operator with the q195 stop-shingle cap engaged,
    the form that holds at 100 TB (`operators/retrieval.py:
    rrf_hybrid_topk`)."""
    from ..operators.retrieval import rrf_hybrid_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return rrf_hybrid_topk(docs, queries_df, k_leg=20, k_out=3)


@query(
    "q414_asof_nearest_join",
    """
    WITH p AS (
      SELECT event_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
    ), e AS (
      SELECT user_id, ts AS e_ts FROM events
      WHERE event_type = 'error' AND ts IS NOT NULL
    ), pairs AS (
      SELECT p.event_id, p.user_id, p.p_ts, e.e_ts,
             ABS(epoch_ms(e.e_ts) - epoch_ms(p.p_ts)) AS ad,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY ABS(epoch_ms(e.e_ts) - epoch_ms(p.p_ts)), e.e_ts
             ) AS rn
      FROM p JOIN e ON p.user_id = e.user_id
    ), best AS (
      SELECT event_id, user_id, p_ts,
             CASE WHEN ad <= 1800000 THEN e_ts END AS err_ts,
             CASE WHEN ad <= 1800000
                  THEN epoch_ms(e_ts) - epoch_ms(p_ts) END AS delta_ms
      FROM pairs WHERE rn = 1
    )
    SELECT p.event_id, p.user_id,
           strftime(p.p_ts, '{tsfd}') AS p_ts,
           strftime(b.err_ts, '{tsfd}') AS err_ts,
           CAST(b.delta_ms AS BIGINT) AS delta_ms
    FROM p LEFT JOIN best b ON p.event_id = b.event_id
    """.format(tsfd=TSF_D),
)
def q414(spark, sf_dir):
    """NEAREST as-of join (pandas merge_asof direction='nearest', with
    a 30-min tolerance): each purchase pairs with the closest error on
    the same user in EITHER direction, ties to the earlier row.
    Composed from two runs of the q27 single-sort as-of kernel
    (backward latest-≤ + forward earliest-≥) and a three-way CASE —
    still one key-partitioned sorted pass per direction, no range-join
    blowup; the oracle ranks all same-user pairs by absolute distance.
    Beyond-tolerance and error-free purchases surface with NULLs."""
    from ..operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts"), F.col("ts").alias("err_ts")
    )
    bwd = asof_join(
        left, right, on="user_id", left_ts="p_ts", right_ts="e_ts",
        value_cols=["err_ts"], direction="backward",
    ).select("event_id", F.col("err_ts_asof").alias("err_b"))
    fwd = asof_join(
        left, right, on="user_id", left_ts="p_ts", right_ts="e_ts",
        value_cols=["err_ts"], direction="forward",
    ).select("event_id", F.col("err_ts_asof").alias("err_f"))
    j = left.join(bwd, "event_id", "left").join(fwd, "event_id", "left")
    pm = F.unix_millis("p_ts")
    db = pm - F.unix_millis("err_b")   # >= 0 when matched
    df_ = F.unix_millis("err_f") - pm  # >= 0 when matched
    tol = 1800000
    pick_b = F.col("err_b").isNotNull() & (
        F.col("err_f").isNull() | (db <= df_)
    )
    chosen = F.when(pick_b, F.col("err_b")).otherwise(F.col("err_f"))
    delta = F.when(pick_b, -db).otherwise(df_)
    ok = chosen.isNotNull() & (F.abs(delta) <= tol)
    return j.select(
        "event_id",
        "user_id",
        F.date_format("p_ts", TSF_S).alias("p_ts"),
        F.when(ok, F.date_format(chosen, TSF_S)).alias("err_ts"),
        F.when(ok, delta).cast("bigint").alias("delta_ms"),
    )


@query(
    "q415_low_cardinality_advisor",
    """
    WITH cols AS (
      SELECT 'event_type' AS col, event_type AS v FROM events
      UNION ALL SELECT 'props', props FROM events
      UNION ALL SELECT 'user_bucket', 'u' || CAST(user_id % 1000 AS VARCHAR)
      FROM events
    ), st AS (
      SELECT col,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
             CAST(SUM(length(v)) AS BIGINT) AS raw_bytes
      FROM cols GROUP BY col
    ), dlen AS (
      SELECT col, CAST(SUM(length(v)) AS BIGINT) AS dict_payload
      FROM (SELECT DISTINCT col, v FROM cols) GROUP BY col
    )
    SELECT st.col,
           st.n, st.ndv, st.raw_bytes,
           CAST(dlen.dict_payload
                + (st.n * length(bin(st.ndv - 1)) + 7) // 8
                AS BIGINT) AS dict_bytes,
           CAST(dlen.dict_payload
                + (st.n * length(bin(st.ndv - 1)) + 7) // 8
                < st.raw_bytes AS BOOLEAN) AS recommend_low_cardinality
    FROM st JOIN dlen ON st.col = dlen.col
    """,
)
def q415(spark, sf_dir):
    """LowCardinality encoding advisor — the companion of q410 for
    string columns (ClickHouse's LowCardinality(String) decision):
    per column, exact dictionary-encoding size = distinct payload +
    n·ceil(log2 ndv) bits, vs raw concatenated bytes, with the
    recommendation boolean.  Bit width via length(bin(ndv−1)) — the
    same integer idiom as the codec advisor.  One unpivot + two
    column-keyed aggregates; at 100 TB this runs on a sample but the
    arithmetic is scale-free."""
    ev = _t(spark, sf_dir, "events")
    cols = (
        ev.select(F.lit("event_type").alias("col"), F.col("event_type").alias("v"))
        .unionAll(ev.select(F.lit("props"), F.col("props")))
        .unionAll(
            ev.select(
                F.lit("user_bucket"),
                F.concat(F.lit("u"), (F.col("user_id") % 1000).cast("string")),
            )
        )
    )
    st = cols.groupBy("col").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("v").alias("ndv"),
        F.sum(F.length("v")).cast("bigint").alias("raw_bytes"),
    )
    dlen = (
        cols.distinct()
        .groupBy("col")
        .agg(F.sum(F.length("v")).cast("bigint").alias("dict_payload"))
    )
    j = st.join(dlen, "col")
    dict_bytes = F.expr(
        "dict_payload + (n * length(bin(ndv - 1)) + 7) DIV 8"
    ).cast("bigint")
    return j.select(
        "col",
        "n",
        "ndv",
        "raw_bytes",
        dict_bytes.alias("dict_bytes"),
        (dict_bytes < F.col("raw_bytes")).alias("recommend_low_cardinality"),
    )


@query(
    "q416_entity_resolution",
    """
    WITH base AS (
      SELECT c_custkey AS k, c_name AS name, c_nationkey,
             CAST(floor(c_acctbal) AS BIGINT) AS bal_b
      FROM customer
    ), dirty AS (
      SELECT k + 1000000 AS k,
             substr(name, 1, 3 + k % 5) || substr(name, 5 + k % 5) AS name,
             c_nationkey, bal_b
      FROM base WHERE k % 3 = 0
    ), ent AS (
      SELECT * FROM base UNION ALL SELECT * FROM dirty
    ), pairs AS (
      SELECT a.k AS a_key, b.k AS b_key,
             jaro_winkler_similarity(a.name, b.name) AS jw
      FROM ent a JOIN ent b
        ON a.c_nationkey = b.c_nationkey AND a.bal_b = b.bal_b
       AND a.k < b.k
    )
    SELECT a_key, b_key, jw FROM pairs WHERE jw >= 0.9
    """,
)
def q416(spark, sf_dir):
    """Entity resolution (record linkage) end to end: plant a dirty
    variant (one deterministic character dropped from the name) for a
    third of the customers, BLOCK on the stable attributes
    (nationkey, floor(acctbal)) — the step that turns O(n²) matching
    into per-block work — then score candidate pairs with the
    bit-exact Jaro-Winkler kernel (q347's cross-implementation
    differential: our pandas UDF vs DuckDB's independent builtin) and
    keep matches at ≥ 0.9.  Block sizes are bounded by construction;
    a skewed block at 100 TB salts on an extra attribute without
    changing the pipeline."""
    from ..functions.fuzzy import jaro_winkler_col

    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        "c_nationkey",
        F.floor("c_acctbal").cast("bigint").alias("bal_b"),
    )
    dirty = base.filter(F.col("k") % 3 == 0).select(
        (F.col("k") + 1000000).alias("k"),
        F.expr(
            "concat(substr(name, 1, 3 + k % 5), substr(name, 5 + k % 5))"
        ).alias("name"),
        "c_nationkey",
        "bal_b",
    )
    ent = base.unionByName(dirty)
    a = ent.select(
        F.col("k").alias("a_key"), F.col("name").alias("a_name"),
        "c_nationkey", "bal_b",
    )
    b = ent.select(
        F.col("k").alias("b_key"), F.col("name").alias("b_name"),
        "c_nationkey", "bal_b",
    )
    pairs = a.join(b, ["c_nationkey", "bal_b"]).filter(
        F.col("a_key") < F.col("b_key")
    )
    scored = pairs.select(
        "a_key",
        "b_key",
        jaro_winkler_col(F.col("a_name"), F.col("b_name")).alias("jw"),
    )
    return scored.filter(F.col("jw") >= 0.9)


@query(
    "q418_ch_functions3",
    """
    SELECT event_type,
           CAST(SUM(2 * (user_id % 5) + 2 * (event_id % 7)) AS BIGINT) AS s2,
           CAST(SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS zeros,
           CAST(SUM(CASE user_id % 6 WHEN 3 THEN 1 WHEN 1 THEN 2
                    WHEN 4 THEN 3 WHEN 5 THEN 5 ELSE 0 END)
                AS BIGINT) AS idx_sum,
           CAST(SUM(bit_count(xor(user_id, event_id))) AS BIGINT) AS bits,
           CAST(SUM((event_id // 7)
                  - CASE WHEN user_id % 3 = 0 THEN 0
                         ELSE event_id // (user_id % 3) END)
                AS BIGINT) AS idv,
           MIN(strftime(ts, '%Y-%m-%dT%H')) AS first_bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q418(spark, sf_dir):
    """Third CH dialect function family: array higher-order functions
    with CH's lambda-first argument order (arrayMap/arrayFilter/
    arrayCount/arraySum), bracket ARRAY LITERALS (now translated to
    array(...) — while indexing-shaped brackets refuse loudly, CH
    being 1-based where Spark is 0-based), indexOf via array_position,
    integer arithmetic (intDiv/intDivOrZero), bit functions
    (bitXor/bitCount), and formatDateTime with %-spec translation
    (raw pattern letters auto-quoted).  The oracle re-derives every
    expression with scalar arithmetic — no array machinery shared."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    ch = (
        "SELECT event_type, "
        "sum(arraySum(arrayMap(x -> x * 2, [user_id % 5, event_id % 7]))) AS s2, "
        "sum(arrayCount(x -> x = 0, [user_id % 3, event_id % 3])) AS zeros, "
        "sum(indexOf([3, 1, 4, 1, 5], user_id % 6)) AS idx_sum, "
        "sum(bitCount(bitXor(user_id, event_id))) AS bits, "
        "sum(intDiv(event_id, 7) - intDivOrZero(event_id, user_id % 3)) AS idv, "
        "min(formatDateTime(ts, '%Y-%m-%dT%H')) AS first_bucket, "
        "count() AS n "
        "FROM events_t GROUP BY event_type"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_type",
        F.col("s2").cast("bigint").alias("s2"),
        F.col("zeros").cast("bigint").alias("zeros"),
        F.col("idx_sum").cast("bigint").alias("idx_sum"),
        F.col("bits").cast("bigint").alias("bits"),
        F.col("idv").cast("bigint").alias("idv"),
        "first_bucket",
        F.col("n").cast("bigint").alias("n"),
    )


@query(
    "q432_ch_sample_clause",
    """
    WITH s AS (
      SELECT * FROM events
      WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 8) < '33333333'
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu,
           CAST(SUM(event_id % 97) AS BIGINT) AS s
    FROM s GROUP BY event_type ORDER BY event_type
    """,
)
def q432(spark, sf_dir):
    """CH ``SAMPLE`` clause (``FROM events SAMPLE 0.2``) through the
    dialect shim: CH samples deterministically by hashing the table's
    ``SAMPLE BY`` expression, so the translation (given that key as
    ``sampling_key=``) thresholds the leading 32 bits of
    md5(sampling_key) — same subset every run, and nested exactly the
    way CH guarantees (SAMPLE 0.1 rows ⊂ SAMPLE 0.2 rows: both are
    prefixes of one hash order).  The oracle replays the identical
    md5-prefix predicate in DuckDB — the two engines' md5 agree
    byte-for-byte, so this is an exact-subset value check, not a
    statistical one.  At scale the predicate is a codegen'd filter
    ahead of the first exchange: sampling costs one scan pass, never a
    shuffle."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sample_t")
    ch = (
        "SELECT event_type, count() AS n, uniqExact(user_id) AS nu, "
        "sum(event_id % 97) AS s "
        "FROM events_sample_t SAMPLE 0.2 GROUP BY event_type"
    )
    df = spark.sql(translate_ch_sql(ch, sampling_key="event_id"))
    return df.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("nu").cast("bigint").alias("nu"),
        F.col("s").cast("bigint").alias("s"),
    ).orderBy("event_type")


@query(
    "q436_ch_temporal4",
    """
    SELECT date_trunc('quarter', ts) AS q_start,
           date_trunc('year', ts) AS y_start,
           CAST(to_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600)
                AS TIMESTAMP) AS ten_min,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
    FROM events
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q436(spark, sf_dir):
    """Fourth CH temporal/estimator dialect family: toStartOfQuarter/
    toStartOfYear (date_trunc grains CH users reach for in
    month-over-month dashboards), the toStartOfTenMinutes epoch-floor
    bucket, and uniqCombined (CH's other HLL estimator — but aggregated
    here as uniqExact so the oracle can replay exactly; the
    uniqCombined→approx_count_distinct mapping itself is unit-pinned in
    tests/test_ch_dialect_sql.py).  CH returns Date for the
    quarter/year grains where this returns timestamps — the same
    documented deviation as toStartOfMonth."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t4")
    ch = (
        "SELECT toStartOfQuarter(ts) AS q_start, "
        "toStartOfYear(ts) AS y_start, "
        "toStartOfTenMinutes(ts) AS ten_min, "
        "count() AS n, uniqExact(user_id) AS nu "
        "FROM events_t4 GROUP BY 1, 2, 3"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "q_start",
        "y_start",
        "ten_min",
        F.col("n").cast("bigint").alias("n"),
        F.col("nu").cast("bigint").alias("nu"),
    ).orderBy("q_start", "y_start", "ten_min")


@query(
    "q437_ch_median_grouparray",
    """
    SELECT event_type,
           round(quantile_cont(user_id % 1000, 0.5), 4) AS med,
           array_to_string(list_slice(list_sort(list(event_id % 97)),
                           1, 5), ',') AS first5,
           MIN(to_base64(CAST(event_type AS BLOB))) AS b64
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q437(spark, sf_dir):
    """CH median/groupArray/base64 families through the dialect shim:
    medianExact → Spark's exact interpolated percentile (DuckDB
    quantile_cont replays it — the q61 idiom), groupArray → collect_list
    wrapped in arraySort + arraySlice so the arbitrary collection order
    (the same contract in BOTH engines) is normalized before comparison,
    base64Encode → base64.  The topK / cityHash64-family guards —
    sketch values and engine-specific hashes must never silently
    translate — are unit-pinned in tests/test_ch_dialect_sql.py."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t5")
    ch = (
        "SELECT event_type, "
        "round(medianExact(user_id % 1000), 4) AS med, "
        "arrayStringConcat(arraySlice(arraySort(groupArray(event_id % 97)), "
        "1, 5), ',') AS first5, "
        "min(base64Encode(event_type)) AS b64 "
        "FROM events_t5 GROUP BY event_type"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_type",
        F.col("med").cast("double").alias("med"),
        "first5",
        "b64",
    ).orderBy("event_type")


@query(
    "q440_delta_sum",
    """
    WITH s AS (
      SELECT event_type, event_id % 1000 AS x,
             lag(event_id % 1000) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS px
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN px IS NULL THEN 0
                    WHEN x - px > 0 THEN x - px ELSE 0 END) AS BIGINT)
             AS delta_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s GROUP BY event_type ORDER BY event_type
    """,
)
def q440(spark, sf_dir):
    """CH ``deltaSum`` with EXPLICIT ordering — the windowed form the
    dialect guard points at: CH sums positive deltas of consecutive
    values in stored block order (the monotonic-counter-with-resets
    idiom — network byte counters, restart-prone gauges); block order
    has no SQL meaning on a shuffled table, so this engine requires the
    order to be spelled out (ORDER BY ts, event_id per series) and the
    delta becomes greatest(x - lag(x), 0).  One window pass keyed on
    the series, exact integers."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    x = F.col("event_id") % 1000
    s = ev.select(
        "event_type",
        x.alias("x"),
        F.lag(x).over(w).alias("px"),
    )
    delta = F.when(F.col("px").isNull(), 0).otherwise(
        F.greatest(F.col("x") - F.col("px"), F.lit(0))
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.sum(delta).cast("bigint").alias("delta_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "q441_ch_functions5",
    """
    SELECT event_type,
           CAST(SUM(user_id % 5 + event_id % 7) AS BIGINT) AS fold_sum,
           CAST(BIT_AND(user_id % 256) AS BIGINT) AS band,
           CAST(BIT_OR(user_id % 256) AS BIGINT) AS bor,
           CAST(BIT_XOR(user_id % 256) AS BIGINT) AS bxor,
           CAST(SUM(GREATEST(user_id % 9, event_id % 11, 3)) AS BIGINT)
             AS rmax_sum,
           MIN(ts + INTERVAL 3 DAY) AS plus3d,
           MAX(ts - INTERVAL 90 MINUTE) AS minus90m
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q441(spark, sf_dir):
    """Fifth CH dialect family: arrayFold (lambda-first -> aggregate),
    arrayReduce('max'|...) on literal aggregate names, the groupBit*
    aggregates, and the add*/subtract* interval helpers
    (make_interval arithmetic).  The oracle re-derives every expression
    with scalar arithmetic — no array machinery shared; deltaSum &
    friends refuse in the dialect (block-order semantics) and live as
    the explicitly-ordered q440."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t6")
    ch = (
        "SELECT event_type, "
        "sum(arrayFold((acc, x) -> acc + x, [user_id % 5, event_id % 7], "
        "CAST(0 AS BIGINT))) AS fold_sum, "
        "groupBitAnd(user_id % 256) AS band, "
        "groupBitOr(user_id % 256) AS bor, "
        "groupBitXor(user_id % 256) AS bxor, "
        "sum(arrayReduce('max', [user_id % 9, event_id % 11, 3])) AS rmax_sum, "
        "min(addDays(ts, 3)) AS plus3d, "
        "max(subtractMinutes(ts, 90)) AS minus90m "
        "FROM events_t6 GROUP BY event_type"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_type",
        F.col("fold_sum").cast("bigint").alias("fold_sum"),
        F.col("band").cast("bigint").alias("band"),
        F.col("bor").cast("bigint").alias("bor"),
        F.col("bxor").cast("bigint").alias("bxor"),
        F.col("rmax_sum").cast("bigint").alias("rmax_sum"),
        "plus3d",
        "minus90m",
    ).orderBy("event_type")


@query(
    "q442_ch_functions6",
    """
    WITH b AS (
      SELECT event_type, user_id, event_id,
             [user_id % 5, event_id % 7, user_id % 5] AS arr
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN list_has_all(arr, [user_id % 5, 3])
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_hasall,
           CAST(SUM(CASE WHEN list_has_any(arr, [6])
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_hasany,
           CAST(SUM(len(list_concat(arr, [99]))) AS BIGINT) AS n_push,
           CAST(SUM(CASE WHEN user_id % 5 = event_id % 7 THEN 1
                    ELSE 3 END) AS BIGINT) AS n_compact,
           MIN(CASE WHEN event_id % 4 = 0 THEN 'small'
                    WHEN event_id % 4 = 1 THEN 'mid' ELSE 'other' END)
             AS t_min
    FROM b GROUP BY event_type ORDER BY event_type
    """,
)
def q442(spark, sf_dir):
    """Sixth CH dialect family executed end-to-end: hasAll/hasAny
    (forall-contains / arrays_overlap), arrayPushBack (size checked),
    arrayCompact (consecutive-dedup — the fixture arrays are
    [a, b, a], which compact to ONE element exactly when a = b and stay
    3 otherwise; the oracle re-derives that arithmetically), and the CH
    value-mapping transform() as a CASE chain.  formatReadableSize,
    bitNot, typeof, push/pop and the intHash/greatCircle guards are
    unit-pinned in tests/test_ch_dialect_sql.py."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_t7")
    ch = (
        "SELECT event_type, "
        "sum(multiIf(hasAll([user_id % 5, event_id % 7, user_id % 5], "
        "[user_id % 5, 3]), 1, 0)) AS n_hasall, "
        "sum(multiIf(hasAny([user_id % 5, event_id % 7, user_id % 5], "
        "[6]), 1, 0)) AS n_hasany, "
        "sum(arrayReduce('count', arrayPushBack([user_id % 5, event_id % 7, "
        "user_id % 5], 99))) AS n_push, "
        "sum(arrayReduce('count', arrayCompact([user_id % 5, event_id % 7, "
        "user_id % 5]))) AS n_compact, "
        "min(transform(event_id % 4, [0, 1], ['small', 'mid'], 'other')) "
        "AS t_min "
        "FROM events_t7 GROUP BY event_type"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_type",
        F.col("n_hasall").cast("bigint").alias("n_hasall"),
        F.col("n_hasany").cast("bigint").alias("n_hasany"),
        F.col("n_push").cast("bigint").alias("n_push"),
        F.col("n_compact").cast("bigint").alias("n_compact"),
        "t_min",
    ).orderBy("event_type")


@query(
    "q444_ndcg_at_10",
    """
    WITH cand AS (
      SELECT user_id % 20 AS q,
             event_id,
             (event_id * 7) % 1000 AS score,
             3 - (event_id % 4) AS rel
      FROM events WHERE event_id % 3 = 0
    ), ranked AS (
      SELECT q, rel,
             row_number() OVER (PARTITION BY q
                                ORDER BY score DESC, event_id) AS rk
      FROM cand
    ), top AS (
      SELECT q,
             list(rel ORDER BY rk) AS rels
      FROM ranked WHERE rk <= 10 GROUP BY q
    ), scored AS (
      SELECT q, len(rels) AS n_cands,
             list_reduce(list_transform(range(1, len(rels) + 1),
               i -> (pow(2, rels[i]) - 1) / log2(i + 1)),
               (a, b) -> a + b) AS dcg,
             list_reduce(list_transform(range(1, len(rels) + 1),
               i -> (pow(2, list_reverse_sort(rels)[i]) - 1) / log2(i + 1)),
               (a, b) -> a + b) AS idcg
      FROM top
    )
    SELECT q, CAST(n_cands AS BIGINT) AS n_cands,
           round(dcg, 6) AS dcg,
           round(dcg / idcg, 6) AS ndcg
    FROM scored ORDER BY q
    """,
)
def q444(spark, sf_dir):
    """nDCG@10 — the graded-relevance retrieval metric the rank-eval
    family (AUC q251, ECE q257, PR-AUC q258, RRF q413) was missing.
    Deterministic synthetic rankings (score and graded relevance both
    integer functions of the ids) rank per query by (score, id); DCG is
    the canonical (2^rel − 1)/log2(pos+1) folded SEQUENTIALLY over the
    rank-ordered relevance array — the repo's _COS_EXPR discipline, so
    both engines add the same doubles in the same order and the values
    round-trip to 6 dp bit-equal.  IDCG re-folds the same array sorted
    descending; nDCG = DCG/IDCG.  One window + one aggregate per
    query key."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    cand = ev.select(
        (F.col("user_id") % 20).alias("q"),
        "event_id",
        ((F.col("event_id") * 7) % 1000).alias("score"),
        (3 - F.col("event_id") % 4).alias("rel"),
    )
    w = Window.partitionBy("q").orderBy(F.col("score").desc(), F.col("event_id"))
    top = (
        cand.select("q", "rel", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .groupBy("q")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "rel"))),
                lambda s: s["rel"],
            ).alias("rels")
        )
    )

    def _dcg(arr):
        return F.aggregate(
            F.expr(
                f"transform(sequence(1, size({arr})), "
                f"i -> (pow(2, element_at({arr}, i)) - 1) / log2(i + 1))"
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = top.select(
        "q",
        F.size("rels").cast("bigint").alias("n_cands"),
        _dcg("rels").alias("dcg"),
        _dcg("array_sort(rels, (a, b) -> CASE WHEN a > b THEN -1 "
             "WHEN a < b THEN 1 ELSE 0 END)").alias("idcg"),
    )
    return scored.select(
        "q",
        "n_cands",
        F.round("dcg", 6).alias("dcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    ).orderBy("q")


@query(
    "q447_ch_param_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(CASE WHEN user_id > 0
                               THEN user_id % 211 ELSE 0 END, 0.9), 4)
             AS p90,
           round(quantile_cont(event_id % 499, 0.25), 4) AS q1,
           round(quantile_cont(event_id % 499, 0.75), 4) AS q3,
           round(quantile_cont(CASE WHEN user_id % 2 = 0
                               THEN event_id % 997 END, 0.5), 4)
             AS med_even,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q447(spark, sf_dir):
    """CH parameterized-aggregate ``name(params)(args)`` shapes through
    the escape-aware ``_rewrite_param_calls`` lexer (round-9 directive 3:
    the earlier ``[^()]*`` regex rewrites broke the moment a quantile
    argument itself contained parens or commas — here ``if(user_id > 0,
    user_id % 211, 0)`` exercises exactly that).  quantileExact ->
    Spark's exact interpolated percentile (DuckDB quantile_cont replays
    it, the q61/q437 idiom), quantilesExact(list)(x) -> one percentile
    over an array of levels (projected to scalars — array outputs don't
    value-hash), quantileExactIf -> percentile over a CASE filter.  All
    JVM-side Catalyst aggregates: one hash-aggregate exchange on the
    5-value grouping key at any scale."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_q447")
    ch = (
        "SELECT event_type, "
        "round(quantileExact(0.9)(if(user_id > 0, user_id % 211, 0)), 4) "
        "AS p90, "
        "quantilesExact(0.25, 0.75)(event_id % 499) AS iqr, "
        "round(quantileExactIf(0.5)(event_id % 997, user_id % 2 = 0), 4) "
        "AS med_even, "
        "count() AS n "
        "FROM events_q447 GROUP BY event_type"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        "event_type",
        F.col("p90").cast("double").alias("p90"),
        F.round(F.element_at("iqr", 1), 4).cast("double").alias("q1"),
        F.round(F.element_at("iqr", 2), 4).cast("double").alias("q3"),
        F.col("med_even").cast("double").alias("med_even"),
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("event_type")


@query(
    "q448_ch_sequence_match",
    """
    WITH base AS (
      SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
    ), fe AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             (event_type = 'signup') AS m1,
             (event_type = 'purchase') AS m2
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('signup', 'purchase')
    ), nx AS (
      SELECT user_id, tsec, m1,
             lead(m2) OVER (PARTITION BY user_id
                            ORDER BY tsec, m1, m2) AS nm2,
             lead(tsec) OVER (PARTITION BY user_id
                              ORDER BY tsec, m1, m2) AS ntsec
      FROM fe
    ), adj AS (
      SELECT user_id,
             BOOL_OR(m1 AND nm2 AND ntsec - tsec <= 3600) AS quick_convert
      FROM nx GROUP BY user_id
    ), f3 AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             (event_type = 'signup') AS c1,
             (event_type = 'click') AS c2,
             (event_type = 'purchase') AS c3
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('signup', 'click', 'purchase')
    ), s1 AS (
      SELECT user_id, min(tsec) AS t1 FROM f3 WHERE c1 GROUP BY user_id
    ), s2 AS (
      SELECT f3.user_id, min(tsec) AS t2 FROM f3 JOIN s1 USING (user_id)
      WHERE c2 AND tsec > t1 GROUP BY f3.user_id
    ), s3 AS (
      SELECT DISTINCT f3.user_id FROM f3 JOIN s2 USING (user_id)
      WHERE c3 AND tsec > t2
    )
    SELECT b.user_id,
           COALESCE(adj.quick_convert, FALSE) AS quick_convert,
           (s3.user_id IS NOT NULL) AS full_path
    FROM base b
    LEFT JOIN adj USING (user_id)
    LEFT JOIN s3 ON b.user_id = s3.user_id
    ORDER BY b.user_id
    """,
)
def q448(spark, sf_dir):
    """CH ``sequenceMatch`` compiled by the dialect shim into a
    self-contained aggregate expression (no query restructuring): the
    adjacency-plus-time-bound form ``(?1)(?t<=3600)(?2)`` becomes a
    sorted collect_list scanned by an exists() over consecutive pairs,
    and the eventually-follows form ``(?1).*(?2).*(?3)`` becomes a
    greedy aggregate() fold — both bound ONCE via a one-element
    transform so the stream text never repeats.  Semantics match the
    q104/q247 kernels (rows matching no condition are skipped; the
    oracle replays them with lead()-window and cascaded-min SQL, no
    shared rewrite code).  Scale shape: one shuffle on user_id into a
    hash aggregate; per-group state is the user's own filtered event
    list, never a pair table."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_q448")
    ch = (
        "SELECT user_id, "
        "sequenceMatch('(?1)(?t<=3600)(?2)')(ts, "
        "event_type = 'signup', event_type = 'purchase') "
        "AS quick_convert, "
        "sequenceMatch('(?1).*(?2).*(?3)')(ts, event_type = 'signup', "
        "event_type = 'click', event_type = 'purchase') AS full_path "
        "FROM events_q448 WHERE user_id IS NOT NULL GROUP BY user_id"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "quick_convert",
        "full_path",
    ).orderBy("user_id")


@query(
    "q450_ch_sequence_count",
    """
    WITH base AS (
      SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
    ), fe AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             (event_type = 'click') AS m1,
             (event_type = 'purchase') AS m2
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('click', 'purchase')
    ), nx AS (
      SELECT user_id, tsec, m1,
             lead(m2) OVER (PARTITION BY user_id
                            ORDER BY tsec, m1, m2) AS nm2,
             lead(tsec) OVER (PARTITION BY user_id
                              ORDER BY tsec, m1, m2) AS ntsec
      FROM fe
    ), per_user AS (
      SELECT user_id,
             SUM(CASE WHEN m1 AND nm2 AND ntsec - tsec <= 86400
                      THEN 1 ELSE 0 END) AS n_quick,
             SUM(CASE WHEN m1 THEN 1 ELSE 0 END) AS n_clicks
      FROM nx GROUP BY user_id
    ), f3 AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             (event_type = 'signup') AS c1,
             (event_type = 'click') AS c2,
             (event_type = 'purchase') AS c3
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('signup', 'click', 'purchase')
    ), n3 AS (
      SELECT user_id, c1,
             lead(c2) OVER (PARTITION BY user_id
                            ORDER BY tsec, c1, c2, c3) AS nc2,
             lead(c3, 2) OVER (PARTITION BY user_id
                               ORDER BY tsec, c1, c2, c3) AS nnc3
      FROM f3
    ), per_user3 AS (
      SELECT user_id,
             SUM(CASE WHEN c1 AND nc2 AND nnc3 THEN 1 ELSE 0 END)
               AS n_path
      FROM n3 GROUP BY user_id
    )
    SELECT b.user_id,
           CAST(COALESCE(p.n_quick, 0) AS BIGINT) AS n_quick,
           CAST(COALESCE(p.n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(COALESCE(p3.n_path, 0) AS BIGINT) AS n_path
    FROM base b
    LEFT JOIN per_user p USING (user_id)
    LEFT JOIN per_user3 p3 USING (user_id)
    ORDER BY b.user_id
    """,
)
def q450(spark, sf_dir):
    """CH ``sequenceCount`` compiled by the dialect shim (round 11):
    non-overlapping chains counted greedy-leftmost with
    restart-after-completion — CH's documented contract.  The
    2-step adjacency(+time bound) form becomes one linear aggregate()
    fold over the sorted condition-filtered stream; the single-step
    form a filtered size(); the >= 3-step adjacency form (round 12)
    becomes the bitset-NFA fold of `_seq_count_sql` — an integer mask
    of alive prefix lengths, the restart state a single-slot fold
    loses.  The conditions here are pairwise DISJOINT (distinct event
    types), which makes the oracle exact with plain lead()-window
    pair/triple counts: counted chains can never share an event (it
    would need two disjoint conditions true at once), so non-overlap
    is structural and SUM(chain-predicate) equals the restart count.
    The overlapping-condition semantics ('(?1)(?1)', '(?1)(?1)(?2)',
    interleaved '.*' chains) are pinned on hand-built frames in
    tests/test_advice_r11 and fuzzed in
    tests/test_sequence_dialect_property.py.  Scale shape: one user_id
    shuffle into a hash aggregate, per-group state is the user's own
    event list."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_q450")
    ch = (
        "SELECT user_id, "
        "sequenceCount('(?1)(?t<=86400)(?2)')(ts, "
        "event_type = 'click', event_type = 'purchase') AS n_quick, "
        "sequenceCount('(?1)')(ts, event_type = 'click') AS n_clicks, "
        "sequenceCount('(?1)(?2)(?3)')(ts, event_type = 'signup', "
        "event_type = 'click', event_type = 'purchase') AS n_path "
        "FROM events_q450 WHERE user_id IS NOT NULL GROUP BY user_id"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("n_quick").cast("bigint").alias("n_quick"),
        F.col("n_clicks").cast("bigint").alias("n_clicks"),
        F.col("n_path").cast("bigint").alias("n_path"),
    ).orderBy("user_id")


@query(
    "q451_ch_window_funnel",
    """
    WITH base AS (
      SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
    ), fe AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('view', 'click', 'purchase')
    ), starts AS (
      SELECT DISTINCT user_id, tsec AS t0 FROM fe
      WHERE event_type = 'view'
    ), d2 AS (
      SELECT s.user_id, s.t0, min(f.tsec) AS t2
      FROM starts s JOIN fe f
        ON f.user_id = s.user_id AND f.event_type = 'click'
       AND f.tsec > s.t0 AND f.tsec <= s.t0 + 86400
      GROUP BY s.user_id, s.t0
    ), d3 AS (
      SELECT d.user_id, d.t0, min(f.tsec) AS t3
      FROM d2 d JOIN fe f
        ON f.user_id = d.user_id AND f.event_type = 'purchase'
       AND f.tsec > d.t2 AND f.tsec <= d.t0 + 86400
      GROUP BY d.user_id, d.t0
    ), lvl AS (
      SELECT s.user_id,
             MAX(1 + CASE WHEN d2.t0 IS NOT NULL THEN 1 ELSE 0 END
                   + CASE WHEN d3.t0 IS NOT NULL THEN 1 ELSE 0 END) AS lvl
      FROM starts s
      LEFT JOIN d2 ON d2.user_id = s.user_id AND d2.t0 = s.t0
      LEFT JOIN d3 ON d3.user_id = s.user_id AND d3.t0 = s.t0
      GROUP BY s.user_id
    )
    SELECT b.user_id, CAST(COALESCE(l.lvl, 0) AS INT) AS lvl
    FROM base b LEFT JOIN lvl l USING (user_id)
    ORDER BY b.user_id
    """,
)
def q451(spark, sf_dir):
    """CH ``windowFunnel(86400)(ts, view, click, purchase)`` compiled
    by the dialect shim (round 11): the MAX chain depth over ALL c1
    start events — each later step strictly later than the previous and
    within the window of the CHAIN'S FIRST event — as one aggregate
    expression (a greedy fold per start, max over starts; greedy
    earliest-match is depth-optimal for a fixed start since an earlier
    step match only loosens later constraints).  This is the honest
    windowFunnel contract, DIFFERENT from q97's cascaded-min funnel
    (which anchors every user at their FIRST view): a user whose first
    view leads nowhere but whose later view converts scores full depth
    here.  The oracle replays max-over-starts with cascaded min-
    correlated joins — no shared machinery.  Scale shape: one user_id
    shuffle; per-group work is O(starts × events) array arithmetic."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_q451")
    ch = (
        "SELECT user_id, "
        "windowFunnel(86400)(ts, event_type = 'view', "
        "event_type = 'click', event_type = 'purchase') AS lvl "
        "FROM events_q451 WHERE user_id IS NOT NULL GROUP BY user_id"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("lvl").cast("int").alias("lvl"),
    ).orderBy("user_id")


@query(
    "q452_ch_retention",
    """
    SELECT user_id,
           CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS INT) AS r1,
           CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              * MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS INT) AS r2,
           CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              * MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS INT) AS r3
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def q452(spark, sf_dir):
    """CH ``retention(view, click, purchase)`` through the dialect shim
    (round 11): CH's retention aggregate is ROW-ORDER-FREE — r1 =
    cond1 ever held in the group, r_i = cond1 ever held AND cond_i ever
    held (possibly different events, no temporal ordering) — so the
    rewrite is k max-CASE aggregates ANDed with the first; one hash
    aggregate, zero extra exchanges at any scale.  This is a WEAKER
    contract than the ordered day-over-day cohort retention the q99/
    q226/q287 operators implement; both exist because CH users rely on
    both.  The array lands as UInt8-style 0/1 ints, projected to
    scalar columns for the value hash."""
    from ..functions.ch_dialect import translate_ch_sql

    _t(spark, sf_dir, "events").createOrReplaceTempView("events_q452")
    ch = (
        "SELECT user_id, retention(event_type = 'view', "
        "event_type = 'click', event_type = 'purchase') AS r "
        "FROM events_q452 WHERE user_id IS NOT NULL GROUP BY user_id"
    )
    df = spark.sql(translate_ch_sql(ch))
    return df.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.element_at("r", 1).cast("int").alias("r1"),
        F.element_at("r", 2).cast("int").alias("r2"),
        F.element_at("r", 3).cast("int").alias("r3"),
    ).orderBy("user_id")


@query(
    "q458_rrf_hybrid_capped",
    """
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, UNNEST(regexp_extract_all(lower(text), '{re}')) AS u(t)
    ), postings AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs,
             (COUNT(*) * 1000) // COUNT(DISTINCT doc_id) AS am
      FROM tok
    ), dfq AS (
      SELECT token, COUNT(*) AS dfreq FROM postings GROUP BY token
    ), qterms AS (
      SELECT DISTINCT doc_id AS query_id, token FROM tok WHERE doc_id % 50 = 0
    ), term_scores AS (
      SELECT q.query_id, p.doc_id,
             (s.n_docs // d.dfreq)
             * ((22 * p.tf * s.am * 1000000)
                // (10 * p.tf * s.am + 3 * s.am + 9000 * l.dl)) AS term_score
      FROM qterms q
      JOIN dfq d ON q.token = d.token
      CROSS JOIN stats s
      JOIN postings p ON p.token = q.token
      JOIN dl l ON l.doc_id = p.doc_id
      WHERE d.dfreq * 10 <= s.n_docs * 9 AND p.doc_id <> q.query_id
    ), bm25 AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY SUM(term_score) DESC, doc_id) AS rk_a
      FROM (SELECT query_id, doc_id, term_score FROM term_scores)
      GROUP BY query_id, doc_id
      QUALIFY rk_a <= 20
    ), sh0 AS (
      SELECT doc_id AS doc, unnest(shl) AS shingle
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(
                        list_slice(string_split(text, ' '), i, i + 2), ' ')
               )) AS shl
        FROM documents
      )
    ), keep AS (
      SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 4
    ), shk AS (
      SELECT sh0.doc, sh0.shingle FROM sh0 JOIN keep USING (shingle)
    ), cnts AS (
      SELECT doc, COUNT(*) AS n_sh FROM shk GROUP BY doc
    ), jpairs AS (
      SELECT q.doc AS query_id, d.doc AS doc_id,
             (COUNT(*) * 1000000)
               // (cq.n_sh + cd.n_sh - COUNT(*)) AS score_ppm
      FROM shk q JOIN shk d ON q.shingle = d.shingle AND q.doc <> d.doc
      JOIN cnts cq ON q.doc = cq.doc
      JOIN cnts cd ON d.doc = cd.doc
      WHERE q.doc % 50 = 0
      GROUP BY q.doc, d.doc, cq.n_sh, cd.n_sh
    ), jac AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_ppm DESC, doc_id) AS rk_b
      FROM jpairs QUALIFY rk_b <= 20
    ), fused AS (
      SELECT COALESCE(a.query_id, b.query_id) AS query_id,
             COALESCE(a.doc_id, b.doc_id) AS doc_id,
             COALESCE(1000000 // (60 + a.rk_a), 0)
               + COALESCE(1000000 // (60 + b.rk_b), 0) AS rrf,
             COALESCE(a.rk_a, 0) AS bm25_rank,
             COALESCE(b.rk_b, 0) AS jaccard_rank
      FROM bm25 a FULL OUTER JOIN jac b
        ON a.query_id = b.query_id AND a.doc_id = b.doc_id
    )
    SELECT query_id, CAST(rk AS INTEGER) AS fused_rank, doc_id,
           CAST(rrf AS BIGINT) AS rrf_score,
           CAST(bm25_rank AS INTEGER) AS bm25_rank,
           CAST(jaccard_rank AS INTEGER) AS jaccard_rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rk
      FROM fused
    ) WHERE rk <= 3
    """.format(re=TOKEN_RE),
)
def q458(spark, sf_dir):
    """q413 with the Jaccard leg's stop-shingle cap engaged
    (``jaccard_max_df=4`` — the q195 precedent, Jaccard over KEPT
    shingles only).  This is the form that holds at web scale: the
    uncapped shingle self-join fans out Σ df² over hot shingles
    (bm25_scale_r13 measured 11.3 GB of disk spill at 20 M docs from
    that leg alone), while the cap bounds every posting list the join
    touches, exactly like BM25's max_df bounds leg A.  Values differ
    from q413 by construction (dropping shingles changes inter and the
    per-doc counts), so the capped form is its own oracled contract
    rather than a silent rewrite; at sf0.01 the cap drops the df 5-7
    shingle tail and reorders part of the Jaccard leg, which the
    value hash pins."""
    from ..operators.retrieval import rrf_hybrid_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return rrf_hybrid_topk(
        docs, queries_df, k_leg=20, k_out=3, jaccard_max_df=4
    )


@query(
    "q460_exact_substring_rewrite",
    _DUP_UNION
    + """
    , d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{re}') AS arr
      FROM corpus
    ), dd AS (
      SELECT doc_id, arr, CAST(len(arr) AS BIGINT) AS n_tok FROM d
    ), grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p,
             array_to_string(list_slice(arr, i, i + 7), ' ') AS gram
      FROM dd, LATERAL (SELECT unnest(range(1, n_tok - 8 + 2)) AS i) t
      WHERE n_tok >= 8
    ), gc AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ), occ AS (
      SELECT g.doc_id, g.p, g.gram,
             row_number() OVER (PARTITION BY g.gram
                                ORDER BY g.doc_id, g.p) AS rn
      FROM grams g JOIN gc USING (gram)
    ), dropped AS (
      SELECT DISTINCT doc_id, p FROM occ WHERE rn > 1
    ), covered AS (
      SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos
      FROM dropped, LATERAL (SELECT unnest(range(p, p + 8)) AS pos) t
    ), runs AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) = 1
                  THEN 0 ELSE 1 END AS new_run
      FROM covered
    ), spans AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tokens_dropped,
             CAST(SUM(new_run) AS INTEGER) AS spans_dropped
      FROM runs GROUP BY doc_id
    ), toks AS (
      SELECT dd.doc_id, CAST(i AS BIGINT) AS p, arr[i] AS tok
      FROM dd, LATERAL (SELECT unnest(range(1, n_tok + 1)) AS i) t
    ), kept AS (
      SELECT t.doc_id,
             COALESCE(string_agg(t.tok, ' ' ORDER BY t.p), '') AS kept_text
      FROM toks t LEFT JOIN covered c
        ON t.doc_id = c.doc_id AND t.p = c.pos
      WHERE c.doc_id IS NULL
      GROUP BY t.doc_id
    )
    SELECT dd.doc_id, dd.n_tok,
           COALESCE(k.kept_text, '') AS kept_text,
           COALESCE(s.tokens_dropped, 0) AS tokens_dropped,
           CAST(COALESCE(s.spans_dropped, 0) AS INTEGER) AS spans_dropped,
           CAST(length(array_to_string(dd.arr, ' ')) AS BIGINT) AS chars_in,
           CAST(length(COALESCE(k.kept_text, '')) AS BIGINT) AS chars_kept
    FROM dd
    LEFT JOIN spans s ON dd.doc_id = s.doc_id
    LEFT JOIN kept k ON dd.doc_id = k.doc_id
    """.format(re=TOKEN_RE),
)
def q460(spark, sf_dir):
    """Exact-substring dedup REWRITE (Lee et al. 2022 §4,
    `operators/dedup.exact_substring_rewrite`): q395 measured the
    duplicated mass; this emits the DEDUPLICATED CORPUS — maximal
    token spans covered by duplicated 8-gram windows are trimmed from
    every occurrence except the canonical one (per gram, the smallest
    (doc_id, position)), with exact token/char telemetry per doc.  On
    the dup-union corpus the +1M exact copies rewrite to empty (their
    canonical lives in the base doc) while base docs keep their text
    minus intra-corpus boilerplate — the oracle replays the span
    selection and the rewrite itself (positions → covered runs →
    order-preserving re-join) row for row."""
    from ..operators.dedup import exact_substring_rewrite

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return exact_substring_rewrite(corpus, w=8, min_count=2)


@query("q461_bm25_incremental_index", ORACLE["q394_bm25_retrieval"])
def q461(spark, sf_dir):
    """Incremental BM25 index maintenance (round 14 — the q459
    discipline applied to retrieval, `operators/retrieval.py:
    bm25_index_init/insert/bm25_topk_from_index`): the corpus arrives
    in three batches (doc_id % 3), each folded into the maintained
    index (postings/dl append-only, df merged over the batch
    vocabulary — O(batch + vocab) per fold, the corpus text is never
    re-read), and the query runs PURE INDEX JOINS.  tf/dl/df/N/avgdl
    are all integer sums, so batch accumulation commutes with the
    scoring arithmetic exactly — the oracle is q394's full-recompute
    SQL VERBATIM, and the maintained index must reproduce it bit for
    bit."""
    from ..operators.retrieval import (
        bm25_index_init,
        bm25_index_insert,
        bm25_topk_from_index,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    idx = bm25_index_init(spark)
    for m in (0, 1, 2):
        idx = bm25_index_insert(
            idx, docs.filter(F.col("doc_id") % 3 == m)
        )
    return bm25_topk_from_index(
        idx, queries_df, k=5, max_df_num=9, max_df_den=10
    )


@query("q465_bm25_store_index", ORACLE["q394_bm25_retrieval"])
def q465(spark, sf_dir):
    """STORED BM25 index maintenance (round 15 — the q461 semantics
    through bucketed tables, `operators/retrieval.bm25_store_*`,
    closing the round-14 `weak`): the corpus folds in three batches as
    APPENDS to token-/doc_id-bucketed tables — per-insert I/O is
    O(batch), nothing existing is rewritten (the DataFrame-state
    variant localCheckpointed the full corpus-sized union per batch) —
    and the query runs pure index joins that read the stored sides'
    bucketed scans exchange-free (plan-pinned in
    tests/test_retrieval.py).  Integer sums commute, so the oracle is
    q394's full-recompute SQL VERBATIM, bit for bit.  The result is
    eagerly checkpointed (queries×k rows) so the state tables can be
    dropped before returning."""
    from ..operators.retrieval import (
        bm25_store_init,
        bm25_store_insert,
        bm25_store_topk,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    prefix = "q465_state"
    tables = (f"{prefix}_postings", f"{prefix}_dl", f"{prefix}_df")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    bm25_store_init(spark, prefix, num_buckets=8)
    try:
        for m in (0, 1, 2):
            bm25_store_insert(
                spark, prefix, docs.filter(F.col("doc_id") % 3 == m)
            )
        return bm25_store_topk(
            spark, prefix, queries_df, k=5, max_df_num=9, max_df_den=10
        ).localCheckpoint(eager=True)
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@query(
    "q467_bm25_absolute_df_cap",
    """
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, UNNEST(regexp_extract_all(lower(text), '{re}')) AS u(t)
    ), postings AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs,
             (COUNT(*) * 1000) // COUNT(DISTINCT doc_id) AS am
      FROM tok
    ), df AS (
      SELECT token, COUNT(*) AS dfreq FROM postings GROUP BY token
    ), qterms AS (
      SELECT DISTINCT doc_id AS query_id, token FROM tok WHERE doc_id % 50 = 0
    ), term_scores AS (
      SELECT q.query_id, p.doc_id,
             (s.n_docs // d.dfreq)
             * ((22 * p.tf * s.am * 1000000)
                // (10 * p.tf * s.am + 3 * s.am + 9000 * l.dl)) AS term_score
      FROM qterms q
      JOIN df d ON q.token = d.token
      CROSS JOIN stats s
      JOIN postings p ON p.token = q.token
      JOIN dl l ON l.doc_id = p.doc_id
      WHERE d.dfreq * 10 <= s.n_docs * 9
        AND d.dfreq <= (s.n_docs * 4) // 5
        AND p.doc_id <> q.query_id
    ), scores AS (
      SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score
      FROM term_scores GROUP BY query_id, doc_id
    ), ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scores
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score
    FROM ranked WHERE rank <= 5
    """.format(re=TOKEN_RE),
)
def q467(spark, sf_dir):
    """BM25 with the ABSOLUTE document-frequency cap (round 15,
    `operators/retrieval.bm25_topk(max_df_abs=...)`): q394's workload
    with query terms additionally bounded at df <= 4·N/5 — the
    operational guard for boilerplate token families whose posting
    lists sit at a df far below any usable RATIO cap yet fan the
    retrieval join out by their full length (bm25_boilerplate_r14
    measured ~10 GB of spill through the 9/10 ratio cap from tokens at
    2 % df; on a real corpus the cap is set near the hot family's
    absolute df).  Values change vs q394 — the fixture corpus has a
    token at df 0.81N that the absolute cap prunes — so this is its
    own oracled contract, the q458/q195 precedent."""
    from ..operators.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    cap = docs.count() * 4 // 5
    return bm25_topk(
        docs, queries_df, k=5, max_df_num=9, max_df_den=10, max_df_abs=cap
    )


@query("q469_bm25_store_auto_compact", ORACLE["q394_bm25_retrieval"])
def q469(spark, sf_dir):
    """STORED BM25 index with the round-16 OPERATIONAL lifecycle:
    q465's three appends run with the replay guard armed
    (``assert_new=True`` — an O(batch) semi-join probe against the
    doc_id-bucketed dl table, exchange-free on the stored side) and
    the compaction policy live (``auto_compact_files=1`` — the second
    and third appends each trip a full compact, so serving always
    reads ONE sorted file per bucket and the SMJ never re-sorts the
    stored scan; the dedup store's ``auto_compact_depth`` discipline
    applied to the BM25 store, `operators/retrieval.bm25_store_insert`
    / `bm25_store_compact`).  Compaction is pure layout and integer
    sums commute, so the oracle stays q394's full-recompute SQL
    VERBATIM — the driver hash proves the policy cannot move a bit of
    the scores.  The per-insert stats records (file depth, compact
    decisions) are asserted inline: [False, True, True] for depth
    [1, 2, 2] under threshold 1."""
    from ..operators.retrieval import (
        bm25_store_init,
        bm25_store_insert,
        bm25_store_topk,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    prefix = "q469_state"
    tables = (f"{prefix}_postings", f"{prefix}_dl", f"{prefix}_df")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    bm25_store_init(spark, prefix, num_buckets=8)
    try:
        stats: list = []
        for m in (0, 1, 2):
            bm25_store_insert(
                spark, prefix, docs.filter(F.col("doc_id") % 3 == m),
                assert_new=True, stats=stats, auto_compact_files=1,
            )
        assert [s["compacted"] for s in stats] == [False, True, True], stats
        assert [s["file_depth"] for s in stats] == [1, 2, 2], stats
        return bm25_store_topk(
            spark, prefix, queries_df, k=5, max_df_num=9, max_df_den=10
        ).localCheckpoint(eager=True)
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
