"""Clustering / embedding-compression / corpus-prep query family
(q369–q372, q378–q382, q385–q386, q388–q389).

Round-9 additions to the LLM-training-data tier: distributed k-means
(``operators/clustering.py``) with maximin init, SemDeDup semantic
deduplication, int8 scalar quantization, binary-signature Hamming ANN,
IVF-PQ two-level ANN, matryoshka-truncation and LSH-recall evaluation
metrics, document chunking, T5-style contiguous + exact next-fit
sequence packing, WordPiece-style subword tokenization, and
quality-weighted rejection sampling.  The k-means oracles replay the full Lloyd loop UNROLLED in SQL
over the (vid, pos, val) long form — every iteration is exact integer /
decimal arithmetic on both sides, so the parity check covers the whole
training loop, not just the final projection.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import clustering
from ..functions.vectors import to_double
from ._common import _COS_EXPR, ORACLE, _dec, _t, query

_K = 8
_ITERS = 2

# (vid, pos, val) long form of a vector table, PQ-quantized (×1000 ints).
_LONGFORM = """
  idx AS (
    SELECT {id} AS vid, {vec} AS emb,
           UNNEST(range(1, len({vec}) + 1)) AS pos
    FROM {src}
  ),
  v AS (
    SELECT vid, pos,
           CAST(round(CAST(emb[pos] AS DOUBLE) * 1000) AS BIGINT) AS val
    FROM idx
  )"""


def _kmeans_ctes(k: int = _K, iters: int = _ITERS) -> str:
    """Unrolled Lloyd loop over the ``v`` long form: c0 = seeds, then
    ``iters`` × (assign → means), ending with centroid set c{iters}."""
    parts = [f"c0 AS (SELECT vid AS cell, pos, val FROM v WHERE vid < {k})"]
    for i in range(iters):
        parts.append(
            f"""a{i} AS (
        SELECT v.vid, c.cell, SUM((v.val - c.val) * (v.val - c.val)) AS d2
        FROM v JOIN c{i} c ON v.pos = c.pos
        GROUP BY v.vid, c.cell
      ),
      m{i} AS (
        SELECT vid, cell FROM (
          SELECT vid, cell,
                 row_number() OVER (PARTITION BY vid ORDER BY d2, cell) AS rk
          FROM a{i}) WHERE rk = 1
      ),
      c{i + 1} AS (
        SELECT m{i}.cell, v.pos,
               CAST(round(CAST(SUM(v.val) AS DECIMAL(28,6)) / COUNT(*)) AS BIGINT) AS val
        FROM m{i} JOIN v USING (vid)
        GROUP BY m{i}.cell, v.pos
      )"""
        )
    return ",\n  ".join(parts)


_FINAL_ASSIGN = f"""
  afin AS (
    SELECT v.vid, c.cell, SUM((v.val - c.val) * (v.val - c.val)) AS d2
    FROM v JOIN c{_ITERS} c ON v.pos = c.pos
    GROUP BY v.vid, c.cell
  ),
  fin AS (
    SELECT vid, cell, d2 FROM (
      SELECT vid, cell, d2,
             row_number() OVER (PARTITION BY vid ORDER BY d2, cell) AS rk
      FROM afin) WHERE rk = 1
  )"""


@query(
    "q369_kmeans_clusters",
    "WITH"
    + _LONGFORM.format(id="vec_id", vec="embedding", src="embeddings")
    + ",\n  "
    + _kmeans_ctes()
    + ","
    + _FINAL_ASSIGN
    + """
    SELECT vid AS vec_id, cell AS cluster, CAST(d2 AS BIGINT) AS d2 FROM fin
    """,
)
def q369(spark, sf_dir):
    """Distributed k-means (Lloyd) over the embedding corpus: 2 exact
    integer-arithmetic refinement passes from deterministic seeds
    (vec_id < 8), then a final assignment.  Spark side: assignment is a
    zero-shuffle projection (centroids fold in as ONE broadcast array
    row); refinement shuffles only k×dim partial-agg groups.  The oracle
    replays the identical loop unrolled in SQL."""
    emb = _t(spark, sf_dir, "embeddings")
    return clustering.kmeans_assignments(emb, k=_K, iters=_ITERS).select(
        F.col("vid").alias("vec_id"), "cluster", "d2"
    )


_SALTED = """
  corpus AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 5 = 0
  )"""


@query(
    "q370_semantic_dedup",
    "WITH"
    + _SALTED
    + ","
    + _LONGFORM.format(id="vec_id", vec="embedding", src="corpus")
    + ",\n  "
    + _kmeans_ctes()
    + ","
    + _FINAL_ASSIGN
    + """,
    tagged AS (
      SELECT fin.vid, fin.cell AS cluster, corpus.embedding
      FROM fin JOIN corpus ON fin.vid = corpus.vec_id
    ),
    dups AS (
      SELECT DISTINCT a.vid
      FROM tagged a JOIN tagged b USING (cluster)
      WHERE b.vid < a.vid
        AND {cos} >= 0.99
    )
    SELECT t.vid AS vec_id, t.cluster
    FROM tagged t ANTI JOIN dups d ON t.vid = d.vid
    """.format(cos=_COS_EXPR.format(a="a.embedding", b="b.embedding")),
)
def q370(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): k-means cluster the corpus, then drop
    every vector with a lower-id cosine near-duplicate (≥0.99, 6 dp)
    INSIDE its own cluster — the pair join is an equi-join on the
    cluster id, so candidates scale with cluster size, never corpus².
    Corpus salted with copies of every 5th vector so true duplicates
    exist; identical vectors land in identical clusters, and the salted
    (higher-id) copies are exactly what gets dropped."""
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    return clustering.semantic_dedup(corpus, k=_K, iters=_ITERS, tau=0.99)


@query(
    "q371_embedding_int8_quant",
    """
    WITH q AS (
      SELECT label, vec_id, embedding,
             list_reduce(list_transform(embedding,
                         x -> abs(CAST(x AS DOUBLE))),
                         (a, b) -> CASE WHEN a >= b THEN a ELSE b END) AS vscale
      FROM embeddings
    ), e AS (
      SELECT label, vec_id, embedding, vscale,
             UNNEST(range(1, len(embedding) + 1)) AS pos
      FROM q WHERE vscale > 0
    ), err AS (
      SELECT label,
             round(abs(CAST(embedding[pos] AS DOUBLE)
                   - round(CAST(embedding[pos] AS DOUBLE) / vscale * 127)
                     * vscale / 127), 9) AS ae
      FROM e
    )
    SELECT label,
           COUNT(*) AS n_comp,
           CAST(SUM(CAST(ae AS DECIMAL(20,10))) AS DOUBLE) AS sum_abs_err,
           MAX(ae) AS max_abs_err
    FROM err
    GROUP BY label
    """,
)
def q371(spark, sf_dir):
    """Int8 scalar quantization of the embedding corpus (per-vector
    scale = max |component|, symmetric round-to-nearest into [-127,127])
    and its exact reconstruction-error envelope per label — the 4×
    memory-compression step a 100 TB embedding store applies before
    ANN indexing.  Error totals are exact decimal sums of 9 dp-rounded
    per-component errors, so the hash is summation-order-proof."""
    emb = _t(spark, sf_dir, "embeddings")
    vec = to_double(F.col("embedding"))
    vscale = F.aggregate(
        F.transform(vec, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda a, b: F.when(a >= b, a).otherwise(b),
    )
    comp = (
        emb.select("label", vscale.alias("vscale"), F.posexplode(vec))
        .filter(F.col("vscale") > 0)
        .withColumn(
            "ae",
            F.round(
                F.abs(
                    F.col("col")
                    - F.round(F.col("col") / F.col("vscale") * 127)
                    * F.col("vscale")
                    / 127
                ),
                9,
            ),
        )
    )
    return comp.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_comp"),
        F.sum(F.col("ae").cast("decimal(20,10)")).cast("double").alias("sum_abs_err"),
        F.max("ae").alias("max_abs_err"),
    )


_SIG_SQL = """list_reduce(list_transform(embedding[{lo}:{hi}],
               x -> CASE WHEN CAST(x AS DOUBLE) >= 0
                         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
               (a, b) -> a * 2 + b)"""


@query(
    "q372_hamming_ann",
    """
    WITH sig AS (
      SELECT vec_id, embedding,
             {h1} AS h1, {h2} AS h2
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             bit_count(xor(q.h1, c.h1)) + bit_count(xor(q.h2, c.h2)) AS hamming
      FROM sig q JOIN sig c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    ), coarse AS (
      SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS crk
      FROM scored
    ), rerank AS (
      SELECT query_id, neighbor_id, hamming, {cos} AS cos_sim
      FROM coarse
      JOIN sig q ON q.vec_id = query_id
      JOIN sig c ON c.vec_id = neighbor_id
      WHERE crk <= 20
    )
    SELECT query_id, neighbor_id, hamming, cos_sim, rnk
    FROM (
      SELECT query_id, neighbor_id, hamming, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM rerank)
    WHERE rnk <= 5
    """.format(
        h1=_SIG_SQL.format(lo=1, hi=32),
        h2=_SIG_SQL.format(lo=33, hi=64),
        cos=_COS_EXPR.format(a="q.embedding", b="c.embedding"),
    ),
)
def q372(spark, sf_dir):
    """Binary (sign) quantization ANN: each 64-d float vector collapses
    to TWO bigints (16 B — a 16× index compression); coarse search is
    integer Hamming distance (xor + bit_count, whole-stage codegen),
    then the top-20 coarse candidates are reranked by exact cosine and
    the top-5 kept.  The standard two-stage recipe for ANN over a
    100 TB embedding store: the Hamming scan never touches floats, and
    the exact-cosine rerank only ever sees 20 candidates per query."""
    emb = _t(spark, sf_dir, "embeddings")

    def sig(lo: int):
        return F.aggregate(
            F.slice(to_double(F.col("embedding")), lo, 32),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc * 2
            + F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)),
        )

    s = emb.select(
        "vec_id", "embedding", sig(1).alias("h1"), sig(33).alias("h2")
    )
    q = s.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("h1").alias("qh1"),
        F.col("h2").alias("qh2"),
    )
    c = s.select(F.col("vec_id").alias("neighbor_id"), "h1", "h2")
    from ..operators.similarity import _cos, _with_norm

    # Coarse stage: signatures only — 2 bigints per side, never floats.
    coarse = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("qh1").bitwiseXOR(F.col("h1")))
            + F.bit_count(F.col("qh2").bitwiseXOR(F.col("h2"))),
        )
        .select("query_id", "neighbor_id", "hamming")
    )
    wc = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    cand = coarse.withColumn("crk", F.row_number().over(wc)).filter(
        F.col("crk") <= 20
    )
    # Rerank stage: exact cosine on the 20 survivors per query only.
    qv = _with_norm(
        emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "qvec",
        "qn",
    )
    nv = _with_norm(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nvec")
        ),
        "nvec",
        "nn",
    )
    rerank = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cos_sim", _cos("qvec", "nvec", "qn", "nn"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rerank.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "hamming", "cos_sim", "rnk")
    )


@query(
    "q378_document_chunking",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 7 = 2 AND length(trim(text)) > 0
    ), starts AS (
      SELECT doc_id, toks, len(toks) AS n_tok,
             UNNEST(range(0, CAST(ceil(GREATEST(len(toks) - 16, 1) / 48.0)
                                  AS BIGINT))) AS chunk_id
      FROM d
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(LEAST(64, n_tok - chunk_id * 48) AS BIGINT) AS n_chunk_tokens,
           toks[chunk_id * 48 + 1] AS first_tok,
           toks[LEAST(chunk_id * 48 + 64, n_tok)] AS last_tok
    FROM starts
    """,
)
def q378(spark, sf_dir):
    """Training-data document chunking: split each document into
    64-token windows with 16-token overlap (stride 48) — the standard
    context-window preparation step before tokenized packing.  Pure
    native plan: one split, one sequence-posexplode over the chunk
    starts (ceil((n-16)/48) chunks so every token lands in ≥1 chunk and
    short docs yield exactly one), slice bounds in exact integer
    arithmetic.  The oracle replicates with DuckDB list slicing."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 7 == 2) & (F.length(F.trim("text")) > 0))
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n_tok", F.size("toks"))
    )
    n_chunks = F.ceil(F.greatest(F.col("n_tok") - 16, F.lit(1)) / 48.0)
    chunks = docs.select(
        "doc_id",
        "toks",
        "n_tok",
        F.posexplode(F.sequence(F.lit(0), n_chunks.cast("bigint") - 1)).alias(
            "_p", "chunk_id"
        ),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.least(F.lit(64), F.col("n_tok") - F.col("chunk_id") * 48)
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.element_at("toks", (F.col("chunk_id") * 48 + 1).cast("int")).alias(
            "first_tok"
        ),
        F.element_at(
            "toks",
            F.least(F.col("chunk_id") * 48 + 64, F.col("n_tok")).cast("int"),
        ).alias("last_tok"),
    )


@query(
    "q379_sequence_packing",
    """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS n_tok,
             source
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
      FROM d
    ), b AS (
      SELECT source, doc_id, n_tok,
             CAST(cum_before // 2048 AS BIGINT) AS bin
      FROM c
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM b GROUP BY source, bin
    """,
)
def q379(spark, sf_dir):
    """Training-sequence packing: concatenate documents (per source, in
    doc_id order) into 2048-token context windows by contiguous fill —
    bin = floor(tokens_before / capacity), the deterministic packing a
    T5-style pipeline applies before example construction (documents
    that straddle a boundary belong to the bin their first token lands
    in; bins can therefore overflow by at most one document — the
    documented semantics).  One window cumsum per source, one
    aggregate; both shuffles key on source/(source, bin)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), " ")))
        .alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = docs.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / 2048).cast(
            "bigint"
        ),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# WordPiece-style demo vocab: multi-char subwords + full a-z coverage so
# greedy longest-match never dead-ends on the synthetic corpus
_WP_VOCAB = (
    ["the", "scan", "query", "tab", "le", "val", "ue", "str", "eam",
     "wind", "ow", "ord", "er", "merg", "batch", "col", "umn", "agg",
     "join", "sort", "part", "fast", "slow", "row", "key", "hash"]
    + [chr(c) for c in range(97, 123)]
)
_WP_VALUES = ",".join(f"('{v}')" for v in _WP_VOCAB)


def _wp_subtok_series(words: pd.Series) -> pd.Series:
    """Greedy longest-match subword count per word (module-level so the
    pandas_udf type hints resolve under `from __future__ annotations`);
    -1 marks untokenizable words, dropped by the caller's join."""
    vs = sorted(_WP_VOCAB, key=len, reverse=True)
    out = []
    for w in words:
        p, n = 0, 0
        while p < len(w):
            for v in vs:
                if w.startswith(v, p):
                    p += len(v)
                    n += 1
                    break
            else:
                n = -1
                break
        out.append(n)
    return pd.Series(out, dtype="int32")


@query(
    "q380_wordpiece_tokenize",
    """
    WITH RECURSIVE wsrc AS (
      SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS w
      FROM documents WHERE doc_id % 13 = 6 AND length(trim(text)) > 0
    ), dw AS (
      SELECT DISTINCT w FROM wsrc WHERE w <> ''
    ), vocab(v) AS (VALUES {values}),
    pos AS (
      SELECT w, UNNEST(range(1, length(w) + 1)) AS p FROM dw
    ), best AS (
      SELECT pos.w, pos.p, arg_max(v.v, length(v.v)) AS tok
      FROM pos JOIN vocab v ON substr(pos.w, pos.p, length(v.v)) = v.v
      GROUP BY pos.w, pos.p
    ),
    walk AS (
      SELECT w, 1 AS p, 0 AS n FROM dw
      UNION ALL
      SELECT walk.w, walk.p + length(b.tok), walk.n + 1
      FROM walk JOIN best b ON b.w = walk.w AND b.p = walk.p
      WHERE walk.p <= length(walk.w)
    ),
    tok AS (
      SELECT w, n AS n_tok FROM walk WHERE p = length(w) + 1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_subtokens,
           CAST(MAX(n_tok) AS BIGINT) AS max_word_tokens
    FROM wsrc JOIN tok ON wsrc.w = tok.w
    GROUP BY doc_id
    """.format(values=_WP_VALUES),
)
def q380(spark, sf_dir):
    """REAL subword tokenization (WordPiece-style greedy longest-match
    over a fixed vocabulary) — the token-counting step every training
    pipeline runs before packing/budgeting.  Scale shape: tokenize the
    DISTINCT words only (an Arrow-batched pandas UDF — tokenizer loops
    are the canonical vectorized-UDF use case), then re-attach counts
    with an equi-join; the corpus text itself never enters Python.
    The oracle RE-DERIVES the greedy walk as a recursive SQL CTE over
    a precomputed longest-prefix table — a genuine cross-implementation
    differential (Python loop vs SQL recursion share nothing)."""
    from pyspark.sql.functions import pandas_udf

    n_subtok = pandas_udf(_wp_subtok_series, "int")
    words = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 13 == 6) & (F.length(F.trim("text")) > 0))
        .select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    toks = (
        words.select("w")
        .distinct()
        .withColumn("n_tok", n_subtok(F.col("w")))
        .filter(F.col("n_tok") >= 0)
    )
    return (
        words.join(F.broadcast(toks), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_subtokens"),
            F.max("n_tok").cast("bigint").alias("max_word_tokens"),
        )
    )


def _topk_cte(vec_expr: str, alias: str) -> str:
    """DuckDB CTE: exact top-10 cosine neighbors per query (vec_id<10)
    over ``vec_expr`` of the embedding — the q41 ranking contract
    (6 dp cosine desc, neighbor_id tiebreak)."""
    cos = _COS_EXPR.format(a="qv", b="nv")
    return f"""{alias} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {cos.format()} DESC, c.neighbor_id) AS rnk
        FROM (SELECT vec_id AS query_id, {vec_expr} AS qv
              FROM embeddings WHERE vec_id < 10) q
        JOIN (SELECT vec_id AS neighbor_id, {vec_expr} AS nv
              FROM embeddings) c
          ON q.query_id <> c.neighbor_id
      ) WHERE rnk <= 10
    )"""


@query(
    "q381_matryoshka_recall",
    "WITH "
    + _topk_cte("embedding", "full_k")
    + ",\n"
    + _topk_cte("embedding[1:16]", "trunc_k")
    + """
    SELECT f.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap
    FROM full_k f
    LEFT JOIN trunc_k t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def q381(spark, sf_dir):
    """Matryoshka-style dimension-truncation evaluation: overlap@10
    between exact cosine top-10 on the FULL 64-d embedding and on its
    first 16 dimensions — the measurement that decides whether a 4×
    cheaper truncated index is good enough before committing a 100 TB
    re-embed.  Both rankings share the tier's deterministic contract
    (6 dp cosine, neighbor tiebreak), so overlap counts are exact."""
    from ..operators.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    pred = F.col("query_id") < 10
    full_k = cosine_topk_bruteforce(emb, k=10, query_pred=pred).select(
        "query_id", "neighbor_id"
    )
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    trunc_k = cosine_topk_bruteforce(trunc, k=10, query_pred=pred).select(
        F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn")
    )
    return (
        full_k.join(
            trunc_k,
            (F.col("query_id") == F.col("tq"))
            & (F.col("neighbor_id") == F.col("tn")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("tn").alias("n_overlap"))
    )


def _register_q382():
    """q382's oracle composes the FULL q38 (exact Jaccard) and q39
    (MinHash-LSH) oracle statements as subqueries, so the recall metric
    is measured against the same bit-exact pipelines the driver already
    verifies individually."""
    from ._common import ORACLE

    exact_sql = ORACLE["q38_jaccard_pairs"]
    cand_sql = ORACLE["q39_minhash_lsh"]
    oracle = f"""
    WITH exact AS (SELECT doc_a, doc_b FROM ({exact_sql})),
         cand  AS (SELECT doc_a, doc_b FROM ({cand_sql})),
         hit   AS (SELECT doc_a, doc_b FROM exact
                   INTERSECT SELECT doc_a, doc_b FROM cand)
    SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand,
           CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
           CAST((SELECT COUNT(*) FROM hit) * 1000000
                // (SELECT COUNT(*) FROM exact) AS BIGINT) AS recall_ppm,
           CAST((SELECT COUNT(*) FROM hit) * 1000000
                // (SELECT COUNT(*) FROM cand) AS BIGINT) AS precision_ppm
    """

    @query("q382_lsh_recall_eval", oracle)
    def q382(spark, sf_dir):
        """Measure, don't guess: recall/precision of the MinHash-LSH
        near-dup pipeline (q39) against exact 3-gram Jaccard ground
        truth (q38) on the salted corpus, in exact integer ppm.  The
        production decision metric for banding parameters — at 100 TB
        you tune (bands, rows) on a sample with THIS query before
        committing the cluster-wide run.  One row out; the three counts
        fold together through 1×1 aggregate joins."""
        from ..operators import dedup as _dd

        d = _t(spark, sf_dir, "documents")
        corpus = d.select("doc_id", "text").unionByName(
            d.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        exact = _dd.jaccard_pairs(
            corpus, "text", "doc_id", n=3, threshold=0.5
        ).select("doc_a", "doc_b")
        cand = _dd.minhash_jaccard_estimate(
            corpus, "text", "doc_id", threshold=0.5
        ).select("doc_a", "doc_b")
        hit = exact.join(cand, ["doc_a", "doc_b"])
        ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
        nc = cand.agg(F.count(F.lit(1)).alias("n_cand"))
        nh = hit.agg(F.count(F.lit(1)).alias("n_hit"))
        return (
            ne.crossJoin(nc)
            .crossJoin(nh)
            .select(
                "n_exact",
                "n_cand",
                "n_hit",
                F.floor(F.col("n_hit") * 1000000 / F.col("n_exact"))
                .cast("bigint")
                .alias("recall_ppm"),
                F.floor(F.col("n_hit") * 1000000 / F.col("n_cand"))
                .cast("bigint")
                .alias("precision_ppm"),
            )
        )


_register_q382()


def _next_fit_pdf(pdf):
    """Sequential next-fit packing of one source's docs (doc_id order):
    a doc that would overflow the 256-token capacity starts a new bin
    (an oversized doc occupies a bin alone).  The per-group stateful
    recurrence a window function can't express — exactly what
    applyInPandas exists for."""
    pdf = pdf.sort_values("doc_id")
    bins, fill, cur = [], 0, -1
    for n in pdf["n_tok"]:
        n = int(n)
        if cur < 0 or fill + n > 256:
            cur += 1
            fill = n
        else:
            fill += n
        bins.append(cur)
    pdf = pdf.assign(bin=bins)
    return pdf


@query(
    "q385_next_fit_packing",
    """
    WITH RECURSIVE d AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS n_tok,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ), walk AS (
      SELECT source, rn, doc_id, n_tok, 0 AS bin, n_tok AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.rn, d.doc_id, d.n_tok,
             CASE WHEN w.fill + d.n_tok <= 256 THEN w.bin ELSE w.bin + 1 END,
             CASE WHEN w.fill + d.n_tok <= 256 THEN w.fill + d.n_tok
                  ELSE d.n_tok END
      FROM walk w JOIN d ON d.source = w.source AND d.rn = w.rn + 1
    )
    SELECT source, CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM walk GROUP BY source, bin
    """,
)
def q385(spark, sf_dir):
    """EXACT next-fit sequence packing (the no-overflow contrast to
    q379's contiguous fill): per source in doc_id order, a document
    that would push the 256-token bin over capacity STARTS A NEW BIN —
    a prefix-dependent recurrence no window function expresses, so the
    Spark side is a per-source ``applyInPandas`` kernel (state = one
    (bin, fill) pair per group, Arrow-batched) and the oracle replays
    the recurrence as a recursive SQL CTE — independent implementations
    of the same packing automaton."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), " ")))
        .alias("n_tok"),
    )
    packed = docs.groupBy("source").applyInPandas(
        _next_fit_pdf, "doc_id long, source string, n_tok long, bin long"
    )
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_MAXIMIN_K = 6


def _maximin_oracle(k: int = _MAXIMIN_K) -> str:
    parts = [
        "WITH" + _LONGFORM.format(id="vec_id", vec="embedding", src="embeddings"),
        """,
  vd AS (SELECT DISTINCT vid FROM v),
  p0 AS (SELECT MIN(vid) AS vid FROM vd),
  ch0 AS (SELECT vid FROM p0)""",
    ]
    for i in range(1, k):
        parts.append(
            f""",
  dd{i} AS (
    SELECT pair.vid, MIN(pair.d2) AS mind
    FROM (
      SELECT a.vid, ch.vid AS cvid,
             SUM((a.val - b.val) * (a.val - b.val)) AS d2
      FROM v a
      JOIN v b ON a.pos = b.pos
      JOIN ch{i - 1} ch ON b.vid = ch.vid
      GROUP BY a.vid, ch.vid
    ) pair
    GROUP BY pair.vid
  ),
  p{i} AS (
    SELECT vid, mind FROM dd{i}
    WHERE vid NOT IN (SELECT vid FROM ch{i - 1})
    ORDER BY mind DESC, vid LIMIT 1
  ),
  ch{i} AS (SELECT vid FROM ch{i - 1} UNION ALL SELECT vid FROM p{i})"""
        )
    finals = [
        """
    SELECT 0 AS pick_order, (SELECT vid FROM p0) AS vec_id,
           CAST(0 AS BIGINT) AS min_d2"""
    ]
    for i in range(1, k):
        finals.append(
            f"""
    SELECT {i} AS pick_order, vid AS vec_id, CAST(mind AS BIGINT) AS min_d2
    FROM p{i}"""
        )
    return "".join(parts) + "\n    UNION ALL".join(finals)


@query("q386_kmeans_maximin_init", _maximin_oracle())
def q386(spark, sf_dir):
    """Deterministic furthest-point (maximin) k-means initialization:
    seed with the minimum id, then k−1 rounds of 'pick the point whose
    nearest chosen seed is furthest' (exact integer d2, lower-vid
    tiebreak) — the spread-guaranteeing init that protects Lloyd from
    the degenerate first-k seeding on clustered data.  Each round is a
    projection-only corpus scan (the q369 broadcast-argmin shape)
    ending in TakeOrdered(1); the oracle unrolls all k−1 rounds in SQL.
    Output: (pick_order, vec_id, min_d2) — the maximin distances
    themselves, so the pick SEQUENCE is value-verified, not just the
    final set."""
    emb = _t(spark, sf_dir, "embeddings")
    return clustering.maximin_seeds(emb, k=_MAXIMIN_K).select(
        "pick_order", F.col("vid").alias("vec_id"), "min_d2"
    )


@query(
    "q388_quality_rejection_sampling",
    """
    WITH d AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END AS n_tok,
             len(list_filter(string_split(trim(text), ' '),
                             w -> w = 'the' OR w = 'a')) AS n_stop
      FROM documents
    ), q AS (
      SELECT doc_id, source, n_tok,
             LEAST(1000000,
                   3000 * LEAST(n_tok, 100)
                   + CASE WHEN n_tok = 0 THEN 0
                          ELSE LEAST(700000, (n_stop * 3500000) // n_tok)
                     END) AS q_ppm,
             CAST('0x' || substr(md5('qrs' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 1000000 AS draw
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(draw < q_ppm) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN draw < q_ppm THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(SUM(CASE WHEN draw < q_ppm THEN q_ppm ELSE 0 END) AS BIGINT)
             AS kept_q_ppm_sum
    FROM q GROUP BY source
    """,
)
def q388(spark, sf_dir):
    """Quality-weighted rejection sampling (the DCLM-style soft filter):
    each document is kept with probability q_ppm/1e6 where q_ppm is an
    EXACT-integer quality score (length component + stopword-ratio
    component, pure integer arithmetic — no float drift), and the
    'random' draw is the portable md5-derived hash of the doc id — so
    the sample is deterministic, reproducible across engines, and
    re-runnable at 100 TB with byte-identical membership.  Reports the
    kept mass per source."""
    from ..operators.dedup import portable_hash60

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), " ")))
        .alias("n_tok"),
        F.size(
            F.filter(
                F.split(F.trim("text"), " "),
                lambda w: (w == "the") | (w == "a"),
            )
        ).alias("n_stop"),
    )
    q = d.select(
        "source",
        "n_tok",
        F.least(
            F.lit(1000000),
            3000 * F.least(F.col("n_tok"), F.lit(100))
            + F.when(F.col("n_tok") == 0, F.lit(0)).otherwise(
                F.least(
                    F.lit(700000),
                    F.expr("(n_stop * 3500000) DIV n_tok"),
                )
            ),
        ).alias("q_ppm"),
        (
            portable_hash60(F.concat(F.lit("qrs"), F.col("doc_id").cast("string")))
            % 1000000
        ).alias("draw"),
    )
    kept = F.col("draw") < F.col("q_ppm")
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(kept).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.sum(F.when(kept, F.col("q_ppm")).otherwise(0))
        .cast("bigint")
        .alias("kept_q_ppm_sum"),
    )


def q389_corpus(spark, sf_dir):
    """The q389 benchmark corpus: the embeddings table plus 10 planted
    near-duplicates per query vector (component j bumped by j/1000).
    Shared by the q389 oracle query and bench.py's build/scan split —
    one definition so the two can never drift."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    planted = (
        base.filter(F.col("vec_id") % 50 == 0)
        .select("vec_id", "embedding", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("j"))
        .select(
            (F.lit(1000000) + F.col("vec_id") * 100 + F.col("j")).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    i == (F.col("vec_id") + F.col("j")) % 64,
                    x.cast("double") + F.col("j") * 0.001,
                ).otherwise(x.cast("double")),
            ).alias("embedding"),
        )
    )
    return base.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    ).unionByName(planted)



@query(
    "q389_ivfpq_ann",
    """
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), planted AS (
      SELECT 1000000 + b.vec_id * 100 + t.j AS vec_id,
             list_transform(range(1, 65),
               i -> b.emb[i] + CASE WHEN i = ((b.vec_id + t.j) % 64) + 1
                                    THEN t.j * 0.001 ELSE 0 END) AS emb
      FROM base b, LATERAL (SELECT unnest(range(1, 11)) AS j) t
      WHERE b.vec_id % 50 = 0
    ), corpus AS (
      SELECT vec_id, emb FROM base
      UNION ALL SELECT vec_id, emb FROM planted
    ), ql AS (
      SELECT vec_id,
             list_transform(emb, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
      FROM corpus
    ), pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qv[i] - c.qv[i]) * (q.qv[i] - c.qv[i])))
               AS BIGINT) AS d2
      FROM ql q JOIN ql c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000000
    ), ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2, neighbor_id) AS rk
      FROM pairs
    )
    SELECT query_id,
           string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rk)
             AS exact_top10,
           TRUE AS recall_ok
    FROM ranked WHERE rk <= 10 GROUP BY query_id
    """,
)
def q389(spark, sf_dir):
    """IVF-PQ — the two-level FAISS architecture composed from verified
    pieces (`similarity.ivfpq_topk`): k-means coarse quantizer →
    residual product quantization → nprobe cell scan over the 16×-
    compressed codes → ADC → exact rerank.  Recall is made MEANINGFUL
    by planting 10 perturbed near-duplicates per query (component j
    bumped by j/1000 — quantized distances 1²..10², far below any
    random pair), so the exact top-10 IS the planted set and a working
    index must route query and plants to the same cell and rank them
    through the residual codes.  Output: the exact top-10 (oracle
    re-derives verbatim) + a recall boolean pinned at ≥ 7/10."""
    from ..operators.similarity import ivfpq_topk

    corpus = q389_corpus(spark, sf_dir)

    qpred = (F.col("vid") % 50 == 0) & (F.col("vid") < 1000000)
    approx = ivfpq_topk(corpus, k=10, query_pred=qpred).groupBy("query_id").agg(
        F.collect_set("neighbor_id").alias("pq_ids")
    )

    from ..operators.clustering import quantize_vectors, _d2

    v = quantize_vectors(corpus)
    q = v.filter((F.col("vid") % 50 == 0) & (F.col("vid") < 1000000)).select(
        F.col("vid").alias("query_id"), F.col("qv").alias("qx")
    )
    c = v.select(F.col("vid").alias("neighbor_id"), F.col("qv").alias("nx"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("d2", _d2(F.col("qx"), F.col("nx")))
    )
    we = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact10 = (
        scored.withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= 10)
        .groupBy("query_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "neighbor_id"))),
                    lambda s: s["neighbor_id"].cast("string"),
                ),
            ).alias("exact_top10"),
            F.collect_set("neighbor_id").alias("exact_ids"),
        )
    )
    return exact10.join(approx, "query_id").select(
        "query_id",
        "exact_top10",
        (F.size(F.array_intersect("exact_ids", "pq_ids")) >= 7).alias("recall_ok"),
    )


# Poisson(1) CDF at 1e9 fixed-point: P(X<=k)*1e9 floored, k = 0..7
# (50-digit Decimal derivation; tail mass beyond 7 maps to weight 8).
_POIS1_CDF_1E9 = (367879441, 735758882, 919698602, 981011843,
                  996340153, 999405815, 999916758, 999989750)


def _pois1_case(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS1_CDF_1E9)
    )
    return f"CASE {arms} ELSE 8 END"


@query(
    "q425_poisson_bootstrap_ci",
    f"""
    WITH ev AS (
      SELECT event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), x AS (
      SELECT ev.cents, r.b,
             {_pois1_case(
                 "CAST('0x' || substr(md5('pb' || CAST(ev.event_id AS VARCHAR)"
                 " || '_' || CAST(r.b AS VARCHAR)), 1, 15) AS BIGINT)"
                 " % 1000000000")} AS w
      FROM ev, (SELECT unnest(range(0, 64)) AS b) r
    ), rep AS (
      SELECT b, SUM(w * cents) // SUM(w) AS mean_cents
      FROM x GROUP BY b
    ), ranked AS (
      SELECT mean_cents, row_number() OVER (ORDER BY mean_cents, b) AS rk
      FROM rep
    )
    SELECT (SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) FROM ev)
             AS mean_cents,
           (SELECT CAST(mean_cents AS BIGINT) FROM ranked WHERE rk = 2)
             AS ci_lo_cents,
           (SELECT CAST(mean_cents AS BIGINT) FROM ranked WHERE rk = 63)
             AS ci_hi_cents,
           CAST(64 AS BIGINT) AS n_replicates
    """,
)
def q425(spark, sf_dir):
    """Poisson bootstrap CI for the mean event value — THE bootstrap
    that survives 100 TB: instead of materializing B resamples of n
    rows (index joins, n*B shuffle mass), every row draws a
    Poisson(1) replication weight per replicate from a portable
    md5 hash (fixed-point inverse-CDF, the 1e9-scaled constants above
    — no float, no RNG state), so 64 replicates cost ONE pass and one
    (replicate)-keyed aggregation.  Replicate means in exact floor
    cents; the 95% CI is the 2nd/63rd order statistic, tie-broken by
    replicate id; the oracle replays the identical arithmetic."""
    from ..operators.dedup import portable_hash60

    ev = _t(spark, sf_dir, "events").select(
        "event_id", (_dec("value") * 100).cast("bigint").alias("cents")
    )
    x = ev.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
    ).withColumn(
        "u",
        portable_hash60(
            F.concat(
                F.lit("pb"),
                F.col("event_id").cast("string"),
                F.lit("_"),
                F.col("b").cast("string"),
            )
        )
        % 1000000000,
    )
    # inverse-CDF weight via the shared fixed-point thresholds
    w = F.lit(8)
    for k in range(len(_POIS1_CDF_1E9) - 1, -1, -1):
        w = F.when(F.col("u") < _POIS1_CDF_1E9[k], F.lit(k)).otherwise(w)
    rep = (
        x.withColumn("w", w)
        .groupBy("b")
        .agg(F.expr("SUM(w * cents) DIV SUM(w)").alias("mean_cents"))
    )
    rk = Window.orderBy("mean_cents", "b")
    ranked = rep.withColumn("rk", F.row_number().over(rk))
    lo = ranked.filter(F.col("rk") == 2).select(
        F.col("mean_cents").cast("bigint").alias("ci_lo_cents")
    )
    hi = ranked.filter(F.col("rk") == 63).select(
        F.col("mean_cents").cast("bigint").alias("ci_hi_cents")
    )
    point = ev.agg(
        F.expr("SUM(cents) DIV COUNT(*)").cast("bigint").alias("mean_cents")
    )
    return (
        point.crossJoin(lo)
        .crossJoin(hi)
        .withColumn("n_replicates", F.lit(64).cast("bigint"))
    )


@query(
    "q434_sq8_ann",
    """
    WITH ql AS (
      SELECT vec_id AS vid,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ), sq AS (
      SELECT vid, qv,
             list_min(qv) AS mn, list_max(qv) AS mx,
             CASE WHEN list_max(qv) > list_min(qv)
                  THEN list_transform(qv,
                    x -> (x - list_min(qv)) * 255
                         // (list_max(qv) - list_min(qv)))
                  ELSE list_transform(qv, x -> CAST(0 AS BIGINT)) END
               AS codes
      FROM ql
    ), deq AS (
      SELECT vid, qv, mn, mx,
             list_transform(codes, c -> mn + (c * (mx - mn)) // 255) AS dq
      FROM sq
    ), scored AS (
      SELECT q.vid AS query_id, c.vid AS neighbor_id,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> q.qv[i] * c.dq[i])) AS BIGINT) AS adc,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> q.qv[i] * c.qv[i])) AS BIGINT) AS exact
      FROM (SELECT * FROM deq WHERE vid % 29 = 0) q
      JOIN deq c ON q.vid <> c.vid
    ), ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc DESC, neighbor_id) AS rk_adc,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY exact DESC, neighbor_id) AS rk_ex
      FROM scored
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN rk_adc <= 10 AND rk_ex <= 10
                    THEN 1 ELSE 0 END) AS BIGINT) AS recall10,
           CAST(MIN(CASE WHEN rk_adc = 1 THEN neighbor_id END)
                AS BIGINT) AS adc_top1,
           CAST(MIN(CASE WHEN rk_ex = 1 THEN neighbor_id END)
                AS BIGINT) AS exact_top1
    FROM ranked
    GROUP BY query_id ORDER BY query_id
    """,
)
def q434(spark, sf_dir):
    """SQ8 scalar-quantized ANN with asymmetric distance (the FAISS
    ``IndexScalarQuantizer`` layout): vectors store per-vector (mn, mx)
    + 8-bit codes (~8× less scan traffic than raw doubles); queries
    stay unquantized and score against the integer dequantization —
    classic ADC.  Both the ADC and the exact ranking are computed in
    ONE corpus pass (each pair projected to both dot products), over
    the round(x*1000) integer grid, so every score is an exact bigint
    and rankings are engine-independent (ties broken by neighbor_id).
    Output per query: |ADC top-10 ∩ exact top-10| (recall@10) and both
    top-1 ids.  Scale shape: queries broadcast, codes stream through a
    single nested-loop scorer, the two row_number windows key on
    query_id — corpus never shuffles."""
    from ..operators.clustering import quantize_vectors
    from ..operators.similarity import sq8_dequantize, sq8_quantize

    emb = _t(spark, sf_dir, "embeddings")
    v = quantize_vectors(emb)  # (vid, qv) integer grid
    # quantization is row-local: carry qv through instead of joining
    # the corpus back onto itself (plan-pinned single scan, no join)
    sq = sq8_quantize(v, extra_cols=("qv",))
    deq = sq.select(
        "vid",
        "qv",
        sq8_dequantize("codes", "mn", "mx").alias("dq"),
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    q = deq.filter(F.col("vid") % 29 == 0).select(
        F.col("vid").alias("query_id"), F.col("qv").alias("q_qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(deq.select(F.col("vid").alias("neighbor_id"), "qv", "dq"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("q_qv"), F.col("dq")).alias("adc"),
            _dot(F.col("q_qv"), F.col("qv")).alias("exact"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("exact").desc(), F.col("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wa).alias("rk_adc"),
        F.row_number().over(we).alias("rk_ex"),
    )
    # top-1s aggregate over ALL ranked rows — filtering to the top-10
    # intersection first would NULL out a top-1 that the other ranking
    # missed, which is exactly the quantization-error case the metric
    # must surface
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sum(
                F.when((F.col("rk_adc") <= 10) & (F.col("rk_ex") <= 10), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("recall10"),
            F.min(F.when(F.col("rk_adc") == 1, F.col("neighbor_id")))
            .cast("bigint")
            .alias("adc_top1"),
            F.min(F.when(F.col("rk_ex") == 1, F.col("neighbor_id")))
            .cast("bigint")
            .alias("exact_top1"),
        )
        .orderBy("query_id")
    )


@query(
    "q454_dsir_importance",
    """
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS arr
      FROM documents
    ), g AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 4096 AS b
      FROM (
        SELECT doc_id, unnest(arr) AS t FROM w
        UNION ALL
        SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS t
        FROM w, LATERAL (SELECT unnest(range(1, len(arr))) AS i) x
      )
    ), tgt AS (
      SELECT g.b, COUNT(*) AS c FROM g
      JOIN w ON w.doc_id = g.doc_id
      WHERE w.lang = 'en' AND g.doc_id % 5 = 0
      GROUP BY g.b
    ), src AS (
      SELECT b, COUNT(*) AS c FROM g GROUP BY b
    ), tots AS (
      SELECT (SELECT COALESCE(SUM(c), 0) FROM tgt) AS ct_tot,
             (SELECT SUM(c) FROM src) AS cs_tot
    ), terms AS (
      SELECT g.doc_id,
             CAST(round(
               ln((COALESCE(t.c, 0) + 1.0) / (tots.ct_tot + 4096))
               - ln((s.c + 1.0) / (tots.cs_tot + 4096)), 9)
               AS DECIMAL(20,9)) AS term
      FROM g
      JOIN src s ON s.b = g.b
      LEFT JOIN tgt t ON t.b = g.b
      CROSS JOIN tots
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           round(CAST(SUM(term) AS DOUBLE), 6) AS score,
           (round(CAST(SUM(term) AS DOUBLE), 6)
              > -0.5 * COUNT(*)) AS selected
    FROM terms GROUP BY doc_id ORDER BY doc_id
    """,
)
def q454(spark, sf_dir):
    """DSIR-style importance scoring for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): hashed-n-gram (unigram + bigram, 4 096 buckets)
    log-likelihood ratio of a curated TARGET sample (here: lang='en'
    docs with doc_id%5==0) against the RAW pool, per document —
    positive scores mark target-like documents, the resampling weight
    a 100 TB pretraining pipeline selects with.

    Scale + determinism shape: bucket ids are portable_hash60 % 4096
    computed IN THE PROJECTION (md5-based so DuckDB replays them
    byte-identically); documents explode to (doc_id, bucket-int) — no
    text in any exchange; the two bucket-count tables are ≤ 4 096 rows
    each and BROADCAST to the scoring join; per-term log ratios round
    to 9 dp and sum as exact DECIMAL (the q371 discipline), so the
    per-doc score is summation-order-proof — no ordered fold needed.
    Laplace +1 smoothing over B=4096 buckets keeps unseen-in-target
    buckets finite."""
    from ..operators.dedup import portable_hash60

    B = 4096
    docs = _t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_w = F.size(words)
    uni = F.transform(words, lambda w: F.pmod(portable_hash60(w), F.lit(B)))
    bi = F.zip_with(
        F.slice(words, 1, F.greatest(n_w - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n_w - 1, F.lit(0))),
        lambda a, b: F.pmod(
            portable_hash60(F.concat_ws(" ", a, b)), F.lit(B)
        ),
    )
    g = docs.select(
        "doc_id", "lang", F.explode(F.concat(uni, bi)).alias("b")
    )
    # ONE conditional aggregate over g computes both bucket-count tables
    # (round 17): the old src-aggregate + tgt-aggregate + left-join form
    # cost two full passes over the hashed-gram explode, and the `tots`
    # scalar subtree re-ran both again — Catalyst does not CSE across
    # broadcast boundaries, so the "before" plan scanned + re-hashed the
    # corpus FIVE times (plans/r17/q454_dsir_importance_before.txt: 5
    # parquet scans).  `ct` as a conditional sum equals the left-join +
    # na.fill(0) count exactly (tgt's support ⊆ src's); the ≤4096-row
    # stats table is checkpointed so `tots` and the scoring broadcast
    # re-read it instead of re-running the explode.  g is now computed
    # exactly twice (once here, once in the scoring join) — the hashing
    # projection is cheaper to recompute than a corpus-scale
    # (doc_id, b) spill would be to materialize.
    stats = (
        g.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cs"),
            F.sum(
                F.when(
                    (F.col("lang") == "en") & (F.col("doc_id") % 5 == 0),
                    1,
                ).otherwise(0)
            ).alias("ct"),
        )
        .localCheckpoint(eager=True)
    )
    tots = stats.agg(
        F.sum("ct").alias("ct_tot"), F.sum("cs").alias("cs_tot")
    )
    term = F.round(
        F.log((F.col("ct") + 1.0) / (F.col("ct_tot") + B))
        - F.log((F.col("cs") + 1.0) / (F.col("cs_tot") + B)),
        9,
    ).cast("decimal(20,9)")
    scored = (
        g.select("doc_id", "b")
        .join(F.broadcast(stats), "b")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(term).alias("score_dec"),
        )
    )
    score = F.round(F.col("score_dec").cast("double"), 6)
    return scored.select(
        "doc_id",
        "n_grams",
        score.alias("score"),
        # per-gram LLR gate: mean log-ratio above -0.5 nat — the batch
        # analogue of DSIR's resampling weight cut (with B=4096 Laplace
        # mass over a small target, absolute scores sit well below 0,
        # so a per-gram threshold is the meaningful separator)
        (score > -0.5 * F.col("n_grams")).alias("selected"),
    ).orderBy("doc_id")


@query("q464_ivfpq_incremental_insert", ORACLE["q389_ivfpq_ann"])
def q464(spark, sf_dir):
    """Incremental IVF-PQ maintenance (round 14 — the trilogy's ANN
    leg, `similarity.ivfpq_insert`): quantizers train on the first
    third of the q389 corpus (vec_id % 3 == 0), the other two thirds
    fold in as batches with FROZEN centroids/codebooks (FAISS's
    train-then-add posture; the maintained (v, codes) frames are
    unit-pinned bit-identical to a one-shot encode against the same
    quantizers), and the scan runs q389's query workload against the
    maintained index.  Oracle = q389's exact-top-10 SQL verbatim; the
    planted near-duplicate recall stays 10/10 at sf0.01 AND sf0.1
    under third-corpus training (measured before pinning), so the
    ≥ 7/10 recall boolean holds with margin."""
    from ..operators.clustering import _d2, quantize_vectors
    from ..operators.similarity import ivfpq_build, ivfpq_insert, ivfpq_scan

    corpus = q389_corpus(spark, sf_dir).localCheckpoint(eager=True)
    idx = ivfpq_build(corpus.filter(F.col("vec_id") % 3 == 0))
    for m in (1, 2):
        idx = ivfpq_insert(idx, corpus.filter(F.col("vec_id") % 3 == m))
    qpred = (F.col("vid") % 50 == 0) & (F.col("vid") < 1000000)
    approx = ivfpq_scan(idx, k=10, query_pred=qpred).groupBy(
        "query_id"
    ).agg(F.collect_set("neighbor_id").alias("pq_ids"))

    v = quantize_vectors(corpus)
    q = v.filter(qpred).select(
        F.col("vid").alias("query_id"), F.col("qv").alias("qx")
    )
    c = v.select(F.col("vid").alias("neighbor_id"), F.col("qv").alias("nx"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("d2", _d2(F.col("qx"), F.col("nx")))
    )
    we = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact10 = (
        scored.withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= 10)
        .groupBy("query_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rk", "neighbor_id"))
                    ),
                    lambda s: s["neighbor_id"].cast("string"),
                ),
            ).alias("exact_top10"),
            F.collect_set("neighbor_id").alias("exact_ids"),
        )
    )
    return exact10.join(approx, "query_id").select(
        "query_id",
        "exact_top10",
        (F.size(F.array_intersect("exact_ids", "pq_ids")) >= 7).alias(
            "recall_ok"
        ),
    )


@query("q466_ivfpq_store_index", ORACLE["q389_ivfpq_ann"])
def q466(spark, sf_dir):
    """STORED IVF-PQ index maintenance (round 15 — q464's semantics
    through tables, `similarity.ivfpq_store_*`, closing the round-14
    `weak`): quantizers train once on the first third of the q389
    corpus and persist (cent/books tiny, written at init); the other
    two thirds fold in as APPENDS to the vid-bucketed v table and the
    cluster-partitioned codes table — per-insert I/O is O(batch), no
    corpus-sized rewrite (the DataFrame-state variant localCheckpointed
    the full union per batch).  The scan runs q389's query workload
    against the stored index; encode results are unit-pinned
    bit-identical to the DataFrame path, so the oracle is q389's
    exact-top-10 SQL verbatim with the same ≥ 7/10 recall boolean.
    The output joins are eagerly checkpointed (queries×k rows) so the
    state tables can be dropped before returning."""
    from ..operators.clustering import _d2, quantize_vectors
    from ..operators.similarity import (
        ivfpq_scan,
        ivfpq_store_index,
        ivfpq_store_init,
        ivfpq_store_insert,
    )

    corpus = q389_corpus(spark, sf_dir).localCheckpoint(eager=True)
    prefix = "q466_state"
    tables = (f"{prefix}_v", f"{prefix}_codes", f"{prefix}_cent",
              f"{prefix}_books")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    ivfpq_store_init(
        spark, prefix, corpus.filter(F.col("vec_id") % 3 == 0)
    )
    try:
        for m in (1, 2):
            ivfpq_store_insert(
                spark, prefix, corpus.filter(F.col("vec_id") % 3 == m)
            )
        qpred = (F.col("vid") % 50 == 0) & (F.col("vid") < 1000000)
        approx = (
            ivfpq_scan(ivfpq_store_index(spark, prefix), k=10,
                       query_pred=qpred)
            .groupBy("query_id")
            .agg(F.collect_set("neighbor_id").alias("pq_ids"))
        )

        v = quantize_vectors(corpus)
        q = v.filter(qpred).select(
            F.col("vid").alias("query_id"), F.col("qv").alias("qx")
        )
        c = v.select(
            F.col("vid").alias("neighbor_id"), F.col("qv").alias("nx")
        )
        scored = (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("d2", _d2(F.col("qx"), F.col("nx")))
        )
        we = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        exact10 = (
            scored.withColumn("rk", F.row_number().over(we))
            .filter(F.col("rk") <= 10)
            .groupBy("query_id")
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("rk", "neighbor_id"))
                        ),
                        lambda s: s["neighbor_id"].cast("string"),
                    ),
                ).alias("exact_top10"),
                F.collect_set("neighbor_id").alias("exact_ids"),
            )
        )
        return exact10.join(approx, "query_id").select(
            "query_id",
            "exact_top10",
            (F.size(F.array_intersect("exact_ids", "pq_ids")) >= 7).alias(
                "recall_ok"
            ),
        ).localCheckpoint(eager=True)
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@query("q470_ivfpq_store_sampled_train", ORACLE["q389_ivfpq_ann"])
def q470(spark, sf_dir):
    """STORED IVF-PQ with SAMPLED quantizer training + the round-16
    operational lifecycle (`similarity.ivfpq_store_init(
    train_sample_mod=3)` / `ivfpq_store_insert(assert_new=True,
    auto_compact_files=1)` / `ivfpq_store_compact`): the coarse
    centroids and PQ codebooks train on the deterministic 1/3 modular
    sample of the training third — the FAISS train-on-sample posture
    that caps the one-time k-means term, which dominated the 5 M init
    at 1 042 s (store_index_scale_r15.json) — then the FULL training
    set encodes against the frozen quantizers and the other two thirds
    fold in as guarded appends, each tripping the auto-compact so the
    scan always reads one sorted file per v bucket / one file per
    codes cluster dir.  Sampled quantizers differ from full-corpus
    training, so the contract is RECALL, not bit-equality with q466's
    index: the oracle is q389's exact-top-10 SQL verbatim with the
    same ≥ 7/10 recall boolean (measured 10/10 at sf0.01 AND sf0.1
    before pinning)."""
    from ..operators.clustering import _d2, quantize_vectors
    from ..operators.similarity import (
        ivfpq_scan,
        ivfpq_store_index,
        ivfpq_store_init,
        ivfpq_store_insert,
    )

    corpus = q389_corpus(spark, sf_dir).localCheckpoint(eager=True)
    prefix = "q470_state"
    tables = (f"{prefix}_v", f"{prefix}_codes", f"{prefix}_cent",
              f"{prefix}_books")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    ivfpq_store_init(
        spark, prefix, corpus.filter(F.col("vec_id") % 3 == 0),
        train_sample_mod=3,
    )
    try:
        stats: list = []
        for m in (1, 2):
            ivfpq_store_insert(
                spark, prefix, corpus.filter(F.col("vec_id") % 3 == m),
                assert_new=True, stats=stats, auto_compact_files=1,
            )
        assert all(s["compacted"] for s in stats), stats
        qpred = (F.col("vid") % 50 == 0) & (F.col("vid") < 1000000)
        approx = (
            ivfpq_scan(ivfpq_store_index(spark, prefix), k=10,
                       query_pred=qpred)
            .groupBy("query_id")
            .agg(F.collect_set("neighbor_id").alias("pq_ids"))
        )

        v = quantize_vectors(corpus)
        q = v.filter(qpred).select(
            F.col("vid").alias("query_id"), F.col("qv").alias("qx")
        )
        c = v.select(
            F.col("vid").alias("neighbor_id"), F.col("qv").alias("nx")
        )
        scored = (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("d2", _d2(F.col("qx"), F.col("nx")))
        )
        we = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        exact10 = (
            scored.withColumn("rk", F.row_number().over(we))
            .filter(F.col("rk") <= 10)
            .groupBy("query_id")
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("rk", "neighbor_id"))
                        ),
                        lambda s: s["neighbor_id"].cast("string"),
                    ),
                ).alias("exact_top10"),
                F.collect_set("neighbor_id").alias("exact_ids"),
            )
        )
        return exact10.join(approx, "query_id").select(
            "query_id",
            "exact_top10",
            (F.size(F.array_intersect("exact_ids", "pq_ids")) >= 7).alias(
                "recall_ok"
            ),
        ).localCheckpoint(eager=True)
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
