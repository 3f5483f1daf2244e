"""Hybrid (token-level x character-level) string comparators: Monge-Elkan
(Monge & Elkan 1996, "The field matching problem"; generalized mean form
per Jimenez et al. 2009).

ME(a, b) = (1/|T_a|) * sum over tokens s in T_a of max over t in T_b of
inner_sim(s, t) — a word-order-insensitive comparator that still credits
near-miss token spellings (unlike token_set_ratio's exact-set overlap),
the classic choice for person/org/address fields in record linkage.

Spark shape (why this scales):

* Token multisets are reduced to (pair, token, cnt) WEIGHTED DISTINCT
  rows first, so duplicate tokens cost one inner comparison instead of
  one per occurrence — the mean re-weights by cnt at the end.  The
  per-pair work is |distinct(T_a)| x |distinct(T_b)| inner comparisons,
  bounded by ``max_tokens`` (take the first N tokens of each side; NULL
  disables).
* The inner similarity runs through the house Arrow-batched jaro kernel
  (levsim.udfs.lev_jaro_udf -> C batch_jaro) — ONE vectorized crossing
  over the exploded token-pair table, never a per-row Python UDF.
* Both reductions (max over T_b, weighted mean over T_a) are plain
  groupBy aggregates with map-side partial aggregation; nothing global.

Reference parity: the inner kernel is the reference's own jaro
(src/Levenshtein/__init__.py `jaro`); ME itself has no counterpart in
the reference — net-new engine surface layered on its kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["monge_elkan_pairs"]


def _tok_counts(pairs, text_col, side, max_tokens):
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    if max_tokens is not None:
        toks = F.slice(toks, 1, int(max_tokens))
    return (
        pairs.select("id_a", "id_b", F.explode(toks).alias(f"tok_{side}"))
        .groupBy("id_a", "id_b", f"tok_{side}")
        .agg(F.count("*").cast("long").alias(f"cnt_{side}"))
    )


def monge_elkan_pairs(
    pairs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    max_tokens: int | None = 64,
    symmetric: bool = False,
    quantize_ppm: bool = False,
) -> DataFrame:
    """Monge-Elkan similarity for every (id_a, id_b) pair.

    Returns (id_a, id_b, me_sim) with ``me_sim`` the occurrence-weighted
    mean over a-tokens of the best jaro against b-tokens (plus the
    b->a direction averaged in when ``symmetric=True`` — ME is
    asymmetric by definition; the symmetric variant is the common
    fieldwork compromise).  Pairs where either side has no tokens get
    me_sim = 0.0 (disagreement, mirroring the NULL-gamma convention in
    levsim.linkage).

    ``quantize_ppm=True`` returns (id_a, id_b, me_ppm BIGINT) instead:
    each per-token best jaro is quantized to round(best * 1e6) BIGINT
    and the weighted mean is an integer floor division — the house
    cross-engine fixed point.  The float mean is NOT exactly replayable
    by a SQL oracle (a sum of doubles is summation-order-sensitive at
    the round-6 boundary, observed in the wild at sf0.01); per-value
    round-6 jaro parity with DuckDB IS established (jaro_pairs), so
    quantize-then-integer-mean is exact."""
    from levsim.udfs import lev_jaro_udf

    ta = _tok_counts(pairs, text_a, "a", max_tokens)
    tb = _tok_counts(pairs, text_b, "b", max_tokens)
    cross = ta.join(tb, ["id_a", "id_b"])
    sims = cross.withColumn(
        "_sim", lev_jaro_udf()(F.col("tok_a"), F.col("tok_b"))
    )

    def _direction(sims_df, tok, cnt):
        best = sims_df.groupBy("id_a", "id_b", tok, cnt).agg(
            F.max("_sim").alias("_best")
        )
        if quantize_ppm:
            best = best.withColumn(
                "_best", F.expr("cast(round(_best * 1000000) as bigint)")
            )
            return best.groupBy("id_a", "id_b").agg(
                F.expr(
                    f"sum({cnt} * _best) div sum({cnt})"
                ).alias("_me")
            )
        return best.groupBy("id_a", "id_b").agg(
            (F.sum(F.col(cnt) * F.col("_best")) / F.sum(cnt)).alias("_me")
        )

    me = _direction(sims, "tok_a", "cnt_a")
    if symmetric:
        me_ba = _direction(sims, "tok_b", "cnt_b").withColumnRenamed(
            "_me", "_me_ba"
        )
        half = (
            F.expr("(_me + _me_ba) div 2")
            if quantize_ppm
            else (F.col("_me") + F.col("_me_ba")) / F.lit(2.0)
        )
        me = me.join(me_ba, ["id_a", "id_b"]).select(
            "id_a", "id_b", half.alias("_me")
        )
    # left join back so token-less sides surface as 0, not missing rows
    out_col = "me_ppm" if quantize_ppm else "me_sim"
    zero = F.lit(0).cast("long") if quantize_ppm else F.lit(0.0)
    return (
        pairs.select("id_a", "id_b")
        .join(me, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("_me"), zero).alias(out_col),
        )
    )
