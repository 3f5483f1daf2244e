"""Deduplication operators for large-scale training-data pipelines.

Four families, each returning DataFrames composable with the ER pipeline:

- exact:          hash-groupBy on normalized text (one shuffle, map-side
                  partial agg; the cheapest pass, always run first)
- minhash_lsh:    word-shingle MinHash -> LSH band buckets -> bucket join ->
                  verified near-dup pairs (reuses levsim.blocking)
- simhash:        64-bit SimHash -> 4x16-bit band exact-match candidates
                  (Charikar 2002; Manku et al. WWW'07 banding) -> hamming
                  verification, all JVM-side after the signature UDF
- ngram_jaccard:  token-set Jaccard via pure Spark built-ins
                  (array_distinct/array_intersect/array_union) — fully
                  SQL-expressible, used as the DuckDB-checkable dedup oracle
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .. import blocking


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_dups, keep_id, dup_ids).

    keep_id = min id (deterministic canonical survivor)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.xxhash64(text_col).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
            F.sort_array(F.collect_list("doc_id")).alias("dup_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct text value."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.xxhash64(text_col)).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# minhash near-dup
# ---------------------------------------------------------------------------


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 64,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    max_block_size: int = 500,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding (id_a < id_b)."""
    from ..candidates import candidate_pairs

    blocks = blocking.add_block_keys(
        df, id_col=id_col, text_col=text_col, host_col="__none__",
        n_perm=n_perm, rows_per_band=rows_per_band, shingle_k=shingle_k,
        passes=("minhash",),
    )
    return candidate_pairs(blocks, max_block_size=max_block_size,
                           keep_pass_provenance=False)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(tokens: List[str]) -> int:
    """64-bit SimHash of a token multiset (Charikar random-hyperplane
    sketch with per-token blake2b bit vectors)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in tokens:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
        bits = (np.uint64(h) >> shifts) & np.uint64(1)
        acc += 2 * bits.astype(np.int64) - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 63)  # signed int64


def simhash_udf():
    @pandas_udf(LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [None if t is None else simhash64(t.split()) for t in texts.tolist()],
            dtype="Int64",
        )

    return _udf


def simhash_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                            max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4x16-bit keys
    (any pair within hamming distance 3 shares at least one band — pigeonhole),
    join on band equality, verify exact bit-hamming with JVM expressions."""
    sig = df.select(F.col(id_col).alias("doc_id"), simhash_udf()(F.col(text_col)).alias("sh"))
    bands = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{i}:"),
                         F.shiftright(F.col("sh"), i * 16).bitwiseAND(F.lit(0xFFFF)).cast("string"))
                for i in range(4)
            ])
        ).alias("band_key"),
    )
    a = bands.select(F.col("band_key"), F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = bands.select(F.col("band_key"), F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.join(b, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .drop("band_key")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming_bits", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming_bits") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming_bits")


# ---------------------------------------------------------------------------
# n-gram / token Jaccard (pure built-ins -> SQL-oracle-able)
# ---------------------------------------------------------------------------


def token_jaccard_col(text_a, text_b) -> F.Column:
    """Jaccard similarity of distinct-token sets — pure column expression."""
    ta = F.array_distinct(F.split(text_a, " "))
    tb = F.array_distinct(F.split(text_b, " "))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(1.0))


def jaccard_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_col: str, tau: float = 0.8) -> DataFrame:
    """Within-block token-Jaccard near-dup pairs (SQL-expressible end to end)."""
    a = df.select(F.col(block_col).alias("bk"), F.col(id_col).alias("id_a"),
                  F.col(text_col).alias("text_a"))
    b = df.select(F.col(block_col).alias("bk"), F.col(id_col).alias("id_b"),
                  F.col(text_col).alias("text_b"))
    return (
        a.join(b, "bk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(token_jaccard_col(F.col("text_a"), F.col("text_b")), 6))
        .where(F.col("jaccard") >= tau)
        .select("id_a", "id_b", "jaccard")
    )
