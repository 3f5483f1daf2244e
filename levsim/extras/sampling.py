"""Bounded per-group top-K and the operators built on it — deterministic
sampling and KMV distinct-count sketches.

The core primitive is the two-phase bounded top-K that round 3 introduced
inside ``exact_duplicates`` (VERDICT round-2 item 6), extracted and
generalized: a ``row_number().over(partitionBy(group))`` window ships EVERY
row of a mega-group to one task before discarding all but K — the classic
skew killer.  Instead:

  phase 1: groupBy(group, spark_partition_id) with
           ``slice(sort_array(collect_list(...)), 1, k)`` — per-task state
           is bounded by the input-split size, per-group partial state by k
  phase 2: merge partials with the same slice∘sort∘flatten — per-group
           state is (#partitions that saw the group) * k

The union of per-partition K-smallest always contains the global
K-smallest, so the result is exact.

KMV ("k minimum values" / bottom-k) sketch: with k smallest values of a
uniform hash over a set, E[|set|] ≈ (k-1) / h_k for h_k the k-th smallest
hash mapped to (0,1] (Bar-Yossef et al. 2002, public).  Using md5 (the one
hash both engines share) makes the sketch BIT-DETERMINISTIC: the same set
yields the same k-th hash on Spark and DuckDB, so the driver oracle checks
the sketch exactly, not statistically.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5 15-hex-char integer range is [0, 16^15); hashes are ~uniform on it
MD5_SPACE = 16 ** 15


def md5_long(col, seed: str = "") -> F.Column:
    """First 15 hex chars of md5 as a non-negative BIGINT — the
    cross-engine hash (same construction as dedup.md5_token_hash_col)."""
    c = col if isinstance(col, F.Column) else F.col(col)
    pre = F.concat(F.lit(seed + ":"), c.cast("string")) if seed else c.cast("string")
    return F.conv(F.substring(F.md5(pre), 1, 15), 16, 10).cast("long")


def bounded_topk_per_group(
    df: DataFrame,
    group_cols: List[str],
    order_col: str,
    k: int,
    payload_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Exact K smallest rows per group by ``order_col`` with BOUNDED task
    state (two-phase; see module docstring).  Returns one row per group
    with ``topk``: array<struct(order_col, *payload_cols)> ascending."""
    if k < 1:
        raise ValueError("k must be >= 1")
    payload_cols = payload_cols or []
    partial = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(*group_cols, "_pid")
        .agg(F.expr(f"slice(sort_array(collect_list(struct({', '.join([order_col] + payload_cols)}))), 1, {k})").alias("part"))
    )
    return (
        partial.groupBy(*group_cols)
        .agg(F.expr(f"slice(sort_array(flatten(collect_list(part))), 1, {k})").alias("topk"))
    )


def sample_per_group(
    df: DataFrame,
    group_cols: List[str],
    id_col: str,
    k: int,
    seed: str = "levsim",
) -> DataFrame:
    """Deterministic pseudo-random sample of ``k`` rows per group: the k
    smallest md5(seed:id) values.  Unlike ``df.sample`` this is stable
    across engines, partitionings and retries, and exactly reproducible in
    SQL — the property a training-data pipeline needs for auditable
    subsets.  Returns exploded rows (group_cols, id_col, sort key ``h``)."""
    keyed = df.select(*group_cols, F.col(id_col), md5_long(F.col(id_col), seed).alias("h"))
    top = bounded_topk_per_group(keyed, group_cols, "h", k, [id_col])
    return top.select(
        *group_cols, F.explode("topk").alias("s")
    ).select(*group_cols, F.col(f"s.{id_col}").alias(id_col), F.col("s.h").alias("h"))


def kmv_distinct_sketch(
    df: DataFrame,
    group_cols: List[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV (bottom-k) distinct-count sketch per group over
    ``value_col``: hashes distinct values with md5, keeps the k smallest,
    and estimates the distinct count as (k-1) * MD5_SPACE / h_k (exact
    count when the group has < k distinct values).

    All sketch state is exact integers; the estimate is ONE deterministic
    double expression over them, so the whole output is oracle-able.
    Mergeability (union of bottom-k sets -> bottom-k of union) is what
    makes this the distributed sketch of choice; the same two-phase
    aggregation implements the merge.
    """
    vals = df.select(*group_cols, F.col(value_col)).distinct()
    hashed = vals.select(*group_cols, md5_long(F.col(value_col)).alias("h"))
    top = bounded_topk_per_group(hashed, group_cols, "h", k)
    n_kept = F.size("topk")
    kth = F.element_at("topk", n_kept)["h"]
    return top.select(
        *group_cols,
        n_kept.cast("long").alias("n_kept"),
        kth.alias("kth_hash"),
        F.when(n_kept < k, n_kept.cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(float(MD5_SPACE)) / kth.cast("double"))
        .alias("est_distinct"),
    )


def _hll_alpha_ppm(m: int) -> int:
    """Flajolet et al. 2007 bias-correction constant as a ppm integer."""
    if m == 16:
        return 673_000
    if m == 32:
        return 697_000
    if m == 64:
        return 709_000
    return round(1_000_000 * 0.7213 / (1 + 1.079 / m))


def hll_components(
    df: DataFrame,
    group_cols: List[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """HyperLogLog distinct-count sketch per group (Flajolet, Fusy,
    Gandouet, Meunier 2007) — the fixed-size max-mergeable complement to
    the bottom-k :func:`kmv_distinct_sketch`: KMV state grows with k,
    HLL state is exactly m = 2**p small integers whatever the
    cardinality, and merging two sketches is a per-bucket MAX (so the
    same two-phase groupBy below IS the distributed merge).

    Exact-integer surface so a SQL oracle replays it bit-for-bit: the
    60-bit md5 hash splits into a p-bit bucket and a w = 60-p bit
    suffix; rho = leading zeros of the suffix + 1 is computed WITHOUT
    float log as w - bitlength + 1, with bitlength = length(bin(sfx))
    (``bin`` drops leading zeros in both Spark and DuckDB; sfx = 0 means
    rho = w + 1).  The indicator sum Z = sum(2^-rho_j) is held scaled by
    2^20: s_scaled = sum over all m buckets of (2^20 >> rho_j), empty
    buckets contributing 2^20 each (rho > 20 floors to 0 — negligible
    terms, identically floored in both engines).  The raw HLL estimate
    is then one BIGINT floor division
        est = alpha_ppm * m^2 * 2^20  div  (1e6 * s_scaled)
    (numerator < 8e17 for p <= 10, inside int64).  The small-range
    linear-counting correction needs ln(), so the caller applies it from
    the emitted components when nonzero_buckets < m (documented in
    Flajolet §4: use m*ln(m/V) when est < 2.5m and V = m - nonzero > 0).

    Scale shape: one groupBy to (group, bucket, rho_max) — at most
    m rows per group whatever the input — then one groupBy to the
    per-group row.  Nothing row-shaped survives the first aggregate.
    """
    if not 4 <= p <= 10:
        raise ValueError("p must be in [4, 10] (m = 16..1024 buckets)")
    m = 1 << p
    w = 60 - p
    alpha = _hll_alpha_ppm(m)
    hashed = df.select(*group_cols, md5_long(F.col(value_col)).alias("h"))
    # integer div/mod only: h is 60-bit, float division would lose bits
    per_bucket = (
        hashed.select(
            *group_cols,
            F.expr(f"h div {1 << w}L").alias("bkt"),
            F.expr(
                f"case when h % {1 << w}L = 0 then {w + 1}L "
                f"else {w}L - length(bin(h % {1 << w}L)) + 1 end"
            ).alias("rho"),
        )
        .groupBy(*group_cols, "bkt")
        .agg(F.max("rho").alias("rho_max"))
    )
    scaled = F.expr("1048576L div shiftleft(1L, cast(least(rho_max, 21) as int))")
    return (
        per_bucket.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("nonzero_buckets"),
            F.sum(scaled).cast("long").alias("s_present"),
        )
        .select(
            *group_cols,
            F.lit(m).cast("long").alias("m"),
            "nonzero_buckets",
            (F.col("s_present") + (F.lit(m) - F.col("nonzero_buckets")) * 1048576)
            .cast("long").alias("s_scaled"),
        )
        .withColumn(
            "est_distinct",
            F.expr(
                f"({alpha}L * {m}L * {m}L * 1048576L) div (1000000L * s_scaled)"
            ),
        )
    )


def global_running_sum(
    df: DataFrame,
    key_cols: List[str],
    weight_col: str,
    num_ranges: int = 0,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``weight_col`` over the total order given by
    ``key_cols`` — without a single-task global window, in the same
    two-phase shape as blocking.global_sort_ranks: range partition, local
    running sums (window keyed by partition id), per-partition totals
    folded into offsets on the driver (num_ranges rows).  Adds
    ``cum_before``."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n, *key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum(weight_col).alias("s")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(sums):
        offs.append((pid, acc))
        acc += int(sums[pid] or 0)
    odf = spark.createDataFrame(offs or [(0, 0)], "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*key_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn("_lc", F.coalesce(F.sum(weight_col).over(w), F.lit(0)))
        .join(F.broadcast(odf), "_pid")
        .withColumn("cum_before", (F.col("_lc") + F.col("_off")).cast("long"))
        .drop("_pid", "_lc", "_off")
    )


def assign_token_shards(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_tokens: int,
) -> DataFrame:
    """Token-budget sharding for training-data exports: documents in id
    order are packed into shards of ~``shard_tokens`` tokens with
    shard_id = exclusive-running-token-count div shard_tokens — the
    quantized-prefix-sum packing rule: deterministic, order-preserving,
    one pass, no bin-packing heuristics (a doc may straddle a budget
    boundary; it belongs to the shard its FIRST token falls in).  Returns
    (id, n_tokens, cum_before, shard_id), all exact integers."""
    if shard_tokens < 1:
        raise ValueError("shard_tokens must be >= 1")
    counted = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        ).cast("long").alias("n_tokens"),
    )
    out = global_running_sum(counted, ["doc_id"], "n_tokens")
    return out.withColumn("shard_id", F.expr(f"cum_before div {shard_tokens}"))


def shard_manifests(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_tokens: int,
) -> DataFrame:
    """Per-shard export manifest over :func:`assign_token_shards`:
    (shard_id, n_docs, total_tokens, first_id, last_id, checksum) — the
    reproducibility record a training-data export ships with.  The
    checksum is bit_xor of md5(id:text) over members: order-independent,
    overflow-free, and exactly recomputable in SQL, so a manifest diff
    pinpoints changed shards without reading payloads."""
    shards = assign_token_shards(df, id_col, text_col, shard_tokens)
    texts = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    joined = shards.join(texts, "doc_id").withColumn(
        "_h", md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("_t")))
    )
    return joined.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").alias("first_id"),
        F.max("doc_id").alias("last_id"),
        F.expr("bit_xor(_h)").alias("checksum"),
    )


def cms_token_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public) of the
    corpus token-frequency distribution, as a (d, idx, cnt) counter table
    — depth x width cells, token t incrementing cell (d, md5(seed:d:t) %
    width) for every row d.

    Why a sketch when groupBy(token) exists: the sketch is FIXED-SIZE
    (depth*width cells regardless of vocabulary), linearly MERGEABLE
    (sketch(A union B) = cellwise sum — asserted in tests), and therefore
    the right shape for streaming accumulation or cross-partition
    pre-aggregation of heavy-hitter stats where a 10^9-key exact groupBy
    is not (KMV's rationale, for frequencies instead of cardinality).

    The md5 hash basis makes every cell exactly reproducible in SQL, so
    the driver oracle replays the whole sketch.  Estimates via
    :func:`cms_estimate`; the classic guarantee: est >= true, and
    est <= true + eps*N with prob 1-delta for width=ceil(e/eps),
    depth=ceil(ln 1/delta).
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    toks = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        ).alias("tok")
    )
    rows = toks.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"), "tok"
    )
    cells = rows.select(
        "d",
        F.pmod(
            md5_long(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("tok")),
                     seed),
            F.lit(width),
        ).cast("int").alias("idx"),
    )
    return cells.groupBy("d", "idx").agg(F.count("*").cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    tokens: DataFrame,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
    token_col: str = "tok",
) -> DataFrame:
    """Point-query the count-min sketch: per token, min over depth rows of
    its cell counter (missing cell -> 0 estimate is impossible for tokens
    that were counted; absent-join rows mean the token never hashed there,
    i.e. estimate 0 for never-seen tokens).  Join shape: tokens x depth
    (tiny) equi-joined to the sketch on (d, idx) — the sketch behaves as a
    broadcast dim table."""
    probes = tokens.select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "tok",
        "d",
        F.pmod(
            md5_long(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("tok")),
                     seed),
            F.lit(width),
        ).cast("int").alias("idx"),
    )
    return (
        probes.join(sketch, ["d", "idx"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )
