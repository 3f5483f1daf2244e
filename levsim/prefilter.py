"""Catalyst-visible prefilters — the reference's score_cutoff early-exit
lifted into column predicates (SURVEY.md §4 row 1).

Two exact upper bounds on the indel ratio, both pure column algebra so
Catalyst evaluates them BEFORE the Arrow/pandas scoring UDF (and, where
lengths are scan columns, pushes them into the join/scan):

- length bound ("real_quick_ratio", reference StringMatcher.py:83-85):
    ratio(a, b) <= 2*min(l1,l2)/(l1+l2)
  so  2*least(l1,l2)/(l1+l2) < tau  ==>  pair cannot reach tau.
- equivalent distance form: indel_dist >= |l1-l2|, so
    |l1 - l2| > (1-tau)*(l1+l2)  ==>  prune.

For Levenshtein with cutoff k: |l1 - l2| > k ==> prune (distance lower
bound).  These are exact bounds — pruned pairs can never pass the final
threshold, so recall is unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ratio_length_bound(len_a: Column, len_b: Column, tau: float) -> Column:
    """TRUE iff the pair can still reach ratio >= tau (keep-predicate)."""
    lensum = len_a + len_b
    return (lensum == 0) | (
        (2.0 * F.least(len_a, len_b) / lensum) >= F.lit(tau)
    )


def distance_length_bound(len_a: Column, len_b: Column, cutoff: int) -> Column:
    """TRUE iff the pair can still have distance <= cutoff."""
    return F.abs(len_a - len_b) <= F.lit(cutoff)


def jaro_winkler_length_bound(
    len_a: Column, len_b: Column, tau: float, prefix_weight: float = 0.1
) -> Column:
    """TRUE iff the pair can still reach jaro_winkler >= tau (keep-predicate).

    Exact bound: the Jaro match count m is at most min(l1, l2) and the
    transposition term (m - t)/m is at most 1, so
        jaro <= (min/l1 + min/l2 + 1) / 3.
    jw = jaro + p*w*(1 - jaro) with prefix length p <= 4 is monotone in
    jaro, so  jw <= jaro_ub + 4*w*(1 - jaro_ub)  is exact for ANY
    prefix_weight w the scorer is called with (the reference caps w at 0.25,
    ``Levenshtein.jaro_winkler`` raising above it).  Callers MUST pass the
    same prefix_weight here as to the scorer — a smaller w here than in the
    scorer would silently prune pairs that can still reach tau.  The
    O(l1*l2) jaro kernel is the costliest scorer on long texts (VERDICT
    round 1: 0.8k pairs/s/core at L=2048) — this column predicate prunes
    length-skewed pairs before the Arrow crossing; pass-through pairs are
    still scored exactly."""
    if not 0.0 <= prefix_weight <= 0.25:
        raise ValueError("prefix_weight must be in [0, 0.25]")
    minl = F.least(len_a, len_b)
    both_empty = (len_a == 0) & (len_b == 0)  # jaro('', '') == 1.0
    one_empty = (len_a == 0) | (len_b == 0)   # else empty side -> 0.0
    jaro_ub = (minl / len_a + minl / len_b + 1.0) / 3.0
    jw_ub = jaro_ub + 4.0 * prefix_weight * (1.0 - jaro_ub)
    return both_empty | (~one_empty & (jw_ub >= F.lit(tau)))


def apply_ratio_prefilter(
    pairs: DataFrame, tau: float, len_a: str = "len_a", len_b: str = "len_b"
) -> DataFrame:
    return pairs.where(ratio_length_bound(F.col(len_a), F.col(len_b), tau))


def osa_length_bound(len_a: Column, len_b: Column, cutoff: int) -> Column:
    """TRUE iff the pair can still have OSA distance <= cutoff.  Exact:
    substitutions and transpositions preserve the length difference, so
    osa >= |l1 - l2| — the same bound as plain Levenshtein."""
    return F.abs(len_a - len_b) <= F.lit(cutoff)


def affine_gap_length_bound(
    len_a: Column, len_b: Column, cutoff: int,
    gap_open: int = 2, gap_extend: int = 1,
) -> Column:
    """TRUE iff the pair can still have affine-gap cost <= cutoff.  Exact:
    a length difference of d > 0 requires at least d net indels, cheapest
    as ONE run costing gap_open + gap_extend*d; equal lengths can cost 0."""
    diff = F.abs(len_a - len_b)
    lb = F.when(diff == 0, F.lit(0)).otherwise(gap_open + gap_extend * diff)
    return lb <= F.lit(cutoff)
