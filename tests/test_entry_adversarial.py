"""Driver-contract queries vs their DuckDB oracles on an ADVERSARIAL corpus:
empty texts (punct/alpha guard), exact jaro-winkler ties (rank alignment),
and power-of-two token-set unions (rounding-tie hardening) — the inputs the
production corpus happens not to contain (VERDICT round 1, items 5-7)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("adv"))
    rows = [
        # empty + whitespace-only texts in an otherwise-normal block
        (1, "", "en", "web", 0),
        (2, "   ", "en", "web", 3),
        # jw tie: docs 11 and 12 are IDENTICAL, so their jw to 10 ties exactly
        # and only the id_b tiebreak decides rank
        (10, "alpha beta gamma delta", "en", "web", 22),
        (11, "alpha beta gamma delt", "en", "web", 21),
        (12, "alpha beta gamma delt", "en", "web", 21),
        (13, "alpha beta gamma", "en", "web", 16),
        # shorter than the partial_ratio needle length AND shorter than its
        # pair partners: forces the needle-from-shorter-side construction
        # (kernel swap == oracle window range)
        (14, "abc", "en", "web", 3),
        # power-of-two token-set union: 64 + 65 distinct tokens, 1 shared
        (20, " ".join(f"w{i}" for i in range(64)), "en", "web", 0),
        (21, " ".join(f"w{i}" for i in range(63, 128)), "en", "web", 0),
        # second block to exercise grouping
        (30, "uno dos tres cuatro", "es", "web", 19),
        (31, "uno dos tres cuatro!", "es", "web", 20),
        # ppm expression-order divergence (ADVICE round 2): 41 alpha chars
        # over length 80 — floor(double(41/80)*1e6) = 512499 but
        # floor(41*1e6/80) = 512500; only exact integer DIV agrees both ways
        (40, "a" * 41 + " " * 39, "en", "web", 80),
        (41, "!" * 41 + "b c d " + "e" * 33, "en", "web", 80),
    ]
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s, _ in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    # single FILE like the driver testdata (readable by Spark AND DuckDB)
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(root, "documents.parquet"))
    return root


@pytest.mark.parametrize("name", [
    "punct_alpha_stats", "topk_jw_matches", "token_jaccard_pairs",
    "jaro_winkler_pairs", "lev_ratio_trunc", "char_ngram_jaccard",
    "quality_components", "bpe_token_counts", "lang_id_ngram",
    "exact_dup_groups",
    # round-3 continuation queries: empty/whitespace texts, identical docs,
    # sub-needle-length texts, 2^k unions all flow through these too
    "token_sort_ratio", "token_set_ratio", "osa_distance_pairs",
    "affine_gap_pairs", "partial_ratio_pairs", "prefix_jaccard_join",
    "token_cosine_pairs", "repetition_ngram_stats", "phonetic_block_counts",
    "sorted_neighborhood", "kmv_token_sketch", "sample_per_group",
    "canonical_url_docs", "dataset_split_assign", "pii_redaction_stats",
    "median_improve_chars", "seqratio_char_lists",
    "chunk_documents", "token_shards", "shard_manifests",
    # round-4 queries: empty/whitespace texts, identical docs and 2^k
    # unions flow through the gram joins, LM counts and line splitting
    "contamination_overlap", "bpe_merge_counts", "lm_fluency_scores",
    "repeated_line_removal", "dup_span_stats", "fingerprint_docs",
    # round-5 queries: empty/whitespace texts exercise the no-gram winnow
    # edge and the entity-only html scaffold; the tiny corpus trains fewer
    # than 5 BPE merges, exercising bpe_apply's early-stop/no-op merge arms
    "bpe_apply", "html_text_extract", "winnow_dup_pairs",
    "dup_span_removal", "canonical_selection", "blocked_hosts",
    "c4_page_flags", "cms_heavy_hitters", "tfidf_cosine_pairs",
])
def test_adversarial_oracle_match(spark, adversarial_dir, name):
    q = entrymod.queries()[name]
    sdf = q(spark, adversarial_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/documents.parquet')"
    )
    res = con.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _signature(sdf.columns, srows) == _signature(ocols, orows)


def test_jw_tie_rank_is_deterministic(spark, adversarial_dir):
    got = {(r.id_a, r.id_b): r.rnk
           for r in entrymod.queries()["topk_jw_matches"](spark, adversarial_dir).collect()}
    # identical partners 11/12 tie on jw; id_b ascending must decide
    assert got[(10, 11)] == 1 and got[(10, 12)] == 2


def test_duckdb_metric_builtins_are_byte_based():
    """Constraint behind the oracle design (executable documentation):
    DuckDB's levenshtein/jaro builtins count UTF-8 BYTES, the reference and
    our kernels count CODE POINTS ('héllo'->'hello' is 1 substitution, not
    2).  The builtin-backed oracles are therefore valid exactly on ASCII
    corpora (the driver testdata is ASCII); the recursive-CTE indel oracle
    (_indel_cte_sql) uses character-based substr and stays codepoint-correct
    on any input."""
    import duckdb

    from levsim import kernels as K

    con = duckdb.connect()
    assert K.distance("héllo", "hello") == 1
    assert con.execute("SELECT levenshtein('héllo', 'hello')").fetchone()[0] == 2
    # character-based primitives the CTE oracle is built from agree with
    # codepoint semantics
    assert con.execute("SELECT length('héllo')").fetchone()[0] == 5
    assert con.execute("SELECT substr('héllo', 2, 1)").fetchone()[0] == "é"
    # and the CTE itself: indel('héllo','hello') = 2 (delete é, insert e)
    sql = (
        "WITH RECURSIVE p AS (SELECT 1 AS id_a, 2 AS id_b, 'héllo' AS ta, 'hello' AS tb), "
        "dp AS (SELECT id_a, id_b, ta, tb, 0 AS i, "
        "list_transform(generate_series(0, length(tb)), j -> j) AS row FROM p "
        "UNION ALL SELECT id_a, id_b, ta, tb, i + 1 AS i, "
        "list_transform(generate_series(0, length(tb)), j -> "
        "j + list_min(list_transform(generate_series(0, j), k -> "
        "(CASE WHEN k = 0 THEN i + 1 ELSE least(row[k+1] + 1, "
        "CASE WHEN substr(ta, i+1, 1) = substr(tb, k, 1) THEN row[k] "
        "ELSE 999999 END) END) - k))) AS row FROM dp WHERE i < length(ta)) "
        "SELECT row[length(tb)+1] FROM dp WHERE i = length(ta)"
    )
    assert con.execute(sql).fetchone()[0] == 2 == K.indel_distance("héllo", "hello")
