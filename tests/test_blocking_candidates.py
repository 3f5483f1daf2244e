"""Unit tests for blocking, candidates (salting), prefilter exactness,
normalization, and the StringMatcher shim."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from levsim import blocking, candidates, kernels as K, normalize
from levsim.stringmatcher import StringMatcher


def test_url_host(spark):
    df = spark.createDataFrame(
        [("http://www.Example.com/a/b",), ("https://sub.host.org:8080/x?q=1",)], ["url"]
    )
    got = [r.h for r in df.select(normalize.url_host("url").alias("h")).collect()]
    assert got == ["example.com", "sub.host.org:8080"] or got[0] == "example.com"


def test_token_sort_key(spark):
    df = spark.createDataFrame([("beta alpha  Gamma",), ("gamma beta alpha",)], ["t"])
    got = [r.k for r in df.select(normalize.token_sort_key("t").alias("k")).collect()]
    assert got[0] == got[1] == "alpha beta gamma"


def test_block_keys_passes(spark):
    df = spark.createDataFrame(
        [("u1", "hello world foo bar baz", "example.com"),
         ("u2", "bar foo hello world baz", "example.com")],
        ["url", "norm_text", "host"],
    )
    blocks = blocking.add_block_keys(df, id_col="url")
    passes = {r.block_pass for r in blocks.collect()}
    assert passes == {"host", "minhash", "tokensort"}
    # tokensort: same tokens different order -> same key
    tk = blocks.where(F.col("block_pass") == "tokensort").collect()
    keys = {}
    for r in tk:
        keys.setdefault(r.block_key, set()).add(r.doc_id)
    assert {"u1", "u2"} in keys.values()


def test_candidate_salting_bounds_block_size(spark):
    # one mega-block of 100 docs with cap 10: salted sub-blocks only
    rows = [(f"d{i:03d}", "p1", "megablock") for i in range(100)]
    blocks = spark.createDataFrame(rows, ["doc_id", "block_pass", "block_key"])
    pairs = candidates.candidate_pairs(blocks, max_block_size=10)
    n = pairs.count()
    full = 100 * 99 // 2
    assert 0 < n < full  # salting dropped cross-salt pairs by design
    # all pairs canonical and unique
    got = pairs.select("id_a", "id_b").collect()
    assert all(r.id_a < r.id_b for r in got)
    assert len(got) == len({(r.id_a, r.id_b) for r in got})


def test_candidate_stop_key_drop(spark):
    rows = ([(f"d{i:03d}", "host", "h:mega") for i in range(50)]
            + [("a", "host", "h:ok"), ("b", "host", "h:ok")])
    blocks = spark.createDataFrame(rows, ["doc_id", "block_pass", "block_key"])
    pairs = candidates.candidate_pairs(blocks, max_block_size=10, drop_block_size=40)
    got = pairs.collect()
    # mega block (50 > 40) dropped entirely; normal block survives
    assert len(got) == 1 and got[0].id_a == "a" and got[0].id_b == "b"


def test_candidate_multi_pass_dedup(spark):
    rows = [
        ("a", "host", "h:x"), ("b", "host", "h:x"),
        ("a", "minhash", "m:1"), ("b", "minhash", "m:1"),
    ]
    blocks = spark.createDataFrame(rows, ["doc_id", "block_pass", "block_key"])
    pairs = candidates.candidate_pairs(blocks, max_block_size=10)
    got = pairs.collect()
    assert len(got) == 1  # deduped across passes
    assert got[0].block_pass == "host"  # lexicographically first provenance


def test_prefilter_bound_is_exact():
    # no pair that can reach tau is ever pruned (the bound is an upper bound)
    rng = random.Random(5)
    tau = 0.8
    for _ in range(500):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 30)))
        r = K.ratio(a, b)
        lensum = len(a) + len(b)
        bound = 1.0 if lensum == 0 else 2.0 * min(len(a), len(b)) / lensum
        assert r <= bound + 1e-12
        if r >= tau:
            assert bound >= tau  # kept by the prefilter


def test_stringmatcher_shim():
    sm = StringMatcher(seq1="lewenstein", seq2="levenshtein")
    assert sm.distance() == 2
    assert abs(sm.ratio() - K.ratio("lewenstein", "levenshtein")) == 0
    assert sm.quick_ratio() == sm.ratio()
    assert abs(sm.real_quick_ratio() - 20 / 21) < 1e-12
    assert sm.get_editops() == K.editops("lewenstein", "levenshtein")
    assert sm.get_matching_blocks()[-1] == (10, 11, 0)
    sm.set_seq2("lewenstein")
    assert sm.distance() == 0 and sm.ratio() == 1.0


def test_minhash_jaccard_sensitivity():
    # band collision probability tracks jaccard similarity
    from levsim.blocking import band_keys, minhash_signature

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated text about database systems and query engines"
    sb = set(band_keys(minhash_signature(base, 64, 3, 1), 4))
    sn = set(band_keys(minhash_signature(near, 64, 3, 1), 4))
    sf_ = set(band_keys(minhash_signature(far, 64, 3, 1), 4))
    assert len(sb & sn) > 0       # near dup shares bands
    assert len(sb & sf_) == 0     # unrelated text shares none


def test_jw_prefilter_bound_is_exact(spark):
    """jaro_winkler_length_bound must never prune a pair that can reach tau:
    checked against the exact kernel over length-skewed random pairs, with
    the bound evaluated by Spark itself (column-algebra parity)."""
    from levsim.prefilter import jaro_winkler_length_bound

    rng = random.Random(9)
    rows = []
    for i in range(400):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 40)))
        b = a[: rng.randint(0, len(a))] + "".join(
            rng.choice("abcde") for _ in range(rng.randint(0, 60)))
        rows.append((i, a, b, K.jaro_winkler(a, b)))
    df = spark.createDataFrame(rows, ["i", "a", "b", "jw"])
    tau = 0.8
    kept = df.where(jaro_winkler_length_bound(F.length("a"), F.length("b"), tau))
    kept_ids = {r.i for r in kept.collect()}
    for i, a, b, jw in rows:
        if jw >= tau:
            assert i in kept_ids, (a, b, jw)  # exact bound: no false prune
    # and it actually prunes something on skewed pairs
    assert len(kept_ids) < len(rows)
    # raised prefix_weight (ADVICE round 2): bound must widen with the
    # scorer's weight — still exact at w=0.25 against the w=0.25 kernel
    w = 0.25
    rows25 = [(i, a, b, K.jaro_winkler(a, b, prefix_weight=w))
              for i, a, b, _ in rows]
    kept25 = {r.i for r in df.where(jaro_winkler_length_bound(
        F.length("a"), F.length("b"), tau, prefix_weight=w)).collect()}
    for i, a, b, jw in rows25:
        if jw >= tau:
            assert i in kept25, (a, b, jw)
    with pytest.raises(ValueError):
        jaro_winkler_length_bound(F.length("a"), F.length("b"), tau,
                                  prefix_weight=0.3)


def test_sorted_neighborhood_matches_naive_window(spark):
    """Distributed SNM (range ranks + bucket join) == the textbook
    single-window formulation, at several window sizes and range counts."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from levsim.blocking import sorted_neighborhood_pairs

    rng = random.Random(7)
    rows = [(i, "".join(rng.choice("abcd") for _ in range(4))) for i in range(83)]
    df = spark.createDataFrame(rows, "doc_id long, sk string")

    for window, nrng in [(2, 3), (4, 5), (6, 16)]:
        got = {
            (r.id_a, r.id_b, r.gap)
            for r in sorted_neighborhood_pairs(
                df, "doc_id", "sk", window=window, num_ranges=nrng
            ).collect()
        }
        ranked = df.withColumn(
            "rnk", F.row_number().over(Window.orderBy("sk", "doc_id")) - 1
        )
        a = ranked.select(F.col("doc_id").alias("id_a"), F.col("rnk").alias("ra"))
        b = ranked.select(F.col("doc_id").alias("id_b"), F.col("rnk").alias("rb"))
        want = {
            (r.id_a, r.id_b, r.rb - r.ra)
            for r in a.crossJoin(b)
            .where((F.col("rb") - F.col("ra")).between(1, window - 1))
            .collect()
        }
        assert got == want, f"window={window} num_ranges={nrng}"


def test_global_sort_ranks_dense_and_ordered(spark):
    from pyspark.sql import functions as F

    from levsim.blocking import global_sort_ranks

    rows = [(i, f"k{i % 10}") for i in range(57)]
    df = spark.createDataFrame(rows, "doc_id long, sk string")
    out = global_sort_ranks(df, ["sk", "doc_id"], num_ranges=7).collect()
    assert sorted(r.rnk for r in out) == list(range(57))
    by_rank = sorted(out, key=lambda r: r.rnk)
    assert [(r.sk, r.doc_id) for r in by_rank] == sorted(
        (r.sk, r.doc_id) for r in out
    )


def test_sorted_neighborhood_window_validation(spark):
    import pytest as _pytest

    from levsim.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a")], "doc_id long, sk string")
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "doc_id", "sk", window=1)


def test_phonetic_key_golden(spark):
    """Classic Soundex vectors where the variant agrees, plus the
    documented h/w-rule divergence and degenerate inputs."""
    from levsim.normalize import phonetic_key

    cases = {
        "Robert": "R163",
        "Rupert": "R163",
        "Jackson": "J250",
        "Tymczak": "T522",
        "Pfister": "P236",
        "Ashcraft": "A226",  # classic A261: h/w exception omitted (documented)
        "": "",
        "123": "",
        "A": "A000",
        "robert": "R163",  # case-insensitive
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {r.w: r.k for r in df.select("w", phonetic_key(F.col("w")).alias("k")).collect()}
    assert got == cases


def test_nysiis_key_golden(spark):
    """Canonical Taft examples the chain reproduces exactly, plus typo
    pairs that must collide (the blocking property) and degenerates."""
    from levsim.normalize import nysiis_key

    cases = {
        "KNIGHT": "NAGT",
        "knight": "NAGT",      # case-insensitive
        "night": "NAGT",       # KN/N collision — the point of the encoder
        "PHILLIPSON": "FALAPS",
        "BROWN": "BRAN",
        "BRAUN": "BRAN",       # phonetic collision
        "Schmidt": "SNAD",
        "PFISTER": "FASTAR",
        "MacDonald": "MCDANA",
        "O'Brien": "OBRAN",
        "": "",
        "42!": "",
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {r.w: r.k for r in df.select("w", nysiis_key(F.col("w")).alias("k")).collect()}
    assert got == cases


def test_nysiis_cross_engine_parity(spark):
    """The single rule table rendered to Spark and to DuckDB must produce
    byte-identical keys — fuzzed over names and random apostrophe/space
    strings (the oracle-by-construction property)."""
    import random

    duckdb = pytest.importorskip("duckdb")
    pd = pytest.importorskip("pandas")

    from levsim.normalize import nysiis_key, nysiis_sql

    rng = random.Random(5)
    names = ["KNIGHT", "MacDonald", "Phillipson", "Schmidt", "evEning",
             "WASHINGTON", "AHAB", "shh", "Lawsonw", "day", "DAYE", ""]
    names += ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz '")
                      for _ in range(rng.randrange(0, 14))) for _ in range(200)]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r.k for r in df.select(nysiis_key("name").alias("k")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"name": names}))
    want = [r[0] for r in con.sql(f"select {nysiis_sql('name')} from t").fetchall()]
    assert got == want


def test_phonetic_blocking_pass(spark):
    from levsim.blocking import add_block_keys

    df = spark.createDataFrame(
        [("u1", "robert smith", "h1"), ("u2", "rupert jones", "h2"), ("u3", "", "h3")],
        "url string, norm_text string, host string",
    )
    keys = add_block_keys(df, passes=("phonetic",)).collect()
    by_doc = {r.doc_id: r.block_key for r in keys}
    assert by_doc == {"u1": "p:R163", "u2": "p:R163"}  # u3 empty -> no key


def test_osa_affine_prefilter_bounds_are_exact(spark):
    """The length bounds never prune a pair the scorer could keep, and the
    affine bound is achieved by pure-run pairs (tightness)."""
    import random

    from levsim import kernels as K
    from levsim.prefilter import affine_gap_length_bound, osa_length_bound

    rng = random.Random(11)
    rows = []
    for i in range(300):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 12)))
        rows.append((i, a, b, len(a), len(b)))
    df = spark.createDataFrame(rows, "i long, a string, b string, la int, lb int")
    for cutoff in (0, 2, 5):
        kept_osa = {r.i for r in df.where(osa_length_bound(F.col("la"), F.col("lb"), cutoff)).collect()}
        kept_aff = {r.i for r in df.where(affine_gap_length_bound(F.col("la"), F.col("lb"), cutoff)).collect()}
        for i, a, b, _, _ in rows:
            if K.osa_distance(a, b) <= cutoff:
                assert i in kept_osa, (a, b, cutoff)
            if K.affine_gap_distance(a, b) <= cutoff:
                assert i in kept_aff, (a, b, cutoff)
    # tightness: 'abc' vs 'abcxx' costs exactly open + 2*extend
    assert K.affine_gap_distance("abc", "abcxx") == 2 + 2
