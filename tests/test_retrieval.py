"""BM25 postings-join retrieval (levsim/extras/retrieval.py) — round-6
VERDICT #5.  The fixed-point formula is replicated in plain Python ints
here and every Spark output is checked against it exactly."""

import pytest

SCALE = 1_000_000


def _py_bm25(docs, query_text, k1_ppm=1_200_000, b_ppm=750_000, idf_scale=1000):
    """Independent integer reference: dict doc_id -> (n_terms_hit, score_s)."""
    toks = {i: [t for t in txt.split(" ") if t] for i, txt in docs.items()}
    n = len([i for i in toks])
    tl = sum(len(v) for v in toks.values())
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for q in set(t for t in query_text.split(" ") if t):
        if q not in df:
            continue
        idf = (idf_scale * (2 * n - 2 * df[q] + 1)) // (2 * df[q] + 1)
        for i, ts in toks.items():
            tf = ts.count(q)
            if not tf:
                continue
            dln = (SCALE * len(ts) * n) // tl
            norm = (SCALE - b_ppm) + (b_ppm * dln) // SCALE
            den = SCALE * tf + (k1_ppm * norm) // SCALE
            tfpart = (SCALE * (SCALE + k1_ppm) * tf) // den
            h, s = out.get(i, (0, 0))
            out[i] = (h + 1, s + idf * tfpart)
    return out


def test_bm25_matches_python_reference(spark):
    docs = {
        1: "the cat sat on the mat",
        2: "the dog barked at the cat and the dog ran",
        3: "quantum flux capacitors require rare plutonium isotopes",
        4: "cat cat cat cat",
        5: "a b c d e f g h i j k l m n o p q r s t",
    }
    queries = {10: "cat mat", 11: "plutonium", 12: "the dog", 13: "zzz unseen",
               14: "the"}
    ddf = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    qdf = spark.createDataFrame(list(queries.items()), "query_id long, text string")
    from levsim.extras.retrieval import bm25_score_pairs

    got = {
        (r.query_id, r.doc_id): (r.n_terms_hit, r.score_s)
        for r in bm25_score_pairs(ddf, qdf).collect()
    }
    want = {}
    for qid, qt in queries.items():
        for did, hs in _py_bm25(docs, qt).items():
            want[(qid, did)] = hs
    assert got == want
    # single rare term (df=1) outscores the single common term (df=3)
    # wherever either appears, despite "the" having tf=3 in doc 2
    assert got[(11, 3)][1] > max(s for (q, _), (_, s) in got.items() if q == 14)
    # query with no corpus hits produces no rows at all
    assert not [k for k in got if k[0] == 13]


def test_bm25_topk_rank_and_ties(spark):
    # identical twin docs tie exactly -> deterministic doc_id ascending
    docs = [(i, "alpha beta") for i in (7, 3, 5)] + [(9, "alpha alpha alpha")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame([(1, "alpha")], "query_id long, text string")
    from levsim.extras.retrieval import bm25_topk

    rows = bm25_topk(ddf, qdf, k=3).orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    # doc 9 has higher tf AND shorter-normalized... compute: it must win
    assert rows[0].doc_id == 9
    # the two twins that fit in k come in id order and tie on score
    assert (rows[1].doc_id, rows[2].doc_id) == (3, 5)
    assert rows[1].score_s == rows[2].score_s
    # k larger than matches: returns all matches, no padding
    assert bm25_topk(ddf, qdf, k=50).count() == 4


def test_bm25_decontamination_shape(spark):
    """The decontamination use: probes lifted verbatim from corpus docs
    must rank their source doc first."""
    import random

    rng = random.Random(42)
    vocab = [f"w{j}" for j in range(300)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(60))) for i in range(40)
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    probes = [
        (i, " ".join(docs[i][1].split(" ")[10:22])) for i in (3, 17, 31)
    ]
    qdf = spark.createDataFrame(probes, "query_id long, text string")
    from levsim.extras.retrieval import bm25_topk

    top1 = {
        r.query_id: r.doc_id
        for r in bm25_topk(ddf, qdf, k=1).collect()
    }
    assert top1 == {3: 3, 17: 17, 31: 31}


def test_bm25_guards(spark):
    from levsim.extras.retrieval import bm25_score_pairs

    ddf = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    qdf = spark.createDataFrame([(1, "a")], "query_id long, text string")
    with pytest.raises(ValueError, match="b_ppm"):
        bm25_score_pairs(ddf, qdf, b_ppm=2_000_000)
    with pytest.raises(ValueError, match="idf_scale"):
        bm25_score_pairs(ddf, qdf, idf_scale=0)
    # overflow guard fires loudly at absurd idf_scale
    big = spark.createDataFrame(
        [(i, "tok") for i in range(4)], "doc_id long, text string")
    with pytest.raises(ValueError, match="overflow"):
        bm25_score_pairs(big, qdf.selectExpr("query_id", "'tok' as text"),
                         idf_scale=10**18).collect()
    # empty corpus -> empty typed frame, no crash
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_score_pairs(empty, qdf).count() == 0


def test_bm25_partition_invariance(spark):
    """Same result at shuffle width 2 and 17 / different input splits —
    the two-phase top-k must be exact regardless of partitioning."""
    import random

    rng = random.Random(7)
    vocab = [f"t{j}" for j in range(50)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(25))) for i in range(60)]
    qdf_rows = [(1, "t1 t2 t3"), (2, "t40 t41")]
    from levsim.extras.retrieval import bm25_topk

    outs = []
    for parts, width in ((2, "2"), (11, "17")):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", width)
        try:
            ddf = spark.createDataFrame(docs, "doc_id long, text string").repartition(parts)
            qdf = spark.createDataFrame(qdf_rows, "query_id long, text string")
            outs.append(sorted(
                (r.query_id, r.rank, r.doc_id, r.score_s)
                for r in bm25_topk(ddf, qdf, k=7).collect()
            ))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    assert outs[0] == outs[1] and len(outs[0]) == 14
