"""SoftTFIDF (levsim/hybrid.py soft_tfidf_pairs) vs a plain-Python
reference that replays the exact integer surface: linear floor-scaled idf
weights, ppm-quantized jaro_winkler, max/argmax-max tie resolution."""

from __future__ import annotations

from collections import Counter

import pytest

from levsim.hybrid import soft_tfidf_pairs
from levsim.kernels import jaro_winkler

DOCS = [
    (1, "paul johnson acme"),
    (2, "paule johson acme"),
    (3, "the cat sat on the mat"),
    (4, "a dog stood on a mat"),
    (5, "acme corporation limited"),
    (6, "acme corp ltd"),
    (7, "zzz yyy xxx"),
    (8, ""),
]
PAIRS = [(1, 2), (3, 4), (5, 6), (1, 6), (7, 3), (1, 8)]


def _weights(docs, idf_scale):
    n = len({d for d, _ in docs})
    cnt = {d: Counter(t for t in text.split(" ") if t) for d, text in docs}
    df = Counter()
    for d in cnt:
        for t in cnt[d]:
            df[t] += 1
    w = {
        d: {t: c * ((idf_scale * n) // df[t]) for t, c in cnt[d].items()}
        for d in cnt
    }
    n2 = {d: sum(v * v for v in w[d].values()) for d in w}
    return w, n2


def _py_soft(docs, pairs, theta_ppm=900_000, idf_scale=1000):
    w, n2 = _weights(docs, idf_scale)
    out = {}
    for a, b in pairs:
        if n2[a] == 0 or n2[b] == 0:
            continue  # zero-token side dropped, like the Spark op
        dot = 0
        for s, wa in w[a].items():
            cand = []
            for t, wb in w[b].items():
                ppm = round(jaro_winkler(s, t) * 1_000_000)
                if ppm >= theta_ppm:
                    cand.append((ppm, wb))
            if cand:
                best = max(p for p, _ in cand)
                wb_best = max(wb for p, wb in cand if p == best)
                dot += wa * wb_best * best
        out[(a, b)] = (dot, n2[a], n2[b], dot / 1e6 / (n2[a] * n2[b]) ** 0.5)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    return docs, pairs


def _collect(df):
    return {
        (r.id_a, r.id_b): (r.dot_ppm, r.na2, r.nb2, r.soft_sim)
        for r in df.collect()
    }


def test_matches_python_reference(frames):
    docs, pairs = frames
    got = _collect(soft_tfidf_pairs(docs, pairs))
    want = _py_soft(DOCS, PAIRS)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k          # exact integers
        assert got[k][3] == pytest.approx(want[k][3], abs=1e-12), k


def test_theta_gates_fuzzy_credit(frames):
    docs, pairs = frames
    lo = _collect(soft_tfidf_pairs(docs, pairs, theta_ppm=850_000))
    hi = _collect(soft_tfidf_pairs(docs, pairs, theta_ppm=999_999))
    # (1,2) matches only via near-miss spellings (paul~paule, johnson~johson):
    # credited at theta=0.85, mostly gone at ~1.0 (acme survives exactly)
    assert lo[(1, 2)][0] > hi[(1, 2)][0] > 0
    want_hi = _py_soft(DOCS, PAIRS, theta_ppm=999_999)
    assert {k: v[:3] for k, v in hi.items()} == {k: v[:3] for k, v in want_hi.items()}


def test_disjoint_pair_zero_and_dropped_empty(frames):
    docs, pairs = frames
    got = _collect(soft_tfidf_pairs(docs, pairs))
    assert got[(7, 3)][0] == 0 and got[(7, 3)][3] == 0.0
    assert (1, 8) not in got  # doc 8 has no tokens -> undefined, dropped


def test_overflow_guard_raises(frames):
    docs, pairs = frames
    with pytest.raises(ValueError, match="overflow"):
        soft_tfidf_pairs(docs, pairs, idf_scale=10**17)
