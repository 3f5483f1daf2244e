"""Golden-value kernel tests.

Every assertion here is lifted from the reference's own test suite
(/root/reference/tests/*.py) or its executable docstrings
(src/Levenshtein/__init__.py, levenshtein_cpp.pyx) — the normative spec.
"""

from __future__ import annotations

import math

import pytest

from levsim import kernels as K

FIXME = [
    "Levnhtein",
    "Leveshein",
    "Leenshten",
    "Leveshtei",
    "Lenshtein",
    "Lvenstein",
    "Levenhtin",
    "evenshtei",
]


def isclose(a, b, rel_tol=1e-09):
    return math.isclose(a, b, rel_tol=rel_tol, abs_tol=0.0)


# --- tests/test_levenshtein_distance.py -----------------------------------


def test_distance_empty():
    assert K.distance(b"", b"") == 0
    assert K.distance("", "") == 0


def test_distance_simple():
    assert K.distance(b"ABCD", b"AF") == 3
    assert K.distance("ABCD", "AF") == 3
    assert K.distance(b"ABCD", b"ABCD") == 0
    assert K.distance("ABCD", "ABCD") == 0


def test_distance_unicode():
    assert K.distance("ÁÄ", "ABCD") == 4
    assert K.distance("ÁÄ", "ÁÄ") == 0


# --- __init__.py docstrings -------------------------------------------------


def test_distance_docstring():
    assert K.distance("lewenstein", "levenshtein") == 2
    assert K.distance("lewenstein", "levenshtein", score_cutoff=1) == 2
    assert K.distance("lewenstein", "levenshtein", weights=(1, 1, 2)) == 3


def test_distance_mixed_types():
    with pytest.raises(TypeError):
        K.distance("abc", b"abc")


def test_ratio_docstring():
    assert isclose(K.ratio("lewenstein", "levenshtein"), 0.8571428571428572)
    assert K.ratio("lewenstein", "levenshtein", score_cutoff=0.9) == 0.0
    assert isclose(
        K.ratio(["lewenstein"], ["levenshtein"], processor=lambda s: s[0]),
        0.8571428571428572,
    )


def test_hamming():
    assert K.hamming("abc", "abd") == 1
    assert K.hamming("abc", "abcde") == 2  # pad=True default
    with pytest.raises(ValueError):
        K.hamming("abc", "abcde", pad=False)
    assert K.hamming("", "") == 0
    assert K.hamming("abc", "abddd", score_cutoff=1) == 2


def test_jaro_winkler_validation():
    with pytest.raises(ValueError):
        K.jaro_winkler("a", "b", prefix_weight=0.3)
    with pytest.raises(ValueError):
        K.jaro_winkler("a", "b", prefix_weight=-0.1)


def test_jaro_known_values():
    # classic published example (Winkler 1990): MARTHA vs MARHTA
    assert isclose(K.jaro("MARTHA", "MARHTA"), 0.9444444444444445)
    assert isclose(K.jaro_winkler("MARTHA", "MARHTA"), 0.9611111111111111)
    assert K.jaro("", "") == 1.0
    assert K.jaro("a", "") == 0.0
    assert K.jaro("abc", "abc") == 1.0


# --- editops / opcodes / matching_blocks ------------------------------------


def test_editops_docstring():
    assert K.editops("spam", "park") == [
        ("delete", 0, 0),
        ("insert", 3, 2),
        ("replace", 3, 3),
    ]


def test_opcodes_docstring():
    assert K.opcodes("spam", "park") == [
        ("delete", 0, 1, 0, 0),
        ("equal", 1, 3, 0, 2),
        ("insert", 3, 3, 2, 3),
        ("replace", 3, 4, 3, 4),
    ]


def test_editops_opcodes_roundtrip():
    eo = K.editops("spam", "park")
    oc = K.opcodes(eo, "spam", "park")
    assert oc == K.opcodes("spam", "park")
    assert K.editops(oc, "spam", "park") == eo


def test_matching_blocks():
    a, b = "spam", "park"
    assert K.matching_blocks(K.editops(a, b), a, b) == [(1, 0, 2), (4, 4, 0)]
    assert K.matching_blocks(K.editops(a, b), len(a), len(b)) == [(1, 0, 2), (4, 4, 0)]
    assert K.matching_blocks(K.editops("", ""), 0, 0) == [(0, 0, 0)]
    assert K.matching_blocks(K.editops("", "a"), 0, 1) == [(0, 1, 0)]
    assert K.matching_blocks(K.editops("a", ""), 1, 0) == [(1, 0, 0)]
    assert K.matching_blocks(K.editops("a", "a"), 1, 1) == [(0, 0, 1), (1, 1, 0)]


def test_matching_blocks_join():
    # docstring __init__.py:418-424
    a, b = "dog kennels", "mattresses"
    mb = K.matching_blocks(K.editops(a, b), a, b)
    assert "".join(a[x[0]: x[0] + x[2]] for x in mb) == "ees"
    assert "".join(b[x[1]: x[1] + x[2]] for x in mb) == "ees"


def test_apply_edit():
    e = K.editops("man", "scotsman")
    assert K.apply_edit(e, "man", "scotsman") == "scotsman"
    assert K.apply_edit(e[:3], "man", "scotsman") == "scoman"
    a, b = "spam and eggs", "foo and bar"
    e = K.opcodes(a, b)
    assert K.apply_edit(K.inverse(e), b, a) == "spam and eggs"


def test_subtract_edit():
    e = K.editops("man", "scotsman")
    e1 = e[:3]
    bastard = K.apply_edit(e1, "man", "scotsman")
    assert bastard == "scoman"
    assert K.apply_edit(K.subtract_edit(e, e1), bastard, "scotsman") == "scotsman"


def test_inverse():
    assert K.inverse(K.editops("spam", "park")) == [
        ("insert", 0, 0),
        ("delete", 2, 3),
        ("replace", 3, 3),
    ]
    assert K.inverse([]) == []


# --- tests/test_median.py ----------------------------------------------------


def test_median_weight_zero():
    assert K.quickmedian(["tes", "teste"], [0, 0]) == ""
    assert K.quickmedian(["tes", "teste"], [1, 0]) == "tes"
    assert K.quickmedian(["tes", "teste"], [0, 1]) == "teste"
    assert K.quickmedian(["", "tes"]) == "e"


def test_median_documented():
    assert K.median(["SpSm", "mpamm", "Spam", "Spa", "Sua", "hSam"]) == "Spam"
    assert K.median(FIXME) == "Levenshtein"
    assert K.quickmedian(FIXME) == "Levnshein"
    assert K.median_improve("spam", FIXME) == "enhtein"
    assert K.median_improve(K.median_improve("spam", FIXME), FIXME) == "Levenshtein"
    assert (
        K.setmedian(
            ["ehee", "cceaes", "chees", "chreesc", "chees", "cheesee", "cseese", "chetese"]
        )
        == "chees"
    )


# --- tests/test_seq_ratio.py / test_set_ratio.py -----------------------------


def test_seqratio_documented():
    r = K.seqratio(
        ["newspaper", "litter bin", "tinny", "antelope"],
        ["caribou", "sausage", "gorn", "woody"],
    )
    assert isclose(r, 0.21517857142857144)


def test_setratio_documented():
    r = K.setratio(
        ["newspaper", "litter bin", "tinny", "antelope"],
        ["caribou", "sausage", "gorn", "woody"],
    )
    assert isclose(r, 0.2818452380952381)


def test_setratio_empty_rules():
    # pyx:198-204
    assert K.setratio([], []) == 1.0
    assert K.setratio([], ["a"]) == 0.0
    assert K.setratio(["a"], []) == 0.0
    assert K.seqratio([], []) == 1.0


def test_package_facade_matches_reference_all():
    """`from levsim import <name>` works for the reference's entire __all__
    (src/Levenshtein/__init__.py:44-62) — drop-in import compatibility."""
    import levsim

    ref_all = ["quickmedian", "median", "median_improve", "setmedian",
               "setratio", "seqratio", "distance", "ratio", "hamming",
               "jaro", "jaro_winkler", "editops", "opcodes",
               "matching_blocks", "apply_edit", "subtract_edit", "inverse"]
    assert levsim.__all__ == ref_all
    assert levsim.distance("kitten", "sitting") == 3
    assert abs(levsim.ratio("kitten", "sitting") - (1 - 5 / 13)) < 1e-12
