"""Vectorized greedy median must equal the direct reference port exactly."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from levsim import kernels as K

short = st.text(alphabet="abcde", min_size=0, max_size=15)


@settings(max_examples=150, deadline=None)
@given(st.lists(short, min_size=1, max_size=6))
def test_median_vectorized_equals_reference(strs):
    assert K.median(strs) == K._median_reference_impl(strs)


@settings(max_examples=80, deadline=None)
@given(st.lists(short, min_size=1, max_size=5),
       st.lists(st.floats(min_value=0, max_value=3), min_size=5, max_size=5))
def test_median_weighted_equivalence(strs, w):
    w = w[: len(strs)]
    if len(w) < len(strs):
        w = w + [1.0] * (len(strs) - len(w))
    assert K.median(strs, w) == K._median_reference_impl(strs, w)


def test_median_long_random():
    rng = random.Random(3)
    for _ in range(5):
        strs = ["".join(rng.choice("abcdefgh ") for _ in range(rng.randint(50, 200)))
                for _ in range(rng.randint(2, 6))]
        assert K.median(strs) == K._median_reference_impl(strs)


def test_median_improve_single_char_reduction():
    """median_improve from a bad seed over 1-char members == weighted
    plurality with smallest-codepoint tie-break (the driver oracle's
    reduction; replace beats delete, inserts can never win)."""
    import random
    from collections import Counter

    from levsim.kernels import median_improve

    rng = random.Random(17)
    for _ in range(500):
        chars = [rng.choice("abcdef") for _ in range(rng.randint(1, 12))]
        c = Counter(chars)
        best = max(c.values())
        want = min(ch for ch in c if c[ch] == best)
        assert median_improve("~", chars) == want, chars
