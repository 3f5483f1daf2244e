"""difflib.SequenceMatcher drop-in backed by the levsim kernels.

Mirrors the reference's ``StringMatcher`` class surface
(``src/Levenshtein/StringMatcher.py:12-90``): cached ratio/distance/
editops/opcodes, ``quick_ratio == ratio``, and
``real_quick_ratio = 2*min(l1,l2)/(l1+l2)`` — the exact upper bound the
engine pushes down as its Catalyst prefilter (levsim.prefilter).
"""

from __future__ import annotations

from warnings import warn

from . import kernels


class StringMatcher:
    def __init__(self, isjunk=None, seq1: str = "", seq2: str = "",
                 autojunk: bool = False) -> None:
        # reference warns and ignores both knobs rather than raising
        # (src/Levenshtein/StringMatcher.py:25-35)
        if isjunk:
            warn("isjunk NOT implemented, it will be ignored", stacklevel=1)
        if autojunk:
            warn("autojunk NOT implemented, it will be ignored", stacklevel=1)
        self._str1 = seq1
        self._str2 = seq2
        self._reset_cache()

    def _reset_cache(self) -> None:
        self._ratio = None
        self._distance = None
        self._opcodes = None
        self._editops = None
        self._matching_blocks = None

    def set_seqs(self, seq1: str, seq2: str) -> None:
        self._str1, self._str2 = seq1, seq2
        self._reset_cache()

    def set_seq1(self, seq1: str) -> None:
        self._str1 = seq1
        self._reset_cache()

    def set_seq2(self, seq2: str) -> None:
        self._str2 = seq2
        self._reset_cache()

    def get_opcodes(self):
        if self._opcodes is None:
            if self._editops is not None:
                self._opcodes = kernels.opcodes(self._editops, self._str1, self._str2)
            else:
                self._opcodes = kernels.opcodes(self._str1, self._str2)
        return self._opcodes

    def get_editops(self):
        if self._editops is None:
            if self._opcodes is not None:
                self._editops = kernels.editops(self._opcodes, self._str1, self._str2)
            else:
                self._editops = kernels.editops(self._str1, self._str2)
        return self._editops

    def get_matching_blocks(self):
        if self._matching_blocks is None:
            self._matching_blocks = kernels.matching_blocks(
                self.get_opcodes(), self._str1, self._str2
            )
        return self._matching_blocks

    def ratio(self) -> float:
        if self._ratio is None:
            self._ratio = kernels.ratio(self._str1, self._str2)
        return self._ratio

    def quick_ratio(self) -> float:
        # reference: same as ratio() (StringMatcher.py:77-81)
        return self.ratio()

    def real_quick_ratio(self) -> float:
        len1, len2 = len(self._str1), len(self._str2)
        lensum = len1 + len2
        if lensum == 0:
            return 1.0
        return 2.0 * min(len1, len2) / lensum

    def distance(self) -> int:
        if self._distance is None:
            self._distance = kernels.distance(self._str1, self._str2)
        return self._distance
