"""levsim — PySpark-native record-linkage / string-similarity engine.

A from-scratch distributed re-expression of the capabilities of the
``rapidfuzz/Levenshtein`` reference library: exact scalar kernels
(``levsim.kernels``), Arrow-batched vectorized scorers (``levsim.batch``,
``levsim.udfs``), and the entity-resolution pipeline mandated by the task's
north rule — blocking, candidate generation, prefiltering, pair scoring,
transitive clustering, consensus election — over Iceberg-semantics snapshot
tables of web pages (``levsim.tables``, ``levsim.pipeline``).
"""

__version__ = "0.1.0"

# Drop-in scalar API: the reference's full __all__
# (/root/reference/src/Levenshtein/__init__.py:44-62) re-exported at package
# level, so `from levsim import distance, ratio, median, ...` is a direct
# substitute for `from Levenshtein import ...`.
from .kernels import (  # noqa: E402
    apply_edit,
    distance,
    editops,
    hamming,
    inverse,
    jaro,
    jaro_winkler,
    matching_blocks,
    median,
    median_improve,
    opcodes,
    quickmedian,
    ratio,
    seqratio,
    setmedian,
    setratio,
    subtract_edit,
)

__all__ = [
    "quickmedian",
    "median",
    "median_improve",
    "setmedian",
    "setratio",
    "seqratio",
    "distance",
    "ratio",
    "hamming",
    "jaro",
    "jaro_winkler",
    "editops",
    "opcodes",
    "matching_blocks",
    "apply_edit",
    "subtract_edit",
    "inverse",
]
