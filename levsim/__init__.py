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
