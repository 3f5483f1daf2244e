"""Training-data pipeline operators beyond the reference surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), approximate
similarity search over embeddings, text quality analysis, and multimodal
binary-column plumbing.
"""
