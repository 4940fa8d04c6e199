"""Beyond-reference pipeline operators for large-scale training-data work:
text analysis (stats, quality, repetition rules), deduplication (exact /
MinHash-LSH / SimHash / n-gram Jaccard / clustering), embedding
similarity search, deterministic sampling, sequence packing + document
chunking, and multimodal column plumbing.

All hot paths are JVM-side column expressions (``pyspark.sql.functions``)
so they stay inside whole-stage codegen; Python appears only in the
clearly marked vectorized Pandas-UDF slow path (the multimodal decode
stubs).
"""
