"""Beyond-reference pipeline operators for large-scale training-data work:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, and multimodal column plumbing.

All hot paths are JVM-side column expressions (``pyspark.sql.functions``)
so they stay inside whole-stage codegen; Python appears only in clearly
marked vectorized Pandas-UDF slow paths (SimHash packing, multimodal
decode stubs).
"""
