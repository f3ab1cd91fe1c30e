"""Training-data pipeline operators over document/embedding tables:
deduplication (exact, MinHash/LSH, SimHash), text analysis (token stats,
quality, language ID, fingerprints), and similarity search (cosine top-k).

All operators are Spark-first: built-in pyspark.sql.functions where the
semantics allow (JVM-side, whole-stage codegen), vectorized numpy inside
``mapInPandas`` only where they don't (per-partition top-k pruning).
"""
