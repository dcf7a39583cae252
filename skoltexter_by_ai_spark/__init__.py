"""PySpark-native analytics engine with the capabilities of
``RoadlakeAnalytics/skoltexter-by-ai``, rebuilt Spark-first.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, Arrow on).
- ``sources``    readers: parquet fixture tables, schools CSV, document dirs.
- ``functions``  scalar/column helpers: sanitize, number-format, template
                 compiler, regex cleanup chains, JSON extraction.
- ``operators``  dataframe-in/dataframe-out operators: dedup (exact/MinHash/
                 SimHash/ngram-Jaccard), similarity search, text analysis,
                 multimodal column plumbing, the async LLM enrichment stage.
- ``plans``      the declared-query registry (SURVEY.md §2.3 Q1..Q24 plus
                 extension queries) and the 3-stage pipeline compositions.
- ``streaming``  Structured Streaming surface over the ``events`` table.

Every operator documents its partitioning/shuffle posture for the
100 TB target: these run on ``local[32]`` for tests but are written for a
1000-executor cluster.
"""

__version__ = "0.1.0"
