"""DataFrame-in / DataFrame-out operators.

The large-scale training-data-pipeline surface: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search
(brute-force cosine, hyperplane-LSH ANN), text analysis (language id,
quality scoring, token counting, fingerprinting), multimodal column
plumbing, and the async LLM enrichment stage.
"""

from skoltexter_by_ai_spark.operators import dedup, similarity, text_analysis  # noqa: F401
