"""DataFrame-in / DataFrame-out operators.

The large-scale training-data-pipeline surface: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search
(brute-force cosine, hyperplane-LSH and IVF ANN, int8 quantization),
text analysis (language id, quality scoring, token counting,
fingerprinting), corpus curation (sampling, contamination, mixing,
majority vote), CDC (keep-last merge, SCD2, snapshot diff), multimodal
column plumbing, and the async LLM enrichment stage.
"""

from skoltexter_by_ai_spark.operators import (  # noqa: F401
    cdc,
    dedup,
    similarity,
    text_analysis,
)
