"""PySpark-native near-duplicate detection + clustering engine for source code.

A brand-new implementation (NOT a port) with the capabilities of the reference
LSH clone detector surveyed in SURVEY.md (`pombredanne/lsh-for-source-code`,
read-only at /root/reference): shingle -> MinHash-128 -> LSH banding ->
candidate pairs (skew-defused) -> exact verification -> connected-component
clusters, plus SimHash, exact-dup short-circuit, embedding ANN and
text-analysis operators for training-data pipelines.

Architecture is Spark-first: DataFrame/SQL declarative plans optimized by
Catalyst/AQE; Python appears only in vectorized pandas/Arrow UDFs (batched
numpy), never row-at-a-time.
"""

from lsh_for_source_code_spark.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
