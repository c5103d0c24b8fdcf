"""tse_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch rebuild of the capabilities of PKU's Tiny Search Engine
(reference: 0x01111/TSE) on idiomatic Spark: DataFrame-declared plans,
vectorized pandas/Arrow UDFs only for extraction, tokenization and the
posting-list codec/WAND, salted repartition-by-term index build with
sorted-run concatenation, and checkpoint-resumable stages.
"""

__version__ = "0.1.0"

# Applied at import time so every process touching the engine — driver
# and pyspark UDF workers alike — gets it (see runtime.disable_thp for
# the measured 15-30x concurrent-worker collapse it prevents).
from tse_spark.runtime import disable_thp as _disable_thp

_disable_thp()
