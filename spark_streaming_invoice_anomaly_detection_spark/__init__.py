"""invoice-engine: a PySpark-native analytics engine.

A from-scratch rebuild (DataFrame / Spark SQL / Structured Streaming /
pyspark.ml) of the query and data-processing capabilities of the reference
project ``javiervela/spark-streaming-invoice-anomaly-detection`` (Scala /
Spark 2.3 DStreams), extended with batch relational operators and
LLM-data-pipeline operators (dedup, similarity search, text analysis),
designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory tuned for the engine
- ``schemas``    fixed StructTypes for every record shape (SURVEY.md §1)
- ``sources``    batch/stream source + sink adapters (SURVEY.md §2.1)
- ``functions``  scalar column functions (SURVEY.md §2.5)
- ``operators``  batch relational + extension operators (§2.2-2.3, Phase 4)
- ``ml``         clustering sweep / elbow / threshold (SURVEY.md §2.6)
- ``streaming``  stateful sessionization + windows (SURVEY.md §2.4)
- ``plans``      the query registry backing ``__spark_entry__.py``
"""

__version__ = "0.1.0"
