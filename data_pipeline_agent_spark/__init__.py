"""data_pipeline_agent_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the data-processing capabilities of
``Maheshnath09/data-pipeline-agent`` (a single-node pandas+sklearn auto-ML
pipeline), re-expressed as distributed DataFrame / MLlib operators and
extended with the operators a large-scale LLM training-data pipeline needs
(deduplication, similarity search, text analysis, streaming windows).

Layout
------
- ``session``    : SparkSession factory tuned for the target cluster shape.
- ``sources``    : scan/sink operators (CSV/Excel/Parquet/JSON dispatch).
- ``operators``  : pure DataFrame -> DataFrame / scalar operators
                   (profiling, cleaning, stats, dedup, similarity, text).
- ``functions``  : reusable column-expression helpers (vector math, text).
- ``plans``      : the named query catalog + DuckDB oracle SQL twins.
- ``ml``         : MLlib training tournament replicating the reference's
                   train_model semantics.
- ``streaming``  : Structured Streaming windows / stateful operators.
- ``pipeline``   : clean -> viz -> train -> report orchestration.
- ``serve``      : REST/UI surface (import-gated; FastAPI optional).
"""

__version__ = "0.1.0"
