"""Query catalog. Importing this package populates the registry."""

from data_pipeline_agent_spark.plans import (  # noqa: F401
    queries_behavior,
    queries_cleaning,
    queries_corpus,
    queries_curation,
    queries_dedup,
    queries_joins,
    queries_ml,
    queries_multimodal,
    queries_relational,
    queries_sketches,
    queries_similarity,
    queries_text,
    queries_tpch_extra,
    queries_tpch_fill,
    queries_windows,
)
from data_pipeline_agent_spark.plans.registry import REGISTRY, QuerySpec  # noqa: F401
