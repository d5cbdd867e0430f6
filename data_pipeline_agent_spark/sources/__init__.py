from data_pipeline_agent_spark.sources.readers import read_any  # noqa: F401
