"""End-to-end pipeline orchestration — reference parity for run_pipeline
(/root/reference/main.py:390-485): read -> preview -> clean -> viz ->
train -> LLM insight -> HTML report, with the same error contract (any
exception -> error HTML + model_path None; the pipeline never raises).

Spark-specific: the cleaned frame is cached once and consumed by viz,
training and the row count for the LLM prompt (the reference re-scans its
in-memory frame; we'd re-run the whole lineage without the cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_agent_spark.ml.train import train_model
from data_pipeline_agent_spark.operators.cleaning import clean_data
from data_pipeline_agent_spark.pipeline.llm import llm_insight
from data_pipeline_agent_spark.pipeline.viz import generate_visualizations
from data_pipeline_agent_spark.sources.readers import read_any


def _metrics_html(metric: dict) -> str:
    out = "<ul>"
    for key, value in metric.items():
        if isinstance(value, float):
            out += f"<li><strong>{key}:</strong> {value:.4f}</li>"
        else:
            out += f"<li><strong>{key}:</strong> {value}</li>"
    return out + "</ul>"


def run_pipeline(
    spark: SparkSession,
    file_or_df: str | DataFrame,
    target_col: str,
    model_dir: str = "models",
    progress=None,
) -> tuple[str, str | None]:
    """Returns (html_report, model_path_or_None) — never raises."""
    try:
        if file_or_df is None:
            return "<h2>Error</h2><p>Please upload a file.</p>", None
        df = (
            read_any(spark, file_or_df)
            if isinstance(file_or_df, str)
            else file_or_df
        )

        preview = df.limit(5).toPandas().to_html(classes="table table-striped")

        if progress:
            progress(0.1, desc="Cleaning data...")
        cleaned, cleaning_msg = clean_data(df)
        cleaned = cleaned.cache()  # consumed by viz + training + count
        n_rows = cleaned.count()

        if progress:
            progress(0.3, desc="Generating visualizations...")
        figs = generate_visualizations(cleaned, target_col, n_rows=n_rows)

        if progress:
            progress(0.5, desc="Training model...")
        model_path, metric, importance_html = train_model(
            cleaned, target_col, model_dir=model_dir
        )

        if progress:
            progress(0.8, desc="Generating insights...")
        insight_prompt = f"""
        The dataset has {n_rows} rows and {len(cleaned.columns)} columns.
        Target column: {target_col}.
        Model performance: {metric}.
        Key insight summary in 5 sentences.
        """
        llm_summary = llm_insight(insight_prompt)

        html = f"""
        <h2>🧠 Data Pipeline Report</h2>
        <h3>Data Cleaning</h3>
        <p>{cleaning_msg}</p>

        <h3>Data Preview</h3>
        {preview}

        <h3>Model Performance</h3>
        {_metrics_html(metric)}
        """
        if importance_html:
            html += f"""
            <h3>Feature Importance</h3>
            {importance_html}
            """
        html += f"""
        <h3>AI Insights</h3>
        <p>{llm_summary}</p>

        <h3>Visualizations</h3>
        """
        for title, img in figs:
            html += (
                f"<h4>{title}</h4>"
                f"<img src='data:image/svg+xml;base64,{img}' width='600'/>"
            )

        cleaned.unpersist()
        return html, model_path
    except Exception as e:  # error contract (main.py:483-485)
        return f"<h2>Error in Pipeline</h2><p>{str(e)}</p>", None
