"""Gradio UI — reference parity for the Blocks app (L5,
/root/reference/main.py:490-547): file upload + target-column inputs, HTML
report + downloadable model outputs, 50 MB upload cap, queued execution.

Gradio is not installed in this container, so construction is gated the
same way as the REST surface: ``create_gradio_app()`` raises
NotImplementedError naming the missing dependency. With gradio available
it drives the same Spark pipeline as serve/api.py.
"""

from __future__ import annotations

from data_pipeline_agent_spark.pipeline.run import run_pipeline
from data_pipeline_agent_spark.session import get_spark

MAX_FILE_SIZE_MB = 50  # reference cap (main.py:538, api.py:199)


def create_gradio_app():
    try:
        import gradio as gr
    except ImportError as e:
        raise NotImplementedError(
            f"The UI requires gradio (not installed here): {e}"
        ) from e

    def _run(file_obj, target_column):
        if file_obj is None:
            return "<h3>Please upload a file.</h3>", None
        spark = get_spark("gradio_pipeline")
        html, model_path = run_pipeline(spark, file_obj.name, target_column)
        return html, model_path

    with gr.Blocks(title="Data Pipeline Agent (Spark)") as app:
        gr.Markdown("# Automated ML Data Pipeline (PySpark)")
        with gr.Row():
            file_in = gr.File(label=f"Dataset (CSV/Excel, ≤{MAX_FILE_SIZE_MB} MB)")
            target_in = gr.Textbox(label="Target column")
        submit = gr.Button("Run pipeline")
        report_out = gr.HTML(label="Report")
        model_out = gr.File(label="Trained model")
        submit.click(fn=_run, inputs=[file_in, target_in], outputs=[report_out, model_out])

    # one pipeline at a time, as the reference runs standalone (main.py:573)
    app.queue(default_concurrency_limit=1)
    return app
