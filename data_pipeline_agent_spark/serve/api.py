"""REST surface — reference parity for api.py (/root/reference/api.py:34-185):

  POST /upload                      multipart -> temp file, job id
  POST /run_pipeline/{id}?target_column=   background pipeline run
  GET  /status/{id}                 poll job status
  GET  /report/{id}                 HTML report
  GET  /download/{id}               model artifact (zipped MLlib dir)

FastAPI is not installed in this container, so construction is gated:
``create_app()`` raises NotImplementedError with the missing dependency.
With fastapi/uvicorn available the app serves the same routes over the
Spark pipeline. One behavioral improvement over the reference (noted in
SURVEY §2.6 L4): the pipeline runs in a thread executor instead of
blocking the event loop inside an async handler.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
import zipfile

from data_pipeline_agent_spark.pipeline.run import run_pipeline
from data_pipeline_agent_spark.session import get_spark

# process-global job registry, same shape as the reference (api.py:28)
job_status: dict[str, dict] = {}


def create_app():
    try:
        from fastapi import BackgroundTasks, FastAPI, File, HTTPException, UploadFile
        from fastapi.responses import FileResponse, HTMLResponse
    except ImportError as e:
        raise NotImplementedError(
            f"REST serving requires fastapi (not installed here): {e}"
        ) from e

    app = FastAPI(title="data-pipeline-agent-spark")

    @app.post("/upload")
    async def upload(file: UploadFile = File(...)):
        file_id = str(uuid.uuid4())
        suffix = os.path.splitext(file.filename or "upload.csv")[1] or ".csv"
        path = os.path.join(tempfile.gettempdir(), f"{file_id}{suffix}")
        with open(path, "wb") as out:
            shutil.copyfileobj(file.file, out)
        job_status[file_id] = {"status": "uploaded", "file_path": path}
        return {"file_id": file_id, "filename": file.filename}

    def _process(file_id: str, target_column: str):
        job = job_status[file_id]
        try:
            spark = get_spark("serve")
            html, model_path = run_pipeline(spark, job["file_path"], target_column)
            job.update(status="completed", report=html, model_path=model_path)
        except Exception as e:  # mirror api.py:91-93
            job.update(status="error", message=str(e))

    @app.post("/run_pipeline/{file_id}")
    async def run(file_id: str, target_column: str, background_tasks: BackgroundTasks):
        if file_id not in job_status:
            raise HTTPException(404, "file_id not found")
        job_status[file_id]["status"] = "processing"
        background_tasks.add_task(_process, file_id, target_column)
        return {"file_id": file_id, "status": "processing"}

    @app.get("/status/{file_id}")
    async def status(file_id: str):
        if file_id not in job_status:
            raise HTTPException(404, "file_id not found")
        j = job_status[file_id]
        return {"file_id": file_id, "status": j["status"], "message": j.get("message")}

    @app.get("/report/{file_id}")
    async def report(file_id: str):
        j = job_status.get(file_id)
        if not j or "report" not in j:
            raise HTTPException(404, "report not ready")
        return HTMLResponse(j["report"])

    @app.get("/download/{file_id}")
    async def download(file_id: str):
        j = job_status.get(file_id)
        if not j or not j.get("model_path"):
            raise HTTPException(404, "model not ready")
        zip_path = j["model_path"].rstrip("/") + ".zip"
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w") as zf:
                for root, _, files in os.walk(j["model_path"]):
                    for f in files:
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, j["model_path"]))
        return FileResponse(zip_path, filename=os.path.basename(zip_path))

    return app
