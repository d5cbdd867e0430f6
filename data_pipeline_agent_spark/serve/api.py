"""REST surface — reference parity for api.py (/root/reference/api.py:34-185):

  POST /upload                      multipart -> temp file, job id
  POST /run_pipeline/{id}?target_column=   background pipeline run
  GET  /status/{id}                 poll job status
  GET  /report/{id}                 HTML report
  GET  /download/{id}               model artifact (zipped MLlib dir)

PWA/static surface (reference api.py:127-203 + sw.js):

  GET  /favicon.ico                 redirect (api.py:137-140)
  GET  /manifest.json               PWA manifest (api.py:142-158)
  GET  /sw.js                       service worker (api.py:161-171)
  GET  /gradio/gradio_api/upload_progress   {"status","progress"} stub (api.py:174-177)
  GET  /gradio/gradio_api/app_id    {"app_id"} stub (api.py:184-187)
  GET  /.well-known/appspecific/com.chrome.devtools.json  (api.py:179-182)
  /static mount                     StaticFiles dir (api.py:127-135)
  /gradio mount                     Gradio Blocks app when gradio is
                                    installed (api.py:190-203); skipped
                                    gracefully otherwise

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

    _add_pwa_routes(app)
    return app


# PWA manifest content — parity with /root/reference/api.py:145-156
MANIFEST = {
    "name": "Data Pipeline Agent",
    "short_name": "Data Pipeline",
    "description": "AI-powered data cleaning, visualization, and model training",
    "start_url": "/gradio",
    "display": "standalone",
    "background_color": "#ffffff",
    "theme_color": "#3070f0",
}

# Minimal pass-through service worker — parity with api.py:163-168
SERVICE_WORKER_JS = """
// Minimal service worker for PWA caching
self.addEventListener('fetch', event => {
  event.respondWith(fetch(event.request));
});
"""

FAVICON_URL = "https://fastapi.tiangolo.com/img/favicon.png"


def _add_pwa_routes(app) -> None:
    """PWA/static/Gradio-mount routes (reference api.py:127-203).

    Every route the reference web UI fetches on load, so a browser pointed
    at this server hits no 404s: favicon redirect, manifest, service
    worker, the two gradio_api stubs, the Chrome devtools probe, a
    /static mount, and (when gradio is importable) the Blocks UI mounted
    at /gradio.
    """
    import json as _json

    from fastapi.responses import RedirectResponse, Response

    @app.get("/favicon.ico")
    async def favicon():
        return RedirectResponse(url=FAVICON_URL)

    @app.get("/manifest.json")
    async def get_manifest():
        return Response(content=_json.dumps(MANIFEST), media_type="application/json")

    @app.get("/sw.js")
    async def get_service_worker():
        return Response(content=SERVICE_WORKER_JS, media_type="application/javascript")

    @app.get("/gradio/gradio_api/upload_progress")
    async def upload_progress():
        return {"status": "completed", "progress": 100}

    @app.get("/.well-known/appspecific/com.chrome.devtools.json")
    async def chrome_devtools():
        return {"status": "ok"}

    @app.get("/gradio/gradio_api/app_id")
    async def app_id():
        return {"app_id": "data-pipeline-agent"}

    # /static mount (api.py:127-135): create the dir if absent, like the
    # reference does, so the mount never fails on a fresh checkout.
    try:
        from fastapi.staticfiles import StaticFiles

        static_dir = os.path.join(tempfile.gettempdir(), "dpa_spark_static")
        os.makedirs(static_dir, exist_ok=True)
        app.mount("/static", StaticFiles(directory=static_dir), name="static")
    except ImportError:  # aiofiles missing etc. — static mount is optional
        pass

    # /gradio mount (api.py:190-203) — only when gradio is installed.
    try:
        import gradio as gr

        from data_pipeline_agent_spark.serve.ui import create_gradio_app

        gradio_app = create_gradio_app()
        gr.mount_gradio_app(app, gradio_app, path="/gradio", root_path="/gradio")
    except (ImportError, NotImplementedError):
        pass
