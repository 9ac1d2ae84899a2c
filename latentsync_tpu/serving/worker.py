"""Job-queue worker: polls a queue backend, drives the HTTP API, fans out
status updates.

Python re-architecture of the TypeScript worker
(ref:job-queue-listener/src/index.ts:108-252): 5 s poll loop over a
pluggable queue backend (local JSON-dir by default; Firestore when
google-cloud libraries exist), dependency-gated jobs
(`waiting-dependency`, ref:index.ts:132-162), optional TTS hook, POST to
the local inference server, artifact upload hook (GCS when available),
and a pending→running→completed/failed status machine where the status
field is the job mutex (SURVEY §5.2).
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional


class LocalDirQueue:
    """Filesystem queue backend: one JSON file per job under root/."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, job_id: str) -> str:
        return os.path.join(self.root, f"{job_id}.json")

    def submit(self, job: Dict) -> str:
        job_id = job.get("id") or f"job-{int(time.time()*1000)}"
        job = {**job, "id": job_id, "status": job.get("status", "pending")}
        with open(self._path(job_id), "w") as f:
            json.dump(job, f)
        return job_id

    def pending(self) -> List[Dict]:
        jobs = []
        for name in sorted(os.listdir(self.root)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.root, name)) as f:
                job = json.load(f)
            if job.get("status") in ("pending", "waiting-dependency"):
                jobs.append(job)
        return jobs

    def get(self, job_id: str) -> Optional[Dict]:
        p = self._path(job_id)
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return json.load(f)

    def update(self, job_id: str, **fields) -> None:
        job = self.get(job_id) or {"id": job_id}
        job.update(fields)
        with open(self._path(job_id), "w") as f:
            json.dump(job, f)


def _default_transcriber():
    """In-repo Whisper transcriber when weights + vocab are configured
    via $LATENTSYNC_WHISPER_CKPT / $LATENTSYNC_WHISPER_VOCAB (the
    reference shells out to an external whisper binary here,
    ref:whisper.ts:15-40); None when unconfigured."""
    vocab = os.environ.get("LATENTSYNC_WHISPER_VOCAB")
    ckpt = os.environ.get("LATENTSYNC_WHISPER_CKPT")
    if not vocab or not ckpt or not os.path.isfile(ckpt):
        # both assets are required: with the vocab alone the models
        # random-init and subtitles silently come out as gibberish
        if vocab or ckpt:
            print("in-repo transcriber unconfigured: need BOTH "
                  "LATENTSYNC_WHISPER_VOCAB and LATENTSYNC_WHISPER_CKPT "
                  f"(vocab={vocab!r}, ckpt={ckpt!r}) — subtitles disabled")
        return None
    try:
        from ..audio.transcribe import make_transcriber

        return make_transcriber()
    except Exception as e:  # noqa: BLE001 — subtitles are best-effort
        print(f"in-repo transcriber unavailable: {e}")
        return None


@dataclass
class QueueWorker:
    queue: LocalDirQueue
    api_url: str = "http://localhost:8000"
    poll_interval: float = 5.0
    tts_fn: Optional[Callable[[Dict], str]] = None       # job → audio path
    upload_fn: Optional[Callable[[str, Dict], str]] = None  # path → url
    status_listeners: List[Callable[[Dict], None]] = field(default_factory=list)
    # dynamic-clip post-processing hooks (ref:index.ts:220-246)
    transcriber: Optional[Callable[[str], List[Dict]]] = None  # audio → segments
    row_logger: Optional[object] = None      # helpers.RowLogger
    idle_shutdown: Optional[object] = None   # helpers.IdleShutdown

    def _postprocess(self, job: Dict, output: str) -> Dict:
        """Dynamic-clip tail (ref:index.ts:220-246): concat this clip after
        its dependencies' outputs, then generate subtitles for the result."""
        from . import helpers

        extra: Dict = {}
        concat_ids = job.get("concat_with") or []
        if concat_ids:
            parts = []
            for dep_id in concat_ids:
                dep = self.queue.get(dep_id)
                if not dep or not dep.get("output"):
                    raise RuntimeError(f"concat dependency {dep_id} has no output")
                parts.append(dep["output"])
            parts.append(output)
            merged = os.path.splitext(output)[0] + "_concat.mp4"
            helpers.concat_videos(parts, merged)
            output = merged
            extra["concatenated"] = True
        if job.get("subtitles"):
            if self.transcriber is None:
                self.transcriber = _default_transcriber()
            if self.transcriber is not None:
                audio_src = job.get("audio_path") or output
                uri = helpers.generate_subtitles(audio_src, self.transcriber)
                if uri:
                    extra["subtitles_uri"] = uri
        extra["output"] = output
        return extra

    def _notify(self, job: Dict) -> None:
        for listener in self.status_listeners:
            listener(job)

    def _dependencies_done(self, job: Dict) -> bool:
        for dep in job.get("dependencies", []):
            dep_job = self.queue.get(dep)
            if dep_job is None or dep_job.get("status") != "completed":
                return False
        return True

    def handle_job(self, job: Dict) -> None:
        job_id = job["id"]
        if job.get("status") == "waiting-dependency":
            if not self._dependencies_done(job):
                return
            self.queue.update(job_id, status="pending")
            job["status"] = "pending"

        job["started"] = time.time()
        self.queue.update(job_id, status="running", started=job["started"])
        self._notify({**job, "status": "running"})
        try:
            audio_path = job.get("audio_path")
            if not audio_path and self.tts_fn is not None:
                audio_path = self.tts_fn(job)  # ElevenLabs hook (ref:index.ts:173-179)
            payload = json.dumps({
                "avatar_id": job["avatar_id"],
                "audio_path": audio_path,
                "job_id": job_id,
                **{k: job[k] for k in ("inference_steps", "guidance_scale",
                                       "rotated", "darken") if k in job},
            }).encode()
            req = urllib.request.Request(
                f"{self.api_url}/process", data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                submitted = json.loads(resp.read())
            # poll the API job to completion
            while True:
                with urllib.request.urlopen(
                    f"{self.api_url}/jobs/{submitted['job_id']}", timeout=30
                ) as resp:
                    api_job = json.loads(resp.read())
                if api_job["status"] in ("completed", "failed"):
                    break
                time.sleep(1.0)
            if api_job["status"] != "completed":
                raise RuntimeError(api_job.get("error", "inference failed"))
            output = api_job["output"]
            extra = self._postprocess(job, output)
            output = extra.pop("output")
            url = self.upload_fn(output, job) if self.upload_fn else output
            self.queue.update(job_id, status="completed", output=url,
                              finished=time.time(), **extra)
            self._notify({**job, "status": "completed", "output": url, **extra})
            if self.row_logger is not None:  # BQ hook (ref:helpers/bq.ts)
                self.row_logger.insert_rows("latentsync", "jobs", [{
                    "job_id": job_id, "status": "completed", "output": url,
                    "elapsed": time.time() - job.get("started", time.time()),
                }])
        except Exception as e:  # noqa: BLE001 — per-job isolation
            self.queue.update(job_id, status="failed", error=str(e))
            self._notify({**job, "status": "failed", "error": str(e)})
            if self.row_logger is not None:
                self.row_logger.insert_rows("latentsync", "jobs", [{
                    "job_id": job_id, "status": "failed", "error": str(e),
                }])

    def run_once(self) -> int:
        jobs = self.queue.pending()
        for job in jobs:
            self.handle_job(job)
        return len(jobs)

    def run_forever(self):
        while True:
            n = self.run_once()
            if self.idle_shutdown is not None:
                self.idle_shutdown.tick(n)  # GCE cost control (ref:compute.ts)
            time.sleep(self.poll_interval)


def gcs_upload_fn(bucket: str, prefix: str = "") -> Callable[[str, Dict], str]:
    """GCS upload hook (ref:latentsync/utils/gcs.py:21, gated on the
    google-cloud-storage package)."""
    def upload(path: str, job: Dict) -> str:
        try:
            from google.cloud import storage  # type: ignore
        except ImportError as e:
            raise RuntimeError("google-cloud-storage not installed") from e
        client = storage.Client()
        blob_name = os.path.join(prefix, os.path.basename(path))
        blob = client.bucket(bucket).blob(blob_name)
        blob.upload_from_filename(path)
        return f"https://storage.googleapis.com/{bucket}/{blob_name}"

    return upload
