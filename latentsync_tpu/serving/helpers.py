"""Serving-side job helpers: subtitles, video concat, metrics rows, VM control.

Python re-architecture of the TypeScript worker's helper modules
(ref:job-queue-listener/src/helpers/whisper.ts, ffmpeg.ts, bq.ts,
compute.ts) plus the word-timestamp video trim of
ref:latentsync/utils/whisper.py:6-49.

Design: every external service (ASR model, BigQuery, GCE) is a pluggable
callable with a local, dependency-free default — the worker keeps
functioning on a bare TPU VM, and production deployments inject real
clients. ffmpeg is driven directly via subprocess (no fluent-ffmpeg
equivalent needed).
"""

from __future__ import annotations

import base64
import json
import os
import subprocess
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence


# ---------------------------------------------------------------------------
# subtitles (ref:job-queue-listener/src/helpers/whisper.ts)
# ---------------------------------------------------------------------------


def format_cue_text(text: str, width: int = 40) -> str:
    """Split long cue text into readable lines (ref:whisper.ts:88-124):
    short text passes through; text with sentence punctuation breaks
    there; otherwise word-wrap at ~`width` chars without splitting words."""
    text = text.strip()
    if len(text) < width:
        return text
    for bp in (". ", "! ", "? ", ": ", "; "):
        if bp in text:
            # ref:whisper.ts:95-99 — text.split(bp).join(bp + "\n")
            return (bp.rstrip() + "\n").join(
                part.strip() for part in text.split(bp)
            )
    words = text.split(" ")
    lines: List[str] = [""]
    for word in words:
        if lines[-1] and len(lines[-1]) + 1 + len(word) > width:
            lines.append(word)
        else:
            lines[-1] = (lines[-1] + " " + word).strip()
    return "\n".join(lines)


def add_line_breaks_to_vtt(vtt_content: str) -> str:
    """Re-wrap every cue's text (ref:whisper.ts:44-85): walk the file,
    collect text lines between a `-->` timestamp line and the blank line
    ending the cue, and replace them with the wrapped version."""
    out: List[str] = []
    cue_text = ""
    in_cue = False
    for line in vtt_content.split("\n"):
        if "-->" in line:
            in_cue = True
            out.append(line)
            continue
        if in_cue and line.strip() == "":
            in_cue = False
            if cue_text:
                out.append(format_cue_text(cue_text))
                cue_text = ""
            out.append("")
            continue
        if in_cue:
            cue_text += line + " "
            continue
        out.append(line)
    if cue_text:
        out.append(format_cue_text(cue_text))
    return "\n".join(out)


def _vtt_ts(seconds: float) -> str:
    ms = int(round(seconds * 1000))
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"


def segments_to_vtt(segments: Sequence[Dict]) -> str:
    """[{start, end, text}] → WEBVTT document."""
    lines = ["WEBVTT", ""]
    for seg in segments:
        lines.append(f"{_vtt_ts(float(seg['start']))} --> {_vtt_ts(float(seg['end']))}")
        lines.append(str(seg["text"]).strip())
        lines.append("")
    return "\n".join(lines)


def vtt_to_data_uri(vtt_content: str) -> str:
    """(ref:whisper.ts:127-146): base64 data URI for direct embedding."""
    b64 = base64.b64encode(vtt_content.encode("utf-8")).decode("ascii")
    return f"data:text/vtt;base64,{b64}"


def generate_subtitles(
    audio_path: str,
    transcriber: Callable[[str], List[Dict]],
    output_dir: Optional[str] = None,
) -> Optional[str]:
    """audio file → VTT data URI (ref:whisper.ts:148-177).

    `transcriber(audio_path)` returns [{start, end, text}] segments — in
    production a Whisper ASR (the reference shells out to the whisper
    CLI, ref:whisper.ts:15-40); tests inject a stub. Returns None on any
    failure, mirroring the reference's undefined."""
    try:
        segments = transcriber(audio_path)
        vtt = add_line_breaks_to_vtt(segments_to_vtt(segments))
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(audio_path))[0]
            with open(os.path.join(output_dir, base + ".vtt"), "w") as f:
                f.write(vtt)
        return vtt_to_data_uri(vtt)
    except Exception as e:  # noqa: BLE001 — parity with ref error swallow
        print(f"generate_subtitles failed: {e}")
        return None


def last_word_end(whisper_data: Dict) -> float:
    """Latest word-level end timestamp (ref:latentsync/utils/whisper.py:36-40)."""
    end = 0.0
    for segment in whisper_data.get("segments", []):
        for word in segment.get("words", []):
            end = max(end, float(word.get("end", 0.0)))
    return end


def trim_video_after_last_word(
    video_path: str,
    trimmed_video_path: str,
    whisper_data: Dict,
    buffer_sec: float = 0.5,
    run: Callable[[List[str]], None] = None,
) -> float:
    """Trim the video `buffer_sec` after the last spoken word
    (ref:latentsync/utils/whisper.py:41-49). Returns the trim point."""
    trim_end = last_word_end(whisper_data) + buffer_sec
    cmd = [
        "ffmpeg", "-y", "-loglevel", "error", "-ss", "0", "-i", video_path,
        "-t", f"{trim_end:.3f}", trimmed_video_path,
    ]
    (run or _run_checked)(cmd)
    return trim_end


# ---------------------------------------------------------------------------
# video concat (ref:job-queue-listener/src/helpers/ffmpeg.ts:13-38)
# ---------------------------------------------------------------------------


def _run_checked(cmd: List[str]) -> None:
    subprocess.run(cmd, check=True, capture_output=True)


def concat_videos(
    video_paths: Sequence[str],
    output_path: str,
    run: Callable[[List[str]], None] = None,
) -> str:
    """Concatenate clips into one file with a re-encoding concat filter
    (fluent-ffmpeg's mergeToFile re-encodes too, so mismatched avatar
    clips still join). Audio streams are concatenated alongside."""
    if len(video_paths) < 2 or any(not p for p in video_paths):
        raise ValueError(f"need ≥2 valid inputs, got {video_paths!r}")
    n = len(video_paths)
    inputs: List[str] = []
    for p in video_paths:
        inputs += ["-i", p]
    fc = "".join(f"[{i}:v:0][{i}:a:0]" for i in range(n))
    fc += f"concat=n={n}:v=1:a=1[outv][outa]"
    cmd = (
        ["ffmpeg", "-y", "-loglevel", "error"] + inputs
        + ["-filter_complex", fc, "-map", "[outv]", "-map", "[outa]", output_path]
    )
    (run or _run_checked)(cmd)
    return output_path


# ---------------------------------------------------------------------------
# metrics rows (ref:job-queue-listener/src/helpers/bq.ts:17-40)
# ---------------------------------------------------------------------------


@dataclass
class RowLogger:
    """`insert_rows(dataset, table, rows)` with the BigQuery client as a
    pluggable transport. Default transport spools NDJSON to disk (one
    file per dataset.table) so job telemetry survives even without GCP
    credentials; inject `transport=` to send to a real warehouse."""

    spool_dir: str = "/tmp/latentsync_rows"
    transport: Optional[Callable[[str, str, List[Dict]], None]] = None
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def insert_rows(self, dataset_id: str, table_id: str, rows: List[Dict]) -> Dict:
        try:
            if self.transport is not None:
                self.transport(dataset_id, table_id, rows)
            else:
                os.makedirs(self.spool_dir, exist_ok=True)
                path = os.path.join(self.spool_dir, f"{dataset_id}.{table_id}.ndjson")
                with self._lock, open(path, "a") as f:
                    for row in rows:
                        f.write(json.dumps(row) + "\n")
            return {"success": True}
        except Exception as e:  # noqa: BLE001 — parity with bq.ts:31-39
            print(f"Error inserting rows: {e}")
            return {"success": False, "error": str(e)}


def bigquery_transport(project_id: str) -> Callable[[str, str, List[Dict]], None]:
    """Real BigQuery transport, gated on google-cloud-bigquery."""

    def send(dataset_id: str, table_id: str, rows: List[Dict]) -> None:
        from google.cloud import bigquery  # type: ignore

        client = bigquery.Client(project=project_id)
        table = client.dataset(dataset_id).table(table_id)
        errors = client.insert_rows_json(table, rows)
        if errors:
            raise RuntimeError(str(errors))

    return send


# ---------------------------------------------------------------------------
# instance control (ref:job-queue-listener/src/helpers/compute.ts:8-63)
# ---------------------------------------------------------------------------


def stop_vm(
    project_id: Optional[str] = None,
    zone: Optional[str] = None,
    instance_name: Optional[str] = None,
    run: Callable[[List[str]], None] = None,
) -> bool:
    """Stop this worker's VM when the queue drains (the reference's
    cost-control path). Uses the gcloud CLI (no SDK dependency); missing
    configuration is a silent no-op exactly like compute.ts:14-21."""
    zone = zone or os.environ.get("GCP_ZONE")
    instance_name = instance_name or os.environ.get("GCP_INSTANCE_NAME")
    project_id = project_id or os.environ.get("GCP_PROJECT_ID")
    if not zone or not instance_name:
        print(
            "stop_vm: environment variables missing: "
            + ("GCP_ZONE " if not zone else "")
            + ("GCP_INSTANCE_NAME" if not instance_name else "")
        )
        return False
    cmd = ["gcloud", "compute", "instances", "stop", instance_name, "--zone", zone]
    if project_id:
        cmd += ["--project", project_id]
    try:
        (run or _run_checked)(cmd)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"stop_vm failed: {e}")
        return False


@dataclass
class IdleShutdown:
    """Poll-loop hook: call `tick(n_jobs)` each cycle; after `max_idle`
    consecutive empty polls, invoke the stopper once."""

    max_idle: int = 60
    stopper: Callable[[], bool] = stop_vm
    idle_count: int = 0
    fired: bool = False

    def tick(self, n_jobs: int) -> bool:
        if n_jobs > 0:
            self.idle_count = 0
            return False
        self.idle_count += 1
        if self.idle_count >= self.max_idle and not self.fired:
            self.fired = True
            self.stopper()
            return True
        return False
