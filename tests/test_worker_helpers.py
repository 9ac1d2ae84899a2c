"""Worker helper tail: subtitles/VTT, concat, row logging, idle shutdown
(ref:job-queue-listener/src/helpers/whisper.ts, ffmpeg.ts, bq.ts,
compute.ts; ref:latentsync/utils/whisper.py:6-49)."""

import base64
import json
import os

from latentsync_tpu.serving.helpers import (
    IdleShutdown,
    RowLogger,
    add_line_breaks_to_vtt,
    concat_videos,
    format_cue_text,
    generate_subtitles,
    last_word_end,
    segments_to_vtt,
    stop_vm,
    trim_video_after_last_word,
    vtt_to_data_uri,
)


def test_format_cue_text_short_passthrough():
    assert format_cue_text("hello world") == "hello world"


def test_format_cue_text_punctuation_break():
    text = "This is the first sentence. And here comes a second sentence."
    out = format_cue_text(text)
    assert "\n" in out
    assert out.splitlines()[0].endswith(".")


def test_format_cue_text_wraps_long_lines_without_splitting_words():
    text = "word " * 30
    out = format_cue_text(text.strip())
    for line in out.splitlines():
        assert len(line) <= 41
        assert all(w == "word" for w in line.split())


def test_segments_to_vtt_and_line_breaks():
    segs = [
        {"start": 0.0, "end": 1.5, "text": "short cue"},
        {"start": 1.5, "end": 9.25, "text": "a much longer cue that should be wrapped. second part here to exceed width"},
    ]
    vtt = add_line_breaks_to_vtt(segments_to_vtt(segs))
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:01.500" in vtt
    assert "00:00:01.500 --> 00:00:09.250" in vtt
    # long cue got a break
    cue2 = vtt.split("00:00:01.500 --> 00:00:09.250")[1]
    assert "\n" in cue2.strip()


def test_vtt_data_uri_roundtrip():
    uri = vtt_to_data_uri("WEBVTT\n\nhello")
    assert uri.startswith("data:text/vtt;base64,")
    assert base64.b64decode(uri.split(",", 1)[1]).decode() == "WEBVTT\n\nhello"


def test_generate_subtitles_with_stub_transcriber(tmp_path):
    def transcriber(path):
        assert path == "audio.wav"
        return [{"start": 0, "end": 2, "text": "hello there"}]

    uri = generate_subtitles("audio.wav", transcriber, output_dir=str(tmp_path))
    assert uri and uri.startswith("data:text/vtt;base64,")
    assert (tmp_path / "audio.vtt").exists()


def test_generate_subtitles_swallow_errors():
    def bad(_):
        raise RuntimeError("asr down")

    assert generate_subtitles("x.wav", bad) is None


def test_last_word_end_and_trim_cmd():
    data = {"segments": [
        {"words": [{"end": 1.0}, {"end": 2.5}]},
        {"words": [{"end": 4.25}]},
    ]}
    assert last_word_end(data) == 4.25
    cmds = []
    end = trim_video_after_last_word("in.mp4", "out.mp4", data, run=cmds.append)
    assert end == 4.75
    assert cmds[0][0] == "ffmpeg" and "-t" in cmds[0]
    assert cmds[0][cmds[0].index("-t") + 1] == "4.750"


def test_concat_videos_builds_filtergraph():
    cmds = []
    out = concat_videos(["a.mp4", "b.mp4", "c.mp4"], "out.mp4", run=cmds.append)
    assert out == "out.mp4"
    cmd = cmds[0]
    fc = cmd[cmd.index("-filter_complex") + 1]
    assert "concat=n=3:v=1:a=1" in fc
    assert cmd.count("-i") == 3


def test_concat_videos_rejects_bad_inputs():
    import pytest

    with pytest.raises(ValueError):
        concat_videos(["only.mp4"], "out.mp4", run=lambda c: None)
    with pytest.raises(ValueError):
        concat_videos(["a.mp4", ""], "out.mp4", run=lambda c: None)


def test_row_logger_spools_ndjson(tmp_path):
    logger = RowLogger(spool_dir=str(tmp_path))
    r = logger.insert_rows("latentsync", "jobs", [{"job_id": "j1"}, {"job_id": "j2"}])
    assert r["success"]
    lines = open(tmp_path / "latentsync.jobs.ndjson").read().splitlines()
    assert [json.loads(x)["job_id"] for x in lines] == ["j1", "j2"]


def test_row_logger_transport_failure_reported():
    def bad(*a):
        raise RuntimeError("no bq")

    r = RowLogger(transport=bad).insert_rows("d", "t", [{}])
    assert not r["success"] and "no bq" in r["error"]


def test_stop_vm_noop_without_config(monkeypatch):
    monkeypatch.delenv("GCP_ZONE", raising=False)
    monkeypatch.delenv("GCP_INSTANCE_NAME", raising=False)
    assert stop_vm() is False


def test_stop_vm_builds_gcloud_cmd():
    cmds = []
    ok = stop_vm(project_id="p", zone="z", instance_name="vm", run=cmds.append)
    assert ok and cmds[0][:4] == ["gcloud", "compute", "instances", "stop"]
    assert "--zone" in cmds[0] and "--project" in cmds[0]


def test_idle_shutdown_fires_once():
    fired = []
    idle = IdleShutdown(max_idle=3, stopper=lambda: fired.append(1) or True)
    for n in (2, 0, 0):
        idle.tick(n)
    assert not fired
    assert idle.tick(0)  # third consecutive idle
    idle.tick(0)
    assert fired == [1]


def test_worker_postprocess_concat_and_subs(tmp_path, monkeypatch):
    from latentsync_tpu.serving import helpers
    from latentsync_tpu.serving.worker import LocalDirQueue, QueueWorker

    q = LocalDirQueue(str(tmp_path / "q"))
    q.submit({"id": "dep1", "status": "completed", "output": "dep1.mp4"})
    calls = []
    monkeypatch.setattr(
        helpers, "concat_videos",
        lambda paths, out, run=None: calls.append(list(paths)) or out,
    )
    worker = QueueWorker(
        queue=q, transcriber=lambda p: [{"start": 0, "end": 1, "text": "hi"}]
    )
    extra = worker._postprocess(
        {"id": "j", "concat_with": ["dep1"], "subtitles": True,
         "audio_path": "a.wav"},
        "j.mp4",
    )
    assert calls == [["dep1.mp4", "j.mp4"]]
    assert extra["output"].endswith("_concat.mp4")
    assert extra["subtitles_uri"].startswith("data:text/vtt")


def test_tools_write_fileslist(tmp_path):
    from tools.write_fileslist import FileslistWriter

    d = tmp_path / "ds" / "sub"
    d.mkdir(parents=True)
    (d / "b.mp4").write_bytes(b"x")
    (d / "a.mp4").write_bytes(b"x")
    (d / "notes.txt").write_bytes(b"x")
    out = tmp_path / "list.txt"
    w = FileslistWriter(str(out))
    n = w.append_dataset(str(tmp_path / "ds"))
    assert n == 2
    lines = out.read_text().splitlines()
    assert lines == sorted(lines) and all(p.endswith(".mp4") for p in lines)
