"""Interactive demo UI (ref:gradio_app.py:12-52).

Uses gradio when installed; otherwise serves a minimal HTML form over
stdlib HTTP that drives the same inference function.
"""

from __future__ import annotations

import argparse
import html
import json
import os
import tempfile


def build_infer(args):
    from .inference import build_pipeline

    pipe = build_pipeline(args)

    def infer(video_path, audio_path, guidance_scale=1.5, inference_steps=20, seed=1247):
        out = os.path.join(tempfile.mkdtemp(), "out.mp4")
        result = pipe(
            video_path=video_path, audio_path=audio_path, video_out_path=out,
            guidance_scale=float(guidance_scale),
            num_inference_steps=int(inference_steps), seed=int(seed),
        )
        return result.video_path

    return infer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--unet-config", default="")
    p.add_argument("--unet-ckpt", default="checkpoints/latentsync_unet.pt")
    p.add_argument("--vae-ckpt", default="checkpoints/sd-vae-ft-mse.pt")
    p.add_argument("--whisper-ckpt", default="checkpoints/whisper/tiny.pt")
    args = p.parse_args()
    infer = build_infer(args)

    try:
        import gradio as gr

        demo = gr.Interface(
            fn=infer,
            inputs=[
                gr.Video(label="Input video"),
                gr.Audio(label="Input audio", type="filepath"),
                gr.Slider(1.0, 3.0, value=1.5, label="Guidance scale"),
                gr.Slider(10, 50, value=20, step=1, label="Inference steps"),
                gr.Number(value=1247, label="Seed"),
            ],
            outputs=gr.Video(label="Lip-synced output"),
            title="LatentSync TPU",
        )
        demo.launch(server_port=args.port)
        return
    except ImportError:
        pass

    # stdlib fallback UI
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    FORM = """<html><body><h2>LatentSync TPU demo</h2>
    <form method=post>
    video path: <input name=video size=60><br>
    audio path: <input name=audio size=60><br>
    guidance: <input name=guidance value=1.5>
    steps: <input name=steps value=20>
    seed: <input name=seed value=1247><br>
    <input type=submit value=Run></form>{result}</body></html>"""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = FORM.format(result="").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            from urllib.parse import parse_qs

            length = int(self.headers.get("Content-Length", 0))
            fields = parse_qs(self.rfile.read(length).decode())
            try:
                out = infer(
                    fields["video"][0], fields["audio"][0],
                    fields.get("guidance", ["1.5"])[0],
                    fields.get("steps", ["20"])[0],
                    fields.get("seed", ["1247"])[0],
                )
                result = f"<p>done: {html.escape(out)}</p>"
            except Exception as e:  # noqa: BLE001
                result = f"<p>error: {html.escape(str(e))}</p>"
            body = FORM.format(result=result).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

    print(f"demo UI on :{args.port} (gradio not installed; stdlib fallback)")
    ThreadingHTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
