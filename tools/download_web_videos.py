"""Parallel yt-dlp dataset downloader (ref:tools/download_web_videos.py).

Reads one URL per line; downloads best mp4 into OUTPUT_DIR with a thread
pool. Requires yt-dlp on PATH (not bundled).

Usage: python -m tools.download_web_videos URLS.txt OUTPUT_DIR [WORKERS]
"""

import os
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor


def download_video(video_url: str, video_path: str) -> bool:
    cmd = [
        "yt-dlp", "-f", "bestvideo+bestaudio", "--skip-unavailable-fragments",
        "--merge-output-format", "mp4", video_url, "--output", video_path,
    ]
    try:
        subprocess.run(cmd, check=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"failed {video_url}: {e}")
        return False


def main(urls_file: str, output_dir: str, workers: int = 4):
    if shutil.which("yt-dlp") is None:
        raise SystemExit("yt-dlp not found on PATH")
    os.makedirs(output_dir, exist_ok=True)
    with open(urls_file) as f:
        urls = [u.strip() for u in f if u.strip()]
    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = list(
            pool.map(
                lambda iu: download_video(
                    iu[1], os.path.join(output_dir, f"{iu[0]:06d}.mp4")
                ),
                enumerate(urls),
            )
        )
    print(f"downloaded {sum(results)}/{len(urls)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 4)
