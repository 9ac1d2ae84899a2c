"""Histogram of per-video durations under a directory
(ref:tools/count_videos_time.py:20-38).

Usage: python -m tools.count_videos_time INPUT_DIR [FIG_PATH]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latentsync_tpu.utils.media import count_video_time, gather_video_paths_recursively


def main(input_dir: str, fig_path: str = "histogram.png"):
    video_paths = gather_video_paths_recursively(input_dir)
    video_times = [count_video_time(p) for p in video_paths]
    print(f"{len(video_times)} videos, total {sum(video_times) / 3600:.2f} h")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.hist(video_times, bins=30, edgecolor="black")
        plt.title("Histogram of Data Distribution")
        plt.xlabel("Video time")
        plt.ylabel("Frequency")
        plt.savefig(fig_path)
        print(f"Saved {fig_path}")
    except ImportError:
        pass
    return video_times


if __name__ == "__main__":
    main(*sys.argv[1:3])
