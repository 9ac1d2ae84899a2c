"""Total duration of every video in a fileslist
(ref:tools/count_total_videos_time.py:19-31).

Usage: python -m tools.count_total_videos_time FILESLIST.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latentsync_tpu.utils.media import count_video_time


def count_total_videos_time(fileslist_path: str) -> float:
    with open(fileslist_path) as f:
        filepaths = [line.strip() for line in f if line.strip()]
    total = sum(count_video_time(p) for p in filepaths)
    print(f"Fileslist path: {fileslist_path}")
    print(f"Total videos time: {round(total / 3600)} hours")
    return total


if __name__ == "__main__":
    count_total_videos_time(sys.argv[1])
