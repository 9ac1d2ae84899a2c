"""Build training fileslists from processed dataset directories
(ref:tools/write_fileslist.py:19-30). Drives the UNet/SyncNet data flow:
the trainers' datasets read one video path per line.

Usage: python -m tools.write_fileslist OUT.txt DATASET_DIR [DATASET_DIR ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latentsync_tpu.utils.media import gather_video_paths_recursively


class FileslistWriter:
    def __init__(self, fileslist_path: str):
        self.fileslist_path = fileslist_path
        with open(fileslist_path, "w"):
            pass

    def append_dataset(self, dataset_dir: str) -> int:
        print(f"Dataset dir: {dataset_dir}")
        video_paths = gather_video_paths_recursively(dataset_dir)
        with open(self.fileslist_path, "a") as f:
            for video_path in video_paths:
                f.write(f"{video_path}\n")
        return len(video_paths)


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    writer = FileslistWriter(sys.argv[1])
    total = sum(writer.append_dataset(d) for d in sys.argv[2:])
    print(f"Wrote {total} paths to {sys.argv[1]}")


if __name__ == "__main__":
    main()
