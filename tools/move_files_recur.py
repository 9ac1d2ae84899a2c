"""Recursively move .mp4 files preserving directory structure, skipping
existing outputs (ref:tools/move_files_recur.py:22-40).

Usage: python -m tools.move_files_recur INPUT_DIR OUTPUT_DIR
"""

import os
import shutil
import sys


def gather_paths(input_dir: str, output_dir: str, paths: list):
    os.makedirs(output_dir, exist_ok=True)
    for name in sorted(os.listdir(input_dir)):
        src = os.path.join(input_dir, name)
        if name.endswith(".mp4"):
            if os.path.isfile(os.path.join(output_dir, name)):
                continue
            paths.append((src, output_dir))
        elif os.path.isdir(src):
            gather_paths(src, os.path.join(output_dir, name), paths)


def main(input_dir: str, output_dir: str):
    paths: list = []
    print(f"Recursively gathering video paths of {input_dir} ...")
    gather_paths(input_dir, output_dir, paths)
    for src, dst_dir in paths:
        shutil.move(src, dst_dir)
    print(f"Moved {len(paths)} files")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
