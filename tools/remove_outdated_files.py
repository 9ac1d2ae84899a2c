"""Delete run directories whose (lexicographic timestamp) names fall in a
date range (ref:tools/remove_outdated_files.py:18-27) — used to prune old
train-YYYY_MM_DD-HH:MM:SS checkpoint dirs.

Usage: python -m tools.remove_outdated_files INPUT_DIR BEGIN END
"""

import os
import shutil
import sys


def remove_outdated_files(input_dir: str, begin_date: str, end_date: str) -> int:
    removed = 0
    for subdir in os.listdir(input_dir):
        if begin_date <= subdir <= end_date:
            path = os.path.join(input_dir, subdir)
            shutil.rmtree(path, ignore_errors=True)
            print(f"Deleted: {path}")
            removed += 1
    return removed


if __name__ == "__main__":
    remove_outdated_files(sys.argv[1], sys.argv[2], sys.argv[3])
