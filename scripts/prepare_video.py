"""Avatar onboarding: video → precomputed affine bundle
(ref:scripts/prepare_video.py:11-47).

python -m scripts.prepare_video --video avatar.mp4 --avatar-id alice \
    --store /data/avatars
"""

from __future__ import annotations

import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--avatar-id", required=True)
    p.add_argument("--store", default="/tmp/avatars")
    p.add_argument("--resolution", type=int, default=256)
    args = p.parse_args()

    from latentsync_tpu.serving.artifacts import generate_affine_bundle
    from latentsync_tpu.utils.image_processor import ImageProcessor

    os.makedirs(args.store, exist_ok=True)
    video_dst = os.path.join(args.store, args.avatar_id + ".mp4")
    if os.path.abspath(args.video) != os.path.abspath(video_dst):
        shutil.copy(args.video, video_dst)

    processor = ImageProcessor(args.resolution)
    bundle = generate_affine_bundle(
        processor, video_dst, os.path.join(args.store, args.avatar_id + ".npz")
    )
    print(f"avatar ready: {video_dst} bundle: {bundle}")


if __name__ == "__main__":
    main()
