"""FFHQ-style face crop/align CLI (ref:scripts/crop_align_face.py).

The reference uses dlib's detector + shape predictor; here the 68-point
source is the repo's FAN landmark detector ($LATENTSYNC_FAN_CKPT, with
S3FD face boxes via $LATENTSYNC_S3FD_CKPT) — same iBUG layout, same
FFHQ quad math (latentsync_tpu/utils/ffhq_align.py).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in_dir", "-i", required=True)
    p.add_argument("--out_dir", "-o", required=True)
    p.add_argument("--output_size", type=int, default=512)
    p.add_argument("--transform_size", type=int, default=4096)
    p.add_argument("--enable_padding", action="store_true")
    args = p.parse_args()

    import cv2
    import numpy as np

    from latentsync_tpu.utils.ffhq_align import ffhq_align_face
    from latentsync_tpu.utils.image_processor import default_landmark_detector

    detector = default_landmark_detector()
    os.makedirs(args.out_dir, exist_ok=True)
    paths = sorted(
        glob.glob(os.path.join(args.in_dir, "*.[jp][pn]g"))
        + glob.glob(os.path.join(args.in_dir, "*.jpeg"))
    )
    done = 0
    for path in paths:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        lm = np.asarray(detector(img))
        if lm.shape[0] < 68:
            print(f"skip {os.path.basename(path)}: no dense landmarks")
            continue
        aligned = ffhq_align_face(
            img, lm, output_size=args.output_size,
            transform_size=args.transform_size,
            enable_padding=args.enable_padding,
        )
        name = os.path.splitext(os.path.basename(path))[0] + ".png"
        cv2.imwrite(os.path.join(args.out_dir, name),
                    cv2.cvtColor(aligned, cv2.COLOR_RGB2BGR))
        done += 1
    print(f"aligned {done}/{len(paths)} images into {args.out_dir}")


if __name__ == "__main__":
    main()
