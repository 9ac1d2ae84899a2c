"""Option-file-driven restoration training CLI (ref:basicsr/train.py).

Usage: python -m scripts.train_restoration -opt options/vqgan_stage1.yaml \
           [--max-steps N] [--img-size 512] [--output-dir DIR]

The option file selects model_type (VQGANModel / CodeFormerIdxModel /
CodeFormerJointModel), networks, optimizer, LR schedule, EMA decay and
the FFHQ blind-degradation dataset — same knob surface as the
reference's basicsr options (ref:options/*.yml), executed by the
registry-driven OptionTrainer (latentsync_tpu/training/option_trainer.py).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", "--options", required=True)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args()

    from latentsync_tpu.training.option_trainer import OptionTrainer, parse_options

    opt = parse_options(args.options)
    trainer = OptionTrainer(opt)
    trainer.run(
        max_steps=args.max_steps,
        img_size=args.img_size,
        output_dir=args.output_dir,
        log_every=args.log_every,
    )


if __name__ == "__main__":
    main()
