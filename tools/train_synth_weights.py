"""Produce YOLOv5s weights by training on synthetic meteor scenes.

The reference's pretrained weights exist only as Git-LFS pointers in this
mount (SURVEY.md §6), so the framework ships this reproducible path: train
the Flax YOLOv5s on generated star-field/streak scenes and save the
variables as weights/yolov5s_v5.flax.npz (the path the default configs
reference). Synthetic-domain weights make the DL detector and the recheck
stage functional end-to-end; for production quality, fine-tune on real
data or convert upstream weights (models/weights.py).

Usage: python tools/train_synth_weights.py [--steps 1500] [--hw 320]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--hw", type=int, default=320)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from metdetpy_tpu.models import train
    from metdetpy_tpu.models.weights import save_params
    from metdetpy_tpu.utils import relative2abs_path

    out = args.out or relative2abs_path("./weights/yolov5s_v5.flax.npz")

    class _PrintLogger:
        def info(self, msg):
            print(msg, flush=True)

    t0 = time.time()
    variables = train.fit_synthetic(
        steps=args.steps, batch=args.batch, input_hw=(args.hw, args.hw),
        lr=args.lr, seed=args.seed, log_every=50, logger=_PrintLogger())
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")
    save_params(variables, out)
    print(f"saved weights to {out}")


if __name__ == "__main__":
    main()
