"""Train the shapes-domain Mask R-CNN and save the committed checkpoint.

    python scripts/train_shapes_checkpoint.py \
        [--steps 700] [--size 64] [--out maskfusion_tpu/maskrcnn/checkpoints/shapes_micro_64.npz]

The artifact is a float16 .npz of the flax param tree (checkpoint_io); the
test suite loads it instead of re-training 700 steps per run (VERDICT r2
item 9), and engine-level -method maskfusion tests run the REAL async NN
path with trained weights."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from maskfusion_tpu.maskrcnn import checkpoint_io
from maskfusion_tpu.maskrcnn.synthetic_shapes import (
    eval_shapes_detection, train_shapes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=700)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "maskfusion_tpu", "maskrcnn", "checkpoints",
        "shapes_micro_64.npz"))
    args = p.parse_args()
    params, losses = train_shapes(args.steps, args.size, args.seed,
                                  log_every=100)
    quality = eval_shapes_detection(params, args.size)
    print("quality:", quality)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    checkpoint_io.save_params(args.out, params, meta={
        "domain": "synthetic_shapes", "image_size": args.size,
        "steps": args.steps, "seed": args.seed, **quality})
    print("wrote", args.out, os.path.getsize(args.out) / 1e6, "MB")


if __name__ == "__main__":
    main()
