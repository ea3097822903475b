"""Train the rich-domain (>=256 px, multi-instance, occlusion + clutter)
Mask R-CNN and save the committed checkpoint (VERDICT r3 item 8).

    python scripts/train_rich_checkpoint.py \
        [--steps 1500] [--size 256] [--cpu] \
        [--out maskfusion_tpu/maskrcnn/checkpoints/shapes_rich_256.npz]

Run on the TPU by default (the 256 px ResNet+FPN train step is MXU-shaped);
--cpu for smoke runs.  The artifact is a float16 .npz of the flax param
tree; tests/test_maskrcnn_train.py's rich-quality test loads it instead of
re-training per run."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "maskfusion_tpu", "maskrcnn", "checkpoints",
        "shapes_rich_256.npz"))
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from maskfusion_tpu.maskrcnn import checkpoint_io
    from maskfusion_tpu.maskrcnn.synthetic_shapes import (
        eval_rich_detection, train_rich)

    t0 = time.perf_counter()
    params, losses = train_rich(args.steps, args.size, args.seed,
                                log_every=100)
    print(f"trained {args.steps} steps in {time.perf_counter() - t0:.0f}s",
          flush=True)
    quality = eval_rich_detection(params, args.size)
    print("quality:", quality, flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    checkpoint_io.save_params(args.out, params, meta={
        "domain": "synthetic_shapes_rich", "image_size": args.size,
        "steps": args.steps, "seed": args.seed, **quality})
    print("wrote", args.out, os.path.getsize(args.out) / 1e6, "MB")


if __name__ == "__main__":
    main()
