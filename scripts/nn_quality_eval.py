"""Quality-score the committed Mask R-CNN checkpoint (VERDICT r4 #5).

Held-out evaluation of maskrcnn/checkpoints/shapes_rich_256.npz on freshly
generated rich-domain scenes (seed disjoint from training):

- eval_rich_detection: matched det IoU / cls acc / mask IoU / recall at the
  0.5 operating threshold (the engine's runtime gate).
- eval_rich_ap: COCO-style box/mask AP@0.5 and mAP@[.5:.95].

Numbers go in PARITY.md's NN quality table.  The reference ships
COCO-pretrained weights (MaskRCNN.py.in:40-68) and never reports its own
segmentation quality; no network access exists here, so quality is
demonstrated on the synthetic domain the checkpoint was trained on.

    python scripts/nn_quality_eval.py [--cpu] [--scenes 25]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--scenes", type=int, default=25)
    p.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "maskfusion_tpu", "maskrcnn", "checkpoints", "shapes_rich_256.npz"))
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from maskfusion_tpu.maskrcnn import checkpoint_io
    from maskfusion_tpu.maskrcnn.synthetic_shapes import (
        eval_rich_ap, eval_rich_detection)

    params, meta = checkpoint_io.load_params(args.ckpt)
    print("checkpoint meta:", meta, flush=True)
    t0 = time.perf_counter()
    op = eval_rich_detection(params, 256, n_scenes=args.scenes, seed=11)
    ap = eval_rich_ap(params, 256, n_scenes=args.scenes, seed=12)
    out = {"operating_point": op, "coco_ap": ap,
           "scenes": args.scenes, "wall_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
