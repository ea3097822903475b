"""Offline mask generation.

Equivalent of Core/Segmentation/MaskRCNN/offline_runner.py (179 LoC in the
reference): run Mask R-CNN over a directory of color images and write
Mask####.png id-images + Mask####.png.txt class/ROI files compatible with
`-maskdir` (ImageLogReader), plus optional visualisations.  This doubles as
the determinism seam: freeze the stochastic NN output to files once, then
SLAM runs are reproducible (SURVEY.md §4).

Usage:
  python -m maskfusion_tpu.maskrcnn.offline_runner -i <indir> -o <outdir>
         [--prefix Color] [--viz] [--filter 1,2,3] [--threshold 0.55]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser("offline_runner")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--prefix", default="Color")
    p.add_argument("--outprefix", default="Mask")
    p.add_argument("--threshold", type=float, default=0.55)
    p.add_argument("--filter", default="",
                   help="comma-separated class ids to keep")
    p.add_argument("--viz", action="store_true")
    p.add_argument("--params", help="npz/msgpack checkpoint of weights")
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    from maskfusion_tpu.frame import FrameData
    from maskfusion_tpu.maskrcnn.inference import MaskRCNNInference
    from maskfusion_tpu.maskrcnn.model import MaskRCNNConfig

    filt = [int(c) for c in args.filter.split(",") if c] or None
    cfg = MaskRCNNConfig(score_threshold=args.threshold)
    inference = MaskRCNNInference(cfg, filter_classes=filt)
    if args.params:
        inference.params = _load_params(args.params)

    os.makedirs(args.output, exist_ok=True)
    names = sorted(
        n for n in os.listdir(args.input)
        if n.startswith(args.prefix)
        and os.path.splitext(n)[1].lower() in (".png", ".jpg", ".jpeg")
    )
    for n, name in enumerate(names):
        idx = "".join(c for c in os.path.splitext(name)[0] if c.isdigit())
        bgr = cv2.imread(os.path.join(args.input, name))
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        frame = FrameData(rgb=rgb,
                          depth=np.zeros(rgb.shape[:2], np.float32))
        inference.execute(frame)
        out_png = os.path.join(args.output, f"{args.outprefix}{idx}.png")
        cv2.imwrite(out_png, frame.mask)
        with open(out_png + ".txt", "w") as f:
            f.write(" ".join(str(c) for c in (frame.class_ids or [0])[1:]))
            f.write("\n")
            for roi in frame.rois or []:
                f.write(" ".join(str(v) for v in roi) + "\n")
        if args.viz:
            from maskfusion_tpu.io.export import export_label_image

            export_label_image(args.output, int(idx or n), frame.mask)
        print(f"[{n + 1}/{len(names)}] {name}: "
              f"{len(frame.class_ids or [0]) - 1} instances", flush=True)
    return 0


def _load_params(path):
    import numpy as np
    import jax

    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    z = np.load(path, allow_pickle=True)
    return jax.tree.map(np.asarray, z["params"].item())


if __name__ == "__main__":
    sys.exit(main())
