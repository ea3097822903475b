"""VGA/200-frame parity run (numbers recorded in PARITY.md).

Generates (once) a 640x480 200-frame TUM-layout synthetic sequence with a
moving object, runs the full CLI pipeline on the TPU, and prints ATE-RMSE
+ instance IoU from the in-tree evaluation tools.

    python scripts/parity_vga.py [--static] [--frames 200]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--static", action="store_true",
                   help="background-only static-mode run")
    p.add_argument("--method", default="precomputed",
                   choices=["precomputed", "cofusion", "maskfusion"],
                   help="segmentation source for the moving-object run: "
                   "precomputed = gt-mask seam (plumbing parity), cofusion "
                   "= geometric SLIC+CRF (CfSegmentation parity, VERDICT "
                   "r4 #9), maskfusion = geometric+semantic")
    p.add_argument("--seq-dir", default="/tmp/parity_seq_vga")
    p.add_argument("--out-dir", default="/tmp/parity_out_vga")
    args = p.parse_args()

    from maskfusion_tpu.tools import make_sequence
    from maskfusion_tpu.tools.evaluate import ate_rmse, segmentation_iou
    from maskfusion_tpu.main import main as cli

    seq = args.seq_dir + ("_static" if args.static else "")
    if not os.path.exists(os.path.join(seq, "groundtruth.txt")):
        print(f"generating {args.frames} VGA frames in {seq} ...", flush=True)
        make_sequence.generate(seq, frames=args.frames, width=640,
                               height=480, with_object=not args.static)
    out = args.out_dir + ("_static" if args.static else
                          "" if args.method == "precomputed"
                          else "_" + args.method)
    t0 = time.perf_counter()
    argv = ["-dir", seq, "-cal", os.path.join(seq, "calibration.txt"),
            "-exportdir", out, "-ep", "-q",
            # exact sequential dataflow: parity measures ACCURACY, and the
            # prefused schedule's lifecycle lag depends on transfer timing
            # (nondeterministic on the remote transport).  bench.py measures
            # the shipping prefused schedule's speed.
            "--pipeline", "exact"]
    if args.static:
        argv += ["-static"]
    else:
        argv += ["-method", args.method, "-es"]
    rc = cli(argv)
    wall = time.perf_counter() - t0
    assert rc == 0
    res = {"frames": args.frames, "wall_s": round(wall, 1),
           "fps": round(args.frames / wall, 2),
           "mode": "static" if args.static else args.method}
    res["ate"] = ate_rmse(os.path.join(out, "poses-0.txt"),
                          os.path.join(seq, "groundtruth.txt"))
    if not args.static:
        res["iou"] = segmentation_iou(out, os.path.join(seq, "gt_masks"),
                                      est_offset=-1)
        res["object"] = object_displacement(out, seq)
    print(json.dumps(res, indent=2))


def object_displacement(out, seq):
    """Object-trajectory displacement error vs the generator's ground
    truth: est/gt positions are re-based to their first common frame (the
    object model's frame origin is arbitrary), then RMSE/final/max over
    the LONGEST surviving object log (jump-deactivation can respawn)."""
    import numpy as np

    obj_paths = [p for p in os.listdir(out)
                 if p.startswith("poses-") and p != "poses-0.txt"]
    if not obj_paths:
        return None
    est = max((np.loadtxt(os.path.join(out, p)).reshape(-1, 8)
               for p in obj_paths), key=len)
    gt = np.loadtxt(os.path.join(seq, "object_groundtruth.txt"))
    gt_by_ts = {round(r[0], 3): r[1:4] for r in gt}
    pairs = [(r[1:4], gt_by_ts[round(r[0], 3)]) for r in est
             if round(r[0], 3) in gt_by_ts]
    if len(pairs) < 2:
        return None
    e = np.array([p[0] for p in pairs])
    g = np.array([p[1] for p in pairs])
    err = np.linalg.norm((e - e[0]) - (g - g[0]), axis=1)
    return {
        "rmse_m": float(np.sqrt((err ** 2).mean())),
        "final_m": float(err[-1]),
        "max_m": float(err.max()),
        "gt_path_m": float(np.sum(np.linalg.norm(
            np.diff(g - g[0], axis=0), axis=1))),
        "frames": len(pairs),
    }


if __name__ == "__main__":
    main()
