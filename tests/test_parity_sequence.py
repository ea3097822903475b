"""Sequence-level parity harness (north-star regression).

The reference is evaluated on TUM fr1/fr3 and Co-Fusion sequences
(README "Dataset and evaluation tools"); without network access the same
pipeline runs on a generated TUM-layout sequence — aggressive SE(3)
camera loop + an independently moving object — through the FULL CLI
(reader -> engine -> exporters), then scores ATE-RMSE and instance IoU
with the in-tree evaluation tools.  The VGA/200-frame version of this run
(scripts/parity_vga.py) produces the numbers recorded in PARITY.md; this
CI configuration is reduced (160x120) but exercises the identical path.
"""

import os

import numpy as np


def test_sequence_ate_and_iou(tmp_path):
    from maskfusion_tpu.main import main
    from maskfusion_tpu.tools import make_sequence
    from maskfusion_tpu.tools.evaluate import ate_rmse, segmentation_iou

    seq = str(tmp_path / "seq")
    make_sequence.generate(seq, frames=72, width=160, height=120, seed=3)
    out = str(tmp_path / "out")
    rc = main([
        "-dir", seq, "-method", "precomputed",
        "-cal", os.path.join(seq, "calibration.txt"),
        "-exportdir", out, "-ep", "-es", "-q", "-nso",
        "--global-capacity", str(1 << 17),
        "--object-capacity", str(1 << 13),
    ])
    assert rc == 0

    ate = ate_rmse(os.path.join(out, "poses-0.txt"),
                   os.path.join(seq, "groundtruth.txt"))
    assert ate["pairs"] >= 70
    # headroom: VGA parity runs land well below this (PARITY.md)
    assert ate["rmse"] < 0.030, f"camera ATE-RMSE {ate['rmse']*100:.2f} cm"

    iou = segmentation_iou(out, os.path.join(seq, "gt_masks"),
                           est_offset=-1)
    assert iou["frames"] >= 70
    assert iou["mean_iou"] > 0.65, f"instance IoU {iou['mean_iou']:.3f}"

    # the object model's trajectory follows the ground-truth object path:
    # compare RELATIVE displacement over the tracked span
    obj_paths = [p for p in os.listdir(out)
                 if p.startswith("poses-") and not p.endswith("-0.txt")]
    assert obj_paths, "no object pose log exported"
    # the aggressive camera can swing the object to the frame edge and
    # trigger a jump-deactivation + respawn (reference smart-delete
    # semantics), so score the LONGEST surviving object log's span
    est = max((np.loadtxt(os.path.join(out, p)).reshape(-1, 8)
               for p in obj_paths), key=len)
    gt = np.loadtxt(os.path.join(seq, "object_groundtruth.txt"))
    # align by timestamp
    gt_by_ts = {round(r[0], 3): r[1:4] for r in gt}
    pairs = [(r[1:4], gt_by_ts[round(r[0], 3)]) for r in est
             if round(r[0], 3) in gt_by_ts]
    assert len(pairs) >= 20
    est_d = pairs[-1][0] - pairs[0][0]
    gt_d = pairs[-1][1] - pairs[0][1]
    err = np.linalg.norm(est_d - gt_d)
    # 8 cm headroom at this reduced 160x120 CI resolution (the object is
    # ~45x40 px and the camera loop is aggressive); before the frozen-gate
    # and pyramid-registration fixes this diverged to ~1.9 m
    assert err < 0.08, f"object displacement error {err*100:.2f} cm"
