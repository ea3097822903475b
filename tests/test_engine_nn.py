"""End-to-end `-method maskfusion` with the TRAINED network: frames with
NO precomputed masks flow through FrameQueue -> MaskRCNNWorker (async
thread, MaskRCNN.cpp:178-208) -> engine segmentation -> object model.

Loads the committed shapes checkpoint (scripts/train_shapes_checkpoint.py)
so the masks come from a real trained Mask R-CNN, not random weights —
the reference's operating configuration in miniature (MaskRCNN.py.in:40-68,
queue budget MainController.cpp:223)."""

import os
import time

import numpy as np
import pytest

from maskfusion_tpu.camera import CameraIntrinsics, Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData


def _checkpoint_path():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "maskfusion_tpu", "maskrcnn", "checkpoints", "shapes_micro_64.npz")


def test_engine_async_nn_spawns_object():
    path = _checkpoint_path()
    if not os.path.exists(path):
        pytest.skip("shapes checkpoint not built")
    from maskfusion_tpu.maskrcnn import checkpoint_io
    from maskfusion_tpu.maskrcnn.inference import (FrameQueue,
                                                   MaskRCNNInference,
                                                   MaskRCNNWorker)
    from maskfusion_tpu.maskrcnn.synthetic_shapes import (make_shapes_scene,
                                                          micro_config)

    S = 64
    params, _ = checkpoint_io.load_params(path)
    rng = np.random.default_rng(3)
    # one static scene: trained-domain RGB; depth = 2 m background with the
    # object region raised to 1.5 m so geometry agrees with the mask
    img, boxes, classes, valid, masks = make_shapes_scene(
        rng, S, max_objects=1)
    gt_mask = masks[0] > 0.5
    rgb = np.clip(img, 0, 255).astype(np.uint8)
    depth = np.where(gt_mask, 1.5, 2.0).astype(np.float32)

    inference = MaskRCNNInference(micro_config(S), params=params)
    queue = FrameQueue(size=30)
    worker = MaskRCNNWorker(inference, queue)

    cfg = Config(
        global_surfel_capacity=1 << 15, object_surfel_capacity=1 << 12,
        seg_method="maskfusion", use_so3=False, model_spawn_offset=0,
        seg_min_new_rel=0.005,
    )
    eng = MaskFusion(Resolution(S, S),
                     CameraIntrinsics(52.8, 52.8, 32.0, 32.0), cfg)
    try:
        waits = []
        for i in range(6):
            queue.push(FrameData(rgb=rgb.copy(), depth=depth.copy(),
                                 timestamp=float(i)))
            t0 = time.perf_counter()
            frame = None
            while frame is None and time.perf_counter() - t0 < 30:
                frame = queue.pop_ready()
                if frame is None:
                    time.sleep(0.005)
            assert frame is not None, "NN worker never labelled the frame"
            waits.append(time.perf_counter() - t0)
            assert frame.mask is not None
            eng.process_frame(frame)
        eng.drain_pipeline()
    finally:
        worker.stop()

    # the trained NN's mask must have spawned an object model
    assert len(eng.models) >= 2, [m.model_id for m in eng.models]
    obj = eng.models[1]
    assert obj.surfel_count > 10
    # segmentation IoU vs the ground-truth object mask
    seg = eng.last_segmentation == obj.model_id
    iou = (seg & gt_mask).sum() / max((seg | gt_mask).sum(), 1)
    assert iou >= 0.4, f"segmentation IoU {iou:.2f}"
    # async labelling stayed comfortably inside the 30-frame delay budget
    # (MainController.cpp:223): after warmup a label takes < 1 queue slot
    # at 24 Hz equivalents on this host
    assert max(waits[2:]) < 10.0, waits
