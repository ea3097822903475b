"""Mid-run state checkpointing / resume.

The reference has NO checkpointing — persistence is export-only
(SURVEY.md §5.4).  Here the whole engine state is plain tensors (surfel
arrays, poses, fern codes), so a checkpoint is one compressed npz per model
plus json metadata; `save` / `load` round-trip an entire session including
the fern database and model lifecycle bookkeeping.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from maskfusion_tpu.engine import MaskFusion


def save(engine: "MaskFusion", path: str):
    """Write engine state to `path` (a directory)."""
    import jax.numpy as jnp

    os.makedirs(path, exist_ok=True)
    meta = {
        "tick": engine.tick,
        "next_id": engine.next_id,
        "spawn_offset": engine.spawn_offset,
        "lost": engine.lost,
        "last_count": engine._last_count,
        "bad_tracking_streak": engine.bad_tracking_streak,
        "last_frame_recovery": engine.last_frame_recovery,
        "models": [],
        "inactive_models": [],
    }
    seg = engine.segmenter
    if seg is not None and hasattr(seg, "label_to_model"):
        meta["label_to_model"] = {
            str(k): v for k, v in seg.label_to_model.items()}

    def dump_model(model, name):
        st = model.state
        np.savez_compressed(
            os.path.join(path, f"{name}.npz"),
            pos=np.asarray(st.map.pos), conf=np.asarray(st.map.conf),
            color=np.asarray(st.map.color),
            init_time=np.asarray(st.map.init_time),
            last_seen=np.asarray(st.map.last_seen),
            normal=np.asarray(st.map.normal),
            radius=np.asarray(st.map.radius),
            count=np.asarray(st.map.count),
            pose=np.asarray(st.pose), last_delta=np.asarray(st.last_delta),
            pred_vmap=np.asarray(st.pred_vmap),
            pred_nmap=np.asarray(st.pred_nmap),
            pred_rgb=np.asarray(st.pred_rgb),
            so3_intensity=np.asarray(st.so3_intensity),
        )
        return {
            "name": name,
            "model_id": model.model_id,
            "class_id": model.class_id,
            "age": model.age,
            "unseen_count": model.unseen_count,
            "is_static": model.is_static,
            "conf_threshold": model.conf_threshold,
            "max_depth": model.max_depth,
            "initial_c2w_inv": (model.initial_c2w_inv.tolist()
                                if model.initial_c2w_inv is not None else None),
            "pose_log": [
                {"timestamp": e["timestamp"], "tick": e["tick"],
                 "pose": np.asarray(e["pose"]).tolist()}
                for e in model.pose_log
            ],
        }

    for i, model in enumerate(engine.models):
        meta["models"].append(dump_model(model, f"model{i}"))
    for i, model in enumerate(engine.inactive_models):
        meta["inactive_models"].append(dump_model(model, f"inactive{i}"))

    if engine.ferns is not None:
        fern_frames = engine.ferns.frames
        if fern_frames:
            np.savez_compressed(
                os.path.join(path, "ferns.npz"),
                poses=np.stack([f.pose for f in fern_frames]),
                src_times=np.array([f.src_time for f in fern_frames]),
                codes=np.stack([f.codes for f in fern_frames]),
                good_codes=np.array([f.good_codes for f in fern_frames]),
                rgbs=np.stack([f.rgb for f in fern_frames]),
                verts=np.stack([f.verts for f in fern_frames]),
                norms=np.stack([f.norms for f in fern_frames]),
            )
        meta["ferns"] = {
            "n_frames": len(fern_frames),
            "pos_x": engine.ferns.pos_x.tolist(),
            "pos_y": engine.ferns.pos_y.tolist(),
            "thresh_rgb": engine.ferns.thresh_rgb.tolist(),
            "thresh_d": engine.ferns.thresh_d.tolist(),
        }
    if engine.last_segmentation is not None:
        np.save(os.path.join(path, "last_seg.npy"), engine.last_segmentation)

    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load(engine: "MaskFusion", path: str):
    """Restore engine state saved by `save` into a freshly built engine with
    the same Config/resolution."""
    import jax.numpy as jnp

    from maskfusion_tpu.engine import MapState, Model
    from maskfusion_tpu.mapping.surfel_map import SurfelMap
    from maskfusion_tpu.reloc.ferns import FernFrame

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    def load_model(md):
        z = np.load(os.path.join(path, f"{md['name']}.npz"))
        state = MapState(
            map=SurfelMap(
                pos=jnp.asarray(z["pos"]), conf=jnp.asarray(z["conf"]),
                color=jnp.asarray(z["color"]),
                init_time=jnp.asarray(z["init_time"]),
                last_seen=jnp.asarray(z["last_seen"]),
                normal=jnp.asarray(z["normal"]),
                radius=jnp.asarray(z["radius"]),
                count=jnp.asarray(z["count"]),
            ),
            pose=jnp.asarray(z["pose"]),
            last_delta=jnp.asarray(z["last_delta"]),
            pred_vmap=jnp.asarray(z["pred_vmap"]),
            pred_nmap=jnp.asarray(z["pred_nmap"]),
            pred_rgb=jnp.asarray(z["pred_rgb"]),
            so3_intensity=jnp.asarray(z["so3_intensity"]),
        )
        model = Model(
            model_id=md["model_id"], state=state, class_id=md["class_id"],
            age=md["age"], unseen_count=md["unseen_count"],
            is_static=md["is_static"],
            conf_threshold=md["conf_threshold"], max_depth=md["max_depth"],
            initial_c2w_inv=(np.array(md["initial_c2w_inv"], np.float32)
                             if md["initial_c2w_inv"] else None),
        )
        model.pose_log = [
            {"timestamp": e["timestamp"], "tick": e["tick"],
             "pose": np.array(e["pose"], np.float32)}
            for e in md["pose_log"]
        ]
        model.prev_pose = np.asarray(state.pose)
        return model

    engine.models = [load_model(md) for md in meta["models"]]
    engine.inactive_models = [load_model(md) for md in meta["inactive_models"]]
    engine.tick = meta["tick"]
    engine.next_id = meta["next_id"]
    engine.spawn_offset = meta["spawn_offset"]
    engine.lost = meta["lost"]
    engine._last_count = meta["last_count"]
    engine.bad_tracking_streak = meta.get("bad_tracking_streak", 0)
    engine.last_frame_recovery = meta.get("last_frame_recovery", False)
    if (engine.segmenter is not None
            and hasattr(engine.segmenter, "label_to_model")
            and "label_to_model" in meta):
        engine.segmenter.label_to_model = {
            int(k): v for k, v in meta["label_to_model"].items()}

    if engine.ferns is not None and "ferns" in meta:
        fm = meta["ferns"]
        engine.ferns.pos_x = np.array(fm["pos_x"])
        engine.ferns.pos_y = np.array(fm["pos_y"])
        engine.ferns.thresh_rgb = np.array(fm["thresh_rgb"])
        engine.ferns.thresh_d = np.array(fm["thresh_d"])
        engine.ferns.frames = []
        if fm["n_frames"]:
            z = np.load(os.path.join(path, "ferns.npz"))
            for i in range(fm["n_frames"]):
                engine.ferns.frames.append(FernFrame(
                    frame_id=i, pose=z["poses"][i],
                    src_time=int(z["src_times"][i]), codes=z["codes"][i],
                    good_codes=int(z["good_codes"][i]), rgb=z["rgbs"][i],
                    verts=z["verts"][i], norms=z["norms"][i],
                ))
    seg_path = os.path.join(path, "last_seg.npy")
    if os.path.exists(seg_path):
        engine.last_segmentation = np.load(seg_path)
    return engine
