"""Sharded Mask R-CNN training/fine-tuning step.

The reference runs inference-only TF on a second GPU; fine-tuning the
segmentation network on domain data is part of the framework here.  The step
is SPMD over a (dp, mp) mesh: batch sharded on dp, parameters FSDP-sharded
on mp; XLA GSPMD inserts the all-gathers/psums over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskfusion_tpu.maskrcnn.model import (
    MaskRCNN, MaskRCNNConfig, generate_anchors, rpn_loss,
)
from maskfusion_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_step(
    cfg: MaskRCNNConfig,
    mesh: Mesh,
    learning_rate: float = 1e-4,
    full_loss: bool = True,
):
    """Returns (init_fn, step_fn) where step_fn is jitted with sharded
    in/out: batch on 'dp', params FSDP on 'mp'.

    full_loss=True optimises the complete Mask R-CNN objective (RPN class/
    box + box-head class/box + mask head via proposal-target sampling,
    MaskRCNN.train_losses); False keeps the cheap RPN-only warm-up path.
    The step takes (state, rng, images, gt_boxes, gt_classes, gt_valid,
    gt_masks)."""
    model = MaskRCNN(cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    tx = optax.adam(learning_rate)

    def loss_fn(params, rng, images, gt_boxes, gt_classes, gt_valid,
                gt_masks):
        def single(rng_i, img, boxes, classes, valid, masks):
            if full_loss:
                losses = model.apply(
                    params, img[None], boxes, classes, valid, masks, rng_i,
                    method=MaskRCNN.train_losses)
                return losses["total"]
            out = model.apply(params, img[None])
            return rpn_loss(out["rpn_logits"][0], out["rpn_deltas"][0],
                            anchors, boxes, valid, cfg)

        rngs = jax.random.split(rng, images.shape[0])
        losses = jax.vmap(single)(rngs, images, gt_boxes, gt_classes,
                                  gt_valid, gt_masks)
        return jnp.mean(losses)

    def step_fn(state: TrainState, rng, images, gt_boxes, gt_classes,
                gt_valid, gt_masks):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, rng, images, gt_boxes, gt_classes, gt_valid,
            gt_masks
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def init_fn(rng, batch_size: int):
        img = jnp.zeros((cfg.image_size, cfg.image_size, 3))
        params = model.init(rng, img[None])
        params = mesh_lib.shard_pytree_fsdp(params, mesh)
        opt_state = tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    jitted = jax.jit(
        step_fn,
        in_shardings=(None, repl, batch_sh, batch_sh, batch_sh, batch_sh,
                      batch_sh),
        out_shardings=(None, repl),
        donate_argnums=(0,),
    )
    return init_fn, jitted
