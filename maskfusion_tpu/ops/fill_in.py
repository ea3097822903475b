"""Fill-in: composite a model's predicted view with raw frame data.

Equivalent of FillIn + fill_rgb/vertex/normal.frag (Core/FillIn.cpp:21-166):
wherever the prediction has holes (zero confidence / invalid), substitute the
live frame's data so downstream tracking always sees a dense reference view.
`passthrough` forces the raw frame everywhere (used when tracking is lost or
in frame-to-frame RGB mode, Model.cpp:976-984)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from maskfusion_tpu.ops.splat import Prediction


class FilledView(NamedTuple):
    rgb: jnp.ndarray    # (H, W, 3) float32
    vmap: jnp.ndarray   # (H, W, 3) camera frame
    nmap: jnp.ndarray   # (H, W, 3)


def fill_in(
    pred: Prediction,
    frame_rgb: jnp.ndarray,
    frame_vmap: jnp.ndarray,
    frame_nmap: jnp.ndarray,
    passthrough: bool | jnp.ndarray = False,
) -> FilledView:
    ok = (pred.conf > 0) & jnp.isfinite(pred.vmap[..., 0])
    use_pred = jnp.logical_and(ok, jnp.logical_not(passthrough))
    sel = use_pred[..., None]
    return FilledView(
        rgb=jnp.where(sel, pred.rgb, frame_rgb.astype(jnp.float32)),
        vmap=jnp.where(sel, pred.vmap, frame_vmap),
        nmap=jnp.where(sel, pred.nmap, frame_nmap),
    )


def coverage(pred: Prediction) -> jnp.ndarray:
    """Fraction of pixels with a valid prediction — the engine's
    requiresFillIn check samples this at 1/20 scale with a 75% threshold
    (MaskFusion.cpp:630-648)."""
    ok = (pred.conf > 0) & jnp.isfinite(pred.vmap[..., 0])
    return jnp.mean(ok.astype(jnp.float32))
