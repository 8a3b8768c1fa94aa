"""Combine pass: final lighting composite.

The reference's full-screen combine (Combine.comp: ``color = albedo *
(N·L * shadowMask + ambient)``, with sky/invalid pixels passed through
[RECALL]) as a pure elementwise jnp pass — XLA fuses it into the surrounding
pipeline for free.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..types import LIGHT_POINT, Light


def composite_pass(gbuf: Dict[str, jnp.ndarray], shadow: jnp.ndarray,
                   light: Light, ambient: float,
                   background: tuple) -> jnp.ndarray:
    """-> linear-space f32[H, W, 3] image."""
    n = gbuf["normal"]
    if light.kind == LIGHT_POINT:
        delta = light.position - gbuf["position"]
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-8)
        ldir = delta / jnp.sqrt(dist2)[..., None]
        falloff = 1.0 / dist2
    else:
        ldir = jnp.broadcast_to(light.direction, n.shape)
        falloff = jnp.ones(n.shape[:-1], n.dtype)
    ndl = jnp.maximum(jnp.sum(n * ldir, axis=-1), 0.0)
    radiance = light.color * light.intensity
    direct = (ndl * falloff * shadow)[..., None] * radiance
    color = gbuf["albedo"] * (direct + ambient)
    bg = jnp.asarray(background, color.dtype)
    return jnp.where(gbuf["valid"][..., None], color, bg)


def accumulate(prev: jnp.ndarray, frame_index: jnp.ndarray,
               new: jnp.ndarray) -> jnp.ndarray:
    """Temporal accumulation (config 3): running mean over frames.

    prev is the mean of ``frame_index`` frames; returns the mean including
    ``new``. This buffer doubles as checkpoint/resume state (SURVEY.md §5).
    """
    fi = frame_index.astype(new.dtype)
    return (prev * fi + new) / (fi + 1.0)
