"""Display rendering: Phong shading and normal-map coloring.

Re-designs ``render_image_kernel`` / ``tangent_colors_kernel``
(reference: tfusion/src/cuda/imgproc.cu:407-570) and the raycast display
shaders (reference: tfusion/include/tfusion/cuda/
VisualisationEngine_Shared.hpp:272-498) as vectorized image ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def phong_shade(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    light_pos: jnp.ndarray,
    view_pos: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greyscale Phong shading of a point+normal map -> uint8 [H, W, 3].

    Same lighting model and coefficients as the reference
    (Ka=0.3, Kd=0.5, Ks=0.2, n=20; reference: imgproc.cu:433-450); invalid
    pixels get the reference's vertical background gradient
    (reference: imgproc.cu:476-481).
    """
    ka, kd, ks, spec_n = 0.3, 0.5, 0.2, 20.0
    valid = jnp.any(points != 0.0, axis=-1)

    eye = jnp.zeros(3, points.dtype) if view_pos is None else view_pos
    l_dir = _normalize(light_pos - points)
    v_dir = _normalize(eye - points)
    n = normals
    ndotl = jnp.sum(n * l_dir, axis=-1)
    r_dir = _normalize(2.0 * n * ndotl[..., None] - l_dir)
    rdotv = jnp.maximum(jnp.sum(r_dir * v_dir, axis=-1), 0.0)
    intensity = ka + kd * jnp.maximum(ndotl, 0.0) + ks * rdotv**spec_n
    grey = jnp.clip(intensity, 0.0, 1.0)

    h = points.shape[0]
    wgrad = jnp.linspace(0.0, 1.0, h, dtype=points.dtype)[:, None]
    bg_top = jnp.array([2.0, 2.0, 4.0], points.dtype) / 255.0
    bg_bot = jnp.array([120.0, 120.0, 236.0], points.dtype) / 255.0
    bg = bg_top * (1.0 - wgrad[..., None]) + bg_bot * wgrad[..., None]

    rgb = jnp.where(valid[..., None], grey[..., None] * jnp.ones(3, grey.dtype), bg)
    return (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def render_confidence_rgb(
    confidence: jnp.ndarray,
    hit: jnp.ndarray,
    max_weight: float,
) -> jnp.ndarray:
    """Fusion-confidence heatmap -> uint8 [H, W, 3]: green = fully fused
    (weight at max_weight), red = freshly observed, black = miss.

    The RENDER_COLOUR_FROM_CONFIDENCE display mode (reference: enum
    VisualisationEngine.hpp:12-109; pixel shader drawPixelConfidence,
    VisualisationEngine_Shared.hpp:272-498 — same confidence-normalized
    red->green ramp).
    """
    c = jnp.clip(confidence / max_weight, 0.0, 1.0)
    rgb = jnp.stack([1.0 - c, c, jnp.zeros_like(c)], axis=-1)
    rgb = jnp.where(hit[..., None], rgb, 0.0)
    return (rgb * 255.0).astype(jnp.uint8)


def render_normals_rgb(normals: jnp.ndarray) -> jnp.ndarray:
    """Normal map -> RGB visualization, (n+1)/2 mapping (the reference's
    cleaner #if 0 variant of tangent_colors_kernel, imgproc.cu:549-553)."""
    valid = jnp.any(normals != 0.0, axis=-1)
    rgb = jnp.clip((-normals + 1.0) * 0.5, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    return (rgb * 255.0).astype(jnp.uint8)
