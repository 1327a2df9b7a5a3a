"""On-device rasterization of canonical triangle shape images.

Capability parity: reference ``envs/worlds.py:893-946`` (get_triangle_image):
the canonical P1 triangle is drawn into a DxD binary mask used by the CNN
geometry encoder of the image input mode. The reference rasterizes with a
per-pixel Python loop at data-generation time and ships 64x64 images inside
every dataset row (``data_transforms.py:112-131``); here the mask is computed
from the 3 canonical geometry numbers on device (vectorized point-in-triangle
over the pixel grid), so datasets stay tiny and the rasterizer fuses into the
jitted forward.

Pixel mapping (reference ``worlds.py:910-918``, P1 encoding): the image is
indexed canvas[x, y]; P1 sits at the center (D/2, D/2); the canonical base
edge extends along the image y axis by l/(2W)*D; the third vertex maps to
(D/2 - y3/(2L)*D, D/2 + x3/(2W)*D). For *normalized* features
(l/W, x3/W, y3/L) the tray dimensions cancel: offsets are simply
feature * D/2.
"""

from __future__ import annotations

import jax.numpy as jnp


def rasterize_geom_features(
    geom_norm: jnp.ndarray, image_dim: int = 64
) -> jnp.ndarray:
    """Rasterize normalized P1 geometry features.

    geom_norm [..., 3] = (l/W, x3/W, y3/L) -> [..., D, D] float mask.
    Container rows use (1, 1, 0)-style features whose degenerate "triangle"
    becomes a thin mask — the reference gives the container a solid color
    image instead (``worlds.py:897-901``); both are constant distinguishable
    codes, and container geometry embeddings never reach a constraint MLP in
    puzzle mode anyway (the container is argument 2 of 'in' edges, so they do;
    the encoder learns the code either way).
    """
    d = image_dim
    half = d / 2.0

    x1 = jnp.full(geom_norm.shape[:-1], half)
    y1 = jnp.full(geom_norm.shape[:-1], half)
    x2 = x1
    y2 = y1 + geom_norm[..., 0] * half
    x3 = x1 - geom_norm[..., 2] * half
    y3 = y1 + geom_norm[..., 1] * half

    gx = jnp.arange(d, dtype=jnp.float32)[:, None]  # canvas row = x
    gy = jnp.arange(d, dtype=jnp.float32)[None, :]

    def tri_area(ax, ay, bx, by, cx, cy):
        return jnp.abs(ax * (by - cy) + bx * (cy - ay) + cx * (ay - by)) / 2.0

    def ex(v):
        return v[..., None, None]

    a = tri_area(ex(x1), ex(y1), ex(x2), ex(y2), ex(x3), ex(y3))
    a1 = tri_area(gx, gy, ex(x2), ex(y2), ex(x3), ex(y3))
    a2 = tri_area(ex(x1), ex(y1), gx, gy, ex(x3), ex(y3))
    a3 = tri_area(ex(x1), ex(y1), ex(x2), ex(y2), gx, gy)
    inside = jnp.abs((a1 + a2 + a3) - a) < 1e-2 * jnp.maximum(a, 1e-6)
    return inside.astype(jnp.float32)
