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
    geom_norm: jnp.ndarray, image_dim: int = 64, soft: bool = False
) -> jnp.ndarray:
    """Rasterize normalized P1 geometry features.

    geom_norm [..., 3] = (l/W, x3/W, y3/L) -> [..., D, D] float mask.
    Container rows use (1, 1, 0)-style features whose degenerate "triangle"
    becomes a thin mask — the reference gives the container a solid color
    image instead (``worlds.py:897-901``); both are constant distinguishable
    codes, and container geometry embeddings never reach a constraint MLP in
    puzzle mode anyway (the container is argument 2 of 'in' edges, so they do;
    the encoder learns the code either way).

    ``soft=True`` anti-aliases the boundary with a one-pixel signed-distance
    alpha ramp instead of a hard threshold. The binary mask quantizes
    geometry to ~0.02 normalized units — larger than dense-count packing
    margins, which is the measured bottleneck of the round-4 image-mode
    model (``results/tri_image/diagnosis.json``: a linear probe of soft
    pixels halves the geometry residual vs binary pixels). The reference's
    rasterizer (``worlds.py:893-946``) is binary; soft masks carry the same
    content plus sub-pixel boundary information, and the satisfaction oracle
    always checks exact geometry, so the protocol is unchanged.
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

    def ex(v):
        return v[..., None, None]

    if soft:
        def edge_sd(ax, ay, bx, by):
            # signed distance of each pixel to the line a->b
            nx, ny = -(by - ay), (bx - ax)
            nrm = jnp.sqrt(nx * nx + ny * ny) + 1e-9
            return ((gx - ex(ax)) * ex(nx) + (gy - ex(ay)) * ex(ny)) / ex(nrm)

        # orient by signed area so "inside" is consistent for any winding
        area2 = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
        s = jnp.sign(area2)[..., None, None]
        d1 = edge_sd(x1, y1, x2, y2) * s
        d2 = edge_sd(x2, y2, x3, y3) * s
        d3 = edge_sd(x3, y3, x1, y1) * s
        sd = jnp.minimum(jnp.minimum(d1, d2), d3)  # >0 inside
        return jnp.clip(sd + 0.5, 0.0, 1.0)

    def tri_area(ax, ay, bx, by, cx, cy):
        return jnp.abs(ax * (by - cy) + bx * (cy - ay) + cx * (ay - by)) / 2.0

    a = tri_area(ex(x1), ex(y1), ex(x2), ex(y2), ex(x3), ex(y3))
    a1 = tri_area(gx, gy, ex(x2), ex(y2), ex(x3), ex(y3))
    a2 = tri_area(ex(x1), ex(y1), gx, gy, ex(x3), ex(y3))
    a3 = tri_area(ex(x1), ex(y1), ex(x2), ex(y2), gx, gy)
    inside = jnp.abs((a1 + a2 + a3) - a) < 1e-2 * jnp.maximum(a, 1e-6)
    return inside.astype(jnp.float32)
