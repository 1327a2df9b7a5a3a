"""Pallas TPU kernel: fused factor-graph edge stage.

The denoiser's hot op (reference ``denoise_fn.py:313-371``, redesigned in
``models/diffuser.py``) is, per edge: gather both endpoints' geometry/pose
embeddings, concatenate with the graph's time embedding, and apply the
constraint-type-specific Linear+SiLU. The XLA 'ragged' path materializes the
[B*E, 5h] edge-input matrix in HBM three times per denoiser call (concat,
sort gather, matmul read) — ~100 MB/step at the benchmark scale.

This kernel fuses the whole stage. Edges are laid out once per sampling chain
in a *tile-aligned, type-sorted* order (``make_padded_dispatch``): each
128-row tile contains edges of exactly one constraint type, so the kernel is
a standard MoE grouped matmul with the expert id scalar-prefetched per tile
(the weight block's index_map selects the type's [5h, 2h] slab; consecutive
tiles of the same type reuse the resident block). Endpoint gathers run as
one-hot matmuls on the MXU — node embeddings for the whole batch are tiny
(B*N x 2h, ~1.6 MB) and stay VMEM-resident across the grid.

Downstream ops (pose decode, masked scatter-add) consume the *sorted* row
order directly — the per-edge scatter indices are permuted once per chain in
``make_padded_dispatch`` — so no unsort gather ever runs inside the T-step
scan.

Inference-path only (no custom VJP); training keeps the XLA ragged path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class PaddedDispatch(struct.PyTreeNode):
    """Tile-aligned, type-sorted edge layout for one graph batch.

    Row space is ``M_pad = B*E + K*TILE`` sorted-padded edge slots; every
    TILE-row tile holds edges of a single constraint type. Padding slots gather
    node 0 and carry ``mask == 0``.

    Attributes:
      a1, a2:     i32[n_tiles, TILE] endpoint node ids in the flat B*N space.
      bidx:       i32[n_tiles, TILE] graph index of each edge row.
      tile_type:  i32[n_tiles] constraint type of each tile (scalar-prefetch).
      mask:       f32[M_pad] 1 for real (unmasked) edges.
      idx_packed: i32[n_tiles, 8, TILE] rows 0/1/2 = a1/a2/bidx — the kernel's
                  VMEM view (TPU block shapes need the last two dims tiled
                  (8, 128), so the three index vectors ride one 3-D block).
      use_kernel: static flag — True runs the Pallas kernel, False runs the
                  same tile-aligned sorted layout through pure-XLA ops
                  (take + ragged_dot on the pre-sorted rows; still no
                  per-step sort/unsort inside the sampling scan).
      node_counts: f32[B*N] incident real-edge endpoints per node slot — the
                  sqrt-normalization denominator. Chain-constant, so it is
                  precomputed here instead of a per-step segment_sum.
    """

    a1: jnp.ndarray
    a2: jnp.ndarray
    bidx: jnp.ndarray
    tile_type: jnp.ndarray
    mask: jnp.ndarray
    idx_packed: jnp.ndarray
    node_counts: jnp.ndarray
    use_kernel: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_tiles(self) -> int:
        return self.tile_type.shape[0]

    @property
    def rows(self) -> int:
        return self.num_tiles * TILE


def make_padded_dispatch(
    edges: jnp.ndarray,
    edge_type: jnp.ndarray,
    edge_mask: jnp.ndarray,
    num_types: int,
    num_nodes: int,
    use_kernel: bool = True,
) -> PaddedDispatch:
    """Build the tile-aligned sorted layout. jit-safe (static shapes: the
    padded row count is the static upper bound B*E + K*TILE).

    Args:
      edges:     i32[B, E, 2] endpoint node indices (graph-local).
      edge_type: i32[B, E].
      edge_mask: bool[B, E].
      num_nodes: N (max nodes per graph) — endpoint ids are emitted in the
                 flat B*N node space.
    """
    bsz, e, _ = edges.shape
    n_types = num_types
    m = bsz * e
    # static upper bound on the padded row count (each group rounds up to a
    # TILE multiple), itself a TILE multiple
    m_pad = _ceil_to(m, TILE) + n_types * TILE
    n_tiles = m_pad // TILE

    # normalize first: masked (padding) rows may carry sentinel/garbage types;
    # layout correctness must never depend on the padding convention
    tf = jnp.where(edge_mask, edge_type, 0).reshape(-1)
    order = jnp.argsort(tf, stable=True)  # sorted row -> source edge id
    counts = jnp.bincount(tf, length=n_types).astype(jnp.int32)
    padded_counts = _ceil_to_arr(counts)
    group_start = jnp.cumsum(counts) - counts  # exclusive cumsum
    gsp = jnp.cumsum(padded_counts) - padded_counts

    k_of = tf[order]
    rank_in_group = jnp.arange(m, dtype=jnp.int32) - group_start[k_of]
    dest = gsp[k_of] + rank_in_group  # padded position of each sorted row

    src = jnp.full((m_pad,), m, dtype=jnp.int32).at[dest].set(
        order.astype(jnp.int32)
    )
    valid = src < m
    src_safe = jnp.minimum(src, m - 1)

    # tiles are contiguous per type in [gsp[k], gsp[k] + padded_counts[k])
    gsp_end = jnp.cumsum(padded_counts)
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * TILE
    tile_type = jnp.clip(
        jnp.searchsorted(gsp_end, tile_starts, side="right"),
        0,
        n_types - 1,
    ).astype(jnp.int32)

    # flat endpoint ids in the B*N node space
    boff = jnp.arange(bsz, dtype=jnp.int32)[:, None] * num_nodes
    flat_a1 = (edges[..., 0].astype(jnp.int32) + boff).reshape(-1)
    flat_a2 = (edges[..., 1].astype(jnp.int32) + boff).reshape(-1)
    flat_b = (
        jnp.arange(m, dtype=jnp.int32) // e
    )  # graph id of each source edge
    flat_mask = edge_mask.reshape(-1)

    bidx = jnp.where(valid, flat_b[src_safe], 0)
    a1 = jnp.where(valid, flat_a1[src_safe], 0)
    a2 = jnp.where(valid, flat_a2[src_safe], 0)
    mask = jnp.where(valid, flat_mask[src_safe], False)

    a1 = a1.reshape(n_tiles, TILE)
    a2 = a2.reshape(n_tiles, TILE)
    bidx = bidx.reshape(n_tiles, TILE)
    idx_packed = (
        jnp.zeros((n_tiles, 8, TILE), jnp.int32)
        .at[:, 0].set(a1)
        .at[:, 1].set(a2)
        .at[:, 2].set(bidx)
    )
    maskf = mask.astype(jnp.float32)
    node_counts = jax.ops.segment_sum(
        jnp.concatenate([maskf, maskf]),
        jnp.concatenate([a1.reshape(-1), a2.reshape(-1)]),
        num_segments=bsz * num_nodes,
    )
    return PaddedDispatch(
        a1=a1,
        a2=a2,
        bidx=bidx,
        tile_type=tile_type,
        mask=maskf,
        idx_packed=idx_packed,
        node_counts=node_counts,
        use_kernel=use_kernel,
    )


def _ceil_to_arr(x: jnp.ndarray) -> jnp.ndarray:
    return -(-x // TILE) * TILE


def _kernel(
    tile_type_ref,  # scalar-prefetch [n_tiles]
    idx_ref,  # (1, 8, TILE) i32 — rows 0/1/2 = a1/a2/bidx
    nodes_ref,  # (NN, 2h)
    temb_ref,  # (BP, h)
    w_ref,  # (1, 5h, 2h) — this tile's type slab
    bias_ref,  # (1, 8, 2h) — bias in row 0
    out_ref,  # (TILE, 2h)
    *,
    hidden: int,
    cdt,
):
    nn_rows = nodes_ref.shape[0]
    bp = temb_ref.shape[0]

    def onehot_gather(idx, table_ref, width):
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, width), 1)
        oh = (idx[:, None] == cols).astype(cdt)
        return jnp.dot(
            oh, table_ref[:].astype(cdt), preferred_element_type=jnp.float32
        )

    g1p1 = onehot_gather(idx_ref[0, 0, :], nodes_ref, nn_rows)  # [TILE, 2h]
    g2p2 = onehot_gather(idx_ref[0, 1, :], nodes_ref, nn_rows)
    trow = onehot_gather(idx_ref[0, 2, :], temb_ref, bp)  # [TILE, h]

    # edge input layout matches the XLA path: [g_a1, g_a2, p_a1, p_a2, t]
    row = jnp.concatenate(
        [
            g1p1[:, :hidden],
            g2p2[:, :hidden],
            g1p1[:, hidden:],
            g2p2[:, hidden:],
            trow,
        ],
        axis=-1,
    ).astype(cdt)

    out = (
        jnp.dot(row, w_ref[0].astype(cdt), preferred_element_type=jnp.float32)
        + bias_ref[0, 0]
    )
    out_ref[:] = jax.nn.silu(out)


@functools.partial(
    jax.jit, static_argnames=("hidden", "compute_dtype", "interpret")
)
def fused_edge_bank(
    dispatch: PaddedDispatch,
    geom_emb: jnp.ndarray,  # [B, N, h]
    pose_emb: jnp.ndarray,  # [B, N, h]
    t_emb: jnp.ndarray,  # [B, h]
    w: jnp.ndarray,  # [K, 5h, 2h]
    b: jnp.ndarray,  # [K, 2h]
    *,
    hidden: int,
    compute_dtype: str = "bfloat16",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run the fused edge stage; returns SiLU(bank(edge_in)) in the sorted
    padded row order, f32[rows, 2h]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cdt = jnp.dtype(compute_dtype)
    bsz, n, h = geom_emb.shape
    assert h == hidden
    # VMEM guard: the node table (ceil(B*N,8) x 2h f32) plus one one-hot
    # gather tile ([TILE, B*N]) must fit comfortably in ~16 MB of VMEM.
    # Fail loudly with sizes instead of an opaque Mosaic compile error.
    node_bytes = _ceil_to(bsz * n, 8) * 2 * h * 4
    onehot_bytes = TILE * _ceil_to(bsz * n, 8) * jnp.dtype(cdt).itemsize
    budget = 10 * 1024 * 1024  # leave headroom for weights + activations
    if node_bytes + 3 * onehot_bytes > budget:
        raise ValueError(
            f"fused_edge_bank: B*N={bsz*n} too large for VMEM "
            f"(node table {node_bytes/2**20:.1f} MB + gathers "
            f"{3*onehot_bytes/2**20:.1f} MB > {budget/2**20:.0f} MB budget); "
            "split the eval batch or use the ragged path"
        )

    nodes = jnp.concatenate([geom_emb, pose_emb], axis=-1).reshape(
        bsz * n, 2 * h
    )
    nn_rows = _ceil_to(bsz * n, 8)
    nodes = jnp.pad(nodes, ((0, nn_rows - bsz * n), (0, 0)))
    bp = _ceil_to(bsz, 8)
    temb = jnp.pad(t_emb, ((0, bp - bsz), (0, 0)))

    n_tiles = dispatch.num_tiles
    two_h = w.shape[-1]

    # bias rides an (8, 2h)-tiled block (row 0 holds the data): TPU block
    # shapes must tile the last two dims by (8, 128)
    b_pad = jnp.zeros((b.shape[0], 8, two_h), b.dtype).at[:, 0].set(b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, TILE), lambda i, tt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nn_rows, 2 * h), lambda i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, h), lambda i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1], two_h), lambda i, tt: (tt[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, two_h), lambda i, tt: (tt[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, two_h), lambda i, tt: (i, 0), memory_space=pltpu.VMEM
        ),
    )

    return pl.pallas_call(
        functools.partial(_kernel, hidden=h, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, two_h), jnp.float32),
        interpret=interpret,
    )(
        dispatch.tile_type,
        dispatch.idx_packed,
        nodes,
        temb,
        w,
        b_pad,
    )


def sorted_edge_bank(
    dispatch: PaddedDispatch,
    geom_emb: jnp.ndarray,  # [B, N, h]
    pose_emb: jnp.ndarray,  # [B, N, h]
    t_emb: jnp.ndarray,  # [B, h]
    w: jnp.ndarray,  # [K, 5h, 2h]
    b: jnp.ndarray,  # [K, 2h]
    *,
    compute_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Pure-XLA edge stage over the same tile-aligned sorted layout.

    Same contract as ``fused_edge_bank`` (rows come out in the sorted padded
    order) but built from take + ``ragged_dot``. Because the layout is
    chain-constant, the per-step body has NO sort/unsort gathers — unlike the
    per-graph ragged path, which permutes the [B*E, 5h] edge matrix into and
    out of type order on every denoiser call inside the T-step scan.
    Differentiable (used as the safe fallback whenever the Pallas kernel
    can't run: energy/EBM paths, non-TPU backends).
    """
    cdt = jnp.dtype(compute_dtype)
    bsz, n, h = geom_emb.shape
    num_types = w.shape[0]

    nodes = jnp.concatenate([geom_emb, pose_emb], axis=-1).reshape(
        bsz * n, 2 * h
    )
    a1 = dispatch.a1.reshape(-1)
    a2 = dispatch.a2.reshape(-1)
    bidx = dispatch.bidx.reshape(-1)

    g1p1 = jnp.take(nodes, a1, axis=0)  # [M, 2h]
    g2p2 = jnp.take(nodes, a2, axis=0)
    trow = jnp.take(t_emb, bidx, axis=0)  # [M, h]
    row = jnp.concatenate(
        [g1p1[:, :h], g2p2[:, :h], g1p1[:, h:], g2p2[:, h:], trow], axis=-1
    )

    # every tile holds one type and tiles are type-sorted, so group sizes are
    # whole tiles
    group_sizes = (
        jnp.bincount(dispatch.tile_type, length=num_types).astype(jnp.int32)
        * TILE
    )
    ys = jax.lax.ragged_dot(
        row.astype(cdt), w.astype(cdt), group_sizes,
        preferred_element_type=jnp.float32,
    )
    row_type = jnp.repeat(dispatch.tile_type, TILE)
    ys = ys + b[row_type]
    return jax.nn.silu(ys)
