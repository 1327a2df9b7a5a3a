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

``diff_edge_bank`` adds a custom VJP (Pallas forward, XLA backward over the
same sorted layout) so energy-based sampling can ride the kernel; training
keeps the XLA ragged path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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

    Large batches are **chunked** (``chunk_graphs`` graphs per chunk): each
    chunk gets its own type-sorted tile run and the Pallas kernel walks a
    (chunk, tile) grid with only that chunk's node table VMEM-resident —
    the one-hot gather width stays O(chunk_graphs*N) instead of O(B*N), so
    candidate fan-out scales without blowing VMEM. Chunking is a kernel-side
    layout detail: ``a1/a2/bidx/mask/node_counts`` always use GLOBAL flat ids,
    so every downstream consumer (decoder scatter, energy segment-sum,
    ``sorted_edge_bank``) is chunk-agnostic. The XLA sorted path is never
    chunked (rows must be globally type-contiguous for ``ragged_dot``).

    Attributes:
      a1, a2:     i32[n_tiles, TILE] endpoint node ids in the flat B*N space.
      bidx:       i32[n_tiles, TILE] graph index of each edge row.
      tile_type:  i32[n_tiles] constraint type of each tile (scalar-prefetch);
                  i32[C, n_tiles_c] when chunked. The SENTINEL value K
                  (= num_types) marks all-phantom tiles — masked edge slots
                  sort into a tail group so the kernel can skip their
                  gathers + matmul entirely (a padded batch executes only
                  its real tiles).
      mask:       f32[M_pad] 1 for real (unmasked) edges.
      idx_packed: i32[n_tiles, 8, TILE] rows 0/1/2 = a1/a2/bidx — the kernel's
                  VMEM view (TPU block shapes need the last two dims tiled
                  (8, 128), so the three index vectors ride one 3-D block).
                  When chunked: i32[C, n_tiles_c, 8, TILE] with CHUNK-LOCAL
                  ids (a1/a2 in the chunk's Bc*N node space, bidx in Bc).
      use_kernel: static flag — True runs the Pallas kernel, False runs the
                  same tile-aligned sorted layout through pure-XLA ops
                  (take + ragged_dot on the pre-sorted rows; still no
                  per-step sort/unsort inside the sampling scan).
      node_counts: f32[B*N] incident real-edge endpoints per node slot — the
                  sqrt-normalization denominator. Chain-constant, so it is
                  precomputed here instead of a per-step segment_sum.
      chunk_graphs: static int — graphs per kernel chunk (None = unchunked).
    """

    a1: jnp.ndarray
    a2: jnp.ndarray
    bidx: jnp.ndarray
    tile_type: jnp.ndarray
    mask: jnp.ndarray
    idx_packed: jnp.ndarray
    node_counts: jnp.ndarray
    use_kernel: bool = struct.field(pytree_node=False, default=True)
    chunk_graphs: int | None = struct.field(pytree_node=False, default=None)
    #: chain-constant per-row geometry contribution to the bank pre-activation
    #: (g_a1 @ W1 + g_a2 @ W2, per row type) — attach via
    #: ``compute_edge_const`` to route the no-grad sampling forward through
    #: the split-bank kernel v2 (``fused_edge_bank_v2``): the per-step
    #: one-hot gather then touches only the [NN, h] pose table instead of the
    #: [NN, 2h] geom|pose table, and the geom half of the bank matmul is paid
    #: once per chain instead of once per step. Round-5 roofline fix: the
    #: round-4 bench measured one-hot gathers executing 4.2x the model FLOPs
    #: (BENCH_r04.json fanout rows).
    edge_const: jnp.ndarray | None = None
    #: i32[B*E] — inverse of the type sort: source edge slot (b, e) ->
    #: its padded sorted-row position (global across chunks). Chain-
    #: constant. Lets the denoiser aggregate WITHOUT a scatter: unsort the
    #: [rows, 2, P] edge outputs back to the regular [B, E, 2, P] layout
    #: (one take) and reduce onto the N local node slots with a batched
    #: one-hot einsum — a 2.4x cheaper aggregation than the flat B*N
    #: segment_sum on TPU (scatter-add serializes; see
    #: results/v2_kernel_profile.json).
    edge_to_row: jnp.ndarray | None = None

    @property
    def num_tiles(self) -> int:
        return self.a1.shape[0]

    @property
    def rows(self) -> int:
        return self.num_tiles * TILE


def _build_layout(edges, edge_type, edge_mask, num_types, num_nodes):
    """Type-sorted tile layout for ONE batch: local ids, vmap-able over
    chunks. Returns (a1, a2, bidx, mask, tile_type) with a1/a2 in the flat
    bsz*num_nodes node space and bidx in [0, bsz)."""
    bsz, e, _ = edges.shape
    n_types = num_types
    # masked (phantom) edge slots sort into a SENTINEL tail group K so the
    # kernel can skip compute on all-phantom tiles (`tile_type == num_types`)
    # — a padded batch with E_max slots but few real edges per graph would
    # otherwise execute every phantom row's gathers + matmul (at qual scale
    # ~3x excess tiles; the one-hot gathers dominate executed FLOPs)
    n_groups = num_types + 1
    m = bsz * e
    # static upper bound on the padded row count (each group rounds up to a
    # TILE multiple), itself a TILE multiple
    m_pad = _ceil_to(m, TILE) + n_groups * TILE
    n_tiles = m_pad // TILE

    # normalize first: layout correctness must never depend on whatever
    # sentinel/garbage types the padding convention leaves in masked rows
    tf = jnp.where(edge_mask, edge_type, n_types).reshape(-1)
    order = jnp.argsort(tf, stable=True)  # sorted row -> source edge id
    counts = jnp.bincount(tf, length=n_groups).astype(jnp.int32)
    padded_counts = _ceil_to_arr(counts)
    group_start = jnp.cumsum(counts) - counts  # exclusive cumsum
    gsp = jnp.cumsum(padded_counts) - padded_counts

    k_of = tf[order]
    rank_in_group = jnp.arange(m, dtype=jnp.int32) - group_start[k_of]
    dest = gsp[k_of] + rank_in_group  # padded position of each sorted row

    src = jnp.full((m_pad,), m, dtype=jnp.int32).at[dest].set(
        order.astype(jnp.int32)
    )
    # inverse mapping: source edge slot -> its padded sorted-row position.
    # Chain-constant; lets the aggregation UNSORT edge outputs back to the
    # regular [B, E] layout with one take and aggregate via a batched
    # one-hot einsum over the N local node slots instead of a flat
    # segment_sum (scatter-add) over B*N ids — on TPU the scatter costs
    # ~60% of the whole denoiser step at fan-out x20 (2.44 ms of 3.97,
    # results/v2_kernel_profile.json) while take+einsum costs ~1.0 ms.
    e2r = jnp.zeros((m,), jnp.int32).at[order.astype(jnp.int32)].set(
        dest.astype(jnp.int32)
    )
    valid = src < m
    src_safe = jnp.minimum(src, m - 1)

    # tiles are contiguous per group in [gsp[k], gsp[k] + padded_counts[k]);
    # tiles past the last group (static-bound slack) read as padding (K)
    gsp_end = jnp.cumsum(padded_counts)
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * TILE
    tile_type = jnp.clip(
        jnp.searchsorted(gsp_end, tile_starts, side="right"),
        0,
        n_groups - 1,
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
    return a1, a2, bidx, mask, tile_type, e2r


def make_padded_dispatch(
    edges: jnp.ndarray,
    edge_type: jnp.ndarray,
    edge_mask: jnp.ndarray,
    num_types: int,
    num_nodes: int,
    use_kernel: bool = True,
    chunk_graphs: int | None = None,
) -> PaddedDispatch:
    """Build the tile-aligned sorted layout. jit-safe (static shapes: the
    padded row count is the static upper bound B*E + K*TILE).

    Args:
      edges:     i32[B, E, 2] endpoint node indices (graph-local).
      edge_type: i32[B, E].
      edge_mask: bool[B, E].
      num_nodes: N (max nodes per graph) — endpoint ids are emitted in the
                 flat B*N node space.
      chunk_graphs: graphs per Pallas-kernel chunk (see PaddedDispatch);
                 only meaningful with ``use_kernel=True``. The batch is
                 padded with empty graphs to a chunk multiple; padding rows
                 carry ``mask == 0`` and global id 0.
    """
    bsz, e, _ = edges.shape

    if chunk_graphs is None or chunk_graphs >= bsz or not use_kernel:
        a1, a2, bidx, mask, tile_type, edge_to_row = _build_layout(
            edges, edge_type, edge_mask, num_types, num_nodes
        )
        n_tiles = a1.shape[0]
        idx_packed = (
            jnp.zeros((n_tiles, 8, TILE), jnp.int32)
            .at[:, 0].set(a1)
            .at[:, 1].set(a2)
            .at[:, 2].set(bidx)
        )
        chunk = None
    else:
        bc = chunk_graphs
        n_chunks = -(-bsz // bc)
        pad_b = n_chunks * bc - bsz
        edges_p = jnp.pad(edges, ((0, pad_b), (0, 0), (0, 0)))
        etype_p = jnp.pad(edge_type, ((0, pad_b), (0, 0)))
        emask_p = jnp.pad(
            edge_mask, ((0, pad_b), (0, 0)), constant_values=False
        )
        la1, la2, lbidx, lmask, tile_type, le2r = jax.vmap(
            _build_layout, in_axes=(0, 0, 0, None, None)
        )(
            edges_p.reshape(n_chunks, bc, e, 2),
            etype_p.reshape(n_chunks, bc, e),
            emask_p.reshape(n_chunks, bc, e),
            num_types,
            num_nodes,
        )  # local ids: a1/a2 in bc*N space, bidx in bc; [C, n_tiles_c, TILE]
        idx_packed = (
            jnp.zeros(la1.shape[:2] + (8, TILE), jnp.int32)
            .at[:, :, 0].set(la1)
            .at[:, :, 1].set(la2)
            .at[:, :, 2].set(lbidx)
        )
        # globalize for the chunk-agnostic downstream consumers; rows of
        # phantom padding graphs (mask==0) are pinned to id 0
        coff = jnp.arange(n_chunks, dtype=jnp.int32)[:, None, None]
        maskb = lmask.reshape(n_chunks, -1, TILE)
        a1 = jnp.where(maskb, la1 + coff * (bc * num_nodes), 0)
        a2 = jnp.where(maskb, la2 + coff * (bc * num_nodes), 0)
        bidx = jnp.where(maskb, lbidx + coff * bc, 0)
        a1 = a1.reshape(-1, TILE)
        a2 = a2.reshape(-1, TILE)
        bidx = bidx.reshape(-1, TILE)
        mask = lmask.reshape(-1)
        # globalize the inverse map: chunk c's rows start at c * rows_per
        # chunk in the flattened row space; padded phantom graphs are the
        # tail of the last chunk, so slicing to the real edge count drops
        # exactly their entries
        rows_per_chunk = la1.shape[1] * TILE
        coff2 = jnp.arange(n_chunks, dtype=jnp.int32)[:, None]
        edge_to_row = (le2r + coff2 * rows_per_chunk).reshape(-1)[: bsz * e]
        chunk = bc

    maskf = mask.reshape(-1).astype(jnp.float32)
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
        chunk_graphs=chunk,
        edge_to_row=edge_to_row,
    )


def _ceil_to_arr(x: jnp.ndarray) -> jnp.ndarray:
    return -(-x // TILE) * TILE


def _kernel(
    tile_type_ref,  # scalar-prefetch [C, n_tiles_c]
    idx_ref,  # (1, 1, 8, TILE) i32 — rows 0/1/2 = a1/a2/bidx (chunk-local)
    nodes_ref,  # (1, NN_c, 2h) — this chunk's node table
    temb_ref,  # (1, BP_c, h) — this chunk's time embeddings
    w_ref,  # (1, 5h, 2h) — this tile's type slab
    bias_ref,  # (1, 8, 2h) — bias in row 0
    out_ref,  # (1, TILE, 2h)
    *,
    hidden: int,
    cdt,
    num_types: int,
):
    nn_rows = nodes_ref.shape[1]
    bp = temb_ref.shape[1]
    c = pl.program_id(0)
    i = pl.program_id(1)
    tt = tile_type_ref[c, i]

    @pl.when(tt < num_types)
    def _compute():
        def onehot_gather(idx, table, width):
            cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, width), 1)
            oh = (idx[:, None] == cols).astype(cdt)
            return jnp.dot(
                oh, table.astype(cdt), preferred_element_type=jnp.float32
            )

        g1p1 = onehot_gather(idx_ref[0, 0, 0, :], nodes_ref[0], nn_rows)
        g2p2 = onehot_gather(idx_ref[0, 0, 1, :], nodes_ref[0], nn_rows)
        trow = onehot_gather(idx_ref[0, 0, 2, :], temb_ref[0], bp)  # [TILE,h]

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
            jnp.dot(row, w_ref[0].astype(cdt),
                    preferred_element_type=jnp.float32)
            + bias_ref[0, 0]
        )
        out_ref[0] = jax.nn.silu(out)

    # all-phantom tile (sentinel group K): skip the gathers + matmul — the
    # downstream scatter masks these rows anyway, but out_ref must be defined
    @pl.when(tt >= num_types)
    def _skip():
        out_ref[0] = jnp.zeros_like(out_ref[0])


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
    padded row order, f32[rows, 2h]. Chunked dispatches walk a
    (chunk, tile) grid with per-chunk node tables (see PaddedDispatch)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cdt = jnp.dtype(compute_dtype)
    bsz, n, h = geom_emb.shape
    assert h == hidden

    bc = dispatch.chunk_graphs or bsz  # graphs per kernel chunk
    if dispatch.idx_packed.ndim == 3:
        n_chunks, n_tiles_c = 1, dispatch.idx_packed.shape[0]
        idx_packed = dispatch.idx_packed[None]
        tile_type = dispatch.tile_type[None]
    else:
        n_chunks, n_tiles_c = dispatch.idx_packed.shape[:2]
        idx_packed = dispatch.idx_packed
        tile_type = dispatch.tile_type

    # VMEM guard: one chunk's node table (ceil(Bc*N,8) x 2h f32) plus one
    # one-hot gather tile ([TILE, Bc*N]) must fit comfortably in ~16 MB of
    # VMEM. Fail loudly with sizes instead of an opaque Mosaic compile error
    # (callers pick chunk_graphs via `auto_chunk_graphs`, which stays far
    # below this).
    node_bytes = _ceil_to(bc * n, 8) * 2 * h * 4
    onehot_bytes = TILE * _ceil_to(bc * n, 8) * jnp.dtype(cdt).itemsize
    budget = 10 * 1024 * 1024  # leave headroom for weights + activations
    if node_bytes + 3 * onehot_bytes > budget:
        raise ValueError(
            f"fused_edge_bank: chunk Bc*N={bc*n} too large for VMEM "
            f"(node table {node_bytes/2**20:.1f} MB + gathers "
            f"{3*onehot_bytes/2**20:.1f} MB > {budget/2**20:.0f} MB budget); "
            "pass a smaller chunk_graphs to make_padded_dispatch"
        )

    nodes = jnp.concatenate([geom_emb, pose_emb], axis=-1).reshape(
        bsz * n, 2 * h
    )
    # per-chunk node tables (chunk-local ids index within a row block);
    # pad the batch tail to a chunk multiple FIRST, then pad each chunk's
    # row block to the (8, 128)-tileable height
    nn_rows = _ceil_to(bc * n, 8)
    nodes = jnp.pad(nodes, ((0, n_chunks * bc * n - bsz * n), (0, 0)))
    nodes = nodes.reshape(n_chunks, bc * n, 2 * h)
    if nn_rows != bc * n:
        nodes = jnp.pad(nodes, ((0, 0), (0, nn_rows - bc * n), (0, 0)))
    bp = _ceil_to(bc, 8)
    temb = jnp.pad(t_emb, ((0, n_chunks * bc - bsz), (0, 0)))
    temb = temb.reshape(n_chunks, bc, h)
    if bp != bc:
        temb = jnp.pad(temb, ((0, 0), (0, bp - bc), (0, 0)))

    two_h = w.shape[-1]
    w_slabs = w.shape[0]

    # bias rides an (8, 2h)-tiled block (row 0 holds the data): TPU block
    # shapes must tile the last two dims by (8, 128)
    b_pad = jnp.zeros((b.shape[0], 8, two_h), b.dtype).at[:, 0].set(b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks, n_tiles_c),
        in_specs=[
            pl.BlockSpec((1, 1, 8, TILE), lambda c, i, tt: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nn_rows, 2 * h), lambda c, i, tt: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, h), lambda c, i, tt: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            # sentinel padding tiles (tt == K) clamp to slab K-1: the block
            # must resolve to a real slab, but the kernel skips its use
            pl.BlockSpec((1, w.shape[1], two_h),
                         lambda c, i, tt: (jnp.minimum(tt[c, i], w_slabs - 1),
                                           0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, two_h),
                         lambda c, i, tt: (jnp.minimum(tt[c, i], w_slabs - 1),
                                           0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, two_h), lambda c, i, tt: (c, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, hidden=h, cdt=cdt, num_types=w_slabs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, n_tiles_c * TILE, two_h), jnp.float32
        ),
        interpret=interpret,
    )(
        tile_type,
        idx_packed,
        nodes,
        temb,
        w,
        b_pad,
    )
    return out.reshape(n_chunks * n_tiles_c * TILE, two_h)


def auto_chunk_graphs(
    bsz: int,
    num_nodes: int,
    target_rows: int = 1024,
) -> int | None:
    """Pick the kernel chunk size: the largest graphs-per-chunk whose node
    table stays near ``target_rows`` rows (the one-hot gather width — and so
    the gather's MXU cost per tile — scales with it; ~1k rows keeps the
    gather comparable to the [5h, 2h] bank matmul while the whole table
    stays well under the VMEM budget). None = no chunking needed."""
    if bsz * num_nodes <= target_rows:
        return None
    # balance: spread the batch over ceil-many chunks instead of capping at
    # target_rows//num_nodes, which would give a batch one graph past a chunk
    # multiple (e.g. B=129) a nearly all-phantom trailing chunk
    n_chunks = -(-bsz * num_nodes // target_rows)
    return max(1, -(-bsz // n_chunks))


# --------------------------------------------------------------------- #
# split-bank kernel v2 (round-5 roofline fix)
# --------------------------------------------------------------------- #
#
# The bank matmul is linear in its concatenated input
# [g_a1, g_a2, p_a1, p_a2, t] @ W = g_a1@W1 + g_a2@W2 + p_a1@W3 + p_a2@W4
# + t@W5, and only the pose halves change inside the T-step sampling scan:
# geometry embeddings are chain-constant and the timestep is uniform across
# the batch at every step of every sampling chain (tb = full(B, t) in
# diffusion.py). So:
#   - edge_const (per chain): g_a1@W1 + g_a2@W2 per sorted row,
#   - tc (per step, XLA, ~3 MFLOP): t_emb @ W5 per type + bias,
#   - kernel (per step): gather pose rows from the [NN, h] table (HALF the
#     one-hot width of v1's [NN, 2h] geom|pose table), one [2h, 2h] matmul,
#     add edge_const + tc, SiLU, and the fused pose decoder
#     (Linear(h/2)-SiLU-Linear(P)) so the HBM write is [rows, 2, Pp] instead
#     of [rows, 2h] f32 (~30x less output traffic).
# Executed FLOPs per tile drop ~2x and per-step HBM traffic ~2-4x vs v1
# (BENCH_r04.json: one-hot gathers executed 4.2x model FLOPs; hbm 674 MB per
# fanout-x50 step, most of it the [rows, 2h] f32 activation round-trip).
# No-grad inference only (noise-prediction sampling chains); the energy/EBM
# path keeps ``diff_edge_bank``'s custom VJP.

#: decoder output lanes per endpoint (pose_dim padded up; 2*OUT_PP = 16-lane
#: stores keep the out block tileable without writing 128 lanes of padding)
OUT_PP = 8


def compute_edge_const(
    dispatch: PaddedDispatch,
    geom_emb: jnp.ndarray,  # [B, N, h]
    w: jnp.ndarray,  # [K, 5h, 2h]
    compute_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Chain-constant geometry contribution per sorted row:
    ``g_a1 @ W1 + g_a2 @ W2`` with the row's type slab. f32 [rows, 2h];
    cost ~ one denoiser step, paid once per sampling chain."""
    cdt = jnp.dtype(compute_dtype)
    bsz, n, h = geom_emb.shape
    geom_flat = geom_emb.reshape(bsz * n, h)
    g1 = jnp.take(geom_flat, dispatch.a1.reshape(-1), axis=0)
    g2 = jnp.take(geom_flat, dispatch.a2.reshape(-1), axis=0)
    rows = jnp.concatenate([g1, g2], axis=-1)  # [M, 2h]
    tt, _ = _row_types_and_groups(dispatch, w.shape[0])
    return _per_type_matmul(rows, tt, w[:, : 2 * h, :], cdt)


def _kernel_v2(
    tile_type_ref,  # scalar-prefetch [C, n_tiles_c]
    idx_ref,  # (1, 1, 8, TILE) i32 — rows 0/1/2 = a1/a2/bidx (chunk-local)
    pose_ref,  # (1, NN_c, h) — this chunk's pose-embedding table
    gc_ref,  # (1, TILE, 2h) f32 — this tile's edge_const rows
    tc_ref,  # (1, 8, 2h) — this tile type's t@W5 + bias in row 0
    w34_ref,  # (1, 2h, 2h) — this tile type's pose slab
    wd1_ref,  # (h, hd) decoder Dense_0
    bd1_ref,  # (8, hd) row 0
    wd2_ref,  # (hd, OUT_PP) decoder Dense_1 (padded cols)
    bd2_ref,  # (8, OUT_PP) row 0
    out_ref,  # (1, TILE, 2*OUT_PP)
    *,
    hidden: int,
    cdt,
    num_types: int,
):
    nn_rows = pose_ref.shape[1]
    c = pl.program_id(0)
    i = pl.program_id(1)
    tt = tile_type_ref[c, i]

    @pl.when(tt < num_types)
    def _compute():
        def onehot_gather(idx, table, width):
            cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, width), 1)
            oh = (idx[:, None] == cols).astype(cdt)
            return jnp.dot(
                oh, table.astype(cdt), preferred_element_type=jnp.float32
            )

        p1 = onehot_gather(idx_ref[0, 0, 0, :], pose_ref[0], nn_rows)
        p2 = onehot_gather(idx_ref[0, 0, 1, :], pose_ref[0], nn_rows)
        pp = jnp.concatenate([p1, p2], axis=-1).astype(cdt)  # [TILE, 2h]
        z = jnp.dot(
            pp, w34_ref[0].astype(cdt), preferred_element_type=jnp.float32
        )
        y = jax.nn.silu(z + gc_ref[0] + tc_ref[0, 0])

        def decode(yh):
            u = jnp.dot(
                yh.astype(cdt), wd1_ref[...].astype(cdt),
                preferred_element_type=jnp.float32,
            ) + bd1_ref[0]
            u = jax.nn.silu(u)
            return jnp.dot(
                u.astype(cdt), wd2_ref[...].astype(cdt),
                preferred_element_type=jnp.float32,
            ) + bd2_ref[0]

        d1 = decode(y[:, :hidden])  # [TILE, OUT_PP]
        d2 = decode(y[:, hidden:])
        out_ref[0] = jnp.concatenate([d1, d2], axis=-1)

    @pl.when(tt >= num_types)
    def _skip():
        out_ref[0] = jnp.zeros_like(out_ref[0])


@functools.partial(
    jax.jit,
    static_argnames=("hidden", "pose_dim", "compute_dtype", "interpret"),
)
def fused_edge_bank_v2(
    dispatch: PaddedDispatch,
    pose_emb: jnp.ndarray,  # [B, N, h]
    t_emb: jnp.ndarray,  # [B, h] (UNIFORM t across the batch — sampling only)
    w: jnp.ndarray,  # [K, 5h, 2h]
    b: jnp.ndarray,  # [K, 2h]
    wd1: jnp.ndarray,  # [h, h//2] pose_decoder Dense_0
    bd1: jnp.ndarray,  # [h//2]
    wd2: jnp.ndarray,  # [h//2, P] pose_decoder Dense_1
    bd2: jnp.ndarray,  # [P]
    *,
    hidden: int,
    pose_dim: int,
    compute_dtype: str = "bfloat16",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Split-bank + fused-decoder edge stage. Returns the decoded per-edge
    pose deltas in sorted row order, f32 [rows, 2, pose_dim].

    Requires ``dispatch.edge_const`` (see ``compute_edge_const``). The
    timestep embedding must be uniform across the batch (every sampling
    chain in diffusion.py broadcasts one t per step); only ``t_emb[0]`` is
    read."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert dispatch.edge_const is not None, "attach compute_edge_const first"
    cdt = jnp.dtype(compute_dtype)
    bsz, n, h = pose_emb.shape
    assert h == hidden
    hd = wd1.shape[1]

    bc = dispatch.chunk_graphs or bsz
    if dispatch.idx_packed.ndim == 3:
        n_chunks, n_tiles_c = 1, dispatch.idx_packed.shape[0]
        idx_packed = dispatch.idx_packed[None]
        tile_type = dispatch.tile_type[None]
    else:
        n_chunks, n_tiles_c = dispatch.idx_packed.shape[:2]
        idx_packed = dispatch.idx_packed
        tile_type = dispatch.tile_type

    nn_rows = _ceil_to(bc * n, 8)
    node_bytes = nn_rows * h * 4
    onehot_bytes = TILE * nn_rows * jnp.dtype(cdt).itemsize
    budget = 10 * 1024 * 1024
    if node_bytes + 3 * onehot_bytes > budget:
        raise ValueError(
            f"fused_edge_bank_v2: chunk Bc*N={bc*n} too large for VMEM; "
            "pass a smaller chunk_graphs to make_padded_dispatch"
        )

    # per-chunk pose tables (chunk-local ids index within a row block)
    pose_flat = pose_emb.reshape(bsz * n, h)
    pose_flat = jnp.pad(pose_flat, ((0, n_chunks * bc * n - bsz * n), (0, 0)))
    pose_tab = pose_flat.reshape(n_chunks, bc * n, h)
    if nn_rows != bc * n:
        pose_tab = jnp.pad(pose_tab, ((0, 0), (0, nn_rows - bc * n), (0, 0)))
    pose_tab = pose_tab.astype(cdt)

    two_h = w.shape[-1]
    w_slabs = w.shape[0]

    # per-step time contribution per type (tiny XLA einsum): t@W5 + bias
    tc = (
        jnp.einsum(
            "h,khd->kd", t_emb[0].astype(cdt), w[:, 4 * h:, :].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        + b
    )  # [K, 2h] f32
    tc_pad = jnp.zeros((w_slabs, 8, two_h), jnp.float32).at[:, 0].set(tc)

    w34 = w[:, 2 * h: 4 * h, :]  # [K, 2h, 2h]

    gc = dispatch.edge_const.reshape(n_chunks, n_tiles_c * TILE, two_h)
    gc = gc.astype(jnp.float32)

    bd1_pad = jnp.zeros((8, hd), jnp.float32).at[0].set(bd1)
    wd2_pad = jnp.zeros((hd, OUT_PP), wd2.dtype).at[:, :pose_dim].set(wd2)
    bd2_pad = jnp.zeros((8, OUT_PP), jnp.float32).at[0, :pose_dim].set(bd2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks, n_tiles_c),
        in_specs=[
            pl.BlockSpec((1, 1, 8, TILE), lambda c, i, tt: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nn_rows, h), lambda c, i, tt: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, two_h), lambda c, i, tt: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, two_h),
                         lambda c, i, tt: (jnp.minimum(tt[c, i], w_slabs - 1),
                                           0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_h, two_h),
                         lambda c, i, tt: (jnp.minimum(tt[c, i], w_slabs - 1),
                                           0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, hd), lambda c, i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hd), lambda c, i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, OUT_PP), lambda c, i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, OUT_PP), lambda c, i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, 2 * OUT_PP), lambda c, i, tt: (c, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        functools.partial(_kernel_v2, hidden=h, cdt=cdt, num_types=w_slabs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, n_tiles_c * TILE, 2 * OUT_PP), jnp.float32
        ),
        interpret=interpret,
    )(
        tile_type,
        idx_packed,
        pose_tab,
        gc,
        tc_pad,
        w34,
        wd1,
        bd1_pad,
        wd2_pad,
        bd2_pad,
    )
    out = out.reshape(n_chunks * n_tiles_c * TILE, 2, OUT_PP)
    return out[:, :, :pose_dim]


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

    a1 = dispatch.a1.reshape(-1)
    a2 = dispatch.a2.reshape(-1)
    bidx = dispatch.bidx.reshape(-1)

    if dispatch.edge_const is not None:
        # split-bank (round-5 roofline fix, same algebra as kernel v2 but
        # pure XLA and differentiable wrt pose — the energy/MCMC rows ride
        # this): the chain-constant geom contribution and the per-step
        # uniform-t term are added to a pose-only per-type matmul, so the
        # per-step gathers touch [M, 2h] instead of [M, 5h] of row data and
        # the ragged_dot shrinks from [5h, 2h] to [2h, 2h] slabs.
        pose_flat = pose_emb.reshape(bsz * n, h)
        p1 = jnp.take(pose_flat, a1, axis=0)
        p2 = jnp.take(pose_flat, a2, axis=0)
        rows_pose = jnp.concatenate([p1, p2], axis=-1)  # [M, 2h]
        tt_c, row_type = _row_types_and_groups(dispatch, num_types)
        z = _per_type_matmul(rows_pose, tt_c, w[:, 2 * h: 4 * h, :], cdt)
        tc = (
            jnp.einsum(
                "h,khd->kd", t_emb[0].astype(cdt),
                w[:, 4 * h:, :].astype(cdt),
                preferred_element_type=jnp.float32,
            )
            + b
        )  # [K, 2h]; t is uniform across the batch in every sampling chain
        z = z + dispatch.edge_const + jnp.take(tc, row_type, axis=0)
        return jax.nn.silu(z)

    nodes = jnp.concatenate([geom_emb, pose_emb], axis=-1).reshape(
        bsz * n, 2 * h
    )
    g1p1 = jnp.take(nodes, a1, axis=0)  # [M, 2h]
    g2p2 = jnp.take(nodes, a2, axis=0)
    trow = jnp.take(t_emb, bidx, axis=0)  # [M, h]
    row = jnp.concatenate(
        [g1p1[:, :h], g2p2[:, :h], g1p1[:, h:], g2p2[:, h:], trow], axis=-1
    )

    # every tile holds one type and tiles are type-sorted, so group sizes are
    # whole tiles. Sentinel padding tiles (tile_type == K) sit contiguously
    # after type K-1; folding them into the last group keeps ragged_dot's
    # row partition exact — their outputs are masked downstream.
    tt = jnp.minimum(dispatch.tile_type, num_types - 1)
    group_sizes = (
        jnp.bincount(tt, length=num_types).astype(jnp.int32) * TILE
    )
    ys = jax.lax.ragged_dot(
        row.astype(cdt), w.astype(cdt), group_sizes,
        preferred_element_type=jnp.float32,
    )
    row_type = jnp.repeat(tt, TILE)
    ys = ys + b[row_type]
    return jax.nn.silu(ys)


# --------------------------------------------------------------------------- #
# differentiable Pallas path (custom VJP)
# --------------------------------------------------------------------------- #
#
# The kernel itself is forward-only; energy-based sampling needs
# d(edge_bank)/d(pose) every MCMC step (reference EBM path,
# ``denoise_fn.py:539-548``). ``diff_edge_bank`` runs the Pallas kernel
# forward and an XLA backward over the SAME chunk-agnostic sorted layout:
# the residuals are only the small primal inputs (node/time embeddings and
# the weight bank — the [rows, 5h] edge matrix is recomputed, not stored),
# the per-type matmuls ride ``ragged_dot`` on the type-contiguous rows, and
# the endpoint scatters mirror the forward gathers as segment-sums. Weight
# and bias cotangents are exact too, but in a sampling grad (d/d pose only)
# XLA dead-code-eliminates them.


def _row_types_and_groups(dispatch, num_types):
    """Per-row constraint type ids and per-chunk tile types.

    Chunked dispatches sort rows type-contiguously WITHIN each chunk, so the
    ragged matmuls run per chunk (static python loop — n_chunks is a trace
    constant). Sentinel padding tiles (tile_type == K, contiguous after type
    K-1) clamp to K-1 — their rows carry mask 0, so every use downstream is
    already zeroed."""
    tt = dispatch.tile_type
    if tt.ndim == 1:
        tt = tt[None]
    tt = jnp.minimum(tt, num_types - 1)
    row_type = jnp.repeat(tt.reshape(-1), TILE)
    return tt, row_type


def _per_type_matmul(rows, tt, w, cdt):
    """rows [M, i] x w [K, i, j] -> [M, j], rows type-contiguous per chunk
    (chunk c covers rows [c*Mc, (c+1)*Mc) with tile types tt[c])."""
    n_chunks = tt.shape[0]
    mc = rows.shape[0] // n_chunks
    outs = []
    for c in range(n_chunks):
        gs = (
            jnp.bincount(tt[c], length=w.shape[0]).astype(jnp.int32) * TILE
        )
        outs.append(
            jax.lax.ragged_dot(
                rows[c * mc:(c + 1) * mc].astype(cdt), w.astype(cdt), gs,
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=0) if n_chunks > 1 else outs[0]


def _sorted_rows(dispatch, geom_emb, pose_emb, t_emb):
    """Recompute the sorted [M, 5h] edge-input matrix from GLOBAL flat ids
    (identical layout to the kernel's in-VMEM gathers)."""
    bsz, n, h = geom_emb.shape
    nodes = jnp.concatenate([geom_emb, pose_emb], axis=-1).reshape(
        bsz * n, 2 * h
    )
    a1 = dispatch.a1.reshape(-1)
    a2 = dispatch.a2.reshape(-1)
    bidx = dispatch.bidx.reshape(-1)
    g1p1 = jnp.take(nodes, a1, axis=0)
    g2p2 = jnp.take(nodes, a2, axis=0)
    trow = jnp.take(t_emb, bidx, axis=0)
    row = jnp.concatenate(
        [g1p1[:, :h], g2p2[:, :h], g1p1[:, h:], g2p2[:, h:], trow], axis=-1
    )
    return row


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def diff_edge_bank(
    dispatch: PaddedDispatch,
    geom_emb: jnp.ndarray,  # [B, N, h]
    pose_emb: jnp.ndarray,  # [B, N, h]
    t_emb: jnp.ndarray,  # [B, h]
    w: jnp.ndarray,  # [K, 5h, 2h]
    b: jnp.ndarray,  # [K, 2h]
    hidden: int,
    compute_dtype: str = "bfloat16",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``fused_edge_bank`` with a custom VJP (sorted rows out, f32[M, 2h])."""
    return fused_edge_bank(
        dispatch, geom_emb, pose_emb, t_emb, w, b,
        hidden=hidden, compute_dtype=compute_dtype, interpret=interpret,
    )


def _deb_fwd(dispatch, geom_emb, pose_emb, t_emb, w, b, hidden,
             compute_dtype, interpret):
    out = fused_edge_bank(
        dispatch, geom_emb, pose_emb, t_emb, w, b,
        hidden=hidden, compute_dtype=compute_dtype, interpret=interpret,
    )
    return out, (dispatch, geom_emb, pose_emb, t_emb, w, b)


def _deb_bwd(hidden, compute_dtype, interpret, res, g):
    dispatch, geom_emb, pose_emb, t_emb, w, b = res
    cdt = jnp.dtype(compute_dtype)
    h = hidden
    bsz, n, _ = geom_emb.shape

    tt, row_type = _row_types_and_groups(dispatch, w.shape[0])
    row = _sorted_rows(dispatch, geom_emb, pose_emb, t_emb)
    pre = _per_type_matmul(row, tt, w, cdt) + b[row_type]

    sig = jax.nn.sigmoid(pre)
    dsilu = sig * (1.0 + pre * (1.0 - sig))
    # padding rows gather node 0; keep their (already-zero downstream)
    # cotangent from touching real gradients
    dpre = g * dsilu * dispatch.mask[:, None]

    # d(row): per-type matmul against the transposed slabs
    drow = _per_type_matmul(dpre, tt, w.transpose(0, 2, 1), cdt)

    # dW[k] = row_k^T dpre_k; db[k] = sum dpre_k. Exact but DCE'd when the
    # caller only asks for pose gradients (the MCMC sampling case).
    onehot = jax.nn.one_hot(row_type, w.shape[0], dtype=row.dtype)  # [M, K]
    dW = jnp.stack(
        [
            (row * onehot[:, k:k + 1]).T @ dpre
            for k in range(w.shape[0])
        ],
        axis=0,
    )
    db = jax.ops.segment_sum(dpre, row_type, num_segments=w.shape[0])

    # scatter the row cotangents back through the gathers
    dg1, dg2, dp1, dp2, dt = (
        drow[:, :h], drow[:, h:2 * h], drow[:, 2 * h:3 * h],
        drow[:, 3 * h:4 * h], drow[:, 4 * h:],
    )
    a1 = dispatch.a1.reshape(-1)
    a2 = dispatch.a2.reshape(-1)
    bidx = dispatch.bidx.reshape(-1)
    dnodes = jax.ops.segment_sum(
        jnp.concatenate(
            [
                jnp.concatenate([dg1, dp1], axis=-1),
                jnp.concatenate([dg2, dp2], axis=-1),
            ],
            axis=0,
        ),
        jnp.concatenate([a1, a2]),
        num_segments=bsz * n,
    )
    dgeom = dnodes[:, :h].reshape(bsz, n, h).astype(geom_emb.dtype)
    dpose = dnodes[:, h:].reshape(bsz, n, h).astype(pose_emb.dtype)
    dtemb = jax.ops.segment_sum(
        dt, bidx, num_segments=t_emb.shape[0]
    ).astype(t_emb.dtype)

    zero = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_
        else jnp.zeros_like(x),
        dispatch,
    )
    return (zero, dgeom, dpose, dtemb, dW.astype(w.dtype), db.astype(b.dtype))


diff_edge_bank.defvjp(_deb_fwd, _deb_bwd)
