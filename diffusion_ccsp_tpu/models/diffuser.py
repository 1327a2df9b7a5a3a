"""ConstraintDiffuser — the compositional factor-graph denoiser, TPU-native.

Capability parity: reference ``networks/denoise_fn.py:184-561``. The reference
loops over constraint types in Python with a ``.cpu()`` round-trip per type
(``denoise_fn.py:313-339,512-521``); here the whole factor graph evaluates as
one fused XLA computation over a padded edge list, natively batched over
problems:

  1. encode geometry / pose / (grasp) per node with small MLPs        (MXU)
  2. gather both endpoints' embeddings per edge, concat with the
     time embedding                                                    (VPU)
  3. per-constraint-type Linear+SiLU via one of two strategies:
       - 'ragged' (default): MoE-style dispatch — flatten all B*E edges,
         stable-sort by constraint type, one grouped matmul via
         ``jax.lax.ragged_dot``, unsort. 1x FLOPs, static shapes.
       - 'dense': static unrolled bank of K matmuls mixed by a one-hot
         of ``edge_type`` (K-x redundant FLOPs; used as the golden
         reference implementation and on backends without ragged_dot)
  4. shared pose decoder per endpoint                                  (MXU)
  5. masked scatter-add (one flat segment_sum over B*N node slots) of
     per-edge pose deltas, normalized by sqrt(#constraints per node)
     (reference ``denoise_fn.py:377-389,523-524``)
  6. conditioned nodes clamped to ground-truth pose
     (reference ``denoise_fn.py:531-533``)

The EBM path computes per-graph energies ``sum((out - pose_in[args])**2)``
(reference ``denoise_fn.py:373-375``) and exact gradients via ``jax.grad``
instead of torch autograd (``denoise_fn.py:539-548``).

All shapes are static; a single-graph call (rank-2 ``pose_in``) is promoted to
a batch of one.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_ccsp_tpu.constraints import (
    ROBOT_CONSTRAINTS,
    constraint_set_for_mode,
)
from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.models.embeddings import TimeMLP


@dataclasses.dataclass(frozen=True)
class DiffuserConfig:
    """Static configuration of the denoiser.

    geom_dim/pose_dim/grasp_dim mirror the reference's ``dims`` tuples
    (``train_utils.py:265-278``): e.g. qualitative = (geom 2, pose 4),
    triangle = (geom 3, pose 4), robot = (geom 8, grasp 5, pose 5).
    """

    input_mode: str
    geom_dim: int
    pose_dim: int
    grasp_dim: int = 0
    hidden_dim: int = 256
    normalize: bool = True
    #: image input mode: geometry arrives as a canonical shape mask rasterized
    #: on device from the 3 canonical numbers and encoded by a CNN
    #: (reference dims with image block, ``train_utils.py:275-278``)
    use_image: bool = False
    image_dim: int = 64
    #: anti-aliased rasterization (sub-pixel boundary information; see
    #: ops/raster.py — fixes the round-4 image-mode quantization bottleneck)
    soft_raster: bool = False
    #: 'ragged' (sorted ragged_dot dispatch) or 'dense' (one-hot mix)
    matmul_strategy: str = "ragged"
    #: run the fused Pallas edge kernel (ops/edge_kernel.py) on the sampling
    #: path: gather + 5h edge assembly + grouped type matmul in one kernel,
    #: tile-aligned sorted layout, no per-step unsort. Inference only
    #: (training keeps the XLA path); requires a non-grasp, single-domain
    #: mode. The ragged path remains the fallback whenever no PaddedDispatch
    #: is threaded in.
    use_pallas: bool = False
    #: matmul accumulation dtype for the edge bank ('bfloat16' halves MXU
    #: cycles on TPU; accumulation stays f32 via preferred_element_type)
    compute_dtype: str = "float32"
    #: scale per domain when composing two trained domains
    #: (reference ``denoise_fn.py:291``).
    composing_weight: tuple[float, float] = (1.0, 1.0)
    #: annealed composition (round-5, not in the reference whose weight is a
    #: single static scalar): when set, the per-domain weights interpolate
    #: linearly in t from ``composing_weight`` at the chain start
    #: (t = anneal_timesteps-1) to ``composing_weight_final`` at t=0, so e.g.
    #: the qualitative factor can steer the global arrangement early while
    #: the packing factor dominates the precision endgame.
    composing_weight_final: tuple[float, float] | None = None
    anneal_timesteps: int = 1000
    #: optional static per-constraint-type output weights (len num_types) —
    #: finer-grained interference control than the 2 per-domain scalars.
    type_weights: tuple[float, ...] | None = None
    #: per-domain output renormalization for composed inference: each
    #: domain's edge outputs are sqrt-normalized by its OWN incident count
    #: before summing (round-5; the reference normalizes by the joint count,
    #: which drowns the O(1)-per-object packing edges under O(n) qualitative
    #: edges at dense counts).
    domain_norm: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "DiffuserConfig":
        """Round-trip from checkpoint JSON (lists back to hashable tuples —
        flax module attributes must be hashable)."""
        d = dict(d)
        if "composing_weight" in d:
            d["composing_weight"] = tuple(d["composing_weight"])
        for k in ("composing_weight_final", "type_weights"):
            if d.get(k) is not None:
                d[k] = tuple(d[k])
        return cls(**d)

    @property
    def constraint_set(self) -> tuple[str, ...]:
        return constraint_set_for_mode(self.input_mode)

    @property
    def num_types(self) -> int:
        return len(self.constraint_set)

    @property
    def has_grasp(self) -> bool:
        return "robot" in self.input_mode

    @property
    def has_second_domain(self) -> bool:
        """Composed robot x qualitative inference: qualitative constraint
        types use a second encoder/decoder set over 2-D footprint features
        (reference ``denoise_fn.py:286-291,487-503``)."""
        return "robot" in self.input_mode and "qualitative" in self.input_mode

    def type_uses_grasp(self, k: int) -> bool:
        """Robot constraints take a 6*h input (grasp included); all others 5*h
        (reference ``denoise_fn.py:297-303``)."""
        return self.constraint_set[k] in ROBOT_CONSTRAINTS


class FeatureEncoder(nn.Module):
    """Linear(h/2)-SiLU-Linear(h)-SiLU, reference ``denoise_fn.py:227-251``."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim // 2)(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_dim)(x)
        return nn.silu(x)


class PoseDecoder(nn.Module):
    """Linear(h/2)-SiLU-Linear(P), reference ``denoise_fn.py:253-257``."""

    hidden_dim: int
    pose_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim // 2)(x)
        x = nn.silu(x)
        return nn.Dense(self.pose_dim)(x)


def make_dispatch(edge_type: jnp.ndarray, num_types: int):
    """Precompute the MoE dispatch for the ragged strategy: the stable sort
    permutation of the flattened edge-type grid, its inverse, and per-type
    group sizes. Edge types are constant across a whole sampling chain, so
    computing this once and threading it through every denoiser call removes
    a per-step sort from the T=1000 scan body."""
    tf = edge_type.reshape(-1)
    order = jnp.argsort(tf, stable=True)
    inv = jnp.argsort(order)
    group_sizes = jnp.bincount(tf, length=num_types).astype(jnp.int32)
    return order, inv, group_sizes


class ConstraintMLPBank(nn.Module):
    """One Linear+SiLU head per constraint type.

    'ragged' strategy: flatten the [B, E] edge grid, stable-sort edges by
    type, run one grouped matmul (``jax.lax.ragged_dot`` — the TPU MoE
    primitive), and scatter back. Exactly one matmul's worth of FLOPs.

    'dense' strategy: evaluate every type's matmul on every edge and mix with
    a one-hot — simple, used as the golden reference in tests.
    """

    num_types: int
    in_dim: int
    out_dim: int
    strategy: str = "ragged"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_type: jnp.ndarray,
        dispatch: tuple | None = None,
    ) -> jnp.ndarray:
        # x: [B, E, in_dim] (or [E, in_dim]), edge_type matching leading dims
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.num_types, self.in_dim, self.out_dim),
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.num_types, self.out_dim)
        )
        if self.strategy == "ragged":
            out = self._ragged(x, edge_type, w, b, dispatch)
        else:
            out = self._dense(x, edge_type, w, b)
        return nn.silu(out)

    def _dense(self, x, edge_type, w, b):
        onehot = jax.nn.one_hot(edge_type, self.num_types, dtype=x.dtype)
        out = jnp.zeros(x.shape[:-1] + (self.out_dim,), dtype=x.dtype)
        for k in range(self.num_types):
            yk = x @ w[k] + b[k]
            out = out + onehot[..., k : k + 1] * yk
        return out

    def _ragged(self, x, edge_type, w, b, dispatch=None):
        lead = x.shape[:-1]
        m = 1
        for d in lead:
            m *= d
        xf = x.reshape(m, self.in_dim)
        tf = edge_type.reshape(m)

        if dispatch is None:
            dispatch = make_dispatch(edge_type, self.num_types)
        order, inv, group_sizes = dispatch
        xs = xf[order]

        cdt = self.compute_dtype
        ys = jax.lax.ragged_dot(
            xs.astype(cdt), w.astype(cdt), group_sizes,
            preferred_element_type=jnp.float32,
        )
        ys = ys + b[tf[order]]
        return ys[inv].reshape(lead + (self.out_dim,))


class ConstraintDiffuser(nn.Module):
    """The factor-graph denoiser. See module docstring."""

    config: DiffuserConfig

    def setup(self):
        cfg = self.config
        h = cfg.hidden_dim
        if cfg.use_image:
            from diffusion_ccsp_tpu.models.cnn import GeomEncoderImage

            self.geom_encoder = GeomEncoderImage(
                cfg.image_dim, h, name="geom_encoder"
            )
        else:
            self.geom_encoder = FeatureEncoder(h, name="geom_encoder")
        self.pose_encoder = FeatureEncoder(h, name="pose_encoder")
        if cfg.has_grasp:
            self.grasp_encoder = FeatureEncoder(h, name="grasp_encoder")
        self.time_mlp = TimeMLP(h, name="time_mlp")
        self.pose_decoder = PoseDecoder(h, cfg.pose_dim, name="pose_decoder")

        if cfg.has_second_domain:
            # second-domain (qualitative) encoders over the 2-D footprint:
            # geom (w, l), pose (x, y, cs, sn); decoder emits 4 dims expanded
            # with a zero z-delta (reference ``denoise_fn.py:366-368``)
            self.geom_encoder_2 = FeatureEncoder(h, name="geom_encoder_2")
            self.pose_encoder_2 = FeatureEncoder(h, name="pose_encoder_2")
            self.time_mlp_2 = TimeMLP(h, name="time_mlp_2")
            self.pose_decoder_2 = PoseDecoder(h, 4, name="pose_decoder_2")

        # Edge-input width: grasp-aware types consume one extra h-block.
        # We build the edge input at the max width and give every type a
        # full-width weight matrix; for non-grasp types in a robot mode the
        # grasp block is zeroed before the matmul so those weights see a
        # constant 0 (matching the reference's narrower per-type Linear).
        in_mult = 6 if cfg.has_grasp else 5
        self.mlp_bank = ConstraintMLPBank(
            num_types=cfg.num_types,
            in_dim=in_mult * h,
            out_dim=2 * h,
            strategy=cfg.matmul_strategy,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            name="mlp_bank",
        )

    def __call__(
        self,
        pose_in: jnp.ndarray,
        graph: ConstraintGraph,
        t: jnp.ndarray,
        return_energy: bool = False,
        dispatch: tuple | None = None,
        geom_emb: jnp.ndarray | None = None,
    ):
        """Denoise a batch of graphs.

        Args:
          pose_in: f32[B, N, P] noisy pose features (or [N, P] for one graph).
          graph:   batched ConstraintGraph (or single).
          t:       int[B] timesteps (or scalar).
          return_energy: if True return per-graph energies [B] (EBM path).

        Returns:
          f32[B, N, P] predicted noise / pose deltas, or energies [B]
          (squeezed for single-graph input).
        """
        single = pose_in.ndim == 2
        if single:
            pose_in = pose_in[None]
            graph = jax.tree.map(lambda x: x[None], graph)
            t = jnp.asarray(t)[None]
            dispatch = None  # batch layout differs; recompute
            if geom_emb is not None:
                geom_emb = geom_emb[None]

        out = self._forward(
            pose_in, graph, t, return_energy, dispatch, geom_emb
        )
        if single:
            out = jax.tree.map(lambda x: x[0], out)
        return out

    def encode_geometry(self, graph: ConstraintGraph) -> jnp.ndarray:
        """Geometry embeddings [..., N, h]. For the image mode this runs the
        on-device rasterizer + CNN; precompute once per sampling chain and
        pass to __call__ as ``geom_emb`` (the reference caches image
        embeddings into batch.x at eval, ``denoise_fn.py:469-478``)."""
        if self.config.use_image:
            from diffusion_ccsp_tpu.ops.raster import rasterize_geom_features

            imgs = rasterize_geom_features(
                graph.geom, self.config.image_dim,
                soft=self.config.soft_raster,
            )
            return self.geom_encoder(
                imgs.reshape(imgs.shape[:-2] + (self.config.image_dim**2,))
            )
        return self.geom_encoder(graph.geom)

    def _forward(self, pose_in, graph, t, return_energy, dispatch=None,
                 geom_emb=None):
        cfg = self.config
        h = cfg.hidden_dim
        bsz, n, _ = pose_in.shape
        e = graph.max_edges

        if geom_emb is None:
            geom_emb = self.encode_geometry(graph)  # [B, N, h]
        pose_emb = self.pose_encoder(pose_in)  # [B, N, h]
        t_emb = self.time_mlp(t)  # [B, h]

        from diffusion_ccsp_tpu.ops.edge_kernel import PaddedDispatch

        if isinstance(dispatch, PaddedDispatch):
            return self._forward_pallas(
                pose_in, graph, geom_emb, pose_emb, t_emb, dispatch,
                return_energy,
            )

        a1 = graph.edges[..., 0]  # [B, E]
        a2 = graph.edges[..., 1]

        def gather_nodes(emb, idx):
            # emb [B, N, h], idx [B, E] -> [B, E, h]
            return jnp.take_along_axis(emb, idx[..., None], axis=1)

        if cfg.has_second_domain:
            # domain-2 node embeddings: 2-D footprint geometry and pose
            # (x, y, cs, sn) taken from the diffusing robot pose (x,y,z,cs,sn)
            geom_emb_2 = self.geom_encoder_2(graph.geom[..., :2])
            pose_in_2 = pose_in[..., jnp.asarray([0, 1, 3, 4])]
            pose_emb_2 = self.pose_encoder_2(pose_in_2)
            t_emb_2 = self.time_mlp_2(t)
            # first len(ROBOT_CONSTRAINTS)=2 types are domain-1
            is_d2 = (graph.edge_type >= 2)[..., None].astype(pose_in.dtype)

            def sel(emb1, emb2, idx):
                return (
                    gather_nodes(emb1, idx) * (1 - is_d2)
                    + gather_nodes(emb2, idx) * is_d2
                )

            g_a1 = sel(geom_emb, geom_emb_2, a1)
            g_a2 = sel(geom_emb, geom_emb_2, a2)
            p_a1 = sel(pose_emb, pose_emb_2, a1)
            p_a2 = sel(pose_emb, pose_emb_2, a2)
            t_edge = (
                jnp.broadcast_to(t_emb[:, None, :], (bsz, e, h)) * (1 - is_d2)
                + jnp.broadcast_to(t_emb_2[:, None, :], (bsz, e, h)) * is_d2
            )
        else:
            g_a1 = gather_nodes(geom_emb, a1)
            g_a2 = gather_nodes(geom_emb, a2)
            p_a1 = gather_nodes(pose_emb, a1)
            p_a2 = gather_nodes(pose_emb, a2)
            t_edge = jnp.broadcast_to(t_emb[:, None, :], (bsz, e, h))

        parts = []
        if cfg.has_grasp:
            grasp_emb = self.grasp_encoder(graph.grasp)
            uses_grasp = jnp.asarray(
                [cfg.type_uses_grasp(k) for k in range(cfg.num_types)],
                dtype=pose_in.dtype,
            )[graph.edge_type]
            parts.append(gather_nodes(grasp_emb, a1) * uses_grasp[..., None])
        parts += [g_a1, g_a2, p_a1, p_a2, t_edge]
        edge_in = jnp.concatenate(parts, axis=-1)  # [B, E, 5h or 6h]

        out = self.mlp_bank(edge_in, graph.edge_type, dispatch)  # [B, E, 2h]
        out = out.reshape(bsz, e, 2, h)
        edge_pose_out = self.pose_decoder(out)  # [B, E, 2, P]

        # per-domain weights: static scalars, or t-annealed [B,1,1,1] arrays
        # (composing_weight_final set; round-5 anneal knob)
        w_d1, w_d2 = cfg.composing_weight
        if cfg.composing_weight_final is not None:
            frac = jnp.clip(
                t.astype(pose_in.dtype) / max(cfg.anneal_timesteps - 1, 1),
                0.0, 1.0,
            )[:, None, None, None]  # 1 at chain start, 0 at t=0
            f_d1, f_d2 = cfg.composing_weight_final
            w_d1 = f_d1 + (w_d1 - f_d1) * frac
            w_d2 = f_d2 + (w_d2 - f_d2) * frac
            edge_pose_out = edge_pose_out * w_d1
        elif cfg.composing_weight[0] != 1.0:
            edge_pose_out = edge_pose_out * w_d1
        if cfg.has_second_domain:
            # domain-2 decoder: (dx, dy, dcs, dsn) -> (dx, dy, 0, dcs, dsn)
            d2 = self.pose_decoder_2(out)  # [B, E, 2, 4]
            d2 = jnp.concatenate(
                [d2[..., :2], jnp.zeros_like(d2[..., :1]), d2[..., 2:]], -1
            )
            if cfg.composing_weight_final is not None or (
                cfg.composing_weight[1] != 1.0
            ):
                d2 = d2 * w_d2
            w2 = is_d2[..., None]  # [B, E, 1, 1]
            edge_pose_out = edge_pose_out * (1 - w2) + d2 * w2
        tw_edge = None
        if cfg.type_weights is not None:
            tw_edge = jnp.asarray(cfg.type_weights, pose_in.dtype)[
                graph.edge_type
            ]  # [B, E]

        emask = graph.edge_mask.astype(pose_in.dtype)  # [B, E]

        if return_energy:
            # reference ``denoise_fn.py:373-375``: per-edge energy is the
            # squared distance between predicted and current pose features of
            # both endpoints; summed per graph. Type weights scale each
            # edge's ENERGY CONTRIBUTION here — scaling the raw output would
            # shift the energy minimum to w*out ~ pose and corrupt the score
            # (observed: tw=1.3 zeroed an energy model's satisfaction).
            args_pose = jnp.stack(
                [gather_nodes(pose_in, a1), gather_nodes(pose_in, a2)], axis=2
            )  # [B, E, 2, P]
            per_edge = ((edge_pose_out - args_pose) ** 2).sum(axis=(2, 3))
            if tw_edge is not None:
                per_edge = per_edge * tw_edge
            return (per_edge * emask).sum(axis=-1)  # [B]

        if tw_edge is not None:
            edge_pose_out = edge_pose_out * tw_edge[..., None, None]

        # masked scatter-add over one flat id space of B*N node slots
        batch_offset = (jnp.arange(bsz) * n)[:, None]  # [B, 1]
        flat_args = jnp.concatenate(
            [a1 + batch_offset, a2 + batch_offset], axis=1
        ).reshape(-1)  # [B*2E]
        flat_out = jnp.concatenate(
            [edge_pose_out[:, :, 0], edge_pose_out[:, :, 1]], axis=1
        ).reshape(bsz * 2 * e, -1)
        flat_mask = jnp.concatenate([emask, emask], axis=1).reshape(-1)

        if cfg.has_second_domain and cfg.domain_norm:
            # per-domain output renormalization (round-5, VERDICT r4 item 4's
            # untried knob; not in the reference): each domain's edge outputs
            # are scatter-added and sqrt-normalized by its OWN incident-edge
            # count, then summed. With the reference's shared normalization a
            # node with 1 packing edge and 5 qualitative edges drowns the
            # packing signal at dense counts (qualitative edges grow ~O(n),
            # gin/gfree stay O(1) per object).
            d2_flat = jnp.concatenate(
                [is_d2[..., 0], is_d2[..., 0]], axis=1
            ).reshape(-1)
            agg = 0.0
            for sel in (1.0 - d2_flat, d2_flat):
                m_d = flat_mask * sel
                s_d = jax.ops.segment_sum(
                    flat_out * m_d[:, None], flat_args,
                    num_segments=bsz * n,
                ).reshape(bsz, n, -1)
                if cfg.normalize:
                    c_d = jax.ops.segment_sum(
                        m_d, flat_args, num_segments=bsz * n
                    ).reshape(bsz, n)
                    s_d = s_d / jnp.sqrt(jnp.maximum(c_d, 1.0))[..., None]
                agg = agg + s_d
        else:
            agg = jax.ops.segment_sum(
                flat_out * flat_mask[:, None], flat_args,
                num_segments=bsz * n
            ).reshape(bsz, n, -1)
            if cfg.normalize:
                counts = jax.ops.segment_sum(
                    flat_mask, flat_args, num_segments=bsz * n
                ).reshape(bsz, n)
                agg = agg / jnp.sqrt(jnp.maximum(counts, 1.0))[..., None]

        # conditioned nodes keep their ground-truth pose features
        # (reference ``denoise_fn.py:531-533``)
        agg = jnp.where(graph.cond_mask[..., None], graph.pose, agg)
        # padded node slots emit zeros
        return agg * graph.node_mask[..., None]


    def _forward_pallas(
        self, pose_in, graph, geom_emb, pose_emb, t_emb, dispatch,
        return_energy,
    ):
        """Tile-aligned sorted edge stage (ops/edge_kernel.py): the Pallas
        kernel when ``dispatch.use_kernel``, else the pure-XLA sorted path
        (take + ragged_dot over the pre-sorted rows). Either way the rows
        come out in the chain-constant sorted order; the decoder and the
        masked scatter consume that order directly via the dispatch's
        pre-permuted index arrays — no per-step sort/unsort in the scan."""
        cfg = self.config
        if cfg.has_grasp or cfg.has_second_domain:
            raise NotImplementedError(
                "padded sorted dispatch covers single-domain, non-grasp "
                "modes; use the ragged path for robot/composed modes"
            )
        from diffusion_ccsp_tpu.ops.edge_kernel import (
            diff_edge_bank,
            sorted_edge_bank,
        )

        h = cfg.hidden_dim
        bsz, n, p = pose_in.shape
        params = self.mlp_bank.variables["params"]
        w, b = params["kernel"], params["bias"]

        if (
            dispatch.use_kernel
            and dispatch.edge_const is not None
            and not return_energy
        ):
            # split-bank kernel v2 (round-5 roofline fix): chain-constant
            # geom contribution pre-added, pose-only gathers, decoder fused
            # into the kernel. No-grad noise-prediction sampling only.
            from diffusion_ccsp_tpu.ops.edge_kernel import fused_edge_bank_v2

            dec = self.pose_decoder.variables["params"]
            edge_pose_out = fused_edge_bank_v2(
                dispatch, pose_emb, t_emb, w, b,
                dec["Dense_0"]["kernel"], dec["Dense_0"]["bias"],
                dec["Dense_1"]["kernel"], dec["Dense_1"]["bias"],
                hidden=h, pose_dim=cfg.pose_dim,
                compute_dtype=cfg.compute_dtype,
            )  # [rows, 2, P], decoded
        elif dispatch.use_kernel:
            # Pallas forward + custom-VJP XLA backward (ops/edge_kernel.py):
            # differentiable, so energy-based sampling rides the kernel too
            out = diff_edge_bank(
                dispatch, geom_emb, pose_emb, t_emb, w, b, h,
                cfg.compute_dtype,
            )  # [rows, 2h], silu applied
            edge_pose_out = self.pose_decoder(
                out.reshape(out.shape[0], 2, h)
            )
        else:
            out = sorted_edge_bank(
                dispatch, geom_emb, pose_emb, t_emb, w, b,
                compute_dtype=cfg.compute_dtype,
            )
            edge_pose_out = self.pose_decoder(
                out.reshape(out.shape[0], 2, h)
            )
        if cfg.composing_weight[0] != 1.0:
            edge_pose_out = edge_pose_out * cfg.composing_weight[0]
        tw_row = None
        if cfg.type_weights is not None:
            # per-constraint-type weights on the sorted layout: rows are
            # type-contiguous per tile, so the per-row type comes from the
            # (chain-constant) tile types
            from diffusion_ccsp_tpu.ops.edge_kernel import (
                _row_types_and_groups,
            )

            _, row_type = _row_types_and_groups(dispatch, cfg.num_types)
            tw_row = jnp.asarray(cfg.type_weights, pose_in.dtype)[row_type]

        a1 = dispatch.a1.reshape(-1)  # [rows] ids in flat B*N space
        a2 = dispatch.a2.reshape(-1)
        emask = dispatch.mask  # f32 [rows]

        if return_energy:
            flat_pose = pose_in.reshape(bsz * n, p)
            args_pose = jnp.stack([flat_pose[a1], flat_pose[a2]], axis=1)
            per_edge = ((edge_pose_out - args_pose) ** 2).sum(axis=(1, 2))
            if tw_row is not None:
                # weight the edge's ENERGY CONTRIBUTION (see _forward: an
                # output-side scale shifts the minimum and corrupts scores)
                per_edge = per_edge * tw_row
            return jax.ops.segment_sum(
                per_edge * emask, dispatch.bidx.reshape(-1), num_segments=bsz
            )

        if tw_row is not None:
            edge_pose_out = edge_pose_out * tw_row[:, None, None]

        if dispatch.edge_to_row is not None:
            # scatter-free aggregation (round-5 roofline fix #2): unsort the
            # edge outputs back to the regular [B, E] layout with one
            # chain-constant take, then reduce onto the N local node slots
            # via a batched one-hot einsum (MXU). The flat B*N segment_sum
            # this replaces is a scatter-add that costs ~60% of the whole
            # denoiser step at fan-out x20 (2.44 of 3.97 ms/step,
            # results/v2_kernel_profile.json); take+einsum costs ~1.0 ms.
            # precision='highest' keeps both operands f32 — exact parity
            # with the segment_sum path (one-hot rows are exact in any
            # dtype; the default TPU precision would downcast the outputs).
            e_slots = graph.edges.shape[-2]
            oo = edge_pose_out.reshape(-1, 2 * p)[dispatch.edge_to_row]
            oo = oo.reshape(bsz, e_slots, 2, p)
            em = graph.edge_mask.astype(oo.dtype)
            oh1 = jax.nn.one_hot(
                graph.edges[..., 0], n, dtype=oo.dtype
            ) * em[..., None]
            oh2 = jax.nn.one_hot(
                graph.edges[..., 1], n, dtype=oo.dtype
            ) * em[..., None]
            agg = jnp.einsum(
                "ben,bep->bnp", oh1, oo[:, :, 0], precision="highest"
            ) + jnp.einsum(
                "ben,bep->bnp", oh2, oo[:, :, 1], precision="highest"
            )
        else:
            flat_args = jnp.concatenate([a1, a2])
            flat_out = jnp.concatenate(
                [edge_pose_out[:, 0], edge_pose_out[:, 1]], axis=0
            )
            flat_mask = jnp.concatenate([emask, emask])
            agg = jax.ops.segment_sum(
                flat_out * flat_mask[:, None], flat_args,
                num_segments=bsz * n,
            ).reshape(bsz, n, -1)
        if cfg.normalize:
            # chain-constant incident counts precomputed in the dispatch
            counts = dispatch.node_counts.reshape(bsz, n)
            agg = agg / jnp.sqrt(jnp.maximum(counts, 1.0))[..., None]

        agg = jnp.where(graph.cond_mask[..., None], graph.pose, agg)
        return agg * graph.node_mask[..., None]


def _supports_dispatch(model) -> bool:
    return isinstance(model, ConstraintDiffuser)


def make_denoiser(model):
    """Batched denoiser: (params, pose_in[B,N,P], graph[B,...], t[B]) -> [B,N,P].

    ``dispatch`` (optional) is the precomputed MoE dispatch from
    ``make_dispatch`` — thread it through when calling repeatedly on the same
    graph batch (e.g. inside a sampling scan).
    """

    def fn(params, pose_in, graph, t, dispatch=None, geom_emb=None):
        if _supports_dispatch(model):
            return model.apply(
                params, pose_in, graph, t, dispatch=dispatch, geom_emb=geom_emb
            )
        return model.apply(params, pose_in, graph, t)

    return fn


def make_energy_fn(model):
    """Batched energy: (params, pose_in[B,N,P], graph, t[B]) -> energies [B]."""

    def fn(params, pose_in, graph, t, dispatch=None, geom_emb=None):
        return model.apply(
            params, pose_in, graph, t, return_energy=True, dispatch=dispatch,
            geom_emb=geom_emb,
        )

    return fn


def make_energy_grad_fn(model):
    """Batched (gradient, energy) of the per-graph constraint energy w.r.t.
    the noisy poses — the TPU equivalent of the reference's autograd EBM path
    (``denoise_fn.py:539-548``). Graph energies are independent, so the
    gradient of the sum gives each graph's own gradient.
    """

    def fn(params, pose_in, graph, t, dispatch=None, geom_emb=None):
        def total(p):
            e = model.apply(
                params, p, graph, t, return_energy=True, dispatch=dispatch,
                geom_emb=geom_emb,
            )
            return e.sum(), e

        (_, e), g = jax.value_and_grad(total, has_aux=True)(pose_in)
        return g, e

    return fn
