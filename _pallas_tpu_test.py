"""Scratch: validate the fused Pallas edge kernel on the real TPU (lowering +
numerics vs the sorted XLA path) without running the whole bench."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.ops.edge_kernel import (
    fused_edge_bank,
    make_padded_dispatch,
    sorted_edge_bank,
)

B, N, E, H, K = 100, 8, 64, 256, 13
rng = np.random.default_rng(0)
graphs = sample_qualitative_batch(rng, B, max_nodes=N, max_edges=E)
d = make_padded_dispatch(
    graphs.edges, graphs.edge_type, graphs.edge_mask, K, N
)
geom = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
pose = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
temb = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
w = jnp.asarray(rng.normal(size=(K, 5 * H, 2 * H)) * 0.02, jnp.float32)
b = jnp.asarray(rng.normal(size=(K, 2 * H)) * 0.02, jnp.float32)

ref = sorted_edge_bank(d, geom, pose, temb, w, b, compute_dtype="float32")
print("sorted ok", ref.shape, flush=True)

try:
    out = fused_edge_bank(
        d, geom, pose, temb, w, b, hidden=H, compute_dtype="float32",
        interpret=False,
    )
    out.block_until_ready()
    err = float(jnp.abs(out - ref).max())
    print(f"pallas ok, max err vs sorted = {err:.3e}", flush=True)
    f = jax.jit(lambda *a: fused_edge_bank(
        *a, hidden=H, compute_dtype="bfloat16", interpret=False))
    o = f(d, geom, pose, temb, w, b); o.block_until_ready()
    t0 = time.time()
    for _ in range(50):
        o = f(d, geom, pose, temb, w, b)
    o.block_until_ready()
    print(f"pallas bf16: {(time.time()-t0)/50*1e6:.1f} us/call", flush=True)
    g = jax.jit(lambda *a: sorted_edge_bank(*a, compute_dtype="bfloat16"))
    o = g(d, geom, pose, temb, w, b); o.block_until_ready()
    t0 = time.time()
    for _ in range(50):
        o = g(d, geom, pose, temb, w, b)
    o.block_until_ready()
    print(f"sorted bf16: {(time.time()-t0)/50*1e6:.1f} us/call", flush=True)
except Exception as exc:
    print("pallas FAILED:", str(exc)[:500])
