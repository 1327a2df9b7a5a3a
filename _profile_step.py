"""Scratch profiling script for TPU perf work (not part of the framework)."""
import time, jax, jax.numpy as jnp, numpy as np
from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.models.diffuser import (
    ConstraintDiffuser, DiffuserConfig, make_dispatch)

rng = np.random.default_rng(0)
B = 1000
graphs = sample_qualitative_batch(rng, 100, max_nodes=8, max_edges=64)
graphs = jax.tree.map(lambda x: jnp.repeat(x, 10, axis=0), graphs)

def bench_fn(f, *args, iters=30):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

pose = jnp.zeros(graphs.pose.shape)
t = jnp.zeros((B,), jnp.int32)

for strategy, cdt in [("ragged", "float32"), ("ragged", "bfloat16"),
                      ("dense", "bfloat16")]:
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=256, matmul_strategy=strategy,
                         compute_dtype=cdt)
    model = ConstraintDiffuser(cfg)
    params = model.init(jax.random.PRNGKey(0), pose, graphs, t)
    disp = make_dispatch(graphs.edge_type, cfg.num_types)
    f = jax.jit(lambda p, x, tt: model.apply(p, x, graphs, tt, dispatch=disp))
    dt = bench_fn(f, params, pose, t)
    print(f"B={B} {strategy}/{cdt}: forward {dt*1e3:.3f} ms", flush=True)

# components: encoder only / bank only
cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                     hidden_dim=256)
model = ConstraintDiffuser(cfg)
params = model.init(jax.random.PRNGKey(0), pose, graphs, t)

f_geom = jax.jit(lambda p: model.apply(p, graphs, method=ConstraintDiffuser.encode_geometry))
print("encode_geometry:", bench_fn(f_geom, params) * 1e3, "ms", flush=True)

# raw bank matmul cost at the same size
x = jnp.zeros((B * 64, 1280), jnp.float32)
w = jnp.zeros((13, 1280, 512), jnp.float32)
gs = jnp.full((13,), B * 64 // 13, jnp.int32)
f_rd = jax.jit(lambda x, w: jax.lax.ragged_dot(x, w, gs))
print("ragged_dot f32:", bench_fn(f_rd, x, w) * 1e3, "ms", flush=True)
f_rd16 = jax.jit(lambda x, w: jax.lax.ragged_dot(
    x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
    gs, preferred_element_type=jnp.float32))
print("ragged_dot bf16:", bench_fn(f_rd16, x, w) * 1e3, "ms", flush=True)
f_mm = jax.jit(lambda x, w: x @ w[0])
print("plain matmul f32:", bench_fn(f_mm, x, w) * 1e3, "ms", flush=True)
