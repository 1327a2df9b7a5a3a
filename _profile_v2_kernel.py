"""Roofline profile note for the split-bank v2 kernel (VERDICT r4 item 2):
decompose the fan-out x20 denoiser step into kernel vs everything-else, and
sweep the chunk gather width. Writes results/v2_kernel_profile.json.

Run when the chip is free: python _profile_v2_kernel.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.edge_kernel import (
        compute_edge_const,
        fused_edge_bank_v2,
        make_padded_dispatch,
        auto_chunk_graphs,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule

    H = 256
    rng = np.random.default_rng(0)
    base = sample_qualitative_batch(rng, 100, max_nodes=8, max_edges=64)
    graphs = jax.tree.map(lambda x: jnp.asarray(np.repeat(x, 20, axis=0)),
                          base)  # fan-out x20: 2000 chains
    bsz = 2000

    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=H, use_pallas=True,
                         compute_dtype="bfloat16")
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))
    sched = DiffusionSchedule.create(timesteps=1000)

    report = {}

    def timeit(fn, *args, n=20):
        jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / n

    w = params["params"]["mlp_bank"]["kernel"]
    b = params["params"]["mlp_bank"]["bias"]
    dec = params["params"]["pose_decoder"]

    # NB: every jitted function below takes its big operands as ARGUMENTS.
    # Closing over concrete arrays bakes them into the HLO as literals, and
    # at 2000 chains the embedded dispatch tables exceed the axon tunnel's
    # remote-compile request-size limit (HTTP 413).
    geom_emb = jax.jit(lambda p, g: model.apply(
        p, g, method=ConstraintDiffuser.encode_geometry))(params, graphs)
    pose_emb_fn = jax.jit(lambda p, x: model.apply(
        p, x, method=lambda m, xx: m.pose_encoder(xx)))
    pose_emb = pose_emb_fn(params, graphs.pose)
    t_emb_fn = jax.jit(lambda p, t: model.apply(
        p, t, method=lambda m, tt: m.time_mlp(tt)))
    t_emb = t_emb_fn(params, jnp.full((bsz,), 500, jnp.int32))

    # chunk-width sweep: kernel-only per-step time
    for target in (512, 1024, 2048):
        d = make_padded_dispatch(
            graphs.edges, graphs.edge_type, graphs.edge_mask,
            cfg.num_types, graphs.max_nodes,
            chunk_graphs=auto_chunk_graphs(bsz, 8, target_rows=target),
        )
        gc = compute_edge_const(d, geom_emb, w, "bfloat16")
        d = d.replace(edge_const=gc)

        def kern(dd, pe, te, ww, bb, dd0k, dd0b, dd1k, dd1b):
            return fused_edge_bank_v2(
                dd, pe, te, ww, bb, dd0k, dd0b, dd1k, dd1b,
                hidden=H, pose_dim=4, compute_dtype="bfloat16",
            )

        dt = timeit(jax.jit(kern), d, pose_emb, t_emb, w, b,
                    dec["Dense_0"]["kernel"], dec["Dense_0"]["bias"],
                    dec["Dense_1"]["kernel"], dec["Dense_1"]["bias"])
        report[f"kernel_only_target{target}_ms"] = dt * 1000
        report[f"tiles_target{target}"] = int(d.rows // 128)
        print(f"target_rows={target}: kernel {dt*1000:.2f} ms/step, "
              f"{d.rows//128} tiles", flush=True)

    # full denoiser call (kernel + encoders + scatter) at default chunking
    diffusion = GaussianDiffusion(model, sched)
    dispatch = diffusion._dispatch(graphs)
    dispatch = diffusion._attach_edge_const(params, graphs, dispatch, None)

    x = jnp.asarray(np.asarray(graphs.pose) * 0.7)
    tb = jnp.full((bsz,), 500, jnp.int32)

    def full_call(p, xx, g, t, dsp):
        return diffusion._denoise(p, xx, g, t, dsp)

    dt_full = timeit(jax.jit(full_call), params, x, graphs, tb, dispatch)
    report["full_denoise_call_ms"] = dt_full * 1000

    # full chain per-step cost (the protocol unit): T=1000 sample / T
    def chain(p, g, key):
        return diffusion.sample(p, g, key)

    jitted = jax.jit(chain)
    jax.block_until_ready(jitted(params, graphs, jax.random.PRNGKey(1)))
    t0 = time.time()
    jax.block_until_ready(jitted(params, graphs, jax.random.PRNGKey(2)))
    per_step = (time.time() - t0) / 1000
    report["chain_per_step_ms"] = per_step * 1000
    report["note"] = (
        "x20 fan-out (2000 chains, qualitative h256). kernel_only = the v2 "
        "pallas call; full_denoise_call adds encoders+scatter+XLA glue; "
        "chain_per_step adds p_sample update + PRNG + loop overhead. The "
        "difference rows localize the remaining roofline gap."
    )
    print(json.dumps(report, indent=2))
    with open("results/v2_kernel_profile.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
