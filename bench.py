"""Headline benchmark: reverse-diffusion sampling wall-clock per problem graph.

Protocol mirrors the reference's eval timing (``networks/ddpm.py:611-631``):
a batch of 100 qualitative CCSP problems, full T=1000 DDPM reverse chain with
on-device constraint checking, reported as seconds per problem graph.

Baseline anchor: the reference records 0.005–0.01 s/graph for its fastest
batched runs and 0.10–0.14 s/graph for robot TAMP runs on an unstated CUDA GPU
(``solve_csp.py:104-105``; see BASELINE.md). We compare against the fast
anchor's midpoint (0.0075 s/graph): ``vs_baseline = baseline / ours`` (>1
means faster than the reference).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SEC_PER_GRAPH = 0.0075
BATCH = 100
TIMESTEPS = 1000
HIDDEN = 256


def main():
    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
    from diffusion_ccsp_tpu.eval.evaluate import make_sample_and_check
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule

    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, BATCH, max_nodes=8, max_edges=64)

    cfg = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=HIDDEN
    )
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=TIMESTEPS)
    diffusion = GaussianDiffusion(model, sched)

    fn = make_sample_and_check(diffusion)

    # compile
    ok, out = fn(params, graphs, jax.random.PRNGKey(1))
    jax.block_until_ready((ok, out))

    times = []
    for i in range(3):
        t0 = time.time()
        ok, out = fn(params, graphs, jax.random.PRNGKey(2 + i))
        jax.block_until_ready((ok, out))
        times.append(time.time() - t0)

    sec_per_graph = min(times) / BATCH
    print(
        json.dumps(
            {
                "metric": "qualitative_sample_sec_per_graph_T1000_b100",
                "value": sec_per_graph,
                "unit": "s/graph",
                "vs_baseline": BASELINE_SEC_PER_GRAPH / sec_per_graph,
            }
        )
    )


if __name__ == "__main__":
    main()
