"""End-to-end training smoke tests on the virtual 8-device CPU mesh:
loss decreases when overfitting a tiny dataset, checkpoints round-trip,
and the train step runs sharded across all devices."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.eval.evaluate import evaluate_qualitative
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
from diffusion_ccsp_tpu.parallel.mesh import make_mesh
from diffusion_ccsp_tpu.train.data import GraphDataset, graphs_to_arrays
from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer


def tiny_setup(num_scenes=16, hidden=32, timesteps=8):
    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, num_scenes, max_nodes=8, max_edges=64)
    dataset = GraphDataset.from_graphs(graphs, "qualitative")
    cfg = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=hidden
    )
    model = ConstraintDiffuser(cfg)
    sched = DiffusionSchedule.create(timesteps=timesteps)
    diffusion = GaussianDiffusion(model, sched)
    return dataset, diffusion


def test_training_reduces_loss():
    dataset, diffusion = tiny_setup()
    mesh = make_mesh(8)
    assert mesh.devices.size == 8, "conftest should expose 8 CPU devices"
    cfg = TrainConfig(
        batch_size=16, lr=1e-3, log_every=10_000, save_every=10_000_000
    )
    trainer = Trainer(diffusion, dataset, cfg, mesh=mesh)
    state = trainer.init_state()

    key = jax.random.PRNGKey(0)
    first_loss = float(diffusion.loss(state.params, dataset.take(np.arange(16)), key))
    state = trainer.train(state, num_steps=60)
    last_loss = float(diffusion.loss(state.params, dataset.take(np.arange(16)), key))
    assert last_loss < first_loss, (first_loss, last_loss)


def test_checkpoint_roundtrip():
    dataset, diffusion = tiny_setup(num_scenes=8)
    with tempfile.TemporaryDirectory() as d:
        cfg = TrainConfig(batch_size=8, log_every=10_000, save_every=10_000_000)
        trainer = Trainer(diffusion, dataset, cfg, results_dir=d)
        state = trainer.init_state()
        state = trainer.train(state, num_steps=3)
        trainer.save(state, milestone=1)
        assert os.path.exists(os.path.join(d, "config.json"))

        restored = trainer.load(1)
        assert int(restored.step) == int(state.step)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            state.params,
            restored.params,
        )


def test_evaluate_protocol_runs():
    dataset, diffusion = tiny_setup(num_scenes=4)
    test_graphs = dataset.take(np.arange(4))
    trainer = Trainer(diffusion, dataset, TrainConfig(batch_size=4))
    state = trainer.init_state()
    res = evaluate_qualitative(
        diffusion, state.params, test_graphs, jax.random.PRNGKey(1), tries=2
    )
    assert res.success.shape == (4, 2)
    assert 0.0 <= res.top1 <= 1.0
    assert res.topk >= res.top1
    s = res.summary()
    assert "sec_per_graph_per_try" in s
