"""Trainer extras: gradient accumulation, eval hook firing, host-side step
tracking after resume."""

import tempfile

import jax
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
from diffusion_ccsp_tpu.train.data import GraphDataset
from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer


def tiny(num_scenes=8, accum=1, save_every=10**9):
    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, num_scenes, max_nodes=8, max_edges=64)
    dataset = GraphDataset.from_graphs(graphs, "qualitative")
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=16)
    diffusion = GaussianDiffusion(
        ConstraintDiffuser(cfg), DiffusionSchedule.create(timesteps=4)
    )
    tcfg = TrainConfig(batch_size=4, gradient_accumulate_every=accum,
                       log_every=10**9, save_every=save_every)
    return diffusion, dataset, tcfg


def test_gradient_accumulation_runs():
    diffusion, dataset, tcfg = tiny(accum=2)
    trainer = Trainer(diffusion, dataset, tcfg)
    state = trainer.init_state()
    state = trainer.train(state, num_steps=6)
    assert int(state.step) == 6  # every micro-batch counts as a step


def test_eval_hook_fires_at_milestones():
    with tempfile.TemporaryDirectory() as d:
        diffusion, dataset, tcfg = tiny(save_every=5)
        trainer = Trainer(diffusion, dataset, tcfg, results_dir=d)
        state = trainer.init_state()
        fired = []
        state = trainer.train(
            state, num_steps=11, eval_fn=lambda s, m: fired.append(m)
        )
        assert fired == [1, 2]


def test_resume_continues_step_count():
    with tempfile.TemporaryDirectory() as d:
        diffusion, dataset, tcfg = tiny()
        trainer = Trainer(diffusion, dataset, tcfg, results_dir=d)
        state = trainer.train(trainer.init_state(), num_steps=4)
        trainer.save(state, milestone=1)
        restored = trainer.load(1)
        assert trainer.loaded_step == 4
        restored = trainer.train(restored, num_steps=3)
        assert int(restored.step) == 7


def test_gradient_accumulation_with_device_data():
    """gradient_accumulate_every > 1 must compose with the device-resident
    data path (round-1 gap: only tested with the host iterator)."""
    import jax
    import numpy as np

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.train.data import GraphDataset, graphs_to_arrays
    from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, 16, max_nodes=8, max_edges=64)
    ds = GraphDataset(arrays=graphs_to_arrays(graphs), input_mode="qualitative")
    cfg = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=32
    )
    diffusion = GaussianDiffusion(
        ConstraintDiffuser(cfg), DiffusionSchedule.create(timesteps=8)
    )
    tcfg = TrainConfig(
        train_num_steps=4, batch_size=4, gradient_accumulate_every=2,
        device_data=True, log_every=2, save_every=1000,
    )
    trainer = Trainer(diffusion, ds, tcfg, results_dir="/tmp/test_accum")
    state = trainer.init_state()
    p0 = jax.tree.map(np.asarray, state.params)
    state = trainer.train(state)
    p1 = jax.tree.map(np.asarray, state.params)
    # params moved and every leaf is finite
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or bool(np.any(pair != 0)),
        jax.tree.map(lambda a, b: np.asarray(a - b), p0, p1),
        False,
    )
    assert moved
    assert jax.tree_util.tree_reduce(
        lambda acc, x: acc and bool(np.isfinite(x).all()), p1, True
    )


def test_save_load_train_is_exact_continuation():
    """train(10) == train(5) -> save -> load -> train(5): params, EMA and the
    restored Adam moments must continue bitwise (round-2 weakness: load
    re-initialized opt_state, silently resetting the optimizer mid-run)."""
    with tempfile.TemporaryDirectory() as d:
        diffusion, dataset, tcfg = tiny()
        trainer = Trainer(diffusion, dataset, tcfg, results_dir=d)
        straight = trainer.train(trainer.init_state(), num_steps=10)

        trainer2 = Trainer(diffusion, dataset, tcfg, results_dir=d)
        mid = trainer2.train(trainer2.init_state(), num_steps=5)
        trainer2.save(mid, milestone=1)
        restored = trainer2.load(1)
        # optimizer moments survive the round-trip
        for a, b in zip(jax.tree.leaves(mid.opt_state),
                        jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        resumed = trainer2.train(restored, num_steps=5)

        for name, tree_a, tree_b in [
            ("params", straight.params, resumed.params),
            ("ema", straight.ema_params, resumed.ema_params),
        ]:
            for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=0,
                    err_msg=f"{name} diverged after resume")


def test_rolling_latest_checkpoint_and_resume():
    """model-latest is written every latest_every steps and load('latest')
    resumes mid-run (stall recovery: a restart loses at most latest_every
    steps instead of the whole training)."""
    import os

    with tempfile.TemporaryDirectory() as d:
        diffusion, dataset, tcfg = tiny()
        tcfg = TrainConfig(**{**tcfg.__dict__, "latest_every": 3})
        trainer = Trainer(diffusion, dataset, tcfg, results_dir=d)
        state = trainer.train(trainer.init_state(), num_steps=7)
        assert os.path.exists(os.path.join(d, "model-latest"))
        restored = trainer.load("latest")
        assert trainer.loaded_step == 6  # last multiple of 3 before 7
        restored = trainer.train(restored, num_steps=2)
        assert int(restored.step) == 8
