"""Training loop: optax Adam, EMA shadow params, data-parallel sharding,
self-describing checkpoints.

Capability parity: reference ``networks/ddpm.py:394-556`` (Trainer) — train
loop with gradient accumulation, EMA every ``update_ema_every`` steps,
periodic save + evaluate. TPU-native differences:

- the train step is one jitted function; with a ``dp`` mesh the batch is
  sharded and XLA derives the gradient all-reduce over ICI from sharding
  annotations (the reference is single-GPU, SURVEY.md §2.5);
- gradient accumulation is expressed as a larger per-step batch (the TPU is
  not memory-bound at this model size); the knob is still available;
- checkpoints are self-describing: config JSON + params/EMA/opt-state via
  orbax, instead of run-config recovery from wandb directory names
  (reference ``train_utils.py:316-337``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from diffusion_ccsp_tpu.train.data import GraphDataset


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Defaults follow the reference recipe (``train_utils.py:88,217-219,305``):
    300k steps, batch 128, lr 5e-4, EMA 0.995."""

    train_num_steps: int = 300_000
    batch_size: int = 128
    lr: float = 5e-4
    ema_decay: float = 0.995
    update_ema_every: int = 10
    step_start_ema: int = 2000
    gradient_accumulate_every: int = 1
    save_every: int = 10_000
    log_every: int = 1000
    seed: int = 0
    #: keep the whole dataset in HBM and gather batches on device — removes
    #: the per-step host->device transfer (the reference's DataLoader feeds
    #: from host every step, ``ddpm.py:529``)
    device_data: bool = True
    #: top-level module names whose parameters receive zero updates (the
    #: reference freezes the pretrained image encoder, denoise_fn.py:127-131)
    freeze_subtrees: tuple = ()
    #: cadence of the rolling ``model-latest`` checkpoint (0 disables). A
    #: tunnel stall that kills the process mid-run then costs at most
    #: latest_every steps instead of the whole training (the reference has
    #: no mid-run resume either — wandb-dir recovery only, train_utils.py:316)
    latest_every: int = 25_000


def epoch_batch_indices(key, step, batch_size: int, n: int):
    """Dataset indices for one training step, sampled WITHOUT replacement
    within an epoch: a per-epoch permutation (epoch-stable key) walked
    sequentially — the reference's shuffled DataLoader epoch semantics
    (``ddpm.py:443-444``), computed entirely on device from the step counter.
    Epoch boundaries are derived from ``steps_per_epoch = ceil(n / bs)`` so
    every epoch walks its permutation from position 0 (advisor finding: the
    old ``start = step*bs`` arithmetic skipped each permutation's head after
    a straddling batch). When ``bs`` does not divide ``n`` the final batch of
    an epoch wraps into the same permutation's start (bounded duplication,
    exact cover otherwise).
    """
    steps_per_epoch = -(-n // batch_size)  # ceil
    epoch = step // steps_per_epoch
    start = (step % steps_per_epoch) * batch_size
    k_perm = jax.random.fold_in(jax.random.fold_in(key, 0), epoch)
    perm = jax.random.permutation(k_perm, n)
    return perm[(start + jnp.arange(batch_size)) % n]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


class Trainer:
    def __init__(
        self,
        diffusion: GaussianDiffusion,
        dataset: GraphDataset,
        config: TrainConfig = TrainConfig(),
        results_dir: str = "results",
        mesh=None,
    ):
        self.diffusion = diffusion
        self.dataset = dataset
        self.config = config
        self.results_dir = results_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = optax.adam(config.lr)
        if config.freeze_subtrees:
            frozen = set(config.freeze_subtrees)

            def label_fn(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "freeze"
                    if any(
                        getattr(p, "key", None) in frozen for p in path
                    )
                    else "train",
                    params,
                )

            self.optimizer = optax.multi_transform(
                {"train": self.optimizer, "freeze": optax.set_to_zero()},
                label_fn,
            )
        if config.gradient_accumulate_every > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, config.gradient_accumulate_every
            )

        cfg = config

        def train_step(state: TrainState, graph: ConstraintGraph, key):
            loss, grads = jax.value_and_grad(self.diffusion.loss)(
                state.params, graph, key
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)

            # EMA (reference ddpm.py:69-82,488-494): before step_start_ema the
            # shadow copies the online params; afterwards decay-average every
            # update_ema_every steps.
            do_ema = (state.step % cfg.update_ema_every) == 0
            started = state.step >= cfg.step_start_ema

            def ema_update(e, p):
                warm = jnp.where(started, e * cfg.ema_decay + (1 - cfg.ema_decay) * p, p)
                return jnp.where(do_ema, warm, e)

            ema_params = jax.tree.map(ema_update, state.ema_params, params)
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                ema_params=ema_params,
            )
            return new_state, loss

        rep = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh)
        self._train_step = jax.jit(
            train_step,
            in_shardings=(rep, bsh, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

        def train_step_device(state: TrainState, data: ConstraintGraph, key):
            """Batch gathered on device from the resident dataset.

            Sampling is without replacement within an epoch: a per-epoch
            permutation (derived from the constant data key + epoch index,
            all on device from ``state.step``) is walked sequentially, like
            the reference's shuffled DataLoader epochs (``ddpm.py:443-444``),
            instead of uniform sampling with replacement.
            """
            n = data.batch_shape[0]
            idx = epoch_batch_indices(key, state.step, cfg.batch_size, n)
            k_loss = jax.random.fold_in(
                jax.random.fold_in(key, 1), state.step
            )
            graph = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x[idx], bsh), data
            )
            return train_step(state, graph, k_loss)

        self._train_step_device = jax.jit(
            train_step_device,
            in_shardings=(rep, rep, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._device_dataset = None

    # ------------------------------------------------------------------ #

    def init_state(self, key=None) -> TrainState:
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        example = self.dataset.take(np.asarray([0]))
        single = jax.tree.map(lambda x: x[0], example)
        params = self.diffusion.model.init(
            key, single.pose, single, jnp.asarray(0)
        )
        opt_state = self.optimizer.init(params)
        return TrainState(
            step=jnp.asarray(0),
            params=params,
            opt_state=opt_state,
            ema_params=jax.tree.map(jnp.copy, params),
        )

    def train(
        self,
        state: TrainState | None = None,
        num_steps: int | None = None,
        log_fn: Callable[[int, float, float], None] | None = None,
        eval_fn: Callable[[TrainState, int], None] | None = None,
        start_step: int | None = None,
    ) -> TrainState:
        """Run the training loop.

        ``eval_fn(state, milestone)`` fires after every checkpoint save —
        the reference evaluates at each milestone (``ddpm.py:549-552``).
        """
        cfg = self.config
        num_steps = num_steps if num_steps is not None else cfg.train_num_steps
        if state is None:
            state = self.init_state()
        key = jax.random.PRNGKey(cfg.seed + 1)

        if cfg.device_data:
            if self._device_dataset is None:
                from diffusion_ccsp_tpu.train.data import arrays_to_graphs

                self._device_dataset = jax.device_put(
                    jax.tree.map(
                        jnp.asarray, arrays_to_graphs(self.dataset.arrays)
                    ),
                    replicated_sharding(self.mesh),
                )
        else:
            it = self.dataset.batches(cfg.batch_size, seed=cfg.seed)
        print("train: entering step loop", flush=True)
        losses = []
        t_start = time.time()
        t_beat = t_start
        # NOTE: the step counter is tracked host-side — an int(state.step)
        # readback here would block the loop on the first step's compile and
        # stall liveness heartbeats (and D2H readbacks are the flaky op on
        # tunnel transports). Callers resuming from a checkpoint pass
        # start_step (Trainer.load records it in self.loaded_step).
        if start_step is None:
            start_step = getattr(self, "loaded_step", None) or 0
        # constant data key for the device path: per-step randomness derives
        # from state.step inside the jitted step (epoch permutation needs an
        # epoch-stable key, so the key cannot change every step)
        data_key = jax.random.PRNGKey(cfg.seed + 2)
        for i in range(num_steps):
            key, sub = jax.random.split(key)
            if cfg.device_data:
                state, loss = self._train_step_device(
                    state, self._device_dataset, data_key
                )
            else:
                graph = next(it)
                state, loss = self._train_step(state, graph, sub)
            losses.append(loss)

            step = start_step + i + 1
            if time.time() - t_beat > 60:
                t_beat = time.time()
                print(f"train: heartbeat i={i}", flush=True)
            if step % cfg.log_every == 0:
                mean_loss = float(jnp.mean(jnp.stack(losses)))
                losses = []
                if not np.isfinite(mean_loss):
                    # failure detection (the reference silently skips NaN
                    # samples at eval, ddpm.py:644-645; training divergence
                    # deserves a loud signal)
                    print(f"WARNING: non-finite loss at step {step}",
                          flush=True)
                rate = (i + 1) / (time.time() - t_start)
                if log_fn is not None:
                    log_fn(step, mean_loss, rate)
                else:
                    print(
                        f"step {step}  loss {mean_loss:.5f}  "
                        f"{rate:.1f} steps/s",
                        flush=True,
                    )
            if step % cfg.save_every == 0:
                milestone = step // cfg.save_every
                self.save(state, milestone=milestone)
                if eval_fn is not None:
                    eval_fn(state, milestone)
            if cfg.latest_every and step % cfg.latest_every == 0:
                self.save(state, milestone="latest")
        return state

    # ------------------------------------------------------------------ #
    # checkpointing (self-describing; reference ddpm.py:496-517)
    # ------------------------------------------------------------------ #

    def save(self, state: TrainState, milestone: int | str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.results_dir, f"model-{milestone}")
        )
        os.makedirs(self.results_dir, exist_ok=True)
        # opt_state is stored as a flat leaf list — optax states are nested
        # namedtuples whose *structure* is recoverable from optimizer.init, so
        # only the leaves need to round-trip through orbax (restoring custom
        # nodes directly would come back as plain dicts).
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(
                path,
                {
                    "step": np.asarray(state.step),
                    "params": jax.device_get(state.params),
                    "ema_params": jax.device_get(state.ema_params),
                    "opt_state": [
                        np.asarray(x)
                        for x in jax.tree.leaves(jax.device_get(state.opt_state))
                    ],
                },
                force=True,
            )
        with open(os.path.join(self.results_dir, "config.json"), "w") as f:
            json.dump(
                {
                    "train": dataclasses.asdict(self.config),
                    "model": dataclasses.asdict(self.diffusion.model.config),
                    "model_class": type(self.diffusion.model).__name__,
                    "mcmc": dataclasses.asdict(self.diffusion.mcmc),
                    "timesteps": self.diffusion.schedule.num_timesteps,
                },
                f,
                indent=2,
            )

    def load(self, milestone: int | str) -> TrainState:
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.results_dir, f"model-{milestone}")
        )
        with ocp.PyTreeCheckpointer() as ckptr:
            data = ckptr.restore(path)
        self.loaded_step = int(np.asarray(data["step"]))
        params = data["params"]
        opt_state = self.optimizer.init(params)
        if "opt_state" in data and data["opt_state"] is not None:
            # restore Adam moments into the freshly-initialized structure
            # (round-2 weakness: resume silently reset the optimizer)
            treedef = jax.tree.structure(opt_state)
            saved = data["opt_state"]
            if isinstance(saved, dict):  # orbax may key list entries "0".."n"
                saved = [saved[k] for k in sorted(saved, key=int)]
            leaves = [jnp.asarray(x) for x in saved]
            assert len(leaves) == treedef.num_leaves
            opt_state = jax.tree.unflatten(treedef, leaves)
        return TrainState(
            step=jnp.asarray(data["step"]),
            params=params,
            opt_state=opt_state,
            ema_params=data["ema_params"],
        )
