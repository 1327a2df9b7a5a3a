"""Train a Diffusion-CCSP model on TPU.

Capability parity: reference ``train_ddpm.py`` + ``train_utils.py`` (arg
parsing, trainer factory). Datasets are generated procedurally on first use
and cached as ``.npz`` shards under ``data/``.

Examples:
  python train_ccsp.py --input_mode qualitative --train_scenes 30000 \
      --train_num_steps 300000
  python train_ccsp.py --input_mode qualitative --smoke   # tiny sanity run
"""

from __future__ import annotations


import os

# persistent compilation cache: repeated CLI runs (and watchdog retries)
# reuse compiled executables instead of re-hitting the remote compiler
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")




import argparse
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_mode", default="qualitative",
                   choices=["qualitative", "diffuse_pairwise", "stability_flat",
                            "robot_box", "robot_qualitative",
                            "diffuse_pairwise_image"])
    p.add_argument("--model", default="Diffusion-CCSP",
                   choices=["Diffusion-CCSP", "StructDiffusion"])
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--train_num_steps", type=int, default=300_000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--ema_decay", type=float, default=0.995)
    p.add_argument("--train_scenes", type=int, default=30_000)
    p.add_argument("--test_scenes_per_count", type=int, default=100)
    p.add_argument("--EBM", default="none",
                   choices=["none", "ULA", "ULA+", "MALA", "HMC"])
    p.add_argument("--samples_per_step", type=int, default=10)
    p.add_argument("--data_dir", default="data")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_every", type=int, default=10_000)
    p.add_argument("--eval_tries", type=int, default=10)
    p.add_argument("--smoke", action="store_true",
                   help="tiny run: 200 scenes, 500 steps, T=100")
    p.add_argument("--pretrained_encoder", default=None,
                   help="orbax dir of a GeomAutoEncoder checkpoint "
                        "(train_encoders.py); its encoder weights are "
                        "transplanted into the image-mode denoiser and "
                        "FROZEN (reference denoise_fn.py:127-131)")
    p.add_argument("--finetune_encoder", action="store_true",
                   help="transplant the pretrained encoder but leave it "
                        "TRAINABLE (diagnosis knob for the round-4 "
                        "image-mode gap; the reference always freezes)")
    p.add_argument("--soft_raster", action="store_true",
                   help="anti-aliased rasterization (ops/raster.py): "
                        "sub-pixel boundary information for the image mode")
    return p.parse_args(argv)


def build(args):
    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.samplers import MCMCConfig
    from diffusion_ccsp_tpu.train.data import (
        GraphDataset,
        MODE_SPECS,
        generate_dataset,
    )
    from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer

    spec = MODE_SPECS[args.input_mode]
    ds_path = os.path.join(
        args.data_dir, f"{args.input_mode}({args.train_scenes})_train.npz"
    )
    if not os.path.exists(ds_path):
        print(f"generating {args.train_scenes} scenes -> {ds_path}", flush=True)
        generate_dataset(ds_path, args.input_mode, args.train_scenes,
                         seed=args.seed)
    dataset = GraphDataset.load(ds_path)
    print(f"dataset: {len(dataset)} scenes", flush=True)

    cfg = DiffuserConfig(
        input_mode=args.input_mode,
        geom_dim=spec["geom_dim"],
        pose_dim=spec["pose_dim"],
        grasp_dim=spec["grasp_dim"],
        hidden_dim=args.hidden_dim,
        use_image=args.input_mode.endswith("_image"),
        soft_raster=args.soft_raster,
    )
    if args.model == "StructDiffusion":
        from diffusion_ccsp_tpu.models.transformer import StructDiffusion

        model = StructDiffusion(cfg)
    else:
        model = ConstraintDiffuser(cfg)
    sched = DiffusionSchedule.create(timesteps=args.timesteps)
    mcmc = MCMCConfig(
        kind="none" if args.EBM == "none" else args.EBM,
        samples_per_step=args.samples_per_step,
    )
    diffusion = GaussianDiffusion(model, sched, mcmc=mcmc)

    tcfg = TrainConfig(
        train_num_steps=args.train_num_steps,
        batch_size=args.batch_size,
        lr=args.lr,
        ema_decay=args.ema_decay,
        save_every=args.eval_every,
        seed=args.seed,
        freeze_subtrees=(
            ("geom_encoder",)
            if args.pretrained_encoder and not args.finetune_encoder
            else ()
        ),
    )
    trainer = Trainer(diffusion, dataset, tcfg, results_dir=args.results_dir)
    return trainer, diffusion, dataset


def transplant_encoder(state, pretrained_encoder: str, probe_geoms=None,
                       image_dim: int = 64, soft: bool = False):
    """Copy the autoencoder's encoder weights into the denoiser's
    ``geom_encoder`` submodule (reference loads + freezes the pretrained
    image encoder, ``denoise_fn.py:127-131``).

    If ``probe_geoms`` is given, the encoder's output Dense layer is rescaled
    so the embedding has unit per-dim RMS on that probe batch. The round-4
    frozen encoder emitted norm-~1000 embeddings next to O(sqrt(h)) pose and
    time embeddings (``results/tri_image/diagnosis.json``), a ~60x scale
    skew a frozen subtree can never learn away."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(pretrained_encoder)
    with ocp.PyTreeCheckpointer() as ckptr:
        ae = ckptr.restore(path)
    params = jax.device_get(state.params)
    enc = ae["params"]["encoder"]
    target = params["params"]["geom_encoder"]
    src_shapes = jax.tree.map(lambda x: x.shape, enc)
    dst_shapes = jax.tree.map(lambda x: x.shape, target)
    assert src_shapes == dst_shapes, (src_shapes, dst_shapes)

    if probe_geoms is not None:
        from diffusion_ccsp_tpu.models.cnn import GeomEncoderImage
        from diffusion_ccsp_tpu.ops.raster import rasterize_geom_features

        enc_mod = GeomEncoderImage(image_dim, enc["Dense_0"]["bias"].shape[0])
        imgs = rasterize_geom_features(
            jnp.asarray(probe_geoms, jnp.float32), image_dim, soft=soft
        )
        z = enc_mod.apply({"params": enc},
                          imgs.reshape(imgs.shape[0], -1))
        rms = float(jnp.sqrt((z ** 2).mean()))
        scale = 1.0 / max(rms, 1e-6)
        enc = dict(enc)
        enc["Dense_0"] = {
            "kernel": enc["Dense_0"]["kernel"] * scale,
            "bias": enc["Dense_0"]["bias"] * scale,
        }
        print(f"rescaled encoder output: rms {rms:.1f} -> 1.0", flush=True)

    params["params"]["geom_encoder"] = enc
    ema = jax.device_get(state.ema_params)
    ema["params"]["geom_encoder"] = enc
    return state.replace(params=params, ema_params=ema)


def main(argv=None):
    import faulthandler
    import signal

    # live stack dumps without killing the process: kill -USR1 <pid>
    faulthandler.register(signal.SIGUSR1)
    import jax

    args = get_args(argv)
    if args.smoke:
        args.train_scenes = 200
        args.train_num_steps = 500
        args.timesteps = 100
        args.batch_size = 32
        args.eval_every = 10_000_000

    print("devices:", jax.devices(), flush=True)
    trainer, diffusion, dataset = build(args)

    # milestone evaluation on freshly sampled test sets
    from diffusion_ccsp_tpu.eval.evaluate import evaluate_model
    from diffusion_ccsp_tpu.graphs import stack_graphs
    from diffusion_ccsp_tpu.train.data import MODE_SPECS, mode_samplers
    from diffusion_ccsp_tpu.utils.timing import MetricsLogger

    spec = MODE_SPECS[args.input_mode]
    sampler, to_graph = mode_samplers(args.input_mode)
    metrics = MetricsLogger(os.path.join(args.results_dir, "metrics.jsonl"))

    def eval_fn(state, milestone):
        rng = np.random.default_rng(args.seed + 999)
        lo, hi = spec["counts"]
        for count in range(lo, hi + 1):
            gs = [
                to_graph(
                    sampler(rng, min_num_objects=count, max_num_objects=count),
                    spec["max_nodes"], spec["max_edges"],
                )
                for _ in range(args.test_scenes_per_count)
            ]
            test = stack_graphs(gs)  # host-side; jit device-puts
            res = evaluate_model(
                diffusion, state.params, test,
                jax.random.PRNGKey(args.seed + milestone),
                tries=args.eval_tries,
            )
            print(f"[milestone {milestone}] {count} objects: "
                  f"top1={res.top1:.3f} top{args.eval_tries}={res.topk:.3f}",
                  flush=True)
            # milestone*save_every == state.step, host-side (a device
            # readback here is the op that wedges on flaky tunnels)
            metrics.log(milestone * trainer.config.save_every, **{
                f"top1_{count}obj": res.top1,
                f"topk_{count}obj": res.topk,
            })

    # auto-resume from the rolling model-latest checkpoint so a watchdog
    # restart after a tunnel stall loses at most latest_every steps
    latest = os.path.join(args.results_dir, "model-latest")
    remaining = None
    if os.path.exists(latest) and not args.smoke:
        state = trainer.load("latest")
        remaining = max(args.train_num_steps - trainer.loaded_step, 0)
        print(f"auto-resuming from step {trainer.loaded_step} "
              f"({remaining} steps remain)", flush=True)
    else:
        state = trainer.init_state()
        if args.pretrained_encoder:
            # probe batch for the output-scale fix: movable geoms from the
            # training dataset itself
            arrs = dataset.arrays
            probe = arrs["geom"][
                arrs["node_mask"] & ~arrs["cond_mask"]
            ][:512]
            state = transplant_encoder(
                state, args.pretrained_encoder, probe_geoms=probe,
                image_dim=64, soft=args.soft_raster,
            )
            frozen = "frozen" if not args.finetune_encoder else "trainable"
            print(f"transplanted {frozen} encoder from "
                  f"{args.pretrained_encoder}", flush=True)
    state = trainer.train(state, num_steps=remaining,
                          eval_fn=eval_fn if not args.smoke else None)
    # milestone id computed host-side (a state.step readback here could hang
    # on a flaky tunnel after an otherwise-complete run)
    trainer.save(
        state, milestone=args.train_num_steps // trainer.config.save_every + 1
    )
    print("training completed", flush=True)


if __name__ == "__main__":
    main()
