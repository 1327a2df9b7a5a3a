"""Pretrain the CNN geometry autoencoder on rasterized triangle shapes.

Capability parity: reference ``train_encoders.py`` (GeomAutoEncoder
pretraining; the trained encoder is loaded frozen by the image-mode denoiser,
``denoise_fn.py:127-131``). Training images come from the on-device
rasterizer over freshly sampled canonical triangles — no image dataset on
disk.

Example:
  python train_encoders.py --steps 2000 --out encoder_checkpoints/geom_autoencoder
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--image_dim", type=int, default=64)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out", default="encoder_checkpoints/geom_autoencoder")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--soft", action="store_true",
                   help="train on anti-aliased masks (ops/raster.py soft=True)")
    p.add_argument("--data_npz", default=None,
                   help="optional dataset npz; half of each batch samples "
                        "real dataset geoms so the encoder sees the "
                        "training distribution, not only random triangles")
    args = p.parse_args(argv)

    from diffusion_ccsp_tpu.envs.triangles import canonical_p1
    from diffusion_ccsp_tpu.models.cnn import GeomAutoEncoder
    from diffusion_ccsp_tpu.ops.raster import rasterize_geom_features

    rng = np.random.default_rng(args.seed)

    def sample_geoms(n):
        """random canonical triangles, normalized like dataset features"""
        out = []
        while len(out) < n:
            tri = rng.uniform(-1.2, 1.2, (3, 2))
            a = 0.5 * abs(
                (tri[1, 0] - tri[0, 0]) * (tri[2, 1] - tri[0, 1])
                - (tri[2, 0] - tri[0, 0]) * (tri[1, 1] - tri[0, 1])
            )
            if a < 0.05:
                continue
            extent, _ = canonical_p1(tri)
            out.append(extent / 3.0)  # normalize by tray dim 3
        return jnp.asarray(np.stack(out), jnp.float32)

    ds_geoms = None
    if args.data_npz:
        d = np.load(args.data_npz, allow_pickle=True)
        mov = d["geom"][d["node_mask"] & ~d["cond_mask"]]
        ds_geoms = np.asarray(mov, np.float32)
        print(f"mixing {len(ds_geoms)} dataset geoms into batches", flush=True)

    def batch_geoms(n):
        if ds_geoms is None:
            return sample_geoms(n)
        half = n // 2
        idx = rng.integers(0, len(ds_geoms), half)
        return jnp.concatenate(
            [jnp.asarray(ds_geoms[idx]), sample_geoms(n - half)], 0
        )

    model = GeomAutoEncoder(args.image_dim, args.hidden_dim)
    x0 = rasterize_geom_features(sample_geoms(2), args.image_dim,
                                 soft=args.soft).reshape(2, -1)
    params = model.init(jax.random.PRNGKey(args.seed), x0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, geoms):
        imgs = rasterize_geom_features(geoms, args.image_dim, soft=args.soft)
        imgs = imgs.reshape(imgs.shape[0], -1)

        def loss_fn(p):
            recon = model.apply(p, imgs)
            # binary cross-entropy on the mask
            eps = 1e-6
            return -(
                imgs * jnp.log(recon + eps)
                + (1 - imgs) * jnp.log(1 - recon + eps)
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        geoms = batch_geoms(args.batch)
        params, opt_state, loss = step(params, opt_state, geoms)
        if (i + 1) % 100 == 0:
            print(f"step {i+1}  bce {float(loss):.4f}", flush=True)

    import orbax.checkpoint as ocp

    path = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params), force=True)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
