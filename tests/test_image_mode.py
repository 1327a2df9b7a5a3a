"""Image input mode: on-device rasterizer properties, CNN autoencoder shapes,
and the image-mode ConstraintDiffuser forward (with geometry-embedding
hoisting equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.envs.triangles import sample_triangle_batch
from diffusion_ccsp_tpu.models.cnn import GeomAutoEncoder
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.raster import rasterize_geom_features


def test_raster_area_matches_triangle():
    """Mask pixel count should approximate the triangle's area fraction."""
    # right triangle: l = 0.5 (normalized), third vertex at (0.25, 0.25)
    geom = jnp.asarray([[0.5, 0.25, 0.25]])
    img = rasterize_geom_features(geom, image_dim=64)
    assert img.shape == (1, 64, 64)
    # canonical vertices in px: P1=(32,32), P2=(32,48), P3=(24,40)
    # area = 0.5 * base(16) * height(8) = 64 px
    area = float(img.sum())
    assert 40 <= area <= 100, area


def test_raster_scales_with_geometry():
    small = rasterize_geom_features(jnp.asarray([[0.3, 0.15, 0.2]]), 64).sum()
    large = rasterize_geom_features(jnp.asarray([[0.9, 0.45, 0.6]]), 64).sum()
    assert float(large) > 4 * float(small)


def test_soft_raster_subpixel_sensitivity():
    """The anti-aliased mask varies continuously with sub-pixel geometry
    changes the binary mask cannot represent (the measured round-4 image-mode
    bottleneck: binary quantization ~0.02 normalized units)."""
    g = jnp.asarray([[0.5, 0.25, 0.25]])
    eps = 0.004  # well below one pixel (2/64 = 0.031 normalized)
    s1 = rasterize_geom_features(g, 64, soft=True)
    s2 = rasterize_geom_features(g + eps, 64, soft=True)
    assert s1.shape == (1, 64, 64)
    assert float(s1.min()) >= 0.0 and float(s1.max()) <= 1.0
    # soft masks differ under a sub-pixel perturbation
    assert float(jnp.abs(s1 - s2).sum()) > 0.5
    # interior/exterior agree with the binary mask away from the boundary
    hard = rasterize_geom_features(g, 64)
    assert float(jnp.abs(jnp.where(s1 > 0.9, 1.0, jnp.where(s1 < 0.1, 0.0, hard)) - hard).mean()) < 0.02
    # area approximately matches the binary mask
    assert abs(float(s1.sum()) - float(hard.sum())) < 0.2 * float(hard.sum())


def test_transplant_rescales_embedding_rms(tmp_path):
    """transplant_encoder with probe geoms rescales the encoder output to
    unit per-dim RMS (round-5 fix for the norm-~1000 frozen embeddings)."""
    import orbax.checkpoint as ocp

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.models.cnn import GeomEncoderImage
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.train.data import GraphDataset
    from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer
    from train_ccsp import transplant_encoder

    ae = GeomAutoEncoder(16, 32)
    ae_params = ae.init(jax.random.PRNGKey(0), jnp.zeros((2, 16 * 16)))
    ck = str(tmp_path / "ae")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ck, jax.device_get(ae_params), force=True)

    rng = np.random.default_rng(0)
    graphs = sample_triangle_batch(rng, 8, min_num_objects=2,
                                   max_num_objects=3)
    dataset = GraphDataset.from_graphs(graphs, "diffuse_pairwise_image")
    cfg = DiffuserConfig(input_mode="diffuse_pairwise_image", geom_dim=3,
                         pose_dim=4, hidden_dim=32, use_image=True,
                         image_dim=16)
    diffusion = GaussianDiffusion(
        ConstraintDiffuser(cfg), DiffusionSchedule.create(timesteps=4)
    )
    trainer = Trainer(diffusion, dataset, TrainConfig(batch_size=4))
    arrs = dataset.arrays
    probe = arrs["geom"][arrs["node_mask"] & ~arrs["cond_mask"]][:64]
    state = transplant_encoder(trainer.init_state(), ck, probe_geoms=probe,
                               image_dim=16)

    enc = GeomEncoderImage(16, 32)
    imgs = rasterize_geom_features(jnp.asarray(probe), 16)
    z = enc.apply({"params": state.params["params"]["geom_encoder"]},
                  imgs.reshape(imgs.shape[0], -1))
    rms = float(jnp.sqrt((z ** 2).mean()))
    assert 0.9 < rms < 1.1, rms


def test_autoencoder_shapes():
    model = GeomAutoEncoder(in_features=32, hidden_dim=64, num_channel=8)
    x = jnp.zeros((5, 32 * 32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (5, 32 * 32)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_image_mode_diffuser_forward_and_hoisting():
    rng = np.random.default_rng(0)
    graphs = sample_triangle_batch(rng, 2, max_nodes=8, max_edges=32)
    cfg = DiffuserConfig(
        input_mode="diffuse_pairwise", geom_dim=3, pose_dim=4, hidden_dim=32,
        use_image=True, image_dim=32,
    )
    model = ConstraintDiffuser(cfg)
    pose_in = jax.random.normal(jax.random.PRNGKey(1), graphs.pose.shape)
    t = jnp.asarray([3, 7])
    params = model.init(jax.random.PRNGKey(2), pose_in, graphs, t)
    out = model.apply(params, pose_in, graphs, t)
    assert out.shape == graphs.pose.shape
    assert np.isfinite(np.asarray(out)).all()

    # precomputed geometry embeddings must give the identical result
    geom_emb = model.apply(
        params, graphs, method=ConstraintDiffuser.encode_geometry
    )
    out2 = model.apply(params, pose_in, graphs, t, geom_emb=geom_emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_pretrained_encoder_transplant_and_freeze(tmp_path):
    """Autoencoder encoder weights transplant into the image-mode denoiser
    and stay frozen under training (reference denoise_fn.py:127-131)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.triangles import sample_triangle_batch
    from diffusion_ccsp_tpu.models.cnn import GeomAutoEncoder
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.train.data import GraphDataset
    from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer
    from train_ccsp import transplant_encoder

    # a tiny autoencoder checkpoint
    ae = GeomAutoEncoder(16, 32)
    ae_params = ae.init(jax.random.PRNGKey(0), jnp.zeros((2, 16 * 16)))
    ck = str(tmp_path / "ae")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ck, jax.device_get(ae_params), force=True)

    rng = np.random.default_rng(0)
    graphs = sample_triangle_batch(rng, 8, min_num_objects=2,
                                   max_num_objects=3)
    dataset = GraphDataset.from_graphs(graphs, "diffuse_pairwise_image")
    cfg = DiffuserConfig(input_mode="diffuse_pairwise_image", geom_dim=3,
                         pose_dim=4, hidden_dim=32, use_image=True,
                         image_dim=16)
    diffusion = GaussianDiffusion(
        ConstraintDiffuser(cfg), DiffusionSchedule.create(timesteps=4)
    )
    tcfg = TrainConfig(batch_size=4, log_every=10**9, save_every=10**9,
                       freeze_subtrees=("geom_encoder",))
    trainer = Trainer(diffusion, dataset, tcfg)
    state = transplant_encoder(trainer.init_state(), ck)

    before_enc = jax.tree.leaves(state.params["params"]["geom_encoder"])
    # transplant really used the autoencoder weights
    for a, b in zip(before_enc,
                    jax.tree.leaves(ae_params["params"]["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    before_pose = [
        np.asarray(x)
        for x in jax.tree.leaves(state.params["params"]["pose_encoder"])
    ]
    state = trainer.train(state, num_steps=3)
    after_enc = jax.tree.leaves(state.params["params"]["geom_encoder"])
    for a, b in zip(before_enc, after_enc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the rest of the model trained (pose encoder moved)
    assert any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            before_pose,
            jax.tree.leaves(state.params["params"]["pose_encoder"]),
        )
    )
