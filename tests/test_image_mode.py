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
