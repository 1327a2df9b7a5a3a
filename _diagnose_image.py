"""Diagnose the image-mode quality gap (VERDICT r4 item 3).

Probes, in order of the VERDICT's bisect list:
  (a) frozen-encoder embedding quality: autoencoder reconstruction IoU and a
      ridge linear probe embeddings -> geometry, both on the *dataset* geom
      distribution and on the pretraining ``sample_geoms`` distribution;
  (b) train/eval raster parity is structural here (one on-device rasterizer,
      ``ops/raster.py``, feeds both training and eval through
      ``models/diffuser.py:318-322``) — instead we quantify raster
      information loss directly (distinct masks per distinct geom);
  (c) distribution shift between pretraining geoms and dataset geoms.

Run on CPU: JAX_PLATFORMS=cpu python _diagnose_image.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import orbax.checkpoint as ocp

    from diffusion_ccsp_tpu.models.cnn import GeomAutoEncoder, GeomEncoderImage
    from diffusion_ccsp_tpu.ops.raster import rasterize_geom_features

    d = np.load("data/diffuse_pairwise_image(30000)_train.npz",
                allow_pickle=True)
    geom = d["geom"]          # [S, 8, 3]
    nm = d["node_mask"]
    cm = d["cond_mask"]
    # movable (non-container) triangle geoms
    mov = geom[nm & ~cm]
    rng = np.random.default_rng(0)
    sel = rng.choice(len(mov), 4096, replace=False)
    ds_geoms = jnp.asarray(mov[sel], jnp.float32)
    container = jnp.asarray(geom[cm & nm][:8], jnp.float32)

    # pretraining distribution (train_encoders.py sample_geoms)
    from diffusion_ccsp_tpu.envs.triangles import canonical_p1

    def sample_geoms(n):
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
            out.append(extent / 3.0)
        return jnp.asarray(np.stack(out), jnp.float32)

    pre_geoms = sample_geoms(4096)

    report = {}
    for name, g in [("dataset", ds_geoms), ("pretrain_dist", pre_geoms)]:
        report[f"{name}_geom_mean"] = np.asarray(g).mean(0).tolist()
        report[f"{name}_geom_std"] = np.asarray(g).std(0).tolist()
        report[f"{name}_geom_min"] = np.asarray(g).min(0).tolist()
        report[f"{name}_geom_max"] = np.asarray(g).max(0).tolist()

    model = GeomAutoEncoder(64, 256)
    with ocp.PyTreeCheckpointer() as ck:
        params = ck.restore("/root/repo/encoder_checkpoints/geom_autoencoder")

    enc = GeomEncoderImage(64, 256)
    enc_params = {"params": params["params"]["encoder"]}

    @jax.jit
    def recon_iou(g):
        imgs = rasterize_geom_features(g, 64)
        flat = imgs.reshape(imgs.shape[0], -1)
        rec = model.apply(params, flat) > 0.5
        tgt = flat > 0.5
        inter = (rec & tgt).sum(-1)
        union = (rec | tgt).sum(-1)
        return inter / jnp.maximum(union, 1), flat

    @jax.jit
    def embed(g):
        imgs = rasterize_geom_features(g, 64)
        return enc.apply(enc_params, imgs.reshape(imgs.shape[0], -1))

    for name, g in [("dataset", ds_geoms), ("pretrain_dist", pre_geoms)]:
        iou, flat = recon_iou(g)
        report[f"{name}_recon_iou_mean"] = float(iou.mean())
        report[f"{name}_recon_iou_p10"] = float(jnp.percentile(iou, 10))
        report[f"{name}_mask_px_mean"] = float(flat.sum(-1).mean())

        # ridge linear probe: embedding -> geom, R^2 per feature
        z = np.asarray(embed(g))
        y = np.asarray(g)
        ntr = 3072
        A = np.concatenate([z, np.ones((len(z), 1))], 1)
        lam = 1e-3
        w = np.linalg.solve(A[:ntr].T @ A[:ntr] + lam * np.eye(A.shape[1]),
                            A[:ntr].T @ y[:ntr])
        pred = A[ntr:] @ w
        resid = ((pred - y[ntr:]) ** 2).mean(0)
        var = y[ntr:].var(0)
        report[f"{name}_linear_probe_r2"] = (1 - resid / var).tolist()

    # container embedding: is the degenerate (1,1,0) code stable / distinct?
    zc = np.asarray(embed(container))
    zt = np.asarray(embed(ds_geoms[:256]))
    d_cc = np.linalg.norm(zc - zc.mean(0), axis=1).mean()
    d_ct = np.linalg.norm(zt - zc.mean(0), axis=1).mean()
    report["container_embed_spread"] = float(d_cc)
    report["container_to_triangle_dist"] = float(d_ct)
    report["triangle_embed_norm"] = float(np.linalg.norm(zt, axis=1).mean())

    # raster information loss: how far apart must two geoms be before their
    # 64x64 masks differ? perturb each geom by eps and count changed pixels
    for eps in (0.01, 0.02, 0.05):
        g2 = ds_geoms[:1024] + eps
        m1 = np.asarray(rasterize_geom_features(ds_geoms[:1024], 64))
        m2 = np.asarray(rasterize_geom_features(g2, 64))
        diff = (m1 != m2).reshape(1024, -1).sum(-1)
        report[f"raster_px_changed_eps{eps}"] = float(diff.mean())
        report[f"raster_identical_frac_eps{eps}"] = float((diff == 0).mean())

    print(json.dumps(report, indent=2))
    with open("results/tri_image/diagnosis.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
