

def test_epoch_batch_indices_cover_dataset_without_replacement():
    """Within one epoch every dataset element is visited exactly once
    (reference shuffled-DataLoader semantics, ddpm.py:443-444)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.train.trainer import epoch_batch_indices

    key = jax.random.PRNGKey(0)
    n, bs = 96, 16
    steps_per_epoch = n // bs

    def collect(epoch):
        return np.concatenate([
            np.asarray(epoch_batch_indices(
                key, jnp.asarray(epoch * steps_per_epoch + s), bs, n))
            for s in range(steps_per_epoch)
        ])

    e0, e1 = collect(0), collect(1)
    assert sorted(e0) == list(range(n))      # exact cover, no replacement
    assert sorted(e1) == list(range(n))
    assert not np.array_equal(e0, e1)        # reshuffled across epochs


def test_epoch_batch_indices_wrap_partial_epoch():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.train.trainer import epoch_batch_indices

    key = jax.random.PRNGKey(3)
    n, bs = 40, 16  # epoch straddle: step 2 covers positions 32..47 -> wraps
    idx = np.asarray(epoch_batch_indices(key, jnp.asarray(2), bs, n))
    assert len(idx) == bs and idx.min() >= 0 and idx.max() < n


def test_epoch_batch_indices_nondivisible_covers_every_epoch():
    """With bs not dividing n, every epoch still walks its permutation from
    position 0 (advisor finding: the old arithmetic skipped the head of the
    next permutation after a straddling batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.train.trainer import epoch_batch_indices

    key = jax.random.PRNGKey(7)
    n, bs = 40, 16
    steps_per_epoch = -(-n // bs)  # 3
    for epoch in range(3):
        idx = np.concatenate([
            np.asarray(epoch_batch_indices(
                key, jnp.asarray(epoch * steps_per_epoch + s), bs, n))
            for s in range(steps_per_epoch)
        ])
        # 48 draws over 40 elements: every element appears, none thrice
        counts = np.bincount(idx, minlength=n)
        assert counts.min() >= 1 and counts.max() <= 2
