"""End-to-end training smoke: pjit train step over a 2-device CPU mesh,
synthetic audio, loss finite and parameters updated; BN stats move."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nhans_tpu.config import Config
from nhans_tpu.parallel.mesh import make_mesh, shard_batch
from nhans_tpu.train.step import create_state, make_train_step


@pytest.mark.slow
def test_train_step_updates_and_loss_finite():
    cfg = Config.denoiser()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, max_samples=16000,
                                 slices_per_step=2),
        train=dataclasses.replace(cfg.train, alg="adam", lr=1e-3))
    mesh = make_mesh(data=2)
    model, state, tx = create_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx, mesh=mesh, donate=False)

    rng = np.random.default_rng(0)
    B, L = 2, cfg.data.max_samples
    t = np.arange(L) / 16000.0
    clean = np.stack([np.sin(2 * np.pi * 440 * t),
                      np.sin(2 * np.pi * 220 * t)]).astype(np.float32)
    batch = {
        "clean": clean * 3000,
        "noise_a": rng.standard_normal((B, L)).astype(np.float32) * 500,
        "noise_b": rng.standard_normal((B, L)).astype(np.float32) * 500,
        "clean_len": np.full((B,), L, np.int32),
        "len_a": np.full((B,), L, np.int32),
        "len_b": np.full((B,), L, np.int32),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = shard_batch(mesh, batch)

    p0 = jax.device_get(state.params["resblock1"]["conv1"]["w"])
    bs0 = jax.device_get(state.batch_stats["resblock1"]["bn1"]["pop_mean"])
    losses = []
    for i in range(3):
        key = jax.random.fold_in(jax.random.PRNGKey(42), i)
        state, metrics = step(state, batch, key)
        losses.append(float(jax.device_get(metrics["loss"])))
    assert all(np.isfinite(losses)), losses
    assert int(jax.device_get(state.step)) == 3
    p1 = jax.device_get(state.params["resblock1"]["conv1"]["w"])
    bs1 = jax.device_get(state.batch_stats["resblock1"]["bn1"]["pop_mean"])
    assert np.abs(p1 - p0).max() > 0
    assert np.abs(bs1 - bs0).max() > 0
    # params stay replicated, loss is a replicated scalar
    assert metrics["loss"].shape == ()
