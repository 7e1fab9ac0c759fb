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


@pytest.mark.slow
def test_clean_loss_boost_reweights_not_rescales():
    """--clean_loss_boost: boosted loss differs from the plain loss on a
    mixed-cleanness batch, the weights are mean-normalized (a batch of
    IDENTICAL windows gives the plain loss back exactly), and gradients
    stay finite (config.TrainConfig.clean_loss_boost)."""
    base = Config.denoiser()
    base = base.replace(
        data=dataclasses.replace(base.data, max_samples=16000,
                                 slices_per_step=2),
        train=dataclasses.replace(base.train, alg="adam", lr=1e-3))
    # clean_loss_dist's default (0.25) is calibrated for real
    # peak-normalized speech+noise; this test's pure-tone "clean" has
    # mostly silent bins where log_eps dominates, pushing the distance
    # to ~9-11.5, so point the sigmoid midpoint at that range (the
    # mechanics under test — reweighting + mean normalization — are
    # calibration-independent)
    boosted = base.replace(
        train=dataclasses.replace(base.train, clean_loss_boost=3.0,
                                  clean_loss_dist=10.5,
                                  clean_loss_scale=0.5))

    model, state, tx = create_state(base, jax.random.PRNGKey(0))
    step_plain = make_train_step(base, model, tx, donate=False)
    step_boost = make_train_step(boosted, model, tx, donate=False)

    rng = np.random.default_rng(1)
    B, L = 2, base.data.max_samples
    t = np.arange(L) / 16000.0
    clean = (np.stack([np.sin(2 * np.pi * 440 * t),
                       np.sin(2 * np.pi * 220 * t)]) * 3000)
    noisy_batch = {
        # row 0 nearly clean (tiny noise), row 1 heavily noisy: windows
        # span the cleanness range, so the sigmoid weights differ.  The
        # noise must ride noise_b (NEG, suppressed): the denoiser target
        # is clean + pos, so noise_a alone gives mixed == target
        "clean": clean.astype(np.float32),
        "noise_a": np.zeros((B, L), np.float32),
        "noise_b": np.stack([
            rng.standard_normal(L) * 10,
            rng.standard_normal(L) * 3000]).astype(np.float32),
        "clean_len": np.full((B,), L, np.int32),
        "len_a": np.full((B,), L, np.int32),
        "len_b": np.full((B,), L, np.int32),
    }
    # the per-row SNR draw decides window cleanness; rows drawing the
    # SAME snr get equal weights (normalized away, losses match) — try
    # a few keys so at least one draw splits the rows
    diffs = []
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        _, m_plain = step_plain(state, noisy_batch, key)
        _, m_boost = step_boost(state, noisy_batch, key)
        lp, lb = float(m_plain["loss"]), float(m_boost["loss"])
        assert np.isfinite(lp) and np.isfinite(lb)
        assert float(m_boost["grad_norm"]) > 0
        diffs.append(lp != lb)
    assert any(diffs)  # reweighting changed the objective
    key = jax.random.PRNGKey(0)

    # equal-cleanness batch: with all-zero noise (the silent-noise
    # regime) every window is exactly clean, so every weight is equal
    # and the mean normalization cancels — boosted == plain exactly
    same_batch = dict(noisy_batch)
    same_batch["noise_b"] = np.zeros((B, L), np.float32)
    _, m_p2 = step_plain(state, same_batch, key)
    _, m_b2 = step_boost(state, same_batch, key)
    np.testing.assert_allclose(float(m_p2["loss"]), float(m_b2["loss"]),
                               rtol=2e-5)


@pytest.mark.slow
def test_ctx_embed_noise_trains_and_leaves_inference_alone():
    """--ctx_embed_noise: the jitter changes the training objective,
    is deterministic in the step key (kill/resume holds), and never
    touches the train=False path (ModelConfig.ctx_embed_noise)."""
    base = Config.denoiser()
    base = base.replace(
        data=dataclasses.replace(base.data, max_samples=16000,
                                 slices_per_step=2),
        train=dataclasses.replace(base.train, alg="adam", lr=1e-3))
    noised = base.replace(
        model=dataclasses.replace(base.model, ctx_embed_noise=0.5))

    from nhans_tpu.models import build_model
    model, state, tx = create_state(base, jax.random.PRNGKey(0))
    nmodel = build_model(noised)   # same params, noise-enabled module
    step_plain = make_train_step(base, model, tx, donate=False)
    step_noise = make_train_step(noised, nmodel, tx, donate=False)

    rng = np.random.default_rng(2)
    B, L = 2, base.data.max_samples
    batch = {
        "clean": (rng.standard_normal((B, L)) * 3000).astype(np.float32),
        "noise_a": (rng.standard_normal((B, L)) * 500).astype(np.float32),
        "noise_b": (rng.standard_normal((B, L)) * 500).astype(np.float32),
        "clean_len": np.full((B,), L, np.int32),
        "len_a": np.full((B,), L, np.int32),
        "len_b": np.full((B,), L, np.int32),
    }
    key = jax.random.PRNGKey(7)
    # Zero-init gates (reference parity: Inject projections AND the
    # last_dense head start at zero) mean NO gradient reaches the
    # injections at init — the jitter shows up in the GRADIENTS only
    # after one update (head nonzero) and in the LOSS after two
    # (projections nonzero).  Walk exactly that ladder.
    s1, m1 = step_noise(state, batch, key)
    assert np.isfinite(float(m1["loss"]))

    key2 = jax.random.PRNGKey(9)
    s2p, m2_plain = step_plain(s1, batch, key2)
    s2n, m2_noise = step_noise(s1, batch, key2)
    _, m2_again = step_noise(s1, batch, key2)
    # same state+key: jitter moves the gradients (loss not yet: the
    # projections are still zero at s1)
    assert (float(m2_noise["grad_norm"])
            != float(m2_plain["grad_norm"]))
    assert float(m2_noise["loss"]) == float(m2_plain["loss"])
    # pure function of (state, batch, key) — kill/resume determinism
    assert float(m2_again["grad_norm"]) == float(m2_noise["grad_norm"])
    _, m2_k = step_noise(s1, batch, jax.random.PRNGKey(11))
    assert (float(m2_k["grad_norm"])
            != float(m2_noise["grad_norm"]))  # new key, new draw

    key3 = jax.random.PRNGKey(10)
    _, m3_plain = step_plain(s2n, batch, key3)
    _, m3_noise = step_noise(s2n, batch, key3)
    # projections nonzero now: the jitter moves the loss itself
    assert float(m3_noise["loss"]) != float(m3_plain["loss"])

    # train=False path never draws the rng: apply with NO rngs succeeds
    # on an enabled config (the Evaluator/Enhancer contract)
    mixed = jnp.zeros((1, base.model.window_frames,
                       base.model.num_features), jnp.float32)
    ctx = jnp.zeros((1, base.model.context_frames,
                     base.model.num_features), jnp.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    res = nmodel.apply(variables, mixed, ctx, ctx, False)
    assert np.isfinite(np.asarray(res)).all()
