"""On-device train/eval batch construction tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nhans_tpu.config import Config
from nhans_tpu.data.pipeline import make_eval_batch, make_train_batch
from nhans_tpu.dsp import spectral as sp


def _cfg(L=48080, k=2):
    cfg = Config.denoiser()
    return cfg.replace(data=dataclasses.replace(
        cfg.data, max_samples=L, slices_per_step=k))


def _batch(rng, B, L):
    return {k: jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 1000)
            for k in ("clean", "noise_a", "noise_b")}


def test_train_batch_shapes_and_snrs(rng):
    cfg = _cfg()
    B, L, K = 3, cfg.data.max_samples, cfg.data.slices_per_step
    b = _batch(rng, B, L)
    lens = dict(clean_len=jnp.asarray([L, 20000, 30000]),
                len_a=jnp.asarray([30000, L, 10000]),
                len_b=jnp.asarray([L, 15000, 8000]))
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    snrs = []
    for key in keys:
        ex = make_train_batch(cfg, key, b["clean"], b["noise_a"],
                              b["noise_b"], **lens)
        snrs.extend(np.asarray(ex["snr_a"]).tolist())
    ex = make_train_batch(cfg, keys[0], b["clean"], b["noise_a"],
                          b["noise_b"], **lens)
    assert ex["mixed"].shape == (B * K, 35, 201)
    assert ex["target"].shape == (B * K, 201)
    assert ex["ctx_a"].shape == (B * K, 200, 201)
    assert np.isfinite(np.asarray(ex["mixed"])).all()
    # SNRs drawn from the task set with variety across keys
    assert set(snrs) <= set(float(s) for s in cfg.task.snr_set)
    assert len(set(snrs)) >= 3


def test_train_batch_window_is_slice_of_spectrogram(rng):
    """The mixed window must be a contiguous slice of the padded mixed
    log-spectrogram and the target the central frame's target
    (reference reader.py:433-450 synchronized crop semantics)."""
    cfg = _cfg(k=1)
    L = cfg.data.max_samples
    b = _batch(rng, 1, L)
    lens = dict(clean_len=jnp.asarray([L]), len_a=jnp.asarray([L]),
                len_b=jnp.asarray([L]))
    key = jax.random.PRNGKey(3)
    ex = make_train_batch(cfg, key, b["clean"], b["noise_a"], b["noise_b"],
                          **lens)
    win = np.asarray(ex["mixed"][0])        # [35, 201]
    tgt = np.asarray(ex["target"][0])

    # Recompute every possible window start from the same mixing by brute
    # force: the crop must match at exactly one start, and the target must
    # be the target-spectrogram frame at that start.
    from nhans_tpu.dsp import mixing as mx
    a = cfg.audio
    clean = mx.peak_normalize(b["clean"], jnp.asarray([L]))
    na = mx.peak_normalize(b["noise_a"], jnp.asarray([L]))
    nb = mx.peak_normalize(b["noise_b"], jnp.asarray([L]))
    snr_a, snr_b = float(ex["snr_a"][0]), float(ex["snr_b"][0])
    mixed, target, _, _ = mx.mix_two_noise(
        clean, na, nb, jnp.asarray([L]), jnp.asarray([L]), jnp.asarray([L]),
        jnp.asarray([snr_a]), jnp.asarray([snr_b]))
    lm_m, _ = sp.spectrogram(mixed, a.frame_length, a.frame_step)
    lm_t, _ = sp.spectrogram(target, a.frame_length, a.frame_step)
    lm_m = np.pad(np.asarray(lm_m[0]), ((17, 17), (0, 0)))
    matches = [s for s in range(lm_m.shape[0] - 34)
               if np.allclose(lm_m[s:s + 35], win, atol=1e-4)]
    assert len(matches) == 1
    s = matches[0]
    np.testing.assert_allclose(np.asarray(lm_t[0, s]), tgt, atol=1e-4)


def test_eval_batch_matches_reference_layout(rng):
    cfg = _cfg()
    a = cfg.audio
    L = cfg.data.max_samples
    b = _batch(rng, 1, L)
    n = jnp.asarray([L])
    ev = make_eval_batch(cfg, b["clean"], b["clean"], b["noise_a"],
                         b["noise_b"], n)
    F = sp.num_frames(L, a.frame_length, a.frame_step)
    assert ev["mixed"].shape == (1, F - 200, 35, 201)
    assert int(ev["num_windows"][0]) == F - 200
    assert bool(np.asarray(ev["valid"]).all())
    # window i center == mixed frame C+i
    lm, _ = sp.spectrogram(b["clean"][0], a.frame_length, a.frame_step)
    i = 7
    np.testing.assert_allclose(np.asarray(ev["mixed"][0, i, 17]),
                               np.asarray(lm[200 + i]), atol=1e-5)
    # contexts are the FIRST 200 frames (reference reader.py:408-413)
    lm_a, _ = sp.spectrogram(b["noise_a"][0], a.frame_length, a.frame_step)
    np.testing.assert_allclose(np.asarray(ev["ctx_a"][0]),
                               np.asarray(lm_a[:200]), atol=1e-5)


def test_separator_task_batch(rng):
    cfg = Config.separator().replace(data=dataclasses.replace(
        Config.separator().data, max_samples=48080, slices_per_step=2))
    L = cfg.data.max_samples
    b = _batch(rng, 2, L)
    ex = make_train_batch(cfg, jax.random.PRNGKey(0), b["clean"],
                          b["noise_a"], b["noise_b"],
                          jnp.asarray([L, L]), jnp.asarray([L, 30000]),
                          jnp.asarray([0, 0]))
    assert ex["mixed"].shape == (4, 35, 201)
    assert set(np.asarray(ex["snr_a"]).tolist()) <= set(
        float(s) for s in cfg.task.snr_set)

def test_train_batch_tail_frames_are_zero(rng):
    """Frames at/past nf must read as 0 (reference zero-pads the exact-nf
    spectrogram, reader.py:352-356), not log(eps) from the padded buffer.
    With a short utterance every window necessarily overlaps the tail; all
    out-of-range frames it sees must be exactly zero."""
    cfg = _cfg(k=8)
    L = cfg.data.max_samples
    b = _batch(rng, 1, L)
    short = 4000  # ~23 valid frames << window 35
    ex = make_train_batch(cfg, jax.random.PRNGKey(1), b["clean"],
                          b["noise_a"], b["noise_b"],
                          clean_len=jnp.asarray([short]),
                          len_a=jnp.asarray([short]),
                          len_b=jnp.asarray([short]))
    a = cfg.audio
    nf = 1 + (short - a.frame_length) // a.frame_step
    win = np.asarray(ex["mixed"])           # [K, 35, 201]
    # log(eps) would be ~ -11.5; padding/tail frames must be identically 0
    log_eps = np.log(np.float32(a.log_eps))
    assert not np.isclose(win, log_eps, atol=1e-3).any()
    # each window of a (nf+34)-frame padded spectrogram with winstart<=nf-1
    # contains at least 35-nf zero frames when nf < 35
    if nf < 35:
        zero_frames = (np.abs(win).sum(axis=-1) == 0).sum(axis=-1)
        assert (zero_frames >= 35 - nf).all()
    # contexts too
    ctx = np.asarray(ex["ctx_a"])
    assert not np.isclose(ctx, log_eps, atol=1e-3).any()


def test_separator_context_uses_full_length_noise(rng):
    """The separator's interference context comes from the FULL-length
    scaled noise (reference combine_signals returns noisesamples*K
    un-looped, Source_Separation/reader.py:140-146) — context material
    past the clean length must be reachable."""
    cfg = Config.separator().replace(data=dataclasses.replace(
        Config.separator().data, max_samples=120000, slices_per_step=16))
    L = cfg.data.max_samples
    b = _batch(rng, 1, L)
    clean_len = 36080  # ~2.25 s -> nf ~ 224 frames
    # noise longer than clean: frames past nf(clean) only exist un-looped
    ex = make_train_batch(cfg, jax.random.PRNGKey(2), b["clean"],
                          b["noise_a"], b["noise_b"],
                          clean_len=jnp.asarray([clean_len]),
                          len_a=jnp.asarray([L]),
                          len_b=jnp.asarray([0]))
    from nhans_tpu.dsp import mixing as mx
    a = cfg.audio
    clean = mx.peak_normalize(b["clean"], jnp.asarray([clean_len]))
    na = mx.peak_normalize(b["noise_a"], jnp.asarray([L]))
    # reproduce the mixing gain for this snr draw
    snr = jnp.asarray([float(ex["snr_a"][0])])
    _, _, _, k = mx.mix_one_noise(clean, na, jnp.asarray([clean_len]),
                                  jnp.asarray([L]), snr)
    lm_full, _ = sp.spectrogram(float(k[0]) * na,
                                a.frame_length, a.frame_step)
    lm_full = np.asarray(lm_full[0])
    nf_clean = 1 + (clean_len - a.frame_length) // a.frame_step
    ctx = np.asarray(ex["ctx_a"]).reshape(-1, 200, 201)
    # at least one crop must contain a frame from past the clean region —
    # impossible if contexts were cut from the clean-length-looped noise
    hit_late = False
    for c in ctx:
        # match first context frame against full-noise frames
        d = np.abs(lm_full[None, :, :] - c[0][None, None, :]).sum(-1)
        starts = np.where(d[0] < 1e-3)[0]
        if len(starts) and (starts + 200).max() > nf_clean:
            hit_late = True
            break
    assert hit_late


def test_noise_augmentation_is_peak_invariant(rng):
    """--augment_noise: circular shift/reversal/polarity must preserve
    the noise sample multiset over the valid region (so SNR gains and
    host-computed peaks stay exact) and change across keys."""
    cfg = _cfg(k=2)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, augment_noise=True))
    L = cfg.data.max_samples
    b = _batch(rng, 1, L)
    lens = dict(clean_len=jnp.asarray([L]), len_a=jnp.asarray([30000]),
                len_b=jnp.asarray([L]))
    ex1 = make_train_batch(cfg, jax.random.PRNGKey(0), b["clean"],
                           b["noise_a"], b["noise_b"], **lens)
    ex2 = make_train_batch(cfg, jax.random.PRNGKey(1), b["clean"],
                           b["noise_a"], b["noise_b"], **lens)
    for ex in (ex1, ex2):
        assert np.isfinite(np.asarray(ex["mixed"])).all()
    # different augmentation draws -> different context crops
    assert not np.allclose(np.asarray(ex1["ctx_a"]), np.asarray(ex2["ctx_a"]))
    # SNRs still drawn from the task set
    assert set(np.asarray(ex1["snr_a"]).tolist()) <= set(
        float(s) for s in cfg.task.snr_set)


def test_train_batch_mismatched_noise_wire_length(rng):
    """Device-corpus banks pad each corpus to ITS OWN longest file, so
    the noise wire length can differ from the speech bucket (e.g. long
    procedural noises from tools/synth_noises.py).  make_train_batch
    must statically align: trim longer noise buffers (clamping the
    valid length), zero-pad shorter ones (pipeline.py _fit)."""
    cfg = _cfg()
    B, L, K = 2, cfg.data.max_samples, cfg.data.slices_per_step
    clean = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 1000)
    key = jax.random.PRNGKey(3)
    for LN in (L + 32000, L // 2):  # longer and shorter than speech
        noise = jnp.asarray(
            rng.standard_normal((B, LN)).astype(np.float32) * 1000)
        ex = make_train_batch(cfg, key, clean, noise, noise,
                              clean_len=jnp.asarray([L, 20000]),
                              len_a=jnp.asarray([LN, 10000]),
                              len_b=jnp.asarray([min(LN, 8000), LN]))
        assert ex["mixed"].shape == (B * K, 35, 201)
        for v in ex.values():
            assert np.isfinite(np.asarray(v)).all()


def test_short_utterance_context_tiles_cyclically(rng):
    """Utterances with fewer than context_frames+1 valid frames: the
    training context must tile the REAL frames cyclically — the same
    convention inference uses — instead of clamping into the padded
    buffer (zeroed / window-overlap frames).  The reference errors on
    such inputs (reader.py:481-487), so inference-convention parity is
    the chosen extension (VERDICT r3 weak #4)."""
    cfg = _cfg()
    C = cfg.model.context_frames  # 200
    B, L = 2, cfg.data.max_samples
    b = _batch(rng, B, L)
    nf = 50  # < C: short-utterance path
    short_len = 400 + (nf - 1) * 160
    lens = dict(clean_len=jnp.asarray([short_len, short_len]),
                len_a=jnp.asarray([short_len, short_len]),
                len_b=jnp.asarray([short_len, short_len]))
    ex = make_train_batch(cfg, jax.random.PRNGKey(3), b["clean"],
                          b["noise_a"], b["noise_b"], **lens)
    ctx = np.asarray(ex["ctx_a"])          # [B*K, C, nfeat]
    norms = np.linalg.norm(ctx, axis=-1)   # [B*K, C]
    # (a) every context frame is a real frame (no zeroed tail/pad rows)
    assert (norms > 1e-6).all()
    # (b) cyclic with period nf
    for j in range(C - nf):
        np.testing.assert_allclose(ctx[:, j], ctx[:, j + nf], rtol=1e-6)
    # and long utterances keep the rest-crop convention: nothing cyclic
    lens_long = dict(clean_len=jnp.asarray([L, L]),
                     len_a=jnp.asarray([L, L]), len_b=jnp.asarray([L, L]))
    ex2 = make_train_batch(cfg, jax.random.PRNGKey(3), b["clean"],
                           b["noise_a"], b["noise_b"], **lens_long)
    ctx2 = np.asarray(ex2["ctx_a"])
    assert np.isfinite(ctx2).all()
