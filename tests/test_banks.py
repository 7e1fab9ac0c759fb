"""Device-resident corpus banks (data/banks.py): gather correctness,
speaker-disjoint separator sampling, mode resolution and a banked
end-to-end train step on the CPU mesh."""

import dataclasses
import os

import numpy as np
import pytest

from nhans_tpu.config import Config
from tests.test_loader import _write_corpus


def _bank_cfg(tmp_path, device_corpus="on", task="denoiser"):
    from nhans_tpu.data.manifest import create_seeds
    speech, noise = _write_corpus(str(tmp_path))
    create_seeds(speech)
    create_seeds(noise)
    cfg = Config.denoiser() if task == "denoiser" else Config.separator()
    return cfg.replace(data=dataclasses.replace(
        cfg.data, speech_wav_dir=speech, noise_wav_dir=noise,
        max_samples=32080, slices_per_step=2, num_workers=2,
        device_corpus=device_corpus))


def test_banks_gather_matches_decode(tmp_path):
    from nhans_tpu.data.banks import DeviceBanks
    from nhans_tpu.utils import wavio

    cfg = _bank_cfg(tmp_path)
    banks = DeviceBanks(cfg)
    for i, path in enumerate(banks.speech_paths):
        ref = np.asarray(wavio.read_wav_strict(path), np.float32)
        n = int(banks.banks["speech_len"][i])
        assert n == min(len(ref), cfg.data.max_samples)
        row = np.asarray(banks.banks["speech"][i], np.float32)
        np.testing.assert_allclose(row[:n], ref[:n], atol=0.5)
        assert float(banks.banks["speech_peak"][i]) == pytest.approx(
            float(np.max(np.abs(ref))), rel=1e-5)
        # padded region is silent
        assert not row[n:].any()


def test_index_loader_speaker_disjoint(tmp_path):
    """Separator interference never comes from the target's speaker."""
    from scipy.io import wavfile

    from nhans_tpu.data.banks import BankIndexLoader, DeviceBanks
    from nhans_tpu.data.manifest import create_seeds

    speech = os.path.join(str(tmp_path), "speech")
    os.makedirs(os.path.join(speech, "train"), exist_ok=True)
    rng = np.random.default_rng(0)
    for spk in ("a", "b", "c"):
        for j in range(3):
            x = (rng.standard_normal(16000) * 3000).astype(np.int16)
            wavfile.write(os.path.join(speech, "train",
                                       f"spk{spk}_{j}.wav"), 16000, x)
    create_seeds(speech)
    cfg = Config.separator().replace(data=dataclasses.replace(
        Config().data, speech_wav_dir=speech, max_samples=16000,
        device_corpus="on"))
    banks = DeviceBanks(cfg)
    assert banks.speakers == ["a"] * 3 + ["b"] * 3 + ["c"] * 3
    loader = BankIndexLoader(banks, batch_utts=8)
    it = iter(loader)
    for _ in range(20):
        idx = next(it)
        for c, a in zip(idx["clean_idx"], idx["a_idx"]):
            assert banks.speakers[c] != banks.speakers[a]


def test_index_loader_pseudo_speaker_disjoint(tmp_path):
    """Pairing is disjoint on the REAL voice: a pseudo-speaker variant
    (spk<ID>p<tag>_, make_demo_corpus --pseudo_speakers) must never be
    paired with another variant of the same voice as interferer."""
    from scipy.io import wavfile

    from nhans_tpu.data.banks import (BankIndexLoader, DeviceBanks,
                                      real_speaker_of)

    assert real_speaker_of("spk121p09_0.wav") == "121"
    assert real_speaker_of("spkaexip095_0_sp095_0.wav") == "aexi"
    assert real_speaker_of("spk121_0.wav") == "121"

    speech = os.path.join(str(tmp_path), "speech")
    os.makedirs(os.path.join(speech, "train"), exist_ok=True)
    rng = np.random.default_rng(0)
    for spk in ("a", "b"):
        for tag in ("", "p09", "p11"):
            x = (rng.standard_normal(16000) * 3000).astype(np.int16)
            wavfile.write(os.path.join(speech, "train",
                                       f"spk{spk}{tag}_0.wav"), 16000, x)
    from nhans_tpu.data.manifest import create_seeds
    create_seeds(speech)
    cfg = Config.separator().replace(data=dataclasses.replace(
        Config().data, speech_wav_dir=speech, max_samples=16000,
        device_corpus="on"))
    banks = DeviceBanks(cfg)
    real = [real_speaker_of(p) for p in banks.speech_paths]
    loader = BankIndexLoader(banks, batch_utts=8)
    it = iter(loader)
    for _ in range(20):
        idx = next(it)
        for c, a in zip(idx["clean_idx"], idx["a_idx"]):
            assert real[c] != real[a]


def test_banks_enabled_modes(tmp_path):
    from nhans_tpu.data.banks import banks_enabled

    cfg = _bank_cfg(tmp_path, device_corpus="auto")
    assert banks_enabled(cfg)
    assert not banks_enabled(cfg.replace(data=dataclasses.replace(
        cfg.data, device_corpus="off")))
    # corpus over budget -> auto falls back, on raises
    tiny = cfg.replace(data=dataclasses.replace(
        cfg.data, device_corpus_mb=0))
    assert not banks_enabled(tiny)
    with pytest.raises(ValueError):
        banks_enabled(tiny.replace(data=dataclasses.replace(
            tiny.data, device_corpus="on")))
    # missing manifests -> auto False, on raises
    missing = cfg.replace(data=dataclasses.replace(
        cfg.data, speech_wav_dir=str(tmp_path / "nope")))
    assert not banks_enabled(missing)
    with pytest.raises(FileNotFoundError):
        banks_enabled(missing.replace(data=dataclasses.replace(
            missing.data, device_corpus="on")))


@pytest.mark.slow
def test_banked_step_runs_on_mesh(tmp_path):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nhans_tpu.data.banks import BankIndexLoader, DeviceBanks
    from nhans_tpu.parallel.mesh import make_mesh
    from nhans_tpu.train.step import create_state, make_train_step

    cfg = _bank_cfg(tmp_path)
    mesh = make_mesh(data=2)
    model, state, tx = create_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx, mesh=mesh, donate=False,
                           banked=True)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    banks = DeviceBanks(cfg, sharding=repl)
    loader = BankIndexLoader(banks, batch_utts=4)
    state = jax.device_put(state, repl)
    idx = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data), next(iter(loader)))
    state2, metrics = step(state, banks.banks, idx, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
