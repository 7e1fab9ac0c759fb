"""Manifest + host loader + checkpoint tests (tiny synthetic corpus)."""

import os

import numpy as np
import pytest

from nhans_tpu.config import Config
import dataclasses


def _write_corpus(tmpdir, n_train=4, n_valid=2, fs=16000):
    from scipy.io import wavfile
    rng = np.random.default_rng(0)
    speech = os.path.join(tmpdir, "speech")
    noise = os.path.join(tmpdir, "noise")
    for root, n_map in ((speech, {"train": n_train, "valid": n_valid,
                                  "test": n_valid}),
                        (noise, {"train": n_train, "valid": n_valid,
                                 "test": n_valid})):
        for split, count in n_map.items():
            d = os.path.join(root, split)
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                x = (rng.standard_normal(fs + i * 400) * 3000).astype(np.int16)
                wavfile.write(os.path.join(d, f"u{i}.wav"), fs, x)
    return speech + "/", noise + "/"


def _cfg(tmpdir, L=16000):
    speech, noise = _write_corpus(str(tmpdir))
    cfg = Config.denoiser()
    from nhans_tpu.data.manifest import create_seeds
    create_seeds(speech)
    create_seeds(noise)
    return cfg.replace(data=dataclasses.replace(
        cfg.data, speech_wav_dir=speech, noise_wav_dir=noise,
        max_samples=L, num_workers=2, slices_per_step=2))


def test_manifest_roundtrip(tmp_path):
    from nhans_tpu.data.manifest import create_seeds, load_seeds
    speech, _ = _write_corpus(str(tmp_path))
    splits = create_seeds(speech)
    assert len(splits["train"]) == 4
    assert load_seeds(speech, "train") == splits["train"]
    # legacy pickle fallback
    import pickle
    os.remove(os.path.join(speech, "valid.json"))
    with open(os.path.join(speech, "valid.pkl"), "wb") as f:
        pickle.dump([b"/a/b.wav", "/c/d.wav"], f)
    assert load_seeds(speech, "valid") == ["/a/b.wav", "/c/d.wav"]


def test_train_loader_batches(tmp_path):
    from nhans_tpu.data.loader import TrainLoader
    cfg = _cfg(tmp_path)
    loader = TrainLoader(cfg, batch_utts=3)
    try:
        b = next(iter(loader))
        assert b["clean"].shape == (3, 16000)
        assert b["noise_a"].shape == (3, 16000)
        assert (b["clean_len"] > 0).all()
        assert np.abs(b["clean"]).max() > 100  # raw int16 scale
    finally:
        loader.close()


def test_eval_loader_deterministic(tmp_path):
    from nhans_tpu.data.loader import EvalLoader
    cfg = _cfg(tmp_path)
    a = [(e["cleanpath"], e["snr_a"], e["snr_b"]) for e in EvalLoader(cfg)]
    b = [(e["cleanpath"], e["snr_a"], e["snr_b"]) for e in EvalLoader(cfg)]
    assert a == b and len(a) == 2
    assert all(s in cfg.task.snr_set for _, s, _ in a)


def test_eval_loader_queue_pairing(tmp_path):
    """--eval_pairing queue reproduces the reference's 1-epoch
    queue-order semantics: the denoiser eval truncates when the noise
    list exhausts instead of wrapping (reference reader.py:273-279), and
    the separator pairs speech[2j] vs speech[2j+1] — the double dequeue
    of the one speech queue (Source_Separation/reader.py:248-249)."""
    from nhans_tpu.data.loader import EvalLoader
    cfg = _cfg(tmp_path)
    # custom valid split: 5 speech, 4 noise
    from scipy.io import wavfile
    rng = np.random.default_rng(1)
    for root, names in ((cfg.data.speech_wav_dir, 5),
                        (cfg.data.noise_wav_dir, 4)):
        d = os.path.join(root, "valid")
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
        for i in range(names):
            wavfile.write(os.path.join(d, f"q{i}.wav"), 16000,
                          (rng.standard_normal(16000) * 3000)
                          .astype(np.int16))
        from nhans_tpu.data.manifest import create_seeds
        create_seeds(root)

    wrap = list(EvalLoader(cfg))
    assert len(wrap) == 5  # every utterance scored, noises cycle

    qcfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                                eval_pairing="queue"))
    q = list(EvalLoader(qcfg))
    assert len(q) == 2  # 4 noises / 2 per utterance -> truncation
    assert [os.path.basename(e["path_a"]) for e in q] == ["q0.wav",
                                                          "q2.wav"]
    assert [os.path.basename(e["path_b"]) for e in q] == ["q1.wav",
                                                          "q3.wav"]

    # separator: one queue dequeued twice -> (2j, 2j+1) clean/interferer
    sep = Config.separator().replace(data=qcfg.data)
    qs = list(EvalLoader(sep))
    assert len(qs) == 2
    assert [os.path.basename(e["cleanpath"]) for e in qs] == ["q0.wav",
                                                              "q2.wav"]
    assert [os.path.basename(e["path_a"]) for e in qs] == ["q1.wav",
                                                           "q3.wav"]


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from nhans_tpu.train.checkpoint import Checkpointer
    ck = Checkpointer(str(tmp_path / "ck"), name="t")
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
             "step": np.asarray(7, np.int32)}
    ck.save(7, state)
    ck.wait()
    assert ck.latest_step() == 7
    step, restored = ck.restore(template=state)
    assert step == 7
    np.testing.assert_array_equal(restored["w"], state["w"])
    ck.close()


def test_save_load_variables(tmp_path):
    from nhans_tpu.train.checkpoint import load_variables, save_variables
    v = {"params": {"a": np.ones((2, 2), np.float32)}}
    path = str(tmp_path / "vars")
    save_variables(path, v)
    out = load_variables(path, v)
    np.testing.assert_array_equal(out["params"]["a"], v["params"]["a"])


def test_load_variables_resolves_manager_root(tmp_path):
    """Pointing --checkpoint at the training checkpoint ROOT (ckdir or
    ckdir/<model>) must resolve to the LATEST numeric step."""
    from nhans_tpu.train.checkpoint import load_variables, save_variables
    for step, val in ((100, 1.0), (900, 2.0), (2500, 3.0)):
        save_variables(str(tmp_path / "ck" / "nhans" / str(step)),
                       {"params": {"a": np.full((2,), val, np.float32)}})
    tpl = {"params": {"a": np.zeros((2,), np.float32)}}
    for entry in ("ck", "ck/nhans", "ck/nhans/2500"):
        out = load_variables(str(tmp_path / entry), tpl)
        np.testing.assert_array_equal(out["params"]["a"],
                                      np.full((2,), 3.0, np.float32))


def test_checkpoint_keys_kind_detection(tmp_path):
    """checkpoint_keys reads top-level pytree keys from on-disk metadata
    without restoring payloads — the trainer branches full-state vs
    inference-vars restore on this instead of chained exceptions."""
    from nhans_tpu.train.checkpoint import checkpoint_keys, save_variables
    full = {"params": {"a": np.ones((2,), np.float32)},
            "batch_stats": {"m": np.zeros((2,), np.float32)},
            "opt_state": {"mu": np.zeros((2,), np.float32)},
            "step": np.int32(7)}
    save_variables(str(tmp_path / "full"), full)
    save_variables(str(tmp_path / "vars"),
                   {k: full[k] for k in ("params", "batch_stats")})
    assert {"opt_state", "step"} <= checkpoint_keys(str(tmp_path / "full"))
    assert checkpoint_keys(str(tmp_path / "vars")) == \
        frozenset({"params", "batch_stats"})


def test_load_variables_rejects_mismatched_shapes(tmp_path):
    """The raw-restore fallback (subset template of a full train-state
    checkpoint) must reject wrong-shaped leaves with a clear error, not
    graft them to fail later as an opaque XLA shape error."""
    import pytest
    from nhans_tpu.train.checkpoint import load_variables, save_variables
    full = {"params": {"a": np.ones((4, 4), np.float32)},
            "batch_stats": {"m": np.zeros((4,), np.float32)},
            "opt_state": {"mu": np.zeros((4, 4), np.float32)}}
    save_variables(str(tmp_path / "full"), full)
    good = {"params": {"a": np.zeros((4, 4), np.float32)},
            "batch_stats": {"m": np.zeros((4,), np.float32)}}
    out = load_variables(str(tmp_path / "full"), good)
    np.testing.assert_array_equal(out["params"]["a"], full["params"]["a"])
    bad = {"params": {"a": np.zeros((8, 8), np.float32)},
           "batch_stats": {"m": np.zeros((4,), np.float32)}}
    with pytest.raises(ValueError, match="mismatched leaves"):
        load_variables(str(tmp_path / "full"), bad)


def test_train_loader_length_bucketing(tmp_path):
    """Batches of short utterances ride a small length bucket, with
    whole-file peaks carried alongside for exact normalization."""
    from nhans_tpu.data.loader import TrainLoader
    cfg = _cfg(tmp_path, L=163600)  # corpus wavs are ~1 s
    loader = TrainLoader(cfg, batch_utts=2)
    try:
        b = next(iter(loader))
        assert b["clean"].shape[1] == 4 * 16000  # smallest bucket
        assert b["clean"].dtype == np.int16
        assert b["peaks"].shape == (2, 3)
        assert (b["peaks"] > 0).all()
        assert (b["clean_len"] <= 64000).all()
        assert (b["len_a"] <= 64000).all()
    finally:
        loader.close()


def test_train_loader_separator_speaker_disjoint(tmp_path):
    """Streaming-loader parity with the banked loader: the separator's
    interferer utterance comes from a DIFFERENT real voice than the
    target (spk tags; pseudo-perturbation tags collapse first).  The
    reference's unconstrained double-dequeue is safe only on huge
    corpora (PARITY.md)."""
    import dataclasses as dc

    from scipy.io import wavfile

    from nhans_tpu.data.loader import TrainLoader
    from nhans_tpu.data.manifest import create_seeds

    rng = np.random.default_rng(3)
    speech = os.path.join(str(tmp_path), "speech")
    d = os.path.join(speech, "train")
    os.makedirs(d)
    # 3 real voices, one with a pseudo-perturbed variant; lengths encode
    # identity (1600*(v+1) samples) so batches reveal the source voice
    names = ["spkA_0.wav", "spkAp09_0.wav", "spkB_0.wav", "spkC_0.wav"]
    voice = {"spkA_0.wav": 0, "spkAp09_0.wav": 0, "spkB_0.wav": 1,
             "spkC_0.wav": 2}
    for n in names:
        x = (rng.standard_normal(1600 * (voice[n] + 1)) * 3000)
        wavfile.write(os.path.join(d, n), 16000, x.astype(np.int16))
    create_seeds(speech)

    cfg = Config.separator()
    cfg = cfg.replace(data=dc.replace(
        cfg.data, speech_wav_dir=speech, noise_wav_dir=speech,
        max_samples=16000, num_workers=1))
    loader = TrainLoader(cfg, batch_utts=8, num_workers=1)
    try:
        for _ in range(6):
            b = next(iter(loader))
            for cl, al in zip(np.asarray(b["clean_len"]),
                              np.asarray(b["len_a"])):
                cv = int(cl) // 1600 - 1
                av = int(al) // 1600 - 1
                assert cv != av, (cl, al)
    finally:
        loader.close()
