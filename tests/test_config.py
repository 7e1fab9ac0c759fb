"""Config invariants + CLI flag mapping."""

import argparse

from nhans_tpu.config import (AudioConfig, Config, add_reference_flags,
                              config_from_args)


def test_audio_contract():
    a = AudioConfig()
    assert a.frame_length == 400
    assert a.frame_step == 160
    assert a.num_features == 201
    assert a.num_frames(16000) == 98
    assert a.trim_to_whole_frames(16001) == 15920  # 400 + 97*160
    assert (a.trim_to_whole_frames(49600) - 400) % 160 == 0


def test_task_configs():
    d = Config.denoiser()
    s = Config.separator()
    assert tuple(d.task.snr_set) == (-3, 0, 3, 5, 8)
    assert tuple(s.task.snr_set) == (-5, -3, -1, 0, 1, 3, 5)
    assert d.task.two_noise_mixing and not s.task.two_noise_mixing


def test_config_from_args_maps_reference_flags():
    p = argparse.ArgumentParser()
    add_reference_flags(p, inference=False)
    args = p.parse_args([
        "--lr", "0.01", "--alg", "adam", "--train_mb", "32",
        "--bn_decay", "0.9", "--w_std", "0.02", "--eval_seeds", "test",
        "--speech_wav_dir", "/sp/", "--noise_wav_dir", "/no/",
        "--batches", "1000", "--eval_every", "50",
    ])
    cfg = config_from_args(args, task="denoiser")
    assert cfg.train.lr == 0.01
    assert cfg.train.alg == "adam"
    assert cfg.train.train_mb == 32
    assert cfg.model.bn_decay == 0.9
    assert cfg.model.w_std == 0.02
    assert cfg.data.eval_seeds == "test"
    assert cfg.data.speech_wav_dir == "/sp/"
    assert cfg.train.batches == 1000
    assert cfg.train.eval_every == 50


def test_optimizer_zoo():
    import optax
    from nhans_tpu.train.optim import make_optimizer
    import pytest
    for alg in ("sgd", "momentum", "rmsprop", "adadelta", "adagrad", "adam"):
        tx = make_optimizer(alg, 0.01, 0.9)
        assert isinstance(tx, optax.GradientTransformation)
    with pytest.raises(ValueError):
        make_optimizer("lamb", 0.01)
