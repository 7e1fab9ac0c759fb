"""CLI wiring smoke tests (no model execution)."""

import os
import subprocess
import sys

import pytest

ENV = dict(os.environ, JAX_PLATFORMS="cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mod", [
    "nhans_tpu.cli.denoiser",
    "nhans_tpu.cli.separator",
    "nhans_tpu.cli.train",
    "nhans_tpu.cli.seeds",
    "nhans_tpu.cli.load_model",
])
def test_cli_help(mod):
    r = subprocess.run([sys.executable, "-m", mod, "--help"],
                       capture_output=True, text=True, env=ENV, cwd=REPO,
                       timeout=120)
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()


def test_denoiser_help_has_reference_flags():
    r = subprocess.run(
        [sys.executable, "-m", "nhans_tpu.cli.denoiser", "--help"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=120)
    for flag in ("--input", "--output", "--pos", "--neg", "--compensate",
                 "--ac", "--Fs", "--checkpoint", "--demo"):
        assert flag in r.stdout, flag


def test_train_help_has_reference_flags():
    r = subprocess.run(
        [sys.executable, "-m", "nhans_tpu.cli.train", "--help"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=120)
    for flag in ("--lr", "--alg", "--mom", "--train_mb", "--eval_mb",
                 "--batches", "--eval_every", "--train_monitor_every",
                 "--restore_path", "--checkpoint_dir", "--bn_decay",
                 "--w_std", "--b_init", "--speech_wav_dir",
                 "--noise_wav_dir", "--random_slices", "--context_frames",
                 "--window_frames", "--eval_seeds"):
        assert flag in r.stdout, flag


def test_seeds_cli(tmp_path):
    import numpy as np
    from scipy.io import wavfile
    for split in ("train", "valid", "test"):
        d = tmp_path / "sp" / split
        d.mkdir(parents=True)
        wavfile.write(str(d / "a.wav"), 16000,
                      np.zeros(1600, np.int16))
    r = subprocess.run(
        [sys.executable, "-m", "nhans_tpu.cli.seeds",
         "--speech_wav_dir", str(tmp_path / "sp") + "/"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=120)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "sp" / "train.json").exists()
