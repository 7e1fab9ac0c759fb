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


def test_demo_mix_is_int16_scale(rng):
    import numpy as np
    """Regression: --demo fed the Enhancer a |x|<=1.0 signal which
    prepare_wave's int16 rounding quantized to {-1,0,1} (~98% zeros).
    The demo mix must come back at int16 scale."""
    from nhans_tpu.cli._app import demo_mix
    from nhans_tpu.config import Config

    fs = 16000
    clean = (rng.standard_normal(fs) * 8000.0)
    noise = (rng.standard_normal(fs) * 8000.0)
    for task, cfg in (("denoiser", Config.denoiser()),
                      ("separator", Config.separator())):
        mixed = demo_mix(cfg, task, clean, np.zeros(fs), noise)
        q = np.rint(mixed).astype(np.int16)  # what prepare_wave does
        assert np.max(np.abs(mixed)) > 1000.0
        # quantization must preserve the signal, not destroy it
        assert np.mean(q == 0) < 0.05
        corr = np.corrcoef(q[:len(mixed)], mixed)[0, 1]
        assert corr > 0.999
