"""Preemption fault injection (SURVEY §5 failure recovery): SIGKILL a
training process mid-run, auto-resume from the last checkpoint, and
assert the resumed loss trajectory REJOINS the uninterrupted seeded run
exactly.  Exact rejoin holds because (a) the per-step PRNG key is
fold_in(base, step), (b) device-bank sampling is a pure function of
(seed, step) (data/banks.py), and (c) the XLA program is deterministic.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

_RUN = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    root, tag = sys.argv[1], sys.argv[2]
    import dataclasses
    from nhans_tpu.config import Config
    cfg = Config.denoiser()
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, speech_wav_dir=os.path.join(root, "speech/"),
            noise_wav_dir=os.path.join(root, "noise/"),
            max_samples=32080, slices_per_step=1, num_workers=1,
            device_corpus="on"),
        train=dataclasses.replace(
            cfg.train, alg="adam", lr=1e-3, train_mb=2,
            batches=6, eval_every=3, train_monitor_every=1,
            eval_before_training=False, eval_after_training=False,
            checkpoint_dir=os.path.join(root, "ck_" + tag),
            summaries_dir=os.path.join(root, "sum_" + tag),
            dump_results="", wav_dump_folder="", data_axis=1))
    from nhans_tpu.train.trainer import Trainer
    tr = Trainer(cfg, eval_utts=1,
                 eval_kwargs=dict(window_chunk=32,
                                  buckets_seconds=(2.005,)))
    tr.train()
    tr.ckpt.close()
    print("RUN_DONE", tr.tstep)
""")


def _losses(summaries_dir):
    out = {}
    path = os.path.join(summaries_dir, "nhans.jsonl")
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec and "step" in rec:
                out[rec["step"]] = rec["loss"]
    return out


@pytest.mark.slow
def test_sigkill_resume_rejoins_seeded_trajectory(tmp_path):
    from nhans_tpu.data.manifest import create_seeds
    from tests.test_loader import _write_corpus

    root = str(tmp_path)
    speech, noise = _write_corpus(root, n_train=6, n_valid=2)
    create_seeds(speech)
    create_seeds(noise)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    script = tmp_path / "run.py"
    script.write_text(_RUN)

    def run(tag, kill_after_ckpt=None):
        p = subprocess.Popen([sys.executable, str(script), root, tag],
                             env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
        if kill_after_ckpt is None:
            out, _ = p.communicate(timeout=560)
            return p.returncode, out
        # wait for the checkpoint at `kill_after_ckpt`, then SIGKILL
        ckpt = os.path.join(root, "ck_" + tag, "nhans",
                            str(kill_after_ckpt))
        deadline = time.time() + 560
        while time.time() < deadline:
            if os.path.isdir(ckpt) and not os.path.isdir(ckpt + ".tmp"):
                done = [d for d in os.listdir(os.path.join(
                    root, "ck_" + tag, "nhans"))
                    if d == str(kill_after_ckpt)]
                if done:
                    break
            if p.poll() is not None:
                out, _ = p.communicate()
                raise AssertionError(
                    f"process exited before kill point:\n{out[-3000:]}")
            time.sleep(0.2)
        time.sleep(1.0)  # let orbax finalize the step dir
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
        return -9, (p.stdout.read() if p.stdout else "")

    # uninterrupted seeded run
    rc, out = run("a")
    assert rc == 0 and "RUN_DONE 6" in out, out[-3000:]

    # killed mid-run after the step-3 checkpoint...
    run("b", kill_after_ckpt=3)
    # ...then auto-resumed to completion
    rc, out = run("b")
    assert rc == 0 and "RUN_DONE 6" in out, out[-3000:]

    la, lb = _losses(os.path.join(root, "sum_a")), _losses(
        os.path.join(root, "sum_b"))
    # post-resume steps (4..6) must match the unkilled run's losses
    for step in (4, 5, 6):
        assert step in la and step in lb, (sorted(la), sorted(lb))
        np.testing.assert_allclose(la[step], lb[step], rtol=1e-6,
                                   err_msg=f"step {step} diverged")
