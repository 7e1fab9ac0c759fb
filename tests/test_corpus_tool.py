"""Leak-freedom regression tests for tools/make_demo_corpus.py.

The quality evidence (docs/QUALITY.md) rests on three-way split
disjointness: train/valid(selection)/test(reporting) must share no
speaker and no noise recording.  These tests build a corpus with every
enrichment flag ON and verify the disjointness invariants directly from
the emitted files — including the sns-sample additions (whose source
set partially duplicates the valid split) and the separator holdout.

No JAX; pure numpy/scipy, safe to run next to a live TPU process.
"""

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "make_demo_corpus.py")
DEMO = "/root/reference/DEMO_N-HANS"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEMO), reason="reference demo audio not mounted")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    subprocess.run(
        [sys.executable, TOOL, "--out", out, "--speed_perturb",
         "--speech_perturb_factors", "0.9,1.1", "--pseudo_speakers",
         "--sns_train", "--separator_holdout", "3"],
        check=True, capture_output=True, text=True)
    return out


def _librispeech_speakers(dirpath):
    """LibriSpeech speaker ids referenced by filenames in a demo dir."""
    spk = set()
    for _dp, _dd, files in os.walk(dirpath):
        for f in files:
            m = re.search(r"_(\d+)-\d+-\d+_", f)
            if m:
                spk.add(m.group(1))
    return spk


def _noise_ids(dirpath):
    """11-char AudioSet ids referenced by filenames in a demo dir."""
    ids = set()
    for _dp, _dd, files in os.walk(dirpath):
        for f in files:
            for m in re.finditer(r"(?<=_)(.{11})_\d+\.\d{3}_", f):
                ids.add(m.group(1))
    return ids


def test_sns_train_speech_speakers_disjoint_from_eval(corpus):
    eval_spk = (_librispeech_speakers(os.path.join(
        DEMO, "selective_noise_suppression"))
        | _librispeech_speakers(os.path.join(DEMO, "denoising")))
    train = os.listdir(os.path.join(corpus, "speech", "train"))
    lib = {re.match(r"spklib(\d+)", f).group(1)
           for f in train if f.startswith("spklib")}
    assert lib, "sns_train added no speech"
    assert not (lib & eval_spk), lib & eval_spk


def test_sns_train_noise_ids_disjoint_from_eval(corpus):
    # train noise files are renamed ns###; recompute the selection the
    # tool should have made and check it against the eval id sets
    eval_ids = (_noise_ids(os.path.join(
        DEMO, "selective_noise_suppression"))
        | _noise_ids(os.path.join(DEMO, "denoising")))
    sns_ids = _noise_ids(os.path.join(
        DEMO, "Selective_Noise_Suppression_samples"))
    assert sns_ids - eval_ids, "no new sns noise ids at all?"
    # the tool's own leak check: count of train noise files must equal
    # base count (5 selective posNoise + 4 audio_examples) + the number
    # of sns noise ROLES (pos/neg per example) whose id is not in eval
    sns = os.path.join(DEMO, "Selective_Noise_Suppression_samples")
    pat = re.compile(
        r"snsExample(\d+)_(\d+)-\d+-\d+_(.{11})_[\d.]+_(.{11})_[\d.]+"
        r"_-?\d+_-?\d+_(posNoise|negNoise)\.wav$")
    expected_new = sum(
        1 for f in sorted(os.listdir(sns))
        for m in [pat.match(f)] if m
        and {"posNoise": m.group(3),
             "negNoise": m.group(4)}[m.group(5)] not in eval_ids)
    # long recordings are segmented to ns<i>_<j>.wav pieces: count
    # unique source recordings, not files
    train_ns = {f.split("_")[0].split(".")[0]
                for f in os.listdir(os.path.join(corpus, "noise", "train"))
                if f.startswith("ns") and "_sp" not in f
                and not f.startswith("nsilent")}
    assert len(train_ns) == 9 + expected_new


def test_separator_holdout_voices_absent_from_train(corpus):
    with open(os.path.join(corpus, "speech", "valid_sep.json")) as f:
        vs = json.load(f)
    assert len(vs) == 3
    held_voices = {re.search(r"_(spks\d+[ti])\.wav$", p).group(1)
                   for p in vs}
    train = os.listdir(os.path.join(corpus, "speech", "train"))
    # no train file may carry a held voice's example index — plain
    # (spks12t_*) or pseudo (spks12p09t_*: the factor tag folds into
    # the id AFTER the numeric base)
    held_bases = {v[:-1] for v in held_voices}  # "spks12"
    leaked = [f for f in train
              if re.match(r"(spks\d+)", f)
              and re.match(r"(spks\d+)", f).group(1) in held_bases]
    assert not leaked, leaked


def test_eval_splits_match_demo_sources(corpus):
    sp = os.path.join(corpus, "speech")
    assert len(os.listdir(os.path.join(sp, "valid"))) == 5
    assert len(os.listdir(os.path.join(sp, "test"))) == 7
    ns = os.path.join(corpus, "noise")
    assert len(os.listdir(os.path.join(ns, "valid"))) == 5
    assert len(os.listdir(os.path.join(ns, "test"))) == 7
