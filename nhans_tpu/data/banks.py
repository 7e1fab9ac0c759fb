"""Device-resident corpus banks: the whole training corpus lives in HBM.

The reference streams every minibatch host->device through ``feed_dict``
(reference main.py:560-565); round 1 already moved mixing/STFT/crops on
device but still shipped raw waveform buffers each step.  For corpora that
fit HBM (the demo quality corpus is ~40 MB; even LibriSpeech train-clean-100
is ~6 GB int16 and would fit a v5e host slice sharded), the TPU-native
endgame is to upload the decoded corpus ONCE and transfer only int32 index
triples per step: ~100 bytes instead of ~8 MB, a ~10^5x reduction in
host->device traffic.  Side effects: zero input-wait, a single static step
shape (no length-bucket recompiles), and — in this environment — it bounds
the axon remote-TPU client's per-transfer host-buffer leak (docs/PROFILE.md)
to ~KB/step, so arbitrarily long single-process runs work.

Speaker-aware sampling: bank entries carry a speaker id parsed from the
filename (``spk<ID>_*``).  The separator task samples the interference
utterance from a DIFFERENT speaker than the target; the reference dequeues
the speech queue twice (Source_Separation/reader.py:248-249), which over a
~100k-utterance corpus virtually never collides, but over a small corpus
same-speaker "separation" is ill-posed (documented divergence,
docs/PARITY.md).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np

from nhans_tpu.config import Config
from nhans_tpu.data.manifest import load_seeds
from nhans_tpu.utils import native, wavio

_SPK_RE = re.compile(r"^spk([A-Za-z0-9]+)[_.]")


def speaker_of(path: str) -> str:
    """Speaker id from a ``spk<ID>_...`` filename; falls back to the file
    stem (every file its own group)."""
    base = os.path.basename(path)
    m = _SPK_RE.match(base)
    return m.group(1) if m else os.path.splitext(base)[0]


def real_speaker_of(path: str) -> str:
    """Speaker id with any pseudo-speaker perturbation tag stripped:
    ``spk<ID>p<tag>_...`` (make_demo_corpus --pseudo_speakers) maps back
    to ``<ID>``.  Pseudo variants of one voice count as distinct
    identities for conditioning diversity, but the separator must never
    PAIR a voice with a resampled copy of itself as target/interferer —
    near-identical voices make the supervision ill-posed.

    The tag is stripped only when a non-empty id remains: a legitimate
    speaker id that is ENTIRELY ``p<digits>`` (e.g. VCTK-style
    ``spkp225_*.wav``) must stay distinct, otherwise every such voice
    collapses to "" and the disjoint table silently turns off.

    Tags strip to a FIXPOINT: derived voices carry stacked tags
    (``spks3tp0`` = example 3's residual-extracted interferer, whose
    speed-perturbed pseudo variants become ``spks3tp0p09``) and every
    layer must collapse to the base voice ``s3t`` so a voice is never
    paired against any derivative of itself."""
    sid = speaker_of(path)
    while True:
        stripped = re.sub(r"(?<=.)p[0-9]+$", "", sid)
        if stripped == sid:
            return sid
        sid = stripped


def build_disjoint_table(paths: List[str]) -> Optional[List[np.ndarray]]:
    """Speaker-disjoint interference table for the separator: entry i is
    the index array of utterances whose REAL voice (pseudo-speaker tags
    stripped, :func:`real_speaker_of`) differs from utterance i's.
    Returns ``None`` — with a loud warning, never silently — when the
    corpus has fewer than 2 distinct real voices, in which case pairing
    is unconstrained (the reference's double-dequeue behavior,
    Source_Separation/reader.py:248-249, which is safe only on
    ~100k-speaker corpora).  Shared by the banked and streaming loaders
    so the gate can never drift between them."""
    real = [real_speaker_of(p) for p in paths]
    spk = np.asarray(real)
    if len(set(real)) >= 2:
        return [np.flatnonzero(spk != s) for s in real]
    print("WARNING: separator speaker-disjoint sampling DISABLED — "
          f"corpus has {len(set(real))} distinct real voice(s); "
          "target/interferer pairs are unconstrained (same-voice "
          "mixtures possible)", flush=True)
    return None


def corpus_bytes(paths: List[str]) -> int:
    """Approximate decoded int16 bytes (wav payload ~= file size)."""
    return sum(os.path.getsize(p) for p in paths)


def _decode_all(paths: List[str], max_samples: int, sample_rate: int,
                wire: type) -> tuple:
    """Decode every file into one [N, L] array (L = longest, rounded to
    whole frames) + lengths [N] + whole-file peaks [N]."""
    if native.available():
        load = (native.load_batch_i16 if wire == np.int16
                else native.load_batch)
        buf, lens, peaks = load(list(paths), max_samples, sample_rate,
                                num_threads=4)
        longest = int(lens.max())
        return (np.ascontiguousarray(buf[:, :longest]),
                lens.astype(np.int32), peaks.astype(np.float32))
    rows, lens, peaks = [], [], []
    for p in paths:
        x = np.asarray(wavio.read_wav_strict(p), np.float32)
        peaks.append(float(np.max(np.abs(x))) if len(x) else 0.0)
        x = x[:max_samples]
        lens.append(len(x))
        rows.append(x)
    longest = max(lens, default=1)
    out = np.zeros((len(rows), longest),
                   np.float32 if wire != np.int16 else np.int16)
    for i, x in enumerate(rows):
        out[i, :len(x)] = np.rint(x) if wire == np.int16 else x
    return out, np.asarray(lens, np.int32), np.asarray(peaks, np.float32)


class DeviceBanks:
    """Decoded corpus banks placed on device (replicated on the mesh).

    ``banks`` is the pytree passed to the banked train step each call:
    {"speech", "speech_len", "speech_peak", "noise", "noise_len",
    "noise_peak"} — for the separator the noise entries alias the speech
    arrays (same device buffers; the reference's double speech dequeue).
    """

    def __init__(self, cfg: Config, split: str = "train",
                 sharding=None):
        import jax

        self.cfg = cfg
        wire = (np.int16 if cfg.data.transfer_dtype == "int16"
                else np.float32)
        self.speech_paths = load_seeds(cfg.data.speech_wav_dir, split)
        self.two_noise = cfg.task.two_noise_mixing
        if self.two_noise:
            self.noise_paths = load_seeds(cfg.data.noise_wav_dir, split)
        else:
            self.noise_paths = self.speech_paths
        if not self.speech_paths or not self.noise_paths:
            raise ValueError("empty manifest(s)")

        L = cfg.data.max_samples
        fs = cfg.audio.sample_rate
        fl, step = cfg.audio.frame_length, cfg.audio.frame_step
        sp, sp_len, sp_pk = _decode_all(self.speech_paths, L, fs, wire)
        if self.two_noise:
            ns, ns_len, ns_pk = _decode_all(self.noise_paths, L, fs, wire)
        else:
            ns, ns_len, ns_pk = sp, sp_len, sp_pk

        # pad the sample axis up to whole STFT frames (static shape)
        def pad_frames(a):
            n = a.shape[1]
            if n < fl:
                target = fl
            else:
                rem = (n - fl) % step
                target = n + (step - rem) % step
            if target > n:
                a = np.pad(a, ((0, 0), (0, target - n)))
            return a

        host = {
            "speech": pad_frames(sp), "speech_len": sp_len,
            "speech_peak": sp_pk,
        }
        if self.two_noise:
            host.update(noise=pad_frames(ns), noise_len=ns_len,
                        noise_peak=ns_pk)
        else:
            host.update(noise=host["speech"], noise_len=sp_len,
                        noise_peak=sp_pk)
        self.nbytes = sum(v.nbytes for v in host.values())
        if sharding is not None:
            self.banks = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), host)
        else:
            self.banks = jax.tree_util.tree_map(jax.device_put, host)
        for v in jax.tree_util.tree_leaves(self.banks):
            v.block_until_ready()

        self.speakers = [speaker_of(p) for p in self.speech_paths]


class BankIndexLoader:
    """Infinite stream of per-step index batches for :class:`DeviceBanks`.

    Yields {"clean_idx": [B], "a_idx": [B], "b_idx": [B]} int32.  For the
    separator, ``a_idx`` (interference) is drawn from a different speaker
    than ``clean_idx`` whenever the corpus has >=2 speaker groups.

    Sampling is STEP-INDEXED: batch t is a pure function of
    (seed, t), so a killed-and-resumed run replays the exact data
    sequence of an uninterrupted one — checkpoint auto-resume rejoins
    the seeded loss trajectory bit-for-bit (tests/test_fault_injection).
    """

    def __init__(self, banks: DeviceBanks, batch_utts: int,
                 seed: Optional[int] = None, start_step: int = 0):
        cfg = banks.cfg
        self.B = batch_utts
        self.two_noise = banks.two_noise
        self.n_speech = len(banks.speech_paths)
        self.n_noise = len(banks.noise_paths)
        self._seed = cfg.data.seed if seed is None else seed
        self._step = start_step
        # speaker-disjoint interference sampling table (separator) —
        # disjoint on the REAL voice, see build_disjoint_table (banks
        # are single-host only, so speech_paths IS the full manifest)
        self._other: Optional[List[np.ndarray]] = None
        if not self.two_noise:
            self._other = build_disjoint_table(banks.speech_paths)

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self._seed, self._step))
        self._step += 1
        B = self.B
        ci = rng.integers(self.n_speech, size=B).astype(np.int32)
        if self.two_noise:
            ai = rng.integers(self.n_noise, size=B).astype(np.int32)
            bi = rng.integers(self.n_noise, size=B).astype(np.int32)
        elif self._other is not None:
            ai = np.asarray([self._other[c][rng.integers(
                len(self._other[c]))] for c in ci], np.int32)
            bi = np.zeros(B, np.int32)
        else:
            ai = rng.integers(self.n_noise, size=B).astype(np.int32)
            bi = np.zeros(B, np.int32)
        return {"clean_idx": ci, "a_idx": ai, "b_idx": bi}

    def close(self) -> None:  # loader-protocol parity with TrainLoader
        pass


def banks_enabled(cfg: Config, split: str = "train") -> bool:
    """Resolve the ``device_corpus`` mode for this run (auto: single host
    AND the decoded corpus fits the budget)."""
    import jax

    mode = cfg.data.device_corpus
    if mode == "off":
        return False
    multi_host = jax.process_count() > 1
    try:
        speech = load_seeds(cfg.data.speech_wav_dir, split)
        noise = (load_seeds(cfg.data.noise_wav_dir, split)
                 if cfg.task.two_noise_mixing else [])
        total = corpus_bytes(speech) + corpus_bytes(noise)
    except (FileNotFoundError, OSError):
        if mode == "on":
            raise
        return False
    fits = total <= cfg.data.device_corpus_mb * (1 << 20)
    if mode == "on":
        if multi_host:
            raise ValueError(
                "device_corpus=on is single-host only (replicated banks "
                "require identical content on every host; the streaming "
                "loader shards manifests per host instead)")
        if not fits:
            raise ValueError(
                f"device_corpus=on but corpus is {total >> 20} MB > "
                f"budget {cfg.data.device_corpus_mb} MB")
        return True
    return (not multi_host) and fits
