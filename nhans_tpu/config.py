"""Typed configuration for N-HANS/TPU.

The reference spreads a global ``tf.flags.FLAGS`` singleton across modules
(reference N_HANS___Selective_Noise/main.py:41-72, reader.py:33-41,
apply.py:29-35).  Here everything lives in explicit dataclasses; the CLI
layer (``nhans_tpu.cli``) maps the documented flag names (``--lr``,
``--train_mb``, ``--input``, ``--pos``, ``--neg``, ...) onto these fields so
reference users keep their muscle memory.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Audio front-end contract.

    16 kHz / 25 ms frame / 10 ms hop / 400-pt FFT -> 201 bins
    (reference reader.py:37,237-238, README.md:42).
    """

    sample_rate: int = 16000
    frame_ms: float = 25.0
    hop_ms: float = 10.0
    log_eps: float = 1e-5  # log(mag + 1e-5), reference reader.py:349
    # STFT implementation: "auto" = fused Pallas kernel on TPU, XLA
    # matmul-DFT elsewhere; "pallas" / "xla" force one.
    stft_impl: str = "auto"
    # RECONSTRUCTION-only cap on the predicted per-bin log-mag residual,
    # in nats (<= 0 disables).  The model may amplify a bin at most
    # e^cap x the mixture's magnitude; suppression stays unbounded.
    # Documented divergence from the reference (whose exp() is unbounded,
    # reference apply.py:199): off-manifold conditioning (unseen voices
    # on small corpora) can blow the bottom bins up by e^12+, burying an
    # otherwise-good separation under low-frequency rumble
    # (docs/QUALITY.md).  Legitimate amplification (phase-cancellation
    # recovery) measures well under 2 nats (~17 dB), so the cap is inert
    # on healthy outputs; the training loss NEVER sees it.
    recon_residual_cap: float = 2.0

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_ms / 1000.0)  # 400

    @property
    def frame_step(self) -> int:
        return int(self.sample_rate * self.hop_ms / 1000.0)  # 160

    @property
    def fft_length(self) -> int:
        return self.frame_length

    @property
    def num_features(self) -> int:
        return self.fft_length // 2 + 1  # 201

    def num_frames(self, num_samples: int) -> int:
        """Number of full STFT frames for a signal of `num_samples`."""
        if num_samples < self.frame_length:
            return 0
        return 1 + (num_samples - self.frame_length) // self.frame_step

    def trim_to_whole_frames(self, num_samples: int) -> int:
        """Length after cutting the tail to a whole number of frames
        (reference reader.py:195-198)."""
        rem = (num_samples - self.frame_length) % self.frame_step
        return num_samples - rem if rem else num_samples


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the conditional ResNet (reference main.py:98-256)."""

    window_frames: int = 35        # reference reader.py:35
    context_frames: int = 200      # reference reader.py:34
    num_features: int = 201
    embedding_dim: int = 512
    w_std: float = 0.01            # reference main.py:68
    b_init: float = 0.0            # reference main.py:69
    bn_decay: float = 0.95         # reference main.py:70
    bn_eps: float = 1e-3           # reference blocks.py:102
    pos_embed_hidden: int = 50     # cont_embed MLP width, reference main.py:130-136
    # Main tower: (kernel, stride, channels) per block, reference main.py:221-229
    main_blocks: Sequence = (
        (4, 1, 64), (4, 1, 64),
        (4, 2, 128), (4, 1, 128),
        (3, 2, 256), (3, 1, 256),
        (3, 2, 512), (3, 1, 512),
    )
    # Context tower: (kernel_hw, stride_hw, channels), reference main.py:194-198
    context_blocks: Sequence = (
        ((8, 4), (3, 2), 64),
        ((8, 4), (3, 2), 128),
        ((4, 4), (1, 1), 256),
        ((4, 4), (1, 2), 512),
    )
    # Frequency-weighted MSE: linspace(2 -> 1) over bins, reference main.py:245-248
    loss_weight_hi: float = 2.0
    loss_weight_lo: float = 1.0
    # Compute dtype: float32 for strict parity; bfloat16 for peak MXU throughput.
    compute_dtype: str = "float32"
    # MXU lane padding for the main tower's frequency axis: carry the
    # 201-bin spectrum on this many lanes (0 = off).  256 makes the
    # stride-2 conv chain 256->128->64->32 instead of 201->101->51->26.
    # The win is REGIME-DEPENDENT (measured round 5, docs/PROFILE.md):
    # +2.25x fwd+bwd at the 64-window TRAINING batch (where the odd
    # geometry starves the MXU) but -18% end-to-end RTF at the
    # 2048-window serving chunks (where native already tiles well and
    # the 27% padded FLOPs + masks cost net time) — so it is a
    # TRAINING lever (--freq_pad_to 256), off for serving by default
    # (NHANS_FREQ_PAD=256 opts in).  INFERENCE outputs are
    # bit-compatible with unpadded checkpoints either way (explicit
    # SAME-equivalent padding + dead-column masks, nn/model.py
    # CondResBlock); training under padding learns its own BatchNorm
    # statistics.
    freq_pad_to: int = 0
    # Rematerialize main-tower blocks on the backward pass (trade FLOPs
    # for activation memory at large batches; jax.checkpoint).
    remat: bool = False
    # TRAIN-time context-embedding jitter: add Gaussian noise of this
    # relative magnitude (x the embedding's RMS) to both 512-d context
    # embeddings before injection.  0 = off (reference parity).  A
    # conditioning-robustness regularizer for small corpora: the
    # separator otherwise memorizes the training voices' embedding
    # locations and collapses (outputs silence) on unseen voices whose
    # embeddings land off-manifold (docs/QUALITY.md).  Inference and
    # eval are unaffected (train=False).
    ctx_embed_noise: float = 0.0


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """A task = model family + mixing recipe.

    ``denoiser``  : two noise contexts (pos = keep, neg = suppress), mixing
                    mixes clean + pos + neg (reference Selective_Noise).
    ``separator`` : two speaker contexts (target, interference), mixing mixes
                    clean + interference (reference Source_Separation).
    """

    name: str = "denoiser"
    snr_set: Sequence[int] = (-3, 0, 3, 5, 8)  # reference reader.py:201
    two_noise_mixing: bool = True              # clean + pos + neg

    @staticmethod
    def denoiser() -> "TaskConfig":
        return TaskConfig(name="denoiser", snr_set=(-3, 0, 3, 5, 8),
                          two_noise_mixing=True)

    @staticmethod
    def separator() -> "TaskConfig":
        # reference N_HANS___Source_Separation/reader.py:138
        return TaskConfig(name="separator", snr_set=(-5, -3, -1, 0, 1, 3, 5),
                          two_noise_mixing=False)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline (reference reader.py)."""

    speech_wav_dir: str = "./speech_wav_dir/"
    noise_wav_dir: str = "./noise_wav_dir/"
    eval_seeds: str = "valid"      # reference reader.py:38
    # Eval clean<->noise pairing mode:
    #   "wrap"  (default): clean i pairs with noise[(2i)%N], noise[(2i+1)%N]
    #           (separator: interferer = speech[(i+1)%N]) — every utterance
    #           is scored once, noises cycle.  Internal-trend convention of
    #           rounds 1-4; changing it would invalidate history.
    #   "queue": the reference's queue-order equivalent — 1-epoch unshuffled
    #           producers (reference reader.py:273-279): eval STOPS when the
    #           noise list exhausts instead of wrapping (utterances beyond
    #           len(noise)//2 are not scored); separator dequeues the ONE
    #           speech queue twice (Source_Separation/reader.py:248-249):
    #           clean = speech[2j], interferer = speech[2j+1].  Use for
    #           absolute numbers comparable to a reference eval run.
    eval_pairing: str = "wrap"
    random_slices: int = 50        # crops per utterance, reference reader.py:36
    # Crops taken per utterance *per device step* in the TPU pipeline.  The
    # reference enqueues 50 crops/utt into a shuffle queue; on TPU we mix on
    # device, so we take fewer crops from more utterances per batch for
    # better decorrelation.
    slices_per_step: int = 4
    # Utterance bucket in samples (static shape for XLA). 163600 = 10.22 s,
    # chosen so (163600 - 400) % 160 == 0 (whole frames).
    max_samples: int = 163600
    # Per-batch length buckets (seconds): each train batch is trimmed to
    # the smallest bucket that fits its longest utterance, cutting
    # host->device transfer of padding; jit caches one step per bucket.
    length_buckets: Sequence[float] = (4.0, 7.0, 10.225)
    num_workers: int = 16          # reference main.py:86 (16 enqueue threads)
    prefetch: int = 2
    seed: int = 0
    # Wire format for host->device waveform transfer.  "int16" halves the
    # PCIe/ICI bytes (wavs are int16-origin anyway; only stereo-downmix
    # means round).  "float32" for bit-exact strictness.
    transfer_dtype: str = "int16"
    # Train-time noise augmentation (random circular shift / time
    # reversal / polarity of the noise recordings, on-device).  OFF by
    # default: the reference has none (documented divergence when on);
    # multiplies effective noise diversity on small corpora.
    augment_noise: bool = False
    # In-memory decoded-file cache budget (MB) for the train loader.
    # Small corpora fit entirely and skip wav decode after the first
    # epoch (the demo-corpus quality runs are input-bound on 1-core
    # hosts); large corpora simply overflow the budget and keep
    # decoding.  0 disables.
    decode_cache_mb: int = 512
    # Train-time SNR-range extension: append {12, 18, 30} dB to the
    # task's SNR set for TRAINING mixtures only (eval keeps the
    # reference's md5-deterministic draws from the base set).  OFF by
    # default (reference parity).  High-SNR/near-clean mixtures teach
    # the model to pass already-clean input through — the published
    # model learns this from corpus scale; small corpora need it
    # explicitly (docs/QUALITY.md over-suppression analysis).
    snr_augment: bool = False
    # Device-resident corpus banks: decode the WHOLE training corpus to
    # HBM once and transfer only int32 index triples per step (~10^6x
    # fewer host->device bytes than waveform batches; also removes the
    # host decode from the hot loop entirely).  "auto" enables it when
    # the corpus fits ``device_corpus_mb`` and the run is single-host;
    # "on" forces (errors if it cannot apply), "off" streams waveforms.
    device_corpus: str = "auto"
    device_corpus_mb: int = 512


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training driver (reference main.py:41-72,361-608)."""

    alg: str = "sgd"
    lr: float = 0.001
    mom: float = 0.0
    train_mb: int = 64
    eval_mb: int = 100
    batches: int = 3_000_000
    eval_every: int = 5000
    train_monitor_every: int = 1000
    checkpoints_to_keep: int = 1_000_000
    restore_path: str = ""
    model_name: str = "nhans"
    checkpoint_dir: str = "./checkpoints"
    summaries_dir: str = "./summaries"
    dump_results: str = "./dump"
    wav_dump_folder: str = "./wav_dump/"
    eval_before_training: bool = False
    eval_after_training: bool = True
    # Near-clean window loss upweighting (0 = off, reference parity).
    # Windows whose central frame is already close to the target (small
    # mean |log-mag| distance, i.e. high local SNR) get loss weight
    # 1 + boost * sigmoid((clean_loss_dist - d) / clean_loss_scale),
    # normalized to mean 1 over the batch.  Targets the small-corpus
    # failure mode of over-suppressing already-clean input: the
    # identity mapping gets a gradient share proportional to boost
    # instead of its tiny natural MSE (docs/QUALITY.md).  The distance
    # midpoint 0.25 corresponds to ~13 dB local SNR in the log-mag
    # feature domain (hann/400-pt frames, measured calibration).
    clean_loss_boost: float = 0.0
    clean_loss_dist: float = 0.25
    clean_loss_scale: float = 0.08
    # Optional lr schedule (constant = reference parity)
    lr_schedule: str = "constant"  # constant | cosine
    lr_decay_steps: int = 0        # cosine horizon (0 = disabled)
    lr_min_frac: float = 0.1       # final lr as a fraction of --lr
    # TPU-specific
    data_axis: int = 0             # mesh data-parallel axis size; 0 = all devices
    model_axis: int = 1            # tensor-parallel axis size (SURVEY §2.2:
    # optional at this model scale; shards the wide conv output channels
    # via parallel/sharding_rules when > 1)
    donate_state: bool = True
    profile_dir: str = ""          # capture a jax.profiler trace here
    async_eval: bool = False       # evaluate from ckpt snapshots on a thread


@dataclasses.dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    task: TaskConfig = dataclasses.field(default_factory=TaskConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    @staticmethod
    def denoiser(**overrides) -> "Config":
        return Config(task=TaskConfig.denoiser(), **overrides)

    @staticmethod
    def separator(**overrides) -> "Config":
        return Config(task=TaskConfig.separator(), **overrides)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def add_reference_flags(parser, *, inference: bool = False,
                        task: str = "denoiser") -> None:
    """Register the reference's documented flag names on an argparse parser.

    Flag table: reference README.md:76-99; definitions main.py:41-72,
    reader.py:33-41, apply.py:29-35.
    """
    # fmt: off
    if inference:
        defaults = {
            "denoiser": dict(input="./audio_examples/mixed.wav",
                             neg="./audio_examples/game_noise.wav",
                             pos="./audio_examples/Silent.wav",
                             output="./audio_examples/denoised.wav"),
            "separator": dict(input="./audio_examples/mixed.wav",
                              neg="./audio_examples/noise_speaker.wav",
                              pos="./audio_examples/target_speaker.wav",
                              output="./audio_examples/separated.wav"),
        }[task]
        parser.add_argument("--input", default=defaults["input"],
                            help="mixed wav (or a directory of wavs)")
        parser.add_argument("--neg", default=defaults["neg"],
                            help="negative/interference recording")
        parser.add_argument("--pos", default=defaults["pos"],
                            help="positive/target recording")
        parser.add_argument("--output", default=defaults["output"],
                            help="output wav (or directory in folder mode)")
        parser.add_argument("--compensate", type=float, default=0.0,
                            help="energy compensation factor (reference apply.py:34)")
        parser.add_argument("--ac", action="store_true", default=False,
                            help="auto compensation from SNR estimate (apply.py:35)")
        parser.add_argument("--checkpoint", default="",
                            help="explicit checkpoint path (replaces the "
                                 "reference's hard-coded ./trained_model)")
        parser.add_argument("--demo", action="store_true", default=False,
                            help="treat --input as CLEAN speech: mix it "
                                 "with --pos/--neg at 0 dB first, then "
                                 "enhance (reference apply_demo, "
                                 "apply.py:212-336)")
        parser.add_argument("--mesh", default="off",
                            choices=("off", "auto"),
                            help="auto: shard serving over every visible "
                                 "chip (shard_map over the batch axis; "
                                 "single-chip results, exactly)")
    parser.add_argument("--recon_residual_cap", type=float, default=2.0,
                        help="reconstruction-only cap (nats) on the "
                             "predicted per-bin log-magnitude GAIN over "
                             "the mixture; bounds off-manifold low-bin "
                             "blowups (docs/QUALITY.md).  The reference "
                             "exp() is unbounded — set 0 to disable for "
                             "strict parity comparisons against "
                             "published-model outputs; a NOTE is printed "
                             "whenever the cap actually clips")
    parser.add_argument("--Fs", type=int, default=16000)
    parser.add_argument("--context_frames", type=int, default=200)
    parser.add_argument("--window_frames", type=int, default=35)
    parser.add_argument("--random_slices", type=int, default=50)
    parser.add_argument("--augment_noise", action="store_true",
                        default=False,
                        help="random circular-shift/reversal/polarity of "
                             "train noise recordings (on-device)")
    parser.add_argument("--slices_per_step", type=int, default=4,
                        help="crops per utterance per device step (the "
                             "TPU pipeline's analog of --random_slices; "
                             "train_mb/slices_per_step utterances ride "
                             "the wire each step)")
    parser.add_argument("--decode_cache_mb", type=int, default=512,
                        help="in-memory decoded-file cache budget for "
                             "the train loader (0 disables)")
    parser.add_argument("--device_corpus", default="auto",
                        choices=("auto", "on", "off"),
                        help="keep the whole training corpus in device "
                             "HBM and transfer only per-step indices "
                             "(auto: when it fits --device_corpus_mb on "
                             "a single host)")
    parser.add_argument("--device_corpus_mb", type=int, default=512)
    parser.add_argument("--eval_seeds", default="valid")
    parser.add_argument("--eval_pairing", default="wrap",
                        choices=("wrap", "queue"),
                        help="eval clean<->noise pairing: 'wrap' (cycle "
                             "noises, every utterance scored; rounds 1-4 "
                             "trend convention) or 'queue' (reference "
                             "1-epoch queue-order equivalent: truncates "
                             "at noise exhaustion; separator pairs "
                             "speech[2j] vs speech[2j+1] — absolute "
                             "numbers comparable to a reference run)")
    parser.add_argument("--wav_dump_folder", default="./wav_dump/")
    parser.add_argument("--speech_wav_dir", default="./speech_wav_dir/")
    parser.add_argument("--noise_wav_dir", default="./noise_wav_dir/")
    if not inference:
        import argparse as _ap
        parser.add_argument("--eval_before_training",
                            action=_ap.BooleanOptionalAction, default=False)
        parser.add_argument("--eval_after_training",
                            action=_ap.BooleanOptionalAction, default=True)
        parser.add_argument("--checkpoints_to_keep", type=int, default=1000000)
        parser.add_argument("--restore_path", default="")
        parser.add_argument("--model_name", default="nhans")
        parser.add_argument("--checkpoint_dir", default="./checkpoints")
        parser.add_argument("--summaries_dir", default="./summaries")
        parser.add_argument("--dump_results", default="./dump")
        parser.add_argument("--eval_every", type=int, default=5000)
        parser.add_argument("--train_monitor_every", type=int, default=1000)
        parser.add_argument("--batches", type=int, default=3000000)
        parser.add_argument("--alg", default="sgd")
        parser.add_argument("--lr", type=float, default=0.001)
        parser.add_argument("--lr_schedule", default="constant",
                            choices=("constant", "cosine"))
        parser.add_argument("--lr_decay_steps", type=int, default=0,
                            help="cosine decay horizon in steps "
                                 "(0 disables; lr decays to "
                                 "lr*lr_min_frac)")
        parser.add_argument("--lr_min_frac", type=float, default=0.1)
        parser.add_argument("--snr_augment", action="store_true",
                            default=False,
                            help="extend TRAIN mixing SNRs with "
                                 "{12,18,30} dB (near-clean inputs; "
                                 "eval keeps the reference SNR set)")
        parser.add_argument("--clean_loss_boost", type=float, default=0.0,
                            help="upweight near-clean training windows "
                                 "in the loss by 1+boost (0 disables; "
                                 "anti-over-suppression lever for small "
                                 "corpora)")
        parser.add_argument("--ctx_embed_noise", type=float, default=0.0,
                            help="train-time Gaussian jitter on the two "
                                 "context embeddings, relative to their "
                                 "RMS (0 disables; conditioning-"
                                 "robustness lever for small corpora)")
        parser.add_argument("--freq_pad_to", type=int, default=0,
                            help="carry the main tower's frequency axis "
                                 "on this many MXU lanes (0 = native "
                                 "201; 256 measures >2x faster convs "
                                 "on TPU, see ModelConfig.freq_pad_to)")
        parser.add_argument("--mom", type=float, default=0.0)
        parser.add_argument("--w_std", type=float, default=0.01)
        parser.add_argument("--b_init", type=float, default=0.0)
        parser.add_argument("--bn_decay", type=float, default=0.95)
        parser.add_argument("--train_mb", type=int, default=64)
        parser.add_argument("--eval_mb", type=int, default=100)
    # fmt: on


def config_from_args(args, task: str = "denoiser") -> Config:
    """Build a Config from parsed reference-style CLI args."""
    task_cfg = TaskConfig.denoiser() if task == "denoiser" else TaskConfig.separator()
    audio = AudioConfig(
        sample_rate=getattr(args, "Fs", 16000),
        recon_residual_cap=getattr(args, "recon_residual_cap", 2.0))
    model = ModelConfig(
        window_frames=getattr(args, "window_frames", 35),
        context_frames=getattr(args, "context_frames", 200),
        num_features=audio.num_features,
        w_std=getattr(args, "w_std", 0.01),
        b_init=getattr(args, "b_init", 0.0),
        bn_decay=getattr(args, "bn_decay", 0.95),
        ctx_embed_noise=getattr(args, "ctx_embed_noise", 0.0),
        freq_pad_to=getattr(args, "freq_pad_to", 0),
    )
    data = DataConfig(
        speech_wav_dir=getattr(args, "speech_wav_dir", "./speech_wav_dir/"),
        noise_wav_dir=getattr(args, "noise_wav_dir", "./noise_wav_dir/"),
        eval_seeds=getattr(args, "eval_seeds", "valid"),
        eval_pairing=getattr(args, "eval_pairing", "wrap"),
        random_slices=getattr(args, "random_slices", 50),
        slices_per_step=getattr(args, "slices_per_step", 4),
        augment_noise=getattr(args, "augment_noise", False),
        decode_cache_mb=getattr(args, "decode_cache_mb", 512),
        device_corpus=getattr(args, "device_corpus", "auto"),
        device_corpus_mb=getattr(args, "device_corpus_mb", 512),
        snr_augment=getattr(args, "snr_augment", False),
    )
    train = TrainConfig(
        alg=getattr(args, "alg", "sgd"),
        lr=getattr(args, "lr", 0.001),
        lr_schedule=getattr(args, "lr_schedule", "constant"),
        lr_decay_steps=getattr(args, "lr_decay_steps", 0),
        lr_min_frac=getattr(args, "lr_min_frac", 0.1),
        clean_loss_boost=getattr(args, "clean_loss_boost", 0.0),
        mom=getattr(args, "mom", 0.0),
        train_mb=getattr(args, "train_mb", 64),
        eval_mb=getattr(args, "eval_mb", 100),
        batches=getattr(args, "batches", 3_000_000),
        eval_every=getattr(args, "eval_every", 5000),
        train_monitor_every=getattr(args, "train_monitor_every", 1000),
        checkpoints_to_keep=getattr(args, "checkpoints_to_keep", 1_000_000),
        restore_path=getattr(args, "restore_path", ""),
        model_name=getattr(args, "model_name", "nhans"),
        checkpoint_dir=getattr(args, "checkpoint_dir", "./checkpoints"),
        summaries_dir=getattr(args, "summaries_dir", "./summaries"),
        dump_results=getattr(args, "dump_results", "./dump"),
        wav_dump_folder=getattr(args, "wav_dump_folder", "./wav_dump/"),
        eval_before_training=getattr(args, "eval_before_training", False),
        eval_after_training=getattr(args, "eval_after_training", True),
    )
    return Config(audio=audio, model=model, task=task_cfg, data=data, train=train)
