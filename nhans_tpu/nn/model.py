"""The N-HANS conditional ResNet, rebuilt as flax.linen modules.

One architecture, two task configs (reference README.md:11):

* denoiser / selective suppressor: contexts = (positive noise, negative
  noise) (reference N_HANS___Selective_Noise/main.py:98-256),
* separator: contexts = (interference speaker, target speaker)
  (reference N_HANS___Source_Separation/main.py:99-265).

Topology (reference main.py:190-242):
  - shared-weight context-embedding tower: 4 strided residual conv blocks
    (64 -> 128 -> 256 -> 512) + global average pool -> 512-d embedding,
    applied to both context spectrograms with shared parameters,
  - main tower: 8 residual conv blocks (64,64,128,128,256,256,512,512 /
    strides 1,1,2,1,2,1,2,1) where every conv output is additively
    conditioned by projections of the two context embeddings plus learned
    time-/frequency-position MLP embeddings (main.py:126-187),
  - head: time-collapsing VALID conv + dense -> 201-d residual added to the
    central mixed frame (main.py:232-242),
  - loss: frequency-weighted MSE, linspace(2 -> 1) over bins emphasising
    low frequencies (main.py:245-248).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from nhans_tpu.config import ModelConfig
from nhans_tpu.nn.blocks import BatchNorm, Conv, Dense

Dtype = Any


class PositionalMLP(nn.Module):
    """``cont_embed`` (reference main.py:127-137): embed positions
    0..n-1 through a 1 -> 50 -> 50 -> out_dim MLP with BN+ReLU between
    layers; the final projection is zero-initialised."""

    out_dim: int
    hidden: int = 50
    w_std: float = 0.01
    bn_decay: float = 0.95
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, n: int, train: bool):
        x = jnp.arange(n, dtype=jnp.float32)[:, None]
        x = Dense(self.hidden, self.w_std, use_bias=False,
                  dtype=self.dtype, name="dense1")(x)
        x = nn.relu(BatchNorm(self.bn_decay, dtype=self.dtype,
                              name="bn1")(x, train))
        x = Dense(self.hidden, self.w_std, use_bias=False,
                  dtype=self.dtype, name="dense2")(x)
        x = nn.relu(BatchNorm(self.bn_decay, dtype=self.dtype,
                              name="bn2")(x, train))
        x = Dense(self.out_dim, 0.0, use_bias=False,
                  dtype=self.dtype, name="dense3")(x)
        return x  # [n, out_dim]


class ContextBlock(nn.Module):
    """``noise_resnet_block`` (reference main.py:102-124): conv-BN-relu-conv
    residual block with a 1x1 strided shortcut when channels change."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    w_std: float = 0.01
    b_init: float = 0.0
    bn_decay: float = 0.95
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        p = dict(w_std=self.w_std, b_init=self.b_init, dtype=self.dtype)
        path1 = Conv(self.features, self.kernel, self.strides,
                     use_bias=False, name="conv1", **p)(x)
        path1 = nn.relu(BatchNorm(self.bn_decay, dtype=self.dtype,
                                  name="bn1")(path1, train))
        path1 = Conv(self.features, self.kernel, (1, 1),
                     use_bias=True, name="conv2", **p)(path1)
        if x.shape[-1] == self.features:
            path2 = x
        else:
            path2 = Conv(self.features, (1, 1), self.strides,
                         use_bias=True, name="transform", **p)(x)
        out = BatchNorm(self.bn_decay, dtype=self.dtype,
                        name="bn_out")(path1 + path2, train)
        return nn.relu(out)


class ContextEncoder(nn.Module):
    """The shared context-embedding tower (reference main.py:190-216):
    4 ContextBlocks + global average pool -> [B, 512]."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, ctx, train: bool):
        # ctx: [B, context_frames, num_features]
        dtype = jnp.dtype(self.cfg.compute_dtype)
        x = ctx[..., None]
        for i, (kernel, strides, features) in enumerate(self.cfg.context_blocks):
            x = ContextBlock(features, tuple(kernel), tuple(strides),
                             self.cfg.w_std, self.cfg.b_init,
                             self.cfg.bn_decay, dtype,
                             name=f"block{i + 1}")(x, train)
        # Global average pool over time x freq (reference main.py:199-202)
        return jnp.mean(x, axis=(1, 2))  # [B, embedding_dim]


class Inject(nn.Module):
    """``process_noise_t_f`` + additive injection (reference
    main.py:139-172): project both context embeddings to the block width
    and add them together with learned time- and frequency-position
    embeddings.  All projections are zero-initialised, so conditioning
    starts as a no-op."""

    features: int
    hidden: int = 50
    w_std: float = 0.01
    bn_decay: float = 0.95
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb_a, emb_b, train: bool):
        a = Dense(self.features, 0.0, use_bias=True, dtype=self.dtype,
                  name="proj_a")(emb_a)[:, None, None, :]
        b = Dense(self.features, 0.0, use_bias=True, dtype=self.dtype,
                  name="proj_b")(emb_b)[:, None, None, :]
        t = PositionalMLP(self.features, self.hidden, self.w_std,
                          self.bn_decay, self.dtype,
                          name="temb")(x.shape[1], train)[None, :, None, :]
        f = PositionalMLP(self.features, self.hidden, self.w_std,
                          self.bn_decay, self.dtype,
                          name="femb")(x.shape[2], train)[None, None, :, :]
        return x + a + b + t + f


def _same_pads(n: int, k: int, s: int):
    """TF-SAME (low, high) padding and output size for a length-``n``
    axis under kernel ``k`` / stride ``s``."""
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    return total // 2, total - total // 2, out


class CondResBlock(nn.Module):
    """``resnet_block`` (reference main.py:126-187): residual conv block
    with conditioning injected after each of the two convolutions.

    ``freq_valid`` > 0 enables the MXU lane-padded geometry
    (ModelConfig.freq_pad_to): the incoming frequency axis is wider than
    the model's true spectrum (e.g. 256 lanes carrying 201 bins + zeros)
    because 2^n frequency sizes conv >2x faster on TPU than the native
    201 -> 101 -> 51 -> 26 chain (tools/profile_bf16.py measurement).
    Exactness is preserved by (a) convolving with EXPLICIT padding equal
    to what TF-SAME would apply at the TRUE size — SAME's low-pad
    depends on input size, so letting XLA derive it from the padded
    width would shift the output grid — and (b) re-zeroing the dead
    columns after every conv stage so boundary taps keep reading the
    zeros that SAME padding would have supplied.  At inference
    (train=False) every BatchNorm is a per-channel affine from EMA
    stats, so outputs in the valid region are BIT-COMPATIBLE with the
    unpadded model under the same checkpoint (tests/test_model_oracle).
    Under train=True, batch statistics include the zero columns, so a
    freq-padded model trains its own (equally valid) stats."""

    features: int
    kernel: int
    stride: int
    hidden: int = 50
    w_std: float = 0.01
    b_init: float = 0.0
    bn_decay: float = 0.95
    dtype: Dtype = jnp.float32
    freq_valid: int = 0

    @nn.compact
    def __call__(self, x, emb_a, emb_b, train: bool):
        k, s = self.kernel, self.stride
        p = dict(w_std=self.w_std, b_init=self.b_init, dtype=self.dtype)
        inj = dict(hidden=self.hidden, w_std=self.w_std,
                   bn_decay=self.bn_decay, dtype=self.dtype)
        fv = self.freq_valid
        if fv:
            tl, th, _ = _same_pads(x.shape[1], k, s)
            fl, fh, fv1 = _same_pads(fv, k, s)
            pad1 = ((tl, th), (fl, fh))
            tl2, th2, _ = _same_pads(-(-x.shape[1] // s), k, 1)
            fl2, fh2, _ = _same_pads(fv1, k, 1)
            pad2 = ((tl2, th2), (fl2, fh2))

            def fmask(y, valid):
                keep = (jnp.arange(y.shape[2]) < valid)[None, None, :,
                                                        None]
                return y * keep.astype(y.dtype)
        else:
            pad1 = pad2 = "SAME"
            fv1 = 0
            fmask = None
        path1 = Conv(self.features, (k, k), (s, s), use_bias=False,
                     padding=pad1, name="conv1", **p)(x)
        path1 = Inject(self.features, name="inject1", **inj)(
            path1, emb_a, emb_b, train)
        path1 = nn.relu(BatchNorm(self.bn_decay, dtype=self.dtype,
                                  name="bn1")(path1, train))
        if fv:
            path1 = fmask(path1, fv1)
        path1 = Conv(self.features, (k, k), (1, 1), use_bias=True,
                     padding=pad2, name="conv2", **p)(path1)
        path1 = Inject(self.features, name="inject2", **inj)(
            path1, emb_a, emb_b, train)
        if x.shape[-1] == self.features:
            path2 = x
        else:
            path2 = Conv(self.features, (1, 1), (s, s), use_bias=True,
                         name="transform", **p)(x)
        out = BatchNorm(self.bn_decay, dtype=self.dtype,
                        name="bn_out")(path1 + path2, train)
        out = nn.relu(out)
        if fv:
            out = fmask(out, fv1)
        return out


class NHANSNet(nn.Module):
    """Full model.  Returns the predicted residual correction to the
    central mixed frame: ``denoised = mixed[:, W//2, :] + residual``
    (reference main.py:232-242).

    Context argument order follows the reference: ``ctx_a`` is the first
    tower call (positive noise for the denoiser / interference speaker for
    the separator), ``ctx_b`` the second (negative noise / target speaker).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, mixed, ctx_a=None, ctx_b=None, train: bool = False,
                 emb_a=None, emb_b=None):
        """Either pass the raw context spectrograms (``ctx_a``/``ctx_b``)
        or precomputed 512-d embeddings (``emb_a``/``emb_b``).

        The embedding path lets inference encode each conditioning
        recording ONCE per utterance instead of re-running the context
        tower for every window batch, which is what the reference does by
        tiling the contexts per window (reference apply.py:383-387,444-446).
        Pass ``mixed=None`` to only encode contexts.
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        encoder = ContextEncoder(cfg, name="embedding")
        if emb_a is None:
            emb_a = encoder(ctx_a, train)
        if emb_b is None:
            emb_b = encoder(ctx_b, train)
        if (train and cfg.ctx_embed_noise > 0.0
                and self.has_rng("embed_noise")):
            # Conditioning-robustness jitter (ModelConfig.ctx_embed_noise):
            # RMS-relative so the regularization strength tracks the
            # embedding scale as it grows during training.
            def _jitter(e, key):
                rms = jnp.sqrt(jnp.mean(jnp.square(e), axis=-1,
                                        keepdims=True) + 1e-8)
                return e + (cfg.ctx_embed_noise * rms *
                            jax.random.normal(key, e.shape, e.dtype))
            emb_a = _jitter(emb_a, self.make_rng("embed_noise"))
            emb_b = _jitter(emb_b, self.make_rng("embed_noise"))
        if mixed is None:
            return emb_a, emb_b

        out = mixed[..., None]
        # MXU lane padding (ModelConfig.freq_pad_to): carry the 201-bin
        # spectrum on a 2^n-wide frequency axis — the conv chain
        # 256 -> 128 -> 64 -> 32 measures >2x faster than the native
        # 201 -> 101 -> 51 -> 26 on TPU (tools/profile_bf16.py), and the
        # per-block explicit-pad + dead-column masking (CondResBlock)
        # keeps inference outputs bit-compatible with unpadded
        # checkpoints.
        fpad = cfg.freq_pad_to
        fv = 0
        if fpad and fpad > out.shape[2]:
            fv = out.shape[2]
            out = jnp.pad(out, ((0, 0), (0, 0), (0, fpad - fv), (0, 0)))
        block_cls = (nn.remat(CondResBlock, static_argnums=(4,))
                     if cfg.remat else CondResBlock)
        for i, (k, s, c) in enumerate(cfg.main_blocks):
            out = block_cls(c, k, s, cfg.pos_embed_hidden, cfg.w_std,
                            cfg.b_init, cfg.bn_decay, dtype,
                            freq_valid=fv,
                            name=f"resblock{i + 1}")(
                                out, emb_a, emb_b, train)
            if fv:
                fv = -(-fv // s)
        if fpad and fv:
            out = out[:, :, :fv, :]

        # Head: time-collapsing VALID conv (reference main.py:232-238)
        out = Conv(cfg.embedding_dim, (out.shape[1], 1), (1, 1),
                   padding="VALID", w_std=cfg.w_std, b_init=cfg.b_init,
                   use_bias=False, dtype=dtype, name="last_conv")(out)
        out = nn.relu(BatchNorm(cfg.bn_decay, dtype=dtype,
                                name="last_bn")(out, train))
        out = out.reshape(out.shape[0], -1)
        residual = Dense(cfg.num_features, 0.0, use_bias=True,
                         dtype=dtype, name="last_dense")(out)
        return residual.astype(jnp.float32)

    def enhance_frames(self, mixed, ctx_a, ctx_b):
        """denoised central frames for a batch of windows [B, W, F]."""
        res = self(mixed, ctx_a, ctx_b, train=False)
        return mixed[:, self.cfg.window_frames // 2, :] + res


def freq_loss_weights(num_features: int, hi: float = 2.0,
                      lo: float = 1.0) -> jnp.ndarray:
    """linspace(2 -> 1) bin weights (reference main.py:246)."""
    return jnp.asarray(np.linspace(hi, lo, num_features, dtype=np.float32))


def freq_weighted_mse(denoised, target, weights=None):
    """Per-example frequency-weighted MSE and its mean
    (reference main.py:245-248)."""
    if weights is None:
        weights = freq_loss_weights(denoised.shape[-1])
    se = jnp.square(denoised - target)
    example_loss = jnp.mean(se * weights, axis=-1)
    return jnp.mean(example_loss), example_loss
