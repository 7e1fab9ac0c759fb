"""NN primitives with the reference's exact semantics
(reference N_HANS___Selective_Noise/blocks.py:23-112).

* ``Dense`` / ``Conv``: truncated-normal(w_std) kernels (TF
  truncated_normal_initializer parity: redraw beyond 2 sigma, no variance
  rescaling), optional constant-init bias.
* ``BatchNorm``: moments over all-but-channel axes, EMA decay
  ``bn_decay`` (default 0.95), epsilon 1e-3, population stats updated on
  every training forward (reference blocks.py:89-102).
* ``reverse_gradient``: gradient-reversal trick (reference blocks.py:111-112).

Convs run NHWC/HWIO — XLA:TPU's native layout for the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def trunc_normal(stddev: float):
    """TF ``truncated_normal_initializer(stddev)`` parity: sample from a
    standard normal truncated to [-2, 2] and scale by stddev (values beyond
    two sigma are redrawn, *without* the variance correction some JAX
    initializers apply)."""

    def init(key, shape, dtype=jnp.float32):
        if stddev == 0.0:
            return jnp.zeros(shape, dtype)
        u = jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
        return (u * stddev).astype(dtype)

    return init


class Dense(nn.Module):
    """Matmul(+bias) layer (reference blocks.py:23-35).  Param names ``w``
    [in, out] and ``b`` [out] mirror the reference for checkpoint import."""

    features: int
    w_std: float = 0.01
    use_bias: bool = True
    b_init: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("w", trunc_normal(self.w_std),
                       (x.shape[-1], self.features))
        # No preferred_element_type upcast in reduced precision: the MXU
        # accumulates bf16 matmuls in f32 internally, and keeping the
        # output dtype == input dtype keeps conv/matmul transposes
        # well-typed under autodiff.
        y = jnp.matmul(x.astype(self.dtype), w.astype(self.dtype))
        if self.use_bias:
            b = self.param("b", nn.initializers.constant(self.b_init),
                           (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Conv(nn.Module):
    """2-D convolution(+bias), NHWC/HWIO (reference blocks.py:38-48)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    w_std: float = 0.01
    use_bias: bool = True
    b_init: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        w = self.param("w", trunc_normal(self.w_std),
                       (kh, kw, x.shape[-1], self.features))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("b", nn.initializers.constant(self.b_init),
                           (self.features,))
            y = y + b.astype(y.dtype)
        return y


class BatchNorm(nn.Module):
    """Reference batch_norm semantics (reference blocks.py:72-108):
    per-batch biased moments over all-but-last axes, population EMA
    ``pop = decay*pop + (1-decay)*batch`` updated on the training forward,
    epsilon 1e-3, learnable beta/gamma."""

    decay: float = 0.95
    eps: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        beta = self.param("beta", nn.initializers.zeros, (c,))
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        pop_mean = self.variable("batch_stats", "pop_mean",
                                 lambda: jnp.zeros((c,), jnp.float32))
        pop_var = self.variable("batch_stats", "pop_variance",
                                lambda: jnp.ones((c,), jnp.float32))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x.astype(jnp.float32), axis=axes)
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32)), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                pop_mean.value = self.decay * pop_mean.value + (1 - self.decay) * mean
                pop_var.value = self.decay * pop_var.value + (1 - self.decay) * var
        else:
            mean, var = pop_mean.value, pop_var.value
        inv = jax.lax.rsqrt(var + self.eps) * gamma
        y = (x.astype(jnp.float32) - mean) * inv + beta
        return y.astype(self.dtype)


def reverse_gradient(x, gradient_factor):
    """-g*x + stop_grad((g+1)*x): identity forward, -g-scaled gradient
    (reference blocks.py:111-112)."""
    return -gradient_factor * x + jax.lax.stop_gradient((gradient_factor + 1) * x)
