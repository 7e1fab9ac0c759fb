"""The jitted training step: on-device augmentation + forward + loss +
grad + optimizer + BN-stat update, pjit-sharded over the data axis.

One XLA program replaces the reference's per-step double host round-trip
(input session -> numpy -> feed_dict -> train session, reference
main.py:560-565).  The raw-waveform batch arrives sharded over the mesh's
``data`` axis; every reduction over the batch (loss mean, BN moments,
gradients) compiles to a psum over ICI automatically.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from nhans_tpu.config import Config
from nhans_tpu.data.pipeline import make_train_batch
from nhans_tpu.models import init_variables
from nhans_tpu.nn.model import NHANSNet, freq_weighted_mse
from nhans_tpu.train.optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_state(cfg: Config, rng: jax.Array) -> Tuple[NHANSNet, TrainState, Any]:
    model, variables = init_variables(cfg, rng, train=True)
    from nhans_tpu.train.optim import make_schedule
    lr = make_schedule(cfg.train.lr, cfg.train.lr_schedule,
                       cfg.train.lr_decay_steps, cfg.train.lr_min_frac)
    tx = make_optimizer(cfg.train.alg, lr, cfg.train.mom)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return model, state, tx


def param_counts(state: TrainState) -> Tuple[int, int]:
    import numpy as np
    trainable = sum(int(np.prod(x.shape))
                    for x in jax.tree_util.tree_leaves(state.params))
    non_trainable = sum(int(np.prod(x.shape))
                        for x in jax.tree_util.tree_leaves(state.batch_stats))
    return trainable, non_trainable


def make_train_step(cfg: Config, model: NHANSNet, tx,
                    mesh=None, donate: bool = True,
                    state: "TrainState" = None,
                    use_model_axis: bool = False,
                    banked: bool = False):
    """Build the jitted train step.

    Signature: (state, raw_batch, key) -> (state, metrics) where raw_batch
    holds clean/noise_a/noise_b [B, L] waveform buffers + lengths.

    With ``banked=True`` the signature becomes
    (state, banks, idx_batch, key): ``banks`` are device-resident corpus
    arrays (data/banks.py) and ``idx_batch`` holds int32 index triples;
    the waveform rows are gathered ON DEVICE — the per-step host->device
    transfer is ~100 bytes.

    ``use_model_axis`` shards wide kernels' output channels over the
    mesh's ``model`` axis (tensor parallelism; parallel/sharding_rules) —
    pass the ``state`` template so per-leaf shardings can be constructed.
    XLA's SPMD partitioner propagates the activation shardings and inserts
    the collectives through the Inject/BN pattern (verified numerically in
    tests/test_sharding.py::test_model_axis_end_to_end).
    """
    W = cfg.model.window_frames
    # The fused Pallas spectrogram stays live under a >1-device mesh:
    # dsp/spectral.py wraps pallas_call in shard_map over the data axis
    # (utterance rows are embarrassingly parallel), so the flagship
    # kernel runs in the multi-chip training path with identical
    # numerics (tests/test_pallas_ops.py).
    from nhans_tpu.dsp.spectral import resolve_stft_impl
    stft_impl = resolve_stft_impl(cfg.audio.stft_impl)
    stft_mesh = mesh if (mesh is not None and mesh.size > 1) else None

    def _core(state: TrainState, batch: Dict[str, jnp.ndarray],
              key: jax.Array):
        ex = make_train_batch(cfg, key, batch["clean"], batch["noise_a"],
                              batch["noise_b"], batch["clean_len"],
                              batch["len_a"], batch["len_b"],
                              peaks=batch.get("peaks"),
                              stft_impl=stft_impl, mesh=stft_mesh)

        # Context-embedding jitter stream (ModelConfig.ctx_embed_noise);
        # keyed off the step key so kill/resume determinism holds.
        rngs = ({"embed_noise": jax.random.fold_in(key, 0x0e77)}
                if cfg.model.ctx_embed_noise > 0.0 else None)

        def loss_fn(params):
            res, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ex["mixed"], ex["ctx_a"], ex["ctx_b"], True,
                mutable=["batch_stats"], rngs=rngs)
            denoised = ex["mixed"][:, W // 2, :] + res
            loss, ex_loss = freq_weighted_mse(denoised, ex["target"])
            boost = cfg.train.clean_loss_boost
            if boost > 0.0:
                # Upweight windows whose central frame is already near
                # the target (high local SNR): the identity mapping's
                # natural MSE is tiny, so without this the optimizer
                # trades it away for noisy-window gains and the model
                # over-suppresses clean input at apply time
                # (config.TrainConfig.clean_loss_boost).
                d = jnp.mean(jnp.abs(ex["mixed"][:, W // 2, :]
                                     - ex["target"]), axis=-1)
                wts = 1.0 + boost * jax.nn.sigmoid(
                    (cfg.train.clean_loss_dist - d)
                    / cfg.train.clean_loss_scale)
                wts = wts / jnp.mean(wts)
                loss = jnp.mean(ex_loss * wts)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    if banked:
        def step_fn(state: TrainState, banks: Dict[str, jnp.ndarray],
                    idx: Dict[str, jnp.ndarray], key: jax.Array):
            ci, ai, bi = idx["clean_idx"], idx["a_idx"], idx["b_idx"]
            batch = {
                "clean": jnp.take(banks["speech"], ci, axis=0),
                "noise_a": jnp.take(banks["noise"], ai, axis=0),
                "noise_b": jnp.take(banks["noise"], bi, axis=0),
                "clean_len": jnp.take(banks["speech_len"], ci),
                "len_a": jnp.take(banks["noise_len"], ai),
                "len_b": jnp.take(banks["noise_len"], bi),
                "peaks": jnp.stack(
                    [jnp.take(banks["speech_peak"], ci),
                     jnp.take(banks["noise_peak"], ai),
                     jnp.take(banks["noise_peak"], bi)], axis=1),
            }
            return _core(state, batch, key)
    else:
        step_fn = _core

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = repl
    if use_model_axis:
        if state is None:
            raise ValueError("use_model_axis requires the state template")
        from nhans_tpu.parallel.sharding_rules import state_sharding
        state_sh = state_sharding(mesh, state, use_model_axis=True)
    in_sh = ((state_sh, repl, data, repl) if banked
             else (state_sh, data, repl))
    return jax.jit(
        step_fn,
        in_shardings=in_sh,
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


# NOTE: eval programs are built by train/evaluate.Evaluator (utterance-
# granular, cached per length bucket); a window-granular make_eval_step
# previously exported here was used by nothing and was removed.
