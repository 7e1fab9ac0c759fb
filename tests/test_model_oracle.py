"""Cross-framework oracle test: the flax NHANSNet with randomly
initialized parameters, exported to TF names through the compat map, must
match a literal numpy re-implementation of the reference graph.

This simultaneously validates (a) every layer's semantics (conv padding,
strides, BN eval math, the conditioning injection, head geometry) and
(b) the TF<->flax name/shape mapping used for checkpoint import.
"""

import numpy as np
import jax
import pytest

from nhans_tpu.compat.tf_import import tf_name_map, _get_in
from nhans_tpu.config import Config
from nhans_tpu.models import init_variables
from tests import reference_model as RM


@pytest.mark.slow
def test_flax_matches_numpy_reference_oracle(rng):
    cfg = Config.denoiser()
    model, variables = init_variables(cfg, jax.random.PRNGKey(7), train=True)

    # randomize BN population stats and ALL zero-init parameters so the
    # comparison exercises every path (zero conditioning would hide bugs)
    def randomize(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = randomize(v, path + (k,))
            else:
                arr = np.asarray(v, np.float64)
                out[k] = rng.standard_normal(arr.shape) * 0.05
                if k in ("pop_variance", "gamma"):
                    out[k] = np.abs(out[k]) + 0.5
        return out

    params = randomize(jax.device_get(variables["params"]))
    stats = randomize(jax.device_get(variables["batch_stats"]))

    # export to TF-named dict via the compat map
    tf_params = {}
    for tf_name, (coll, path) in tf_name_map("denoiser").items():
        src = params if coll == "params" else stats
        tf_params[tf_name] = np.asarray(_get_in(src, path), np.float64)

    mixed = rng.standard_normal((2, 35, 201)).astype(np.float32)
    ctx_a = rng.standard_normal((2, 200, 201)).astype(np.float32)
    ctx_b = rng.standard_normal((2, 200, 201)).astype(np.float32)

    ref = RM.model_forward(mixed.astype(np.float64),
                           ctx_a.astype(np.float64),
                           ctx_b.astype(np.float64), tf_params)

    fv = {"params": jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32),
                                           params),
          "batch_stats": jax.tree_util.tree_map(
              lambda x: np.asarray(x, np.float32), stats)}
    res = model.apply(fv, mixed, ctx_a, ctx_b, False)
    got = mixed[:, 17, :] + np.asarray(res)

    err = np.abs(got - ref)
    scale = np.abs(ref).max() + 1.0
    assert err.max() / scale < 2e-4, err.max()


def test_freq_pad_inference_bit_compatible(rng):
    """ModelConfig.freq_pad_to (MXU lane padding, round 5): at
    inference the padded tower must produce EXACTLY the unpadded
    model's outputs under the SAME variables — parameter shapes are
    identical, convs use explicit SAME-equivalent padding computed at
    the true frequency size, and dead columns are re-zeroed after every
    conv stage.  This is what licenses serving's freq_pad_to=256
    default on checkpoints trained without padding (cli/_app.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nhans_tpu.config import Config
    from nhans_tpu.models import build_model, init_variables

    cfg0 = Config.denoiser()
    model0, variables = init_variables(cfg0, jax.random.PRNGKey(3),
                                       train=False)
    cfg_pad = cfg0.replace(model=dataclasses.replace(
        cfg0.model, freq_pad_to=256))
    model_pad = build_model(cfg_pad)

    x = jnp.asarray(rng.standard_normal((2, 35, 201)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    y0 = model0.apply(variables, x, None, None, False,
                      emb_a=emb, emb_b=emb)
    yp = model_pad.apply(variables, x, None, None, False,
                         emb_a=emb, emb_b=emb)
    assert y0.shape == yp.shape == (2, 201)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(yp))

    # padded init must create the same parameter tree (shapes + names)
    _, v_pad = init_variables(cfg_pad, jax.random.PRNGKey(3), train=False)
    t0 = jax.tree_util.tree_map(lambda a: a.shape, variables)
    tp = jax.tree_util.tree_map(lambda a: a.shape, v_pad)
    assert t0 == tp
