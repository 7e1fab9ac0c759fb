"""Architecture tests: shapes, analytic parameter count, BN semantics,
zero-init conditioning, shared context tower."""

import numpy as np
import jax
import jax.numpy as jnp

from nhans_tpu.config import Config
from nhans_tpu.models import build_model, init_variables
from nhans_tpu.nn.blocks import BatchNorm
from nhans_tpu.nn.model import Inject, freq_weighted_mse, freq_loss_weights


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def analytic_param_count():
    """Independent re-derivation of the reference graph's trainable
    parameter count (reference main.py:98-256, blocks.py:23-108)."""
    total = 0

    def conv(kh, kw, cin, cout, bias):
        return kh * kw * cin * cout + (cout if bias else 0)

    def bn(c):
        return 2 * c  # beta, gamma (pop stats are non-trainable)

    def cont_embed(cout):  # 1->50->50->cout MLP with 2 BNs, no biases
        return 1 * 50 + bn(50) + 50 * 50 + bn(50) + 50 * cout

    def inject(cout):  # two 512->cout proj (with bias) + time/freq MLPs
        return 2 * (512 * cout + cout) + 2 * cont_embed(cout)

    # Context tower: 4 blocks, shared between both contexts -> counted once
    cin = 1
    for (kh, kw), _, cout in [((8, 4), (3, 2), 64), ((8, 4), (3, 2), 128),
                              ((4, 4), (1, 1), 256), ((4, 4), (1, 2), 512)]:
        total += conv(kh, kw, cin, cout, False) + bn(cout)      # conv1+bn
        total += conv(kh, kw, cout, cout, True)                 # conv2
        if cin != cout:
            total += conv(1, 1, cin, cout, True)                # transform
        total += bn(cout)                                       # bn_out
        cin = cout

    # Main tower: 8 conditional blocks
    cin = 1
    for k, s, cout in [(4, 1, 64), (4, 1, 64), (4, 2, 128), (4, 1, 128),
                       (3, 2, 256), (3, 1, 256), (3, 2, 512), (3, 1, 512)]:
        total += conv(k, k, cin, cout, False) + inject(cout) + bn(cout)
        total += conv(k, k, cout, cout, True) + inject(cout)
        if cin != cout:
            total += conv(1, 1, cin, cout, True)
        total += bn(cout)
        cin = cout

    # Head: ts=5 after strides 1,1,2,1,2,1,2,1 on 35 frames; f=26 bins
    total += conv(5, 1, 512, 512, False) + bn(512)
    total += (26 * 512) * 201 + 201
    return total


def test_forward_shapes_and_param_count():
    cfg = Config.denoiser()
    model, variables = init_variables(cfg, jax.random.PRNGKey(0))
    mixed = jnp.zeros((2, 35, 201))
    ctx = jnp.zeros((2, 200, 201))
    res, mutated = model.apply(variables, mixed, ctx, ctx, True,
                               mutable=["batch_stats"])
    assert res.shape == (2, 201)
    assert _count(variables["params"]) == analytic_param_count()
    # batch_stats must exist and have been threaded
    assert "batch_stats" in mutated


def test_init_conditioning_is_noop():
    """All conditioning projections are zero-initialised (reference
    main.py:136,142,146: w_std=0 + zero bias), so Inject(x) == x at init."""
    m = Inject(features=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 6, 8)),
                    jnp.float32)
    emb = jnp.ones((2, 512), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, emb, emb, False)
    y = m.apply(v, x, emb, emb, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_context_tower_shared():
    cfg = Config.denoiser()
    model, variables = init_variables(cfg, jax.random.PRNGKey(0))
    # exactly one 'embedding' subtree: both tower calls share parameters
    # (reference main.py:204 variable_scope reuse=True)
    names = list(variables["params"].keys())
    assert names.count("embedding") == 1
    ctx_a = jnp.asarray(np.random.default_rng(1).standard_normal((1, 200, 201)),
                        jnp.float32)
    res1 = model.apply(variables, jnp.zeros((1, 35, 201)), ctx_a,
                       jnp.zeros((1, 200, 201)), False)
    res2 = model.apply(variables, jnp.zeros((1, 35, 201)),
                       jnp.zeros((1, 200, 201)), ctx_a, False)
    # swapping which slot the context is fed into gives different outputs
    # only via the (zero-init) projections; at init both are equal
    np.testing.assert_allclose(np.asarray(res1), np.asarray(res2), atol=1e-4)


def test_batchnorm_semantics(rng):
    """BN: biased batch moments over all-but-last axes, EMA decay 0.95,
    eps 1e-3, update-on-forward (reference blocks.py:89-108)."""
    x = rng.standard_normal((4, 3, 5)).astype(np.float32) * 2 + 1
    bnm = BatchNorm(decay=0.95, eps=1e-3)
    v = bnm.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    y, mut = bnm.apply(v, jnp.asarray(x), True, mutable=["batch_stats"])
    mean = x.reshape(-1, 5).mean(0)
    var = x.reshape(-1, 5).var(0)
    np.testing.assert_allclose(
        np.asarray(y), (x - mean) / np.sqrt(var + 1e-3), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["pop_mean"]),
        0.95 * 0.0 + 0.05 * mean, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["pop_variance"]),
        0.95 * 1.0 + 0.05 * var, atol=1e-5)
    # eval mode uses population stats
    v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    y2 = bnm.apply(v2, jnp.asarray(x), False)
    pm = np.asarray(mut["batch_stats"]["pop_mean"])
    pv = np.asarray(mut["batch_stats"]["pop_variance"])
    np.testing.assert_allclose(
        np.asarray(y2), (x - pm) / np.sqrt(pv + 1e-3), atol=1e-4)


def test_freq_weighted_mse():
    w = np.asarray(freq_loss_weights(201))
    assert w[0] == 2.0 and w[-1] == 1.0
    d = jnp.ones((3, 201))
    t = jnp.zeros((3, 201))
    loss, ex = freq_weighted_mse(d, t)
    np.testing.assert_allclose(float(loss), w.mean(), rtol=1e-6)
    assert ex.shape == (3,)


def test_trunc_normal_init_range():
    from nhans_tpu.nn.blocks import trunc_normal
    w = trunc_normal(0.01)(jax.random.PRNGKey(0), (1000,))
    assert np.all(np.abs(np.asarray(w)) <= 0.02 + 1e-7)
    assert 0.005 < np.std(np.asarray(w)) < 0.012
