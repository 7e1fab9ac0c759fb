"""Optimizer-zoo parity tests: each --alg choice must reproduce the TF1
optimizer's update math with the reference's (default) hyper-parameters
(reference main.py:405-416).  Every case runs two analytic steps on a
known gradient and compares against the TF1 formulas computed in numpy:

* GradientDescent:  theta -= lr * g
* Momentum:         acc = mom*acc + g;  theta -= lr*acc
* RMSProp:          ms = d*ms + (1-d)*g^2  (ms INITIALIZED TO ONES);
                    mom = m*mom + lr*g/sqrt(ms + eps);  theta -= mom
* Adadelta:         acc = rho*acc + (1-rho)*g^2;
                    upd = g*sqrt(accu + eps)/sqrt(acc + eps);
                    accu = rho*accu + (1-rho)*upd^2;  theta -= lr*upd
* Adagrad:          acc += g^2  (acc INITIALIZED TO 0.1);
                    theta -= lr*g/sqrt(acc)
* Adam:             lr_t = lr*sqrt(1-b2^t)/(1-b1^t);
                    m = b1*m + (1-b1)*g;  v = b2*v + (1-b2)*g^2;
                    theta -= lr_t*m/(sqrt(v) + eps)

No model, no TPU; pure numpy vs optax on small tensors.
"""

import numpy as np
import pytest

from nhans_tpu.train.optim import make_optimizer

LR = 0.05
G1 = np.asarray([0.3, -1.2, 0.0, 2.5], np.float32)
G2 = np.asarray([-0.7, 0.4, 1.1, -0.2], np.float32)
THETA0 = np.asarray([1.0, -2.0, 0.5, 0.0], np.float32)


def run_optax(alg, mom=0.0, steps=(G1, G2)):
    import jax.numpy as jnp
    import optax

    tx = make_optimizer(alg, LR, mom)
    params = {"w": jnp.asarray(THETA0)}
    state = tx.init(params)
    for g in steps:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["w"])


def test_sgd():
    want = THETA0 - LR * G1 - LR * G2
    np.testing.assert_allclose(run_optax("sgd"), want, rtol=1e-6)


def test_momentum():
    mom = 0.9
    acc = np.zeros_like(THETA0)
    theta = THETA0.copy()
    for g in (G1, G2):
        acc = mom * acc + g
        theta = theta - LR * acc
    np.testing.assert_allclose(run_optax("momentum", mom=mom), theta,
                               rtol=1e-6)


def test_rmsprop_tf_defaults():
    # tf.train.RMSPropOptimizer: decay 0.9, momentum 0, eps 1e-10,
    # ms initialized to ONES (not zeros), eps added INSIDE the sqrt
    d, eps = 0.9, 1e-10
    ms = np.ones_like(THETA0, np.float64)
    theta = THETA0.astype(np.float64)
    for g in (G1, G2):
        g = g.astype(np.float64)
        ms = d * ms + (1 - d) * g * g
        theta = theta - LR * g / np.sqrt(ms + eps)
    np.testing.assert_allclose(run_optax("rmsprop"), theta, rtol=1e-5)


def test_adadelta_tf_defaults():
    # tf.train.AdadeltaOptimizer: rho 0.95, eps 1e-8
    rho, eps = 0.95, 1e-8
    acc = np.zeros_like(THETA0, np.float64)
    accu = np.zeros_like(THETA0, np.float64)
    theta = THETA0.astype(np.float64)
    for g in (G1, G2):
        g = g.astype(np.float64)
        acc = rho * acc + (1 - rho) * g * g
        upd = g * np.sqrt(accu + eps) / np.sqrt(acc + eps)
        accu = rho * accu + (1 - rho) * upd * upd
        theta = theta - LR * upd
    np.testing.assert_allclose(run_optax("adadelta"), theta, rtol=1e-5)


def test_adagrad_tf_defaults():
    # tf.train.AdagradOptimizer: initial accumulator 0.1, no epsilon
    acc = np.full_like(THETA0, 0.1, np.float64)
    theta = THETA0.astype(np.float64)
    for g in (G1, G2):
        g = g.astype(np.float64)
        acc = acc + g * g
        theta = theta - LR * g / np.sqrt(acc)
    np.testing.assert_allclose(run_optax("adagrad"), theta, rtol=1e-5)


def test_adam_tf_defaults():
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = np.zeros_like(THETA0, np.float64)
    v = np.zeros_like(THETA0, np.float64)
    theta = THETA0.astype(np.float64)
    for t, g in enumerate((G1, G2), start=1):
        g = g.astype(np.float64)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = LR * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        theta = theta - lr_t * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(run_optax("adam"), theta, rtol=1e-5)


def test_unknown_alg_raises():
    with pytest.raises(ValueError):
        make_optimizer("lion", 1e-3)
