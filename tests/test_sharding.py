"""Mesh + sharding-rule tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nhans_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     replicated_sharding, shard_batch)
from nhans_tpu.parallel.sharding_rules import (param_sharding_rules,
                                               state_sharding)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m2 = make_mesh(data=4, model=2)
    assert m2.shape["data"] == 4 and m2.shape["model"] == 2
    m3 = make_mesh(data=2)
    assert m3.shape["data"] == 2


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(data=8)
    batch = {"x": np.zeros((16, 64), np.float32)}
    placed = shard_batch(mesh, batch)
    sh = placed["x"].sharding
    assert sh.spec == P("data")
    # each device holds 16/8 = 2 rows
    assert placed["x"].addressable_shards[0].data.shape == (2, 64)


def test_param_rules_shard_wide_kernels_only():
    mesh = make_mesh(data=4, model=2)
    params = {
        "conv_small": {"w": jnp.zeros((4, 4, 1, 64)), "b": jnp.zeros((64,))},
        "conv_wide": {"w": jnp.zeros((3, 3, 256, 512)),
                      "b": jnp.zeros((512,))},
        "dense_wide": {"w": jnp.zeros((512, 512))},
        "odd": {"w": jnp.zeros((10, 511))},  # not divisible -> replicated
    }
    rules = param_sharding_rules(mesh, params)
    assert rules["conv_small"]["w"].spec == P()
    assert rules["conv_wide"]["w"].spec == P(None, None, None, "model")
    assert rules["conv_wide"]["b"].spec == P()
    assert rules["dense_wide"]["w"].spec == P(None, "model")
    assert rules["odd"]["w"].spec == P()
    # model axis of size 1 -> everything replicated
    rules1 = param_sharding_rules(make_mesh(data=8), params)
    assert rules1["conv_wide"]["w"].spec == P()


def test_state_sharding_default_replicated():
    mesh = make_mesh(data=8)
    state = {"params": {"w": jnp.zeros((4, 4))}, "step": jnp.zeros(())}
    sh = state_sharding(mesh, state)
    assert all(s.spec == P() for s in jax.tree_util.tree_leaves(sh))


def test_psum_over_mesh():
    """Sanity: a jitted global mean over a data-sharded batch equals the
    host mean (XLA inserts the psum)."""
    mesh = make_mesh(data=8)
    x = np.arange(32, dtype=np.float32).reshape(32, 1)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(lambda v: jnp.mean(v),
                  out_shardings=replicated_sharding(mesh))(xs)
    assert float(out) == x.mean()
