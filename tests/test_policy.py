"""Policy builder contract tests (policies.py surface) + serialization
round-trip (reference: common/tests/test_serialization.py:33-82)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.core import checkpoint as ckpt
from baselines_tpu.envs.spaces import Box, Discrete, MultiDiscrete
from baselines_tpu.nn import build_policy


@pytest.mark.parametrize("network", ["mlp", "lstm"])
@pytest.mark.parametrize(
    "ob_space,ac_space",
    [
        (Box(-1, 1, (4,)), Discrete(3)),
        (Box(-1, 1, (4,)), Box(-1.0, 1.0, (2,))),
        (Discrete(5), Discrete(3)),
        (Box(-1, 1, (4,)), MultiDiscrete([2, 3])),
    ],
)
def test_policy_shapes(key, network, ob_space, ac_space):
    pol = build_policy(ob_space, ac_space, network, nlstm=8) if network == "lstm" else build_policy(ob_space, ac_space, network)
    B = 6
    if isinstance(ob_space, Discrete):
        obs = jnp.zeros((B,), jnp.int32)
    else:
        obs = jnp.zeros((B,) + ob_space.shape)
    params = pol.init(key, obs)
    rnn = pol.initial_state(B)
    mask = jnp.zeros((B,)) if pol.is_recurrent else None
    a, v, nlp, rnn2 = pol.step(params, key, obs, rnn, mask)
    assert a.shape == (B,) + pol.pdtype.sample_shape
    assert v.shape == (B,)
    assert nlp.shape == (B,)
    assert np.all(np.isfinite(np.asarray(nlp)))


def test_value_network_copy_independent(key):
    pol = build_policy(Box(-1, 1, (3,)), Discrete(2), "mlp", value_network="copy")
    obs = jnp.ones((2, 3))
    params = pol.init(key, obs)
    names = jax.tree_util.tree_map(lambda x: x.shape, params)
    # two towers => two separate mlp param sets
    flat = jax.tree_util.tree_leaves(params)
    pol_shared = build_policy(Box(-1, 1, (3,)), Discrete(2), "mlp")
    flat_shared = jax.tree_util.tree_leaves(pol_shared.init(key, obs))
    assert len(flat) > len(flat_shared)


def test_save_load_roundtrip(key, tmp_path):
    pol = build_policy(Box(-1, 1, (4,)), Discrete(3), "mlp")
    obs = jax.random.normal(key, (5, 4))
    params = pol.init(key, obs)
    path = str(tmp_path / "params.msgpack")
    ckpt.save_state(path, params)
    # perturb then restore
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    restored = ckpt.load_state(path, jax.device_get(perturbed))
    a1, v1, _, _ = pol.step(params, key, obs)
    a2, v2, _, _ = pol.step(jax.device_put(restored), key, obs)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.allclose(np.asarray(v1), np.asarray(v2))


def test_recurrent_memory(key):
    """LSTM carry actually carries information across steps."""
    pol = build_policy(Box(-1, 1, (2,)), Discrete(2), "lstm", nlstm=8)
    obs = jnp.ones((1, 2))
    params = pol.init(key, obs)
    rnn0 = pol.initial_state(1)
    mask = jnp.zeros((1,))
    _, _, rnn1 = pol.pd(params, obs, rnn0, mask)
    pd_a, _, _ = pol.pd(params, obs, rnn0, mask)
    pd_b, _, _ = pol.pd(params, obs, rnn1, mask)
    # different carries give different logits (generically)
    assert not np.allclose(np.asarray(pd_a.logits), np.asarray(pd_b.logits))
    # mask=1 resets the carry: output equals the fresh-carry output
    pd_c, _, _ = pol.pd(params, obs, rnn1, jnp.ones((1,)))
    assert np.allclose(np.asarray(pd_a.logits), np.asarray(pd_c.logits), atol=1e-6)
