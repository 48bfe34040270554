"""ACKTR learning tests (reference: test_identity.py/test_cartpole.py acktr
rows) — exercises the dense K-FAC optimizer end to end."""

import jax
import pytest

from baselines_tpu.algos.acktr.acktr import learn
from baselines_tpu.algos.common import build_env, evaluate
from baselines_tpu.core import logger


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def test_acktr_discrete_identity():
    model = learn(
        env_id="DiscreteIdentity-v0",
        network="mlp",
        total_timesteps=60_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        gamma=0.9,
        log_interval=0,
    )
    venv = build_env("DiscreteIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > 90, f"acktr identity mean return {ret}"


def test_acktr_cartpole():
    model = learn(
        env_id="CartPole-v1",
        network="mlp",
        total_timesteps=300_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        log_interval=0,
    )
    venv = build_env("CartPole-v1", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=600)
    assert ret >= 150, f"acktr cartpole mean return {ret}"


def test_acktr_continuous_identity():
    model = learn(
        env_id="BoxIdentity-v0",
        network="mlp",
        total_timesteps=60_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        gamma=0.9,
        lr=0.1,
        log_interval=0,
    )
    venv = build_env("BoxIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > -20, f"acktr box identity mean return {ret}"


def test_acktr_cnn_image_identity():
    """Conv K-FAC (KFC factors) end to end — the reference runs acktr with
    the Nature CNN on Atari (acktr/acktr.py:95 network kwarg); this is the
    CNN-policy learning check on the MnistEnv-analog image fixture."""
    model = learn(
        env_id="ImageIdentity-v0",
        network="cnn_small",
        total_timesteps=40_000,
        seed=0,
        num_envs=8,
        nsteps=20,
        gamma=0.9,
        kfac_update=4,
        log_interval=0,
    )
    venv = build_env("ImageIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(1), nsteps=300)
    assert ret > 90, f"acktr cnn image identity mean return {ret}"


def test_kfac_conv_precondition_identity_factors():
    """With identity Kronecker factors, F⁻¹g must equal g/(1+eps) for conv
    kernels too (layout round-trip through the (cin·k², cout) factor space)."""
    import jax.numpy as jnp

    from baselines_tpu.algos.acktr.acktr import KfacPolicyNet
    from baselines_tpu.algos.acktr.kfac import init_kfac
    from baselines_tpu.envs.registry import make_env

    env = make_env("ImageIdentity-v0")
    net = KfacPolicyNet(env.observation_space, env.action_space, "cnn_small")
    params = net.init(jax.random.PRNGKey(0))
    kfac = init_kfac(net.layer_dims, params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    lg = net.layer_grads(grads)
    eps = 0.25
    precond = net.precondition(kfac.layers, lg, eps)
    for (pW, pb), (gW, gb) in zip(precond, lg):
        assert pW.shape == gW.shape and pb.shape == gb.shape
        assert jnp.allclose(pW, gW / (1 + eps), atol=1e-5)
        assert jnp.allclose(pb, gb / (1 + eps), atol=1e-5)


def test_kfac_conv_patch_stats_shapes():
    """layer_stats emits (N, cin·k²)/(N, cout) rows for conv layers with
    N = batch × out-locations, matching the allocated factor dims."""
    import jax.numpy as jnp

    from baselines_tpu.algos.acktr.acktr import KfacPolicyNet
    from baselines_tpu.envs.registry import make_env

    env = make_env("ImageIdentity-v0")
    net = KfacPolicyNet(env.observation_space, env.action_space, "cnn_small")
    params = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((6,) + env.observation_space.shape)
    _, _, acts = net.forward(params, obs)
    ds = net.zero_taps(6)
    rows = net.layer_stats(acts, ds)
    for spec, (a2d, g2d) in zip(net.specs, rows):
        fdin, fdout = spec.factor_dims
        assert a2d.shape[1] == fdin and g2d.shape[1] == fdout
        assert a2d.shape[0] == g2d.shape[0]
        if spec.kind == "conv":
            assert a2d.shape[0] == 6 * spec.hout * spec.wout


def test_kfac_net_cnn_s2d_geometry():
    """acktr's K-FAC net accepts the s2d-packed Nature geometry: 2x2/s1 +
    4x4/s2 + 3x3/s1 on 21x21x64 ends at the same 7x7x64 -> 3136 -> 512
    trunk as the unpacked Nature stack (nn/networks.py NatureCNNS2D)."""
    import jax
    import jax.numpy as jnp

    from baselines_tpu.algos.acktr.acktr import KfacPolicyNet
    from baselines_tpu.envs.spaces import Box, Discrete
    import numpy as np

    net = KfacPolicyNet(
        Box(0, 255, (21, 21, 64), np.uint8), Discrete(6), network="cnn_s2d"
    )
    # conv specs end at 7x7x64; the first dense is 3136 -> 512
    dense = [s for s in net.specs if s.kind == "dense"]
    assert dense[0].din == 7 * 7 * 64 and dense[0].dout == 512
    params = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((8, 21, 21, 64), jnp.uint8)
    pdflat, vf, _ = net.forward(params, obs)
    assert pdflat.shape == (8, 6)
    assert vf.shape == (8,)
