"""GAIL + behavior-cloning tests (reference: gail/ package — TRPO generator
vs TransitionClassifier adversary, BC pretraining)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.algos.common import Model, build_env, evaluate
from baselines_tpu.algos.gail.behavior_clone import pretrain_bc
from baselines_tpu.algos.gail.dataset import ExpertDataset
from baselines_tpu.algos.gail.gail import learn as gail_learn
from baselines_tpu.core import logger
from baselines_tpu.nn.policy import build_policy


@pytest.fixture(autouse=True)
def quiet_logger():
    logger.configure(format_strs=[])
    yield
    logger.reset()


def _identity_expert(n=5000):
    rng = np.random.RandomState(0)
    obs = rng.uniform(-1, 1, size=(n, 1)).astype(np.float32)
    return ExpertDataset(obs=obs, acs=obs.copy())


def test_gail_imitates_identity_expert():
    ds = _identity_expert()
    model = gail_learn(
        env_id="BoxIdentity-v0",
        network="mlp",
        expert_dataset=ds,
        seed=0,
        num_envs=8,
        timesteps_per_batch=512,
        gamma=0.9,
        lam=0.97,
        max_kl=0.01,
        # the tiny identity fixture wants an aggressive discriminator
        # (reference's g_step/d_step are task hyperparameters,
        # run_mujoco.py:39-40; the MuJoCo default 3:1 generator:disc cadence
        # under-trains the disc on this 1-D problem)
        g_step=1,
        d_step=3,
        log_interval=0,
        total_timesteps=100_000,
    )
    venv = build_env("BoxIdentity-v0", 8)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(3), nsteps=300)
    assert ret > -10, f"gail identity imitation return {ret} (random ~-66)"


def test_behavior_cloning():
    ds = _identity_expert()
    venv = build_env("BoxIdentity-v0", 8)
    pol = build_policy(venv.observation_space, venv.action_space, "mlp", value_network="copy")
    params = pol.init(jax.random.PRNGKey(0), jnp.zeros((1, 1)))
    params = pretrain_bc(pol, params, ds, jax.random.PRNGKey(1), max_iters=2000, lr=1e-3)

    class _S:
        pass

    s = _S()
    s.params = params
    model = Model(pol, s)
    ret, _, _ = evaluate(model, venv, jax.random.PRNGKey(2), nsteps=300)
    assert ret > -5, f"bc identity return {ret}"


def test_gail_checkpoint_resumes_adversary(tmp_path):
    """--save_path carries the discriminator (+ its Adam state and obs_rms)
    and --load_path restores it, so a continued run does not re-initialize
    the adversary (the knockback measured in results/gail_ref_calib).  The
    reference's full-graph saver has the same property (gail/trpo_mpi.py)."""
    ds = _identity_expert()
    kwargs = dict(
        env_id="BoxIdentity-v0", network="mlp", expert_dataset=ds, seed=0,
        num_envs=8, timesteps_per_batch=512, g_step=1, d_step=2,
        log_interval=0,
    )
    model = gail_learn(total_timesteps=5 * 512, **kwargs)
    path = str(tmp_path / "gail.ckpt")
    model.save(path)

    resumed = gail_learn(total_timesteps=0, load_path=path, **kwargs)
    for field in ("d_params", "d_opt", "d_obs_rms", "vf_opt"):
        saved = jax.device_get(getattr(model.state, field))
        got = jax.device_get(getattr(resumed.state, field))
        jax.tree.map(np.testing.assert_array_equal, saved, got)
    # and the policy params round-trip as before
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.device_get(model.params),
        jax.device_get(resumed.params),
    )
