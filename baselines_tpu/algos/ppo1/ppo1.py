"""PPO1 — first-generation PPO (baselines/ppo1/pposgd_simple.py parity).

The reference ships ppo1 as a separate, older codebase (own MlpPolicy,
MpiAdam, Dataset minibatcher — pposgd_simple.py:80-217).  Its update rule
differs from ppo2 in four ways, all implemented here on the shared fused
TPU machinery (algos/ppo/ppo.py) rather than by duplicating the runtime:

1. advantages are standardized once over the WHOLE actor batch
   ("atarg = (atarg - atarg.mean()) / atarg.std()" after the rollout),
   not per minibatch  -> adv_norm='batch'.
2. the value loss is a plain MSE — no value clipping existed in first-gen
   PPO ("vf_loss = U.mean(tf.square(pi.vpred - atarg_ret))")
   -> clip_value=False, and vf_coef=2.0 cancels the shared 1/2 factor so
   the objective is pol_surr + pol_entpen + vf_loss exactly.
3. one lrmult anneals BOTH the Adam stepsize and the clip range
   (clip_param * lrmult; schedule='linear' decays to 0 over training,
   'constant' keeps 1.0 — pposgd_simple.py:116-124,162-165).
4. plain Adam with adam_epsilon=1e-5 and NO gradient-norm clipping
   (MpiAdam had none)  -> max_grad_norm=None.

Hyperparameter names follow pposgd_simple.learn: timesteps_per_actorbatch,
clip_param, entcoeff, optim_epochs, optim_stepsize, optim_batchsize,
schedule.  The ppo2-style names also work (they are passed through), so
`--alg=ppo1` accepts either vocabulary from the CLI kwargs pipe.
"""

from __future__ import annotations

from baselines_tpu.algos.ppo import ppo


def learn(
    *,
    env=None,
    env_id: str | None = None,
    network: str = "mlp",
    total_timesteps: int,
    seed: int | None = None,
    num_envs: int = 1,
    timesteps_per_actorbatch: int = 256,
    clip_param: float = 0.2,
    entcoeff: float = 0.0,
    optim_epochs: int = 4,
    optim_stepsize: float = 1e-3,
    optim_batchsize: int = 64,
    gamma: float = 0.99,
    lam: float = 0.95,
    schedule: str = "constant",
    adam_epsilon: float = 1e-5,
    **kwargs,
):
    """pposgd_simple.learn(env, policy_fn, ...) analog returning a Model.

    timesteps_per_actorbatch is the TOTAL batch per update (the reference
    runs one env per MPI rank; here the vec env splits it across num_envs).
    """
    assert schedule in ("constant", "linear"), schedule
    nsteps = max(timesteps_per_actorbatch // max(num_envs, 1), 1)
    nbatch = nsteps * max(num_envs, 1)
    nminibatches = max(nbatch // optim_batchsize, 1)

    if schedule == "linear":
        lr = lambda f: optim_stepsize * f
        cliprange = lambda f: clip_param * f
    else:
        lr = optim_stepsize
        cliprange = clip_param

    kwargs.setdefault("lr", lr)
    kwargs.setdefault("cliprange", cliprange)
    kwargs.setdefault("nsteps", nsteps)
    kwargs.setdefault("nminibatches", nminibatches)
    kwargs.setdefault("noptepochs", optim_epochs)
    kwargs.setdefault("ent_coef", entcoeff)
    # vf_coef=2.0 cancels the shared loss's 1/2 — ppo1's objective adds the
    # raw MSE; max_grad_norm=None — MpiAdam never clipped gradients
    kwargs.setdefault("vf_coef", 2.0)
    kwargs.setdefault("max_grad_norm", None)

    return ppo.learn(
        env=env,
        env_id=env_id,
        network=network,
        total_timesteps=total_timesteps,
        seed=seed,
        num_envs=num_envs,
        gamma=gamma,
        lam=lam,
        adv_norm="batch",
        clip_value=False,
        adam_epsilon=adam_epsilon,
        **kwargs,
    )
