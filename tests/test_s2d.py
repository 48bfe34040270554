"""VecS2D packing + cnn_s2d equivalence with the Nature CNN.

The claim in nn/networks.py NatureCNNS2D: conv1 8x8/s4 on raw frames is a
bijective weight reshape of conv1 2x2/s1 on 4x4-space-to-depth-packed
frames (every stride-4 8x8 window covers exactly 2x2 whole blocks).  These
tests verify the packing layout and the end-to-end numerical equivalence
of the two networks under that weight bijection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baselines_tpu.nn.networks import NatureCNN, NatureCNNS2D


def ref_pack(obs, b):
    """Straightforward nested-loop packing (the spec)."""
    n, h, w, c = obs.shape
    out = np.zeros((n, h // b, w // b, b * b * c), obs.dtype)
    for i in range(h // b):
        for j in range(w // b):
            out[:, i, j, :] = obs[:, i * b : (i + 1) * b, j * b : (j + 1) * b, :].reshape(n, -1)
    return out


def test_vecs2d_pack_layout():
    from baselines_tpu.envs.vec import VecS2D

    rng = np.random.default_rng(0)
    obs = rng.integers(0, 255, (3, 8, 8, 2), dtype=np.uint8)

    class _FakeVenv:
        num_envs = 3
        observation_space = type("S", (), {"shape": (8, 8, 2), "low": 0, "high": 255, "dtype": np.uint8})()
        action_space = None

    w = VecS2D(_FakeVenv(), block=4)
    packed = np.asarray(w._pack(jnp.asarray(obs)))
    assert packed.shape == (3, 2, 2, 32)
    np.testing.assert_array_equal(packed, ref_pack(obs, 4))


def s2d_weights_from_nature(w1):
    """(8,8,4,32) conv1 kernel -> (2,2,64,32) for the packed input.

    Packed channel index = (iy*b + ix)*C + c for in-block offset (iy, ix)
    and original channel c; block index (by, bx) becomes the 2x2 kernel
    position."""
    kh, kw, c, o = w1.shape
    b = 4
    w = np.asarray(w1).reshape(kh // b, b, kw // b, b, c, o)  # (by,iy,bx,ix,c,o)
    w = w.transpose(0, 2, 1, 3, 4, 5)  # (by,bx,iy,ix,c,o)
    return jnp.asarray(w.reshape(kh // b, kw // b, b * b * c, o))


@pytest.mark.parametrize("dtype", ["float32"])
def test_cnn_s2d_equivalence(dtype):
    key = jax.random.PRNGKey(0)
    obs = jax.random.randint(key, (4, 84, 84, 4), 0, 255, jnp.int32).astype(jnp.uint8)

    cnn = NatureCNN()
    params = cnn.init(key, obs)
    out_ref = cnn.apply(params, obs)

    packed = jnp.asarray(ref_pack(np.asarray(obs), 4))
    s2d = NatureCNNS2D()
    s2d.init(key, packed)  # shape check only; weights come from the graft
    new_c1 = {
        "kernel": s2d_weights_from_nature(params["params"]["c1"]["kernel"]),
        "bias": params["params"]["c1"]["bias"],
    }
    grafted = {
        "params": {
            **{k: params["params"][k] for k in ("c2", "c3", "fc1")},
            "c1": new_c1,
        }
    }
    out_s2d = s2d.apply(grafted, packed)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_s2d), rtol=1e-5, atol=1e-5)


def test_build_env_s2d_chain():
    """build_env(s2d=4) produces packed obs and a matching obs space."""
    from baselines_tpu.algos.common import build_env

    venv = build_env("AtariSim-v0", 2, s2d=4)
    assert venv.observation_space.shape == (21, 21, 64)
    obs, state = venv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 21, 21, 64) and obs.dtype == jnp.uint8
    obs2, state, rew, done, _ = venv.step(
        jax.random.PRNGKey(1), state, jnp.zeros((2,), jnp.int32)
    )
    assert obs2.shape == (2, 21, 21, 64)


def test_flat_pack_matches_3d_pack():
    """VecS2D(flat=True) rows are exactly the flattened 3-D packing, and the
    cnn_s2d net with packed_shape produces identical outputs on them."""
    from baselines_tpu.envs.vec import VecS2D

    rng = np.random.default_rng(1)
    obs = rng.integers(0, 255, (3, 8, 8, 2), dtype=np.uint8)

    class _FakeVenv:
        num_envs = 3
        observation_space = type(
            "S", (), {"shape": (8, 8, 2), "low": 0, "high": 255, "dtype": np.uint8}
        )()
        action_space = None

    w3 = VecS2D(_FakeVenv(), block=4)
    wf = VecS2D(_FakeVenv(), block=4, flat=True)
    p3 = np.asarray(w3._pack(jnp.asarray(obs)))
    pf = np.asarray(wf._pack(jnp.asarray(obs)))
    np.testing.assert_array_equal(pf, p3.reshape(3, -1))
    assert wf.observation_space.shape == (2 * 2 * 32,)
    assert wf.observation_space.packed_shape == (2, 2, 32)

    net3 = NatureCNNS2D()
    netf = NatureCNNS2D(packed_shape=(2, 2, 32))
    params = net3.init(jax.random.PRNGKey(0), jnp.asarray(p3))
    out3 = net3.apply(params, jnp.asarray(p3))
    outf = netf.apply(params, jnp.asarray(pf))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(outf), rtol=1e-6)
