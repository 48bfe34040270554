"""Network zoo — parity with baselines/common/models.py.

Registered names (reference locations): mlp (models.py:74-103), cnn = Nature
DQN CNN (:15-26,106-110), impala_cnn (:28-71,112-116), cnn_small (:118-129),
conv_only (:221-249), lstm / cnn_lstm / lnlstm variants (:131-218).

All dense/conv layers use orthogonal initialization with the reference's
scale conventions (a2c/utils.py:20-56: hidden layers sqrt(2) for relu
stacks).  Image inputs are uint8 and divided by 255 on device inside the
network (models.py:19), keeping the HBM-resident rollout buffers at 1
byte/pixel — 4x less bandwidth than shipping f32 frames.

Recurrent networks follow a functional-carry protocol so they unroll under
``lax.scan``: ``net(x, carry, mask) -> (latent, carry)`` with
``initial_state(batch)``, where mask=1 at the first step of a new episode
zeroes the carry (the ``c*(1-m)`` masking of a2c/utils.py:88-91).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from baselines_tpu.core.registry import Registry

_NETWORKS: Registry[Callable[..., Any]] = Registry("network")

ortho = nn.initializers.orthogonal


def register(name):
    return _NETWORKS.register(name)


def get_network(name: str, **kwargs):
    """models.get_network_builder analog (models.py:257-275); also accepts a
    ready-made module or factory.  ``dtype`` may be a string (e.g. the CLI's
    --dtype=bfloat16) and is canonicalized here."""
    if isinstance(kwargs.get("dtype"), str):
        kwargs["dtype"] = jnp.dtype(kwargs["dtype"])
    if callable(name):
        return name(**kwargs) if not isinstance(name, nn.Module) else name
    return _NETWORKS.get(name)(**kwargs)


def network_names():
    return _NETWORKS.names()


def _to_float(x):
    """uint8 images → f32/255 in-graph (models.py:19)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


@register("mlp")
class MLP(nn.Module):
    """Stack of fully-connected layers (models.py:74-103).

    ``dtype`` is the compute dtype (mixed precision): parameters stay f32,
    matmuls run in ``dtype`` (bf16 feeds the MXU at 2x f32 throughput), and
    the returned latent is cast back to f32 so the distribution/value heads
    and the loss are always full precision."""

    num_layers: int = 2
    num_hidden: int = 64
    activation: Callable = jnp.tanh
    layer_norm: bool = False
    dtype: Any = jnp.float32

    is_recurrent = False

    @nn.compact
    def __call__(self, x):
        h = _to_float(x).reshape((x.shape[0], -1)).astype(self.dtype)
        for i in range(self.num_layers):
            h = nn.Dense(self.num_hidden, dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name=f"mlp_fc{i}")(h)
            if self.layer_norm:
                h = nn.LayerNorm(dtype=self.dtype)(h)
            h = self.activation(h)
        return h.astype(jnp.float32)


@register("cnn")
class NatureCNN(nn.Module):
    """The Nature DQN convnet (models.py:15-26).  ``dtype``: see MLP."""

    dtype: Any = jnp.float32

    is_recurrent = False

    @nn.compact
    def __call__(self, x):
        h = _to_float(x).astype(self.dtype)
        h = nn.relu(nn.Conv(32, (8, 8), (4, 4), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="c1")(h))
        h = nn.relu(nn.Conv(64, (4, 4), (2, 2), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="c2")(h))
        h = nn.relu(nn.Conv(64, (3, 3), (1, 1), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="c3")(h))
        h = h.reshape((h.shape[0], -1))
        return nn.relu(nn.Dense(512, dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="fc1")(h)).astype(jnp.float32)


@register("cnn_s2d")
class NatureCNNS2D(nn.Module):
    """Nature CNN consuming space-to-depth-packed observations
    (envs/vec.py VecS2D: 84x84x4 -> 21x21x64 uint8).

    Functionally EQUIVALENT to NatureCNN on the unpacked frames: conv1
    8x8/s4 at stride 4 covers exactly 2x2 of the 4x4 blocks, so its weight
    tensor (8,8,4,32) is a bijective reshape of this conv1's (2,2,64,32) —
    same function class, same orthogonal-init distribution (ortho over the
    identical fan-in of 256).  The packed layout keeps the channel (lane)
    dimension at 64/32/64 everywhere, which is what the TPU's (8,128)
    tiling wants; measured 29% faster fwd+bwd than the C=4 original on a
    v5e.  Reference semantics: models.py:15-26.

    packed_shape: when the env delivers each packed frame as a FLAT row
    (VecS2D flat=True — avoids the 2.3x tile-padding of small-channel 3-D
    uint8 layouts in HBM), this is the (h, w, c) to unflatten to; the
    reshape fuses into the uint8 cast below at zero cost."""

    dtype: Any = jnp.float32
    packed_shape: tuple | None = None

    is_recurrent = False

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            assert self.packed_shape is not None, (
                "flat packed obs need packed_shape (set by build_policy from "
                "the env's observation_space)"
            )
            x = x.reshape((x.shape[0],) + tuple(self.packed_shape))
        h = _to_float(x).astype(self.dtype)
        h = nn.relu(nn.Conv(32, (2, 2), (1, 1), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="c1")(h))
        h = nn.relu(nn.Conv(64, (4, 4), (2, 2), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="c2")(h))
        h = nn.relu(nn.Conv(64, (3, 3), (1, 1), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="c3")(h))
        h = h.reshape((h.shape[0], -1))
        return nn.relu(nn.Dense(512, dtype=self.dtype, kernel_init=ortho(np.sqrt(2)), name="fc1")(h)).astype(jnp.float32)


@register("cnn_small")
class CNNSmall(nn.Module):
    """models.py:118-129."""

    is_recurrent = False

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _to_float(x).astype(self.dtype)
        h = nn.relu(nn.Conv(8, (8, 8), (4, 4), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)))(h))
        h = nn.relu(nn.Conv(16, (4, 4), (2, 2), padding="VALID", dtype=self.dtype, kernel_init=ortho(np.sqrt(2)))(h))
        h = h.reshape((h.shape[0], -1))
        return nn.relu(nn.Dense(128, dtype=self.dtype, kernel_init=ortho(np.sqrt(2)))(h)).astype(jnp.float32)


class _ImpalaResBlock(nn.Module):
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.depth, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.depth, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return h + x


@register("impala_cnn")
class ImpalaCNN(nn.Module):
    """IMPALA deep residual convnet (models.py:28-71).  ``dtype``: see MLP."""

    depths: Sequence[int] = (16, 32, 32)
    dtype: Any = jnp.float32

    is_recurrent = False

    @nn.compact
    def __call__(self, x):
        h = _to_float(x).astype(self.dtype)
        for depth in self.depths:
            h = nn.Conv(depth, (3, 3), padding="SAME", dtype=self.dtype)(h)
            h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
            h = _ImpalaResBlock(depth, dtype=self.dtype)(h)
            h = _ImpalaResBlock(depth, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = h.reshape((h.shape[0], -1))
        return nn.relu(nn.Dense(256, dtype=self.dtype)(h)).astype(jnp.float32)


@register("conv_only")
class ConvOnly(nn.Module):
    """Conv stack without a dense head (models.py:221-249); used by deepq
    with its own hiddens on top.  ``dtype``: see MLP (output latent stays
    f32 for the downstream q-head)."""

    convs: Sequence[tuple] = ((32, 8, 4), (64, 4, 2), (64, 3, 1))
    dtype: Any = jnp.float32

    is_recurrent = False

    @nn.compact
    def __call__(self, x):
        h = _to_float(x).astype(self.dtype)
        for num_outputs, kernel, stride in self.convs:
            h = nn.relu(
                nn.Conv(num_outputs, (kernel, kernel), (stride, stride), padding="VALID", dtype=self.dtype)(h)
            )
        return h.astype(jnp.float32)


# ---------------------------------------------------------------------------
# recurrent networks


class LSTMCell(nn.Module):
    """The reference's hand-rolled LSTM step (a2c/utils.py:81-102): carry is
    concat(h, c); episode-start mask zeroes both before the step."""

    nlstm: int = 128
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, carry, mask):
        h, c = jnp.split(carry, 2, axis=-1)
        m = mask.reshape((-1, 1)).astype(h.dtype)
        h = h * (1.0 - m)
        c = c * (1.0 - m)
        xw = nn.Dense(4 * self.nlstm, use_bias=False, kernel_init=ortho(1.0), name="wx")(x)
        hw = nn.Dense(4 * self.nlstm, use_bias=False, kernel_init=ortho(1.0), name="wh")(h)
        b = self.param("b", nn.initializers.zeros, (4 * self.nlstm,))
        if self.layer_norm:
            xw = nn.LayerNorm(name="ln_x")(xw)
            hw = nn.LayerNorm(name="ln_h")(hw)
        z = xw + hw + b
        i, f, o, u = jnp.split(z, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f)
        o = nn.sigmoid(o)
        u = jnp.tanh(u)
        c = f * c + i * u
        c_out = nn.LayerNorm(name="ln_c")(c) if self.layer_norm else c
        h = o * jnp.tanh(c_out)
        return h, jnp.concatenate([h, c], axis=-1)


class RecurrentNetwork(nn.Module):
    """encoder -> LSTM; call signature (x, carry, mask) -> (latent, carry)."""

    encoder: Any  # nn.Module or None (flatten input)
    nlstm: int = 128
    layer_norm: bool = False

    is_recurrent = True

    def initial_state(self, batch_size: int):
        return jnp.zeros((batch_size, 2 * self.nlstm), jnp.float32)

    @nn.compact
    def __call__(self, x, carry, mask):
        if self.encoder is not None:
            h = self.encoder(x)
        else:
            h = _to_float(x).reshape((x.shape[0], -1))
        h, carry = LSTMCell(self.nlstm, self.layer_norm, name="lstm")(h, carry, mask)
        return h, carry


@register("lstm")
def lstm(nlstm: int = 128, layer_norm: bool = False):
    """models.py:131-183: flattened obs straight into the LSTM."""
    return RecurrentNetwork(encoder=None, nlstm=nlstm, layer_norm=layer_norm)


@register("lnlstm")
def lnlstm(nlstm: int = 128):
    return RecurrentNetwork(encoder=None, nlstm=nlstm, layer_norm=True)


@register("cnn_lstm")
def cnn_lstm(nlstm: int = 128, layer_norm: bool = False, **conv_kwargs):
    """models.py:186-210."""
    return RecurrentNetwork(encoder=NatureCNN(**conv_kwargs), nlstm=nlstm, layer_norm=layer_norm)


@register("cnn_lnlstm")
def cnn_lnlstm(nlstm: int = 128, **conv_kwargs):
    return RecurrentNetwork(encoder=NatureCNN(**conv_kwargs), nlstm=nlstm, layer_norm=True)


@register("impala_cnn_lstm")
def impala_cnn_lstm(nlstm: int = 256, **kwargs):
    return RecurrentNetwork(encoder=ImpalaCNN(**kwargs), nlstm=nlstm)
