"""K-FAC (Kronecker-factored approximate curvature) for dense-layer policy
networks — the JAX rebuild of baselines/acktr/kfac.py (928 lines of TF graph
surgery).

The reference scrapes the TF graph to find layer factors (kfac.py:58-181),
accumulates EMA statistics of layer inputs aaᵀ and pre-activation gradients
ggᵀ (:183-511), eigendecomposes asynchronously in queue-runner threads
(:512-616), preconditions gradients factor-wise, clips the update by a KL
trust radius, and applies momentum SGD with a cold-start plain-SGD phase
(:618-922).

Here factor registration is EXPLICIT — the acktr policy network (see
acktr.py KfacMLPPolicy) returns the per-dense-layer (input, pre-activation)
pairs alongside its outputs — and everything (stats EMA, eigendecomp,
preconditioning, KL clip, momentum) is pure jitted math.  Eigendecomps are
tiny (≤ hidden_dim+1 square) and run synchronously every `kfac_update`
steps; XLA fuses the whole optimizer into the training step (the reference's
is_async thread machinery exists only to hide host-side eigendecomp latency,
which doesn't apply on-device — per SURVEY §7.4 parity is judged on curves,
not op-for-op).

Factor math, per dense layer with input a (B,din), pre-activation s = aW+b,
per-sample ds-gradient g (B,dout):
    A = E[ã ãᵀ]  (ã = a with a homogeneous 1 appended: covers the bias)
    S = E[g gᵀ]
    F ≈ A ⊗ S;  F⁻¹grad = Q_A ((Q_Aᵀ G Q_S) / (λ_A λ_Sᵀ + ε)) Q_Sᵀ
with G the (din+1, dout) stacked [W; b] gradient.

Conv layers use the KFC approximation (Grosse & Martens 2016; the
reference's conv-factor path is kfac.py:205-318): treat every spatial
location as a pseudo-sample — A = E_{b,t}[p̃ p̃ᵀ] over im2col patch vectors
p (k²·cin), S = |T|·E_{b,t}[g gᵀ] over per-location pre-activation
gradients, F ≈ A ⊗ S for the (k²·cin+1, cout) reshaped kernel.  The
caller flattens (patches, grads) to 2D rows with scaling folded in, so
`update_stats`/`precondition_layer` below are layout-agnostic.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LayerKFACState:
    A: jnp.ndarray  # (din+1, din+1)
    S: jnp.ndarray  # (dout, dout)
    QA: jnp.ndarray
    lamA: jnp.ndarray
    QS: jnp.ndarray
    lamS: jnp.ndarray


@struct.dataclass
class KFACState:
    layers: Any  # tuple of LayerKFACState
    momentum: Any  # pytree like params
    step: jnp.ndarray


def init_layer(din: int, dout: int) -> LayerKFACState:
    return LayerKFACState(
        A=jnp.eye(din + 1),
        S=jnp.eye(dout),
        QA=jnp.eye(din + 1),
        lamA=jnp.ones((din + 1,)),
        QS=jnp.eye(dout),
        lamS=jnp.ones((dout,)),
    )


def init_kfac(layer_dims: List[Tuple[int, int]], params) -> KFACState:
    return KFACState(
        layers=tuple(init_layer(din, dout) for din, dout in layer_dims),
        momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
        step=jnp.zeros((), jnp.int32),
    )


def update_stats(
    state: KFACState,
    layer_rows: List[Tuple[jnp.ndarray, jnp.ndarray]],
    stats_decay: float = 0.99,
) -> KFACState:
    """EMA the factor statistics from one fisher-loss backward pass.

    layer_rows[i] = (a2d, g2d): 2D row matrices for layer i — (N, din)
    inputs/patches and (N, dout) pre-activation gradients, with any
    per-sample / per-location scaling already folded in by the caller
    (see KfacNet.layer_stats).  A gets a homogeneous column for the bias.
    """
    new_layers = []
    for layer, (a, g) in zip(state.layers, layer_rows):
        n = a.shape[0]
        a_h = jnp.concatenate([a, jnp.ones((n, 1), a.dtype)], axis=1)
        A_new = (a_h.T @ a_h) / n
        S_new = (g.T @ g) / n
        A = stats_decay * layer.A + (1 - stats_decay) * A_new
        S = stats_decay * layer.S + (1 - stats_decay) * S_new
        new_layers.append(layer.replace(A=A, S=S))
    return state.replace(layers=tuple(new_layers))


def update_eigs(state: KFACState) -> KFACState:
    """Recompute eigendecompositions of every factor (kfac.py:512-616)."""
    new_layers = []
    for layer in state.layers:
        lamA, QA = jnp.linalg.eigh(layer.A)
        lamS, QS = jnp.linalg.eigh(layer.S)
        new_layers.append(
            layer.replace(
                QA=QA, lamA=jnp.maximum(lamA, 0.0),
                QS=QS, lamS=jnp.maximum(lamS, 0.0),
            )
        )
    return state.replace(layers=tuple(new_layers))


def precondition_layer(
    layer: LayerKFACState, gW: jnp.ndarray, gb: jnp.ndarray, epsilon: float
):
    """F⁻¹ g for one dense layer; returns (pW, pb)."""
    G = jnp.concatenate([gW, gb[None, :]], axis=0)  # (din+1, dout)
    Gt = layer.QA.T @ G @ layer.QS
    denom = layer.lamA[:, None] * layer.lamS[None, :] + epsilon
    P = layer.QA @ (Gt / denom) @ layer.QS.T
    return P[:-1], P[-1]
