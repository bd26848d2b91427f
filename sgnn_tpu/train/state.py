"""Train state: parameters, BN statistics, Adam optimizer state.

Optimizer matches the reference exactly (/root/reference/torch/train.py:81):
Adam(lr, betas=(0.9, 0.999), eps=1e-8) with optional L2 weight decay added
to the gradient BEFORE the moment updates (torch Adam semantics, not AdamW).
The learning rate is a per-step input so the StepLR halving schedule
(train.py:89) costs no recompiles.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("params", "stats", "opt_state", "step"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class TrainState:
    params: dict
    stats: dict
    opt_state: tuple
    step: jax.Array


def make_optimizer(weight_decay: float = 0.0):
    if weight_decay > 0:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(params, stats, weight_decay: float = 0.0) -> TrainState:
    tx = make_optimizer(weight_decay)
    return TrainState(
        params=params,
        stats=stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def apply_updates(state: TrainState, grads, new_stats, lr, weight_decay=0.0):
    tx = make_optimizer(weight_decay)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u, state.params, updates
    )
    return TrainState(
        params=new_params,
        stats=new_stats,
        opt_state=new_opt,
        step=state.step + 1,
    )
