"""Functional train state.

The reference mutates module buffers/optimizer slots in place
(SURVEY §7 "hard parts" #1); here **everything that changes during
training is an explicit pytree field**: params, mutable model state
(BN stats in "batch_stats", SSL buffers like the MoCo queue in "ssl"),
optimizer slots, the dynamic loss-scale, the full-model EMA shadow
(reference `models/utils/ema.py`), and the RNG key. One step is one
pure function `state -> state`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    model_state: Any  # dict of non-param collections: batch_stats, ssl
    opt_state: Any
    rng: jax.Array
    scaler_state: Optional[Any] = None
    ema_params: Optional[Any] = None  # optimizer-side EMA shadow

    @classmethod
    def create(cls, params, model_state, opt_state, rng, scaler_state=None, ema_params=None):
        return cls(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            model_state=dict(model_state),
            opt_state=opt_state,
            rng=rng,
            scaler_state=scaler_state,
            ema_params=ema_params,
        )


def tree_where(pred, a, b):
    """Elementwise tree select (used to skip updates on non-finite grads)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)
