"""Train state pytree."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from .optim import SGDState, sgd_init


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt: SGDState
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, variables) -> "TrainState":
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt=sgd_init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
