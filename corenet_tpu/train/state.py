"""Training state: parameters, batch stats, optimizer state, global step.

Functional equivalent of the reference's State
(/root/reference/src/corenet/state.py:32-47), with Adam moments living in
optax state. `global_step` counts *examples* (the reference's convention:
step += world_size * batch per iteration, pipeline.py:230-233).
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.struct
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
  global_step: jnp.ndarray            # int32[] — counts examples
  params: Any
  batch_stats: Any
  opt_state: Any


def create_optimizer(learning_rate: float = 4e-4,
                     adam_epsilon: float = 1e-4) -> optax.GradientTransformation:
  """Adam with the reference's hyper-parameters
  (generate_configs.py:216-227: lr 4e-4, eps 1e-4, torch default betas)."""
  return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=adam_epsilon)


def create_train_state(variables: Mapping[str, Any],
                       optimizer: optax.GradientTransformation,
                       global_step: int = 0) -> TrainState:
  params = variables["params"]
  return TrainState(
      global_step=jnp.asarray(global_step, jnp.int32),
      params=params,
      batch_stats=variables["batch_stats"],
      opt_state=optimizer.init(params))
