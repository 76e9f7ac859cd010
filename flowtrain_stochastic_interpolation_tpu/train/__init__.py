"""Training stack: optax state, objectives, jitted steps, loop, checkpoints."""

from flowtrain_stochastic_interpolation_tpu.train.state import (
    TrainState,
    ema_update,
    init_state,
    make_optimizer,
)
from flowtrain_stochastic_interpolation_tpu.train.objectives import (
    conditional_loss,
    unconditional_loss,
)
from flowtrain_stochastic_interpolation_tpu.train.steps import (
    make_eval_loss,
    make_train_step,
)

__all__ = [
    "TrainState",
    "ema_update",
    "init_state",
    "make_optimizer",
    "conditional_loss",
    "unconditional_loss",
    "make_train_step",
    "make_eval_loss",
]
