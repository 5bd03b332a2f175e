from .mesh import make_mesh, collectives  # noqa
from .data import shard_batches, dp_train_step, dp_train_step_autoshard  # noqa
from .pp import pipeline_apply, sequential_apply, stack_stage_params  # noqa
from .tp import (dp_tp_train_step, shard_mace_variables, tp_apply,  # noqa
                 tp_train_step)
from .zero import zero_dp_train_step, zero_init  # noqa
