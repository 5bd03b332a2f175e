from .mesh import make_mesh, collectives  # noqa
from .data import shard_batches, dp_train_step  # noqa
from .pp import pipeline_apply, sequential_apply, stack_stage_params  # noqa
