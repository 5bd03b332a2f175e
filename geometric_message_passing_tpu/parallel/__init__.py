from .mesh import make_mesh, collectives  # noqa
from .data import shard_batches, dp_train_step  # noqa
