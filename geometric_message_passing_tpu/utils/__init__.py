from .checkpoint import load_checkpoint, save_checkpoint, CheckpointManager  # noqa
from .profiler import profile_trace, time_fn  # noqa
