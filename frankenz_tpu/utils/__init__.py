"""Runtime utilities: progress, checkpointing, metrics, tracing."""

from .checkpoint import load_state_dict, restore, save, state_dict  # noqa: F401
from .metrics import Metrics, metrics, timed  # noqa: F401
from .progress import progress_iter  # noqa: F401
from .tracing import annotate, device_memory, trace  # noqa: F401
