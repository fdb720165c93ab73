"""Runtime utilities: progress, checkpointing, metrics."""

from .progress import progress_iter  # noqa: F401
