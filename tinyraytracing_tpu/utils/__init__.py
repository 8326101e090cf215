"""Utilities: structured logging, timing, render checkpointing."""

from tinyraytracing_tpu.utils.timing import Timer
from tinyraytracing_tpu.utils.logging import get_logger

__all__ = ["Timer", "get_logger"]
