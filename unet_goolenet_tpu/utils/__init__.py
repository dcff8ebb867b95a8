"""Utilities: seeding, structured logging, profiling helpers."""

from unet_goolenet_tpu.utils.seed import seed_everything
from unet_goolenet_tpu.utils.logging import MetricLogger

__all__ = ["seed_everything", "MetricLogger"]
