from simxns_tpu.io.checkpoint import (
    save_checkpoint, restore_checkpoint, latest_step, export_encoder_only)
from simxns_tpu.io.logging import MetricLogger

__all__ = [
    "save_checkpoint", "restore_checkpoint", "latest_step",
    "export_encoder_only", "MetricLogger",
]
