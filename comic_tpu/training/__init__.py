from . import checkpoints, optimizer, schedule, xe

__all__ = ["checkpoints", "optimizer", "schedule", "xe"]
