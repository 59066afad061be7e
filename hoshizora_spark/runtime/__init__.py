from hoshizora_spark.runtime.checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
