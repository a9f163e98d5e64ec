from rkmh_spark.plans.checkpoint import CheckpointManager, resumable_dedup

__all__ = ["CheckpointManager", "resumable_dedup"]
