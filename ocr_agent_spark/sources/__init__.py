from ocr_agent_spark.sources.snapshot import SnapshotStore

__all__ = ["SnapshotStore"]
