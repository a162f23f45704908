from ocr_agent_spark.streaming.ingest import run_streaming_extraction

__all__ = ["run_streaming_extraction"]
