from ocr_agent_spark.streaming.ingest import (
    run_streaming_extraction,
    run_streaming_extraction_committed,
)

__all__ = ["run_streaming_extraction", "run_streaming_extraction_committed"]
