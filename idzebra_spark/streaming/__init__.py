from idzebra_spark.streaming.ingest import stream_build

__all__ = ["stream_build"]
