from ilogtail_spark.streaming.stream import run_stream_pipeline, stream_transcripts

__all__ = ["run_stream_pipeline", "stream_transcripts"]
