"""Structured Streaming ingest for the quality filter.

The reference is purely batch (SURVEY.md section 1.4: finite PMID lists,
no watermarks), but a web-scale crawl arrives continuously; the rule
battery is stateless per row, so the SAME pipeline (plans/pipeline.py)
runs unchanged on a stream: readStream -> quality_filter -> sink.

Sink = foreachBatch appending to a snapshot table (sources/catalog.py):
each micro-batch commits atomically with its batch id recorded, giving
the streaming path the same exact-resume guarantee as the batch
checkpoint (Spark's own streaming checkpoint handles source offsets;
epoch-id dedup makes the append idempotent on replays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import pipeline as pipe
from ..sources.catalog import LocalSnapshotTable

IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "caption string, phash long")


def read_image_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a directory of image+caption parquet."""
    return (spark.readStream.schema(IMAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def start_quality_filter_stream(stream_df: DataFrame,
                                results: LocalSnapshotTable,
                                checkpoint_dir: str,
                                available_now: bool = True):
    """Run the full (UDF-gated) pipeline per micro-batch; atomic appends.

    Dedup is per-batch only (a global window over an unbounded stream is
    unbounded state): exact cross-batch dedup belongs to the batch
    compaction pass, mirroring the reference's cache-then-recompute split.
    """
    from ..sources.catalog import IdempotentBatchAppender
    appender = IdempotentBatchAppender(results)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        appender.append(pipe.quality_filter(batch_df, with_dedup=False),
                        batch_id)

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
