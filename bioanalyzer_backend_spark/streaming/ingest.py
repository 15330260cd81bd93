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


def _ddl_of(pa_schema) -> str:
    """Spark DDL string derived from the ONE pyarrow writer schema
    (datagen/synth.IMAGES_SCHEMA) — a hand-kept string twin silently
    nulls any column added to the writer but missed here (an explicit
    stream schema is never reconciled against the files)."""
    _PA2DDL = {"string": "string", "binary": "binary", "int32": "int",
               "int64": "long", "double": "double", "float": "float"}
    return ", ".join(f"{f.name} {_PA2DDL[str(f.type)]}"
                     for f in pa_schema)


def _images_ddl() -> str:
    from ..datagen.synth import IMAGES_SCHEMA as PA_IMAGES
    return _ddl_of(PA_IMAGES)


IMAGES_SCHEMA = _images_ddl()


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

    NO dedup runs in-stream (``with_dedup=False``; the results table has
    no ``is_dup`` column): a global dedup window over an unbounded
    stream is unbounded state, and even per-batch flags would disagree
    with the batch pipeline's global canonical choice. Cross-batch exact
    dedup is the job of either streaming/stateful.stateful_dedup
    (first-arrival-wins with bounded TTL state) or the batch compaction
    pass — mirroring the reference's cache-then-recompute split.
    """
    from ..sources.catalog import IdempotentBatchAppender
    appender = IdempotentBatchAppender(results,
                                       checkpoint_dir=checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        appender.append(pipe.quality_filter(batch_df, with_dedup=False),
                        batch_id)

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
