"""Streaming data-quality monitoring: run a declarative check Suite
(api.Suite) on every micro-batch and append per-batch reports to a
catalog table — continuous DQ over an arriving table with exactly the
batch semantics (the Suite compiles to one aggregation pass per
micro-batch, so per-trigger cost is one scan of the new files only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def start_dq_stream(spark: SparkSession, in_path: str, schema_ddl: str,
                    suite, catalog, checkpoint_dir: str,
                    table: str = "dq_stream_reports",
                    max_files_per_trigger: int = 4):
    """foreachBatch bridge: per micro-batch, one Suite aggregation ->
    one appended report row set tagged with the batch id.  Failed
    batches are still logged (monitoring, not gating); a gating
    variant would raise inside process() to stop the query."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = suite.run(batch_df)
        catalog.append_rows(table, [
            {"batch_id": batch_id, **r} for r in report.to_rows()
        ])

    stream = (spark.readStream.schema(schema_ddl)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(in_path))
    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))
