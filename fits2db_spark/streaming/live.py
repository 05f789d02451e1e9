"""Live Structured Streaming modules (SURVEY.md §2.S stream_watermark /
stream_dedup / stream_stateful / stream_sink).

Batch/stream parity is the correctness strategy (§5.4): the SAME windowed
aggregations registered in operators/streaming_batch.py are run here under
``readStream`` and asserted equal to their batch results in
tests/test_streaming_live.py.

Scale notes: file-source streams list incrementally (maxFilesPerTrigger
bounds batch size); state (windows, dedup keys, per-key counters) lives in
the state store keyed by the shuffle partitioning — at 100 TB the knobs are
watermark delay (state retention) and shuffle partitions (state shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import SCHEMAS


def events_stream(
    spark: SparkSession, staging_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source stream of events rows (parquet files dropped into
    ``staging_dir``). Schema is declared, never inferred (§1.1).
    ``max_files_per_trigger=None`` leaves batch splitting to the trigger —
    under ``availableNow`` that means ONE micro-batch over all staged files
    (the cheap drain for registry entries whose semantics don't depend on
    per-file replay; the multi-batch replay stays pinned in pytest)."""
    rs = spark.readStream.schema(SCHEMAS["events"])
    if max_files_per_trigger is not None:
        rs = rs.option("maxFilesPerTrigger", max_files_per_trigger)
    return rs.parquet(staging_dir)


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-type 1h tumbling counts with an event-time watermark: late rows
    beyond the watermark are dropped and window state is evicted."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows per user on the live stream (state-store merged)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark horizon —
    the streaming analogue of the reference's idempotent re-load."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def running_user_counters(stream: DataFrame, timeout_duration: str = "30 minutes") -> DataFrame:
    """Custom per-key state: running event count + value total per user via
    applyInPandasWithState (arbitrary stateful processing)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_foreach_batch_sink(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    jdbc_url: str | None = None,
    table: str = "events_sink",
):
    """Micro-batch upsert sink via foreachBatch — the streaming version of
    the reference's DB load (SURVEY.md §2.S stream_sink). Each micro-batch
    re-enters the batch writer: JDBC if a url is given, else parquet append."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if jdbc_url:
            from ..sinks.jdbc import write_jdbc

            write_jdbc(batch_df, jdbc_url, table, mode="append")
        else:
            batch_df.write.mode("append").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drain a stream into an in-memory table (test harness helper)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def running_user_counters_tws(stream: DataFrame) -> DataFrame:
    """Per-key running counters via transformWithStateInPandas — the Spark
    4.x arbitrary-stateful API that supersedes applyInPandasWithState
    (typed per-key state handles, explicit init/close lifecycle, multiple
    state variables, timers). Same semantics as
    :func:`running_user_counters`, asserted equal in tests; kept alongside
    it because both APIs are part of the public surface. State here is one
    (count, total) ValueState per user — O(keys) store entries, RocksDB-
    backed on a real cluster. NOTE: executing a TWS query requires protobuf
    (the state-server wire protocol); in environments without it the query
    fails at stream start — the parity test import-skips accordingly, and
    applyInPandasWithState (:func:`running_user_counters`) remains the
    fully-exercised stateful path."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    output_schema = "user_id long, n_events long, total_value double"

    class Counters(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Counters(),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="None",
    )


def click_purchase_interval_join(stream: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same user's
    clicks in the preceding hour. Both sides carry event-time watermarks, so
    the join state store evicts rows once they can no longer match — bounded
    state, the condition for running a stream-stream join forever. The time
    bound in the join predicate is what makes eviction possible; an
    unbounded-equality stream join would accumulate state indefinitely."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("value").alias("buy_value"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    return clicks.join(
        buys,
        F.expr(
            """c_user = b_user AND
               buy_ts >= click_ts AND
               buy_ts <= click_ts + INTERVAL 1 HOUR"""
        ),
    )
