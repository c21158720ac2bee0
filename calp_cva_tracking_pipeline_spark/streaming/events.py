"""Event-stream ingestion and windowed aggregation.

The reference is strictly batch (SURVEY.md §2.12); its closest analog is the
per-year incremental refresh. This module exposes the engine's streaming
surface over the ``events`` table shape (event_id, ts, user_id, event_type,
value, props):

- ``windowed_agg`` is the shared logical plan: tumbling-window counts/sums
  per event_type. The SAME function serves batch DataFrames (driver
  correctness oracle) and streaming DataFrames (readStream) — Structured
  Streaming's core design point.
- ``stream_events`` wires it to a file/rate source with a watermark so late
  data older than the horizon is dropped and state stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.numeric import money_sum


def windowed_agg(
    events: DataFrame, window_duration: str = "1 hour"
) -> DataFrame:
    """Tumbling-window per-type counts and value sums.

    Works identically on batch and streaming inputs (lazy logical plan).
    """
    return (
        events.groupBy(
            F.window(F.col("ts"), window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_events(
    spark: SparkSession,
    source_path: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream → watermark → windowed agg (append-capable sink contract).

    Watermark bounds state: windows older than max(event time) - watermark
    are finalized and evicted, so state size is O(active windows), not
    O(stream length) — required for an unbounded 100 TB/day stream.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_path)
    )
    return windowed_agg(
        stream.withWatermark("ts", watermark), window_duration
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key's state only until the
    watermark passes it, so an unbounded stream holds O(keys-per-horizon)
    state instead of O(stream length) — the streaming twin of
    operators.dedup.dedup_exact. On a batch DataFrame this degrades to
    plain dropDuplicates (no watermark semantics), which tests exploit for
    parity.
    """
    keys = key_cols or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def sessionize(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Session windows per user (gap-based), batch or streaming.

    Demonstrates the stateful-session surface
    (session_window is Spark-native; no custom state store logic needed).
    """
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("s"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def stream_attribution_join(
    impressions: DataFrame,
    conversions: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream attribution join over the events shape: every
    conversion matches same-user impressions at most ``horizon`` before
    it — the click→purchase attribution primitive, as a genuine
    STREAM-STREAM inner join (both sides unbounded). The time-range
    predicate plus per-side watermarks are what bound the join state:
    an impression can only ever match conversions inside its horizon,
    so rows older than max(event time) − watermark − horizon evict —
    state is O(events per horizon window), not O(stream length). On
    batch DataFrames the same plan degrades to a plain interval join,
    which the batch≡stream test exploits for parity
    (tests/test_streaming.py).

    Output: (user_id, imp_event_id, imp_ts, conv_event_id, conv_ts,
    lag_s — integer seconds).
    """
    imp = impressions.select(
        F.col("user_id").alias("__iu"),
        F.col("event_id").alias("imp_event_id"),
        F.col("ts").alias("imp_ts"),
    )
    conv = conversions.select(
        F.col("user_id").alias("__cu"),
        F.col("event_id").alias("conv_event_id"),
        F.col("ts").alias("conv_ts"),
    )
    if impressions.isStreaming:
        imp = imp.withWatermark("imp_ts", watermark)
    if conversions.isStreaming:
        conv = conv.withWatermark("conv_ts", watermark)
    cond = (
        (F.col("__iu") == F.col("__cu"))
        & (F.col("imp_ts") <= F.col("conv_ts"))
        & (
            F.col("conv_ts")
            <= F.expr(f"imp_ts + INTERVAL {horizon}")
        )
    )
    return imp.join(conv, cond, "inner").select(
        F.col("__iu").alias("user_id"),
        "imp_event_id",
        "imp_ts",
        "conv_event_id",
        "conv_ts",
        (
            F.unix_timestamp("conv_ts") - F.unix_timestamp("imp_ts")
        ).cast("bigint").alias("lag_s"),
    )
