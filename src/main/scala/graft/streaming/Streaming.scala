package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface: the reference is batch-only (SURVEY.md
  * §2.3 "Streaming: none"), but a quality-filter engine feeding continuous
  * ingestion needs the streaming shapes: watermarked windowed aggregation
  * and stateful sessionization. Transform logic is defined on DataFrames,
  * so the SAME functions serve `read` (tests/backfill) and `readStream`
  * (production) — the standard Spark unification.
  */
final case class EventSession(
    user_id: Long,
    n_events: Long,
    first_ts: Timestamp,
    last_ts: Timestamp)

object Streaming {

  /** Watermarked tumbling-window event counts. Works on either a static or
    * a streaming frame with schema of the `events` table.
    */
  def windowedCounts(events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      // watermarks require TIMESTAMP (LTZ); parquet event time is NTZ —
      // session TZ is pinned to UTC so the cast is deterministic
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session assembly with explicit state: gap-based sessionization via
    * flatMapGroupsWithState (north-rule-adjacent: custom state machine the
    * built-in window can't express).
    *
    * Contract: events per user must arrive in event-time order ACROSS
    * batches (single-batch backfill, or an upstream watermark+sort). A
    * late event older than an already-emitted session would start a new
    * overlapping session rather than rewriting history — append-mode
    * outputs are immutable. Production streams should add
    * EventTimeTimeout + a watermark to close idle sessions and bound the
    * per-user open-tail state, which NoTimeout (correct for bounded
    * backfill, where the final tail is intentionally held) does not.
    */
  /** Shared gap-split: merge buffered + new timestamps, return (closed
    * sessions, open tail) under the `gapMs` rule.
    */
  private def gapSplit(buffered: List[Timestamp], fresh: List[Timestamp],
      gapMs: Long): (List[List[Timestamp]], List[Timestamp]) = {
    val ts = (buffered ++ fresh).sortBy(_.getTime)
    val sessions = ts.foldLeft(List.empty[List[Timestamp]]) {
      case (acc, t) => acc match {
        case cur :: rest if t.getTime - cur.head.getTime <= gapMs =>
          (t :: cur) :: rest
        case _ => List(t) :: acc
      }
    }.map(_.reverse).reverse
    if (sessions.isEmpty) (Nil, Nil) else (sessions.init, sessions.last)
  }

  def sessionize(events: Dataset[(Long, Timestamp)],
      gapMs: Long = 30 * 60 * 1000L): Dataset[EventSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[List[Timestamp], EventSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Timestamp)],
         state: GroupState[List[Timestamp]]) =>
          val (closed, open) = gapSplit(state.getOption.getOrElse(Nil),
            rows.map(_._2).toList, gapMs)
          if (open.nonEmpty) state.update(open) else state.remove()
          closed.iterator.map(s =>
            EventSession(userId, s.size.toLong, s.head, s.last))
      }
  }

  /** [[sessionize]] with BOUNDED open-tail state (round-4 verdict item 6):
    * EventTimeTimeout + a watermark finalize an idle session once the
    * watermark passes `last_ts + gap` — the session is EMITTED and its
    * state REMOVED, so per-user state is bounded by the horizon, not the
    * stream's lifetime. This is the custom-state-machine production path
    * (the built-in [[sessionWindows]] stays the declarative one;
    * [[sessionize]] under NoTimeout stays the bounded-backfill escape
    * hatch whose final tails are intentionally held). Streaming-shaped:
    * under batch execution timeouts never fire, so final open tails are
    * not emitted — use [[sessionize]]/[[sessionWindows]] for backfill.
    */
  def sessionizeStream(events: Dataset[(Long, Timestamp)],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "2 hours"): Dataset[EventSession] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[Timestamp], EventSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Timestamp)],
         state: GroupState[List[Timestamp]]) =>
          if (state.hasTimedOut) {
            // the watermark passed last_ts + gap: the open session can
            // never grow again — finalize it and EVICT the state
            val open = state.get
            state.remove()
            Iterator.single(
              EventSession(userId, open.size.toLong, open.head, open.last))
          } else {
            val (closed, open) = gapSplit(state.getOption.getOrElse(Nil),
              rows.map(_._2).toList, gapMs)
            if (open.nonEmpty) {
              state.update(open)
              // must be strictly beyond the current watermark (Spark
              // contract); batch execution reports watermark -1 and never
              // fires timeouts, so the max() is a streaming-only guard
              state.setTimeoutTimestamp(math.max(
                open.last.getTime + gapMs, state.getCurrentWatermarkMs + 1))
            } else state.remove()
            closed.iterator.map(s =>
              EventSession(userId, s.size.toLong, s.head, s.last))
          }
      }
  }

  /** Gap sessionization via the built-in `session_window` — the
    * PRODUCTION streaming path, closing [[sessionize]]'s documented gaps:
    * watermark-aware (out-of-order events within the watermark merge into
    * — or bridge — open sessions correctly) and state-bounded (a session
    * finalizes and its state evicts once the watermark passes
    * last_ts + gap, so per-user state never grows with the open tail).
    * Semantics: events belong to one session while consecutive gaps are
    * < gap; a gap ≥ gap starts a new session. The same function serves
    * static frames (emits ALL sessions, including each user's final one)
    * and readStream (append mode emits sessions as they finalize).
    * [[sessionize]] remains the custom-state-machine escape hatch for
    * logic session_window can't express.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("n_events"), col("first_ts"),
        col("last_ts"))

  /** Streaming exact content-dedup: first arrival wins, duplicates
    * arriving within the watermark of each other are dropped — the
    * streaming analogue of `QualityPipeline.dedupByContent`, whose global
    * groupBy is batch-only. State holds ONE entry per distinct content
    * hash (32 B key, never the content) and
    * `dropDuplicatesWithinWatermark` evicts entries once event time
    * passes the watermark, so state is bounded by the dedup horizon, not
    * the stream's lifetime. Contract: duplicates farther apart than the
    * watermark can BOTH survive (the horizon is the knob) — exact
    * corpus-wide dedup remains the batch stage's job; this bounds
    * duplication during continuous ingestion.
    */
  def dedupStream(files: DataFrame, tsCol: String = "ts",
      contentCol: String = "content",
      watermark: String = "2 hours"): DataFrame =
    files
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .withColumn("__sha", sha2(col(contentCol).cast("binary"), 256))
      .dropDuplicatesWithinWatermark("__sha")
      .drop("__sha")

  /** Run a streaming query over a static parquet dir via readStream →
    * memory sink, synchronously (test/backfill harness).
    */
  def runOnce(spark: SparkSession, parquetPath: String,
      name: String = "graft_stream"): DataFrame = {
    // readStream sources must be directories; stage a bare file into one
    val src = {
      val p = java.nio.file.Paths.get(parquetPath)
      if (java.nio.file.Files.isDirectory(p)) parquetPath
      else {
        val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
        java.nio.file.Files.copy(p, dir.resolve(p.getFileName))
        dir.toString
      }
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = windowedCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
