package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface — net-new vs the reference (SURVEY §2.9):
  * file-source ingest of the CSV/parquet readers, watermarked windowed
  * aggregation, streaming dedup, and a stateful sessionizer via
  * flatMapGroupsWithState. All operators are the batch semantics from
  * `graft.operators` lifted onto unbounded input.
  */
object Streams {

  /** Streaming ingest of a directory of csv files (schema required —
    * streams cannot infer).
    */
  def readCsvStream(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    spark.readStream.schema(schema)
      .option("sep", delimiter).option("header", "true").csv(path)

  def readParquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling/sliding windowed aggregation with late-data watermark —
    * the streaming `groupby` (maps the reference's batch groupby onto
    * event time).
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      windowLen: String,
      slide: Option[String],
      keys: Seq[String],
      aggs: Seq[(String, String)]): DataFrame = {
    val win = slide.map(s => window(col(tsCol), windowLen, s))
      .getOrElse(window(col(tsCol), windowLen))
    val exprs = aggs.map { case (c, fn) => graft.operators.GroupBy.accumulator(fn, c) }
    events.withWatermark(tsCol, watermark)
      .groupBy(win +: keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  /** Streaming exact dedup on a key within the watermark horizon —
    * `dropDuplicates` with state eviction (the streaming face of
    * Dedup.exact).
    */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(keys :+ tsCol)

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Gap-based sessionizer: emits a session row when `gapSeconds` of
    * inactivity passes (processing-time timeout). Custom state via
    * flatMapGroupsWithState — the streaming analogue of the batch
    * `q_sessionize` window query.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long)
      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    def fn(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.lastTs), s.n, s.sum))
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapSeconds * 1000 =>
            out ::= SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastTs), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutDuration(gapSeconds * 1000)
      }
      out.reverseIterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(fn)
  }
}
