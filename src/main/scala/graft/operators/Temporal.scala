package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event streams (batch side; the streaming
  * equivalents live in [[graft.streaming.EventStreams]]).
  *
  * Scale design: both operators are single-shuffle window plans keyed on
  * the (high-cardinality) entity key — no per-key loops, no range
  * explosion, no driver-side state. The as-of join uses the union-marker
  * technique instead of a range join: a range join on (key, time <= t)
  * degenerates to a per-key cross product under skew, while the union
  * plan is one partition-sort per key regardless of time-range density.
  */
object Temporal {

  /** As-of join: each left row picks the LATEST right row with
    * `rightTime <= leftTime` for the same key (the "most recent quote for
    * each trade" join; DuckDB/kdb ASOF JOIN semantics, left-outer).
    *
    * Implementation: tag and union the two inputs, then one window pass
    * per key ordered by (time, side) — right rows sort before left rows
    * at equal times, so a simultaneous right row IS visible (<=, not <) —
    * carrying the last right row forward AS ONE STRUCT, so a right row
    * whose payload is NULL is carried intact (per-column carry would mix
    * fields from different right rows when later payloads are null). The
    * struct itself is the final orderBy tie-break, so equal-time right
    * rows resolve deterministically regardless of partitioning. One
    * shuffle on the key, one sort, any number of payload columns.
    *
    * @param payload right-side columns to attach (emitted as
    *                `asof_<name>` so they never collide with left
    *                columns); right's time column is always attached as
    *                `asof_time`
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val leftCols = left.columns.toSeq
    val reserved = Seq("__t", "__side", "__asof_time", "asof_time") ++
      payload.map(p => s"asof_$p")
    val clash = leftCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"asofJoin output names collide with left columns: ${clash.mkString(", ")}")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__asof_time", lit(null).cast(right.schema(rightTime).dataType))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side"), col("__asof_time")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p"))): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__asof_time", col(rightTime))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side"), col("__asof_time")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__p_$p"))): _*)
    // The whole right row as one nullable struct: null for left rows, so
    // last(ignoreNulls) skips them but carries null PAYLOADS atomically.
    val rStruct = when(col("__side") === 0,
      struct((col("__asof_time").as("__at") +:
        payload.map(p => col(s"__p_$p").as(s"__f_$p"))): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, rStruct.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(rStruct, ignoreNulls = true).over(w)
    val outCols: Seq[org.apache.spark.sql.Column] =
      Seq(col("__side")) ++ leftCols.map(col) ++
        Seq(carried.getField("__at").as("asof_time")) ++
        payload.map(p => carried.getField(s"__f_$p").as(s"asof_$p"))
    l.unionByName(r)
      .select(outCols: _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Batch sessionization: per-key sessions split on inactivity gaps
    * longer than `gap` (same semantics as the streaming
    * [[graft.streaming.EventStreams.sessionize]], expressed as two window
    * passes — lag to detect session starts, running sum to number them —
    * then one aggregation). `timeCol` must be a numeric epoch column
    * (exact integer arithmetic; no timestamp rounding), `gap` in the same
    * unit. Fully ANSI-expressible, so the driver hash-checks it against
    * DuckDB. */
  def sessionizeBatch(
      events: DataFrame, keyCol: String, timeCol: String, valueCol: String,
      tieBreak: String, gap: Long): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(timeCol).asc, col(tieBreak).asc)
    val withStart = events
      .withColumn("__prev", lag(col(timeCol), 1).over(byTime))
      .withColumn("__new",
        when(col("__prev").isNull || col(timeCol) - col("__prev") > gap, 1L).otherwise(0L))
    val numbered = withStart.withColumn("session_idx",
      sum(col("__new")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered.groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).as("start_t"),
        max(col(timeCol)).as("end_t"),
        round(sum(col(valueCol)), 2).as("sum_value"))
  }
}
