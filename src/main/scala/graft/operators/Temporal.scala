package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in Spark join vocabulary lacks:
  * backward as-of join and interval (range) join. Both are composed from
  * existing declarative operators — no custom SparkPlan is needed because
  * the semantics collapse onto window functions / equality joins, which
  * keeps them inside Catalyst's optimizer and whole-stage codegen.
  *
  * Scale design:
  *  - [[asOfJoin]] is the union + ordered carry-forward formulation: ONE
  *    shuffle on the key columns and one sort by (ts, side) — exactly the
  *    cost profile of a window aggregate. The naive formulation (inequality
  *    theta-join + per-left-row argmax) plans as a nested-loop product and
  *    is quadratic per key; this one is linear after the sort, and key skew
  *    behaves like any window/groupBy skew (salt or split upstream if one
  *    key dominates).
  *  - [[rangeJoinBucketed]] discretizes intervals onto fixed-width buckets
  *    so the pair generation is an EQUALITY join on the bucket id (hash
  *    shuffle both sides, no broadcast-nested-loop). Each (point, interval)
  *    match is produced exactly once — a point falls in exactly one bucket,
  *    and an interval containing the point necessarily covers that bucket —
  *    so no post-join distinct is needed. Bucket width trades fan-out
  *    (intervals explode to length/width rows) against join selectivity;
  *    choose it near the median interval length.
  */
object Temporal {

  /** Backward as-of join: for every left row, attach `rightTs` + `payload`
    * from the right row with the same `keys` and the LARGEST right
    * timestamp <= the left timestamp (optionally within `tolerance`).
    * Left rows with no eligible right row keep null payload (left-outer
    * semantics). At equal timestamps the right row IS eligible.
    *
    * Mechanics: union both sides into one relation tagged with a sort-side
    * bit (right rows sort before left rows at equal ts), then carry the
    * most recent non-null right payload forward with
    * last(_, ignoreNulls).over(partitionBy(keys).orderBy(ts, side)) and
    * keep only left rows. Among right rows sharing an identical (key, ts)
    * the carried row is the last in `tiebreak` order — pass a unique
    * column (e.g. an event id) for fully deterministic output.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Column] = None,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val carried = rightTs +: payload
    val leftOther =
      left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTs)
    require(!leftOther.exists(carried.contains),
      s"left columns ${leftOther.intersect(carried)} collide with carried right columns")

    // typed nulls so the union schemas line up exactly
    def nullAs(src: DataFrame, c: String): Column =
      lit(null).cast(src.schema(c).dataType).as(c)
    val tiebreakCols = tiebreak.map(c =>
      coalesce(col(c).cast("string"), lit("")).as(s"__tb_$c"))
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftOther.map(col) ++ carried.map(nullAs(right, _)) ++
        tiebreak.map(c => lit("").as(s"__tb_$c")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftOther.map(nullAs(left, _)) ++ carried.map(col) ++ tiebreakCols: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +:
        tiebreak.map(c => col(s"__tb_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarried = carried.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(c), ignoreNulls = true).over(w))
    }
    // a match older than the tolerance is no match at all
    val keep = tolerance match {
      case Some(tol) => col(s"__m_$rightTs") >= col("__ts") - tol
      case None => lit(true)
    }
    withCarried.filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftOther.map(col) ++
        carried.map(c => when(keep, col(s"__m_$c")).as(c)): _*)
  }

  /** Interval (range) join: every (point, interval) pair with
    * startCol <= point < endCol, produced through an equality join on
    * fixed-width buckets of the point domain. `pointCol`, `startCol`,
    * `endCol` must be LongType in a shared unit (e.g. epoch micros —
    * cast timestamps with unix_micros); `bucketWidth` is in that unit.
    * Output: all interval columns + all point columns.
    */
  def rangeJoinBucketed(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // an interval covers buckets floor(start/w) .. floor((end-1)/w); the
    // half-open [start, end) makes the end bucket exclusive-safe
    val iv = intervals.withColumn("__bucket", explode(sequence(
      floor(col(startCol) / bucketWidth).cast("long"),
      floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    iv.join(pt, "__bucket")
      .filter(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
