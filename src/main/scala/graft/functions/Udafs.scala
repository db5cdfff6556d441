package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed user-defined aggregations (SURVEY §2.11: the reference only
  * *represents* UDFs; Spark actually executes them — Aggregator[IN,BUF,OUT]
  * is the recommended path because the buffer stays in Tungsten rows and
  * merges are associative, so map-side partial aggregation works at scale).
  */
object Udafs {

  /** Geometric mean over positive doubles (log-sum buffer: associative,
    * merge-friendly). */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k distinct values as a sorted list (a tiny sketch-style
    * aggregate: the buffer is capped, so memory stays bounded per group). */
  final class TopKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], a: Long): Seq[Long] =
      ((b :+ a).distinct.sorted.takeRight(k))
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      (x ++ y).distinct.sorted.takeRight(k)
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Bounded top-k by (score desc, id asc): the buffer never exceeds k
    * entries, so map-side partial aggregation emits one k-row sketch per
    * partition and the reduce side merges k-row sketches — this is what
    * makes a distributed top-k-per-group scale: no group ever funnels its
    * full candidate set through one task (a `row_number().over(Window)`
    * does exactly that). Output is the sorted (score, id) list; callers
    * posexplode it into ranks.
    */
  final class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortWith((x, y) => x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)).take(k)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      // cheap reject before the O(k log k) insert: most rows lose to the
      // current k-th best
      if (b.size >= k && {
        val w = b.last
        a._1 < w._1 || (a._1 == w._1 && a._2 > w._2)
      }) b else trim(b :+ a)
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Register all UDAFs in the session function registry for SQL use. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("geo_mean", udaf(GeometricMean))
    spark.udf.register("top5_keys", udaf(new TopKLongs(5)))
  }
}
