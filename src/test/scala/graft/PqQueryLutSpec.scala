package graft

import org.apache.spark.sql.functions._
import graft.functions.PqQueryLut

class PqQueryLutSpec extends SparkSpec {

  private val numSub = 4
  private val ksz = 8
  private val sub = 3

  private def cbLiteral(cb: Array[Array[Array[Double]]]): String =
    cb.map(_.map(c => s"array(${c.mkString(",")})")
        .mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")

  test("native query LUT matches the HOF/literal formulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cb = Array.fill(numSub, ksz, sub)(rnd.nextDouble() - 0.5)
    val rows = (0 until 200).map(_ => Array.fill(numSub * sub)(
      rnd.nextDouble() - 0.5)).map(Tuple1(_))
    val cbl = cbLiteral(cb)
    val df = rows.toDF("vn")
      .withColumn("native", PqQueryLut.queryLut(col("vn"), cb))
      .withColumn("hof", expr(
        s"transform(sequence(0, ${numSub - 1}), m -> " +
          s"transform(sequence(0, ${ksz - 1}), k -> " +
          s"aggregate(sequence(1, $sub), 0D, (a, i) -> " +
          s"a + element_at(vn, m * $sub + i) * " +
          s"element_at(element_at(element_at($cbl, m + 1), k + 1), i))))"))
    // bit-for-bit: same sequential fold order, compared as exact doubles
    assert(df.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("short vectors null the out-of-range subspaces (both eval paths)") {
    import spark.implicits._
    val cb = Array.fill(numSub, ksz, sub)(0.5)
    // only the first subspace is covered: entries 1.. must be null
    val df = Seq(Tuple1(Array.fill(sub)(1.0))).toDF("vn")
      .withColumn("lut", PqQueryLut.queryLut(col("vn"), cb))
    val lut = df.select("lut").head().getSeq[Seq[java.lang.Double]](0)
    assert(lut.size === numSub)
    assert(lut.head.forall(_ == 0.5 * sub))
    assert(lut.tail.forall(_.forall(_ == null)))
    // interpreted path via constant folding on a literal input
    val lit = spark.sql(s"SELECT array(${Array.fill(sub)("1D").mkString(",")}) AS vn")
      .withColumn("lut", PqQueryLut.queryLut(col("vn"), cb))
    val lut2 = lit.select("lut").head().getSeq[Seq[java.lang.Double]](0)
    assert(lut2.head.forall(_ == 0.5 * sub) && lut2.tail.forall(_.forall(_ == null)))
  }
}
