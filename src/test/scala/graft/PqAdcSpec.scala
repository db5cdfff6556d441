package graft

import org.apache.spark.sql.functions._
import graft.functions.PqAdcScore

class PqAdcSpec extends SparkSpec {

  test("native ADC score matches the HOF formulation bit-for-bit") {
    import spark.implicits._
    val numSub = 8
    val ksz = 16
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val lut = Array.fill(numSub)(Array.fill(ksz)(rnd.nextDouble() - 0.5))
      val codes = Array.fill(numSub)(rnd.nextInt(ksz))
      (lut, codes)
    }
    val df = rows.toDF("lut", "codes")
      .withColumn("native", PqAdcScore.adcScore(col("lut"), col("codes")))
      .withColumn("hof", expr(
        s"aggregate(sequence(1, $numSub), 0D, (a, m) -> " +
          "a + element_at(element_at(lut, m), element_at(codes, m) + 1))"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
    assert(df.filter(col("native").isNull).count() === 0)
  }

  test("short or out-of-range codes yield null (both eval paths)") {
    import spark.implicits._
    val lut = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val df = Seq(
      (lut, Array(0, 1)),       // fine: 1.0 + 4.0
      (lut, Array(0)),          // shorter than lut -> null
      (lut, Array(0, 5)),       // out of range -> null
      (lut, Array(-1, 0))       // negative -> null
    ).toDF("lut", "codes")
      .withColumn("s", PqAdcScore.adcScore(col("lut"), col("codes")))
    val got = df.select("s").collect()
    assert(got(0).getDouble(0) === 5.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0) && got(3).isNullAt(0))
    // interpreted path: constant folding evaluates pre-codegen
    val lit = spark.sql(
      "SELECT array(array(1D,2D),array(3D,4D)) AS lut, array(0,1) AS codes")
      .withColumn("s", PqAdcScore.adcScore(col("lut"), col("codes")))
    assert(lit.select("s").head().getDouble(0) === 5.0)
  }
}
