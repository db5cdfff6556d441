package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Scratch probe: why did LSH banding miss specific high-J pairs after the
  * hashed-shingle change? Dumps signatures, per-band hashes and estimate for
  * the missing pairs.
  */
object ProbeD03 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.Tables.load(spark, dir, "documents")
    val ids = Seq(26L, 455L, 92L, 450L, 98L, 290L)
    val sh = Dedup.shingles(docs.filter(col("doc_id").isin(ids: _*)),
      "doc_id", "text", 3)
    sh.groupBy("doc_id").count().orderBy("doc_id").show()
    val sigs = Dedup.minHashSignatures(sh, 128)
    val pairs = Seq((26L, 455L), (92L, 450L), (98L, 290L))
    val s = sigs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((a, b) <- pairs) {
      (s.get(a), s.get(b)) match {
        case (Some(sa), Some(sb)) =>
          val agree = sa.zip(sb).count { case (x, y) => x == y }
          val bandHit = (0 until 32).count(bd =>
            (0 until 4).forall(i => sa(bd * 4 + i) == sb(bd * 4 + i)))
          println(s"pair ($a,$b): est=${agree / 128.0} bandsColliding=$bandHit")
        case other => println(s"pair ($a,$b): missing sig $other")
      }
    }
    // where do the pairs drop out of the pipeline?
    val full = Dedup.shingles(docs, "doc_id", "text", 3)
    val fullSigs = Dedup.minHashSignatures(full, 128)
    val cands = Dedup.lshCandidates(fullSigs, 32, 4)
    cands.filter((col("a_id") === 26 && col("b_id") === 455) ||
        (col("a_id") === 92 && col("b_id") === 450) ||
        (col("a_id") === 98 && col("b_id") === 290))
      .show()
    spark.stop()
  }
}
