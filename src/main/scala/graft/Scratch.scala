package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary instrumentation main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$label] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    // warm
    SparkEntry.queries("d12_dedup_incremental")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      println(s"rep $i")
      val batch = t("filter")(docs.filter(col("doc_id") % 2 === 1))
      val tag = t("fingerprint")(Tables.dataFingerprint(sfDir))
      val tmp = System.getProperty("java.io.tmpdir")
      val idx = t("read index parquet")(
        spark.read.parquet(s"$tmp/graft_mhidx_$tag"))
      val sh = graft.llm.Dedup.shingles(batch, "doc_id", "text", 3)
      val sigs0 = graft.llm.Dedup.minHashSignatures(sh, 128)
      t("sigs analyzed")(sigs0.queryExecution.analyzed)
      t("sigs canonicalized")(sigs0.queryExecution.analyzed.canonicalized)
      val band0 = graft.llm.Dedup.bandSignatures(sigs0, 32, 4)
      t("band analyzed")(band0.queryExecution.analyzed)
      t("band canonicalized")(band0.queryExecution.analyzed.canonicalized)
      import graft.llm.Dedup
      val newSigs = t("scopedCache(newSigs)")(Dedup.scopedCache(
        Dedup.minHashSignatures(Dedup.shingles(batch, "doc_id", "text", 3), 128)))
      val newBanded = t("scopedCache(newBanded)")(Dedup.scopedCache(
        Dedup.bandSignatures(newSigs, 32, 4)))
      val nn = newBanded.select(col("doc_id").as("n_id"), col("band"), col("bh"))
      val o = idx.select(col("doc_id").as("o_id"), col("band"), col("bh"))
      val vsOld = t("vsOld build")(o.join(broadcast(nn), Seq("band", "bh"))
        .filter(col("n_id") =!= col("o_id"))
        .select(least(col("n_id"), col("o_id")).as("a_id"),
          greatest(col("n_id"), col("o_id")).as("b_id")))
      val m = newBanded.select(col("doc_id").as("m_id"), col("band"), col("bh"))
      val vsNew = nn.join(broadcast(m), Seq("band", "bh"))
        .filter(col("n_id") < col("m_id"))
        .select(col("n_id").as("a_id"), col("m_id").as("b_id"))
      val cands = t("cands build")(vsOld.union(vsNew).distinct())
      val touched = cands.select(col("a_id").as("doc_id"))
        .union(cands.select(col("b_id").as("doc_id"))).distinct()
      val docsTouched = t("docsTouched build")(docs
        .join(broadcast(touched),
          docs("doc_id").cast("bigint") === touched("doc_id"), "left_semi"))
      val shT = t("scopedCache(shingles touched)")(Dedup.scopedCache(
        Dedup.shingles(docsTouched, "doc_id", "text", 3)))
      val inc = t("verifyJaccard build")(
        Dedup.verifyJaccard(shT, cands, 0.6))
      val ord = t("orderBy")(inc.orderBy(col("a_id"), col("b_id")))
      t("d12 exec")(ord.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
