package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Scratch probe: self-join vs posting-list pair generation for exact
  * n-gram Jaccard at sf0.1 (wall-clock per variant, 3 reps).
  */
object ProbeD02 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.load(spark, dir, "documents")

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(s"$tag median=${ts(1)} min=${ts.head}")
    }

    time("self-join (current)") {
      Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text", 3), 0.6)
        .write.format("noop").mode("overwrite").save()
    }

    time("posting-list") {
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val pairs = sh.groupBy("shingle")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
               transform(slice(ids, i + 2, size(ids)), y ->
                 struct(x AS a_id, y AS b_id))))""")).as("p"))
        .select(col("p.a_id"), col("p.b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      val out = pairs
        .join(sizes.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("n_sh", "n_a"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("n_sh", "n_b"), "b_id")
        .withColumn("jaccard",
          col("inter") / (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      out.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
