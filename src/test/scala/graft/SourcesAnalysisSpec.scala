package graft

import java.nio.file.Files
import graft.bench.{BenchHarness, Workload}
import graft.core.TableRef
import graft.plans.{JoinTree, PlanAnalysis}
import graft.sources.Sources

class SourcesAnalysisSpec extends SparkSpec {

  test("cluster config preset applies runtime keys and restores cleanly") {
    val before = Seq("spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k)).toMap
    try {
      Sources.getClass // touch package
      graft.sources.SparkConfigs.applyRuntime(spark, clusterCores = 64)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "192")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      val desc = graft.sources.SparkConfigs.describe(64)
      assert(desc.contains("spark.sql.files.maxPartitionBytes"))
      assert(desc.startsWith("{") && desc.endsWith("}"))
    } finally {
      before.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    }
  }

  test("csv/json/orc round-trips preserve row counts and values") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars")
    val base = Files.createTempDirectory("graft_src").toString
    for (fmt <- Seq("csv", "json", "orc")) {
      Sources.writeAs(docs, fmt, s"$base/d_$fmt")
      val back = fmt match {
        case "csv" => spark.read.schema(docs.schema).option("header", "true")
          .csv(s"$base/d_$fmt")
        case "json" => spark.read.schema(docs.schema).json(s"$base/d_$fmt")
        case "orc" => spark.read.orc(s"$base/d_$fmt")
      }
      assert(sameResults(back, docs), s"$fmt round-trip differs")
    }
  }

  test("xml round-trip preserves row counts and values") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars")
    val base = Files.createTempDirectory("graft_xml").toString
    Sources.writeAs(docs, "xml", s"$base/d_xml")
    val back = spark.read.schema(docs.schema).option("rowTag", "row")
      .xml(s"$base/d_xml")
    assert(sameResults(back, docs), "xml round-trip differs")
  }

  test("binaryFile ingestion reads whole files with length and content, " +
      "and the glob prunes at listing time") {
    val base = Files.createTempDirectory("graft_bin").toString
    val payload = Array[Byte](80, 54, 10, 49, 32, 49, 10)
    Files.write(java.nio.file.Paths.get(s"$base/a.ppm"), payload)
    Files.write(java.nio.file.Paths.get(s"$base/b.txt"),
      "not media".getBytes)
    val all = Sources.readBinaryFiles(spark, base)
    assert(all.count() === 2)
    val media = Sources.readBinaryFiles(spark, base, Some("*.ppm"))
      .select("path", "length", "content").collect()
    assert(media.length === 1)
    assert(media.head.getAs[Long]("length") === payload.length.toLong)
    assert(media.head.getAs[Array[Byte]]("content").toSeq === payload.toSeq)
  }

  test("readAuto dispatches on extension") {
    val nation = Tables.load(spark, sfDir, "nation")
    assert(Sources.readAuto(spark, s"$sfDir/nation.parquet").count() === nation.count())
    intercept[IllegalArgumentException] {
      Sources.readAuto(spark, "/tmp/x.avro")
    }
  }

  test("plan-space bound and tree similarity") {
    assert(PlanAnalysis.possiblePlansBound(2) === BigInt(2))
    assert(PlanAnalysis.possiblePlansBound(4) === BigInt(120))
    val a = JoinTree.leftDeep(Seq("a", "b", "c", "d").map(TableRef(_)))
    val b = JoinTree.leftDeep(Seq("a", "b", "d", "c").map(TableRef(_)))
    assert(PlanAnalysis.treeSimilarity(a, a) === 1.0)
    val sim = PlanAnalysis.treeSimilarity(a, b)
    assert(sim > 0.3 && sim < 1.0)
    assert(PlanAnalysis.orderAgreement(a, a) === 1.0)
    assert(PlanAnalysis.orderAgreement(a, b) === 0.5)
  }

  test("benchmark export carries workload, stages, and results") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.inline("exp", "e1" -> "SELECT count(*) AS n FROM nation")
    val rs = BenchHarness.executeWorkload(spark, wl)
    val json = BenchHarness.exportJson(wl, rs, """{"name":"native"}""")
    assert(json.contains("\"workload\":\"exp\""))
    assert(json.contains("\"label\":\"e1\""))
    assert(json.contains("\"status\":\"ok\""))
    // parses as JSON
    org.json4s.jackson.JsonMethods.parse(json)
  }

  test("approx distinct count tracks the exact value") {
    val stats = new graft.stats.EmulatedStatistics(spark)
    Tables.registerAll(spark, sfDir)
    val q = graft.qal.QueryFacade(spark,
      "SELECT count(*) FROM orders, region WHERE 1 = 0 AND r_regionkey >= 0")
    val leaf = q.joinBlock.get.leafPlan("orders")
    val exact = stats.distinctCount(leaf, "o_custkey")
    val approx = stats.approxDistinctCount(leaf, "o_custkey")
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }
}
