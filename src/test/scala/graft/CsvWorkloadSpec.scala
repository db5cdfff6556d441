package graft

import java.nio.file.Files
import graft.bench.{BenchHarness, Workload}

class CsvWorkloadSpec extends SparkSpec {

  test("CSV workloads load and execute (label;query lines)") {
    Tables.registerAll(spark, sfDir)
    val f = Files.createTempFile("graft_wl", ".csv")
    Files.writeString(f,
      "c1;SELECT count(*) AS n FROM nation\n" +
      "c2;SELECT r_name, count(*) AS n FROM region, nation WHERE r_regionkey = n_regionkey GROUP BY r_name\n")
    val wl = Workload.fromCsv("csvwl", f.toString)
    assert(wl.labels === Seq("c1", "c2"))
    val g = Files.createTempFile("graft_wl_bad", ".csv")
    Files.writeString(g,
      "c1;SELECT 1 AS x\nthis line has no separator\nc2;SELECT 2 AS x\n")
    assert(Workload.fromCsv("bad", g.toString).labels === Seq("c1", "c2"))
    val rs = BenchHarness.executeWorkload(spark, wl)
    assert(rs.forall(_.status == "ok"))
    assert(rs.head.result_rows === 1)
  }
}
