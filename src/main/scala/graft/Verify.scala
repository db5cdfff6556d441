package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query timeout so one hung query cannot stall the whole gate:
    // the job group is confirmed set before any cancellation, and
    // cancellation is retried until the worker observes it
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT", "300").toLong
    // optional comma-separated subset for local iteration (the driver runs
    // the full map: it does not set this variable)
    val subset = sys.env.get("SPARK_GRAFT_VERIFY_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      // a REUSED outDir must not let last run's parquet mask a query that
      // newly throws before writing (the tripwire below counts a query
      // "produced" iff parquet exists — that has to mean THIS run's write)
      val stale = Paths.get(s"$outDir/$name")
      if (Files.isDirectory(stale)) {
        import scala.jdk.CollectionConverters._
        // Files.walk holds directory handles until closed — materialize
        // the path list under Using so the stream never leaks (one leaked
        // handle per query adds up across the 190+ gate queries)
        scala.util.Using.resource(Files.walk(stale))(
          _.iterator().asScala.toVector).reverse
          .foreach(p => Files.deleteIfExists(p))
      }
      val sc = spark.sparkContext
      val group = s"graft-verify-$name"
      val groupSet = new java.util.concurrent.CountDownLatch(1)
      // dedicated single-thread executor per query so a hung worker can be
      // INTERRUPTED after the cancel-retry budget: job-group cancellation
      // only reaches submitted Spark jobs, not driver-side hangs
      // (analysis/planning/non-interruptible code) — without the interrupt
      // an abandoned worker would keep running fn() (including its parquet
      // write) concurrently with later queries
      val exec = java.util.concurrent.Executors.newSingleThreadExecutor(
        (r: Runnable) => {
          val t = new Thread(r, s"verify-$name"); t.setDaemon(true); t
        })
      val fut = Future {
        sc.setJobGroup(group, name, interruptOnCancel = true)
        groupSet.countDown()
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        finally sc.clearJobGroup()
      }(ExecutionContext.fromExecutor(exec))
      try Await.result(fut, timeoutSec.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          System.err.println(s"[verify] $name timed out after ${timeoutSec}s")
          groupSet.await(10, java.util.concurrent.TimeUnit.SECONDS)
          var tries = 0
          while (!fut.isCompleted && tries < 100) {
            sc.cancelJobGroup(group)
            Thread.sleep(100)
            tries += 1
          }
          if (!fut.isCompleted) {
            System.err.println(
              s"[verify] $name ignored job-group cancellation — " +
                "interrupting and abandoning its worker thread")
            exec.shutdownNow() // interrupts the worker
          }
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally exec.shutdown()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // gate-count tripwire: a query that throws before writing output leaves
    // no parquet dir, and a downstream checker that iterates over produced
    // dirs would silently OMIT it rather than mark it failed (this masked
    // five red queries in round 9). Compare what was selected against what
    // actually landed on disk, record the delta machine-readably, and make
    // the absence impossible to miss in the log.
    val produced = selected.keySet.filter { n =>
      val d = new java.io.File(s"$outDir/$n")
      d.isDirectory && Option(d.list()).exists(_.exists(_.endsWith(".parquet")))
    }
    val missing = (selected.keySet -- produced).toSeq.sorted
    val status =
      s"""{"registered": ${SparkEntry.queries.size}, "selected": ${selected.size}, """ +
        s""""produced": ${produced.size}, "missing": ${missing.map(q).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/gate_status.json"), status)
    if (missing.nonEmpty) {
      System.err.println(
        s"[verify] GATE INCOMPLETE: ${missing.size} of ${selected.size} " +
          s"selected queries produced no output: ${missing.mkString(", ")}")
      System.out.println(s"[verify] GATE INCOMPLETE: missing ${missing.mkString(", ")}")
    } else
      System.out.println(
        s"[verify] gate complete: ${produced.size}/${selected.size} produced")
    // deliberately exit 0 even when incomplete: the driver compares whatever
    // landed on disk, and a nonzero exit could discard the queries that DID
    // pass. The red signal for builders is tools/check.py, which fails hard
    // on any registered-vs-produced gap via gate_status.json.
    spark.stop()
  }
}
