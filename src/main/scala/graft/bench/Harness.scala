package graft.bench

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** An ordered label -> SQL workload, port of the reference's Workload
  * container (/root/reference/postbound/workloads.py:92-648).
  */
final case class Workload(name: String, queries: ListMap[String, String]) {
  def size: Int = queries.size
  def labels: Seq[String] = queries.keys.toSeq
  def first(n: Int): Workload = Workload(name, ListMap(queries.take(n).toSeq: _*))
  def filterBy(p: (String, String) => Boolean): Workload =
    Workload(name, queries.filter { case (l, q) => p(l, q) })
  def shuffle(seed: Long): Workload = {
    val rnd = new scala.util.Random(seed)
    Workload(name, ListMap(rnd.shuffle(queries.toSeq): _*))
  }
  def pickRandom(seed: Long): (String, String) = {
    val rnd = new scala.util.Random(seed)
    queries.toSeq(rnd.nextInt(queries.size))
  }
  /** Random sub-workload of n queries (reference: Workload.pick_random,
    * used for train/test splits in the learned-optimizer workflow). */
  def pickRandomN(n: Int, seed: Long): Workload = {
    val rnd = new scala.util.Random(seed)
    Workload(name, ListMap(rnd.shuffle(queries.toSeq).take(n).sortBy(_._1): _*))
  }
  /** Set difference by label (reference: `workload - other`). */
  def minus(other: Workload): Workload =
    Workload(name, queries.filter { case (l, _) => !other.queries.contains(l) })
}

object Workload {
  /** Load `<label>.sql` files from a directory (reference: read_workload,
    * workloads.py:657). */
  def fromDirectory(name: String, dir: String): Workload = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".sql")).sortBy(_.getName)
    Workload(name, ListMap(files.toSeq.map { f =>
      f.getName.stripSuffix(".sql") ->
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    }: _*))
  }

  /** label;query CSV (reference: read_csv_workload, workloads.py:801).
    * Lines without the separator are skipped rather than crashing the load.
    */
  def fromCsv(name: String, path: String, sep: Char = ';'): Workload = {
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    Workload(name, ListMap(lines.filter(_.nonEmpty).flatMap { l =>
      val i = l.indexOf(sep)
      if (i < 0) None else Some(l.substring(0, i) -> l.substring(i + 1))
    }: _*))
  }

  def inline(name: String, qs: (String, String)*): Workload =
    Workload(name, ListMap(qs: _*))
}

/** One query execution's outcome — the reference's result-column contract
  * (label, status, exec_time, result rows, failure reason, repetition
  * indices; /root/reference/postbound/bench.py:1093-1112). `opt_time_ms`
  * is the optimization phase (plan construction through the configured
  * optimizer) separated from execution wall time, the reference's
  * optimization-time vs exec-time split in the same contract.
  */
final case class ExecutionResult(label: String, status: String,
    exec_time: Double, opt_time_ms: Double, result_rows: Long,
    failure_reason: String, workload_repetition: Int, query_repetition: Int)

/** Repeatable measurement harness, port of bench.execute_workload
  * (/root/reference/postbound/bench.py:1019-1235): workload x repetitions,
  * optional shuffling, optional per-query timeout implemented with Spark
  * job-group cancellation (the reference uses a worker process; Spark's
  * native cancellation replaces it, SURVEY §4 timeouts row).
  */
object BenchHarness {

  /** @param progressTo when set, every completed query appends one NDJSON
    *   line (the [[ExecutionResult]] fields) to this file as it finishes —
    *   the reference's progressive output mode (bench.py:1076-1080: long
    *   benchmark runs must leave partial results behind on a crash or
    *   kill, not lose hours of measurements). Append + flush per line;
    *   a pre-existing file is truncated at workload start.
    */
  def executeWorkload(spark: SparkSession, workload: Workload,
      workloadRepetitions: Int = 1, perQueryRepetitions: Int = 1,
      shuffled: Boolean = false, timeoutSec: Option[Double] = None,
      optimizer: String => DataFrame = null,
      onExecuted: (String, DataFrame, ExecutionResult) => Unit = null,
      harvest: Option[graft.train.TrainingDataRepository] = None,
      progressTo: Option[String] = None):
      Seq[ExecutionResult] = {
    val runQuery: String => DataFrame =
      Option(optimizer).getOrElse((sql: String) => spark.sql(sql))
    progressTo.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "")
    }
    def progress(r: ExecutionResult): ExecutionResult = {
      progressTo.foreach { p =>
        try java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
          resultJson(r) + "\n", java.nio.file.StandardOpenOption.APPEND)
        catch { case e: Throwable =>
          System.err.println(s"[harness] progressive write failed: ${e.getMessage}")
        }
      }
      r
    }
    (1 to workloadRepetitions).flatMap { wrep =>
      val wl = if (shuffled) workload.shuffle(seed = wrep.toLong) else workload
      wl.queries.toSeq.flatMap { case (label, sql) =>
        (1 to perQueryRepetitions).map { qrep =>
          progress {
          val tOpt = System.nanoTime()
          val df = try Right(runQuery(sql)) catch {
            case e: Throwable => Left(e)
          }
          val optMs = (System.nanoTime() - tOpt) / 1e6
          df match {
            case Left(e) =>
              ExecutionResult(label, "optimization-error", -1.0, optMs, -1L,
                String.valueOf(e.getMessage), wrep, qrep)
            case Right(frame) =>
              val t0 = System.nanoTime()
              try {
                val rows = timeoutSec match {
                  case Some(limit) => runWithTimeout(spark, frame, label, limit)
                  case None => frame.count()
                }
                val r = ExecutionResult(label, "ok",
                  (System.nanoTime() - t0) / 1e9, optMs, rows, "", wrep, qrep)
                // post-execution hook (reference exec_callback +
                // learn_from_feedback call site, bench.py:1014): the frame
                // has been executed, so its SQLMetrics carry actuals —
                // wire `pipeline.learnFromFeedback` through this to close
                // the online-learning loop
                if (onExecuted != null) onExecuted(sql, frame, r)
                // accumulate per-query training samples into a run-scoped
                // repository (reference: the repository fills from
                // benchmark runs, _train.py:463 + the bench.py learn
                // hooks). Queries without joins yield no samples.
                harvest.foreach { repo =>
                  graft.train.TrainingHarvest.fromExecution(spark, label,
                      sql, frame, r.exec_time * 1000)
                    .foreach(d => repo.register(
                      s"${workload.name}-$label-rep$wrep.$qrep", d))
                }
                r
              } catch {
                case _: java.util.concurrent.TimeoutException =>
                  ExecutionResult(label, "timeout",
                    (System.nanoTime() - t0) / 1e9, optMs,
                    -1L, s"exceeded ${timeoutSec.get}s", wrep, qrep)
                case e: Throwable =>
                  ExecutionResult(label, "execution-error",
                    (System.nanoTime() - t0) / 1e9, optMs, -1L,
                    String.valueOf(e.getMessage), wrep, qrep)
              }
          }
          }
        }
      }
    }
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def resultJson(r: ExecutionResult): String =
    s"""{"label":${jstr(r.label)},"status":${jstr(r.status)},"exec_time":${r.exec_time},""" +
      s""""opt_time_ms":${r.opt_time_ms},""" +
      s""""result_rows":${r.result_rows},"failure_reason":${jstr(r.failure_reason)},""" +
      s""""workload_repetition":${r.workload_repetition},"query_repetition":${r.query_repetition}}"""

  /** Run an action under a job group; cancel the group on timeout.
    *
    * The group is set on the worker thread and a latch confirms it before
    * any cancellation (otherwise a fast timeout could cancel before
    * setJobGroup ran, leaving the query uncancelled). Cancellation is
    * retried until the worker completes because cancelJobGroup only
    * affects jobs already submitted — a job submitted just after a cancel
    * would otherwise survive and leak the worker thread.
    */
  private def runWithTimeout(spark: SparkSession, df: DataFrame,
      label: String, limitSec: Double): Long = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val group = s"graft-bench-$label-${System.identityHashCode(df)}"
    val sc = spark.sparkContext
    val groupSet = new java.util.concurrent.CountDownLatch(1)
    val fut = Future {
      sc.setJobGroup(group, label, interruptOnCancel = true)
      groupSet.countDown()
      try df.count() finally sc.clearJobGroup()
    }
    try Await.result(fut, limitSec.seconds)
    catch {
      case e: java.util.concurrent.TimeoutException =>
        groupSet.await(10, java.util.concurrent.TimeUnit.SECONDS)
        var tries = 0
        while (!fut.isCompleted && tries < 100) {
          sc.cancelJobGroup(group)
          Thread.sleep(100)
          tries += 1
        }
        throw e
    }
  }

  /** Concurrent workload execution with a bounded pool — the analog of the
    * reference's ParallelQueryExecutor (postgres.py:3330: a thread pool of
    * database connections draining a query queue). Spark's scheduler
    * accepts concurrent jobs from multiple driver threads, so the pool
    * here is `poolSize` submitter threads; each query runs under its own
    * job group (`graft-par-<label>`), so an individual in-flight query
    * stays cancellable via [[cancelQuery]] without touching its
    * neighbours. Results come back in workload order regardless of
    * completion order. At cluster scale pair this with the FAIR scheduler
    * pool config so one heavy query cannot starve the rest.
    */
  def executeWorkloadParallel(spark: SparkSession, workload: Workload,
      poolSize: Int, optimizer: String => DataFrame = null,
      harvest: Option[graft.train.TrainingDataRepository] = None):
      Seq[ExecutionResult] = {
    require(poolSize > 0)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val runQuery: String => DataFrame =
      Option(optimizer).getOrElse((sql: String) => spark.sql(sql))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = workload.queries.toSeq.map { case (label, sql) =>
        Future {
          val sc = spark.sparkContext
          // job group is thread-local: set per task because pool threads
          // are reused across queries
          sc.setJobGroup(s"graft-par-$label", label, interruptOnCancel = true)
          try {
            val tOpt = System.nanoTime()
            val frame = runQuery(sql)
            val optMs = (System.nanoTime() - tOpt) / 1e6
            val t0 = System.nanoTime()
            val rows = frame.count()
            val execSec = (System.nanoTime() - t0) / 1e9
            harvest.foreach { repo =>
              // distinct per-label dirs → safe from concurrent submitters
              graft.train.TrainingHarvest.fromExecution(spark, label, sql,
                  frame, execSec * 1000)
                .foreach(d => repo.register(s"${workload.name}-$label", d))
            }
            ExecutionResult(label, "ok", execSec, optMs, rows, "", 1, 1)
          } catch {
            case e: Throwable =>
              ExecutionResult(label, "execution-error", -1.0, -1.0, -1L,
                String.valueOf(e.getMessage), 1, 1)
          } finally sc.clearJobGroup()
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }

  /** Cancel one in-flight query of [[executeWorkloadParallel]] by label. */
  def cancelQuery(spark: SparkSession, label: String): Unit =
    spark.sparkContext.cancelJobGroup(s"graft-par-$label")

  /** Results as a DataFrame (the reference exports a pandas frame). */
  def resultsToDf(spark: SparkSession, rs: Seq[ExecutionResult]): DataFrame = {
    import spark.implicits._
    rs.toDF()
  }

  /** Reproducibility export: results + workload + stage descriptions as one
    * JSON document (reference: prepare_export, bench.py:1236-1276 — every
    * measurement ships with the optimizer configuration that produced it).
    */
  def exportJson(workload: Workload, rs: Seq[ExecutionResult],
      stageDescribe: String = "{}"): String = {
    def q(s: String): String = jstr(s)
    val results = rs.map(resultJson).mkString("[", ",", "]")
    val queries = workload.queries.map { case (l, sql) =>
      s"${q(l)}:${q(sql)}" }.mkString("{", ",", "}")
    s"""{"workload":${q(workload.name)},"queries":$queries,""" +
      s""""stages":$stageDescribe,"results":$results}"""
  }
}
