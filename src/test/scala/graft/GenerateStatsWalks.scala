package graft

import org.apache.spark.sql.SparkSession

/** Emits generated Stats-kit walk queries (sw01+) into workloads/stats/
  * — `sbt "Test/runMain graft.GenerateStatsWalks <n> <firstIdx> <seed0>
  * [outDir] [maxPerSignature]"`.
  * Same validation contract as [[GenerateWalks]] (the JOB-kit widener):
  * every emitted query must parse, run NON-EMPTY within a wall cap on
  * sf0.01, expose a UES-optimizable equi-connected join block, and draw
  * a join-graph signature (table multiset + edge multiset) used by
  * fewer than `maxPerSignature` earlier stats-kit queries. The default
  * (1) demands distinct join graphs; the schema saturates near ~110
  * distinct walk graphs, so topping the kit up to the reference's
  * 146-query Stats-CEB breadth (workloads.py:1124-1149) uses
  * maxPerSignature=3 — which is also Stats-CEB's own shape: its 146
  * queries are correlated-FILTER variations over a modest set of join
  * graphs, not 146 distinct graphs. Re-used graphs must still differ in
  * full SQL text (seed-distinct filters), enforced by a text-hash set.
  * Seeds that fail any check are skipped; files carry their generating
  * seed in the header.
  */
object GenerateStatsWalks {
  def main(args: Array[String]): Unit = {
    val want = args.headOption.map(_.toInt).getOrElse(50)
    val firstIdx = args.lift(1).map(_.toInt).getOrElse(1)
    var seed = args.lift(2).map(_.toLong).getOrElse(5000L)
    val outDir = args.lift(3).getOrElse("/root/repo/workloads/stats")
    val maxPerSig = args.lift(4).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, "/root/testdata/sf0.01")
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val texts = scala.collection.mutable.Set.empty[String]
    // one normalization for BOTH sides of the text-dedup check (ADVICE
    // r15: existing files were comment-stripped while candidates were
    // raw-trimmed, so a candidate carrying comments or different blank
    // lines could slip past the freshness check)
    def normText(sql: String): String =
      sql.linesIterator.filterNot(_.trim.startsWith("--"))
        .map(_.trim).filter(_.nonEmpty).mkString("\n")
    val usedSeeds = scala.collection.mutable.Set.empty[Long]
    val seedRe = """_seed(\d+)\.sql$""".r
    new java.io.File("/root/repo/workloads/stats").listFiles()
      .filter(_.getName.endsWith(".sql")).sortBy(_.getName).foreach { f =>
        val sql = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        signatureOf(spark, sql).foreach(s => seen(s) = seen.getOrElse(s, 0) + 1)
        // the body below the "-- generated:" header lines, normalized
        texts += normText(sql)
        seedRe.findFirstMatchIn(f.getName).foreach(m =>
          usedSeeds += m.group(1).toLong)
      }
    // the 5 s sf0.01 wall rejects multiplicative blow-ups (low-ndv n:m
    // self joins can go quadratic): the kit executes at sf0.1 where the
    // same shape costs ~10-100x this
    def timedCount(sql: String, ms: Long): Option[Long] = {
      val group = s"genstats-${System.nanoTime()}"
      val task = new java.util.concurrent.FutureTask(
        new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            spark.sparkContext.setJobGroup(group, "walk validation",
              interruptOnCancel = true)
            try spark.sql(sql).head().getLong(0)
            finally spark.sparkContext.clearJobGroup()
          }
        })
      val th = new Thread(task); th.setDaemon(true); th.start()
      try Some(task.get(ms, java.util.concurrent.TimeUnit.MILLISECONDS))
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          task.cancel(true); None
        case _: Throwable => None
      }
    }
    var produced = 0
    while (produced < want && seed < 20000) {
      val sql =
        if (usedSeeds.contains(seed)) "" // already emitted by an earlier pass
        else graft.bench.QueryGenerator.statsWalkQuery(seed)
      val ok = sql.nonEmpty && (try {
        val n = timedCount(sql, 5000L)
        val sig = signatureOf(spark, sql)
        val fresh = sig.exists(s => seen.getOrElse(s, 0) < maxPerSig) &&
          !texts.contains(normText(sql))
        val connected = graft.qal.QueryFacade(spark, sql).joinBlock.exists {
          b => new graft.opt.JoinGraph(b, OptQueries.statsFor(spark,
            "/root/testdata/sf0.01")).isEquiConnected
        }
        if (n.exists(_ > 0) && fresh && connected) {
          sig.foreach(s => seen(s) = seen.getOrElse(s, 0) + 1)
          texts += normText(sql)
          true
        } else false
      } catch { case _: Throwable => false })
      if (ok) {
        val idx = firstIdx + produced
        val name = f"sw$idx%02d_walk_seed$seed"
        val header =
          s"""-- generated: QueryGenerator.statsWalkQuery(seed = $seed,
             |--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
             |--   over the stats activity/corpus schema; validated non-empty on sf0.01
             |""".stripMargin
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"),
          header + sql + "\n")
        println(s"emitted $name")
        produced += 1
      }
      seed += 1
    }
    require(produced == want, s"only $produced of $want emitted")
    spark.stop()
  }

  /** Join-graph signature: table-occurrence multiset + undirected edge
    * multiset over table names (alias-insensitive). */
  private def signatureOf(spark: SparkSession, sql: String): Option[String] =
    try graft.qal.QueryFacade(spark, sql).joinBlock.map { b =>
      val tableOf = b.tables.map(t => t.identifier -> t.fullName).toMap
      val tablesSig = b.tables.map(_.fullName).sorted.mkString(",")
      val edgesSig = b.joinConjuncts.filter(_.tables.size == 2)
        .map(c => c.tables.toSeq.map(a => tableOf.getOrElse(a, a)).sorted
          .mkString("~")).sorted.mkString(";")
      s"$tablesSig|$edgesSig"
    } catch { case _: Throwable => None }
}
