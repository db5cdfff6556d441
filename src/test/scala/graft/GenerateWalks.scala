package graft

import org.apache.spark.sql.SparkSession

/** Emits the aliased FK random-walk kit queries (gw21+) into
  * workloads/job/ — `sbt "Test/runMain graft.GenerateWalks <n> <firstIdx>
  * <seed0>"`. Every emitted query is validated on sf0.01: it must parse,
  * run NON-EMPTY (count > 0), expose a UES-optimizable equi-connected
  * join block, and draw a join-graph SIGNATURE (table multiset + edge
  * multiset) no earlier emission used — the structural-diversity
  * property the r12 batch lacked (20 queries over one shared 7-table
  * graph). Seeds that fail any check are skipped, so the files carry
  * their true generating seed in the provenance header.
  */
object GenerateWalks {
  def main(args: Array[String]): Unit = {
    val want = args.headOption.map(_.toInt).getOrElse(26)
    val firstIdx = args.lift(1).map(_.toInt).getOrElse(21)
    var seed = args.lift(2).map(_.toLong).getOrElse(100L)
    // emission target (default: the kit itself); a staging dir lets new
    // queries be generated while a bench that globs workloads/job runs
    val outDir = args.lift(3).getOrElse("/root/repo/workloads/job")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, "/root/testdata/sf0.01")
    val seen = scala.collection.mutable.Set.empty[String]
    // existing kit signatures count as taken (the r12 shared graph)
    new java.io.File("/root/repo/workloads/job").listFiles()
      .filter(_.getName.endsWith(".sql")).sortBy(_.getName).foreach { f =>
        val sql = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        signatureOf(spark, sql).foreach(seen += _)
      }
    // aliased walks can draw multiplicative fan-outs (several child
    // aliases off one hub with no selective filter) whose count(*) is
    // astronomically large — such a query would also poison the kit
    // specs, so validation REJECTS any seed whose sf0.01 count cannot
    // finish in 5 s (the kit executes at sf0.1 = 10x the data)
    def timedCount(sql: String, ms: Long): Option[Long] = {
      val group = s"genwalk-${System.nanoTime()}"
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
    while (produced < want && seed < 3000) {
      val crossOr = produced % 3 == 2
      val withEvents = produced % 4 == 3
      val sql = graft.bench.QueryGenerator.aliasWalkQuery(seed,
        crossOrFilter = crossOr, includeEvents = withEvents)
      val ok = try {
        val n = timedCount(sql, 5000L)
        val sig = signatureOf(spark, sql)
        val fresh = sig.exists(s => !seen.contains(s))
        val connected = graft.qal.QueryFacade(spark, sql).joinBlock.exists {
          b => new graft.opt.JoinGraph(b, OptQueries.statsFor(spark,
            "/root/testdata/sf0.01")).isEquiConnected
        }
        if (n.exists(_ > 0) && fresh && connected) {
          sig.foreach(seen += _); true
        } else false
      } catch { case _: Throwable => false }
      if (ok) {
        val idx = firstIdx + produced
        val name = f"gw$idx%02d_alias_seed$seed"
        val header =
          s"""-- generated: QueryGenerator.aliasWalkQuery(seed = $seed,
             |--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
             |--   crossOrFilter = $crossOr, includeEvents = $withEvents)
             |--   over FixtureValueSource; validated non-empty on sf0.01
             |""".stripMargin
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"),
          header + sql + "\n")
        println(s"emitted $name (crossOr=$crossOr events=$withEvents)")
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
