package graft.bench

import scala.collection.mutable

/** CEB-style template-driven workload generation (reference:
  * /root/reference/postbound/experiments/ceb.py — `PredicateGenerator`
  * :81, `QueryTemplate` :486, `_parse_template_toml` :679,
  * `generate_raw_workload` :720, `generate_workload` :799; the algorithm
  * is from Negi et al., "Flow-Loss: Learning Cardinality Estimates That
  * Matter", PVLDB 2021).
  *
  * A template is a SQL skeleton with `<<placeholder>>` slots plus a set of
  * named predicate generators. Each generator draws substitution values for
  * its placeholders from either a static options list or a candidate SQL
  * query (which may itself reference values drawn by generators it depends
  * on), with uniform or weighted sampling, then the skeleton is
  * instantiated with properly escaped literals (quotes for strings,
  * `%v%` for LIKE/ILIKE, parenthesized lists for IN). Workload generation
  * repeats per template until the requested number of UNIQUE queries
  * exists.
  *
  * Differences from the reference, deliberate:
  *  - Determinism is a contract, not an accident: every random draw goes
  *    through one seeded `java.util.Random`, candidate sets are
  *    deduplicated preserving first-occurrence order (the reference's
  *    `set()` has no stable order), so a (templates, seed) pair always
  *    yields the same workload — which is what lets the generated gate
  *    query carry a DuckDB oracle.
  *  - Templates are YAML documents (same structure as the reference's
  *    TOML; TOML needs a parser this container does not ship, YAML rides
  *    on Spark's jackson-dataformat-yaml).
  *  - Literal escaping derives from the VALUE's runtime type instead of a
  *    live DB schema lookup (ceb.py `_escape_col_value` :645 consults
  *    `schema().datatype`); template authors pass dates as strings, which
  *    both Spark and DuckDB coerce in comparisons against date/timestamp
  *    columns.
  *  - Constraint failures restart the whole template draw (the reference
  *    re-draws the failing generator and its dependency closure); the
  *    retry budget is equivalent and the restart keeps the dependency
  *    state machine trivial.
  */
object Ceb {

  final class SamplingError(msg: String) extends RuntimeException(msg)

  /** One predicate generator — field names follow the reference TOML keys
    * (ceb.py :693-716). `countColumnIdx` is 1-based like the reference's
    * `count_column`. For `templateType = "sql"` the candidate query may
    * contain `<<key>>` placeholders provided by `dependencies`.
    */
  final case class Predicate(
      name: String,
      keys: Seq[String],
      templateType: String,
      samplingMethod: String,
      predTypes: Seq[String],
      columns: Seq[String],
      sqlQuery: Option[String] = None,
      options: Seq[Seq[Any]] = Nil,
      inMinSamples: Int = 1,
      inMaxSamples: Option[Int] = None,
      countColumnIdx: Option[Int] = None,
      dependencies: Seq[String] = Nil) {
    require(templateType == "sql" || templateType == "list",
      s"unknown template type '$templateType' for predicate '$name'")
    require(samplingMethod == "uniform" || samplingMethod == "weighted",
      s"unknown sampling method '$samplingMethod' for predicate '$name'")
    require(keys.length == predTypes.length && keys.length == columns.length,
      s"keys/pred_type/columns arity mismatch in predicate '$name'")
    require(!predTypes.contains("IN") || keys.length == 1,
      s"IN predicates must compute a single placeholder ('$name')")
    require(templateType != "sql" || sqlQuery.nonEmpty,
      s"sql-typed predicate '$name' needs a query")
    require(templateType != "list" || options.nonEmpty,
      s"list-typed predicate '$name' needs options")
  }

  /** A query template: label, `<<placeholder>>`-bearing SQL skeleton, and
    * its predicate generators. `candidateSql` executes a candidate-value
    * query for sql-typed predicates (wire it to `spark.sql(...).collect`
    * over registered views); list-only templates never call it.
    */
  final class Template(
      val label: String,
      val baseSql: String,
      val predicates: Seq[Predicate],
      candidateSql: String => Seq[Seq[Any]] =
        _ => throw new SamplingError("no candidate-SQL backend wired"),
      maxTries: Int = 10) {

    private val byName = predicates.map(p => p.name -> p).toMap
    require(byName.size == predicates.size,
      s"duplicate predicate names in template '$label'")
    predicates.flatMap(_.dependencies).foreach(d =>
      require(byName.contains(d), s"unknown dependency '$d' in '$label'"))

    /** Generators in dependency order (reference: DependencyGraph
      * iteration in `generate_raw_query`, ceb.py :600-609).
      */
    private val topoOrder: Seq[Predicate] = {
      val seen = mutable.LinkedHashSet.empty[String]
      val visiting = mutable.Set.empty[String]
      def visit(p: Predicate): Unit = {
        if (!seen.contains(p.name)) {
          require(visiting.add(p.name), s"dependency cycle at '${p.name}'")
          p.dependencies.foreach(d => visit(byName(d)))
          visiting.remove(p.name)
          seen += p.name
        }
      }
      predicates.foreach(visit)
      seen.toSeq.map(byName)
    }

    /** Instantiate the skeleton once: draw every generator in dependency
      * order, substitute placeholders. Restarts the whole draw on a
      * constraint violation, up to `maxTries * predicates` attempts.
      */
    def generateRawQuery(rnd: java.util.Random): String = {
      val budget = math.max(maxTries * math.max(predicates.size, 1), 1)
      var attempt = 0
      while (true) {
        attempt += 1
        try return drawOnce(rnd)
        catch {
          case e: SamplingError if attempt < budget => // redraw everything
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def drawOnce(rnd: java.util.Random): String = {
      // placeholder -> (escaped literal, raw value) as generators resolve
      val chosen = mutable.Map.empty[String, String]
      topoOrder.foreach { p =>
        val candidates: Seq[Seq[Any]] = p.templateType match {
          case "list" => p.options
          case "sql" =>
            val q = substitute(p.sqlQuery.get, chosen)
            val rows = candidateSql(q)
            if (rows.isEmpty)
              throw new SamplingError(s"no candidate values for '${p.name}'")
            rows
        }
        if (p.predTypes == Seq("IN")) {
          val vs = drawMulti(p, candidates, rnd)
          chosen(p.keys.head) =
            vs.map(v => escape(v, "=")).mkString("(", ", ", ")")
        } else {
          val tuple = drawScalar(p, candidates, rnd)
          p.keys.zipWithIndex.foreach { case (k, i) =>
            chosen(k) = escape(tuple(i), p.predTypes(i))
          }
        }
      }
      substitute(baseSql, chosen)
    }

    private def substitute(sql: String, values: mutable.Map[String, String]): String =
      values.foldLeft(sql) { case (q, (k, v)) => q.replace(s"<<$k>>", v) }

    /** Scalar draw (reference `_draw_scalar_value` ceb.py :349): uniform
      * dedupes candidates first (duplicates must not bias the draw);
      * weighted uses the explicit weight column when given, else
      * occurrence counts (= drawing from the raw list uniformly).
      */
    private def drawScalar(p: Predicate, candidates: Seq[Seq[Any]],
        rnd: java.util.Random): Seq[Any] = p.samplingMethod match {
      case "uniform" =>
        val uniq = dedupe(candidates)
        uniq(rnd.nextInt(uniq.size))
      case "weighted" =>
        p.countColumnIdx match {
          case Some(ci) =>
            val weights = candidates.map(t => toWeight(t(ci - 1)))
            val picked = weightedIndex(weights, rnd)
            dropIndex(candidates(picked), ci - 1)
          case None =>
            candidates(rnd.nextInt(candidates.size))
        }
    }

    /** IN draw (reference `_draw_multi_values` ceb.py :387): choose a size
      * uniformly in [min, max] (max clamped to the distinct population),
      * then sample that many distinct values without replacement —
      * weighted sampling removes each winner and renormalizes.
      */
    private def drawMulti(p: Predicate, candidates: Seq[Seq[Any]],
        rnd: java.util.Random): Seq[Any] = {
      val (population, weights) = p.countColumnIdx match {
        case Some(ci) =>
          (candidates.map(t => dropIndex(t, ci - 1).head),
            candidates.map(t => toWeight(t(ci - 1))))
        case None =>
          val counts = mutable.LinkedHashMap.empty[Any, Double]
          candidates.foreach { t =>
            counts(t.head) = counts.getOrElse(t.head, 0.0) + 1.0
          }
          (counts.keys.toSeq, counts.values.toSeq)
      }
      val distinct =
        if (p.samplingMethod == "uniform") dedupe(population.map(Seq(_))).map(_.head)
        else population
      val maxN = math.min(p.inMaxSamples.getOrElse(distinct.size), distinct.size)
      if (distinct.size < p.inMinSamples)
        throw new SamplingError(
          s"only ${distinct.size} candidates for IN predicate '${p.name}'")
      val n = p.inMinSamples + rnd.nextInt(maxN - p.inMinSamples + 1)
      if (p.samplingMethod == "uniform") {
        val pool = mutable.ArrayBuffer(distinct: _*)
        Seq.fill(n)(pool.remove(rnd.nextInt(pool.size)))
      } else {
        val pool = mutable.ArrayBuffer(population.zip(weights): _*)
        Seq.fill(n) {
          val i = weightedIndex(pool.map(_._2).toSeq, rnd)
          pool.remove(i)._1
        }
      }
    }

    private def dedupe(ts: Seq[Seq[Any]]): Seq[Seq[Any]] = {
      val seen = mutable.LinkedHashSet.empty[Seq[Any]]
      ts.foreach(seen.add)
      seen.toSeq
    }

    private def dropIndex(t: Seq[Any], i: Int): Seq[Any] =
      t.zipWithIndex.collect { case (v, j) if j != i => v }

    private def toWeight(v: Any): Double = v match {
      case n: Number => n.doubleValue()
      case other => throw new SamplingError(s"non-numeric weight '$other'")
    }

    private def weightedIndex(weights: Seq[Double], rnd: java.util.Random): Int = {
      val total = weights.sum
      if (total <= 0) throw new SamplingError("non-positive weight total")
      var r = rnd.nextDouble() * total
      var i = 0
      while (i < weights.size - 1 && r >= weights(i)) { r -= weights(i); i += 1 }
      i
    }

    /** Literal escaping (reference `_escape_col_value` ceb.py :645):
      * strings are quoted (with `''` doubling), LIKE/ILIKE values get
      * surrounding wildcards, everything else renders as-is.
      */
    private def escape(v: Any, predType: String): String = v match {
      case s: String =>
        val payload = predType match {
          case "LIKE" | "ILIKE" => s"%$s%"
          case _ => s
        }
        "'" + payload.replace("'", "''") + "'"
      case other => String.valueOf(other)
    }
  }

  /** Parse one YAML template document (structure mirrors the reference
    * TOML, ceb.py :679-718: `title`, `base_sql.sql`, `predicates[]` with
    * name/keys/type/sampling_method/pred_type/columns/sql/options/
    * min_samples/max_samples/count_column/dependencies).
    */
  def parseTemplate(yaml: String,
      candidateSql: String => Seq[Seq[Any]] =
        _ => throw new SamplingError("no candidate-SQL backend wired")): Template = {
    import com.fasterxml.jackson.databind.JsonNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper.readTree(yaml)
    def scalar(n: JsonNode): Any =
      if (n.isTextual) n.asText
      else if (n.isIntegralNumber) n.asLong
      else if (n.isBoolean) n.asBoolean
      else if (n.isNumber) n.asDouble
      else throw new IllegalArgumentException(s"unsupported YAML value $n")
    def strings(n: JsonNode): Seq[String] = {
      val it = n.elements(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().asText
      b.result()
    }
    def elems(n: JsonNode): Seq[JsonNode] = {
      val it = n.elements(); val b = Seq.newBuilder[JsonNode]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val preds = elems(root.get("predicates")).map { p =>
      def opt(field: String): Option[JsonNode] = Option(p.get(field))
      Predicate(
        name = p.get("name").asText,
        keys = strings(p.get("keys"))
          .map(_.stripPrefix("<<").stripSuffix(">>")),
        templateType = p.get("type").asText,
        samplingMethod = p.get("sampling_method").asText,
        predTypes = strings(p.get("pred_type")),
        columns = strings(p.get("columns")),
        sqlQuery = opt("sql").map(_.asText),
        options = opt("options").map(o => elems(o).map { t =>
          if (t.isArray) elems(t).map(scalar) else Seq(scalar(t))
        }).getOrElse(Nil),
        inMinSamples = opt("min_samples").map(_.asInt).getOrElse(1),
        inMaxSamples = opt("max_samples").map(_.asInt),
        countColumnIdx = opt("count_column").map(_.asInt),
        dependencies = opt("dependencies").map(strings).getOrElse(Nil))
    }
    new Template(root.get("title").asText,
      root.get("base_sql").get("sql").asText, preds, candidateSql)
  }

  /** Load every `*.yaml` template in a directory, lexicographic order
    * (reference `generate_raw_workload` globs `*.toml`).
    */
  def templatesFromDirectory(dir: String,
      candidateSql: String => Seq[Seq[Any]] =
        _ => throw new SamplingError("no candidate-SQL backend wired")): Seq[Template] = {
    val files = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".yaml")).sortBy(_.getName)
    require(files.nonEmpty, s"no *.yaml templates under $dir")
    files.map(f => parseTemplate(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8), candidateSql))
  }

  /** Store a generated workload one `<label>.sql` file per query
    * (reference `persist_workload`, ceb.py :825-840) — the on-disk shape
    * [[Workload.fromDirectory]] loads, so generated workloads round-trip
    * through the same kit loaders as JOB/SSB/Stack.
    */
  def persistWorkload(dir: String, workload: Seq[(String, String)]): Unit = {
    val root = new java.io.File(dir)
    root.mkdirs()
    workload.foreach { case (label, sql) =>
      java.nio.file.Files.write(
        root.toPath.resolve(s"$label.sql"),
        (sql.trim + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Generate `queriesPerTemplate` UNIQUE queries per template (reference
    * `generate_raw_workload` ceb.py :720-795: global dedup set, shared
    * retry budget, labels `template-idx`). Deterministic in (templates,
    * seed).
    */
  def generateWorkload(templates: Seq[Template], queriesPerTemplate: Int,
      seed: Long): Seq[(String, String)] = {
    val rnd = new java.util.Random(seed)
    val maxTries = math.max(templates.size * queriesPerTemplate * 10, 10)
    val seen = mutable.Set.empty[String]
    val out = Seq.newBuilder[(String, String)]
    templates.foreach { t =>
      var generated = 0
      var tries = 0
      while (generated < queriesPerTemplate && tries <= maxTries) {
        tries += 1
        val q = t.generateRawQuery(rnd)
        if (!seen.contains(q)) {
          seen += q
          generated += 1
          out += (s"${t.label}-$generated" -> q)
        } else if (tries == maxTries)
          throw new SamplingError(
            s"could not generate $queriesPerTemplate unique queries for '${t.label}'")
      }
    }
    out.result()
  }
}
