package graft.train

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Cardinality, JoinOperator}
import graft.opt.{QepSynopsis, TriePaths}
import graft.plans.QueryPlanOps

/** Persistable training-data corpora for learned optimizer stages
  * (reference: /root/reference/postbound/train/_train.py —
  * `TrainingSpec` :46, `TrainingData` :217, `TrainingDataRepository`
  * :463). The reference keeps samples as pandas frames on local disk;
  * here samples ARE Spark DataFrames and persistence is parquet — a
  * training corpus harvested from a 100 TB workload is itself a
  * distributed dataset, and reloading it costs one columnar scan.
  *
  * The canonical feature vocabulary matches the reference
  * (`TrainingFeature`, _train.py:25): "query", "runtime_ms",
  * "query_plan", "estimated_cost", "cardinality" — plus any custom
  * string, handled gracefully.
  */
object Training {
  val Query = "query"
  val RuntimeMs = "runtime_ms"
  val QueryPlan = "query_plan"
  val EstimatedCost = "estimated_cost"
  val CardinalityF = "cardinality"
}

/** The "shared language" binding datasets to the stages that train on
  * them (reference `TrainingSpec`, _train.py:46): a provider spec lists
  * what a dataset carries, a requirements spec what a stage needs;
  * `satisfies` reports the missing features (the reference's
  * `SpecViolations`).
  */
final case class TrainingSpec(features: Seq[String]) {
  val featureSet: Set[String] = features.toSet
  def provides(fs: Iterable[String]): Boolean = fs.forall(featureSet.contains)
  def requires(fs: Iterable[String]): Boolean = provides(fs)
  /** Features `other` requires that this spec does not provide. */
  def satisfies(other: TrainingSpec): Seq[String] =
    other.features.filterNot(featureSet.contains)
}

/** A dataset of training samples: tabular data plus a feature map from
  * canonical feature names to the columns that carry them (reference
  * `TrainingData`, _train.py:217 — the feature map handles renamed
  * columns exactly as there).
  */
final class TrainingData(
    val samples: DataFrame,
    val featureMap: Map[String, String],
    val source: Option[String] = None) {

  def spec: TrainingSpec = TrainingSpec(featureMap.keys.toSeq.sorted)
  def provides(feature: String): Boolean = featureMap.contains(feature)
  def satisfies(s: TrainingSpec): Seq[String] = spec.satisfies(s)

  /** Restrict/rename/reorder to exactly a spec's features (reference
    * `conform_to`, _train.py:372). Fails fast on missing features.
    */
  def conformTo(s: TrainingSpec): TrainingData = {
    val missing = satisfies(s)
    require(missing.isEmpty, s"dataset lacks features: $missing")
    new TrainingData(
      samples.select(s.features.map(f => col(featureMap(f)).as(f)): _*),
      s.features.map(f => f -> f).toMap, source)
  }

  /** Union with another dataset over the shared feature set (reference
    * `merge_with`, _train.py:423). */
  def mergeWith(other: TrainingData): TrainingData = {
    val shared = TrainingSpec(
      spec.features.filter(other.featureMap.contains))
    val a = conformTo(shared)
    val b = other.conformTo(shared)
    new TrainingData(a.samples.unionByName(b.samples), a.featureMap, None)
  }

  def asDf(s: Option[TrainingSpec] = None): DataFrame =
    s.map(conformTo(_).samples).getOrElse(samples)

  def count(): Long = samples.count()

  /** Persist as parquet; features travel as column names, so
    * [[TrainingData.fromParquet]] round-trips without a sidecar (the
    * reference's `from_df` infers features from columns the same way).
    */
  def persist(path: String): Unit =
    conformTo(spec).samples.write.mode("overwrite").parquet(path)
}

object TrainingData {
  /** Features inferred from column names (reference `from_df`). */
  def fromDf(df: DataFrame, source: Option[String] = None): TrainingData =
    new TrainingData(df, df.columns.map(c => c -> c).toMap, source)

  def fromParquet(spark: SparkSession, path: String): TrainingData =
    fromDf(spark.read.parquet(path), Some(path))

  /** Merge datasets under one spec (reference `merge`, _train.py:296). */
  def merge(datasets: Seq[TrainingData],
      accordingTo: TrainingSpec): TrainingData = {
    require(datasets.nonEmpty, "nothing to merge")
    datasets.reduce(_.mergeWith(_)).conformTo(accordingTo)
  }
}

/** Directory-backed dataset registry (reference `TrainingDataRepository`,
  * _train.py:463, plus persistence): `register` both records the dataset
  * and writes it under `root/<name>`; a FRESH repository over the same
  * root sees every previously persisted dataset — the warm-start
  * contract: run a workload once, reload in a new JVM, and learned
  * stages resume without re-executing anything.
  */
final class TrainingDataRepository(spark: SparkSession, root: String) {

  private def dirOf(name: String) = s"$root/$name"

  def register(name: String, data: TrainingData): TrainingDataRepository = {
    data.persist(dirOf(name))
    this
  }

  /** All persisted datasets, name-sorted (stable retrieval order). */
  def datasets: Seq[TrainingData] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(_.isDirectory).sortBy(_.getName)
      .map(d => TrainingData.fromParquet(spark, d.getAbsolutePath))

  def retrieveFirst(spec: TrainingSpec): Option[TrainingData] =
    datasets.find(_.satisfies(spec).isEmpty).map(_.conformTo(spec))

  def retrieveAll(spec: TrainingSpec): Seq[TrainingData] =
    datasets.filter(_.satisfies(spec).isEmpty)

  def retrieveMerged(spec: TrainingSpec): Option[TrainingData] = {
    val matching = retrieveAll(spec)
    if (matching.isEmpty) None
    else Some(TrainingData.merge(matching, spec))
  }
}

/** Builds training corpora from executed plans and replays them into
  * learned stages — the persistence bridge the reference's online
  * `learn_from_feedback` hooks lack on the Spark side. Sample shape: one
  * row per physical JOIN of an executed query with the TONIC-canonical
  * trie path, the executed operator, the ACTUAL output cardinality
  * (SQLMetric numOutputRows — noise-free, scale-independent) and the
  * query's wall time.
  */
object TrainingHarvest {
  import Training._

  /** Custom features carried alongside the canonical vocabulary. */
  val Label = "label"
  val JoinPath = "join_path"
  val TableSet = "table_set"
  val Operator = "operator"

  /** Per-join samples from an EXECUTED DataFrame (collect()/write must
    * have run so SQLMetrics are filled). Returns None when the plan has
    * no joins or no derivable join tree. Sample assembly is driver-side
    * by design: a query yields a handful of join rows (metrics, not
    * data), and they immediately become a distributed DataFrame.
    */
  def fromExecution(spark: SparkSession, label: String, sql: String,
      executed: DataFrame, runtimeMs: Double): Option[TrainingData] = {
    val ops = QueryPlanOps(executed)
    val operators = ops.joinOperators.map {
      case n if n.contains("BroadcastHashJoin") => JoinOperator.BroadcastHashJoin.name
      case n if n.contains("ShuffledHashJoin") => JoinOperator.HashJoin.name
      case n if n.contains("SortMergeJoin") => JoinOperator.SortMergeJoin.name
      case _ => JoinOperator.NestedLoopJoin.name
    }
    ops.joinTree.flatMap { tree =>
      val joins = TriePaths.joinsPreOrder(tree)
      if (joins.isEmpty) None
      else {
        import spark.implicits._
        val rows = joins.zip(operators).map { case (j, op) =>
          (label, sql, TriePaths.pathOf(j).mkString(" "),
            j.tableSet.toSeq.sorted.mkString("+"), op,
            if (j.annotation.isValid) j.annotation.value.toLong else -1L,
            runtimeMs,
            if (j.annotation.isValid) j.annotation.value else -1.0)
        }
        Some(TrainingData.fromDf(rows.toDF(Label, Query, JoinPath, TableSet,
          Operator, CardinalityF, RuntimeMs, EstimatedCost)))
      }
    }
  }

  /** The spec a TONIC warm start requires. */
  val tonicSpec: TrainingSpec =
    TrainingSpec(Seq(JoinPath, Operator, CardinalityF))

  /** Replay persisted samples into a fresh QEP-S (reference workflow:
    * seed the synopsis from an observed workload before TONIC starts
    * steering, tonic.py:1270 persists/loads the trie itself — here the
    * SAMPLES persist, so the same corpus can also train other stages).
    * Driver-side collect is deliberate: the corpus is per-join metric
    * rows, bounded by (queries x joins), not by data size.
    */
  def warmStartTonic(data: TrainingData): QepSynopsis = {
    val syn = new QepSynopsis
    val conformed = data.conformTo(tonicSpec)
    conformed.samples.collect().foreach { r =>
      val path = r.getString(0).split(' ').toSeq
      val op = JoinOperator.all.find(_.name == r.getString(1))
        .getOrElse(JoinOperator.HashJoin)
      val card = r.getLong(2)
      if (card >= 0) syn.recordCost(path, op, card.toDouble)
    }
    syn
  }

  /** Per-intermediate ACTUAL cardinalities from persisted samples — feeds
    * [[graft.opt.PreComputedCardinalities]] so BAO-style selection and DP
    * enumeration cost with observed truth instead of estimates. The last
    * observation per table set wins (latest run reflects current data).
    */
  def cardinalityLookup(data: TrainingData): Map[Set[String], Cardinality] = {
    val conformed = data.conformTo(TrainingSpec(Seq(TableSet, CardinalityF)))
    conformed.samples.collect().foldLeft(Map.empty[Set[String], Cardinality]) {
      (m, r) =>
        val card = r.getLong(1)
        if (card < 0) m
        else m.updated(r.getString(0).split('+').toSet, Cardinality(card.toDouble))
    }
  }
}
