package graft.plans

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.core.{Cardinality, JoinOperator, TableRef}

/** JSON round-trip for join trees and operator assignments — the
  * reproducibility surface of the reference (read_query_plan_json /
  * jointree serialization, /root/reference/postbound/opt/_helpers.py:32-668):
  * optimizer decisions can be exported with benchmark results and replayed
  * later. Uses json4s (ships with Spark).
  */
object PlanJson {

  private def cardJson(c: Cardinality): JValue =
    if (c.isUnknown) JNull else JDouble(c.value)

  private def cardFrom(v: JValue): Cardinality = v match {
    case JDouble(d) => Cardinality(d)
    case JInt(i) => Cardinality(i.toDouble)
    case _ => Cardinality.unknown
  }

  def treeToJValue(tree: JoinTree[Cardinality]): JValue = tree match {
    case ScanNode(t, a) => JObject(
      "scan" -> JObject(
        "table" -> JString(t.fullName),
        "alias" -> t.alias.map(JString).getOrElse(JNull)),
      "cardinality" -> cardJson(a))
    case JoinNode(o, i, a) => JObject(
      "join" -> JObject(
        "outer" -> treeToJValue(o),
        "inner" -> treeToJValue(i)),
      "cardinality" -> cardJson(a))
  }

  def treeFromJValue(v: JValue): JoinTree[Cardinality] = v match {
    case JObject(fields) =>
      val m = fields.toMap
      val card = cardFrom(m.getOrElse("cardinality", JNull))
      m.get("scan") match {
        case Some(JObject(sf)) =>
          val sm = sf.toMap
          val name = sm("table") match { case JString(s) => s; case _ => "?" }
          val alias = sm.get("alias").collect { case JString(s) => s }
          ScanNode(TableRef(name, alias), card)
        case _ =>
          val JObject(jf) = m("join")
          val jm = jf.toMap
          JoinNode(treeFromJValue(jm("outer")), treeFromJValue(jm("inner")), card)
      }
    case other => throw new IllegalArgumentException(s"not a join tree: $other")
  }

  def toJson(tree: JoinTree[Cardinality]): String =
    JsonMethods.compact(JsonMethods.render(treeToJValue(tree)))

  def fromJson(s: String): JoinTree[Cardinality] =
    treeFromJValue(JsonMethods.parse(s))

  def operatorsToJson(ops: PhysicalOperatorAssignment): String = {
    val joins = JArray(ops.joinOperators.toList.sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (ts, op) => JObject(
        "tables" -> JArray(ts.toList.sorted.map(JString)),
        "operator" -> JString(op.name)) })
    JsonMethods.compact(JsonMethods.render(JObject(
      "join_operators" -> joins,
      "disabled" -> JArray(ops.disabledJoinOps.toList.map(_.name).sorted
        .map(JString(_))),
      "default" -> ops.defaultJoin.map(o => JString(o.name)).getOrElse(JNull))))
  }

  def operatorsFromJson(s: String): PhysicalOperatorAssignment = {
    def opOf(name: String): JoinOperator =
      JoinOperator.all.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"unknown operator $name"))
    val JObject(fields) = JsonMethods.parse(s)
    val m = fields.toMap
    val joins = m.get("join_operators") match {
      case Some(JArray(items)) => items.map {
        case JObject(jf) =>
          val jm = jf.toMap
          val ts = jm("tables") match {
            case JArray(vs) => vs.collect { case JString(t) => t }.toSet
            case _ => Set.empty[String]
          }
          val JString(op) = jm("operator")
          ts -> opOf(op)
        case other => throw new IllegalArgumentException(s"bad entry $other")
      }.toMap
      case _ => Map.empty[Set[String], JoinOperator]
    }
    val disabled = m.get("disabled") match {
      case Some(JArray(vs)) => vs.collect { case JString(n) => opOf(n) }.toSet
      case _ => Set.empty[JoinOperator]
    }
    val default = m.get("default").collect { case JString(n) => opOf(n) }
    PhysicalOperatorAssignment(joins, Map.empty, disabled, default)
  }

  /** PlanParameterization round-trip (reference: PlanParameterization in
    * the exported plan JSON, _hints.py:632 + _helpers.py) — cardinality
    * hints, worker count, and pinned session configs survive export. */
  def parametersToJson(p: PlanParameterization): String = {
    val hints = JArray(p.cardinalityHints.toList
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (ts, c) => JObject(
        "tables" -> JArray(ts.toList.sorted.map(JString)),
        "cardinality" -> cardJson(c)) })
    JsonMethods.compact(JsonMethods.render(JObject(
      "cardinality_hints" -> hints,
      "parallel_workers" -> p.parallelWorkers.map(w => JInt(BigInt(w)))
        .getOrElse(JNull),
      "session_configs" -> JObject(p.sessionConfigs.toList.sorted
        .map { case (k, v) => k -> JString(v) }))))
  }

  def parametersFromJson(s: String): PlanParameterization = {
    val JObject(fields) = JsonMethods.parse(s)
    val m = fields.toMap
    val hints = m.get("cardinality_hints") match {
      case Some(JArray(items)) => items.map {
        case JObject(hf) =>
          val hm = hf.toMap
          val ts = hm("tables") match {
            case JArray(vs) => vs.collect { case JString(t) => t }.toSet
            case _ => Set.empty[String]
          }
          ts -> cardFrom(hm.getOrElse("cardinality", JNull))
        case other => throw new IllegalArgumentException(s"bad hint $other")
      }.toMap
      case _ => Map.empty[Set[String], Cardinality]
    }
    val workers = m.get("parallel_workers").collect { case JInt(i) => i.toInt }
    val configs = m.get("session_configs") match {
      case Some(JObject(cf)) => cf.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    PlanParameterization(hints, workers, configs)
  }
}
