package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 merge — the warehouse upsert that
  * keeps full attribute history: an incoming update for a key closes the
  * key's open row (sets its `valid_to`) and appends a new open row, while
  * updates that change nothing, keys without updates, and already-closed
  * history rows pass through untouched.
  *
  * Spark has no MERGE INTO over plain parquet, so the operator is composed
  * from equality joins and one union — exactly the decomposition a MERGE
  * would plan: every join is on the dimension key (hash-partitioned, AQE
  * broadcasts the update side when it is small, the common case — a day's
  * updates vs years of dimension history), and nothing touches the closed
  * rows except the final union. No window, no sort, no driver-side state:
  * the merge scales with the dimension like any other equi-join.
  */
object Scd2 {

  /** @param current dimension snapshot: key, attrs..., validFrom,
    *                validTo (null = open row)
    * @param updates  one row per key: key, attrs..., effTs (the update's
    *                effective timestamp; becomes the closed row's
    *                validTo and the new row's validFrom)
    * @return the merged dimension with the same schema as `current`
    */
  def merge(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], validFrom: String = "valid_from",
      validTo: String = "valid_to", effTs: String = "eff_ts"): DataFrame = {
    val outCols = (Seq(key) ++ attrs ++ Seq(validFrom, validTo)).map(col)
    val open = current.filter(col(validTo).isNull)
    val closedHistory = current.filter(col(validTo).isNotNull)

    // one update row per key, ENFORCED: duplicate keys in `updates` would
    // fan the full-outer join out and yield multiple open rows (violating
    // the one-open-row invariant), so collapse to the latest effTs first
    // — max over a (effTs, attrs...) struct gives a deterministic winner
    // even when effTs ties
    val dedupedU = updates
      .groupBy(col(key))
      .agg(max(struct((Seq(effTs) ++ attrs).map(col): _*)).as("__u"))
      .select(col(key) +: (attrs :+ effTs).map(a => col(s"__u.$a").as(a)): _*)
    // updates that actually change an attribute of the key's open row
    // (null-safe comparison: NULL -> value and value -> NULL both count);
    // updates for keys absent from the dimension are inserts
    val renamedU = attrs.foldLeft(
      dedupedU.select(col(key) +: (attrs :+ effTs).map(col): _*)
        .withColumnRenamed(key, "__k")) {
      (d, a) => d.withColumnRenamed(a, s"__u_$a")
    }
    val attrChanged = attrs.map(a => !(col(a) <=> col(s"__u_$a"))).reduce(_ || _)
    // one full-outer join on the key covers all three cases: update for an
    // existing open row (both sides), open row without update (left only),
    // insert of a brand-new key (right only)
    val joined = open.join(renamedU, col(key) === col("__k"), "full_outer")

    val untouchedOpen = joined.filter(col(key).isNotNull &&
        (col("__k").isNull || !attrChanged))
      .select(outCols: _*)
    val closedNow = joined.filter(col(key).isNotNull && col("__k").isNotNull
        && attrChanged)
      .select(Seq(col(key)) ++ attrs.map(col) ++
        Seq(col(validFrom), col(effTs).as(validTo)): _*)
    val openedNow = joined.filter(col("__k").isNotNull &&
        (col(key).isNull || attrChanged))
      .select(Seq(col("__k").as(key)) ++ attrs.map(a => col(s"__u_$a").as(a)) ++
        Seq(col(effTs).as(validFrom),
          lit(null).cast(current.schema(validTo).dataType).as(validTo)): _*)

    closedHistory.select(outCols: _*)
      .unionByName(untouchedOpen)
      .unionByName(closedNow)
      .unionByName(openedNow)
  }
}
