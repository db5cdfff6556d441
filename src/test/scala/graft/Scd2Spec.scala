package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Scd2

/** SCD Type-2 merge invariants on a hand-built dimension: closed history
  * is untouched, a changed key gets exactly one closed + one new open row,
  * a no-op update changes nothing, a brand-new key is inserted open, and
  * every key always has exactly one open row afterwards.
  */
class Scd2Spec extends SparkSpec {

  private val dimSchema = StructType(Seq(
    StructField("k", LongType), StructField("attr", StringType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType)))
  private val updSchema = StructType(Seq(
    StructField("k", LongType), StructField("attr", StringType),
    StructField("eff_ts", TimestampType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def dim = spark.createDataFrame(
    java.util.Arrays.asList(
      // key 1: one closed + one open row (real history)
      Row(1L, "bronze", ts("2020-01-01"), ts("2021-01-01")),
      Row(1L, "silver", ts("2021-01-01"), null),
      // key 2: open row that the update will NOT change
      Row(2L, "gold", ts("2020-06-01"), null),
      // key 3: open row with no update at all
      Row(3L, "iron", ts("2020-02-01"), null)),
    dimSchema)

  private def upd = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "gold", ts("2022-01-01")),   // real change
      Row(2L, "gold", ts("2022-01-01")),   // no-op update
      Row(9L, "new", ts("2022-03-01"))),   // brand-new key
    updSchema)

  test("scd2 merge: change closes the open row and appends a new one") {
    val out = Scd2.merge(dim, upd, "k", Seq("attr")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull,
        Option(r.get(3)).map(_.toString).orNull)).toSet
    assert(out === Set(
      (1L, "bronze", "2020-01-01 00:00:00.0", "2021-01-01 00:00:00.0"),
      (1L, "silver", "2021-01-01 00:00:00.0", "2022-01-01 00:00:00.0"),
      (1L, "gold", "2022-01-01 00:00:00.0", null),
      (2L, "gold", "2020-06-01 00:00:00.0", null),
      (3L, "iron", "2020-02-01 00:00:00.0", null),
      (9L, "new", "2022-03-01 00:00:00.0", null)))
  }

  test("scd2 merge: exactly one open row per key, row count grows by changes+inserts") {
    val merged = Scd2.merge(dim, upd, "k", Seq("attr"))
    val opens = merged.filter(col("valid_to").isNull)
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(opens.filter(col("n") =!= 1).count() === 0)
    // 4 original rows + 1 new version (key 1) + 1 insert (key 9)
    assert(merged.count() === 6)
  }

  test("scd2 merge: duplicate update rows per key collapse to the latest " +
      "effTs — one-open-row invariant holds") {
    val dupUpd = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "gold", ts("2022-01-01")),
        Row(1L, "platinum", ts("2022-06-01")), // later: must win
        Row(9L, "new", ts("2022-03-01")),
        Row(9L, "new2", ts("2022-02-01"))),    // earlier: must lose
      updSchema)
    val out = Scd2.merge(dim, dupUpd, "k", Seq("attr"))
    val open = out.filter(col("valid_to").isNull)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exactly one open row per key, carrying the latest update's attrs
    assert(out.filter(col("valid_to").isNull).groupBy("k").count()
      .filter(col("count") > 1).count() === 0)
    assert(open(1L) === "platinum")
    assert(open(9L) === "new")
  }

  test("scd2 merge: idempotent when re-applied with the same updates") {
    val once = Scd2.merge(dim, upd, "k", Seq("attr"))
    val twice = Scd2.merge(once, upd, "k", Seq("attr"))
    assert(sameResults(once, twice))
  }
}
