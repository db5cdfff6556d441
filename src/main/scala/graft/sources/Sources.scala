package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink breadth (SURVEY §2.3): the engine's tables can live in any
  * Spark-supported format. Parquet is the primary fixture format; these
  * helpers cover CSV/JSON/ORC round-trips with schema preservation —
  * format choice is orthogonal to every operator in the engine because all
  * operators consume DataFrames.
  */
object Sources {

  /** Read by file extension (parquet/csv/json/orc). CSV and JSON get the
    * explicit schema when provided (schema inference costs a full pass —
    * never rely on it at scale).
    */
  def readAuto(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    val reader = spark.read
    val withSchema = schema.map(reader.schema).getOrElse(reader)
    ext match {
      case "parquet" => withSchema.parquet(path)
      case "csv" => withSchema.option("header", "true").csv(path)
      case "json" => withSchema.json(path)
      case "orc" => withSchema.orc(path)
      case "xml" => withSchema.option("rowTag", "row").xml(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** Whole-file binary ingestion (`binaryFile` source): (path,
    * modificationTime, length, content) per file — the raw-media on-ramp
    * for the multimodal operators ([[graft.llm.Multimodal]] decodes the
    * `content` bytes). Files are NOT splittable here; at 100 TB the move
    * is many medium files (tens-to-hundreds of MB), not one giant blob,
    * and `pathGlobFilter` prunes by extension at listing time. */
  def readBinaryFiles(spark: SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  def writeAs(df: DataFrame, format: String, path: String): Unit = format match {
    case "parquet" => df.write.mode("overwrite").parquet(path)
    case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
    case "json" => df.write.mode("overwrite").json(path)
    case "orc" => df.write.mode("overwrite").orc(path)
    case "xml" => df.write.mode("overwrite").option("rowTag", "row").xml(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  /** Hive-style partitioned layout: one directory per partition value.
    * The 100 TB idiom for time- or tenant-keyed data — a filter on the
    * partition column prunes whole directories at planning time (static
    * pruning), and an equi-join against a filtered dimension prunes them
    * at runtime (dynamic partition pruning), so a day's query over years
    * of data reads one day's files. Choose a column with bounded
    * cardinality (day, region, tenant bucket): thousands of partitions
    * are fine, millions of tiny files are not. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Morton (Z-order) interleave of two 16-bit bucket values — the
    * multi-dimensional clustering key. Rows close in (a, b) space land in
    * the same parquet row groups, so min/max footer statistics prune
    * rectangle queries on EITHER or BOTH dimensions — the data-skipping
    * layout a 100 TB table needs when queries filter on two columns and
    * Hive-partitioning can only serve one. Pure bitwise column arithmetic
    * (the classic magic-number bit spread), whole-stage codegen'd.
    */
  def zorderValue(a16: Column, b16: Column): Column = {
    def spread(x: Column): Column = {
      val m1 = x.bitwiseAND(lit(0xFFFFL))
      val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FFL))
      val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x33333333L))
      m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x55555555L))
    }
    shiftleft(spread(a16), 1).bitwiseOR(spread(b16))
  }

  /** Linear [min, max] -> [0, 65535] bucketing for [[zorderValue]]. */
  def bucket16(c: Column, min: Double, max: Double): Column =
    if (max <= min) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - min) / (max - min) * 65535.0).cast("long")))

  /** Z-order-clustered parquet layout on two numeric columns: bucket each
    * column to 16 bits (bounds from one tiny min/max aggregate — the same
    * pre-pass OPTIMIZE ZORDER does), range-partition + sort by the Morton
    * code, then drop it (the layout, not the value, is the product).
    * `numFiles` bounds file count: each file covers a compact Z-range, so
    * a rectangle predicate on either dimension skips most files via
    * parquet footer min/max — asserted in ZOrderSpec.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    val b = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // empty input / all-null cluster columns: bounds are undefined — no
    // meaningful interleave exists, so fall back to a plain layout
    // instead of dying on a null aggregate
    if ((0 to 3).exists(b.isNullAt)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zorderValue(bucket16(col(colA), b.getDouble(0), b.getDouble(1)),
      bucket16(col(colB), b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
