package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  def writeAs(df: DataFrame, format: String, path: String): Unit = format match {
    case "parquet" => df.write.mode("overwrite").parquet(path)
    case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
    case "json" => df.write.mode("overwrite").json(path)
    case "orc" => df.write.mode("overwrite").orc(path)
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
}
