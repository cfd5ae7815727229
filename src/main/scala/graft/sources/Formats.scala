package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format surface beyond parquet (SURVEY.md §2.1 S5/S11 [EXT]):
  * schema-carrying CSV(.gz), JSON-lines, and ORC readers/writers, plus
  * partitioned and bucketed parquet layouts.
  *
  * Scale rules encoded here:
  *  - Readers take an EXPLICIT schema — schema inference is a full
  *    extra pass over the data (a 100 TB read before the real read) and
  *    can silently widen types between runs. The only inference entry
  *    point is `csvInferred`, for interactive exploration.
  *  - Writers default to a splittable-friendly layout: many files sized
  *    by upstream partitioning, snappy/gzip per format defaults. A
  *    single .gz CSV is NOT splittable — one task must read it (the
  *    reference's CSV.gz ingest shape, fine for control-plane-sized
  *    files, wrong for fact data; that trade-off is the point of the
  *    format choice).
  *  - `partitionedParquet` lays out by a low-cardinality column so
  *    partition pruning turns predicates into directory pruning
  *    (PartitionPruningSpec asserts `PartitionFilters` on the scan).
  *  - `bucketedTable` co-locates join keys at WRITE time: a
  *    bucket-aligned join needs no shuffle at read time
  *    (BucketingSpec asserts the exchange-free plan).
  */
object Formats {

  // --- CSV ------------------------------------------------------------------

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, sep: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not as nulls
      .csv(path)

  /** Inference is an extra full pass — exploration only (see scaladoc). */
  def csvInferred(spark: SparkSession, path: String,
                  header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString)
      .option("inferSchema", "true").csv(path)

  def writeCsvGz(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("compression", "gzip")
      .csv(path)

  // --- JSON lines -----------------------------------------------------------

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  // --- ORC ------------------------------------------------------------------

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  // --- Layouts --------------------------------------------------------------

  /** Hive-style partitioned parquet: predicates on `partitionCol` prune
    * whole directories before any file is opened. */
  def partitionedParquet(df: DataFrame, path: String,
                         partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Bucketed + sorted managed table: joins/aggregations on the bucket
    * key skip the shuffle entirely (requires the table catalog, hence
    * saveAsTable). */
  def bucketedTable(df: DataFrame, table: String, buckets: Int,
                    key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
