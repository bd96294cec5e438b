package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Lake ETL surface — the engine's COPY/UNLOAD analog (SURVEY §2.1).
  *
  * Scale notes: partitioned writes lay the lake out for partition-pruned
  * reads (the Spectrum/date-prefix pattern); `maxRecordsPerFile` bounds
  * file sizes so a 100 TB unload produces splittable files instead of a
  * few giant ones. Reads always take an explicit schema — inference
  * would both scan twice and introduce nondeterminism.
  */
object LakeWriter {

  /** UNLOAD-style partitioned parquet export. */
  def unloadPartitioned(df: DataFrame, out: String, partitionCols: Seq[String],
    maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(out)

  /** Bucketed managed-table write: pre-shuffles once on `bucketCol` so
    * later equi-joins between tables bucketed the same way need NO
    * exchange at all — the co-located-join layout for repeatedly-joined
    * 100 TB fact tables (Redshift DISTKEY analog). Requires a table name
    * (bucketing metadata lives in the catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
    nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // A fresh in-memory catalog doesn't know about a PREVIOUS JVM's
    // table directory, and saveAsTable refuses to claim an existing
    // location — drop the catalog entry AND clear the stale location
    // so repeated gate sweeps are self-healing.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
        .getPath, table)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** COPY-style CSV ingest (header, explicit schema, strict mode). */
  def copyCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("mode", "FAILFAST").csv(path)

  def unloadCsv(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(out)

  /** COPY-style JSON-lines ingest. */
  def copyJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Tolerant COPY (the MAXERROR-style ingest): malformed lines don't
    * abort the load — they land in a `_corrupt_record` column so the
    * pipeline can split good rows from a quarantine stream and bound the
    * error count explicitly. Returns (good rows, corrupt raw lines).
    *
    * The raw permissive read feeds BOTH returned frames, so it persists
    * via [[graft.Caches.persistTracked]] — session-scoped, released by
    * `Caches.clear` like every other builder-internal persist (an
    * untracked `.cache()` here pinned one relation per invocation for
    * the session's lifetime). */
  def copyJsonPermissive(spark: SparkSession, path: String,
    schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType, nullable = true))
    // The tracked persist below registers under a PATH-keyed plan: if
    // the caller re-unloads the same directory and copies again in one
    // JVM, CacheManager would alias the new read to the prior
    // invocation's cached rows. Drop any cache/file-index state for
    // the path first so every copy reads the directory's current
    // contents (repeated gate sweeps hit exactly this).
    spark.catalog.refreshByPath(path)
    val raw = graft.Caches.persistTracked(spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path))
    (raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw_line")))
  }

  def unloadJson(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").json(out)

  /** COPY with an explicit delimiter (the Redshift `DELIMITER '|'`
    * option): same strict schema-pinned ingest as [[copyCsv]] with a
    * caller-chosen separator. */
  def copyDelimited(spark: SparkSession, path: String, schema: StructType,
    sep: String): DataFrame =
    spark.read.schema(schema).option("header", "true").option("sep", sep)
      .option("mode", "FAILFAST").csv(path)

  def unloadDelimited(df: DataFrame, out: String, sep: String): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", sep)
      .csv(out)

  /** COPY/UNLOAD in ORC — the second columnar lake format Spark ships
    * natively (splittable, predicate-pushdown-capable like parquet, the
    * interchange format for Hive-era warehouse exports). Binary and
    * typed end to end, so unlike the text codecs the round-trip has no
    * formatting leg to lose precision in — the q157 gate proves it. */
  def copyOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def unloadOrc(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").orc(out)

  /** Small-file compaction — the lake-maintenance VACUUM/OPTIMIZE
    * analog: rewrite a fragmented parquet directory into `files` output
    * files. `repartition` (round-robin shuffle), not `coalesce`: a
    * coalesce would collapse the READ parallelism of the upstream scan
    * to `files` tasks, while the shuffle keeps the scan wide and only
    * the write narrow — and it rebalances skewed input files instead of
    * gluing them unevenly. Content is schema-pinned and bit-preserved
    * (parquet→parquet, no text leg); the q172 gate proves the rewrite
    * loses nothing, LakeWriterSpec asserts the file-count contract. */
  def compact(spark: SparkSession, in: String, out: String, files: Int,
    schema: StructType): Unit = {
    require(files > 0, "files must be positive")
    spark.read.schema(schema).parquet(in)
      .repartition(files)
      .write.mode("overwrite").parquet(out)
  }
}
