package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Conf-hygiene contract of the legacy TIMESTAMP(NANOS) read path:
  * loading a NANOS events fixture must leave the HOST session's conf
  * untouched (the scan is scoped to an isolated child session), while
  * the returned frame still executes correctly later — the conf is
  * consulted at execution time, so a naive set/restore would break the
  * read instead. The fixture is written with parquet-mr's example
  * writer because Spark itself cannot produce TIMESTAMP(NANOS). */
class TablesSpec extends SparkSpec {

  private val ConfKey = "spark.sql.legacy.parquet.nanosAsLong"

  private def writeNanosFixture(dir: java.io.File): Unit = {
    val schema = Types.buildMessage()
      .addField(Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .named("spark_schema")
    val w = ExampleParquetWriter
      .builder(new Path(new java.io.File(dir, "events.parquet").toURI))
      .withConf(new Configuration())
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    // 1500 ns and -1500 ns: truncation toward zero must give 1 µs and
    // -1 µs (DuckDB's ns→µs conversion, not floor's -2)
    Seq(1500L, -1500L, 2500000L).foreach { ns =>
      w.write(gf.newGroup().append("ts", ns))
    }
    w.close()
  }

  test("NANOS events load leaves the host session conf untouched and still reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos-").toFile
    try {
      writeNanosFixture(dir)
      val before = spark.conf.getOption(ConfKey)
      val df = Tables.load(spark, dir.getAbsolutePath, "events")
      // conf unchanged right after planning...
      assert(spark.conf.getOption(ConfKey) == before,
        "load mutated the host session's nanosAsLong conf")
      // ...and the frame still executes later (the child session owns
      // the flag at execution time); 1500 ns → 1 µs, -1500 ns → -1 µs
      // (truncation toward zero, DuckDB's conversion — not floor's -2)
      val micros = df.selectExpr("unix_micros(ts) AS us").collect()
        .map(_.getLong(0)).toSet
      assert(micros == Set(1L, -1L, 2500L),
        s"ns→µs truncation mismatch: $micros")
      assert(spark.conf.getOption(ConfKey) == before,
        "execution mutated the host session's nanosAsLong conf")
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("host conf changes AFTER the child session is memoized still propagate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos2-").toFile
    val tzKey = "spark.sql.session.timeZone"
    val prevTz = spark.conf.get(tzKey)
    try {
      writeNanosFixture(dir)
      // first load memoizes the child with the host's CURRENT conf
      Tables.load(spark, dir.getAbsolutePath, "events").collect()
      // now change a volatile host conf and load again: the frame is
      // planned on the memoized child, which must see the new value —
      // a create-time-only snapshot would keep UTC here and silently
      // shift every session-tz-sensitive expression in the events plan
      spark.conf.set(tzKey, "America/New_York")
      val df = Tables.load(spark, dir.getAbsolutePath, "events")
      // hour() is session-tz-sensitive: 2500 µs after epoch is 00:00 UTC
      // but 19:00 in America/New_York (UTC-5 on 1970-01-01)
      val hours = df.selectExpr("hour(ts) AS h").collect()
        .map(_.getInt(0)).toSet
      assert(hours.contains(19),
        s"memoized child ignored the host's timezone change: hours=$hours")
    } finally {
      spark.conf.set(tzKey, prevTz)
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }
}
