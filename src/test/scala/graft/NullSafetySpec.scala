package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The driver fixtures contain zero NULLs, so the oracle gate never
  * exercises null paths — but production data will. These tests pin the
  * library's null semantics: no exceptions, no silent corruption, and
  * the scale-safe forms stay equal to their direct counterparts in the
  * presence of nulls. */
class NullSafetySpec extends SparkSpec {

  test("text primitives: null and empty text yield null/empty, never throw") {
    import spark.implicits._
    val df = Seq(Some("a b a"), Some(""), Some("   "), None)
      .toDF("text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("tset", TextFunctions.tokenSet(col("text")))
      .withColumn("fp", expr(TextFunctions.charHash("text")))
    val rows = df.collect()
    assert(rows.length == 4)
    val byText = rows.map(r => Option(r.getString(0)) -> r).toMap
    assert(byText(Some("a b a")).getSeq[String](1) == Seq("a", "b", "a"))
    assert(byText(Some("")).getSeq[String](1).isEmpty)
    assert(byText(Some("   ")).getSeq[String](1).isEmpty)
    assert(byText(None).isNullAt(1) && byText(None).isNullAt(2) &&
      byText(None).isNullAt(3))
    // Empty text must fingerprint to the fold seed (7), matching DuckDB's
    // empty range(1,1): Spark's sequence(1,0) is the DESCENDING [1,0], so
    // an unguarded fold would run twice and yield 6727.
    assert(byText(Some("")).getLong(3) == 7L)
    assert(byText(Some("a b a")).getLong(3) ==
      "a b a".foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L))
  }

  test("repartitionByBytes: empty or all-null payloads short-circuit") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Byte])].toDF("media_id", "payload")
    assert(graft.sources.Multimodal.repartitionByBytes(empty, 64).count() == 0)
    val allNull = Seq((1L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    assert(graft.sources.Multimodal.repartitionByBytes(allNull, 64).count() == 1)
  }

  test("safeDiv yields NULL on zero divisors (DuckDB x/0), never throws") {
    import spark.implicits._
    // Spark 4 runs ANSI mode by default: a plain `/` THROWS on divisor 0.
    // Every data-dependent division in the operators goes through safeDiv,
    // which returns NULL exactly like the DuckDB oracle's x/0.
    val df = Seq((1L, ""), (2L, "w x"), (3L, " "))
      .toDF("doc_id", "text")
      .withColumn("tk", TextFunctions.tokens(col("text")))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("ttr",
        Dets.safeDiv(size(array_distinct(col("tk"))).cast("double"),
          col("n_tok")))
    val rows = df.orderBy("doc_id").collect()
    assert(rows(0).getLong(3) == 0 && rows(0).isNullAt(4)) // 0/0 -> null
    assert(rows(1).getLong(3) == 2 && rows(1).getDouble(4) == 1.0)
    assert(rows(2).getLong(3) == 0 && rows(2).isNullAt(4))
  }

  test("latestWins: null timestamps lose to real ones, never crash") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")), 10L),
      (1L, None, 11L),
      (2L, None, 20L) // user with ONLY null ts still yields one row
    ).toDF("user_id", "ts", "event_id")
    val out = graft.streaming.EventStreams.latestWins(df)
      .orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 10L) // real ts beat the null
    assert(out(1).getLong(0) == 2L && out(1).isNullAt(1))
  }

  test("codegen vector expressions null-propagate on null input arrays") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(3.0f, 4.0f))),
      (Some(Array(1.0f)), Some(Array(2.0f, 5.0f)))
    ).toDF("a", "b")
      .withColumn("d", expr("graft_dot(a, b)"))
    val rows = df.collect()
    assert(rows(0).getDouble(2) == 11.0)
    assert(rows(1).isNullAt(2))           // null array -> null, no crash
    assert(rows(2).getDouble(2) == 2.0)   // length mismatch -> min length
  }

  test("graft_jaro_winkler null-propagates and zeroes empties, never throws") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Some("martha"), Some("marhta")),
      (None, Some("x")),
      (Some("x"), None),
      (Some(""), Some("abc")),
      (Some(""), Some(""))
    ).toDF("a", "b").withColumn("jw", expr("graft_jaro_winkler(a, b)"))
    val rows = df.collect()
    assert(rows(0).getDouble(2) == 0.9611111111111111)
    assert(rows(1).isNullAt(2) && rows(2).isNullAt(2))
    // empty input is a VALUE, not a null: DuckDB convention is 0.0
    assert(rows(3).getDouble(2) == 0.0 && rows(4).getDouble(2) == 0.0)
  }

  test("q133 media pipeline: null-text document degrades to empty payload") {
    // the fixture ships no null text, but production will: the query's
    // coalesce('') must make a NULL document decode to n_bytes=0 with
    // real thumb/frame outputs — same unit semantics as the oracle's
    // COALESCE(text, '') replay — rather than dropping or crashing
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nullq133").toString
    Seq(
      (1L, Some("hello"), "en", "web", 5L),
      (2L, None, "en", "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.MultimodalQueries
      .queries("q133_media_features")(spark, dir)
      .orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 5L)   // "hello" -> 5 bytes
    assert(out(1).getLong(1) == 0L)   // NULL text -> empty payload
    assert(!out(1).isNullAt(3) && !out(1).isNullAt(4)) // thumb box real
    assert(out(1).getAs[Int]("n_frames") == 1) // zero-duration guard
  }

  test("q225 cross-modal prune: NULL-text docs are counted but never text-kept") {
    // the fixture ships no NULL text, but production will: the agreed
    // semantics (pinned on BOTH engines — Spark filters text IS NOT
    // NULL before the dedup window, the oracle's GROUP BY feeding the
    // equi-join excludes NULLs) are that a NULL-text doc counts toward
    // n_docs but can never survive the text stage, rather than one
    // NULL-text doc riding through as the min-id of a NULL "dup group"
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nullq225").toString
    val longText = "x" * 150
    Seq(
      (1L, Some(longText), "en", "web", 150L),
      (2L, None, "en", "web", 150L),          // NULL text, above floor
      (3L, Some(longText), "en", "web", 150L) // exact dup of 1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0), (3L, Array(1f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.operators.CrossModalQueries
      .queries("q225_crossmodal_prune")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_text_kept") == 1L,
      s"NULL-text doc must not be text-kept: $r")
    assert(r.getAs[Long]("n_final") == 1L)
    assert(r.getAs[Long]("chars_final") == 150L)
  }

  test("saltedTopK equals direct window when order values include nulls") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (1 to 200).map { i =>
      (s"g${i % 3}", if (i % 7 == 0) None else Some(i * 1.5), i.toLong)
    }.toDF("g", "v", "id")
    val order = Seq(col("v").desc_nulls_last, col("id").asc)
    val direct = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(order: _*)))
      .filter(col("rk") <= 5).collect().map(_.toString).toSet
    val salted = graft.functions.Skew.saltedTopK(df, Seq("g"), order, 5, 8)
      .collect().map(_.toString).toSet
    assert(salted == direct)
  }
}
