package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** §5.3 property-based checks: relational algebra against plain Scala
  * collections as the independent model, and invariances of the sketch
  * primitives. ScalaCheck generators sampled under fixed seeds (the
  * scalatest/scalacheck bridge artifact isn't available offline); few
  * cases each — every case is a Spark job. */
class PropertySpec extends SparkSpec {

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val smallInts = Gen.listOfN(30, Gen.choose(0, 15))

  test("union/intersect/except agree with Scala set algebra") {
    import spark.implicits._
    for ((xs, ys) <- cases(smallInts, 8).zip(cases(smallInts, 8).reverse)) {
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      assert(a.intersect(b).as[Int].collect().toSet == (xs.toSet & ys.toSet))
      assert(a.except(b).as[Int].collect().toSet == (xs.toSet -- ys.toSet))
      assert(a.union(b).distinct().as[Int].collect().toSet == (xs.toSet | ys.toSet))
    }
  }

  test("sorted-hash intersect cardinality equals model set intersection") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val words = Gen.listOfN(25, Gen.oneOf(
      "scan", "merge", "sort", "hash", "join", "table", "row", "key",
      "fast", "slow", "batch", "spark", "value", "agg", "col"))
    for ((xs, ys) <- cases(words, 8).zip(cases(words, 8).reverse)) {
      val df = Seq((xs.distinct, ys.distinct)).toDF("a", "b")
        .withColumn("ha", array_sort(expr(
          graft.functions.TextFunctions.tokenHashes("a"))))
        .withColumn("hb", array_sort(expr(
          graft.functions.TextFunctions.tokenHashes("b"))))
        .select(expr("graft_sorted_intersect(ha, hb)"))
      assert(df.head.getInt(0) == (xs.toSet & ys.toSet).size)
    }
  }

  test("minhash signature is invariant to token order") {
    import spark.implicits._
    val gen = Gen.listOfN(20, Gen.identifier.suchThat(_.nonEmpty))
    val rnd = new scala.util.Random(7)
    for (ws <- cases(gen, 6); toks = ws.distinct if toks.nonEmpty) {
      def sig(ts: Seq[String]) =
        Seq(Tuple1(ts)).toDF("toks")
          .withColumn("hs", expr(
            graft.functions.TextFunctions.tokenHashes("toks")))
          .select(expr(graft.functions.TextFunctions.minHashes("hs", 8)))
          .head.getSeq[Long](0)
      assert(sig(toks) == sig(rnd.shuffle(toks)))
    }
  }

  test("connectedComponents matches union-find on random graphs") {
    import spark.implicits._
    val graphGen = for {
      n <- Gen.choose(1, 40)
      m <- Gen.choose(0, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, es.filter(e => e._1 != e._2))
    for ((n, es) <- cases(graphGen, 6)) {
      // model: union-find with min-id roots
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb)
          parent(math.max(ra, rb)) = lo }
      }
      val model = (0 until n.toInt).map(i => i.toLong -> find(i).toLong).toMap
      val nodes = (0L until n.toLong).toDF("id")
      val pairs = es.toDF("id_lo", "id_hi")
      val got = graft.operators.PipelineQueries
        .connectedComponents(nodes, pairs)
        .as[(Long, Long)].collect().toMap
      assert(got == model, s"n=$n edges=${es.size}")
    }
  }

  test("dot product is symmetric and matches model on float vectors") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val vec = Gen.listOfN(16, Gen.choose(-100, 100).map(_ / 10.0f))
    for ((a, b) <- cases(vec, 8).zip(cases(vec, 8).reverse)) {
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(expr("graft_dot(a, b)"), expr("graft_dot(b, a)"))
      val r = df.head
      val model = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble }
      assert(r.getDouble(0) == model && r.getDouble(1) == model)
    }
  }
}
