package graft

import java.nio.file.{Files, Paths}

/** §5.6 golden outputs: frozen per-query MD5s of the sf0.001 results
  * catch regressions without needing the DuckDB oracle. Regenerate
  * deliberately with GRAFT_REGEN_GOLDEN=1 after intended changes. */
class GoldenSpec extends SparkSpec {

  private val goldenPath = Paths.get("src/test/resources/golden_sf0001.txt")

  /** MD5 of the empty string — the hash a key gets when its sf0.001
    * result has zero rows, so its golden line only pins emptiness. */
  private val EmptySentinel = "d41d8cd98f00b204e9800998ecf8427e"

  /** Keys whose sf0.001 result is INTENTIONALLY empty (documented per
    * key); their arithmetic coverage rests on the sf0.01 oracle sweep.
    * Two-sided below: a key here must hash empty, and any key hashing
    * empty must be listed — so an accidental empty result (e.g. a
    * filter bug draining a query) fails instead of freezing silently.
    *  - q338_macd: needs 12 consecutive order days for a full slow
    *    window; sf0.001's orders table has no such run. */
  private val IntentionallyEmpty = Set("q338_macd")

  private def currentHashes: Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val rows = fn(spark, Sf).collect().map(_.toString).mkString("\n")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
      s"$name $md5"
    }

  test("sf0.001 results match frozen checksums") {
    val current = currentHashes
    if (sys.env.contains("GRAFT_REGEN_GOLDEN") || !Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath, current.mkString("\n") + "\n")
      info(s"golden file written: $goldenPath (${current.size} queries)")
    } else {
      val stored = Files.readString(goldenPath).trim.split("\n").toSeq
      val storedMap = stored.map(_.split(" ")).map(a => a(0) -> a(1)).toMap
      val diffs = current.map(_.split(" ")).collect {
        case Array(n, h) if !storedMap.get(n).contains(h) =>
          s"$n: ${storedMap.getOrElse(n, "<missing>")} -> $h"
      }
      assert(diffs.isEmpty, s"golden drift:\n${diffs.mkString("\n")}")
      assert(storedMap.size == current.size, "query set changed; regenerate")
      val emptyNow = current.map(_.split(" "))
        .collect { case Array(n, EmptySentinel) => n }.toSet
      assert(emptyNow == IntentionallyEmpty,
        s"empty-result keys drifted: got $emptyNow, " +
          s"documented $IntentionallyEmpty")
    }
  }
}
