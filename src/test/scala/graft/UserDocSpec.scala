package graft

import org.scalatest.funsuite.AnyFunSuite

/** USER.md is the user-facing operator index (round-13 verdict task 7):
  * one row per `SparkEntry.queries` key. This spec pins it to the code so
  * the index cannot drift — a new key without a USER.md row, or a stale
  * row whose key no longer exists, fails the suite. */
class UserDocSpec extends AnyFunSuite {

  private lazy val userMd: String = {
    val p = java.nio.file.Paths.get("USER.md")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Keys listed as table rows: lines shaped `| `key` | status | ... |`. */
  private lazy val listed: Map[String, String] =
    raw"(?m)^\| `([a-z0-9_]+)` \| (oracle|prop) \|".r
      .findAllMatchIn(userMd).map(m => m.group(1) -> m.group(2)).toMap

  test("USER.md lists every SparkEntry.queries key exactly once") {
    val keys = SparkEntry.queries.keySet
    val missing = keys -- listed.keySet
    val stale = listed.keySet -- keys
    assert(missing.isEmpty, s"keys without a USER.md row: ${missing.toSeq.sorted}")
    assert(stale.isEmpty, s"USER.md rows for non-existent keys: ${stale.toSeq.sorted}")
    val dupes = raw"(?m)^\| `([a-z0-9_]+)` \|".r.findAllMatchIn(userMd)
      .map(_.group(1)).toSeq.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate USER.md rows: ${dupes.toSeq.sorted}")
  }

  test("USER.md verification column matches oracleSql membership") {
    val oracle = SparkEntry.oracleSql.keySet
    val wrong = listed.collect {
      case (k, st) if (st == "oracle") != oracle.contains(k) => k -> st
    }
    assert(wrong.isEmpty,
      s"rows whose oracle/prop tag disagrees with SparkEntry.oracleSql: $wrong")
  }
}
