package graft.operators

import graft.Tables._
import org.apache.spark.sql.functions._

/** §2.1 sources: parquet scans, column pruning, the ns-timestamp source.
  *
  * Reference semantics: topic consume (`StreamsBuilder.stream`) — here a
  * columnar parquet scan whose projection/predicates Catalyst pushes into
  * the reader (verify via `.explain`: ReadSchema / PushedFilters).
  */
object Scans {
  val queries: Map[String, Q] = Map(
    "scan_parquet" -> ((s, dir) =>
      t(s, dir, "lineitem").orderBy("l_orderkey", "l_linenumber")),

    "scan_events_ns" -> ((s, dir) =>
      events(s, dir).orderBy("event_id")),

    "scan_schema_projection" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_events_ns" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin,
    "scan_schema_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
