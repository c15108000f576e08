package graft

import graft.functions.CdcChunks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-14 single-pass CDC chunker must be bit-identical to the
  * compositional form it replaced (explode every position + md5 cut
  * filter + boundary distinct ∪ terminal + lag window + text re-join) —
  * same cut rule, same boundary dedup, same chunk digests/lengths. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-14 dedup_cdc_chunks front half, verbatim. */
  private def referenceChunks(docs: DataFrame): DataFrame = {
    val cuts = docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(8), length(col("text")))).as("i"))
      .filter(substring(md5(col("text").substr(col("i") - 7, lit(8))),
        1, 1) === "0")
      .select(col("doc_id"), col("i"))
    val bnd = cuts
      .union(docs.select(col("doc_id"), length(col("text")).as("i")))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    bnd
      .withColumn("start", lag(col("i"), 1, 0).over(w) + 1)
      .join(docs, "doc_id")
      .select(col("doc_id"),
        md5(col("text").substr(col("start"),
          col("i") - col("start") + 1)).as("digest"),
        (col("i") - col("start") + 1).as("clen"))
  }

  private def newChunks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(CdcChunks.cdcChunks(col("text"), 8)).as("c"))
      .select(col("doc_id"), col("c.digest").as("digest"),
        col("c.clen").as("clen"))

  private def assertSame(docs: DataFrame): Unit = {
    val want = referenceChunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2, t._3))
    val got = newChunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == want.toSeq)
  }

  test("single-pass chunker ≡ compositional form on the test corpus") {
    assertSame(Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(200))
  }

  test("single-pass chunker ≡ compositional form on adversarial edges") {
    // short docs (< gram), exactly gram, repeated content (many cuts,
    // terminal boundary possibly ON a cut), multibyte characters (char
    // semantics, not bytes), long synthetic runs
    val rng = new scala.util.Random(3)
    val alpha = "abcdefgh ：éλ∆"
    val docs = (1L to 60L).map { id =>
      val n = rng.nextInt(120)
      (id, (0 until n).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    } ++ Seq((991L, "exactly8"), (992L, "short"), (993L, "a"),
      (994L, "éééééééé"), (995L, "x" * 400))
    assertSame(docs.toDF("doc_id", "text"))
  }

  test("chunk lengths partition each doc and every cut window hashes to nibble 0") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(50)
    val rows = newChunks(docs).groupBy("doc_id")
      .agg(sum("clen").as("total"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .collect()
    rows.foreach(r => assert(r.getAs[Long]("total") == r.getAs[Int]("len").toLong))
  }
}
