package graft

import graft.functions.Md5Lanes
import org.apache.spark.sql.functions._

/** The round-14 md5-lane expression must reproduce the hex-string +
  * substring + conv(…,16,10) round trip it replaced, bit-for-bit. */
class Md5LanesSpec extends SparkSpec {
  import spark.implicits._

  test("md5 lanes ≡ conv(substring(md5Hex, 8j+1, 8), 16, 10) for all four lanes") {
    val rng = new scala.util.Random(11)
    val inputs = (1 to 300).map(_ => rng.alphanumeric.take(rng.nextInt(24)).mkString) ++
      Seq("", "boot:0:42", "é∆λ", "")
    val df = inputs.toDF("s")
    val lanes = df.select(Md5Lanes.md5Lanes(col("s")).as("lanes"))
      .collect().map(_.getSeq[Long](0))
    val want = df.select(array((0 until 4).map(j =>
        conv(substring(md5(col("s")), j * 8 + 1, 8), 16, 10).cast("long")): _*)
        .as("lanes"))
      .collect().map(_.getSeq[Long](0))
    lanes.zip(want).foreach { case (g, w) => assert(g == w) }
  }
}
