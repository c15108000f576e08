package graft

import graft.functions.VecFunctions
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import VecFunctions.vecDot

  private def df(pairs: Seq[(Array[Float], Array[Float])]) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("vec_dot matches a reference double-accumulation loop") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(50)((Array.fill(64)(rng.nextFloat() - 0.5f),
      Array.fill(64)(rng.nextFloat() - 0.5f)))
    val got = df(pairs).select(vecDot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) =>
      var acc = 0.0
      for (i <- 0 until 64) acc += a(i).toDouble * b(i).toDouble
      acc
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) } // bit-exact
  }

  test("lsh_bands equals the compositional vec_dot sign form bit for bit") {
    import graft.functions.FloatLshBands
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val planes = Seq.fill(9 * 14)(Seq.fill(64)(rng.nextGaussian().toFloat))
    val vecs = Seq.fill(40)(Array.fill(64)((rng.nextFloat() - 0.5f) * 2))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    for ((bits, bands) <- Seq((4, 4), (9, 14))) {
      val ps = planes.take(bits * bands)
      val fused = vecs.select(col("vec_id"),
          FloatLshBands.lshBands(col("embedding"), ps, bits, bands, 64).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      def sig(b: Int) = (0 until bits).map { p =>
        when(vecDot(col("embedding"), typedlit(ps(b * bits + p))) > 0,
          lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      val composed = vecs.select(col("vec_id"),
          array((0 until bands).map(sig): _*).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(fused == composed, s"shape ($bits,$bands) diverged")
    }
  }

  test("vec_dot handles nulls and works in interpreted mode too") {
    import spark.implicits._
    val d = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .select(vecDot(col("a"), col("b")).as("d"),
        vecDot(lit(null).cast("array<float>"), col("b")).as("n"))
      .head
    assert(d.getDouble(0) == 11.0)
    assert(d.isNullAt(1))
  }

  test("vec_dot registered as a SQL function") {
    VecFunctions.register(spark)
    import spark.implicits._
    Seq((Array(1.0f, 1.0f), Array(2.0f, 5.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecdot_in")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vecdot_in").head.getDouble(0) == 7.0)
  }

  test("vec_dot survives whole-stage codegen on the real table") {
    val v = Tables.t(spark, sfDir, "embeddings").limit(10)
    val selfDot = v.select(vecDot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    // unit-norm vectors: self-dot ≈ 1
    selfDot.foreach(x => assert(math.abs(x - 1.0) < 1e-4))
  }
}
