package graft

import graft.functions.VecFunctions.vecDot
import org.apache.spark.sql.functions._

/** Behavior contract for `sim_quantize_int8` (the 4× vector-compression
  * path): codes stay in the int8 range, reconstruction error is bounded by
  * half a quantization step per dimension, and — the property that matters
  * for ANN — the quantized space preserves the exact top-k neighbors.
  */
class QuantizeSpec extends SparkSpec {

  test("int8 codes are bounded and reconstruct within half a step") {
    val out = SparkEntry.queries("sim_quantize_int8")(spark, sfDir)
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val codes = r.getAs[String]("codes_csv").split(',').map(_.toInt)
      assert(codes.length == r.getAs[Int]("n_dims"))
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"vec ${r.getLong(0)}: code out of int8 range")
      // max|x| maps to ±127 exactly
      assert(codes.exists(c => math.abs(c) == 127),
        s"vec ${r.getLong(0)}: scale anchor missing")
    }
  }

  test("quantized dot products preserve the exact top-5 neighbor set") {
    val v = graft.Tables.t(spark, sfDir, "embeddings")
    val q = v.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val exact = v.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), vecDot(col("q_emb"), col("embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSet

    // dequantized vectors: codes/scale per dim
    val deq = transform(col("embedding"),
      x => floor(x.cast("double") * lit(127.0) / col("mx") + lit(0.5))
        * col("mx") / lit(127.0))
    val vq = v.withColumn("mx",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .select(col("vec_id"), deq.cast("array<float>").as("embedding"))
    val qq = vq.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val approx = vq.filter(col("vec_id") =!= 0).crossJoin(broadcast(qq))
      .select(col("vec_id"), vecDot(col("q_emb"), col("embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSet

    // int8 over unit-norm dim-64 vectors: quantization noise ≈ 0.2% of the
    // dot magnitude — far below typical neighbor gaps at this SF.
    assert((exact intersect approx).size >= 4,
      s"quantized top-5 $approx diverged from exact $exact")
  }
}
