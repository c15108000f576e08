package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Product-quantization properties. PQ has no SQL oracle (the codebook
  * is a trained quantizer), so the suite pins the four facts that make
  * it trustworthy: (1) the ADC identity — a score is EXACTLY the dot
  * product against the codeword reconstruction; (2) recall on planted
  * clusters — quantization coarse enough for 32× compression still keeps
  * true neighbors on top; (3) bit-determinism of training + encoding
  * across input partitionings; (4) shape — the codebook and codes are
  * the sizes the compression claim is based on.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** 4 tight clusters × 25 unit vectors in 8 dims (same fixture family
    * as IvfSpec): cluster c lives on axis pair (2c, 2c+1), members are
    * small rotations, so true nearest neighbors are always same-cluster.
    * With m=4 subspaces of 2 dims, subspace s covers exactly axis pair
    * (2s, 2s+1) — off-cluster subvectors are ~zero, so the codebooks
    * must separate the clusters cleanly. */
  private def clusteredVecs() = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until 25
    } yield {
      val theta = 0.05 * i
      val v = Array.fill(8)(0.0f)
      v(2 * c) = math.cos(theta).toFloat
      v(2 * c + 1) = math.sin(theta).toFloat
      (c * 25L + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("ADC score is exactly the dot product against the reconstruction") {
    val v = clusteredVecs()
    val cb = SimilarityOps.pqTrain(v, dim = 8, m = 4, k = 8, iters = 2)
    val codes = SimilarityOps.pqEncode(v, cb, dim = 8, m = 4)
    val res = SimilarityOps.pqSearch(v.filter(col("vec_id") < 3), codes, cb,
      dim = 8, m = 4, k = 8, topK = 10).collect()
    assert(res.length == 3 * 10)
    val cwOf = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    val codesOf = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val vecOf = v.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    res.foreach { r =>
      val rec = codesOf(r.getLong(1)).zipWithIndex
        .flatMap { case (code, sub) => cwOf((sub, code)) }
      val exact = vecOf(r.getLong(0)).zip(rec)
        .map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(math.abs(r.getDouble(2) - exact) < 1e-5,
        s"ADC ${r.getDouble(2)} vs reconstruction dot $exact for " +
          s"q=${r.getLong(0)} c=${r.getLong(1)}")
    }
  }

  test("PQ top-k stays inside the query's planted cluster") {
    val v = clusteredVecs()
    val cb = SimilarityOps.pqTrain(v, dim = 8, m = 4, k = 8, iters = 2)
    val codes = SimilarityOps.pqEncode(v, cb, dim = 8, m = 4)
    val res = SimilarityOps.pqSearch(v.filter(col("vec_id") % 25 === 0),
      codes, cb, dim = 8, m = 4, k = 8, topK = 5).collect()
    assert(res.length == 4 * 5)
    res.foreach { r =>
      val q = r.getLong(0); val c = r.getLong(1)
      assert(c / 25 == q / 25, s"query $q got cross-cluster neighbor $c")
    }
  }

  test("training and encoding are deterministic across partitionings") {
    val v = clusteredVecs()
    def run(in: org.apache.spark.sql.DataFrame) = {
      val cb = SimilarityOps.pqTrain(in, dim = 8, m = 4, k = 8, iters = 2)
      val cbRows = cb.orderBy("sub", "code").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      val codeRows = SimilarityOps.pqEncode(in, cb, dim = 8, m = 4)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1)))
      (cbRows.toSeq, codeRows.toSeq)
    }
    val (cb1, codes1) = run(v)
    val (cb2, codes2) = run(v.repartition(7))
    assert(cb1 == cb2, "codebook differs across partitionings")
    assert(codes1 == codes2, "codes differ across partitionings")
  }

  test("IVF-PQ keeps planted-cluster recall and agrees with flat PQ scores") {
    val v = clusteredVecs()
    val (packed, cent, cb) = SimilarityOps.ivfPqIndex(v, kCells = 4,
      dim = 8, m = 4, k = 8, iters = 2)
    val q = v.filter(col("vec_id") % 25 === 0)
    val res = SimilarityOps.ivfPqSearch(q, packed, cent, cb, nprobe = 1,
      dim = 8, m = 4, k = 8, topK = 5).collect()
    assert(res.length == 4 * 5)
    res.foreach { r =>
      assert(r.getLong(1) / 25 == r.getLong(0) / 25,
        s"query ${r.getLong(0)} got cross-cluster neighbor ${r.getLong(1)}")
    }
    // every (q, c, sim) the composed search returns must carry the SAME
    // ADC score flat PQ assigns that pair — cell pruning may drop
    // candidates, never rescore them
    val codes = packed.select(col("vec_id"), col("codes"))
    val flat = SimilarityOps.pqSearch(q, codes, cb, dim = 8, m = 4, k = 8,
      topK = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    res.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(flat.contains(key) && flat(key) == r.getDouble(2),
        s"IVF-PQ rescored $key: ${r.getDouble(2)} vs ${flat.get(key)}")
    }
  }

  test("the ADC scoring stage stays inside whole-stage codegen") {
    // the score runs once per (query, corpus vector) — if it falls out of
    // codegen (as the HOF aggregate+element_at form does), the corpus scan
    // goes interpreted, the cliff SCALE.md §10 documents for LSH bands
    val v = clusteredVecs()
    val cb = SimilarityOps.pqTrain(v, dim = 8, m = 4, k = 8, iters = 1)
    val codes = SimilarityOps.pqEncode(v, cb, dim = 8, m = 4)
    val df = SimilarityOps.pqSearch(v.filter(col("vec_id") < 3), codes, cb,
      dim = 8, m = 4, k = 8, topK = 5)
    df.collect() // AQE: codegen spans only exist in the final executed plan
    val p = df.queryExecution.executedPlan.toString
    // the Project carrying pqadcscore must sit inside a `*(n)` span —
    // a bare "Project" line would mean the scoring scan went interpreted
    val scoreLine = p.linesIterator.find(_.contains("pqadcscore"))
    assert(scoreLine.isDefined, "ADC expression missing from the plan:\n" + p.take(800))
    assert(scoreLine.get.contains("*("),
      "pqadcscore fell out of whole-stage codegen:\n" + scoreLine.get)
  }

  test("codebook and codes have the claimed compression shape") {
    val v = clusteredVecs()
    val cb = SimilarityOps.pqTrain(v, dim = 8, m = 4, k = 8, iters = 2)
    val cbRows = cb.collect()
    assert(cbRows.length <= 4 * 8, s"codebook ${cbRows.length} > m*k")
    assert(cbRows.forall(_.getSeq[Float](2).length == 2),
      "codeword not dsub-dimensional")
    assert(cbRows.map(r => (r.getInt(0), r.getInt(1))).distinct.length
      == cbRows.length, "duplicate (sub, code) in codebook")
    val codeRows = SimilarityOps.pqEncode(v, cb, dim = 8, m = 4).collect()
    assert(codeRows.length == 100)
    codeRows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4, s"codes length ${cs.length} != m")
      assert(cs.forall(c => c >= 0 && c < 8), s"code out of range: $cs")
    }
  }
}
