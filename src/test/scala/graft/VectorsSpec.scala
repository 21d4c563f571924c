package graft

import org.apache.spark.sql.functions._
import graft.functions.{Quantization, Vectors}

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)

  test("euclidean distance matches hand computation (ref collection.go:812)") {
    val d = one(Vectors.euclideanDist(
      array(lit(1.0f), lit(2.0f), lit(3.0f)),
      array(lit(4.0f), lit(6.0f), lit(3.0f))))
    assert(math.abs(d - 5.0) < 1e-12)
  }

  test("angular distance: orthogonal vectors = 0.5, identical = 0 (ref collection.go:821)") {
    assert(math.abs(one(Vectors.angularDist(
      array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0)))) - 0.5) < 1e-12)
    assert(one(Vectors.angularDist(
      array(lit(0.5), lit(0.5)), array(lit(0.5), lit(0.5)))) < 1e-7)
    // opposite vectors -> 1.0
    assert(math.abs(one(Vectors.angularDist(
      array(lit(1.0), lit(0.0)), array(lit(-1.0), lit(0.0)))) - 1.0) < 1e-12)
  }

  test("dot handles clamp: near-parallel stays in acos domain") {
    val d = one(Vectors.angularDist(
      array(lit(0.1), lit(0.1)), array(lit(0.2), lit(0.2))))
    assert(!d.isNaN && d >= 0.0)
  }

  test("normalize produces unit vector, zero vector unchanged (ref lshtree.go:10)") {
    val n = one(Vectors.norm(Vectors.normalize(array(lit(3.0), lit(4.0)))))
    assert(math.abs(n - 1.0) < 1e-12)
    val z = one(Vectors.norm(Vectors.normalize(array(lit(0.0), lit(0.0)))))
    assert(z == 0.0)
  }

  test("quantize/dequantize round-trip bounded error (ref quantization.go)") {
    val bits = 8
    val maxErr = one(array_max(
      Quantization.reconstructionError(array(lit(-0.7f), lit(0.0f), lit(0.33f), lit(0.99f)), bits)))
    // half a quantization step of width 2/255
    assert(maxErr <= 1.0 / 255 + 1e-9)
  }

  test("quantize clamps out-of-range values like the reference") {
    val codes = Seq(1).toDF("x")
      .select(Quantization.quantize(array(lit(-3.0), lit(3.0)), 8).as("q"))
      .head().getSeq[Int](0)
    assert(codes == Seq(0, 255))
  }

  test("errorSweep: error shrinks with width, bounded by half a grid step, partitioning-independent") {
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 8 + j) * 0.9)))
      .toDF("vec_id", "embedding")
    val rows = Quantization.errorSweep(vecs, "embedding", Seq(4, 8, 16))
      .select("bits", "n_vectors", "mean_abs_err", "max_err")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(4L, 8L, 16L))
    assert(rows.forall(_._2 == 40L))
    // error strictly shrinks as width grows; max stays within half a
    // grid step (grid step = 2/(2^bits - 1))
    assert(rows(0)._3 > rows(1)._3 && rows(1)._3 > rows(2)._3)
    rows.foreach { case (bits, _, _, mx) =>
      assert(mx <= 1.0 / ((1 << bits) - 1) + 1e-12, s"$bits-bit max $mx") }
    val again = Quantization.errorSweep(vecs.repartition(7), "embedding",
        Seq(4, 8, 16))
      .select("bits", "n_vectors", "mean_abs_err", "max_err")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(again.toSeq == rows.toSeq)
  }
}
