package graft

import graft.ops.ExtOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.3) — ScalaCheck generators
  * driven from a fixed seed (only scalatest + scalacheck are resolvable
  * offline, so the properties are looped by hand instead of via the
  * scalatestplus bridge).
  */
class PropertySpec extends AnyFunSuite {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val sentence = Gen.nonEmptyListOf(word).map(_.mkString(" "))

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("Q.exactPercentiles equals the holistic percentile aggregate") {
    // the windowed two-pass selection (what the checked queries run —
    // no single aggregation buffer) must be VALUE-identical to Spark's
    // holistic percentile at every requested fraction, on data with
    // ties, uneven groups, and non-integral values.
    import TestSpark._
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 2000).select(
      (col("id") % 7).as("k"),
      (pmod(col("id") * 2654435761L, lit(997)).cast("double") / 8.0).as("v"))
    val windowed = graft.ops.Q.exactPercentiles(df, "k", "v",
      Seq((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90")))
    val holistic = df.groupBy(col("k")).agg(
      percentile(col("v"), lit(0.25)).as("p25"),
      percentile(col("v"), lit(0.5)).as("p50"),
      percentile(col("v"), lit(0.75)).as("p75"),
      percentile(col("v"), lit(0.9)).as("p90"))
    assert(windowed.except(holistic).isEmpty && holistic.except(windowed).isEmpty)
    assert(windowed.count() == 7)
  }

  test("jaccard is symmetric, in [0,1], and 1 on self") {
    samples(Gen.zip(sentence, sentence)).foreach { case (a, b) =>
      val j = ExtOps.jaccardStr(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(j === ExtOps.jaccardStr(b, a))
      assert(ExtOps.jaccardStr(a, a) === 1.0)
    }
  }

  test("VecMean is accumulation-order independent") {
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f)).map(_.toSeq)
    samples(Gen.nonEmptyListOf(vecGen), n = 30).foreach { vecs =>
      val embs = vecs.zipWithIndex.map { case (v, i) => ExtOps.Emb(i.toLong, v, 0) }
      val forward = embs.foldLeft(ExtOps.VecMean.zero)(ExtOps.VecMean.reduce)
      val (l, r) = embs.reverse.splitAt(embs.size / 2)
      val merged = ExtOps.VecMean.merge(
        l.foldLeft(ExtOps.VecMean.zero)(ExtOps.VecMean.reduce),
        r.foldLeft(ExtOps.VecMean.zero)(ExtOps.VecMean.reduce))
      assert(ExtOps.VecMean.finish(forward) === ExtOps.VecMean.finish(merged))
    }
  }

  test("polynomial fingerprint matches a BigInt reference") {
    samples(sentence).foreach { t =>
      val ref = t.getBytes("UTF-8").foldLeft(BigInt(0))((a, c) => (a * 31 + (c & 0xff)) % 1000000007)
      val fast = t.getBytes("UTF-8").foldLeft(0L)((a, c) => (a * 31 + (c & 0xff)) % 1000000007)
      assert(BigInt(fast) === ref)
    }
  }
}
