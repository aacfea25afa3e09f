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
