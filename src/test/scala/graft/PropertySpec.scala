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

  test("prefix filtering is lossless: every J>=0.9 pair collides in both prefixes") {
    // the AllPairs lemma h_prefix_filter_pairs stands on, checked on
    // generated corpora salted with true near-duplicates (a random
    // corpus almost never has J >= 0.9 pairs): for ANY document
    // frequency ordering, a pair with J >= τ must share a token in
    // both p = n − ⌈τn⌉ + 1 prefixes — the same integer-arithmetic p
    // the checked query computes.
    val tokenSet = Gen.chooseNum(10, 40)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0, 60)).map(_.toSet))
      .suchThat(_.size >= 10)
    (0 until 40).foreach { i =>
      val bases = samples(tokenSet, 12).map(_.toSet[Int])
      // near-dup salts: drop one element (J = (n-1)/n >= 0.9 at n >= 10)
      val corpus = (bases ++ bases.map(s => s - s.min) ++
        bases.map(s => s - s.max)).zipWithIndex.map(_.swap).toMap
      val df = corpus.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def prefix(s: Set[Int]): Set[Int] = {
        val n = s.size
        val p = n - (9 * n + 9) / 10 + 1
        s.toSeq.sortBy(t => (df(t), t)).take(p).toSet
      }
      for ((ia, sa) <- corpus; (ib, sb) <- corpus if ia < ib) {
        val j = (sa & sb).size.toDouble / (sa | sb).size
        if (j >= 0.9)
          assert((prefix(sa) & prefix(sb)).nonEmpty,
            s"round $i: qualifying pair ($ia,$ib) j=$j missed by prefix filter")
      }
    }
  }

  test("count-min estimate never underestimates the true frequency") {
    // the CMS guarantee d_agg_cms_freq's overcount column relies on,
    // under a deliberately tiny width (64) so collisions are dense and
    // the est >= exact property is non-trivially exercised with the
    // production hash ((k + r·1000003) · knuth mod 2^32 mod w).
    val keys = Gen.listOfN(500, Gen.choose(0L, 50L))
    (0 until 20).foreach { i =>
      val data = samples(keys, 1).head
      val w = 64
      def cell(k: Long, r: Int): Int =
        ((BigInt(k + r * 1000003L) * BigInt(2654435761L))
          .mod(BigInt(4294967296L)).mod(BigInt(w))).toInt
      val cms = Array.ofDim[Long](4, w)
      data.foreach { k => (0 until 4).foreach { r => cms(r)(cell(k, r)) += 1 } }
      data.groupBy(identity).view.mapValues(_.size.toLong).foreach { case (k, n) =>
        val est = (0 until 4).map(r => cms(r)(cell(k, r))).min
        assert(est >= n, s"round $i: CMS underestimated key $k: $est < $n")
      }
    }
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
