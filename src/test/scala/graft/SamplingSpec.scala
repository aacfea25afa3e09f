package graft

import graft.io.Io
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling / splitting / probabilistic-membership capabilities — the
  * train-data preparation primitives that have no cross-engine oracle
  * (seeded RNG and sketch bytes are engine-specific), pinned by
  * scalatest instead.
  */
class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("seeded sample is reproducible and approximately sized") {
    val li = Io.table(spark, sf, "lineitem")
    val a = li.sample(withReplacement = false, 0.1, seed = 42).count()
    val b = li.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(a === b, "same seed must give the same sample")
    assert(math.abs(a - 600) < 200, s"10% of 6000 rows expected, got $a")
  }

  test("stratified sampleBy respects per-stratum fractions") {
    val o = Io.table(spark, sf, "orders")
    val fractions = Map("F" -> 0.5, "O" -> 0.1, "P" -> 1.0)
    val sampled = o.stat.sampleBy("o_orderstatus", fractions, seed = 7L)
    val got = sampled.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = o.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val expected = base(k) * f
      assert(math.abs(got.getOrElse(k, 0L) - expected) < base(k) * 0.25 + 10,
        s"stratum $k: expected ~$expected got ${got.getOrElse(k, 0L)}")
    }
  }

  test("randomSplit partitions are disjoint and complete") {
    val li = Io.table(spark, sf, "lineitem")
      .withColumn("row_id", monotonically_increasing_id())
    val Array(train, test) = li.randomSplit(Array(0.8, 0.2), seed = 13L)
    assert(train.count() + test.count() === li.count())
    assert(train.join(test, "row_id").count() === 0, "splits overlap")
  }

  test("bloom filter membership: no false negatives, low false-positive rate") {
    val li = Io.table(spark, sf, "lineitem")
    val bloom = li.stat.bloomFilter("l_orderkey", 2000, 0.03)
    val keys = li.select("l_orderkey").distinct().collect().map(_.getLong(0))
    assert(keys.forall(bloom.mightContain), "bloom filter has a false negative")
    val absent = (1000000L until 1010000L).count(bloom.mightContain)
    assert(absent < 10000 * 0.1, s"false positive rate too high: $absent / 10000")
  }
}
