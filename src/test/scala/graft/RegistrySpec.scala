package graft

import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {
  import TestSpark._

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key has a queries entry") {
    assert(Registry.oracles.keySet.subsetOf(Registry.queries.keySet))
  }

  test("oracle coverage is near-total (rows-only checks stay rare)") {
    val unchecked = Registry.queries.keySet -- Registry.oracles.keySet
    assert(unchecked.size <= 2, s"unchecked queries grew: $unchecked")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001") {
    // every customer has orders at sf0.001, so the anti join is literally empty
    val emptyOk = Set("c_join_anti")
    Registry.all.foreach { q =>
      val n = q.fn(spark, sf).count()
      if (!emptyOk(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
