package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The engine's fail-LOUD guards, actually exercised: corrupt inputs
  * must throw, never produce silently-wrong results. At 100 TB a silent
  * mask/dimension corruption poisons every downstream consumer — the
  * guards' scaladocs make that argument; this spec proves the guards
  * fire.
  */
class GuardSpec extends AnyFunSuite {
  import TestSpark._

  private def rootMessages(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) {
      sb.append(String.valueOf(cur.getMessage)).append(" | ")
      cur = cur.getCause
    }
    sb.toString
  }

  test("ragged embedding dimensions fail the PQ build loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ragged").toString
    Seq((1L, Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f), 0),
      (2L, Seq(1f, 2f, 3f), 1)) // ragged: 3 dims vs 8
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[Throwable] {
      Registry.queries("h_pq_encode")(spark, dir).collect()
    }
    assert(rootMessages(e).contains("ragged"),
      s"expected the ragged-dim assert, got: ${rootMessages(e).take(300)}")
  }

  test("a >64-token vocabulary fails the single-long bitmask dedup loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_widevocab").toString
    // 70 distinct tokens across two docs — silently wrapping shiftleft
    // mod 64 would corrupt masks; the build must raise instead
    val words = (0 until 70).map(i => s"tok$i")
    Seq((1L, words.take(40).mkString(" "), "en", "src0", 100L),
      (2L, words.drop(30).mkString(" "), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Throwable] {
      Registry.queries("h_jaccard_pairs")(spark, dir).collect()
    }
    assert(rootMessages(e).contains("vocabulary exceeds 64"),
      s"expected the vocab-width guard, got: ${rootMessages(e).take(300)}")
  }

  test("adamic-adar deg-1 wedge center yields NULL on both engines, not 1/ln(1)") {
    // The support-pruned wedge construction guarantees deg(z) >= 2, but
    // the 1/ln(deg) projection is pushed below the join onto the FULL
    // degree table. If that invariant ever breaks, the Spark spelling
    // (otherwise-less `when`) and the oracle spelling (ELSE-less CASE)
    // must fail IDENTICALLY: a SQL NULL that SUM skips — never an ANSI
    // divide-by-zero, an Infinity, or a silent 0 that only one engine
    // contributes. Pin the Spark side on constructed deg-1/2/3 rows;
    // the oracle side is NULL by the same ELSE-less CASE semantics of
    // the SQL standard.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val rows = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("z", "zdeg")
      .withColumn("term", graft.ops.GraphOps.adamicAdarTerm(col("zdeg")))
    val collected = rows.orderBy("z").collect()
    assert(collected(0).isNullAt(2),
      "deg=1 must give NULL (mirrors the oracle's ELSE-less CASE), " +
        s"got ${collected(0).get(2)}")
    assert(!collected(1).isNullAt(2) && !collected(2).isNullAt(2))
    // SUM skips the NULL — the aggregate equals the deg>=2 contribution
    val total = rows.agg(sum(col("term"))).collect()(0).getDouble(0)
    val expected = 1.0 / math.log(2.0) + 1.0 / math.log(3.0)
    assert(math.abs(total - expected) < 1e-9,
      s"NULL term must be skipped by SUM: $total vs $expected")
  }
}
