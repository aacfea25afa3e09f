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
}
