package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus robustness sweep, Spark side (r11 VERDICT item 2):
  * EVERY checked query must complete — no ANSI DIVIDE_BY_ZERO, no cast
  * error, no NaN-induced crash — over three adversarial micro-corpora
  * (DegenGen): `single` (one FK-consistent row per fact table), `zero`
  * (all numeric measures zeroed, incl. zero embedding vectors) and
  * `empty` (zero-row lineitem, no purchase events, single-lang docs).
  *
  * This is the regression guard for the NaN/div-0 latent class the r12
  * sweep killed (~50 queries guarded). The CROSS-ENGINE half of the
  * assertion — both engines agree on values/emptiness/refusal — is
  * tools/degen_sweep.py over the same corpora (needs DuckDB, so it
  * runs as a tool, recorded in BASELINE.md; r12: 0 divergences on all
  * three corpora across all 358 queries).
  */
class DegenerateSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val root: String = {
    val out = "/tmp/graft-degen"
    // regenerate if any corpus is missing (cheap: sf0.001-derived)
    val need = Seq("single", "zero", "empty").exists { c =>
      !new java.io.File(s"$out/$c/lineitem.parquet").exists()
    }
    if (need) DegenGen.generate(spark, "/root/testdata/sf0.001", out)
    out
  }

  for (corpus <- Seq("single", "zero", "empty")) {
    test(s"every query completes on the '$corpus' corpus") {
      val dir = s"$root/$corpus"
      val failures = scala.collection.mutable.ListBuffer[String]()
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        try fn(spark, dir).count()
        catch {
          case e: Throwable =>
            failures += s"$name: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator.take(1).mkString
        }
      }
      assert(failures.isEmpty,
        s"\n${failures.size} queries failed on '$corpus':\n" +
          failures.mkString("\n"))
    }
  }
}
