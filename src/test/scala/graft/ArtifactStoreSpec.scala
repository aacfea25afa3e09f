package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pluggable artifact store behind Q.materialize (SURVEY §2-H dedup
  * chain): `local` (default) materializes via localCheckpoint — right
  * for a single JVM, but truncated lineage dies with an executor;
  * `parquet` writes each artifact (pair table, CC labels, masks) to a
  * shared directory and re-reads it — the fault-tolerant cluster mode.
  * These specs pin that (a) both modes produce identical checked-query
  * results, and (b) parquet-mode artifacts are real files a FRESH
  * session can consume without recomputing the chain.
  */
class ArtifactStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def withParquetStore[A](dir: String)(body: => A): A = {
    spark.conf.set("spark.graft.artifactStore", "parquet")
    spark.conf.set("spark.graft.artifactDir", dir)
    try body
    finally {
      spark.conf.unset("spark.graft.artifactStore")
      spark.conf.unset("spark.graft.artifactDir")
    }
  }

  test("dedup chain is store-agnostic and artifacts survive into a fresh session") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_artifacts").toString
    // local-mode reference (the default store)
    val expected = Registry.queries("h_dedup_clusters")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val (viaParquet, pairRows) = withParquetStore(tmp) {
      (Registry.queries("h_dedup_clusters")(spark, sf).collect().map(_.toSeq).toSeq,
        Registry.queries("h_minhash_lsh_dedup")(spark, sf).count())
    }
    assert(viaParquet == expected,
      "parquet-store dedup clusters diverge from the localCheckpoint store")
    assert(pairRows > 0)
    // the artifacts are durable files, named per (corpus, artifact)
    val files = new java.io.File(tmp).listFiles()
    assert(files != null && files.exists(_.getName.endsWith("minhashPairsAll")),
      s"pair-table artifact missing under $tmp: ${Option(files).fold("")(_.mkString(","))}")
    assert(files.exists(_.getName.endsWith("ccDocLabels")))
    // a FRESH session (new session state, shared context — the in-JVM
    // stand-in for "another job after this one died") reads the pair
    // table straight from the store: no memo, no recompute.
    val s2 = spark.newSession()
    val reread = s2.read.parquet(
      files.filter(_.getName.endsWith("minhashPairsAll")).head.getPath)
    assert(reread.count() == pairRows)
    assert(reread.columns.toSet == Set("doc_a", "doc_b", "jaccard"))
    // and the labels artifact joins against the docs table like any
    // downstream consumer would
    val labels = s2.read.parquet(
      files.filter(_.getName.endsWith("ccDocLabels")).head.getPath)
    val docs = s2.read.parquet(s"$sf/documents.parquet").select(col("doc_id"))
    assert(labels.join(docs, "doc_id").count() == labels.count())
  }
}
