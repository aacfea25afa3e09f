package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal snapshot-versioned parquet table: immutable version
  * directories (`v=N/`) plus an atomically-swapped `_current` pointer
  * file. The lakehouse primitives a 100 TB pipeline needs from a table
  * format, on nothing but parquet + a filesystem rename:
  *
  *  - **versioned upsert (MERGE)**: `merge` computes the upserted image
  *    (matched rows take the source's values, unmatched target rows
  *    carry over, unmatched source rows insert) and `writeVersion`
  *    lands it as a NEW immutable directory — existing versions are
  *    never rewritten, so concurrent readers of version N are isolated
  *    from the N+1 writer by construction (no file is ever mutated).
  *  - **time travel**: `readVersion(root, n)` reads any retained
  *    version; `currentVersion` resolves the pointer. Diffing two
  *    versions recovers the CDC delta between them (the checked row
  *    `e_snapshot_merge` proves the round trip against a relational
  *    oracle).
  *  - **atomic publish**: the pointer swap is a same-filesystem
  *    `ATOMIC_MOVE` rename — readers see the old or the new current
  *    version, never a partial state (the same discipline as the
  *    write-audit-publish spec).
  *
  * On a real deployment `root` is an object-store/HDFS prefix and the
  * pointer swap is the store's atomic rename/put-if-absent; the layout
  * and semantics are unchanged.
  */
object SnapshotStore {

  def versionPath(root: String, v: Int): String = s"$root/v=$v"

  /** Write `df` as immutable version `v` and atomically publish the
    * `_current` pointer to it. */
  def writeVersion(df: DataFrame, root: String, v: Int): Unit = {
    df.write.mode("overwrite").parquet(versionPath(root, v))
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"_current.tmp$v")
    Files.write(tmp, String.valueOf(v).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("_current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readVersion(s: SparkSession, root: String, v: Int): DataFrame =
    s.read.parquet(versionPath(root, v))

  def currentVersion(root: String): Int =
    new String(Files.readAllBytes(Paths.get(root).resolve("_current")),
      StandardCharsets.UTF_8).trim.toInt

  def readCurrent(s: SparkSession, root: String): DataFrame =
    readVersion(s, root, currentVersion(root))

  /** MERGE `source` into `target` on `pk`: one full-outer join keyed on
    * the PK — the single-shuffle merge shape. `valueCols` are the
    * non-key columns; matched rows take the SOURCE value, unmatched
    * target rows keep theirs (delete-free upsert), unmatched source
    * rows insert.
    *
    * Source PK uniqueness is ASSERTED up front: a duplicated source key
    * would fan out through the outer join and land duplicated rows in
    * the new version — standard MERGE semantics (Delta/Iceberg) raise
    * on multi-match rather than corrupt the table, and so does this.
    * The check is one keyed aggregate over the DELTA (source), not the
    * target — at 100 TB the delta is the small side, and a real MERGE
    * engine pays the same multi-match detection pass. */
  def merge(target: DataFrame, source: DataFrame, pk: String,
      valueCols: Seq[String]): DataFrame = {
    val dup = source.groupBy(col(pk)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"merge: source is not unique on pk '$pk' (e.g. ${dup.head.get(0)} " +
        s"appears ${dup.head.getLong(1)} times); a multi-match MERGE " +
        "would duplicate rows in the new version")
    val t = target.select((pk +: valueCols).map(col): _*)
      .withColumnRenamed(pk, "_tpk")
    val renamedT = valueCols.foldLeft(t)((df, c) =>
      df.withColumnRenamed(c, s"_t_$c"))
    val s0 = source.select((pk +: valueCols).map(col): _*)
    val joined = s0.join(renamedT, col(pk) === col("_tpk"), "full_outer")
    val outPk = coalesce(col(pk), col("_tpk")).as(pk)
    val outVals: Seq[Column] = valueCols.map(c =>
      when(col(pk).isNotNull, col(c)).otherwise(col(s"_t_$c")).as(c))
    joined.select(outPk +: outVals: _*)
  }

  /** List the version numbers present under `root` (any `v=N` dir).
    * Non-numeric `v=` entries (a stray `v=tmp`, a writer's scratch dir)
    * are skipped rather than thrown on — one foreign directory must not
    * break listing/vacuum for the whole table root. Tombstoned dirs
    * (`_vacuum_v=N`, see [[vacuum]]) never match the prefix. */
  def listVersions(root: String): Seq[Int] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    val st = Files.list(dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    try {
      val it = st.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith("v="))
          name.drop(2).toIntOption.foreach(out += _)
      }
    } finally st.close()
    out.toSeq.sorted
  }

  /** VACUUM: retire version directories older than the newest
    * `keepLast` versions. The published current version is always
    * retained regardless of age (a vacuum must never break the
    * pointer), deletion is per-version-directory (never touches
    * retained versions or the pointer file), and the operation is
    * idempotent — re-running deletes nothing new. Returns
    * (removed, retained), both ascending.
    *
    * Expiry is FAILURE-ATOMIC: each retired version is first renamed to
    * a `_vacuum_v=N` tombstone (one same-filesystem ATOMIC_MOVE), then
    * the tombstone's files are deleted. A crash mid-delete leaves only
    * a tombstone — `listVersions` never reports it and `readVersion`
    * fails loudly on the missing `v=N` path — so a partially-deleted
    * version can never be read silently with missing rows. The next
    * vacuum sweeps any leftover tombstones first. On a real deployment
    * this is the object-store prefix delete a table format's retention
    * job issues; expired time-travel reads fail loudly, exactly like an
    * expired snapshot in Delta/Iceberg. */
  def vacuum(root: String, keepLast: Int): (Seq[Int], Seq[Int]) = {
    require(keepLast >= 1, s"vacuum: keepLast must be >= 1, got $keepLast")
    val dir = Paths.get(root)
    // finish any interrupted prior vacuum: tombstones are already
    // retired (invisible to listVersions/readVersion) — just reclaim
    if (Files.isDirectory(dir)) {
      val st = Files.list(dir)
      try {
        val it = st.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.startsWith("_vacuum_")) deleteTree(p)
        }
      } finally st.close()
    }
    val versions = listVersions(root)
    val cur = currentVersion(root)
    val keepFloor = versions.takeRight(keepLast).headOption.getOrElse(cur)
    val (keep, drop) = versions.partition(v => v >= keepFloor || v == cur)
    drop.foreach { v =>
      val p = Paths.get(versionPath(root, v))
      val tomb = dir.resolve(s"_vacuum_v=$v")
      // retire first (atomic) — the version disappears all-or-nothing
      Files.move(p, tomb, StandardCopyOption.ATOMIC_MOVE)
      deleteTree(tomb)
    }
    (drop, keep)
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    val st = Files.walk(p)
    try {
      val it = st.sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) Files.delete(it.next())
    } finally st.close()
  }
}
