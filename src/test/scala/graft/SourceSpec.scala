package graft

import graft.io.Io
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink capabilities with no graded query: CSV and JSON readers
  * (explicit schema, no inference), parquet round-trip, and partition
  * pruning on a partitioned layout (the testdata is single unpartitioned
  * files, so pruning is exercised on a derived copy — SURVEY.md §4).
  */
class SourceSpec extends AnyFunSuite {
  import TestSpark._

  test("csv round-trips with an explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val src = Io.table(spark, sf, "nation")
    src.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val back = Io.csv(spark, dir, "n_nationkey INT, n_name STRING, n_regionkey INT")
    assert(back.count() === src.count())
    assert(back.schema.map(_.dataType.simpleString) === Seq("int", "string", "int"))
  }

  test("json round-trips with an explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    val src = Io.table(spark, sf, "region")
    src.coalesce(1).write.mode("overwrite").json(dir)
    val back = Io.json(spark, dir, "r_regionkey INT, r_name STRING")
    assert(back.orderBy("r_regionkey").collect().toSeq ===
      src.select("r_regionkey", "r_name").orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trips") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = Io.table(spark, sf, "supplier")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("s_suppkey").collect().toSeq ===
      src.orderBy("s_suppkey").collect().toSeq)
  }

  test("binaryFile source ingests real media files; bytes decode intact") {
    // the 100 TB multimodal ingestion path: media lands as FILES, the
    // binaryFile source reads (path, length, content) without decoding,
    // and the decode runs downstream — here the real PNG decoder over
    // the exact bytes the source delivered.
    import graft.io.MediaCodec
    val dir = Files.createTempDirectory("graft_bin")
    val specs = Seq((3, 4, 7L), (8, 2, 21L), (16, 16, 5L))
    specs.zipWithIndex.foreach { case ((w, h, seed), i) =>
      Files.write(dir.resolve(s"img_$i.png"), MediaCodec.encodePng(w, h, seed))
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir.toString)
    assert(df.count() === specs.size.toLong)
    val decoded = df.select("path", "content").collect().map { r =>
      val m = MediaCodec.parsePng(r.getAs[Array[Byte]]("content"))
      (r.getString(0).split('/').last, m.width, m.height, m.crcOk)
    }.toSet
    assert(decoded === specs.zipWithIndex.map { case ((w, h, _), i) =>
      (s"img_$i.png", w, h, true)
    }.toSet)
  }

  test("xml source round-trips with rowTag (Spark 4 native XML)") {
    val dir = Files.createTempDirectory("graft_xml").toString
    val src = Io.table(spark, sf, "region").select("r_regionkey", "r_name")
    src.write.mode("overwrite").option("rowTag", "region").xml(dir)
    val back = spark.read.option("rowTag", "region")
      .schema("r_regionkey INT, r_name STRING").xml(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ===
      src.orderBy("r_regionkey").collect().toSeq)
  }

  test("text source reads lines") {
    val dir = Files.createTempDirectory("graft_txt").toString
    Io.table(spark, sf, "region").select(col("r_name"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0)).toSet
    assert(lines === Io.table(spark, sf, "region").collect().map(_.getString(1)).toSet)
  }

  test("streaming file source + foreachBatch drains a parquet directory") {
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val ev = Io.events(spark, sf).select("event_id", "ts_us", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(dir)
    val schema = ev.schema
    var total = 0L
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        total += batch.count()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(total === ev.count())
  }

  test("parquet schema evolution: mergeSchema unions columns across files") {
    // a 100 TB table accretes columns over years of writers; readers
    // must union footers (mergeSchema) and null-fill the files written
    // before a column existed — never error, never drop rows.
    val dir = Files.createTempDirectory("graft_evolve").toString
    val n = Io.table(spark, sf, "nation")
    n.select("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    n.select("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet ===
      Set("n_nationkey", "n_name", "n_regionkey", "batch"))
    assert(back.count() === 2 * n.count())
    // pre-evolution files read the new column as null, post- as values
    assert(back.filter(col("batch") === 1 && col("n_regionkey").isNull)
      .count() === n.count())
    assert(back.filter(col("batch") === 2 && col("n_regionkey").isNotNull)
      .count() === n.count())
  }

  test("custom DSv2 source: determinism, planning-time filter pushdown, column pruning") {
    def read = spark.read.format("graft.sources.SyntheticDocs")
      .option("docs", "1000").option("partitions", "8").load()
    // deterministic across independent reads, full count
    assert(read.count() === 1000L)
    val a = read.filter(col("doc_id") === 5).select("text", "lang", "source")
      .collect().head
    val b = read.filter(col("doc_id") === 5).select("text", "lang", "source")
      .collect().head
    assert(a === b)
    assert(a.getString(0).nonEmpty)
    // planning-time pushdown: a doc_id range narrows the id interval
    // BEFORE partitions are planned → fewer input partitions (the DSv2
    // analogue of partition pruning), and no post-scan Filter remains
    // for the absorbed predicate
    val pruned = read.filter(col("doc_id") >= 995L)
    assert(pruned.count() === 5L)
    assert(pruned.rdd.getNumPartitions === 5,
      "pushed range did not reduce planned partitions (5 ids → 5 tasks)")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("SyntheticDocs[995,1000)"),
      s"scan description missing narrowed range:\n$plan")
    // column pruning reaches the reader: readSchema is the projection
    val slim = read.select("doc_id", "lang")
    val desc = slim.queryExecution.executedPlan.toString
    assert(desc.contains("cols=doc_id,lang"),
      s"pruned read schema not visible in scan:\n$desc")
    // a residual (non-doc_id) predicate still evaluates correctly
    val en = read.filter(col("lang") === "en").count()
    assert(en > 0 && en < 1000)
  }

  test("custom DSv2 source streams in rate-limited micro-batches, parity with batch") {
    val dir = Files.createTempDirectory("graft_dsv2_stream").toString
    val df = spark.readStream.format("graft.sources.SyntheticDocs")
      .option("docs", "100").option("partitions", "4")
      .option("rowsPerBatch", "40").load()
    val q = df.writeStream.format("memory").queryName("sdocs_stream")
      .option("checkpointLocation", dir).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sdocs_stream")
    assert(streamed.count() === 100)
    // rate limiting really happened: 100 ids at 40/trigger → ≥3 batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      s"expected ≥3 non-empty micro-batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(","))
    // streamed rows are exactly the batch read (same id space, same
    // deterministic generator)
    val batch = spark.read.format("graft.sources.SyntheticDocs")
      .option("docs", "100").option("partitions", "4").load()
    assert(streamed.orderBy("doc_id").collect().toSeq ===
      batch.orderBy("doc_id").collect().toSeq)
  }

  test("custom DSv2 stream: checkpoint restart resumes without duplicates") {
    // Regression test for the restart-duplication bug: a driver-local
    // admission watermark re-initialized on restart made the engine's
    // pre-commit-replay latestOffset() regress the offset log, and the
    // resumed stream re-emitted already-delivered ids. Admission control
    // now derives each batch's end from the ENGINE's start offset
    // (SupportsAdmissionControl), so a resume is append-only from the
    // committed offset.
    val ckpt = Files.createTempDirectory("graft_dsv2_restart").toString
    def stream = spark.readStream.format("graft.sources.SyntheticDocs")
      .option("docs", "600").option("partitions", "4")
      .option("rowsPerBatch", "30").load()
    // foreachBatch sinks support checkpoint recovery (the memory sink
    // does not); each incarnation collects its delivered ids driver-side
    val got1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q1 = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id").collect().foreach(r => got1.add(r.getLong(0)))
      }
      .option("checkpointLocation", ckpt).trigger(
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    // wait for a COMMITTED batch, not merely delivered rows: foreachBatch
    // runs before the engine writes the commit file, so stopping on
    // "got1 non-empty" races the batch-0 commit on a loaded host
    // (observed: rows delivered, commits/ still empty → spurious fail)
    def committedCount() = {
      val fs = new java.io.File(s"$ckpt/commits").listFiles()
      if (fs == null) 0 else fs.count(_.getName.forall(_.isDigit))
    }
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (committedCount() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally q1.stop()
    assert(!got1.isEmpty, "first incarnation delivered nothing")
    // the exactly-once contract is against the COMMITTED offset (the
    // last batch may be sink-written but not yet offset-committed at
    // stop — replaying IT is correct at-least-once sink behavior; the
    // bug being regression-tested was re-emitting ids from BEFORE the
    // committed offset because latestOffset() ignored the engine start)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong)
    assert(commits.nonEmpty, "no committed batch before stop")
    val committedEnd = {
      val off = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$ckpt/offsets/${commits.max}"))
      off.get(off.size - 1).trim.toLong // DocOffset serializes as its id
    }
    assert(committedEnd > 0 && committedEnd < 600,
      s"want a mid-stream stop, committed end was $committedEnd")
    // second incarnation, SAME checkpoint, fresh collector
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id").collect().foreach(r => got2.add(r.getLong(0)))
      }
      .option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    val resumed = got2.asScala.toSeq.sorted
    // resume is append-only from the committed offset: every remaining
    // id exactly once, nothing from before the committed end re-emitted
    assert(resumed.headOption.forall(_ >= committedEnd),
      s"restart re-emitted ids before committed offset $committedEnd: " +
        s"${resumed.takeWhile(_ < committedEnd).take(5).mkString(",")}")
    assert(resumed === (committedEnd until 600L),
      s"resumed stream delivered ${resumed.length} rows, " +
        s"expected [${committedEnd}, 600) exactly once")
  }

  test("custom DSv2 source: n_chars equals the materialized text length") {
    // n_chars is computed arithmetically (no string build) when text is
    // pruned — prove it agrees with the actual text on every row
    val read = spark.read.format("graft.sources.SyntheticDocs")
      .option("docs", "500").option("partitions", "4").load()
    assert(read.filter(length(col("text")) =!= col("n_chars")).count() === 0,
      "n_chars disagrees with length(text)")
  }

  test("end-to-end DSv2 pipeline: source → stateful transform → sink survives a mid-stream abort exactly-once") {
    // The full custom-connector path in ONE streaming query (r12 VERDICT
    // item 7): SyntheticDocs micro-batch source → filter + stateful
    // dropDuplicates under RocksDB WITH changelog checkpointing → the
    // CountingSink's streaming write. A fault injected at epoch 2 kills
    // the first incarnation mid-stream; the restart replays that epoch
    // from the checkpoint, and the sink's per-epoch commit registry
    // proves exactly-once end to end: every epoch committed once, total
    // rows exactly the batch-side expectation.
    import graft.sources.CountingSink
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val saved = Seq(providerKey, changelogKey)
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelogKey, "true")
    try {
      CountingSink.clearStream("pipe")
      val ckpt = Files.createTempDirectory("graft_pipe").toString
      def start(failAt: Option[Long]) = {
        val xform = spark.readStream.format("graft.sources.SyntheticDocs")
          .option("docs", "400").option("partitions", "4")
          .option("rowsPerBatch", "100").load()
          .filter(col("lang") === "en")
          .dropDuplicates("doc_id") // stateful: RocksDB + changelog
          .select(col("doc_id"), col("n_chars"))
        val w = xform.writeStream.format("graft.sources.CountingSink")
          .option("name", "pipe").option("checkpointLocation", ckpt)
        failAt.fold(w)(e => w.option("failAtEpoch", e.toString)).start()
      }
      // incarnation 1: epochs 0-1 commit, the injected fault at epoch 2
      // aborts the query mid-stream
      val q1 = start(failAt = Some(2L))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination(120000)
        throw q1.exception.getOrElse(
          fail("query survived the injected epoch-2 fault"))
      }
      val (rowsBefore, epochsBefore) = CountingSink.streamTotal("pipe")
      assert(epochsBefore === 2 && rowsBefore > 0,
        s"expected epochs 0-1 committed before the abort, got " +
          s"$epochsBefore epochs / $rowsBefore rows")
      // incarnation 2: same checkpoint, no fault — replays epoch 2 and
      // finishes the id space
      val q2 = start(failAt = None)
      try q2.processAllAvailable() finally q2.stop()
      val expected = spark.read.format("graft.sources.SyntheticDocs")
        .option("docs", "400").load()
        .filter(col("lang") === "en").count()
      val (rows, epochs) = CountingSink.streamTotal("pipe")
      assert(rows === expected,
        s"pipeline delivered $rows rows, batch expectation $expected — " +
          "a replayed epoch double-counted or rows were lost")
      assert(epochs === 4, s"expected 4 committed epochs (100 ids each), got $epochs")
      // per-epoch audit: the aborted epoch 2 appears EXACTLY once
      val perEpoch = CountingSink.streamEpochs("pipe")
      assert(perEpoch.keySet === Set(0L, 1L, 2L, 3L),
        s"epoch set wrong: ${perEpoch.keySet}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("custom DSv2 sink: task-commit counting, atomic publish, abort leaves no trace") {
    import graft.sources.CountingSink
    val docs = Io.table(spark, sf, "nation").select(col("n_nationkey").cast("long").as("k"))
    val expected = docs.count()
    CountingSink.clear("t1")
    docs.repartition(4).write.format("graft.sources.CountingSink")
      .option("name", "t1").mode("append").save()
    val (rows, tasks) = CountingSink.result("t1").get
    assert(rows === expected, s"sink counted $rows, expected $expected")
    assert(tasks === 4, s"expected one commit message per task, got $tasks")
    // abort path: a rejected record fails the job and publishes NOTHING
    CountingSink.clear("t2")
    val poisoned = docs.union(spark.range(1).select(lit(-1L).as("k")))
    intercept[Exception] {
      poisoned.write.format("graft.sources.CountingSink")
        .option("name", "t2").option("failOnNegativeFirstColumn", "true")
        .mode("append").save()
    }
    assert(CountingSink.result("t2").isEmpty,
      "aborted job must not publish partial results")
  }

  test("custom DSv2 sink: a retried task commits exactly once (no double count)") {
    // r13 VERDICT item 7: the batch write path's task-commit protocol
    // under a real scheduler-level retry. Partition 0's FIRST attempt
    // dies in createWriter (before any row); local[4, 2] retries it;
    // the job succeeds and the driver-side commit must see exactly one
    // message per partition — the aborted attempt contributes nothing.
    import graft.sources.CountingSink
    val docs = Io.table(spark, sf, "nation")
      .select(col("n_nationkey").cast("long").as("k"))
    val expected = docs.count()
    CountingSink.clear("t3")
    CountingSink.clearAttempts("t3")
    docs.repartition(4).write.format("graft.sources.CountingSink")
      .option("name", "t3").option("failFirstAttemptOfPartition", "0")
      .mode("append").save()
    // the retry actually happened (not a vacuous pass)...
    assert(CountingSink.attemptCount("t3", 0) === 2,
      "partition 0 should have run exactly twice (fail + retry)")
    assert(CountingSink.attemptCount("t3", 1) === 1)
    // ...and the committed totals are single-counted
    val (rows, tasks) = CountingSink.result("t3").get
    assert(rows === expected,
      s"retried task double- or under-counted: $rows vs $expected")
    assert(tasks === 4,
      s"expected one commit message per partition, got $tasks")
  }

  test("partition pruning skips non-matching partitions") {
    val dir = Files.createTempDirectory("graft_part").toString
    Io.table(spark, sf, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "no partition filters in scan")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles").map(_.value)
    assert(scanned.exists(_ >= 1))
    // equality predicate on the partition column must not read all files
    val all = spark.read.parquet(dir)
    all.collect()
    val allFiles = all.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles").map(_.value)
    assert(scanned.get < allFiles.get, s"pruning read $scanned of $allFiles files")
  }
}
