package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.StateTable

/** The manifest-committed state table (r16): pruned reads enter only
  * the listed buckets' files, stage-then-commit replaces exactly the
  * affected buckets through ONE atomically-created manifest (no data
  * file ever moves), a reader that resolved its plan before a commit
  * keeps its snapshot through one full concurrent commit (retention),
  * and files two generations out of date are physically gone.
  */
class StateTableSpec extends SparkSpec {

  private val B = 8

  private def freshDir(): String =
    Files.createTempDirectory("state-table-spec").toString

  private def docs(n: Int) = {
    import spark.implicits._
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("text"), col("id")).as("text"),
      StateTable.idBucket(col("id"), B).as(StateTable.BucketCol))
  }

  private def filesOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet

  test("init + read round-trips; pruned read enters only listed buckets' files") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(64), B)
    assert(t.read().count() == 64)
    val pruned = t.readBuckets(Seq(2, 5))
    assert(pruned.count() == 16)
    // manifest pruning: the scanned files were all binned under the
    // listed buckets' directories at write time
    val files = filesOf(pruned)
    assert(files.nonEmpty &&
      files.forall(f => f.contains("/__pb=2/") || f.contains("/__pb=5/")))
    // and the bucket column reads back as a data column
    assert(pruned.select(col(StateTable.BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSet == Set(2, 5))
  }

  test("commit replaces only affected buckets, deletes emptied ones, moves no data file") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(64), B)
    val untouchedBefore = filesOf(t.readBuckets(Seq(2)))
    // delta: rewrite bucket 1 (drop half its rows), empty bucket 3
    val next = t.readBuckets(Seq(1, 3))
      .where(col(StateTable.BucketCol) === 1 && col("doc_id") < 32)
    val staged = t.stage(next, 2)
    assert(staged.bytes > 0)
    t.commit(staged, Seq(1, 3))
    val after = t.read()
    assert(after.where(col(StateTable.BucketCol) === 3).count() == 0)
    assert(after.where(col(StateTable.BucketCol) === 1).count() == 4)
    // untouched buckets intact — and served by the SAME immutable files
    assert(after.where(col(StateTable.BucketCol) === 2).count() == 8)
    assert(filesOf(t.readBuckets(Seq(2))) == untouchedBefore)
    assert(after.count() == 64 - 8 - 4)
    assert(t.generation() == 2L)
  }

  test("snapshot isolation: a plan resolved before a commit survives the commit") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(64), B)
    val old = t.read() // resolves the gen-1 manifest NOW
    val gen1Bucket1 = filesOf(t.readBuckets(Seq(1)))
    // commit gen 2 mid-"scan": bucket 1 shrinks to one row, bucket 2 emptied
    t.commit(
      t.stage(t.readBuckets(Seq(1)).where(col("doc_id") === 1), 1),
      Seq(1, 2))
    // the pre-commit plan still reads generation 1 in full — no data
    // file moved, and retention keeps the dropped files alive
    assert(old.count() == 64)
    assert(old.where(col(StateTable.BucketCol) === 1).count() == 8)
    assert(gen1Bucket1.forall(f =>
      new java.io.File(new java.net.URI(f)).exists()))
    // a freshly resolved read sees generation 2
    assert(t.read().count() == 64 - 8 - 8 + 1)
    // one MORE commit (gen 3) moves gen 1 out of retention: the files
    // gen 2 dropped are now physically deleted
    t.commit(t.stage(docs(0), 1), Seq(4))
    assert(gen1Bucket1.forall(f =>
      !new java.io.File(new java.net.URI(f)).exists()))
    // and only the latest two manifests remain
    assert(t.generation() == 3L)
  }

  test("one staged file per bucket (repartition by bucket before write)") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(256), B)
    val perBucket = t.read()
      .select(col(StateTable.BucketCol), input_file_name().as("f"))
      .groupBy(col(StateTable.BucketCol))
      .agg(countDistinct(col("f")).as("nf"))
      .collect().map(_.getLong(1))
    assert(perBucket.nonEmpty && perBucket.forall(_ == 1L))
    assert(t.liveFileCount() == B)
  }

  test("empty init: the manifest carries the schema, commits proceed from it") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(0), B)
    assert(t.read().count() == 0)
    assert(t.read().columns.toSeq ==
      Seq("doc_id", "text", StateTable.BucketCol))
    assert(t.diskBytes() == 0L)
    t.commit(t.stage(docs(16), B), 0 until B)
    assert(t.read().count() == 16)
  }

  test("commit rejects staged files outside the declared bucket list") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(32), B)
    val staged = t.stage(docs(32), B) // rows in every bucket
    val e = intercept[IllegalArgumentException] {
      t.commit(staged, Seq(0, 1))
    }
    assert(e.getMessage.contains("not in the committed bucket list"))
  }

  test("stage-all-then-commit-all keeps cross-table reads consistent") {
    val dir = freshDir()
    val a = new StateTable(spark, dir + "/a")
    val b = new StateTable(spark, dir + "/b")
    a.init(docs(32), B)
    b.init(docs(32).withColumn("doc_id", col("doc_id") + 100)
      .withColumn(StateTable.BucketCol,
        StateTable.idBucket(col("doc_id"), B)), B)
    // generation: a' drops evens; b' = rows of b whose (doc_id-100) is
    // still in a' — b's staged plan READS table a, so it must run
    // before a's commit lands (and with manifests it would survive
    // even a commit that landed first, within retention)
    val nextA = a.read().where(col("doc_id") % 2 === 1)
    val stagedA = a.stage(nextA, B)
    val nextB = b.read()
      .join(a.read().select((col("doc_id") + 100).as("doc_id")), Seq("doc_id"))
    val stagedB = b.stage(nextB, B)
    val all = (0 until B)
    a.commit(stagedA, all)
    b.commit(stagedB, all)
    assert(a.read().count() == 16)
    // b staged against the PRE-commit a (all 32 rows), so keeps all 32
    assert(b.read().count() == 32)
  }

  test("retention > 2: readAt time-travels to every retained generation, older gens GC") {
    val t = new StateTable(spark, freshDir() + "/docs", retention = 3)
    val all = 0 until B
    t.init(docs(64), B) // gen 1
    t.commit(t.stage(docs(64).where(col("doc_id") < 32), B), all) // gen 2
    t.commit(t.stage(docs(64).where(col("doc_id") < 16), B), all) // gen 3
    assert(t.generations() == Seq(1L, 2L, 3L))
    assert(t.readAt(1L).count() == 64)
    assert(t.readAt(2L).count() == 32)
    assert(t.readAt(3L).count() == 16)
    assert(t.readAt(3L).collect().map(_.getLong(0)).toSet ==
      t.read().collect().map(_.getLong(0)).toSet)
    // gen 4 pushes gen 1 out of retention: its manifest is gone, its
    // files (removed at gen 2) physically deleted — but gen 2 and 3
    // remain fully time-travelable
    t.commit(t.stage(docs(64).where(col("doc_id") < 8), B), all) // gen 4
    assert(t.generations() == Seq(2L, 3L, 4L))
    val e = intercept[RuntimeException](t.readAt(1L))
    assert(e.getMessage.contains("not retained"))
    assert(t.readAt(2L).count() == 32)
    assert(t.readAt(4L).count() == 8)
  }

  test("vacuum reclaims orphaned segments, spares live files and in-grace stages") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(64), B)
    val before = t.read().count()
    // a stage whose writer CRASHED (never commits, never aborts): its
    // in-flight heartbeat spares it until the heartbeat expires — only
    // then is the segment provably abandoned and reclaimable
    val orphan = t.stage(docs(32), B)
    assert(orphan.bytes > 0)
    assert(t.vacuum(graceMs = 0L) == ((0L, 0L)),
      "a stage with a live heartbeat must survive an aggressive sweep")
    val (nFiles, nBytes) = t.vacuum(graceMs = 0L, inflightGraceMs = 0L)
    assert(nFiles >= B && nBytes >= orphan.bytes)
    assert(!new java.io.File(orphan.dir).exists())
    // the live table is untouched
    assert(t.read().count() == before)
    // idempotent: a second sweep finds nothing
    assert(t.vacuum(graceMs = 0L, inflightGraceMs = 0L) == ((0L, 0L)))
    // even with the heartbeat expired, the mtime grace window still
    // spares a stage in flight: vacuum runs, the commit lands on
    // intact files — and the commit clears the heartbeat, so the
    // committed segment needs no marker bookkeeping afterwards
    val inFlight = t.stage(docs(16), B)
    assert(t.vacuum(graceMs = 60L * 60 * 1000, inflightGraceMs = 0L)
      == ((0L, 0L)))
    t.commit(inFlight, 0 until B)
    assert(t.read().count() == 16)
    assert(t.vacuum(graceMs = 0L, inflightGraceMs = 0L)._2 >= 0L)
    assert(t.read().count() == 16)
  }

  test("a stage outliving the mtime grace survives vacuum while its heartbeat is live") {
    // the advice-r17 hazard: a writer whose stage-to-commit latency
    // exceeds graceMs lost its staged segment to a scheduled vacuum
    // and its later commit published a manifest of deleted files — the
    // in-flight marker is the safety boundary, not the mtime heuristic
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(64), B)
    val slow = t.stage(docs(16), B)
    // grace 0: every unreferenced file is past the mtime cutoff, but
    // the heartbeat (default inflightGraceMs) keeps the segment whole
    assert(t.vacuum(graceMs = 0L) == ((0L, 0L)))
    t.commit(slow, 0 until B)
    assert(t.read().count() == 16)
  }

  test("two writers, disjoint buckets: the loser rebases and BOTH updates land") {
    val dir = freshDir() + "/docs"
    val t1 = new StateTable(spark, dir)
    t1.init(docs(64), B)
    val t2 = new StateTable(spark, dir) // second writer, same table
    val baseGen = t1.generation()
    // both writers stage from the SAME base generation
    val s1 = t1.stage(t1.readBuckets(Seq(1))
      .where(col("doc_id") < 16), 1)
    val s2 = t2.stage(t2.readBuckets(Seq(2))
      .withColumn("text", lit("w2")), 1)
    // writer 1 wins; writer 2's declared base is now stale but its
    // buckets are untouched — the commit rebases and lands
    t1.commit(s1, Seq(1), baseGen)
    t2.commit(s2, Seq(2), baseGen)
    assert(t1.generation() == baseGen + 2)
    val after = t1.read()
    // both effects visible: bucket 1 halved, bucket 2 rewritten
    assert(after.where(col(StateTable.BucketCol) === 1).count() == 2)
    assert(after.where(col(StateTable.BucketCol) === 2)
      .select(col("text")).distinct().collect().map(_.getString(0)).toSeq
      == Seq("w2"))
    // untouched buckets intact
    assert(after.where(col(StateTable.BucketCol) === 3).count() == 8)
  }

  test("two writers, overlapping buckets: the loser aborts cleanly, vacuum reclaims, reads never tear") {
    val dir = freshDir() + "/docs"
    val t1 = new StateTable(spark, dir)
    t1.init(docs(64), B)
    val t2 = new StateTable(spark, dir)
    val baseGen = t1.generation()
    val s1 = t1.stage(t1.readBuckets(Seq(1))
      .where(col("doc_id") < 16), 1)
    val s2 = t2.stage(t2.readBuckets(Seq(1))
      .withColumn("text", lit("loser")), 1)
    t1.commit(s1, Seq(1), baseGen)
    // writer 2 read bucket 1 at baseGen; writer 1 has since replaced
    // it — committing would be a lost update, so it must ABORT
    val e = intercept[StateTable.CommitConflictException](
      t2.commit(s2, Seq(1), baseGen))
    assert(e.getMessage.contains("buckets 1"))
    // the table is exactly writer 1's state — no torn generation
    assert(t1.generation() == baseGen + 1)
    assert(t1.read().where(col(StateTable.BucketCol) === 1).count() == 2)
    assert(t1.read().where(col("text") === "loser").count() == 0)
    // the loser's staged segment is an orphan; vacuum reclaims it
    val (nFiles, nBytes) = t1.vacuum(graceMs = 0L)
    assert(nFiles > 0 && nBytes >= s2.bytes)
    assert(!new java.io.File(s2.dir).exists())
    assert(t1.read().count() == 58) // 64 − (8−2) from bucket 1, no tear
  }

  test("concurrent commit storm on disjoint buckets: every writer lands exactly once") {
    val dir = freshDir() + "/docs"
    val t0 = new StateTable(spark, dir)
    t0.init(docs(64), B)
    val startGen = t0.generation()
    // 4 threads, each owning one bucket, racing the manifest rename:
    // stage outside the race (Spark jobs serialize anyway), commit
    // inside it — lost renames must retry and rebase, never drop
    val stages = (0 until 4).map { i =>
      val t = new StateTable(spark, dir)
      (i, t, t.stage(t0.readBuckets(Seq(i))
        .withColumn("text", lit(s"thread$i")), 1))
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = stages.map { case (i, t, s) =>
      new Thread(() =>
        try t.commit(s, Seq(i)) // no baseGen: single-logical-writer per bucket
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"commit storm threw: ${errs.peek()}")
    // all four landed: one generation per commit, every bucket updated
    assert(t0.generation() == startGen + 4)
    val byBucket = t0.read()
      .where(col(StateTable.BucketCol) < 4)
      .select(col(StateTable.BucketCol), col("text")).distinct()
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(byBucket == (0 until 4).map(i => (i, s"thread$i")).toSet)
    assert(t0.read().count() == 64)
  }

  test("a writer whose base generation left retention gets the conflict abort, not a crash") {
    // r17 sharp edge: at retention 2 a writer two commits behind hit a
    // sys.error where the documented contract promises the conflict
    // exception — callers implementing abort-and-recompute around
    // CommitConflictException crashed differently under sustained
    // contention. Out-of-retention IS a conflict (the writer cannot
    // prove its reads still stand), so it aborts the same way.
    val dir = freshDir() + "/docs"
    val t1 = new StateTable(spark, dir)
    t1.init(docs(64), B)
    val t2 = new StateTable(spark, dir)
    val baseGen = t2.generation()
    val s2 = t2.stage(t2.readBuckets(Seq(2)).withColumn("text", lit("late")), 1)
    // two intervening commits push baseGen out of retention=2
    t1.commit(t1.stage(t1.readBuckets(Seq(0)), 1), Seq(0))
    t1.commit(t1.stage(t1.readBuckets(Seq(1)), 1), Seq(1))
    val e = intercept[StateTable.CommitConflictException](
      t2.commit(s2, Seq(2), baseGen))
    assert(e.getMessage.contains("no longer retained"))
    // clean abort: table untouched, the orphan reclaimable
    assert(t1.read().where(col("text") === "late").count() == 0)
    val (nf, _) = t1.vacuum(graceMs = 0L)
    assert(nf > 0 && !new java.io.File(s2.dir).exists())
  }

  test("commitFrom discards a torn commit past the pinned generation") {
    // the multi-table crash-recovery primitive: a crashed group writer
    // left this table one commit AHEAD of the group pin; the recovery
    // writer reads AT the pin and commits FROM it — the torn commit's
    // files are orphaned into the removed list, never merged
    val t = new StateTable(spark, freshDir() + "/docs", retention = 2)
    t.init(docs(64), B) // gen 1 — the group-pinned generation
    val pinned = t.generation()
    // the torn commit: bucket 1 rewritten to garbage, gen 2
    t.commit(t.stage(t.readBuckets(Seq(1))
      .withColumn("text", lit("torn")), 1), Seq(1))
    // a pinned reader still sees generation 1, whole
    assert(t.readBucketsAt(pinned, Seq(1))
      .where(col("text") === "torn").count() == 0)
    assert(t.bucketBytesAt(pinned, Seq(1)) > 0)
    // recovery: recompute bucket 2 FROM the pin (bucket 1's torn
    // rewrite must vanish, bucket 2 gets the new truth)
    val s = t.stage(t.readBucketsAt(pinned, Seq(2))
      .where(col("doc_id") < 32), 1)
    t.commitFrom(s, Seq(2), fromGen = pinned, protectGen = pinned)
    val after = t.read()
    assert(after.where(col("text") === "torn").count() == 0,
      "torn commit leaked into the recovered generation")
    assert(after.where(col(StateTable.BucketCol) === 1).count() == 8)
    assert(after.where(col(StateTable.BucketCol) === 2).count() == 4)
    // protectGen kept the pinned manifest readable through recovery
    assert(t.readAt(pinned).count() == 64)
    // a SECOND torn-then-recover cycle still finds the pin retained —
    // the protect exemption is what survives arbitrary crash loops
    // (the torn commit is itself a group-flow commitFrom that crashed
    // before its group pointer advanced, so it carries the pin too)
    t.commitFrom(t.stage(t.readBucketsAt(pinned, Seq(3))
      .withColumn("text", lit("torn2")), 1), Seq(3),
      fromGen = pinned, protectGen = pinned)
    val s2 = t.stage(t.readBucketsAt(pinned, Seq(2))
      .where(col("doc_id") < 16), 1)
    t.commitFrom(s2, Seq(2), fromGen = pinned, protectGen = pinned)
    assert(t.read().where(col("text") === "torn2").count() == 0)
    assert(t.read().where(col(StateTable.BucketCol) === 2).count() == 2)
    assert(t.readAt(pinned).count() == 64)
  }

  test("fp bucket is stable and in range") {
    val r = spark.range(100)
      .select(StateTable.fpBucket(md5(col("id").cast("string")), 16).as("b"))
      .agg(min("b"), max("b")).collect()(0)
    assert(r.getInt(0) >= 0 && r.getInt(1) < 16)
  }
}
