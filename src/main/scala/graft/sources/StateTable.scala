package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** A bucket-partitioned parquet STATE table with MANIFEST-POINTER
  * commits — the storage backend that moves a streaming loop's
  * generation state out of executor memory (the r14 composed soak held
  * one checkpointed corpus frame per generation; the 100 TB shape
  * cannot).
  *
  * r16 commit protocol (replaces the r15 per-bucket directory swap):
  * data files are IMMUTABLE — a [[stage]] writes its bucket-binned
  * files under `data/seg-<uuid>/` and they never move. What commits is
  * ONE small manifest file: the list of live (bucket, file) pairs for
  * the whole table, written under `_manifests/m<gen>` via
  * write-tmp-then-rename (rename refuses to clobber, so the numbered
  * create is exclusive — the same log-ordered commit Delta's
  * `_delta_log/<version>.json` and Iceberg's snapshot pointer use).
  * Readers resolve the highest manifest once per plan and read exactly
  * its files; bucket pruning is manifest-driven file selection, not
  * directory listing.
  *
  * What this buys over the r15 rename swap:
  *   - SNAPSHOT ISOLATION: a reader that resolved generation G keeps
  *     reading G's files even if a commit lands mid-scan — commit
  *     moves no data. Files a commit drops are listed in its
  *     manifest's `removed` section and physically deleted only one
  *     generation LATER (see GC below), so a reader survives one full
  *     concurrent commit instead of relying on single-driver ordering.
  *   - O(1) COMMIT: one tmp-write + one rename per generation instead
  *     of (delete + rename) per touched bucket — at 1024 buckets the
  *     r15 loop paid ~6k directory renames per generation.
  *   - NO TREE WALKS: staged bytes come from the segment listing the
  *     manifest needs anyway, and [[diskBytes]] sums manifest entries
  *     instead of walking the table.
  *
  * GC / retention: the manifest for generation G records the files G
  * dropped (`removed`). With retention R (default 2), a commit
  * creating generation G physically deletes the `removed` files of
  * every manifest ≤ G−(R−1) (their readers would have resolved a
  * generation already out of retention) and drops manifest files
  * ≤ G−R, keeping exactly the latest R manifests and every file they
  * reference. Retention > 2 buys TIME TRAVEL: [[readAt]] resolves any
  * retained generation's manifest, so a snapshot up to R−1 commits old
  * stays queryable — the prefix-fold face `mutations_fold_at` oracle-
  * checks exactly this. Orphaned segments from an aborted stage are
  * not referenced by any manifest and never read; [[vacuum]] (delete
  * data files no retained manifest references, sparing files younger
  * than a grace window so an in-flight stage survives) reclaims them —
  * the same janitorial job a table format calls vacuum.
  *
  * Several tables participating in one generation still stage FIRST
  * and commit TOGETHER (the caller orders it) so no NEW plan reads a
  * half-committed generation across tables; within one table the
  * manifest makes even that ordering unnecessary.
  *
  * MULTI-WRITER (r17): commits are OPTIMISTIC. A lost manifest-rename
  * race re-resolves the latest manifest and retries; a [[commit]]
  * carrying its base generation additionally checks that no
  * intervening commit touched its bucket set — disjoint writers
  * REBASE and both land, overlapping writers get a
  * [[StateTable.CommitConflictException]] abort whose staged segment
  * [[vacuum]] reclaims (the same resolve-rebase-or-abort loop Delta's
  * commit protocol and Iceberg's snapshot CAS run). Readers are
  * unaffected either way — data files are immutable and the manifest
  * swap is atomic, so no torn generation is observable.
  *
  * The bucket column `b` stays a DATA column in every file (the write
  * partitions by a shadow copy, used only to bin files per bucket for
  * the manifest), so a manifest-selected file set reads back in one
  * plan with the bucket column intact.
  *
  * The staged frame is repartitioned BY the bucket column before the
  * write so each bucket holds one file per stage — without it, every
  * shuffle task writes a sliver into every bucket and the table
  * degrades to taskCount×bucketCount small files within a few
  * generations.
  *
  * Reference anchor: the durable Raft apply-loop state this pattern
  * scales (`distributed/node.py:298-309` — every applied mutation
  * lands in persistent storage, memory holds only the in-flight op).
  */
final class StateTable(
    spark: SparkSession, val path: String, val retention: Int = 2) {

  import StateTable._

  require(retention >= 2,
    s"retention must keep at least 2 manifests (snapshot isolation " +
      s"through one concurrent commit), got $retention")

  private val root = new Path(path)
  private val fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manifestDir = new Path(root, ManifestDir)

  // ---- manifest log ----------------------------------------------------

  private def listManifests(): Seq[(Long, Path)] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).toSeq
      .map(_.getPath)
      .filter(_.getName.matches("m\\d+"))
      .map(p => (p.getName.drop(1).toLong, p))
      .sortBy(_._1)

  private def readManifest(p: Path): Manifest = {
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    var gen = -1L
    var schema: StructType = null
    val live = Vector.newBuilder[LiveFile]
    val removed = Vector.newBuilder[String]
    lines.foreach { l =>
      l.split('\t') match {
        case Array("gen", g) => gen = g.toLong
        case Array("schema", b64) =>
          schema = DataType.fromJson(new String(
            java.util.Base64.getDecoder.decode(b64), "UTF-8"))
            .asInstanceOf[StructType]
        case Array("live", b, bytes, rel) =>
          live += LiveFile(b.toInt, bytes.toLong, rel)
        case Array("removed", rel) => removed += rel
        case Array("v", _) | Array("") => ()
        case other => sys.error(
          s"corrupt state-table manifest $p: unparseable line '$l'")
      }
    }
    require(gen >= 0 && schema != null,
      s"corrupt state-table manifest $p: missing gen/schema header")
    Manifest(gen, schema, live.result(), removed.result())
  }

  /** The current manifest, or None for an uninitialized table. */
  private def latest(): Option[Manifest] =
    listManifests().lastOption.map { case (_, p) => readManifest(p) }

  private def requireLatest(): Manifest = latest().getOrElse(
    sys.error(s"state table at $path has no manifest — init() it first"))

  /** Write manifest for `gen` (exclusive — a second writer racing to
    * the same generation loses the rename and gets `false`; the OCC
    * loops in [[commit]]/[[commitAppend]]/[[init]] re-resolve and
    * retry), then GC out-of-retention files: removed-lists of
    * manifests ≤ gen−(retention−1) are physically deleted, manifest
    * files ≤ gen−retention are dropped.
    */
  private def writeManifest(m: Manifest): Boolean = {
    val prior = listManifests()
    if (!fs.exists(manifestDir)) fs.mkdirs(manifestDir)
    val tmp = new Path(manifestDir, s".m${m.gen}.tmp-${UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try {
      val sb = new StringBuilder
      sb.append("v\t1\n").append(s"gen\t${m.gen}\n")
      sb.append("schema\t").append(java.util.Base64.getEncoder
        .encodeToString(m.schema.json.getBytes("UTF-8"))).append('\n')
      m.live.foreach(f =>
        sb.append(s"live\t${f.bucket}\t${f.bytes}\t${f.rel}\n"))
      m.removed.foreach(r => sb.append(s"removed\t$r\n"))
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    val dest = new Path(manifestDir, s"m${m.gen}")
    if (!fs.rename(tmp, dest)) {
      // lost the numbered create — leave nothing behind; the caller
      // re-resolves the latest manifest and retries with gen+1
      fs.delete(tmp, false)
      return false
    }
    // GC: anything only a reader of an out-of-retention generation
    // could need. Manifest g's removed files are live only in gens
    // ≤ g−1, so they go when g−1 leaves retention.
    prior.foreach { case (g, p) =>
      if (g <= m.gen - (retention - 1))
        readManifest(p).removed.foreach(rel =>
          fs.delete(new Path(root, rel), false))
      if (g <= m.gen - retention) fs.delete(p, false)
    }
    true
  }

  /** Buckets whose live FILE SET differs between the retained
    * manifests `fromGen` and `toGen` — what a rebasing committer must
    * check its own bucket set against (an intervening commit to a
    * disjoint set is mergeable; an overlapping one is a lost update).
    */
  private def bucketsChangedBetween(fromGen: Long, toGen: Long): Set[Int] = {
    val ms = listManifests().toMap
    def liveByBucket(g: Long): Map[Int, Set[String]] = {
      val p = ms.getOrElse(g, sys.error(
        s"generation $g is no longer retained at $path — cannot " +
          s"verify commit against base (retained: ${ms.keys.toSeq.sorted.mkString(", ")})"))
      readManifest(p).live.groupBy(_.bucket)
        .view.mapValues(_.map(_.rel).toSet).toMap
    }
    val a = liveByBucket(fromGen)
    val b = liveByBucket(toGen)
    (a.keySet ++ b.keySet).filter(k =>
      a.getOrElse(k, Set.empty) != b.getOrElse(k, Set.empty)).toSet
  }

  // ---- segment writes ----------------------------------------------------

  /** Write `df` as an immutable segment, one file per bucket, and list
    * what landed. The bucket column stays in the data; a shadow copy
    * drives the per-bucket directory binning.
    */
  private def writeSegment(df: DataFrame, nParts: Int): (String, Seq[LiveFile]) = {
    require(df.columns.contains(BucketCol),
      s"state frame must carry '$BucketCol'")
    val seg = s"$DataDir/seg-${UUID.randomUUID().toString.take(12)}"
    val segPath = new Path(root, seg)
    df.withColumn(ShadowCol, col(BucketCol))
      .repartition(math.max(1, nParts), col(BucketCol))
      .write.partitionBy(ShadowCol).mode("errorifexists")
      .parquet(segPath.toString)
    val files =
      if (!fs.exists(segPath)) Seq.empty
      else fs.listStatus(segPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$ShadowCol="))
        .flatMap { d =>
          val bucket = d.getPath.getName.drop(ShadowCol.length + 1).toInt
          fs.listStatus(d.getPath).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
              && !f.getPath.getName.startsWith("."))
            .map(f => LiveFile(bucket, f.getLen,
              s"$seg/${d.getPath.getName}/${f.getPath.getName}"))
        }
    (seg, files)
  }

  // ---- public surface ----------------------------------------------------

  /** Full (re)write — the initial state, or a generation where the
    * delta invalidated every bucket (e.g. an index rebuild fallback).
    * `df` must already carry the bucket column. An empty frame is a
    * valid initial state: the manifest carries the schema, so readers
    * of the empty table do not depend on parquet footer inference.
    */
  def init(df: DataFrame, nBuckets: Int): Unit = {
    val (_, files) = writeSegment(df, nBuckets)
    // a full rewrite is last-writer-wins by definition — a lost rename
    // race just rebases onto the new latest and retries
    retryCommit("init") {
      val prev = latest()
      writeManifest(Manifest(prev.map(_.gen + 1).getOrElse(1L), df.schema,
        files, prev.map(_.live.map(_.rel)).getOrElse(Seq.empty)))
    }
  }

  private def retryCommit(what: String)(attempt: => Boolean): Unit = {
    var tries = 0
    while (!attempt) {
      tries += 1
      require(tries < MaxCommitRetries,
        s"state-table $what at $path lost $tries manifest races — " +
          "a writer storm this deep is a deployment bug, not a race")
    }
  }

  /** The whole table, lazily — a streaming scan, never a cache. The
    * file list is fixed when this is called (snapshot semantics): a
    * commit landing after this returns does not change what the plan
    * reads, and retention keeps the files alive through one concurrent
    * commit.
    */
  def read(): DataFrame = {
    val m = requireLatest()
    readFiles(m, m.live)
  }

  /** TIME-TRAVEL read: the table exactly as generation `gen` committed
    * it. Available for the latest `retention` generations — older
    * manifests (and the files only they referenced) are GC'd. The
    * returned plan has the same snapshot semantics as [[read]].
    */
  def readAt(gen: Long): DataFrame = {
    val ms = listManifests()
    val hit = ms.collectFirst { case (g, p) if g == gen => p }.getOrElse(
      sys.error(s"generation $gen is not retained at $path " +
        s"(retained: ${ms.map(_._1).mkString(", ")}; retention=$retention)"))
    val m = readManifest(hit)
    readFiles(m, m.live)
  }

  /** The retained generation numbers, oldest first. */
  def generations(): Seq[Long] = listManifests().map(_._1)

  /** Live bytes in the listed buckets — what a [[readBuckets]] of them
    * scans; free from the manifest, no file-system call.
    */
  def bucketBytes(buckets: Seq[Int]): Long = {
    val want = buckets.toSet
    latest().map(_.live.filter(f => want.contains(f.bucket))
      .map(_.bytes).sum).getOrElse(0L)
  }

  /** Manifest-pruned read: only the listed buckets' files enter the
    * plan — file-level pruning from the manifest, the same skip a
    * table format's partition stats give, with no directory listing.
    */
  def readBuckets(buckets: Seq[Int]): DataFrame = {
    val m = requireLatest()
    val want = buckets.toSet
    readFiles(m, m.live.filter(f => want.contains(f.bucket)))
  }

  private def readFiles(m: Manifest, files: Seq[LiveFile]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], m.schema)
    else
      spark.read.schema(m.schema)
        .parquet(files.map(f => new Path(root, f.rel).toString): _*)

  /** Phase 1: materialize `df` (which must carry the bucket column)
    * into an immutable segment. Runs the action NOW — all reads of the
    * current table complete before any [[commit]] swaps the manifest.
    * The files land in their final location; commit moves nothing.
    */
  def stage(df: DataFrame, nParts: Int): StateTable.Staged = {
    val (seg, files) = writeSegment(df, nParts)
    StateTable.Staged(new Path(root, seg).toString,
      files.map(_.bytes).sum, files)
  }

  /** Phase 2: commit the staged content as the new truth for the
    * affected `buckets` (a bucket in the list with no staged file was
    * emptied by the delta). One manifest write replaces the r15
    * per-bucket directory swap. Returns the number of buckets that
    * received new files.
    *
    * MULTI-WRITER (r17 OCC): pass `baseGen` = the generation the stage
    * was COMPUTED FROM (the [[generation]] the caller resolved before
    * its reads). If other commits landed since, this commit REBASES —
    * the kept-file list is rebuilt from the new latest (staged files
    * are immutable, only the manifest merge replays) — provided none
    * of the intervening commits touched this commit's buckets; an
    * overlap is a LOST UPDATE (the stage read state another writer has
    * since replaced) and throws [[StateTable.CommitConflictException]]
    * — the caller aborts its generation and the orphaned staged
    * segment waits for [[vacuum]]. A lost manifest RENAME race (two
    * writers picking the same generation number) always retries: the
    * re-resolve sees the winner's manifest and the conflict rule
    * decides. `baseGen < 0` (the default) keeps the r16 single-writer
    * contract: rebase unconditionally onto whatever is latest.
    */
  def commit(
      staged: StateTable.Staged, buckets: Seq[Int],
      baseGen: Long = -1L): Int = {
    val affected = buckets.toSet
    val stray = staged.files.filterNot(f => affected.contains(f.bucket))
    require(stray.isEmpty,
      s"staged files for buckets ${stray.map(_.bucket).distinct.sorted} " +
        s"not in the committed bucket list $buckets")
    retryCommit("commit") {
      val prev = requireLatest()
      if (baseGen >= 0 && prev.gen != baseGen) {
        val touched = bucketsChangedBetween(baseGen, prev.gen)
        val overlap = touched.intersect(affected)
        if (overlap.nonEmpty)
          throw new StateTable.CommitConflictException(
            s"commit of buckets ${affected.toSeq.sorted.mkString(",")} " +
              s"based on generation $baseGen conflicts with concurrent " +
              s"commits through ${prev.gen} touching buckets " +
              s"${overlap.toSeq.sorted.mkString(",")} at $path — the " +
              "stage read state that has since been replaced; abort " +
              "and recompute (vacuum reclaims the staged segment)")
      }
      val kept = prev.live.filterNot(f => affected.contains(f.bucket))
      val removed = prev.live.filter(f => affected.contains(f.bucket))
      writeManifest(Manifest(
        prev.gen + 1, prev.schema, kept ++ staged.files, removed.map(_.rel)))
    }
    staged.files.map(_.bucket).distinct.size
  }

  /** APPEND commit: the staged files JOIN the live set — no bucket is
    * replaced, nothing is removed. The LSM-style write an append-only
    * secondary index uses: readers tolerate stale rows by contract
    * (they validate against a primary table), and a periodic [[init]]
    * from the primary is the compaction that resets staleness. O(1)
    * like [[commit]]: one manifest write, zero data movement.
    */
  def commitAppend(staged: StateTable.Staged): Int = {
    // appends join the live set without displacing anything, so a lost
    // rename race ALWAYS rebases — no conflict is possible
    retryCommit("append") {
      val prev = requireLatest()
      writeManifest(Manifest(
        prev.gen + 1, prev.schema, prev.live ++ staged.files, Seq.empty))
    }
    staged.files.map(_.bucket).distinct.size
  }

  /** Current LIVE size from the manifest — the state-residence metric
    * (disk holds O(corpus); executor memory must not). Files awaiting
    * GC within retention are not state and are not counted.
    */
  def diskBytes(): Long =
    latest().map(_.live.map(_.bytes).sum).getOrElse(0L)

  /** The current generation number (0 = uninitialized). */
  def generation(): Long = latest().map(_.gen).getOrElse(0L)

  /** Live file count — the small-file health metric a maintenance
    * compaction would watch.
    */
  def liveFileCount(): Long = latest().map(_.live.size.toLong).getOrElse(0L)

  /** Maintenance sweep: physically delete every data file under
    * `data/` that NO retained manifest references — orphaned segments
    * from aborted stages, plus abandoned manifest tmp files — and drop
    * segment directories the sweep emptied. Files younger than
    * `graceMs` are spared so a stage in flight (staged files become
    * referenced only at commit) survives a concurrent vacuum; run with
    * graceMs=0 only when no stage is open, the same contract as a
    * table format's vacuum retention window. Returns
    * (filesDeleted, bytesReclaimed).
    */
  def vacuum(graceMs: Long = 10L * 60 * 1000): (Long, Long) = {
    val referenced: Set[String] =
      listManifests().flatMap { case (_, p) =>
        readManifest(p).live.map(_.rel)
      }.toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var files = 0L
    var bytes = 0L
    val dataDir = new Path(root, DataDir)
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).filter(_.isDirectory).foreach { seg =>
        var segHasSurvivors = false
        fs.listStatus(seg.getPath).filter(_.isDirectory).foreach { bdir =>
          fs.listStatus(bdir.getPath).filter(_.isFile).foreach { f =>
            val rel =
              s"$DataDir/${seg.getPath.getName}/${bdir.getPath.getName}/${f.getPath.getName}"
            if (!referenced.contains(rel) &&
                f.getModificationTime <= cutoff) {
              bytes += f.getLen
              files += 1
              fs.delete(f.getPath, false)
            } else segHasSurvivors = true
          }
          if (fs.listStatus(bdir.getPath).isEmpty) fs.delete(bdir.getPath, false)
        }
        // non-directory stragglers (_SUCCESS markers) keep a segment
        // alive only if data files survived too
        if (!segHasSurvivors &&
            fs.listStatus(seg.getPath).forall(s =>
              s.isFile && s.getModificationTime <= cutoff))
          fs.delete(seg.getPath, true)
      }
    }
    if (fs.exists(manifestDir))
      fs.listStatus(manifestDir).filter(s => s.isFile &&
          s.getPath.getName.startsWith(".m") &&
          s.getModificationTime <= cutoff)
        .foreach(s => fs.delete(s.getPath, false))
    (files, bytes)
  }
}

object StateTable {
  /** The partition column every state frame carries. */
  val BucketCol = "b"

  /** Thrown when a [[StateTable.commit]] with a declared base
    * generation detects that a concurrent commit replaced one of its
    * buckets — the optimistic-concurrency ABORT (the staged segment is
    * orphaned and reclaimed by [[StateTable.vacuum]]; the table itself
    * is untouched, readers never see a torn generation).
    */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** Rename-race retries before declaring a writer storm. */
  private[sources] val MaxCommitRetries = 16
  /** Shadow of [[BucketCol]] used only to bin files into per-bucket
    * directories at write time; never read back.
    */
  private[sources] val ShadowCol = "__pb"
  private[sources] val DataDir = "data"
  private[sources] val ManifestDir = "_manifests"

  private[sources] final case class LiveFile(bucket: Int, bytes: Long, rel: String)
  private[sources] final case class Manifest(
      gen: Long, schema: StructType,
      live: Seq[LiveFile], removed: Seq[String])

  final case class Staged(
      dir: String, bytes: Long,
      private[sources] val files: Seq[LiveFile])

  /** Bucket of an md5-hex fingerprint column: first 4 hex digits mod
    * nBuckets (deterministic, engine-independent).
    */
  def fpBucket(fp: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(conv(substring(fp, 1, 4), 16, 10).cast("int"), lit(nBuckets))

  /** Bucket of a long id column. */
  def idBucket(id: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(id.cast("long"), lit(nBuckets.toLong)).cast("int")
}
