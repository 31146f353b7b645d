package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** A MULTI-TABLE generation pointer: one numbered manifest naming the
  * committed generation of EVERY table participating in a logical
  * group generation, published with the same exclusive-create CAS a
  * [[StateTable]] manifest uses. The group pointer is what makes a
  * multi-table commit sequence ATOMIC to readers and to crash
  * recovery: per-table commits land one by one, and only the group
  * publish — a single exclusive create — makes them all visible at
  * once. A crash anywhere between the first per-table commit and the
  * group publish leaves the pointer at the prior generation; readers
  * resolve the pinned per-table generations ([[StateTable.readAt]]),
  * and the next writer commits FROM the pins
  * ([[StateTable.commitFrom]]), orphaning whatever the crash tore.
  *
  * Retention: the latest 2 group manifests are kept (matching the
  * snapshot-isolation window of the member tables); older ones are
  * dropped at publish.
  *
  * Reference anchor: the Raft apply loop applies each command
  * atomically across the WHOLE state machine
  * (`distributed/node.py:298-309`); this gives the same all-or-nothing
  * visibility to a generation spanning several bucketed tables.
  */
final class GenGroup(spark: SparkSession, val path: String) {

  private val root = new Path(path)
  private val fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listPointers(): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(_.getName.matches("g\\d+"))
      .map(p => (p.getName.drop(1).toLong, p))
      .sortBy(_._1)

  /** The pinned per-table generations, or None before the first
    * publish. Resolved once per call — the snapshot a reader then
    * holds through any concurrent publish.
    */
  def pinned(): Option[Map[String, Long]] =
    listPointers().lastOption.map { case (_, p) =>
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      lines.flatMap { l =>
        l.split('\t') match {
          case Array("t", name, gen) => Some(name -> gen.toLong)
          case Array("v", _) | Array("gen", _) | Array("") => None
          case _ => sys.error(s"corrupt group pointer $p: '$l'")
        }
      }.toMap
    }

  /** The current group generation (0 before the first publish). */
  def generation(): Long = listPointers().lastOption.map(_._1).getOrElse(0L)

  /** Publish the next group generation pinning `gens`. Exclusive: a
    * lost race (two group writers racing the same number — a caller
    * bug for a single-logical-writer group, but never silent) retries
    * onto the next number.
    */
  def publish(gens: Map[String, Long]): Long = {
    if (!fs.exists(root)) fs.mkdirs(root)
    var tries = 0
    var g = 0L
    var done = false
    while (!done) {
      g = generation() + 1
      val tmp = new Path(root, s".g$g.tmp-${UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      try {
        val sb = new StringBuilder
        sb.append("v\t1\n").append(s"gen\t$g\n")
        gens.toSeq.sortBy(_._1).foreach { case (n, tg) =>
          sb.append(s"t\t$n\t$tg\n")
        }
        out.write(sb.toString.getBytes("UTF-8"))
      } finally out.close()
      done = publishExclusive(tmp, new Path(root, s"g$g"))
      tries += 1
      require(tries < 16,
        s"group pointer at $path lost $tries publish races — a second " +
          "group writer is racing a single-logical-writer pointer")
    }
    // retention: the latest 2 pointers cover a reader resolved just
    // before this publish; older ones are unreachable
    listPointers().foreach { case (og, p) =>
      if (og <= g - 2) fs.delete(p, false)
    }
    g
  }

  // the same exclusive-create primitive StateTable.writeManifest uses:
  // hard-link create on file: (POSIX link(2) fails on an existing
  // destination; rename(2) would silently replace), contract-checked
  // rename elsewhere (HDFS refuses existing file destinations)
  private def publishExclusive(tmp: Path, dest: Path): Boolean = {
    val won =
      if (fs.makeQualified(dest).toUri.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath),
            java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else fs.rename(tmp, dest)
    if (won && fs.exists(tmp)) fs.delete(tmp, false)
    if (!won) fs.delete(tmp, false)
    won
  }
}
