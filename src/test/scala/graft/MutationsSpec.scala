package graft

import graft.operators.Mutations

/** Fold semantics: last-writer-wins by id, delete removes
  * (reference apply_command, distributed_server.py:95-121;
  * id overwrite graph.py:131-139).
  */
class MutationsSpec extends SparkSpec {

  test("insert, overwrite, delete fold deterministically") {
    import spark.implicits._
    val log = Seq(
      (1L, "insert", 10L, 1),  // plain insert
      (2L, "insert", 20L, 2),  // will be overwritten
      (3L, "insert", 20L, 22), // overwrite wins
      (4L, "insert", 30L, 3),  // will be deleted
      (5L, "delete", 30L, 0),
      (6L, "delete", 40L, 0)   // delete of unknown id: no-op (graph.py:193-194)
    ).toDF("seq", "op", "vec_id", "label")
    val out = Mutations.apply(log).collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(10L -> 1, 20L -> 22))
  }

  test("re-insert after delete resurrects the id") {
    import spark.implicits._
    val log = Seq(
      (1L, "insert", 10L, 1),
      (2L, "delete", 10L, 0),
      (3L, "insert", 10L, 7)
    ).toDF("seq", "op", "vec_id", "label")
    val out = Mutations.apply(log).collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(10L -> 7))
  }

  test("state-table replay folds to exactly the one-shot result") {
    import spark.implicits._
    // three seq tiers with in-tier churn: overwrite-within-batch,
    // delete-then-resurrect ACROSS batches, delete of unknown id
    val log = Seq(
      (1L, "insert", 10L, 1),
      (2L, "insert", 20L, 2),
      (3L, "insert", 20L, 22),      // in-tier overwrite wins
      (4L, "insert", 30L, 3),
      (1000001L, "delete", 30L, 0), // tier 1: delete
      (1000002L, "insert", 40L, 4), //          brand-new id
      (1000003L, "delete", 99L, 0), //          unknown-id no-op
      (2000001L, "insert", 30L, 33),// tier 2: resurrect
      (2000002L, "delete", 20L, 0)  //          delete an original keeper
    ).toDF("seq", "op", "vec_id", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("mutations-table-spec").toString
    val viaTable = Mutations.applyViaStateTable(log, dir, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val oneShot = Mutations.apply(log)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(viaTable == oneShot)
    assert(viaTable.toMap == Map(10L -> 1, 30L -> 33, 40L -> 4))
    // and on the demo fixture shape used by the driver face
    val demoDir = java.nio.file.Files
      .createTempDirectory("mutations-table-demo").toString
    val demo = Mutations.demoLog(Tables.embeddings(spark, sfDir))
    assert(
      Mutations.applyViaStateTable(demo, demoDir).collect().toSeq ==
        Mutations.apply(demo).collect().toSeq)
  }

  test("state-table replay handles a first tier that is not insert-only") {
    import spark.implicits._
    // tier 0 carries ONLY deletes (of ids that do not exist yet) — the
    // r15 path silently treated the first tier as insert-only; the
    // uniform path must fold this identically to the one-shot apply
    val log = Seq(
      (1L, "delete", 10L, 0),
      (2L, "delete", 20L, 0),
      (1000001L, "insert", 10L, 5), // resurrection in a later tier
      (1000002L, "insert", 30L, 3)
    ).toDF("seq", "op", "vec_id", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("mutations-delete-first").toString
    val viaTable = Mutations.applyViaStateTable(log, dir, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(viaTable == Mutations.apply(log)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq)
    assert(viaTable.toMap == Map(10L -> 5, 30L -> 3))
  }

  test("as-of read ≡ one-shot apply of the log prefix, at every tier boundary") {
    import spark.implicits._
    val log = Seq(
      (1L, "insert", 10L, 1),
      (2L, "insert", 20L, 2),
      (1000001L, "delete", 10L, 0),
      (1000002L, "insert", 30L, 3),
      (2000001L, "insert", 10L, 11), // resurrect after travel point
      (2000002L, "delete", 20L, 0)
    ).toDF("seq", "op", "vec_id", "label")
    def prefix(tiers: Int) = log.where($"seq" < tiers * 1000000L)
    (0 to 3).foreach { j =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"mutations-asof-$j").toString
      val asOf = Mutations.applyViaStateTableAsOf(log, dir, keepTiers = j)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      val oneShot = Mutations.apply(prefix(j))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(asOf == oneShot, s"keepTiers=$j")
    }
    // keepTiers past the last tier ≡ the whole log (the oracle's
    // `seq < keepTiers·1e6` is then unbounding); negatives fail loudly
    val dir = java.nio.file.Files
      .createTempDirectory("mutations-asof-past").toString
    assert(
      Mutations.applyViaStateTableAsOf(log, dir, keepTiers = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        Mutations.apply(log)
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq)
    val dirBad = java.nio.file.Files
      .createTempDirectory("mutations-asof-bad").toString
    intercept[IllegalArgumentException](
      Mutations.applyViaStateTableAsOf(log, dirBad, keepTiers = -1))
  }

  test("as-of travel resolves by tier VALUE — a gapped log matches the seq-prefix oracle") {
    import spark.implicits._
    // tiers {0, 2} — no tier 1. The documented contract is
    // `seq < keepTiers·1e6`, so keepTiers=2 must see ONLY tier 0
    // (there are no tier-1 rows), not slide to the second committed
    // generation (which holds tier 2's delete)
    val log = Seq(
      (1L, "insert", 10L, 1),
      (2L, "insert", 20L, 2),
      (2000001L, "delete", 10L, 0)
    ).toDF("seq", "op", "vec_id", "label")
    def prefix(tiers: Int) = log.where($"seq" < tiers * 1000000L)
    Seq(0, 1, 2, 3).foreach { j =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"mutations-asof-gap-$j").toString
      val asOf = Mutations.applyViaStateTableAsOf(log, dir, keepTiers = j)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      val oneShot = Mutations.apply(prefix(j))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(asOf == oneShot, s"gapped keepTiers=$j")
    }
  }
}
