package graft

import java.nio.file.Files

/** The storage-backed composed online-ingest loop at miniature scale:
  * generation state lives in the six StateTables, executor memory
  * between generations holds nothing corpus-sized, and the incremental
  * loop replays to set identity with the from-scratch batch pipeline
  * (runLoop's internal require — visible, curated, codes, AND edges).
  */
class OnlineSoakSpec extends SparkSpec {

  test("mini composed loop: parity holds, state stays on disk, memory drains",
      SoakTag) {
    val dir = Files.createTempDirectory("online-soak-spec").toString
    val s = OnlineSoak.runLoop(spark,
      n = 3000L, gens = 3, perGen = 150, stateBuckets = 16, stateDir = dir)
    assert(s.composedParity)
    assert(s.curatedCount > 0)
    // state residence: tables on disk carry the corpus every generation
    assert(s.stateDiskMb.nonEmpty && s.stateDiskMb.forall(_ >= 0) &&
      s.bucketsRewritten.forall(_ > 0))
    // between generations NOTHING corpus-sized stays cached: the r14
    // loop held four checkpointed corpus frames here; the table-backed
    // loop ends each generation with only possible cleaner-lag residue
    // (the session is shared across suites, so bound, don't pin to 0)
    assert(s.storageBytes.forall(_ < (8L << 20)),
      s"cached bytes held across generations: ${s.storageBytes}")
    // and the count must not GROW generation over generation
    assert(s.liveRdds.last <= s.liveRdds.head + 2,
      s"live RDD count grew: ${s.liveRdds}")
  }

  test("mini composed loop, graph through KnnGraphTables: same parity contract",
      SoakTag) {
    val dir = Files.createTempDirectory("online-soak-tables-spec").toString
    // runLoop's internal require compares the table-read edges against
    // the from-scratch batch rebuild — the delta-driven graph path must
    // clear the identical bar the in-memory path does
    val s = OnlineSoak.runLoop(spark,
      n = 3000L, gens = 4, perGen = 150, stateBuckets = 16, stateDir = dir,
      graphTables = true, injectAbortAtGen = 3)
    assert(s.composedParity)
    assert(s.storageBytes.forall(_ < (8L << 20)),
      s"cached bytes held across generations: ${s.storageBytes}")
    // the in-loop vacuum ran (every 2nd gen) and reclaimed the gen-3
    // aborted writer's orphaned segment — with the final parity require
    // above proving zero read breakage
    assert(s.vacuumBytes.size == 2, s"vacuum cadence: ${s.vacuumBytes}")
    assert(s.vacuumBytes.last > 0,
      s"aborted stage not reclaimed: files=${s.vacuumFiles} bytes=${s.vacuumBytes}")
  }

  test("second writer against the live loop: disjoint commits land, overlaps abort, parity holds",
      SoakTag) {
    val dir = Files.createTempDirectory("online-soak-occ-spec").toString
    // 256 buckets against ~120 affected fingerprints per generation:
    // some rotating maintenance buckets collide with the generation's
    // rewrite set (→ CommitConflictException abort), some don't
    // (→ rebase + land) — the closed-form mutation stream makes the
    // split deterministic, and the end-of-run parity replay gates both
    // outcomes (a landed compaction rewrites identical rows; an
    // aborted one leaves the table untouched)
    val s = OnlineSoak.runLoop(spark,
      n = 3000L, gens = 5, perGen = 60, stateBuckets = 256, stateDir = dir,
      occWriter = true)
    assert(s.composedParity)
    assert(s.occAttempts == 4, s"occ attempts: ${s.occAttempts}")
    assert(s.occLanded + s.occAborted == s.occAttempts)
    assert(s.occLanded > 0,
      s"no disjoint maintenance commit landed (landed=${s.occLanded} aborted=${s.occAborted})")
    assert(s.occAborted > 0,
      s"no overlapping maintenance commit aborted (landed=${s.occLanded} aborted=${s.occAborted})")
  }
}
