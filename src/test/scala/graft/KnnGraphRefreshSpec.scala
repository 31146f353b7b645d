package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ivf

/** Incremental kNN-graph refresh: the parity contract (refreshed edges
  * ≡ rebuilt edges, row for row) across adds, removes, changes, the
  * no-op delta, and the centroid-perturbation fallback — plus the
  * scoping claim that an untouched-cell src keeps its base edge rows.
  */
class KnnGraphRefreshSpec extends SparkSpec {

  private val (k, nCents, nProbe) = (5, 16, 4)

  private lazy val base = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  private def edgeRows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  private def assertParity(newEmb: DataFrame): Ivf.KnnGraphState = {
    val st = Ivf.knnGraphBuild(base, k, nCents, nProbe)
    val refreshed = Ivf.knnGraphRefresh(st, newEmb, k, nCents, nProbe)
    val rebuilt = Ivf.knnGraph(newEmb, k, nCents, nProbe)
    assert(edgeRows(refreshed.edges) == edgeRows(rebuilt))
    refreshed
  }

  test("adds + removes + changes refresh to exactly the rebuilt graph") {
    // centroid ids (< 16) deliberately untouched so refresh stays on
    // the incremental path
    val changed = base.where(col("vec_id") >= 16 && col("vec_id") % 89 === 7)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val newEmb = base
      .where(!(col("vec_id") >= 16 && col("vec_id") % 97 === 5)) // removes
      .where(!(col("vec_id") >= 16 && col("vec_id") % 89 === 7))
      .unionByName(changed) // changes
      .unionByName(base.where(col("vec_id") % 41 === 3) // adds
        .select((col("vec_id") + 1000000).as("vec_id"),
          reverse(col("embedding")).as("embedding")))
    assertParity(newEmb)
  }

  test("empty delta returns the base state ITSELF (identity, not a rebuild)") {
    val st = Ivf.knnGraphBuild(base, k, nCents, nProbe)
    val refreshed = Ivf.knnGraphRefresh(st, base, k, nCents, nProbe)
    // reference equality: proves the (id, md5-of-normalized-vector)
    // diff found ZERO changed rows — an == on edge rows would also pass
    // if the diff misfired into the rebuild fallback (it did once: the
    // to_json struct field name made every fingerprint differ)
    assert(refreshed.ranked eq st.ranked)
    assert(refreshed.edges eq st.edges)
  }

  test("a small delta stays on the incremental path: planted base row propagates") {
    val spark2 = spark
    import spark2.implicits._
    val st = Ivf.knnGraphBuild(base, k, nCents, nProbe)
    // poison one merge-path src's base edge list with a sentinel
    // neighbor at distance -1: an INCREMENTAL refresh merges base edge
    // rows through (sentinel survives at rank 1); a rebuild would
    // erase it — the decisive behavioral distinguisher for the path
    val sentinel = Seq((17L, 999999L, -1.0, 1L))
      .toDF("src_id", "nbr_id", "distance", "rank")
    val poisoned = st.copy(edges =
      st.edges.where(col("src_id") =!= 17L).unionByName(sentinel))
    val newEmb = base.unionByName(
      base.where(col("vec_id") < 3)
        .select((col("vec_id") + 1000000).as("vec_id"),
          reverse(col("embedding")).as("embedding")))
    val refreshed = Ivf.knnGraphRefresh(poisoned, newEmb, k, nCents, nProbe)
    assert(refreshed.edges
      .where(col("src_id") === 17L && col("nbr_id") === 999999L)
      .count() == 1)
  }

  test("above the broadcast-probe cap the salted shuffle join gives identical edges") {
    // cap = 0 forces the fallback knnEdges path for fullSrcs (the
    // ADVICE r12 guard: near the 10%-delta ceiling the probe side is
    // ~0.1·n·nProbe vector rows — too big to broadcast); results must
    // be byte-identical to the broadcast path AND the rebuild
    val changed = base.where(col("vec_id") >= 16 && col("vec_id") % 89 === 7)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val newEmb = base
      .where(!(col("vec_id") >= 16 && col("vec_id") % 89 === 7))
      .unionByName(changed)
      .unionByName(base.where(col("vec_id") % 41 === 3)
        .select((col("vec_id") + 1000000).as("vec_id"),
          reverse(col("embedding")).as("embedding")))
    val st = Ivf.knnGraphBuild(base, k, nCents, nProbe)
    val capped = Ivf.knnGraphRefresh(st, newEmb, k, nCents, nProbe,
      broadcastProbeBytesCap = 0L)
    val rebuilt = Ivf.knnGraph(newEmb, k, nCents, nProbe)
    assert(edgeRows(capped.edges) == edgeRows(rebuilt))
  }

  test("centroid perturbation degrades to a rebuild, still parity-exact") {
    // removing vec_id 3 changes the first-16 membership -> fallback
    val newEmb = base.where(col("vec_id") =!= 3)
    assertParity(newEmb)
  }

  test("srcs with no touched cell in their probe set keep base edge rows") {
    val st = Ivf.knnGraphBuild(base, k, nCents, nProbe)
    val changed = base.where(col("vec_id") >= 16 && col("vec_id") % 113 === 9)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val newEmb = base.where(!(col("vec_id") >= 16 && col("vec_id") % 113 === 9))
      .unionByName(changed)
    val refreshed = Ivf.knnGraphRefresh(st, newEmb, k, nCents, nProbe)
    // the touched-cell set: old + new assignments of the changed rows
    val changedIds = changed.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(changedIds.nonEmpty, "fixture must exercise a non-empty delta")
    val oldAssign = st.ranked
      .select(col("src_id"), element_at(col("cells.vec_id"), 1).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newAssign = refreshed.ranked
      .select(col("src_id"), element_at(col("cells.vec_id"), 1).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val touched = changedIds.map(oldAssign) ++ changedIds.map(newAssign)
    // a src whose probe set avoids every touched cell must carry its
    // BASE edge rows verbatim in the refreshed frame
    val probeSets = refreshed.ranked
      .select(col("src_id"), col("cells.vec_id").as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val untouched = probeSets.collect {
      case (src, cells) if (cells & touched).isEmpty => src
    }.toSet
    assert(untouched.nonEmpty, "fixture must leave some srcs untouched")
    val baseEdges = edgeRows(st.edges).filter(t => untouched(t._1))
    val refEdges = edgeRows(refreshed.edges).filter(t => untouched(t._1))
    assert(baseEdges == refEdges)
  }

  test("tracked refresh: changedSrcs covers every differing src, state identical") {
    val st = Ivf.knnGraphBuild(base, k, nCents, nProbe)
    val changed = base.where(col("vec_id") >= 16 && col("vec_id") % 89 === 7)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val newEmb = base
      .where(!(col("vec_id") >= 16 && col("vec_id") % 97 === 5))
      .where(!(col("vec_id") >= 16 && col("vec_id") % 89 === 7))
      .unionByName(changed)
      .unionByName(base.where(col("vec_id") % 41 === 3)
        .select((col("vec_id") + 1000000).as("vec_id"),
          reverse(col("embedding")).as("embedding")))
    val rr = Ivf.knnGraphRefreshTracked(st, newEmb, k, nCents, nProbe)
    assert(rr.changedSrcs.isDefined,
      "incremental path must report a changed-src frame")
    val reported = rr.changedSrcs.get.collect().map(_.getLong(0)).toSet
    // edges: a src whose rows differ between base and refreshed MUST be
    // reported (superset may list unchanged srcs — that is allowed)
    val baseBySrc = edgeRows(st.edges).groupBy(_._1)
    val refBySrc = edgeRows(rr.state.edges).groupBy(_._1)
    val differing = (baseBySrc.keySet ++ refBySrc.keySet)
      .filter(s => baseBySrc.get(s) != refBySrc.get(s))
    assert(differing.nonEmpty, "fixture must change some edge lists")
    assert(differing.subsetOf(reported),
      s"unreported changed srcs: ${differing -- reported}")
    // and TIGHT on the merge side (r15): a reported src is either an
    // actual change, a full-recompute src (delta id or a src whose base
    // top-k held a removed/changed neighbor), or a removed src — a
    // merge src that kept its base rows must NOT be reported
    val deltaIds = changed.select(col("vec_id")).collect().map(_.getLong(0)).toSet ++
      (base.select(col("vec_id")).collect().map(_.getLong(0)).toSet --
        newEmb.select(col("vec_id")).collect().map(_.getLong(0)).toSet) ++
      (newEmb.select(col("vec_id")).collect().map(_.getLong(0)).toSet --
        base.select(col("vec_id")).collect().map(_.getLong(0)).toSet)
    val lossy = edgeRows(st.edges)
      .filter(t => deltaIds(t._2)).map(_._1).toSet
    val explained = differing ++ lossy ++ deltaIds
    assert(reported.subsetOf(explained),
      s"over-reported merge srcs: ${reported -- explained}")
    // ranked: outside the reported set, rows are the base rows verbatim
    val keep = !col("src_id").isin(reported.toSeq: _*)
    assert(st.ranked.where(keep).except(rr.state.ranked.where(keep)).count() == 0)
    assert(rr.state.ranked.where(keep).except(st.ranked.where(keep)).count() == 0)
    // and the tracked state is still parity-exact with a rebuild
    assert(edgeRows(rr.state.edges) ==
      edgeRows(Ivf.knnGraph(newEmb, k, nCents, nProbe)))
  }

  test("tracked refresh: rebuild fallback reports None, empty delta reports empty") {
    val st = Ivf.knnGraphBuild(base, k, nCents, nProbe)
    // centroid perturbation -> rebuild -> None (every src may differ)
    val rebuilt = Ivf.knnGraphRefreshTracked(
      st, base.where(col("vec_id") =!= 3), k, nCents, nProbe)
    assert(rebuilt.changedSrcs.isEmpty)
    // identity -> Some(empty)
    val idem = Ivf.knnGraphRefreshTracked(st, base, k, nCents, nProbe)
    assert(idem.changedSrcs.isDefined && idem.changedSrcs.get.count() == 0)
    assert(idem.state.ranked eq st.ranked)
  }
}
