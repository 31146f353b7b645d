package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutation-log fold — the WHAT of the reference's Raft-replicated write
  * path without the HOW (SURVEY §2.4/§2.5: consensus maps to zero Spark
  * operators; durable total order comes from an append-only log).
  *
  * The log rows mirror the reference's state-machine commands
  * (reference api/rest/distributed_server.py:95-121 `apply_command`:
  * `{"type": "insert", ...}` / `{"type": "delete", id}`), and the fold
  * preserves its apply-order semantics: later commands win, an insert with
  * an existing id overwrites (reference core/hnsw/graph.py:131-139), a
  * delete removes (graph.py:191-207).
  *
  * Scale: last-writer-wins is a `max_by(…, seq)` AGGREGATE, not a ranking
  * window — partial aggregation combines map-side, so the shuffle carries
  * one row per live id instead of the whole log. The log is append-only
  * parquet, so incremental folds only read new files.
  */
object Mutations {

  /** Fold a mutation log into the visible table.
    *
    * `log` schema: (seq LONG — total order, op STRING 'insert'|'delete',
    * vec_id LONG, label INT nullable for deletes).
    * Returns the post-apply table (vec_id, label).
    */
  def apply(log: DataFrame): DataFrame =
    log
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("op"), col("label")), col("seq")).as("last"))
      .where(col("last.op") === "insert")
      .select(col("vec_id"), col("last.label").as("label"))
      .orderBy(col("vec_id"))

  /** Deterministic demo log built from the embeddings fixture:
    * phase 0 — every row inserted (seq = vec_id);
    * phase 1 — vec_id % 10 == 0 re-inserted with label+100 (overwrite);
    * phase 2 — vec_id % 7 == 0 deleted.
    * Exercises insert, id-overwrite, and delete in one fold.
    */
  def demoLog(emb: DataFrame): DataFrame = {
    val base = emb.select(
      col("vec_id").as("seq"), lit("insert").as("op"), col("vec_id"), col("label"))
    val updates = emb.where(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 1000000L).as("seq"), lit("insert").as("op"),
      col("vec_id"), (col("label") + 100).as("label"))
    val deletes = emb.where(col("vec_id") % 7 === 0).select(
      (col("vec_id") + 2000000L).as("seq"), lit("delete").as("op"),
      col("vec_id"), lit(null).cast("int").as("label"))
    base.unionByName(updates).unionByName(deletes)
  }
}
