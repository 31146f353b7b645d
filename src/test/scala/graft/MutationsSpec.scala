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
}
