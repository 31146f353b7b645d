package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-versioning primitive: between two
  * versions of a corpus, report what was added, removed, or changed
  * (by content fingerprint), so a pipeline can re-run ONLY the delta
  * (the incremental-dedup/incremental-winnow companions consume exactly
  * these rows) and an audit trail exists for what moved between
  * training runs.
  *
  * Change detection is [[TextAnalysis.fingerprint]] (md5 of normalized
  * text) — engine-portable, so the whole diff is oracle-checkable.
  * Unchanged documents are filtered server-side; the output is only the
  * delta.
  *
  * Scale shape: one full-outer equi-join on the id — the minimal
  * shuffle for a keyed diff; fingerprints are computed map-side so the
  * join carries (id, 16-byte hash), never document text.
  */
object Versioning {

  def snapshotDiff(
      v1: DataFrame,
      v2: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val a = v1.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_old"))
    val b = v2.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("change"))
      .where(col("change") =!= "unchanged")
      .orderBy(col("doc_id"))
  }
}
