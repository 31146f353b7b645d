package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture utility: prints the formatted physical plan of one or more
  * SparkEntry queries. Usage: graft.Explain <sfDir> <queryName> [...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"== $n ==")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // .explain("formatted") — the numbered-operator form the round's
      // plan artifacts commit (plans/r*/<query>_{before,after}.txt)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
