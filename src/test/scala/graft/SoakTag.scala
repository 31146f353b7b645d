package graft

/** Tag for soak-style tests (long-horizon composed loops, multi-minute
  * storms). The default `sbt test` excludes them so the suite finishes
  * inside the driver's test budget; run with SPARK_GRAFT_SOAK=true to
  * include them (build.sbt).
  */
object SoakTag extends org.scalatest.Tag("graft.Soak")
