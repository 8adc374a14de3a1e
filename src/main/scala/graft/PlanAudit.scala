package graft

/** Dev tool: print the formatted physical plan of selected queries (all
  * by default). The per-round plan review — pushdown reached the scan?
  * broadcast where expected? partial aggregation before the shuffle? —
  * runs off this output (`sbt "runMain graft.PlanAudit q_projection ..."`).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.build(8, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
