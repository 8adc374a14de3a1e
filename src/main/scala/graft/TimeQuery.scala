package graft

/** Dev tool: time named queries individually (warm-up + 2 passes, min),
  * without running the whole bench suite.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.TimeQuery q_x q_y"` */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(Sessions.cpusFromEnv, "graft-time-query")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      Bench.materialize(fn(spark, sfDir)) // warm-up
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Bench.materialize(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name ${times.min}%.2f s")
    }
    spark.stop()
  }
}
