package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool (r21 floor audit): per-query JOB COUNT and wall time — the
  * per-query fixed-overhead floor is made of driver-blocking actions
  * (eager checkpoints, collects, commits), and each one is a Spark job;
  * this prints how many jobs each query's single evaluation schedules so
  * the barrier audit can rank sites by actual job pressure.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProfile [q_x ...]"` */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.build(Sessions.cpusFromEnv, "graft-job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = ()
    })
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // one warm-up evaluation of everything requested (session/scan warm)
    names.foreach(n => Bench.materialize(SparkEntry.queries(n)(spark, sfDir)))
    val rows = names.map { n =>
      Thread.sleep(50) // let listener events drain
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(n)(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      (n, jobs.get() - j0, dt)
    }
    rows.sortBy(-_._3).foreach { case (n, j, t) =>
      println(f"JOBPROF $n%-36s jobs=$j%3d wall=$t%7.3f s")
    }
    println(f"JOBPROF_TOTAL queries=${rows.size} jobs=${rows.map(_._2).sum} wall=${rows.map(_._3).sum}%9.3f s")
    spark.stop()
  }
}
