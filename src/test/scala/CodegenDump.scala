import org.apache.spark.sql.functions._

object CodegenDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val emb = spark.read.parquet(s"${graft.TestSpark.Sf0001}/embeddings.parquet")
    val cents = emb.orderBy("vec_id").limit(8).collect().zipWithIndex.map { case (r, i) =>
      i -> r.getAs[scala.collection.Seq[Float]]("embedding").toSeq }.toSeq
    val sorted = cents.sortBy(_._1)
    val df = emb.withColumn("cid", org.apache.spark.sql.GraftShims.column(
        graft.functions.NearestCentroidDot(
          org.apache.spark.sql.GraftShims.expression(col("embedding")),
          sorted.map(_._1), sorted.map(_._2.map(_.toDouble)))))
      .select(col("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
    import org.apache.spark.sql.execution.debug._
    df.debugCodegen()
  }
}
