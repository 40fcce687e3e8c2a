package graft.fixtures

import org.apache.spark.sql.functions._

/** Spark-side profile: same dataflow with (a) no-op kernel, (b) real kernel,
  * (c) real kernel without encoder (count only a long) — isolates scan/
  * shuffle/encoder/kernel contributions. */
object SparkProfileMain {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 400000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = graft.Bench.materializeCorpus(spark, rows)

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $sec%7.2f s   ${n / sec}%9.0f rows/s")
    }

    val base = spark.read.parquet(dir).select(col("url"), col("html"))
    def salted = base
      .withColumn("salt", pmod(xxhash64(col("url")), lit(256)).cast("int"))
      .repartition(cpus.toInt * 2, col("salt"))
      .select(col("url"), col("html"))
      .as[graft.pipeline.Extract.PageSlim]

    (1 to 2).foreach(i => timed(s"scan-only count p$i")(base.count()))
    (1 to 2).foreach(i => timed(s"scan+shuffle noop p$i")(salted.mapPartitions(_.map(p =>
      (if (p.html == null) 0 else p.html.length).toLong)).toDF().count()))
    (1 to 2).foreach(i => timed(s"no-shuffle kernel p$i")(base.as[graft.pipeline.Extract.PageSlim]
      .mapPartitions(_.map { p =>
        graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0).n_chars
      }).toDF().count()))
    (1 to 3).foreach { pass =>
      timed(s"kernel, full encoder p$pass")(salted.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map(p => graft.kernel.ExtractKernel.extractOne(p.url, p.html, pid, 0))
      }.toDF().filter(col("error").isNull).count())
    }
    spark.stop()
  }
}
