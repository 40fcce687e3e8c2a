package graft

import org.apache.spark.sql.SparkSession

/**
 * Round-7 optimization harness (Bench.scala is FROZEN for measurement; this
 * separate main exists per guide §1: isolate and re-time queries without
 * touching the driver contract).
 *
 * Modes:
 *   runMain graft.BenchExtra plans <outDir> <suffix> [queryCsv]
 *     — write .explain("formatted") for each query to <outDir>/<name>_<suffix>.txt
 *   runMain graft.BenchExtra time <reps> [queryCsv]
 *     — time each query `reps` times with the exact Bench methodology
 *       (fn(spark, sfDir).count()), print min/median per query as JSON.
 *   runMain graft.BenchExtra noop <reps> [queryCsv]
 *     — same but with the noop sink (guide §1.4: computes EVERY column),
 *       for isolating compute that .count() would let the optimizer prune.
 *
 * Uses the same session shape as Bench.buildSession and the same
 * $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS contract.
 */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.nonEmpty) args(0) else "time"

    def selected(csvIdx: Int): Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      if (args.length > csvIdx && args(csvIdx).nonEmpty) {
        val want = args(csvIdx).split(",").toSet
        all.filter(q => want.contains(q._1))
      } else all
    }

    mode match {
      case "plans" =>
        val outDir = new java.io.File(args(1))
        outDir.mkdirs()
        val suffix = args(2)
        selected(3).foreach { case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            val w = new java.io.FileWriter(new java.io.File(outDir, s"${name}_$suffix.txt"))
            try w.write(plan) finally w.close()
            System.err.println(s"[plans] wrote $name")
          } catch {
            case e: Throwable => System.err.println(s"[plans] $name FAILED: $e")
          }
        }

      case "ab" =>
        // interleaved same-JVM A/B of the graft.fan toggle: variants
        // alternate rep by rep so both see the same host phase
        val reps = if (args.length > 1) args(1).toInt else 4
        try spark.read.parquet(s"$sfDir/documents.parquet").limit(10).count()
        catch { case _: Throwable => }
        selected(2).foreach { case (name, fn) =>
          val a = scala.collection.mutable.ArrayBuffer.empty[Double]
          val b = scala.collection.mutable.ArrayBuffer.empty[Double]
          for (r <- 1 to reps * 2) {
            val fan = r % 2 == 1
            System.setProperty("graft.fan", if (fan) "1" else "0")
            val t0 = System.nanoTime()
            try fn(spark, sfDir).count()
            catch { case e: Throwable => System.err.println(s"[$name] ERR $e") }
            val t = (System.nanoTime() - t0) / 1e9
            (if (fan) a else b) += t
          }
          System.err.println(f"[ab] $name%-22s fan=${a.min}%7.3f nofan=${b.min}%7.3f  (fan ${a.map(t => f"$t%.2f").mkString(",")} | nofan ${b.map(t => f"$t%.2f").mkString(",")})")
        }
        System.setProperty("graft.fan", "1")

      case "time" | "noop" =>
        val reps = if (args.length > 1) args(1).toInt else 3
        // warmup (same as Bench)
        try spark.read.parquet(s"$sfDir/documents.parquet").limit(10).count()
        catch { case _: Throwable => }
        val results = selected(2).map { case (name, fn) =>
          spark.sparkContext.setJobDescription(name)
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            try {
              if (mode == "noop")
                fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              else fn(spark, sfDir).count()
            } catch { case e: Throwable => System.err.println(s"[$name] ERR $e") }
            (System.nanoTime() - t0) / 1e9
          }.sorted
          val mn = times.head
          val md = times(times.length / 2)
          System.err.println(f"[$mode] $name%-24s min=$mn%7.3f med=$md%7.3f (${times.map(t => f"$t%.2f").mkString(",")})")
          (name, mn, md)
        }
        val total = results.map(_._2).sum
        val js = results.map { case (n, mn, md) =>
          s""""$n":{"min":${"%.3f".format(mn)},"med":${"%.3f".format(md)}}"""
        }.mkString("{", ",", "}")
        println(s"""{"mode":"$mode","reps":${reps},"total_min":${"%.3f".format(total)},"queries":$js}""")
    }
    spark.stop()
  }
}
