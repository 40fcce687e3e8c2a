package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.kernel.ExtractKernel
import graft.tables.SnapshotTable

/**
 * The flagship dataflow (SURVEY.md §3.4) — the whole reference pipeline
 * (fetcher -> orchestrator -> processor -> uploader,
 * /root/reference/src/orchestrator.py + app.py) as ONE Spark job:
 *
 *   scan pages (column-pruned to url+html)
 *     -> anti-join against committed output snapshot   (resume; S1/S2)
 *     -> salt on xxhash64(url) + repartition            (skew defuse; §4.3)
 *     -> mapPartitions(ExtractKernel)                   (the "container")
 *     -> append to SnapshotTable + atomic commit        (uploader/K1)
 *
 * Explicit physical decisions (north_rule): exactly one shuffle (the salted
 * repartition); the scan prunes to (url, html) so the fat binary column is
 * the only payload moved; the anti-join build side is the committed url set
 * (sort-merge at scale — NOT broadcast, the done-set grows unboundedly);
 * partition count P and salt count S are explicit inputs sized for
 * ~128MB html per task at the target scale.
 */
object Extract {

  /** Done-set row count at which resume switches from plain left_anti to
    * the Bloom-pruned exact anti-join: ~4M rows is past any sane broadcast
    * threshold, while the bloom build itself stays trivial (8 MB cap). */
  val DefaultBloomResumeMinRows: Long = 4L << 20

  final case class Metrics(version: Int, input: Long, extracted: Long,
                           failed: Long, bytesIn: Long)

  final case class PageSlim(url: String, html: Array[Byte])
  /** Pending row with its retry count (prior failed attempts, 0 first time)
    * and the canonical url key it salts/dedups/resumes on. */
  final case class PageJob(url: String, html: Array[Byte], prior_attempts: Int,
                           url_key: Long)

  /** Run one incremental extraction pass. Quarantine semantics follow the
    * reference's retry-then-terminal state machine (src/queue.py:59-78): a
    * url whose rows are all failures with < maxRetries attempts is still
    * pending — it is re-driven here with attempt = prior failure count —
    * and becomes terminal only at maxRetries. */
  def run(spark: SparkSession, pagesDf: DataFrame, table: SnapshotTable,
          numSalts: Int = 256, numPartitions: Int = 0,
          maxRetries: Int = SnapshotTable.DefaultMaxRetries,
          bloomResumeMinRows: Long = DefaultBloomResumeMinRows): Metrics = {
    import spark.implicits._

    val p = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism

    // column pruning is explicit: url + html only (html is the fat column;
    // text/lang/warc_ts are never read — verify via .explain ReadSchema).
    // The canonical url key (xxhash64 of the RFC 3986-normalized url,
    // functions/UrlFunctions) computes in the same scan projection and is
    // THE pipeline key: salting, within-batch variant collapse, and resume
    // all go through it, so two spellings of one page are one extraction —
    // the normalization the reference's url-keyed queue lacks
    // (src/queue.py:24-33 keys raw strings).
    val pages = pagesDf.select(col("url"), col("html"))
      .withColumn("url_key", graft.functions.UrlFunctions.urlKey(col("url")))
    def keyed(done: DataFrame): DataFrame =
      done.select(graft.functions.UrlFunctions.urlKey(col("url")).as("url_key"))

    // Resume (S1/S2, the claim query the reference revolves around —
    // src/queue.py:24-33). Two exact, row-identical strategies:
    //  - done-set below `bloomResumeMinRows` (or unsized external chain):
    //    plain left_anti — Catalyst/AQE broadcasts a small build side;
    //  - at/above it: Bloom-pruned exact anti-join — the fat (url, html)
    //    side is never exchanged, which is the shape a 100 TB done-set
    //    needs (see operators/BloomResume.scala). The manifest row total
    //    upper-bounds distinct done urls, so the filter is never undersized
    //    by more than the retry fraction (fpp degrades, exactness doesn't).
    val notDone = table.doneUrls(spark, maxRetries) match {
      case Some(done) =>
        table.chainRowTotal match {
          case Some(est) if est >= bloomResumeMinRows =>
            graft.operators.BloomResume.bloomAntiJoin(pages, keyed(done), "url_key", est)
          case _ => pages.join(keyed(done), Seq("url_key"), "left_anti")
        }
      case None => pages
    }
    // attach prior attempt counts for re-driven failures. The set is small
    // by construction (failed-but-retryable urls only) so Catalyst/AQE will
    // normally broadcast it — but the hint is NOT forced: a pathological
    // all-failing corpus must degrade to a shuffle join, not OOM the driver.
    val pending = table.retryAttempts(spark, maxRetries) match {
      case Some(att) =>
        // pre-aggregate to ONE row per url_key (max attempts across url
        // spellings that canonicalize together): the left join then cannot
        // fan a page row out, and the surviving retry count is
        // deterministic rather than sort-tie-order-dependent
        val attKeyed = att.select(
            graft.functions.UrlFunctions.urlKey(col("url")).as("url_key"),
            col("prior_attempts"))
          .groupBy(col("url_key"))
          .agg(max(col("prior_attempts")).as("prior_attempts"))
        notDone.join(attKeyed, Seq("url_key"), "left")
          .withColumn("prior_attempts", coalesce(col("prior_attempts"), lit(0)))
      case None => notDone.withColumn("prior_attempts", lit(0))
    }

    val bytesIn: LongAccumulator = spark.sparkContext.longAccumulator("graft.bytesIn")
    val docsOk = spark.sparkContext.longAccumulator("graft.docsOk")
    val docsFailed = spark.sparkContext.longAccumulator("graft.docsFailed")
    // per-partition lineage (K5 analog of the reference's per-job processor
    // log): (partition, docs, ms) — the partition-time histogram is the
    // evidence that salting defused host skew (§4.3)
    val partStats = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("graft.partStats")

    // Salt on the canonical key (variants share a salt, hence a partition),
    // then sort within partitions by (url_key, url): the spillable external
    // sort groups variant spellings adjacently so the kernel iterator
    // collapses them streaming — deterministic (lexicographically smallest
    // spelling survives), no per-partition buffering, and still exactly one
    // exchange (the Sort is partition-local).
    val docsDeduped = spark.sparkContext.longAccumulator("graft.docsDeduped")
    val salted = pending
      .withColumn("salt", pmod(col("url_key"), lit(numSalts)).cast("int"))
      .repartition(p, col("salt"))
      .sortWithinPartitions(col("url_key"), col("url"))
      .select(col("url"), col("html"), col("prior_attempts"), col("url_key"))
      .as[PageJob]

    val extracted = salted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val taskRetry = Option(TaskContext.get()).map(_.attemptNumber).getOrElse(0)
      val t0 = System.nanoTime()
      var nDocs = 0L
      var prevKey = 0L
      var first = true
      val mapped = it.filter { pg =>
        val keep = first || pg.url_key != prevKey
        prevKey = pg.url_key; first = false
        if (!keep) docsDeduped.add(1)
        keep
      }.map { pg =>
        bytesIn.add(if (pg.html == null) 0 else pg.html.length.toLong)
        val doc = ExtractKernel.extractOne(pg.url, pg.html, pid,
          pg.prior_attempts + taskRetry)
        if (doc.error == null) docsOk.add(1) else docsFailed.add(1)
        nDocs += 1
        doc
      }
      new Iterator[ExtractKernel.ExtractedDoc] {
        private var recorded = false
        override def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h && !recorded) {
            recorded = true
            partStats.add((pid, nDocs, (System.nanoTime() - t0) / 1000000L))
          }
          h
        }
        override def next(): ExtractKernel.ExtractedDoc = mapped.next()
      }
    }

    // single action: write the data files (error column stays with the data,
    // so one pass covers both success and quarantine rows), then publish the
    // manifest and flip the pointer. Committed row metrics are derived from
    // the WRITTEN snapshot, not the accumulators: Spark does not deduplicate
    // transformation-stage accumulator updates, so task retries/speculation
    // would double-count them. bytes_in has no output-side equivalent and
    // stays accumulator-observed (approximate under retries, documented).
    val outDf = extracted.toDF()
    val (version, snapDir) = table.writeData(outDf)
    // explicit schema: a no-op snapshot writes zero part files and schema
    // inference would fail on the empty directory
    val counts = spark.read.schema(outDf.schema).parquet(snapDir)
      .agg(count(lit(1)), count(when(col("error").isNull, lit(1))))
      .collect()(0)
    val (written, ok) = (counts.getLong(0), counts.getLong(1))
    val metrics = Map[String, Long](
      "input" -> written,
      "extracted" -> ok,
      "failed" -> (written - ok),
      "deduped" -> docsDeduped.value.toLong,
      "bytes_in" -> bytesIn.value.toLong)
    import scala.jdk.CollectionConverters._
    val lineageRows = partStats.value.asScala.toSeq.sortBy(_._1).map {
      case (pid, docs, ms) =>
        Map[String, Long]("partition" -> pid.toLong, "docs" -> docs, "ms" -> ms)
    }
    table.commitManifest(version, snapDir, metrics, lineage = lineageRows)
    Metrics(version, written, ok, written - ok, bytesIn.value)
  }

  /** Quarantined rows of the current snapshot (K2 semantics): every failed
    * attempt row, with its attempt number. A url appears once per failed
    * attempt (the retry history); filter `attempt >= maxRetries - 1` for
    * terminal rows only. */
  def quarantine(spark: SparkSession, table: SnapshotTable): DataFrame =
    table.read(spark).filter(col("error").isNotNull)
      .select("url", "error", "lineage.partition_id", "lineage.attempt")

  /** A1-style status rollup over the output table (src/queue.py:80-96),
    * resolved per url across retries: done / done_empty on any success,
    * error once terminally failed, pending_retry while attempts remain
    * (the analog of the reference's `pending` after a failed try). */
  def statusCounts(spark: SparkSession, table: SnapshotTable,
                   maxRetries: Int = SnapshotTable.DefaultMaxRetries): DataFrame =
    table.read(spark)
      .groupBy("url")
      .agg(
        max(when(col("error").isNull && col("extracted_text").isNotNull, 1)
          .otherwise(0)).as("has_done"),
        max(when(col("error").isNull && col("extracted_text").isNull, 1)
          .otherwise(0)).as("has_empty"),
        sum(when(col("error").isNotNull, 1).otherwise(0)).as("fails"))
      .withColumn("status",
        when(col("has_done") === 1, "done")
          .when(col("has_empty") === 1, "done_empty")
          .when(col("fails") >= maxRetries, "error")
          .otherwise("pending_retry"))
      .groupBy("status").count()
}

/**
 * CLI main for spark-submit runs and local e2e:
 *   ExtractMain <pagesParquetDir> <tableDir> [numPartitions]
 * Synthesizes nothing — reads an existing pages table (see FixtureMain).
 */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    val pagesPath = args(0)
    val tableDir = args(1)
    val parts = if (args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = new SnapshotTable(tableDir)
    val m = Extract.run(spark, spark.read.parquet(pagesPath), table, numPartitions = parts)
    println(s"""{"version":${m.version},"input":${m.input},"extracted":${m.extracted},"failed":${m.failed},"bytes_in":${m.bytesIn}}""")
    spark.stop()
  }
}

/** FixtureMain <outDir> <rows> [seed]: write the deterministic pages corpus. */
object FixtureMain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val rows = args(1).toLong
    val seed = if (args.length > 2) args(2).toLong else 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-fixtures")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(rows)
      .mapPartitions(_.map(i => graft.fixtures.PageGen.page(i, seed)))
      .write.mode("overwrite").parquet(outDir)
    println(s"""{"rows":$rows,"dir":"$outDir"}""")
    spark.stop()
  }
}
