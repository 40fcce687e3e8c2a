package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Iceberg-style snapshot table built from scratch (no Iceberg jar in
 * /opt/spark/jars — SURVEY.md §4.3): immutable Parquet data files +
 * versioned JSON manifests + an atomically-renamed VERSION pointer.
 *
 * Layout:
 *   <dir>/data/snap-<v>/part-*.parquet    (data files of snapshot v)
 *   <dir>/metadata/v<v>.json              (manifest: files, parent, metrics, lineage)
 *   <dir>/metadata/VERSION                (current version number; atomic rename)
 *
 * Commit protocol (write data -> write manifest -> rename pointer)
 * reproduces the reference's pending->indexing->done row state machine
 * (/root/reference/src/queue.py:25-78) with snapshot isolation instead of
 * row mutation: a crash before the pointer rename leaves the previous
 * snapshot intact and the partial data dir unreferenced.
 *
 * Readers see the union of the snapshot chain (each snapshot appends data
 * files). `doneUrls` powers incremental resume via left-anti join.
 */
object SnapshotTable {
  /** Reference default: src/settings.py:49 MAX_RETRIES = 3. */
  val DefaultMaxRetries = 3
}

final class SnapshotTable(dirStr: String) {
  import SnapshotTable.DefaultMaxRetries
  private val dir: Path = Paths.get(dirStr)
  private val metaDir = dir.resolve("metadata")
  private val dataDir = dir.resolve("data")
  private val mapper = new ObjectMapper

  final case class Manifest(version: Int, parent: Int, dataDirs: Seq[String],
                            metrics: Map[String, Long],
                            lineage: Seq[Map[String, Long]])

  def currentVersion: Option[Int] = {
    val p = metaDir.resolve("VERSION")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toInt) else None
  }

  def manifest(v: Int): Option[Manifest] = {
    val p = metaDir.resolve(s"v$v.json")
    if (!Files.exists(p)) return None
    val n = mapper.readTree(Files.readAllBytes(p))
    val dirs = n.get("dataDirs").elements().asScala.map(_.asText).toSeq
    val metrics = Option(n.get("metrics")).map { m =>
      m.properties().asScala.map(e => e.getKey -> e.getValue.asLong).toMap
    }.getOrElse(Map.empty)
    val lineage = Option(n.get("lineage")).map { arr =>
      arr.elements().asScala.map { e =>
        e.properties().asScala.map(kv => kv.getKey -> kv.getValue.asLong).toMap
      }.toSeq
    }.getOrElse(Seq.empty)
    Some(Manifest(n.get("version").asInt, n.get("parent").asInt, dirs, metrics, lineage))
  }

  /** All manifests visible at the current snapshot (chain walk). */
  def visibleManifests: Seq[Manifest] = currentVersion match {
    case None => Seq.empty
    case Some(v) =>
      val out = Seq.newBuilder[Manifest]
      var cur = v
      var guard = 0
      while (cur >= 0 && guard < 1000000) {
        manifest(cur) match {
          case Some(m) => out += m; cur = m.parent
          case None => cur = -1
        }
        guard += 1
      }
      out.result()
  }

  /** All data dirs visible at the current snapshot (chain walk). */
  def visibleDataDirs: Seq[String] =
    visibleManifests.flatMap(_.dataDirs.filter(d => Files.exists(Paths.get(d))))

  /** Total quarantined rows across the chain per manifest metrics; None if
    * any manifest lacks the metric (then callers must assume failures). */
  def chainFailedTotal: Option[Long] = {
    val ms = visibleManifests
    val counts = ms.map(_.metrics.get("failed"))
    if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
  }

  /** Total rows written across the chain per manifest metrics ("input" =
    * rows committed per snapshot, successes + quarantine). None if any
    * manifest lacks the metric (externally-built chain). Upper-bounds the
    * distinct done-url count — the Bloom sizing estimate for resume. */
  def chainRowTotal: Option[Long] = {
    val counts = visibleManifests.map(_.metrics.get("input"))
    if (counts.isEmpty || counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
  }

  def isEmpty: Boolean = visibleDataDirs.isEmpty

  /** Read the full table at the current snapshot. */
  def read(spark: SparkSession): DataFrame = {
    val dirs = visibleDataDirs
    require(dirs.nonEmpty, s"snapshot table $dir is empty")
    spark.read.parquet(dirs: _*)
  }

  /** Urls no longer pending: any successful row, or >= maxRetries failed
    * attempts (terminal quarantine). Mirrors the reference's
    * retry-then-terminal state machine (/root/reference/src/queue.py:59-78,
    * MAX_RETRIES at src/settings.py:49): a row that failed fewer than
    * maxRetries times stays pending and is re-driven by the next run.
    *
    * Fast path: when the chain's manifest metrics record zero failures, the
    * done set is the plain column-pruned url scan (no aggregate) — the
    * common case costs nothing extra. */
  def doneUrls(spark: SparkSession, maxRetries: Int = DefaultMaxRetries): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val dirs = visibleDataDirs
    if (dirs.isEmpty) None
    else if (chainFailedTotal.contains(0L))
      Some(spark.read.parquet(dirs: _*).select("url"))
    else {
      // done = any success  ∪  terminally-failed. The aggregate touches ONLY
      // the failed subset (error IS NOT NULL pushes to the scan), so the
      // resume cost stays success-scan + failure-proportional work — never a
      // full-chain groupBy. Duplicate urls in the union are harmless for the
      // anti-join consumer.
      val t = spark.read.parquet(dirs: _*).select(col("url"), col("error"))
      val ok = t.filter(col("error").isNull).select("url")
      val terminal = t.filter(col("error").isNotNull)
        .groupBy("url").agg(count(lit(1)).as("fails"))
        .filter(col("fails") >= maxRetries).select("url")
      Some(ok.union(terminal))
    }
  }

  /** (url, prior_attempts) for urls that failed but are still retryable —
    * the re-drive set. None when the chain is empty or recorded no failures.
    * Aggregates only the failed subset, then anti-joins away urls that later
    * succeeded. Small by construction: Catalyst/AQE will broadcast it. */
  def retryAttempts(spark: SparkSession, maxRetries: Int = DefaultMaxRetries): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val dirs = visibleDataDirs
    if (dirs.isEmpty || chainFailedTotal.contains(0L)) None
    else {
      val t = spark.read.parquet(dirs: _*).select(col("url"), col("error"))
      val ok = t.filter(col("error").isNull).select("url")
      Some(t.filter(col("error").isNotNull)
        .groupBy("url").agg(count(lit(1)).as("fails"))
        .filter(col("fails") < maxRetries)
        .join(ok, Seq("url"), "left_anti")
        .select(col("url"), col("fails").cast("int").as("prior_attempts")))
    }
  }

  /** Write the data files for the next snapshot (the action runs here);
    * manifest is NOT yet visible. Returns (version, snapDir). */
  def writeData(df: DataFrame): (Int, String) = {
    Files.createDirectories(metaDir)
    Files.createDirectories(dataDir)
    val v = currentVersion.map(_ + 1).getOrElse(0)
    val snapDir = dataDir.resolve(s"snap-$v")
    df.write.mode("overwrite").parquet(snapDir.toString)
    (v, snapDir.toString)
  }

  /** Append `df` as a new snapshot. Returns the committed version. */
  def commit(df: DataFrame, metrics: Map[String, Long],
             lineage: Seq[Map[String, Long]] = Seq.empty): Int = {
    val (v, snapDir) = writeData(df)
    commitManifest(v, snapDir, metrics, lineage)
  }

  /** Publish a previously written snapshot: manifest + atomic pointer flip. */
  def commitManifest(v: Int, snapDirStr: String, metrics: Map[String, Long],
                     lineage: Seq[Map[String, Long]] = Seq.empty): Int = {
    val snapDir = Paths.get(snapDirStr)

    val root: ObjectNode = mapper.createObjectNode()
    root.put("version", v)
    root.put("parent", currentVersion.getOrElse(-1))
    val dd: ArrayNode = root.putArray("dataDirs")
    dd.add(snapDir.toString)
    val mn = root.putObject("metrics")
    metrics.foreach { case (k, x) => mn.put(k, x) }
    val ln = root.putArray("lineage")
    lineage.foreach { row =>
      val o = ln.addObject()
      row.foreach { case (k, x) => o.put(k, x) }
    }
    Files.write(metaDir.resolve(s"v$v.json"), mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    // atomic pointer flip: readers see v only after this rename
    val tmp = metaDir.resolve(s"VERSION.tmp.$v")
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, metaDir.resolve("VERSION"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    v
  }
}
