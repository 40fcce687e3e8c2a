package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class PackingSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("packing")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Single-global-window reference spelling (the oracle's spec). */
  private def reference(rows: Seq[(Long, Long)], binSize: Long): Seq[(Long, Long, Long, Long)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, cost) =>
      val start = acc; acc += cost
      (id, cost, start, start / binSize)
    }
  }

  test("packStats: two-phase prefix sum equals the global-window spec on sparse ids") {
    // non-contiguous, non-uniform ids (squares) with varied costs
    val rows = (1L to 300L).map(i => (i * i, (i * 37) % 900 + 1))
    val out = Packing.packStats(rows.toDF("doc_id", "n_chars"),
        binSize = 5000L, nBuckets = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === reference(rows, 5000L))
  }

  test("packStats: bucket count never changes the answer (1, 7, more-than-rows)") {
    val rows = (0L until 50L).map(i => (i * 3 + 1, i % 9 + 1))
    val ref = reference(rows, 20L)
    for (b <- Seq(1, 7, 200)) {
      val out = Packing.packStats(rows.toDF("doc_id", "n_chars"),
          binSize = 20L, nBuckets = b)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq === ref, s"nBuckets=$b")
    }
  }

  test("packStats: a boundary-straddling doc stays with its start bin") {
    // doc 2 starts at offset 90 (bin 0 for binSize 100) and spills into bin 1
    val rows = Seq((1L, 90L), (2L, 50L), (3L, 10L))
    val out = Packing.packStats(rows.toDF("doc_id", "n_chars"),
        binSize = 100L, nBuckets = 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 0L), (90L, 0L), (140L, 1L)))
  }

  test("packStats: empty input yields empty output with the full schema") {
    val out = Packing.packStats(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_chars"))
    assert(out.columns.toSeq === Seq("doc_id", "n_chars", "start_offset", "bin"))
    assert(out.count() === 0L)
  }

  test("packStats: the window is bucket-partitioned, never global") {
    val df = (0L until 100L).map(i => (i, 10L)).toDF("doc_id", "n_chars")
    val plan = Packing.packStats(df, binSize = 100L, nBuckets = 8)
      .queryExecution.optimizedPlan.toString
    // the window spec must carry the bucket partition key; a global window
    // would have an empty partitionBy (single-task prefix sum)
    assert(plan.contains("_bkt"), plan)
    assert(plan.contains("windowspecdefinition(_bkt"), plan)
  }
}
