package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Driver smoke contract: entry() returns rows; every oracleSql key has a
  * matching queries entry; query/oracle column names align by construction
  * (checked value-exactly by tools/check_oracle.py in CI-of-record). */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry() yields rows on sf0.001 (driver smoke)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() === 1000)
    assert(df.columns.toSet === Set("url", "doc_type", "n_chars", "quality"))
  }

  test("every oracleSql key has a queries implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"query $name returned no rows")
    }
  }
}
