package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {

  private def doc(seed: Int, words: Int = 150): String = {
    val r = new scala.util.Random(seed)
    (0 until words).map(_ => s"tok${r.nextInt(900)}").mkString(" ")
  }

  test("winnowing guarantee: any shared run >= w+k-1 chars yields a shared fingerprint") {
    val k = 8; val w = 16
    val shared = "this exact shared passage is long enough to guarantee a match"
    assert(shared.length >= w + k - 1)
    val a = doc(1) + " " + shared + " " + doc(2)
    val b = doc(3) + " " + shared + " " + doc(4)
    val fa = Winnow.fingerprints(a, k, w)
    val fb = Winnow.fingerprints(b, k, w)
    assert(fa.intersect(fb).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("overlap is high for near-duplicates, low for unrelated docs") {
    val base = doc(10, 300)
    val near = base.replace("tok1", "changed")
    val other = doc(99, 300)
    val fBase = Winnow.fingerprints(base)
    assert(Winnow.overlap(fBase, Winnow.fingerprints(near)) > 0.7)
    assert(Winnow.overlap(fBase, Winnow.fingerprints(other)) < 0.2)
    // identical after whitespace/case normalization
    val shouted = base.toUpperCase.replace(" ", "   ")
    assert(Winnow.overlap(fBase, Winnow.fingerprints(shouted)) === 1.0)
  }

  test("edge cases: empty, shorter than k, shorter than window") {
    assert(Winnow.fingerprints(null).isEmpty)
    assert(Winnow.fingerprints("").isEmpty)
    assert(Winnow.fingerprints("tiny").length === 1)
    assert(Winnow.fingerprints("a bit longer than k").nonEmpty)
    // deterministic
    val t = doc(5)
    assert(Winnow.fingerprints(t).sameElements(Winnow.fingerprints(t)))
  }

  test("winnow_fingerprints expression matches the kernel") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(doc(1), doc(2), "", "tiny")
    val got = texts.toDF("text")
      .select(graft.functions.DedupFunctions.winnow_fingerprints(col("text")).as("fp"),
        col("text"))
      .collect().map(r => r.getString(1) -> r.getSeq[Long](0).toArray).toMap
    texts.foreach { t =>
      assert(got(t).sameElements(Winnow.fingerprints(t)), s"mismatch for '${t.take(20)}'")
    }
  }
}
