package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * One-pass kernel for the Gopher §A.1.1 WITHIN-DOCUMENT repetition
 * statistics (Rae et al. 2021, Table A1 — reimplemented from the
 * published description). The definitions are EXACTLY the ones
 * QualityFilters.gopherRepetitionFlags documents (and the DuckDB oracle
 * mirrors); this kernel replaces the per-position array-HOF scans —
 * O(W²) string comparisons per document, an interpreted-lambda straggler
 * risk on multi-hundred-KB pages at crawl scale — with hash-map counting:
 * O(W·n) work and ONE pass per n-gram size, inside whole-stage codegen.
 *
 * Exact integer semantics preserved bit-for-bit (same outputs on every
 * input, verified by the planted-failure spec, an HOF-reference property
 * spec, and the unchanged q_gopher_rep DuckDB oracle):
 *  - n-grams are the space-joined word windows; equality is string
 *    equality of the joined gram (words never contain whitespace, so the
 *    join is unambiguous);
 *  - top-n-gram chars = count(most frequent gram) * (gram code points
 *    minus the n-1 separator spaces); count ties break to the LARGEST
 *    character length;
 *  - dup-n-gram chars = code points of words covered by >= 1 gram that
 *    occurs more than once (positions marked once — overlaps never
 *    double-count);
 *  - dup lines / dup line chars over the provided lines array
 *    (occurrences beyond the first of each distinct line; char count
 *    sums ALL occurrences of each duplicated line);
 *  - all "chars" are code points (UTF8String.numChars — what Spark's
 *    length() returns), never UTF-16 units.
 */
object RepExprs {

  val StatsSchema: StructType = StructType(
    (Seq("n_lines", "n_dup_lines", "n_line_chars", "n_dup_line_chars",
      "n_word_chars", "top2_chars", "top3_chars", "top4_chars") ++
      (5 to 10).map(n => s"dup${n}_chars"))
      .map(StructField(_, IntegerType, nullable = false)))

  /** Static entry point for codegen (stable JVM name). */
  def gopherRepStats(w: ArrayData, lines: ArrayData): InternalRow = {
    val W = w.numElements()
    // words decoded once, shared by every n: strings for gram keys,
    // numChars (code points) for every char sum
    val ws = new Array[String](W)
    val wchars = new Array[Int](W)
    var nWordChars = 0
    var i = 0
    while (i < W) {
      val u = w.getUTF8String(i)
      ws(i) = u.toString
      wchars(i) = u.numChars()
      nWordChars += wchars(i)
      i += 1
    }

    // line stats: one hash-map pass (count per distinct line)
    val L = lines.numElements()
    val lineCounts = new java.util.HashMap[UTF8String, Array[Int]](L * 2)
    var nLineChars = 0
    i = 0
    while (i < L) {
      val l = lines.getUTF8String(i)
      nLineChars += l.numChars()
      val c = lineCounts.get(l)
      if (c == null) lineCounts.put(l.clone(), Array(1)) else c(0) += 1
      i += 1
    }
    val nDupLines = L - lineCounts.size()
    var nDupLineChars = 0
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      if (e.getValue()(0) > 1) nDupLineChars += e.getValue()(0) * e.getKey.numChars()
    }

    // per-n gram counting: value = {count, windowCharSum} — the char sum
    // is a function of the gram string (words hold no whitespace, so the
    // space-join decomposes uniquely), stored to skip re-decoding
    def gramCounts(n: Int): java.util.HashMap[String, Array[Int]] = {
      val m = new java.util.HashMap[String, Array[Int]]((W - n + 1) * 2)
      val sb = new java.lang.StringBuilder(64)
      var winSum = 0
      var j = 0
      while (j < n) { winSum += wchars(j); j += 1 }
      var s = 0
      while (s + n <= W) {
        sb.setLength(0)
        var k = s
        while (k < s + n) {
          if (k > s) sb.append(' ')
          sb.append(ws(k))
          k += 1
        }
        val key = sb.toString
        val c = m.get(key)
        if (c == null) m.put(key, Array(1, winSum)) else c(0) += 1
        if (s + n < W) winSum += wchars(s + n) - wchars(s)
        s += 1
      }
      m
    }

    // top-n-gram: max count, ties to the largest char sum
    def topChars(n: Int): Int = {
      if (W < n) return 0
      val m = gramCounts(n)
      var mc = 0
      var best = 0
      val it = m.values().iterator()
      while (it.hasNext) {
        val v = it.next()
        if (v(0) > mc || (v(0) == mc && v(1) > best)) {
          if (v(0) > mc) { mc = v(0); best = v(1) }
          else best = v(1)
        }
      }
      mc * best
    }

    // dup-n-gram: mark covered word positions once, sum their code points
    def dupChars(n: Int): Int = {
      if (W < n) return 0
      val m = gramCounts(n)
      val covered = new Array[Boolean](W)
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s + n <= W) {
        sb.setLength(0)
        var k = s
        while (k < s + n) {
          if (k > s) sb.append(' ')
          sb.append(ws(k))
          k += 1
        }
        if (m.get(sb.toString)(0) > 1) {
          var k2 = s
          while (k2 < s + n) { covered(k2) = true; k2 += 1 }
        }
        s += 1
      }
      var sum = 0
      var j = 0
      while (j < W) { if (covered(j)) sum += wchars(j); j += 1 }
      sum
    }

    val out = new Array[Any](14)
    out(0) = L
    out(1) = nDupLines
    out(2) = nLineChars
    out(3) = nDupLineChars
    out(4) = nWordChars
    out(5) = topChars(2)
    out(6) = topChars(3)
    out(7) = topChars(4)
    var n = 5
    while (n <= 10) { out(3 + n) = dupChars(n); n += 1 }
    new GenericInternalRow(out)
  }
}

/** gopher_rep_stats(words, lines): all 14 repetition statistics as one
  * struct, computed in a single codegen'd kernel call per document. */
case class GopherRepStats(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = RepExprs.StatsSchema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<STRING>, ARRAY<STRING>), got $other")
    }
  override def nullSafeEval(w: Any, l: Any): Any =
    RepExprs.gopherRepStats(w.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, l) =>
      s"graft.functions.RepExprs.gopherRepStats($w, $l)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GopherRepStats =
    copy(left = l, right = r)
  override def prettyName: String = "gopher_rep_stats"
}

object RepetitionFunctions {
  def gopher_rep_stats(words: Column, lines: Column): Column =
    ColumnBridge.column(GopherRepStats(
      ColumnBridge.expression(words), ColumnBridge.expression(lines)))
}
