package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.operators.Dedup

/**
 * Native Catalyst expressions for the dedup hash kernels, so the signature
 * computation runs inside whole-stage codegen directly over the scan —
 * no typed-Dataset deserialization on the hot path, no Scala-UDF boxing.
 * (The FNV band hash is also an expression because ANSI mode makes SQL-level
 * wrapping multiplication impossible — long overflow throws.)
 */
object DedupExprs {
  /** Static entry points for codegen (stable JVM names). */
  def minhashSig(s: UTF8String, numPerms: Int, shingle: Int, seed: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Dedup.signature(s.toString, numPerms, shingle, seed))

  def simhash(s: UTF8String): Long = Dedup.simHash64(s.toString)

  def winnow(s: UTF8String, k: Int, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(graft.kernel.Winnow.fingerprints(s.toString, k, w))

  /** Sign-LSH bucket of a float/double vector; hyperplanes regenerated
    * deterministically per (bits, dim, seed) and cached per executor — no
    * broadcast variable needed. */
  def lshBucket(vec: ArrayData, isDouble: Boolean, bits: Int, dim: Int, seed: Long): Int = {
    val planes = planeCache.getOrElseUpdate((bits, dim, seed),
      graft.operators.Similarity.hyperplanes(bits, dim, seed))
    val n = vec.numElements()
    var b = 0
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val m = math.min(p.length, n)
      var s = 0.0f
      var j = 0
      if (isDouble) while (j < m) { s += vec.getDouble(j).toFloat * p(j); j += 1 }
      else while (j < m) { s += vec.getFloat(j) * p(j); j += 1 }
      if (s >= 0) b |= (1 << i)
      i += 1
    }
    b
  }

  def lshProbes(vec: ArrayData, isDouble: Boolean, bits: Int, dim: Int,
                seed: Long, probes: Int): ArrayData = {
    val b = lshBucket(vec, isDouble, bits, dim, seed)
    val out = new Array[Int](1 + math.min(probes, bits))
    out(0) = b
    var i = 0
    while (i < out.length - 1) { out(i + 1) = b ^ (1 << i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int, Long), Array[Array[Float]]]

  /** Double dot product of two float/double vectors: the exact IEEE
    * left-fold `((0 + a0*b0) + a1*b1) + ...` the zip_with+aggregate HOF
    * spelling computes (each element cast to double BEFORE the multiply),
    * so swapping the HOFs for this native loop changes no result bit —
    * INCLUDING the null edges: zip_with null-pads the shorter array and a
    * null element nulls its product, and `aggregate`'s `+` fold then
    * propagates that null to the whole sum. vecDot mirrors both exactly:
    * mismatched lengths or any null element within the common prefix
    * return SQL NULL (boxed null here). One fused loop, zero allocation
    * on the non-null fast path (the boxed Double is the only alloc; the
    * HOF pair materializes a 2x-width intermediate array and interprets
    * two lambdas per element per PAIR, which is what made the bounded
    * all-pairs baseline ~10x slower than this). */
  def vecDot(a: ArrayData, aDouble: Boolean,
             b: ArrayData, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** FNV-1a over one LSH band of a signature (band b, rowsPerBand r). */
  def bandHash(sig: ArrayData, band: Int, rowsPerBand: Int): Long = {
    var h = 0xCBF29CE484222325L ^ band.toLong
    var i = 0
    val base = band * rowsPerBand
    val n = sig.numElements()
    while (i < rowsPerBand && base + i < n) {
      h ^= sig.getLong(base + i)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }
}

/** minhash_signature(text): array<bigint> MinHash signature. */
case class MinHashSignature(child: Expression, numPerms: Int = 64,
                            shingle: Int = 5, seed: Long = 42L)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    DedupExprs.minhashSig(v.asInstanceOf[UTF8String], numPerms, shingle, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DedupExprs.minhashSig($c, $numPerms, $shingle, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** winnow_fingerprints(text): rolling-hash winnowing fingerprint set. */
case class WinnowFingerprints(child: Expression, k: Int = 8, w: Int = 16)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    DedupExprs.winnow(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DedupExprs.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints = copy(child = c)
  override def prettyName: String = "winnow_fingerprints"
}

/** simhash64(text): 64-bit SimHash over whitespace tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any = DedupExprs.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DedupExprs.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** minhash_band_hash(sig, band): FNV-1a bucket key of one LSH band. */
case class MinHashBandHash(left: Expression, right: Expression, rowsPerBand: Int)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<BIGINT>, INT), got $other")
    }
  override def nullSafeEval(sig: Any, band: Any): Any =
    DedupExprs.bandHash(sig.asInstanceOf[ArrayData], band.asInstanceOf[Int], rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, b) =>
      s"graft.functions.DedupExprs.bandHash($s, $b, $rowsPerBand)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashBandHash =
    copy(left = l, right = r)
  override def prettyName: String = "minhash_band_hash"
}

/** vec_dot(a, b): double dot product of two float/double vectors in one
  * codegen'd loop (see DedupExprs.vecDot for the exact IEEE-parity
  * contract vs the HOF spelling it replaces — including the null edges:
  * mismatched lengths or a null element yield SQL NULL, exactly what
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` produces, so the expression
  * is substitutable for the HOF form on ANY admitted input). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // NULL also arises from non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true
  private def elemDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    DedupExprs.vecDot(a.asInstanceOf[ArrayData], elemDouble(left),
      b.asInstanceOf[ArrayData], elemDouble(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_boxed = graft.functions.DedupExprs.vecDot(
         |  $a, ${elemDouble(left)}, $b, ${elemDouble(right)});
         |if (${ev.value}_boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_boxed.doubleValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Shared input check + codegen for the vector-LSH expressions. */
abstract class VectorLshExpr extends UnaryExpression {
  protected def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got $other")
    }
}

/** lsh_bucket(vec): sign-LSH bucket id (int). */
case class LshBucket(child: Expression, bits: Int = 8, dim: Int = 64, seed: Long = 42L)
  extends VectorLshExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    DedupExprs.lshBucket(v.asInstanceOf[ArrayData], isDouble, bits, dim, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DedupExprs.lshBucket($c, $isDouble, $bits, $dim, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

/** lsh_probes(vec): own bucket + single-bit-flip probe buckets (array<int>). */
case class LshProbes(child: Expression, bits: Int = 8, dim: Int = 64,
                     seed: Long = 42L, probes: Int = 2)
  extends VectorLshExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    DedupExprs.lshProbes(v.asInstanceOf[ArrayData], isDouble, bits, dim, seed, probes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DedupExprs.lshProbes($c, $isDouble, $bits, $dim, ${seed}L, $probes)")
  override protected def withNewChildInternal(c: Expression): LshProbes = copy(child = c)
  override def prettyName: String = "lsh_probes"
}

object DedupFunctions {
  def lsh_bucket(c: Column, bits: Int = 8, dim: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(c), bits, dim, seed))
  def lsh_probes(c: Column, bits: Int = 8, dim: Int = 64, seed: Long = 42L,
                 probes: Int = 2): Column =
    ColumnBridge.column(LshProbes(ColumnBridge.expression(c), bits, dim, seed, probes))
  def minhash_signature(c: Column, numPerms: Int = 64, shingle: Int = 5,
                        seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), numPerms, shingle, seed))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def winnow_fingerprints(c: Column, k: Int = 8, w: Int = 16): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
  def minhash_band_hash(sig: Column, band: Column, rowsPerBand: Int): Column =
    ColumnBridge.column(MinHashBandHash(ColumnBridge.expression(sig),
      ColumnBridge.expression(band), rowsPerBand))
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: SELECT simhash64(text), minhash_signature(text) ... */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es.head), "scala_udf")
  }
}
