package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repo's canonical string hash:
  * the lower 64 bits of md5 (little-endian digest bytes 8..15 —
  * bit-identical to DuckDB's `md5_number_lower` and to
  * [[graft.dedup.Hashing.md5Lower64]]), as a LONG, inside whole-stage
  * codegen.
  *
  * Why native instead of the built-in `md5(...)` + hex-parse: Spark's
  * `Md5` expression calls commons-codec `DigestUtils.md5Hex`, which
  * instantiates a fresh `MessageDigest` PER CALL and renders a 32-char
  * hex string that then has to be re-parsed — measured 3–4× slower
  * than a ThreadLocal-digest Scala UDF on the per-token HLL path
  * (PERF_NOTES r10, hll_registers vs hll_reg_udf). This expression
  * keeps the ThreadLocal digest AND removes the UDF's own costs: no
  * UTF8String→String decode (md5 runs over the UTF-8 bytes the row
  * already holds), no boxing, no codegen fence. Derived families
  * (`>>> 11` 53-bit sample keys, `& Long.MaxValue` 63-bit KMV keys,
  * `& (2^b-1)` CMS buckets) compose with built-in bit ops on top.
  */
case class Md5LowerLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_lower64 expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_lower64"

  override def nullSafeEval(input: Any): Any =
    Md5LowerLong.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5LowerLong.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5LowerLong =
    copy(child = newChild)
}

object Md5LowerLong {

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of md5 over the UTF8String's UTF-8 bytes; called
    * from generated code — keep the signature stable. */
  def hash(s: UTF8String): Long = {
    val d = digestLocal.get()
    d.reset()
    val out = d.digest(s.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (out(i) & 0xffL); i -= 1 }
    h
  }
}

/** Bit length of a non-negative LONG — `64 - numberOfLeadingZeros(v)`,
  * which for v > 0 equals `length(bin(v))` WITHOUT rendering the
  * binary string (the HLL rank path paid a ≤45-char allocation per
  * token for what is one machine instruction; bin(0) is "0" so the
  * zero case differs — callers branch on v = 0 anyway, exactly as the
  * oracle SQL's CASE does). */
case class LongBitLength(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bit_length64 expects bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "bit_length64"

  override def nullSafeEval(input: Any): Any =
    64 - java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(64 - java.lang.Long.numberOfLeadingZeros($c))")

  override protected def withNewChildInternal(newChild: Expression): LongBitLength =
    copy(child = newChild)
}
