package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns: dot product and both norms in ONE pass over
  * the arrays, with full whole-stage codegen.
  *
  * Replaces the 3-pass higher-order-function formulation
  * (`aggregate(zip_with(a,b,*)) / (sqrt(aggregate(..)) * sqrt(..))`) in
  * the similarity hot path — same ascending-index summation order, so
  * results are bit-identical (the DuckDB oracles keep matching), at a
  * third of the array traffic and no lambda-function call overhead.
  *
  * Null semantics: null array → null; null element → null; length
  * mismatch → null (the HOF's zip_with null-padding); zero-norm input
  * → null (the HOF's divide-by-zero null).
  */
case class FusedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fused_cosine expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "fused_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // HOF zip_with null-pad semantics
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val anyNull = ctx.freshName("anyNull")
      val denom = ctx.freshName("denom")
      s"""
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |boolean $anyNull = $a.numElements() != $b.numElements();
        |int $n = $anyNull ? 0 : $a.numElements();
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
        |  double $xv = $a.getDouble($i);
        |  double $yv = $b.getDouble($i);
        |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        |}
        |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |if ($anyNull || $denom == 0.0) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $dot / $denom;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FusedCosine =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column-API entry — no registration needed. */
  def fusedCosine(a: Column, b: Column): Column =
    GraftSqlShim.column(
      FusedCosine(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  private[graft] def fusedCosineBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"fused_cosine expects 2 arguments, got ${exprs.length}")
    FusedCosine(exprs(0), exprs(1))
  }

  /** Lower-64-bits-of-md5 as a native codegen'd LONG (bit-identical to
    * DuckDB `md5_number_lower`); see [[Md5LowerLong]] for why this
    * beats both a Scala UDF and built-in `md5` + hex parsing. */
  def md5Lower64(c: Column): Column =
    GraftSqlShim.column(Md5LowerLong(GraftSqlShim.expression(c)))

  /** The 53-bit sample-key family: `md5Lower64(c) >>> 11`. */
  def md5Lower53(c: Column): Column =
    org.apache.spark.sql.functions.shiftrightunsigned(md5Lower64(c), 11)

  /** `length(bin(c))` for c > 0, without the string render. */
  def bitLength64(c: Column): Column =
    GraftSqlShim.column(LongBitLength(GraftSqlShim.expression(c)))

  /** text → LSH band values (native twin of the dedup family's
    * doc-grain band UDFs; see [[ShingleBands]]). */
  def minHashBandVals(c: Column, shingleN: Int, bands: Int, rows: Int,
                      seed: Long, charGrain: Boolean): Column =
    GraftSqlShim.column(MinHashBandVals(
      GraftSqlShim.expression(c), shingleN, bands, rows, seed, charGrain))

  /** text → 4 SimHash pigeonhole blocks, native. */
  def simHashBlocks(c: Column): Column =
    GraftSqlShim.column(SimHashBlocksExpr(GraftSqlShim.expression(c)))

  /** text → distinct word-shingle base hashes, native. */
  def shingleHashes(c: Column, shingleN: Int): Column =
    GraftSqlShim.column(ShingleHashesExpr(GraftSqlShim.expression(c), shingleN))

  /** text → distinct word n-gram strings, native. */
  def wordGramsDistinct(c: Column, n: Int): Column =
    GraftSqlShim.column(WordGramsDistinctExpr(GraftSqlShim.expression(c), n))

  /** shingle base-hash array → LSH band values (signature stage only —
    * for pipelines sharing one shingle projection). */
  def bandValsFromHashes(c: Column, bands: Int, rows: Int, seed: Long): Column =
    GraftSqlShim.column(BandValsFromHashes(GraftSqlShim.expression(c), bands, rows, seed))

  private[graft] def md5LowerLongBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"md5_lower64 expects 1 argument, got ${exprs.length}")
    Md5LowerLong(exprs(0))
  }

  /** Register `fused_cosine` in an existing session (SQL/`expr` use). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fused_cosine", fusedCosineBuilder, "built-in")
}

// Cluster-wide SQL registration lives in `graft.GraftExtensions`
// (spark.sql.extensions), alongside the custom planner strategies.
