package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The native cosine expression must agree bit-for-bit with the HOF
  * formulation it replaced (same summation order) and with a driver-side
  * loop — through BOTH the codegen and interpreted paths. */
class FusedCosineSpec extends AnyFunSuite {

  private def hofCosine(a: String, b: String) =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
             / (sqrt(aggregate($a, 0D, (acc, v) -> acc + v * v))
                * sqrt(aggregate($b, 0D, (acc, v) -> acc + v * v)))""")

  test("matches the HOF expression bit-for-bit on random vectors") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rng = new Random(13)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rng.nextGaussian()), Seq.fill(64)(rng.nextGaussian())))
    val df = rows.toDF("a", "b")
      .withColumn("fused", GraftFunctions.fusedCosine(col("a"), col("b")))
      .withColumn("hof", hofCosine("a", "b"))
    val bad = df.filter(col("fused") =!= col("hof")).count()
    assert(bad === 0)
    // and against a driver-side loop
    df.select("a", "b", "fused").collect().foreach { r =>
      val a = r.getSeq[Double](0).toArray
      val b = r.getSeq[Double](1).toArray
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      assert(r.getDouble(2) === dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  test("null and zero-norm semantics") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 0.0)),  // zero norm → null
      (Seq(1.0, 2.0), Seq(1.0, 2.0)))  // identical → 1.0
      .toDF("a", "b")
      .withColumn("c", GraftFunctions.fusedCosine(col("a"), col("b")))
    val out = df.select("c").collect()
    assert(out(0).isNullAt(0))
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-15)
  }

  test("two instances in one projection compile (freshName'd codegen locals)") {
    val spark = SparkSpec.spark
    // non-nullable children skip nullSafeExec's braces, so fixed local
    // names would collide in the shared codegen scope (r2 review fix)
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT fused_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
        |       fused_cosine(array(0.0D, 1.0D), array(0.0D, 1.0D)) AS c2""".stripMargin).head()
    assert(row.getDouble(0) === 1.0 && row.getDouble(1) === 1.0)
  }

  test("length mismatch yields null (HOF zip_with null-pad semantics)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b")
      .select(GraftFunctions.fusedCosine(col("a"), col("b")).as("c"),
        hofCosine("a", "b").as("h"))
    val out = df.head()
    assert(out.isNullAt(0), "fused must be null on length mismatch")
    assert(out.isNullAt(1), "HOF reference is null on length mismatch")
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rng = new Random(17)
    val a = Array.fill(32)(rng.nextGaussian())
    val b = Array.fill(32)(rng.nextGaussian())
    val e = FusedCosine(
      Literal.create(ArrayData.toArrayData(a), ArrayType(DoubleType)),
      Literal.create(ArrayData.toArrayData(b), ArrayType(DoubleType)))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    assert(e.eval(null) === dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("SQL registration via function registry and via GraftExtensions") {
    val spark = SparkSpec.spark
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT fused_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    // extensions entry point constructs without error and injects the same builder
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
  }
}
