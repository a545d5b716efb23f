package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** TryExprRewrite: the exception-free rewrites must be observably
  * IDENTICAL to Spark's TRY-mode kernels — pinned by running every case
  * twice, once with the rule excluded (true TRY semantics) and once with
  * it active, over an adversarial string corpus and the arithmetic edge
  * cases (zero divisors, decimal overflow, IEEE specials).
  */
class TryRewriteSpec extends SparkSpec {

  private val ruleName = "graft.plans.TryExprRewrite"

  /** Evaluate `exprs` over df with and without the rewrite; assert the
    * two result sets match row-for-row (null-safe).
    */
  private def pinEqual(df: DataFrame, exprs: Seq[String]): Unit = {
    val sel = "s" +: exprs
    def run(): Array[String] =
      df.selectExpr(sel: _*).collect().map(_.mkString(""))
    spark.conf.set("spark.sql.optimizer.excludedRules", ruleName)
    val expected = try run() finally
      spark.conf.unset("spark.sql.optimizer.excludedRules")
    val actual = run()
    assert(expected.length == actual.length)
    expected.zip(actual).foreach { case (e, a) =>
      assert(e == a, s"TRY vs rewrite diverged: [$e] vs [$a]")
    }
  }

  private lazy val strings: DataFrame = {
    val manual = Seq("1.5", " 12 ", "12", "+5", "-0", "2147483648",
      "-2147483649", "9223372036854775808", "12abc", "", "   ", "+", "-",
      "0x1F", "1e2", "1E2", "01", "0007", ".5", "5.", "+ 5", "42 ",
      "999999999999999999999999", "null", " +12 ", "--1", "true", " FALSE ",
      "NaN", "Infinity", "-Infinity", "99999999999.5", "1,5", "12e", "e12",
      "5d", "5f", " 1 2 ", "127", "128", "-128", "-129", "32767", "32768",
      "1.7976931348623157E309", "0.1", "-.5", "+.5", "..", "3..2", null)
    val rng = new scala.util.Random(7)
    val fuzz = (1 to 20000).map { _ =>
      val len = rng.nextInt(8)
      (1 to len).map { _ =>
        val c = rng.nextInt(34)
        if (c < 14) ('0' + rng.nextInt(10)).toChar
        else if (c < 16) '.'
        else if (c < 18) { if (rng.nextBoolean()) '+' else '-' }
        else if (c < 20) ' '
        else if (c < 22) { if (rng.nextBoolean()) 'e' else 'E' }
        else (32 + rng.nextInt(200)).toChar
      }.mkString
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    spark.createDataFrame(
      spark.sparkContext.parallelize((manual ++ fuzz).distinct.map(Row(_)), 4),
      StructType(Seq(StructField("s", StringType, nullable = true))))
  }

  test("try_cast string -> integral/fractional/boolean/decimal is unchanged by the rewrite") {
    pinEqual(strings, Seq(
      "try_cast(s AS TINYINT) AS b", "try_cast(s AS SMALLINT) AS sh",
      "try_cast(s AS INT) AS i", "try_cast(s AS BIGINT) AS l",
      "try_cast(s AS DOUBLE) AS d", "try_cast(s AS FLOAT) AS f",
      "try_cast(s AS BOOLEAN) AS bo", "try_cast(s AS DECIMAL(10,2)) AS de"))
  }

  test("try_divide / try_remainder / try_add / try_subtract / try_multiply are unchanged") {
    val df = spark.range(0, 2000).selectExpr("CAST(id AS STRING) AS s",
      "CAST(id AS DOUBLE) AS x", "CAST(id % 5 AS DOUBLE) AS z",
      "CAST(id AS DECIMAL(38,0)) AS dec38",
      "CAST(power(10, 37) AS DECIMAL(38,0)) AS big")
    pinEqual(df, Seq(
      "try_divide(x, z) AS dv",                    // 20% zero divisors
      "try_divide(x, x - x) AS dz",                // all-zero divisors
      "try_divide(CAST(1 AS DECIMAL(38,0)), dec38 - dec38) AS ddz",
      "try_mod(x, z) AS md",
      "try_add(big, big) AS ao",                   // decimal overflow -> null
      "try_subtract(-big, big) AS so",
      "try_multiply(big, CAST(100 AS DECIMAL(38,0))) AS mo",
      "try_add(x, x) AS af", "try_multiply(x, z) AS mf",
      "try_divide(CAST('NaN' AS DOUBLE), z) AS nan",
      "try_divide(CAST('Infinity' AS DOUBLE), x) AS inf"))
  }

  test("the rewrite actually fires: no TRY-mode cast survives in the optimized plan") {
    val plan = strings.selectExpr("try_cast(s AS INT) AS a", "try_divide(1.0, s) AS b")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("try_cast") && !plan.contains("try_divide"),
      s"TRY nodes survived the rewrite:\n$plan")
  }

  test("non-rewritable TRY forms are left alone (double -> int nulls on overflow)") {
    val df = spark.range(1).selectExpr("CAST(1e18 AS DOUBLE) AS big",
      "CAST('NaN' AS DOUBLE) AS nan")
    val r = df.selectExpr("try_cast(big AS INT) AS o", "try_cast(nan AS INT) AS n").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
