package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: exception-free execution for the hot `try_*` forms.
  *
  * Spark 4 plans `try_cast` / `try_divide` as the ANSI operation with
  * `EvalMode.TRY`, whose generated code wraps the ANSI kernel in
  * try/catch. The catch arm is only "free" when no row fails: every
  * failing row pays a thrown `SparkArithmeticException`/
  * `NumberFormatException` WITH message formatting and query-context
  * capture — ~10 µs/row. At ingest edges the failure set is routinely
  * the majority of rows (that is why the caller reached for `try_*`),
  * so the shield costs ~7× the projection (measured on the bench's
  * events table: try_cast over a 100%-miss substring slice 1.14 s vs
  * 0.14 s guarded, sf0.1, local[32]). This rule rewrites the TRY forms
  * whose null-on-failure semantics Spark's LEGACY eval mode already
  * implements *without throwing*, so the same plans run exception-free
  * at any failure rate. Guide §4.1/§1.2: same algorithm, cheaper
  * per-task work.
  *
  * Equivalences used (each pinned by `TryRewriteSpec` against the
  * un-rewritten TRY kernel over a 60k-string adversarial corpus, and by
  * the clean_try_ops oracle query):
  *
  *  - string → byte/short/int/long: LEGACY accepts everything ANSI
  *    accepts PLUS forms with a decimal point ("1.5" → 1, "5." → 5);
  *    ANSI (hence TRY) rejects any '.' — so
  *    `try_cast(s AS int)` ≡ `IF(contains(s,'.'), NULL, legacy_cast(s))`.
  *  - string → double/float/boolean/decimal: accept-sets identical;
  *    LEGACY returns null exactly where TRY does (fuzzed, zero diffs) —
  *    plain LEGACY cast.
  *  - Divide (double or decimal — Divide exists only for fractional):
  *    LEGACY nulls on divide-by-zero and decimal overflow, the exact
  *    TRY outcomes; nonzero divisors share the IEEE/decimal kernel.
  *  - Remainder: same zero-divisor-to-null equivalence.
  *  - Add/Subtract/Multiply on double/float/decimal: doubles never
  *    throw; decimal overflow nulls in LEGACY exactly where TRY nulls.
  *    (Integral add/sub/mul are NOT rewritten: LEGACY wraps on overflow
  *    where TRY nulls.)
  *
  * Non-default collations fall through untouched (the contains() guard
  * is byte-semantics); so do all other TRY casts (e.g. double → int,
  * where LEGACY truncates but TRY nulls) and interval arithmetic.
  * Matches only TRY-mode nodes, so outputs never re-match — idempotent
  * under fixed-point execution.
  */
object TryExprRewrite extends Rule[LogicalPlan] {

  private def isDefaultString(e: Expression): Boolean = e.dataType match {
    case s: StringType => s == StringType // default collation only
    case _ => false
  }

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Types where the string-cast accept-set is identical in LEGACY and
    * ANSI/TRY (fuzz-pinned in TryRewriteSpec).
    */
  private def legacyEqualsTry(t: DataType): Boolean = t match {
    case DoubleType | FloatType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** LEGACY null-on-failure matches TRY for these result types: doubles
    * and floats cannot throw at all; decimals null on overflow in both
    * modes. Integral results are excluded (LEGACY wraps, TRY nulls).
    */
  private def arithLegacySafe(t: DataType): Boolean = t match {
    case DoubleType | FloatType => true
    case _: DecimalType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Cast(child, t, tz, EvalMode.TRY)
          if isDefaultString(child) && isIntegral(t) =>
        If(Contains(child, Literal(".")),
          Literal(null, t),
          Cast(child, t, tz, EvalMode.LEGACY))
      case Cast(child, t, tz, EvalMode.TRY)
          if isDefaultString(child) && legacyEqualsTry(t) =>
        Cast(child, t, tz, EvalMode.LEGACY)
      case d @ Divide(l, r, EvalMode.TRY) if arithLegacySafe(d.dataType) =>
        Divide(l, r, EvalMode.LEGACY)
      case TryEval(d @ Divide(l, r, EvalMode.ANSI)) if arithLegacySafe(d.dataType) =>
        Divide(l, r, EvalMode.LEGACY)
      case d @ Remainder(l, r, EvalMode.TRY) if arithLegacySafe(d.dataType) =>
        Remainder(l, r, EvalMode.LEGACY)
      case d @ Add(l, r, EvalMode.TRY) if arithLegacySafe(d.dataType) =>
        Add(l, r, EvalMode.LEGACY)
      case d @ Subtract(l, r, EvalMode.TRY) if arithLegacySafe(d.dataType) =>
        Subtract(l, r, EvalMode.LEGACY)
      case d @ Multiply(l, r, EvalMode.TRY) if arithLegacySafe(d.dataType) =>
        Multiply(l, r, EvalMode.LEGACY)
    }
}
