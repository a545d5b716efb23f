package graft.plans

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded-edit-distance predicates get a cheap length
  * prefilter and a banded DP.
  *
  * `levenshtein(a, b) <= k` forces the full O(|a|·|b|) dynamic program per
  * row even when the strings obviously can't match. Two public facts make
  * it rewritable:
  *
  *   1. edit distance ≥ |length(a) − length(b)|, so a length-difference
  *      check filters most pairs with two already-computed ints;
  *   2. a thresholded kernel can stop early — and Myers' bit-vector
  *      algorithm ([[graft.functions.LevenshteinBPExpr]], exact, pinned
  *      equal to Spark's builtin) computes the distance in
  *      O(|b|·⌈|a|/64⌉) word operations instead of O(|a|·|b|) cells
  *      (r14; the r13 target was Spark's banded 3-arg `Levenshtein`,
  *      O(k·min) cells — the bit-parallel kernel beats both, ~12× fewer
  *      operations at corpus document lengths, and keeps the same
  *      distance-≤-k-else-−1 contract).
  *
  * So `lev(a,b) <= k` becomes
  * `abs(length(a)-length(b)) <= k AND lev_bp(a,b,k) >= 0` — identical on
  * all inputs (including nulls: a null string nulls both forms; a false
  * guard implies distance > k) with zero kernel work on
  * length-incompatible pairs. In the near-dup verify stage this is the
  * hot predicate: it runs once per LSH candidate pair.
  *
  * The rewrite matches ONLY the builtin 2-arg form, so its own output
  * never re-matches — idempotent under fixed-point execution.
  */
object LevenshteinThresholdRewrite extends Rule[LogicalPlan] {

  private def rewrite(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k)
    val lengthGuard =
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit)
    val banded = GreaterThanOrEqual(
      graft.functions.LevenshteinBPExpr(a, b, kLit), Literal(0))
    And(lengthGuard, banded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => rewrite(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => rewrite(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => rewrite(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => rewrite(a, b, k - 1)
    }
}

/** SQL-surface registration for the native vector expressions, so
  * `spark.sql("SELECT cosine_sim(a.v, b.v) ...")` reaches the same
  * codegen'd Catalyst expressions as the Column API
  * ([[graft.ops.VectorOps]]).
  *
  * Two deployment paths, same registry entries:
  *   - cluster config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (constructor injection, survives session cloning);
  *   - runtime: [[GraftFunctions.register]] on an already-built session —
  *     idempotent, used by the SQL-surface queries so they work under any
  *     driver-owned session.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    // the full 11-arg constructor is the non-deprecated one that still
    // carries a usage string for DESCRIBE FUNCTION
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - sequential-fold cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential-fold dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles) - one-pass k=8 MinHash signature over an array<string>"),
      (args: Seq[Expression]) => graft.functions.MinHashSignature(args(0))),
    (FunctionIdentifier("portable_hash60"),
      info("portable_hash60", "portable_hash60(s) - engine-portable 60-bit md5-prefix hash of a string"),
      (args: Seq[Expression]) => graft.functions.PortableHash60(args(0))),
    (FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(tokens) - one-pass 60-bit SimHash over an array<string>"),
      (args: Seq[Expression]) => graft.functions.SimHash60Expr(args(0))),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(tokens, n) - word n-gram shingles of an array<string>; n must be a literal"),
      (args: Seq[Expression]) => graft.functions.WordShinglesExpr(args(0),
        literalInt("word_shingles", "n", args(1)))),
    (FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(key, k) - heavy-hitter summary with at most k counters; " +
          "array<struct<key,est>> with est <= exact <= est + n/(k+1); k must be a literal"),
      // an AggregateFunction IS an Expression: the analyzer wraps it in
      // an AggregateExpression when it lands in an aggregation context
      (args: Seq[Expression]) => graft.functions.MisraGries(args(0),
        literalInt("misra_gries", "k", args(1)))),
    (FunctionIdentifier("levenshtein_bp"),
      info("levenshtein_bp",
        "levenshtein_bp(l, r, k) - bit-parallel thresholded edit distance: " +
          "the exact Levenshtein distance when <= k, -1 otherwise"),
      (args: Seq[Expression]) => graft.functions.LevenshteinBPExpr(
        args(0), args(1), args(2))),
    (FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch",
        "kmv_sketch(hash, k) - k-minimum-values distinct sketch over a BIGINT " +
          "hash column; deterministic ascending array of the k smallest distinct " +
          "values; k must be a literal"),
      (args: Seq[Expression]) => graft.functions.KmvSketch(args(0),
        literalInt("kmv_sketch", "k", args(1)))),
  )

  /** Analysis-time literal check: a non-foldable width/size argument gets
    * a clear error instead of a null-eval internal crash.
    */
  private def literalInt(fn: String, arg: String, e: Expression): Int = {
    require(e.foldable, s"$fn(..., $arg): $arg must be a literal integer, got ${e.sql}")
    e.eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$fn(..., $arg): $arg must be a literal integer, got $other")
    }
  }

  /** Idempotent per-session registration (overwrites any prior entry). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** TABLE-VALUED functions over the lake — Delta's `table_changes` as a
  * SQL TVF:
  * {{{
  *   SELECT * FROM table_changes('/lake/t', 1)        -- (1, head]
  *   SELECT * FROM table_changes('/lake/t', 1, 5)     -- (1, 5]
  *   SELECT * FROM table_changes('/lake/t', 1, 5, 'k') -- + update pairing
  * }}}
  * Version bounds follow the reader's (startingVersion, endingVersion]
  * contract; the builder hands the analyzer the change frame's resolved
  * plan, so the TVF composes with any SQL on top (joins, aggregates,
  * filters).
  */
object GraftTableFunctions {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def strLit(fn: String, e: Expression): String = {
    require(e.foldable, s"$fn: argument must be a literal string, got ${e.sql}")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument must be a literal string, got $other")
    }
  }

  private def longLit(fn: String, e: Expression): Long = {
    require(e.foldable, s"$fn: argument must be a literal integer, got ${e.sql}")
    e.eval(null) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument must be a literal integer, got $other")
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("table_changes"),
      info("table_changes",
        "table_changes(path, startingVersion[, endingVersion[, cdcKey]]) - " +
          "change rows of a txlog table for (startingVersion, endingVersion]"),
      (args: Seq[Expression]) => {
        require(args.size >= 2 && args.size <= 4,
          s"table_changes takes 2-4 arguments, got ${args.size}")
        val spark = SparkSession.active
        val raw = strLit("table_changes", args.head)
        // Delta's spelling passes the TABLE NAME; path spellings keep
        // working — a name that resolves in the session catalog to a
        // txlog table reads through its location
        val table = graft.sources.TxLogBatchSource.localPath(
          if (raw.contains("/")) raw
          else {
            val ident = spark.sessionState.sqlParser.parseTableIdentifier(raw)
            if (spark.sessionState.catalog.tableExists(ident)) {
              val meta = spark.sessionState.catalog.getTableMetadata(ident)
              require(meta.provider.exists(_.equalsIgnoreCase("txlog")),
                s"table_changes('$raw'): not a txlog table")
              meta.location.toString
            } else raw
          })
        val fromV = longLit("table_changes", args(1))
        val toV =
          if (args.size >= 3) longLit("table_changes", args(2))
          else graft.ops.TxLog.currentVersion(table)
        val key = if (args.size >= 4) Some(strLit("table_changes", args(3))) else None
        graft.sources.TxLogCdf.changeFrame(spark, table, fromV, toV, key)
          .queryExecution.analyzed
      }))
}

/** `spark.sql.extensions` entry point: optimizer rule + native functions
  * + the as-of join planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => LevenshteinThresholdRewrite)
    e.injectOptimizerRule(_ => TryExprRewrite)
    e.injectOptimizerRule(_ => ManifestCountRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // lake SQL dialect: DESCRIBE HISTORY / OPTIMIZE / VACUUM / RESTORE
    // statements + MERGE INTO routing + the table_changes TVF
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    e.injectResolutionRule(session => MergeIntoTxLogRule(session))
    // row-level SQL DML (DELETE FROM / UPDATE) over txlog relations,
    // routed through the deletion-vector primitives
    e.injectResolutionRule(session => DmlTxLogRule(session))
    // SELECT ... VERSION AS OF / TIMESTAMP AS OF over txlog catalog
    // tables. Hint-resolution batch, NOT the main resolution batch:
    // Spark's own ResolveRelations runs before extension resolution
    // rules within each fixed-point iteration and throws
    // UNSUPPORTED_FEATURE.TIME_TRAVEL for V1 relations — the node must
    // be rewritten before that batch ever sees it.
    e.injectHintResolutionRule(session => TimeTravelTxLogRule(session))
    GraftFunctions.all.foreach(e.injectFunction)
    GraftTableFunctions.all.foreach(e.injectTableFunction)
  }
}
