package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis and document-dedup primitives for LLM-training-data
  * pipelines (SURVEY.md §7.2 step 5 / the north-star extension set).
  *
  * Everything is built from Catalyst higher-order functions over arrays —
  * per-row map work with no shuffle, no UDF, no driver participation: the
  * only shuffles in the dedup pipelines are the hash-aggregations and the
  * band-key joins, which is exactly the MinHash-LSH shape that scales
  * (candidate generation by bucket join, NEVER all-pairs).
  *
  * Hashing is 60-bit md5-prefix ([[hash60]]) rather than Spark's murmur3
  * `hash()` so every value is reproducible by any engine with an md5
  * function — the DuckDB oracle computes the identical signatures.
  *
  * Algorithms are the published classics: min-wise independent
  * permutations for resemblance (Broder, "On the resemblance and
  * containment of documents", 1997) with banded LSH (Indyk–Motwani
  * locality-sensitive hashing family), and sign-random-projection
  * fingerprints (Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC 2002) for the SimHash path.
  */
object TextOps {

  /** Modulus for the minhash permutation family: 2^31-1 (Mersenne prime). */
  val HashPrime = 2147483647L

  /** Fixed permutation constants (a*h+b mod p), k=8. Chosen < 2^15 so
    * a*(h mod p) stays well under 2^63.
    */
  val MinHashA: Seq[Long] = Seq(2971L, 5867L, 9391L, 12553L, 16411L, 20431L, 24527L, 28669L)
  val MinHashB: Seq[Long] = Seq(1097L, 3163L, 7207L, 11443L, 15107L, 19301L, 23549L, 27791L)

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic, engine-portable 60-bit hash: first 15 hex chars of md5.
    * Always non-negative, fits a long. Native codegen expression
    * ([[graft.functions.PortableHash60]]) — one digest, no hex-string
    * round-trip; bit-identical to [[hash60Spec]] (pinned in
    * `TextVectorOpsSpec`), so the DuckDB oracles are unchanged.
    */
  def hash60(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.PortableHash60(
        org.apache.spark.sql.GraftSqlBridge.toExpression(c)))

  /** The built-in-functions spec hash60 derives from; kept as the pin
    * anchor for the native expression.
    */
  def hash60Spec(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles — the native one-pass expression
    * ([[graft.functions.WordShinglesExpr]]): every shingle consumer used
    * to drop out of whole-stage codegen because the HOF spec below is
    * CodegenFallback. Bit-identical to [[wordShinglesSpec]], pinned in
    * `TextVectorOpsSpec`.
    */
  def wordShingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.WordShinglesExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(toks), n))

  /** The HOF specification form of [[wordShingles]], kept as the
    * equivalence-test witness. Guarded: Spark's `sequence(1, size-k)`
    * would generate a DESCENDING sequence when size < n, so short docs
    * map to an explicit empty array.
    */
  def wordShinglesSpec(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** n-gram shingle hashes of a text column. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(wordShingles(tokens(text), n), s => hash60(s))

  /** k=8 MinHash signature over an array<long> of shingle hashes:
    * sig[j] = min over shingles of (a_j * (h mod p) + b_j) mod p.
    */
  def minHashSignature(hashes: Column): Column =
    array(MinHashA.zip(MinHashB).map { case (a, b) =>
      array_min(transform(hashes, h => (lit(a) * (h % HashPrime) + lit(b)) % HashPrime))
    }: _*)

  /** Native one-pass signature straight from the `array<string>` shingles
    * (MD5 + all 8 affine mins in a single compiled loop — see
    * [[graft.functions.MinHashSignature]]). Bit-identical to hashing with
    * [[hash60]] then folding with [[minHashSignature]]; pinned by
    * `TextOpsSpec`.
    */
  def minHashSigNative(shingles: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.MinHashSignature(
        org.apache.spark.sql.GraftSqlBridge.toExpression(shingles)))

  /** LSH band keys, r=2 rows per band, b=4 bands over the k=8 signature.
    * Two documents are candidate near-dups iff they share at least one
    * band key — the join key that replaces the quadratic all-pairs scan.
    */
  def bandKeys(sig: Column): Column =
    array((0 until 4).map(bd =>
      concat_ws("_", element_at(sig, 2 * bd + 1), element_at(sig, 2 * bd + 2))): _*)

  /** 60-bit SimHash over an array<long> column of token hashes (named
    * column, SQL-expression form — dynamic shift amounts need the SQL
    * `shiftleft(base, expr)` signature). Bit i is set iff the sum over
    * tokens of ±1 (sign of hash bit i) is >= 0.
    */
  def simHash60(hashesCol: String): Column = expr(
    s"""aggregate(sequence(0, 59), 0L, (acc, i) -> acc + shiftleft(
       |  CASE WHEN aggregate($hashesCol, 0L,
       |                      (a2, h) -> a2 + ((shiftright(h, i) & 1) * 2 - 1)) >= 0
       |       THEN 1L ELSE 0L END, i))""".stripMargin)

  /** Native one-pass 60-bit SimHash straight from the token array —
    * MD5 + all 60 ±1 bit counters in one compiled loop
    * ([[graft.functions.SimHash60Expr]]); bit-identical to both
    * [[simHash60]] (the HOF spec) and [[simHashAgg]] (the explode+agg
    * scale form) for non-empty inputs, pinned in `TextVectorOpsSpec`.
    * Pure map work: no explode fan-out, no shuffle.
    */
  def simHash60Native(toks: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.SimHash60Expr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(toks)))

  /** Bit-parallel `levenshtein(l, r, threshold)` — exact distance when
    * ≤ threshold, −1 otherwise, identical to Spark's 3-arg builtin but
    * via Myers' blocked bit-vector algorithm: O(len·⌈len/64⌉) word ops
    * instead of the banded DP's O(len·thr) cell ops
    * ([[graft.functions.LevenshteinBPExpr]]; equality pinned against the
    * builtin in `TextVectorOpsSpec`).
    */
  def levenshteinBP(l: Column, r: Column, threshold: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.LevenshteinBPExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(l),
        org.apache.spark.sql.GraftSqlBridge.toExpression(r),
        org.apache.spark.sql.GraftSqlBridge.toExpression(threshold)))

  /** 15-bit SimHash blocking keys (4 bands): near-dups (small Hamming
    * distance) agree on at least one band by pigeonhole, so the candidate
    * join runs on band equality, never all-pairs.
    */
  def simHashBands(simhash: Column): Column =
    array((0 until 4).map(b =>
      struct(lit(b).cast("long").as("band"),
        (shiftrightunsigned(simhash, 15 * b) % 32768).as("key"))): _*)

  // ---- aggregate (explode + groupBy) signature forms -------------------
  // The Column forms above evaluate as interpreted higher-order functions
  // — fine per row, but at corpus scale the codegen'd shape is explode the
  // hashes and compute the signature as a HASH AGGREGATE with map-side
  // partial min/sum (measured ~20× faster at sf0.1, and the shuffle
  // carries only (doc_id, hash) pairs). Semantics are identical; a unit
  // test pins the two forms to each other.

  /** Per-doc k=8 MinHash signature columns m0..m7 from an exploded
    * (doc_id, shingle-hash) table.
    */
  def minHashAgg(exploded: org.apache.spark.sql.DataFrame, docCol: String,
                 hashCol: String): org.apache.spark.sql.DataFrame = {
    val aggs = MinHashA.zip(MinHashB).zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * (col(hashCol) % HashPrime) + lit(b)) % HashPrime).as(s"m$j")
    }
    exploded.groupBy(docCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-doc 60-bit SimHash from an exploded (doc_id, token-hash) table:
    * 60 codegen'd ±1 sums, then a projection assembles the bits.
    */
  def simHashAgg(exploded: org.apache.spark.sql.DataFrame, docCol: String,
                 hashCol: String): org.apache.spark.sql.DataFrame = {
    val bitSums = (0 until 60).map { i =>
      sum(shiftright(col(hashCol), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$i")
    }
    val assembled = (0 until 60).map { i =>
      when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    exploded.groupBy(docCol).agg(bitSums.head, bitSums.tail: _*)
      .select(col(docCol), assembled.as("simhash"))
  }

  /** Any (doc_id, text, …) relation → its (doc_id, band, band_key) LSH
    * band table: the one MinHash banding chain (native one-pass k=8
    * signature, r=2/b=4 band keys, posexplode), shared by the batch
    * queries (`LlmQueries.minhashBands`, which adds scratch
    * materialization and a spread repartition) and the streaming at-ingest
    * dedup (`Streams.incrementalDedupStream`, which runs it per
    * micro-batch). Docs with < 3 tokens carry no shingles and are
    * excluded. Pure map work — safe in a streaming plan.
    */
  def minhashBandTable(docs: DataFrame): DataFrame =
    docs
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"),
        minHashSigNative(wordShingles(tokens(col("text")), 3)).as("sig"))
      .select(col("doc_id"), bandKeys(col("sig")).as("bands"))
      .select(col("doc_id"), posexplode(col("bands")))
      .select(col("doc_id"), col("pos").cast("long").as("band"), col("col").as("band_key"))
}
