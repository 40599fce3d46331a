package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native Catalyst expression for the vector hot path (SURVEY.md §2.10).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * interpreted per element — a lambda-variable bind and an allocated
  * intermediate array per row. For a k-NN join that's
  * pairs × dims × 3 interpreted steps and dominates the bench. This
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen (`doGenCode`), with a matching fast interpreted `nullSafeEval`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotp"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotp requires array<double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // silent truncation to the shorter array would mask a corrupt
    // embedding with a plausible-but-wrong score — fail loudly instead
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"dotp: mismatched vector lengths $n vs ${y.numElements()}")
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      // a null element read via getDouble would silently contribute 0 —
      // the same silent-corruption class the length check guards against
      if (x.isNullAt(i) || y.isNullAt(i)) {
        throw new IllegalArgumentException(s"dotp: null element at index $i")
      }
      s += x.getDouble(i) * y.getDouble(i); i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dotp: mismatched vector lengths " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException("dotp: null element at index " + $i);
         |  }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED string arrays via linear merge — no
  * per-row allocation, unlike `array_intersect` (new array + hash set per
  * row), which dominated the set-similarity verify stage. Inputs MUST be
  * sorted ascending (`array_sort`); duplicates are counted once per
  * distinct value (inputs here are distinct token sets).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _                                                   => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires array<string>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) {
        throw new IllegalArgumentException(
          "sorted_intersect_size: null array element")
      }
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException("sorted_intersect_size: null array element");
         |  }
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED long arrays via linear merge — the
  * integer-domain sibling of [[SortedIntersectSize]] for token sets that
  * have been dictionary-encoded (term → unique id). Long compares beat
  * UTF8String compares ~5× in the set-similarity verify stage.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_long_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_long_intersect_size requires array<bigint>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) {
        throw new IllegalArgumentException(
          "sorted_long_intersect_size: null array element")
      }
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException("sorted_long_intersect_size: null array element");
         |  }
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a token array in one eval: for each token t and bit
  * j, bit j of xxhash64(t, seed=42) votes +1/-1; signature bit j is set
  * when the vote sum is positive. Bit-identical to the SQL form
  * `aggregate(sequence(0,63), ...)` but evaluated as one tight JVM loop
  * instead of 64 × |tokens| interpreted lambda steps. CodegenFallback:
  * one virtual call per row, loop cost dominates either way.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    var k = 0
    val n = arr.numElements()
    while (k < n) {
      if (arr.isNullAt(k)) {
        throw new IllegalArgumentException("simhash64: null array element")
      }
      val s = arr.getUTF8String(k)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
        j += 1
      }
      k += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (cnt(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 16 MinHash values of a pre-hashed element array in one pass: for each
  * element hash h and signature slot i, candidate = xxh64(h, seed=i);
  * slot i keeps the minimum. Replaces 16 interpreted `transform` passes
  * (16 × |elements| lambda steps) with one tight JVM loop.
  */
case class MinHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash16 requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(16)(Long.MaxValue)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (arr.isNullAt(k)) {
        throw new IllegalArgumentException("minhash16: null array element")
      }
      val h = arr.getLong(k)
      var i = 0
      while (i < 16) {
        val v = XXH64.hashLong(h, i.toLong)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      k += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

/** 64 MinHash values of a pre-hashed element array in one pass — the
  * wide sibling of [[MinHash16]] for the token-set near-dup path, where
  * 16 bands × 4 rows need 64 signature slots. At the 0.9 Jaccard
  * threshold, 4×4 banding recalls ~98.6% of threshold pairs (measured
  * 99.0-99.7% on the gate fixtures); 16×4 banding over this signature
  * recalls 1−(1−0.9⁴)¹⁶ ≈ 1−4·10⁻⁸ — effectively total, which is what
  * lets the near-dup pair list be oracle-checked against the exact
  * all-pairs form.
  */
case class MinHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(64)(Long.MaxValue)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (arr.isNullAt(k)) {
        throw new IllegalArgumentException("minhash64: null array element")
      }
      val h = arr.getLong(k)
      var i = 0
      while (i < 64) {
        val v = XXH64.hashLong(h, i.toLong)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      k += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

/** Sorted distinct xxhash64 values of a string's 5-character shingles in
  * ONE pass — bit-identical to the SQL form
  * `array_sort(array_distinct(transform(sequence(1, greatest(length(text)-4, 1)),
  *    i -> xxhash64(substring(text, i, 5)))))`
  * (A/B checked in PropertySpec) but without |text| interpreted lambda
  * steps, |text| UTF8String substring allocations, and two array
  * rewrites per row. Character positions are code points, matching SQL
  * `substring`; each shingle hashes its UTF8 bytes with Spark's
  * xxhash64 seed (42), so values equal the SQL form's exactly.
  * CodegenFallback: one virtual call per row, loop cost dominates.
  */
case class Shingles64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingles64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles64 requires string, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    // code-point start offsets (byte positions), so multi-byte text
    // shingles the same way SQL substring does
    val nc = s.numChars()
    val charOff = new Array[Int](nc + 1)
    var ci = 0
    var b = 0
    while (b < nb) {
      charOff(ci) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      ci += 1
    }
    charOff(nc) = nb
    // greatest(length-4, 1): short/empty text yields ONE shingle — the
    // whole (possibly empty) string, exactly like substring(text, 1, 5)
    val nSh = math.max(nc - 4, 1)
    val hs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      val s0 = charOff(i)
      val s1 = charOff(math.min(i + 5, nc))
      hs(i) = XXH64.hashUnsafeBytes(base, off + s0, s1 - s0, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run
    var w = 0
    i = 0
    while (i < nSh) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    ArrayData.toArrayData(if (w == nSh) hs else java.util.Arrays.copyOf(hs, w))
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles64 =
    copy(child = newChild)
}

/** Morton (Z-order) code of two keys: the low 32 bits of each input
  * interleave into one 64-bit sort key (`left`'s bits in the odd
  * positions). Sorting a table by this key clusters rows so that ANY
  * contiguous Z range covers a bounded rectangle in (left, right) space
  * — the multi-dimensional lake-clustering primitive: after a Z-sorted
  * write, parquet row-group [min,max] stats are tight for BOTH columns
  * and pushed range predicates on EITHER column skip row groups, where
  * a single-column sort serves only its own column (BucketingSpec
  * proves the skipping on both columns). Bit-spread is the standard
  * 5-step mask cascade — O(1), no loop, codegen-friendly. Inputs are
  * treated as unsigned 32-bit (callers with wider keys rank/bucket
  * first); with both keys < 2^31 the result is non-negative, so signed
  * comparisons in any engine order it identically.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits requires bigint inputs, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    (InterleaveBits.spread(a.asInstanceOf[Long]) << 1) |
      InterleaveBits.spread(b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = InterleaveBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = ($cls.spread($a) << 1) | $cls.spread($b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** 32 → 64 bit spread: bit i of (v & 0xFFFFFFFF) moves to bit 2i. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }
}

/** Asymmetric-distance (ADC) lookup for product-quantized vectors:
  * `code` packs 16 subspace code ids (4 bits each, subspace m in bits
  * [4m, 4m+4)); `table` holds the query's 256 precomputed per-(subspace,
  * code) inner products laid out as table[16·m + c]. The result is
  *
  *   Σ_{m=0}^{15}  table[16·m + ((code >>> 4m) & 15)]
  *
  * ≈ ⟨q, x⟩ — sixteen array reads and adds per row against an 8-byte
  * column, the whole point of PQ: the scan never touches the original
  * 512-byte vector. Summation order is fixed (m ascending) over
  * 6dp-rounded table entries, so scores are byte-deterministic across
  * partitionings. The table length is validated loudly: a silently
  * truncated table would score every row with garbage.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (bigint, array<double>), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Long]
    val t = b.asInstanceOf[ArrayData]
    if (t.numElements() != 256) {
      throw new IllegalArgumentException(
        s"pq_adc: ADC table must have 256 entries, got ${t.numElements()}")
    }
    var s = 0.0
    var m = 0
    while (m < 16) {
      val idx = (m << 4) | ((code >>> (m << 2)) & 15L).toInt
      if (t.isNullAt(idx)) {
        throw new IllegalArgumentException(s"pq_adc: null table entry at $idx")
      }
      s += t.getDouble(idx); m += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      s"""
         |if ($b.numElements() != 256) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: ADC table must have 256 entries, got " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $m = 0; $m < 16; $m++) {
         |  int $idx = ($m << 4) | (int) (($a >>> ($m << 2)) & 15L);
         |  if ($b.isNullAt($idx)) {
         |    throw new IllegalArgumentException("pq_adc: null table entry at " + $idx);
         |  }
         |  $s += $b.getDouble($idx);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Single source of truth for the engine's native functions — consumed
    * by both the per-session `register` path and the cluster-wide
    * `GraftExtensions` injector so the two can never drift.
    */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[DotProduct].getName, "dotp"),
      (c: Seq[Expression]) => DotProduct(c(0), c(1))),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (c: Seq[Expression]) => SortedIntersectSize(c(0), c(1))),
    (FunctionIdentifier("sorted_long_intersect_size"),
      new ExpressionInfo(classOf[SortedLongIntersectSize].getName, "sorted_long_intersect_size"),
      (c: Seq[Expression]) => SortedLongIntersectSize(c(0), c(1))),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (c: Seq[Expression]) => SimHash64(c.head)),
    (FunctionIdentifier("minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "minhash16"),
      (c: Seq[Expression]) => MinHash16(c.head)),
    (FunctionIdentifier("shingles64"),
      new ExpressionInfo(classOf[Shingles64].getName, "shingles64"),
      (c: Seq[Expression]) => Shingles64(c.head)),
    (FunctionIdentifier("minhash64"),
      new ExpressionInfo(classOf[MinHash64].getName, "minhash64"),
      (c: Seq[Expression]) => MinHash64(c.head)),
    (FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (c: Seq[Expression]) => InterleaveBits(c(0), c(1))),
    (FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (c: Seq[Expression]) => PqAdc(c(0), c(1))))

  /** Idempotently register every native function with a session so query
    * code can use them via `expr`/`call_function`.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registrations.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
