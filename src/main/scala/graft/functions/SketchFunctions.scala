package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._

/** Native 32-bit simhash over an array of (32-bit-valued) token hashes.
  *
  * Semantics (the standard simhash vote): for each bit b in 0..31, sum
  * +1/−1 over the input hashes according to whether bit b is set; output
  * bit b is set iff the vote is strictly positive. Null elements are
  * skipped.
  *
  * Why an Expression and not built-ins: expressed with built-ins this is
  * 32 separate `aggregate()` higher-order lambdas over the same array — 32
  * interpreted passes per document (lambda bodies are neither codegen'd
  * nor CSE-shared). This expression makes ONE pass: 32 int
  * adds per hash in a primitive loop, under both codegen and interpreted
  * eval. Integer-only arithmetic ⇒ order-independent and engine-portable
  * (the DuckDB oracle keeps its per-bit list fold — same votes exactly).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) r |= 1L << b
      b += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |int[] $votes = new int[32];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 32; $b++) {
         |      $votes[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($votes[$b] > 0) $r |= 1L << $b;
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Native minhash signature: per affine seed j, the minimum of
  * `(a_j·h + b_j) mod p` over the input hashes, all seeds in ONE pass.
  *
  * The built-in formulation materializes one `transform()`ed array per
  * seed and `array_min`s each — k array allocations + k traversals per
  * document. This expression walks the hash array once, maintaining k
  * running minima in a primitive loop (both codegen and interpreted).
  *
  * Semantics parity with the built-ins (and the DuckDB oracle): pure int64
  * arithmetic, and an EMPTY (or all-null) input yields an array of k NULLs
  * — exactly what `array_min(transform([], …))` produces, which is what
  * downstream "no grams" filters key on. Null elements are skipped.
  */
case class MinHashAffine(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need one (a,b) per seed")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash requires array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash"

  private def k = as.length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.fill[Any](k)(null))
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(Long.box(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addReferenceObj("as", as.toArray, "long[]")
    val bArr = ctx.addReferenceObj("bs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $seen = true;
         |    long $h = $arr.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aArr[$j] * $h + $bArr[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  $out[$j] = $seen ? (Object) java.lang.Long.valueOf($mins[$j]) : null;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashAffine =
    copy(child = newChild)
}

/** Native Bloom-filter build: a [[TypedImperativeAggregate]] that ORs
  * precomputed bit positions (an `array<bigint>` column, one entry per
  * hash function) into a fixed `words`×64-bit buffer and emits the
  * filter as `array<bigint>`.
  *
  * Why a custom aggregate and not built-ins: the relational formulation
  * (explode positions → groupBy word → bit_or) shuffles every position
  * row into ≤`words` groups — a skewed exchange that grows with the
  * input; this aggregate keeps the ENTIRE state in one fixed 8·words-byte
  * buffer per partition and merges buffers, the same shape as Spark's
  * internal `bloom_filter_agg` (whose sketch layout is not
  * SQL-mirrorable — this one's plain word array reconstructs exactly in
  * DuckDB via `bit_or` over the identical sha-derived positions, which
  * is what the oracle gate needs). Integer-only ⇒ order-independent,
  * engine-portable.
  *
  * Out-of-range and null positions are ignored (a position is
  * `hash % (words·64)` by construction; nulls arise from null text).
  */
case class BloomBitsAgg(child: Expression, words: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {
  require(words > 0 && words <= (1 << 20), "words must be in (0, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitsAgg =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits requires array<bigint> positions, got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_bits"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val bits = words.toLong * 64
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val p = arr.getLong(i)
          if (p >= 0 && p < bits) buf((p >> 6).toInt) |= 1L << (p & 63)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = n)
}

object SketchFunctions {
  /** Column-level one-pass simhash over token hashes (see [[SimHash32]]). */
  def simHash32(tokenHashes: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(tokenHashes)))

  /** Column-level one-pass minhash signature (see [[MinHashAffine]]). */
  def minHash(tokenHashes: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    GraftBridge.column(
      MinHashAffine(GraftBridge.expression(tokenHashes), as, bs, p))

  /** Column-level Bloom build over precomputed bit positions (see
    * [[BloomBitsAgg]]); use inside `.agg(...)`.
    */
  def bloomBits(positions: Column, words: Int): Column =
    GraftBridge.column(
      BloomBitsAgg(GraftBridge.expression(positions), words).toAggregateExpression())
}
