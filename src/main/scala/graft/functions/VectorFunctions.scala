package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two float/double array columns.
  *
  * Why an Expression and not built-ins: the pairwise-similarity hot loops
  * (cosine near-dup, ANN ranking) evaluate a dot per *pair* inside a
  * broadcast nested-loop join condition, where neither higher-order
  * `aggregate`/`zip_with` lambdas nor a 64-term unrolled `element_at` sum
  * are whole-stage-codegen'd — both fall to per-element interpreted eval
  * (~20 µs/pair measured at sf0.1 — 50 s for 2M pairs). This expression
  * compiles to a primitive `for` loop via `doGenCode`, and its interpreted
  * `eval` is the same tight loop, so it is fast under every execution mode
  * (~0.1 µs/pair; the same 2M pairs in <1 s).
  *
  * Determinism contract (keys the DuckDB oracle parity): the sum is a
  * sequential left-to-right fold seeded with 0.0 over
  * `(double) a[i] * (double) b[i]` — the identical IEEE operation sequence
  * as DuckDB's `list_aggregate(list_transform(...), 'sum')`, so results are
  * bit-identical. float→double widening is exact; each product rounds once.
  *
  * Array elements must be non-null (embedding vectors); lengths are folded
  * to the shorter side.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($arr1.numElements(), $arr2.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $arr1.$lGet($i) * (double) $arr2.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Native banded hyperplane-LSH sketch: all `families` bucket ids of a
  * vector in ONE pass. Family f's bucket is `planesPerFam` sign bits —
  * bit j is set iff `dot(vec, plane_{f·planesPerFam+j}) >= 0` — over a
  * flat row-major plane matrix (`planes(p·dim + i)` = component i of
  * plane p).
  *
  * Why an Expression and not 120 [[VecDot]] calls: the composed form
  * (`array(fam0..famL)`, each family a when-chain over k VecDots against
  * a 64-literal array) builds an expression tree with thousands of
  * literal nodes that Catalyst re-analyzes and re-optimizes on EVERY
  * query construction, re-reads the vector once per plane, and generates
  * pages of code. This node carries the matrix as one reference object,
  * reads the vector once, and emits a primitive triple loop under both
  * codegen and interpreted eval.
  *
  * Determinism contract: each dot is the identical sequential
  * left-to-right fold seeded 0.0 over `(double) vec[i] * plane[i]` as
  * [[VecDot]] against the same plane literals, so bucket ids are
  * bit-identical to the composed form and to the DuckDB mirror
  * (`list_aggregate(...,'sum')` per plane). `dot >= 0.0` is false for
  * NaN — same as the composed `when(vecDot >= 0.0, ...)`.
  */
case class HyperplaneBands(child: Expression, planes: Array[Double],
    families: Int, planesPerFam: Int) extends UnaryExpression {
  require(families > 0 && planesPerFam > 0 && planesPerFam <= 63 &&
    planes.length % (families * planesPerFam) == 0,
    "planes must be a flat families*planesPerFam*dim matrix")

  private def dim: Int = planes.length / (families * planesPerFam)

  // case-class equals on an Array field is REFERENCE equality, under which
  // two semantically identical nodes never compare equal — Catalyst
  // canonicalization / semanticEquals / common-subexpression elimination
  // would silently treat them as distinct. Compare the matrix by content.
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneBands =>
      child == h.child && families == h.families &&
        planesPerFam == h.planesPerFam &&
        java.util.Arrays.equals(planes, h.planes)
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(families), Integer.valueOf(planesPerFam),
    Integer.valueOf(java.util.Arrays.hashCode(planes)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires array<float>/array<double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val vf = isFloat
    val out = new Array[Long](families)
    var f = 0
    while (f < families) {
      var bucket = 0L
      var j = 0
      while (j < planesPerFam) {
        val base = (f * planesPerFam + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          val xv = if (vf) v.getFloat(i).toDouble else v.getDouble(i)
          s += xv * planes(base + i)
          i += 1
        }
        if (s >= 0.0) bucket |= 1L << j
        j += 1
      }
      out(f) = bucket
      f += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val f = ctx.freshName("f")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |long[] $out = new long[$families];
         |for (int $f = 0; $f < $families; $f++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $planesPerFam; $j++) {
         |    int $base = ($f * $planesPerFam + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += (double) $arr.$get($i) * $mat[$base + $i];
         |    }
         |    if ($s >= 0.0) $bucket |= 1L << $j;
         |  }
         |  $out[$f] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

/** Native multi-centroid dot: one vector's dots against every row of a
  * flat row-major `vectors`×dim matrix in ONE pass, as `array<double>`.
  *
  * Why an Expression (the q39/HyperplaneBands lesson applied to q35):
  * composing c per-cell `VecDot(v, typedLit(centroid_c))` calls puts
  * c·dim literal nodes plus an O(c²) argmax when-chain into the plan —
  * at the ~√n adaptive cell count that plan-analysis tax dominated the
  * whole query (45 cells at sf0.1 ≈ 2,880 literals; measured 1.66 s vs
  * ~0.3 s fixed-8). This node carries the matrix as one reference
  * object; the argmax collapses to `array_position(_, array_max(_))`.
  *
  * Determinism contract: per cell the identical sequential left fold
  * seeded 0.0 over `(double) v[i] * mat[c·dim + i]` as [[VecDot]]
  * against that centroid literal — bit-identical dots, same oracle.
  */
case class VecDotMany(child: Expression, mat: Array[Double], vectors: Int)
    extends UnaryExpression {
  require(vectors > 0 && mat.length % vectors == 0,
    "mat must be a flat vectors*dim matrix")

  private def dim: Int = mat.length / vectors

  // content equality over the Array field (see HyperplaneBands)
  override def equals(other: Any): Boolean = other match {
    case v: VecDotMany =>
      child == v.child && vectors == v.vectors &&
        java.util.Arrays.equals(mat, v.mat)
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(vectors),
    Integer.valueOf(java.util.Arrays.hashCode(mat)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_dot_many requires array<float>/array<double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_dot_many"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val vf = isFloat
    val out = new Array[Double](vectors)
    var c = 0
    while (c < vectors) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (vf) v.getFloat(i).toDouble else v.getDouble(i)
        s += xv * mat(base + i)
        i += 1
      }
      out(c) = s
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mat", mat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double[] $out = new double[$vectors];
         |for (int $c = 0; $c < $vectors; $c++) {
         |  int $base = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $arr.$get($i) * $m[$base + $i];
         |  }
         |  $out[$c] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecDotMany =
    copy(child = newChild)
}

/** Native PQ distance matrix: one vector's squared L2 distances to every
  * entry of every per-subspace codebook in ONE pass, as
  * `array<array<double>>` (outer = subspace, inner = code).
  *
  * Why an Expression (the promised q65/q67 upgrade path, the
  * [[VecDotMany]] lesson applied to PQ): the composed form slices the
  * vector into m named subspace columns and folds
  * `aggregate(zip_with(...))` per codebook entry — m·k interpreted
  * lambda evaluations per row re-reading each slice k times, plus
  * m·k·subDim literal nodes in the plan. This node carries the codebook
  * tensor as one reference object, reads the vector once, and emits a
  * primitive triple loop under both codegen and interpreted eval.
  *
  * Determinism contract (keys q65/q67's oracle parity): per (subspace,
  * code) the identical IEEE sequence as the lambda pipeline and the
  * DuckDB CTE chain — `x = (double) vec[m·subDim+i]`, `t = x − c_i`,
  * left fold of `t·t` seeded 0.0 in i order. A vector too short for a
  * subspace's full slice — or one with a NULL element in the slice —
  * yields a NULL inner array: observably identical to the composed
  * form's null folds (`zip_with` nulls every entry of that subspace's
  * distance array, and every downstream read goes through
  * `array_min`/`array_position`, which null in both shapes). Reading a
  * null slot as `getFloat`'s 0.0 would instead fabricate a finite
  * wrong distance — a silent cross-engine divergence.
  *
  * `books` is flat: entry `(m·codes + k)·subDim + i`.
  */
case class SubspaceSqDists(child: Expression, books: Array[Double],
    subspaces: Int, codes: Int, subDim: Int) extends UnaryExpression {
  require(subspaces > 0 && codes > 0 && subDim > 0 &&
    books.length == subspaces * codes * subDim,
    "books must be a flat subspaces*codes*subDim tensor")

  // content equality over the Array field (see HyperplaneBands)
  override def equals(other: Any): Boolean = other match {
    case s: SubspaceSqDists =>
      child == s.child && subspaces == s.subspaces && codes == s.codes &&
        subDim == s.subDim && java.util.Arrays.equals(books, s.books)
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(subspaces), Integer.valueOf(codes),
    Integer.valueOf(subDim),
    Integer.valueOf(java.util.Arrays.hashCode(books)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subspace_sq_dists requires array<float>/array<double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(
    ArrayType(DoubleType, containsNull = false), containsNull = true)
  override def prettyName: String = "subspace_sq_dists"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vf = isFloat
    val out = new Array[Any](subspaces)
    var m = 0
    while (m < subspaces) {
      var sliceOk = v.numElements() >= (m + 1) * subDim
      if (sliceOk) {
        var i = 0
        while (sliceOk && i < subDim) {
          if (v.isNullAt(m * subDim + i)) sliceOk = false
          i += 1
        }
      }
      if (sliceOk) {
        val dists = new Array[Double](codes)
        var k = 0
        while (k < codes) {
          val base = (m * codes + k) * subDim
          var s = 0.0
          var i = 0
          while (i < subDim) {
            val x = if (vf) v.getFloat(m * subDim + i).toDouble
                    else v.getDouble(m * subDim + i)
            val t = x - books(base + i)
            s += t * t
            i += 1
          }
          dists(k) = s
          k += 1
        }
        out(m) = new org.apache.spark.sql.catalyst.util.GenericArrayData(dists)
      } // else: stays null — incomplete slice or null element
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", books, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val dists = ctx.freshName("dists")
      val ok = ctx.freshName("sliceOk")
      s"""
         |Object[] $out = new Object[$subspaces];
         |for (int $m = 0; $m < $subspaces; $m++) {
         |  boolean $ok = $arr.numElements() >= ($m + 1) * $subDim;
         |  for (int $i = 0; $ok && $i < $subDim; $i++) {
         |    if ($arr.isNullAt($m * $subDim + $i)) $ok = false;
         |  }
         |  if ($ok) {
         |    double[] $dists = new double[$codes];
         |    for (int $k = 0; $k < $codes; $k++) {
         |      int $base = ($m * $codes + $k) * $subDim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        double $x = (double) $arr.$get($m * $subDim + $i);
         |        double $t = $x - $b[$base + $i];
         |        $s += $t * $t;
         |      }
         |      $dists[$k] = $s;
         |    }
         |    $out[$m] = new org.apache.spark.sql.catalyst.util.GenericArrayData($dists);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SubspaceSqDists =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column-level sequential-fold dot product (see [[VecDot]]). */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-level one-pass banded hyperplane sketch (see
    * [[HyperplaneBands]]). `planes` is flat row-major
    * (families·planesPerFam)×dim.
    */
  def hyperplaneBands(v: Column, planes: Array[Double],
      families: Int, planesPerFam: Int): Column =
    GraftBridge.column(HyperplaneBands(
      GraftBridge.expression(v), planes, families, planesPerFam))

  /** Column-level multi-centroid dot (see [[VecDotMany]]). `mat` is flat
    * row-major vectors×dim.
    */
  def vecDotMany(v: Column, mat: Array[Double], vectors: Int): Column =
    GraftBridge.column(VecDotMany(GraftBridge.expression(v), mat, vectors))

  /** Column-level PQ distance matrix (see [[SubspaceSqDists]]). `books`
    * is the flat subspaces×codes×subDim codebook tensor.
    */
  def subspaceSqDists(v: Column, books: Array[Double],
      subspaces: Int, codes: Int, subDim: Int): Column =
    GraftBridge.column(SubspaceSqDists(
      GraftBridge.expression(v), books, subspaces, codes, subDim))
}
