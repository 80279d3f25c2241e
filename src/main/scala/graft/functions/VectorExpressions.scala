package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path — the
  * codegen tier of the preference order (builtin > native Expression >
  * UDF): per-element lambda chains (`zip_with` + `aggregate`) carry
  * per-element null checks and boxing; these compile to a tight
  * primitive loop inside whole-stage codegen.
  *
  * Numeric contract: sequential double accumulation over float32
  * elements, element order preserved — bit-identical to the DuckDB
  * oracle's `list_sum(list_transform(...))` and to the previous
  * lambda implementation.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  // can yield NULL from non-null inputs (null element / length
  // mismatch), so nullability must not derive from the children alone
  override def nullable: Boolean = true

  /** SQL-lambda parity: zip_with pads a length mismatch with null and
    * aggregate propagates null elements — so mismatched lengths and
    * null elements yield NULL here too, never a silently-truncated or
    * zero-filled dot product. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** FUSED cosine similarity: dot / (sqrt(Σa²) · sqrt(Σb²)) in ONE pass
  * over both arrays instead of the three separate loops the
  * dot/(norm·norm) composition pays — the ANN scoring hot path
  * evaluates this once per (query, candidate), so at n·m candidate
  * scale the 3× array-traversal cut is the dominant cost lever.
  * Numeric contract: each of the three accumulators sees exactly the
  * per-element sequence it saw in the unfused composition (independent
  * accumulators, same element order), and the final combine is the
  * identical double expression — bit-identical results, including the
  * IEEE NaN on a zero-norm side. NULL contract matches the
  * composition: length mismatch or any null element → NULL. */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
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
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatCosine =
    copy(left = newLeft, right = newRight)
}

/** L2 norm: sqrt(Σ x_i²), same accumulation contract. */
case class FloatL2Norm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_norm"
  override def nullable: Boolean = true // null element -> NULL

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null // lambda parity: null element -> NULL
      acc += x.getFloat(i).toDouble * x.getFloat(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $a.getFloat($i);
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatL2Norm =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API: dot product of two float-array columns */
  def floatDot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  def floatNorm(a: Column): Column =
    GraftBridge.column(FloatL2Norm(GraftBridge.expression(a)))

  /** Fused one-pass cosine (see [[FloatCosine]]) — bit-identical to
    * the unfused floatDot/(floatNorm·floatNorm) composition. */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatCosine(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** packed (table << 16 | bucket) sign-LSH index keys, array<int> */
  def lshKeys(a: Column): Column =
    GraftBridge.column(LshIndexKeys(GraftBridge.expression(a)))

  /** JL random projection of a float-array column to outDim dims */
  def jlProject(a: Column, outDim: Int): Column =
    GraftBridge.column(JlProject(GraftBridge.expression(a), outDim))
}

/** Multi-table sign-LSH index keys as a native expression — the
  * 100 TB index-build hot path (every corpus vector hashes into
  * LshTables buckets once). A Scala UDF here pays Catalyst→Scala
  * array conversion and boxing per row; this stays a primitive loop
  * on ArrayData inside whole-stage codegen (via a static kernel call
  * — the hyperplane cache lives in graft.rel.Similarity). Output:
  * array<int> of (table << 16) | bucket packed keys, length
  * LshTables, never null elements. Null input elements → NULL (lambda
  * parity with the engine's other vector expressions). */
case class LshIndexKeys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "lsh_index_keys"
  override def nullable: Boolean = true // null element -> NULL

  override def nullSafeEval(a: Any): Any =
    LshKernel.packedKeys(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.LshKernel.packedKeys($a);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshIndexKeys =
    copy(child = newChild)
}

/** The sign-LSH hashing kernel (Charikar 2002) — lives in the
  * functions tier so the codegen expression above has no dependency
  * on the rel query layer; `graft.rel.Similarity` delegates here.
  * Static forwarders make every method callable from Janino-generated
  * code. */
object LshKernel {
  val Bits = 8    // bits per table → ~n/2^Bits vectors per bucket
  val Tables = 16 // independent tables; recall = 1-(1-p^b)^L per probe
  // the packed key is (table << 16) | bucket: bucket bits must fit
  // below bit 16 and table ids in the positive int range above it
  require(Bits <= 16 && Tables <= (1 << 15),
    s"packed-key scheme requires Bits <= 16 and Tables <= 32768, got $Bits/$Tables")

  /** Deterministic Rademacher hyperplane for (table, bit): component j
    * from a splitmix stream mapped to ±1 (sign LSH needs only symmetric
    * zero-mean components). */
  def hyperplane(table: Int, bit: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      var z = ((table.toLong * 64 + bit) << 32 | j.toLong) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      if (z >= 0) 1.0 else -1.0
    }

  /** hyperplanes are deterministic — materialize them once per JVM per
    * dim instead of re-deriving (and re-allocating) Tables×Bits arrays
    * for every vector hashed. Keyed by dim (not a single slot): two
    * dimensionalities hashed concurrently in one executor — e.g. the
    * registry's 64-dim corpus plus an ad-hoc SQL `lsh_index_keys` call
    * of another dim — must not thrash the cache back to per-row
    * re-derivation on the codegen hot path. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Array[Double]]]]
  // executor-lifetime memory bound: lsh_index_keys is SQL-registered,
  // so nothing guarantees uniform array lengths — ragged input must
  // not grow the cache without limit (Tables×Bits×dim doubles per
  // entry). Beyond the cap, extra dims recompute per row: degraded
  // speed on pathological input, never unbounded memory.
  private val MaxCachedDims = 64
  private def planes(dim: Int): Array[Array[Array[Double]]] = {
    val cached = planeCache.get(dim)
    if (cached != null) cached
    else {
      val p = Array.tabulate(Tables, Bits)((t, b) => hyperplane(t, b, dim))
      if (planeCache.size < MaxCachedDims) planeCache.putIfAbsent(dim, p)
      p
    }
  }

  /** Signature of v in one table: Bits sign bits. */
  def lshBucket(table: Int, v: Array[Float]): Int = {
    val tablePlanes = planes(v.length)(table)
    var bucket = 0
    var h = 0
    while (h < Bits) {
      val plane = tablePlanes(h)
      var s = 0.0
      var j = 0
      while (j < v.length) { s += plane(j) * v(j); j += 1 }
      if (s > 0) bucket |= (1 << h)
      h += 1
    }
    bucket
  }

  /** [[LshIndexKeys]] eval: reads ArrayData directly (no Row/encoder
    * machinery), one float[] materialization per row. */
  def packedKeys(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val v = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // null element -> NULL result
      v(i) = a.getFloat(i)
      i += 1
    }
    val out = new Array[Int](Tables)
    var t = 0
    while (t < Tables) {
      out(t) = (t << 16) | lshBucket(t, v)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Johnson–Lindenstrauss random projection to a lower dimension — the
  * 100 TB pre-ANN primitive (project 1024-dim embeddings to 64 before
  * LSH/IVF indexing; JL 1984, Achlioptas 2003 show Rademacher entries
  * suffice). The projection matrix is derived deterministically per
  * (outDim, dim) from a splitmix stream on a JL-specific salt — a
  * DIFFERENT stream than [[LshKernel.hyperplane]], so projected-space
  * LSH stays independent of the projection — and cached per JVM like
  * the LSH planes. Output is array<float>: projected embeddings store
  * at the same precision as the source column; the s10 distortion
  * contract measures in double over these floats, so the float
  * rounding is part of the audited semantics. Null input element →
  * NULL row (lambda parity with the other vector expressions). */
case class JlProject(child: Expression, outDim: Int) extends UnaryExpression {
  require(outDim > 0, s"jl_project requires outDim > 0, got $outDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "jl_project"
  override def nullable: Boolean = true // null element -> NULL

  override def nullSafeEval(a: Any): Any =
    JlKernel.project(a.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.JlKernel.project($a, $outDim);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

/** The JL projection kernel: deterministic Rademacher matrix
  * (entries ±1/√outDim) with a per-JVM cache, static forwarders for
  * Janino-generated code. */
object JlKernel {

  /** ±1 entry for (row, j) of any JL matrix: splitmix on a salt
    * disjoint from the LSH hyperplane stream (the XOR constant below
    * never appears there), so jl_project followed by lsh_index_keys
    * composes two independent random maps. */
  def entrySign(row: Int, j: Int): Double = {
    var z = ((row.toLong << 32) | (j.toLong & 0xffffffffL)) ^ 0x5851f42d4c957f2dL
    z = (z + 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    if (z >= 0) 1.0 else -1.0
  }

  /** outDim × dim Rademacher matrix scaled 1/√outDim (so E‖Rv‖² = ‖v‖²). */
  def matrix(outDim: Int, dim: Int): Array[Array[Double]] = {
    val s = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, dim)((r, j) => entrySign(r, j) * s)
  }

  // per-JVM cache, keyed (outDim, dim); bounded like LshKernel's plane
  // cache — jl_project is SQL-registered, so ragged/adversarial shapes
  // must degrade to per-row recompute, never unbounded executor memory
  private val matCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]
  private val MaxCachedMats = 64
  private def cachedMatrix(outDim: Int, dim: Int): Array[Array[Double]] = {
    val key = (outDim.toLong << 32) | (dim.toLong & 0xffffffffL)
    val cached = matCache.get(key)
    if (cached != null) cached
    else {
      val m = matrix(outDim, dim)
      if (matCache.size < MaxCachedMats) matCache.putIfAbsent(key, m)
      m
    }
  }

  /** [[JlProject]] eval: one float[] materialization per row, double
    * accumulation per output component in index order. */
  def project(a: ArrayData, outDim: Int): ArrayData = {
    val n = a.numElements()
    val v = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // null element -> NULL result
      v(i) = a.getFloat(i)
      i += 1
    }
    val m = cachedMatrix(outDim, n)
    val out = new Array[Float](outDim)
    var r = 0
    while (r < outDim) {
      val row = m(r)
      var s = 0.0
      var j = 0
      while (j < n) { s += row(j) * v(j); j += 1 }
      out(r) = s.toFloat
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
