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
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
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

  def cosine(a: Column, b: Column): Column =
    floatDot(a, b) / (floatNorm(a) * floatNorm(b))

  /** packed (table << 16 | bucket) sign-LSH index keys, array<int> */
  def lshKeys(a: Column): Column =
    GraftBridge.column(LshIndexKeys(GraftBridge.expression(a)))
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

/** Static kernel for [[LshIndexKeys]] (generated code calls the
  * static forwarder). Kept free of Row/encoder machinery: reads
  * ArrayData directly, one float[] materialization per row, reuses
  * the per-JVM hyperplane cache. */
object LshKernel {
  def packedKeys(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val v = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // null element -> NULL result
      v(i) = a.getFloat(i)
      i += 1
    }
    val tables = graft.rel.Similarity.LshTables
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      out(t) = (t << 16) | graft.rel.Similarity.lshBucket(t, v)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
