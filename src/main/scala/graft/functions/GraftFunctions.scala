package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression, Expression, ExpectsInputTypes, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.Phonetics

/** Custom Catalyst expressions (SURVEY.md §4.2: the only extension surface
  * this engine needs — no new logical operators, so no Rule/SparkStrategy).
  * All implement full `doGenCode` as a static call into the pure kernels,
  * staying inside whole-stage codegen on the scoring hot path; no Scala
  * UDF boxing.
  *
  * Entry points for Java codegen live in [[GraftFunctions]] (static-ish
  * object methods referenced by fully-qualified name).
  */
object GraftFunctions {

  // codegen-visible static entry points (UTF8String in/out)
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    StringSim.jaroWinkler(a.toString, b.toString)
  def mongeElkan(a: UTF8String, b: UTF8String): Double =
    StringSim.mongeElkan(a.toString, b.toString)
  def soundex(a: UTF8String): UTF8String =
    UTF8String.fromString(Phonetics.soundex(a.toString))
  def metaphone(a: UTF8String): UTF8String =
    UTF8String.fromString(Phonetics.metaphone(a.toString))

  /** Dot product of two float arrays, accumulated in index order as
    * doubles — bit-identical to `aggregate(zip_with(a, b, (x, y) ->
    * cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)`
    * (the interpreted HOF chain it replaces on the ANN verify hot path:
    * HOF lambdas don't participate in whole-stage codegen and box every
    * element). A NULL element — or a length mismatch, which zip_with pads
    * with NULLs — yields a NULL result, like the HOF chain: one corrupt or
    * truncated embedding row must degrade to an ignored row, not kill the
    * job with an executor exception or fold into a plausible wrong value. */
  def dotF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
    }
    acc
  }

  /** Dot of a float array against a double array (inlined IVF centroid),
    * same accumulation order and NULL-element / length-mismatch semantics
    * as the HOF chain it replaces. */
  def dotFD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1
    }
    acc
  }

  /** double x float / double x double / norm-of-double variants: a
    * double-typed corpus keeps its elements LOSSLESS (the HOF chain being
    * replaced computed double elements exactly; an implicit
    * array<double> -> array<float> downcast would silently change its
    * numerics). The dot/norm expressions dispatch on the resolved child
    * element type, so each combination calls its own branch-free kernel. */
  def dotDF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1
    }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i); i += 1
    }
    acc
  }

  /** All-tables LSH sign signatures in one pass: element t of the result
    * is the sum over planes p of (1L << p) where the index-order double
    * dot of the row against plane (t, p)'s ±1 weight vector is > 0.
    * `w` is the flat weight array laid out (t * planes + p) * dims + d.
    *
    * Per-plane parity with the unrolled `CASE WHEN graft_dot_fd(emb,
    * array(<literals>)) > 0` chain this replaces: same accumulation order
    * (bit-identical sign), and a corrupt plane dot — NULL element or a
    * width-mismatched row — contributes bit 0 instead of poisoning the
    * job. The replacement exists because the unrolled form inlines
    * tables x planes x dims literal doubles into ONE generated method: at
    * the auto params of a large corpus (~64 tables x 12 planes x 64+
    * dims) that is a >10k-line method, past janino's limits, and the
    * whole index-build stage silently fell back to interpreted execution.
    * This kernel keeps the stage inside whole-stage codegen with O(1)
    * generated code at any parameter setting. */
  def lshSigsF(a: ArrayData, tables: Int, planes: Int, dims: Int,
      w: Array[Double]): Array[Long] = {
    val out = new Array[Long](tables)
    val widthOk = a.numElements() == dims
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        if (widthOk) {
          val base = (t * planes + p) * dims
          var acc = 0.0; var i = 0; var bad = false
          while (i < dims && !bad) {
            if (a.isNullAt(i)) bad = true
            else { acc += a.getFloat(i).toDouble * w(base + i); i += 1 }
          }
          if (!bad && acc > 0) sig |= (1L << p)
        }
        p += 1
      }
      out(t) = sig; t += 1
    }
    out
  }

  /** [[lshSigsF]] for array<double> rows (lossless, like [[dotDD]]). */
  def lshSigsD(a: ArrayData, tables: Int, planes: Int, dims: Int,
      w: Array[Double]): Array[Long] = {
    val out = new Array[Long](tables)
    val widthOk = a.numElements() == dims
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        if (widthOk) {
          val base = (t * planes + p) * dims
          var acc = 0.0; var i = 0; var bad = false
          while (i < dims && !bad) {
            if (a.isNullAt(i)) bad = true
            else { acc += a.getDouble(i) * w(base + i); i += 1 }
          }
          if (!bad && acc > 0) sig |= (1L << p)
        }
        p += 1
      }
      out(t) = sig; t += 1
    }
    out
  }

  def normD(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getDouble(i) * a.getDouble(i); i += 1
    }
    math.sqrt(acc)
  }

  /** L2 norm of a float array, squares summed in index order — matches
    * `sqrt(aggregate(transform(a, x -> cast(x as double) * cast(x as
    * double)), 0D, (acc, v) -> acc + v))` including NULL-element
    * propagation. */
  def normF(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * a.getFloat(i).toDouble; i += 1
    }
    math.sqrt(acc)
  }

  private val O = "graft.functions.GraftFunctions"

  /** Register all graft expressions as session temp functions, usable from
    * both the DataFrame API (expr(...)) and SQL. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_jaro_winkler",
      (es: Seq[Expression]) => JaroWinklerExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_monge_elkan",
      (es: Seq[Expression]) => MongeElkanExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_soundex",
      (es: Seq[Expression]) => SoundexExpr(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_metaphone",
      (es: Seq[Expression]) => MetaphoneExpr(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot_f",
      (es: Seq[Expression]) => DotFExpr(es(0), es(1)), "scala_udf")
    // graft_dot_fd is kept as an alias (oracle SQL and the sigColumn /
    // centroid projections use it); both names dispatch on element types
    reg.createOrReplaceTempFunction("graft_dot_fd",
      (es: Seq[Expression]) => DotFExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_norm_f",
      (es: Seq[Expression]) => NormFExpr(es(0)), "scala_udf")
    // graft_lsh_sigs(emb, tables, planes, dims): the three parameters must
    // be integer literals (they shape the weight table at plan time)
    reg.createOrReplaceTempFunction("graft_lsh_sigs",
      (es: Seq[Expression]) => LshSigsExpr(es(0), LshSigsExpr.litInt(es(1)),
        LshSigsExpr.litInt(es(2)), LshSigsExpr.litInt(es(3))), "scala_udf")
  }
}

// ImplicitCastInputTypes (not bare ExpectsInputTypes) on the array
// kernels: the HOF chains they replaced cast elements inline, so any
// array-typed corpus must keep resolving (the analyzer injects an element
// cast) instead of failing with a type mismatch. The wanted element type
// is RESOLVED FROM THE CHILD: an array<double> input stays double (its
// elements are computed losslessly, as the HOF chain did — an implicit
// downcast to float would silently change the numerics of a double-typed
// corpus), everything else casts to float as before. inputTypes is only
// consulted by the analyzer once children are resolved, so dispatching on
// the child's dataType here is safe.
private object ArrayKernelType {
  def elemOf(e: Expression): DataType =
    if (!e.resolved) FloatType // analyzer re-consults once children resolve
    else e.dataType match {
      case ArrayType(DoubleType, _) => DoubleType
      case _ => FloatType
    }
  def isDouble(e: Expression): Boolean = elemOf(e) == DoubleType
}

/** graft_dot_f / graft_dot_fd: dot product of two float/double arrays,
  * accumulated in index order as doubles (see [[GraftFunctions.dotF]]).
  * Both registered names resolve to this expression; the kernel variant
  * is chosen from the resolved element types. */
case class DotFExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(
    ArrayType(ArrayKernelType.elemOf(left)),
    ArrayType(ArrayKernelType.elemOf(right)))
  override def dataType: DataType = DoubleType
  // nullable even on non-null array columns: a NULL ELEMENT nulls the result
  override def nullable: Boolean = true
  private lazy val kernel =
    (ArrayKernelType.isDouble(left), ArrayKernelType.isDouble(right)) match {
      case (false, false) => "dotF"
      case (false, true) => "dotFD"
      case (true, false) => "dotDF"
      case (true, true) => "dotDD"
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "dotF" => GraftFunctions.dotF(x, y)
      case "dotFD" => GraftFunctions.dotFD(x, y)
      case "dotDF" => GraftFunctions.dotDF(x, y)
      case _ => GraftFunctions.dotDD(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""java.lang.Double $r = graft.functions.GraftFunctions.$kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class NormFExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(ArrayKernelType.elemOf(child)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val kernel =
    if (ArrayKernelType.isDouble(child)) "normD" else "normF"
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (kernel == "normD") GraftFunctions.normD(x) else GraftFunctions.normF(x)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("normRes")
      s"""java.lang.Double $r = graft.functions.GraftFunctions.$kernel($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** graft_lsh_sigs: all-tables random-hyperplane LSH signatures of one
  * embedding row as array<long> (index = table) — the loop-codegen'd
  * replacement for the unrolled per-table CASE chains (see
  * [[GraftFunctions.lshSigsF]] for why: the unrolled form exceeded
  * janino's method limits at large-corpus auto params and silently
  * dropped the index build out of whole-stage codegen). The md5-parity
  * ±1 weights are deterministic in (t, p, d) — identical to the DuckDB
  * oracle's plane_weights CTE — computed once per plan and shipped to
  * generated code as a reference object, never as literals.
  *
  * NULL-handling: a NULL element (or a width-mismatched row, streaming
  * only — batch fails fast on ragged corpora) degrades the affected
  * plane's bit to 0, exactly like the CASE chain. A NULL embedding now
  * yields a NULL signature array — the row drops out of the bucket
  * explode — where the CASE chain gave it sig 0 in EVERY table,
  * piling all corrupt rows into one hot bucket per table (a skew bomb
  * the valve then had to absorb). */
case class LshSigsExpr(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(tables > 0 && planes > 0 && planes <= 63 && dims > 0,
    s"invalid LSH shape: tables=$tables planes=$planes dims=$dims")
  override def inputTypes = Seq(ArrayType(ArrayKernelType.elemOf(child)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val kernel =
    if (ArrayKernelType.isDouble(child)) "lshSigsD" else "lshSigsF"
  @transient private lazy val weights: Array[Double] =
    LshSigsExpr.weights(tables, planes, dims)
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val sigs =
      if (kernel == "lshSigsD") GraftFunctions.lshSigsD(arr, tables, planes, dims, weights)
      else GraftFunctions.lshSigsF(arr, tables, planes, dims, weights)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sigs)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("lshWeights", weights, "double[]")
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.GraftFunctions.$kernel(
         |    $a, $tables, $planes, $dims, $wRef));
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshSigsExpr {
  /** Deterministic ±1 hyperplane weight for (table t, plane p, dim d):
    * parity of the first 8 md5 hex chars of "t:p:d" — identical to the
    * oracle's `('0x' || substr(md5(t || ':' || p || ':' || d), 1, 8))
    * ::BIGINT % 2`. */
  def planeWeight(t: Int, p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$t:$p:$d".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** Flat (t * planes + p) * dims + d weight layout for the kernels. */
  def weights(tables: Int, planes: Int, dims: Int): Array[Double] = {
    val w = new Array[Double](tables * planes * dims)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < planes) {
        var d = 0
        while (d < dims) {
          w((t * planes + p) * dims + d) = planeWeight(t, p, d); d += 1
        }
        p += 1
      }
      t += 1
    }
    w
  }

  /** Registry helper: the shape arguments must fold to integer literals. */
  def litInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case other => throw new IllegalArgumentException(
      s"graft_lsh_sigs shape parameters must be integer literals, got $other")
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftFunctions.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class MongeElkanExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.mongeElkan(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftFunctions.mongeElkan($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SoundexExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    GraftFunctions.soundex(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftFunctions.soundex($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MetaphoneExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    GraftFunctions.metaphone(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GraftFunctions.metaphone($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
