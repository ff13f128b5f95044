package graft.functions

import graft.SparkSpec

/** Pins the two contracts of the codegen'd array kernels that the ANN ops
  * hot path relies on: (1) bit-identity with the interpreted HOF chains
  * they replaced (so swapping them in changed no oracle), and (2) corrupt
  * input rows — NULL element, truncated array, NULL array — degrade to a
  * NULL result instead of an executor exception or a plausible wrong
  * value folded over the shorter prefix. */
class FunctionsSpec extends SparkSpec {

  private lazy val s = { GraftFunctions.register(spark); spark }

  test("codegen dot/norm kernels are bit-identical to the HOF chains") {
    // non-constant inputs so the projection runs through whole-stage
    // codegen (constant inputs would be folded through interpreted eval)
    val df = s.range(100).selectExpr(
      "transform(sequence(0, 15), i -> cast(sin(id * 17 + i) as float)) as a",
      "transform(sequence(0, 15), i -> cast(cos(id * 13 + i) as float)) as b")
    val rows = df.selectExpr(
      "graft_dot_f(a, b) as fast",
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "0D, (acc, v) -> acc + v) as hof",
      "graft_norm_f(a) as nfast",
      "sqrt(aggregate(transform(a, x -> cast(x as double) * cast(x as double)), " +
        "0D, (acc, v) -> acc + v)) as nhof").collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("corrupt rows degrade to NULL: null element, length mismatch, null array") {
    // constant args -> constant-folded through the interpreted eval path
    val r = s.sql(
      """SELECT
        |  graft_dot_f(array(cast(1 as float), cast(null as float)),
        |              array(cast(1 as float), cast(2 as float)))  AS nul_elem,
        |  graft_dot_f(array(cast(1 as float)),
        |              array(cast(1 as float), cast(2 as float)))  AS len_mismatch,
        |  graft_dot_f(cast(null as array<float>),
        |              array(cast(1 as float)))                    AS nul_arr,
        |  graft_norm_f(array(cast(1 as float), cast(null as float))) AS nul_norm,
        |  graft_dot_fd(array(cast(1 as float)),
        |               array(cast(1 as double), cast(2 as double))) AS fd_mismatch,
        |  graft_dot_f(array(cast(3 as float)), array(cast(2 as float))) AS ok
        |""".stripMargin).collect()(0)
    (0 to 4).foreach(i => assert(r.isNullAt(i), s"column $i should be NULL"))
    assert(r.getDouble(5) === 6.0)

    // the same corrupt shapes through the CODEGEN path (non-constant rows)
    // an array<double>-typed corpus resolves via the analyzer's implicit
    // element cast (the HOF chains cast inline; the kernels must not
    // regress that API surface to an AnalysisException)
    val dbl = s.sql(
      "SELECT graft_norm_f(array(cast(3 as double), cast(4 as double))) AS n").collect()(0)
    assert(dbl.getDouble(0) === 5.0)

    val viaCodegen = s.range(1).selectExpr(
      "graft_dot_f(array(cast(id as float), cast(null as float)), " +
        "array(cast(1 as float), cast(2 as float))) as d",
      "graft_norm_f(array(cast(id as float), cast(null as float))) as n",
      "graft_dot_f(array(cast(id as float)), " +
        "array(cast(1 as float), cast(2 as float))) as m").collect()(0)
    assert(viaCodegen.isNullAt(0) && viaCodegen.isNullAt(1) && viaCodegen.isNullAt(2))
  }

  test("double-typed arrays compute losslessly — no silent float downcast") {
    // 1 + 1e-9 is NOT representable as float ((1.0 + 1e-9).toFloat == 1.0f);
    // a downcasting kernel would fold it to exactly 7.0 below
    assert((1.0 + 1e-9).toFloat.toDouble == 1.0)
    // non-constant input so the projection runs through codegen
    val r = s.range(1).selectExpr(
      "graft_dot_f(array(cast(id as double) + 1.0 + 1e-9, 2.0D), " +
        "array(3.0D, 2.0D)) AS dd",
      "(1.0D + 1e-9) * 3.0D + 2.0D * 2.0D AS expect_dd",
      // mixed: double left x float right dispatches dotDF
      "graft_dot_f(array(cast(id as double) + 1.0 + 1e-9), " +
        "array(cast(2 as float))) AS df",
      "(1.0D + 1e-9) * cast(cast(2 as float) as double) AS expect_df",
      "graft_norm_f(array(cast(id as double) + 1.0 + 1e-9)) AS nd",
      "sqrt((1.0D + 1e-9) * (1.0D + 1e-9)) AS expect_nd").collect()(0)
    Seq((0, 1), (2, 3), (4, 5)).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(a)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(b)), s"col $a != col $b")
      assert(r.getDouble(a) != math.floor(r.getDouble(a)),
        s"col $a collapsed to an integral value — float truncation")
    }
  }
}
