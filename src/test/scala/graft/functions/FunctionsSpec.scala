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

  test("graft_lsh_sigs matches an independent md5-parity sign computation") {
    import org.apache.spark.sql.functions._
    val spark2 = s
    import spark2.implicits._
    // independent ground truth: NOT the kernel — recompute weights and the
    // index-order float->double dot from the spec'd definition
    def weight(t: Int, p: Int, d: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$t:$p:$d".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
    val (tables, planes, dims) = (3, 5, 4)
    def expected(v: Array[Float]): Seq[Long] =
      (0 until tables).map { t =>
        (0 until planes).foldLeft(0L) { (sig, p) =>
          var acc = 0.0; var i = 0
          while (i < dims) { acc += v(i).toDouble * weight(t, p, i); i += 1 }
          if (acc > 0) sig | (1L << p) else sig
        }
      }
    val vecs = (0 until 6).map(k =>
      (k.toLong, Array.tabulate(dims)(d => math.sin(k * 7 + d * 3).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
      expr(s"graft_lsh_sigs(embedding, $tables, $planes, $dims)").as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, v) <- vecs) assert(out(id) === expected(v), s"vec $id")
    // batch operator parity: lshSignatures (explode form) agrees
    val exploded = graft.ops.Similarity.lshSignatures(df, tables, planes)
      .as[(Long, Long, Long)].collect().toSet
    val want = vecs.flatMap { case (id, v) =>
      expected(v).zipWithIndex.map { case (sg, t) => (id, t.toLong, sg) } }.toSet
    assert(exploded === want)
    // double-typed corpus: same signs (values chosen representable enough
    // that float->double and double paths agree in sign)
    val dd = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        expr(s"graft_lsh_sigs(embedding, $tables, $planes, $dims)").as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, v) <- vecs) assert(dd(id) === expected(v), s"double vec $id")
    // corrupt rows: a NULL element degrades every touched plane to bit 0
    // (sig 0); a NULL embedding drops the row at the explode
    val corrupt = s.sql(
      s"""SELECT graft_lsh_sigs(array(cast(1 as float), cast(null as float),
         |  cast(1 as float), cast(1 as float)), $tables, $planes, $dims) AS a,
         |  graft_lsh_sigs(cast(null as array<float>),
         |  $tables, $planes, $dims) AS b""".stripMargin).collect()(0)
    assert(corrupt.getSeq[Long](0) === Seq.fill(tables)(0L))
    assert(corrupt.isNullAt(1))
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

  test("graft_first_shared: first non-null equal slot, -1 when none, long and string") {
    val s = SparkSpec.session
    graft.functions.GraftFunctions.register(s)
    // non-constant input so the projection runs through codegen
    val r = s.range(1).selectExpr(
      // null slots never match, even null-vs-null; match found at index 2
      "graft_first_shared(array(cast(null as bigint), 7L, 5L, 9L), " +
        "array(cast(null as bigint), 8L + id, 5L, 9L)) AS l1",
      // no shared slot -> -1
      "graft_first_shared(array(1L + id, 2L), array(3L, 4L)) AS l2",
      // string variant: match at index 1
      "graft_first_shared(array('a', 'b', 'c'), " +
        "array(concat('z', cast(id as string)), 'b', 'c')) AS s1",
      "graft_first_shared(array(cast(null as string)), array('x')) AS s2")
      .collect()(0)
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === -1)
    assert(r.getInt(2) === 1)
    assert(r.getInt(3) === -1)
    // parity with the interpreted HOF chain it replaced
    val hof = s.range(1).selectExpr(
      "array_position(zip_with(array(cast(null as bigint), 7L, 5L), " +
        "array(6L + id, cast(null as bigint), 5L), " +
        "(a, b) -> coalesce(a = b, false)), true) - 1 AS p",
      "graft_first_shared(array(cast(null as bigint), 7L, 5L), " +
        "array(6L + id, cast(null as bigint), 5L)) AS k").collect()(0)
    assert(hof.getLong(0) === hof.getInt(1).toLong)
  }
}
