package graft.sources

import graft.SparkSpec
import graft.pipeline.{Tokenize, Blocking}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

class RefHinSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("reads reference HIN vertex TSV into mentions; pipeline runs on it") {
    val dir = tmpDir("refhin")
    val tsv =
      """Id	Val	Type	Weight
        |1	john smith	REF	3
        |2	john smith jr	REF	1
        |3	mary jones	REF	2
        |4	smith	TKN	4
        |5	S530	SIM	4
        |""".stripMargin
    Files.write(Paths.get(dir, "vertices.tsv"), tsv.getBytes(StandardCharsets.UTF_8))

    val m = RefHin.mentions(spark, s"$dir/vertices.tsv")
    val rows = m.as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "john smith", 3L),
      (2L, "john smith jr", 1L), (3L, "mary jones", 2L)))

    // the derived pipeline stages accept the adapted table directly
    val toks = Tokenize.tokens(m.withColumn("weight", $"weight".cast("int")))
    assert(toks.count() === 7)
    val cands = Blocking.candidates(toks)
    val pairs = cands.select($"dst_id", $"org_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("writeSimGraph reproduces the reference sink format byte-for-byte") {
    val out = tmpDir("refsink")
    val vertices = Seq((2296L, "f. rossi", 4, 8880L)).toDF("id", "label", "weight", "res_id")
    val edges = Seq((1985L, 1987L, 1.0 / 3.0, 1)).toDF("source", "target", "weight", "common_token_cnt")
    RefHin.writeSimGraph(vertices, edges, out, coalesce = Some(1))

    def lines(sub: String): Seq[String] = {
      val d = Paths.get(out, sub)
      val part = Files.list(d).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      Files.readAllLines(part, StandardCharsets.UTF_8).asScala.toSeq
    }
    // exact shape of matching/out/vertices.tsv + edges.tsv (IO.java:32-56)
    assert(lines("vertices") === Seq(
      "Id\t Label\t Weight\t Res_Id",
      "2296\t f. rossi\t 4\t 8880"))
    assert(lines("edges") === Seq(
      "Source\t Target\t Weight\t Common_Token_Cnt",
      "1985\t 1987\t 0.333333\t 1"))
  }
}
