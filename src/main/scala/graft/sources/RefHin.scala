package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._

/** Interop with the reference's file formats, so a user of the reference
  * can point this library at their existing data.
  *
  * Input: the reference consumes a HIN as two header-ed TSV adjacency
  * files (helper/IO.java:19-29 splits on tab; dao/G.java:128-152 reads
  * vertices as (id, val, type, weight-or-resid) and edges as
  * (inId, outId, .., .., type, weight)). Our pipeline derives the element
  * hierarchy itself, so only the REFERENCE-type vertices are needed: they
  * become the `mentions` table and Tokenize/Blocking/Clustering run
  * unchanged — the TKN/SIM/NCK/ABR element vertices and edges of the file
  * are recomputed, not trusted.
  *
  * Output: writeSimGraph mirrors the reference's similarity-graph sink
  * (helper/IO.java:32-56; out/vertices.tsv, out/edges.tsv): tab+space
  * separated with the exact headers `Id\t Label\t Weight\t Res_Id` and
  * `Source\t Target\t Weight\t Common_Token_Cnt`, edge weights %.6f.
  *
  * Scale: reads are plain distributed text scans with column pruning;
  * writes are per-partition (pass coalesce=1 only when a single file is
  * required, as the reference produces).
  */
object RefHin {

  /** All vertices of a reference HIN vertex TSV: (id, val, type, weight). */
  def vertices(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .csv(path)
      .toDF("id", "val", "type", "weight")
      .select(trim(col("id")).cast("long").as("id"),
        trim(col("val")).as("val"),
        trim(col("type")).as("type"),
        trim(col("weight")).cast("long").as("weight"))

  /** REFERENCE-type vertices as this library's `mentions` table
    * (mention_id, name, weight) — V.Type.isReference, dao/vertex/V.java:22. */
  def mentions(spark: SparkSession, vertexPath: String): DataFrame =
    vertices(spark, vertexPath)
      .filter(col("type") === "REF")
      .select(col("id").as("mention_id"), col("val").as("name"), col("weight"))

  /** Write the reference-format similarity graph next to each other:
    * `<dir>/vertices` and `<dir>/edges` (directories of part files;
    * coalesce = Some(1) reproduces the reference's single-file layout). */
  def writeSimGraph(vertices: DataFrame, edges: DataFrame, dir: String,
      coalesce: Option[Int] = None): Unit = {
    def shaped(df: DataFrame) = coalesce.fold(df)(df.coalesce)
    // reference writer joins fields with "\t " (note the space) including
    // in the header; reproduce by prefixing every non-first field/name
    shaped(vertices
      .select(col("id").cast("string").as("Id"),
        concat(lit(" "), col("label")).as(" Label"),
        concat(lit(" "), col("weight").cast("string")).as(" Weight"),
        concat(lit(" "), col("res_id").cast("string")).as(" Res_Id")))
      .write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false").option("ignoreTrailingWhiteSpace", "false")
      .option("lineSep", "\r\n") // IO.java's PrintWriter.println on Windows: CRLF rows
      .csv(s"$dir/vertices")
    shaped(edges
      .select(col("source").cast("string").as("Source"),
        concat(lit(" "), col("target").cast("string")).as(" Target"),
        concat(lit(" "), format_string("%.6f", col("weight"))).as(" Weight"),
        concat(lit(" "), col("common_token_cnt").cast("string"))
          .as(" Common_Token_Cnt")))
      .write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false").option("ignoreTrailingWhiteSpace", "false")
      .option("lineSep", "\r\n") // IO.java's PrintWriter.println on Windows: CRLF rows
      .csv(s"$dir/edges")
  }
}
