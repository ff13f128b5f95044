package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage 2 — tokenization + token features + name-part tagging.
  *
  * Reference analogues:
  *  - REF_TKN TokenE features: order / isAbbr / isBeforeDot
  *    (dao/edge/TokenE.java:157-162, helper/StringHelper.java:3-12);
  *  - heuristic name-part tagging `G.initNamesPart`
  *    (dao/G.java:181-209): tokens sorted by (isAbbr asc, order desc);
  *    head = LASTNAME; of the rest min order = FIRSTNAME (only when more
  *    than one token); remaining: order > lastname.order -> SUFFIX,
  *    between first and last -> MIDDLENAME, else PREFIX.
  *
  * Spark-first shape: a single hash partition by mention (one shuffle),
  * all tagging via window functions inside that partition — embarrassingly
  * parallel, whole-stage codegen, no joins.
  */
object Tokenize {

  /** tokens(mention_id, name, weight, pos, token, is_abbr, is_before_dot,
    * name_part). Dots are only token-trailing in this corpus, so
    * `is_before_dot` = raw token ends with '.' (equivalent to the
    * reference's separator-scan for this shape). */
  def tokens(mentions: DataFrame): DataFrame = {
    val byMention = Window.partitionBy(col("mention_id"))
    val abbrOrder = Window.partitionBy(col("mention_id"))
      .orderBy(col("is_abbr").asc, col("pos").desc)

    mentions
      .select(col("mention_id"), col("name"), col("weight"),
        posexplode(split(col("name"), " ")).as(Seq("pos", "raw_tok")))
      .withColumn("token", rtrim(col("raw_tok"), "."))
      .withColumn("is_before_dot", col("raw_tok").endsWith("."))
      .withColumn("is_abbr", length(col("token")) === 1)
      .withColumn("abbr_rank", row_number().over(abbrOrder))
      .withColumn("last_pos",
        max(when(col("abbr_rank") === 1, col("pos"))).over(byMention))
      .withColumn("first_pos",
        min(when(col("abbr_rank") > 1, col("pos"))).over(byMention))
      .withColumn("name_part",
        when(col("pos") === col("last_pos"), "LASTNAME")
          .when(col("pos") === col("first_pos"), "FIRSTNAME")
          .when(col("pos") > col("last_pos"), "SUFFIX")
          .when(col("pos") > col("first_pos") && col("pos") < col("last_pos"), "MIDDLENAME")
          .otherwise("PREFIX"))
      .select(col("mention_id"), col("name"), col("weight"),
        col("pos").cast("int").as("pos"), col("token"),
        col("is_abbr"), col("is_before_dot"), col("name_part"))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTE `tokens`; append after Canonicalize.ctes. */
  val ctes: String =
    """tok_raw AS (
      |  SELECT mention_id, name, weight,
      |         (generate_subscripts(string_split(name, ' '), 1) - 1)::INT AS pos,
      |         unnest(string_split(name, ' ')) AS raw_tok
      |  FROM mentions
      |),
      |tok_feat AS (
      |  SELECT mention_id, name, weight, pos,
      |         rtrim(raw_tok, '.') AS token,
      |         raw_tok LIKE '%.' AS is_before_dot,
      |         length(rtrim(raw_tok, '.')) = 1 AS is_abbr
      |  FROM tok_raw
      |),
      |tok_ranked AS (
      |  SELECT *,
      |         row_number() OVER (PARTITION BY mention_id
      |                            ORDER BY is_abbr ASC, pos DESC) AS abbr_rank
      |  FROM tok_feat
      |),
      |tok_bounds AS (
      |  SELECT *,
      |         max(CASE WHEN abbr_rank = 1 THEN pos END)
      |           OVER (PARTITION BY mention_id) AS last_pos,
      |         min(CASE WHEN abbr_rank > 1 THEN pos END)
      |           OVER (PARTITION BY mention_id) AS first_pos
      |  FROM tok_ranked
      |),
      |tokens AS (
      |  SELECT mention_id, name, weight, pos, token, is_abbr, is_before_dot,
      |         CASE
      |           WHEN pos = last_pos THEN 'LASTNAME'
      |           WHEN pos = first_pos THEN 'FIRSTNAME'
      |           WHEN pos > last_pos THEN 'SUFFIX'
      |           WHEN pos > first_pos AND pos < last_pos THEN 'MIDDLENAME'
      |           ELSE 'PREFIX'
      |         END AS name_part
      |  FROM tok_bounds
      |)""".stripMargin
}
