package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 6 — evaluation.
  *
  * E-1: weighted pairwise precision/recall/F1, the reference's
  * PairwiseFMeasure (evaluation/collective/PairwiseFMeasure.java:60-79),
  * reproduced with its exact arithmetic (tp counts unordered pairs n(n-1)/2
  * while fp/fn accumulate ordered cross pairs — faithful to the published
  * numbers, which is the acceptance gate).
  *
  * Inputs: assignments(mention_id, name, cluster_id), gold(name, entity_id,
  * cnt) — cnt is the RID_REF edge weight (# mention occurrences of that
  * name under that gold id).
  */
object Evaluation {

  def pairwiseF1(assignments: DataFrame, gold: DataFrame): DataFrame = {
    val contingency = assignments.join(gold, "name")
      .groupBy(col("cluster_id"), col("entity_id"))
      .agg(sum(col("cnt")).as("n"))
    val entityTotals = gold.groupBy(col("entity_id")).agg(sum(col("cnt")).as("n_entity"))
    val clusterTotals = contingency.groupBy(col("cluster_id")).agg(sum(col("n")).as("n_cluster"))
    contingency
      .join(entityTotals, "entity_id")
      .join(clusterTotals, "cluster_id")
      .agg(
        sum(col("n") * (col("n") - 1) / 2).as("tp"),
        sum(col("n") * (col("n_entity") - col("n"))).as("fn"),
        sum(col("n") * (col("n_cluster") - col("n"))).as("fp"))
      .select(
        col("tp").cast("double").as("tp"),
        col("fp").cast("double").as("fp"),
        col("fn").cast("double").as("fn"),
        round(col("tp") / (col("tp") + col("fp")), 6).as("precision"),
        round(col("tp") / (col("tp") + col("fn")), 6).as("recall"),
        round(lit(2) * (col("tp") / (col("tp") + col("fp"))) * (col("tp") / (col("tp") + col("fn")))
          / (col("tp") / (col("tp") + col("fp")) + col("tp") / (col("tp") + col("fn"))), 6).as("f1"))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTE producing the same single-row measure from `assignments`
    * and `gold_mentions`. Append after ConnectedComponents.ctes +
    * Synth.goldMentionsCte. */
  val ctes: String =
    """eval_contingency AS (
      |  SELECT a.cluster_id, g.entity_id, sum(g.cnt) AS n
      |  FROM assignments a JOIN gold_mentions g USING (name)
      |  GROUP BY 1, 2
      |),
      |eval_entity AS (
      |  SELECT entity_id, sum(cnt) AS n_entity FROM gold_mentions GROUP BY 1
      |),
      |eval_cluster AS (
      |  SELECT cluster_id, sum(n) AS n_cluster FROM eval_contingency GROUP BY 1
      |),
      |eval_sums AS (
      |  SELECT sum(n * (n - 1) / 2) AS tp,
      |         sum(n * (n_entity - n)) AS fn,
      |         sum(n * (n_cluster - n)) AS fp
      |  FROM eval_contingency c
      |  JOIN eval_entity e USING (entity_id)
      |  JOIN eval_cluster k USING (cluster_id)
      |),
      |pairwise_eval AS (
      |  SELECT tp::DOUBLE AS tp, fp::DOUBLE AS fp, fn::DOUBLE AS fn,
      |         round(tp / (tp + fp), 6) AS precision,
      |         round(tp / (tp + fn), 6) AS recall,
      |         round(2 * (tp / (tp + fp)) * (tp / (tp + fn))
      |               / ((tp / (tp + fp)) + (tp / (tp + fn))), 6) AS f1
      |  FROM eval_sums
      |)""".stripMargin
}
