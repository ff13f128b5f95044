package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator of the rebuilt pipeline
  * (SURVEY.md §2 inventory); [[oracleSql]] carries the equivalent DuckDB SQL
  * (the driver registers each parquet table in sfDir and compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full pipeline: synthesize transcripts -> canonicalize -> tokenize
    * -> block -> CC -> greedy consistency clustering. */
  def entry(spark: SparkSession): DataFrame =
    Queries.registry("q_greedy_assignments")._1(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (k, (_, Some(sql))) => k -> sql }
}
