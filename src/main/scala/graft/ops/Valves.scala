package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared scale valves for the training-data operators. */
object Valves {

  /** Hot-group cap: drop every row belonging to a group (by `keys`) with
    * more than `cap` members. A group of m rows feeds m^2 work into a
    * self-join, so this bounds the quadratic step of any bucketed
    * similarity index; None = exact semantics. */
  def capGroups(df: DataFrame, keys: Seq[Column], cap: Option[Int]): DataFrame =
    cap match {
      case None => df
      case Some(c) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys: _*)
        df.withColumn("__grp_sz", count(lit(1)).over(w))
          .filter(col("__grp_sz") <= c).drop("__grp_sz")
    }
}
