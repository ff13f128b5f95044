package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared scale valves for the training-data operators. */
object Valves {

  /** Hot-group cap: drop every row belonging to a group (by `keys`) with
    * more than `cap` members. A group of m rows feeds m^2 work into a
    * self-join, so this bounds the quadratic step of any bucketed
    * similarity index; None = exact semantics.
    *
    * Implemented as groupBy + semi-join back, NOT a count-over-Window: a
    * WindowExec would sort and buffer each key group in full — paying an
    * external sort on exactly the 10^8-row boilerplate bucket this valve
    * exists to bound — whereas the aggregate's map-side partial counting
    * makes the hot key cheap, and the join back is a plain hash join on
    * the (already shuffled) group key. */
  def capGroups(df: DataFrame, keys: Seq[String], cap: Option[Int]): DataFrame =
    cap match {
      case None => df
      case Some(c) =>
        val small = df.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("__grp_sz"))
          .filter(col("__grp_sz") <= c)
          .select(keys.map(col): _*)
        df.join(small, keys, "left_semi")
    }
}
