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
    * Implemented as groupBy + BROADCAST anti-join against the OVER-cap
    * group list — NOT a count-over-Window (a WindowExec would sort and
    * buffer each key group in full, paying an external sort on exactly
    * the 10^8-row boilerplate bucket this valve exists to bound), and —
    * round 6 — not a semi-join against the UNDER-cap list either: that
    * list is the size of the whole key space, so semi-joining it
    * re-shuffled every input row, while the over-cap list is BOUNDED BY
    * CONSTRUCTION at |input|/cap entries (each needs > cap members), so
    * it broadcasts and the valve adds no shuffle of the input at all
    * (guide §2.4; the aggregate still partial-counts map-side, keeping
    * the hot key itself cheap). */
  def capGroups(df: DataFrame, keys: Seq[String], cap: Option[Int]): DataFrame =
    cap match {
      case None => df
      case Some(c) =>
        val big = df.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("__grp_sz"))
          .filter(col("__grp_sz") > c)
          .select(keys.map(col): _*)
        df.join(broadcast(big), keys, "left_anti")
    }
}
