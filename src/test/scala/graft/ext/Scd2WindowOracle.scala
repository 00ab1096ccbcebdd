package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The retired per-key lag/lead window formulation of the SCD-2 history
  * build, kept ONLY as the suite's independent oracle for
  * `Warehouse.scd2History` / `scd2HistoryBig` (which since round 13 are
  * one boundary-stitch implementation — comparing them to each other
  * would be tautological). Test-tree only: on test-sized inputs the
  * per-key window's hot-key straggler cannot bite, and the formulation
  * is the most literal transcription of SCD-2 semantics, which is what
  * an oracle should be.
  */
object Scd2WindowOracle {
  def apply(changes: DataFrame, keyCol: String, versionCol: String,
            attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "needs at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(versionCol)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    // first version always opens the initial interval, detected off the
    // version lag (an all-null-attr first version would otherwise make
    // every null<=>null true and drop the key's opening interval)
    val isFirst = lag(col(versionCol), 1).over(w).isNull
    changes
      .withColumn("__chg", isFirst || changed)
      .filter(col("__chg"))
      .drop("__chg")
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
