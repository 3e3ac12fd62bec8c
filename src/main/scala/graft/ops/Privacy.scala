package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-governance audits for a corpus release, next to PII
  * scrubbing and pseudonymization: k-anonymity over quasi-identifier
  * columns — a row whose QI combination is shared by fewer than k
  * rows is re-identifiable by joining any external dataset carrying
  * the same attributes (Sweeney 2002), even after direct identifiers
  * are scrubbed.
  *
  * Scale: ONE map-side-combined aggregate over one scan — group
  * cardinality is the product of QI cardinalities, metadata-sized by
  * construction (that is what makes a column a quasi-identifier).
  */
object Privacy {

  /** Per-QI-combination group sizes with the k-anonymity flag:
    * (qi…, n, at_risk) where at_risk ⇔ n < k.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "need QI columns and k >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is
    * not enough when everyone in a large QI group shares the same
    * SENSITIVE value — the group is big, yet the attribute is fully
    * disclosed (the homogeneity attack). Per QI group: size, number
    * of distinct sensitive values, and the at-risk flag
    * (distinct < l). Distinct-per-group is EXACT via the same
    * two-level aggregate as k-anonymity — group by (QI, sensitive)
    * first (map-side combined to the value dictionary), then by QI —
    * not a count(DISTINCT) Expand over the scan.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(qiCols.nonEmpty && l >= 2, "need QI columns and l >= 2")
    df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n_v"))
      .groupBy(qiCols.map(col): _*)
      .agg(sum("n_v").as("n"), count(lit(1)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** t-closeness audit (Li et al. 2007) — the third of the classic
    * privacy trio: l-diversity counts distinct sensitive values but a
    * group can be "diverse" while its sensitive DISTRIBUTION still
    * differs sharply from the corpus (99% one disease, 1% spread over
    * nine others ⇒ strong disclosure). Per QI group: the total
    * variation distance between the group's sensitive distribution
    * and the global one (the categorical Earth-Mover's distance under
    * the uniform ground metric), at_risk ⇔ tvd > t.
    *
    * Sensitive values ABSENT from a group still contribute |0 − p(v)|;
    * no QI×sensitive grid is materialized — algebraically
    * Σ_all |p_g − p| = Σ_present |p_g − p| + (1 − Σ_present p), so
    * only the observed cells (metadata-sized, one map-side-combined
    * aggregate over the scan) carry data, with margins from windows
    * over the cell frame (the chi-square trick).
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 t: Double): DataFrame = {
    require(qiCols.nonEmpty && t > 0 && t < 1, "need QI columns, t in (0,1)")
    import org.apache.spark.sql.expressions.Window
    val qi = qiCols.map(col)
    val cells = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n_v"))
      .withColumn("n_g", sum("n_v").over(
        Window.partitionBy(qi: _*)))
      .withColumn("n_vg", sum("n_v").over(
        Window.partitionBy(col(sensitiveCol))))
      .withColumn("n", sum("n_v").over(Window.partitionBy()))
    cells.groupBy(qi: _*).agg(
        first("n_g").as("n_g"),
        sum(abs(col("n_v").cast("double") / col("n_g") -
          col("n_vg").cast("double") / col("n"))).as("present_dev"),
        sum(col("n_vg").cast("double") / col("n")).as("present_mass"))
      .select((qi :+ col("n_g").as("n")) :+
        round((col("present_dev") + (lit(1.0) - col("present_mass"))) / 2.0, 6)
          .as("tvd"): _*)
      .withColumn("at_risk", col("tvd") > t)
  }

  /** The one-row release-gate summary: group counts, at-risk groups,
    * and the SHARE of rows that are re-identifiable at this k.
    */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
                        k: Long): DataFrame =
    kAnonymity(df, qiCols, k).agg(
      count(lit(1)).as("n_groups"),
      count(when(col("at_risk"), 1)).as("n_at_risk_groups"),
      sum("n").as("n_rows"),
      coalesce(sum(when(col("at_risk"), col("n"))), lit(0L)).as("n_at_risk_rows"),
      round(coalesce(sum(when(col("at_risk"), col("n"))), lit(0L))
        .cast("double") / sum("n"), 6).as("risk_share"))
}
