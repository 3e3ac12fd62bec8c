package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive._
import org.apache.spark.sql.execution.exchange._

/** Plan-walk helpers over the FINAL (post-AQE) physical plan.
  *
  * r15 finding: in Spark 4, `AdaptiveSparkPlanExec.inputPlan` is
  * captured BEFORE EnsureRequirements, so it contains no exchanges at
  * all — an assertion matching `ShuffleExchangeExec` against it is
  * VACUOUS (it passes on any plan; the r10–r14 "zero index-side
  * exchanges" specs did exactly that). These helpers execute the
  * frame first so AQE finalizes its stages, then walk the adaptive
  * tree through query stages and reused exchanges.
  */
object PlanChecks {

  /** Execute `df` and return every node of the final adaptive plan,
    * descending into query stages and reused exchanges.
    */
  def finalPlanNodes(df: DataFrame): Seq[SparkPlan] = {
    df.queryExecution.toRdd.count() // materialize: AQE finalizes stages
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    })).flatMap(walk)
    walk(df.queryExecution.executedPlan)
  }

  /** Names of `prefix`-tables whose scan output is reshuffled
    * DIRECTLY: reachable from a shuffle exchange through
    * row-preserving operators only (project/filter/sort/codegen
    * glue). A scan below an exchange but behind an aggregate or join
    * is NOT counted — the rows crossing that exchange are the bounded
    * aggregate/join output, not raw index rows. This is the
    * mechanical form of the "index side adds zero exchanges"
    * contract: a regression that repartitions an index table or
    * replaces a broadcast/bucketed probe with a shuffled join of the
    * index rows shows up here; bounded post-aggregate shuffles do
    * not.
    */
  def directlyShuffledScans(df: DataFrame, prefix: String): Seq[String] = {
    def direct(p: SparkPlan): Seq[String] = p match {
      case s: FileSourceScanExec =>
        s.tableIdentifier.map(_.table).filter(_.startsWith(prefix)).toSeq
      case _: ProjectExec | _: FilterExec | _: SortExec |
           _: WholeStageCodegenExec | _: InputAdapter |
           _: ColumnarToRowExec =>
        p.children.flatMap(direct)
      case q: QueryStageExec => direct(q.plan)
      case r: ReusedExchangeExec => direct(r.child)
      case _ => Seq.empty
    }
    finalPlanNodes(df).collect {
      case e: ShuffleExchangeLike => direct(e.child)
    }.flatten
  }
}
