package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan walkers shared by the metadata-only-aggregate gates
  * ([[graft.queries.StoreMetaAggQuery]]'s `require()`s) and the plan
  * specs — one definition of "does this query touch a file scan", so a
  * plan-shape change (a new AQE wrapper, a scan node variant) is handled
  * once instead of drifting across copies.
  */
object PlanScans {

  /** Every file-source scan in the executed plan, walking through AQE
    * wrappers and into subqueries.
    */
  def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** True when the plan contains no file-source scan at all — the whole
    * answer comes from metadata ([[GraftMetadataAggregate]]'s
    * LocalRelation).
    */
  def scanless(df: DataFrame): Boolean = fileScans(df).isEmpty

  /** Stricter than [[scanless]]: no file-source scan AND no v1 relation
    * scan. A [[org.apache.spark.sql.execution.RowDataSourceScanExec]]
    * (how a `PrunedFilteredScan` relation like the DV-tier
    * GraftFrameRelation plans) hides its delegate's parquet scans inside
    * an RDD lineage, so [[fileScans]] alone cannot see them — a
    * metadata-only gate over that tier must refuse ANY scan node.
    */
  def readless(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.RowDataSourceScanExec
    def walk(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case _: FileSourceScanExec => false
      case _: RowDataSourceScanExec => false
      case other => other.children.forall(walk) && other.subqueries.forall(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Every node of the FINAL (post-AQE) physical plan, descending into
    * materialized query stages but NOT into [[ReusedExchangeExec]] — a
    * reused exchange's subtree ran once, so a consumer counting "how many
    * times does operator X execute" (the DedupSpec single-explode assert)
    * must not see it twice. Call after an action so AQE has finalized.
    */
  def finalNodes(df: DataFrame): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case other =>
        other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
    })
    walk(df.queryExecution.executedPlan)
  }
}
