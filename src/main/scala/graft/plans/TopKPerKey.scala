package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.GraftSqlBridge

/** Whole-operator extension-point worked example (preference ladder (c),
  * SURVEY §7.3): per-key top-k as a first-class operator —
  * LogicalPlan node → Strategy → physical exec — instead of the
  * window-function form
  * `row_number().over(partitionBy(key).orderBy(v.desc)) <= k`.
  *
  * Why a custom operator earns its keep here: WindowExec must SORT every
  * key group in full before numbering rows, so the per-partition cost is
  * O(n log n) in GROUP size and the whole group must fit (or spill). This
  * exec keeps one bounded k-heap per key — O(n log k), memory O(keys·k) —
  * the right shape when k ≪ group size (top-3 orders per customer over
  * 100 TB). Correctness needs rows of a key co-located, declared via
  * requiredChildDistribution (Catalyst inserts the shuffle).
  */
case class TopKPerKey(
    groupCols: Seq[Attribute],
    orderCol: Attribute,
    tieCol: Attribute,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(
    groupCols: Seq[Attribute],
    orderCol: Attribute,
    tieCol: Attribute,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupCols, schema)
      val valueOrd = {
        val oi = schema.indexWhere(_.exprId == orderCol.exprId)
        val ti = schema.indexWhere(_.exprId == tieCol.exprId)
        (r: InternalRow) => (r.getDouble(oi), r.getLong(ti))
      }
      // max-heap on (−value, tie): poll() removes the WORST kept row, so
      // the heap always holds the k best (highest value, lowest tie).
      implicit val ord: Ordering[((Double, Long), UnsafeRow)] =
        Ordering.by { case ((v, t), _) => (-v, t) }
      val heaps =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[((Double, Long), UnsafeRow)]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[((Double, Long), UnsafeRow)])
        val v = valueOrd(row)
        if (heap.size < k) heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        else {
          val worst = heap.head._1
          // keep if better: higher value, or equal value with lower tie
          if (v._1 > worst._1 || (v._1 == worst._1 && v._2 < worst._2)) {
            heap.dequeue()
            heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.toSeq.sortBy { case ((v, t), _) => (-v, t) }.map(_._2)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(g, o, t, k, child) =>
      TopKPerKeyExec(g, o, t, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Public API: top-k rows per key by `orderCol` DESC (ties broken by
    * `tieCol` ASC; orderCol must be double, tieCol long). Registers the
    * strategy on first use. */
  def topKPerKey(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output
      .find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    GraftSqlBridge.ofRows(spark,
      TopKPerKey(groupCols.map(attr), attr(orderCol), attr(tieCol), k, plan))
  }
}
