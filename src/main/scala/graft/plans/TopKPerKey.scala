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
      // All comparisons use java.lang.Double.compare — the TOTAL order
      // Spark's desc sort uses (NaN greatest) — so NaN rows rank exactly
      // as the window-function formulation ranks them. heap.head is the
      // WORST kept row (smallest value; among equals, largest tie).
      implicit val worstFirst: Ordering[((Double, Long), UnsafeRow)] =
        new Ordering[((Double, Long), UnsafeRow)] {
          override def compare(x: ((Double, Long), UnsafeRow),
              y: ((Double, Long), UnsafeRow)): Int = {
            val c = java.lang.Double.compare(y._1._1, x._1._1)
            if (c != 0) c else java.lang.Long.compare(x._1._2, y._1._2)
          }
        }
      def beats(v: (Double, Long), worst: (Double, Long)): Boolean = {
        val c = java.lang.Double.compare(v._1, worst._1)
        c > 0 || (c == 0 && v._2 < worst._2)
      }
      val heaps =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[((Double, Long), UnsafeRow)]]
      iter.foreach { row =>
        val key = keyProj(row) // reused projection row; copy only on miss
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[((Double, Long), UnsafeRow)]
            heaps.put(key.copy(), h)
            h
        }
        val v = valueOrd(row)
        if (heap.size < k) heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        else if (beats(v, heap.head._1)) {
          heap.dequeue()
          heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.toSeq.sortWith((a, b) => beats(a._1, b._1)).map(_._2)
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
    * `tieCol` ASC; orderCol must be a NON-NULL double and tieCol a
    * NON-NULL long — getDouble/getLong on a null cell is undefined, so
    * callers with nullable columns must filter or coalesce first; the
    * window-form equivalent would sort those rows last anyway).
    * Registers the strategy on first use. */
  def topKPerKey(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty — an empty grouping would reach " +
        "ClusteredDistribution(Nil) and fail with an opaque planner assert")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val plan = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute =
      plan.output.filter(a => resolver(a.name, n)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(s"no column $n")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.mkString(", ")}")
      }
    val o = attr(orderCol); val t = attr(tieCol)
    require(o.dataType == org.apache.spark.sql.types.DoubleType,
      s"orderCol must be DOUBLE, got ${o.dataType.sql} — cast first " +
        "(getDouble on other types would silently reinterpret bits)")
    require(t.dataType == org.apache.spark.sql.types.LongType,
      s"tieCol must be BIGINT, got ${t.dataType.sql}")
    GraftSqlBridge.ofRows(spark,
      TopKPerKey(groupCols.map(attr), o, t, k, plan))
  }
}
