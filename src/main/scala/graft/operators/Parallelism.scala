package graft.operators

import org.apache.spark.sql.DataFrame

/** The shared gate for the "one small file = one task" repartition every
  * typed per-row pass here used to pay UNCONDITIONALLY: repartition to
  * session parallelism only when the input is scan-shaped AND arrives
  * with fewer partitions. A derived input (join/agg/window output)
  * already carries shuffle.partitions-sized partitioning — and probing
  * it with `df.rdd` under AQE would EXECUTE its upstream stages just to
  * count partitions, running the lineage twice. At 100 TB the skipped
  * exchange on an already-parallel table is the whole point.
  */
private[operators] object Parallelism {

  def ensure(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.{logical => lp}
    // a streaming frame cannot be probed with df.rdd (and its
    // micro-batch partitioning is the source's concern): pass through
    if (df.isStreaming) return df
    val derived = df.queryExecution.optimizedPlan.find {
      case _: lp.Join | _: lp.Aggregate | _: lp.Window | _: lp.Sort |
           _: lp.RepartitionByExpression => true
      // coalesce = Repartition(shuffle=false): NARROWS partitions, so it
      // is exactly the under-parallel case the probe must still catch
      case r: lp.Repartition if r.shuffle => true
      case _ => false
    }.isDefined
    if (derived) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
  }
}
