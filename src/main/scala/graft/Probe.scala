package graft

import org.apache.spark.sql.SparkSession

/** Scratch perf probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val sf = args(1)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // Construction included in the timing (matches Bench): iterative
    // operators do eager checkpoint work while building the plan.
    t(s"$name r1")(SparkEntry.queries(name)(spark, sf).count())
    t(s"$name r2")(SparkEntry.queries(name)(spark, sf).count())
    if (args.length > 2 && args(2) == "explain")
      SparkEntry.queries(name)(spark, sf).explain("formatted")
    spark.stop()
  }
}
