package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-category modules under `graft.queries`;
  * each module pairs Spark implementations with DuckDB oracle SQL (same
  * column names — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Q.Relational.queries, Q.Relational.oracles),
      (Q.Genomic.queries, Q.Genomic.oracles),
      (Q.LlmText.queries, Q.LlmText.oracles),
      (Q.DomainIO.queries, Q.DomainIO.oracles),
      (Q.Events.queries, Q.Events.oracles),
      (Q.Multimodal.queries, Q.Multimodal.oracles),
      (Q.Web.queries, Q.Web.oracles),
      (Q.Layout.queries, Q.Layout.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → pushed filter → partial+final agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Q.Relational.queries("q01_agg_sum")(spark, "/root/testdata/sf0.001")
      .orderBy("l_returnflag", "l_linestatus")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
