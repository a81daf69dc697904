package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the LLM-pipeline operators
  * composed the way a production corpus pass runs them, cheapest first:
  *
  *   1. quality gate (narrow, drops junk before anything shuffles)
  *   2. language filter (narrow)
  *   3. exact dedup — one groupBy on the md5 fingerprint
  *   4. near-dup removal — MinHash LSH pairs among the survivors,
  *      resolved to clusters by [[Dedup.connectedComponents]]; each
  *      cluster keeps ONLY its minimum id. Cluster-keeper semantics
  *      beat naive pair-drop: in a component {1,2,3} with edges
  *      (1,3),(2,3), pair-drop would keep both 1 and 2 even though
  *      they are transitive near-dups of each other through 3
  *
  * Order matters at 100 TB: the narrow filters typically remove a large
  * fraction of the corpus before the two shuffling stages, and the LSH
  * stage only ever joins band-collision candidates.
  */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.3,
             langs: Seq[String] = Seq("en"),
             nearDupThreshold: Double = 0.5): DataFrame = {
    val gated = docs
      .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .filter(TextFunctions.langId(col(textCol)).isin(langs: _*))

    // exact dedup: keep the minimum id per normalized-text fingerprint
    val keeper = gated
      .groupBy(TextFunctions.fingerprint(col(textCol)).as("_fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exactDeduped = gated.join(keeper, idCol)

    // near-dup removal: cluster the verified LSH pairs, keep each
    // cluster's minimum id (docs absent from any pair keep themselves)
    val cc = Dedup.connectedComponents(
      Dedup.minhashLshPairs(exactDeduped, idCol, textCol,
        threshold = nearDupThreshold))
    val dropIds = cc.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    exactDeduped.join(dropIds, Seq(idCol), "left_anti")
  }
}
