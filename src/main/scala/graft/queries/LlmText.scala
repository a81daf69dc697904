package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Corpus, Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over documents/embeddings:
  * dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
  * search (brute-force + LSH-bucketed ANN), and text analysis (lang-ID,
  * quality scoring, token stats, fingerprints).
  *
  * Every oracle below is GENERATED from the same constants (shingle n,
  * hash counts, marker words, score weights) the Scala operators use —
  * one source of truth, two engines.
  */
object LlmText {

  // ---- shared DuckDB fragments (twin of TextFunctions) ----
  private val toksSql =
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')"

  private def shinglesSql(n: Int): String =
    s"list_distinct(list_transform(generate_series(1, len(toks)-${n - 1}), " +
      s"i -> array_to_string(toks[i:i+${n - 1}], ' ')))"

  private val fpSql = "md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))"

  private val NumHashes = 12
  private val Bands = 4
  private val ShingleN = 3
  private val MaxShingleDf = 10

  // hash function j = 8-hex-char window of the per-shingle md5 at 1+2j
  // (must mirror TextFunctions.minhashFromHashes exactly).
  private def mhSql(j: Int): String =
    s"list_min(list_transform(hs, h -> substr(h, ${1 + 2 * j}, 8)))"

  private def simhashBitSql(b: Int): String = {
    val nib = b / 4 + 1
    val shift = 1 << (b % 4)
    val ch = s"ascii(substr(h, $nib, 1))"
    val nibVal = s"CASE WHEN $ch <= 57 THEN $ch - 48 ELSE $ch - 87 END"
    val bit = s"CAST(floor(($nibVal) / $shift) AS INTEGER) % 2"
    s"CASE WHEN CAST(list_sum(list_transform(hs, " +
      s"h -> CASE WHEN ($bit) = 1 THEN 1 ELSE -1 END)) AS INTEGER) > 0 " +
      "THEN '1' ELSE '0' END"
  }

  private val simhashSql: String =
    "concat(" + (0 until 16).map(simhashBitSql).mkString(", ") + ")"

  private def langScoreSql(ws: Seq[String]): String =
    ws.map(w => s"len(list_filter(toks, t -> t = '$w'))").mkString(" + ")

  private val langCaseSql: String = {
    val scores = TextFunctions.LangMarkers.map { case (l, ws) => (l, s"(${langScoreSql(ws)})") }
    val branches = scores.init.zipWithIndex.map { case ((lang, s), i) =>
      val later = scores.drop(i + 1).map(_._2)
      s"WHEN ${later.map(o => s"$s >= $o").mkString(" AND ")} THEN '$lang'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  private val stopSql = Seq("the", "a", "and", "of", "to", "in", "is")
    .map(w => s"len(list_filter(toks, t -> t = '$w'))").mkString(" + ")

  private val cosSql =
    "round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 4)"

  // Twin of TextFunctions.qualityScore (expects relations binding
  // `text` and `toks`).
  private val qualitySql =
    s"""round(least(len(toks) / 100.0, 1.0) * 0.5 +
             (($stopSql) * 1.0 / greatest(len(toks) * 1.0, 1.0)) * 0.3 +
             (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 /
              greatest(length(text), 1)) * 0.2, 4)"""

  /** PQ training replayed in SQL (twin of Similarity.pqTrainCodebooks
    * at m=8, ksub=16, iters=1): per subspace s the chain is seeds
    * `cs0_s` (lowest-id sub-slices) → assignment `as0_s` (squared-L2
    * via the dot identity, rounded 4 dp, ties to smaller cid) → mean
    * update `u1_s`/`cs1_s` (6 dp) → final assignment `af_s`. Shared by
    * q92 (codes), q93 (ADC scoring), and q82's pq_adc recall row; the
    * chain assumes a CTE `v(vec_id, e DOUBLE[])` is already in scope.
    */
  private val pqM = 8
  private val pqKsub = 16
  private val pqDsub = 8

  /** q97 target mixture — one constant drives both engines. */
  private val MixWeights = Seq(
    ("en", 0.5), ("de", 0.15), ("es", 0.15), ("fr", 0.1), ("zh", 0.1))

  /** Replays Similarity.kmeansAssign in DuckDB SQL — shared by q69,
    * q108 (SemDeDup) and q114 (sampled seeding). Emits the CTE chain
    * `v, c0, a0/u1/c1, ..., af` (af = final assignment: vec_id,
    * cluster, e). Default seeds are the k LOWEST-id vectors (ORDER
    * BY/LIMIT — the engine's rule, robust to non-contiguous ids);
    * `sampled = true` replays the deterministic k-means‖-style seeding
    * instead (md5-hash sample of max(4k,32) → farthest-point refine,
    * Similarity.sampledSeeds). Centroid means round to 6 dp, assignment
    * is argmax of the 4 dp-rounded cosine with ties to the smaller cid.
    */
  private def kmeansSqlCtes(k: Int, iters: Int, embDim: Int = 64,
                            sampled: Boolean = false): String = {
    def assignCte(name: String, centRel: String): String =
      s"""$name AS (SELECT vec_id, cid AS cluster, e FROM (
            SELECT v.vec_id, c.cid, v.e,
              row_number() OVER (PARTITION BY v.vec_id ORDER BY
                round(list_dot_product(v.e, c.ce) / (v.nrm * c.cnrm), 4) DESC,
                c.cid) AS rn
            FROM v CROSS JOIN $centRel c) WHERE rn = 1)"""
    // seed relation: lowest-id (default) or hash-sample + farthest-point
    val seedCtes =
      if (!sampled)
        s"""c0 AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm
               FROM (SELECT * FROM v ORDER BY vec_id LIMIT $k))"""
      else {
        val pool = math.max(4 * k, 32)
        // MATERIALIZED: each seeds CTE is referenced three times by the
        // next refine stage — inlined, the k-stage chain re-evaluates
        // the base 3^k times (DuckDB inlines single-reference CTEs and
        // may inline multi-reference ones); materializing keeps the
        // oracle linear in k
        val refine = (1 until k).map { i =>
          s"""p$i AS MATERIALIZED (SELECT c.vec_id,
                  max(round(list_dot_product(c.e, s.e) / (c.nrm * s.nrm), 4)) AS dmax
                FROM cand c, seeds${i - 1} s
                WHERE c.vec_id NOT IN (SELECT vec_id FROM seeds${i - 1})
                GROUP BY c.vec_id),
              pick$i AS MATERIALIZED (SELECT vec_id FROM p$i ORDER BY dmax, vec_id LIMIT 1),
              seeds$i AS MATERIALIZED (SELECT * FROM seeds${i - 1} UNION ALL
                SELECT c.vec_id, c.e, c.nrm FROM cand c JOIN pick$i USING (vec_id))"""
        }.mkString(",\n")
        s"""cand AS MATERIALIZED (SELECT vec_id, e, nrm, md5(CAST(vec_id AS VARCHAR)) AS h
               FROM v WHERE nrm <> 0
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $pool),
            seeds0 AS MATERIALIZED (SELECT vec_id, e, nrm FROM cand ORDER BY h, vec_id LIMIT 1),
            $refine,
            c0 AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM seeds${k - 1})"""
      }
    val iterCtes = (0 until iters).map { i =>
      assignCte(s"a$i", s"c$i") + ",\n" +
        s"""u${i + 1} AS (SELECT cluster, CAST(t.i AS INTEGER) AS dim,
              round(avg(e[CAST(t.i AS INTEGER)]), 6) AS m
            FROM a$i CROSS JOIN range(1, ${embDim + 1}) t(i) GROUP BY 1, 2),
            c${i + 1} AS (SELECT cid, ce,
                sqrt(list_dot_product(ce, ce)) AS cnrm
              FROM (SELECT cluster AS cid, list(m ORDER BY dim) AS ce
                    FROM u${i + 1} GROUP BY 1))"""
    }.mkString(",\n")
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
           FROM embeddings),
        $seedCtes,
        $iterCtes,
        ${assignCte("af", s"c$iters")}"""
  }

  /** Shared by q68 (window-sort implementation) and q104 (bounded-
    * buffer aggregator implementation) — one oracle, two engines, two
    * execution strategies.
    */
  private val tfidfTop3Sql =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        sc AS (SELECT tf.doc_id, tf.term, tf.tf,
                 round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 4) AS tfidf
               FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd)
        SELECT doc_id, term, tf, tfidf, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS rn FROM sc)
        WHERE rn <= 3"""
  private val pqChain: String = {
    val subCols = (0 until pqM).map { s =>
      val lo = s * pqDsub + 1
      val hi = (s + 1) * pqDsub
      s"e[$lo:$hi] AS sub$s, list_dot_product(e[$lo:$hi], e[$lo:$hi]) AS nv$s"
    }.mkString(", ")
    val perS = (0 until pqM).map { s =>
      def assignSql(name: String, centRel: String, keep: String) =
        s"""$name AS (SELECT vec_id, cid$keep FROM (
              SELECT b.vec_id, c.cid, b.sub$s, b.nv$s,
                row_number() OVER (PARTITION BY b.vec_id ORDER BY
                  round(b.nv$s + c.nc - 2 * list_dot_product(b.sub$s, c.ce), 4),
                  c.cid) AS rn
              FROM b CROSS JOIN $centRel c) WHERE rn = 1)"""
      s"""cs0_$s AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                sub$s AS ce, nv$s AS nc
              FROM (SELECT * FROM b ORDER BY vec_id LIMIT $pqKsub)),
          ${assignSql(s"as0_$s", s"cs0_$s", s", sub$s, nv$s")},
          u1_$s AS (SELECT cid AS cluster, CAST(t.i AS INTEGER) AS dim,
                round(avg(sub$s[CAST(t.i AS INTEGER)]), 6) AS mv
              FROM as0_$s CROSS JOIN range(1, ${pqDsub + 1}) t(i) GROUP BY 1, 2),
          cs1_$s AS (SELECT cid, ce, list_dot_product(ce, ce) AS nc FROM (
              SELECT cluster AS cid, list(mv ORDER BY dim) AS ce
              FROM u1_$s GROUP BY 1)),
          ${assignSql(s"af_$s", s"cs1_$s", "")}"""
    }.mkString(",\n")
    // cosine-metric PQ: L2-normalize before slicing (twin of pqBase);
    // needs v(vec_id, e DOUBLE[]) in scope
    s"""vn0 AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS vnrm FROM v),
        vn AS (SELECT vec_id,
            CASE WHEN vnrm = 0 THEN e
                 ELSE list_transform(e, x -> x / vnrm) END AS e
          FROM vn0),
        b AS (SELECT vec_id, $subCols FROM vn),
        $perS"""
  }

  /** ADC pair scoring + top-3 over the trained chain (needs `b` and the
    * per-subspace `af_s`/`cs1_s` CTEs of [[pqChain]] in scope). Term
    * order mirrors the engine's left-to-right subspace sum.
    */
  private val pqAdcTop3: String = {
    val joins = (0 until pqM).map(s =>
      s"JOIN af_$s k$s ON k$s.vec_id = c.vec_id " +
        s"JOIN cs1_$s t$s ON t$s.cid = k$s.cid").mkString(" ")
    val termSql = (0 until pqM).map(s =>
      s"(q.nv$s + t$s.nc - 2 * list_dot_product(q.sub$s, t$s.ce))")
      .mkString(" + ")
    s"""adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            round($termSql, 4) AS adist
          FROM b q JOIN b c ON q.vec_id != c.vec_id $joins),
        adc3 AS (SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adist, neighbor_id) AS rn FROM adc)
          WHERE rn <= 3)"""
  }

  /** The shared minhash-LSH CTE chain (ends at relation `j` holding
    * candidate pairs with intersection/total sizes) — used by q31 (pair
    * list) and q66 (connected components over the pairs).
    */
  /** Signature CTE chain (tokens → shingles → minhash → band keys) over
    * an arbitrary (doc_id, text) relation, name-prefixed so two corpora
    * can be signed in one statement (q136 signs history AND the new
    * batch). Ends at `<p>s2` (shingle sets) and `<p>bands` (band keys).
    */
  private def sigCtesFor(src: String, p: String): String = {
    val mhCols = (0 until NumHashes).map(j => s"${mhSql(j)} AS mh$j").mkString(", ")
    val rows = NumHashes / Bands
    val bandSelects = (0 until Bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(j => s"mh$j").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cols)) AS bkey FROM ${p}m"
    }.mkString(" UNION ALL ")
    s"""${p}t AS (SELECT doc_id, $toksSql AS toks FROM $src),
        ${p}s AS (SELECT doc_id, ${shinglesSql(ShingleN)} AS shs FROM ${p}t),
        ${p}s2 AS (SELECT doc_id, shs FROM ${p}s WHERE len(shs) > 0),
        ${p}hh AS (SELECT doc_id, shs, list_transform(shs, x -> md5(x)) AS hs FROM ${p}s2),
        ${p}m AS (SELECT doc_id, $mhCols FROM ${p}hh),
        ${p}bands AS ($bandSelects)"""
  }

  private val lshCtes: String =
    s"""${sigCtesFor("documents", "")},
        cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                 FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        j AS (SELECT da, db,
                len(list_filter(sa.shs, x -> list_contains(sb.shs, x))) * 1.0 AS inter,
                len(sa.shs) + len(sb.shs) AS tot
              FROM cand JOIN s2 sa ON da = sa.doc_id JOIN s2 sb ON db = sb.doc_id)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup over a corpus with planted duplicates (the corpus
    // unioned with itself): every fingerprint group has 2 copies.
    "q30_exact_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.exactDedup(docs.unionAll(docs), "doc_id", "text")
    },

    // MinHash + LSH near-dup pairs (banded candidate join + exact verify).
    "q31_minhash_lsh" -> { (s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        shingleN = ShingleN, numHashes = NumHashes, bands = Bands, threshold = 0.5)
    },

    // SimHash near-dup pairs within Hamming radius 2 (q170): the
    // Manku block-index recipe over q34's signature — 4-bit blocks,
    // pigeonhole candidate join, exact 16-bit Hamming verify. q34
    // only finds exact signature collisions; this is the radius
    // search real simhash dedup runs.
    "q170_simhash_pairs" -> { (s, d) =>
      Dedup.simhashNearDupPairs(Tables.documents(s, d), "doc_id", "text",
        radius = 2)
    },

    // LSH pair recall (q157): the tuning number for bands/hashes — of
    // all TRUE near-dup pairs (exact all-pairs Jaccard ≥ 0.5, a labeled
    // O(n²) exactness baseline), what fraction did the band join
    // surface? found ⊆ exact by construction, so the ratio IS recall.
    "q157_lsh_pair_recall" -> { (s, d) =>
      Dedup.lshPairRecall(Tables.documents(s, d), "doc_id", "text",
        shingleN = ShingleN, numHashes = NumHashes, bands = Bands,
        threshold = 0.5)
    },

    // Token statistics (whitespace + BPE-ish estimate).
    "q32_token_stats" -> { (s, d) =>
      val toks = TextFunctions.tokens(col("text"))
      Tables.documents(s, d)
        .filter(TextFunctions.tokenCount(col("text")) > 0)
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_uniq"),
          round(aggregate(toks, lit(0), (a, t) => a + length(t)).cast("double") /
            size(toks), 4).as("avg_tok_len"),
          ceil(length(col("text")) / 4.0).cast("int").as("bpe_est"))
    },

    // Document fingerprints: whole-doc md5 + min-sampled 8-gram sketch.
    "q33_fingerprint" -> { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.minShingleFingerprint(col("text")).as("min_fp"))
    },

    // SimHash buckets with >1 member = near-dup clusters.
    "q34_simhash" -> { (s, d) =>
      Dedup.simhashBuckets(Tables.documents(s, d), "doc_id", "text")
    },

    // Exact n-gram Jaccard pairs (shingle-share equi-join, no LSH).
    // maxDf=10 drops corpus-common (non-discriminative) shingles before
    // the self-join: 2.8× fewer overlap rows at sf0.1 with an IDENTICAL
    // pair set (measured: 256 pairs with and without the cap), and the
    // bound is what keeps a reducer alive at 100× (output ≤ df² per
    // shingle). The oracle applies the same cap — Jaccard is defined
    // over the capped shingle sets in both engines.
    "q35_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        shingleN = ShingleN, threshold = 0.3, maxDf = MaxShingleDf)
    },

    // Brute-force cosine top-3 for a bounded query set (exact baseline).
    "q36_cosine_topk" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.bruteForceTopK(e.filter(col("id") < 50), e, 3)
    },

    // LSH-bucketed approximate top-3 (the scale path).
    "q37_ann_bucket" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.bucketedAnnTopK(e, 3, bits = 4)
    },

    // Embedding-cosine near-dup pairs: the dedup-family member of the
    // similarity stack (sign-bucket candidates + cosine threshold).
    "q63_embed_neardup" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.embeddingNearDupPairs(e, threshold = 0.4, bits = 4)
    },

    // IVF-style ANN: deterministic coarse quantizer (lowest-id vectors as
    // centroids), broadcast assignment, cell-equi-join probe.
    "q64_ivf_ann" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.ivfTopK(e, 3, nCells = 8)
    },

    // Near-dup CLUSTERS: connected components (iterative min-label
    // propagation) over the LSH pair graph — pair list → per-doc
    // canonical-keeper assignment, the step before rows can be dropped.
    "q66_dedup_clusters" -> { (s, d) =>
      Dedup.connectedComponents(
        Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
          shingleN = ShingleN, numHashes = NumHashes, bands = Bands,
          threshold = 0.5))
    },

    // Gopher-style repetition signals: fraction of occurrences covered
    // by the most frequent token / bigram, distinct-token fraction.
    // Narrow per-row expressions — zero shuffle.
    "q67_repetition" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("toks"),
          TextFunctions.bigramsFromTokens(col("toks")).as("bgs"))
        .select(col("doc_id"),
          round(TextFunctions.topOccurrenceCount(col("toks")).cast("double") /
            size(col("toks")), 4).as("top_tok_frac"),
          round(TextFunctions.topOccurrenceCount(col("bgs")).cast("double") /
            size(col("bgs")), 4).as("top_bigram_frac"),
          round(size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")), 4).as("uniq_frac"))
    },

    // TF-IDF top-3 terms per document (corpus-weighted keywording).
    "q68_tfidf" -> { (s, d) =>
      Corpus.tfidfTopK(Tables.documents(s, d), "doc_id", "text", 3)
    },

    // Lloyd k-means over embeddings (SemDeDup-style semantic clustering):
    // deterministic seeds (lowest ids), 2 iterations, final assignment.
    "q69_kmeans" -> { (s, d) =>
      Similarity.kmeansAssign(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")),
        k = 8, iters = 2)
    },

    // Binary (1-bit) quantization — codes posexploded to scalar rows
    // (q90's shape); 32-bit blocks keep the values engine-portable.
    "q111_binary_quantize" -> { (s, d) =>
      Similarity.binaryQuantize(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")))
        .select(col("id").as("vec_id"),
          posexplode(col("codes")).as(Seq("block", "code")))
    },

    // Exact Hamming top-3 in the binary code space: integer distances,
    // full hash oracle with NO rounding contract anywhere.
    "q112_hamming_topk" -> { (s, d) =>
      Similarity.hammingTopK(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")), 3)
        .select(col("query_id"), col("neighbor_id"), col("hamming"),
          col("rank").cast("int").as("rank"))
    },

    // Candidate-gated binary search — the COMPOSED production shape for
    // the 1-bit rung (multi-table ANN candidates → native-Hamming
    // shortlist → exact cosine re-rank, pqRerankTopK's funnel); the
    // oracle replays all three stages, so the candidate join, the
    // integer Hamming pruning, and the re-rank are each under hash test.
    "q113_binary_prefilter" -> { (s, d) =>
      Similarity.binaryPrefilterTopK(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")),
        3, shortlist = 64)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("int").as("rank"))
    },

    // SemDeDup: deterministic k-means clusters + within-cluster cosine
    // pruning — the larger id of every >= 0.4 pair is flagged removed.
    // One row per vector, full hash oracle (the SQL replays the
    // clustering via the shared kmeans CTE chain).
    "q108_semdedup" -> { (s, d) =>
      Similarity.semDedup(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")),
        k = 8, iters = 2, threshold = 0.4)
    },

    // SemDeDup with PRODUCTION seeding: deterministic k-means‖-style
    // seeds (md5-hash sample → farthest-point refine) instead of the
    // lowest-id rule — SemDeDup quality at scale is seed-sensitive, and
    // the oracle replays the ENTIRE seeding (sample, k-1 refine steps)
    // plus Lloyd plus the dedup pass in generated SQL.
    "q114_semdedup_sampled" -> { (s, d) =>
      Similarity.semDedup(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")),
        k = 8, iters = 2, threshold = 0.4, sampledSeeding = true)
    },

    // Hashing-trick linear quality scorer (fastText-shaped): md5-derived
    // per-token weights, mean + bias, token-order IEEE fold — one
    // narrow pass, full hash oracle.
    "q109_hashed_linear" -> { (s, d) =>
      Corpus.hashedLinearScore(Tables.documents(s, d), "doc_id", "text",
        bias = 0.1)
    },

    // PII/URL scrubbing: the fixture corpus carries no URLs/emails, so
    // the query PLANTS one of each (derived from doc_id) before
    // scrubbing — both engines construct identical text, making the
    // redaction + count a real cross-engine regex-parity check.
    "q71_scrub" -> { (s, d) =>
      val injected = Tables.documents(s, d).select(col("doc_id"),
        concat_ws(" ", col("text"),
          concat(lit("see http://example.com/doc/"),
            col("doc_id").cast("string"), lit("?ref=a")),
          concat(lit("mail user"), col("doc_id").cast("string"),
            lit("@example.org"))).as("text"))
      injected.select(col("doc_id"),
        regexp_count(col("text"), lit(TextFunctions.UrlRe))
          .cast("int").as("n_urls"),
        regexp_count(col("text"), lit(TextFunctions.EmailRe))
          .cast("int").as("n_emails"),
        md5(TextFunctions.redact(col("text"))).as("redacted_md5"))
    },

    // Multi-probe ANN: each query probes its bucket + all Hamming-1
    // buckets — the recall fix over q37's single probe.
    "q72_ann_multiprobe" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.multiProbeAnnTopK(e, 3, bits = 4)
    },

    // Deterministic hash sampling, stratified by language: md5(id)-mod
    // gate, no RNG — reproducible across runs/engines/partitionings.
    "q73_hash_sample" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          TextFunctions.langId(col("text")).as("lang"))
      docs.filter(graft.operators.Corpus.hashSampleFilter(col("doc_id"),
          when(col("lang") === "en", lit(30)).otherwise(lit(80))))
        .select("doc_id", "lang", "n_chars")
    },

    // Unicode NFC normalization (native codegen expression): the ASCII
    // fixture gets a PLANTED decomposed sequence ("cafe" + combining
    // acute U+0301) appended, so composition is observable — char count
    // drops by one and the md5 changes — and both engines must compose
    // identically per the Unicode standard.
    "q76_nfc_normalize" -> { (s, d) =>
      graft.plans.NativeFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" café")).as("raw"))
        .select(col("doc_id"),
          length(col("raw")).cast("int").as("n_raw"),
          length(call_function("nfc_native", col("raw"))).cast("int").as("n_nfc"),
          md5(call_function("nfc_native", col("raw"))).as("nfc_md5"))
    },

    // Language-ID heuristic (marker-word scores, stable priority).
    "q38_langid" -> { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_guess"))
    },

    // Quality score in [0,1].
    "q39_quality_score" -> { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    },

    // The capstone: full curation pass (quality gate → lang filter →
    // exact dedup → LSH near-dup removal), oracle-checked end to end.
    "q70_curation" -> { (s, d) =>
      graft.operators.Curation
        .curate(Tables.documents(s, d), "doc_id", "text",
          minQuality = 0.3, langs = Seq("en"), nearDupThreshold = 0.5)
        .select("doc_id", "n_chars")
    },

    // Benchmark decontamination: every 50th document stands in for the
    // eval set; docs sharing any word 5-gram with it are flagged (the
    // eval docs flag themselves; planted near-dups of them flag too).
    // Broadcast shingle set + one narrow corpus pass — no corpus join.
    "q81_decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.decontaminate(
        docs, "doc_id", "text",
        bench = docs.filter(col("doc_id") % 50 === 0), benchTextCol = "text",
        shingleN = 5)
    },

    // Bloom-gated decontamination: same exact semantics as q81, but the
    // bench set stays distributed and only its bloom sketch ships into
    // the scan; fpp=0.2 deliberately forces false positives at this SF
    // so the exact-confirm join is provably load-bearing (the oracle is
    // the exact-join SQL — FPs must not survive).
    "q124_bloom_decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.bloomDecontaminate(
        docs, "doc_id", "text",
        bench = docs.filter(col("doc_id") % 37 === 0), benchTextCol = "text",
        shingleN = 5, fpp = 0.2)
    },

    // MEASURED ANN recall ("measure, don't guess"): top-3 recall of the
    // single-probe and multi-probe LSH variants against the exact
    // brute-force baseline, as one oracle-checked number per method —
    // the documented single-probe recall caveat and the multi-probe fix
    // become quantified, cross-engine-verified facts.
    "q82_ann_recall" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val exact = Similarity.bruteForceTopK(e, e, 3)
        .select("query_id", "neighbor_id").localCheckpoint()
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      def row(ann: DataFrame, method: String): DataFrame =
        ann.select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
          .crossJoin(nExact)
          .select(lit(method).as("method"), col("n_exact"), col("n_hit"),
            round(col("n_hit").cast("double") / col("n_exact"), 4).as("recall"))
      row(Similarity.bucketedAnnTopK(e, 3, bits = 4), "bucket")
        .unionByName(row(Similarity.multiProbeAnnTopK(e, 3, bits = 4), "multiprobe"))
        .unionByName(row(Similarity.multiTableAnnTopK(e, 3, bits = 4,
          tables = 16), "multitable"))
        .unionByName(row(Similarity.pqAdcTopK(e, 3), "pq_adc"))
        .unionByName(row(Similarity.pqRerankTopK(e, 3, shortlist = 160),
          "pq_rerank"))
        .unionByName(row(Similarity.binaryPrefilterTopK(e, 3, shortlist = 160),
          "binary_prefilter"))
        .unionByName(row(Similarity.ivfAdcRerankTopK(e, 3, nCells = 8,
          nProbe = 4, shortlist = 64), "ivf_adc_rerank"))
    },

    // Context-window chunking: 64-token windows with 8-token overlap,
    // per-chunk token count + digest — deterministic boundaries both
    // engines must reproduce (the pretraining-packing / RAG prep step).
    "q83_chunking" -> { (s, d) =>
      graft.operators.Corpus.chunk(Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 64, overlapTokens = 8)
    },

    // Exact heavy hitters (Misra-Gries candidates → gated exact
    // recount): tokens holding > 1/30 of the corpus token stream.
    "q89_heavy_hitters" -> { (s, d) =>
      graft.operators.Corpus.heavyHitters(Tables.documents(s, d), "text", k = 30)
    },

    // CMS-gated heavy hitters (q141): q89's absolute-threshold sibling
    // over the OPEN key space — 3-gram occurrences (~16k distinct here;
    // unbounded on a real crawl), where Misra-Gries would need N/minCount
    // counters. A fixed-size count-min sketch (overestimates only — no
    // false negatives) gates the exchange to near-threshold terms; the
    // exact recount kills the FP fringe, so the output needs no error
    // bound and the oracle is plain GROUP BY / HAVING.
    "q141_cms_heavy_hitters" -> { (s, d) =>
      graft.operators.Corpus.cmsHeavyHitters(Tables.documents(s, d), "text",
        minCount = 5, shingleN = 3)
    },

    // int8 scalar quantization of the embedding column — codes must be
    // bit-identical across engines (pure IEEE double ops + one shared
    // rounding rule). Codes are posexploded to (vec_id, dim, code)
    // scalar rows (q92's shape) so the harness can sort/hash them —
    // array-typed result columns are unhashable driver-side.
    "q90_int8_quantize" -> { (s, d) =>
      Similarity.quantizeInt8(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")))
        .select(col("id").as("vec_id"), col("scale"),
          posexplode(col("codes")).as(Seq("dim", "code")))
    },

    // Top-3 cosine neighbors scored entirely in the quantized int8 space
    // (scales cancel; integer dots are exact in doubles).
    "q91_int8_topk" -> { (s, d) =>
      Similarity.int8TopK(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")), 3)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("qcos"))
    },

    // Candidate-gated int8 search — the int8 rung's composed production
    // shape (q113's funnel with int8-cosine scoring): multi-table ANN
    // candidates, scored entirely in the quantized space. The oracle
    // replays candidates + quantization + scoring.
    "q117_int8_prefilter" -> { (s, d) =>
      Similarity.int8PrefilterTopK(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")), 3)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("qcos"),
          col("rank").cast("int").as("rank"))
    },

    // PQ encoding: deterministic per-subspace Lloyd codebooks (m=8
    // subspaces over 64 dims, ksub=16, 1 iteration), every vector → 8
    // codes. The oracle replays the ENTIRE training (seeds → assign →
    // mean update → re-assign) in generated SQL, q69-style.
    "q92_pq_encode" -> { (s, d) =>
      Similarity.pqEncode(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")))
        .select(col("id").as("vec_id"), col("subspace"), col("code"))
    },

    // Asymmetric-distance (ADC) top-3 over the PQ codes: exact query
    // sub-vectors against code-represented corpus vectors.
    "q93_pq_adc_topk" -> { (s, d) =>
      Similarity.pqAdcTopK(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")), 3)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
    },

    // IVF-ADC with exact re-rank — the FAISS IVFADC composition: coarse
    // cells bound WHO is compared, PQ codes bound what each comparison
    // costs, floats touched only for the shortlist re-rank. The oracle
    // replays the full funnel: cells + codebook training + gated ADC +
    // re-rank, stage by stage.
    "q128_ivf_adc_rerank" -> { (s, d) =>
      Similarity.ivfAdcRerankTopK(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding")), 3,
          nCells = 8, nProbe = 2, shortlist = 16)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("int").as("rank"))
    },

    // q68 recomputed through the bounded-buffer typed Aggregator (the
    // skew-safe top-k-per-group shape: <= k rows per group survive the
    // map side, no full window sort) — same oracle as q68 proves the
    // two implementations identical.
    "q104_topk_agg" -> { (s, d) =>
      graft.operators.Corpus.tfidfTopKAgg(Tables.documents(s, d),
        "doc_id", "text", k = 3)
    },

    // Exact duplicate-span detection: non-first occurrences of repeated
    // 5-token shingles merged into maximal removable spans.
    "q102_dup_spans" -> { (s, d) =>
      graft.operators.Corpus.duplicateSpans(Tables.documents(s, d),
        "doc_id", "text", shingleN = 5)
    },

    // ... and the removal consumer: cleaned-document digests after
    // dropping every duplicated span.
    "q103_span_removal" -> { (s, d) =>
      graft.operators.Corpus.removeDuplicateSpans(Tables.documents(s, d),
        "doc_id", "text", shingleN = 5)
    },

    // Training-mix rebalance: downsample per-language strata to a
    // 50/15/15/10/10 target mixture with the deterministic md5 gate.
    "q97_mixture_sample" -> { (s, d) =>
      graft.operators.Corpus.mixtureSample(Tables.documents(s, d),
        "doc_id", "lang", MixWeights)
        .select(col("doc_id"), col("lang"))
    },

    // Sequence packing: q83's chunks laid into 256-token context
    // windows by global (doc_id, chunk_idx) order — distributed prefix
    // sum, no single-partition window.
    "q96_pack_chunks" -> { (s, d) =>
      graft.operators.Corpus.packChunks(
        graft.operators.Corpus.chunk(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 64, overlapTokens = 8),
        window = 256)
    },

    // BM25 ranked retrieval (lexical-search twin of the similarity
    // family): top-10 docs for a 3-term query, Okapi k1=1.2 b=0.75.
    "q94_bm25" -> { (s, d) =>
      graft.operators.Corpus.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        query = Seq("spark", "fast", "query"), k = 10)
    },

    // Inverted-index postings: per-term df + digest of the ordered
    // posting list.
    "q95_inverted_index" -> { (s, d) =>
      graft.operators.Corpus.invertedIndex(Tables.documents(s, d), "doc_id", "text")
    },

    // Online-curation parity (DocStreams under the oracle, not just
    // StreamingSpec): the corpus staged TWICE into a file stream (every
    // doc arrives two times) → streaming quality/lang gates →
    // watermarked fingerprint dedup → parquet sink → read back. Dedup is
    // not an aggregation, so append mode emits first-seen rows
    // immediately (no flush sentinel needed) while the duplicate
    // arrivals must collapse against dedup state. Corpus texts are
    // unique (q30's fingerprint groups), so each group's survivor is
    // deterministic and the oracle is simply the batch-gated corpus,
    // once per doc.
    "q88_curate_stream" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val base = s"/tmp/graft_stream/${new java.io.File(d).getName}_curate"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
      val in = s"$base/in"
      val out = s"$base/out"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      docs.unionAll(docs).write.mode("overwrite").parquet(in)
      val q = graft.streaming.DocStreams
        .curateStream(s.readStream.schema(docs.schema).parquet(in), "ts")
        .select("doc_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(out)
    },

    // Gopher-style repetition tagger (q130): duplicate-line stats, top
    // word-bigram occurrences, and the longest same-token run — one
    // narrow zero-shuffle mapPartitions pass (PlanSpec pins the
    // no-Exchange property). The corpus has no newlines, so the fixture
    // PLANTS line structure: every ' value ' becomes a line break
    // (left-to-right non-overlapping replace in both engines), giving
    // real duplicate lines over the small vocabulary. All eight outputs
    // are exact integers — the Gopher fractions ship as
    // numerator/denominator pairs, so the compare has no float hazard.
    "q130_repetition_signals" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("replace(text, ' value ', chr(10))").as("text"))
      graft.operators.Corpus.repetitionSignals(docs).toDF()
    },

    // Corpus-trained bigram LM score (q131) — the perplexity-filter
    // execution shape: train bigram/unigram counts over the corpus
    // (hash aggs), score each doc by joining its bigrams back against
    // the model (equi-joins on the agg keys; V ships as a broadcast
    // 1-row aggregate). The smoothed per-bigram term is an exact
    // integer ((c12 * 1e6) div (c1 + V)), so the cross-engine compare
    // has no float-summation hazard.
    "q131_ngram_lm_score" -> { (s, d) =>
      graft.operators.Corpus.ngramLmScore(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("lm_score"), col("n_bigrams"))
    },

    // End-to-end fuzzy dedup (q132): the composed pass a user calls —
    // LSH candidates → Jaccard verify → connected components → drop
    // non-canonical cluster members. Emits the SURVIVING corpus; the
    // oracle replays the full funnel (recursive-CTE components) and
    // prunes relationally.
    "q132_fuzzy_dedup" -> { (s, d) =>
      Dedup.fuzzyDedup(Tables.documents(s, d), "doc_id", "text",
        shingleN = ShingleN, numHashes = NumHashes, bands = Bands,
        threshold = 0.5)
        .select(col("doc_id"), md5(col("text")).as("text_md5"))
    },

    // Quantile binning (q134): length deciles via broadcast exact cut
    // points + a codegen'd comparison chain — the scale-correct form of
    // ntile() (no global sort, no single-partition window). Ties land
    // in the lower bin (bin = #cuts strictly below) on both engines.
    "q134_quantile_bins" -> { (s, d) =>
      graft.operators.Corpus.quantileBins(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "n_chars", 10)
        .select(col("doc_id"), col("n_chars"), col("bin"))
    },

    // Snapshot merge (q135): a synthetic recrawl — every doc_id % 3
    // gets a revised text, every doc_id % 7 spawns a brand-new doc —
    // upserted into the corpus: updates win, new ids append, the rest
    // pass through one skinny anti-join.
    "q135_snapshot_merge" -> { (s, d) =>
      val cur = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val upd = cur.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" [v2]")).as("text"))
        .unionByName(cur.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(col("text"), lit(" [new]")).as("text")))
      graft.operators.Corpus.snapshotMerge(cur, upd, "doc_id")
        .select(col("doc_id"), md5(col("text")).as("text_md5"))
    },

    // Incremental dedup (q136): a synthetic crawl batch — every
    // doc_id % 10 is an exact re-crawl of a history doc (must drop),
    // every doc_id % 13 arrives token-REVERSED (3-shingle sets are
    // disjoint from the original's ⇒ genuinely new, must survive) —
    // deduped against the full corpus as history. The band join is
    // bipartite (batch × history only); the oracle signs both corpora
    // with the prefixed CTE chain and replays the funnel.
    "q136_incremental_dedup" -> { (s, d) =>
      val hist = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val newDocs = hist.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
        .unionByName(hist.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat_ws(" ", reverse(TextFunctions.tokens(col("text"))))
              .as("text")))
      Dedup.incrementalDedup(newDocs, hist, "doc_id", "text",
        shingleN = ShingleN, numHashes = NumHashes, bands = Bands,
        threshold = 0.5)
        .select(col("doc_id"), md5(col("text")).as("text_md5"))
    },

    // STREAMING incremental fuzzy dedup (q152): two micro-batches flow
    // through foreachBatch — batch0 (reversed-token variants, mostly
    // novel vs the corpus) then batch1 (verbatim copies of batch0 under
    // new ids). Batch1 can only die against batch0's ACCEPTED
    // signatures, so the oracle — which replays both dedup rounds with
    // the history grown by batch0's survivors — proves the signature
    // accumulation across micro-batches, not just per-batch dedup.
    // Files are staged with 60s-apart mtimes + maxFilesPerTrigger=1 to
    // pin micro-batch order.
    "q152_stream_incdedup" -> { (s, d) =>
      val base = s"/tmp/graft_stream/${new java.io.File(d).getName}_incdedup"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val b0 = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"),
          concat_ws(" ", reverse(TextFunctions.tokens(col("text"))))
            .as("text"))
      val b1 = b0.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = s"$base/tmp_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val inDir = new java.io.File(s"$base/in")
        inDir.mkdirs()
        val dest = new java.io.File(inDir, s"$name.parquet")
        java.nio.file.Files.copy(part.toPath, dest.toPath)
        dest.setLastModified(mtime)
      }
      val t0 = 1700000000000L // fixed mtimes: deterministic batch order
      stage(b0, "batch0", t0)
      stage(b1, "batch1", t0 + 60000L)
      val histSig = Dedup.minhashSignatures(docs, "doc_id", "text",
        ShingleN, NumHashes, Bands)
      graft.streaming.DocStreams.incrementalDedupStream(s, s"$base/in",
        s"$base/out", s"$base/ckpt", histSig,
        ShingleN, NumHashes, Bands, threshold = 0.5)
      val hasParts = Option(new java.io.File(s"$base/out").listFiles())
        .exists(_.exists(_.getName.endsWith(".parquet")))
      val res =
        if (hasParts) s.read.schema("doc_id LONG, text STRING")
          .parquet(s"$base/out")
        else s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id LONG, text STRING"))
      res.select(col("doc_id"), md5(col("text")).as("text_md5"))
    },

    // Contamination SCORING (q153): the graded sibling of q81's binary
    // gate — per-doc overlap FRACTION against the eval-set shingles
    // (curation policy drops ≥X%, tags below). Same broadcast sorted-
    // hash-set narrow pass; the ratio derives from distinct-shingle
    // counts both engines compute independently.
    "q153_contamination_score" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Corpus.contaminationScore(docs, "doc_id", "text",
        bench = docs.filter(col("doc_id") % 50 === 0), benchTextCol = "text",
        shingleN = 5)
        .select(col("doc_id"),
          col("n_shingles").cast("int").as("n_shingles"),
          col("n_hits").cast("int").as("n_hits"),
          when(col("n_shingles") === 0, lit(0.0))
            .otherwise(round(col("n_hits").cast("double") /
              col("n_shingles"), 4)).as("contamination"))
    },

    // MAD outlier flags (q154): robust per-language outlier detection
    // on doc length — median and median-absolute-deviation are the
    // curation-grade robust stats (means/stddevs break on the heavy
    // tails this filter exists to catch). Two tiny per-lang aggregates
    // broadcast back; the flag pass is narrow.
    "q154_mad_outliers" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      val med = docs.groupBy("lang")
        .agg(expr("percentile(n_chars, 0.5)").as("med"))
      val dev = docs.join(broadcast(med), "lang")
        .withColumn("adev", abs(col("n_chars") - col("med")))
      val mad = dev.groupBy("lang")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("adev") / nullif(col("mad"), lit(0.0)), 4).as("mad_score"),
          (col("adev") > lit(3.0) * col("mad")).as("outlier"))
    },

    // Stratified take (q139): exactly 40 docs per language, selected by
    // md5-of-id rank — the fixed-COUNT sibling of q97's fixed-rate
    // mixture sampling. No RNG; the same rows on every run and engine.
    "q139_stratified_take" -> { (s, d) =>
      graft.operators.Corpus.stratifiedTake(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang", k = 40)
    },

    // Stratified take, skew-safe form (q160): q139's documented
    // weakness made real — the window form sorts every stratum's full
    // row set (one giant stratum serializes a huge sort on one
    // reducer); the bounded typed Aggregator keeps ≤ k (md5, id) pairs
    // per stratum per partition, so the exchange carries tiny pairs
    // and no full sort exists. Same md5-rank rule, same oracle as
    // q139 — the two implementations are proven identical.
    "q160_stratified_take_agg" -> { (s, d) =>
      graft.operators.Corpus.stratifiedTakeAgg(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang", k = 40)
    },

    // Deterministic corpus shuffle (q147): every document's exact
    // 0-based position in the md5-of-id pseudo-random total order —
    // shard/pack assignment for training epochs. The order is
    // established DISTRIBUTEDLY (range exchange + partition-local sort
    // + zipWithIndex offsets), never through one partition; the oracle
    // replays it as a window row_number, proving the distributed
    // position assignment equals the single-engine total order.
    "q147_global_shuffle" -> { (s, d) =>
      graft.operators.Corpus.globalOrderIndex(
        Tables.documents(s, d).select(col("doc_id")),
        Seq(md5(col("doc_id").cast("string")), col("doc_id")))
        .select(col("doc_id"), col("pos"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q30_exact_dedup" ->
      s"""WITH u AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
          SELECT $fpSql AS fp, min(doc_id) AS keeper, count(*) AS n_copies
          FROM u GROUP BY 1""",
    "q31_minhash_lsh" ->
      s"""WITH $lshCtes
          SELECT da AS doc_a, db AS doc_b, round(inter/(tot-inter), 4) AS jaccard
          FROM j WHERE round(inter/(tot-inter), 4) >= 0.5""",
    // q170: same signature CTE as q34; block-join candidates, exact
    // Hamming verify. The oracle takes the all-pairs shortcut (correct
    // by the pigeonhole argument the engine's block join implements).
    "q170_simhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          hh AS (SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs FROM t),
          sig AS (SELECT doc_id, $simhashSql AS sim FROM hh),
          p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(list_filter(range(1, 17), i ->
                    substr(a.sim, CAST(i AS INTEGER), 1) !=
                    substr(b.sim, CAST(i AS INTEGER), 1))) AS INTEGER) AS hamming
                FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 2""",

    // q157: exact all-pairs baseline vs the band join's found pairs.
    "q157_lsh_pair_recall" ->
      s"""WITH $lshCtes,
          found AS (SELECT da, db FROM j
                    WHERE round(inter/(tot-inter), 4) >= 0.5),
          exj AS (SELECT a.doc_id AS da, b.doc_id AS db,
                    len(list_filter(a.shs, x -> list_contains(b.shs, x))) * 1.0 AS inter,
                    len(a.shs) + len(b.shs) AS tot
                  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id),
          exact AS (SELECT da, db FROM exj
                    WHERE round(inter/(tot-inter), 4) >= 0.5)
          SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
                 CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
                 round((SELECT count(*) FROM found) * 1.0 /
                       (SELECT count(*) FROM exact), 4) AS recall""",
    "q32_token_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
          SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
            CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq,
            round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                  / len(toks), 4) AS avg_tok_len,
            CAST(ceil(length(text) / 4.0) AS INTEGER) AS bpe_est
          FROM t WHERE len(toks) > 0""",
    "q33_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
                     FROM documents)
          SELECT doc_id, md5(nrm) AS fp,
            CASE WHEN length(nrm) < 8 THEN md5(nrm)
                 ELSE list_min(list_transform(generate_series(1, length(nrm)-7),
                        i -> md5(substr(nrm, CAST(i AS INTEGER), 8)))) END AS min_fp
          FROM n""",
    "q34_simhash" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          hh AS (SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs FROM t),
          sig AS (SELECT doc_id, $simhashSql AS simhash FROM hh)
          SELECT simhash, count(*) AS n, min(doc_id) AS min_id
          FROM sig GROUP BY simhash HAVING count(*) > 1""",
    "q35_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          s AS (SELECT doc_id, ${shinglesSql(ShingleN)} AS shs FROM t),
          s2 AS (SELECT doc_id, shs FROM s WHERE len(shs) > 0),
          ex0 AS (SELECT doc_id, unnest(shs) AS sh FROM s2),
          kept AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= $MaxShingleDf),
          ex AS (SELECT e.doc_id, e.sh FROM ex0 e JOIN kept USING (sh)),
          sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
          ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
                 FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
          j AS (SELECT doc_a, doc_b,
                  round(m * 1.0 / (sa.n + sb.n - m), 4) AS jaccard
                FROM ov JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
          SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.3""",
    "q36_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                     FROM embeddings),
          p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
                FROM v q JOIN v c ON q.vec_id != c.vec_id WHERE q.vec_id < 50)
          SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rn FROM p)
          WHERE rn <= 3""",
    "q37_ann_bucket" -> {
      val bucket = "concat(" + (1 to 4).map(i =>
        s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm,
                       $bucket AS bucket
                     FROM embeddings),
          p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
                FROM v q JOIN v c ON q.bucket = c.bucket AND q.vec_id != c.vec_id)
          SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rn FROM p)
          WHERE rn <= 3"""
    },
    "q63_embed_neardup" -> {
      val bucket = "concat(" + (1 to 4).map(i =>
        s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm,
                       $bucket AS bucket
                     FROM embeddings)
          SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                 round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS cos
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.4"""
    },
    "q64_ivf_ann" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                     FROM embeddings),
          cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm
                   FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
          asg AS (SELECT v.vec_id, c.cid,
                    round(list_dot_product(v.e, c.ce) / (v.nrm * c.cnrm), 4) AS rc
                  FROM v CROSS JOIN cent c),
          cell AS (SELECT vec_id, cid AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY rc DESC, cid) AS rn FROM asg)
                   WHERE rn = 1),
          p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
                FROM v q JOIN cell qc ON q.vec_id = qc.vec_id
                     JOIN cell cc ON qc.cell = cc.cell
                     JOIN v c ON c.vec_id = cc.vec_id AND q.vec_id != c.vec_id)
          SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rn FROM p)
          WHERE rn <= 3""",
    "q66_dedup_clusters" ->
      s"""WITH RECURSIVE $lshCtes,
          pairs AS (SELECT da, db FROM j
                    WHERE round(inter/(tot-inter), 4) >= 0.5),
          edges AS (SELECT da AS u, db AS v FROM pairs
                    UNION SELECT db, da FROM pairs),
          nodes AS (SELECT DISTINCT u FROM edges),
          reach(u, v) AS (SELECT u, u FROM nodes
                          UNION
                          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
          SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u""",
    "q67_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
          b AS (SELECT doc_id, toks,
                  list_transform(generate_series(1, len(toks)-1),
                    i -> array_to_string(toks[i:i+1], ' ')) AS bgs
                FROM t2)
          SELECT doc_id,
            round(CAST(list_max(list_transform(list_distinct(toks),
                    x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE)
                  / len(toks), 4) AS top_tok_frac,
            round(CAST(list_max(list_transform(list_distinct(bgs),
                    x -> len(list_filter(bgs, y -> y = x)))) AS DOUBLE)
                  / len(bgs), 4) AS top_bigram_frac,
            round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
              AS uniq_frac
          FROM b""",
    "q68_tfidf" -> tfidfTop3Sql,
    // identical oracle: the aggregator must reproduce the window-sort
    // derivation exactly
    "q104_topk_agg" -> tfidfTop3Sql,
    "q69_kmeans" ->
      s"""WITH ${kmeansSqlCtes(8, 2)}
          SELECT vec_id, cluster FROM af""",
    // SemDeDup: replayed k-means (the af CTE) + within-cluster cosine
    // pairs; the larger id of each >= 0.4 pair is removed
    "q108_semdedup" ->
      s"""WITH ${kmeansSqlCtes(8, 2)},
          wc AS (SELECT a.vec_id, a.cluster, a.e, v.nrm
                 FROM af a JOIN v USING (vec_id)),
          rm AS (SELECT DISTINCT b.vec_id
                 FROM wc a JOIN wc b
                   ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                 WHERE a.nrm * b.nrm <> 0
                   AND round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.4)
          SELECT af.vec_id, af.cluster,
                 (rm.vec_id IS NOT NULL) AS removed
          FROM af LEFT JOIN rm ON af.vec_id = rm.vec_id""",
    // identical dedup pass over the SAMPLED-seed clustering: the only
    // delta vs q108 is the seed CTE chain (hash sample + farthest-point)
    "q114_semdedup_sampled" ->
      s"""WITH ${kmeansSqlCtes(8, 2, sampled = true)},
          wc AS (SELECT a.vec_id, a.cluster, a.e, v.nrm
                 FROM af a JOIN v USING (vec_id)),
          rm AS (SELECT DISTINCT b.vec_id
                 FROM wc a JOIN wc b
                   ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                 WHERE a.nrm * b.nrm <> 0
                   AND round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.4)
          SELECT af.vec_id, af.cluster,
                 (rm.vec_id IS NOT NULL) AS removed
          FROM af LEFT JOIN rm ON af.vec_id = rm.vec_id""",
    // 64-dim embeddings → two 32-bit blocks; bit j of block b set iff
    // e[32b + j] >= 0 (1-based list indexing in DuckDB)
    "q111_binary_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          c AS (SELECT vec_id, b.b AS block,
                  list_reduce(list_transform(range(1, 33),
                    j -> CASE WHEN e[32 * b.b + j] >= 0
                              THEN (1::BIGINT << (j - 1)) ELSE 0::BIGINT END),
                    (a, x) -> a | x) AS code
                FROM v CROSS JOIN (SELECT unnest([0, 1]) AS b) b)
          SELECT vec_id, CAST(block AS INTEGER) AS block, code FROM c""",
    "q112_hamming_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          c AS (SELECT vec_id,
                  list_transform([0, 1], b ->
                    list_reduce(list_transform(range(1, 33),
                      j -> CASE WHEN e[32 * b + j] >= 0
                                THEN (1::BIGINT << (j - 1)) ELSE 0::BIGINT END),
                      (a, x) -> a | x)) AS codes
                FROM v),
          p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                  CAST(bit_count(CAST(xor(q.codes[1], n.codes[1]) AS BIGINT)) +
                       bit_count(CAST(xor(q.codes[2], n.codes[2]) AS BIGINT))
                       AS INTEGER) AS hamming
                FROM c q JOIN c n ON q.vec_id != n.vec_id)
          SELECT query_id, neighbor_id, hamming, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY hamming ASC, neighbor_id ASC) AS rn FROM p)
          WHERE rn <= 3""",
    // the composed funnel replayed stage by stage: 16-table candidate
    // join → integer Hamming shortlist (64/query) → exact cosine top-3
    "q113_binary_prefilter" -> {
      val bits = 4
      val tables = 16
      val tkeys = "[" + (0 until tables).map { t =>
        s"('$t:' || " + (1 to bits).map(i =>
          s"(CASE WHEN e[${t * bits + i}] >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ") + ")"
      }.mkString(", ") + "]"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
             FROM embeddings),
          tk AS (SELECT vec_id, unnest($tkeys) AS tkey FROM v),
          tc AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
                 FROM tk a JOIN tk b ON a.tkey = b.tkey AND a.vec_id != b.vec_id),
          bc AS (SELECT vec_id,
                  list_transform([0, 1], blk ->
                    list_reduce(list_transform(range(1, 33),
                      j -> CASE WHEN e[32 * blk + j] >= 0
                                THEN (1::BIGINT << (j - 1)) ELSE 0::BIGINT END),
                      (a, x) -> a | x)) AS codes
                FROM v),
          hm AS (SELECT t.query_id, t.neighbor_id,
                  bit_count(CAST(xor(cq.codes[1], cn.codes[1]) AS BIGINT)) +
                  bit_count(CAST(xor(cq.codes[2], cn.codes[2]) AS BIGINT)) AS hamming
                FROM tc t JOIN bc cq ON t.query_id = cq.vec_id
                          JOIN bc cn ON t.neighbor_id = cn.vec_id),
          sl AS (SELECT query_id, neighbor_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY hamming, neighbor_id) AS rn FROM hm)
                WHERE rn <= 64),
          sc AS (SELECT s.query_id, s.neighbor_id,
                  round(list_dot_product(q.e, n.e) / (q.nrm * n.nrm), 4) AS cos
                FROM sl s JOIN v q ON s.query_id = q.vec_id
                          JOIN v n ON s.neighbor_id = n.vec_id)
          SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
          WHERE rn <= 3"""
    },
    // weights fold left-to-right in TOKEN ORDER on both engines (same
    // tokenization → same order → identical IEEE sum); list_reduce on
    // an empty list errors, so the CASE guards short docs
    "q109_hashed_linear" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          w AS (SELECT doc_id, len(toks) AS n,
                  list_transform(toks, tk ->
                    CAST((CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) % 2001 - 1000)
                         AS DOUBLE) / 1000.0) AS ws
                FROM t)
          SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
                 round(CASE WHEN n = 0 THEN 0.1
                       ELSE 0.1 + list_reduce(ws, (a, b) -> a + b) / n END, 4)
                   AS lin_score
          FROM w""",
    "q71_scrub" -> {
      val url = TextFunctions.UrlRe
      val email = TextFunctions.EmailRe
      s"""WITH inj AS (SELECT doc_id,
              concat_ws(' ', text,
                concat('see http://example.com/doc/', CAST(doc_id AS VARCHAR), '?ref=a'),
                concat('mail user', CAST(doc_id AS VARCHAR), '@example.org')) AS text
            FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '$url')) AS INTEGER) AS n_urls,
            CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
            md5(regexp_replace(regexp_replace(text, '$url', '<URL>', 'g'),
                               '$email', '<EMAIL>', 'g')) AS redacted_md5
          FROM inj"""
    },
    "q72_ann_multiprobe" -> {
      val bits = 4
      val bucket = "concat(" + (1 to bits).map(i =>
        s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"
      val flips = (1 to bits).map { i =>
        s"""SELECT vec_id, concat(substr(bucket, 1, ${i - 1}),
              CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END,
              substr(bucket, ${i + 1}, ${bits - i})) AS probe FROM v"""
      }.mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm,
               $bucket AS bucket
             FROM embeddings),
          probes AS (SELECT vec_id, bucket AS probe FROM v UNION ALL $flips),
          p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
                FROM v q JOIN probes pr ON pr.vec_id = q.vec_id
                     JOIN v c ON pr.probe = c.bucket AND q.vec_id != c.vec_id)
          SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rn FROM p)
          WHERE rn <= 3"""
    },
    "q73_hash_sample" ->
      s"""WITH t AS (SELECT doc_id, n_chars, $toksSql AS toks FROM documents),
          l AS (SELECT doc_id, n_chars, $langCaseSql AS lang FROM t)
          SELECT doc_id, lang, n_chars FROM l
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
                < CASE WHEN lang = 'en' THEN 30 ELSE 80 END""",
    "q76_nfc_normalize" ->
      s"""WITH r AS (SELECT doc_id, text || ' cafe' || chr(769) AS raw
                     FROM documents)
          SELECT doc_id,
            CAST(length(raw) AS INTEGER) AS n_raw,
            CAST(length(nfc_normalize(raw)) AS INTEGER) AS n_nfc,
            md5(nfc_normalize(raw)) AS nfc_md5
          FROM r""",
    "q38_langid" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
          SELECT doc_id, $langCaseSql AS lang_guess FROM t""",
    // The sketch pass only PROPOSES candidates; the result is the exact
    // GROUP BY — integer threshold freq*k > N, no float edge.
    "q89_heavy_hitters" ->
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
          s AS (SELECT unnest(toks) AS term FROM t),
          n AS (SELECT count(*) AS nn FROM s)
          SELECT term, count(*) AS freq FROM s, n
          GROUP BY term, nn HAVING count(*) * 30 > nn""",

    // q141: every 3-gram OCCURRENCE (no per-doc dedup — the counting
    // semantics), threshold as plain HAVING; the engine's sketch is an
    // internal prefilter that cannot change the exact output.
    "q141_cms_heavy_hitters" ->
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
          g AS (SELECT unnest(list_transform(generate_series(1, len(toks)-2),
                        i -> array_to_string(toks[i:i+2], ' '))) AS term FROM t)
          SELECT term, count(*) AS freq FROM g
          GROUP BY term HAVING count(*) >= 5""",

    // Mirrors quantizeInt8 exactly: scale = amax/127 (unrounded) feeds
    // the code rounding; the OUTPUT scale is rounded to 6 dp. The same
    // x/(amax/127.0) expression shape matters — x*127/amax would round
    // differently in the last ulp. One (vec_id, dim, code) row per
    // element, matching the engine's posexplode (dim is 0-based).
    "q90_int8_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          s AS (SELECT vec_id, e,
                  list_max(list_transform(e, x -> abs(x))) AS amax FROM v),
          c AS (SELECT vec_id, round(amax / 127.0, 6) AS scale,
                  CASE WHEN amax = 0 THEN list_transform(e, x -> 0)
                       ELSE list_transform(e, x -> CAST(round(x / (amax / 127.0)) AS INTEGER))
                  END AS codes
                FROM s),
          x AS (SELECT vec_id, scale, codes,
                  unnest(generate_series(1, len(codes))) AS i FROM c)
          SELECT vec_id, scale, CAST(i - 1 AS INTEGER) AS dim,
            codes[i] AS code
          FROM x""",
    "q91_int8_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          s AS (SELECT vec_id, e,
                  list_max(list_transform(e, x -> abs(x))) AS amax FROM v),
          q AS (SELECT vec_id,
                  CASE WHEN amax = 0 THEN list_transform(e, x -> 0.0)
                       ELSE list_transform(e, x -> CAST(round(x / (amax / 127.0)) AS DOUBLE))
                  END AS c
                FROM s),
          n AS (SELECT vec_id, c, sqrt(list_dot_product(c, c)) AS nrm FROM q),
          p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  CASE WHEN q.nrm * c.nrm = 0 THEN NULL
                       ELSE round(list_dot_product(q.c, c.c) / (q.nrm * c.nrm), 4)
                  END AS qcos
                FROM n q JOIN n c ON q.vec_id != c.vec_id)
          SELECT query_id, neighbor_id, qcos FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY qcos DESC, neighbor_id) AS rn FROM p) WHERE rn <= 3""",
    // q91's int8 scoring restricted to the 16-table candidate pairs
    // (q113's tc chain) — the composed funnel replayed stage by stage
    "q117_int8_prefilter" -> {
      val bits = 4
      val tables = 16
      val tkeys = "[" + (0 until tables).map { t =>
        s"('$t:' || " + (1 to bits).map(i =>
          s"(CASE WHEN e[${t * bits + i}] >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ") + ")"
      }.mkString(", ") + "]"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          tk AS (SELECT vec_id, unnest($tkeys) AS tkey FROM v),
          tc AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
                 FROM tk a JOIN tk b ON a.tkey = b.tkey AND a.vec_id != b.vec_id),
          s AS (SELECT vec_id, e,
                  list_max(list_transform(e, x -> abs(x))) AS amax FROM v),
          q AS (SELECT vec_id,
                  CASE WHEN amax = 0 THEN list_transform(e, x -> 0.0)
                       ELSE list_transform(e, x -> CAST(round(x / (amax / 127.0)) AS DOUBLE))
                  END AS c
                FROM s),
          n AS (SELECT vec_id, c, sqrt(list_dot_product(c, c)) AS nrm FROM q),
          p AS (SELECT t.query_id, t.neighbor_id,
                  CASE WHEN q.nrm * c.nrm = 0 THEN NULL
                       ELSE round(list_dot_product(q.c, c.c) / (q.nrm * c.nrm), 4)
                  END AS qcos
                FROM tc t JOIN n q ON t.query_id = q.vec_id
                          JOIN n c ON t.neighbor_id = c.vec_id)
          SELECT query_id, neighbor_id, qcos, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY qcos DESC, neighbor_id) AS rn FROM p)
          WHERE rn <= 3"""
    },

    "q92_pq_encode" -> {
      val sel = (0 until pqM).map(s =>
        s"SELECT vec_id, $s AS subspace, cid AS code FROM af_$s")
        .mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          $pqChain
          SELECT vec_id, CAST(subspace AS INTEGER) AS subspace, code
          FROM ($sel)"""
    },
    // Term order matters: the engine sums the m subspace terms left to
    // right before the single 4 dp rounding — the SQL chain is written
    // in the same order, so the IEEE sums agree bit for bit.
    "q93_pq_adc_topk" -> {
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          $pqChain,
          $pqAdcTop3
          SELECT query_id, neighbor_id, adist, rank FROM adc3"""
    },
    // The composed IVFADC funnel, stage by stage: q64's cell CTEs gate
    // the ADC pair join (same code joins/terms as q93), a shortlist
    // rank bounds the re-rank, and the final cosine ordering mirrors
    // the engine's topK (cos DESC, neighbor ASC).
    "q128_ivf_adc_rerank" -> {
      val joins = (0 until pqM).map(s =>
        s"JOIN af_$s k$s ON k$s.vec_id = c.vec_id " +
          s"JOIN cs1_$s t$s ON t$s.cid = k$s.cid").mkString(" ")
      val termSql = (0 until pqM).map(s =>
        s"(q.nv$s + t$s.nc - 2 * list_dot_product(q.sub$s, t$s.ce))")
        .mkString(" + ")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          $pqChain,
          vv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
          cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm
                   FROM (SELECT * FROM vv ORDER BY vec_id LIMIT 8)),
          asg AS (SELECT vv.vec_id, c.cid,
                    round(list_dot_product(vv.e, c.ce) / (vv.nrm * c.cnrm), 4) AS rc
                  FROM vv CROSS JOIN cent c),
          cell AS (SELECT vec_id, cid AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY rc DESC, cid) AS rn FROM asg)
                   WHERE rn = 1),
          probe AS (SELECT vec_id, cid AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY rc DESC, cid) AS rn FROM asg)
                   WHERE rn <= 2),
          adcg AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    round($termSql, 4) AS adist
                  FROM b q JOIN probe qc ON q.vec_id = qc.vec_id
                       JOIN cell cc ON qc.cell = cc.cell
                       JOIN b c ON c.vec_id = cc.vec_id AND q.vec_id != c.vec_id
                       $joins),
          sl AS (SELECT query_id, neighbor_id FROM
                   (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adist, neighbor_id) AS rn FROM adcg)
                 WHERE rn <= 16),
          rr AS (SELECT sl.query_id, sl.neighbor_id,
                   round(list_dot_product(qv.e, cv.e) / (qv.nrm * cv.nrm), 4) AS cos
                 FROM sl JOIN vv qv ON sl.query_id = qv.vec_id
                      JOIN vv cv ON sl.neighbor_id = cv.vec_id)
          SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rn FROM rr)
          WHERE rn <= 3"""
    },

    // Same keeper rule (global (doc_id, pos) rank 1 survives) and the
    // same gaps-and-islands merge, in window SQL.
    "q102_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 5),
          sh0 AS (SELECT doc_id, toks,
                    unnest(generate_series(1, len(toks) - 4)) AS i
                  FROM f),
          sh AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                   array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER) + 4], ' ') AS shingle
                 FROM sh0),
          flg AS (SELECT doc_id, pos,
                    row_number() OVER (PARTITION BY shingle ORDER BY doc_id, pos) AS rn
                  FROM sh),
          d AS (SELECT doc_id, pos FROM flg WHERE rn > 1),
          isl AS (SELECT doc_id, pos,
                    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                           OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                         THEN 1 ELSE 0 END AS newisl
                  FROM d),
          isl2 AS (SELECT doc_id, pos,
                     sum(newisl) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
                   FROM isl)
          SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
                 count(*) AS n_shingles
          FROM isl2 GROUP BY doc_id, g""",

    // Span ranges expand to token-level removal rows (DISTINCT — the
    // overlapping shingles share tokens), ANTI-joined off the token
    // stream; string_agg ORDER BY pos == the engine's sorted collect.
    "q103_span_removal" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 5),
          sh0 AS (SELECT doc_id, toks,
                    unnest(generate_series(1, len(toks) - 4)) AS i
                  FROM f),
          sh AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                   array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER) + 4], ' ') AS shingle
                 FROM sh0),
          flg AS (SELECT doc_id, pos,
                    row_number() OVER (PARTITION BY shingle ORDER BY doc_id, pos) AS rn
                  FROM sh),
          d AS (SELECT doc_id, pos FROM flg WHERE rn > 1),
          rm AS (SELECT DISTINCT doc_id, CAST(pos + j AS INTEGER) AS pos
                 FROM d, generate_series(0, 4) AS s(j)),
          tk0 AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
                  FROM t),
          tk AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                   toks[CAST(i AS INTEGER)] AS tok
                 FROM tk0),
          kept AS (SELECT tk.doc_id, tk.pos, tk.tok
                   FROM tk ANTI JOIN rm USING (doc_id, pos)),
          agg AS (SELECT doc_id, count(*) AS n_kept,
                    md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
                  FROM kept GROUP BY 1)
          SELECT t.doc_id, coalesce(agg.n_kept, 0) AS n_kept, agg.clean_md5
          FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""",

    // Threshold arithmetic written in the engine's exact expression
    // order (((1e6 * w) * t) / n) so the floor()ed gates agree.
    "q97_mixture_sample" -> {
      val vals = MixWeights.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
      s"""WITH w(lang, w) AS (VALUES $vals),
          c AS (SELECT lang, count(*) AS n FROM documents
                WHERE lang IN (SELECT lang FROM w) GROUP BY 1),
          t AS (SELECT min(c.n / w.w) AS t FROM c JOIN w USING (lang)),
          thr AS (SELECT c.lang,
                    CAST(floor(1000000.0 * w.w * t.t / c.n) AS BIGINT) AS thr
                  FROM c JOIN w USING (lang) CROSS JOIN t)
          SELECT d.doc_id, d.lang FROM documents d JOIN thr ON d.lang = thr.lang
          WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 1000000 < thr.thr"""
    },

    // q83's chunk derivation + a windowed running sum; DuckDB's
    // sum(BIGINT) OVER is HUGEINT, so casts pin the output types.
    "q96_pack_chunks" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
          c AS (SELECT doc_id, toks,
                  unnest(generate_series(0,
                    CAST(ceil(greatest(n - 8, 1) / 56.0) AS BIGINT) - 1)) AS ci
                FROM n),
          s AS (SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
                  len(toks[ci*56 + 1 : ci*56 + 64]) AS n_tokens
                FROM c),
          o AS (SELECT doc_id, chunk_idx, n_tokens,
                  coalesce(sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
                FROM s)
          SELECT doc_id, chunk_idx,
                 CAST(start // 256 AS BIGINT) AS pack_id,
                 CAST(start % 256 AS BIGINT) AS pack_offset,
                 (start % 256) + n_tokens > 256 AS straddles
          FROM o""",

    // Scalar literals written as the same EXPRESSIONS the engine folds
    // ((1.2 + 1), 0.25) so both sides compute identical doubles.
    "q94_bm25" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
          dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
          st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM t
                 WHERE term IN ('spark', 'fast', 'query') GROUP BY 1, 2),
          df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          sc AS (SELECT tf.doc_id, tf.term,
                   ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                     (tf.tf * (1.2 + 1)) /
                     (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS contrib
                 FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
                      CROSS JOIN st),
          -- left fold in term order = the engine's pinned IEEE sum order
          sc2 AS (SELECT doc_id, list(contrib ORDER BY term) AS cs
                  FROM sc GROUP BY 1)
          SELECT doc_id, round(list_reduce(cs, (a, b) -> a + b), 4) AS score
          FROM sc2 ORDER BY score DESC, doc_id LIMIT 10""",
    "q95_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS term
                     FROM documents)
          SELECT term, count(*) AS df, min(doc_id) AS first_doc,
                 md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_md5
          FROM t GROUP BY 1""",

    // The streaming gates are the batch gates; dedup collapses the two
    // staged copies of every doc back to one row (texts are unique, so
    // no cross-doc collapse) — the oracle is the gated corpus itself.
    "q88_curate_stream" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
          g AS (SELECT doc_id, $qualitySql AS qual, $langCaseSql AS lang FROM t)
          SELECT doc_id FROM g WHERE qual >= 0.3 AND lang = 'en'""",
    "q70_curation" -> {
      val mhCols = (0 until NumHashes).map(j => s"${mhSql(j)} AS mh$j").mkString(", ")
      val rows = NumHashes / Bands
      val bandSelects = (0 until Bands).map { b =>
        val cols = (b * rows until (b + 1) * rows).map(j => s"mh$j").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cols)) AS bkey FROM m"
      }.mkString(" UNION ALL ")
      s"""WITH RECURSIVE t0 AS (SELECT doc_id, text, n_chars, $toksSql AS toks FROM documents),
          q AS (SELECT doc_id, text, n_chars, toks,
                       $qualitySql AS qual, $langCaseSql AS lang FROM t0),
          gated AS (SELECT doc_id, text, n_chars, toks FROM q
                    WHERE qual >= 0.3 AND lang = 'en'),
          fp AS (SELECT $fpSql AS f, min(doc_id) AS keep
                 FROM gated GROUP BY 1),
          ex0 AS (SELECT g.doc_id, g.text, g.n_chars, g.toks
                  FROM gated g JOIN fp ON g.doc_id = fp.keep),
          s AS (SELECT doc_id, ${shinglesSql(ShingleN)} AS shs FROM ex0),
          s2 AS (SELECT doc_id, shs FROM s WHERE len(shs) > 0),
          hh AS (SELECT doc_id, shs, list_transform(shs, x -> md5(x)) AS hs FROM s2),
          m AS (SELECT doc_id, $mhCols FROM hh),
          bands AS ($bandSelects),
          cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b
                   ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
          j AS (SELECT da, db,
                  len(list_filter(sa.shs, x -> list_contains(sb.shs, x))) * 1.0 AS inter,
                  len(sa.shs) + len(sb.shs) AS tot
                FROM cand JOIN s2 sa ON da = sa.doc_id JOIN s2 sb ON db = sb.doc_id),
          pairs AS (SELECT da, db FROM j
                    WHERE round(inter/(tot-inter), 4) >= 0.5),
          edges AS (SELECT da AS u, db AS v FROM pairs
                    UNION SELECT db, da FROM pairs),
          nds AS (SELECT DISTINCT u FROM edges),
          reach(u, v) AS (SELECT u, u FROM nds
                          UNION
                          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          dropids AS (SELECT u FROM reach GROUP BY u HAVING u != min(v))
          SELECT doc_id, n_chars FROM ex0
          WHERE doc_id NOT IN (SELECT u FROM dropids)"""
    },
    "q39_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
          SELECT doc_id,
            round(least(len(toks) / 100.0, 1.0) * 0.5 +
                  (($stopSql) * 1.0 / greatest(len(toks) * 1.0, 1.0)) * 0.3 +
                  (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 /
                   greatest(length(text), 1)) * 0.2,
                  4) AS quality
          FROM t""",
    // shinglesSql is list_distinct, so count(*) over the join counts
    // DISTINCT contaminated shingles — the engine's seen-set twin.
    "q81_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          s AS (SELECT doc_id, ${shinglesSql(5)} AS shs FROM t),
          bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM s WHERE doc_id % 50 = 0),
          ex AS (SELECT doc_id, unnest(shs) AS sh FROM s),
          h AS (SELECT ex.doc_id, count(*) AS n
                FROM ex JOIN bsh USING (sh) GROUP BY ex.doc_id)
          SELECT s.doc_id,
                 CAST(coalesce(h.n, 0) AS INTEGER) AS n_hits,
                 coalesce(h.n, 0) > 0 AS contaminated
          FROM s LEFT JOIN h ON s.doc_id = h.doc_id""",
    // Bloom FPs are eliminated by the confirm join, so the oracle is the
    // same exact-join shape as q81's — fpp never appears in it.
    "q124_bloom_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          s AS (SELECT doc_id, ${shinglesSql(5)} AS shs FROM t),
          bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM s WHERE doc_id % 37 = 0),
          ex AS (SELECT doc_id, unnest(shs) AS sh FROM s),
          h AS (SELECT ex.doc_id, count(*) AS n
                FROM ex JOIN bsh USING (sh) GROUP BY ex.doc_id)
          SELECT s.doc_id,
                 CAST(coalesce(h.n, 0) AS INTEGER) AS n_hits,
                 coalesce(h.n, 0) > 0 AS contaminated
          FROM s LEFT JOIN h ON s.doc_id = h.doc_id""",
    "q82_ann_recall" -> {
      val bits = 4
      val tables = 16
      val bucket = "concat(" + (1 to bits).map(i =>
        s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"
      // multi-table keys: table t reads dims [t*bits+1, (t+1)*bits]
      val tkeys = "[" + (0 until tables).map { t =>
        s"('$t:' || " + (1 to bits).map(i =>
          s"(CASE WHEN e[${t * bits + i}] >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ") + ")"
      }.mkString(", ") + "]"
      val flips = (1 to bits).map { i =>
        s"""SELECT vec_id, concat(substr(bucket, 1, ${i - 1}),
              CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END,
              substr(bucket, ${i + 1}, ${bits - i})) AS probe FROM v"""
      }.mkString(" UNION ALL ")
      // IVF-gated ADC (the q128 funnel): code joins + term sum, aliased
      // iv* to stay clear of pqAdcTop3's CTE-local k/t aliases
      val ivfJoins = (0 until pqM).map(s =>
        s"JOIN af_$s ivk$s ON ivk$s.vec_id = c.vec_id " +
          s"JOIN cs1_$s ivt$s ON ivt$s.cid = ivk$s.cid").mkString(" ")
      val ivfTermSql = (0 until pqM).map(s =>
        s"(q.nv$s + ivt$s.nc - 2 * list_dot_product(q.sub$s, ivt$s.ce))")
        .mkString(" + ")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm,
               $bucket AS bucket
             FROM embeddings),
          pe AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
                 FROM v q JOIN v c ON q.vec_id != c.vec_id),
          exact AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM pe) WHERE rn <= 3),
          pb AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
                 FROM v q JOIN v c ON q.bucket = c.bucket AND q.vec_id != c.vec_id),
          bk AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM pb) WHERE rn <= 3),
          probes AS (SELECT vec_id, bucket AS probe FROM v UNION ALL $flips),
          pm AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
                 FROM v q JOIN probes pr ON pr.vec_id = q.vec_id
                      JOIN v c ON pr.probe = c.bucket AND q.vec_id != c.vec_id),
          mp AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM pm) WHERE rn <= 3),
          tk AS (SELECT vec_id, unnest($tkeys) AS tkey FROM v),
          tc AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
                 FROM tk a JOIN tk b ON a.tkey = b.tkey AND a.vec_id != b.vec_id),
          pt AS (SELECT query_id, neighbor_id, $cosSql AS cos
                 FROM tc JOIN v q ON tc.query_id = q.vec_id
                         JOIN v c ON tc.neighbor_id = c.vec_id),
          mt AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM pt) WHERE rn <= 3),
          $pqChain,
          $pqAdcTop3,
          adcS AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adist, neighbor_id) AS rn FROM adc) WHERE rn <= 160),
          prr AS (SELECT a.query_id, a.neighbor_id, $cosSql AS cos
                  FROM adcS a JOIN v q ON a.query_id = q.vec_id
                       JOIN v c ON a.neighbor_id = c.vec_id),
          pr3 AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM prr) WHERE rn <= 3),
          bcq AS (SELECT vec_id,
                  list_transform([0, 1], blk ->
                    list_reduce(list_transform(range(1, 33),
                      j -> CASE WHEN e[32 * blk + j] >= 0
                                THEN (1::BIGINT << (j - 1)) ELSE 0::BIGINT END),
                      (a, x) -> a | x)) AS codes
                FROM v),
          bhm AS (SELECT t.query_id, t.neighbor_id,
                  bit_count(CAST(xor(cq.codes[1], cn.codes[1]) AS BIGINT)) +
                  bit_count(CAST(xor(cq.codes[2], cn.codes[2]) AS BIGINT)) AS hamming
                FROM tc t JOIN bcq cq ON t.query_id = cq.vec_id
                          JOIN bcq cn ON t.neighbor_id = cn.vec_id),
          bsl AS (SELECT query_id, neighbor_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY hamming, neighbor_id) AS rn FROM bhm)
                WHERE rn <= 160),
          bsc AS (SELECT s.query_id, s.neighbor_id, $cosSql AS cos
                  FROM bsl s JOIN v q ON s.query_id = q.vec_id
                             JOIN v c ON s.neighbor_id = c.vec_id),
          bp3 AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM bsc) WHERE rn <= 3),
          ic AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm
                 FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
          ias AS (SELECT v.vec_id, c.cid,
                    round(list_dot_product(v.e, c.ce) / (v.nrm * c.cnrm), 4) AS rc
                  FROM v CROSS JOIN ic c),
          icell AS (SELECT vec_id, cid AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY rc DESC, cid) AS rn FROM ias)
                   WHERE rn = 1),
          iprobe AS (SELECT vec_id, cid AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY rc DESC, cid) AS rn FROM ias)
                   WHERE rn <= 4),
          gadc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    round($ivfTermSql, 4) AS adist
                  FROM b q JOIN iprobe qc ON q.vec_id = qc.vec_id
                       JOIN icell cc ON qc.cell = cc.cell
                       JOIN b c ON c.vec_id = cc.vec_id AND q.vec_id != c.vec_id
                       $ivfJoins),
          isl AS (SELECT query_id, neighbor_id FROM
                   (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adist, neighbor_id) AS rn FROM gadc)
                 WHERE rn <= 64),
          irr AS (SELECT s.query_id, s.neighbor_id, $cosSql AS cos
                  FROM isl s JOIN v q ON s.query_id = q.vec_id
                       JOIN v c ON s.neighbor_id = c.vec_id),
          ir3 AS (SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM irr) WHERE rn <= 3),
          ne AS (SELECT count(*) AS n_exact FROM exact),
          hb AS (SELECT count(*) AS n_hit FROM bk JOIN exact USING (query_id, neighbor_id)),
          hm AS (SELECT count(*) AS n_hit FROM mp JOIN exact USING (query_id, neighbor_id)),
          ht AS (SELECT count(*) AS n_hit FROM mt JOIN exact USING (query_id, neighbor_id)),
          hq AS (SELECT count(*) AS n_hit
                 FROM (SELECT query_id, neighbor_id FROM adc3) a
                 JOIN exact USING (query_id, neighbor_id)),
          hr AS (SELECT count(*) AS n_hit
                 FROM pr3 JOIN exact USING (query_id, neighbor_id)),
          hbp AS (SELECT count(*) AS n_hit
                 FROM bp3 JOIN exact USING (query_id, neighbor_id)),
          hiv AS (SELECT count(*) AS n_hit
                 FROM ir3 JOIN exact USING (query_id, neighbor_id))
          SELECT 'bucket' AS method, ne.n_exact, hb.n_hit,
                 round(hb.n_hit * 1.0 / ne.n_exact, 4) AS recall FROM hb, ne
          UNION ALL
          SELECT 'multiprobe' AS method, ne.n_exact, hm.n_hit,
                 round(hm.n_hit * 1.0 / ne.n_exact, 4) AS recall FROM hm, ne
          UNION ALL
          SELECT 'multitable' AS method, ne.n_exact, ht.n_hit,
                 round(ht.n_hit * 1.0 / ne.n_exact, 4) AS recall FROM ht, ne
          UNION ALL
          SELECT 'pq_adc' AS method, ne.n_exact, hq.n_hit,
                 round(hq.n_hit * 1.0 / ne.n_exact, 4) AS recall FROM hq, ne
          UNION ALL
          SELECT 'pq_rerank' AS method, ne.n_exact, hr.n_hit,
                 round(hr.n_hit * 1.0 / ne.n_exact, 4) AS recall FROM hr, ne
          UNION ALL
          SELECT 'binary_prefilter' AS method, ne.n_exact, hbp.n_hit,
                 round(hbp.n_hit * 1.0 / ne.n_exact, 4) AS recall FROM hbp, ne
          UNION ALL
          SELECT 'ivf_adc_rerank' AS method, ne.n_exact, hiv.n_hit,
                 round(hiv.n_hit * 1.0 / ne.n_exact, 4) AS recall FROM hiv, ne"""
    },
    // chunk i covers tokens [i*56, i*56+64); DuckDB list slicing is
    // 1-based inclusive and clamps at the list end, matching Spark's
    // slice(toks, start+1, 64).
    "q83_chunking" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
          c AS (SELECT doc_id, toks,
                  unnest(generate_series(0,
                    CAST(ceil(greatest(n - 8, 1) / 56.0) AS BIGINT) - 1)) AS ci
                FROM n),
          s AS (SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
                  toks[ci*56 + 1 : ci*56 + 64] AS carr
                FROM c)
          SELECT doc_id, chunk_idx,
                 CAST(len(carr) AS INTEGER) AS n_tokens,
                 md5(array_to_string(carr, ' ')) AS chunk_md5
          FROM s""",

    // q130: replay the planted-newline fixture, then compute the Gopher
    // signals relationally — line stats from a (doc, line) group-by,
    // top-bigram from a (doc, bigram) group-by, max token run via the
    // gaps-and-islands window (i - row_number within (doc, token)).
    // The engine computes all of this in one narrow per-doc pass; the
    // oracle's explodes/windows are the semantics spec, not the plan.
    "q130_repetition_signals" ->
      s"""WITH d AS (SELECT doc_id, replace(text, ' value ', chr(10)) AS text
           FROM documents),
         l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d),
         lc AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
           FROM l GROUP BY doc_id, line),
         la AS (SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS total_lines,
                  CAST(sum(c - 1) AS BIGINT) AS dup_lines,
                  CAST(sum(c * len) AS BIGINT) AS total_line_chars,
                  CAST(sum((c - 1) * len) AS BIGINT) AS dup_line_chars
           FROM lc GROUP BY doc_id),
         tok AS (SELECT doc_id, $toksSql AS toks FROM d),
         tv AS (SELECT doc_id,
                  unnest(generate_series(1, len(toks))) AS i, toks FROM tok),
         tw AS (SELECT doc_id, i, toks[CAST(i AS INTEGER)] AS w FROM tv),
         bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bigram
           FROM tw a JOIN tw b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         bgc AS (SELECT doc_id, bigram, count(*) AS c
           FROM bg GROUP BY doc_id, bigram),
         bga AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count,
                  CAST(sum(c) AS BIGINT) AS n_bigrams
           FROM bgc GROUP BY doc_id),
         isl AS (SELECT doc_id, w,
                  i - row_number() OVER (PARTITION BY doc_id, w ORDER BY i) AS g
           FROM tw),
         rc AS (SELECT doc_id, count(*) AS runlen
           FROM isl GROUP BY doc_id, w, g),
         ra AS (SELECT doc_id, CAST(max(runlen) AS BIGINT) AS max_token_run
           FROM rc GROUP BY doc_id)
         SELECT la.doc_id, la.total_lines, la.dup_lines, la.total_line_chars,
              la.dup_line_chars,
              CAST(coalesce(bga.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
              CAST(coalesce(bga.n_bigrams, 0) AS BIGINT) AS n_bigrams,
              CAST(coalesce(ra.max_token_run, 0) AS BIGINT) AS max_token_run
         FROM la LEFT JOIN bga ON la.doc_id = bga.doc_id
                 LEFT JOIN ra ON la.doc_id = ra.doc_id""",

    // q131: replay the train-then-score bigram LM relationally. The
    // `//` is floor division on BIGINTs (operands positive), matching
    // Spark's `div`; every aggregate casts back to BIGINT (DuckDB sums
    // to HUGEINT).
    "q131_ngram_lm_score" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tv AS (SELECT doc_id,
                  unnest(generate_series(1, len(toks))) AS i, toks FROM tok),
         tw AS (SELECT doc_id, i, toks[CAST(i AS INTEGER)] AS w FROM tv),
         bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
           FROM tw a JOIN tw b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         docbg AS (SELECT doc_id, w1, w2, count(*) AS m
           FROM bg GROUP BY doc_id, w1, w2),
         c12 AS (SELECT w1, w2, CAST(sum(m) AS BIGINT) AS c12
           FROM docbg GROUP BY w1, w2),
         uni AS (SELECT w AS w1, count(*) AS c1 FROM tw GROUP BY w),
         voc AS (SELECT count(*) AS v FROM uni)
         SELECT d.doc_id,
              CAST(sum(d.m * ((c12.c12 * 1000000) // (uni.c1 + voc.v))) AS BIGINT) AS lm_score,
              CAST(sum(d.m) AS BIGINT) AS n_bigrams
         FROM docbg d
         JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
         JOIN uni ON d.w1 = uni.w1
         CROSS JOIN voc
         GROUP BY d.doc_id""",

    // q132: q66's replayed funnel (LSH + recursive-CTE reachability)
    // extended by the prune — survivors are documents that are not a
    // non-canonical member of any cluster.
    "q132_fuzzy_dedup" ->
      s"""WITH RECURSIVE $lshCtes,
          pairs AS (SELECT da, db FROM j
                    WHERE round(inter/(tot-inter), 4) >= 0.5),
          edges AS (SELECT da AS u, db AS v FROM pairs
                    UNION SELECT db, da FROM pairs),
          nodes AS (SELECT DISTINCT u FROM edges),
          reach(u, v) AS (SELECT u, u FROM nodes
                          UNION
                          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
          losers AS (SELECT doc_id FROM cl WHERE cluster_id <> doc_id)
          SELECT d.doc_id, md5(d.text) AS text_md5
          FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
          WHERE l.doc_id IS NULL""",

    // q134: quantile_cont over a fraction list is DuckDB's exact
    // interpolated percentile array — the same p·(n−1) definition as
    // Spark's percentile(col, array(...)). Cut values are non-integer
    // except when the rank lands exactly on a data point, so integer
    // n_chars can never sit inside a 1-ulp cross-engine gap.
    "q134_quantile_bins" -> {
      val ps = (1 until 10).map(i => s"0.$i").mkString(", ")
      val terms = (1 to 9)
        .map(i => s"(CASE WHEN d.n_chars > c.cuts[$i] THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH c AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE), [$ps]) AS cuts
           FROM documents)
         SELECT d.doc_id, d.n_chars, CAST($terms AS INTEGER) AS bin
         FROM documents d, c"""
    },

    // q135: updates ∪ (current ⟂ update-keys) — the anti-join spelled
    // relationally.
    "q135_snapshot_merge" ->
      """WITH cur AS (SELECT doc_id, text FROM documents),
         upd AS (SELECT doc_id, text || ' [v2]' AS text FROM documents
                 WHERE doc_id % 3 = 0
                 UNION ALL
                 SELECT doc_id + 100000, text || ' [new]' FROM documents
                 WHERE doc_id % 7 = 0)
         SELECT doc_id, md5(text) AS text_md5 FROM upd
         UNION ALL
         SELECT c.doc_id, md5(c.text) FROM cur c
         LEFT JOIN upd u ON c.doc_id = u.doc_id WHERE u.doc_id IS NULL""",

    // q136: sign the history corpus (h-prefix) and the synthetic batch
    // (n-prefix) with the same signature chain, candidates are the
    // BIPARTITE band collisions, verify is exact Jaccard, survivors are
    // batch docs with no verified history match.
    "q136_incremental_dedup" ->
      s"""WITH nd AS (SELECT doc_id + 200000 AS doc_id, text FROM documents
                 WHERE doc_id % 10 = 0
                 UNION ALL
                 SELECT doc_id + 300000 AS doc_id,
                        array_to_string(list_reverse($toksSql), ' ') AS text
                 FROM documents WHERE doc_id % 13 = 0),
         ${sigCtesFor("documents", "h")},
         ${sigCtesFor("nd", "n")},
         cand AS (SELECT DISTINCT a.doc_id AS nid, b.doc_id AS hid
                  FROM nbands a JOIN hbands b
                  ON a.band = b.band AND a.bkey = b.bkey),
         jj AS (SELECT nid,
                  len(list_filter(sa.shs, x -> list_contains(sb.shs, x))) * 1.0 AS inter,
                  len(sa.shs) + len(sb.shs) AS tot
                FROM cand JOIN ns2 sa ON nid = sa.doc_id
                          JOIN hs2 sb ON hid = sb.doc_id),
         dups AS (SELECT DISTINCT nid FROM jj
                  WHERE round(inter/(tot-inter), 4) >= 0.5)
         SELECT d.doc_id, md5(d.text) AS text_md5
         FROM nd d LEFT JOIN dups ON d.doc_id = dups.nid
         WHERE dups.nid IS NULL""",

    // q152: both dedup rounds replayed — round 1 (batch0 vs corpus
    // signatures), then round 2 (batch1 vs corpus ∪ batch0-SURVIVOR
    // signatures). The h2-prefixed history union is the signature
    // accumulation under test.
    "q152_stream_incdedup" ->
      s"""WITH nd0 AS (SELECT doc_id + 300000 AS doc_id,
                   array_to_string(list_reverse($toksSql), ' ') AS text
                 FROM documents WHERE doc_id % 13 = 0),
         nd1 AS (SELECT doc_id + 100000 AS doc_id, text FROM nd0),
         ${sigCtesFor("documents", "h")},
         ${sigCtesFor("nd0", "n")},
         ${sigCtesFor("nd1", "m")},
         cand0 AS (SELECT DISTINCT a.doc_id AS nid, b.doc_id AS hid
                   FROM nbands a JOIN hbands b
                   ON a.band = b.band AND a.bkey = b.bkey),
         jj0 AS (SELECT nid,
                   len(list_filter(sa.shs, x -> list_contains(sb.shs, x))) * 1.0 AS inter,
                   len(sa.shs) + len(sb.shs) AS tot
                 FROM cand0 JOIN ns2 sa ON nid = sa.doc_id
                            JOIN hs2 sb ON hid = sb.doc_id),
         dups0 AS (SELECT DISTINCT nid FROM jj0
                   WHERE round(inter/(tot-inter), 4) >= 0.5),
         s0 AS (SELECT d.doc_id, d.text FROM nd0 d
                LEFT JOIN dups0 ON d.doc_id = dups0.nid
                WHERE dups0.nid IS NULL),
         h2bands AS (SELECT * FROM hbands
                     UNION ALL
                     SELECT * FROM nbands
                     WHERE doc_id IN (SELECT doc_id FROM s0)),
         h2shs AS (SELECT doc_id, shs FROM hs2
                   UNION ALL
                   SELECT doc_id, shs FROM ns2
                   WHERE doc_id IN (SELECT doc_id FROM s0)),
         cand1 AS (SELECT DISTINCT a.doc_id AS nid, b.doc_id AS hid
                   FROM mbands a JOIN h2bands b
                   ON a.band = b.band AND a.bkey = b.bkey),
         jj1 AS (SELECT nid,
                   len(list_filter(sa.shs, x -> list_contains(sb.shs, x))) * 1.0 AS inter,
                   len(sa.shs) + len(sb.shs) AS tot
                 FROM cand1 JOIN ms2 sa ON nid = sa.doc_id
                            JOIN h2shs sb ON hid = sb.doc_id),
         dups1 AS (SELECT DISTINCT nid FROM jj1
                   WHERE round(inter/(tot-inter), 4) >= 0.5),
         s1 AS (SELECT d.doc_id, d.text FROM nd1 d
                LEFT JOIN dups1 ON d.doc_id = dups1.nid
                WHERE dups1.nid IS NULL)
         SELECT doc_id, md5(text) AS text_md5 FROM s0
         UNION ALL
         SELECT doc_id, md5(text) AS text_md5 FROM s1""",

    // q153: shingle-set overlap fraction, on strings (engine hashes —
    // q81 proves the representations agree).
    "q153_contamination_score" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          s AS (SELECT doc_id, ${shinglesSql(5)} AS shs FROM t),
          bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM s WHERE doc_id % 50 = 0),
          ex AS (SELECT doc_id, unnest(shs) AS sh FROM s),
          h AS (SELECT ex.doc_id, count(*) AS n
                FROM ex JOIN bsh USING (sh) GROUP BY ex.doc_id)
          SELECT s.doc_id,
                 CAST(len(shs) AS INTEGER) AS n_shingles,
                 CAST(coalesce(h.n, 0) AS INTEGER) AS n_hits,
                 CASE WHEN len(shs) = 0 THEN 0.0
                      ELSE round(CAST(coalesce(h.n, 0) AS DOUBLE) / len(shs), 4)
                 END AS contamination
          FROM s LEFT JOIN h ON s.doc_id = h.doc_id""",

    // q154: the same two robust aggregates relationally (quantile_cont
    // interpolates exactly as Spark's percentile — parity pinned since
    // q133).
    "q154_mad_outliers" ->
      """WITH m AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med
                    FROM documents GROUP BY lang),
          d AS (SELECT doc_id, documents.lang, n_chars,
                   abs(n_chars - med) AS adev
                FROM documents JOIN m ON documents.lang = m.lang),
          md AS (SELECT lang, quantile_cont(adev, 0.5) AS mad
                 FROM d GROUP BY lang)
          SELECT doc_id, d.lang, n_chars,
                 round(adev / nullif(mad, 0), 4) AS mad_score,
                 adev > 3 * mad AS outlier
          FROM d JOIN md ON d.lang = md.lang""",

    // q139: the same md5-rank window, relationally.
    "q139_stratified_take" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         WHERE rn <= 40""",

    // q160: identical rule to q139 — the aggregator must reproduce the
    // window sort exactly.
    "q160_stratified_take_agg" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         WHERE rn <= 40""",

    // q147: the distributed position assignment replayed as one global
    // window — identical total order (md5 hex is ASCII, so string
    // collation agrees byte-for-byte across engines).
    "q147_global_shuffle" ->
      """SELECT doc_id,
              CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   - 1 AS BIGINT) AS pos
         FROM documents"""
  )
}
