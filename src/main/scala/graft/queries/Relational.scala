package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.4-§2.8) expressed over the
  * harness tables: filters (F1), joins (J1 left-outer, J2 anti, semi),
  * aggregations (A3 distinct, A5 count, A8 SQL aggregates), sorts/limits
  * (O1/O2), set ops (§2.8 union), plus window/rollup extensions.
  *
  * Scale notes baked into each query:
  *  - filters/projections are plain Catalyst expressions so parquet scans
  *    get PushedFilters + pruned ReadSchema;
  *  - dimension sides of joins (region/nation/customer at 1000× lineitem
  *    smaller) are broadcast explicitly — no shuffle of the fact table;
  *  - aggregates are algebraic (sum/count/min/max) so partial aggregation
  *    (map-side combine) applies before the exchange;
  *  - double-typed aggregates are rounded to 2 decimals so results are
  *    stable under summation-order differences across partitionings.
  */
object Relational {

  private def r2(c: Column): Column = round(c, 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A8/F1: TPC-H Q1 shape — groupBy two low-cardinality keys, algebraic
    // aggregates only → partial agg + tiny shuffle regardless of input size.
    "q01_agg_sum" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          r2(sum("l_quantity")).as("sum_qty"),
          r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
          r2(avg("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n_rows"))
    },

    // k-anonymity audit (q330, r12): the privacy gate before a data
    // release — every (nation, segment) equivalence class with its
    // size, l-diversity on the account balance, and the k=25
    // suppression verdict. One hash-partitioned aggregation.
    "q330_k_anonymity" -> { (s, d) =>
      graft.operators.Curation.kAnonymity(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 25)
    },

    // F1 + column pruning: predicate and 3-column projection must reach the
    // parquet scan (PushedFilters / ReadSchema — verified in PlanSpec).
    "q02_filter_project" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    },

    // Broadcast join: customer is ~100× smaller than orders → broadcast hash
    // join, zero shuffle of the fact side at any scale where dim fits in mem.
    "q03_join_broadcast" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), r2(sum("o_totalprice")).as("total"))
    },

    // J1: left outer join (the reference's only shuffle join,
    // BlastNFilter.java:163-192 — contigs ⟕ hits, unmatched kept).
    "q04_left_outer_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
    },

    // J2: anti join — the scalable replacement for the reference's
    // collect()-to-driver id-list filter (FastaFilter.java:50-65).
    "q05_anti_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // Semi join (EXISTS shape).
    "q06_semi_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F").select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_acctbal")
    },

    // O1/O2: global sort + limit. Spark plans TakeOrderedAndProject —
    // per-partition top-k then a single-partition merge, no full sort at scale.
    "q07_sort_limit" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("price"))
        .limit(50)
    },

    // A3: distinct (NormalizeRDD.java:103 / FastqFilter dedup family).
    "q08_distinct" -> { (s, d) =>
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()
    },

    // Multi-way join: two broadcast dims + one shuffle join; Catalyst
    // reorders/selects strategies, AQE re-plans at runtime.
    "q09_multi_join" -> { (s, d) =>
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_orders"), r2(sum("o_totalprice")).as("total"))
    },

    // Window extension (§2.12 notes none in reference): top order per
    // customer, deterministic tiebreak on key.
    "q10_window_rank" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), r2(col("o_totalprice")).as("best_price"))
    },

    // §2.8 union (reference does it implicitly via glob reads).
    "q11_union" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val hi = li.filter(col("l_quantity") >= 40).select(col("l_orderkey"), lit("hi").as("band"))
      val lo = li.filter(col("l_quantity") <= 5).select(col("l_orderkey"), lit("lo").as("band"))
      hi.unionAll(lo).groupBy("band").agg(count(lit(1)).as("n"))
    },

    // A8: exact distinct count (SQLQueryFastq.java:93's documented
    // `count(DISTINCT sequence)` shape).
    "q12_count_distinct" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             count(lit(1)).as("n_rows"))
    },

    // Conditional aggregation (pivot shape without the pivot operator).
    "q13_case_agg" -> { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
    },

    // The ACTUAL pivot operator (q150) — q13 is the conditional-agg
    // twin; this is the `Dataset.pivot` relational surface, with the
    // pivot values given explicitly (at scale, never let pivot infer
    // values: that is an extra distinct scan AND a nondeterministic
    // column order). Missing cells coalesce to 0 to match the
    // conditional-agg oracle.
    "q150_pivot" -> { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
    },

    // Set operators beyond UNION (q151): INTERSECT/EXCEPT distinct
    // semantics — both implement as hash aggregates over a shuffle on
    // the full row, the same scale shape as q08's distinct.
    "q151_set_ops" -> { (s, d) =>
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val heavy = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("o_orderkey"))
      urgent.intersect(heavy).withColumn("band", lit("both"))
        .unionByName(urgent.except(heavy).withColumn("band", lit("urgent_only")))
    },

    // Rollup (grouping-sets extension; NULL-filled subtotal rows).
    "q14_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), r2(sum("l_quantity")).as("qty"))
    },

    // CUBE (q155): all 2^k grouping sets — rollup's full-lattice
    // sibling, one Expand + hash agg (never k separate scans).
    "q155_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), r2(sum("l_quantity")).as("qty"))
    },

    // Null-safe join (q171): `<=>` treats NULL as a joinable key value
    // (standard `=` drops NULL keys silently — the classic lost-rows
    // bug when a dimension key is nullable). Orders with status P get
    // a planted NULL key and must still find their dimension row.
    "q171_nullsafe_join" -> { (s, d) =>
      val facts = Tables.orders(s, d)
        .select(nullif(col("o_orderstatus"), lit("P")).as("k"),
          col("o_totalprice"))
      val dim = Tables.orders(s, d)
        .select(nullif(col("o_orderstatus"), lit("P")).as("dk"))
        .distinct()
        .withColumn("label", coalesce(col("dk"), lit("UNKNOWN")))
      facts.join(dim, facts("k") <=> dim("dk"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), r2(sum("o_totalprice")).as("total"))
    },

    // GROUPING() disambiguation (q168): rollup subtotal rows carry
    // NULL in the rolled-up column — indistinguishable from a genuine
    // NULL group without the grouping flag. The flags make subtotal
    // rows self-describing, which any BI layer over a 2^k lattice
    // needs.
    "q168_grouping_id" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
    },

    // Arbitrary GROUPING SETS (q173): the lattice rollup/cube can't
    // express — (flag, status), (flag), (status), but NOT the grand
    // total. One scan + one Expand (3 replicas) + one hash agg, same
    // physical shape as cube with a smaller lattice; grouping flags
    // make the mixed NULLs self-describing (q168's rule: flags must
    // live inside the agg).
    "q173_grouping_sets" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          r2(sum("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
    },

    // SCD-2 point-in-time join (q180): each order enriched with the
    // customer-segment VERSION valid on its order date — equi-join on
    // the key, validity window as residual (never a range/BNL join;
    // version count per key is bounded). Three synthetic versions per
    // customer with half-open windows covering 1992-1998.
    "q180_scd2_join" -> { (s, d) =>
      def ts(x: String) = lit(x).cast("timestamp")
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("key"), col("c_mktsegment"),
          explode(array(
            struct(lit("").as("sfx"),
              ts("1990-01-01").as("vfrom"), ts("1994-01-01").as("vto")),
            struct(lit("_v2").as("sfx"),
              ts("1994-01-01").as("vfrom"), ts("1996-07-01").as("vto")),
            struct(lit("_v3").as("sfx"),
              ts("1996-07-01").as("vfrom"), ts("2000-01-01").as("vto"))))
            .as("v"))
        .select(col("key"),
          concat(col("c_mktsegment"), col("v.sfx")).as("segment"),
          col("v.vfrom"), col("v.vto"))
      val facts = Tables.orders(s, d)
        .select(col("o_custkey").as("key"), col("o_orderdate"),
          col("o_totalprice"))
      graft.operators.Joins
        .pointInTimeJoin(facts, dim, "key", "o_orderdate", "vfrom", "vto")
        .groupBy("segment")
        .agg(count(lit(1)).as("n_orders"), r2(sum("o_totalprice")).as("total"))
    },

    // Bivariate statistics (q163): correlation + sample covariance per
    // group — the profiling step that finds which quality signals are
    // redundant. One partial-aggregable pass (corr/covar are algebraic:
    // sums of x, y, xy, x², y² merge associatively — map-side combine
    // applies exactly as for sum/count).
    "q163_corr_stats" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4)
            .as("cov_qty_disc"))
    },

    // Window-function suite (q167): the ranking family beyond q10's
    // row_number — dense_rank, percent_rank, ntile quartiles, and
    // first_value, all over one partition spec (ONE window sort
    // serves all four; Catalyst groups same-spec window exprs).
    "q167_window_suite" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        dense_rank().over(w).as("drank"),
        round(percent_rank().over(w), 4).as("prank"),
        ntile(4).over(w).as("quartile"),
        first_value(col("o_orderkey")).over(w).as("top_key"))
    },

    // UNPIVOT (q164): pivot's inverse — wide per-status counts melt
    // back to (priority, status, n) long form. Spark's unpivot is a
    // narrow Expand (rows × k), no shuffle beyond the q13-style agg
    // that feeds it.
    "q164_unpivot" -> { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("F"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("O"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("P"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")),
          "o_orderstatus", "n")
    },

    // HAVING shape.
    "q15_having" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 3)
    },

    // Sketch aggregates (HLL cardinality + approximate quantiles):
    // engine-specific sketch VALUES can't hash-match another engine, so
    // — q101-style — the output is the exact values plus boolean
    // within-bounds flags for the sketches (the oracle emits the same
    // exacts + literal true). HLL at rsd 0.01 gets a 5% bound (5
    // sigma); percentile_approx at accuracy 1000 has rank error ≤ 0.1%
    // of n, so a 5% relative-value bound is generous for these smooth
    // price distributions. Register-max HLL merge and per-group GK
    // sketch compaction are order-insensitive enough that the FLAGS are
    // deterministic even where the raw sketch values wobble a last ulp.
    "q47_sketches" -> { (s, d) =>
      def relOk(apx: Column, exact: Column): Column =
        when(exact === 0d, apx === 0d)
          .otherwise(abs(apx - exact) / abs(exact) <= 0.05)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count_distinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.01).as("_apx_parts"),
          expr("percentile(l_extendedprice, 0.5)").as("_p50_exact"),
          expr("percentile(l_extendedprice, 0.99)").as("_p99_exact"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("_p50_apx"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
            .as("_p99_apx"))
        .select(col("l_returnflag"), col("exact_parts"),
          round(col("_p50_exact"), 4).as("p50_exact"),
          round(col("_p99_exact"), 4).as("p99_exact"),
          relOk(col("_apx_parts").cast("double"),
            col("exact_parts").cast("double")).as("hll_ok"),
          relOk(col("_p50_apx"), col("_p50_exact")).as("p50_ok"),
          relOk(col("_p99_apx"), col("_p99_exact")).as("p99_ok"))
    },

    // The EXACT twin of q47's sketches: `percentile` (linear
    // interpolation) is cross-engine deterministic, so unlike the
    // approx forms it gets a full hash oracle (DuckDB quantile_cont
    // uses the identical interpolation).
    "q77_exact_quantiles" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("q25_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_quantity, 0.99)"), 4).as("p99_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"))
    },

    // Skew-tooling: salted join must produce exactly the plain-join
    // result (the oracle IS the plain join) while spreading any hot key
    // over saltFactor reducers.
    "q46_salted_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.operators.Joins.saltedJoin(li, p, "l_partkey", saltFactor = 8)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    },

    // Scalar subquery against an exact aggregate (max is order-insensitive,
    // so the derived threshold is bit-identical across engines). ONE
    // Catalyst plan: the 1-row aggregate broadcast-cross-joins the scan —
    // no driver-side action, no second job.
    "q16_scalar_subquery" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val threshold = o.agg((max("o_totalprice") * 0.9).as("_threshold"))
      o.crossJoin(broadcast(threshold))
        .filter(col("o_totalprice") > col("_threshold"))
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("price"))
    },

    // Date-part aggregation over timestamps (UTC session).
    "q17_date_agg" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), r2(sum("o_totalprice")).as("total"))
    },

    // F1/A8/O1 through the SQL SURFACE itself: register temp views and
    // run user SQL — the reference's entire query lifecycle
    // (SQLQueryFastq.java:91-99: registerTempTable + sqlContext.sql).
    "q19_sql_surface" -> { (s, d) =>
      graft.Tables.registerAll(s, d)
      s.sql(
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                  round(sum(l_extendedprice), 2) AS total
           FROM lineitem
           WHERE l_quantity > 10
           GROUP BY l_returnflag
           ORDER BY l_returnflag""")
    },

    // Join + agg + sort + limit combined (top-selling parts).
    "q18_topk_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_partkey", "p_name")
        .agg(r2(sum(col("l_extendedprice"))).as("revenue"), count(lit(1)).as("n_sold"))
        .orderBy(col("n_sold").desc, col("p_partkey").asc)
        .limit(100)
    },

    // Column profiling (q133): per-column counts/range/exact-median for
    // four lineitem columns in ONE aggregation pass (multi-distinct via
    // a single Expand; the 1-row result explodes to a row per column).
    "q133_profile" -> { (s, d) =>
      graft.operators.Profile.summarize(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount"))
    },

    // Entity resolution (q193): the customer file with planted noisy
    // duplicates (every 10th record re-keyed, one name character
    // dropped, balance shifted by 0.05), blocked on (nation, segment),
    // Fellegi-Sunter-style tiered scoring: exact name +4 XOR typo-band
    // levenshtein 1-2 +3, balance within 0.10 +2; matches at score >= 5.
    // The planted pairs land at exactly 3 + 2 = 5.
    "q193_entity_res" -> { (s, d) =>
      import graft.operators.EntityResolution._
      val base = Tables.customer(s, d).select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").as("nation"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("segment"))
      val dups = base.filter(col("id") % 10 === 0).select(
        (col("id") + 1000000).as("id"),
        concat(substring(col("name"), 1, 8), substring(col("name"), 10, 32))
          .as("name"),
        col("nation"), (col("bal") + lit(0.05)).as("bal"), col("segment"))
      resolve(base.unionByName(dups), "id", Seq("nation", "segment"),
        Seq(exactRule("name", 4), fuzzyRule("name", 3, maxDist = 2),
          numericRule("bal", 2, tol = 0.10)),
        threshold = 5)
    },

    // Winsorized group stats (q218): values clamped into the exact
    // [p01, p99] band before averaging — the robust mean that
    // neutralizes extremes without dropping rows (q154's MAD flags
    // them; this is the complementary fix).
    "q218_winsorize" -> { (s, d) =>
      graft.operators.Profile.winsorizedStats(Tables.lineitem(s, d),
        "l_returnflag", "l_extendedprice", pLo = 0.01, pHi = 0.99)
    },

    // Correlation matrix (q219): all 6 pairwise Pearson coefficients
    // over 4 lineitem measures in ONE aggregation pass.
    "q219_corr_matrix" -> { (s, d) =>
      graft.operators.Profile.corrMatrix(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    },

    // Constraint audit (q214): the data-quality gate before publishing
    // a snapshot — key uniqueness, NOT NULL, two foreign keys, and two
    // range checks, each an independent agg/anti-join; |checks| rows.
    "q214_constraint_audit" -> { (s, d) =>
      import graft.operators.Profile._
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      val lineitem = Tables.lineitem(s, d)
      constraintAudit(Seq(
        unique(orders, "o_orderkey"),
        notNull(customer, "c_name"),
        foreignKey(orders, "o_custkey", customer, "c_custkey"),
        foreignKey(lineitem, "l_orderkey", orders, "o_orderkey"),
        inRange(lineitem, "l_quantity", 1, 40),
        inRange(customer, "c_acctbal", 0, 1e9)))
    },

    // FK discovery (q242): inclusion-dependency scoring over an
    // undocumented lake — distinct-value containment ranks candidate
    // (child → parent) relationships. Three real TPC-H FKs must score
    // 1.0 and verdict true; the decoy (part.p_size → nation key) has
    // overlapping small-int domains but poor containment and must NOT
    // pass. The oracle replays every containment as scalar subqueries.
    "q242_fk_discovery" -> { (s, d) =>
      graft.operators.Profile.fkDiscovery(Seq(
        ("orders.o_custkey->customer.c_custkey",
          Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
          Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        ("customer.c_nationkey->nation.n_nationkey",
          Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"),
        ("part.p_size->nation.n_nationkey",
          Tables.part(s, d), "p_size",
          Tables.nation(s, d), "n_nationkey")))
    },

    // Golden-record survivorship (q210): the step AFTER matching —
    // match pairs close transitively (connectedComponents, so chained
    // matches land in one cluster), unmatched records keep themselves,
    // and each cluster emits one golden record by rule: min-id member's
    // name/segment, max balance, member count. The oracle replays the
    // ER scoring + a recursive transitive closure + arg_min rules.
    "q210_survivorship" -> { (s, d) =>
      import graft.operators.EntityResolution._
      val base = Tables.customer(s, d).select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").as("nation"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("segment"))
      val dups = base.filter(col("id") % 10 === 0).select(
        (col("id") + 1000000).as("id"),
        concat(substring(col("name"), 1, 8), substring(col("name"), 10, 32))
          .as("name"),
        col("nation"), (col("bal") + lit(0.05)).as("bal"), col("segment"))
      val recs = base.unionByName(dups)
      val matches = resolve(recs, "id", Seq("nation", "segment"),
        Seq(exactRule("name", 4), fuzzyRule("name", 3, maxDist = 2),
          numericRule("bal", 2, tol = 0.10)), threshold = 5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val cc = graft.operators.Dedup.connectedComponents(matches)
        .select(col("doc_id").as("id"), col("cluster_id"))
      recs.join(cc, Seq("id"), "left")
        .withColumn("cluster", coalesce(col("cluster_id"), col("id")))
        .groupBy(col("cluster").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          expr("min_by(name, id)").as("name"),
          max("bal").as("max_bal"),
          expr("min_by(segment, id)").as("segment"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q330_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
              CAST(count(*) AS BIGINT) AS class_size,
              CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_diversity,
              count(*) < 25 AS suppressed
         FROM customer GROUP BY 1, 2""",
    // q242: each candidate's containment replayed as distinct-count
    // scalar subqueries over string-cast keys (matching the operator's
    // type-erasing cast).
    "q242_fk_discovery" -> {
      def row(name: String, ct: String, cc: String, pt: String,
              pc: String): String =
        s"""SELECT '$name' AS candidate,
              (SELECT CAST(count(DISTINCT CAST($cc AS VARCHAR)) AS BIGINT)
               FROM $ct WHERE $cc IS NOT NULL) AS n_child,
              (SELECT CAST(count(*) AS BIGINT) FROM
                 (SELECT DISTINCT CAST($cc AS VARCHAR) AS k FROM $ct
                  WHERE $cc IS NOT NULL) c
               WHERE c.k IN (SELECT CAST($pc AS VARCHAR) FROM $pt
                             WHERE $pc IS NOT NULL)) AS n_contained,
              0.0 AS containment, false AS is_fk"""
      // containment/is_fk recomputed in the outer select so the inner
      // rows stay readable
      s"""WITH raw AS (
            ${row("orders.o_custkey->customer.c_custkey",
              "orders", "o_custkey", "customer", "c_custkey")}
            UNION ALL
            ${row("lineitem.l_orderkey->orders.o_orderkey",
              "lineitem", "l_orderkey", "orders", "o_orderkey")}
            UNION ALL
            ${row("customer.c_nationkey->nation.n_nationkey",
              "customer", "c_nationkey", "nation", "n_nationkey")}
            UNION ALL
            ${row("part.p_size->nation.n_nationkey",
              "part", "p_size", "nation", "n_nationkey")})
          SELECT candidate, n_child, n_contained,
               round(n_contained * 1.0 / greatest(n_child, 1), 4) + 0.0
                 AS containment,
               round(n_contained * 1.0 / greatest(n_child, 1), 4) >= 0.99
                 AS is_fk
          FROM raw"""
    },
    "q01_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
         round(avg(l_quantity),2) AS avg_qty,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
         WHERE l_quantity > 30 AND l_shipdate < TIMESTAMP '1997-01-01'""",
    "q03_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q04_left_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q06_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q07_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""",
    "q08_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q09_multi_join" ->
      """SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS best_price
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders) t WHERE rn = 1""",
    "q11_union" ->
      """SELECT band, count(*) AS n FROM (
           SELECT l_orderkey, 'hi' AS band FROM lineitem WHERE l_quantity >= 40
           UNION ALL
           SELECT l_orderkey, 'lo' AS band FROM lineitem WHERE l_quantity <= 5
         ) u GROUP BY band""",
    "q12_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q13_case_agg" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority""",
    "q150_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority""",
    "q151_set_ops" ->
      """WITH u AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
              h AS (SELECT l_orderkey AS o_orderkey FROM lineitem WHERE l_quantity >= 45)
         SELECT o_orderkey, 'both' AS band FROM (SELECT * FROM u INTERSECT SELECT * FROM h)
         UNION ALL
         SELECT o_orderkey, 'urgent_only' AS band FROM (SELECT * FROM u EXCEPT SELECT * FROM h)""",
    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q155_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q171_nullsafe_join" ->
      """WITH f AS (SELECT nullif(o_orderstatus, 'P') AS k, o_totalprice FROM orders),
              d AS (SELECT DISTINCT nullif(o_orderstatus, 'P') AS dk FROM orders)
         SELECT coalesce(dk, 'UNKNOWN') AS label,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM f JOIN d ON f.k IS NOT DISTINCT FROM d.dk
         GROUP BY 1""",
    "q168_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
              CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
              CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q173_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
              round(sum(l_quantity), 2) AS sum_qty,
              CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
              CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus))""",
    "q180_scd2_join" ->
      """WITH dim AS (
           SELECT c_custkey AS key, c_mktsegment || sfx AS segment,
                  CAST(vfrom AS TIMESTAMP) AS vfrom,
                  CAST(vto AS TIMESTAMP) AS vto
           FROM customer,
                (VALUES ('', '1990-01-01', '1994-01-01'),
                        ('_v2', '1994-01-01', '1996-07-01'),
                        ('_v3', '1996-07-01', '2000-01-01'))
                  AS v(sfx, vfrom, vto))
         SELECT d.segment, count(*) AS n_orders,
                round(sum(o.o_totalprice), 2) AS total
         FROM orders o JOIN dim d ON o.o_custkey = d.key
           AND o.o_orderdate >= d.vfrom AND o.o_orderdate < d.vto
         GROUP BY 1""",
    "q163_corr_stats" ->
      """SELECT l_returnflag, count(*) AS n,
              round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
              round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
         FROM lineitem GROUP BY l_returnflag""",
    "q167_window_suite" ->
      """SELECT o_orderkey, o_orderpriority,
              CAST(dense_rank() OVER win AS INTEGER) AS drank,
              round(percent_rank() OVER win, 4) AS prank,
              CAST(ntile(4) OVER win AS INTEGER) AS quartile,
              first_value(o_orderkey) OVER win AS top_key
         FROM orders
         WINDOW win AS (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey)""",
    "q164_unpivot" ->
      """WITH w AS (SELECT o_orderpriority,
              CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
              CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
              CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS p
              FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, 'F' AS o_orderstatus, f AS n FROM w
         UNION ALL
         SELECT o_orderpriority, 'O', o FROM w
         UNION ALL
         SELECT o_orderpriority, 'P', p FROM w""",
    "q15_having" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders
         GROUP BY o_custkey HAVING count(*) >= 3""",
    "q46_salted_join" ->
      """SELECT p_brand, count(*) AS n, round(sum(l_quantity),2) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    // q47: exact values hash-compare; the sketch accuracy flags are
    // literal true on the oracle side (q101 pattern — the engine side
    // computes them from the actual sketches).
    "q47_sketches" ->
      """SELECT l_returnflag,
              count(DISTINCT l_partkey) AS exact_parts,
              round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS p50_exact,
              round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 4) AS p99_exact,
              true AS hll_ok, true AS p50_ok, true AS p99_ok
         FROM lineitem GROUP BY l_returnflag""",
    "q77_exact_quantiles" ->
      """SELECT l_returnflag,
              round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 4) AS q25_qty,
              round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 4) AS median_qty,
              round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.99), 4) AS p99_qty,
              round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS median_price
         FROM lineitem GROUP BY l_returnflag""",
    "q16_scalar_subquery" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
         WHERE o_totalprice > (SELECT max(o_totalprice)*0.9 FROM orders)""",
    "q17_date_agg" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo,
         count(*) AS n, round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY 1, 2""",
    "q19_sql_surface" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                round(sum(l_extendedprice), 2) AS total
         FROM lineitem WHERE l_quantity > 10
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q18_topk_join" ->
      """SELECT p_partkey, p_name, round(sum(l_extendedprice),2) AS revenue, count(*) AS n_sold
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_partkey, p_name
         ORDER BY n_sold DESC, p_partkey ASC LIMIT 100""",
    // q133: per-column profile — quantile_cont is DuckDB's exact
    // interpolated median, the same p·(n−1) definition as Spark's
    // percentile (parity already pinned by q15).
    "q133_profile" -> {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
              count(*) AS n_rows,
              count(*) - count($c) AS n_nulls,
              count(DISTINCT $c) AS n_distinct,
              CAST(min($c) AS DOUBLE) AS min_v,
              CAST(max($c) AS DOUBLE) AS max_v,
              round(quantile_cont(CAST($c AS DOUBLE), 0.5), 4) AS p50
         FROM lineitem"""
      }.mkString(" UNION ALL ")
    },

    // q193: fixture + blocking + tiered scoring replayed; the balance
    // comparison is the same raw-double abs-diff both sides (identical
    // IEEE operand bits => identical compare, no rounding involved).
    "q193_entity_res" ->
      """WITH base AS (SELECT c_custkey AS id, c_name AS name,
               c_nationkey AS nation, c_acctbal AS bal,
               c_mktsegment AS segment FROM customer),
         dups AS (SELECT id + 1000000 AS id,
                  substr(name, 1, 8) || substr(name, 10) AS name,
                  nation, bal + 0.05 AS bal, segment
                FROM base WHERE id % 10 = 0),
         r AS (SELECT * FROM base UNION ALL SELECT * FROM dups),
         p AS (SELECT a.id AS id_a, b.id AS id_b,
                 (CASE WHEN a.name = b.name THEN 4 ELSE 0 END) +
                 (CASE WHEN levenshtein(a.name, b.name) BETWEEN 1 AND 2
                       THEN 3 ELSE 0 END) +
                 (CASE WHEN abs(a.bal - b.bal) <= 0.10 THEN 2 ELSE 0 END)
                   AS score
               FROM r a JOIN r b
               ON a.nation = b.nation AND a.segment = b.segment
                  AND a.id < b.id)
         SELECT id_a, id_b, CAST(score AS INTEGER) AS score
         FROM p WHERE score >= 5""",

    // q218: quantile_cont == Spark percentile (pinned by q15); same
    // clamp + mean arithmetic.
    "q218_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.01) AS lo,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99) AS hi
             FROM lineitem GROUP BY 1)
         SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
              round(min(b.lo), 4) + 0.0 AS lo,
              round(min(b.hi), 4) + 0.0 AS hi,
              round(avg(greatest(b.lo, least(b.hi, l.l_extendedprice))), 4)
                + 0.0 AS wins_mean
         FROM lineitem l JOIN b USING (l_returnflag)
         GROUP BY 1""",

    // q219: per-pair corr (sample Pearson both engines, parity pinned
    // by q163).
    "q219_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      (for { i <- cols.indices; j <- (i + 1) until cols.size } yield
        s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
              round(corr(${cols(i)}, ${cols(j)}), 4) + 0.0 AS r
         FROM lineitem""").mkString(" UNION ALL ")
    },

    // q214: each check replayed as its own scalar count.
    "q214_constraint_audit" ->
      """SELECT 'unique(o_orderkey)' AS check_name,
              CAST(coalesce((SELECT sum(n) FROM (
                SELECT count(*) AS n FROM orders GROUP BY o_orderkey
                HAVING count(*) > 1)), 0) AS BIGINT) AS violations
         UNION ALL
         SELECT 'not_null(c_name)',
              (SELECT count(*) FROM customer WHERE c_name IS NULL)
         UNION ALL
         SELECT 'fk(o_custkey->c_custkey)',
              (SELECT count(*) FROM orders o
               WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
                 SELECT 1 FROM customer c
                 WHERE c.c_custkey = o.o_custkey))
         UNION ALL
         SELECT 'fk(l_orderkey->o_orderkey)',
              (SELECT count(*) FROM lineitem l
               WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS (
                 SELECT 1 FROM orders o
                 WHERE o.o_orderkey = l.l_orderkey))
         UNION ALL
         SELECT 'range(l_quantity)',
              (SELECT count(*) FROM lineitem
               WHERE l_quantity IS NOT NULL
                 AND (l_quantity < 1 OR l_quantity > 40))
         UNION ALL
         SELECT 'range(c_acctbal)',
              (SELECT count(*) FROM customer
               WHERE c_acctbal IS NOT NULL
                 AND (c_acctbal < 0 OR c_acctbal > 1000000000.0))""",

    // q210: ER scoring replayed, then a recursive transitive closure
    // (q66's reach shape), singletons self-clustered, arg_min
    // survivorship rules. max_bal is the raw double — identical operand
    // bits both engines, no rounding involved.
    "q210_survivorship" ->
      """WITH RECURSIVE
         base AS (SELECT c_custkey AS id, c_name AS name,
               c_nationkey AS nation, c_acctbal AS bal,
               c_mktsegment AS segment FROM customer),
         dups AS (SELECT id + 1000000 AS id,
                  substr(name, 1, 8) || substr(name, 10) AS name,
                  nation, bal + 0.05 AS bal, segment
                FROM base WHERE id % 10 = 0),
         r AS (SELECT * FROM base UNION ALL SELECT * FROM dups),
         p AS (SELECT a.id AS id_a, b.id AS id_b,
                 (CASE WHEN a.name = b.name THEN 4 ELSE 0 END) +
                 (CASE WHEN levenshtein(a.name, b.name) BETWEEN 1 AND 2
                       THEN 3 ELSE 0 END) +
                 (CASE WHEN abs(a.bal - b.bal) <= 0.10 THEN 2 ELSE 0 END)
                   AS score
               FROM r a JOIN r b
               ON a.nation = b.nation AND a.segment = b.segment
                  AND a.id < b.id),
         m AS (SELECT id_a, id_b FROM p WHERE score >= 5),
         edges AS (SELECT id_a AS u, id_b AS v FROM m
                   UNION SELECT id_b, id_a FROM m),
         en AS (SELECT DISTINCT u FROM edges),
         reach(u, v) AS (SELECT u, u FROM en
                         UNION
                         SELECT t.u, e.v FROM reach t
                         JOIN edges e ON t.v = e.u),
         cl AS (SELECT u AS id, min(v) AS cluster FROM reach GROUP BY u),
         wc AS (SELECT r.*, coalesce(cl.cluster, r.id) AS cluster
                FROM r LEFT JOIN cl ON r.id = cl.id)
         SELECT cluster AS cluster_id,
              CAST(count(*) AS BIGINT) AS n_members,
              arg_min(name, id) AS name,
              max(bal) AS max_bal,
              arg_min(segment, id) AS segment
         FROM wc GROUP BY cluster"""
  )
}
