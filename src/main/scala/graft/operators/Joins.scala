package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as primitives, composed Spark-first
  * (SURVEY.md §7.3 preference: compose built-ins before custom plans).
  */
object Joins {

  /** As-of join: for every left row, attach the single right row with
    * the greatest `rightTime <= leftTime` for the same key (backward
    * as-of, the market-data/event-enrichment classic).
    *
    * Implementation is the union-window trick — ONE shuffle on
    * (key, time), no range-join explosion:
    *   tag rows; union; last_value of the right payload over a
    *   (key)-partitioned, time-ordered window; keep left rows.
    * A sort-merge range join would re-shuffle both sides AND re-scan
    * ranges; this streams each key's timeline once. Ties
    * (rightTime == leftTime) count as matches.
    *
    * Determinism: the payload travels as ONE struct column (all returned
    * fields always come from the SAME right row — per-column carries
    * could stitch fields from different rows through nulls), and the
    * window tiebreaks equal-(key, rightTime) right rows by the payload
    * struct's ordering, so the greatest payload wins reproducibly.
    *
    * `left`/`right` must share the key column name; right payload
    * columns are returned with their own names (null when no earlier
    * right row exists).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct.as("_p")).schema.head.dataType
    val leftCols = left.columns

    val l = left.withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
      .withColumn("_p", lit(null).cast(pType))
    val r0 = right.withColumn("_p", pStruct)
      .select(col(key), col(rightTime).as("_t"), col("_p"))
      .withColumn("_is_left", lit(0))
    val r = leftCols.foldLeft(r0) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = leftCols ++ Seq("_t", "_is_left", "_p")
    val both = l.select(cols.map(col).toSeq: _*)
      .unionByName(r.select(cols.map(col).toSeq: _*))

    // right rows sort BEFORE left rows at equal _t (so an equal-time
    // right row is visible to the left row); equal-time right rows sort
    // by payload struct so `last` picks the greatest deterministically;
    // last(ignoreNulls) carries the latest right payload forward.
    val w = Window.partitionBy(key)
      .orderBy(col("_t").asc, col("_is_left").asc, col("_p").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = both.withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
    carried.filter(col("_is_left") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"_asof.$c").as(c))).toSeq: _*)
  }

  /** [[asOfJoin]] with a staleness bound (pandas merge_asof
    * `tolerance`): the latest `rightTime <= leftTime` match is kept
    * only when it is at most `toleranceSec` old — otherwise the payload
    * is null, exactly as if no match existed. Null-out after the as-of
    * IS the exact semantics: as-of already picks the LATEST eligible
    * right row, and every other candidate is older still, so none can
    * be inside a tolerance the latest one missed. Same single-shuffle
    * union-window plan as [[asOfJoin]].
    */
  def asOfJoinWithin(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     payload: Seq[String], toleranceSec: Long): DataFrame = {
    val withT = right.withColumn("_asof_t", col(rightTime))
    val joined = asOfJoin(left, withT, key, leftTime, rightTime,
      payload :+ "_asof_t")
    val fresh = col("_asof_t").isNotNull &&
      unix_micros(col(leftTime).cast("timestamp")) -
        unix_micros(col("_asof_t").cast("timestamp")) <=
        toleranceSec * 1000000L
    payload.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }.drop("_asof_t")
  }

  /** Gap-fill / resample to a regular grid: one row per key per day
    * between the key's first and last event, carrying the day's last
    * observed value forward ([[asOfJoin]] against a generated daily
    * spine — the time-series regularization every dashboard and
    * feature-store pipeline runs before joins on aligned time).
    *
    * Scale shape: the spine generates from a |keys|-row aggregate
    * (sequence + explode — fan-out is days-per-key, data-proportional),
    * and the fill is the as-of union-window: ONE shuffle on the key.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String,
                   valCol: String): DataFrame = {
    val bounds = events.groupBy(col(keyCol))
      .agg(date_trunc("day", min(col(tsCol))).as("_d0"),
        date_trunc("day", max(col(tsCol))).as("_d1"))
    val spine = bounds.select(col(keyCol),
      explode(sequence(col("_d0"), col("_d1"),
        expr("interval 1 day"))).as("day"))
    // fill value = last event with ts <= end-of-day == as-of at
    // day + 1d - 1µs; equivalently as-of on the day truncation of the
    // event against the spine day works only for same-day events, so
    // join on the raw timeline: right time = ts, left time = day end.
    val dayEnd = spine.withColumn("_day_end",
      col("day") + expr("interval 1 day") - expr("interval 1 microsecond"))
    asOfJoin(dayEnd,
      events.select(col(keyCol), col(tsCol), col(valCol).as("fill_value")),
      keyCol, "_day_end", tsCol, Seq("fill_value"))
      .select(col(keyCol), col("day").cast("date").as("day"),
        col("fill_value"))
  }

  /** Regular-grid resampling with LINEAR interpolation —
    * [[gapFillDaily]]'s sibling for numeric series (the
    * InfluxDB/Timescale `interpolate(gapfill(...))` shape): per key, a
    * `stepSeconds` bucket spine spans the observed range, and each
    * bucket takes pv + (nv − pv)·(t − pt)/(nt − pt) between its
    * nearest past and future observations. Buckets outside the
    * observed interior (no past or no future neighbor) stay null —
    * strict interpolation, never extrapolation.
    *
    * Scale shape: ONE union of spine and observations, one shuffle on
    * the key, and two partition-local window passes (ascending carry
    * of the last past observation, descending carry of the first
    * future one) — the asOfJoin plan run in both directions without a
    * second shuffle. Equal-time ties: at a bucket that IS an
    * observation time, past carries the greatest (ts, value) struct
    * and future the smallest, and nt == pt short-circuits to pv — both
    * deterministic.
    */
  def interpolateLinear(events: DataFrame, keyCol: String, tsCol: String,
                        valCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"bad step $stepSeconds")
    val obs = events
      .select(col(keyCol).as("k"),
        unix_timestamp(col(tsCol)).as("t"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
    val spine = obs.groupBy("k")
      .agg((floor(min(col("t")) / stepSeconds) * stepSeconds).cast("long")
          .as("_t0"),
        (floor(max(col("t")) / stepSeconds) * stepSeconds).cast("long")
          .as("_t1"))
      .select(col("k"),
        explode(sequence(col("_t0"), col("_t1"), lit(stepSeconds))).as("t"))
    val u = spine
      .select(col("k"), col("t"), lit(1).as("_is_left"),
        lit(null).cast("struct<ot:bigint,v:double>").as("_p"))
      .unionByName(obs.select(col("k"), col("t"), lit(0).as("_is_left"),
        struct(col("t").as("ot"), col("v")).as("_p")))
    val wPrev = Window.partitionBy("k")
      .orderBy(col("t").asc, col("_is_left").asc, col("_p").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("k")
      .orderBy(col("t").desc, col("_is_left").asc, col("_p").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("_prev", last(col("_p"), ignoreNulls = true).over(wPrev))
      .withColumn("_next", last(col("_p"), ignoreNulls = true).over(wNext))
      .filter(col("_is_left") === 1)
      .select(col("k").as(keyCol), col("t").as("bucket_ts"),
        (round(
          when(col("_prev").isNull || col("_next").isNull, lit(null))
            .when(col("_next.ot") === col("_prev.ot"), col("_prev.v"))
            .otherwise(col("_prev.v") + (col("_next.v") - col("_prev.v")) *
              ((col("t") - col("_prev.ot")) /
                (col("_next.ot") - col("_prev.ot")))), 4) + lit(0.0))
          .as("v_interp"))
  }

  /** Range join (point-in-interval): match every left "point" row to
    * the right interval rows containing it ([startCol, endCol], same
    * `key`). The naive `ts BETWEEN s AND e` join has no equi condition
    * on time, so Spark plans a per-key scan of ALL intervals (or a
    * BroadcastNestedLoopJoin without the key) — quadratic at scale.
    *
    * This is the bucketized range-join shape warehouse engines use:
    * every interval EXPLODES to the time bins it covers, every point
    * maps to exactly one bin, the join becomes a hash equi-join on
    * (key, bin), and the exact range predicate refines the candidates.
    * Shuffled volume is O(points + Σ interval_bins); `binSeconds` near
    * the median interval length keeps the explode factor small. No
    * duplicate matches by construction: a point owns one bin and an
    * interval covers each of its bins once.
    */
  def rangeJoinBinned(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      key: String, binSeconds: Long): DataFrame = {
    def bin(c: Column): Column =
      floor(c.cast("timestamp").cast("long") / binSeconds)
    val p = points.withColumn("_bin", bin(col(tsCol)))
    val iv = intervals.withColumn("_bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(iv, Seq(key, "_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }

  /** Interval-overlap join: match left intervals [lStart, lEnd] to right
    * intervals [rStart, rEnd] that OVERLAP them (same `key`). Both sides
    * explode to their covered bins and meet on (key, bin); because an
    * overlapping pair shares every bin in the overlap region, the match
    * is kept only in the FIRST shared bin — `bin == max(bin(lStart),
    * bin(rStart))`, which both sides necessarily cover — so each pair
    * emits exactly once with NO distinct/dedup shuffle afterwards.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
                          right: DataFrame, rStart: String, rEnd: String,
                          key: String, binSeconds: Long): DataFrame = {
    def bin(c: Column): Column =
      floor(c.cast("timestamp").cast("long") / binSeconds)
    val l = left.withColumn("_bin",
      explode(sequence(bin(col(lStart)), bin(col(lEnd)))))
    val r = right.withColumn("_bin",
      explode(sequence(bin(col(rStart)), bin(col(rEnd)))))
    l.join(r, Seq(key, "_bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bin") === greatest(bin(col(lStart)), bin(col(rStart))))
      .drop("_bin")
  }

  /** Interval CONCURRENCY curve — how many intervals are open at every
    * boundary instant: the peak-concurrent-sessions / capacity-planning
    * question over event intervals, and byte-for-byte the same
    * algorithm as per-base read-depth in genomics (samtools depth):
    * each interval contributes (+1 at start, −1 at end), and the
    * running sum of boundary deltas in time order IS the curve.
    * Half-open [start, end): an interval releasing at t is processed
    * before one acquiring at t (deltas sort −1 first), so touching
    * intervals never double-count.
    *
    * A global running sum is the textbook case where `Window.orderBy`
    * without a partition key collapses to ONE task — this is instead
    * the two-phase distributed prefix sum (the [[Corpus.packChunks]]
    * shape): range-partition + sort the boundary events, ONE tiny job
    * collects per-partition (Σdelta, count) — #partitions scalars —
    * whose running totals broadcast back as each partition's depth and
    * position bases; a second narrow pass emits the running depth. A
    * timestamp's ties may straddle a range boundary, so the final
    * depth per instant is taken at the globally-last tie (max_by on
    * the global position), which is order-independent.
    * Emits one (t, depth) row per distinct boundary instant.
    */
  def concurrencyCurve(intervals: DataFrame, startCol: String,
                       endCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = intervals.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ev = intervals.select(col(startCol).as("t"), lit(1).as("delta"))
      .unionAll(intervals.select(col(endCol).as("t"), lit(-1).as("delta")))
    // pinned: the stats pass and the emit pass must see identical
    // partitions (range boundaries are sampled)
    val sorted = ev.repartitionByRange(n, col("t"), col("delta"))
      .sortWithinPartitions("t", "delta")
      .localCheckpoint()
    val deltaIdx = sorted.schema.fieldIndex("delta")
    val stats = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; var c = 0L
      it.foreach { r => s += r.getInt(deltaIdx); c += 1 }
      Iterator((i, s, c))
    }.collect().sortBy(_._1)
    val depthBases = stats.map(_._2).scanLeft(0L)(_ + _)
    val posBases = stats.map(_._3).scanLeft(0L)(_ + _)
    val basesBc = spark.sparkContext.broadcast((depthBases, posBases))
    val outSchema = sorted.schema
      .add("depth", LongType, nullable = false)
      .add("pos", LongType, nullable = false)
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var depth = basesBc.value._1(i)
      var pos = basesBc.value._2(i)
      it.map { r =>
        depth += r.getInt(deltaIdx); pos += 1
        Row.fromSeq(r.toSeq :+ depth :+ pos)
      }
    }
    spark.createDataFrame(rows, outSchema)
      .groupBy("t")
      .agg(max_by(col("depth"), col("pos")).as("depth"))
  }

  /** KEYED depth curve — per-base read depth per reference contig
    * (samtools depth), [[concurrencyCurve]]'s per-key sibling: one
    * (key, pos, depth) row for every position where the depth CHANGES
    * (net boundary delta ≠ 0), half-open [start, end).
    *
    * The naive keyed form is `Window.partitionBy(key).orderBy(pos)` —
    * one reducer PER KEY, which serializes on a hot chromosome (a
    * 100 TB alignment set concentrates billions of boundaries on each
    * of ~25 contigs). This instead runs the two-level tiled prefix
    * sum: positions bucket into 2^tileBits-wide tiles; tile-LOCAL
    * running sums are embarrassingly parallel (one window per
    * occupied (key, tile) — millions of independent partitions); each
    * tile's carry-in is the running sum of per-tile NET deltas, a
    * window over #tiles rows per key (genome/2^14 ≈ 2×10⁵ scalars —
    * metadata-sized, the only per-key serial step). Every shuffle is
    * an equi-key hash exchange; nothing sorts more than a tile.
    */
  def depthCurve(intervals: DataFrame, keyCol: String, startCol: String,
                 endCol: String, tileBits: Int = 14): DataFrame = {
    require(tileBits >= 1 && tileBits <= 40, s"bad tileBits $tileBits")
    val ev = intervals.select(col(keyCol).as("key"),
        col(startCol).cast("long").as("pos"), lit(1L).as("delta"))
      .unionAll(intervals.select(col(keyCol).as("key"),
        col(endCol).cast("long").as("pos"), lit(-1L).as("delta")))
    val net = ev.groupBy("key", "pos")
      .agg(sum("delta").as("net"))
      .filter(col("net") =!= 0)
      .withColumn("tile", shiftright(col("pos"), tileBits))
    // carry-in per tile: EXCLUSIVE running sum of tile net totals
    val tiles = net.groupBy("key", "tile").agg(sum("net").as("tnet"))
    val carryW = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("tile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val carry = tiles
      .withColumn("carry", coalesce(sum("tnet").over(carryW), lit(0L)))
      .select("key", "tile", "carry")
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("key", "tile").orderBy("pos")
    net.join(carry, Seq("key", "tile"))
      .withColumn("depth", sum("net").over(localW) + col("carry"))
      .select(col("key").as(keyCol), col("pos"), col("depth"))
  }

  /** SCD-2 point-in-time join: enrich each fact with the dimension
    * VERSION that was valid at the fact's timestamp (the slowly-
    * changing-dimension type-2 lookup every warehouse needs — joining
    * on the key alone silently multiplies facts by version count, or
    * attributes them to today's attributes).
    *
    * Scale shape: this is deliberately a plain EQUI-join on the
    * dimension key with the validity window as a residual predicate —
    * NOT a range join. Version count per key is small and bounded (a
    * dimension row changes a handful of times), so the equi-join's
    * per-key fan-out is bounded and Catalyst plans a hash/sort-merge
    * join, never a BNLJ (PlanSpec-asserted); [[rangeJoinBinned]] is
    * the tool when there is NO selective key and only the interval
    * relates the sides. Half-open windows `[from, to)` make versions
    * non-overlapping and exhaustive; facts outside every window drop
    * (inner semantics) — the caller can left-join against the output
    * to audit orphans.
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
                      tsCol: String, fromCol: String,
                      toCol: String): DataFrame =
    facts.join(dim,
      facts(key) === dim(key) &&
        facts(tsCol) >= dim(fromCol) && facts(tsCol) < dim(toCol))
      .drop(dim(key))

  /** Skew-safe equi join: salt the skewed (left) side's key into
    * `saltFactor` sub-keys and explode the build side to match — turns
    * one hot reducer into `saltFactor` even ones. (AQE's skew-join
    * handles moderate skew automatically; salting is the explicit tool
    * for pathological keys.)
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    // Salt = hash(hashable row columns, monotonically_increasing_id):
    // the id term spreads even byte-identical duplicate rows (the
    // classic hot-key shape — content-only hashing would send them all
    // to ONE salt and defeat the salting), the column terms decorrelate
    // adjacent ids, and the whole thing is deterministic for a
    // deterministic input plan (mii is a pure function of partition id
    // and row position). Map-typed columns are skipped — hash() rejects
    // them.
    val hashable = skewed.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    val salted = skewed.withColumn("_salt",
      pmod(hash((hashable :+ monotonically_increasing_id()): _*), lit(saltFactor)))
    val exploded = other.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Time-weighted average of `valCol` per `keyCol` — the metered-
    * quantity statistic (sensor readings, account balances, rate
    * limits): each observation holds until the next one, so its weight
    * is the microseconds until the key's next event, and
    * TWA = Σ vᵢ·Δtᵢ / Σ Δtᵢ. The plain mean over-counts bursts; TWA is
    * what "average level over the observation window" actually means.
    * The key's last event has no successor and carries zero weight.
    * Keys with a single event (no elapsed time) are dropped.
    *
    * Scale shape: ONE shuffle on the key + a partition-local time sort
    * for the lead() window — each key's timeline streams once, the same
    * shape as [[asOfJoin]]. Ties on ts are ordered by event id so the
    * integration order is deterministic.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(idCol).asc)
    // NTZ-safe: unix_micros wants TIMESTAMP; under the UTC session the
    // cast is the identity on the microsecond value.
    val us = unix_micros(col(tsCol).cast("timestamp"))
    events
      .withColumn("_dt", lead(us, 1).over(w) - us)
      .filter(col("_dt").isNotNull)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_intervals"),
        sum("_dt").as("span_us"),
        (round(sum(col(valCol) * col("_dt")) / sum(col("_dt")), 4) + lit(0.0))
          .as("twa"))
  }

  /** First-order Markov transition mining over per-key event timelines
    * (clickstream path analysis): count (state → next-state) steps and
    * the per-source transition probability. The per-key lead() is the
    * only wide stage over the raw events — the transition matrix itself
    * is |types|² rows, so the probability window is a no-op at scale.
    */
  def transitionCounts(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(idCol).asc)
    val steps = events
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val pw = Window.partitionBy("from_type")
    steps.withColumn("p",
      round(col("n").cast("double") / sum("n").over(pw), 4) + lit(0.0))
  }

  /** Order-n path mining — [[transitionCounts]]'s longer-memory
    * sibling: every n-step consecutive event-type path per key, counted
    * corpus-wide with the top-k kept. The discovery tool behind funnel
    * design (transitions say what follows one state; paths expose the
    * actual multi-step routes users take). Same single per-key window
    * shuffle — the n−1 lead() columns share one (key, time) sort — and
    * a TakeOrderedAndProject top-k, never a global sort.
    */
  def pathCounts(events: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, typeCol: String, steps: Int,
                 k: Int): DataFrame = {
    require(steps >= 2 && k >= 1, s"bad steps/k $steps/$k")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(idCol).asc)
    val withSteps = (1 until steps).foldLeft(events) { (df, i) =>
      df.withColumn(s"_s$i", lead(col(typeCol), i).over(w))
    }
    val stepCols = (1 until steps).map(i => col(s"_s$i"))
    withSteps
      // a null at the LAST lead implies nulls at all shorter horizons,
      // so one filter suffices (and runs on the materialized column —
      // window expressions are not allowed inside a filter directly)
      .filter(stepCols.last.isNotNull)
      .withColumn("path",
        concat_ws(">", (col(typeCol) +: stepCols): _*))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc).limit(k)
  }

  /** Retention cohort matrix — the product-analytics staple: users
    * grouped by first-seen week, distinct-active-user counts at each
    * week offset from their cohort. Two hash aggregations + one
    * equi-join on the user key; the matrix itself is
    * |cohorts|·|offsets| rows.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val cohorts = events.groupBy(col(userCol).as("u"))
      .agg(date_trunc("week", min(col(tsCol))).as("cw"))
    val active = events
      .select(col(userCol).as("u"), date_trunc("week", col(tsCol)).as("aw"))
      .distinct()
    active.join(cohorts, "u")
      .select(col("u"), col("cw"),
        ((unix_micros(col("aw").cast("timestamp")) -
          unix_micros(col("cw").cast("timestamp"))) / lit(604800000000L))
          .cast("int").as("week_offset"))
      .groupBy(col("cw").cast("date").as("cohort_week"), col("week_offset"))
      .agg(countDistinct("u").as("n_users"))
  }

  /** Conversion latency: time from a user's first `fromType` event to
    * their first LATER `toType` event, summarized as exact interpolated
    * percentiles (q77's definition — parity with the oracle's
    * quantile_cont is pinned). Per-user conditional mins in ONE
    * aggregation pass, then a single global percentile row.
    */
  def conversionLatency(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, fromType: String,
                        toType: String): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val perUser = events.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === fromType, us)).as("t_from"),
        min(when(col(typeCol) === toType, us)).as("t_to"))
      .filter(col("t_from").isNotNull && col("t_to").isNotNull &&
        col("t_to") > col("t_from"))
      .select(((col("t_to") - col("t_from")) / lit(1e6)).as("lat_s"))
    perUser.agg(count(lit(1)).as("n_converted"),
      (round(expr("percentile(lat_s, 0.5)"), 4) + lit(0.0)).as("p50_s"),
      (round(expr("percentile(lat_s, 0.9)"), 4) + lit(0.0)).as("p90_s"))
  }

  /** Coordinate LIFTOVER — map positions between assemblies through a
    * chain of ungapped alignment blocks (the UCSC liftOver primitive):
    * each chain row is a half-open source block
    * `[src_start, src_end)` on `src_chrom` mapping to `dst_chrom` at
    * `dst_start`, `strand` '+' for co-directional
    * (`dst = dst_start + (pos - src_start)`) or '-' for
    * reverse-complement blocks (`dst = dst_start + (src_end-1 -
    * pos)`). Positions outside every block come back with null
    * destination (LEFT join — unmapped is an answer, not a dropped
    * row). Blocks are assumed non-overlapping per source position, as
    * chain files guarantee.
    *
    * Scale shape: the genomic twin of [[rangeJoinBinned]] — blocks
    * explode over the fixed-width tiles they span
    * (`2^tileBits` bp), positions key by their single tile, and the
    * join is a plain equi-join on (chrom, tile) with the range
    * predicate as a post-filter. A chain is metadata-sized next to a
    * position table, so AQE broadcasts it; either way there is no
    * range-join explosion and no driver-side interval index.
    */
  def liftOver(positions: DataFrame, chromCol: String, posCol: String,
               chain: DataFrame, tileBits: Int = 20): DataFrame = {
    require(tileBits >= 1 && tileBits <= 40, s"bad tileBits $tileBits")
    val t = 1L << tileBits
    val p = positions.withColumn("_tile", floor(col(posCol) / t))
    val c = chain.select(
        col("src_chrom"), col("src_start").cast("long").as("_ss"),
        col("src_end").cast("long").as("_se"),
        col("dst_chrom").as("_dc"),
        col("dst_start").cast("long").as("_ds"), col("strand").as("_st"))
      .withColumn("_tile", explode(sequence(
        floor(col("_ss") / t), floor((col("_se") - 1) / t))))
    p.join(c,
        p(chromCol) === c("src_chrom") && p("_tile") === c("_tile") &&
          col(posCol) >= col("_ss") && col(posCol) < col("_se"),
        "left")
      .select(positions.columns.map(p(_)) ++ Seq(
        col("_dc").as("dst_chrom"),
        when(col("_dc").isNull, lit(null))
          .when(col("_st") === "-", col("_ds") + (col("_se") - 1 - col(posCol)))
          .otherwise(col("_ds") + (col(posCol) - col("_ss")))
          .as("dst_pos")): _*)
  }
}
