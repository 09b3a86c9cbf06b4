package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Relational
import QueryHelpers._

/** Operator coverage over the `events` table: envelope/JSON extraction,
  * latest-batch snapshots, GROUP-BY-dedup + whole-partition LAST_VALUE, and
  * keep-first-per-key (SURVEY §2.2 P1, §2.3 J1, §2.5 W1-W3, §2.6 O5).
  * Timestamps are emitted as epoch microseconds for cross-engine parity
  * (parquet ns vs Spark µs precision).
  */
object EventQueries {

  val defs: Map[String, QueryFn] = Map(
    // First-order next-item transition model (the Markov-chain sequential
    // recommender baseline): consecutive props.k pairs inside a 30-min
    // session gap, counted and conditioned — P(next | current) as one
    // IEEE division of exact longs. Two shuffles total: user window +
    // the src-keyed repartition that serves both the pair count and the
    // out-degree window (subset-key clustering, the Cooccur trick).
    "q146_transitions" -> { (s, d) =>
      val ev = table(s, d, "events").select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        unix_micros(col("ts")).as("ts_us"))
      graft.rank.Markov.transitions(ev, "user_id", "item", "ts_us",
          "event_id", gap = 1800000000L)
        .orderBy(col("src_item"), col("dst_item"))
    },

    // Time-decayed item popularity (the cold-start fallback ranker):
    // weight halves every 7 whole days from the corpus max timestamp,
    // clamped at 40 doublings — every weight is the exact long
    // 2^(40 − e), so the score is an exact integer sum and the whole
    // ranking hash-replays (the DataMix quantization idea applied to
    // recency decay). 1-row broadcast anchor + one partial-agg groupBy.
    "q147_decayed_pop" -> { (s, d) =>
      val ev = table(s, d, "events").select(
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        unix_micros(col("ts")).as("ts_us"))
      graft.rank.Popularity.decayedScores(ev, "item", "ts_us", halfLifeDays = 7)
        .orderBy(col("score_scaled").desc, col("item"))
    },

    // Sequential-recommendation evaluation: train the Markov transition
    // model on events before the cut, score next-item hit@3 on the test
    // pairs after it, against the top-3-popularity baseline — the
    // "does sequence beat popularity" number every session-rec paper
    // reports. Test-pair multiplicities ride the transition counts, so
    // every cell is an exact long and the two rates are single IEEE
    // divisions.
    "q159_markov_eval" -> { (s, d) =>
      import graft.rank.Markov
      val cutUs = java.time.LocalDateTime.of(2024, 1, 25, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val ev = table(s, d, "events").select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        unix_micros(col("ts")).as("ts_us"))
      val gap = 86400000000L
      val train = ev.filter(col("ts_us") < cutUs)
      val test = ev.filter(col("ts_us") >= cutUs)
      val model3 = Markov.nextItems(
          Markov.transitions(train, "user_id", "item", "ts_us", "event_id", gap), 3)
        .select(col("src_item"), col("dst_item"))
      val pop3 = train.groupBy(col("item")).agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("item").asc).limit(3)
        .select(col("item").as("dst_item"))
      val testPairs = Markov
        .transitions(test, "user_id", "item", "ts_us", "event_id", gap)
        .select(col("src_item"), col("dst_item"), col("n"))
      val total = testPairs.agg(sum(col("n")).as("n_test"))
      val hitsM = testPairs.join(model3, Seq("src_item", "dst_item"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_hit_markov"))
      val hitsP = testPairs.join(broadcast(pop3), Seq("dst_item"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_hit_pop"))
      total.join(broadcast(hitsM)).join(broadcast(hitsP))
        .select(col("n_test"), col("n_hit_markov"),
          (col("n_hit_markov").cast("double") / col("n_test")).as("hit_rate_markov"),
          col("n_hit_pop"),
          (col("n_hit_pop").cast("double") / col("n_test")).as("hit_rate_pop"))
    },

    // k-core filtering of the user-item interaction graph — THE standard
    // recsys dataset-preprocessing step (MovieLens-style "10-core"):
    // iteratively drop users/items with < k distinct partners until the
    // fixpoint. Fixed peel rounds (the PageRank determinism convention)
    // so the oracle unrolls the identical rounds as CTEs; convergence
    // within the budget is spec-asserted. Items offset by 1e6 into the
    // shared node space.
    "q156_kcore" -> { (s, d) =>
      val ev = table(s, d, "events").select(col("user_id").as("src"),
        (get_json_object(col("props"), "$.k").cast("int") + 1000000).cast("long").as("dst"))
      graft.graph.KCore.run(ev, "src", "dst", k = 45, rounds = 3)
        .orderBy(col("node"))
    },

    // RFM customer segmentation — the CRM classic: per-user recency /
    // frequency / monetary, each quintile-bucketed by the SAME
    // exact-percentile broadcast device as CCNet's perplexity buckets
    // (q107): thresholds from one exact-percentile aggregate, assignment
    // a comparison battery — no global ntile window, no corpus sort.
    // Monetary is an exact decimal sum; every bucket is an integer.
    "q157_rfm" -> { (s, d) =>
      import graft.operators.Quality
      val day = 86400000000L
      val p = table(s, d, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("t"), col("value"))
      val perUser = p.groupBy(col("user_id")).agg(
        max(col("t")).as("__last"), count(lit(1)).as("frequency"),
        dsum(col("value"), 2).as("monetary"))
      val anchor = perUser.agg(max(col("__last")).as("__mx"))
      val base = perUser.join(broadcast(anchor))
        .select(col("user_id"),
          expr(s"(__mx - __last) div $day").as("recency_days"),
          col("frequency"), col("monetary"))
      val bucketed = Quality.percentileBuckets(
        Quality.percentileBuckets(
          Quality.percentileBuckets(base, col("recency_days"), 5, "r_bucket"),
          col("frequency"), 5, "f_bucket"),
        col("monetary"), 5, "m_bucket")
      bucketed.select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"), col("r_bucket"), col("f_bucket"), col("m_bucket"),
          concat(lit("R"), col("r_bucket"), lit("F"), col("f_bucket"),
            lit("M"), col("m_bucket")).as("segment"))
        .orderBy(col("user_id"))
    },

    // Popularity-concentration datasheet: Gini coefficient + top-10 share
    // of the item interaction distribution. The rank every item needs for
    // Gini comes from ShardPack's two-level exact prefix sum (weight 1 ⇒
    // cumsum = row number) — never a single-partition window; Σ rank·n is
    // tie-invariant so every cell is deterministic, and the two ratios
    // are single IEEE divisions of exact longs.
    "q151_concentration" -> { (s, d) =>
      val ev = table(s, d, "events").select(
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      graft.rank.Popularity.concentration(ev, "item", topK = 10)
    },

    // Cohort retention matrix (daily cohorts): users cohorted by
    // first-seen day, per-(cohort, offset) distinct-active counts and
    // rates. One user-keyed repartition serves first-seen + join +
    // distinct (subset-key clustering); only the periods²-row matrix
    // crosses the final cohort window exchange.
    "q152_retention" -> { (s, d) =>
      val ev = table(s, d, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      graft.operators.Retention.matrix(ev, "user_id", "ts_us", 86400000000L)
        .withColumnRenamed("offset", "period_offset")
        .orderBy(col("cohort_period"), col("period_offset"))
    },

    // A/B experiment readout: md5(salt|user) parity assigns the arm
    // (deterministic, engine-replayable, no assignment table); a unit
    // converts if ANY purchase of value >= 195 — per-arm exact counts,
    // rates, lift, and the two-proportion z in one fixed-association
    // IEEE chain (sqrt is correctly rounded, so even z hash-replays).
    "q153_ab_test" -> { (s, d) =>
      graft.operators.AbTest.report(table(s, d, "events"), "user_id",
        col("event_type") === "purchase" && col("value") >= 195.0d,
        salt = "exp1")
    },

    // Per-group Misra-Gries heavy hitters through the typed Aggregator
    // (SURVEY §2.11): daily event-type tallies via the mergeable MG
    // summary instead of a (day, type) exchange. Capacity 16 ≥ the
    // 5-type alphabet, so NO shrink/cut ever fires and the sketch's
    // counts are EXACT — the oracle replays them with a plain GROUP BY,
    // pinning the exactness regime the sketch guarantees.
    "q171_mg_topk" -> { (s, d) =>
      graft.sql.GraftFunctions.enableBoundedObjectAgg(s)
      val ev = table(s, d, "events").select(
        unix_micros(date_trunc("day", col("ts"))).as("bucket_us"),
        col("event_type"))
      ev.groupBy(col("bucket_us"))
        .agg(graft.functions.ApproxStats.mgTopK(col("event_type"), 16).as("m"))
        .select(col("bucket_us"), explode(col("m")).as(Seq("event_type", "n")))
        .orderBy(col("bucket_us"), col("event_type"))
    },

    // Seasonal-naive forecast evaluation: forecast(day) = count(day−7),
    // scored by MASE against the naive lag-1 baseline (Hyndman 2006 —
    // THE scale-free forecast-eval number). Absolute errors are exact
    // longs from two lag columns; MASE is one IEEE division of their
    // sums. A model beating 1.0 beats walking forward last week.
    "q166_seasonal_mase" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val counts = table(s, d, "events")
        .groupBy(col("event_type"),
          unix_micros(date_trunc("day", col("ts"))).as("bucket_us"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
      counts
        .withColumn("__l7", lag(col("n"), 7).over(w))
        .withColumn("__l1", lag(col("n"), 1).over(w))
        .filter(col("__l7").isNotNull && col("__l1").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("n") - col("__l7"))).as("sae_seasonal"),
          sum(abs(col("n") - col("__l1"))).as("sae_naive"))
        .withColumn("mase", when(col("sae_naive") > 0,
          col("sae_seasonal").cast("double") / col("sae_naive")))
        .orderBy(col("event_type"))
    },

    // Session path mining: the top-20 consecutive event-type trigrams
    // (both inter-event gaps <= 30 min — the same session semantics as
    // q146's transitions, one order higher). Counts exact; ties broken
    // by path text.
    "q167_event_paths" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val gap = 1800000000L
      ev
        .withColumn("__t2", lead(col("event_type"), 1).over(w))
        .withColumn("__t3", lead(col("event_type"), 2).over(w))
        .withColumn("__g1", lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .withColumn("__g2", lead(col("ts_us"), 2).over(w) - lead(col("ts_us"), 1).over(w))
        .filter(col("__t3").isNotNull && col("__g1") <= gap && col("__g2") <= gap)
        .select(concat_ws(">", col("event_type"), col("__t2"), col("__t3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(20)
    },

    // CUSUM level-shift detection (Page 1954) — the complement of q144's
    // EWMA spike test: a SUSTAINED drift that never spikes (each bucket
    // only slightly high) walks the cumulative sum past the threshold.
    // Baseline = first-7-day mean as the exact rational sum/7; deviations
    // in 1/7 units are exact longs; the running CUSUM is a window prefix
    // sum — every cell integer/boolean-exact.
    "q162_cusum" -> { (s, d) =>
      val counts = table(s, d, "events")
        .groupBy(col("event_type"),
          unix_micros(date_trunc("day", col("ts"))).as("bucket_us"))
        .agg(count(lit(1)).as("n"))
      graft.operators.RateMonitor.cusum(counts, "event_type", "bucket_us", "n",
          warmup = 7, threshold = 3L)
        .orderBy(col("event_type"), col("bucket_us"))
    },

    // Event-rate spike detection: daily per-type counts smoothed by the
    // exact integer half-weight EWMA (a lag-battery projection, no floats,
    // no recurrence) with a cross-multiplied 3x spike test — the
    // pipeline-ops monitor, every cell integer/boolean-exact.
    "q144_rate_anomaly" -> { (s, d) =>
      val counts = table(s, d, "events")
        .groupBy(col("event_type"),
          unix_micros(date_trunc("day", col("ts"))).as("bucket_us"))
        .agg(count(lit(1)).as("n"))
      graft.operators.RateMonitor.spikes(counts, "event_type", "bucket_us", "n")
        .orderBy(col("event_type"), col("bucket_us"))
    },

    // Ordered funnel (view -> click -> purchase): earliest step-k event
    // strictly after step k-1, per user — one type-pruned pass per step,
    // all passes co-partitioned on the user key. Epoch-us longs, exact.
    "q145_funnel" -> { (s, d) =>
      graft.operators.Funnel.completion(table(s, d, "events"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    },

    // Latest-batch snapshot (reference: articles_staging.sql:1-7,23-26 —
    // batch = calendar day here, order = event ts).
    "q20_latest_batch" -> { (s, d) =>
      val ev = table(s, d, "events").withColumn("batch_d", to_date(col("ts")))
      Relational.latestBatch(ev, "batch_d", "ts")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .orderBy(col("event_id"))
    },

    // JSON path extraction + cast + aggregate (reference:
    // articles_staging.sql:10-22 P1 RAW_DATA:"field"::INT).
    "q21_json_extract" -> { (s, d) =>
      table(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },

    // Tuple dedup + whole-partition LAST_VALUE (reference:
    // dedup_transactions.sql:1-17; the explicit-frame gotcha of SURVEY §2.5).
    // Duplicate-preserving: one row per distinct (user, type, value, ts)
    // tuple, annotated with the partition's last value/ts.
    "q22_dedup_lastvalue" -> { (s, d) =>
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("ts_us"))
      Relational.dedupWithLastValue(ev, Seq("user_id", "event_type"), "ts_us", Seq("value"))
        .orderBy(col("user_id"), col("event_type"), col("ts_us"), col("value"))
    },

    // Keep-first-per-key (reference: my_merlin_flow.py:526-535 O5).
    "q23_keep_first" -> { (s, d) =>
      val ev = table(s, d, "events")
      Relational.keepFirstPerKey(ev, Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("user_id"))
    },

    // Frequency filter (reference: filtered_dataframe.sql:1-19 A1+J4): keep
    // events of users with >= 8 'purchase' events, as a left semi join.
    "q24_frequency_filter" -> { (s, d) =>
      val ev = table(s, d, "events")
      val purchases = ev.filter(col("event_type") === lit("purchase"))
      val frequent = purchases.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 8).select(col("user_id"))
      ev.join(frequent, Seq("user_id"), "left_semi")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("sum_value"))
        .orderBy(col("user_id"))
    },

    // Tumbling-window per-type stats through the ACTUAL streaming code path
    // (EventStream.windowedTypeStats — withWatermark is a no-op on batch
    // input): batch/stream unification, §2.10, with a real oracle. Spark
    // tumbling windows and DuckDB time_bucket both align to the epoch in
    // UTC, so the buckets agree exactly.
    "q27_tumbling_stats" -> { (s, d) =>
      graft.streaming.EventStream
        .windowedTypeStats(table(s, d, "events"), "ts", "1 hour", "1 hour")
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start_us"), col("event_type"))
    },

    // Point-in-time (as-of) feature join: each purchase event (the label
    // spine) is enriched with the most recent view/click value at-or-before
    // its timestamp for the same user, nulled when staler than 24 h — the
    // label-leakage-safe feature pull (see operators/AsOfJoin.scala; oracle
    // is DuckDB's native ASOF LEFT JOIN, so the sort-merge window form is
    // cross-checked against an independent implementation of the semantics).
    "q55_asof_features" -> { (s, d) =>
      val ev = table(s, d, "events")
      val spine = ev.filter(col("event_type") === lit("purchase"))
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val feat = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("value"))
      graft.operators.AsOfJoin.asOf(spine, feat, Seq("user_id"),
          spineTs = "ts_us", featureTs = "t_us", valueCols = Seq("value"),
          toleranceOpt = Some(86400000000L)) // 24 h in µs
        .orderBy(col("event_id"))
    },

    // Resample to a regular grid: each user's purchase-value series on a
    // 2-day tick grid, last observation carried onto each tick (nulls
    // before the first purchase) — fixed-rate input prep for sequence
    // models. Oracle: DuckDB generate_series + ASOF LEFT JOIN.
    "q71_resample_grid" -> { (s, d) =>
      val purch = table(s, d, "events")
        .filter(col("event_type") === lit("purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("value"))
      graft.operators.AsOfJoin.resample(purch, Seq("user_id"), "t_us",
          Seq("value"), step = 172800000000L) // 2 days in µs
        .orderBy(col("user_id"), col("tick"))
    },

    // Forward fill (LOCF): per user in time order, carry the last purchase
    // value forward across non-purchase events — the sparse-column
    // gap-filling step before training. Leading rows before any purchase
    // stay null.
    "q69_forward_fill" -> { (s, d) =>
      val ev = table(s, d, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"),
          when(col("event_type") === lit("purchase"), col("value")).as("last_purchase_value"))
      Relational.forwardFill(ev, Seq("user_id"),
          Seq(col("ts_us").asc, col("event_id").asc), Seq("last_purchase_value"))
        .orderBy(col("event_id"))
    },

    // Leave-one-out target encoding (the leakage-safe train-side form):
    // each event's type is encoded as the smoothed mean `value` of its type
    // with the row's OWN value excluded. Exact-decimal sums make the
    // encoded doubles engine-reproducible — DuckDB replays the identical
    // arithmetic and hash-matches.
    "q67_target_encode" -> { (s, d) =>
      graft.features.TargetEncoder.looEncode(
          table(s, d, "events").select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value", alpha = 10.0)
        .orderBy(col("event_id"))
    },

    // Skew-salted equi-join (J-family at scale): the fact side is salted,
    // the dimension side replicated per salt, so a hot key spreads over 8
    // tasks instead of one. Results must be IDENTICAL to the plain join —
    // that is what the oracle (an unsalted DuckDB join) checks.
    "q57_salted_join" -> { (s, d) =>
      val ev = table(s, d, "events")
      val cust = table(s, d, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Relational.saltedJoin(ev, cust, Seq("user_id"), numSalts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("sum_value"))
        .orderBy(col("c_mktsegment"))
    },

    // Salted two-phase top-k over a 5-value key (the worst skew shape: a
    // plain window would run on 5 tasks): per-(key,salt) local top-k, then
    // re-rank the <= salts*k survivors. Oracle is the plain ROW_NUMBER
    // form — equality is the correctness claim.
    "q58_salted_topk" -> { (s, d) =>
      val ev = table(s, d, "events").select(col("event_type"), col("event_id"), col("value"))
      Relational.topKPerGroupSalted(ev, Seq("event_type"),
          Seq(col("value").desc, col("event_id").asc), k = 3, numSalts = 16)
        .orderBy(col("event_type"), col("rk"))
    },

    // Aggregate top-k (round-9): same semantics as a ROW_NUMBER window
    // cut, computed as a k-bounded MAP-SIDE heap (functions.TopKAgg) so
    // the exchange carries groups*k survivors instead of every candidate
    // row — the scale form for candidate-heavy retrieval (users×catalog).
    // Oracle is the plain window form — row-set equality is the claim.
    "q178_topk_agg" -> { (s, d) =>
      val ev = table(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"))
      Relational.topKPerGroupAgg(ev, Seq("event_type"),
          col("value"), col("event_id"), k = 3,
          idName = "event_id", scoreName = "score")
        .orderBy(col("event_type"), col("rk"))
    },

    // Interval (band) join via time-axis binning: attribute each view/click
    // to every purchase session of the same user whose ±2 h window contains
    // it. The bare non-equi form would plan a nested-loop join; binning
    // makes it a plain equi-join on (user, bin) + residual filter (see
    // Relational.intervalJoin). Oracle is DuckDB's native range join
    // (BETWEEN) over the same gaps-and-islands sessions — an independent
    // execution strategy for identical semantics.
    "q63_interval_join" -> { (s, d) =>
      val ev = table(s, d, "events")
      val sessions = graft.streaming.EventStream
        .sessionizeBatch(ev.filter(col("event_type") === lit("purchase")),
          "user_id", unix_millis(col("ts")), gapMs = 1800000L)
        .select(col("user_id"), col("session_id"),
          (col("session_start_ms") - 7200000L).as("w_start"),
          (col("session_end_ms") + 7200000L).as("w_end"))
      val signals = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tms"))
      graft.operators.Relational.intervalJoin(signals, sessions,
          pointCol = "tms", startCol = "w_start", endCol = "w_end",
          binSize = 3600000L, keys = Seq("user_id"))
        .select(col("user_id"), col("event_id"), col("session_id"),
          col("tms"), col("w_start"), col("w_end"))
        .orderBy(col("user_id"), col("event_id"), col("session_id"))
    },

    // Sessionization (30-min gap) through the batch gaps-and-islands form —
    // same merge semantics as the streaming flatMapGroupsWithState path
    // (equivalence asserted in EventStreamSpec); here it gets a real oracle.
    "q28_sessions" -> { (s, d) =>
      graft.streaming.EventStream
        .sessionizeBatch(table(s, d, "events"), "user_id",
          unix_millis(col("ts")), gapMs = 1800000L)
        .orderBy(col("user_id"), col("session_id"))
    },

    // Ranking/offset window battery (SURVEY §2.5 noted lag/lead/ntile as
    // free Spark capabilities — exposed on the oracle surface):
    // inter-event gap, next event id, per-user activity quartile.
    "q85_lag_lead" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, d, "events").select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      ev.select(col("user_id"), col("event_id"), col("ts_us"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"),
          lead(col("event_id"), 1).over(w).as("next_event"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },

    // Pivot (wide per-day event-type counts) with an explicit value list —
    // the deterministic form: no value-discovery pass, stable output schema.
    // Empty cells coalesce to 0 to match conditional-aggregation semantics.
    "q78_pivot" -> { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = table(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("day"))
    })

  val oracles: Map[String, String] = Map(
    "q171_mg_topk" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))) AS bucket_us,
         event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""",
    "q166_seasonal_mase" ->
      """WITH c AS (SELECT event_type,
             epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))) bucket_us,
             COUNT(*) n
           FROM events GROUP BY 1, 2),
         l AS (SELECT event_type, bucket_us, n,
             LAG(n, 7) OVER w l7, LAG(n, 1) OVER w l1
           FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us)),
         s AS (SELECT event_type, COUNT(*) n_days,
             SUM(ABS(n - l7)) sae_seasonal, SUM(ABS(n - l1)) sae_naive
           FROM l WHERE l7 IS NOT NULL AND l1 IS NOT NULL
           GROUP BY event_type)
         SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(sae_seasonal AS BIGINT) AS sae_seasonal,
           CAST(sae_naive AS BIGINT) AS sae_naive,
           CASE WHEN sae_naive > 0
             THEN CAST(sae_seasonal AS DOUBLE) / sae_naive END AS mase
         FROM s ORDER BY event_type""",
    "q167_event_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) ts_us FROM events),
         t AS (SELECT event_type t1,
             LEAD(event_type, 1) OVER w t2, LEAD(event_type, 2) OVER w t3,
             LEAD(ts_us, 1) OVER w - ts_us g1,
             LEAD(ts_us, 2) OVER w - LEAD(ts_us, 1) OVER w g2
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         p AS (SELECT t1 || '>' || t2 || '>' || t3 AS path FROM t
           WHERE t3 IS NOT NULL AND g1 <= 1800000000 AND g2 <= 1800000000)
         SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p
         GROUP BY path ORDER BY n DESC, path LIMIT 20""",
    "q162_cusum" ->
      """WITH c AS (SELECT event_type,
             epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))) bucket_us,
             COUNT(*) n
           FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, bucket_us, n, ROW_NUMBER() OVER w rn
           FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us)),
         b AS (SELECT event_type, SUM(CASE WHEN rn <= 7 THEN n END) bsum
           FROM r GROUP BY event_type),
         dv AS (SELECT r.event_type, bucket_us, n, rn, b.bsum,
             CASE WHEN rn > 7 THEN n * 7 - b.bsum ELSE 0 END dev
           FROM r JOIN b USING (event_type)),
         s AS (SELECT event_type, bucket_us, n, rn, bsum,
             SUM(dev) OVER (PARTITION BY event_type ORDER BY bucket_us
               ROWS UNBOUNDED PRECEDING) cs
           FROM dv)
         SELECT event_type, bucket_us, CAST(n AS BIGINT) AS n,
           CAST(cs AS BIGINT) AS cusum_scaled,
           (rn > 7 AND ABS(cs) > 3 * bsum) AS is_shift
         FROM s ORDER BY event_type, bucket_us""",
    "q156_kcore" -> {
      val (k, rounds) = (45, 3)
      val iters = (1 to rounds).map { r =>
        s"""d$r AS (SELECT n, COUNT(*) c FROM
             (SELECT u n FROM e${r - 1} UNION ALL SELECT v n FROM e${r - 1}) GROUP BY n),
           k$r AS (SELECT n FROM d$r WHERE c >= $k),
           e$r AS (SELECT e.u, e.v FROM e${r - 1} e
             JOIN k$r a ON e.u = a.n JOIN k$r b ON e.v = b.n)"""
      }.mkString(",\n         ")
      s"""WITH e0 AS (SELECT DISTINCT LEAST(u0, v0) u, GREATEST(u0, v0) v FROM
           (SELECT user_id u0,
              1000000 + CAST(props->>'$$.k' AS BIGINT) v0 FROM events)
           WHERE u0 <> v0),
         $iters
         SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM
           (SELECT u n FROM e$rounds UNION ALL SELECT v n FROM e$rounds)
         GROUP BY n ORDER BY node"""
    },
    "q159_markov_eval" ->
      """WITH e AS (SELECT user_id, event_id, CAST(props->>'$.k' AS INT) item,
             epoch_us(CAST(ts AS TIMESTAMP)) ts_us FROM events),
         cut AS (SELECT epoch_us(TIMESTAMP '2024-01-25 00:00:00') c),
         trn AS (SELECT e.* FROM e, cut WHERE ts_us < c),
         tst AS (SELECT e.* FROM e, cut WHERE ts_us >= c),
         trp AS (SELECT item src_item, LEAD(item) OVER w dst_item,
             LEAD(ts_us) OVER w - ts_us gap_us FROM trn
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         trc AS (SELECT src_item, dst_item, COUNT(*) n FROM trp
           WHERE dst_item IS NOT NULL AND gap_us <= 86400000000
           GROUP BY src_item, dst_item),
         model AS (SELECT src_item, dst_item FROM
           (SELECT src_item, dst_item,
              ROW_NUMBER() OVER (PARTITION BY src_item
                ORDER BY n DESC, dst_item) rk FROM trc)
           WHERE rk <= 3),
         pop AS (SELECT item dst_item FROM
           (SELECT item, COUNT(*) c FROM trn GROUP BY item
            ORDER BY c DESC, item LIMIT 3)),
         tsp AS (SELECT item src_item, LEAD(item) OVER w dst_item,
             LEAD(ts_us) OVER w - ts_us gap_us FROM tst
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         tsc AS (SELECT src_item, dst_item, COUNT(*) n FROM tsp
           WHERE dst_item IS NOT NULL AND gap_us <= 86400000000
           GROUP BY src_item, dst_item),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) n_test FROM tsc),
         hm AS (SELECT CAST(COALESCE(SUM(t.n), 0) AS BIGINT) n_hit_markov
           FROM tsc t JOIN model m
             ON t.src_item = m.src_item AND t.dst_item = m.dst_item),
         hp AS (SELECT CAST(COALESCE(SUM(t.n), 0) AS BIGINT) n_hit_pop
           FROM tsc t JOIN pop p ON t.dst_item = p.dst_item)
         SELECT n_test, n_hit_markov,
           CAST(n_hit_markov AS DOUBLE) / n_test AS hit_rate_markov,
           n_hit_pop, CAST(n_hit_pop AS DOUBLE) / n_test AS hit_rate_pop
         FROM tot, hm, hp""",
    "q157_rfm" -> {
      def ths(m: String, p: String) = (1 to 4)
        .map(i => s"quantile_cont($m, ${i / 5.0}) ${p}$i").mkString(", ")
      def bucket(m: String, p: String) = (1 to 4)
        .map(i => s"CASE WHEN $m > th.${p}$i THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) t, value
           FROM events WHERE event_type = 'purchase'),
         u AS (SELECT user_id, MAX(t) last_us, COUNT(*) frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) monetary
           FROM p GROUP BY user_id),
         a AS (SELECT MAX(last_us) mx FROM u),
         r AS (SELECT user_id, (mx - last_us) // 86400000000 recency_days,
             frequency, monetary FROM u, a),
         th AS (SELECT ${ths("recency_days", "r")}, ${ths("frequency", "f")},
             ${ths("monetary", "m")} FROM r),
         b AS (SELECT r.user_id, r.recency_days,
             CAST(r.frequency AS BIGINT) frequency, r.monetary,
             CAST(${bucket("r.recency_days", "r")} AS INT) r_bucket,
             CAST(${bucket("r.frequency", "f")} AS INT) f_bucket,
             CAST(${bucket("r.monetary", "m")} AS INT) m_bucket
           FROM r, th)
         SELECT user_id, recency_days, frequency, monetary,
           r_bucket, f_bucket, m_bucket,
           'R' || r_bucket || 'F' || f_bucket || 'M' || m_bucket AS segment
         FROM b ORDER BY user_id"""
    },
    "q151_concentration" ->
      """WITH c AS (SELECT CAST(props->>'$.k' AS INT) item, COUNT(*) n
           FROM events GROUP BY item),
         r AS (SELECT item, n, ROW_NUMBER() OVER (ORDER BY n, item) rk FROM c),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) ni, CAST(SUM(n) AS BIGINT) ne,
             CAST(SUM(2*rk*n) AS BIGINT) srn FROM r),
         t AS (SELECT CAST(SUM(n) AS BIGINT) te
           FROM (SELECT n FROM c ORDER BY n DESC, item LIMIT 10))
         SELECT ni AS n_items, ne AS n_events,
           srn - (ni+1)*ne AS gini_num, ni*ne AS gini_den,
           CAST(srn - (ni+1)*ne AS DOUBLE) / (ni*ne) AS gini,
           te AS topk_events, CAST(te AS DOUBLE) / ne AS topk_share
         FROM s, t""",
    "q152_retention" ->
      """WITH e AS (SELECT user_id u,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 p FROM events),
         f AS (SELECT u, MIN(p) cp FROM e GROUP BY u),
         cells AS (SELECT DISTINCT f.cp, e.p - f.cp po, e.u
           FROM e JOIN f USING (u)),
         m AS (SELECT cp, po, COUNT(*) n FROM cells GROUP BY cp, po),
         s AS (SELECT cp, po, n,
             MAX(CASE WHEN po = 0 THEN n END) OVER (PARTITION BY cp) cs FROM m)
         SELECT cp AS cohort_period, po AS period_offset,
           CAST(n AS BIGINT) AS n_active, CAST(cs AS BIGINT) AS cohort_size,
           CAST(n AS DOUBLE) / cs AS rate
         FROM s ORDER BY cohort_period, period_offset""",
    "q153_ab_test" -> {
      val armSql = s"(${hex48Sql("md5('exp1|' || CAST(u AS VARCHAR))")} % 2)"
      s"""WITH units AS (SELECT user_id u,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 195.0
                      THEN 1 ELSE 0 END) conv
           FROM events GROUP BY user_id),
         armed AS (SELECT $armSql arm, conv FROM units),
         a AS (SELECT arm, COUNT(*) n, SUM(conv) c FROM armed GROUP BY arm),
         one AS (SELECT
             CAST(MAX(CASE WHEN arm = 0 THEN n END) AS BIGINT) n0,
             CAST(MAX(CASE WHEN arm = 0 THEN c END) AS BIGINT) c0,
             CAST(MAX(CASE WHEN arm = 1 THEN n END) AS BIGINT) n1,
             CAST(MAX(CASE WHEN arm = 1 THEN c END) AS BIGINT) c1
           FROM a)
         SELECT n0, c0, n1, c1,
           CAST(c0 AS DOUBLE) / n0 AS p0,
           CAST(c1 AS DOUBLE) / n1 AS p1,
           CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0 AS lift,
           CASE WHEN sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
                     * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)))
                    * (1.0 / n0 + 1.0 / n1)) > 0.0
             THEN (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
                       * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)))
                      * (1.0 / n0 + 1.0 / n1))
           END AS z
         FROM one"""
    },
    "q146_transitions" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(props->>'$.k' AS INT) item,
             epoch_us(CAST(ts AS TIMESTAMP)) ts_us
           FROM events),
         p AS (SELECT item AS src_item,
             LEAD(item) OVER w AS dst_item,
             LEAD(ts_us) OVER w - ts_us AS gap_us
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         t AS (SELECT src_item, dst_item, COUNT(*) AS n FROM p
           WHERE dst_item IS NOT NULL AND gap_us <= 1800000000
           GROUP BY src_item, dst_item)
         SELECT src_item, dst_item, n,
           CAST(SUM(n) OVER (PARTITION BY src_item) AS BIGINT) AS n_src,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src_item) AS BIGINT) AS p
         FROM t ORDER BY src_item, dst_item""",
    "q147_decayed_pop" ->
      """WITH e AS (SELECT CAST(props->>'$.k' AS INT) item,
             epoch_us(CAST(ts AS TIMESTAMP)) ts_us FROM events),
         m AS (SELECT MAX(ts_us) AS anchor_us FROM e),
         w AS (SELECT item, ts_us,
             LEAST((anchor_us - ts_us) // 604800000000, 40) AS e FROM e, m)
         SELECT item, COUNT(*) AS n_events,
           CAST(SUM(CAST(1 AS BIGINT) << (40 - e)) AS BIGINT) AS score_scaled,
           MAX(ts_us) AS last_seen_us
         FROM w GROUP BY item ORDER BY score_scaled DESC, item""",
    "q144_rate_anomaly" -> {
      val lags = (1 to 8)
        .map(j => s"COALESCE(LAG(n, $j) OVER w, 0) // ${1L << j}")
        .mkString(" + ")
      s"""WITH c AS (SELECT event_type,
             epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))) bucket_us,
             COUNT(*) n
           FROM events GROUP BY 1, 2),
         l AS (SELECT event_type, bucket_us, n, ($lags) AS baseline
           FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us))
         SELECT event_type, bucket_us, n, CAST(baseline AS BIGINT) AS baseline,
           (baseline > 0 AND n * 1 > 3 * baseline) AS is_spike
         FROM l ORDER BY event_type, bucket_us"""
    },
    "q145_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) t FROM events),
         s1 AS (SELECT user_id, MIN(t) t_1 FROM e
           WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(e.t) t_2 FROM e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.t > s1.t_1 GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(e.t) t_3 FROM e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.t > s2.t_2 GROUP BY 1)
         SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3,
           (1 + CASE WHEN s2.t_2 IS NULL THEN 0 ELSE 1 END
              + CASE WHEN s3.t_3 IS NULL THEN 0 ELSE 1 END) AS steps_completed
         FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         ORDER BY user_id""",
    "q20_latest_batch" ->
      """SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
         FROM events
         WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
         ORDER BY event_id""",
    "q21_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
         MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q22_dedup_lastvalue" ->
      """WITH dedup AS (
           SELECT DISTINCT user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events)
         SELECT user_id, event_type, value, ts_us,
           LAST_VALUE(value) OVER w AS last_value,
           LAST_VALUE(ts_us) OVER w AS last_ts_us
         FROM dedup
         WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_type, ts_us, value""",
    "q23_keep_first" ->
      """SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
               FROM events) t
         WHERE rk = 1 ORDER BY user_id""",
    "q24_frequency_filter" ->
      """SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events
         WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase'
                           GROUP BY user_id HAVING COUNT(*) >= 8)
         GROUP BY user_id ORDER BY user_id""",
    "q27_tumbling_stats" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
    "q71_resample_grid" ->
      """WITH p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
                    FROM events WHERE event_type = 'purchase'),
         b AS (SELECT user_id, MIN(t_us) AS mn, MAX(t_us) AS mx FROM p GROUP BY user_id),
         grid AS (SELECT user_id,
                    unnest(generate_series((mn // 172800000000) * 172800000000,
                                           mx, 172800000000)) AS tick FROM b)
         SELECT g.user_id, g.tick, f.value AS asof_value, f.t_us AS asof_t_us
         FROM grid g ASOF LEFT JOIN p f
           ON g.user_id = f.user_id AND g.tick >= f.t_us
         ORDER BY g.user_id, g.tick""",
    "q69_forward_fill" ->
      """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                   ROWS UNBOUNDED PRECEDING) AS last_purchase_value
         FROM events ORDER BY event_id""",
    "q67_target_encode" ->
      """WITH pr AS (SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS p
                     FROM events)
         SELECT event_id, event_type, value,
           (CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w
                 - CAST(value AS DECIMAL(18,4)) AS DOUBLE)
            + (SELECT p FROM pr) * 10.0)
           / (COUNT(*) OVER w - 1 + 10.0) AS te
         FROM events
         WINDOW w AS (PARTITION BY event_type)
         ORDER BY event_id""",
    "q63_interval_join" ->
      """WITH p AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms FROM events
                    WHERE event_type = 'purchase'),
         g AS (SELECT user_id, tms,
                 CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000
                      THEN 1 ELSE 0 END AS isn
               FROM p WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
         s AS (SELECT user_id, tms,
                 CAST(SUM(isn) OVER (PARTITION BY user_id ORDER BY tms
                   ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
               FROM g),
         sess AS (SELECT user_id, session_id,
                    MIN(tms) - 7200000 AS w_start, MAX(tms) + 7200000 AS w_end
                  FROM s GROUP BY user_id, session_id),
         sig AS (SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
                 FROM events WHERE event_type IN ('view', 'click'))
         SELECT v.user_id, v.event_id, x.session_id, v.tms, x.w_start, x.w_end
         FROM sig v JOIN sess x
           ON v.user_id = x.user_id AND v.tms BETWEEN x.w_start AND x.w_end
         ORDER BY v.user_id, v.event_id, x.session_id""",
    "q57_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q58_salted_topk" ->
      """SELECT event_type, event_id, value, CAST(rk AS INT) AS rk
         FROM (SELECT event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rk
               FROM events) t
         WHERE rk <= 3 ORDER BY event_type, rk""",
    "q178_topk_agg" ->
      """SELECT event_type, CAST(rk AS INT) AS rk, event_id,
           CAST(value AS DOUBLE) AS score
         FROM (SELECT event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rk
               FROM events) t
         WHERE rk <= 3 ORDER BY event_type, rk""",
    "q55_asof_features" ->
      """WITH spine AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
                        FROM events WHERE event_type = 'purchase'),
         feat AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
                  FROM events WHERE event_type IN ('view', 'click'))
         SELECT s.event_id, s.user_id, s.ts_us,
           CASE WHEN s.ts_us - f.t_us <= 86400000000 THEN f.value END AS asof_value,
           CASE WHEN s.ts_us - f.t_us <= 86400000000 THEN f.t_us END AS asof_t_us
         FROM spine s ASOF LEFT JOIN feat f
           ON s.user_id = f.user_id AND s.ts_us >= f.t_us
         ORDER BY s.event_id""",
    "q28_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms FROM events),
         g AS (SELECT user_id, tms,
                 CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000
                      THEN 1 ELSE 0 END AS isn
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
         s AS (SELECT user_id, tms,
                 CAST(SUM(isn) OVER (PARTITION BY user_id ORDER BY tms
                   ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
               FROM g)
         SELECT user_id, session_id, MIN(tms) AS session_start_ms,
           MAX(tms) AS session_end_ms, COUNT(*) AS n_events
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q85_lag_lead" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) ts_us FROM events)
         SELECT user_id, event_id, ts_us,
           ts_us - LAG(ts_us, 1) OVER w AS gap_us,
           LEAD(event_id, 1) OVER w AS next_event,
           CAST(NTILE(4) OVER w AS INT) AS quartile
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, ts_us, event_id""",
    "q78_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY 1 ORDER BY day""")
}
