package graft

import graft.catalog.TestTables
import graft.functions.TimeFunctions
import graft.ir._
import graft.ir.Dsl._
import graft.model.FeatureGroup
import graft.planner.QueryPlanner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Materialize.PinOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry exercises one operator of the SURVEY §2 inventory
  * through the engine's public surface (IR → planner → DataFrame);
  * `oracleSql` holds the DuckDB-equivalent SQL for the driver's compare.
  */
object SparkEntry {

  private def fg(spark: SparkSession, dir: String, table: String): FeatureGroup =
    TestTables.fg(spark, dir, table)

  private def q(spark: SparkSession, query: Query): DataFrame =
    QueryPlanner.plan(spark, query)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 aggregation surface: one-pass grouped profile over lineitem.
    "q01_agg_pricing" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.3 projection + filter through the IR.
    "q02_select_filter" -> ((s, dir) => {
      val c = fg(s, dir, "customer")
      q(s, Query.select(c, Seq("c_custkey", "c_name", "c_acctbal"))
        .where(("c_acctbal" > 5000.0) && ("c_mktsegment" in Seq("BUILDING", "AUTOMOBILE"))))
        .orderBy("c_custkey")
    }),

    // §2.3 all eight filter conditions in one boolean tree.
    "q03_filter_tree" -> ((s, dir) => {
      val o = fg(s, dir, "orders")
      q(s, Query.select(o, Seq("o_orderkey", "o_totalprice", "o_orderstatus",
          "o_orderpriority"))
        .where((("o_totalprice" >= 1000.0) && ("o_totalprice" <= 150000.0) &&
                ("o_orderstatus" =!= "X") && ("o_orderkey" > 10) &&
                ("o_orderkey" < 100000000)) &&
               (("o_orderpriority" like "%URGENT%") ||
                ("o_orderstatus" in Seq("F", "O")) ||
                ("o_orderkey" === 1))))
        .orderBy("o_orderkey")
    }),

    // §2.4 inner equi-join, asymmetric keys, via the IR.
    "q04_join_inner" -> ((s, dir) => {
            q(s, Query.select(fg(s, dir, "orders"), Seq("o_orderkey", "o_custkey", "o_totalprice"))
        .join(Query.select(fg(s, dir, "customer"), Seq("c_name", "c_mktsegment")),
          leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
          joinType = JoinType.Inner)
        .where("o_totalprice" > 200000.0))
        .orderBy("o_orderkey")
    }),

    // §2.4 left join + per-join column prefix disambiguation.
    "q05_join_left_prefix" -> ((s, dir) => {
            q(s, Query.select(fg(s, dir, "customer"), Seq("c_custkey", "c_name"))
        .join(Query.select(fg(s, dir, "nation"), Seq("n_name")),
          leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
          joinType = JoinType.Left, prefix = Some("nat_")))
        .orderBy("c_custkey")
    }),

    // §2.4 left-semi join (EXISTS).
    "q06_join_semi" -> ((s, dir) => {
            q(s, Query.select(fg(s, dir, "orders"), Seq("o_orderkey", "o_totalprice"))
        .join(Query.select(fg(s, dir, "lineitem"), Seq())
            .where("l_quantity" > 45.0),
          leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
          joinType = JoinType.LeftSemi))
        .orderBy("o_orderkey")
    }),

    // §2.4 point-in-time join: for each click, the user's latest view ≤ t.
    // events.ts is whatever the writer emitted (int64-nanos in one testdata
    // generation, timestamp[us] in the next) — the join orders it natively
    // and the output normalizes through the type-dispatching converter, so
    // the query survives schema regenerations; emitted as epoch micros to
    // match the oracle's epoch_us.
    "q07_pit_join" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id", "value")
      val joined = graft.ops.PointInTimeJoin
        .asOf(clicks, "ts", views, "ts", Seq("user_id"), Seq("user_id"),
          prefix = "view_")
      joined.select(col("event_id"), col("user_id"),
          TimeFunctions.eventTimeToMicros(joined, "ts").as("ts_us"),
          TimeFunctions.eventTimeToMicros(joined, "view_ts").as("view_ts_us"),
          col("view_event_id"), col("view_value"))
        .orderBy("event_id")
    }),

    // §2.4 right join.
    "q08_join_right" -> ((s, dir) => {
      q(s, Query.select(fg(s, dir, "orders"), Seq("o_orderkey", "o_totalprice"))
        .join(Query.select(fg(s, dir, "customer"), Seq("c_custkey", "c_name")),
          leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
          joinType = JoinType.Right))
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    }),

    // §2.4 full outer join; left = pre-filtered spine DataFrame (root-query
    // filters are post-join per reference WHERE semantics, so the left-side
    // slice comes in as a caller DataFrame).
    "q09_join_full" -> ((s, dir) => {
      val rich = s.read.parquet(TestTables.parquet(dir, "customer"))
        .filter(col("c_acctbal") > 9000.0)
        .select("c_custkey", "c_acctbal")
      val spine = FeatureGroup.spine("rich_customers", rich,
        primaryKey = Seq("c_custkey"))
      q(s, Query.selectAll(spine)
        .join(Query.select(fg(s, dir, "orders"), Seq("o_orderkey", "o_custkey"))
            .where("o_totalprice" > 250000.0),
          leftOn = Seq("c_custkey"), rightOn = Seq("o_custkey"),
          joinType = JoinType.Full))
        .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    }),

    // §2.4 cross join (COMMA semantics).
    "q10_join_cross" -> ((s, dir) => {
      q(s, Query.select(fg(s, dir, "region"), Seq("r_name"))
        .join(Query.select(fg(s, dir, "nation"), Seq("n_name")),
          joinType = JoinType.Cross))
        .orderBy("r_name", "n_name")
    }),

    // §2.4 nested join: customer ⋈ (nation ⋈ region).
    "q11_join_nested" -> ((s, dir) => {
      q(s, Query.select(fg(s, dir, "customer"), Seq("c_custkey", "c_name"))
        .join(
          Query.select(fg(s, dir, "nation"), Seq("n_name"))
            .join(Query.select(fg(s, dir, "region"), Seq("r_name")),
              leftOn = Seq("n_regionkey"), rightOn = Seq("r_regionkey"),
              joinType = JoinType.Inner),
          leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
          joinType = JoinType.Inner))
        .orderBy("c_custkey")
    }),

    // §2.1 spine source + §2.4 join-key inference (maximal PK intersection).
    "q12_spine_inferred" -> ((s, dir) => {
      val spineDf = s.read.parquet(TestTables.parquet(dir, "orders"))
        .select(col("o_orderkey"), (col("o_totalprice") > 100000.0).as("big"))
      val spineFg = FeatureGroup.spine("order_spine", spineDf,
        primaryKey = Seq("o_orderkey"))
      q(s, Query.selectAll(spineFg)
        .join(Query.select(fg(s, dir, "orders"),
          Seq("o_orderstatus", "o_totalprice")), joinType = JoinType.Inner))
        .orderBy("o_orderkey")
    }),

    // §2.5 one-pass numeric column profile (Deequ ColumnProfiler analog).
    "q13_profile" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Statistics
        .profileDf(li, Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("feature")
    }),

    // §2.5 histogram: top-20 most frequent values, deterministic tie-break.
    "q14_histogram" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Statistics.histogram(li, "l_quantity", topK = 20)
    }),

    // §2.5 entropy / distinctness / uniqueness / exact distinct in one pass.
    "q15_freq_metrics" -> ((s, dir) => {
      val o = s.read.parquet(TestTables.parquet(dir, "orders"))
      graft.ops.Statistics.frequencyMetrics(o, "o_orderpriority")
    }),

    // §2.5 pairwise Pearson correlation.
    "q16_correlation" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Statistics
        .correlations(li, Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("feature_a", "feature_b")
    }),

    // §2.5 get_unique_values.
    "q17_unique_values" -> ((s, dir) => {
      val c = s.read.parquet(TestTables.parquet(dir, "customer"))
      c.select(col("c_mktsegment")).distinct().orderBy("c_mktsegment")
    }),

    // §2.8 time-series split: [start, end) bounds on the event time.
    "q18_time_series_split" -> ((s, dir) => {
      import graft.functions.TimeFunctions.toEpochMillis
      val o = s.read.parquet(TestTables.parquet(dir, "orders"))
      val splits = graft.ops.Splits.timeSeries(o, "o_orderdate", Map(
        "train" -> (toEpochMillis("1995-01-01"), toEpochMillis("1997-01-01")),
        "test" -> (toEpochMillis("1997-01-01"), toEpochMillis("1999-01-01"))))
      splits("train")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        .orderBy("o_orderkey")
    }),

    // §2.8 random split (seeded; no SQL oracle — rows-only check).
    // §2.8 EXACT random split (python-engine variant): split sizes are a
    // deterministic closed form (round(w*n) boundaries), so the query has
    // a real SQL oracle — per-split size plus a coverage row proving the
    // splits exhaust the input. Disjointness/exhaustiveness of the row
    // assignment itself is property-tested in SplitsSpec; the Bernoulli
    // `Splits.random` variant is spec-covered (seeded, no closed form).
    "q19_random_split" -> ((s, dir) => {
      val o = s.read.parquet(TestTables.parquet(dir, "orders"))
      // ALL split sizes from one aggregation over the labeled frame (one
      // job over the data), not one count job per split
      val assigned = graft.ops.Splits.exactRandomAssigned(o,
        Map("train" -> 0.7, "test" -> 0.2, "validation" -> 0.1), seed = 42L)
      import s.implicits._
      val sized = assigned.groupBy(graft.ops.Splits.SplitCol).count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
      (sized :+ ("_total", sized.map(_._2).sum))
        .toDF("split", "n_rows").orderBy("split")
    }),

    // §2.11 statistics-parameterized scalers as native column algebra
    // (two-pass: aggregate stats, bind as literals, one wide select).
    "q20_scalers" -> ((s, dir) => {
      import graft.ops.Transformations._
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      // exact percentiles only where the robust scaler needs them —
      // buffering every distinct l_extendedprice per partition for an
      // unused quantile is pure waste at scale
      val stats = FeatureStatistics.compute(li,
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        quantilesFor = Seq("l_discount"))
      def r6(x: Double) = graft.ops.Statistics.roundHalfUp(x, 6)
      val q6 = stats("l_quantity")
      val p6 = stats("l_extendedprice")
        .copy(mean = r6(stats("l_extendedprice").mean),
          stddev = r6(stats("l_extendedprice").stddev))
      val d6 = stats("l_discount")
      li.select(col("l_orderkey"), col("l_linenumber"),
          round(minMaxScaler(col("l_quantity"), q6), 4).as("q_mm"),
          round(standardScaler(col("l_extendedprice"), p6), 4).as("p_std"),
          round(robustScaler(col("l_discount"), d6), 4).as("d_rob"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every output column so ties are identical rows
        .orderBy("l_orderkey", "l_linenumber", "q_mm", "p_std", "d_rob")
    }),

    // §2.11 label encoder (sorted unique → index) + one-hot encoder.
    "q21_encoders" -> ((s, dir) => {
      import graft.ops.Transformations._
      val o = s.read.parquet(TestTables.parquet(dir, "orders"))
      val stats = FeatureStatistics.compute(o, Nil,
        encoded = Seq("o_orderpriority", "o_orderstatus"))
      val oneHot = oneHotEncoder(col("o_orderstatus"),
        stats("o_orderstatus"), "os")
      o.select(
          col("o_orderkey") +:
            labelEncoder(col("o_orderpriority"), stats("o_orderpriority"))
              .cast("long").as("prio_idx") +:
            oneHot: _*)
        .orderBy("o_orderkey")
    }),

    // Dedup: exact content dedup, deterministic survivor (min doc_id).
    "q22_dedup_exact" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.Dedup.exact(docs, "doc_id", Seq("text"))
        .select("doc_id").orderBy("doc_id")
    }),

    // Dedup: exact token-set Jaccard similarity join (bounded subset).
    "q23_token_jaccard" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .filter(col("doc_id") < 150)
      graft.ops.Dedup.tokenJaccard(docs, "doc_id", "text", threshold = 0.6)
        .select(col("idA"), col("idB"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("idA", "idB")
    }),

    // Dedup: MinHash-LSH banded candidates + exact-Jaccard verification.
    // Oracled: the deterministic seeded LSH achieves full recall at this
    // threshold on this corpus (verified empirically), so the output equals
    // the plain-SQL exact-shingle-Jaccard pairs ≥ threshold.
    "q24_minhash_lsh" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      // bands=8 × rows=8 → LSH sensitivity threshold (1/8)^(1/8) ≈ 0.77;
      // these synthetic docs share a small vocabulary (baseline 2-shingle
      // similarity ~0.4), so shorter bands would admit most of the O(n²)
      // pair space as candidates
      graft.ops.Dedup.minHashLsh(docs, "doc_id", "text",
          shingleSize = 2, numHashes = 64, bands = 8, threshold = 0.7)
        .select(col("idA"), col("idB"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("idA", "idB")
    }),

    // Dedup: 52-bit SimHash fingerprints over the oracle-reproducible
    // char-polynomial token hash (full DuckDB value oracle).
    "q25_simhash" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.Dedup.simHash(docs, "doc_id", "text").orderBy("doc_id")
    }),

    // Similarity search: exact brute-force cosine top-5 per query vector
    // (two-stage top-k, broadcast queries, codegen'd distance expression).
    "q26_knn_cosine" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", queries, "qid", "qe", k = 5)
        .select(col("qid"), col("vec_id"), round(col("score"), 4).as("score"),
          col("rank"))
        .orderBy("qid", "rank")
    }),

    // Text analysis: char/token counting.
    "q27_text_tokens" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      docs.select(col("doc_id"), length(col("text")).as("n_chars_c"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }),

    // Text analysis: quality signals (ratios as native expressions).
    "q28_text_quality" -> ((s, dir) => {
      import graft.ops.TextAnalysis._
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      docs.select(col("doc_id"),
          round(punctRatio(col("text")), 4).as("punct_ratio"),
          round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
          round(meanWordLength(col("text")), 4).as("mean_word_len"))
        .orderBy("doc_id")
    }),

    // Text analysis: heuristic language ID (rows-only; accuracy asserted
    // against the lang column in the spec suite).
    "q29_langid" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      docs.select(col("doc_id"),
          graft.ops.TextAnalysis.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // Text analysis: rolling token-stream fingerprint (rows-only).
    "q30_fingerprint" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      docs.select(col("doc_id"),
          graft.ops.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // Multimodal: binary media column + metadata + batched feature
    // extraction plumbing over NON-image payloads (text bytes) — the real
    // ImageIO kernel must pass them through as zero embeddings without
    // failing. Oracle checks doc_id + byte length; the filter on the
    // feature width makes a broken kernel visible as a row-count mismatch.
    // The decode itself is verified pixel-exactly by q50_image_decode.
    "q31_multimodal" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .withColumn("media", col("text").cast("binary"))
      val withMeta = graft.ops.Multimodal.withMediaMeta(docs, "media", "image/fake")
      graft.ops.Multimodal.extractFeatures(withMeta, "media", dim = 8)
        .filter(size(col("media_features")) === 8)
        .select(col("doc_id"), col("media_meta.n_bytes").as("n_bytes"))
        .orderBy("doc_id")
    }),

    // §3.2 feature view batch query: event-time bounds + label/helper drop.
    "q32_batch_query" -> ((s, dir) => {
      import graft.functions.TimeFunctions.toEpochMillis
      val view = graft.view.FeatureView("ord_view", 1,
        Query.select(fg(s, dir, "orders"),
            Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"))
          .join(Query.select(fg(s, dir, "customer"), Seq("c_name", "c_acctbal")),
            leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
            joinType = JoinType.Inner),
        labels = Seq("o_totalprice"),
        trainingHelperColumns = Seq("c_acctbal"))
      val df = view.batchQuery(s,
        startTime = Some(toEpochMillis("1996-01-01")),
        endTime = Some(toEpochMillis("1997-01-01")))
      view.dropHelperColumns(df, forInference = false)
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          col("o_totalprice"), col("c_name"))
        .orderBy("o_orderkey")
    }),

    // §2.13 validation suite: one-pass row rules + uniqueness.
    "q33_validation" -> ((s, dir) => {
      import graft.ops.Validation._
      val o = s.read.parquet(TestTables.parquet(dir, "orders"))
      validateDf(o, Seq(
        notNull("o_custkey"),
        between("o_totalprice", 0.0, 200000.0),
        inSet("o_orderstatus", Seq("F", "O")),
        matchesRegex("o_orderpriority", "^[0-9]-"),
        unique("o_orderkey")))
        .orderBy("expectation")
    }),

    // §2.12 structured streaming: file source → watermark → tumbling
    // window agg → memory sink, driven to completion in-batch.
    "q34_stream_agg" -> ((s, dir) => {
      val batch = s.read.parquet(TestTables.parquet(dir, "events"))
      // glob path: the file streaming source needs a directory or glob
      val stream0 = graft.streaming.Streaming.readStream(
          s, "parquet", Some(s"$dir/events.*"),
          schema = Some(batch.schema))
      val stream = stream0
        .withColumn("ts2", TimeFunctions.eventTimeToTimestamp(stream0, "ts"))
      val agg = graft.streaming.Streaming.windowedAgg(
        stream, "ts2", "1 day", "1 hour", "event_type", "value")
      graft.streaming.Streaming.runToMemory(agg, "q34_sink_", "complete",
        statePartitions = Some(8))
        .select(unix_micros(col("w_start")).as("w_start_us"),
          col("event_type"), col("n"), round(col("total"), 2).as("total"))
        .orderBy("w_start_us", "event_type")
    }),

    // §3.3 serving analog: broadcast-hash feature-vector assembly.
    "q35_serving_vectors" -> ((s, dir) => {
      val view = graft.view.FeatureView("cust_view", 1,
        Query.select(fg(s, dir, "customer"),
            Seq("c_custkey", "c_name", "c_mktsegment"))
          .join(Query.select(fg(s, dir, "nation"), Seq("n_name")),
            leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
            prefix = Some("nat_")))
      val server = new graft.serving.FeatureVectorServer(s, view)
      val keys = s.read.parquet(TestTables.parquet(dir, "customer"))
        .filter(col("c_custkey") < 10).select("c_custkey")
      server.getFeatureVectors(keys)
        .select("c_custkey", "c_name", "c_mktsegment", "nat_n_name")
        .orderBy("c_custkey")
    }),

    // §2.1/2.2 lake lifecycle: create → upsert → delete → snapshot +
    // incremental read (runtime-created table; rows-only check).
    "q36_lake_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q36").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = tmp)
      val init = s.read.parquet(TestTables.parquet(dir, "nation"))
        .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("v"))
      val fgrp = fs.createFeatureGroup("nations_lake", init, Seq("id"))
      fs.insert(fgrp, Seq((0L, "UPDATED_0"), (99L, "NEW_99")).toDF("id", "v"))
      fs.delete(fgrp, Seq(Tuple1(1L)).toDF("id"))
      fs.read(Query.selectAll(fgrp)).orderBy("id")
    }),

    // §2.5 monitoring: windowed statistics comparison → drift flag,
    // through the engine's ONE-scan conditional-aggregation path
    // (Monitoring.run computes both windows in a single pass — never
    // scan a 100 TB table once per window).
    "q37_monitoring_shift" -> ((s, dir) => {
      import graft.functions.TimeFunctions.toEpochMillis
      import graft.ops.Monitoring._
      import graft.ops.Statistics.roundHalfUp
      val day = 24L * 3600 * 1000
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      // now = 2024-01-30: detection [01-15, 01-30), reference [01-01, 01-15)
      val r = graft.ops.Monitoring.run(s, ev, MonitoringConfig(
        name = "mean_value", featureGroup = "events", version = 1,
        feature = "value", eventTimeCol = "ts",
        detection = WindowSpec(sizeMillis = Some(15 * day)),
        reference = Some(WindowSpec(sizeMillis = Some(14 * day),
          offsetMillis = 15 * day)),
        comparison = ComparisonSpec("mean", threshold = 0.05, relative = true),
        schedule = ScheduleSpec(everyMillis = day)),
        nowMillis = toEpochMillis("2024-01-30"))
      import s.implicits._
      Seq(("mean_value",
        roundHalfUp(r.detectionValue, 4),
        roundHalfUp(r.referenceValue, 4),
        roundHalfUp(r.difference, 4), r.shiftDetected))
        .toDF("metric", "detection", "reference", "difference", "shift_detected")
    }),

    // §2.3/§2.9 ingest shaping: sanitize → Kafka wire encode (key = sorted
    // PK concat, value = row JSON) → decode roundtrip.
    "q38_wire_roundtrip" -> ((s, dir) => {
      import graft.ops.SchemaOps
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val wire = SchemaOps.toKafkaWire(SchemaOps.sanitizeNames(docs),
        primaryKey = Seq("doc_id"), headers = Map("source" -> "graft"))
      SchemaOps.fromKafkaWire(wire, docs.schema)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // §2.4 symmetric `on` keys (using-columns join, key collapses once).
    "q39_join_on_keys" -> ((s, dir) => {
      val spineDf = s.read.parquet(TestTables.parquet(dir, "orders"))
        .select(col("o_orderkey"),
          (col("o_orderpriority") === "1-URGENT").as("urgent"))
      val spineFg = FeatureGroup.spine("ok_spine", spineDf,
        primaryKey = Seq("o_orderkey"))
      q(s, Query.selectAll(spineFg)
        .join(Query.select(fg(s, dir, "orders"), Seq("o_totalprice")),
          on = Seq("o_orderkey"), joinType = JoinType.Left))
        .orderBy("o_orderkey")
    }),

    // §2.3 select_all excluding primary key and event time.
    "q40_select_all_excl" -> ((s, dir) => {
      q(s, Query.selectAll(fg(s, dir, "orders"),
          includePrimaryKey = false, includeEventTime = false))
        .orderBy("o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    }),

    // Headline: TPC-H Q3-style shipping-priority query through the
    // feature-store SQL entry (registered group views → spark.sql).
    "q41_sql_q3" -> ((s, dir) => {
      // isolated warehouse: the catalog persists per warehouseDir now
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = java.nio.file
        .Files.createTempDirectory("graft_q41").toString)
      Seq("customer", "orders", "lineitem").foreach(t => fs.register(fg(s, dir, t)))
      fs.sql(
        """SELECT l_orderkey,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                  date_format(o_orderdate, 'yyyy-MM-dd') AS od
           FROM customer_1
           JOIN orders_1 ON c_custkey = o_custkey
           JOIN lineitem_1 ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1995-03-15'
             AND l_shipdate > TIMESTAMP '1995-03-15'
           GROUP BY l_orderkey, o_orderdate
           ORDER BY revenue DESC, l_orderkey
           LIMIT 20""")
    }),

    // Headline: multi-way prefixed join through the IR with an aggregation
    // on top (customer ⋈ nation ⋈ region revenue rollup).
    "q42_ir_rollup" -> ((s, dir) => {
      val joined = q(s, Query.select(fg(s, dir, "customer"),
          Seq("c_custkey", "c_acctbal"))
        .join(
          Query.select(fg(s, dir, "nation"), Seq("n_name"))
            .join(Query.select(fg(s, dir, "region"), Seq("r_name")),
              leftOn = Seq("n_regionkey"), rightOn = Seq("r_regionkey"),
              joinType = JoinType.Inner),
          leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
          joinType = JoinType.Inner))
      joined.groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_balance"))
        .orderBy("r_name", "n_name")
    }),

    // End-to-end training-corpus pipeline: exact dedup → quality gates →
    // per-language corpus statistics (the 100 TB LLM-data use case in one
    // declarative plan — dedup window, native text expressions, one agg).
    "q43_corpus_pipeline" -> ((s, dir) => {
      import graft.ops.{Dedup, TextAnalysis}
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val deduped = Dedup.exact(docs, "doc_id", Seq("text"))
      val gated = deduped
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
        .withColumn("pr", TextAnalysis.punctRatio(col("text")))
        .filter(col("n_tok") >= 10 && col("pr") <= 0.2)
      gated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          round(avg(col("n_chars")), 2).as("avg_chars"))
        .orderBy("lang")
    }),

    // §2.10 ANN scale path A: multi-table hyperplane LSH (deterministic
    // seeded buckets; approximate → rows-only check).
    // Recall oracle: the seeded (deterministic) LSH top-5 is intersected
    // with the exact top-5 (itself bit-verified by q26); the oracle
    // asserts every query clears the recall floor. A broken banding/
    // probing scheme drops matches and flips the boolean.
    "q44_lsh_knn" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val ann = graft.ops.Similarity.lshKnn(emb, "vec_id", "embedding",
          queries, "qid", "qe", k = 5, dim = 64,
          nBits = 4, nTables = 8, nProbes = 4)
        .select(col("qid"), col("vec_id"))
      val exact = graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", queries, "qid", "qe", k = 5)
        .select(col("qid"), col("vec_id"))
      val hits = ann.join(exact, Seq("qid", "vec_id")).groupBy("qid").count()
      queries.select(col("qid")).join(broadcast(hits), Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("count"), lit(0L)) / 5.0 >= 0.6).as("meets_floor"))
        .orderBy("qid")
    }),

    // §2.10 ANN scale path B: IVF coarse quantizer (KMeans cells, nProbe
    // search; approximate → rows-only check).
    "q45_ivf_knn" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      // sampled training: the coarse quantizer needs a representative
      // sample, never the full corpus (at 100 TB that's the whole point)
      val idx = graft.ops.IvfIndex.build(emb, "vec_id", "embedding",
        nCells = 8, trainSampleFraction = 0.25, maxIter = 8)
      // same recall-floor oracle as q44: seeded KMeans → deterministic
      // cells → deterministic recall vs the bit-verified exact top-5.
      // The synthetic corpus is near-uniform (no cluster structure), so
      // recall ≈ probe fraction: 6/8 cells clears the 0.6 floor at both
      // sf0.01 and sf0.1 (measured min 0.6). On clustered real data the
      // fraction drops and nProbe comes back down.
      val ann = graft.ops.IvfIndex.search(idx, "vec_id", "embedding",
          queries, "qid", "qe", k = 5, nProbe = 6)
        .select(col("qid"), col("vec_id"))
      val exact = graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", queries, "qid", "qe", k = 5)
        .select(col("qid"), col("vec_id"))
      val hits = ann.join(exact, Seq("qid", "vec_id")).groupBy("qid").count()
      queries.select(col("qid")).join(broadcast(hits), Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("count"), lit(0L)) / 5.0 >= 0.6).as("meets_floor"))
        .orderBy("qid")
    }),

    // §2.13 monitoring config engine: persisted config + due-schedule +
    // one-pass dual-window comparison + persisted result log, at a fixed
    // deterministic "now".
    "q47_monitoring_engine" -> ((s, dir) => {
      import graft.ops.Monitoring._
      import graft.ops.Statistics.roundHalfUp
      val hour = 3600L * 1000
      val eng = new MonitoringEngine(s, java.nio.file.Files
        .createTempDirectory("graft_q47").toString)
      eng.saveConfig(MonitoringConfig(
        name = "value_drift", featureGroup = "events", version = 1,
        feature = "value", eventTimeCol = "ts",
        detection = WindowSpec(sizeMillis = Some(24 * hour)),
        reference = Some(WindowSpec(sizeMillis = Some(24 * hour),
          offsetMillis = 24 * hour)),
        comparison = ComparisonSpec("mean", threshold = 0.05, relative = true),
        schedule = ScheduleSpec(everyMillis = 24 * hour)))
      val now = graft.functions.TimeFunctions.toEpochMillis("2024-01-20")
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val rs = eng.runDue(now, _ => ev)
      import s.implicits._
      rs.map(r => (r.configName, roundHalfUp(r.detectionValue, 4),
          roundHalfUp(r.referenceValue, 4), roundHalfUp(r.difference, 4),
          r.shiftDetected))
        .toDF("config_name", "detection", "reference", "difference",
          "shift_detected")
    }),

    // §2.4 PIT join, SALTED skew path: identical semantics to q07 with
    // each hot key spread over 4 sub-partitions (spine salted, right side
    // replicated per bucket) — the driver gate proves the skew plan is
    // value-identical to the unsalted one against the same ASOF oracle.
    "q49_pit_salted" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id", "value")
      val joined = graft.ops.PointInTimeJoin
        .asOf(clicks, "ts", views, "ts", Seq("user_id"), Seq("user_id"),
          prefix = "view_", saltBuckets = 4)
      joined.select(col("event_id"), col("user_id"),
          TimeFunctions.eventTimeToMicros(joined, "ts").as("ts_us"),
          TimeFunctions.eventTimeToMicros(joined, "view_ts").as("view_ts_us"),
          col("view_event_id"), col("view_value"))
        .orderBy("event_id")
    }),

    // §2.12 stateful streaming: gap-based sessionization via
    // flatMapGroupsWithState + event-time timeout, driven to completion
    // with AvailableNow. Sessions still open at end-of-stream (watermark
    // never passed last+gap) stay in state — the oracle excludes each
    // key's trailing session under the same rule.
    "q48_sessionization" -> ((s, dir) => {
      val batch = s.read.parquet(TestTables.parquet(dir, "events"))
      val stream0 = graft.streaming.Streaming.readStream(
          s, "parquet", Some(s"$dir/events.*"),
          schema = Some(batch.schema))
      val stream = stream0
        .withColumn("ts2", TimeFunctions.eventTimeToTimestamp(stream0, "ts"))
      val sessions = graft.streaming.Streaming.sessionize(
        stream, "user_id", "ts2", "value",
        gapMillis = 6L * 3600 * 1000, watermark = "0 seconds")
      graft.streaming.Streaming.runToMemory(sessions.toDF, "q48_sink_",
        "append", statePartitions = Some(8))
        .select(col("key"),
          col("sessionStart").as("session_start"),
          col("sessionEnd").as("session_end"),
          col("nEvents").as("n_events"),
          round(col("total"), 2).as("total"))
        .orderBy("key", "session_start")
    }),

    // LLM-ops: embedding near-duplicate pairs via multi-table LSH
    // bucketing. Near-dups are planted deterministically (perturbed copies
    // of the first 50 vectors; +0.25f is exactly representable, so Spark
    // float and DuckDB double→float arithmetic agree bit-for-bit) and the
    // seeded LSH achieves full recall at this cosine, so the output equals
    // the plain-SQL exact cosine-threshold pairs.
    "q46_embedding_neardup" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val dups = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"),
          concat(
            array(element_at(col("embedding"), 1) + lit(0.25f)),
            slice(col("embedding"), 2, 10000))
            .cast("array<float>").as("embedding"))
      val corpus = emb.unionByName(dups)
      graft.ops.Dedup.embeddingNearDup(corpus, "vec_id", "embedding",
          dim = 64, threshold = 0.95)
        .select(col("idA"), col("idB"), round(col("cosine"), 4).as("cosine"))
        .orderBy("idA", "idB")
    }),

    // Multimodal REAL decode: planted PNGs (pixel channels are a closed
    // form of (doc_id, x, y) — Multimodal.plantedPng) are encoded, then
    // decoded back through the actual javax.imageio kernel. The oracle
    // recomputes the per-image channel sums and luminance histogram from
    // the closed form alone — any decode defect breaks the integer match.
    "q50_image_decode" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select("doc_id")
      val withPng = graft.ops.Multimodal.withPlantedPng(docs, "doc_id", "img")
      graft.ops.Multimodal.extractImageStats(withPng, "img")
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          col("lum_h0"), col("lum_h1"), col("lum_h2"), col("lum_h3"))
        .orderBy("doc_id")
    }),

    // External feature group: connector-backed (csv), registered as a
    // first-class PERSISTED catalog entity with a declared schema, then
    // read through a SECOND FeatureStore over the same warehouse — the
    // oracle match proves the restart-survived connector contract, not
    // just the in-memory registration.
    "q51_external_fg" -> ((s, dir) => {
      val wh = java.nio.file.Files.createTempDirectory("graft_q51").toString
      val nation = s.read.parquet(TestTables.parquet(dir, "nation"))
      val csvDir = s"$wh/nation_csv"
      nation.coalesce(1).write.option("header", "true").csv(csvDir)
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      fs.createExternalFeatureGroup("nation_ext",
        graft.sources.Connectors.Generic("csv", Map("header" -> "true")),
        primaryKey = Seq("n_nationkey"), path = Some(csvDir),
        features = nation.schema.fields.toSeq.map(f =>
          graft.model.Feature(f.name, f.dataType, f.name == "n_nationkey")))
      val restarted = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val ext = restarted.getFeatureGroup("nation_ext")
      restarted.read(
          Query.select(ext, Seq("n_nationkey", "n_name", "n_regionkey")))
        .orderBy("n_nationkey")
    }),

    // §2.12 sessionization via Spark's NATIVE session_window operator —
    // the declarative fast path; must emit exactly what the custom-state
    // q48 path emits (same gap + watermark rules), checked against the
    // SAME SQL oracle.
    "q52_session_window" -> ((s, dir) => {
      val batch = s.read.parquet(TestTables.parquet(dir, "events"))
      val stream0 = graft.streaming.Streaming.readStream(
          s, "parquet", Some(s"$dir/events.*"),
          schema = Some(batch.schema))
      val stream = stream0
        .withColumn("ts2", TimeFunctions.eventTimeToTimestamp(stream0, "ts"))
      val sessions = graft.streaming.Streaming.sessionizeNative(
        stream, "user_id", "ts2", "value",
        gapMillis = 6L * 3600 * 1000, watermark = "0 seconds")
      graft.streaming.Streaming.runToMemory(sessions, "q52_sink_", "append",
        statePartitions = Some(8))
        .select(col("key"),
          col("sessionStart").as("session_start"),
          col("sessionEnd").as("session_end"),
          col("nEvents").as("n_events"),
          round(col("total"), 2).as("total"))
        .orderBy("key", "session_start")
    }),

    // §2.13 feature logging: served vectors + model predictions appended
    // to a lake-backed log at controlled log times, read back with a
    // [start, end) time filter (core/feature_view_engine.py:971-1107,
    // core/feature_logging.py contract). The oracle recomputes the
    // middle batch from the base table — proving both the log write and
    // the time-filtered read.
    "q53_feature_logging" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q53")
        .toString + "/served_log"
      val cust = s.read.parquet(TestTables.parquet(dir, "customer"))
      // 0.25 is exactly representable: double*0.25 is exact scaling, so
      // Spark and the DuckDB oracle produce bit-identical predictions
      // with no cross-engine rounding-rule dependence
      def served(lo: Int, hi: Int) = cust
        .filter(col("c_custkey") >= lo && col("c_custkey") < hi)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          (col("c_acctbal").cast("double") * lit(0.25)).as("prediction"))
      val fg = graft.model.FeatureGroup("served_log", 1,
        primaryKey = Seq("c_custkey"),
        source = graft.model.LakeSource(root))
      import graft.serving.FeatureLogging
      val ts = Seq("2024-01-01", "2024-02-01", "2024-03-01")
        .map(graft.functions.TimeFunctions.toEpochMillis)
      FeatureLogging.log(s, root, fg, served(1, 11), Some(ts(0)))
      FeatureLogging.log(s, root, fg, served(11, 21), Some(ts(1)))
      FeatureLogging.log(s, root, fg, served(21, 31), Some(ts(2)))
      FeatureLogging.read(s, root, fg,
          startMillis = Some(ts(1)), endMillis = Some(ts(2)))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("prediction"), col("_log_time").as("log_time"))
        .orderBy("c_custkey")
    }),

    // §2.13 tags / keywords / provenance ROUND-TRIP: tag groups and a
    // view, restart (second FeatureStore over the same warehouse), then
    // answer discovery queries — find-by-tag/keyword, reverse provenance
    // (dependent views), IR-derived upstream links, view tags. Oracle =
    // the deterministic expected rows; scale-independent by design.
    "q54_tags_provenance" -> ((s, dir) => {
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft_q54").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val nation = s.read.parquet(TestTables.parquet(dir, "nation"))
      val region = s.read.parquet(TestTables.parquet(dir, "region"))
      val fgN = fs.createFeatureGroup("nations_meta", nation,
        primaryKey = Seq("n_nationkey"))
      val fgR = fs.createFeatureGroup("regions_meta", region,
        primaryKey = Seq("r_regionkey"))
      fs.addTag(fgN, "owner", "growth-team")
      fs.addTag(fgR, "owner", "core-team")
      fs.addKeywords(fgN, Seq("geo", "dim"))
      val view = graft.view.FeatureView("geo_view", 1,
        Query.select(fgN, Seq("n_nationkey", "n_name"))
          .join(Query.select(fgR, Seq("r_name")),
            leftOn = Seq("n_regionkey"), rightOn = Seq("r_regionkey")))
      fs.saveFeatureView(view)
      fs.addTag(view, "purpose", "demo")
      // restart: a brand-new store over the same warehouse
      val fs2 = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val viewBack = fs2.getFeatureView("geo_view", 1)
      val rows =
        fs2.findGroupsByTag("owner").map(g =>
          ("group_by_tag:owner", g.name, fs2.getTags(g)("owner"))) ++
        fs2.findGroupsByKeyword("geo").map(g =>
          ("group_by_keyword:geo", g.name,
            fs2.getKeywords(g).sorted.mkString(","))) ++
        fs2.dependentViews(fgN).map { case (n, v) =>
          ("dependent_view:nations_meta", n, s"v$v") } ++
        fs2.dependentViews(fgR).map { case (n, v) =>
          ("dependent_view:regions_meta", n, s"v$v") } ++
        fs2.provenance(viewBack).map(l =>
          ("provenance", l.groupName, l.features.mkString(","))) ++
        fs2.getTags(viewBack).toSeq.sorted.map { case (k, v) =>
          (s"view_tag:$k", viewBack.name, v) }
      rows.toDF("kind", "name", "detail").orderBy("kind", "name")
    }),

    // Training-dataset VERSIONS as persisted catalog entities: build with
    // EXACT split sizes, materialize per-split files + descriptor, restart
    // (second FeatureStore over the same warehouse), read the artifact
    // back purely from its descriptor. Oracle = the closed-form exact
    // split sizes over the source table — proving build, write, metadata
    // persistence, and read-back in one gate.
    "q55_training_dataset" -> ((s, dir) => {
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft_q55").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val view = graft.view.FeatureView("td_view", 1,
        Query.select(fg(s, dir, "customer"),
          Seq("c_custkey", "c_name", "c_acctbal")))
      fs.saveFeatureView(view)
      fs.createTrainingDataset(view, 1,
        randomWeights =
          Map("train" -> 0.7, "test" -> 0.2, "validation" -> 0.1),
        seed = 42L, exactSizes = true)
      // restart: a brand-new store over the same warehouse
      val fs2 = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val meta = fs2.getTrainingDataset("td_view", 1, 1)
      val sized = fs2.readTrainingDataset("td_view", 1, 1).toSeq
        .map { case (k, df) => (k, df.count()) }.sortBy(_._1)
      (sized :+ (("_total", sized.map(_._2).sum)))
        .toDF("split", "n_rows")
        .withColumn("format", lit(meta.format))
        .withColumn("td_version", lit(meta.version))
        .orderBy("split")
    }),

    // Schema evolution: append declared features to a committed lake
    // group WITHOUT rewriting data — rows predating the new columns read
    // back as the features' default values (null when none) through the
    // aligned snapshot; a post-append insert carries real values. The
    // restart (second store) proves the evolved definition persists.
    "q56_append_features" -> ((s, dir) => {
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft_q56").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val init = s.read.parquet(TestTables.parquet(dir, "nation"))
        .select(col("n_nationkey").cast("long").as("id"),
          col("n_name").as("v"))
      val fgrp = fs.createFeatureGroup("nations_evolved", init, Seq("id"))
      val evolved = fs.appendFeatures(fgrp, Seq(
        graft.model.Feature("score",
          org.apache.spark.sql.types.DoubleType,
          defaultValue = Some(0.5)),
        graft.model.Feature("note",
          org.apache.spark.sql.types.StringType)))
      fs.insert(evolved, Seq((100L, "NEW_A", 1.5, "x"),
          (101L, "NEW_B", 2.5, "y"))
        .toDF("id", "v", "score", "note"))
      // restart: the evolved definition must persist
      val fs2 = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      fs2.read(Query.selectAll(fs2.getFeatureGroup("nations_evolved")))
        .orderBy("id")
    }),

    // Dedup clusters: near-dup candidate pairs → connected components
    // (alternating large-star/small-star) → (member, cluster
    // representative = min reachable id). The oracle rebuilds the same
    // pair graph in SQL and closes it transitively with a recursive CTE,
    // so transitive-closure semantics are verified value-for-value.
    "q57_dup_clusters" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .filter(col("doc_id") < 150)
      val pairs = graft.ops.Dedup.tokenJaccard(docs, "doc_id", "text",
        threshold = 0.7)
      graft.ops.Dedup.duplicateClusters(pairs).orderBy("id")
    }),

    // Decontamination: distinct word-3-gram overlap of each corpus doc
    // against a probe (eval) slice of the corpus; char-poly gram hashing
    // so the oracle replays the exact same join in SQL on gram strings.
    "q58_decontaminate" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val probe = docs.filter(pmod(col("doc_id"), lit(17)) === 3)
      val corpus = docs.filter(pmod(col("doc_id"), lit(17)) =!= 3)
      graft.ops.Dedup.contaminationOverlap(corpus, "doc_id", "text",
          probe, "text", n = 3,
          hashFn = graft.functions.TextHash.charPolyHash)
        .orderBy("doc_id")
    }),

    // Token-budget sharding: reproducible content-shuffle order (text
    // fingerprint), distributed two-level prefix sum, ~2000-token bins.
    "q59_token_shards" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .withColumn("n_tokens",
          graft.ops.TextAnalysis.tokenCount(col("text")))
      graft.ops.Sharding.tokenBudgetBins(docs, "doc_id", "n_tokens",
          budget = 2000L,
          orderKeyCol = graft.ops.TextAnalysis.fingerprint(col("text")))
        .orderBy("doc_id")
    }),

    // Stratified deterministic sampling by language: pure hash-threshold
    // filter (zero shuffle, reproducible across engines); the salted
    // char-poly id hash is replayed verbatim by the SQL oracle.
    "q60_stratified_sample" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val salted = (c: org.apache.spark.sql.Column) =>
        graft.functions.TextHash.charPolyHash(
          concat_ws(":", lit("graft-sample"), c.cast("string"),
            reverse(c.cast("string"))))
      graft.ops.Splits.stratifiedDeterministic(docs, "doc_id", "lang",
          Map("en" -> 0.5, "es" -> 0.25, "fr" -> 0.25, "de" -> 0.1),
          hashFn = salted)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // Leakage-safe split: near-dup clusters (q57's components) are
    // assigned to train/test/validation as WHOLE groups via a salted
    // group-key hash — near-identical documents can never straddle
    // splits. The oracle replays clustering (recursive CTE) + the exact
    // threshold arithmetic.
    "q61_leakage_safe_split" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val sub = docs.filter(col("doc_id") < 150)
      val pairs = graft.ops.Dedup.tokenJaccard(sub, "doc_id", "text",
        threshold = 0.7)
      val clusters = graft.ops.Dedup.duplicateClusters(pairs)
      val grouped = docs
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("grp", coalesce(col("component"), col("doc_id")))
      // label column instead of a 3-way union of filtered frames: the
      // union form re-evaluated the iterative CC clustering lineage once
      // per split branch
      graft.ops.Splits.groupedLabeled(grouped,
          graft.ops.Splits.GroupSplit("grp",
            Seq("train" -> 0.7, "test" -> 0.2, "validation" -> 0.1)))
        .select(col("doc_id"), col("split")).orderBy("doc_id")
    }),

    // §2.10 ANN scale path C: int8-quantized stage-1 scan (4× smaller
    // than the float column) + exact re-rank over k·refine candidates.
    // Same recall-floor oracle construction as q44/q45 vs the
    // bit-verified exact top-5; with refine=4 the only approximation is
    // stage-1 candidate recall (measured 1.0 here; floor 0.8 for slack).
    "q62_quantized_knn" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val ann = graft.ops.Quantization.quantizedKnn(emb, "vec_id",
          "embedding", queries, "qid", "qe", k = 5, dim = 64, refine = 4)
        .select(col("qid"), col("vec_id"))
      val exact = graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", queries, "qid", "qe", k = 5,
          metric = graft.functions.VectorFunctions.L2)
        .select(col("qid"), col("vec_id"))
      val hits = ann.join(exact, Seq("qid", "vec_id")).groupBy("qid").count()
      queries.select(col("qid")).join(broadcast(hits), Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("count"), lit(0L)) / 5.0 >= 0.8).as("meets_floor"))
        .orderBy("qid")
    }),

    // Capstone: the full LLM training-data prep pipeline composed from
    // the individually-oracled operators — near-dup clustering →
    // keep-one dedup → decontamination vs an eval probe → quality gate →
    // leakage-safe grouped split → per-split token-budget shards. The
    // oracle replays the ENTIRE chain in one SQL statement (recursive
    // CTE + gram join + salted thresholds + partitioned prefix sum).
    "q63_corpus_pipeline_v2" -> ((s, dir) => {
      import graft.ops._
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val sub = docs.filter(col("doc_id") < 150)
      val clusters = Dedup.duplicateClusters(
        Dedup.tokenJaccard(sub, "doc_id", "text", threshold = 0.7))
      val deduped = Dedup.deduplicateByClusters(docs, "doc_id", clusters)
      val probe = docs.filter(pmod(col("doc_id"), lit(17)) === 3)
      val corpus = deduped.filter(pmod(col("doc_id"), lit(17)) =!= 3)
      val clean = Dedup.decontaminate(corpus, "doc_id", "text",
        probe, "text", n = 3, minOverlap = 3,
        hashFn = graft.functions.TextHash.charPolyHash)
      val qual = clean
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .filter(col("n_tokens") >= 5)
      // persist the cleaned corpus: the one-pass sharding below still
      // consumes it twice (window pass + range-totals action)
      val grouped = qual
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("grp", coalesce(col("component"), col("doc_id")))
        .cache()
      // split label as a COLUMN + one-pass per-split sharding: the former
      // per-split-frame form ran tokenBudgetBins (2 sequential driver
      // actions) once per split — 6 actions over the clustering lineage;
      // this is one window shuffle + one action for all three splits
      val labeled = Splits.groupedLabeled(grouped, Splits.GroupSplit("grp",
        Seq("train" -> 0.7, "test" -> 0.2, "validation" -> 0.1)))
      Sharding.tokenBudgetBinsPerSplit(labeled, "split", "doc_id",
          "n_tokens", budget = 500L,
          orderKeyCol = TextAnalysis.fingerprint(col("text")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens_c"),
          countDistinct("bin").as("n_bins"))
        .orderBy("split")
    }),

    // Text quality: within-document repetition — fraction of word
    // 3-grams that repeat an earlier 3-gram (Gopher-style degenerate-
    // text signal). Full value oracle on the list algebra.
    "q64_repetition" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      docs.select(col("doc_id"),
          round(graft.ops.TextAnalysis.duplicateNgramFraction(col("text"), 3), 4)
            .as("dup_3gram_frac"))
        .orderBy("doc_id")
    }),

    // PII redaction over planted emails/phones/IPs (the source docs carry
    // none, so both engines synthesize identical PII text from doc_id and
    // must scrub it identically — the regex subset is Java/RE2-shared).
    "q65_pii_redact" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val pii = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or +1 (555) 010-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" at 10.2.3."), pmod(col("doc_id"), lit(200)).cast("string"))
      docs.select(col("doc_id"),
          graft.ops.TextAnalysis.redactPii(pii).as("redacted"))
        .orderBy("doc_id")
    }),

    // IR → SQL generation (query.to_string analog,
    // constructor/query.py:581-607): Spark executes the GENERATED text
    // over temp views, and the oracle is the IDENTICAL text under DuckDB
    // — one statement, two engines, hash-equal results. QuerySqlSpec
    // additionally proves the text ≡ QueryPlanner.plan on every shape.
    "q66_sql_generation" -> ((s, dir) => {
      Seq("orders", "customer", "nation", "lineitem").foreach { t =>
        s.read.parquet(TestTables.parquet(dir, t)).createOrReplaceTempView(t)
      }
      s.sql(q66Sql)
    }),

    // FG-level statistics lifecycle: per-group StatisticsConfig gates a
    // PERSISTED statistics engine — compute_statistics / get_statistics
    // (feature_group.py:1704,3253; statistics_config.py:24-100). Two lake
    // groups with separate histories; retrieval is latest-run-≤-time
    // through a RESTARTED store, proving history + config are warehouse
    // state, not session state. Oracle replays every metric (profile,
    // exact uniqueness family, correlation) in plain SQL.
    "q67_fg_statistics" -> ((s, dir) => {
      val wh = java.nio.file.Files.createTempDirectory("graft_q67").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      // only the columns the statistics touch ride into the lake — the
      // lifecycle under test is compute/persist/retrieve, not the cost of
      // copying five unread columns twice
      val orders = s.read.parquet(TestTables.parquet(dir, "orders"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val cfg = graft.model.StatisticsConfig(exactUniqueness = true,
        correlations = true, columns = Seq("o_custkey", "o_totalprice"))
      val full = fs.createFeatureGroup("orders_stats", orders,
        primaryKey = Seq("o_orderkey"), statisticsConfig = cfg)
      val open = fs.createFeatureGroup("open_orders_stats",
        orders.filter(col("o_orderstatus") === "O"),
        primaryKey = Seq("o_orderkey"), statisticsConfig = cfg)
      fs.computeStatistics(full, atMillis = 1000L)
      fs.computeStatistics(open, atMillis = 2000L)
      val fs2 = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val a = fs2.getStatistics(fs2.getFeatureGroup("orders_stats"),
        computationTime = Some(1500L))
      val b = fs2.getStatistics(fs2.getFeatureGroup("open_orders_stats"))
      a.withColumn("group_name", lit("orders_stats"))
        .unionByName(b.withColumn("group_name", lit("open_orders_stats")))
        .select("group_name", "computed_at", "feature", "metric", "value")
        .orderBy("group_name", "feature", "metric")
    }),

    // Markup cleanup (C4-style extract-text): the source docs carry no
    // HTML, so both engines wrap each text in identical doc_id-derived
    // markup (tags, a script block, entities) and must strip it back to
    // the same clean text — regexes are in the Java∩RE2 shared subset.
    "q68_strip_markup" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val wrapped = concat(
        lit("<html><body class=\"c"), col("doc_id").cast("string"),
        lit("\"><p>"), col("text"),
        lit("</p><script type=\"text/javascript\">var x = 1 < 2;</script>"),
        lit("&amp;&#169;<br/></body></html>"))
      docs.select(col("doc_id"),
          graft.ops.TextAnalysis.stripMarkup(wrapped).as("clean_text"),
          round(graft.ops.TextAnalysis.markupRatio(wrapped), 4)
            .as("markup_ratio"))
        .orderBy("doc_id")
    }),

    // The SQL function registry end-to-end: the engine's text family
    // registered on the session (GraftExtensions.register) and invoked
    // from RAW SQL — the path a FeatureStore.sql user takes. Same
    // semantics the Column API queries prove (q27/q30/q65), here through
    // the FunctionRegistry.
    "q69_sql_text_functions" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      s.read.parquet(TestTables.parquet(dir, "documents"))
        .createOrReplaceTempView("docs_sql")
      s.sql(
        """SELECT doc_id,
                  graft_token_count(text) AS n_tokens,
                  graft_fingerprint(text) AS fp,
                  graft_redact_pii(text || ' at 10.2.3.4') AS safe
           FROM docs_sql ORDER BY doc_id""")
    }),

    // Incremental distinct-count monitoring: one HLL sketch per day of
    // events (mergeable ~KB binaries — at 100 TB you sketch each new
    // commit once and NEVER rescan history), distinct users over window
    // ranges answered by sketch union. Sketches are RNG-free, so the
    // estimate is deterministic; the oracle gates it against the exact
    // distinct count at ±5% (HLL lgK=12 σ≈1.6%), q44-recall-floor style.
    "q70_distinct_sketch" -> ((s, dir) => {
      import s.implicits._
      import graft.ops.Monitoring
      val unit = 86400L * 1000L * 1000L // one day of micros
      val ev0 = s.read.parquet(TestTables.parquet(dir, "events"))
      // normalize the event-time column to epoch micros up front — the
      // sketch windows and the exact-count replay then share one unit
      // regardless of the parquet writer's ts representation
      val ev = ev0.withColumn("ts_us", TimeFunctions.eventTimeToMicros(ev0, "ts"))
      val sketches = Monitoring.distinctSketches(ev, "ts_us", "user_id", unit)
        .pinned(true)
      val b = sketches.agg(min("window"), max("window")).head
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val estAll = Monitoring.estimateDistinct(sketches, lo, hi)
      val estWeek = Monitoring.estimateDistinct(sketches, lo, lo + 6)
      val days = ev.select(
        expr(s"ts_us div $unit").as("w"), col("user_id"))
      val exactAll = days.agg(countDistinct("user_id")).head.getLong(0)
      val exactWeek = days.filter(col("w") <= lo + 6)
        .agg(countDistinct("user_id")).head.getLong(0)
      def ok(est: Long, exact: Long) =
        exact > 0 && math.abs(est - exact).toDouble / exact <= 0.05
      Seq(("all_days", exactAll, ok(estAll, exactAll)),
          ("first_week", exactWeek, ok(estWeek, exactWeek)))
        .toDF("span", "exact_distinct", "sketch_within_5pct")
        .orderBy("span")
    }),

    // Per-group quantile gate: keep the top 30% of documents BY TOKEN
    // COUNT within each language — threshold from one agg pass, broadcast
    // back, row-local keep decision (no per-group windows). Exact
    // percentiles here so DuckDB's quantile_cont replays the thresholds.
    "q71_top_fraction" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .withColumn("n_tokens",
          graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
      graft.ops.Splits.topFractionByGroup(docs, "lang", "n_tokens",
          fraction = 0.3, exact = true)
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    }),

    // §2.1 time travel, driver-oracled end-to-end: 4 commits (create →
    // upsert → upsert → delete), then an `as_of` snapshot pinned
    // mid-history (after commit 2) UNION the incremental changes over
    // (t1, t3]. Commit times are wallclock, captured from the returned
    // CommitMeta — the oracle replays WHICH rows each commit wrote, so
    // expected rows are closed-form while the timestamps stay real. The
    // trailing delete sits outside both windows and must not leak into
    // either read.
    "q72_time_travel" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q72").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = tmp)
      val init = s.read.parquet(TestTables.parquet(dir, "nation"))
        .select(col("n_nationkey").cast("long").as("id"),
          col("n_name").as("v"))
      val fgrp = fs.createFeatureGroup("nations_tt", init, Seq("id"))
      val root = fgrp.source match {
        case graft.model.LakeSource(r) => r
        case other => sys.error(s"expected a lake source, got $other")
      }
      val t1 = graft.sources.Lake.listCommits(s, root).last
      val c2 = fs.insert(fgrp,
        Seq((0L, "V2_0"), (100L, "V2_100")).toDF("id", "v"))
      val c3 = fs.insert(fgrp,
        Seq((0L, "V3_0"), (2L, "V3_2"), (101L, "V3_101")).toDF("id", "v"))
      fs.delete(fgrp, Seq(Tuple1(3L)).toDF("id"))
      val asOf = fs.read(Query.selectAll(fgrp).asOf(c2.commitTime))
        .select(lit("as_of").as("src"), col("id"), col("v"))
      val changes = graft.sources.Lake.readChanges(s, root, fgrp,
          exclusiveStart = t1, inclusiveEnd = c3.commitTime)
        .select(lit("changes").as("src"), col("id"), col("v"))
      asOf.unionByName(changes).orderBy("src", "id")
    }),

    // §2.12 streaming dedup vs the ALREADY-STORED corpus: documents
    // arrive as a stream, rows whose content fingerprint exists in the
    // historical fingerprint set (docs < 250 here) are dropped by the
    // per-micro-batch stream-static anti-join. Oracle replays the same
    // char-poly fingerprint and a null-safe anti-join in SQL.
    "q73_stream_dedup_history" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val history = docs.filter(col("doc_id") < 250)
        .select(graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"))
      val stream = graft.streaming.Streaming.readStream(
        s, "parquet", Some(s"$dir/documents.*"), schema = Some(docs.schema))
      val fresh = graft.streaming.Streaming.dedupAgainstHistory(
        stream, graft.ops.TextAnalysis.fingerprint(col("text")), history)
      graft.streaming.Streaming
        .runToMemory(fresh.select("doc_id", "lang"), "q73_sink_", "append",
          statePartitions = Some(8))
        .orderBy("doc_id")
    }),

    // §2.10 persisted IVF: build → save (cell-partitioned parquet, so a
    // probe's cell filter becomes partition pruning) → load → search.
    // The reloaded index must return EXACTLY the in-memory index's
    // neighbors (same centroids, same cells), and those neighbors must
    // clear the same recall floor as q45 against the bit-verified exact
    // top-5 — restart-survival of the index as a driver-oracled fact.
    "q74_ivf_persisted" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val built = graft.ops.IvfIndex.build(emb, "vec_id", "embedding",
        nCells = 8, trainSampleFraction = 0.25, maxIter = 8)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q74").toString
      graft.ops.IvfIndex.save(built, tmp)
      val loaded = graft.ops.IvfIndex.load(s, tmp)
      def run(ix: graft.ops.IvfIndex.Index) =
        graft.ops.IvfIndex.search(ix, "vec_id", "embedding",
            queries, "qid", "qe", k = 5, nProbe = 6)
          .select(col("qid"), col("vec_id"))
      val inMem = run(built)
      val reloaded = run(loaded)
      val mismatched = inMem.exceptAll(reloaded)
        .unionByName(reloaded.exceptAll(inMem))
        .select(col("qid")).distinct().withColumn("_bad", lit(1))
      val exact = graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", queries, "qid", "qe", k = 5)
        .select(col("qid"), col("vec_id"))
      val hits = reloaded.join(exact, Seq("qid", "vec_id"))
        .groupBy("qid").count()
      queries.select(col("qid"))
        .join(broadcast(mismatched), Seq("qid"), "left")
        .join(broadcast(hits), Seq("qid"), "left")
        .select(col("qid"),
          col("_bad").isNull.as("identical_after_reload"),
          (coalesce(col("count"), lit(0L)) / 5.0 >= 0.6).as("meets_floor"))
        .orderBy("qid")
    }),

    // §2.5 commit metadata: the per-commit insert/update/delete counters
    // the lake computes with its key-pruned incremental classification
    // (one semi-join of the BATCH keys against the snapshot — never a
    // full-table scan per commit). A controlled create → upsert → delete
    // sequence has closed-form expected counters; the sequence number
    // comes from the commit-time order.
    "q75_commit_metadata" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q75").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = tmp)
      val init = s.read.parquet(TestTables.parquet(dir, "nation"))
        .select(col("n_nationkey").cast("long").as("id"),
          col("n_name").as("v"))
      val fgrp = fs.createFeatureGroup("nations_meta", init, Seq("id"))
      fs.insert(fgrp, Seq((0L, "UPD"), (99L, "NEW")).toDF("id", "v"))
      fs.delete(fgrp, Seq(Tuple1(1L)).toDF("id"))
      val root = fgrp.source match {
        case graft.model.LakeSource(r) => r
        case other => sys.error(s"expected a lake source, got $other")
      }
      // the three operations are distinct, so the op name itself is the
      // deterministic sort key — no global row_number window needed
      graft.sources.Lake.commitDetails(s, root)
        .select(col("operation").as("op"),
          col("rowsInserted").as("ins"), col("rowsUpdated").as("upd"),
          col("rowsDeleted").as("del"))
        .orderBy("op")
    }),

    // §2.2 training-dataset FILE write, VALUE-level: materialize a view as
    // a csv training dataset (writer defaults: header, round-trippable
    // types), then read it back through the persisted descriptor in a
    // RESTARTED store. The oracle is the projection itself — any
    // writer/reader default drift (header, quoting, type coercion) breaks
    // the value hash, which is the parity q55's size-only check can't see.
    "q76_td_file_roundtrip" -> ((s, dir) => {
      val wh = java.nio.file.Files.createTempDirectory("graft_q76").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val view = graft.view.FeatureView("td_csv_view", 1,
        Query.select(fg(s, dir, "nation"),
          Seq("n_nationkey", "n_name", "n_regionkey")))
      fs.saveFeatureView(view)
      fs.createTrainingDataset(view, 1, format = "csv", coalesce = true)
      val fs2 = new graft.catalog.FeatureStore(s, warehouseDir = wh)
      val splits = fs2.readTrainingDataset("td_csv_view", 1, 1)
      require(splits.size == 1, s"expected one split, got ${splits.keySet}")
      splits.head._2
        .select(col("n_nationkey").cast("long").as("id"),
          col("n_name").as("name"),
          col("n_regionkey").cast("long").as("region"))
        .orderBy("id")
    }),

    // Corpus-level TF-IDF keywords: idf needs every document's vocabulary
    // — a two-groupBy + vocabulary-join shape no row-local expression can
    // express. Top-3 per document, score ties broken by term; the oracle
    // replays tf·ln(N/df) with the identical tokenization and ranks on
    // the UNROUNDED score like the engine.
    "q77_tfidf_keywords" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .filter(col("doc_id") < 200)
      graft.ops.TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
        .orderBy("doc_id", "rk")
    }),

    // C4-style boilerplate line removal. The synthetic corpus has no
    // newlines, so the query derives a deterministic multi-line view
    // (2-token chunks as "lines" — the tiny vocabulary makes real
    // cross-document repeats) before stripping lines shared by >20 docs.
    "q78_line_dedup" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      // let-bind the token array: slice inside the transform lambda
      // would re-split the text per chunk otherwise
      val lined = docs.select(col("doc_id"),
        graft.functions.Exprs.let(split(col("text"), " "), t =>
          array_join(transform(
            sequence(lit(0), ceil(size(t) / lit(2.0)).cast("int") - 1),
            i => array_join(slice(t, i * 2 + 1, lit(2)), " ")),
            "\n")).as("text"))
      graft.ops.Dedup.stripRepeatedLines(lined, "doc_id", "text", maxDocs = 20)
        .select(col("doc_id"), col("text").as("clean_text"))
        .orderBy("doc_id")
    }),

    // CCNet-style fluency filter: bigram LM fit on the first 300 docs,
    // every document scored by average negative log-likelihood.
    "q79_lm_perplexity" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.bigramLmScore(
          docs.filter(col("doc_id") < 300), docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Training-mix rebalancing: downsample to a 50/20/15/15 language mix
    // (zh excluded), decisions via the SQL-replayable salted char-poly
    // hash so the oracle replays both the feasibility math and the rows.
    "q80_mixture_resample" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val salted = (c: org.apache.spark.sql.Column) =>
        graft.functions.TextHash.charPolyHash(
          concat_ws(":", lit("graft-mix"), c.cast("string"),
            reverse(c.cast("string"))))
      graft.ops.Splits.resampleToMix(docs, "doc_id", "lang",
          Map("en" -> 0.5, "es" -> 0.2, "fr" -> 0.15, "de" -> 0.15),
          hashFn = salted)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // SemDeDup: exact-duplicate groups planted into the embedding corpus
    // (a copy shares its original's k-means cell — identical vectors give
    // identical argmins — so the within-cluster compare always sees the
    // pair); threshold 0.95 sits far above the corpus's max natural pair
    // cosine (~0.60 at sf0.1), so the oracle can replay keep-one with a
    // clustering-free brute-force pair scan.
    "q81_semantic_dedup" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val dup1 = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val dup2 = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 200000).as("vec_id"), col("embedding"))
      val corpus = emb.unionByName(dup1).unionByName(dup2)
      graft.ops.Dedup.semanticDedup(corpus, "vec_id", "embedding",
          threshold = 0.95, nCells = 8, trainSampleFraction = 0.5,
          maxIter = 8)
        .select("vec_id").orderBy("vec_id")
    }),

    // Round-5 capstone: the new curation operators composed end-to-end —
    // boilerplate line removal → bigram-LM fluency gate (keep the more
    // fluent half, exact-percentile threshold) → rebalance to a target
    // language mix. One SQL statement replays the whole chain.
    "q82_corpus_pipeline_v3" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val lined = docs.select(col("doc_id"),
        graft.functions.Exprs.let(split(col("text"), " "), t =>
          array_join(transform(
            sequence(lit(0), ceil(size(t) / lit(2.0)).cast("int") - 1),
            i => array_join(slice(t, i * 2 + 1, lit(2)), " ")),
            "\n")).as("text"))
      // cleaned is the full stripRepeatedLines chain (posexplode →
      // line-count shuffle → anti-join → reassembly) and feeds
      // bigramLmScore as BOTH train and corpus — cache it so the chain
      // runs once (22.6 s honest uncached in round 7; the operator's
      // internal model checkpoint covers the train side, this covers the
      // corpus-side scoring scan)
      val cleaned = graft.ops.Dedup
        .stripRepeatedLines(lined, "doc_id", "text", maxDocs = 20)
        .cache()
      val scored = graft.ops.TextAnalysis
        .bigramLmScore(cleaned, cleaned, "doc_id", "text")
        .cache() // threshold pass + gated pass read the same scores
      // scale-safe median gate: avg_nll is rounded to 4 decimals, so its
      // distinct-value table is bounded and the EXACT lower median comes
      // from per-value counts — no single-reducer percentile buffer; the
      // kept set is provably identical to the oracle's quantile_cont gate
      // (see Splits.lowerMedian)
      val thr = graft.ops.Splits.lowerMedian(scored, "avg_nll")
      val fluent = scored
        .filter(col("avg_nll") <= lit(thr))
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      val salted = (c: org.apache.spark.sql.Column) =>
        graft.functions.TextHash.charPolyHash(
          concat_ws(":", lit("graft-mix-v3"), c.cast("string"),
            reverse(c.cast("string"))))
      graft.ops.Splits.resampleToMix(fluent, "doc_id", "lang",
          Map("en" -> 0.5, "es" -> 0.2, "fr" -> 0.15, "de" -> 0.15),
          hashFn = salted)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // The scale path under oracle: semanticDedupAuto derives the cell
    // count from the corpus (constant expected CELL SIZE — the form whose
    // 10× curve is 1.21× in SCALE.md). Identical planted vectors produce
    // identical argmin cells under ANY derived geometry, and the corpus's
    // max natural pair cosine (~0.60) sits far below the 0.95 threshold,
    // so the AUTO survivor set equals the clustering-free brute-force
    // oracle exactly.
    "q84_semantic_dedup_auto" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val dup1 = emb.filter(col("vec_id") < 60)
        .select((col("vec_id") + 300000).as("vec_id"), col("embedding"))
      val dup2 = emb.filter(col("vec_id") < 25)
        .select((col("vec_id") + 400000).as("vec_id"), col("embedding"))
      val corpus = emb.unionByName(dup1).unionByName(dup2)
      graft.ops.Dedup.semanticDedupAuto(corpus, "vec_id", "embedding",
          threshold = 0.95, targetCellRows = 256, maxIter = 8)
        .select("vec_id").orderBy("vec_id")
    }),

    // Same idea for the LSH form: embeddingNearDupAuto derives
    // (nBits, nTables) from the corpus count (the fix that turned the
    // measured 8.1× blow-up at 10× into 2.16×). Identical vectors share
    // every table's signature DETERMINISTICALLY — candidate recall on the
    // planted pairs is 1 regardless of derived geometry — and every
    // candidate is verified by exact cosine, so the pair set matches the
    // all-pairs oracle exactly.
    "q85_embedding_neardup_auto" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val dup1 = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val dup2 = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 200000).as("vec_id"), col("embedding"))
      val corpus = emb.unionByName(dup1).unionByName(dup2)
      graft.ops.Dedup.embeddingNearDupAuto(corpus, "vec_id", "embedding",
          dim = 64, threshold = 0.95)
        .select(col("idA"), col("idB"), round(col("cosine"), 4).as("cosine"))
        .orderBy("idA", "idB")
    }),

    // §2.12 stream→lake materialization job (DeltaStreamer analog) under
    // oracle: a checkpointed file-source stream materializes into a lake
    // FG via foreachBatch upserts, STOPPED and RESTARTED from the
    // checkpoint twice, with already-processed chunks still in the source
    // dir; chunk 3 updates keys committed before the first restart.
    // Exactly-once across the restarts is the load-bearing claim, proven
    // two ways: (1) n_commits counts upsert commits — reprocessing an old
    // chunk adds one; (2) the snapshot itself — the lake resolves record
    // winners by COMMIT TIME first, so a replayed version-1 chunk would
    // land after chunk 3's commit and overwrite the version-2 updates
    // (the batch-replay oracle would catch it even if the ledger didn't).
    "q83_stream_materialize" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q83").toString
      val src = s"$tmp/src"; new java.io.File(src).mkdirs()
      val store = new graft.catalog.FeatureStore(s, warehouseDir = s"$tmp/wh")
      val orders = s.read.parquet(TestTables.parquet(dir, "orders"))
        .select(col("o_orderkey").cast("long").as("id"),
          col("o_custkey").cast("long").as("cust"),
          col("o_totalprice").cast("double").as("price"))
      val c1 = orders.filter(col("id") % 3 === 0).withColumn("version", lit(1L))
      val c2 = orders.filter(col("id") % 3 === 1).withColumn("version", lit(1L))
      val c3 = orders.filter(col("id") % 3 === 2).withColumn("version", lit(1L))
        .unionByName(orders.filter(col("id") % 9 === 0)
          .withColumn("price", col("price") + 1000.0)
          .withColumn("version", lit(2L)))
      val fgrp = store.createFeatureGroup("stream_mat", c1.limit(0),
        primaryKey = Seq("id"), precombineKey = Some("version"))
      def drive(chunk: org.apache.spark.sql.DataFrame, name: String): Unit = {
        chunk.coalesce(1).write.parquet(s"$src/$name")
        val stream = graft.streaming.Streaming.readStream(s, "parquet",
          Some(s"$src/*"), schema = Some(c1.schema))
        // a FRESH query per chunk, same checkpoint: each call restarts
        // from the committed source offsets and must see only new files
        val q = graft.streaming.Streaming.materialize(stream, fgrp,
          s"$tmp/ckpt")
        q.processAllAvailable(); q.stop()
      }
      drive(c1, "f1"); drive(c2, "f2"); drive(c3, "f3")
      val root = fgrp.source match {
        case graft.model.LakeSource(r) => r
        case other => sys.error(s"expected a lake source, got $other")
      }
      val nUpserts = graft.sources.Lake.commitDetails(s, root)
        .filter(col("operation") === "upsert").count()
      store.read(Query.selectAll(fgrp))
        .select(col("id"), col("cust"), round(col("price"), 2).as("price"),
          col("version"))
        .withColumn("n_commits", lit(nUpserts))
        .orderBy("id")
    }),

    // Gopher-style rule battery (Rae et al. 2021 MassiveText filters):
    // every rule a NAMED boolean beside the signal it gates on, so the
    // oracle checks per-rule kill decisions, not just a blended score.
    // Bounds chosen to split this corpus (words 10-99, mwl 3.7-5.3).
    "q86_gopher_rules" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.gopherRules(docs, "doc_id", "text",
          minWords = 30, maxWords = 90, minMeanWordLen = 3.0,
          maxMeanWordLen = 4.5, maxSymbolRatio = 0.1, minAlphaRatio = 0.8,
          minStopwords = 2)
        .orderBy("doc_id")
    }),

    // Substring-level duplication (Lee et al. 2021): planted full copies
    // of the first 50 docs — every 8-token span of an original/copy pair
    // is cross-document-repeated, so both sides report dup_fraction 1.0
    // while untouched docs stay at whatever the corpus naturally shares
    // (the oracle recomputes ground truth either way).
    "q87_repeated_spans" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text"))
      val plants = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      graft.ops.Dedup.repeatedSpans(docs.unionByName(plants),
          "doc_id", "text", k = 8, minDocs = 2)
        .orderBy("doc_id")
    }),

    // DSIR importance scores (Xie et al. 2023): target = the English
    // slice of the first 100 docs, raw = the whole corpus; hashed-unigram
    // log-likelihood ratios, bucketed by the SQL-replayable char-poly
    // hash so the oracle replays both models and every per-doc score.
    "q88_dsir_score" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.dsirScore(
          docs.filter(col("lang") === "en" && col("doc_id") < 100),
          docs, "doc_id", "text", nBuckets = 1024)
        .orderBy("doc_id")
    }),

    // History dedup with the Bloom pre-filter on the hot path: history =
    // docs < 200; batch = docs ≥ 150 (50 true dups) + re-keyed copies of
    // docs < 30 (dups under new ids) + ' zzqx'-suffixed variants (novel
    // texts that must survive). The bloom changes cost, never the
    // answer — the oracle is the plain fingerprint anti-join.
    "q89_history_dedup" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text"))
      val history = docs.filter(col("doc_id") < 200)
      val batch = docs.filter(col("doc_id") >= 150)
        .unionByName(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(col("text"), lit(" zzqx")).as("text")))
      graft.ops.Dedup.dedupAgainstHistory(batch, history, "text",
          expectedItems = 1000L)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // Round-6 capstone: the new curation operators composed end-to-end —
    // Gopher rule battery (keep `pass`) → substring-level dup gate (drop
    // docs whose 8-token spans are >50% cross-document-repeated; the
    // planted copies and their originals both die here) → DSIR selection
    // (fixed literal threshold — with a deliberately SMALL target slice,
    // add-1 smoothing over nBuckets ≫ target tokens centers scores near
    // -1.23 here, so the gate is a corpus-derived constant written
    // identically in both engines, the q82 lesson; target = the English
    // survivors among the first 100). One SQL statement replays the
    // whole chain.
    "q90_corpus_pipeline_v4" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text"), col("lang"))
      val corpus = docs.unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"),
          col("lang")))
      // cache the gopher-gated frame: repeatedSpans scans its input three
      // times (positions, distinct spans, span counts) — uncached, the
      // whole upstream chain re-runs per scan (measured 7.7 s -> the
      // cached form's ~2 s at sf0.1). dsirScore no longer needs a
      // call-site cache: it checkpoints its model tables internally, so
      // its corpus lineage runs once for model fitting and once for the
      // scoring scan instead of 3×.
      val gated = corpus.join(
        graft.ops.TextAnalysis.gopherRules(corpus, "doc_id", "text",
            minWords = 30, maxWords = 90, minMeanWordLen = 3.0,
            maxMeanWordLen = 4.5, maxSymbolRatio = 0.1,
            minAlphaRatio = 0.8, minStopwords = 2)
          .filter(col("pass")).select("doc_id"),
        Seq("doc_id")).cache()
      // one cached frame chain for the whole four-stage pipeline
      // (VERDICT r9 #2): `original` — the gopher-gated, span-filtered
      // working set — is scanned twice downstream (DSIR model fit, then
      // the scoring pass over its `target` subset); caching it makes
      // the span-filter join run ONCE instead of once per consumer.
      // This is the pipeline's bounded working set (the curated
      // survivor corpus), the standard persist point at any scale.
      val original = gated.join(
        graft.ops.Dedup.repeatedSpans(gated, "doc_id", "text",
            k = 8, minDocs = 2)
          .filter(col("dup_fraction") <= 0.5).select("doc_id"),
        Seq("doc_id")).cache()
      val target = original.filter(col("lang") === "en" && col("doc_id") < 100)
      graft.ops.TextAnalysis.dsirScore(target, original, "doc_id", "text",
          nBuckets = 1024)
        .filter(col("dsir_score") >= -1.2)
        .orderBy("doc_id")
    }),

    // Span REMOVAL (Lee 2021 ExactSubstr): q87 reports span duplication,
    // this strips it — planted clones (doc_id<50 duplicated wholesale)
    // must come back fully emptied, natural cross-doc boilerplate loses
    // exactly its covered tokens, everything else survives
    // whitespace-normalized. Full value oracle: DuckDB replays the
    // repeated-span set, the covering-window union, and the token-level
    // rebuild with list lambdas.
    "q91_strip_spans" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      graft.ops.Dedup.stripRepeatedSpans(corpus, "doc_id", "text",
          k = 8, minDocs = 2)
        .select(col("doc_id"), col("text"),
          when(length(col("text")) === 0, lit(0L))
            .otherwise(size(split(col("text"), " ")).cast("long"))
            .as("n_tokens"))
        .orderBy("doc_id")
    }),

    // URL/domain curation (C4/CCNet/RefinedWeb gate): deterministic
    // synthetic URLs planted from doc_id (mixed-case schemes/hosts, www
    // prefixes, default and non-default ports, tracking params,
    // fragments, a no-scheme slice), canonicalized + eTLD+1-extracted +
    // blocklist-filtered + capped per domain. The oracle replays the
    // entire chain — regex canonicalization, suffix-list domain algebra,
    // char-poly hash cap order — step for step in DuckDB.
    "q92_url_domain_gate" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select("doc_id")
      val id3 = pmod(col("doc_id"), lit(3))
      val id5 = pmod(col("doc_id"), lit(5))
      val withUrl = docs.withColumn("url", concat(
        when(id3 === 0, lit("HTTPS://WWW."))
          .when(id3 === 1, lit("http://")).otherwise(lit("")),
        lit("Site"), pmod(col("doc_id"), lit(23)).cast("string"), lit("."),
        when(id5 === 0, lit("co.uk"))
          .when(id5 === 1, lit("com.au")).otherwise(lit("com")),
        when(pmod(col("doc_id"), lit(7)) === 0, lit(":443"))
          .otherwise(lit("")),
        lit("/Page/"), col("doc_id").cast("string"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("?utm_source=x&id="))
          .otherwise(lit("?id=")),
        col("doc_id").cast("string"), lit("#s")))
      graft.ops.UrlCuration.gateByDomain(withUrl, "url", "doc_id",
          blockedDomains = Seq("site3.com", "site7.co.uk"),
          maxDocsPerDomain = 3)
        .select("doc_id", "url_canon", "domain")
        .orderBy("doc_id")
    }),

    // BPE-ish token counting (GPT-2 pre-tokenizer alternation) next to
    // the whitespace count, over text augmented with planted
    // contractions, decimals, and symbol runs — the byte-level budget a
    // token-shard exporter actually needs. Same RE2 pattern string on
    // both engines; full value oracle.
    "q93_bpeish_tokens" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val aug = concat(col("text"), lit(" it's can't we're v"),
        col("doc_id").cast("string"), lit(".07 #tag_"),
        col("doc_id").cast("string"), lit(" 3.14x"))
      docs.select(col("doc_id"),
          graft.ops.TextAnalysis.tokenCount(aug).cast("long")
            .as("n_ws_tokens"),
          graft.ops.TextAnalysis.bpeishTokenCount(aug).cast("long")
            .as("n_bpeish_tokens"))
        .orderBy("doc_id")
    }),

    // Multimodal RESIZE through the real ImageIO kernel: planted PNGs
    // (closed-form pixels) are decoded, nearest-neighbor-resampled with
    // the explicit (dst*srcDim) div dstDim mapping, re-encoded, and
    // decoded AGAIN for stats — the oracle recomputes every resized
    // pixel from the closed form alone, so a defect in either decode,
    // the resample arithmetic, or the re-encode breaks the integer match.
    "q94_image_resize" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select("doc_id")
      val withPng = graft.ops.Multimodal.withPlantedPng(docs, "doc_id", "img")
      val resized = graft.ops.Multimodal
        .resizeImage(withPng, "img", "img_rs", 6, 5)
      graft.ops.Multimodal.extractImageStats(resized.drop("img"), "img_rs")
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          col("lum_h0"), col("lum_h1"), col("lum_h2"), col("lum_h3"))
        .orderBy("doc_id")
    }),

    // GPT-style sequence packing: tokenize + EOS-terminate every document,
    // concatenate in fingerprint-shuffled order, cut into 256-token
    // sequences (docs span boundaries, partial tail dropped). The 52-bit
    // polynomial checksum over each packed sequence forces the oracle to
    // reproduce the ENTIRE token stream — order key, hash vocabulary,
    // offsets, slice assembly — token for token.
    "q95_sequence_packing" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.Packing.packSequences(docs, "doc_id", "text",
          seqLen = 256, vocab = 32768,
          orderKeyCol = graft.ops.TextAnalysis.fingerprint(col("text")))
        .select(col("seq_id"), col("n_docs"),
          size(col("tokens")).cast("long").as("n_tokens"),
          graft.ops.Packing.tokenChecksum(col("tokens")).as("checksum"))
        .orderBy("seq_id")
    }),

    // Audio through the real RIFF/WAVE parser: planted closed-form PCM
    // (sample i of doc d = ((d·31+i·7) mod 4096) − 2048) is byte-encoded
    // as a 16-bit mono WAV, re-parsed by the container walk, and framed
    // into 25-sample windows with integer-exact energy/magnitude/zero-
    // crossing features — the oracle recomputes every frame from the
    // closed form with no audio code anywhere.
    "q96_audio_frames" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select("doc_id")
      val withWav = graft.ops.Multimodal.withPlantedWav(docs, "doc_id", "wav")
      graft.ops.Multimodal.audioFrameFeatures(withWav, "wav", 25)
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("frame_idx"), col("frame_sum_sq"), col("frame_sum_abs"),
          col("frame_zc"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Perceptual average-hash image dedup: doc_id mod 37 picks the planted
    // image, so distinct documents carry pixel-identical payloads — the
    // aHash (real decode → 8×8 nearest-neighbor resample → integer
    // grayscale → at-or-above-mean bits) must collide EXACTLY for them,
    // and the dup-group sizes fall out of a two-long groupBy. The oracle
    // recomputes every bit from the planted closed form with no codec.
    "q97_image_ahash" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), pmod(col("doc_id"), lit(37)).as("_img"))
      val withPng = graft.ops.Multimodal.withPlantedPng(docs, "_img", "png")
      val hashed = graft.ops.Multimodal.averageHash(withPng, "png", "ahash")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("ahash_hi", "ahash_lo")
      hashed.select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
          count(lit(1)).over(w).cast("long").as("n_dups"))
        .orderBy("doc_id")
    }),

    // Trailing multi-horizon event features — the classic feature-store
    // batch aggregation (trailing counts/sums per entity): both horizons
    // ride ONE partition+sort (range frames over epoch micros), and the
    // summed value is exact integer cents so no engine's fold order can
    // drift a bit.
    "q98_trailing_windows" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_id"), col("user_id"),
        graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts").as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      def horizon(us: Long) = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us").rangeBetween(-us, 0)
      val (w1, w24) = (horizon(3600000000L), horizon(86400000000L))
      base.select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w1).cast("long").as("n_1h"),
          sum(col("cents")).over(w1).as("cents_1h"),
          count(lit(1)).over(w24).cast("long").as("n_24h"),
          sum(col("cents")).over(w24).as("cents_24h"),
          max(col("cents")).over(w24).as("max_cents_24h"))
        .orderBy("event_id")
    }),

    // Mergeable incremental statistics: per-(event_type, day) partial
    // moment vectors folded to totals WITHOUT rescanning raw history —
    // exact integer moments, so the fold is order-free. The oracle
    // ignores the buckets entirely and aggregates the raw rows directly:
    // merge == rescan is the contract under test.
    "q99_incremental_stats" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_type"),
        graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts").as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      val p = graft.ops.IncrementalStats.partials(base, Seq("event_type"),
        expr("ts_us div 86400000000"), col("cents"))
      graft.ops.IncrementalStats.merge(p, Seq("event_type"))
        .orderBy("event_type")
    }),

    // Domain reputation gate: judge the SITE, not just the page — per-
    // domain Gopher pass rates decide which documents survive, so a
    // clean page on a junk domain is dropped (the spam-farm signal
    // page-local gates can't see). Planted urls fold doc_id mod 23 into
    // 23 domains; the oracle recomputes the battery, the rates, and the
    // gate from scratch.
    "q100_domain_reputation" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val withUrl = docs.select(col("doc_id"), col("text"))
        .withColumn("url", concat(lit("http://Site"),
          pmod(col("doc_id"), lit(23)).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string")))
      val pass = graft.ops.TextAnalysis.gopherRules(withUrl, "doc_id",
          "text", minWords = 30, maxWords = 90, minMeanWordLen = 3.0,
          maxMeanWordLen = 4.5, maxSymbolRatio = 0.1, minAlphaRatio = 0.8,
          minStopwords = 2)
        .select(col("doc_id"), col("pass"))
      val flagged = withUrl.select("doc_id", "url").join(pass, Seq("doc_id"))
      graft.ops.UrlCuration.domainReputationGate(flagged, "url", "pass",
          minPassRate = 0.3)
        .select(col("doc_id"), col("domain"), col("domain_rate"),
          col("domain_docs"))
        .orderBy("doc_id")
    }),

    // PSI drift per event type: reference = events before Jan 10,
    // detection = after; fixed equal-width bins with clamped tails and
    // smoothed shares, so the standard drift score is one scan plus
    // tiny-frame algebra the oracle replays term for term.
    "q101_psi_drift" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val cutUs =
        java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
      val flagged = ev.select(col("event_type"), col("value"),
        (graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          < lit(cutUs)).as("is_ref"))
      graft.ops.Monitoring.psiDrift(flagged, Seq("event_type"),
          col("value"), col("is_ref"), bins = 10, lo = 0.0, hi = 25.0)
        .orderBy("event_type")
    }),

    // Batch sessionization — the streaming session semantics (q48/q52's
    // 6-hour gap) over data at rest, for backfilling the session
    // features serving computes online. One shuffle+sort; the session
    // aggregation reuses the window's exchange.
    "q102_batch_sessions" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"),
        TimeFunctions.eventTimeToMicros(ev, "ts").as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Sessionization.sessionFeatures(base, Seq("user_id"),
          col("ts_us"), col("cents"), gapUs = 6L * 3600 * 1000000)
        .select(col("user_id"), col("session_idx").cast("long")
            .as("session_idx"),
          col("session_start_us"), col("session_end_us"),
          col("n_events"), col("total"))
        .orderBy("user_id", "session_idx")
    }),

    // PIT join with a freshness bound: latest-at-or-before matching, but
    // a view older than 24 h at click time is served as null — the
    // staleness contract that keeps training parity with online serving.
    "q103_pit_tolerance" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id", "value")
      // tieBreak pins the winner when two views share (user_id, ts):
      // without it both Spark's running-last and DuckDB's ASOF pick an
      // arbitrary equal-ts row and the hash compare can flake
      val j = graft.ops.PointInTimeJoin.asOfWithTolerance(clicks, "ts",
        views, "ts", Seq("user_id"), Seq("user_id"), prefix = "view_",
        toleranceUs = 86400000000L, tieBreak = Some("event_id"))
      j.select(col("event_id"), col("user_id"),
          TimeFunctions.eventTimeToMicros(j, "ts").as("ts_us"),
          TimeFunctions.eventTimeToMicros(j, "view_ts").as("view_ts_us"),
          col("view_event_id"), col("view_value"))
        .orderBy("event_id")
    }),

    // Binned two-sample KS drift: max ECDF gap over the same fixed grid
    // as PSI — both drift scores fold from one per-(key, bin) count
    // frame, one scan total (or none, from stored partials).
    "q104_ks_drift" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val cutUs =
        java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
      val flagged = ev.select(col("event_type"), col("value"),
        (graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          < lit(cutUs)).as("is_ref"))
      graft.ops.Monitoring.ksDrift(flagged, Seq("event_type"),
          col("value"), col("is_ref"), bins = 20, lo = 0.0, hi = 25.0)
        .orderBy("event_type")
    }),

    // Chi-square homogeneity drift over a categorical column (the test
    // PSI/KS can't do — no ordered value axis), per user cohort.
    "q105_chi2_drift" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val cutUs =
        java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
      val flagged = ev.select(pmod(col("user_id"), lit(4)).as("cohort"),
        col("event_type"),
        (graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          < lit(cutUs)).as("is_ref"))
      graft.ops.Monitoring.chiSquareDrift(flagged, Seq("cohort"),
          col("event_type"), col("is_ref"))
        .orderBy("cohort")
    }),

    // Centroid drift for vector features per label: cosine + L2 between
    // the two windows' mean embeddings — the first-order signal scalar
    // drift tests can't see (a rotating population with fixed marginals).
    "q106_embedding_drift" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      graft.ops.Monitoring.embeddingCentroidDrift(
          emb.select(col("label"), col("embedding"),
            (pmod(col("vec_id"), lit(2)) === 0).as("is_ref")),
          Seq("label"), "embedding", col("is_ref"))
        .orderBy("label")
    }),

    // Robust per-type anomaly summary: exact lower median + MAD (the
    // outlier gate that doesn't move with the outliers it hunts), two
    // bounded count passes, no per-group buffering.
    "q107_robust_anomalies" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.Monitoring.robustAnomalySummary(
          ev.select(col("event_type"), col("value")),
          Seq("event_type"), col("value"), k = 3.0)
        .orderBy("event_type")
    }),

    // Snapshot diff across time travel: build the q72 lake lifecycle,
    // then answer "what changed between commit 2 and now" row-by-row —
    // added / removed / changed with before/after values. The oracle
    // reconstructs both snapshots from the literal change sets and
    // full-outer joins them itself.
    "q108_snapshot_diff" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q108").toString
      val fs = new graft.catalog.FeatureStore(s, warehouseDir = tmp)
      val init = s.read.parquet(TestTables.parquet(dir, "nation"))
        .select(col("n_nationkey").cast("long").as("id"),
          col("n_name").as("v"))
      val fgrp = fs.createFeatureGroup("nations_diff", init, Seq("id"))
      val c2 = fs.insert(fgrp,
        Seq((0L, "V2_0"), (100L, "V2_100")).toDF("id", "v"))
      fs.insert(fgrp,
        Seq((0L, "V3_0"), (2L, "V3_2"), (101L, "V3_101")).toDF("id", "v"))
      fs.delete(fgrp, Seq(Tuple1(3L)).toDF("id"))
      val before = fs.read(Query.selectAll(fgrp).asOf(c2.commitTime))
      val after = fs.read(Query.selectAll(fgrp))
      graft.ops.SchemaOps.frameDiff(before, after, Seq("id"))
        .orderBy("id")
    }),

    // Vocabulary induction: the tokenizer-prep top-K over the BPE-ish
    // pre-tokens, with document frequency and the cumulative coverage
    // curve ("how big must the vocab be").
    "q109_vocabulary" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.vocabulary(docs, "doc_id", "text", topK = 100)
        .orderBy("rank")
    }),

    // Per-type winsorization at exact p5/p95: the robust tail clip,
    // fitted as exact lower quantiles over the bounded value table —
    // integer position arithmetic, no interpolation, so the bounds
    // replay bit-for-bit.
    "q110_winsorize" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.Transformations.winsorize(
          ev.select(col("event_id"), col("event_type"), col("value")),
          Seq("event_type"), col("value"),
          lowNum = 5, highNum = 95, den = 100)
        .select(col("event_id"), col("event_type"),
          col("q_low"), col("q_high"),
          round(col("value_wins"), 2).as("value_wins"))
        .orderBy("event_id")
    }),

    // Forward-window label generation — the OTHER half of leakage-safe
    // training data: the PIT join looks strictly backward for features,
    // this looks strictly forward for outcomes (views and spend in
    // (t, t+24h] after each click). One range-frame window over the
    // unioned event stream per user: no self-join, no quadratic
    // candidate set, the frame bound IS the label horizon.
    "q112_label_window" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_id"), col("user_id"),
        TimeFunctions.eventTimeToMicros(ev, "ts").as("ts_us"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(1L, 86400000000L)
      base
        .withColumn("future_views",
          coalesce(sum(when(col("event_type") === "view", 1L)
            .otherwise(0L)).over(w), lit(0L)))
        .withColumn("future_spend_cents",
          coalesce(sum(when(col("event_type") === "purchase", col("cents"))
            .otherwise(0L)).over(w), lit(0L)))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("future_views"), col("future_spend_cents"))
        .orderBy("event_id")
    }),

    // Weekly cohort retention: cohort users by first active week, count
    // who's still active N weeks later — one distinct over
    // (user, week), everything downstream is cohort-matrix-sized.
    "q111_cohort_retention" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.Sessionization.cohortRetention(ev, "user_id",
          TimeFunctions.eventTimeToMicros(ev, "ts"),
          bucketUs = 604800000000L)
        .orderBy("cohort", "offset")
    }),

    // Steady-state ingest capstone: three consecutive batches fold
    // through the bounded fingerprint store (dedup never rescans
    // history) AND the mergeable-moments store (stats never rescan
    // accepted data) — the two round-8 "never rescan" designs composed
    // as the actual 100 TB ingest loop. Cross-batch duplicates are
    // planted by re-arriving docs 0-39 under shifted ids (the +10000
    // shift moves each copy to the cyclically-next batch, so copies
    // arriving later die and one cohort of ORIGINALS dies to its
    // earlier-arriving copy — both directions exercised).
    "q113_ingest_loop" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val corpus = docs.unionByName(docs.filter(col("doc_id") < 40)
          .select((col("doc_id") + 10000).as("doc_id"), col("text"),
            col("lang"), col("n_chars")))
        .withColumn("b", pmod(col("doc_id"), lit(3)).cast("long"))
      val batches = (0L to 2L).map(i => corpus.filter(col("b") === i))
      val (_, merged, _) = graft.ops.Ingest.ingestAll(batches, "text",
        Seq("lang"), col("b"), col("n_chars"), expectedItems = 20000L)
      merged.select(col("lang"), col("n"), col("sum_v"), col("sum_sq"),
          col("min_v"), col("max_v"), col("n_buckets"))
        .orderBy("lang")
    }),

    // Binary-Avro Kafka wire: encode (key = avro string of the PK
    // concat, value = nullable-union record), measure the exact wire
    // byte lengths, decode back. The oracle replays the BYTE LAYOUT —
    // zigzag varint widths, union branch bytes, IEEE-754 width, UTF-8
    // string framing — in SQL arithmetic, so parity proves the encoding
    // structure, not just the content round trip.
    "q114_avro_wire" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_id"), col("user_id"), col("value"),
        when(col("event_type") === "click", lit(null).cast("string"))
          .otherwise(col("event_type")).as("etype"))
      val wired = graft.functions.AvroCodec.toAvroWire(base, Seq("event_id"))
        .select(col("value"),
          length(col("key")).cast("long").as("key_len"),
          length(col("value")).cast("long").as("value_len"))
      graft.functions.AvroCodec.fromAvroWire(wired, base.schema,
          keepCols = Seq("key_len", "value_len"))
        .select(col("event_id"), col("key_len"), col("value_len"),
          col("user_id"), col("value"), col("etype"))
        .orderBy("event_id")
    }),

    // Avro CONTAINER-FILE training-dataset round trip: distributed write
    // of real Object Container Files (core Avro runtime, no datasource
    // jar), read back via the schema embedded in the container header.
    // The oracle is the plain projection — parity proves the container
    // write/read is lossless end to end under the driver's hash gate.
    // `price` rides the r10 logical-decimal path (bytes + decimal
    // annotation, byte layout hand-proven in AvroCodecSpec). The column
    // travels write→read as DECIMAL(12,2) — the round trip under test —
    // but the FINAL projection casts it to DOUBLE: DECIMAL dtypes split
    // representations between the driver harness's two read paths
    // (Decimal('471.00') vs 471.0) and fail hash_match on
    // value-identical outputs (r10 verdict repro). Rule: no
    // DECIMAL-typed column in a driver-hashed projection.
    "q115_avro_td" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("n_chars") / 7.0, 3).as("score"),
          (col("n_chars") * lit(3)).cast("decimal(12,2)").as("price"))
      val path = java.nio.file.Files
        .createTempDirectory("graft_q115").toString + "/td"
      graft.sources.AvroFiles.write(docs, path)
      graft.sources.AvroFiles.read(s, path)
        .withColumn("price", col("price").cast("double"))
        .orderBy("doc_id")
    }),

    // TFRecord training-dataset round trip: hand-built tf.train.Example
    // protobuf + CRC32C framing (no connector jar), schema re-declared
    // at read like the reference's connector requires. score is chosen
    // float32-exact (eighths of a small integer), so the float_list
    // narrowing is lossless and the oracle is the plain projection.
    "q116_tfrecord_td" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars") / 8.0).as("score"))
      val path = java.nio.file.Files
        .createTempDirectory("graft_q116").toString + "/td"
      graft.sources.TfRecordFiles.write(docs, path)
      graft.sources.TfRecordFiles.read(s, path, docs.schema)
        .orderBy("doc_id")
    }),

    // Metastore-backed catalog: save a managed table through the REAL
    // HiveExternalCatalog (embedded Derby — the session factory is
    // hive-backed; restart persistence proven across forked JVMs in
    // MetastoreSpec), read it back via spark.table, and aggregate. The
    // oracle replays the aggregate over the raw parquet — parity proves
    // the catalog round trip is lossless.
    "q117_metastore" -> ((s, dir) => {
      val cust = s.read.parquet(TestTables.parquet(dir, "customer"))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      graft.catalog.Metastore.saveManaged(cust, "graft_q117_customer")
      graft.catalog.Metastore.readTable(s, "graft_q117_customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy("c_nationkey")
    }),

    // Protocol-level Delta table lifecycle: create → append → append →
    // overwrite through a real `_delta_log` (published PROTOCOL.md
    // layout — DeltaLiteSpec asserts the action shapes), then four reads
    // — two time-travel snapshots, an incremental (from, to] read, and
    // the post-overwrite head — each tagged and unioned. The oracle
    // replays every read as a literal selection over the source rows.
    "q118_delta_log" -> ((s, dir) => {
      val nation = s.read.parquet(TestTables.parquet(dir, "nation"))
        .select(col("n_nationkey"), col("n_name"))
      val t = java.nio.file.Files
        .createTempDirectory("graft_q118").toString + "/tbl"
      graft.sources.DeltaLite.create(
        nation.filter(col("n_nationkey") < 10), t)
      graft.sources.DeltaLite.append(
        nation.filter(col("n_nationkey") >= 10 &&
          col("n_nationkey") < 20), t)
      graft.sources.DeltaLite.append(
        nation.filter(col("n_nationkey") >= 20), t)
      graft.sources.DeltaLite.overwrite(
        nation.filter(col("n_nationkey") < 5), t)
      def tag(df: org.apache.spark.sql.DataFrame, l: String) =
        df.select(lit(l).as("tag"), col("n_nationkey"), col("n_name"))
      tag(graft.sources.DeltaLite.snapshot(s, t, Some(0L)), "v0")
        .unionByName(tag(graft.sources.DeltaLite.snapshot(s, t, Some(2L)),
          "v2"))
        .unionByName(tag(graft.sources.DeltaLite.readChanges(s, t, 0L, 2L),
          "changes_0_2"))
        .unionByName(tag(graft.sources.DeltaLite.snapshot(s, t), "head"))
        .orderBy("tag", "n_nationkey")
    }),

    // Overlapping token-window chunking (RAG / context-window prep):
    // 64-token chunks advancing by 48 (16-token overlap), row-local
    // array HOFs, one posexplode, zero shuffle. The oracle replays the
    // identical slicing with list lambdas.
    "q119_chunking" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text"))
      graft.ops.TextAnalysis.chunkTokens(docs, "doc_id", "text",
          chunkSize = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx")
    }),

    // Deterministic weighted sampling (Efraimidis-Spirakis A-ES): top-20
    // docs per language by quantized priority u^(1/n_chars) — inclusion
    // ∝ length weight, yet a pure function of (doc_id, salt) the oracle
    // recomputes term for term (the quantization + id tie-break is what
    // makes a transcendental-priority draw engine-replayable).
    "q120_weighted_sample" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.ops.Splits.weightedSample(docs, "doc_id", col("n_chars"),
          k = 20, keys = Seq("lang"))
        .orderBy("lang", "doc_id")
    }),

    // SCD-2 validity-interval join: purchases open per-user "plan
    // versions" valid [ts, min(next purchase, ts + 3 days)) — real
    // expiry gaps, per-row end bounds — and every click is served the
    // version covering its instant (or nulls in a gap). Plan: as-of on
    // valid_from + row-local expiry projection — one shuffle of
    // |spine| + |dim|, never a range-join pair blowup.
    "q121_validity_join" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val versions = ev
        .filter(col("event_type") === "purchase" &&
          col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("version_id"),
          max(struct(col("event_id"), col("value")))
            .getField("value").as("plan_value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      val dim = versions
        .withColumn("valid_from", col("ts"))
        .withColumn("valid_to",
          least(coalesce(lead(col("ts"), 1).over(w),
              col("ts") + expr("INTERVAL 3 DAYS")),
            col("ts") + expr("INTERVAL 3 DAYS")))
        .select("user_id", "valid_from", "valid_to", "version_id",
          "plan_value")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val j = graft.ops.PointInTimeJoin.validAsOf(clicks, "ts",
        dim, "valid_from", "valid_to", Seq("user_id"), Seq("user_id"),
        prefix = "v_")
      j.select(col("event_id"), col("user_id"),
          TimeFunctions.eventTimeToMicros(j, "ts").as("ts_us"),
          col("v_version_id"), col("v_plan_value"))
        .orderBy("event_id")
    }),

    // Leakage-safe smoothed target encoding: event_type encoded by the
    // out-of-fold conversion rate (label = high-value event), 5
    // deterministic folds, pseudo-count 20 pulling rare categories to
    // the out-of-fold prior. One map-side-combined scan to a
    // |categories × folds| frame; the big table only takes a broadcast
    // join — never shuffled.
    "q122_target_encode" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_id"), col("event_type"),
        pmod(col("event_id"), lit(5)).cast("int").as("fold"),
        when(col("value") > 300, 1).otherwise(0).as("label"))
      graft.ops.Transformations.targetEncodeOutOfFold(base,
          "event_type", col("label"), "fold", smoothing = 20.0)
        .select("event_id", "event_type", "fold", "label", "target_enc")
        .orderBy("event_id")
    }),

    // Hashed feature cross (hashing trick): event_type × bucketed user
    // id → 64 cross buckets via the SQL-replayable char-poly hash.
    // Row-local, codegen'd, zero fit state, zero shuffle.
    "q123_hashed_cross" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      ev.select(col("event_id"), col("event_type"),
          pmod(col("user_id"), lit(100)).as("uid_mod"))
        .withColumn("cross_bucket",
          graft.ops.Transformations.hashedCross(
            Seq(col("event_type"), col("uid_mod")), nBuckets = 64))
        .orderBy("event_id")
    }),

    // Z-order layout: bucketize (value, user_id) onto an 8-bit × 8-bit
    // grid, Morton-interleave, and report the per-tile (top-6-bit
    // prefix) envelope — every tile's min/max is tight on BOTH
    // dimensions at once, which is exactly why z-sorted files skip on
    // either filter column. Row-local until the one tile aggregation.
    "q124_zorder_layout" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val b = ev.select(
        graft.ops.Layout.bucketize(col("value"), 0.0, 640.0, 8).as("zx"),
        pmod(col("user_id"), lit(256)).as("zy"))
      b.withColumn("zv",
          graft.ops.Layout.zValue(Seq(col("zx"), col("zy")), 8))
        .groupBy(shiftright(col("zv"), 10).as("tile"))
        .agg(count(lit(1)).as("n"),
          min("zx").as("min_x"), max("zx").as("max_x"),
          min("zy").as("min_y"), max("zy").as("max_y"))
        .orderBy("tile")
    }),

    // Count-min sketch: 3×256 counter grid over user activity; every
    // estimate ≥ the true count (one-sided CMS guarantee), both emitted
    // side by side. Two data scans total (sketch build + truth counts —
    // the probe set IS the truth frame); the sketch itself is a
    // ≤768-row mergeable frame, broadcast for estimation.
    "q126_cms_counts" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val sketch = graft.ops.CountMinSketch.build(ev, col("user_id"),
        depth = 3, width = 256)
      val truth = ev.filter(col("user_id").isNotNull)
        .groupBy("user_id").agg(count(lit(1)).as("true_count"))
      graft.ops.CountMinSketch.estimate(sketch, truth, col("user_id"),
          depth = 3, width = 256)
        .select(col("user_id"), col("cms_est"), col("true_count"))
        .orderBy("user_id")
    }),

    // Stream-stream interval join: every click enriched with the same
    // user's views from the trailing hour, as a CONTINUOUS join — the
    // range condition is what lets Structured Streaming expire join
    // state (each side buffers watermark + lookback, rate-bounded, not
    // stream-length-bounded). Self-join of one file stream split into
    // two sides; driven to completion and compared against the batch
    // join the oracle runs.
    "q125_stream_interval_join" -> ((s, dir) => {
      val batch = s.read.parquet(TestTables.parquet(dir, "events"))
      val stream0 = graft.streaming.Streaming.readStream(
        s, "parquet", Some(s"$dir/events.*"), schema = Some(batch.schema))
      val stream = stream0.withColumn("ts2",
        TimeFunctions.eventTimeToTimestamp(stream0, "ts"))
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts2").as("click_ts"))
      val views = stream.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"),
          col("user_id").as("v_user_id"), col("ts2").as("view_ts"))
      val j = graft.streaming.Streaming.intervalJoin(
        clicks, "click_ts", "1 day", views, "view_ts", "1 day",
        Seq("user_id"), Seq("v_user_id"), lookback = "1 HOUR")
      val out = j.select(col("click_id"), col("user_id"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        col("view_id"), unix_micros(col("view_ts")).as("view_ts_us"))
      graft.streaming.Streaming.runToMemory(out, "q125_sink_", "append",
        statePartitions = Some(8))
        .orderBy("click_id", "view_id")
    }),

    // Purged time-series 5-fold CV with a 1-day embargo: every row gets
    // a role per fold, and rows within the embargo of a test fold's
    // bounds are purged from that fold's training set — the
    // serial-correlation leakage killer plain K-fold lacks. Integer
    // millisecond boundary math, replayed exactly.
    "q127_purged_folds" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val folded = graft.ops.Splits.purgedTimeFolds(ev, "ts", k = 5,
        embargoMillis = 86400000L)
      val et = graft.ops.Splits.eventTimeMillisCol(folded, "ts")
      folded.groupBy("cv_fold", "cv_role")
        .agg(count(lit(1)).as("n"),
          min(et).as("t_min"), max(et).as("t_max"))
        .orderBy("cv_fold", "cv_role")
    }),

    // Mutual information between event type and the high-value label —
    // exact integer joint/marginal counts, one data scan, MI folded
    // over the tiny cell frame.
    "q128_mutual_info" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_type"),
        when(col("value") > 300, 1).otherwise(0).as("label"))
      graft.ops.Statistics.mutualInformation(base, "event_type", "label")
    }),

    // Trailing EWMA (α = 0.3, last 10 events) of activity value per
    // user — a bounded row-local HOF fold over a window frame, the
    // recency-weighted feature classic.
    "q129_ewma" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("user_id").isNotNull)
      graft.ops.TemporalFeatures.ewmaTrailing(ev, Seq("user_id"),
          Seq(col("ts"), col("event_id")), col("value"),
          alpha = 0.3, window = 10)
        // RAW double, no rounding: the fold is the identical IEEE op
        // sequence on both engines (bit-exact), while round() at a
        // half-boundary digit is where the engines disagree
        .select(col("event_id"), col("user_id"), col("ewma"))
        .orderBy("event_id")
    }),

    // Per-user activity profile: count + total value per event type as
    // pivoted feature columns (explicit pivot domain — no distinct
    // pass), one map-side-combined groupBy.
    "q130_activity_pivot" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("user_id").isNotNull)
      graft.ops.TemporalFeatures.activityPivot(ev, Seq("user_id"),
          "event_type", Seq("click", "view", "purchase", "signup", "error"),
          col("value"))
        .orderBy("user_id")
    }),

    // Model calibration bins: pseudo-score value/640 vs the purchase
    // label over 10 reliability cells — the scheduled-monitoring shape
    // applied to predictions.
    "q131_calibration" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val scored = ev.filter(col("value").isNotNull)
        .select((col("value") / lit(640.0)).as("score"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("label"))
      graft.ops.Monitoring.calibrationBins(scored, col("score"),
          col("label"), bins = 10)
        .orderBy("bin")
    }),

    // Daily exact AUC of the pseudo-scorer vs the purchase label —
    // Mann-Whitney with average-rank ties, doubled ranks keeping the
    // dag integral until the final division. One scan to a
    // |days × distinct scores| frame; windows partitioned by day.
    "q132_auc_by_day" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val et = graft.ops.Splits.eventTimeMillisCol(ev, "ts")
      val scored = ev.filter(col("value").isNotNull && col("ts").isNotNull)
        .select(floor(et / lit(86400000.0)).cast("long").as("day"),
          (col("value") / lit(640.0)).as("score"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("label"))
      graft.ops.Statistics.aucByKey(scored, Seq("day"), col("score"),
          col("label"))
        .orderBy("day")
    }),

    // Per-type Spearman between activity value and event time — "is
    // this feature trending" as a monotonic-association score, ranks
    // from per-key count frames (doubled average ranks, integral until
    // the corr), keyed windows only.
    "q133_spearman" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val et = graft.ops.Splits.eventTimeMillisCol(ev, "ts")
      val base = ev.filter(col("ts").isNotNull)
        .select(col("event_type"), col("value"),
          et.cast("double").as("t_ms"))
      graft.ops.Statistics.spearmanByKey(base, Seq("event_type"),
          "value", "t_ms")
        .orderBy("event_type")
    }),

    // Ordered conversion funnel view → click → purchase: per user, the
    // earliest stage-k time at or after the stage-(k−1) completion.
    // Every shuffle is on the same user key — the exchanges reuse.
    "q134_funnel" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val st = graft.ops.Funnel.stageTimes(ev, "user_id",
        col("event_type"), "ts", Seq("view", "click", "purchase"))
      st.select(col("user_id"),
          TimeFunctions.eventTimeToMicros(st, "_t1").as("t1_us"),
          TimeFunctions.eventTimeToMicros(st, "_t2").as("t2_us"),
          TimeFunctions.eventTimeToMicros(st, "_t3").as("t3_us"))
        .orderBy("user_id")
    }),

    // Feature freshness audit at a fixed "now": per event type, the
    // latest event's age and whether it violates a 10-day SLA — pure
    // integer millisecond arithmetic over one grouped pass.
    "q135_freshness" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val now =
        java.time.Instant.parse("2024-02-15T00:00:00Z").toEpochMilli
      graft.ops.Monitoring.freshness(ev, Seq("event_type"), "ts",
          nowMillis = now, slaMillis = 10L * 86400000L)
        .orderBy("event_type")
    }),

    // Key-skew profile of the user key — the salting-decision numbers
    // (hot share, max/mean imbalance) as a first-class operator; the
    // oracled output is the scalar profile (top-k keys are spec-covered).
    "q136_key_skew" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.Statistics.keySkewProfile(ev, Seq("user_id"), topK = 5)
        .select("total_rows", "n_keys", "max_key_rows", "hot_share",
          "imbalance")
    }),

    // Matryoshka truncation recall: per query, how much of the exact
    // 64-dim top-10 survives searching only the first 16 dims — the
    // prefix-dimension design probe as a first-class operator.
    "q137_matryoshka_recall" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      graft.ops.Similarity.matryoshkaRecall(emb, "vec_id", "embedding",
          queries, "qid", "qe", k = 10, dims = 16)
        .orderBy("qid")
    }),

    // Training-data card: the per-language corpus summary a dataset
    // release ships — doc counts, corpus share, BPE-ish token totals,
    // exact-dup rate (fingerprint distinct), mean length — composed
    // from the engine's oracled primitives in ONE grouped pass plus a
    // distinct count.
    "q138_dataset_card" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val enriched = docs.select(col("lang"), col("n_chars"),
        graft.ops.TextAnalysis.bpeishTokenCount(col("text")).cast("long")
          .as("toks"),
        graft.functions.TextHash.charPolyHash(col("text")).as("fp"))
      val perLang = enriched.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        countDistinct(col("fp")).as("_dfp"),
        round(avg(col("n_chars")), 4).as("mean_chars"))
      val total = perLang.agg(sum("n_docs").as("_corpus_docs"))
      perLang.crossJoin(broadcast(total))
        .select(col("lang"), col("n_docs"),
          round(col("n_docs").cast("double") /
            col("_corpus_docs").cast("double"), 6).as("corpus_share"),
          col("total_tokens"),
          round(lit(1.0) - col("_dfp").cast("double") /
            col("n_docs").cast("double"), 6).as("dup_rate"),
          col("mean_chars"))
        .orderBy("lang")
    }),

    // Wasserstein-1 drift in the feature's own units, completing the
    // battery (PSI dimensionless, KS max-gap, χ² categorical, W1
    // earth-mover) — same one-scan count grid as q101/q104.
    "q139_wasserstein_drift" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val cutUs =
        java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
      val flagged = ev.select(col("event_type"), col("value"),
        (graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          < lit(cutUs)).as("is_ref"))
      graft.ops.Monitoring.wassersteinDrift(flagged, Seq("event_type"),
          col("value"), col("is_ref"), bins = 20, lo = 0.0, hi = 25.0)
        .orderBy("event_type")
    }),

    // Expected calibration error: the one-number reliability summary
    // over the same q131 scored frame — bin-weighted |score − rate|.
    "q140_ece" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val scored = ev.filter(col("value").isNotNull)
        .select((col("value") / lit(640.0)).as("score"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("label"))
      graft.ops.Monitoring.expectedCalibrationError(scored, col("score"),
        col("label"), bins = 10)
    }),

    // Cohen's kappa between two labelers of the same events (a strict
    // and a lenient threshold rule): chance-corrected agreement, the
    // labeled-data QA score.
    "q141_cohen_kappa" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val rated = ev.filter(col("value").isNotNull)
        .select(
          when(col("value") > 300, "hi").otherwise("lo").as("rater_a"),
          when(col("value") > 250, "hi").otherwise("lo").as("rater_b"))
      graft.ops.Statistics.cohenKappa(rated, "rater_a", "rater_b")
    }),

    // Audience overlap: pairwise Jaccard between event types' user
    // sets, with NO set self-join — one bitmask per user
    // (sum(DISTINCT 2^i)), mask counts, then tiny-frame algebra.
    "q142_audience_overlap" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.Statistics.audienceOverlap(ev, "user_id", "event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .orderBy("type_a", "type_b")
    }),

    // Kafka v2 record-batch framing around binary-Avro payloads — the
    // PRODUCE-side bytes the connector would put on the wire (the jar
    // is absent; the wire format is public). One batch per record with
    // the row carried through, and the oracle replays the ENTIRE byte
    // stack in SQL: avro zigzag/union/IEEE widths (q114's arithmetic)
    // for key and value, then the record framing (attrs + deltas +
    // length varints + headers count) and the 61-byte batch header.
    "q143_kafka_wire" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_id"), col("user_id"), col("value"),
        when(col("event_type") === "click", lit(null).cast("string"))
          .otherwise(col("event_type")).as("etype"))
      val wire = graft.functions.AvroCodec.toAvroWire(base, Seq("event_id"),
        keepCols = Seq("event_id"))
      graft.functions.KafkaWire.perRecordBatches(wire, keep = Seq("event_id"))
        .orderBy("event_id")
    }),

    // Retrieval evaluation against exact ground truth: plant a perturbed
    // copy of each query doc, then score the relevant copy's exact rank
    // + MRR/NDCG@10/hit@10 WITHOUT a top-k sort — rank = 1 + count of
    // strictly-better docs (one corpus scan, two broadcast joins, one
    // map-side-combined count). The eval loop the LSH/IVF/matryoshka
    // family is tuned by.
    "q144_retrieval_eval" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id") < 30)
        .select((col("vec_id") + 100000).as("vec_id"),
          concat(array(element_at(col("embedding"), 1) + lit(0.25f)),
            slice(col("embedding"), 2, 100000))
            .cast("array<float>").as("embedding"))
      val queries = emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          (col("vec_id") + 100000).as("rel_id"))
      graft.ops.Similarity.rankEval(emb.unionByName(planted),
          "vec_id", "embedding", queries, "qid", "qe", "rel_id", k = 10)
        .orderBy("qid")
    }),

    // Containment dedup: directed C(A→B) = |sh(A)∩sh(B)|/|sh(A)| — the
    // near-superset case resemblance misses. Planted containers (each
    // doc < 40 wrapped with a filler prefix) must surface as
    // original→container at 1.0 while their Jaccard stays low; natural
    // exact-duplicate texts surface both ways.
    "q145_containment" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text")).filter(col("doc_id") < 80)
      val containers = docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(lit("zq0 zq1 zq2 "), col("text")).as("text"))
      graft.ops.Dedup.shingleContainment(docs.unionByName(containers),
          "doc_id", "text", shingleSize = 2, minContainment = 0.9)
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 4).as("containment"))
        .orderBy("id_a", "id_b")
    }),

    // Okapi BM25 lexical retrieval: three literal queries scored against
    // the documents corpus — the Lucene-idf variant, dl/avgdl
    // normalization, every term of the dag replayed in SQL.
    "q146_bm25" -> ((s, dir) => {
      import s.implicits._
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val q = Seq((1L, "spark window join"), (2L, "customer vector query"),
        (3L, "hash merge stream table")).toDF("qid", "qtext")
      graft.ops.TextAnalysis.bm25(docs, "doc_id", "text", q, "qid", "qtext")
        .orderBy(col("qid"), col("bm25").desc, col("doc_id"))
    }),

    // Hybrid retrieval: BM25 top-10 over documents fused with cosine
    // kNN top-10 over the aligned embeddings (doc_id = vec_id) by
    // reciprocal-rank fusion, c = 60 — the standard RAG retrieval stack
    // as one composition, every stage value-replayed in SQL.
    "q147_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val textQ = Seq((1L, "spark window join"), (2L, "customer vector query"),
        (3L, "hash merge stream table")).toDF("qid", "qtext")
      val wBm = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
      val bmRanked = graft.ops.TextAnalysis
        .bm25(docs, "doc_id", "text", textQ, "qid", "qtext")
        .withColumn("rank", row_number().over(wBm))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("doc_id").as("id"), col("rank"))
      val vecQ = emb.filter(col("vec_id").isin(1L, 2L, 3L))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val knnRanked = graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", vecQ, "qid", "qe", k = 10)
        .select(col("qid"), col("vec_id").as("id"), col("rank"))
      graft.ops.Similarity.rrfFuse(Seq(bmRanked, knnRanked),
          "qid", "id", "rank", c = 60)
        .filter(col("fused_rank") <= 5)
        .orderBy(col("qid"), col("fused_rank"))
    }),

    // Product quantization: 16 subspaces × 16 codes over the 64-dim
    // embeddings (64 bits/vector vs 2048 — the 100 TB bytes-per-
    // candidate lever); ADC shortlist-100 → exact re-rank top-10 (the
    // production composition) vs exact L2 top-10, recall-floor oracle
    // (q45's pattern: seeded train → deterministic recall).
    "q148_pq_adc" -> ((s, dir) => {
      // the corpus feeds FOUR subtrees of one DAG (train sample, PQ
      // encode, ADC scan, exact-kNN + refine) — cache it so the scan +
      // vector decode run once (r11 bench shave; Verify/Bench clear
      // caches per query)
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
        .select(col("vec_id"), col("embedding")).cache()
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val model = graft.ops.ProductQuantization.train(
        emb, "embedding", m = 16, k = 16, seed = 42L, maxIter = 10,
        trainMaxRows = 4096)
      val encoded = graft.ops.ProductQuantization.encode(
        emb, "vec_id", "embedding", model)
      val ann = graft.ops.ProductQuantization.searchRefined(
          encoded, "vec_id", "codes", model, emb, "embedding",
          queries, "qid", "qe", k = 10, shortlist = 100)
        .select(col("qid"), col("vec_id"))
      val exact = graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", queries, "qid", "qe", k = 10,
          metric = graft.functions.VectorFunctions.L2, excludeSelf = false)
        .select(col("qid"), col("vec_id"))
      val hits = ann.join(exact, Seq("qid", "vec_id")).groupBy("qid").count()
      queries.select(col("qid")).join(broadcast(hits), Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("count"), lit(0L)) / 10.0 >= 0.6).as("meets_floor"))
        .orderBy("qid")
    }),

    // Split-conformal prediction threshold at α = 1/10 per returnflag:
    // the ⌈(n+1)(1−α)⌉-th smallest quantity — finite-sample coverage
    // position replayed with the identical integer multiply-compare.
    "q149_conformal" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Statistics.conformalThreshold(li, Seq("l_returnflag"),
          col("l_quantity"), alphaNum = 1, alphaDen = 10)
        .orderBy("l_returnflag")
    }),

    // IVF-PQ (IVFADC): coarse cells prune candidates, residual PQ codes
    // shrink bytes per candidate — probed-cell ADC shortlist → exact
    // re-rank, recall-floor oracle vs exact L2 top-10 (q45's pattern;
    // 6/8 cells probed on the near-uniform synthetic corpus).
    "q150_ivfpq" -> ((s, dir) => {
      // same four-consumer cache as q148 (train, encode, probed ADC,
      // exact-kNN + refine)
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
        .select(col("vec_id"), col("embedding")).cache()
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val idx = graft.ops.IvfPq.build(emb, "vec_id", "embedding",
        nCells = 8, m = 16, k = 16, seed = 42L, maxIter = 10,
        trainMaxRows = 4096)
      val ann = graft.ops.IvfPq.searchRefined(idx, "vec_id",
          emb, "embedding", queries, "qid", "qe",
          k = 10, shortlist = 100, nProbe = 6)
        .select(col("qid"), col("vec_id"))
      val exact = graft.ops.Similarity.bruteForceKnn(
          emb, "vec_id", "embedding", queries, "qid", "qe", k = 10,
          metric = graft.functions.VectorFunctions.L2, excludeSelf = false)
        .select(col("qid"), col("vec_id"))
      val hits = ann.join(exact, Seq("qid", "vec_id")).groupBy("qid").count()
      queries.select(col("qid")).join(broadcast(hits), Seq("qid"), "left")
        .select(col("qid"),
          (coalesce(col("count"), lit(0L)) / 10.0 >= 0.5).as("meets_floor"))
        .orderBy("qid")
    }),

    // Krippendorff's alpha over a 3-rater labeling with missing data
    // (rater c labels every third unit) — the multi-rater agreement
    // kappa (q141) can't express; every coincidence term replayed.
    "q151_krippendorff" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("value").isNotNull)
      val a = ev.select(col("event_id").as("unit"),
        when(col("value") > 300, "hi").otherwise("lo").as("label"))
      val b = ev.select(col("event_id").as("unit"),
        when(col("value") > 250, "hi").otherwise("lo").as("label"))
      val c = ev.filter(pmod(col("event_id"), lit(3)) === 0)
        .select(col("event_id").as("unit"),
          when(col("value") > 280, "hi").otherwise("lo").as("label"))
      graft.ops.Statistics.krippendorffAlpha(
        a.unionByName(b).unionByName(c), "unit", "label")
    }),

    // Equal-frequency quantile binning (the discretizer transform):
    // 8 bins of l_extendedprice per returnflag, verified via the
    // per-(key, bin) occupancy summary — assignment replayed with the
    // identical integer floor algebra.
    "q152_quantile_bin" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Transformations.quantileBin(li, Seq("l_returnflag"),
          col("l_extendedprice"), nBins = 8)
        .groupBy("l_returnflag", "bin")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("v_min"),
          max(col("l_extendedprice")).as("v_max"))
        .orderBy("l_returnflag", "bin")
    }),

    // Hard-negative mining: top-10 best-scoring non-relevant documents
    // per query (self and the labeled positive excluded) — the dense-
    // retriever training-data op, q26's dag plus the exclusion.
    "q153_hard_negatives" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          (col("vec_id") + 1).as("rel_id"))
      graft.ops.Similarity.mineHardNegatives(emb, "vec_id", "embedding",
          queries, "qid", "qe", "rel_id", k = 10)
        .select(col("qid"), col("negative_id"),
          round(col("score"), 4).as("score"), col("rank"))
        .orderBy("qid", "rank")
    }),

    // FETCH-side consume round trip — the wire-symmetric half of q143:
    // rows → binary-Avro wire triples → multi-record v2 batches (the
    // PRODUCE bytes) → fromBatches (CRC32C-verified parse back to
    // consumer records, torn batches rejected) → Avro decode. Every
    // byte layer is crossed in BOTH directions; the oracle is the plain
    // projection — parity proves the produce→fetch stack is lossless.
    // Headers and the null union branch (etype on clicks) ride through
    // the record framing.
    "q154_kafka_consume" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_id"), col("user_id"), col("value"),
        when(col("event_type") === "click", lit(null).cast("string"))
          .otherwise(col("event_type")).as("etype"))
      val wire = graft.functions.AvroCodec.toAvroWire(base, Seq("event_id"),
        headers = Map("subject" -> "events_v1"))
      val batches = graft.functions.KafkaWire.toBatches(wire,
        recordsPerBatch = 64, timestamp = 42L)
      val consumed = graft.functions.KafkaWire.fromBatches(batches)
      graft.functions.AvroCodec.fromAvroWire(consumed, base.schema)
        .orderBy("event_id")
    }),

    // Markov transition features: per-user event sequences → global
    // (from → to) transition counts + row-conditional probabilities.
    // One shuffle (the per-entity sequence window), then map-side
    // combine to the |states|² matrix; row totals re-aggregated from
    // the matrix and broadcast back (never a SinglePartition window).
    "q155_transitions" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.GraphOps.transitionCounts(ev, "user_id",
          Seq(TimeFunctions.eventTimeToMicros(ev, "ts"), col("event_id")),
          col("event_type"))
        .orderBy("from_state", "to_state")
    }),

    // Fixed-iteration damped PageRank over a weighted edge frame (the
    // link-graph reputation lever next to q92/q100's static URL gate).
    // Deterministic recurrence r' = 0.15 + 0.85·Σ(r·w/Σw_out) from
    // r₀ = 1, so the oracle replays all 3 iterations unrolled in SQL.
    "q156_pagerank" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      val edges = li.select((col("l_suppkey") % 50).as("src"),
        (col("l_partkey") % 50).as("dst"))
      graft.ops.GraphOps.pageRank(edges, "src", "dst",
          iterations = 3, damping = 0.85)
        .orderBy("node")
    }),

    // Mutual information feature ranking (model-free relevance): I(X;Y)
    // in nats between each categorical feature and the label, from one
    // corpus scan — joint counts per feature, marginals re-aggregated
    // from the joint frame, never a second pass.
    "q157_mutual_info" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("value").isNotNull)
      graft.ops.Statistics.mutualInformation(ev,
          Seq("event_type" -> col("event_type"),
            "user_bucket" -> pmod(col("user_id"), lit(10))),
          col("value") > 300)
        .orderBy("feature")
    }),

    // Unicode canonicalization: NFC-compose + casefold + whitespace
    // collapse as ONE codegen projection (the pass every dedup /
    // fingerprint stage keys on). A decomposed "Cafe" + combining acute
    // is appended to each document so the oracle (DuckDB nfc_normalize)
    // proves real composition, not an ASCII identity.
    "q158_normalize_text" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      docs.select(col("doc_id"),
          graft.functions.TextNormalize.canonicalText(
            concat(substring(col("text"), 1, 40), lit(" Cafe\u0301  x")))
            .as("canon"))
        .withColumn("n_canon", length(col("canon")))
        .orderBy("doc_id")
    }),

    // Isotonic regression calibration per returnflag: P(discount>0.05)
    // as a monotone function of quantity, computed EXACTLY and fully
    // distributed via the minimax characterization
    // g(i) = max_{j≤i} min_{k≥i} mean(y, j..k) on the bounded
    // (score → Σy, n) count frame — no driver PAVA loop; every interval
    // mean is an exact-integer ratio the oracle replays bit-identically.
    "q159_isotonic" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Statistics.isotonicFit(li, Seq("l_returnflag"),
          col("l_quantity"),
          when(col("l_discount") > 0.05, 1).otherwise(0))
        .orderBy("l_returnflag", "score")
    }),

    // Hashing-trick featurizer: token → charPolyHash mod 64 bucket →
    // per-(doc, bucket) tf, the vocabulary-free sparse featurization
    // (dim 64 forces real bucket collisions, so the mod algebra — not
    // just token identity — is what parity proves).
    "q160_feature_hash" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.featureHash(docs, "doc_id", "text", dim = 64)
        .orderBy("doc_id", "bucket")
    }),

    // Perceptual-hash near-dup pairs: q97's planted aHashes, paired at
    // Hamming ≤ 3 via 4×16-bit banded candidates + exact bit_count
    // verify. The oracle pairs ALL doc combinations in SQL — parity
    // proves the banding loses nothing (the pigeonhole guarantee).
    "q161_ahash_neardup" -> ((s, dir) => {
      // doc_id < 222 caps the planted duplication at 6 copies/image —
      // the oracle's exhaustive O(n²) pairing stays bounded at every
      // SF; the banding's own scale story is the 30× probe's
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .filter(col("doc_id") < 222)
        .select(col("doc_id"), pmod(col("doc_id"), lit(37)).as("_img"))
      val withPng = graft.ops.Multimodal.withPlantedPng(docs, "_img", "png")
      val hashed = graft.ops.Multimodal.averageHash(withPng, "png", "ahash")
      graft.ops.Multimodal.ahashNearDupPairs(hashed, "doc_id",
          "ahash_hi", "ahash_lo", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // Dedup survivor selection — the step that ends every dedup
    // pipeline: cluster by whitespace-insensitive content fingerprint
    // (planted whitespace variants land in their originals' clusters),
    // keep the highest-quality member, ties to the smallest id.
    "q162_dedup_survivors" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), col("text"), col("n_chars"))
      val variants = docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit("  ")).as("text"), col("n_chars"))
      val corpus = docs.unionByName(variants)
        .withColumn("cluster",
          graft.ops.TextAnalysis.fingerprint(col("text")))
      graft.ops.Dedup.clusterRepresentatives(corpus, "cluster",
          "doc_id", col("n_chars"))
        .orderBy("cluster")
    }),

    // EXACT trailing-7-day distinct actives per event type — the
    // sliding COUNT(DISTINCT) that cannot partial-aggregate, made
    // one-pass by the contribution explode: each (type, user, day)
    // active contributes to windows [day, day+6], de-dup, count.
    "q163_trailing_distinct" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_type"), col("user_id"),
        graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.TemporalFeatures.trailingDistinct(base, Seq("event_type"),
          col("user_id"), col("day"), windowBuckets = 7)
        .orderBy("event_type", "bucket")
    }),

    // Deterministic negative sampling (implicit-feedback training
    // data): for each user, 2 event types they never produced — drawn
    // by hash, never rand(), so the oracle replays every pick: catalog
    // index, charPolyHash(user#draw#seed) mod |items|, anti-join,
    // first-k by draw order.
    "q164_negative_sample" -> ((s, dir) => {
      // every-5th-event interactions keep the catalog full while
      // leaving most (user, type) pairs ABSENT — so the sample is
      // non-trivially populated and the anti-join actually prunes
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(pmod(col("event_id"), lit(5)) === 0)
      graft.ops.Splits.negativeSample(ev, "user_id", "event_type",
          k = 2, seed = 7L)
        .orderBy("user_id", "draw_rank")
    }),

    // Per-node triangle counts (clustering-coefficient numerator) via
    // degree-ordered orientation — wedge fan-out bounded by O(√|E|)
    // out-degree at every node regardless of skew. Triangle membership
    // is orientation-invariant, so the oracle replays with the simpler
    // id-ordered enumeration over the same canonical edge set.
    "q165_triangles" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
        .filter(col("l_orderkey") % 29 === 0)
      val edges = li.select(
        ((col("l_partkey") * 7 + col("l_suppkey")) % 150).as("src"),
        ((col("l_partkey") + col("l_suppkey") * 3) % 150).as("dst"))
      graft.ops.GraphOps.triangleCounts(edges, "src", "dst")
        .orderBy("node")
    }),

    // Typo-level fuzzy dedup: Levenshtein ≤ 1 pairs over 24-char title
    // keys with planted substitution + deletion variants, found via the
    // prefix/suffix pigeonhole blocks (never n²) and verified exact.
    // The oracle pairs EXHAUSTIVELY in SQL — parity proves the blocking
    // loses nothing.
    "q166_edit_pairs" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .select(col("doc_id"), substring(col("text"), 1, 24).as("key"))
      val subVar = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(substring(col("key"), 1, 10), lit("Z"),
            substring(col("key"), 12, 13)).as("key"))
      val delVar = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(substring(col("key"), 1, 6),
            substring(col("key"), 8, 17)).as("key"))
      val all = docs.unionByName(subVar).unionByName(delVar)
      graft.ops.Dedup.editDistancePairs(all, "doc_id", "key", prefixLen = 8)
        .orderBy("id_a", "id_b")
    }),

    // One-sided CUSUM drift alarms per user — the sequential max(0, ·)
    // recursion computed as a closed prefix form (running sum − running
    // min), two window aggregates, no iteration. Integer deviations
    // (floor(value) − 55, just above the corpus mean of ~50) make every
    // statistic exact for the oracle.
    "q167_cusum" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("value").isNotNull)
      val scored = graft.ops.TemporalFeatures.cusum(ev, Seq("user_id"),
        Seq(graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts"),
          col("event_id")),
        floor(col("value")).cast("long") - 55, threshold = 300L)
      scored.groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          max(col("cusum")).as("max_cusum"))
        .orderBy("user_id")
    }),

    // Multi-relevant retrieval eval: MAP@10 / P@10 / R@10 of exact
    // cosine kNN against label-match qrels — the TREC-style complement
    // of q144's single-relevant metrics. Average precision accumulates
    // as the exact integer Σ(hits≤r)·(2520/r) before ONE final
    // division, so the oracle replays it bit-identically.
    "q168_map_eval" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("qlabel"))
      val run = graft.ops.Similarity.bruteForceKnn(
        emb, "vec_id", "embedding",
        queries.select(col("qid"), col("qe")), "qid", "qe", k = 10)
      val qrels = emb.select(col("vec_id"), col("label"))
        .join(broadcast(queries.select(col("qid"), col("qlabel"))),
          col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      graft.ops.Similarity.precisionRecallEval(run, "qid", "vec_id",
          "rank", qrels, "qid", "vec_id", k = 10)
        .orderBy("qid")
    }),

    // Cohort retention curves by first-active epoch day: one distinct
    // (user, day) collapse, per-user min for the cohort, then
    // |cohorts × periods| frames — integers until the one retention
    // division.
    "q169_retention" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"),
          graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
            .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.TemporalFeatures.retentionCohorts(base, col("user_id"),
          col("day"))
        .orderBy("cohort", "period_index")
    }),

    // Gini concentration of line-item revenue (cents) per returnflag —
    // the rank form on exact integers, tie-order-invariant, one keyed
    // window + one groupBy.
    "q170_gini" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Statistics.giniConcentration(li, Seq("l_returnflag"),
          floor(col("l_extendedprice") * 100))
        .orderBy("l_returnflag")
    }),

    // Association rules over (user, day) baskets of event types:
    // support / confidence / lift from exact membership counts — the
    // recommender-bootstrap co-occurrence analysis.
    "q171_assoc_rules" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"), col("event_type"),
          graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
            .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.Associations.pairRules(base,
          concat(col("user_id").cast("string"), lit("#"),
            col("day").cast("string")),
          col("event_type"))
        .orderBy("item_a", "item_b")
    }),

    // CUPED variance-reduced A/B readout: pooled θ from exact integer
    // sums, per-arm adjusted means as one fixed double dag — no
    // per-row float accumulation anywhere.
    "q172_cuped" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("value").isNotNull)
      graft.ops.Statistics.cupedAdjust(ev,
          pmod(col("user_id"), lit(2)).as("arm"),
          floor(col("value")).cast("long"),
          expr("CAST(floor(value) AS BIGINT) div 2") +
            pmod(col("event_id"), lit(7)))
        .orderBy("arm")
    }),

    // Near-key pair detection: same-user same-type events within one
    // hour — the at-least-once-redelivery artifact finder. Bucket-
    // banded (width = δ, probe b and b+1), never a rank window or n²;
    // the oracle pairs exhaustively per (user, type) in SQL.
    "q173_near_events" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"), col("event_type"),
        col("event_id"),
        graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          .as("ts_us"))
      graft.ops.Dedup.nearKeyPairs(base, "event_id", col("ts_us"),
          delta = 3600000000L,
          partitionCols = Seq("user_id", "event_type"))
        .orderBy("user_id", "event_type", "id_a", "id_b")
    }),

    // kNN label-agreement (label-noise screen): fraction of each
    // query's 10 cosine neighbours carrying a different label — one
    // exact division over integer counts.
    "q174_label_noise" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("ql"))
      graft.ops.Similarity.labelAgreement(emb, "vec_id", "embedding",
          "label", queries, "qid", "qe", "ql", k = 10)
        .orderBy("qid")
    }),

    // Rolling z-score anomalies per user: trailing-10-prior-row
    // baseline, the z-test evaluated entirely in integers
    // ((n·x − S)² > z²·(n·Q − S²)) — no sqrt, no float accumulation.
    "q175_rolling_anomaly" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("value").isNotNull)
      val scored = graft.ops.TemporalFeatures.rollingAnomaly(ev,
        Seq("user_id"),
        Seq(graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts"),
          col("event_id")),
        floor(col("value")).cast("long"), window = 10, z = 3)
      scored.groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("anomaly").isNotNull, 1L).otherwise(0L))
            .as("n_checked"),
          sum(when(col("anomaly") === true, 1L).otherwise(0L))
            .as("n_anomalies"))
        .orderBy("user_id")
    }),

    // Benford first-digit deviation of revenue cents per returnflag:
    // digit from the integer's decimal string, exact counts, χ² terms
    // as one fixed double dag (TPC-H prices are decidedly NOT Benford
    // — the statistic must say so, loudly and reproducibly).
    "q176_benford" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      graft.ops.Statistics.benfordDeviation(li, Seq("l_returnflag"),
          floor(col("l_extendedprice") * 100))
        .orderBy("l_returnflag", "digit")
    }),

    // Poisson-bootstrap 95% CI for the per-type mean: deterministic
    // hash-inverted Poisson(1) weights (integer threshold compares
    // against floor(CDF·2⁵²)), |keys × 100| exact integer sums, CI as
    // order statistics of the replicate means — no RNG anywhere.
    "q177_bootstrap_ci" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("value").isNotNull)
      graft.ops.Statistics.bootstrapMeanCI(ev, Seq("event_type"),
          col("event_id"), floor(col("value")), replicates = 100,
          seed = 42L, loIndex = 3, hiIndex = 98)
        .orderBy("event_type")
    }),

    // Integer half-life decayed activity score per user as of epoch
    // day 19755 (7-day half-life): x >> ⌊age/7⌋ — exponential-ish
    // decay with zero floats, PIT-guarded against future rows.
    "q178_decayed_score" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("value").isNotNull)
      val base = ev.select(col("user_id"), col("value"),
          graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
            .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.TemporalFeatures.decayedScore(base, Seq("user_id"),
          col("day"), floor(col("value")), asOfBucket = 19755L,
          halfLifeBuckets = 7)
        .orderBy("user_id")
    }),

    // k-anonymity audit at k = 5 over the (event_type, user bucket,
    // day) quasi-identifier — group-size histogram + share of rows in
    // re-identifiable groups, exact integers + one division.
    "q179_k_anonymity" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("event_type"),
          pmod(col("user_id"), lit(32)).as("user_bucket"),
          graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
            .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.Statistics.kAnonymityAudit(base,
          Seq("event_type", "user_bucket", "day"), k = 5L)
        .orderBy("group_size")
    }),

    // Forward-window churn labels: per (user, active day), the gap to
    // the next active day and the >3-day inactivity label — censored
    // tails stay NULL when the observation window can't see a full
    // horizon. A LABEL generator (reads the future by design).
    "q180_churn_labels" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"),
          graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
            .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.TemporalFeatures.forwardInactivityLabels(base,
          col("user_id"), col("day"), horizon = 3,
          asOfBucket = 19752L)
        .orderBy("entity", "bucket")
    }),

    // Discrete return-hazard curve from inter-activity day gaps with
    // right-censored tails — gap histogram, suffix-sum at-risk via a
    // broadcast band-join, one division per row.
    "q181_hazard" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"),
          graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
            .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.TemporalFeatures.hazardCurve(base, col("user_id"),
          col("day"), asOfBucket = 19755L)
        .orderBy("t")
    }),

    // Degree assortativity of the q165 graph: hub-to-hub vs
    // hub-to-leaf mixing — the sqrt cancels under edge symmetrization,
    // so r is exact integers to one division.
    "q182_assortativity" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
        .filter(col("l_orderkey") % 29 === 0)
      val edges = li.select(
        ((col("l_partkey") * 7 + col("l_suppkey")) % 150).as("src"),
        ((col("l_partkey") + col("l_suppkey") * 3) % 150).as("dst"))
      graft.ops.GraphOps.degreeAssortativity(edges, "src", "dst")
    }),

    // Sequential pattern support: event type A then B within 3 days,
    // counted per USER (ordered complement of q171's co-occurrence) —
    // distinct memberships first, per-entity candidate join, exact
    // entity counts.
    "q183_seq_patterns" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"), col("event_type"),
          graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
            .as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.Associations.sequencePatterns(base, col("user_id"),
          col("event_type"), col("day"), windowBuckets = 3)
        .orderBy("antecedent", "consequent")
    }),

    // Jensen–Shannon divergence drift — the BOUNDED member of the drift
    // battery (PSI is unbounded, KS a single max gap, W1 in value
    // units; JSD ∈ [0, ln 2] so one alert threshold transfers across
    // features). Same window split, grid and smoothing as q101.
    "q184_jsd_drift" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val cutUs =
        java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
      val flagged = ev.select(col("event_type"), col("value"),
        (graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          < lit(cutUs)).as("is_ref"))
      graft.ops.Monitoring.jsdDrift(flagged, Seq("event_type"),
          col("value"), col("is_ref"), bins = 10, lo = 0.0, hi = 25.0)
        .orderBy("event_type")
    }),

    // Truncated rank-biased overlap between the cosine and L2 exact
    // top-10 runs — the ranker-agreement gate (how much do two metrics'
    // retrievals agree, weighted toward rank 1).
    "q185_rbo" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val cos = graft.ops.Similarity.bruteForceKnn(
        emb, "vec_id", "embedding", queries, "qid", "qe", k = 10,
        metric = graft.functions.VectorFunctions.Cosine)
      val l2 = graft.ops.Similarity.bruteForceKnn(
        emb, "vec_id", "embedding", queries, "qid", "qe", k = 10,
        metric = graft.functions.VectorFunctions.L2)
      graft.ops.Similarity.rankBiasedOverlap(cos, l2, "qid", "vec_id",
          "rank", k = 10, p = 0.9)
        .orderBy("qid")
    }),

    // Out-of-vocabulary rate: vocabulary fitted on the first 300 docs,
    // every later doc scored by its token-occurrence OOV fraction — the
    // tokenizer-coverage / domain-shift gate.
    "q186_oov_rate" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.oovRate(docs.filter(col("doc_id") < 300),
          docs.filter(col("doc_id") >= 300), "doc_id", "text",
          topK = 500)
        .orderBy("doc_id")
    }),

    // Kaplan–Meier survival over per-user activity spans: duration =
    // whole days between first and last event + 1; the terminal event
    // is OBSERVED when the user went quiet ≥ 7 days before the corpus
    // horizon, else the span is right-censored at the horizon.
    "q187_kaplan_meier" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val base = ev.select(col("user_id"),
        graft.functions.TimeFunctions.eventTimeToMicros(ev, "ts")
          .as("ts_us"))
      val spans = base.groupBy("user_id")
        .agg(min(col("ts_us")).as("_first"), max(col("ts_us")).as("_last"))
      val horizon = base.agg(max(col("ts_us")).as("_hz"))
      val dur = spans.crossJoin(broadcast(horizon))
        .select(expr("(_last - _first) div 86400000000 + 1").as("dur"),
          (col("_last") < col("_hz") - lit(7L * 86400000000L)).as("ev"))
      graft.ops.TemporalFeatures.kaplanMeier(dur, col("dur"), col("ev"))
        .orderBy("t")
    }),

    // Per-class simplified silhouette over the embedding space — the
    // label-separability screen (classes whose mean silhouette hugs 0
    // overlap their neighbours and predict label noise).
    "q188_silhouette" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      graft.ops.Similarity.classSilhouette(emb, "vec_id", "embedding",
          "label")
        .orderBy("label")
    }),

    // PPMI word association over ±2-token windows on the first 200
    // docs, hapax pairs pruned — the distributional-similarity
    // co-occurrence table.
    "q189_ppmi" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.ppmiPairs(docs.filter(col("doc_id") < 200),
          "doc_id", "text", window = 2, minPairCount = 2L)
        .orderBy("word_a", "word_b")
    }),

    // Kendall tau over q185's two rankings — RBO says how much the
    // lists share; tau says whether the shared part is ordered the
    // same way.
    "q190_kendall_tau" -> ((s, dir) => {
      val emb = s.read.parquet(TestTables.parquet(dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val cos = graft.ops.Similarity.bruteForceKnn(
        emb, "vec_id", "embedding", queries, "qid", "qe", k = 10,
        metric = graft.functions.VectorFunctions.Cosine)
      val l2 = graft.ops.Similarity.bruteForceKnn(
        emb, "vec_id", "embedding", queries, "qid", "qe", k = 10,
        metric = graft.functions.VectorFunctions.L2)
      graft.ops.Similarity.kendallTau(cos, l2, "qid", "vec_id", "rank",
          k = 10)
        .orderBy("qid")
    }),

    // Character-distribution entropy per document — the vocabulary-free
    // compression proxy of the quality battery.
    "q191_char_entropy" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.charEntropy(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Zipf rank–frequency slope over the top-200 vocabulary — corpus
    // health in one number (natural prose sits near −1).
    "q192_zipf_slope" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.zipfSlope(docs, "doc_id", "text", topK = 200)
    }),

    // Type-grain vocabulary overlap of every language slice against
    // English — the corpus-level companion to q186's OOV rate.
    "q193_vocab_overlap" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.vocabOverlap(docs, "text", col("lang"), "en")
        .orderBy("group_key")
    }),

    // IPW-adjusted outcome means (purchase vs view, value in cents,
    // user-hash strata) — the observational companion to q172's CUPED.
    "q194_ipw" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
        .filter(col("event_type").isin("purchase", "view"))
      graft.ops.Statistics.ipwAdjust(ev,
          col("event_type") === "purchase",
          round(col("value") * 100).cast("long"),
          Seq(pmod(col("user_id"), lit(5))))
        .orderBy("treated")
    }),

    // Held-out NLL of q155's transition model: fit before the q101
    // cutover, score after — the behaviour-drift sequence check.
    "q195_transition_nll" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      val cutUs =
        java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
      val tsUs = TimeFunctions.eventTimeToMicros(ev, "ts")
      val model = graft.ops.GraphOps.transitionCounts(
        ev.filter(tsUs < cutUs), "user_id",
        Seq(tsUs, col("event_id")), col("event_type"))
      graft.ops.GraphOps.transitionNll(model,
          ev.filter(tsUs >= cutUs), "user_id",
          Seq(tsUs, col("event_id")), col("event_type"))
        .orderBy("user_id")
    }),

    // Goh–Barabási burstiness over per-user inter-event gaps — the
    // behavioural-rhythm feature (bots periodic, humans bursty).
    "q196_burstiness" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.TemporalFeatures.burstiness(ev, col("user_id"),
          TimeFunctions.eventTimeToMicros(ev, "ts"), Seq(col("event_id")))
        .orderBy("entity")
    }),

    // Label purity of q57's duplicate clusters against lang — the
    // false-merge audit for dedup itself.
    "q197_cluster_purity" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
        .filter(col("doc_id") < 150)
      val clusters = graft.ops.Dedup.duplicateClusters(
        graft.ops.Dedup.tokenJaccard(docs, "doc_id", "text",
          threshold = 0.7))
      graft.ops.Dedup.clusterPurity(clusters, docs, "doc_id", "lang")
        .orderBy("component")
    }),

    // Unicode-script composition per document — one codegen code-point
    // pass (ScriptMixCounts), the mislabeled-lang / mojibake screen.
    "q198_script_mix" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.scriptMix(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Corpus-health capstone composing the r12 ops: per language —
    // doc count, mean char entropy (q191), mean token count, and
    // type-grain vocabulary jaccard against English (q193).
    "q199_corpus_health" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val ent = graft.ops.TextAnalysis.charEntropy(docs, "doc_id", "text")
        .select(col("doc_id"), col("char_entropy"))
      val base = docs.select(col("doc_id"), col("lang"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("_nt"))
        .join(ent, Seq("doc_id"))
      val agg = base.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("char_entropy")), 4).as("avg_char_entropy"),
          round(avg(col("_nt")), 4).as("avg_tokens"))
      val overlap = graft.ops.TextAnalysis.vocabOverlap(docs, "text",
          col("lang"), "en")
        .select(col("group_key").as("lang"),
          col("jaccard").as("vocab_jaccard_vs_en"))
      agg.join(overlap, Seq("lang"), "left").orderBy("lang")
    }),

    // Token-grain JSD between two corpus slices — what q184 does for a
    // numeric column, at the level of what the corpus is made of.
    "q200_token_jsd" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      graft.ops.TextAnalysis.tokenJsd(docs, col("text"),
        col("doc_id") < 300)
    }),

    // HHI member concentration per event type (is this event type
    // three whales in a trenchcoat) — the decomposable companion to
    // q170's Gini.
    "q201_hhi" -> ((s, dir) => {
      val ev = s.read.parquet(TestTables.parquet(dir, "events"))
      graft.ops.Statistics.hhiConcentration(ev, Seq("event_type"),
          col("user_id"))
        .orderBy("event_type")
    }),

    // Per-language token-length quantile table (P10/P50/P90) via the
    // exact count-frame quantile algebra (q71's machinery, keyed).
    "q202_length_quantiles" -> ((s, dir) => {
      val docs = s.read.parquet(TestTables.parquet(dir, "documents"))
      val counts = docs.select(col("lang"),
          graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("_v"))
        .groupBy(col("lang"), col("_v")).agg(count(lit(1)).as("_c"))
      val p10 = graft.ops.Splits.lowerQuantileFromCounts(counts,
        Seq("lang"), 1, 10).withColumnRenamed("quantile", "p10")
      val p50 = graft.ops.Splits.lowerQuantileFromCounts(counts,
        Seq("lang"), 1, 2).withColumnRenamed("quantile", "p50")
      val p90 = graft.ops.Splits.lowerQuantileFromCounts(counts,
        Seq("lang"), 9, 10).withColumnRenamed("quantile", "p90")
      p10.join(p50, Seq("lang")).join(p90, Seq("lang")).orderBy("lang")
    })
  )

  /** q67 oracle: replay profile + uniqueness family + correlation per
    * (group, column) in plain SQL with the engine's exact rounding.
    */
  private def q67Oracle: String = {
    def group(g: String, at: Long, where: String): Seq[String] = {
      def profile(c: String) =
        s"""SELECT '$g' AS group_name, CAST($at AS BIGINT) AS computed_at,
              '$c' AS feature, m.metric, m.value
            FROM (
              WITH a AS (SELECT CAST(count(v) AS DOUBLE) c1,
                  CAST(count(*) - count(v) AS DOUBLE) c2,
                  CAST(min(v) AS DOUBLE) c3, CAST(max(v) AS DOUBLE) c4,
                  round(avg(v), 4) c5, round(stddev(v), 4) c6
                FROM (SELECT $c AS v FROM orders $where))
              SELECT 'cnt' AS metric, c1 AS value FROM a
              UNION ALL SELECT 'nulls', c2 FROM a
              UNION ALL SELECT 'min_v', c3 FROM a
              UNION ALL SELECT 'max_v', c4 FROM a
              UNION ALL SELECT 'mean_v', c5 FROM a
              UNION ALL SELECT 'stddev_v', c6 FROM a) m"""
      def freq(c: String) =
        s"""SELECT '$g' AS group_name, CAST($at AS BIGINT) AS computed_at,
              '$c' AS feature, m.metric, m.value
            FROM (
              WITH cn AS (SELECT $c AS v, count(*) AS cnt FROM orders
                          $where GROUP BY 1),
              a AS (SELECT
                  round(-sum(cnt * ln(cnt)) / sum(cnt) + ln(sum(cnt)), 6) c1,
                  round(count(*) / CAST(sum(cnt) AS DOUBLE), 6) c2,
                  round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                        / CAST(sum(cnt) AS DOUBLE), 6) c3,
                  CAST(count(*) AS DOUBLE) c4
                FROM cn)
              SELECT 'entropy' AS metric, c1 AS value FROM a
              UNION ALL SELECT 'distinctness', c2 FROM a
              UNION ALL SELECT 'uniqueness', c3 FROM a
              UNION ALL SELECT 'exact_distinct', c4 FROM a) m"""
      val corr =
        s"""SELECT '$g' AS group_name, CAST($at AS BIGINT) AS computed_at,
              'o_custkey' AS feature, 'corr:o_totalprice' AS metric,
              round(corr(o_custkey, o_totalprice), 6) AS value
            FROM orders $where"""
      Seq("o_custkey", "o_totalprice").flatMap(c =>
        Seq(profile(c), freq(c))) :+ corr
    }
    (group("orders_stats", 1000L, "") ++
      group("open_orders_stats", 2000L, "WHERE o_orderstatus = 'O'"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY group_name, feature, metric")
  }

  /** q66's IR, built WITHOUT a session (declared features only) so the
    * driver query and its oracle entry render the identical SQL text.
    */
  private def q66Ir: Query = {
    import graft.model.{Feature, FeatureGroup, ViewSource}
    import org.apache.spark.sql.types.StringType
    def t(name: String, cols: Seq[String], pk: Seq[String]) =
      FeatureGroup(name = name, features = cols.map(Feature(_, StringType)),
        primaryKey = pk, source = ViewSource(name))
    val orders = t("orders",
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
      Seq("o_orderkey"))
    val customer = t("customer",
      Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
      Seq("c_custkey"))
    val nation = t("nation", Seq("n_nationkey", "n_name"), Seq("n_nationkey"))
    val lineitem = t("lineitem", Seq("l_orderkey", "l_quantity"),
      Seq("l_orderkey", "l_linenumber"))
    val enrichedCustomer = Query.select(customer, Seq("c_name", "c_mktsegment"))
      .join(Query.select(nation, Seq("n_name")),
        leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
        joinType = JoinType.Left, prefix = Some("nat_"))
    Query.select(orders, Seq("o_orderkey", "o_custkey", "o_totalprice"))
      .join(enrichedCustomer,
        leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
        joinType = JoinType.Inner)
      .join(Query.select(lineitem, Seq("l_orderkey", "l_quantity"))
          .where("l_quantity" > 45.0),
        leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
        joinType = JoinType.LeftSemi)
      .where(("o_totalprice" > 150000.0) &&
        (("c_mktsegment" in Seq("BUILDING", "AUTOMOBILE", "MACHINERY")) ||
         ("nat_n_name" like "A%")))
  }

  /** The generated statement, deterministically wrapped for a stable sort. */
  private def q66Sql: String =
    s"SELECT * FROM (\n${q66Ir.toSql}\n) g ORDER BY o_orderkey"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_select_filter" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_acctbal > 5000.0 AND c_mktsegment IN ('BUILDING','AUTOMOBILE')
         ORDER BY c_custkey""",
    "q03_filter_tree" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
         FROM orders
         WHERE (o_totalprice >= 1000.0 AND o_totalprice <= 150000.0
                AND o_orderstatus <> 'X' AND o_orderkey > 10
                AND o_orderkey < 100000000)
           AND (o_orderpriority LIKE '%URGENT%'
                OR o_orderstatus IN ('F','O') OR o_orderkey = 1)
         ORDER BY o_orderkey""",
    "q04_join_inner" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 200000.0
         ORDER BY o_orderkey""",
    "q05_join_left_prefix" ->
      """SELECT c_custkey, c_name, n_name AS nat_n_name
         FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "q06_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
         ORDER BY o_orderkey""",
    "q07_pit_join" ->
      """SELECT s.event_id, s.user_id, epoch_us(s.ts) AS ts_us,
                epoch_us(v.ts) AS view_ts_us,
                v.event_id AS view_event_id, v.value AS view_value
         FROM (SELECT * FROM events WHERE event_type = 'click') s
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON s.user_id = v.user_id AND v.ts <= s.ts
         ORDER BY s.event_id""",
    "q08_join_right" ->
      """SELECT o_orderkey, o_totalprice, c_custkey, c_name
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         ORDER BY c_custkey, o_orderkey NULLS FIRST""",
    "q09_join_full" ->
      """SELECT c_custkey, c_acctbal, o_orderkey, o_custkey
         FROM (SELECT * FROM customer WHERE c_acctbal > 9000.0) c
         FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
           ON c_custkey = o_custkey
         ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""",
    "q10_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "q11_join_nested" ->
      """SELECT c_custkey, c_name, n_name, r_name
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q12_spine_inferred" ->
      """SELECT o_orderkey, o_totalprice > 100000.0 AS big,
                o_orderstatus, o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q13_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS feature, count($c) AS cnt,
            count(*) - count($c) AS nulls,
            CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
            round(avg($c), 4) AS mean_v, round(stddev($c), 4) AS stddev_v
            FROM lineitem""")
      .mkString("", " UNION ALL ", " ORDER BY feature"),
    "q14_histogram" ->
      """SELECT CAST(l_quantity AS VARCHAR) AS value, count(*) AS cnt
         FROM lineitem GROUP BY 1
         ORDER BY cnt DESC, value ASC LIMIT 20""",
    "q15_freq_metrics" ->
      """WITH c AS (SELECT o_orderpriority v, count(*) AS cnt FROM orders
                    WHERE o_orderpriority IS NOT NULL GROUP BY 1)
         SELECT round(-sum(cnt * ln(cnt)) / sum(cnt) + ln(sum(cnt)), 6) AS entropy,
                round(count(*) / CAST(sum(cnt) AS DOUBLE), 6) AS distinctness,
                round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                      / CAST(sum(cnt) AS DOUBLE), 6) AS uniqueness,
                count(*) AS exact_distinct
         FROM c""",
    "q16_correlation" ->
      """SELECT * FROM (
           SELECT 'l_quantity' AS feature_a, 'l_extendedprice' AS feature_b,
                  round(corr(l_quantity, l_extendedprice), 6) AS corr_v FROM lineitem
           UNION ALL
           SELECT 'l_quantity', 'l_discount',
                  round(corr(l_quantity, l_discount), 6) FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice', 'l_discount',
                  round(corr(l_extendedprice, l_discount), 6) FROM lineitem)
         ORDER BY feature_a, feature_b""",
    "q17_unique_values" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q18_time_series_split" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         ORDER BY o_orderkey""",
    // exact-split sizes are round(w*n) boundaries; the '_total' row is the
    // coverage check (splits exhaust the input). Same IEEE double products
    // both engines, so the rounding agrees.
    "q19_random_split" ->
      """WITH n AS (SELECT count(*) AS c FROM orders)
         SELECT * FROM (
           SELECT 'test' AS split, CAST(round(0.2*c) AS BIGINT) AS n_rows FROM n
           UNION ALL
           SELECT 'train', CAST(round(0.7*c) AS BIGINT) FROM n
           UNION ALL
           SELECT 'validation',
                  CAST(c - round(0.2*c) - round(0.7*c) AS BIGINT) FROM n
           UNION ALL
           SELECT '_total', CAST(c AS BIGINT) FROM n)
         ORDER BY split""",
    "q20_scalers" ->
      """WITH s AS (SELECT min(l_quantity) AS qmin, max(l_quantity) AS qmax,
                round(avg(l_extendedprice), 6) AS pmean,
                round(stddev(l_extendedprice), 6) AS pstd,
                quantile_cont(l_discount, 0.25) AS d25,
                quantile_cont(l_discount, 0.5) AS d50,
                quantile_cont(l_discount, 0.75) AS d75
                FROM lineitem)
         SELECT l_orderkey, l_linenumber,
                round((l_quantity - qmin) / (qmax - qmin), 4) + 0.0 AS q_mm,
                round((l_extendedprice - pmean) / pstd, 4) + 0.0 AS p_std,
                round((l_discount - d50) / (d75 - d25), 4) + 0.0 AS d_rob
         FROM lineitem, s
         ORDER BY l_orderkey, l_linenumber, q_mm, p_std, d_rob""",
    "q21_encoders" ->
      """SELECT o_orderkey,
                (SELECT count(*) FROM (SELECT DISTINCT o_orderpriority AS d
                                       FROM orders) t
                 WHERE d < o.o_orderpriority) AS prio_idx,
                o_orderstatus = 'F' AS os_F,
                o_orderstatus = 'O' AS os_O,
                o_orderstatus = 'P' AS os_P
         FROM orders o ORDER BY o_orderkey""",
    "q22_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
         ORDER BY doc_id""",
    "q23_token_jaccard" ->
      """WITH toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id,
                    unnest(string_split_regex(lower(text), '\s+')) AS tok
             FROM documents WHERE doc_id < 150)
           WHERE len(tok) > 0),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
                   FROM toks a JOIN toks b
                     ON a.tok = b.tok AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT idA, idB,
                round(i / (sa.sz + sb.sz - i), 4) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = idA
         JOIN sizes sb ON sb.doc_id = idB
         WHERE i / (sa.sz + sb.sz - i) >= 0.6
         ORDER BY idA, idB""",
    "q24_minhash_lsh" ->
      """WITH sh AS (
           SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, greatest(len(tk), 2)),
                    i -> array_to_string(tk[i:least(i+1, len(tk))], ' ')))
                    AS shingles
           FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0) AS tk
                 FROM documents)),
         pairs AS (
           SELECT a.doc_id AS idA, b.doc_id AS idB,
                  len(list_intersect(a.shingles, b.shingles))::DOUBLE /
                  (len(a.shingles) + len(b.shingles)
                   - len(list_intersect(a.shingles, b.shingles))) AS j
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT idA, idB, round(j, 4) AS jaccard
         FROM pairs WHERE j >= 0.7 ORDER BY idA, idB""",
    "q25_simhash" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> len(x) > 0)) AS tok
           FROM documents),
         h AS (
           SELECT doc_id,
                  list_reduce(
                    [0::BIGINT] || list_transform(
                      range(1, length(tok) + 1), i -> unicode(tok[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS th
           FROM toks),
         votes AS (
           SELECT doc_id, b,
                  sum(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM h, range(0, 52) t(b)
           GROUP BY doc_id, b)
         SELECT doc_id,
                CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b)
                         ELSE 0 END) AS BIGINT) AS simhash
         FROM votes GROUP BY doc_id ORDER BY doc_id""",
    "q26_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id < 5),
         pairs AS (SELECT qid, vec_id,
                          list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe) AS sim
                   FROM embeddings, q WHERE vec_id <> qid),
         ranked AS (SELECT qid, vec_id, sim,
                           row_number() OVER (PARTITION BY qid
                                              ORDER BY sim DESC, vec_id ASC) AS rnk
                    FROM pairs)
         SELECT qid, vec_id, round(sim, 4) AS score,
                CAST(rnk AS INTEGER) AS "rank"
         FROM ranked WHERE rnk <= 5 ORDER BY qid, "rank"""",
    "q27_text_tokens" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_c,
                CAST(len(list_filter(string_split_regex(text, '\s+'),
                                     x -> len(x) > 0)) AS INTEGER)
                  AS n_tokens
         FROM documents ORDER BY doc_id""",
    "q28_text_quality" ->
      """SELECT doc_id,
                round(CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) END, 4) AS punct_ratio,
                round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> list_contains(
                    ['the','a','an','and','or','of','to','in','is','it',
                     'that','for','on','with','as','at','this','by'], x)))
                       / CAST(len(toks) AS DOUBLE) END, 4) AS stopword_ratio,
                round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE list_aggregate(list_transform(toks, x -> len(x)), 'sum')
                       / CAST(len(toks) AS DOUBLE) END, 4) AS mean_word_len
         FROM (SELECT doc_id, text,
                      list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> len(x) > 0) AS toks
               FROM documents)
         ORDER BY doc_id""",
    "q29_langid" -> {
      // the exact languageId heuristic re-expressed in DuckDB SQL: script
      // ratios by unicode range, stopword votes, same precedence chain
      def ratio(lo: String, hi: String) =
        s"""(CASE WHEN length(text) = 0 THEN 0.0
            ELSE length(regexp_replace(text, '[^\\x{$lo}-\\x{$hi}]', '', 'g'))
                 / CAST(length(text) AS DOUBLE) END)"""
      def votes(words: Seq[String]) =
        s"""len(list_filter(toks, x -> list_contains([${
          words.map(w => s"'$w'").mkString(",")}], x)))"""
      val en = votes(Seq("the", "and", "of", "to", "in", "is", "that", "for",
        "it", "with", "a"))
      val es = votes(Seq("el", "la", "de", "que", "y", "en", "los", "del",
        "las", "por", "un", "una", "es"))
      val fr = votes(Seq("le", "la", "les", "des", "est", "dans", "que", "et",
        "du", "une", "pour", "sur"))
      val de = votes(Seq("der", "die", "das", "und", "ist", "nicht", "ein",
        "eine", "mit", "von", "den", "zu"))
      s"""SELECT doc_id,
           CASE WHEN ${ratio("4e00", "9fff")} > 0.2 THEN 'zh'
                WHEN ${ratio("3040", "30ff")} > 0.2 THEN 'ja'
                WHEN ${ratio("ac00", "d7af")} > 0.2 THEN 'ko'
                WHEN ${ratio("0400", "04ff")} > 0.2 THEN 'ru'
                WHEN ${ratio("0600", "06ff")} > 0.2 THEN 'ar'
                WHEN greatest($en, $es, $fr, $de) = 0 THEN 'und'
                WHEN $en >= greatest($es, $fr, $de) THEN 'en'
                WHEN $es >= greatest($fr, $de) THEN 'es'
                WHEN $fr >= $de THEN 'fr'
                ELSE 'de' END AS lang_pred
         FROM (SELECT doc_id, text,
                 list_filter(string_split_regex(lower(text), '[\\s[:punct:]]+'),
                             x -> len(x) > 0) AS toks
               FROM documents)
         ORDER BY doc_id"""
    },
    "q30_fingerprint" ->
      """SELECT doc_id,
                list_reduce(
                  [0::BIGINT] || list_transform(
                    range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                  (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                  AS fingerprint
         FROM (SELECT doc_id,
                 array_to_string(
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0), ' ') AS s
               FROM documents)
         ORDER BY doc_id""",
    "q31_multimodal" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes
         FROM documents ORDER BY doc_id""",
    "q36_lake_lifecycle" ->
      """SELECT * FROM (
           SELECT CAST(n_nationkey AS BIGINT) AS id,
                  CASE WHEN n_nationkey = 0 THEN 'UPDATED_0' ELSE n_name END AS v
           FROM nation WHERE n_nationkey <> 1
           UNION ALL SELECT 99, 'NEW_99')
         ORDER BY id""",
    "q32_batch_query" ->
      """SELECT o_orderkey, o_custkey,
                strftime(o_orderdate, '%Y-%m-%d') AS od, o_totalprice, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         ORDER BY o_orderkey""",
    "q33_validation" ->
      """WITH t AS (SELECT count(*) AS total FROM orders)
         SELECT expectation, success,
                CAST(unexpected_count AS BIGINT) AS unexpected_count,
                observed_rows
         FROM (
           SELECT 'between(o_totalprice,0.0,200000.0)' AS expectation,
                  (SELECT count(*) FROM orders
                   WHERE o_totalprice IS NOT NULL
                     AND (o_totalprice < 0.0 OR o_totalprice > 200000.0)) = 0
                    AS success,
                  (SELECT count(*) FROM orders
                   WHERE o_totalprice IS NOT NULL
                     AND (o_totalprice < 0.0 OR o_totalprice > 200000.0))
                    AS unexpected_count,
                  total AS observed_rows FROM t
           UNION ALL
           SELECT 'in_set(o_orderstatus)',
                  (SELECT count(*) FROM orders
                   WHERE o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F','O')) = 0,
                  (SELECT count(*) FROM orders
                   WHERE o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F','O')),
                  total FROM t
           UNION ALL
           SELECT 'not_null(o_custkey)',
                  (SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0,
                  (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
                  total FROM t
           UNION ALL
           SELECT 'regex(o_orderpriority)',
                  (SELECT count(*) FROM orders
                   WHERE o_orderpriority IS NOT NULL
                     AND NOT regexp_matches(o_orderpriority, '^[0-9]-')) = 0,
                  (SELECT count(*) FROM orders
                   WHERE o_orderpriority IS NOT NULL
                     AND NOT regexp_matches(o_orderpriority, '^[0-9]-')),
                  total FROM t
           UNION ALL
           SELECT 'unique(o_orderkey)',
                  coalesce((SELECT sum(c) FROM (
                    SELECT count(*) c FROM orders GROUP BY o_orderkey
                    HAVING count(*) > 1)), 0) = 0,
                  coalesce((SELECT sum(c) FROM (
                    SELECT count(*) c FROM orders GROUP BY o_orderkey
                    HAVING count(*) > 1)), 0),
                  total FROM t)
         ORDER BY expectation""",
    "q34_stream_agg" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)))
                  AS w_start_us,
                event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type""",
    "q35_serving_vectors" ->
      """SELECT c_custkey, c_name, c_mktsegment, n_name AS nat_n_name
         FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
         WHERE c_custkey < 10 ORDER BY c_custkey""",
    "q37_monitoring_shift" ->
      """WITH det AS (SELECT avg(value) AS m FROM events
                      WHERE ts >= TIMESTAMP '2024-01-15'
                        AND ts < TIMESTAMP '2024-01-30'),
              ref AS (SELECT avg(value) AS m FROM events
                      WHERE ts >= TIMESTAMP '2024-01-01'
                        AND ts < TIMESTAMP '2024-01-15')
         SELECT 'mean_value' AS metric,
                round(det.m, 4) AS detection,
                round(ref.m, 4) AS reference,
                round((det.m - ref.m) / ref.m, 4) AS difference,
                abs((det.m - ref.m) / ref.m) >= 0.05 AS shift_detected
         FROM det, ref""",
    "q38_wire_roundtrip" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",
    "q39_join_on_keys" ->
      """SELECT o_orderkey, o_orderpriority = '1-URGENT' AS urgent,
                o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q40_select_all_excl" ->
      """SELECT o_custkey, o_orderstatus, o_totalprice, o_orderpriority
         FROM orders
         ORDER BY o_custkey, o_totalprice, o_orderstatus, o_orderpriority""",
    "q41_sql_q3" ->
      """SELECT l_orderkey,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                strftime(o_orderdate, '%Y-%m-%d') AS od
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey
         LIMIT 20""",
    "q42_ir_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
                round(sum(c_acctbal), 2) AS total_balance
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q43_corpus_pipeline" ->
      """WITH deduped AS (
           SELECT * FROM documents
           WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)),
         gated AS (
           SELECT *,
             len(list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0)) AS n_tok,
             CASE WHEN length(text) = 0 THEN 0.0
               ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                    / CAST(length(text) AS DOUBLE) END AS pr
           FROM deduped)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                round(avg(n_chars), 2) + 0.0 AS avg_chars
         FROM gated
         WHERE n_tok >= 10 AND pr <= 0.2
         GROUP BY lang ORDER BY lang""",
    "q47_monitoring_engine" ->
      """WITH det AS (SELECT avg(value) AS m FROM events
                      WHERE ts >= TIMESTAMP '2024-01-19'
                        AND ts < TIMESTAMP '2024-01-20'),
              ref AS (SELECT avg(value) AS m FROM events
                      WHERE ts >= TIMESTAMP '2024-01-18'
                        AND ts < TIMESTAMP '2024-01-19')
         SELECT 'value_drift' AS config_name,
                round(det.m, 4) AS detection,
                round(ref.m, 4) AS reference,
                round((det.m - ref.m) / ref.m, 4) AS difference,
                abs((det.m - ref.m) / ref.m) >= 0.05 AS shift_detected
         FROM det, ref""",
    "q49_pit_salted" ->
      """SELECT s.event_id, s.user_id, epoch_us(s.ts) AS ts_us,
                epoch_us(v.ts) AS view_ts_us,
                v.event_id AS view_event_id, v.value AS view_value
         FROM (SELECT * FROM events WHERE event_type = 'click') s
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON s.user_id = v.user_id AND v.ts <= s.ts
         ORDER BY s.event_id""",
    "q48_sessionization" ->
      """WITH ev AS (
           SELECT CAST(user_id AS VARCHAR) AS k,
                  epoch_ms(CAST(ts AS TIMESTAMP)) AS t, value AS v
           FROM events),
         mx AS (SELECT max(t) AS maxt FROM ev),
         lagged AS (
           SELECT k, t, v,
                  CASE WHEN lag(t) OVER (PARTITION BY k ORDER BY t) IS NULL
                         OR t - lag(t) OVER (PARTITION BY k ORDER BY t)
                            >= 21600000
                       THEN 1 ELSE 0 END AS ns
           FROM ev),
         sess AS (
           SELECT k, t, v,
                  sum(ns) OVER (PARTITION BY k ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM lagged),
         agg AS (
           SELECT k, sid, min(t) AS session_start, max(t) AS session_end,
                  count(*) AS n_events, round(sum(v ORDER BY t), 2) AS total
           FROM sess GROUP BY k, sid)
         SELECT k AS key, session_start, session_end, n_events, total
         FROM agg, mx
         WHERE NOT (sid = (SELECT max(sid) FROM agg a2 WHERE a2.k = agg.k)
                    AND session_end + 21600000 >= maxt)
         ORDER BY key, session_start""",
    "q46_embedding_neardup" ->
      """WITH dup AS (
           SELECT vec_id + 100000 AS vec_id,
                  CAST([CAST(embedding[1] + 0.25 AS FLOAT)] || embedding[2:]
                       AS FLOAT[]) AS embedding
           FROM embeddings WHERE vec_id < 50),
         corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT * FROM dup),
         pairs AS (
           SELECT a.vec_id AS idA, b.vec_id AS idB,
                  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) AS c
           FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
         SELECT idA, idB, round(c, 4) AS cosine
         FROM pairs WHERE c >= 0.95 ORDER BY idA, idB""",
    // independent reconstruction of the planted pixels from the closed
    // form in Multimodal.plantedPng — no image codec involved, so a match
    // proves the real ImageIO decode recovered every pixel exactly
    "q50_image_decode" ->
      """WITH dims AS (
           SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
           FROM documents),
         xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
         px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
         vals AS (
           SELECT doc_id, w, h,
                  (doc_id + 7*x + 13*y) % 256 AS r,
                  (3*doc_id + 5*x + 11*y) % 256 AS g,
                  (5*doc_id + 3*x + 17*y) % 256 AS b
           FROM px),
         lums AS (
           SELECT *, (299*r + 587*g + 114*b) // 1000 AS l FROM vals)
         SELECT doc_id,
                CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b) AS BIGINT) AS sum_b,
                CAST(sum(CASE WHEN l < 64 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h0,
                CAST(sum(CASE WHEN l >= 64 AND l < 128 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h1,
                CAST(sum(CASE WHEN l >= 128 AND l < 192 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h2,
                CAST(sum(CASE WHEN l >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h3
         FROM lums GROUP BY doc_id ORDER BY doc_id""",
    "q51_external_fg" ->
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation ORDER BY n_nationkey""",
    // recall floors: the Spark side intersects the seeded ANN top-5 with
    // the exact top-5 (q26-verified) and emits recall>=floor per query;
    // determinism of hyperplanes/KMeans makes "every query clears it" an
    // oracle-checkable invariant
    "q44_lsh_knn" ->
      """SELECT vec_id AS qid, true AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY qid""",
    "q45_ivf_knn" ->
      """SELECT vec_id AS qid, true AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY qid""",
    // identical oracle to q48: the native session_window path must emit
    // exactly the custom-state path's sessions
    "q52_session_window" ->
      """WITH ev AS (
           SELECT CAST(user_id AS VARCHAR) AS k,
                  epoch_ms(CAST(ts AS TIMESTAMP)) AS t, value AS v
           FROM events),
         mx AS (SELECT max(t) AS maxt FROM ev),
         lagged AS (
           SELECT k, t, v,
                  CASE WHEN lag(t) OVER (PARTITION BY k ORDER BY t) IS NULL
                         OR t - lag(t) OVER (PARTITION BY k ORDER BY t)
                            >= 21600000
                       THEN 1 ELSE 0 END AS ns
           FROM ev),
         sess AS (
           SELECT k, t, v,
                  sum(ns) OVER (PARTITION BY k ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM lagged),
         agg AS (
           SELECT k, sid, min(t) AS session_start, max(t) AS session_end,
                  count(*) AS n_events, round(sum(v ORDER BY t), 2) AS total
           FROM sess GROUP BY k, sid)
         SELECT k AS key, session_start, session_end, n_events, total
         FROM agg, mx
         WHERE NOT (sid = (SELECT max(sid) FROM agg a2 WHERE a2.k = agg.k)
                    AND session_end + 21600000 >= maxt)
         ORDER BY key, session_start""",
    // the middle logged batch, recomputed from the base table; log_time
    // is the controlled epoch-millis stamp of that batch (2024-02-01 UTC)
    "q53_feature_logging" ->
      """SELECT c_custkey, c_name, c_mktsegment,
                CAST(c_acctbal AS DOUBLE) * 0.25 AS prediction,
                CAST(1706745600000 AS BIGINT) AS log_time
         FROM customer
         WHERE c_custkey >= 11 AND c_custkey < 21
         ORDER BY c_custkey""",
    "q54_tags_provenance" ->
      """SELECT * FROM (VALUES
           ('dependent_view:nations_meta', 'geo_view', 'v1'),
           ('dependent_view:regions_meta', 'geo_view', 'v1'),
           ('group_by_keyword:geo', 'nations_meta', 'dim,geo'),
           ('group_by_tag:owner', 'nations_meta', 'growth-team'),
           ('group_by_tag:owner', 'regions_meta', 'core-team'),
           ('provenance', 'nations_meta', 'n_nationkey,n_name'),
           ('provenance', 'regions_meta', 'r_name'),
           ('view_tag:purpose', 'geo_view', 'demo'))
         AS t(kind, name, detail)
         ORDER BY kind, name""",
    // exact-split closed form (same as q19) over the customer table, read
    // back through the persisted descriptor after a store restart
    "q55_training_dataset" ->
      """WITH n AS (SELECT count(*) AS c FROM customer)
         SELECT * FROM (
           SELECT 'test' AS split, CAST(round(0.2*c) AS BIGINT) AS n_rows,
                  'parquet' AS format, 1 AS td_version FROM n
           UNION ALL
           SELECT 'train', CAST(round(0.7*c) AS BIGINT), 'parquet', 1 FROM n
           UNION ALL
           SELECT 'validation',
                  CAST(c - round(0.2*c) - round(0.7*c) AS BIGINT),
                  'parquet', 1 FROM n
           UNION ALL
           SELECT '_total', CAST(c AS BIGINT), 'parquet', 1 FROM n)
         ORDER BY split""",
    // pre-append rows fill the declared defaults (score=0.5, note=null);
    // the post-append insert carries real values
    "q56_append_features" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS v,
                CAST(0.5 AS DOUBLE) AS score, CAST(NULL AS VARCHAR) AS note
         FROM nation
         UNION ALL
         SELECT * FROM (VALUES
           (100, 'NEW_A', CAST(1.5 AS DOUBLE), 'x'),
           (101, 'NEW_B', CAST(2.5 AS DOUBLE), 'y'))
           AS t(id, v, score, note)
         ORDER BY id""",
    // same pair graph as q23-style token Jaccard, closed transitively by
    // a recursive CTE: component = min reachable id
    "q57_dup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id,
                    unnest(string_split_regex(lower(text), '\s+')) AS tok
             FROM documents WHERE doc_id < 150)
           WHERE len(tok) > 0),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
                   FROM toks a JOIN toks b
                     ON a.tok = b.tok AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT idA, idB FROM inter
                   JOIN sizes sa ON sa.doc_id = idA
                   JOIN sizes sb ON sb.doc_id = idB
                   WHERE i / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT idA AS u, idB AS v FROM pairs
                   UNION SELECT idB, idA FROM pairs
                   UNION SELECT idA, idA FROM pairs
                   UNION SELECT idB, idB FROM pairs),
         reach AS (SELECT u, v FROM edges
                   UNION
                   SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT u AS id, min(v) AS component FROM reach
         GROUP BY u ORDER BY id""",
    // word-3-gram sets per doc (same slide/truncation as shingleStrings),
    // probe slice = doc_id % 17 = 3; overlap = distinct shared grams
    "q58_decontaminate" ->
      """WITH sh AS (
           SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, greatest(len(tk) - 2, 1) + 1),
                    i -> array_to_string(tk[i:least(i + 2, len(tk))], ' ')))) AS g
           FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0) AS tk
                 FROM documents)),
         probe AS (SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 3),
         corp AS (SELECT doc_id, g FROM sh WHERE doc_id % 17 <> 3)
         SELECT doc_id, count(*) AS n_overlap
         FROM corp JOIN probe USING (g)
         GROUP BY doc_id ORDER BY doc_id""",
    // single global window replays the distributed two-level prefix sum:
    // order by (content fingerprint, doc_id), bin = exclusive cumsum div
    // budget
    "q59_token_shards" ->
      """WITH t AS (
           SELECT doc_id,
                  len(list_filter(string_split_regex(text, '\s+'),
                                  x -> len(x) > 0)) AS n_tokens,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS ok
           FROM (SELECT doc_id, text,
                   array_to_string(
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> len(x) > 0), ' ') AS s
                 FROM documents)),
         c AS (SELECT doc_id, n_tokens,
                 CAST(COALESCE(sum(n_tokens) OVER (ORDER BY ok, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS excl
               FROM t)
         SELECT doc_id, CAST(excl // 2000 AS BIGINT) AS bin, n_tokens
         FROM c ORDER BY doc_id""",
    // salted char-poly hash of the id, mod 1e6, against per-stratum
    // integer thresholds (floor(fraction * 1e6))
    "q60_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                    % 1000000 AS u
           FROM (SELECT doc_id, lang,
                   'graft-sample:' || CAST(doc_id AS VARCHAR) || ':' ||
                   reverse(CAST(doc_id AS VARCHAR)) AS s
                 FROM documents))
         WHERE u < CASE lang WHEN 'en' THEN 500000 WHEN 'es' THEN 250000
                   WHEN 'fr' THEN 250000 WHEN 'de' THEN 100000 ELSE -1 END
         ORDER BY doc_id""",
    "q62_quantized_knn" ->
      """SELECT vec_id AS qid, true AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY qid""",
    // the whole pipeline in one statement: q57's clustering CTEs, q58's
    // gram-overlap gate (floor 3), q27's token gate, q61's salted split
    // thresholds, q59's prefix-sum binning partitioned by split
    "q63_corpus_pipeline_v2" ->
      """WITH RECURSIVE toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id,
                    unnest(string_split_regex(lower(text), '\s+')) AS tok
             FROM documents WHERE doc_id < 150)
           WHERE len(tok) > 0),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
                   FROM toks a JOIN toks b
                     ON a.tok = b.tok AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT idA, idB FROM inter
                   JOIN sizes sa ON sa.doc_id = idA
                   JOIN sizes sb ON sb.doc_id = idB
                   WHERE i / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT idA AS u, idB AS v FROM pairs
                   UNION SELECT idB, idA FROM pairs
                   UNION SELECT idA, idA FROM pairs
                   UNION SELECT idB, idB FROM pairs),
         reach AS (SELECT u, v FROM edges
                   UNION
                   SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         cc AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u),
         sh AS (
           SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, greatest(len(tk) - 2, 1) + 1),
                    i -> array_to_string(tk[i:least(i + 2, len(tk))], ' ')))) AS g
           FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0) AS tk
                 FROM documents)),
         probe AS (SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 3),
         contaminated AS (SELECT s.doc_id FROM sh s JOIN probe USING (g)
                          WHERE s.doc_id % 17 <> 3
                          GROUP BY s.doc_id HAVING count(*) >= 3),
         clean AS (
           SELECT d.doc_id, d.text FROM documents d
           WHERE d.doc_id % 17 <> 3
             AND d.doc_id NOT IN (SELECT id FROM cc WHERE id <> component)
             AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
         qual AS (
           SELECT doc_id,
                  len(list_filter(string_split_regex(text, '\s+'),
                                  x -> len(x) > 0)) AS n_tokens,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS ok
           FROM (SELECT doc_id, text,
                   array_to_string(
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> len(x) > 0), ' ') AS s
                 FROM clean)
           WHERE len(list_filter(string_split_regex(text, '\s+'),
                                 x -> len(x) > 0)) >= 5),
         g AS (SELECT q.doc_id, q.n_tokens, q.ok,
                 COALESCE(cc.component, q.doc_id) AS grp
               FROM qual q LEFT JOIN cc ON cc.id = q.doc_id),
         sp AS (SELECT doc_id, n_tokens, ok,
                  CASE WHEN u < 700000 THEN 'train'
                       WHEN u < 900000 THEN 'test'
                       ELSE 'validation' END AS split
                FROM (SELECT *,
                        list_reduce([0::BIGINT] || list_transform(
                            range(1, length(s2) + 1),
                            i -> unicode(s2[i])::BIGINT),
                          (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                          % 1000000 AS u
                      FROM (SELECT *,
                              'graft-split:' || CAST(grp AS VARCHAR) || ':' ||
                              reverse(CAST(grp AS VARCHAR)) AS s2
                            FROM g))),
         b AS (SELECT split, doc_id, n_tokens,
                 CAST(CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY split
                   ORDER BY ok, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) // 500 AS BIGINT) AS bin
               FROM sp)
         SELECT split, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens_c,
                count(DISTINCT bin) AS n_bins
         FROM b GROUP BY split ORDER BY split""",
    "q64_repetition" ->
      """SELECT doc_id,
                round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 4)
                  AS dup_3gram_frac
         FROM (SELECT doc_id,
                 list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                   i -> array_to_string(tk[i:least(i + 2, len(tk))], ' '))
                   AS grams
               FROM (SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> len(x) > 0) AS tk
                     FROM documents))
         ORDER BY doc_id""",
    "q65_pii_redact" ->
      """SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  regexp_replace(pii_text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                    '[EMAIL]', 'g'),
                  '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                  '[IP]', 'g'),
                '\+[0-9][0-9 ()-]{6,}[0-9]', '[PHONE]', 'g') AS redacted
         FROM (SELECT doc_id,
                 text || ' contact user' || doc_id ||
                 '@example.com or +1 (555) 010-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                 ' at 10.2.3.' || CAST(doc_id % 200 AS VARCHAR) AS pii_text
               FROM documents)
         ORDER BY doc_id""",
    // q57's recursive-CTE clustering + coalesce(component, doc_id) as
    // the group key + salted char-poly hash against cumulative weight
    // thresholds (0.7/0.2/0.1 -> 700000/900000; floor arithmetic
    // verified identical to the Scala side)
    "q61_leakage_safe_split" ->
      """WITH RECURSIVE toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id,
                    unnest(string_split_regex(lower(text), '\s+')) AS tok
             FROM documents WHERE doc_id < 150)
           WHERE len(tok) > 0),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
                   FROM toks a JOIN toks b
                     ON a.tok = b.tok AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT idA, idB FROM inter
                   JOIN sizes sa ON sa.doc_id = idA
                   JOIN sizes sb ON sb.doc_id = idB
                   WHERE i / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT idA AS u, idB AS v FROM pairs
                   UNION SELECT idB, idA FROM pairs
                   UNION SELECT idA, idA FROM pairs
                   UNION SELECT idB, idB FROM pairs),
         reach AS (SELECT u, v FROM edges
                   UNION
                   SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         cc AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u),
         g AS (SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS grp
               FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
         h AS (SELECT doc_id,
                 list_reduce([0::BIGINT] || list_transform(
                     range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                   (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                   % 1000000 AS u
               FROM (SELECT doc_id,
                       'graft-split:' || CAST(grp AS VARCHAR) || ':' ||
                       reverse(CAST(grp AS VARCHAR)) AS s
                     FROM g))
         SELECT doc_id,
                CASE WHEN u < 700000 THEN 'train'
                     WHEN u < 900000 THEN 'test'
                     ELSE 'validation' END AS split
         FROM h ORDER BY doc_id""",
    // the oracle IS the generated statement — DuckDB runs the very text
    // the engine produced and executed under Spark
    "q66_sql_generation" -> q66Sql,
    "q67_fg_statistics" -> q67Oracle,
    "q71_top_fraction" ->
      """WITH t AS (SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0))::BIGINT AS n_tokens
           FROM documents),
         thr AS (SELECT lang, quantile_cont(n_tokens, 0.7) AS q
                 FROM t GROUP BY lang)
         SELECT doc_id, t.lang, n_tokens
         FROM t JOIN thr ON t.lang = thr.lang
         WHERE n_tokens >= q
         ORDER BY doc_id""",
    "q70_distinct_sketch" ->
      """WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS w, user_id
                    FROM events),
         lo AS (SELECT min(w) AS lo FROM d)
         SELECT * FROM (
           SELECT 'all_days' AS span,
                  count(DISTINCT user_id) AS exact_distinct,
                  true AS sketch_within_5pct
           FROM d
           UNION ALL
           SELECT 'first_week', count(DISTINCT user_id), true
           FROM d, lo WHERE d.w <= lo.lo + 6)
         ORDER BY span""",
    "q69_sql_text_functions" ->
      """SELECT doc_id,
                CAST(len(list_filter(string_split_regex(text, '\s+'),
                                     x -> len(x) > 0)) AS INTEGER)
                  AS n_tokens,
                list_reduce(
                  [0::BIGINT] || list_transform(
                    range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                  (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS fp,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text || ' at 10.2.3.4',
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '[EMAIL]', 'g'),
                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                    '[IP]', 'g'),
                  '\+[0-9][0-9 ()-]{6,}[0-9]', '[PHONE]', 'g') AS safe
         FROM (SELECT doc_id, text,
                 array_to_string(
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0), ' ') AS s
               FROM documents)
         ORDER BY doc_id""",
    "q68_strip_markup" ->
      """WITH w AS (SELECT doc_id,
             '<html><body class="c' || doc_id || '"><p>' || text ||
             '</p><script type="text/javascript">var x = 1 < 2;</script>' ||
             '&amp;&#169;<br/></body></html>' AS wrapped
           FROM documents),
         s AS (SELECT doc_id, wrapped,
             trim(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(wrapped,
                 '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                 '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                 '<[^>]+>', ' ', 'g'),
                 '&[A-Za-z]{2,8};|&#[0-9]{1,6};', ' ', 'g'),
                 '\s+', ' ', 'g')) AS clean_text
           FROM w)
         SELECT doc_id, clean_text,
                round(CASE WHEN length(wrapped) = 0 THEN 0.0
                      ELSE 1.0 - CAST(length(clean_text) AS DOUBLE)
                                 / length(wrapped) END, 4) AS markup_ratio
         FROM s ORDER BY doc_id""",
    // deterministic replay of the 4-commit history: as_of(t2) = nation
    // with commit-2 writes applied; changes(t1, t3] = latest state of the
    // records commits 2-3 touched; the trailing delete is outside both
    "q72_time_travel" ->
      """SELECT src, id, v FROM (
           SELECT 'as_of' AS src, CAST(n_nationkey AS BIGINT) AS id,
                  CASE WHEN n_nationkey = 0 THEN 'V2_0' ELSE n_name END AS v
           FROM nation
           UNION ALL SELECT 'as_of', 100, 'V2_100'
           UNION ALL SELECT 'changes', 0, 'V3_0'
           UNION ALL SELECT 'changes', 2, 'V3_2'
           UNION ALL SELECT 'changes', 100, 'V2_100'
           UNION ALL SELECT 'changes', 101, 'V3_101')
         ORDER BY src, id""",
    // same char-poly fingerprint as q30; NOT EXISTS (not NOT IN) so a
    // null fingerprint keeps the row exactly like Spark's left_anti
    "q73_stream_dedup_history" ->
      """WITH f AS (SELECT doc_id, lang,
             list_reduce(
               [0::BIGINT] || list_transform(
                 range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
               (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS fp
           FROM (SELECT doc_id, lang,
                   array_to_string(
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> len(x) > 0), ' ') AS s
                 FROM documents))
         SELECT doc_id, lang FROM f
         WHERE NOT EXISTS (SELECT 1 FROM f h
                           WHERE h.doc_id < 250 AND h.fp = f.fp)
         ORDER BY doc_id""",
    "q74_ivf_persisted" ->
      """SELECT vec_id AS qid, true AS identical_after_reload,
                true AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY qid""",
    // closed-form commit counters: the create inserts |nation|, the
    // upsert touches one existing + one new key, the delete tombstones one
    "q75_commit_metadata" ->
      """SELECT * FROM (
           SELECT 'bulk_insert' AS op,
                  (SELECT count(*) FROM nation) AS ins,
                  0::BIGINT AS upd, 0::BIGINT AS del
           UNION ALL SELECT 'upsert', 1, 1, 0
           UNION ALL SELECT 'delete', 0, 0, 1)
         ORDER BY op""",
    "q76_td_file_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name,
                CAST(n_regionkey AS BIGINT) AS region
         FROM nation ORDER BY id""",
    "q77_tfidf_keywords" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         toks AS (SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> len(x) > 0)) AS term
           FROM d),
         tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*)::DOUBLE AS n FROM d),
         scored AS (SELECT doc_id, term, tf * ln(n.n / df) AS s
                    FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         ranked AS (SELECT doc_id, term, s,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s DESC, term ASC) AS rk
           FROM scored)
         SELECT doc_id, term, round(s, 4) AS tfidf, CAST(rk AS INTEGER) AS rk
         FROM ranked WHERE rk <= 3
         ORDER BY doc_id, rk""",
    "q78_line_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
         lines AS (
           SELECT doc_id, i AS pos,
                  array_to_string(toks[2*i+1:2*i+2], ' ') AS line
           FROM d, unnest(range(0, CAST(ceil(len(toks)/2.0) AS BIGINT))) AS t(i)),
         banned AS (
           SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines)
           GROUP BY line HAVING count(*) > 20),
         clean AS (
           SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
           FROM lines ANTI JOIN banned USING (line)
           GROUP BY doc_id)
         SELECT d.doc_id, coalesce(clean_text, '') AS clean_text
         FROM d LEFT JOIN clean USING (doc_id)
         ORDER BY d.doc_id""",
    "q79_lm_perplexity" ->
      """WITH tr AS (
           SELECT list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents WHERE doc_id < 300),
         trb AS (SELECT toks[i] AS w1, toks[i+1] AS w2
                 FROM tr, unnest(range(1, len(toks))) AS t(i)),
         bi AS (SELECT w1, w2, count(*)::BIGINT AS cbi FROM trb GROUP BY 1, 2),
         ctx AS (SELECT w1, sum(cbi)::BIGINT AS cctx FROM bi GROUP BY 1),
         v AS (SELECT count(DISTINCT tok)::DOUBLE AS v
               FROM (SELECT unnest(toks) AS tok FROM tr)),
         co AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> len(x) > 0) AS toks
           FROM documents),
         cob AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                 FROM co, unnest(range(1, len(toks))) AS t(i)),
         p AS (SELECT doc_id,
                 (coalesce(cbi, 0) + 1.0) / (coalesce(cctx, 0) + v.v) AS p
               FROM cob LEFT JOIN bi USING (w1, w2)
                        LEFT JOIN ctx USING (w1) CROSS JOIN v)
         SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                round(-avg(ln(p)), 4) AS avg_nll
         FROM p GROUP BY doc_id ORDER BY doc_id""",
    "q80_mixture_resample" ->
      """WITH cnt AS (SELECT lang, count(*)::DOUBLE AS n FROM documents
                      WHERE lang IN ('en', 'es', 'fr', 'de') GROUP BY lang),
         tgt AS (SELECT * FROM (VALUES ('en', 0.5), ('es', 0.2),
                                       ('fr', 0.15), ('de', 0.15))
                 AS t(lang, w)),
         feas AS (SELECT min(n / w) AS cap FROM cnt JOIN tgt USING (lang)),
         -- mirror the engine's snap: fractions within 1e-9 of 1.0 become
         -- exactly 1.0 (binding-group float error must not drop the
         -- hash == scale-1 sliver)
         thr AS (SELECT lang,
                   CAST(floor((CASE WHEN w * cap / n >= 1.0 - 1e-9 THEN 1.0
                               ELSE w * cap / n END) * 1000000) AS BIGINT)
                     AS t
                 FROM cnt JOIN tgt USING (lang) CROSS JOIN feas),
         hashed AS (
           SELECT doc_id, lang,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                    % 1000000 AS u
           FROM (SELECT doc_id, lang,
                   'graft-mix:' || CAST(doc_id AS VARCHAR) || ':' ||
                   reverse(CAST(doc_id AS VARCHAR)) AS s
                 FROM documents))
         SELECT doc_id, lang FROM hashed JOIN thr USING (lang)
         WHERE u < t ORDER BY doc_id""",
    // keep-one over exact-duplicate cliques: a loser is any id with a
    // SMALLER ≥-threshold partner (identical vectors pair at cosine 1.0
    // with their original, so the direct pair suffices — no transitive
    // closure needed for cliques)
    "q81_semantic_dedup" ->
      """WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT vec_id + 100000, embedding
             FROM embeddings WHERE vec_id < 50
           UNION ALL SELECT vec_id + 200000, embedding
             FROM embeddings WHERE vec_id < 20),
         losers AS (
           SELECT DISTINCT b.vec_id
           FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[]))
                 >= 0.95)
         SELECT vec_id FROM corpus ANTI JOIN losers USING (vec_id)
         ORDER BY vec_id""",
    // q78's line removal + q79's LM scoring (fit on the CLEANED corpus)
    // + q71-style exact-percentile gate + q80's feasibility resample,
    // replayed as one statement
    "q82_corpus_pipeline_v3" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
         lines AS (
           SELECT doc_id, i AS pos,
                  array_to_string(toks[2*i+1:2*i+2], ' ') AS line
           FROM d, unnest(range(0, CAST(ceil(len(toks)/2.0) AS BIGINT))) AS t(i)),
         banned AS (
           SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines)
           GROUP BY line HAVING count(*) > 20),
         clean AS (
           SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
           FROM lines ANTI JOIN banned USING (line)
           GROUP BY doc_id),
         ct AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> len(x) > 0) AS toks
           FROM clean),
         trb AS (SELECT toks[i] AS w1, toks[i+1] AS w2
                 FROM ct, unnest(range(1, len(toks))) AS t(i)),
         bi AS (SELECT w1, w2, count(*)::BIGINT AS cbi FROM trb GROUP BY 1, 2),
         ctx AS (SELECT w1, sum(cbi)::BIGINT AS cctx FROM bi GROUP BY 1),
         v AS (SELECT count(DISTINCT tok)::DOUBLE AS v
               FROM (SELECT unnest(toks) AS tok FROM ct)),
         cob AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                 FROM ct, unnest(range(1, len(toks))) AS t(i)),
         p AS (SELECT doc_id,
                 (coalesce(cbi, 0) + 1.0) / (coalesce(cctx, 0) + v.v) AS p
               FROM cob LEFT JOIN bi USING (w1, w2)
                        LEFT JOIN ctx USING (w1) CROSS JOIN v),
         sc AS (SELECT doc_id, round(-avg(ln(p)), 4) AS avg_nll
                FROM p GROUP BY doc_id),
         thr AS (SELECT quantile_cont(avg_nll, 0.5) AS t FROM sc),
         fluent AS (
           SELECT sc.doc_id, docs.lang
           FROM sc CROSS JOIN thr
           JOIN documents docs USING (doc_id)
           WHERE avg_nll <= thr.t),
         cnt AS (SELECT lang, count(*)::DOUBLE AS n FROM fluent
                 WHERE lang IN ('en', 'es', 'fr', 'de') GROUP BY lang),
         tgt AS (SELECT * FROM (VALUES ('en', 0.5), ('es', 0.2),
                                       ('fr', 0.15), ('de', 0.15))
                 AS t(lang, w)),
         feas AS (SELECT min(n / w) AS cap FROM cnt JOIN tgt USING (lang)),
         -- mirror the engine's snap: fractions within 1e-9 of 1.0 become
         -- exactly 1.0 (see q80)
         thr2 AS (SELECT lang,
                    CAST(floor((CASE WHEN w * cap / n >= 1.0 - 1e-9 THEN 1.0
                                ELSE w * cap / n END) * 1000000) AS BIGINT)
                      AS t
                  FROM cnt JOIN tgt USING (lang) CROSS JOIN feas),
         hashed AS (
           SELECT doc_id, lang,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                    % 1000000 AS u
           FROM (SELECT doc_id, lang,
                   'graft-mix-v3:' || CAST(doc_id AS VARCHAR) || ':' ||
                   reverse(CAST(doc_id AS VARCHAR)) AS s
                 FROM fluent))
         SELECT doc_id, lang FROM hashed JOIN thr2 USING (lang)
         WHERE u < t ORDER BY doc_id""",
    // clustering-free replay of the AUTO-celled SemDeDup: brute-force
    // every pair, drop the larger id of any >=-threshold pair (identical
    // planted vectors are complete cliques, so losers = all non-min ids)
    "q84_semantic_dedup_auto" ->
      """WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT vec_id + 300000, embedding
             FROM embeddings WHERE vec_id < 60
           UNION ALL SELECT vec_id + 400000, embedding
             FROM embeddings WHERE vec_id < 25),
         losers AS (
           SELECT DISTINCT b.vec_id
           FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[]))
                 >= 0.95)
         SELECT vec_id FROM corpus ANTI JOIN losers USING (vec_id)
         ORDER BY vec_id""",
    // all-pairs replay of the AUTO-geometry LSH near-dup: identical
    // planted vectors collide in every derived table, so candidate
    // recall on the true pairs is deterministic and the verified pair
    // set equals the brute-force scan
    "q85_embedding_neardup_auto" ->
      """WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT vec_id + 100000, embedding
             FROM embeddings WHERE vec_id < 40
           UNION ALL SELECT vec_id + 200000, embedding
             FROM embeddings WHERE vec_id < 10),
         pairs AS (
           SELECT a.vec_id AS idA, b.vec_id AS idB,
                  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) AS c
           FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
         SELECT idA, idB, round(c, 4) AS cosine
         FROM pairs WHERE c >= 0.95 ORDER BY idA, idB""",
    // batch replay of the streamed chunks: base rows at version 1, the
    // %9 keys updated to version 2 by the post-restart chunk; the higher
    // version (committed last) wins. n_commits = 3 is the exactly-once
    // ledger claim: one upsert per chunk, none re-processed across the
    // two checkpoint restarts.
    "q83_stream_materialize" ->
      """WITH base AS (
           SELECT o_orderkey AS id, o_custkey AS cust,
                  o_totalprice AS price, 1 AS version
           FROM orders),
         upd AS (
           SELECT o_orderkey AS id, o_custkey AS cust,
                  o_totalprice + 1000.0 AS price, 2 AS version
           FROM orders WHERE o_orderkey % 9 = 0),
         merged AS (
           SELECT id, cust, price, version,
                  row_number() OVER (PARTITION BY id
                                     ORDER BY version DESC) AS rk
           FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
         SELECT CAST(id AS BIGINT) AS id, CAST(cust AS BIGINT) AS cust,
                round(price, 2) AS price, CAST(version AS BIGINT) AS version,
                CAST(3 AS BIGINT) AS n_commits
         FROM merged WHERE rk = 1 ORDER BY id""",
    // every rule recomputed from the raw signals; gate flags compare the
    // UNROUNDED values exactly as the engine does
    "q86_gopher_rules" ->
      """WITH d AS (
           SELECT doc_id, text,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents),
         m AS (
           SELECT doc_id, len(toks)::BIGINT AS n_words,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE list_aggregate(list_transform(toks, x -> len(x)),
                         'sum')::DOUBLE / len(toks) END AS mwl,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE ((length(text) - length(replace(text, '#', '')))
                        + (length(text)
                           - length(replace(text, '...', ''))) / 3)::DOUBLE
                       / len(toks) END AS sym,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks,
                         x -> regexp_matches(x, '\p{L}')))::DOUBLE
                       / len(toks) END AS alpha,
             len(list_filter(toks, x -> list_contains(
               ['the','a','an','and','or','of','to','in','is','it','that',
                'for','on','with','as','at','this','by'], lower(x))))::BIGINT
               AS n_stop
           FROM d)
         SELECT doc_id, n_words, round(mwl, 4) AS mean_word_len,
                round(sym, 4) AS symbol_ratio, round(alpha, 4) AS alpha_ratio,
                n_stop AS n_stopwords,
                n_words BETWEEN 30 AND 90 AS ok_words,
                mwl BETWEEN 3.0 AND 4.5 AS ok_word_len,
                sym <= 0.1 AS ok_symbol,
                alpha >= 0.8 AS ok_alpha,
                n_stop >= 2 AS ok_stopwords,
                (n_words BETWEEN 30 AND 90) AND (mwl BETWEEN 3.0 AND 4.5)
                  AND sym <= 0.1 AND alpha >= 0.8 AND n_stop >= 2 AS pass
         FROM m ORDER BY doc_id""",
    // ground-truth spans via list slicing; SEMI JOIN mirrors the
    // engine's left_semi against the cross-document-repeated set
    "q87_repeated_spans" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 10000, text FROM documents
             WHERE doc_id < 50),
         d AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) AS toks
               FROM corpus),
         sp AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS span
                FROM d, unnest(range(1, len(toks) - 6)) AS t(i)
                WHERE len(toks) >= 8),
         rep AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM sp)
                 GROUP BY span HAVING count(*) >= 2),
         dup AS (SELECT doc_id, count(*)::BIGINT AS dup_spans
                 FROM sp SEMI JOIN rep USING (span) GROUP BY doc_id)
         SELECT d.doc_id, greatest(len(toks) - 7, 0)::BIGINT AS n_spans,
                coalesce(dup_spans, 0::BIGINT) AS dup_spans,
                CASE WHEN len(toks) < 8 THEN 0.0
                     ELSE round(coalesce(dup_spans, 0)::DOUBLE
                                / (len(toks) - 7), 4) END AS dup_fraction
         FROM d LEFT JOIN dup USING (doc_id) ORDER BY doc_id""",
    // both hashed-unigram multinomials replayed bucket-for-bucket with
    // the char-poly hash, then the per-token log-likelihood ratios
    "q88_dsir_score" ->
      """WITH tgt AS (
           SELECT list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents WHERE lang = 'en' AND doc_id < 100),
         raw AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents),
         tcnt AS (
           SELECT list_reduce([0::BIGINT] || list_transform(
                      range(1, length(tok) + 1), i -> unicode(tok[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                  % 1024 AS b, count(*)::BIGINT AS ct
           FROM (SELECT unnest(toks) AS tok FROM tgt) GROUP BY b),
         rcnt AS (
           SELECT list_reduce([0::BIGINT] || list_transform(
                      range(1, length(tok) + 1), i -> unicode(tok[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                  % 1024 AS b, count(*)::BIGINT AS cr
           FROM (SELECT doc_id, unnest(toks) AS tok FROM raw) GROUP BY b),
         nt AS (SELECT sum(ct)::DOUBLE AS n FROM tcnt),
         nr AS (SELECT sum(cr)::DOUBLE AS n FROM rcnt),
         scored AS (
           SELECT doc_id,
                  ln((coalesce(ct, 0) + 1.0) / (nt.n + 1024))
                  - ln((coalesce(cr, 0) + 1.0) / (nr.n + 1024)) AS llr
           FROM (SELECT doc_id,
                   list_reduce([0::BIGINT] || list_transform(
                       range(1, length(tok) + 1),
                       i -> unicode(tok[i])::BIGINT),
                     (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                   % 1024 AS b
                 FROM (SELECT doc_id, unnest(toks) AS tok FROM raw)) x
           LEFT JOIN tcnt USING (b) LEFT JOIN rcnt USING (b)
           CROSS JOIN nt CROSS JOIN nr)
         SELECT doc_id, count(*)::BIGINT AS n_tokens,
                round(avg(llr), 4) AS dsir_score
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    // the bloom never changes the answer, so the oracle is the plain
    // whitespace-normalized-fingerprint anti-join (same hash as q30)
    "q89_history_dedup" ->
      """WITH fp AS (
           SELECT doc_id, text,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS f
           FROM (SELECT doc_id, text,
                   array_to_string(
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> len(x) > 0), ' ') AS s
                 FROM (SELECT doc_id, text FROM documents WHERE doc_id >= 150
                       UNION ALL SELECT doc_id + 10000, text FROM documents
                         WHERE doc_id < 30
                       UNION ALL SELECT doc_id + 20000, text || ' zzqx'
                         FROM documents WHERE doc_id < 30))),
         hist AS (
           SELECT DISTINCT list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS f
           FROM (SELECT array_to_string(
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0), ' ') AS s
                 FROM documents WHERE doc_id < 200))
         SELECT doc_id FROM fp ANTI JOIN hist USING (f)
         ORDER BY doc_id""",
    // q86's gate + q87's span dup + q88's DSIR models, chained over the
    // surviving corpus at each stage, in one statement
    "q90_corpus_pipeline_v4" ->
      """WITH corpus AS (
           SELECT doc_id, text, lang FROM documents
           UNION ALL SELECT doc_id + 10000, text, lang FROM documents
             WHERE doc_id < 50),
         tk AS (SELECT doc_id, text, lang,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> len(x) > 0) AS toks
                FROM corpus),
         gate AS (
           SELECT doc_id, text, lang, toks FROM tk
           WHERE len(toks) BETWEEN 30 AND 90
             AND (CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE list_aggregate(list_transform(toks, x -> len(x)),
                         'sum')::DOUBLE / len(toks) END) BETWEEN 3.0 AND 4.5
             AND (CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE ((length(text) - length(replace(text, '#', '')))
                        + (length(text)
                           - length(replace(text, '...', ''))) / 3)::DOUBLE
                       / len(toks) END) <= 0.1
             AND (CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks,
                         x -> regexp_matches(x, '\p{L}')))::DOUBLE
                       / len(toks) END) >= 0.8
             AND len(list_filter(toks, x -> list_contains(
               ['the','a','an','and','or','of','to','in','is','it','that',
                'for','on','with','as','at','this','by'], lower(x)))) >= 2),
         sp AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS span
                FROM gate, unnest(range(1, len(toks) - 6)) AS t(i)
                WHERE len(toks) >= 8),
         rep AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM sp)
                 GROUP BY span HAVING count(*) >= 2),
         dup AS (SELECT doc_id, count(*)::BIGINT AS dup_spans
                 FROM sp SEMI JOIN rep USING (span) GROUP BY doc_id),
         surv AS (
           SELECT gate.doc_id, lang,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS ltoks
           FROM gate LEFT JOIN dup USING (doc_id)
           WHERE (CASE WHEN len(toks) < 8 THEN 0.0
                  ELSE round(coalesce(dup_spans, 0)::DOUBLE
                             / (len(toks) - 7), 4) END) <= 0.5),
         tcnt AS (
           SELECT list_reduce([0::BIGINT] || list_transform(
                      range(1, length(tok) + 1), i -> unicode(tok[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                  % 1024 AS b, count(*)::BIGINT AS ct
           FROM (SELECT unnest(ltoks) AS tok FROM surv
                 WHERE lang = 'en' AND doc_id < 100) GROUP BY b),
         rcnt AS (
           SELECT list_reduce([0::BIGINT] || list_transform(
                      range(1, length(tok) + 1), i -> unicode(tok[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                  % 1024 AS b, count(*)::BIGINT AS cr
           FROM (SELECT unnest(ltoks) AS tok FROM surv) GROUP BY b),
         nt AS (SELECT sum(ct)::DOUBLE AS n FROM tcnt),
         nr AS (SELECT sum(cr)::DOUBLE AS n FROM rcnt),
         scored AS (
           SELECT doc_id,
                  ln((coalesce(ct, 0) + 1.0) / (nt.n + 1024))
                  - ln((coalesce(cr, 0) + 1.0) / (nr.n + 1024)) AS llr
           FROM (SELECT doc_id,
                   list_reduce([0::BIGINT] || list_transform(
                       range(1, length(tok) + 1),
                       i -> unicode(tok[i])::BIGINT),
                     (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                   % 1024 AS b
                 FROM (SELECT doc_id, unnest(ltoks) AS tok FROM surv)) x
           LEFT JOIN tcnt USING (b) LEFT JOIN rcnt USING (b)
           CROSS JOIN nt CROSS JOIN nr)
         SELECT doc_id, count(*)::BIGINT AS n_tokens,
                round(avg(llr), 4) AS dsir_score
         FROM scored GROUP BY doc_id
         HAVING round(avg(llr), 4) >= -1.2 ORDER BY doc_id""",
    // ground-truth span removal: the repeated set from list-sliced spans
    // (as q87), then the covering-window union and token-level rebuild
    // replayed with nested list lambdas — value-identical text strings
    "q91_strip_spans" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 10000, text FROM documents
             WHERE doc_id < 50),
         d AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) AS toks
               FROM corpus),
         sp AS (SELECT doc_id, i, array_to_string(toks[i:i+7], ' ') AS span
                FROM d, unnest(range(1, len(toks) - 6)) AS t(i)
                WHERE len(toks) >= 8),
         rep AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM sp)
                 GROUP BY span HAVING count(*) >= 2),
         cov AS (SELECT doc_id, list(i) AS ps
                 FROM (SELECT doc_id, i FROM sp SEMI JOIN rep USING (span))
                 GROUP BY doc_id),
         reb AS (
           SELECT d.doc_id,
                  list_transform(
                    list_filter(range(1, len(toks) + 1),
                      j -> len(list_filter(coalesce(ps, []::BIGINT[]),
                             p -> j >= p AND j <= p + 7)) = 0),
                    j -> toks[j]) AS kept
           FROM d LEFT JOIN cov USING (doc_id))
         SELECT doc_id,
                coalesce(array_to_string(kept, ' '), '') AS text,
                len(kept)::BIGINT AS n_tokens
         FROM reb ORDER BY doc_id""",
    // full replay of the URL pipeline: same planted URLs, same RE2
    // canonicalization steps, same embedded suffix list, same char-poly
    // cap order
    "q92_url_domain_gate" ->
      """WITH d AS (
           SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.'
                   WHEN doc_id % 3 = 1 THEN 'http://' ELSE '' END)
             || 'Site' || (doc_id % 23)::VARCHAR || '.'
             || (CASE WHEN doc_id % 5 = 0 THEN 'co.uk'
                      WHEN doc_id % 5 = 1 THEN 'com.au' ELSE 'com' END)
             || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
             || '/Page/' || doc_id::VARCHAR
             || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&id='
                      ELSE '?id=' END)
             || doc_id::VARCHAR || '#s' AS url
           FROM documents),
         c1 AS (SELECT doc_id, trim(url) AS u,
                  coalesce(regexp_extract(trim(url),
                    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '') AS sraw
                FROM d),
         c2 AS (SELECT doc_id,
                  CASE WHEN sraw <> '' THEN lower(sraw) ELSE 'http' END
                    AS scheme,
                  CASE WHEN sraw <> '' THEN
                    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '')
                  ELSE u END AS rest
                FROM c1),
         c3 AS (SELECT doc_id, scheme, rest,
                  coalesce(regexp_extract(rest, '^([^/?#]*)', 1), '')
                    AS auth
                FROM c2),
         c4 AS (SELECT doc_id, scheme,
                  substring(rest, length(auth) + 1) AS tail,
                  lower(regexp_replace(auth, '^[^@]*@', '')) AS h0
                FROM c3),
         c5 AS (SELECT doc_id, scheme, tail,
                  regexp_replace(regexp_replace(
                    CASE WHEN scheme = 'http'
                           THEN regexp_replace(h0, ':80$', '')
                         WHEN scheme = 'https'
                           THEN regexp_replace(h0, ':443$', '')
                         ELSE h0 END, '\.$', ''), '^www\.', '') AS host
                FROM c4),
         c6 AS (SELECT doc_id, scheme, host,
                  coalesce(regexp_extract(tail, '^([^?#]*)', 1), '') AS p0,
                  coalesce(regexp_extract(tail, '\?([^#]*)', 1), '') AS qraw
                FROM c5),
         c7 AS (SELECT doc_id, scheme, host,
                  CASE WHEN p0 = '' THEN '/' ELSE p0 END AS path,
                  coalesce(array_to_string(list_filter(
                    string_split(qraw, '&'),
                    p -> p <> '' AND NOT regexp_matches(p,
                      '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)=')),
                    '&'), '') AS q
                FROM c6),
         canon AS (SELECT doc_id,
                  scheme || '://' || host || path ||
                    (CASE WHEN q = '' THEN '' ELSE '?' || q END)
                    AS url_canon
                FROM c7),
         hostx AS (SELECT doc_id, url_canon,
                  regexp_replace(coalesce(regexp_extract(url_canon,
                    '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1), ''),
                    ':[0-9]+$', '') AS h
                FROM canon),
         dom AS (SELECT doc_id, url_canon,
                  CASE WHEN regexp_matches(h, '^[0-9.]+$') THEN h
                       WHEN len(string_split(h, '.')) <= 2 THEN h
                       WHEN list_contains(
                           ['co.uk','org.uk','ac.uk','gov.uk','co.jp',
                            'ne.jp','or.jp','com.au','net.au','org.au',
                            'co.in','co.nz','com.br','com.cn','com.mx',
                            'com.tr','co.za','com.sg','com.hk'],
                           array_to_string(string_split(h, '.')[-2:], '.'))
                         THEN array_to_string(string_split(h, '.')[-3:], '.')
                       ELSE array_to_string(string_split(h, '.')[-2:], '.')
                  END AS domain
                FROM hostx),
         keyed AS (SELECT doc_id, url_canon, domain,
                  url_canon || ':' || doc_id::VARCHAR AS s
                FROM dom
                WHERE domain NOT IN ('site3.com', 'site7.co.uk')),
         ranked AS (SELECT doc_id, url_canon, domain,
                  row_number() OVER (PARTITION BY domain ORDER BY
                    list_reduce([0::BIGINT] || list_transform(
                        range(1, length(s) + 1),
                        i -> unicode(s[i])::BIGINT),
                      (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)),
                    doc_id) AS rk
                FROM keyed)
         SELECT doc_id, url_canon, domain
         FROM ranked WHERE rk <= 3 ORDER BY doc_id""",
    // identical RE2 alternation on both engines — the pattern string is
    // TextAnalysis.BpeishPattern verbatim
    "q93_bpeish_tokens" ->
      """WITH d AS (
           SELECT doc_id,
             text || ' it''s can''t we''re v' || doc_id::VARCHAR
                  || '.07 #tag_' || doc_id::VARCHAR || ' 3.14x' AS s
           FROM documents)
         SELECT doc_id,
           len(list_filter(string_split_regex(s, '\s+'),
               x -> len(x) > 0))::BIGINT AS n_ws_tokens,
           len(regexp_extract_all(s,
               '''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))::BIGINT
             AS n_bpeish_tokens
         FROM d ORDER BY doc_id""",
    // q50's closed form evaluated at the nearest-neighbor source
    // coordinates (x*w) div 6, (y*h) div 5 of the 6x5 target grid — no
    // codec anywhere in the oracle
    "q94_image_resize" ->
      """WITH dims AS (
           SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
           FROM documents),
         xs AS (SELECT doc_id, w, h, unnest(range(0, 6)) AS x FROM dims),
         px AS (SELECT doc_id, w, h, x, unnest(range(0, 5)) AS y FROM xs),
         src AS (SELECT doc_id, (x * w) // 6 AS sx, (y * h) // 5 AS sy
                 FROM px),
         vals AS (
           SELECT doc_id,
                  (doc_id + 7*sx + 13*sy) % 256 AS r,
                  (3*doc_id + 5*sx + 11*sy) % 256 AS g,
                  (5*doc_id + 3*sx + 17*sy) % 256 AS b
           FROM src),
         lums AS (
           SELECT *, (299*r + 587*g + 114*b) // 1000 AS l FROM vals)
         SELECT doc_id,
                CAST(6 AS INT) AS width, CAST(5 AS INT) AS height,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b) AS BIGINT) AS sum_b,
                CAST(sum(CASE WHEN l < 64 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h0,
                CAST(sum(CASE WHEN l >= 64 AND l < 128 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h1,
                CAST(sum(CASE WHEN l >= 128 AND l < 192 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h2,
                CAST(sum(CASE WHEN l >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS lum_h3
         FROM lums GROUP BY doc_id ORDER BY doc_id""",
    // full packed-stream replay: identical tokenization (whitespace on
    // lowercased text), identical hash vocabulary (charPolyHash mod 32768,
    // EOS = 32768), identical fingerprint order key, a window cumsum for
    // the offsets, and a position-ordered polynomial checksum per
    // 256-token sequence
    "q95_sequence_packing" ->
      """WITH ws AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                         x -> len(x) > 0) AS toks
           FROM documents),
         ids AS (
           SELECT doc_id,
             list_append(
               list_transform(toks, t ->
                 (list_reduce(
                    [0::BIGINT] || list_transform(range(1, len(t) + 1),
                      i -> unicode(t[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                  % 32768)::BIGINT),
               32768::BIGINT) AS ids,
             list_reduce(
               [0::BIGINT] || list_transform(
                 range(1, length(array_to_string(toks, ' ')) + 1),
                 i -> unicode(array_to_string(toks, ' ')[i])::BIGINT),
               (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS ok
           FROM ws),
         offs AS (
           SELECT doc_id, ids,
             coalesce(sum(len(ids)) OVER (ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
           FROM ids),
         stream AS (
           SELECT doc_id, s, ids,
                  unnest(range(1, len(ids) + 1)) AS i
           FROM offs),
         tok AS (
           SELECT doc_id, CAST((s + i - 1) // 256 AS BIGINT) AS seq_id,
                  (s + i - 1) % 256 AS pos, ids[i] AS t
           FROM stream)
         SELECT seq_id,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(count(*) AS BIGINT) AS n_tokens,
                list_reduce([0::BIGINT] || list(t ORDER BY pos),
                  (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS checksum
         FROM tok GROUP BY seq_id HAVING count(*) = 256
         ORDER BY seq_id""",
    // every frame recomputed from the planted closed form — no WAV bytes,
    // no parser, just the sample formula and the same 25-sample framing
    "q96_audio_frames" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 97 AS n FROM documents),
         fr AS (SELECT doc_id, n, unnest(range(0, n // 25)) AS f FROM d),
         ix AS (SELECT doc_id, n, f,
                       unnest(range(f * 25, f * 25 + 25)) AS i
                FROM fr),
         sv AS (SELECT doc_id, n, f, i,
                       ((doc_id * 31 + i * 7) % 4096) - 2048 AS s
                FROM ix),
         sp AS (SELECT doc_id, n, f, i, s,
                       lag(s) OVER (PARTITION BY doc_id, f ORDER BY i) AS p
                FROM sv)
         SELECT doc_id,
                CAST(8000 AS INT) AS sample_rate,
                CAST(n AS BIGINT) AS n_samples,
                CAST(f AS INT) AS frame_idx,
                CAST(sum(s * s) AS BIGINT) AS frame_sum_sq,
                CAST(sum(abs(s)) AS BIGINT) AS frame_sum_abs,
                CAST(sum(CASE WHEN p IS NOT NULL AND ((p < 0) <> (s < 0))
                              THEN 1 ELSE 0 END) AS BIGINT) AS frame_zc
         FROM sp GROUP BY doc_id, n, f
         ORDER BY doc_id, frame_idx""",
    // every aHash bit recomputed from the planted pixel closed form: the
    // 8×8 nearest-neighbor source indices, the integer grayscale, and the
    // exact-integer at-or-above-mean rule (gray·64 ≥ Σgray)
    "q97_image_ahash" ->
      """WITH ids AS (SELECT doc_id, doc_id % 37 AS img FROM documents),
         cell AS (
           SELECT doc_id, img, t.i AS i,
                  ((t.i % 8) * (4 + img % 5)) // 8 AS sx,
                  ((t.i // 8) * (4 + img % 3)) // 8 AS sy
           FROM ids, unnest(range(0, 64)) AS t(i)),
         g AS (
           SELECT doc_id, i,
                  (CAST((img + 7*sx + 13*sy) % 256 AS BIGINT)
                   + (3*img + 5*sx + 11*sy) % 256
                   + (5*img + 3*sx + 17*sy) % 256) // 3 AS gray
           FROM cell),
         sgr AS (
           SELECT doc_id, i, gray,
                  sum(gray) OVER (PARTITION BY doc_id) AS sg
           FROM g),
         h AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN i >= 32 AND gray * 64 >= sg
                           THEN 1::BIGINT << (i - 32) ELSE 0 END) AS BIGINT)
                    AS ahash_hi,
                  CAST(sum(CASE WHEN i < 32 AND gray * 64 >= sg
                           THEN 1::BIGINT << i ELSE 0 END) AS BIGINT)
                    AS ahash_lo
           FROM sgr GROUP BY doc_id)
         SELECT doc_id, ahash_hi, ahash_lo,
                CAST(count(*) OVER (PARTITION BY ahash_hi, ahash_lo)
                     AS BIGINT) AS n_dups
         FROM h ORDER BY doc_id""",
    // both horizons replayed as DuckDB RANGE frames over the same epoch
    // micros and the same exact integer cents
    "q98_trailing_windows" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events)
         SELECT event_id, user_id, ts_us,
                CAST(count(*) OVER w1 AS BIGINT) AS n_1h,
                CAST(sum(cents) OVER w1 AS BIGINT) AS cents_1h,
                CAST(count(*) OVER w24 AS BIGINT) AS n_24h,
                CAST(sum(cents) OVER w24 AS BIGINT) AS cents_24h,
                max(cents) OVER w24 AS max_cents_24h
         FROM e
         WINDOW w1 AS (PARTITION BY user_id ORDER BY ts_us
                       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
                w24 AS (PARTITION BY user_id ORDER BY ts_us
                        RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    // the oracle never sees the buckets: it aggregates the raw rows in one
    // pass, so a hash match PROVES the two-level partial/merge fold equals
    // a full rescan (n_buckets = distinct days doubles as the bucket-count
    // check)
    "q99_incremental_stats" ->
      """WITH e AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events)
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(cents) AS BIGINT) AS sum_v,
                CAST(sum(cents * cents) AS BIGINT) AS sum_sq,
                min(cents) AS min_v,
                max(cents) AS max_v,
                CAST(count(DISTINCT day) AS BIGINT) AS n_buckets
         FROM e GROUP BY event_type ORDER BY event_type""",
    // the full chain from scratch: Gopher battery pass flag (same SQL as
    // q86), planted mod-23 domains, avg-of-0/1 pass rates, and the
    // >= 0.3 domain gate
    "q100_domain_reputation" ->
      """WITH d0 AS (
           SELECT doc_id, text,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents),
         m AS (
           SELECT doc_id, len(toks)::BIGINT AS n_words,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE list_aggregate(list_transform(toks, x -> len(x)),
                         'sum')::DOUBLE / len(toks) END AS mwl,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE ((length(text) - length(replace(text, '#', '')))
                        + (length(text)
                           - length(replace(text, '...', ''))) / 3)::DOUBLE
                       / len(toks) END AS sym,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks,
                         x -> regexp_matches(x, '\p{L}')))::DOUBLE
                       / len(toks) END AS alpha,
             len(list_filter(toks, x -> list_contains(
               ['the','a','an','and','or','of','to','in','is','it','that',
                'for','on','with','as','at','this','by'], lower(x))))::BIGINT
               AS n_stop
           FROM d0),
         p AS (
           SELECT doc_id,
                  (n_words BETWEEN 30 AND 90) AND (mwl BETWEEN 3.0 AND 4.5)
                    AND sym <= 0.1 AND alpha >= 0.8 AND n_stop >= 2 AS pass
           FROM m),
         dom AS (SELECT doc_id,
                        'site' || (doc_id % 23)::VARCHAR || '.com' AS domain
                 FROM documents),
         r AS (SELECT domain,
                      avg(CASE WHEN pass THEN 1.0 ELSE 0.0 END) AS rate,
                      CAST(count(*) AS BIGINT) AS domain_docs
               FROM dom JOIN p USING (doc_id) GROUP BY domain)
         SELECT doc_id, domain, round(rate, 4) AS domain_rate, domain_docs
         FROM dom JOIN r USING (domain)
         WHERE rate >= 0.3
         ORDER BY doc_id""",
    // PSI replayed term for term: identical fixed bin edges, identical
    // (count + 0.5)/(total + 0.5·bins) smoothing, natural log, rounded
    // to 4 decimals (ln differs from Java's by at most an ulp)
    "q101_psi_drift" ->
      """WITH e AS (
           SELECT event_type,
                  epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-10 00:00:00')
                    AS is_ref,
                  least(greatest(CAST(floor(value / 2.5) AS INT), 0), 9)
                    AS bin
           FROM events),
         c AS (SELECT event_type, bin,
                      sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
                      sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS det_n
               FROM e GROUP BY event_type, bin),
         k AS (SELECT DISTINCT event_type FROM e),
         b AS (SELECT event_type, t.b AS bin
               FROM k, unnest(range(0, 10)) AS t(b)),
         f AS (SELECT b.event_type, b.bin,
                      coalesce(ref_n, 0) AS ref_n,
                      coalesce(det_n, 0) AS det_n
               FROM b LEFT JOIN c ON b.event_type = c.event_type
                                 AND b.bin = c.bin),
         t AS (SELECT event_type, sum(ref_n) AS rt, sum(det_n) AS dt
               FROM f GROUP BY event_type)
         SELECT f.event_type,
                round(sum(((ref_n + 0.5) / (rt + 5.0)
                           - (det_n + 0.5) / (dt + 5.0))
                          * ln(((ref_n + 0.5) / (rt + 5.0))
                               / ((det_n + 0.5) / (dt + 5.0)))), 4) AS psi,
                CAST(max(rt) AS BIGINT) AS ref_total,
                CAST(max(dt) AS BIGINT) AS det_total
         FROM f JOIN t ON f.event_type = t.event_type
         GROUP BY f.event_type ORDER BY f.event_type""",
    // gap-break + running-sum session ids, replayed with the same window
    // algebra; ties in ts_us are harmless (lag reads only ts_us, which is
    // equal across tied rows)
    "q102_batch_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         l AS (SELECT user_id, ts_us, cents,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 21600000000
                           THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
         sx AS (SELECT user_id, ts_us, cents,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS session_idx
                FROM l)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                min(ts_us) AS session_start_us,
                max(ts_us) AS session_end_us,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(cents) AS BIGINT) AS total
         FROM sx GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",
    // DuckDB ASOF gives latest-at-or-before; the 24h staleness bound then
    // nulls every payload column of a stale match (a NULL v.ts never
    // satisfies the CASE, so no-match rows stay null too). Views are
    // pre-deduped to the max event_id per (user_id, ts) — the same
    // tie rule the Spark side encodes via tieBreak = Some("event_id") —
    // so equal-timestamp ties can never make the compare nondeterministic
    "q103_pit_tolerance" ->
      """WITH v AS (
           SELECT user_id, ts, event_id, value FROM (
             SELECT user_id, ts, event_id, value,
                    row_number() OVER (PARTITION BY user_id, ts
                                       ORDER BY event_id DESC) AS rn
             FROM events WHERE event_type = 'view')
           WHERE rn = 1)
         SELECT s.event_id, s.user_id, epoch_us(s.ts) AS ts_us,
                CASE WHEN epoch_us(s.ts) - epoch_us(v.ts) <= 86400000000
                     THEN epoch_us(v.ts) END AS view_ts_us,
                CASE WHEN epoch_us(s.ts) - epoch_us(v.ts) <= 86400000000
                     THEN v.event_id END AS view_event_id,
                CASE WHEN epoch_us(s.ts) - epoch_us(v.ts) <= 86400000000
                     THEN v.value END AS view_value
         FROM (SELECT * FROM events WHERE event_type = 'click') s
         ASOF LEFT JOIN v
           ON s.user_id = v.user_id AND v.ts <= s.ts
         ORDER BY s.event_id""",
    // binned ECDFs via window cumsums over the seen bins only — the ECDF
    // is constant across empty bins, so they can never host the max gap
    "q104_ks_drift" ->
      """WITH e AS (
           SELECT event_type,
                  epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-10 00:00:00')
                    AS is_ref,
                  least(greatest(CAST(floor(value / 1.25) AS INT), 0), 19)
                    AS bin
           FROM events),
         c AS (SELECT event_type, bin,
                      sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
                      sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS det_n
               FROM e GROUP BY event_type, bin),
         t AS (SELECT event_type, bin,
                      sum(ref_n) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cr,
                      sum(det_n) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cd,
                      sum(ref_n) OVER (PARTITION BY event_type) AS rt,
                      sum(det_n) OVER (PARTITION BY event_type) AS dt
               FROM c)
         SELECT event_type,
                round(max(abs(CAST(cr AS DOUBLE) / rt
                              - CAST(cd AS DOUBLE) / dt)), 4) AS ks,
                CAST(max(rt) AS BIGINT) AS ref_total,
                CAST(max(dt) AS BIGINT) AS det_total
         FROM t GROUP BY event_type ORDER BY event_type""",
    // pooled-distribution expected counts, both windows' cells summed,
    // dof = (grouped cells - 1): count(*) over the per-(cohort, category)
    // frame, the same cell set the chi2 sum folds (a null category would
    // be a real cell on both sides — missingness drift is drift)
    "q105_chi2_drift" ->
      """WITH e AS (
           SELECT user_id % 4 AS cohort, event_type,
                  epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-10 00:00:00')
                    AS is_ref
           FROM events),
         c AS (SELECT cohort, event_type AS category,
                      sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
                      sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS det_n
               FROM e GROUP BY cohort, event_type),
         t AS (SELECT *, sum(ref_n) OVER (PARTITION BY cohort) AS rt,
                      sum(det_n) OVER (PARTITION BY cohort) AS dt
               FROM c)
         SELECT cohort,
                round(sum(
                  (ref_n - (ref_n + det_n) * CAST(rt AS DOUBLE) / (rt + dt))
                  * (ref_n - (ref_n + det_n) * CAST(rt AS DOUBLE) / (rt + dt))
                  / ((ref_n + det_n) * CAST(rt AS DOUBLE) / (rt + dt))
                  + (det_n - (ref_n + det_n) * CAST(dt AS DOUBLE) / (rt + dt))
                  * (det_n - (ref_n + det_n) * CAST(dt AS DOUBLE) / (rt + dt))
                  / ((ref_n + det_n) * CAST(dt AS DOUBLE) / (rt + dt))), 4)
                  AS chi2,
                CAST(count(*) - 1 AS BIGINT) AS dof,
                CAST(max(rt) AS BIGINT) AS ref_total,
                CAST(max(dt) AS BIGINT) AS det_total
         FROM t GROUP BY cohort ORDER BY cohort""",
    // per-dimension window means via the same avg-ignores-null algebra,
    // then the identical cosine/L2 fold (double accumulation error is
    // ~1e-12, four decimal places of headroom below the rounding)
    "q106_embedding_drift" ->
      """WITH e AS (
           SELECT label, vec_id % 2 = 0 AS is_ref, u.i AS dim,
                  CAST(embedding[u.i + 1] AS DOUBLE) AS v
           FROM embeddings, unnest(range(0, len(embedding))) AS u(i)),
         m AS (
           SELECT label, dim,
                  avg(CASE WHEN is_ref THEN v END) AS mr,
                  avg(CASE WHEN NOT is_ref THEN v END) AS md,
                  sum(CASE WHEN is_ref AND dim = 0 THEN 1 ELSE 0 END)
                    AS nr,
                  sum(CASE WHEN NOT is_ref AND dim = 0 THEN 1 ELSE 0 END)
                    AS nd
           FROM e GROUP BY label, dim)
         SELECT label,
                round(1.0 - sum(mr * md)
                      / (sqrt(sum(mr * mr)) * sqrt(sum(md * md))), 4)
                  AS cos_dist,
                round(sqrt(sum((mr - md) * (mr - md))), 4) AS l2_dist,
                CAST(sum(nr) AS BIGINT) AS ref_total,
                CAST(sum(nd) AS BIGINT) AS det_total
         FROM m GROUP BY label ORDER BY label""",
    // both medians replayed with the identical count/cumsum/ceil(n/2)
    // algebra the engine runs — never quantile_cont, whose interpolation
    // is a different statistic
    "q107_robust_anomalies" ->
      """WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS v
                    FROM events WHERE value IS NOT NULL),
         vc AS (SELECT event_type, v, count(*) AS c
                FROM e GROUP BY event_type, v),
         vm AS (SELECT event_type, v,
                       sum(c) OVER (PARTITION BY event_type ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum,
                       sum(c) OVER (PARTITION BY event_type) AS n
                FROM vc),
         med AS (SELECT event_type, min(v) AS med
                 FROM vm WHERE cum >= (n + 1) // 2 GROUP BY event_type),
         d AS (SELECT e.event_type, round(abs(e.v - med.med), 2) AS dev,
                      med.med
               FROM e JOIN med ON e.event_type = med.event_type),
         dc AS (SELECT event_type, dev, count(*) AS c, max(med) AS med
                FROM d GROUP BY event_type, dev),
         dm AS (SELECT event_type, dev,
                       sum(c) OVER (PARTITION BY event_type ORDER BY dev
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum,
                       sum(c) OVER (PARTITION BY event_type) AS n
                FROM dc),
         mad AS (SELECT event_type, min(dev) AS mad
                 FROM dm WHERE cum >= (n + 1) // 2 GROUP BY event_type)
         SELECT dc.event_type, max(dc.med) AS median, max(mad.mad) AS mad,
                CAST(sum(CASE WHEN dc.dev > 3.0 * mad.mad THEN dc.c
                              ELSE 0 END) AS BIGINT) AS n_anomalies,
                CAST(sum(dc.c) AS BIGINT) AS n
         FROM dc JOIN mad ON dc.event_type = mad.event_type
         GROUP BY dc.event_type ORDER BY dc.event_type""",
    // both snapshots rebuilt from the source table and the literal
    // change sets (upsert {0,100}, then upsert {0,2,101} + delete 3),
    // then the same full-outer status algebra
    "q108_snapshot_diff" ->
      """WITH base AS (SELECT CAST(n_nationkey AS BIGINT) AS id,
                              n_name AS v FROM nation),
         snap1 AS (
           SELECT id, CASE WHEN id = 0 THEN 'V2_0' ELSE v END AS v
           FROM base
           UNION ALL SELECT 100, 'V2_100'),
         snap2 AS (
           SELECT id,
                  CASE WHEN id = 0 THEN 'V3_0'
                       WHEN id = 2 THEN 'V3_2' ELSE v END AS v
           FROM (SELECT * FROM snap1 UNION ALL SELECT 101, 'V3_101')
           WHERE id <> 3)
         SELECT coalesce(s1.id, s2.id) AS id,
                CASE WHEN s1.id IS NULL THEN 'added'
                     WHEN s2.id IS NULL THEN 'removed'
                     ELSE 'changed' END AS status,
                s1.v AS before_v, s2.v AS after_v
         FROM snap1 s1 FULL OUTER JOIN snap2 s2 ON s1.id = s2.id
         WHERE s1.id IS NULL OR s2.id IS NULL OR s1.v <> s2.v
         ORDER BY id""",
    // identical pre-tokenizer pattern, identical (count desc, token asc)
    // tie-break, coverage as a cumsum over the same ranking
    "q109_vocabulary" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(regexp_extract_all(text,
               '''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))
               AS token
           FROM documents),
         c AS (SELECT token, count(*) AS n_occurrences,
                      count(DISTINCT doc_id) AS n_docs
               FROM t GROUP BY token),
         tot AS (SELECT sum(n_occurrences) AS total FROM c),
         top AS (SELECT token, n_occurrences, n_docs,
                        row_number() OVER (ORDER BY n_occurrences DESC,
                                           token ASC) AS rank
                 FROM c
                 ORDER BY n_occurrences DESC, token ASC LIMIT 100)
         SELECT CAST(rank AS BIGINT) AS rank, token,
                CAST(n_occurrences AS BIGINT) AS n_occurrences,
                CAST(n_docs AS BIGINT) AS n_docs,
                round(CAST(sum(n_occurrences) OVER (ORDER BY rank
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / tot.total, 4) AS coverage
         FROM top, tot ORDER BY rank""",
    // the same count/cumsum quantile algebra at both rational positions
    // (cum·100 ≥ n·5 and cum·100 ≥ n·95), then the identical clip
    "q110_winsorize" ->
      """WITH e AS (SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
                    FROM events WHERE value IS NOT NULL),
         vc AS (SELECT event_type, v, count(*) AS c
                FROM e GROUP BY event_type, v),
         vm AS (SELECT event_type, v,
                       sum(c) OVER (PARTITION BY event_type ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum,
                       sum(c) OVER (PARTITION BY event_type) AS n
                FROM vc),
         lo AS (SELECT event_type, min(v) AS q_low
                FROM vm WHERE cum * 100 >= n * 5 GROUP BY event_type),
         hi AS (SELECT event_type, min(v) AS q_high
                FROM vm WHERE cum * 100 >= n * 95 GROUP BY event_type)
         SELECT e.event_id, e.event_type, lo.q_low, hi.q_high,
                round(least(greatest(e.v, lo.q_low), hi.q_high), 2)
                  AS value_wins
         FROM e JOIN lo ON e.event_type = lo.event_type
                JOIN hi ON e.event_type = hi.event_type
         ORDER BY e.event_id""",
    // the same forward range frame over the same unioned stream — the
    // (t, t+24h] horizon replayed as 1 FOLLOWING .. 86400000000 FOLLOWING
    "q112_label_window" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                           event_type,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events)
         SELECT event_id, user_id, ts_us,
                CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1
                     ELSE 0 END) OVER w, 0) AS BIGINT) AS future_views,
                CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                     THEN cents ELSE 0 END) OVER w, 0) AS BIGINT)
                  AS future_spend_cents
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                      RANGE BETWEEN 1 FOLLOWING
                        AND 86400000000 FOLLOWING)
         QUALIFY event_type = 'click'
         ORDER BY event_id""",
    // the same distinct-(user, week) frame, first-week cohorts, offset
    // counts, and cohort-size fractions
    "q111_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 604800000000 AS p
                    FROM events),
         f AS (SELECT user_id, min(p) AS cohort FROM a GROUP BY user_id),
         s AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY cohort),
         o AS (SELECT f.cohort, a.p - f.cohort AS offset,
                      count(*) AS n_active
               FROM a JOIN f ON a.user_id = f.user_id
               GROUP BY f.cohort, a.p - f.cohort)
         SELECT o.cohort, o.offset,
                CAST(o.n_active AS BIGINT) AS n_active,
                CAST(s.n_cohort AS BIGINT) AS n_cohort,
                round(CAST(o.n_active AS DOUBLE) / s.n_cohort, 4)
                  AS retention
         FROM o JOIN s ON o.cohort = s.cohort
         ORDER BY o.cohort, o.offset""",
    // replay the ingest loop set-theoretically: a doc is accepted iff no
    // SAME-FINGERPRINT doc arrived in an earlier batch (dropped docs'
    // fingerprints are in the store by construction, so store membership
    // ≡ "any earlier batch contained this fingerprint"); the merged
    // moments are then plain aggregates over the accepted set, with
    // n_buckets = count of batches contributing ≥1 accepted doc
    "q113_ingest_loop" ->
      """WITH corpus AS (
           SELECT doc_id, text, lang, n_chars FROM documents
           UNION ALL
           SELECT doc_id + 10000, text, lang, n_chars FROM documents
           WHERE doc_id < 40),
         f AS (
           SELECT doc_id, lang, n_chars, doc_id % 3 AS b,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS fp
           FROM (SELECT doc_id, lang, n_chars,
                   array_to_string(
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> len(x) > 0), ' ') AS s
                 FROM corpus)),
         acc AS (SELECT * FROM f d WHERE NOT EXISTS
                  (SELECT 1 FROM f e WHERE e.fp = d.fp AND e.b < d.b))
         SELECT lang, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(n_chars) AS BIGINT) AS sum_v,
                CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq,
                CAST(min(n_chars) AS BIGINT) AS min_v,
                CAST(max(n_chars) AS BIGINT) AS max_v,
                CAST(count(DISTINCT b) AS BIGINT) AS n_buckets
         FROM acc GROUP BY lang ORDER BY lang""",
    // the binary-Avro byte layout in SQL: per nullable-union field one
    // branch byte + (null: nothing | long: zigzag varint width | double:
    // 8 | string: length-varint + UTF-8 bytes); key = the PK concat
    // under the nullable union ["null","string"] (branch byte + length
    // varint + UTF-8 bytes — the schema to_avro infers from a nullable
    // concat column)
    "q114_avro_wire" ->
      """WITH e AS (
           SELECT event_id, user_id, value,
                  CASE WHEN event_type = 'click' THEN NULL
                       ELSE event_type END AS etype
           FROM events),
         z AS (
           SELECT *,
             CASE WHEN event_id >= 0 THEN 2 * event_id
                  ELSE -2 * event_id - 1 END AS z1,
             CASE WHEN user_id >= 0 THEN 2 * user_id
                  ELSE -2 * user_id - 1 END AS z2,
             strlen(CAST(event_id AS VARCHAR)) AS klen,
             CASE WHEN etype IS NULL THEN NULL
                  ELSE strlen(etype) END AS slen
           FROM e)
         SELECT event_id,
           CAST(1 + CASE WHEN 2 * klen < 128 THEN 1 ELSE 2 END + klen
                AS BIGINT) AS key_len,
           CAST(
             1 + CASE WHEN z1 < 128 THEN 1 WHEN z1 < 16384 THEN 2
                      WHEN z1 < 2097152 THEN 3 WHEN z1 < 268435456 THEN 4
                      WHEN z1 < 34359738368 THEN 5
                      WHEN z1 < 4398046511104 THEN 6
                      WHEN z1 < 562949953421312 THEN 7
                      WHEN z1 < 72057594037927936 THEN 8 ELSE 9 END
             + 1 + CASE WHEN z2 < 128 THEN 1 WHEN z2 < 16384 THEN 2
                      WHEN z2 < 2097152 THEN 3 WHEN z2 < 268435456 THEN 4
                      WHEN z2 < 34359738368 THEN 5
                      WHEN z2 < 4398046511104 THEN 6
                      WHEN z2 < 562949953421312 THEN 7
                      WHEN z2 < 72057594037927936 THEN 8 ELSE 9 END
             + CASE WHEN value IS NULL THEN 1 ELSE 9 END
             + CASE WHEN slen IS NULL THEN 1
                    WHEN 2 * slen < 128 THEN 2 + slen
                    ELSE 3 + slen END AS BIGINT) AS value_len,
           user_id, value, etype
         FROM z ORDER BY event_id""",
    // the avro container round trip is lossless, so the oracle is the
    // projection itself (price: the r10 logical-decimal column; final
    // cast to DOUBLE on both sides — DECIMAL dtypes diverge at the
    // driver hash boundary even when values are identical)
    "q115_avro_td" ->
      """SELECT doc_id, lang, n_chars, round(n_chars / 7.0, 3) AS score,
                CAST(n_chars * 3 AS DECIMAL(12,2))::DOUBLE AS price
         FROM documents ORDER BY doc_id""",
    // float32-exact values → the tfrecord round trip is lossless too
    "q116_tfrecord_td" ->
      """SELECT doc_id, lang, n_chars, n_chars / 8.0 AS score
         FROM documents ORDER BY doc_id""",
    // the metastore round trip is lossless, so the oracle aggregates the
    // raw parquet directly
    "q117_metastore" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
                round(sum(c_acctbal), 2) + 0.0 AS total_bal
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    // literal replay of each delta-log read: v0 = keys < 10, v2 = all,
    // changes (0,2] = keys >= 10, head = post-overwrite keys < 5
    "q118_delta_log" ->
      """SELECT 'v0' AS tag, n_nationkey, n_name FROM nation
         WHERE n_nationkey < 10
         UNION ALL
         SELECT 'v2', n_nationkey, n_name FROM nation
         UNION ALL
         SELECT 'changes_0_2', n_nationkey, n_name FROM nation
         WHERE n_nationkey >= 10
         UNION ALL
         SELECT 'head', n_nationkey, n_name FROM nation
         WHERE n_nationkey < 5
         ORDER BY tag, n_nationkey""",
    // identical tokenize + slice algebra: starts 0,48,96,… while < n,
    // 64-token windows, short tails kept, empty docs one empty chunk
    "q119_chunking" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents),
         c AS (SELECT doc_id, toks, greatest(len(toks), 1) AS n FROM t),
         u AS (SELECT doc_id, toks,
                      unnest(range(0,
                        CAST(floor((n - 1) / 48.0) AS BIGINT) + 1)) AS i
               FROM c),
         s AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                      toks[(i*48 + 1):least(i*48 + 64, len(toks))] AS chunk
               FROM u)
         SELECT doc_id, chunk_idx,
                CAST(len(chunk) AS INT) AS n_tokens,
                array_to_string(chunk, ' ') AS chunk_text
         FROM s ORDER BY doc_id, chunk_idx""",
    // the A-ES draw replayed: u from the 52-bit char-poly hash of
    // "<id>|aes", priority round(u^(1/w), 9), top 20 per lang by
    // (priority DESC, doc_id ASC)
    "q120_weighted_sample" ->
      """WITH h AS (
           SELECT doc_id, lang, n_chars,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS f
           FROM (SELECT doc_id, lang, n_chars,
                   CAST(doc_id AS VARCHAR) || '|aes' AS s
                 FROM documents WHERE n_chars > 0)),
         p AS (SELECT doc_id, lang, n_chars,
                      round(pow((CAST(f AS DOUBLE) + 1.0)
                          / (CAST(1::BIGINT << 52 AS DOUBLE) + 2.0),
                        1.0 / n_chars), 9) AS pri
               FROM h),
         r AS (SELECT *, row_number() OVER (PARTITION BY lang
                 ORDER BY pri DESC, doc_id ASC) AS rk FROM p)
         SELECT doc_id, lang, n_chars FROM r WHERE rk <= 20
         ORDER BY lang, doc_id""",
    // SCD-2 intervals are per-key disjoint by construction (lead-bounded,
    // capped at +3 days), so the range predicate matches at most one
    // version per click; inclusive start, exclusive end — a click at the
    // exact instant of the next purchase belongs to the NEW version
    "q121_validity_join" ->
      """WITH pur AS (
           SELECT user_id, ts, max(event_id) AS version_id,
                  max_by(value, event_id) AS plan_value
           FROM events
           WHERE event_type = 'purchase'
             AND user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         dim AS (
           SELECT user_id, ts AS valid_from,
                  least(coalesce(lead(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts),
                                 ts + INTERVAL 3 DAY),
                        ts + INTERVAL 3 DAY) AS valid_to,
                  version_id, plan_value
           FROM pur)
         SELECT s.event_id, s.user_id, epoch_us(s.ts) AS ts_us,
                d.version_id AS v_version_id,
                d.plan_value AS v_plan_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') s
         LEFT JOIN dim d
           ON s.user_id = d.user_id
          AND s.ts >= d.valid_from AND s.ts < d.valid_to
         ORDER BY s.event_id""",
    // the OOF encoding replayed term for term: exact integer sums per
    // (category, fold) cell, category/fold/global totals summed from the
    // tiny cell frame, then the identical double dag — (S_c − S_cf +
    // m·prior)/(n_c − n_cf + m), prior excluding the row's whole fold
    "q122_target_encode" ->
      """WITH base AS (
           SELECT event_id, event_type,
                  CAST(((event_id % 5) + 5) % 5 AS INT) AS fold,
                  CASE WHEN value > 300 THEN 1 ELSE 0 END AS label
           FROM events),
         cf AS (
           SELECT event_type, fold,
                  CAST(sum(label) AS BIGINT) AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM base GROUP BY 1, 2),
         tot AS (
           SELECT event_type, fold, s, n,
                  CAST(sum(s) OVER (PARTITION BY event_type) AS BIGINT) AS sc,
                  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS nc,
                  CAST(sum(s) OVER (PARTITION BY fold) AS BIGINT) AS sf,
                  CAST(sum(n) OVER (PARTITION BY fold) AS BIGINT) AS nf,
                  CAST(sum(s) OVER () AS BIGINT) AS sg,
                  CAST(sum(n) OVER () AS BIGINT) AS ng
           FROM cf),
         enc AS (
           SELECT event_type, fold,
                  round((CAST(sc - s AS DOUBLE)
                         + 20.0 * (CAST(sg - sf AS DOUBLE)
                                   / CAST(ng - nf AS DOUBLE)))
                        / (CAST(nc - n AS DOUBLE) + 20.0), 9) + 0.0
                    AS target_enc
           FROM tot)
         SELECT b.event_id, b.event_type, b.fold, b.label, e.target_enc
         FROM base b
         LEFT JOIN enc e
           ON b.event_type IS NOT DISTINCT FROM e.event_type
          AND b.fold = e.fold
         ORDER BY b.event_id""",
    // the cross string (null → chr(2) sentinel — a leading chr(0) would
    // be absorbed by the h=0 polynomial seed; chr(1) separator) and the
    // 52-bit char polynomial replayed with list_reduce, then mod 64
    "q123_hashed_cross" ->
      """WITH base AS (
           SELECT event_id, event_type,
                  ((user_id % 100) + 100) % 100 AS uid_mod
           FROM events),
         h AS (
           SELECT event_id, event_type, uid_mod,
                  coalesce(CAST(event_type AS VARCHAR), chr(2))
                    || chr(1)
                    || coalesce(CAST(uid_mod AS VARCHAR), chr(2)) AS s
           FROM base)
         SELECT event_id, event_type, uid_mod,
                CAST(list_reduce(
                       [0::BIGINT] || list_transform(
                         range(1, length(s) + 1),
                         i -> unicode(s[i])::BIGINT),
                       (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                     % 64 AS INT) AS cross_bucket
         FROM h ORDER BY event_id""",
    // the Morton interleave replayed bit by bit (column 0 = high bit of
    // each pair), then the same top-6-bit tile grouping
    "q124_zorder_layout" ->
      """WITH b AS (
           SELECT CAST(least(greatest(
                    floor(CAST(value AS DOUBLE) / 2.5), 0), 255) AS BIGINT)
                    AS zx,
                  ((user_id % 256) + 256) % 256 AS zy
           FROM events),
         z AS (
           SELECT zx, zy,
                  (((zx >> 0) & 1) << 1) | (((zy >> 0) & 1) << 0) |
                  (((zx >> 1) & 1) << 3) | (((zy >> 1) & 1) << 2) |
                  (((zx >> 2) & 1) << 5) | (((zy >> 2) & 1) << 4) |
                  (((zx >> 3) & 1) << 7) | (((zy >> 3) & 1) << 6) |
                  (((zx >> 4) & 1) << 9) | (((zy >> 4) & 1) << 8) |
                  (((zx >> 5) & 1) << 11) | (((zy >> 5) & 1) << 10) |
                  (((zx >> 6) & 1) << 13) | (((zy >> 6) & 1) << 12) |
                  (((zx >> 7) & 1) << 15) | (((zy >> 7) & 1) << 14) AS zv
           FROM b)
         SELECT zv >> 10 AS tile, CAST(count(*) AS BIGINT) AS n,
                min(zx) AS min_x, max(zx) AS max_x,
                min(zy) AS min_y, max(zy) AS max_y
         FROM z GROUP BY 1 ORDER BY 1""",
    // the CMS replayed: ONE char polynomial per item (over
    // item || '|cms'), row r reading bit slice [8r, 8r+8) — the
    // bit-slicing that keeps rows independent (a suffixed row salt
    // would make the linear polynomial collide identically in every
    // row); counter grid as a GROUP BY, estimate = min over the item's
    // 3 cells; probe cells reuse the build cells via DISTINCT since
    // every probed item occurred
    "q126_cms_counts" ->
      """WITH ev AS (
           SELECT user_id FROM events WHERE user_id IS NOT NULL),
         hashed AS (
           SELECT user_id,
                  list_reduce(
                    [0::BIGINT] || list_transform(
                      range(1, length(s) + 1),
                      i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS h
           FROM (SELECT user_id,
                        CAST(user_id AS VARCHAR) || '|cms' AS s
                 FROM ev)),
         cells AS (
           SELECT user_id, r,
                  CAST((h >> (r * 8)) & 255 AS INT) AS cell
           FROM hashed, range(3) t(r)),
         sketch AS (
           SELECT r, cell, CAST(count(*) AS BIGINT) AS cnt
           FROM cells GROUP BY 1, 2),
         probe AS (SELECT DISTINCT user_id, r, cell FROM cells),
         est AS (
           SELECT p.user_id, min(s.cnt) AS cms_est
           FROM probe p JOIN sketch s ON p.r = s.r AND p.cell = s.cell
           GROUP BY 1),
         truth AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
           FROM ev GROUP BY 1)
         SELECT t.user_id, e.cms_est, t.true_count
         FROM truth t JOIN est e ON t.user_id = e.user_id
         ORDER BY t.user_id""",
    // the streaming interval join's batch equivalent: same keys, same
    // [t − 1h, t] range, inner semantics (null keys/times never match
    // on either engine)
    "q125_stream_interval_join" ->
      """WITH c AS (
           SELECT event_id AS click_id, user_id, ts FROM events
           WHERE event_type = 'click'),
         v AS (
           SELECT event_id AS view_id, user_id, ts FROM events
           WHERE event_type = 'view')
         SELECT c.click_id, c.user_id, epoch_us(c.ts) AS click_ts_us,
                v.view_id, epoch_us(v.ts) AS view_ts_us
         FROM c JOIN v
           ON c.user_id = v.user_id
          AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts
         ORDER BY click_id, view_id""",
    // the same integer fold-boundary math: lo + ceil(span·f/k) with
    // span = hi − lo + 1, then role = test | purged (±1 day) | train
    "q127_purged_folds" ->
      """WITH b AS (
           SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi
           FROM events),
         f AS (
           SELECT CAST(r AS INT) AS cv_fold,
                  lo + ((hi - lo + 1) * r + 4) // 5 AS s,
                  lo + ((hi - lo + 1) * (r + 1) + 4) // 5 AS e
           FROM b, range(5) t(r)),
         x AS (SELECT epoch_ms(ts) AS t FROM events),
         lab AS (
           SELECT f.cv_fold,
                  CASE WHEN t >= s AND t < e THEN 'test'
                       WHEN t >= s - 86400000 AND t < e + 86400000
                         THEN 'purged'
                       ELSE 'train' END AS cv_role,
                  t
           FROM x CROSS JOIN f)
         SELECT cv_fold, cv_role, CAST(count(*) AS BIGINT) AS n,
                min(t) AS t_min, max(t) AS t_max
         FROM lab GROUP BY 1, 2 ORDER BY 1, 2""",
    // exact integer joint/marginal counts, the identical double dag
    // (casts first — nxy·N would overflow integers at scale), ln = nats
    "q128_mutual_info" ->
      """WITH base AS (
           SELECT event_type AS x,
                  CASE WHEN value > 300 THEN 1 ELSE 0 END AS y
           FROM events WHERE event_type IS NOT NULL),
         j AS (SELECT x, y, CAST(count(*) AS BIGINT) AS nxy
               FROM base GROUP BY 1, 2),
         mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM j GROUP BY 1),
         my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM j GROUP BY 1),
         nn AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM j)
         SELECT round(sum((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
                  * ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE))
                       / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))), 6)
                  AS mi_nats,
                CAST(count(*) AS BIGINT) AS n_cells,
                max(n) AS n_rows
         FROM j
         JOIN mx USING (x) JOIN my USING (y) CROSS JOIN nn""",
    // the same left-to-right fold over the same bounded window list;
    // 0.3::DOUBLE forces the double dag (a DuckDB DECIMAL 0.3 would
    // round 1 − 0.3 to a DIFFERENT double than Spark's 1.0 − 0.3);
    // raw doubles — the fold is bit-exact on both engines, round()
    // half-boundary rules are not
    "q129_ewma" ->
      """SELECT event_id, user_id,
                list_reduce(l,
                  (a, x) -> 0.3::DOUBLE * x + (1 - 0.3::DOUBLE) * a)
                  AS ewma
         FROM (
           SELECT event_id, user_id,
                  list(CAST(value AS DOUBLE)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS l
           FROM events
           WHERE user_id IS NOT NULL AND value IS NOT NULL)
         ORDER BY event_id""",
    // FILTER aggregates per pivot value; counts are 0 (never null) on
    // both engines — Spark's pivot nulls are filled — while an absent
    // type's total stays NULL on both
    "q130_activity_pivot" ->
      """SELECT user_id,
                CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                  AS click_n,
                round(sum(value) FILTER (event_type = 'click'), 2)
                  AS click_total,
                CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                  AS view_n,
                round(sum(value) FILTER (event_type = 'view'), 2)
                  AS view_total,
                CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                  AS purchase_n,
                round(sum(value) FILTER (event_type = 'purchase'), 2)
                  AS purchase_total,
                CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
                  AS signup_n,
                round(sum(value) FILTER (event_type = 'signup'), 2)
                  AS signup_total,
                CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                  AS error_n,
                round(sum(value) FILTER (event_type = 'error'), 2)
                  AS error_total
         FROM events WHERE user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    // clamped equal-width cells over [0, 1), exact counts, rounded
    // divisions — the reliability table
    "q131_calibration" ->
      """WITH b AS (
           SELECT value / 640.0 AS score,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS label
           FROM events WHERE value IS NOT NULL)
         SELECT CAST(least(greatest(floor(score * 10), 0), 9) AS INT)
                  AS bin,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(score) / count(*), 6) AS mean_score,
                round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS pos_rate
         FROM b GROUP BY 1 ORDER BY 1""",
    // the Mann-Whitney closed form replayed: per-(day, score) counts,
    // window cumsums for doubled average ranks, integer dag to the
    // final division; degenerate days (no pos or no neg) excluded
    "q132_auc_by_day" ->
      """WITH b AS (
           SELECT epoch_ms(ts) // 86400000 AS day,
                  value / 640.0 AS score,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS label
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
         c AS (
           SELECT day, score, CAST(count(*) AS BIGINT) AS c,
                  CAST(sum(label) AS BIGINT) AS p
           FROM b GROUP BY 1, 2),
         r AS (
           SELECT day, score, c, p,
                  CAST(coalesce(sum(c) OVER (
                    PARTITION BY day ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS cb,
                  CAST(sum(p) OVER (PARTITION BY day) AS BIGINT) AS ptot,
                  CAST(sum(c) OVER (PARTITION BY day) AS BIGINT) AS ctot
           FROM c)
         SELECT day,
                round(CAST(sum(p * (2 * cb + c + 1))
                       - max(ptot) * (max(ptot) + 1) AS DOUBLE)
                      / CAST(2 * max(ptot) * max(ctot - ptot) AS DOUBLE), 6)
                  AS auc,
                max(ptot) AS n_pos,
                CAST(max(ctot - ptot) AS BIGINT) AS n_neg
         FROM r WHERE ptot > 0 AND ctot - ptot > 0
         GROUP BY 1 ORDER BY 1""",
    // per-key rank maps (doubled average ranks — integral), then plain
    // corr over the ranks; same listwise null drop, same key-equality
    // join semantics
    "q133_spearman" ->
      """WITH b AS (
           SELECT event_type, CAST(value AS DOUBLE) AS x,
                  CAST(epoch_ms(ts) AS DOUBLE) AS y
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         cx AS (SELECT event_type, x, CAST(count(*) AS BIGINT) AS n
                FROM b GROUP BY 1, 2),
         rx AS (
           SELECT event_type, x,
                  2 * CAST(coalesce(sum(n) OVER (
                        PARTITION BY event_type ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) + n + 1 AS r2x
           FROM cx),
         cy AS (SELECT event_type, y, CAST(count(*) AS BIGINT) AS n
                FROM b GROUP BY 1, 2),
         ry AS (
           SELECT event_type, y,
                  2 * CAST(coalesce(sum(n) OVER (
                        PARTITION BY event_type ORDER BY y
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) + n + 1 AS r2y
           FROM cy)
         SELECT b.event_type,
                round(corr(CAST(r2x AS DOUBLE), CAST(r2y AS DOUBLE)), 6)
                  AS spearman,
                CAST(count(*) AS BIGINT) AS n
         FROM b
         JOIN rx USING (event_type, x)
         JOIN ry USING (event_type, y)
         GROUP BY 1 ORDER BY 1""",
    // staged minima with the same ≥-ordering constraint; an entity
    // absent from stage k is null there and in every later stage
    "q134_funnel" ->
      """WITH s1 AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view'
             AND user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         s2 AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts >= s1.t1
           GROUP BY 1),
         s3 AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
           GROUP BY 1)
         SELECT s1.user_id, epoch_us(t1) AS t1_us,
                epoch_us(t2) AS t2_us, epoch_us(t3) AS t3_us
         FROM s1
         LEFT JOIN s2 USING (user_id)
         LEFT JOIN s3 USING (user_id)
         ORDER BY user_id""",
    // integer age arithmetic against the same fixed now (2024-02-15Z)
    "q135_freshness" ->
      """SELECT event_type,
                max(epoch_ms(ts)) AS latest_ms,
                CAST(count(*) AS BIGINT) AS n,
                1707955200000 - max(epoch_ms(ts)) AS age_ms,
                (1707955200000 - max(epoch_ms(ts))) > 864000000
                  AS sla_violated
         FROM events WHERE ts IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    // the salting-decision scalars from the per-key count frame
    "q136_key_skew" ->
      """WITH c AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1)
         SELECT CAST(sum(c) AS BIGINT) AS total_rows,
                CAST(count(*) AS BIGINT) AS n_keys,
                max(c) AS max_key_rows,
                round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
                  AS hot_share,
                round(CAST(max(c) AS DOUBLE)
                      / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)),
                  6) AS imbalance
         FROM c""",
    // both top-10 sets replayed (same cosine, same vec_id tie-break,
    // truncated = first 16 dims), recall = overlap / 10
    "q137_matryoshka_recall" ->
      """WITH q AS (
           SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 20),
         fullp AS (
           SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY
                    list_cosine_similarity(
                      CAST(embedding AS DOUBLE[]), qe) DESC,
                    vec_id ASC) AS rnk
           FROM embeddings, q WHERE vec_id <> qid),
         truncp AS (
           SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY
                    list_cosine_similarity(
                      CAST(embedding[1:16] AS DOUBLE[]),
                      qe[1:16]) DESC,
                    vec_id ASC) AS rnk
           FROM embeddings, q WHERE vec_id <> qid),
         f AS (SELECT qid, vec_id FROM fullp WHERE rnk <= 10),
         t AS (SELECT qid, vec_id FROM truncp WHERE rnk <= 10)
         SELECT f.qid,
                round(CAST(count(t.vec_id) AS DOUBLE) / 10, 6) AS recall
         FROM f LEFT JOIN t ON f.qid = t.qid AND f.vec_id = t.vec_id
         GROUP BY 1 ORDER BY 1""",
    // the card replayed from the same primitives: BPE-ish token regex
    // (q93's), char-poly fingerprints (q22's), exact integer counts,
    // single-division ratios rounded at 6
    "q138_dataset_card" ->
      """WITH d AS (
           SELECT lang, n_chars,
                  len(regexp_extract_all(text,
                    '''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))::BIGINT
                    AS toks,
                  list_reduce(
                    [0::BIGINT] || list_transform(
                      range(1, length(text) + 1),
                      i -> unicode(text[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) AS fp
           FROM documents),
         p AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(toks) AS BIGINT) AS total_tokens,
                  CAST(count(DISTINCT fp) AS BIGINT) AS dfp,
                  round(avg(n_chars), 4) AS mean_chars
           FROM d GROUP BY 1),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS corpus_docs FROM p)
         SELECT lang, n_docs,
                round(CAST(n_docs AS DOUBLE) / CAST(corpus_docs AS DOUBLE),
                  6) AS corpus_share,
                total_tokens,
                round(1 - CAST(dfp AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
                  AS dup_rate,
                mean_chars
         FROM p CROSS JOIN t ORDER BY lang""",
    // the seen-bin cumsum grid (as q104) + span weighting: the CDF gap
    // is constant across absent bins, so each seen bin's term carries
    // its span to the next seen bin; × bin width = value units
    "q139_wasserstein_drift" ->
      """WITH e AS (
           SELECT event_type,
                  epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-10 00:00:00')
                    AS is_ref,
                  least(greatest(CAST(floor(value / 1.25) AS INT), 0), 19)
                    AS bin
           FROM events),
         c AS (
           SELECT event_type, bin,
                  CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                    AS ref_n,
                  CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                    AS det_n
           FROM e GROUP BY 1, 2),
         m AS (
           SELECT event_type, bin,
                  sum(ref_n) OVER (PARTITION BY event_type
                                   ORDER BY bin) AS cr,
                  sum(det_n) OVER (PARTITION BY event_type
                                   ORDER BY bin) AS cd,
                  sum(ref_n) OVER (PARTITION BY event_type) AS rt,
                  sum(det_n) OVER (PARTITION BY event_type) AS dt,
                  coalesce(lead(bin) OVER (PARTITION BY event_type
                                           ORDER BY bin),
                           bin + 1) - bin AS span
           FROM c)
         SELECT event_type,
                round(sum(abs(cr / rt - cd / dt) * span) * 1.25, 6) AS w1,
                CAST(max(rt) AS BIGINT) AS ref_total,
                CAST(max(dt) AS BIGINT) AS det_total
         FROM m GROUP BY 1 ORDER BY 1""",
    // the q131 bin table (same rounding) folded to the bin-weighted
    // |score − rate| mean
    "q140_ece" ->
      """WITH b AS (
           SELECT value / 640.0 AS score,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS label
           FROM events WHERE value IS NOT NULL),
         cb AS (
           SELECT CAST(least(greatest(floor(score * 10), 0), 9) AS INT)
                    AS bin,
                  CAST(count(*) AS BIGINT) AS n,
                  round(sum(score) / count(*), 6) AS mean_score,
                  round(CAST(sum(label) AS DOUBLE) / count(*), 6)
                    AS pos_rate
           FROM b GROUP BY 1)
         SELECT round(sum(CAST(n AS DOUBLE)
                          * abs(mean_score - pos_rate))
                      / sum(CAST(n AS DOUBLE)), 6) AS ece,
                CAST(sum(n) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_bins
         FROM cb""",
    // confusion cells → observed rate and marginal-product chance rate,
    // the same double dag (casts first)
    "q141_cohen_kappa" ->
      """WITH r AS (
           SELECT CASE WHEN value > 300 THEN 'hi' ELSE 'lo' END AS a,
                  CASE WHEN value > 250 THEN 'hi' ELSE 'lo' END AS b
           FROM events WHERE value IS NOT NULL),
         cells AS (
           SELECT a, b, CAST(count(*) AS BIGINT) AS n
           FROM r GROUP BY 1, 2),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cells),
         ma AS (SELECT a, CAST(sum(n) AS BIGINT) AS na
                FROM cells GROUP BY 1),
         mb AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb
                FROM cells GROUP BY 1),
         pe AS (
           SELECT sum((CAST(na AS DOUBLE) / CAST(tot AS DOUBLE))
                      * (CAST(nb AS DOUBLE) / CAST(tot AS DOUBLE)))
             AS p_e
           FROM ma JOIN mb ON ma.a = mb.b CROSS JOIN t),
         po AS (
           SELECT CAST(coalesce(sum(CASE WHEN a = b THEN n END), 0)
                       AS DOUBLE) / CAST(max(tot) AS DOUBLE) AS p_o,
                  CAST(max(tot) AS BIGINT) AS n
           FROM cells CROSS JOIN t)
         SELECT CASE WHEN p_e < 1
                     THEN round((p_o - p_e) / (1 - p_e), 6) END AS kappa,
                round(p_o, 6) AS p_observed,
                round(p_e, 6) AS p_expected,
                n
         FROM po CROSS JOIN pe""",
    // per-user bitmasks via sum(DISTINCT 2^i), mask counts, pairwise
    // folds — the same bit algebra, k(k−1)/2 output rows
    "q142_audience_overlap" ->
      """WITH m AS (
           SELECT user_id,
                  CAST(sum(DISTINCT CASE event_type
                        WHEN 'click' THEN 1 WHEN 'view' THEN 2
                        WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                        WHEN 'error' THEN 16 END) AS BIGINT) AS mask
           FROM events
           WHERE user_id IS NOT NULL AND event_type IN
                 ('click', 'view', 'purchase', 'signup', 'error')
           GROUP BY 1),
         c AS (SELECT mask, CAST(count(*) AS BIGINT) AS n
               FROM m GROUP BY 1),
         p(type_a, ba, type_b, bb) AS (VALUES
           ('click', 1, 'view', 2), ('click', 1, 'purchase', 4),
           ('click', 1, 'signup', 8), ('click', 1, 'error', 16),
           ('view', 2, 'purchase', 4), ('view', 2, 'signup', 8),
           ('view', 2, 'error', 16), ('purchase', 4, 'signup', 8),
           ('purchase', 4, 'error', 16), ('signup', 8, 'error', 16)),
         agg AS (
           SELECT type_a, type_b,
                  CAST(sum(CASE WHEN (mask & ba) > 0 THEN n ELSE 0 END)
                    AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN (mask & bb) > 0 THEN n ELSE 0 END)
                    AS BIGINT) AS n_b,
                  CAST(sum(CASE WHEN (mask & ba) > 0 AND (mask & bb) > 0
                           THEN n ELSE 0 END) AS BIGINT) AS n_both
           FROM c CROSS JOIN p GROUP BY 1, 2)
         SELECT type_a, type_b, n_a, n_b, n_both,
                CASE WHEN n_a + n_b - n_both > 0
                     THEN round(CAST(n_both AS DOUBLE)
                                / CAST(n_a + n_b - n_both AS DOUBLE), 6)
                END AS jaccard
         FROM agg ORDER BY type_a, type_b""",
    // the whole byte stack in SQL: q114's avro arithmetic for the key
    // (union branch + length varint + utf8) and value (per-field union
    // branch + zigzag/IEEE widths), then the v2 record framing — attrs
    // 1 + tsDelta 1 + offsetDelta 1 + length varints + headersCount 1,
    // the record's own length varint, and the 61-byte batch header.
    // W(n) = zigzag varint width of a non-negative n (1 below 64, 2
    // below 8192 — body lengths here straddle the 64 boundary, so both
    // branches are exercised)
    "q143_kafka_wire" ->
      """WITH e AS (
           SELECT event_id, user_id, value,
                  CASE WHEN event_type = 'click' THEN NULL
                       ELSE event_type END AS etype
           FROM events),
         z AS (
           SELECT *,
             CASE WHEN event_id >= 0 THEN 2 * event_id
                  ELSE -2 * event_id - 1 END AS z1,
             CASE WHEN user_id >= 0 THEN 2 * user_id
                  ELSE -2 * user_id - 1 END AS z2,
             strlen(CAST(event_id AS VARCHAR)) AS klen,
             CASE WHEN etype IS NULL THEN NULL
                  ELSE strlen(etype) END AS slen
           FROM e),
         widths AS (
           SELECT event_id,
             1 + CASE WHEN 2 * klen < 128 THEN 1 ELSE 2 END + klen
               AS key_bytes,
             1 + CASE WHEN z1 < 128 THEN 1 WHEN z1 < 16384 THEN 2
                      WHEN z1 < 2097152 THEN 3 WHEN z1 < 268435456 THEN 4
                      WHEN z1 < 34359738368 THEN 5
                      WHEN z1 < 4398046511104 THEN 6
                      WHEN z1 < 562949953421312 THEN 7
                      WHEN z1 < 72057594037927936 THEN 8 ELSE 9 END
             + 1 + CASE WHEN z2 < 128 THEN 1 WHEN z2 < 16384 THEN 2
                      WHEN z2 < 2097152 THEN 3 WHEN z2 < 268435456 THEN 4
                      WHEN z2 < 34359738368 THEN 5
                      WHEN z2 < 4398046511104 THEN 6
                      WHEN z2 < 562949953421312 THEN 7
                      WHEN z2 < 72057594037927936 THEN 8 ELSE 9 END
             + CASE WHEN value IS NULL THEN 1 ELSE 9 END
             + CASE WHEN slen IS NULL THEN 1
                    WHEN 2 * slen < 128 THEN 2 + slen
                    ELSE 3 + slen END AS value_bytes
           FROM z),
         body AS (
           SELECT event_id,
             4 + CASE WHEN 2 * key_bytes < 128 THEN 1 ELSE 2 END
               + key_bytes
               + CASE WHEN 2 * value_bytes < 128 THEN 1 ELSE 2 END
               + value_bytes AS body_bytes
           FROM widths)
         SELECT event_id,
           CAST(61 + CASE WHEN 2 * body_bytes < 128 THEN 1 ELSE 2 END
                + body_bytes AS BIGINT) AS batch_len
         FROM body ORDER BY event_id""",
    // exact rank replayed as a better-than count with the same (score,
    // id) tie-break; float32 perturbation replayed exactly (q46's CAST
    // pattern), scores in double like list_cosine_similarity
    "q144_retrieval_eval" ->
      """WITH dup AS (
           SELECT vec_id + 100000 AS vec_id,
                  CAST([CAST(embedding[1] + 0.25 AS FLOAT)] || embedding[2:]
                       AS FLOAT[]) AS embedding
           FROM embeddings WHERE vec_id < 30),
         corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT * FROM dup),
         q AS (SELECT vec_id AS qid, embedding AS qe,
                      vec_id + 100000 AS rel_id
               FROM embeddings WHERE vec_id < 30),
         rel AS (SELECT q.qid, q.rel_id,
                        list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                               CAST(q.qe AS DOUBLE[]))
                          AS rel_score
                 FROM corpus c JOIN q ON c.vec_id = q.rel_id),
         scored AS (
           SELECT q.qid, c.vec_id, r.rel_score, r.rel_id,
                  list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                         CAST(q.qe AS DOUBLE[])) AS s
           FROM corpus c CROSS JOIN q
           JOIN rel r ON r.qid = q.qid
           WHERE c.vec_id <> q.qid),
         ranked AS (
           SELECT qid,
                  CAST(1 + sum(CASE WHEN s > rel_score
                                    OR (s = rel_score AND vec_id < rel_id)
                               THEN 1 ELSE 0 END) AS BIGINT) AS "rank"
           FROM scored GROUP BY qid)
         SELECT qid, "rank",
                round(1.0::DOUBLE / "rank", 6) AS reciprocal_rank,
                "rank" <= 10 AS hit_at_k,
                round(CASE WHEN "rank" <= 10
                           THEN ln(2.0::DOUBLE) / ln("rank" + 1.0::DOUBLE)
                           ELSE 0.0::DOUBLE END, 6) AS ndcg_at_k
         FROM ranked ORDER BY qid""",
    // directed containment over the q24-style shingle sets; DuckDB does
    // the all-pairs list_intersect (120 docs), Spark only joins pairs
    // sharing a shingle — pairs at ≥ 0.9 necessarily share shingles,
    // so the filtered outputs agree exactly
    "q145_containment" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 80
           UNION ALL
           SELECT doc_id + 20000, 'zq0 zq1 zq2 ' || text
           FROM documents WHERE doc_id < 40),
         sh AS (
           SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, greatest(len(tk), 2)),
                    i -> array_to_string(tk[i:least(i+1, len(tk))], ' ')))
                    AS shingles
           FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0) AS tk
                 FROM corpus)),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.shingles, b.shingles))::DOUBLE
                    / len(a.shingles) AS c
           FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
         SELECT id_a, id_b, round(c, 4) AS containment
         FROM pairs WHERE c >= 0.9 ORDER BY id_a, id_b""",
    // Okapi BM25 replayed term for term: Lucene idf
    // ln(1 + (N−df+0.5)/(df+0.5)), tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    // at k1=1.2, b=0.75 — every constant forced ::DOUBLE (DuckDB decimal
    // literals), association parenthesized to match the Spark dag
    "q146_bm25" ->
      """WITH d AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents),
         stats AS (SELECT count(*) AS nd, sum(len(toks)) AS tl FROM d),
         q(qid, qtext) AS (VALUES (1, 'spark window join'),
                                  (2, 'customer vector query'),
                                  (3, 'hash merge stream table')),
         qterms AS (
           SELECT qid, unnest(list_distinct(list_filter(
             string_split_regex(lower(qtext), '\s+'),
             x -> len(x) > 0))) AS term
           FROM q),
         termset AS (SELECT DISTINCT term FROM qterms),
         tk AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
         dtf AS (
           SELECT tk.doc_id, tk.term, tk.dl, count(*) AS tf
           FROM tk JOIN termset USING (term)
           GROUP BY tk.doc_id, tk.term, tk.dl),
         dfq AS (SELECT term, count(*) AS dfc FROM dtf GROUP BY term),
         w AS (
           SELECT doc_id, dtf.term,
                  ln(1.0::DOUBLE + ((nd - dfc)::DOUBLE + 0.5::DOUBLE)
                                   / (dfc::DOUBLE + 0.5::DOUBLE))
                  * ((tf::DOUBLE * (1.0::DOUBLE + 1.2::DOUBLE))
                     / (tf::DOUBLE + 1.2::DOUBLE
                        * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE
                           * dl::DOUBLE / (tl::DOUBLE / nd::DOUBLE)))) AS wt
           FROM dtf JOIN dfq ON dtf.term = dfq.term CROSS JOIN stats)
         SELECT CAST(qt.qid AS BIGINT) AS qid, w.doc_id,
                round(sum(wt), 4) AS bm25
         FROM w JOIN qterms qt ON w.term = qt.term
         GROUP BY qt.qid, w.doc_id
         ORDER BY qid, bm25 DESC, doc_id""",
    // hybrid fusion: the q146 BM25 dag top-10 + the q26 cosine-kNN dag
    // top-10, RRF-combined at c=60; fused score rounded BEFORE the
    // re-rank on both engines so the tie-break replays
    "q147_hybrid_rrf" ->
      """WITH d AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents),
         stats AS (SELECT count(*) AS nd, sum(len(toks)) AS tl FROM d),
         q(qid, qtext) AS (VALUES (1, 'spark window join'),
                                  (2, 'customer vector query'),
                                  (3, 'hash merge stream table')),
         qterms AS (
           SELECT qid, unnest(list_distinct(list_filter(
             string_split_regex(lower(qtext), '\s+'),
             x -> len(x) > 0))) AS term
           FROM q),
         termset AS (SELECT DISTINCT term FROM qterms),
         tk AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
         dtf AS (
           SELECT tk.doc_id, tk.term, tk.dl, count(*) AS tf
           FROM tk JOIN termset USING (term)
           GROUP BY tk.doc_id, tk.term, tk.dl),
         dfq AS (SELECT term, count(*) AS dfc FROM dtf GROUP BY term),
         w AS (
           SELECT doc_id, dtf.term,
                  ln(1.0::DOUBLE + ((nd - dfc)::DOUBLE + 0.5::DOUBLE)
                                   / (dfc::DOUBLE + 0.5::DOUBLE))
                  * ((tf::DOUBLE * (1.0::DOUBLE + 1.2::DOUBLE))
                     / (tf::DOUBLE + 1.2::DOUBLE
                        * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE
                           * dl::DOUBLE / (tl::DOUBLE / nd::DOUBLE)))) AS wt
           FROM dtf JOIN dfq ON dtf.term = dfq.term CROSS JOIN stats),
         bm AS (
           SELECT CAST(qt.qid AS BIGINT) AS qid, w.doc_id AS id,
                  round(sum(wt), 4) AS bm25
           FROM w JOIN qterms qt ON w.term = qt.term
           GROUP BY qt.qid, w.doc_id),
         bmtop AS (
           SELECT qid, id, rnk FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY bm25 DESC, id ASC) AS rnk FROM bm)
           WHERE rnk <= 10),
         vq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id IN (1, 2, 3)),
         pairs AS (SELECT qid, vec_id AS id,
                          list_cosine_similarity(
                            CAST(embedding AS DOUBLE[]), qe) AS sim
                   FROM embeddings, vq WHERE vec_id <> qid),
         knntop AS (
           SELECT qid, id, rnk FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, id ASC) AS rnk FROM pairs)
           WHERE rnk <= 10),
         un AS (SELECT * FROM bmtop UNION ALL SELECT * FROM knntop),
         fused AS (
           SELECT qid, id,
                  round(sum(1.0::DOUBLE / (60.0::DOUBLE + rnk)), 6)
                    AS rrf_score,
                  CAST(count(*) AS BIGINT) AS n_lists
           FROM un GROUP BY qid, id),
         fr AS (
           SELECT qid, id, rrf_score, n_lists,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY rrf_score DESC, id ASC) AS fused_rank
           FROM fused)
         SELECT qid, id, rrf_score, n_lists,
                CAST(fused_rank AS INTEGER) AS fused_rank
         FROM fr WHERE fused_rank <= 5 ORDER BY qid, fused_rank""",
    // q45's recall-floor pattern: seeded PQ train → deterministic
    // codebooks → deterministic shortlist-100+refine recall vs the
    // exact L2 top-10; floor measured ≥ 0.6 at sf0.01 and sf0.1
    "q148_pq_adc" ->
      """SELECT vec_id AS qid, true AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY qid""",
    // split-conformal position ⌈(n+1)(1−α)⌉ as the identical integer
    // multiply-compare (cum·den ≥ (n+1)·(den−num)) — never a float
    // quantile
    "q149_conformal" ->
      """WITH c AS (
           SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v,
                  count(*) AS cnt
           FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
         t AS (
           SELECT l_returnflag, v,
                  sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(cnt) OVER (PARTITION BY l_returnflag) AS n
           FROM c)
         SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_cal,
                min(CASE WHEN cum * 10 >= (n + 1) * 9 THEN v END)
                  AS threshold
         FROM t GROUP BY l_returnflag ORDER BY l_returnflag""",
    // q45/q148's recall-floor pattern: seeded IVF + residual-PQ train →
    // deterministic probed-cell shortlist + exact refine; the IVF probe
    // bound dominates on the near-uniform corpus (recall ≈ probe
    // fraction 6/8), floor 0.5 measured at sf0.01 and sf0.1
    "q150_ivfpq" ->
      """SELECT vec_id AS qid, true AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY qid""",
    // nominal-alpha coincidence algebra replayed: per-(unit, value)
    // counts, keyed-window m_u, D_o as the c·(m−c)/(m−1) fold, D_e from
    // the value marginals — exact integers until the two divisions
    "q151_krippendorff" ->
      """WITH r AS (
           SELECT event_id AS u,
                  CASE WHEN value > 300 THEN 'hi' ELSE 'lo' END AS v
           FROM events WHERE value IS NOT NULL
           UNION ALL
           SELECT event_id,
                  CASE WHEN value > 250 THEN 'hi' ELSE 'lo' END
           FROM events WHERE value IS NOT NULL
           UNION ALL
           SELECT event_id,
                  CASE WHEN value > 280 THEN 'hi' ELSE 'lo' END
           FROM events WHERE value IS NOT NULL AND event_id % 3 = 0),
         uv AS (SELECT u, v, count(*) AS c FROM r GROUP BY 1, 2),
         q AS (SELECT * FROM (
                 SELECT u, v, c, sum(c) OVER (PARTITION BY u) AS m
                 FROM uv)
               WHERE m >= 2),
         s AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_units,
                      CAST(sum(c) AS BIGINT) AS n_ratings,
                      sum((c * (m - c))::DOUBLE / (m - 1)::DOUBLE) AS dobs
               FROM q),
         nc AS (SELECT v, sum(c) AS nv FROM q GROUP BY v),
         e AS (SELECT sum(nv * nv) AS sq FROM nc)
         SELECT n_units, n_ratings, round(dobs, 6) AS d_o,
                round((n_ratings * n_ratings - sq)::DOUBLE
                      / (n_ratings - 1)::DOUBLE, 6) AS d_e,
                round(1.0::DOUBLE - dobs /
                      ((n_ratings * n_ratings - sq)::DOUBLE
                       / (n_ratings - 1)::DOUBLE), 6) AS alpha
         FROM s, e""",
    // bin(v) = min(⌊rank_below(v)·nBins/n⌋, nBins−1) replayed with the
    // identical integer floor — ties share a bin by construction
    "q152_quantile_bin" ->
      """WITH c AS (
           SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
                  count(*) AS cnt
           FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
         t AS (
           SELECT l_returnflag, v, cnt,
                  sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(cnt) OVER (PARTITION BY l_returnflag) AS n
           FROM c),
         b AS (
           SELECT l_returnflag, v, cnt,
                  CAST(least(((cum - cnt) * 8) // n, 7) AS INTEGER) AS bin
           FROM t)
         SELECT l_returnflag, bin, CAST(sum(cnt) AS BIGINT) AS n_rows,
                min(v) AS v_min, max(v) AS v_max
         FROM b GROUP BY l_returnflag, bin
         ORDER BY l_returnflag, bin""",
    // q26's kNN dag with the self and labeled-positive rows excluded
    "q153_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid,
                           CAST(embedding AS DOUBLE[]) AS qe,
                           vec_id + 1 AS rel_id
                    FROM embeddings WHERE vec_id < 5),
         pairs AS (SELECT qid, vec_id,
                          list_cosine_similarity(
                            CAST(embedding AS DOUBLE[]), qe) AS sim
                   FROM embeddings, q
                   WHERE vec_id <> qid AND vec_id <> rel_id),
         ranked AS (SELECT qid, vec_id, sim,
                           row_number() OVER (PARTITION BY qid
                             ORDER BY sim DESC, vec_id ASC) AS rnk
                    FROM pairs)
         SELECT qid, vec_id AS negative_id, round(sim, 4) AS score,
                CAST(rnk AS INTEGER) AS "rank"
         FROM ranked WHERE rnk <= 10 ORDER BY qid, "rank"""",
    // the produce→fetch byte stack (avro encode → v2 batch framing →
    // CRC-verified parse → avro decode) is lossless, so the oracle is
    // the plain projection (q114/q115 pattern); the byte widths are
    // oracled in q143 and the framing golden bytes in KafkaWireSpec
    "q154_kafka_consume" ->
      """SELECT event_id, user_id, value,
                CASE WHEN event_type = 'click' THEN NULL
                     ELSE event_type END AS etype
         FROM events ORDER BY event_id""",
    // literal lead() replay of the per-user sequence pairing; row
    // totals re-derived from the transition matrix, like the operator
    "q155_transitions" ->
      """WITH p AS (
           SELECT event_type AS from_state,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS to_state
           FROM events),
         c AS (SELECT from_state, to_state,
                      CAST(count(*) AS BIGINT) AS n_transitions
               FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_state, sum(n_transitions) AS row_n
               FROM c GROUP BY 1)
         SELECT c.from_state, c.to_state, c.n_transitions,
                round(c.n_transitions::DOUBLE / t.row_n::DOUBLE, 6)
                  AS p_transition
         FROM c JOIN t ON c.from_state = t.from_state
         ORDER BY c.from_state, c.to_state""",
    // the 3-iteration damped recurrence unrolled: weighted edges →
    // out-weight shares → three join+sum rounds from r0 = 1
    "q156_pagerank" ->
      """WITH e AS (
           SELECT l_suppkey % 50 AS s, l_partkey % 50 AS d,
                  CAST(count(*) AS DOUBLE) AS w
           FROM lineitem GROUP BY 1, 2),
         sh AS (SELECT e.s, e.d, e.w / ow.ow AS share
                FROM e JOIN (SELECT s, sum(w) AS ow FROM e GROUP BY 1) ow
                  ON e.s = ow.s),
         n AS (SELECT DISTINCT x AS node FROM
                 (SELECT s AS x FROM sh UNION SELECT d FROM sh)),
         r0 AS (SELECT node, 1.0::DOUBLE AS rank FROM n),
         r1 AS (SELECT n.node,
                       (1.0::DOUBLE - 0.85::DOUBLE)
                         + 0.85::DOUBLE * coalesce(c.sc, 0.0::DOUBLE)
                         AS rank
                FROM n LEFT JOIN (
                  SELECT sh.d AS node, sum(r0.rank * sh.share) AS sc
                  FROM sh JOIN r0 ON sh.s = r0.node GROUP BY 1) c
                  ON n.node = c.node),
         r2 AS (SELECT n.node,
                       (1.0::DOUBLE - 0.85::DOUBLE)
                         + 0.85::DOUBLE * coalesce(c.sc, 0.0::DOUBLE)
                         AS rank
                FROM n LEFT JOIN (
                  SELECT sh.d AS node, sum(r1.rank * sh.share) AS sc
                  FROM sh JOIN r1 ON sh.s = r1.node GROUP BY 1) c
                  ON n.node = c.node),
         r3 AS (SELECT n.node,
                       (1.0::DOUBLE - 0.85::DOUBLE)
                         + 0.85::DOUBLE * coalesce(c.sc, 0.0::DOUBLE)
                         AS rank
                FROM n LEFT JOIN (
                  SELECT sh.d AS node, sum(r2.rank * sh.share) AS sc
                  FROM sh JOIN r2 ON sh.s = r2.node GROUP BY 1) c
                  ON n.node = c.node)
         SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node""",
    // I(X;Y) = Σ (c/n)·ln(c·n/(cx·cy)) per feature, marginals from the
    // joint count frame; nulls sentineled with chr(1) like the operator
    "q157_mutual_info" ->
      """WITH s AS (
           SELECT coalesce(event_type, chr(1)) AS x,
                  coalesce(CAST(value > 300 AS VARCHAR), chr(1)) AS y,
                  coalesce(CAST(user_id % 10 AS VARCHAR), chr(1)) AS xb
           FROM events WHERE value IS NOT NULL),
         je AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
                FROM s GROUP BY 1, 2),
         jb AS (SELECT xb, y, CAST(count(*) AS BIGINT) AS c
                FROM s GROUP BY 1, 2),
         mie AS (
           SELECT CAST(sum(c) AS BIGINT) AS n,
                  round(sum(c::DOUBLE / nn.n::DOUBLE *
                    ln((c * nn.n)::DOUBLE / (px.cx * py.cy)::DOUBLE)), 6)
                    AS mi
           FROM je,
                (SELECT x, sum(c) AS cx FROM je GROUP BY 1) px,
                (SELECT y, sum(c) AS cy FROM je GROUP BY 1) py,
                (SELECT sum(c) AS n FROM je) nn
           WHERE je.x = px.x AND je.y = py.y),
         mib AS (
           SELECT CAST(sum(c) AS BIGINT) AS n,
                  round(sum(c::DOUBLE / nn.n::DOUBLE *
                    ln((c * nn.n)::DOUBLE / (px.cx * py.cy)::DOUBLE)), 6)
                    AS mi
           FROM jb,
                (SELECT xb, sum(c) AS cx FROM jb GROUP BY 1) px,
                (SELECT y, sum(c) AS cy FROM jb GROUP BY 1) py,
                (SELECT sum(c) AS n FROM jb) nn
           WHERE jb.xb = px.xb AND jb.y = py.y)
         SELECT 'event_type' AS feature, n, mi FROM mie
         UNION ALL
         SELECT 'user_bucket', n, mi FROM mib
         ORDER BY feature""",
    // nfc_normalize is DuckDB's NFC — compose, casefold, collapse
    // whitespace, trim, exactly the canonicalText pipeline (the
    // appended decomposed accent proves real composition)
    "q158_normalize_text" ->
      """SELECT doc_id,
                trim(regexp_replace(lower(nfc_normalize(
                  substr(text, 1, 40) || ' Cafe' || chr(769) || '  x')),
                  '\s+', ' ', 'g')) AS canon,
                CAST(length(trim(regexp_replace(lower(nfc_normalize(
                  substr(text, 1, 40) || ' Cafe' || chr(769) || '  x')),
                  '\s+', ' ', 'g'))) AS INT) AS n_canon
         FROM documents ORDER BY doc_id""",
    // the minimax isotonic characterization replayed verbatim:
    // interval means from prefix sums, per-(key, j) suffix min,
    // max over j ≤ i — every mean an exact-integer ratio
    "q159_isotonic" ->
      """WITH cf AS (
           SELECT l_returnflag AS k, CAST(l_quantity AS DOUBLE) AS x,
                  CAST(sum(CASE WHEN l_discount > 0.05::DOUBLE
                                THEN 1 ELSE 0 END) AS DOUBLE) AS sy,
                  CAST(count(*) AS BIGINT) AS c
           FROM lineitem
           WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
         pos AS (
           SELECT k, x, sy, c,
                  row_number() OVER w AS i,
                  sum(sy) OVER w AS s,
                  sum(c) OVER w AS nn
           FROM cf
           WINDOW w AS (PARTITION BY k ORDER BY x
                        ROWS UNBOUNDED PRECEDING)),
         pairs AS (
           SELECT j.k, j.i AS ji, pk.i AS ki,
                  (pk.s - (j.s - j.sy)) /
                    CAST(pk.nn - (j.nn - j.c) AS DOUBLE) AS a
           FROM pos j JOIN pos pk ON j.k = pk.k AND j.i <= pk.i),
         m AS (
           SELECT k, ji, ki,
                  min(a) OVER (PARTITION BY k, ji ORDER BY ki DESC
                               ROWS UNBOUNDED PRECEDING) AS msuf
           FROM pairs),
         g AS (SELECT k, ki AS i, max(msuf) AS fitted
               FROM m GROUP BY 1, 2)
         SELECT pos.k AS l_returnflag, pos.x AS score,
                CAST(pos.c AS BIGINT) AS n, round(g.fitted, 6) AS fitted
         FROM pos JOIN g ON pos.k = g.k AND pos.i = g.i
         ORDER BY l_returnflag, score""",
    // q25's char-poly hash replay, bucketed mod 64, tf per (doc, bucket)
    "q160_feature_hash" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> len(x) > 0)) AS tok
           FROM documents),
         b AS (
           SELECT doc_id,
                  list_reduce(
                    [0::BIGINT] || list_transform(
                      range(1, length(tok) + 1), i -> unicode(tok[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1)) % 64
                    AS bucket
           FROM toks)
         SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
         FROM b GROUP BY 1, 2 ORDER BY doc_id, bucket""",
    // q97's planted-pixel aHash replay, then ALL pairs at Hamming ≤ 3 —
    // the banded candidate path must lose nothing vs this exhaustive
    // pairing (per-32-bit-half bit_count keeps every term sign-safe)
    "q161_ahash_neardup" ->
      """WITH ids AS (SELECT doc_id, doc_id % 37 AS img FROM documents
                      WHERE doc_id < 222),
         cell AS (
           SELECT doc_id, img, t.i AS i,
                  ((t.i % 8) * (4 + img % 5)) // 8 AS sx,
                  ((t.i // 8) * (4 + img % 3)) // 8 AS sy
           FROM ids, unnest(range(0, 64)) AS t(i)),
         g AS (
           SELECT doc_id, i,
                  (CAST((img + 7*sx + 13*sy) % 256 AS BIGINT)
                   + (3*img + 5*sx + 11*sy) % 256
                   + (5*img + 3*sx + 17*sy) % 256) // 3 AS gray
           FROM cell),
         sgr AS (
           SELECT doc_id, i, gray,
                  sum(gray) OVER (PARTITION BY doc_id) AS sg
           FROM g),
         h AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN i >= 32 AND gray * 64 >= sg
                           THEN 1::BIGINT << (i - 32) ELSE 0 END) AS BIGINT)
                    AS hi,
                  CAST(sum(CASE WHEN i < 32 AND gray * 64 >= sg
                           THEN 1::BIGINT << i ELSE 0 END) AS BIGINT)
                    AS lo
           FROM sgr GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(bit_count(xor(a.hi, b.hi))
                     + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
         FROM h a JOIN h b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         ORDER BY id_a, id_b""",
    // q89's fingerprint replay over originals + whitespace variants,
    // then the survivor window: quality desc, id asc, one row/cluster
    "q162_dedup_survivors" ->
      """WITH corpus AS (
           SELECT doc_id, text, n_chars FROM documents
           UNION ALL
           SELECT doc_id + 10000, text || '  ', n_chars
           FROM documents WHERE doc_id < 40),
         norm AS (
           SELECT doc_id, n_chars,
                  array_to_string(
                    list_filter(string_split_regex(lower(text), '\s+'),
                                x -> len(x) > 0), ' ') AS s
           FROM corpus),
         fp AS (
           SELECT doc_id, n_chars,
                  list_reduce([0::BIGINT] || list_transform(
                      range(1, length(s) + 1), i -> unicode(s[i])::BIGINT),
                    (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                    AS cluster
           FROM norm),
         r AS (
           SELECT cluster, doc_id, n_chars,
                  row_number() OVER (PARTITION BY cluster
                    ORDER BY n_chars DESC, doc_id ASC) AS rn,
                  count(*) OVER (PARTITION BY cluster) AS nm
           FROM fp)
         SELECT cluster, doc_id AS representative_id, n_chars AS quality,
                CAST(nm AS BIGINT) AS n_members
         FROM r WHERE rn = 1 ORDER BY cluster""",
    // the contribution explode replayed: distinct actives → each day
    // feeds windows [day, day+6] → de-dup → count → only observed ends
    "q163_trailing_distinct" ->
      """WITH a AS (
           SELECT DISTINCT event_type AS k, user_id AS e,
                  epoch_us(ts) // 86400000000 AS b
           FROM events),
         c AS (SELECT DISTINCT k, e, b + t.o AS bucket
               FROM a, unnest(range(0, 7)) t(o)),
         obs AS (SELECT DISTINCT k, b AS bucket FROM a)
         SELECT c.k AS event_type, c.bucket AS bucket,
                CAST(count(*) AS BIGINT) AS n_distinct
         FROM c JOIN obs ON c.k = obs.k AND c.bucket = obs.bucket
         GROUP BY 1, 2 ORDER BY event_type, c.bucket""",
    // every pick replayed: dense catalog index by item order, draw j →
    // charPolyHash(user#j#seed) mod |items|, anti-join positives,
    // duplicate items collapse to min draw, first 2 by draw order
    "q164_negative_sample" ->
      """WITH ev AS (SELECT user_id, event_type FROM events
                     WHERE event_id % 5 = 0),
         items AS (SELECT DISTINCT event_type AS item FROM ev),
         idx AS (SELECT item,
                        row_number() OVER (ORDER BY item) - 1 AS i
                 FROM items),
         nn AS (SELECT count(*) AS n FROM items),
         users AS (SELECT DISTINCT user_id AS u FROM ev),
         draws AS (SELECT u, t.j,
                          u::VARCHAR || '#' || t.j::VARCHAR || '#7' AS s
                   FROM users, unnest(range(0, 6)) t(j)),
         pick AS (SELECT u, j,
                    list_reduce(
                      [0::BIGINT] || list_transform(
                        range(1, length(s) + 1),
                        x -> unicode(s[x])::BIGINT),
                      (a, c) -> (a * 31 + c) & ((1::BIGINT << 52) - 1))
                      % nn.n AS p
                  FROM draws, nn),
         cand AS (SELECT u, item, j FROM pick JOIN idx ON pick.p = idx.i),
         pos AS (SELECT DISTINCT user_id AS u, event_type AS item
                 FROM ev),
         neg AS (SELECT c.u, c.item, c.j
                 FROM cand c LEFT JOIN pos
                   ON c.u = pos.u AND c.item = pos.item
                 WHERE pos.u IS NULL),
         fd AS (SELECT u, item, min(j) AS j FROM neg GROUP BY 1, 2),
         r AS (SELECT u, item,
                      row_number() OVER (PARTITION BY u ORDER BY j ASC)
                        AS rk
               FROM fd)
         SELECT u AS user_id, item AS event_type, CAST(rk AS INT)
                  AS draw_rank
         FROM r WHERE rk <= 2 ORDER BY user_id, draw_rank""",
    // triangle membership is orientation-invariant: the id-ordered
    // enumeration (a < b < c over canonical edges) must equal the
    // engine's degree-ordered wedge closure node for node
    "q165_triangles" ->
      """WITH raw AS (
           SELECT (l_partkey * 7 + l_suppkey) % 150 AS u,
                  (l_partkey + l_suppkey * 3) % 150 AS v
           FROM lineitem WHERE l_orderkey % 29 = 0),
         e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
               FROM raw WHERE u <> v),
         t AS (SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
               FROM e e1 JOIN e e2 ON e2.a = e1.b
               JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         corners AS (SELECT n1 AS node FROM t
                     UNION ALL SELECT n2 FROM t
                     UNION ALL SELECT n3 FROM t),
         nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e)
         SELECT nodes.node,
                CAST(coalesce(c.n, 0) AS BIGINT) AS n_triangles
         FROM nodes LEFT JOIN (SELECT node, count(*) AS n FROM corners
                               GROUP BY 1) c ON nodes.node = c.node
         ORDER BY nodes.node""",
    // the pigeonhole blocks must lose nothing vs this EXHAUSTIVE
    // all-pairs Levenshtein over the same keys + planted variants
    "q166_edit_pairs" ->
      """WITH base AS (SELECT doc_id, substring(text, 1, 24) AS key
                       FROM documents),
         sub AS (SELECT doc_id + 100000 AS doc_id,
                        substring(key, 1, 10) || 'Z' ||
                          substring(key, 12, 13) AS key
                 FROM base WHERE doc_id % 5 = 0),
         del AS (SELECT doc_id + 200000 AS doc_id,
                        substring(key, 1, 6) || substring(key, 8, 17)
                          AS key
                 FROM base WHERE doc_id % 7 = 0),
         al AS (SELECT * FROM base UNION ALL SELECT * FROM sub
                UNION ALL SELECT * FROM del)
         SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                CAST(levenshtein(x.key, y.key) AS BIGINT) AS dist
         FROM al x JOIN al y ON x.doc_id < y.doc_id
         WHERE levenshtein(x.key, y.key) <= 1
         ORDER BY id_a, id_b""",
    // S_i = P_i − min(0, min_{j≤i} P_j) replayed with two explicit
    // ROWS-frame running windows over the identical total order
    "q167_cusum" ->
      """WITH s AS (
           SELECT user_id, event_id, epoch_us(ts) AS tsu,
                  CAST(floor(value) AS BIGINT) - 55 AS d
           FROM events WHERE value IS NOT NULL),
         p1 AS (SELECT user_id, tsu, event_id,
                       sum(d) OVER (PARTITION BY user_id
                         ORDER BY tsu, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS ps
                FROM s),
         p2 AS (SELECT user_id,
                       ps - least(min(ps) OVER (PARTITION BY user_id
                         ORDER BY tsu, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         0) AS cs
                FROM p1)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN cs >= 300 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_alarms,
                CAST(max(cs) AS BIGINT) AS max_cusum
         FROM p2 GROUP BY 1 ORDER BY user_id""",
    // the full eval dag replayed: exact cosine top-10 run (score desc,
    // id tie-break), label-match qrels, AP as the exact integer
    // Σ(hits≤r)·(2520//r) with one final division
    "q168_map_eval" ->
      """WITH q AS (SELECT vec_id AS qid,
                           CAST(embedding AS DOUBLE[]) AS qe, label AS ql
                    FROM embeddings WHERE vec_id < 5),
         run AS (SELECT qid, vec_id, rk FROM (
                   SELECT q.qid, e.vec_id,
                          row_number() OVER (PARTITION BY q.qid
                            ORDER BY list_cosine_similarity(
                              CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                              e.vec_id ASC) AS rk
                   FROM embeddings e CROSS JOIN q
                   WHERE e.vec_id <> q.qid)
                 WHERE rk <= 10),
         rel AS (SELECT q.qid, e.vec_id FROM embeddings e
                 JOIN q ON e.label = q.ql AND e.vec_id <> q.qid),
         reln AS (SELECT qid, CAST(count(*) AS BIGINT) AS rel_n
                  FROM rel GROUP BY 1),
         h AS (SELECT run.qid, rk,
                      row_number() OVER (PARTITION BY run.qid
                        ORDER BY rk ASC) AS hh
               FROM run JOIN rel ON run.qid = rel.qid
                 AND run.vec_id = rel.vec_id),
         ag AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_hits,
                       CAST(sum(hh * (2520 // rk)) AS BIGINT) AS aps
                FROM h GROUP BY 1)
         SELECT q.qid, coalesce(reln.rel_n, 0) AS rel_n,
                coalesce(ag.n_hits, 0) AS n_hits,
                CASE WHEN reln.rel_n IS NOT NULL THEN
                  round(coalesce(ag.n_hits, 0)::DOUBLE / 10.0, 6) END
                  AS p_at_k,
                CASE WHEN reln.rel_n IS NOT NULL THEN
                  round(coalesce(ag.n_hits, 0)::DOUBLE
                        / reln.rel_n::DOUBLE, 6) END AS r_at_k,
                CASE WHEN reln.rel_n IS NOT NULL THEN
                  round(coalesce(ag.aps, 0)::DOUBLE
                        / (2520.0::DOUBLE
                           * least(reln.rel_n, 10)::DOUBLE), 6) END
                  AS ap_at_k
         FROM q LEFT JOIN reln ON q.qid = reln.qid
         LEFT JOIN ag ON q.qid = ag.qid
         ORDER BY q.qid""",
    // distinct actives → per-user min cohort → |cohorts × periods|
    // counts; integers until the one retention division
    "q169_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS e,
                           epoch_us(ts) // 86400000000 AS b
                    FROM events WHERE user_id IS NOT NULL),
         c AS (SELECT e, min(b) AS cohort FROM a GROUP BY 1),
         sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
                FROM c GROUP BY 1),
         act AS (SELECT c.cohort, a.b - c.cohort AS period_index,
                        CAST(count(*) AS BIGINT) AS n_active
                 FROM a JOIN c ON a.e = c.e GROUP BY 1, 2)
         SELECT act.cohort, act.period_index, sz.n_cohort, act.n_active,
                round(act.n_active::DOUBLE / sz.n_cohort::DOUBLE, 6)
                  AS retention
         FROM act JOIN sz ON act.cohort = sz.cohort
         ORDER BY act.cohort, act.period_index""",
    // the rank form replayed: G = (2Σi·x − (n+1)Σx) / (nΣx), exact
    // integers to the one division; tie order provably irrelevant
    "q170_gini" ->
      """WITH v AS (SELECT l_returnflag AS k,
                           CAST(floor(l_extendedprice * 100) AS BIGINT)
                             AS x
                    FROM lineitem),
         r AS (SELECT k, x, row_number() OVER (PARTITION BY k
                 ORDER BY x ASC) AS i FROM v),
         g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS total,
                      CAST(sum(i * x) AS BIGINT) AS ix
               FROM r GROUP BY 1)
         SELECT k AS l_returnflag, n, total,
                CASE WHEN total <> 0 THEN
                  round((2.0::DOUBLE * ix - (n + 1) * total)
                        / (n * total)::DOUBLE, 6) END AS gini
         FROM g ORDER BY l_returnflag""",
    // membership collapse → within-basket pairs → exact counts; every
    // rule metric a single division over integers
    "q171_assoc_rules" ->
      """WITH m AS (SELECT DISTINCT
                      CAST(user_id AS VARCHAR) || '#' ||
                        CAST(epoch_us(ts) // 86400000000 AS VARCHAR)
                        AS bk,
                      event_type AS it
                    FROM events WHERE event_type IS NOT NULL),
         nb AS (SELECT count(DISTINCT bk) AS n FROM m),
         itn AS (SELECT it, CAST(count(*) AS BIGINT) AS ni
                 FROM m GROUP BY 1),
         p AS (SELECT x.it AS item_a, y.it AS item_b,
                      CAST(count(*) AS BIGINT) AS n_ab
               FROM m x JOIN m y ON x.bk = y.bk AND x.it < y.it
               GROUP BY 1, 2)
         SELECT p.item_a, p.item_b, a.ni AS n_a, b.ni AS n_b, p.n_ab,
                round(p.n_ab::DOUBLE / nb.n::DOUBLE, 6) AS support,
                round(p.n_ab::DOUBLE / a.ni::DOUBLE, 6) AS conf_a_to_b,
                round(p.n_ab::DOUBLE / b.ni::DOUBLE, 6) AS conf_b_to_a,
                round(p.n_ab::DOUBLE * nb.n::DOUBLE
                      / (a.ni * b.ni)::DOUBLE, 6) AS lift
         FROM p JOIN itn a ON p.item_a = a.it
         JOIN itn b ON p.item_b = b.it CROSS JOIN nb
         ORDER BY p.item_a, p.item_b""",
    // pooled θ from five exact integer sums, per-arm adjusted means as
    // the identical fixed double dag
    "q172_cuped" ->
      """WITH b AS (SELECT user_id % 2 AS arm,
                           CAST(floor(value) AS BIGINT) AS y,
                           CAST(floor(value) AS BIGINT) // 2
                             + event_id % 7 AS x
                    FROM events WHERE value IS NOT NULL),
         p AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx,
                      CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x * x) AS BIGINT) AS sxx,
                      CAST(sum(x * y) AS BIGINT) AS sxy FROM b),
         th AS (SELECT CASE WHEN n * sxx - sx * sx <> 0 THEN
                         (n * sxy - sx * sy)::DOUBLE
                           / (n * sxx - sx * sx)::DOUBLE END AS theta
                FROM p),
         a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS ax,
                      CAST(sum(y) AS BIGINT) AS ay FROM b GROUP BY 1)
         SELECT a.arm, a.n,
                round(a.ay::DOUBLE / a.n::DOUBLE, 6) AS mean_metric,
                round(a.ay::DOUBLE / a.n::DOUBLE
                      - th.theta * (a.ax::DOUBLE / a.n::DOUBLE
                                    - p.sx::DOUBLE / p.n::DOUBLE), 6)
                  AS mean_adjusted,
                round(th.theta, 6) AS theta
         FROM a CROSS JOIN p CROSS JOIN th ORDER BY a.arm""",
    // the banding must lose nothing vs this exhaustive per-(user,type)
    // pairing at |Δts| ≤ 1 hour
    "q173_near_events" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
                           epoch_us(ts) AS k
                    FROM events WHERE event_id IS NOT NULL),
         p AS (SELECT a.user_id, a.event_type,
                      a.event_id AS id_a,
                      b.event_id AS id_b,
                      a.k AS key_a,
                      b.k AS key_b,
                      abs(a.k - b.k) AS diff
               FROM e a JOIN e b
                 ON a.user_id = b.user_id
                AND a.event_type = b.event_type
                AND a.event_id < b.event_id
                AND abs(a.k - b.k) <= 3600000000)
         SELECT user_id, event_type, id_a, id_b, key_a, key_b, diff
         FROM p ORDER BY user_id, event_type, id_a, id_b""",
    // q168's cosine top-10 replay + a neighbour-label join; the
    // disagreement score is one division over integer counts
    "q174_label_noise" ->
      """WITH q AS (SELECT vec_id AS qid,
                           CAST(embedding AS DOUBLE[]) AS qe, label AS ql
                    FROM embeddings WHERE vec_id < 30),
         run AS (SELECT qid, vec_id, ql FROM (
                   SELECT q.qid, e.vec_id, q.ql,
                          row_number() OVER (PARTITION BY q.qid
                            ORDER BY list_cosine_similarity(
                              CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                              e.vec_id ASC) AS rk
                   FROM embeddings e CROSS JOIN q
                   WHERE e.vec_id <> q.qid)
                 WHERE rk <= 10),
         j AS (SELECT run.qid, run.ql, e.label AS nl
               FROM run JOIN embeddings e ON run.vec_id = e.vec_id)
         SELECT qid, CAST(count(*) AS BIGINT) AS n_neighbors,
                CAST(sum(CASE WHEN nl = ql THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_same,
                CAST(sum(CASE WHEN nl = ql THEN 0 ELSE 1 END) AS BIGINT)
                  AS n_diff,
                round(sum(CASE WHEN nl = ql THEN 0 ELSE 1 END)::DOUBLE
                      / count(*)::DOUBLE, 6) AS noise_score
         FROM j GROUP BY 1 ORDER BY qid""",
    // the integer z-test replayed over the identical trailing frame:
    // (n·x − S)² > 9·(n·Q − S²), verdicts only on full frames
    "q175_rolling_anomaly" ->
      """WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
                           CAST(floor(value) AS BIGINT) AS x
                    FROM events WHERE value IS NOT NULL),
         wf AS (SELECT user_id, x,
                       sum(x) OVER w AS sx, sum(x * x) OVER w AS qx,
                       count(x) OVER w AS n
                FROM s WINDOW w AS (PARTITION BY user_id
                  ORDER BY tsu, event_id
                  ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
         fl AS (SELECT user_id,
                       CASE WHEN n = 10 THEN
                         (CASE WHEN (n * x - sx) * (n * x - sx)
                                    > 9 * (n * qx - sx * sx)
                               THEN 1 ELSE 0 END) END AS an
                FROM wf)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(an) AS BIGINT) AS n_checked,
                CAST(coalesce(sum(an), 0) AS BIGINT) AS n_anomalies
         FROM fl GROUP BY 1 ORDER BY user_id""",
    // digit from the integer's decimal string; χ² terms from the same
    // (count, n, log10(1+1/d)) dag, dense 1..9 grid per key
    "q176_benford" ->
      """WITH v AS (SELECT l_returnflag AS k,
                           CAST(floor(l_extendedprice * 100) AS BIGINT)
                             AS x
                    FROM lineitem),
         c AS (SELECT k,
                      CAST(substring(CAST(x AS VARCHAR), 1, 1) AS INT)
                        AS digit,
                      CAST(count(*) AS BIGINT) AS n_obs
               FROM v WHERE x > 0 GROUP BY 1, 2),
         t AS (SELECT k, CAST(sum(n_obs) AS BIGINT) AS n
               FROM c GROUP BY 1),
         g AS (SELECT t.k, t.n, CAST(u.digit AS INT) AS digit
               FROM t, unnest(range(1, 10)) u(digit))
         SELECT g.k AS l_returnflag, g.digit,
                coalesce(c.n_obs, 0) AS n_obs,
                round(coalesce(c.n_obs, 0)::DOUBLE / g.n::DOUBLE, 6)
                  AS p_obs,
                round(log10(1.0::DOUBLE + 1.0::DOUBLE
                            / g.digit::DOUBLE), 6) AS p_exp,
                round((coalesce(c.n_obs, 0) - g.n
                        * log10(1.0::DOUBLE + 1.0::DOUBLE
                                / g.digit::DOUBLE))
                      * (coalesce(c.n_obs, 0) - g.n
                          * log10(1.0::DOUBLE + 1.0::DOUBLE
                                  / g.digit::DOUBLE))
                      / (g.n * log10(1.0::DOUBLE + 1.0::DOUBLE
                                     / g.digit::DOUBLE)), 6)
                  AS chi2_term
         FROM g LEFT JOIN c ON g.k = c.k AND g.digit = c.digit
         ORDER BY g.k, g.digit""",
    // every weight replayed: charPolyHash(id#b#42) mod 10^6 against
    // the five floor(PoissonCDF·10^6) integer thresholds
    // (JVM-identical constants), |keys × 100| integer sums, CI by
    // row_number
    "q177_bootstrap_ci" ->
      """WITH b AS (SELECT event_type AS k,
                           CAST(event_id AS VARCHAR) AS id,
                           CAST(floor(value) AS BIGINT) AS x
                    FROM events
                    WHERE value IS NOT NULL AND event_id IS NOT NULL),
         hw AS (SELECT k, x, rb,
                       list_reduce(
                         [0::BIGINT] || list_transform(
                           range(1, length(s) + 1),
                           i -> unicode(s[i])::BIGINT),
                         (a, c) -> (a * 31 + c)
                           & ((1::BIGINT << 52) - 1)) AS h
                FROM (SELECT k, x, t.rb,
                             id || '#' || CAST(t.rb AS VARCHAR) || '#42'
                               AS s
                      FROM b, unnest(range(0, 100)) t(rb))),
         ww AS (SELECT k, rb, x,
                       CASE WHEN h % 1000000 < 367879 THEN 0
                            WHEN h % 1000000 < 735758 THEN 1
                            WHEN h % 1000000 < 919698 THEN 2
                            WHEN h % 1000000 < 981011 THEN 3
                            WHEN h % 1000000 < 996340 THEN 4
                            ELSE 5 END AS w
                FROM hw),
         sums AS (SELECT k, rb, CAST(sum(w) AS BIGINT) AS n,
                         CAST(sum(w * x) AS BIGINT) AS sxw
                  FROM ww GROUP BY 1, 2 HAVING sum(w) > 0),
         m AS (SELECT k, rb, sxw::DOUBLE / n::DOUBLE AS mean_b,
                      row_number() OVER (PARTITION BY k
                        ORDER BY sxw::DOUBLE / n::DOUBLE ASC, rb ASC)
                        AS r
               FROM sums),
         ci AS (SELECT k,
                       min(CASE WHEN r = 3 THEN mean_b END) AS lo,
                       min(CASE WHEN r = 98 THEN mean_b END) AS hi
                FROM m GROUP BY 1),
         f AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS t FROM b GROUP BY 1)
         SELECT f.k AS event_type, f.n,
                round(f.t::DOUBLE / f.n::DOUBLE, 6) AS mean,
                round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi
         FROM f JOIN ci ON f.k = ci.k ORDER BY event_type""",
    // the shift-decay replayed with integer division and >>
    "q178_decayed_score" ->
      """WITH b AS (SELECT user_id,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(floor(value) AS BIGINT) AS x
                    FROM events WHERE value IS NOT NULL),
         d AS (SELECT user_id, x,
                      x >> least((19755 - day) // 7, 62)::INT AS dx
               FROM b)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(x) AS BIGINT) AS raw_sum,
                CAST(sum(dx) AS BIGINT) AS decayed_score
         FROM d GROUP BY 1 ORDER BY user_id""",
    // group sizes → histogram → share of rows in groups under k
    "q179_k_anonymity" ->
      """WITH d AS (SELECT event_type, user_id % 32 AS ub,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events),
         s AS (SELECT CAST(count(*) AS BIGINT) AS gs FROM d
               GROUP BY event_type, ub, day),
         h AS (SELECT gs AS group_size,
                      CAST(count(*) AS BIGINT) AS n_groups
               FROM s GROUP BY 1),
         h2 AS (SELECT group_size, n_groups,
                       group_size * n_groups AS n_rows,
                       group_size < 5 AS below_k
                FROM h),
         t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tot,
                      CAST(sum(CASE WHEN below_k THEN n_rows ELSE 0 END)
                           AS BIGINT) AS bad
               FROM h2)
         SELECT h2.group_size, h2.n_groups,
                CAST(h2.n_rows AS BIGINT) AS n_rows, h2.below_k,
                t.tot AS total_rows,
                round(t.bad::DOUBLE / t.tot::DOUBLE, 6) AS share_below_k
         FROM h2 CROSS JOIN t ORDER BY h2.group_size""",
    // lead() gap + the three-way label (observed gap / censored-but-
    // observable / unobservable NULL) replayed verbatim
    "q180_churn_labels" ->
      """WITH a AS (SELECT DISTINCT user_id AS entity,
                           epoch_us(ts) // 86400000000 AS bucket
                    FROM events WHERE user_id IS NOT NULL),
         l AS (SELECT entity, bucket,
                      lead(bucket) OVER (PARTITION BY entity
                        ORDER BY bucket) - bucket AS next_gap
               FROM a)
         SELECT entity, bucket, next_gap,
                CASE WHEN next_gap IS NOT NULL THEN next_gap > 3
                     WHEN 19752 - bucket > 3 THEN true END AS churned
         FROM l ORDER BY entity, bucket""",
    // gap histogram + suffix-sum at-risk + one division, censored
    // tails to the as-of day
    "q181_hazard" ->
      """WITH a AS (SELECT DISTINCT user_id AS e,
                           epoch_us(ts) // 86400000000 AS b
                    FROM events WHERE user_id IS NOT NULL),
         g AS (SELECT e, coalesce(nx - b, 19755 - b) AS t,
                      nx IS NULL AS cens
               FROM (SELECT e, b, lead(b) OVER (PARTITION BY e
                       ORDER BY b) AS nx FROM a)),
         g2 AS (SELECT * FROM g WHERE t > 0),
         h AS (SELECT t,
                      CAST(sum(CASE WHEN cens THEN 0 ELSE 1 END)
                           AS BIGINT) AS n_events,
                      CAST(sum(CASE WHEN cens THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_censored
               FROM g2 GROUP BY 1),
         ar AS (SELECT h1.t, h1.n_events, h1.n_censored,
                       CAST(sum(h2.n_events + h2.n_censored) AS BIGINT)
                         AS at_risk
                FROM h h1 JOIN h h2 ON h2.t >= h1.t GROUP BY 1, 2, 3)
         SELECT t, n_events, n_censored, at_risk,
                round(n_events::DOUBLE / at_risk::DOUBLE, 6) AS hazard
         FROM ar ORDER BY t""",
    // symmetrized endpoint-degree correlation: the sqrt cancels, so
    // the replay is integer sums to one division
    "q182_assortativity" ->
      """WITH raw AS (
           SELECT (l_partkey * 7 + l_suppkey) % 150 AS u,
                  (l_partkey + l_suppkey * 3) % 150 AS v
           FROM lineitem WHERE l_orderkey % 29 = 0),
         e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
               FROM raw WHERE u <> v),
         d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
               FROM (SELECT a AS node FROM e
                     UNION ALL SELECT b FROM e) GROUP BY 1),
         p AS (SELECT da.deg AS x, db.deg AS y
               FROM e JOIN d da ON e.a = da.node
               JOIN d db ON e.b = db.node),
         sym AS (SELECT x, y FROM p UNION ALL SELECT y, x FROM p),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx,
                      CAST(sum(x * x) AS BIGINT) AS sxx,
                      CAST(sum(x * y) AS BIGINT) AS sxy FROM sym)
         SELECT n AS n_ordered_pairs,
                CASE WHEN n * sxx - sx * sx <> 0 THEN
                  round((n * sxy - sx * sx)::DOUBLE
                        / (n * sxx - sx * sx)::DOUBLE, 6) END
                  AS assortativity
         FROM s""",
    // ordered A-then-B support per user: distinct memberships, the
    // windowed pair join, entity-level de-dup, exact counts
    "q183_seq_patterns" ->
      """WITH m AS (SELECT DISTINCT user_id AS e, event_type AS it,
                           epoch_us(ts) // 86400000000 AS b
                    FROM events
                    WHERE user_id IS NOT NULL
                      AND event_type IS NOT NULL),
         ne AS (SELECT count(DISTINCT e) AS n FROM m),
         p AS (SELECT DISTINCT x.e, x.it AS antecedent,
                      y.it AS consequent
               FROM m x JOIN m y ON x.e = y.e AND y.b > x.b
                 AND y.b <= x.b + 3)
         SELECT antecedent, consequent,
                CAST(count(*) AS BIGINT) AS n_entities,
                round(count(*)::DOUBLE / ne.n::DOUBLE, 6) AS support
         FROM p CROSS JOIN ne GROUP BY 1, 2, ne.n
         ORDER BY antecedent, consequent""",
    // q101's grid/smoothing with the JSD formula: p·ln(p/m) + q·ln(q/m)
    // summed over bins, halved — m = (p+q)/2
    "q184_jsd_drift" ->
      """WITH e AS (
           SELECT event_type,
                  epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-10 00:00:00')
                    AS is_ref,
                  least(greatest(CAST(floor(value / 2.5) AS INT), 0), 9)
                    AS bin
           FROM events),
         c AS (SELECT event_type, bin,
                      sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
                      sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS det_n
               FROM e GROUP BY event_type, bin),
         k AS (SELECT DISTINCT event_type FROM e),
         b AS (SELECT event_type, t.b AS bin
               FROM k, unnest(range(0, 10)) AS t(b)),
         f AS (SELECT b.event_type, b.bin,
                      coalesce(ref_n, 0) AS ref_n,
                      coalesce(det_n, 0) AS det_n
               FROM b LEFT JOIN c ON b.event_type = c.event_type
                                 AND b.bin = c.bin),
         t AS (SELECT event_type, sum(ref_n) AS rt, sum(det_n) AS dt
               FROM f GROUP BY event_type),
         f2 AS (SELECT f.event_type,
                       (ref_n + 0.5) / (rt + 5.0) AS p,
                       (det_n + 0.5) / (dt + 5.0) AS q,
                       rt, dt
                FROM f JOIN t ON f.event_type = t.event_type)
         SELECT event_type,
                round(sum(p * ln(p / ((p + q) / 2.0))
                          + q * ln(q / ((p + q) / 2.0))) / 2.0, 4) AS jsd,
                CAST(max(rt) AS BIGINT) AS ref_total,
                CAST(max(dt) AS BIGINT) AS det_total
         FROM f2 GROUP BY event_type ORDER BY event_type""",
    // both rankings replayed exactly (cosine desc / L2 asc, vec_id
    // tie-break); a common id entering at depth m contributes the
    // row-local geometric tail sum_{d=m..10} p^(d-1)/d
    "q185_rbo" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id < 8),
         cosr AS (SELECT qid, vec_id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY list_cosine_similarity(
                             CAST(embedding AS DOUBLE[]), qe) DESC,
                             vec_id ASC) AS rnk
                  FROM embeddings, q WHERE vec_id <> qid),
         l2r AS (SELECT qid, vec_id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY list_distance(
                            CAST(embedding AS DOUBLE[]), qe) ASC,
                            vec_id ASC) AS rnk
                 FROM embeddings, q WHERE vec_id <> qid),
         a AS (SELECT qid, vec_id, rnk AS ra FROM cosr WHERE rnk <= 10),
         b AS (SELECT qid, vec_id, rnk AS rb FROM l2r WHERE rnk <= 10),
         j AS (SELECT a.qid, greatest(ra, rb) AS m
               FROM a JOIN b ON a.qid = b.qid AND a.vec_id = b.vec_id),
         w AS (SELECT qid, count(*) AS n_common,
                      sum(list_sum(list_transform(range(m, 11),
                        d -> pow(0.9, d - 1) / d))) AS sw
               FROM j GROUP BY qid)
         SELECT u.qid, CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
                round(coalesce(sw, 0.0) * (1.0 - 0.9), 6) AS rbo
         FROM (SELECT DISTINCT qid FROM a) u LEFT JOIN w USING (qid)
         ORDER BY qid""",
    // vocabulary = top-500 tokens of docs < 300 (count desc, token asc);
    // every doc >= 300 scored by occurrence-grain OOV fraction
    "q186_oov_rate" ->
      """WITH tr AS (SELECT unnest(list_filter(
                       string_split_regex(lower(text), '\s+'),
                       x -> len(x) > 0)) AS tok
                     FROM documents WHERE doc_id < 300),
         v AS (SELECT tok FROM (
                 SELECT tok, count(*) AS n FROM tr GROUP BY tok
                 ORDER BY n DESC, tok ASC LIMIT 500)),
         c AS (SELECT doc_id, unnest(list_filter(
                 string_split_regex(lower(text), '\s+'),
                 x -> len(x) > 0)) AS tok
               FROM documents WHERE doc_id >= 300)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oov,
                round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE
                      / count(*)::DOUBLE, 6) AS oov_rate
         FROM c LEFT JOIN v ON c.tok = v.tok
         GROUP BY doc_id ORDER BY doc_id""",
    // per-user span durations (whole days + 1), observed iff the user
    // went quiet >= 7 days before the horizon; then the KM dag replayed:
    // at-risk suffix sums, exp(sum ln(1 - d/n)) prefix product with the
    // d = n absorbing state routed through an integer flag
    "q187_kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         s AS (SELECT user_id, min(us) AS f, max(us) AS l
               FROM e GROUP BY user_id),
         hz AS (SELECT max(us) AS h FROM e),
         d AS (SELECT (l - f) // 86400000000 + 1 AS t,
                      (l < h - 604800000000) AS ev
               FROM s CROSS JOIN hz),
         hist AS (SELECT t, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d_n,
                         sum(CASE WHEN NOT ev THEN 1 ELSE 0 END) AS c_n
                  FROM d WHERE t > 0 GROUP BY t),
         ar AS (SELECT h.t, h.d_n, h.c_n, sum(h2.d_n + h2.c_n) AS n
                FROM hist h JOIN hist h2 ON h2.t >= h.t GROUP BY 1, 2, 3),
         surv AS (SELECT a.t, a.d_n, a.c_n, a.n,
                         max(CASE WHEN f.d_n = f.n THEN 1 ELSE 0 END)
                           AS dead,
                         sum(CASE WHEN f.d_n < f.n THEN
                           ln(1.0 - f.d_n / CAST(f.n AS DOUBLE)) END)
                           AS lnsum
                  FROM ar a LEFT JOIN (SELECT * FROM ar WHERE d_n > 0) f
                    ON f.t <= a.t
                  GROUP BY 1, 2, 3, 4)
         SELECT t, CAST(d_n AS BIGINT) AS n_events,
                CAST(c_n AS BIGINT) AS n_censored,
                CAST(n AS BIGINT) AS at_risk,
                CASE WHEN coalesce(dead, 0) = 1 THEN 0.0
                     ELSE round(exp(coalesce(lnsum, 0.0)), 6)
                END AS survival
         FROM surv ORDER BY t""",
    // centroids as per-(label, dim) averages assembled to ordered
    // lists; the distance fold replays Spark's zip_with/aggregate
    // element order exactly
    "q188_silhouette" ->
      """WITH base AS (SELECT vec_id AS id, label,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings
                       WHERE label IS NOT NULL AND embedding IS NOT NULL
                         AND len(embedding) > 0),
         dims AS (SELECT label, i, v[i] AS x
                  FROM base, unnest(range(1, len(v) + 1)) AS u(i)),
         cent AS (SELECT label AS clab, i, avg(x) AS c
                  FROM dims GROUP BY 1, 2),
         ca AS (SELECT clab, list(c ORDER BY i) AS cv
                FROM cent GROUP BY clab),
         dd AS (SELECT b.id, b.label, ca.clab,
                       sqrt(list_sum(list_transform(
                         range(1, len(b.v) + 1),
                         i -> (b.v[i] - ca.cv[i]) * (b.v[i] - ca.cv[i]))))
                         AS dist
                FROM base b CROSS JOIN ca),
         s AS (SELECT id, label,
                      min(CASE WHEN label = clab THEN dist END) AS a,
                      min(CASE WHEN label <> clab THEN dist END) AS b
               FROM dd GROUP BY 1, 2)
         SELECT label, CAST(count(*) AS BIGINT) AS n,
                round(avg(CASE WHEN greatest(a, b) = 0 THEN 0.0
                               ELSE (b - a) / greatest(a, b) END), 6)
                  AS mean_silhouette
         FROM s WHERE a IS NOT NULL AND b IS NOT NULL
         GROUP BY label ORDER BY label""",
    // position-banded pairs (0 < pos_b - pos_a <= 2), canonical word
    // order, marginals over the SAME pair population (N = 2·|pairs|),
    // ratio formed in DOUBLE like the engine
    "q189_ppmi" ->
      """WITH base AS (SELECT doc_id, list_filter(
                         string_split_regex(lower(text), '\s+'),
                         x -> len(x) > 0) AS l
                       FROM documents WHERE doc_id < 200),
         toks AS (SELECT doc_id, i AS pos, l[i] AS tok
                  FROM base, unnest(range(1, len(l) + 1)) AS u(i)),
         pr AS (SELECT least(a.tok, b.tok) AS word_a,
                       greatest(a.tok, b.tok) AS word_b
                FROM toks a JOIN toks b ON a.doc_id = b.doc_id
                  AND b.pos > a.pos AND b.pos <= a.pos + 2),
         cnt AS (SELECT word_a, word_b, count(*) AS n_ab
                 FROM pr GROUP BY 1, 2 HAVING count(*) >= 2),
         occ AS (SELECT w, count(*) AS nw FROM (
                   SELECT word_a AS w FROM pr
                   UNION ALL SELECT word_b FROM pr) GROUP BY w),
         tot AS (SELECT 2 * count(*) AS n FROM pr)
         SELECT word_a, word_b, CAST(n_ab AS BIGINT) AS n_ab,
                CAST(oa.nw AS BIGINT) AS n_a,
                CAST(ob.nw AS BIGINT) AS n_b,
                round(greatest(0.0, ln(
                  (CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE))
                  / (CAST(oa.nw AS DOUBLE) * CAST(ob.nw AS DOUBLE)))), 6)
                  AS ppmi
         FROM cnt JOIN occ oa ON cnt.word_a = oa.w
                  JOIN occ ob ON cnt.word_b = ob.w
                  CROSS JOIN tot
         ORDER BY word_a, word_b""",
    // q185's two rankings, then tau over the common set: a per-query
    // pair self-join with sign algebra (ranks are row_number, tie-free)
    "q190_kendall_tau" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id < 8),
         cosr AS (SELECT qid, vec_id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY list_cosine_similarity(
                             CAST(embedding AS DOUBLE[]), qe) DESC,
                             vec_id ASC) AS rnk
                  FROM embeddings, q WHERE vec_id <> qid),
         l2r AS (SELECT qid, vec_id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY list_distance(
                            CAST(embedding AS DOUBLE[]), qe) ASC,
                            vec_id ASC) AS rnk
                 FROM embeddings, q WHERE vec_id <> qid),
         a AS (SELECT qid, vec_id, rnk AS ra FROM cosr WHERE rnk <= 10),
         b AS (SELECT qid, vec_id, rnk AS rb FROM l2r WHERE rnk <= 10),
         j AS (SELECT a.qid, a.vec_id, ra, rb
               FROM a JOIN b ON a.qid = b.qid AND a.vec_id = b.vec_id),
         pr AS (SELECT x.qid,
                       sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
                           THEN 1 ELSE 0 END) AS nc,
                       sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
                           THEN 1 ELSE 0 END) AS nd,
                       count(*) AS np
                FROM j x JOIN j y ON x.qid = y.qid
                  AND x.vec_id < y.vec_id
                GROUP BY x.qid),
         cm AS (SELECT qid, count(*) AS ncom FROM j GROUP BY qid)
         SELECT u.qid,
                CAST(coalesce(ncom, 0) AS BIGINT) AS n_common,
                CAST(coalesce(np, 0) AS BIGINT) AS n_pairs,
                CAST(coalesce(nc, 0) AS BIGINT) AS n_concordant,
                CAST(coalesce(nd, 0) AS BIGINT) AS n_discordant,
                CASE WHEN np > 0 THEN
                  round(CAST(nc - nd AS DOUBLE) / CAST(np AS DOUBLE), 6)
                END AS tau
         FROM (SELECT DISTINCT qid FROM a) u
           LEFT JOIN cm USING (qid) LEFT JOIN pr USING (qid)
         ORDER BY qid""",
    // character histogram per doc via 1-based char indexing (the q69
    // convention), entropy as ln/ln2 replaying Spark's log(2, x) dag
    "q191_char_entropy" ->
      """WITH ch AS (SELECT doc_id, text[i] AS c
                     FROM documents,
                          unnest(range(1, length(text) + 1)) AS u(i)),
         cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(n) AS tot, count(*) AS nd
                 FROM cnt GROUP BY 1)
         SELECT cnt.doc_id, CAST(max(tot) AS BIGINT) AS n_chars_c,
                CAST(max(nd) AS BIGINT) AS n_distinct_chars,
                round(-sum((n / CAST(tot AS DOUBLE))
                  * (ln(n / CAST(tot AS DOUBLE)) / ln(2.0))), 4)
                  AS char_entropy
         FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
         GROUP BY cnt.doc_id ORDER BY cnt.doc_id""",
    // q109's exact vocabulary ranking (top 200), then the least-squares
    // dag over (ln rank, ln count)
    "q192_zipf_slope" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(regexp_extract_all(text,
               '''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))
               AS token
           FROM documents),
         c AS (SELECT token, count(*) AS n_occurrences
               FROM t GROUP BY token),
         top AS (SELECT n_occurrences,
                        row_number() OVER (ORDER BY n_occurrences DESC,
                                           token ASC) AS rank
                 FROM c
                 ORDER BY n_occurrences DESC, token ASC LIMIT 200),
         p AS (SELECT ln(CAST(rank AS DOUBLE)) AS x,
                      ln(CAST(n_occurrences AS DOUBLE)) AS y
               FROM top),
         s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(x * y) AS sxy
               FROM p)
         SELECT CAST(n AS BIGINT) AS n_terms,
                round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                  AS slope,
                round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                       * sx) / CAST(n AS DOUBLE), 6) AS intercept
         FROM s""",
    // distinct (lang, token) collapse, overlap against the English
    // vocabulary at type grain
    "q193_vocab_overlap" ->
      """WITH raw AS (SELECT lang AS g, unnest(list_filter(
                        string_split_regex(lower(text), '\s+'),
                        x -> len(x) > 0)) AS tok
                      FROM documents WHERE lang IS NOT NULL),
         tk AS (SELECT DISTINCT g, tok FROM raw),
         ref AS (SELECT tok FROM tk WHERE g = 'en'),
         rs AS (SELECT count(*) AS nr FROM ref),
         sz AS (SELECT g, count(*) AS nt FROM tk WHERE g <> 'en'
                GROUP BY g),
         cm AS (SELECT g, count(*) AS ncm FROM tk JOIN ref USING (tok)
                WHERE g <> 'en' GROUP BY g)
         SELECT sz.g AS group_key, CAST(nt AS BIGINT) AS n_tokens,
                CAST(nr AS BIGINT) AS n_ref_tokens,
                CAST(coalesce(ncm, 0) AS BIGINT) AS n_common,
                round(coalesce(ncm, 0)
                  / CAST(nt + nr - coalesce(ncm, 0) AS DOUBLE), 6)
                  AS jaccard
         FROM sz LEFT JOIN cm USING (g) CROSS JOIN rs
         ORDER BY group_key""",
    // per-stratum integer sums, common support, then the
    // post-stratification dag (Hajek IPW with exact binned propensity)
    "q194_ipw" ->
      """WITH e AS (SELECT user_id % 5 AS s,
                           event_type = 'purchase' AS t,
                           CAST(round(value * 100) AS BIGINT) AS y
                    FROM events
                    WHERE event_type IN ('purchase', 'view')
                      AND value IS NOT NULL),
         st AS (SELECT s,
                       sum(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
                       sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nc,
                       sum(CASE WHEN t THEN y ELSE 0 END) AS yt,
                       sum(CASE WHEN NOT t THEN y ELSE 0 END) AS yc
                FROM e GROUP BY s),
         cs AS (SELECT * FROM st WHERE nt > 0 AND nc > 0),
         arms AS (SELECT true AS treated, nt + nc AS ns, nt AS na,
                         yt AS ya FROM cs
                  UNION ALL
                  SELECT false, nt + nc, nc, yc FROM cs)
         SELECT treated, CAST(sum(na) AS BIGINT) AS n,
                round(CAST(sum(ya) AS DOUBLE)
                      / CAST(sum(na) AS DOUBLE), 6) AS naive_mean,
                round(sum(CAST(ns AS DOUBLE)
                        * (CAST(ya AS DOUBLE) / CAST(na AS DOUBLE)))
                      / CAST(sum(ns) AS DOUBLE), 6) AS ipw_mean
         FROM arms GROUP BY treated ORDER BY treated""",
    // q155's model fit before the cutover, add-0.5 smoothed scoring of
    // the after-period sequences (V from the model's state set)
    "q195_transition_nll" ->
      """WITH cut AS (SELECT epoch_us(TIMESTAMP '2024-01-10 00:00:00')
                        AS c),
         fitp AS (SELECT event_type AS f,
                         lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS tt
                  FROM events, cut WHERE epoch_us(ts) < c),
         m AS (SELECT f, tt, count(*) AS n FROM fitp
               WHERE tt IS NOT NULL GROUP BY 1, 2),
         v AS (SELECT count(*) AS nv FROM
                 (SELECT f AS s FROM m UNION SELECT tt FROM m)),
         rt AS (SELECT f, sum(n) AS nf FROM m GROUP BY f),
         scp AS (SELECT user_id, event_type AS f,
                        lead(event_type) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) AS tt
                 FROM events, cut WHERE epoch_us(ts) >= c),
         sc AS (SELECT user_id, f, tt FROM scp WHERE tt IS NOT NULL),
         p AS (SELECT user_id,
                      (coalesce(n, 0) + 0.5)
                        / (coalesce(nf, 0) + 0.5 * nv) AS prob
               FROM sc LEFT JOIN m ON sc.f = m.f AND sc.tt = m.tt
                 LEFT JOIN rt ON sc.f = rt.f
                 CROSS JOIN v)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_transitions,
                round(-avg(ln(prob)), 4) AS avg_nll
         FROM p GROUP BY user_id ORDER BY user_id""",
    // whole-second gaps via lead + integer div, then the exact-long
    // (n, Σg, Σg²) sums and the (σ − μ)/(σ + μ) double dag
    "q196_burstiness" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         g AS (SELECT user_id,
                      (lead(us) OVER (PARTITION BY user_id
                         ORDER BY us, event_id) - us) // 1000000 AS gs
               FROM e),
         a AS (SELECT user_id, count(*) AS n, sum(gs) AS sg,
                      sum(gs * gs) AS sqq
               FROM g WHERE gs IS NOT NULL GROUP BY user_id),
         b AS (SELECT user_id, n,
                      CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                      sqrt(greatest(0.0,
                        CAST(sqq AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))))
                        AS sd
               FROM a)
         SELECT user_id AS entity, CAST(n AS BIGINT) AS n_gaps,
                round(m, 6) AS mean_gap_s,
                CASE WHEN sd + m > 0
                     THEN round((sd - m) / (sd + m), 6) END AS burstiness
         FROM b ORDER BY entity""",
    // q57's recursive component replay, then per-component label counts
    // and the majority/purity fold
    "q197_cluster_purity" ->
      """WITH RECURSIVE toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id,
                    unnest(string_split_regex(lower(text), '\s+')) AS tok
             FROM documents WHERE doc_id < 150)
           WHERE len(tok) > 0),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
                   FROM toks a JOIN toks b
                     ON a.tok = b.tok AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT idA, idB FROM inter
                   JOIN sizes sa ON sa.doc_id = idA
                   JOIN sizes sb ON sb.doc_id = idB
                   WHERE i / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT idA AS u, idB AS v FROM pairs
                   UNION SELECT idB, idA FROM pairs
                   UNION SELECT idA, idA FROM pairs
                   UNION SELECT idB, idB FROM pairs),
         reach AS (SELECT u, v FROM edges
                   UNION
                   SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         cl AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u),
         bl AS (SELECT component, lang, count(*) AS nl
                FROM cl JOIN documents ON cl.id = documents.doc_id
                GROUP BY 1, 2)
         SELECT component, CAST(sum(nl) AS BIGINT) AS n_members,
                CAST(max(nl) AS BIGINT) AS n_majority,
                CAST(count(*) AS BIGINT) AS n_labels,
                round(max(nl) / CAST(sum(nl) AS DOUBLE), 6) AS purity
         FROM bl GROUP BY component ORDER BY component""",
    // the identical code-point ranges stripped per ratio (Latin letters
    // minus the D7/F7 signs, Han, digits, \s) — length() counts code
    // points on both engines
    "q198_script_mix" ->
      """SELECT doc_id,
                round(CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text,
                    '[^A-Za-z\x{C0}-\x{D6}\x{D8}-\x{F6}\x{F8}-\x{24F}]',
                    '', 'g')) / CAST(length(text) AS DOUBLE) END, 4)
                  AS latin_ratio,
                round(CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text,
                    '[^\x{4E00}-\x{9FFF}]', '', 'g'))
                    / CAST(length(text) AS DOUBLE) END, 4) AS han_ratio,
                round(CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^0-9]', '', 'g'))
                    / CAST(length(text) AS DOUBLE) END, 4)
                  AS digit_ratio,
                round(CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^\s]', '', 'g'))
                    / CAST(length(text) AS DOUBLE) END, 4) AS ws_ratio
         FROM documents ORDER BY doc_id""",
    // q191's per-doc entropy + q27's token count aggregated per lang,
    // left-joined to q193's jaccard-vs-English
    "q199_corpus_health" ->
      """WITH ch AS (SELECT doc_id, text[i] AS c
                     FROM documents,
                          unnest(range(1, length(text) + 1)) AS u(i)),
         cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(n) AS tot FROM cnt GROUP BY 1),
         ent AS (SELECT cnt.doc_id,
                        round(-sum((n / CAST(tot AS DOUBLE))
                          * (ln(n / CAST(tot AS DOUBLE)) / ln(2.0))), 4)
                          AS ce
                 FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
                 GROUP BY cnt.doc_id),
         tk AS (SELECT doc_id, lang,
                       len(list_filter(string_split_regex(text, '\s+'),
                                       x -> len(x) > 0)) AS nt
                FROM documents),
         base AS (SELECT tk.lang, tk.nt, ent.ce
                  FROM tk JOIN ent ON tk.doc_id = ent.doc_id),
         agg AS (SELECT lang, count(*) AS n_docs,
                        round(avg(ce), 4) AS ace, round(avg(nt), 4) AS at
                 FROM base GROUP BY lang),
         raw AS (SELECT lang AS g, unnest(list_filter(
                   string_split_regex(lower(text), '\s+'),
                   x -> len(x) > 0)) AS tok
                 FROM documents WHERE lang IS NOT NULL),
         tkn AS (SELECT DISTINCT g, tok FROM raw),
         ref AS (SELECT tok FROM tkn WHERE g = 'en'),
         rs AS (SELECT count(*) AS nr FROM ref),
         sz AS (SELECT g, count(*) AS nt FROM tkn WHERE g <> 'en'
                GROUP BY g),
         cm AS (SELECT g, count(*) AS ncm FROM tkn JOIN ref USING (tok)
                WHERE g <> 'en' GROUP BY g),
         ov AS (SELECT sz.g,
                       round(coalesce(ncm, 0)
                         / CAST(sz.nt + nr - coalesce(ncm, 0) AS DOUBLE),
                         6) AS j
                FROM sz LEFT JOIN cm USING (g) CROSS JOIN rs)
         SELECT agg.lang, CAST(n_docs AS BIGINT) AS n_docs,
                ace AS avg_char_entropy, at AS avg_tokens,
                ov.j AS vocab_jaccard_vs_en
         FROM agg LEFT JOIN ov ON agg.lang = ov.g
         ORDER BY agg.lang""",
    // union-vocabulary +0.5 smoothing, the JSD fold over |vocab| rows
    "q200_token_jsd" ->
      """WITH tk AS (SELECT unnest(list_filter(
                       string_split_regex(lower(text), '\s+'),
                       x -> len(x) > 0)) AS tok,
                     doc_id < 300 AS r
                     FROM documents),
         c AS (SELECT tok,
                      sum(CASE WHEN r THEN 1 ELSE 0 END) AS rn,
                      sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS dn
               FROM tk GROUP BY tok),
         t AS (SELECT count(*) AS v, sum(rn) AS rt, sum(dn) AS dt FROM c),
         f AS (SELECT (rn + 0.5) / (rt + 0.5 * v) AS p,
                      (dn + 0.5) / (dt + 0.5 * v) AS q,
                      v, rt, dt
               FROM c CROSS JOIN t)
         SELECT CAST(max(v) AS BIGINT) AS n_vocab,
                CAST(max(rt) AS BIGINT) AS ref_total,
                CAST(max(dt) AS BIGINT) AS det_total,
                round(sum(p * ln(p / ((p + q) / 2.0))
                          + q * ln(q / ((p + q) / 2.0))) / 2.0, 4)
                  AS jsd
         FROM f""",
    // per-(group, member) counts, then HHI = sum(n^2)/N^2 in int128
    // before the one double division
    "q201_hhi" ->
      """WITH m AS (SELECT event_type, user_id, count(*) AS c
                    FROM events WHERE user_id IS NOT NULL
                    GROUP BY 1, 2)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_members,
                CAST(sum(c) AS BIGINT) AS n_rows,
                round(CAST(sum(c * c) AS DOUBLE)
                      / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)),
                      6) AS hhi
         FROM m GROUP BY event_type ORDER BY event_type""",
    // keyed exact lower-quantile algebra at three rational positions
    // (cum*den >= tot*num), q71/q110's machinery
    "q202_length_quantiles" ->
      """WITH d AS (SELECT lang,
                           CAST(len(list_filter(
                             string_split_regex(text, '\s+'),
                             x -> len(x) > 0)) AS BIGINT) AS v
                    FROM documents),
         c AS (SELECT lang, v, count(*) AS n FROM d GROUP BY 1, 2),
         m AS (SELECT lang, v,
                      sum(n) OVER (PARTITION BY lang ORDER BY v) AS cum,
                      sum(n) OVER (PARTITION BY lang) AS tot
               FROM c)
         SELECT lang,
                min(CASE WHEN cum * 10 >= tot THEN v END) AS p10,
                min(CASE WHEN cum * 2 >= tot THEN v END) AS p50,
                min(CASE WHEN cum * 10 >= tot * 9 THEN v END) AS p90
         FROM m GROUP BY lang ORDER BY lang"""
  )
}
