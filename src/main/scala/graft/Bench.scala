package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries are materialized with a noop-format write — unlike `count()`,
  * this executes the full plan including all aggregate/projection work
  * (count() lets Catalyst prune unused aggregates, under-reporting).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // collect_list aggs (report counters) fall back to sort-based after
      // 128 in-memory keys by default — far too conservative for small
      // per-key buffers; keep them hash-based.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // Static conf, default 100 entries: a 150+-query session generates
      // thousands of whole-stage classes, so the janino cache churns and
      // warm passes re-compile every plan from scratch. Sizing: the r8
      // registry (151 queries + 3 skew scenarios) compiles ~2,600 classes
      // per cold pass (CodegenMetrics, logged per-pass below), so 5000
      // holds the entire session with ~2x headroom; churn is verified
      // every bench run by the per-pass compile-count lines — warm-pass
      // deltas near zero mean no eviction.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // NOTE: spark.cleaner.periodicGC.interval stays at its 30-minute
      // default ON PURPOSE: a short interval forces full driver GCs
      // DURING timed queries (measured +30 s of roving spikes across a
      // full run). The per-25-query System.gc() below drains the
      // ContextCleaner backlog at untimed safe points instead.
      .config("spark.sql.adaptive.enabled", "true")
      // testdata parquet files are single-digit-MB; default 128 MB split
      // size scans each as ONE partition, serializing every query. At real
      // scale the default is correct — this is local-bench parallelization.
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Unpersisting a localCheckpoint'ed RDD (the between-query cleanup
    // below) logs a WARN per RDD ("lineage has been truncated and cannot
    // be recomputed") — correct but irrelevant here since no query ever
    // re-reads another query's checkpoint. Over 150 queries the spam
    // buries the final metric line, so drop that logger to ERROR.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    // Uncounted warmup: JVM/codegen/classloading otherwise lands entirely
    // on whichever query happens to run first.
    try SparkEntry.queries.get("q1_pricing_summary")
      .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }
    // Optional comma-separated query filter (dev profiling loop).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    // registry queries + the planted-skew scenarios (BenchSkew): the skew
    // envelope is benched every round alongside the uniform corpus
    val registry = (SparkEntry.queries.toSeq ++ BenchSkew.scenarios.toSeq)
      .sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    // Median-of-N (default 3): a single-shot run cannot distinguish noise
    // (GC pause, sandbox scheduling, one-off codegen compile) from a real
    // regression — r8's "16-query regression cluster" sat entirely in
    // untouched code for exactly this reason. Pass 0 eats plan + codegen
    // compilation; the median of three discards one-sided outliers.
    val samples = (0 until passes).map { pass =>
      val res = registry.zipWithIndex.map { case ((name, fn), i) =>
        // Broadcast / localCheckpoint blocks from finished queries are
        // reclaimed lazily by the ContextCleaner (it reacts to driver GC);
        // over a 150+-query run the backlog distorts later queries' times
        // (observed: a 2 s query reading 12 s late in the run). A periodic
        // explicit GC, OUTSIDE the timed window, keeps attribution honest.
        if (i % 25 == 0 && (i > 0 || pass > 0)) System.gc()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // localCheckpoint blocks (MEMORY_AND_DISK persisted RDDs) from the
        // query just finished are dead the moment its DataFrame goes out
        // of scope, but the ContextCleaner only reclaims them after a
        // driver GC notices the dangling ref — across 150+ queries the
        // backlog grows to GBs of storage memory and late-run queries pay
        // for it (observed: one 2 s query reading 35 s). Queries never
        // share persisted RDDs, so drop them synchronously here, untimed.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        name -> elapsed
      }
      // Codegen-cache churn evidence: cumulative janino compile count
      // after each pass. If the cache holds the whole registry, passes
      // 2..N add ~nothing; a large warm-pass delta means eviction churn
      // and the maxEntries conf above needs a bump.
      val m = org.apache.spark.metrics.source.CodegenMetrics
      System.err.println(s"[bench] after pass $pass: cumulative codegen " +
        s"compiled=${m.METRIC_COMPILATION_TIME.getCount} classes")
      res
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val medians = registry.map(_._1).map { name =>
      name -> median(samples.map(_.find(_._1 == name).get._2))
    }
    // The harness that consumes this output keeps only the last ~2000
    // characters of stdout; a per-query map over the full registry blows
    // past that and truncates the JSON mid-line. So: print the full map
    // (with all per-pass samples) to stderr for dev profiling, and keep
    // the stdout JSON line compact — a representative headline subset,
    // 3-decimal seconds, total over ALL queries in "value".
    val full = medians.map { case (k, v) =>
      val raw = samples.map(_.find(_._1 == k).get._2)
        .map(t => f"$t%.3f").mkString("[", ",", "]")
      "\"" + k + "\":{\"median\":" + f"$v%.3f" + ",\"samples\":" + raw + "}"
    }.mkString("{", ",", "}")
    System.err.println(s"[bench] per-query seconds: $full")
    val headlineSet = headline.filter(h => medians.exists(_._1 == h))
    val qs = medians.filter(r => headlineSet.contains(r._1))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    System.out.flush(); System.err.flush()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${medians.size},"agg":"median","passes":$passes,"queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }

  /** Headline queries for the compact stdout JSON — one or two per operator
    * family (TPC-H shapes, parity pipeline, range join, as-of,
    * sessionization, dedup family, ANN, text analysis, curation, skew,
    * multimodal, windows). */
  private val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q9_product_profit", "q13_cust_distribution", "q18_large_orders",
    "takuan_ssh_pipeline", "a1_report_counters", "j2_auto_range_join",
    "asof_purchase_click", "sessionize_events", "st5_session_window",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_cc_clusters",
    "dedup_embedding_cosine", "sim_brute_topk", "sim_ivf_topk",
    "sim_ivf_trained_topk", "sim_semantic_dedup", "emb_sign_project",
    "mine_contrastive_pairs", "dedup_span_exact", "decon_cross_pairs",
    "quality_model_score", "sample_token_budget",
    "text_profile", "text_ngrams", "curation_pipeline", "salted_skew_join",
    "funnel_conversion", "mm_audio_features", "q_window_running",
    "q_percentile",
    // round-6 additions: LM scoring, exact pooling, global/temperature
    // sampling, retention, end-to-end near-dup removal, overlap join,
    // calibration, hashing-trick embeddings
    "text_lm_bigram", "emb_mean_pool", "sample_global", "event_retention",
    "dedup_connected_keep", "sample_temperature", "session_overlap",
    "quality_pr_curve", "quality_auc", "text_hash_embedding",
    // round-7 additions: planted-skew envelope (BenchSkew scenarios) +
    // the now-oracle-checked clustering queries
    "skew_minhash_hot_bucket", "skew_overlap_hot_bucket",
    "skew_salted_hot_key", "text_cluster_assign", "artifact_train_serve",
    // round-7 additions: product quantization (trained codes + ADC top-k),
    // the FastSS fuzzy vocabulary join, and the portable-CMS heavy hitters
    "emb_pq_encode", "sim_pq_topk", "sim_ivfpq_topk", "text_fuzzy_pairs",
    "sketch_heavy_hitters", "sketch_quantiles", "text_lm_trigram",
    "sketch_winsorize", "text_drift_chisq", "sketch_group_topk",
    // round-7 additions: readability gate, Heaps-law vocabulary growth,
    // median/MAD event anomalies
    "text_readability", "text_vocab_growth", "event_outliers",
    "graph_triangles",
    // round-9 additions: cluster-quality silhouette, trained lang-ID,
    // weighted sampling, DSIR importance selection
    "emb_silhouette", "text_ct_langid", "sample_weighted",
    "curation_dsir_select", "rag_chunk_retrieve", "text_novelty",
    "emb_anisotropy", "graph_kcore", "emb_davies_bouldin",
    "mix_plan_uniform", "quality_reliability", "mm_image_ahash_dedup",
    "emb_cluster_purity", "sim_mmr_rerank", "emb_kcenter_coreset",
    "dedup_connected_best", "text_html_strip", "sample_rank_normalize",
    "mm_image_dhash_dedup", "mm_audio_fingerprint_dedup",
    // round-9 second batch: hybrid RRF retrieval, whitening, KS drift,
    // curriculum/epoch-mix planning, Gopher gate, ExactSubstr runs,
    // Simpson diversity
    "sim_rrf_hybrid", "emb_whiten", "quality_ks_drift",
    "sample_curriculum", "mix_epoch_plan", "quality_gopher_gate",
    "dedup_repeated_runs", "text_simpson_diversity",
    "dedup_cluster_sizes", "rag_sentence_chunks", "quality_auc_by_source",
    "source_jsonl_roundtrip", "text_code_detect", "text_script_profile",
    "pipeline_pretrain_prep", "sketch_hist_merge", "mm_video_scene_cuts",
    "mm_scene_keyframes", "quality_threshold_select",
    "interval_merge_activity", "asof_tolerance_click",
    "split_leakage_check", "layout_bucketed_join", "text_watermark_detect",
    "emb_whiten_outliers", "sketch_wau_mau", "pack_efficiency",
    // round-9 third batch: lossless prefix-filter similarity join, CDC
    // materialization, k-anonymity release audit, contamination BFS
    "dedup_ppjoin", "cdc_latest_snapshot", "scd2_history",
    "privacy_k_anonymity", "graph_bfs_hops", "event_decayed_counts",
    "corpus_snapshot_diff", "split_by_cluster", "text_mixed_lang",
    "source_orc_roundtrip", "graph_host_rank", "text_topic_segments",
    "asof_nearest_click", "event_trimmed_mean", "graph_ppr",
    "sketch_join_size", "mix_source_gini")
}
