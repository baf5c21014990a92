package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every catalog query against SPARK_GRAFT_SF_DIR,
  * one JSON line to stdout.
  *
  * Queries are forced through the `noop` sink, not `count()`: a count
  * lets Catalyst prune the final projection (expression-heavy queries
  * like the transaction-id derivations would be timed at zero work).
  * Noop evaluates every output column and discards rows executor-side —
  * no driver collect, no disk.
  *
  * Each query runs SPARK_GRAFT_RUNS times (default 3) and reports the
  * per-query MEDIAN: the bench box carries external load spikes, and a
  * single-shot timing conflates those with plan changes. `raw` carries
  * every sample so a consumer can audit the spread; `value` is the sum
  * of medians. SPARK_GRAFT_ONLY=name,name limits the set (iteration aid;
  * unset = full catalog, which is what the driver runs).
  *
  * Scale curve: after the main pass, `copies`× replicas of the SF dir are
  * generated (graft.ScaledData — key-shifted copies, mutually invisible)
  * and re-timed (min-of-SPARK_GRAFT_SCALE_RUNS, default 2 — the min is
  * the contention-free estimate): the headline queries at
  * SPARK_GRAFT_SCALE_COPIES (default 10×) and the FULL catalog at
  * SPARK_GRAFT_SCALE_FULL
  * (default 5×), so the curve covers every query, not a subset. The JSON
  * line carries `"scaled":{"copies":N,…,"full":{"copies":M,…}}`. Multiple
  * scale points in every BENCH file make super-linear growth visible
  * instead of asserted. Either env set to 0 disables that pass.
  *
  * Streaming point: a `"streaming"` block times the REST cardex DSv2
  * source in micro-batch mode (draining published pages under admission
  * control) — whole-run AND steady-state rows/s (first batch excluded,
  * batch-duration denominator) plus a `wide` 10k-rows/page point, the
  * §2.9 surface the batch queries never exercise.
  *
  * The complete JSON line is also written to SPARK_GRAFT_BENCH_OUT
  * (default /root/repo/BENCHFULL.json) — the stdout capture keeps only a
  * tail, and round 8 lost its main pass to that truncation.
  */
object Bench {
  /** The scale-curve subset: the scan/join/agg/dedup/text/ann/pipeline
    * shapes whose 100×-claims are worth a second data point — the rest of
    * the catalog is dominated by these same plan shapes. */
  val headline: Set[String] = Set(
    "flagship_reconcile", "nested_flatten_actions", "f5_f7_transaction_ids",
    "j5_anti_dispatched", "j_asof_attribution", "w_session_window_native",
    "dd_exact_groups", "dd_minhash_lsh", "dd_lsh_confirm", "dd_simhash",
    "dd_conn_components", "dd_conn_components_alt", "dd_pipeline_keepers",
    "ann_topk_agg", "t_token_quality", "s_pack_sequences", "mm_decode_stats",
    "dd_substring_spans", "emb_kmeans", "emb_avg_pool", "g_pagerank",
    "corpus_pipeline_keepers",
    // round-8 second-session families: wedge-join growth, iterative
    // merge training, sketch grid, collapsed-frame fan-out
    "g_triangle_count", "t_bpe_train_merges", "a_countmin_heavy",
    "w_rolling_distinct",
    // round-8 third/fourth-wave families: fingerprint dedup (decode-heavy),
    // register sketches, frontier iteration, interval binning
    "mm_phash_dedup", "w_hll_sliding_distinct", "g_bfs_levels",
    "j_interval_overlap",
    // round-9: incremental state-probe shapes + binary ANN
    "corpus_pipeline_incremental", "dd_minhash_incremental",
    "emb_hamming_topk",
    // round-9 second wave: decorrelated-subquery agg join, double-window
    // FIFO allocation, bitmap-vs-expand distinct
    "sq_scalar_small_qty", "k_fifo_costing", "a_bitmap_distinct",
    // round-9 third wave: grid spatial join, vocab-bucketed tf-idf,
    // blocked ER with CC closure
    "geo_grid_join", "t_tfidf_topterms", "dd_entity_resolution",
    // round-10: 6-table join-order stress (the one fact-fact exchange),
    // bounded-heap quantile sampling
    "j_q9_profit_rollup", "a_kmv_quantiles",
    // round-10 second wave: value-domain rank statistics, windowless
    // struct-endpoint OHLC bars
    "a_ks_test", "w_ohlc_vwap",
    // round-10 third wave: weighted iterative relaxation, deletion-
    // neighborhood blocking, sweep-line interval aggregate, right-
    // censored survival windows
    "g_sssp_bellman", "dd_symspell_neighbors", "w_max_concurrency",
    "a_survival_hazard")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (codegen compiler, parquet footers, scheduler)
    // so the alphabetically-first query doesn't absorb one-time costs.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = names.map { case (name, fn) =>
      val samples = (1 to runs).map { i =>
        System.err.println(s"[bench] running $name ($i/$runs)")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = samples(samples.length / 2)
      (name, median, samples)
    }
    val qs = results.map { case (k, med, _) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, ss) =>
      s"\"" + k + "\":[" + ss.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // sf as a NUMBER parsed from the dir name (sf0.1 -> 0.1): a JSON
    // consumer expecting {"sf": N} must not get a path string.
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).stripSuffix(".")).getOrElse("0")

    // a min-of-N (default 2, SPARK_GRAFT_SCALE_RUNS) timing pass over
    // `qset` against a copies× replica. Round 6 proved single-shot is not
    // enough here: the driver's box carried load spikes that inflated the
    // scaled numbers 6-12× over an idle re-run — and because the scaled
    // pass IS the scale-curve evidence, that contention read as fake
    // super-linear growth. The MIN over runs is the contention-free
    // estimate (a sample can only be slowed by interference, never sped
    // up). Returns the inner JSON object. A failed query must NOT appear
    // as a (small, plausible) timing — that would read as an improvement
    // in the curve.
    //
    // Failure bookkeeping (round-7 verdict #2/#3 + advice): a query with
    // zero successful runs is retried ONCE against a FRESH replica dir
    // before being recorded — round 7's 3-query failure block was one
    // sustained environmental event, and a retry separates a transient
    // from a reproducible red. What survives lands in the JSON as
    // `"failed":[{"name":…,"err":"Class: message"}]` so the artifact is
    // diagnosable without stderr; queries that only succeeded on SOME
    // runs stay visible in `"partial":{name:[n_ok,n_runs]}`, and
    // retry-rescued queries are listed in `"retried"` so a min timing
    // can't silently paper over flakiness.
    def scaledPass(copies: Int, qset: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
                   label: String): String = {
      val scaleRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt)
      def escJson(s: String): String = s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      // one (name, samples, loadavgs, lastErr) per query; errors keep
      // class+message. Each sample carries the 1-min system loadavg read
      // just before it started: the driver box self-contends during the
      // ~hour-long full pass (round-8 verdict adjudicated four apparent
      // 2x regressions as contention), and the load column lets a
      // consumer discount contaminated rows instead of guessing. A query
      // whose fastest sample is still >= 5 s gets ONE adaptive extra run
      // — min-of-2 absorbs spikes but not sustained load, and the slow
      // queries are exactly where contention moves the round-over-round
      // comparison most.
      // attempts is tracked separately from samples.length: the adaptive
      // extra run would otherwise refill a query that lost one of its
      // scaleRuns samples to an error back to exactly scaleRuns samples,
      // and the `partial` field would silently stop reporting the failure
      def runSet(dir: String,
                 qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
                 tag: String): Seq[(String, Seq[Double], Seq[Double], Option[String], Int)] =
        qs.map { case (name, fn) =>
          var lastErr: Option[String] = None
          var loads = Vector.empty[Double]
          var attempts = 0
          def sample(i: Int, n: Int): Option[Double] = {
            System.err.println(s"[bench] $tag(${copies}x) $name ($i/$n)")
            attempts += 1
            loads :+= java.lang.management.ManagementFactory
              .getOperatingSystemMXBean.getSystemLoadAverage
            val t0 = System.nanoTime()
            try {
              fn(spark, dir).write.format("noop").mode("overwrite").save()
              Some((System.nanoTime() - t0) / 1e9)
            } catch { case e: Throwable =>
              lastErr = Some(
                s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(300)}")
              System.err.println(s"[bench] $tag $name failed: $e"); None }
          }
          var samples = (1 to scaleRuns).flatMap(sample(_, scaleRuns))
          if (samples.nonEmpty && samples.min >= 5.0)
            samples ++= sample(scaleRuns + 1, scaleRuns + 1)
          (name, samples, loads, lastErr, attempts)
        }
      // per-run unique dirs under tmpdir (cwd-independent, and two
      // concurrent benches can't clobber each other's replica mid-read);
      // deleted after the pass — a replica shouldn't squat on /tmp
      def freshDir(): String = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-bench-scaled-${java.util.UUID.randomUUID()}").getAbsolutePath
      val scaledDir = freshDir()
      val retryDir = freshDir()
      try {
        ScaledData.generate(spark, sfDir, scaledDir, copies)
        val first = runSet(scaledDir, qset, label)
        val failedNames = first.filter(_._2.isEmpty).map(_._1).toSet
        val (scaled, rescued) =
          if (failedNames.isEmpty) (first, Seq.empty[String])
          else {
            ScaledData.generate(spark, sfDir, retryDir, copies)
            val retry = runSet(retryDir,
              qset.filter(q => failedNames.contains(q._1)), s"$label-retry")
              .map(r => r._1 -> r).toMap
            val merged = first.map { r =>
              if (failedNames.contains(r._1)) retry.getOrElse(r._1, r) else r
            }
            (merged, merged.filter(r => failedNames.contains(r._1) && r._2.nonEmpty).map(_._1))
          }
        val good = scaled.filter(_._2.nonEmpty)
        val sqs = good.map { case (k, ss, _, _, _) => s"\"" + k + "\":" + ss.min }
          .mkString("{", ",", "}")
        // full sample + loadavg vectors: min-of-N hides the spread; the
        // raw arrays let a round-over-round consumer see whether a slow
        // min came with a loaded box
        val sraw = good.map { case (k, ss, _, _, _) =>
          s"\"" + k + "\":[" + ss.mkString(",") + "]" }.mkString("{", ",", "}")
        val sload = good.map { case (k, _, ls, _, _) =>
          s"\"" + k + "\":[" + ls.map(l => f"$l%.2f").mkString(",") + "]"
        }.mkString("{", ",", "}")
        val failed = scaled.filter(_._2.isEmpty)
          .map { case (k, _, _, err, _) =>
            s"""{"name":"$k","err":"${escJson(err.getOrElse("unknown"))}"}""" }
          .mkString("[", ",", "]")
        // partial = fewer samples than ATTEMPTS (some attempt errored even
        // though the query ended up "good"); carries the last error so a
        // flaky-but-rescued query stays diagnosable from the artifact
        val partial = good.filter(r => r._2.length < r._5)
          .map { case (k, ss, _, err, att) =>
            s"\"" + k + s"""\":[${ss.length},$att,"${escJson(err.getOrElse(""))}"]""" }
          .mkString("{", ",", "}")
        val retriedJson = rescued.map("\"" + _ + "\"").mkString("[", ",", "]")
        s"""{"copies":$copies,"value":${good.map(_._2.min).sum},"queries":$sqs,"raw":$sraw,"load":$sload,"failed":$failed,"partial":$partial,"retried":$retriedJson}"""
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scaledDir))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(retryDir)); ()
      }
    }

    // scale curve: headline subset at SCALE_COPIES (default 10x), full
    // catalog at SCALE_FULL (default 5x). fail-soft end to end: the curve
    // is extra evidence — a bad env value or replica-write problem must
    // not cost the round its primary numbers
    val scaledJson = try {
      val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
      val fullCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_FULL", "5").toInt
      val fullJson =
        if (fullCopies <= 0) ""
        else s""","full":${scaledPass(fullCopies, names, "scaled-full")}"""
      if (copies <= 0 && fullJson.isEmpty) ""
      else if (copies <= 0) s""","scaled":{${fullJson.stripPrefix(",")}}"""
      else {
        val head = scaledPass(copies,
          names.filter { case (n, _) => headline.contains(n) }, "scaled")
        s""","scaled":${head.stripSuffix("}")}$fullJson}"""
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] scale-curve pass skipped: $e"); ""
    }

    // streaming throughput points: drain P published pages of the REST
    // cardex source in micro-batch mode with admission control
    // (maxPagesPerTrigger). Round-8 lesson: a 64-page drain finishes in
    // ~1.8 s, of which batch-0 warmup (state-store + sink init, first
    // codegen) is ~30% — the aggregate rows/s swung ±50% run to run and
    // produced an unreproducible headline number. So each point now
    // drains enough batches to amortize warmup AND reports a warm/steady
    // split: `rows_per_sec` is the whole-run figure, `steady_rows_per_sec`
    // excludes the first non-empty batch and divides by the SUM OF BATCH
    // DURATIONS (not wall time, so inter-batch scheduling gaps don't
    // count as throughput). A second `wide` point at 10k rows/page
    // separates per-batch overhead from per-row cost. fail-soft like the
    // scale curve.
    def streamPoint(pages: Int, rowsPerPage: Int, perTrigger: Int): String = {
      val runId = s"bench-${java.util.UUID.randomUUID()}"
      graft.sources.rest.FakeCardexApi.publishPages(runId, pages)
      val ckpt = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-bench-stream-${java.util.UUID.randomUUID()}").getAbsolutePath
      // recentProgress retains only numRecentProgressUpdates entries
      // (default 100): past ~800 pages at 8/trigger the oldest batches
      // would silently drop out of the rows/batches numerators. Size the
      // retention to the worst-case batch count (+ slack for empty/flush
      // batches) so every point stays exact regardless of env overrides.
      spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
        math.max(100, pages / math.max(1, perTrigger) + 16).toString)
      try {
        // default ProcessingTime(0) trigger, NOT AvailableNow: the
        // source honors maxPagesPerTrigger only outside AvailableNow
        // (which by contract drains to its pinned offset in one go), and
        // the admission-controlled multi-batch path is the one worth
        // timing — it is how a rate-limited API is actually consumed
        val t0 = System.nanoTime()
        val q = spark.readStream
          .format("graft.sources.rest.RestCardexSource")
          .option("pages", pages)
          .option("rowsPerPage", rowsPerPage)
          .option("apiRunId", runId)
          .option("maxPagesPerTrigger", perTrigger)
          .load()
          .writeStream
          .format("noop")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val progress = q.recentProgress.filter(_.numInputRows > 0)
        q.stop()
        val rows = progress.map(_.numInputRows).sum
        val ms = progress.map(_.batchDuration.toString).mkString("[", ",", "]")
        val steady = progress.drop(1)
        val steadyRows = steady.map(_.numInputRows).sum
        val steadyMs = steady.map(_.batchDuration).sum
        val steadyRps =
          if (steadyMs <= 0) 0.0 else steadyRows * 1000.0 / steadyMs
        s"""{"pages":$pages,"rows_per_page":$rowsPerPage,"rows":$rows,"batches":${progress.length},"sec":$sec,"rows_per_sec":${rows / math.max(sec, 1e-9)},"steady_rows":$steadyRows,"steady_ms":$steadyMs,"steady_rows_per_sec":$steadyRps,"batch_ms":$ms}"""
      } finally {
        graft.sources.rest.FakeCardexApi.resetRun(runId)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt)); ()
      }
    }
    // streaming state-SCALE point (round-10 ask #5): the replay oracles
    // run 4 batches over sf0.01-sized feeds — this instead pushes >=1e5
    // distinct state keys through the RocksDB store (windowed agg over
    // the deterministic rate-micro-batch source: batch b carries exactly
    // `keys` rows, value % keys sweeps the full key space every batch,
    // event time advances one window per batch) and records the
    // state-store metrics PER BATCH. The eviction proof is in the
    // numbers: without watermark eviction `batches` x `keys` windowed
    // rows would accumulate (~1.8M at defaults); with the 2-minute
    // watermark over 1-minute windows the store plateaus at exactly 4
    // live windows x keys (Spark's two-watermark model evicts on the
    // PREVIOUS batch's watermark, one window behind the naive count).
    // `bounded` asserts that plateau (last batch's numRowsTotal <= 4x
    // keys — tight: one extra un-evicted window flips it) so a silent
    // eviction regression flips a field the round-over-round diff can't
    // miss.
    def statePoint(keys: Int, batches: Int): String = {
      val ckpt = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-bench-state-${java.util.UUID.randomUUID()}").getAbsolutePath
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProvider = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
        math.max(100, batches + 16).toString)
      try {
        val t0 = System.nanoTime()
        val q = spark.readStream
          .format("rate-micro-batch")
          .option("rowsPerBatch", keys)
          .option("startTimestamp", 0L)
          .option("advanceMillisPerBatch", 60000)
          .load()
          .withWatermark("timestamp", "2 minutes")
          .groupBy(
            org.apache.spark.sql.functions.window(
              org.apache.spark.sql.functions.col("timestamp"), "1 minute"),
            (org.apache.spark.sql.functions.col("value") % keys).as("k"))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum("value").as("s"))
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .start()
        // rate-micro-batch is unbounded: drive exactly `batches` batches,
        // then stop (guard: 300 s wall cap so a wedged store can't hang
        // the whole bench)
        val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
        while (Option(q.lastProgress).map(_.batchId).getOrElse(-1L) < batches - 1
               && System.nanoTime() < deadline)
          Thread.sleep(50)
        val progress = q.recentProgress.filter(_.numInputRows > 0).take(batches)
        q.stop()
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = progress.map(_.numInputRows).sum
        def stateMetric(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
          progress.map(p => p.stateOperators.headOption.fold(0L)(f))
        val stateRows = stateMetric(_.numRowsTotal)
        val stateMem = stateMetric(_.memoryUsedBytes)
        val updated = stateMetric(_.numRowsUpdated)
        val removed = stateMetric(_.numRowsRemoved)
        val bounded = stateRows.lastOption.exists(_ <= 4L * keys)
        val ms = progress.map(_.batchDuration.toString).mkString("[", ",", "]")
        s"""{"keys":$keys,"batches":${progress.length},"rows":$rows,"sec":$sec,"rows_per_sec":${rows / math.max(sec, 1e-9)},"provider":"rocksdb","state_rows":${stateRows.mkString("[", ",", "]")},"state_mem_bytes":${stateMem.mkString("[", ",", "]")},"state_rows_updated":${updated.mkString("[", ",", "]")},"state_rows_removed":${removed.mkString("[", ",", "]")},"bounded":$bounded,"batch_ms":$ms}"""
      } finally {
        prevProvider match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None => spark.conf.unset(providerKey)
        }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt)); ()
      }
    }
    val streamingJson = try {
      val pages = sys.env.getOrElse("SPARK_GRAFT_STREAM_PAGES", "512").toInt
      if (pages <= 0) "" else {
        val main = streamPoint(pages, rowsPerPage = 2000, perTrigger = 8)
        val wide = streamPoint(math.max(pages / 4, 8), rowsPerPage = 10000,
          perTrigger = 8)
        val state = statePoint(
          keys = sys.env.getOrElse("SPARK_GRAFT_STATE_KEYS", "150000").toInt,
          batches = sys.env.getOrElse("SPARK_GRAFT_STATE_BATCHES", "12").toInt)
        s""","streaming":${main.stripSuffix("}")},"wide":$wide,"state":$state}"""
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] streaming pass skipped: $e"); ""
    }

    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"raw":$raw,"sf":$sfNum$scaledJson$streamingJson}"""
    // Persist the FULL line as a file artifact too: the harness that
    // captures stdout keeps only a 2,000-char tail, which in round 8
    // silently dropped the entire main pass and the 10x headline block
    // from BENCH_r08. The committed BENCHFULL file is what makes rounds
    // comparable from artifacts alone. fail-soft: a read-only cwd must
    // not cost the stdout line.
    //
    // Clobber guard (round-10 incident): a NARROW run — SPARK_GRAFT_ONLY
    // set, or a run that timed zero queries — overwrote the committed
    // full-catalog artifact with a smoke line. Such runs now only write
    // when SPARK_GRAFT_BENCH_OUT names a destination explicitly; the
    // repo-default path is reserved for full-catalog passes.
    val benchOut = sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(
      if (only.isEmpty && results.nonEmpty) Some("/root/repo/BENCHFULL.json")
      else { System.err.println(
        "[bench] narrow run: BENCHFULL write skipped (set SPARK_GRAFT_BENCH_OUT to force)")
        None })
    benchOut.foreach { out =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] BENCHFULL write skipped: $e") }
    }
    // Stop Spark BEFORE printing so shutdown logging cannot interleave
    // with (or follow) the result line; the JSON is the final stdout line.
    spark.stop()
    println(line)
    System.out.flush()
  }
}
