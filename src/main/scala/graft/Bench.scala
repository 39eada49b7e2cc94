package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs every declared query plus
  * BASELINE.md-aligned stage benchmarks on `SPARK_GRAFT_SF_DIR`, prints ONE
  * JSON line (last stdout line) and writes the same JSON to `BENCH.out`.
  *
  * Methodology matches BASELINE.md exactly ("median of 3 runs, warm data"):
  * one untimed warm-up pass (JVM/codegen/page-cache warm-up — "warm data"),
  * then three timed rounds per case, report the per-case MEDIAN. Every case
  * is forced through a noop write so Catalyst cannot prune the projected
  * expressions or final sort (`.count()` would time projection queries as
  * bare scans). Cases run in sorted name order.
  *
  * Output hygiene (round-1 driver capture truncated the line): timings are
  * rounded to 4 decimals, and the full JSON is ALSO written to the file
  * `SPARK_GRAFT_BENCH_OUT` (default `/root/repo/BENCH.out`) so the numbers
  * survive any stdout mangling.
  *
  * Besides the declared queries, the output has keys matching BASELINE.md's
  * operator rows (`clean_data`, `encode_data`, `wrangle_na_fi`,
  * `transform_arcsinh`, `gelman_standardize`, `ols_normal_equations`) and a
  * `pipeline_e2e` chain — the whole-pipeline number the 2× bound binds on.
  * The JSON also carries `"mins"` (per-case min of the timed rounds) and
  * `"loadavg"` (start/end `/proc/loadavg`) so machine contamination is
  * distinguishable from a code regression.
  */
object Bench {

  // Force = fully evaluate the final plan. `toRdd` drain (count every
  // InternalRow of the executed plan via one mapPartitions+sum job)
  // evaluates exactly what the noop write evaluates — same executed plan,
  // same codegen, no column pruning of the final projection — minus the
  // V2 write-path commit machinery: an empty one-row action costs 34 ms
  // drained vs 65 ms noop-written (tools/FloorProbe2), and on the 19-case
  // q0*/q4* A/B the drain cut a further 1.1 s off the case-major subset
  // total (7.68 → 6.61 s, ~56 ms/case, no per-case min worse). With ~100
  // of the 140 cases under a second, that fixed overhead was ~1/10 of
  // their measured "cost". SPARK_GRAFT_BENCH_FORCE=noop restores the old
  // path for A/B.
  private val forceMode = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORCE", "drain")
  private def force(df: DataFrame): Unit =
    if (forceMode == "noop") df.write.format("noop").mode("overwrite").save()
    else {
      val _ = df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }.sum()
    }

  /** 1/5/15-min load averages ("-" off Linux): recorded at bench start and
    * end so a contended machine is visible in the JSON itself.
    */
  private def readLoadAvg(): String =
    try {
      val s = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      s.split("\\s+").take(3).mkString(" ")
    } catch { case _: Throwable => "-" }

  def main(args: Array[String]): Unit = {
    val loadStart = readLoadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE: spark.sql.adaptive.coalescePartitions.parallelismFirst stays
      // at its default (true). The tuning-guide "false" posture was A/B'd
      // in round 4: it coalesces small-SF sorts/aggregates onto too few
      // cores and cost +5 s total (q28 +1.4 s, q34 +1.3 s); the advisory-
      // size posture belongs on a real cluster, not a 32-core bench box
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.functions._
    import graft.core.{GraftFrame, Tables}

    def li = Tables(spark, sfDir).lineitem

    def withNa =
      li.select(
        col("l_extendedprice"),
        when(col("l_orderkey") % 19 === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity")).as("l_quantity"),
        col("l_discount"), col("l_tax"), col("l_returnflag"))

    // BASELINE.md operator-equivalents (same columns/shapes as the
    // pandas/numpy baselines), each one lazy plan forced once
    val stageCases: Seq[(String, () => Unit)] = Seq(
      "clean_data" -> (() =>
        force(graft.core.Sanitize.columnWrangler(graft.clean.CleanData.convertDtypes(li)))),
      "encode_data" -> (() => {
        val gf = graft.clean.CleanData.factorWrangler(
          GraftFrame(li.select("l_returnflag", "l_linestatus", "l_quantity")),
          strToCat = true, dummyToBool = false)
        force(graft.encode.EncodeData(gf).df)
      }),
      "wrangle_na_fi" -> (() =>
        force(graft.na.WrangleNa.fi(GraftFrame(withNa.drop("l_returnflag"))).df)),
      "transform_arcsinh" -> (() =>
        force(graft.transform.TransformData(
          GraftFrame(li.select("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).df)),
      "gelman_standardize" -> (() =>
        force(graft.transform.GelmanStandardize(
          GraftFrame(li.select("l_quantity", "l_extendedprice", "l_discount", "l_tax"))).df)),
      "ols_normal_equations" -> (() => {
        graft.model.RunModel(
          li.select("l_extendedprice", "l_quantity", "l_discount", "l_tax"),
          "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"))
        ()
      }),
      "pipeline_e2e" -> (() => {
        val cleaned = graft.clean.CleanData.factorWrangler(
          GraftFrame(withNa), strToCat = true, dummyToBool = false)
        val encoded  = graft.encode.EncodeData(cleaned)
        val imputed  = graft.na.WrangleNa.fi(encoded)
        val standard = graft.transform.GelmanStandardize(imputed)
        graft.model.RunModel(
          standard.df, "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"))
        ()
      }))

    val queryCases: Seq[(String, () => Unit)] =
      SparkEntry.queries.toSeq.map { case (name, fn) => name -> (() => force(fn(spark, sfDir))) }

    // SPARK_GRAFT_BENCH_ONLY=q126,q128 runs only cases whose name starts
    // with a listed prefix — an iteration aid; the per-round driver bench
    // leaves it unset and runs everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty))
    val cases = (queryCases ++ stageCases)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .sortBy(_._1)
    if (cases.isEmpty) {
      System.err.println(
        s"[bench] SPARK_GRAFT_BENCH_ONLY=${sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")} " +
          "matched ZERO cases — check the prefixes")
      spark.stop()
      sys.exit(2)
    }
    // untimed warm-up pass, then 3 timed rounds, per-case MEDIAN — the
    // BASELINE.md methodology ("median of 3 runs, warm data")
    for ((name, run) <- cases) {
      try run()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
    }
    val rounds  = 3
    val timings = scala.collection.mutable.Map.empty[String, List[Double]]
    val errored = scala.collection.mutable.SortedSet.empty[String]
    // CASE-major: a case's 3 timed rounds run back-to-back (warm JIT,
    // warm page cache, no 139 intervening cases re-polluting either),
    // instead of the old round-major sweep where round 2 of a case came
    // ~110 s after round 1 — and how the pandas baseline itself was timed
    // (3 consecutive repeats). Measured on the 19-case q0*/q4* subset:
    // medians 10.32 → 7.68 s total under the same noop force (the old
    // medians were carrying cross-case cache pollution, not query cost),
    // NO per-case min worse (sum of mins also dropped).
    // SPARK_GRAFT_BENCH_ORDER=round restores the old order for A/B.
    val roundMajor = sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("round")
    val schedule =
      if (roundMajor) for (r <- 1 to rounds; c <- cases) yield c
      else for (c <- cases; r <- 1 to rounds) yield c
    for ((name, run) <- schedule) {
      val t0 = System.nanoTime()
      // a failed round contributes NO timing (time-to-failure would read as
      // misleadingly fast); the case is flagged in the JSON "errors" list
      val ok =
        try { run(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name: ${e.getMessage}"); errored += name; false
        }
      if (ok) {
        val sec = (System.nanoTime() - t0) / 1e9
        timings.updateWith(name)(prev => Some(sec :: prev.getOrElse(Nil)))
      }
    }
    def median(xs: List[Double]): Double = xs.sorted.apply(xs.size / 2)
    def r4(d: Double): String            = "%.4f".formatLocal(java.util.Locale.ROOT, d)

    val names = cases.map(_._1)
    val med   = names.flatMap(n => timings.get(n).filter(_.nonEmpty).map(xs => n -> median(xs))).toMap
    val qs = names
      .map(n => "\"" + n + "\":" + med.get(n).map(r4).getOrElse("null"))
      .mkString("{", ",", "}")
    // per-case MIN alongside the median: on a contended machine the median
    // absorbs scheduler noise but the min stays close to the true cost, so a
    // loaded host can't masquerade as a code regression (VERDICT r3: driver
    // measured 79.4 s where idle hardware gives 52.1 s)
    val mins = names
      .map(n => "\"" + n + "\":" + timings.get(n).filter(_.nonEmpty).map(xs => r4(xs.min)).getOrElse("null"))
      .mkString("{", ",", "}")
    val total = med.values.sum
    val errs  = errored.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadEnd = readLoadAvg()
    val load    = s"""{"start":"$loadStart","end":"$loadEnd"}"""
    // The BASELINE.md binding gate — whole-pipeline within 2× of the summed
    // pandas/numpy stage baselines at the same SF — computed HERE so the
    // committed artifact carries the gate evidence itself (VERDICT r9: the
    // gate had to be re-measured by hand because only load-inflated medians
    // survived). Ratio is reported on both the median (BASELINE.md
    // methodology) and the min (load-noise floor); the gate binds on the
    // median with the min as the contamination check.
    val baselinePipeline: Option[Double] =
      if (sfDir.endsWith("sf0.1")) Some(0.6328)
      else if (sfDir.endsWith("sf0.01")) Some(0.0756)
      // sf1 (benchdata, 6M lineitem rows): measured by tools/
      // pandas_baseline.py (same median-of-3, pre-loaded methodology;
      // the script under-reports the r1 sf0.1 committed value 0.633 s
      // as 0.490 s — mostly clean_data — so this sf1 figure makes the
      // gate STRICTER than the original calibration, not looser)
      else if (sfDir.endsWith("/sf1")) Some(6.8912)
      else None
    val gate = (for {
      base <- baselinePipeline
      pipeMed <- med.get("pipeline_e2e")
      pipeMin <- timings.get("pipeline_e2e").filter(_.nonEmpty).map(_.min)
    } yield s"""{"pipeline_e2e_median":${r4(pipeMed)},"pipeline_e2e_min":${r4(
        pipeMin)},"baseline_sec":${r4(base)},"ratio_median":${r4(pipeMed / base)},"ratio_min":${r4(
        pipeMin / base)},"bound":2.0,"pass":${pipeMed / base <= 2.0}}""").getOrElse("null")
    // every appended record names its measurement mode: force (drain|noop)
    // and order (case|round) both move reported times ~25%+ (ADVICE r12),
    // so a BENCH.out line must be self-describing or historical trend
    // comparisons silently mix methodologies
    val mode = s""""force":"$forceMode","order":"${if (roundMajor) "round" else "case"}""""
    val json =
      s"""{"record":"total","metric":"total","value":${r4(total)},"unit":"sec",$mode,"queries":$qs,"mins":$mins,"gate":$gate,"errors":$errs,"loadavg":$load,"sf":"$sfDir"}"""
    val minsLine =
      s"""{"record":"mins","unit":"sec",$mode,"queries":$mins,"gate":$gate,"errors":$errs,"loadavg":$load,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH.out")
    // Query names on the PREVIOUSLY PARSED surface, read BEFORE this run
    // appends its own records (r17, VERDICT r16 #3): the driver's stdout
    // capture keeps only the last ~2000 chars, so the parsed compact line
    // can never carry all ~150 per-case timings — but by including the
    // previously-printed names FIRST, each round's parsed map is a
    // SUPERSET of the last round's and the round-over-round comparator
    // stops reporting phantom "dropped" cases whenever the top-slowest
    // boundary churns (r16: six phantom drops). Two sources, union'd:
    // the last "record":"compact" line this harness appended to BENCH.out
    // (intra-round continuity), and the newest committed BENCH_r<N>.json
    // driver record (exactly the map next round's comparator diffs
    // against). This read affects only WHICH names appear in the compact
    // stdout line — never a timing, plan, or result; the complete
    // per-case data is in the BENCH.out total/mins records either way.
    val prevKeys: Seq[String] = {
      // lastIndexOf: a driver record's "tail" field holds ESCAPED copies
      // of earlier lines (\"queries\":…) before the "parsed" section — the
      // last UNESCAPED occurrence is the parsed queries map; the key
      // regex is word-only so escaped keys (name\") never match
      def queriesKeys(text: String): Seq[String] = {
        val start = text.lastIndexOf("\"queries\":{")
        if (start < 0) Seq.empty
        else {
          val open  = text.indexOf('{', start)
          val close = text.indexOf('}', open)
          if (open < 0 || close < 0) Seq.empty
          else "\"([A-Za-z0-9_]+)\"\\s*:".r
            .findAllMatchIn(text.substring(open + 1, close)).map(_.group(1)).toSeq
        }
      }
      val fromCompact: Seq[String] =
        try {
          val src = scala.io.Source.fromFile(outFile)
          val last = try src.getLines().filter(_.contains("\"record\":\"compact\""))
            .foldLeft("")((_, l) => l)
          finally src.close()
          queriesKeys(last)
        } catch { case _: Throwable => Seq.empty }
      val fromDriverRecord: Seq[String] =
        try {
          val dir = java.nio.file.Paths.get(outFile).toAbsolutePath.getParent.toFile
          Option(dir.listFiles((_: java.io.File, n: String) => n.matches("BENCH_r\\d+\\.json")))
            .getOrElse(Array.empty[java.io.File])
            .sortBy(f => "\\d+".r.findFirstIn(f.getName).fold(0)(_.toInt))
            .lastOption
            .map(f => queriesKeys(new String(
              java.nio.file.Files.readAllBytes(f.toPath),
              java.nio.charset.StandardCharsets.UTF_8).replaceAll("\\s", "")))
            .getOrElse(Seq.empty)
        } catch { case _: Throwable => Seq.empty }
      (fromCompact ++ fromDriverRecord).distinct
    }
    // The driver keeps only the LAST ~2000 chars of stdout; with 70+ cases
    // the full line above is ~4 KB, so its head is cut and it never parses
    // (BENCH_r05..r07 all landed with "parsed": null). Print a second,
    // COMPACT JSON line last: if the full line fits the window it is
    // reprinted verbatim, otherwise the "queries" map is curated down to
    // the BASELINE.md-aligned cases plus the slowest declared queries and
    // a "full":"BENCH.out" pointer to the complete per-case data.
    // 1850 with ~150 trailing chars of headroom inside the 2000-char
    // capture for sbt's [success] line and newlines; timings in the
    // compact line are 3-decimal (ms resolution — the 4-decimal full
    // record is in BENCH.out) so ~8% more cases fit the window
    val tailWindow = 1850
    def r3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val compact =
      if (json.length <= tailWindow) json
      else {
        val baselineKeys = Seq(
          "q01_pricing_summary", "q02_mktsegment_revenue",
          "q03_top2_orders_per_cust", "q11_events_tumbling_1h",
          "q15_text_lang_stats") ++ stageCases.map(_._1)
        // inclusion priority: gate/baseline keys, then every name the
        // previous parsed surface printed (superset property — see
        // prevKeys) ordered slowest-first by THIS run so any forced trim
        // drops the cheapest, then the remaining cases slowest-first
        // while the window holds
        val mustKeep = baselineKeys.filter(med.contains) ++
          prevKeys.filter(n => med.contains(n) && !baselineKeys.contains(n))
            .sortBy(n => -med(n))
        val slowest = med.toSeq
          .filterNot { case (n, _) => mustKeep.contains(n) }
          .sortBy(-_._2).map(_._1)
        // the errors list needs the same budgeting as the queries map: a
        // mass-failure round (bad SF dir → ~80 errored cases) would
        // otherwise overflow the window with error names alone — exactly
        // the diagnostic case this line exists for
        val errsC =
          if (errored.size <= 5) errs
          else (errored.take(5).map("\"" + _ + "\"").toSeq :+ s""""+${errored.size - 5} more"""")
            .mkString("[", ",", "]")
        def render(keys: Seq[String]): String = {
          val qsC = keys
            .flatMap(n => med.get(n).map(v => "\"" + n + "\":" + r3(v)))
            .mkString("{", ",", "}")
          s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$qsC,"gate":$gate,"n_cases":${names.size},"full":"BENCH.out","errors":$errsC,"loadavg":$load,"sf":"$sfDir"}"""
        }
        // trim mustKeep from the END if it alone overflows (can only
        // happen if the window shrinks — never silently exceed it: an
        // over-window line is truncated at its HEAD by the capture and
        // parses as nothing at all)
        var keep = mustKeep
        while (keep.nonEmpty && render(keep).length > tailWindow) keep = keep.init
        // grow the slowest-query list while the line still fits the window
        var idx  = 0
        var next = render(keep)
        var line = next
        while (idx < slowest.length && {
            next = render(keep :+ slowest(idx)); next.length <= tailWindow
          }) {
          keep = keep :+ slowest(idx)
          line = next
          idx += 1
        }
        line
      }
    // APPEND the records (mins, the full total line, and the compact line
    // actually printed — tagged "record":"compact" so the NEXT run can
    // read back exactly the previously parsed surface for the superset
    // property above) so no later write can destroy the gate evidence;
    // each line is a complete JSON record tagged by "record". Filtered
    // (BENCH_ONLY) runs don't append — a subset total would pollute the
    // artifact's run history.
    val compactRecord =
      if (compact eq json) "" // everything fit — the total record IS the parsed surface
      else "{\"record\":\"compact\"," + compact.stripPrefix("{") + "\n"
    if (only.isEmpty) {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(outFile),
        (minsLine + "\n" + json + "\n" + compactRecord)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Throwable => System.err.println(s"[bench] write $outFile: ${e.getMessage}") }
    }
    spark.stop()
    // the JSON lines are the FINAL stdout lines (spark.stop() first so no
    // shutdown logging lands after them); build.sbt sets
    // run/outputStrategy := StdoutOutput so sbt passes them through bare
    // instead of wrapping them in an [info] prefix. The full line prints
    // first, the compact line LAST — the capture window keeps the tail.
    println(json)
    println(compact)
  }
}
