package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** One bench execution of a query: action inside ShuffleSizing.scoped (a
    * sizing raise from one operator must not pin the next query's plan in
    * this shared session), operator caches dropped afterwards. Extracted so
    * the spec can assert the restore against the runner's real code path. */
  private[graft] def runOnce(spark: SparkSession, sfDir: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    try graft.core.ShuffleSizing.scoped(spark) { fn(spark, sfDir).count(); () }
    finally {
      graft.core.Caches.releaseAll() // drop operator-taken caches
      // localCheckpoint blocks (the operators' pin discipline) are freed
      // only when the driver GCs their RDD references and the async
      // ContextCleaner processes them — in a 100+-query shared session
      // they pile up in the block manager and squeeze unified memory for
      // every LATER query (measured round 19: sub-second vocab queries ran
      // 2× slower late in the full run than isolated). Between bench
      // queries nothing references them — drop them synchronously. Temp
      // views a query registered must go WITH their blocks: a view whose
      // pinned backing blocks were just dropped is unrecoverable
      // (checkpoint lineage is truncated), and bench queries are
      // self-contained by contract anyway.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.listTables().collect()
        .filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
    }

  /** The compact-line key of a query name (`q79_bpe_pairs` → `q79`) —
    * unique by construction (main's shortKey logic falls back to the full
    * name on a collision, which maps to itself here). The baseline map and
    * every lookup into it normalize through this, because filed artifacts
    * key the healthy `parsed` block by SHORT names while the runner holds
    * FULL names — r14's guard missed every lookup over that mismatch. */
  private[graft] def shortKeyOf(name: String): String = name.split("_")(0)

  /** Tolerant per-query extraction from a prior round's filed bench record:
    * a regex scan, not a JSON parse, because the one record this guard most
    * needs to read is precisely the TRUNCATED one (r13's parsed:null tail) —
    * whatever query/seconds pairs survive are the baseline. Two filed
    * shapes, BOTH of which r14's naive scan missed (the guard never armed):
    * entries inside the JSON-escaped `"tail"` string are literally
    * `\"q79_bpe_pairs\":3.503` — the backslash before the closing quote
    * defeats a plain `"name":` scan — so the text is unescaped wholesale
    * before scanning; and names normalize to their qNN prefix (see
    * [[shortKeyOf]]). The same entry recovered from several shapes agrees
    * (all filed values round to 3 decimals); keeping the max means a value
    * cut mid-number by tail truncation can only make the baseline
    * conservative, never a false regression flag. Spec-pinned against the
    * LITERAL BYTES of the filed r13 (truncated) and r14 artifacts. */
  private[graft] def parseBaseline(text: String): Map[String, Double] = {
    val unescaped = text.replace("\\\\", "\\").replace("\\\"", "\"")
    """"(q\d+[A-Za-z0-9_]*)"\s*:\s*(\d+(?:\.\d+)?)""".r
      .findAllMatchIn(unescaped)
      .map(m => shortKeyOf(m.group(1)) -> m.group(2).toDouble).toSeq
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      .filter(_._2 > 0)
  }

  /** Per-query MEDIAN across the last few filed rounds. A single-last-
    * round baseline is poisoned by exactly the artifact the guard exists
    * to prevent: r16 filed contaminated numbers (same code, loaded
    * machine), and an r17 guard reading only r16 compared against
    * inflated values and barely armed. The median of three rounds
    * tolerates ONE bad round in either direction while still tracking a
    * legitimate two-round shift (two rounds at a new level outvote the
    * old). Queries missing from some rounds (newly added) use the rounds
    * that have them. */
  private[graft] def combineBaselines(
      rounds: Seq[Map[String, Double]]): Map[String, Double] = {
    val keys = rounds.flatMap(_.keys).toSet
    keys.iterator.map { k =>
      val vs = rounds.flatMap(_.get(k)).sorted
      val med =
        if (vs.length % 2 == 1) vs(vs.length / 2)
        else (vs(vs.length / 2 - 1) + vs(vs.length / 2)) / 2.0
      k -> med
    }.filter(_._2 > 0).toMap
  }

  /** The cross-round regression tiers, against the last FILED median with
    * a material-gap floor (>0.3 s — sub-second queries jitter
    * multiplicatively). Catches what the spread detector and the loadavg
    * bound both miss: a SUSTAINED background-load plateau slows every run
    * uniformly (r13's q20–q27 block). TWO tiers because one wasn't
    * enough: r16's q89 drifted to 1.49× under load and slid in just under
    * a single 1.5× trigger, filing a contaminated number unchallenged —
    * so the RETRY tier fires earlier (>1.3×, cheap: one extra clean
    * sample set) while the SUSPECT flag that taints the filed artifact
    * keeps the stricter 1.5× bar. Extracted for the spec. */
  private[graft] def driftedAgainst(baseline: Map[String, Double],
      name: String, median: Double): Boolean =
    baseline.get(shortKeyOf(name)).exists(b => b > 0 && median > 1.3 * b
      && median - b > 0.3)

  private[graft] def regressedAgainst(baseline: Map[String, Double],
      name: String, median: Double): Boolean =
    baseline.get(shortKeyOf(name)).exists(b => b > 0 && median > 1.5 * b
      && median - b > 0.3)

  /** EXTERNAL cpu-cores consumed during a run: machine-wide busy cores
    * minus this JVM's own — the contention signal loadavg cannot give
    * (load1 is a trailing 1-minute EWMA that carries OUR OWN previous
    * query's burst into the next query's samples; r16/r18 both filed
    * medians whose "load" was partly the bench itself). Busy cores come
    * from a /proc/stat delta over exactly the run's wall window, own cores
    * from the process cpu-time delta — both instantaneous-window, no lag.
    * Clamped at 0 (scheduler jitter can put own above total briefly). */
  private[graft] def externalCores(busyCores: Double, ownCores: Double): Double =
    math.max(0.0, busyCores - ownCores)

  /** A sample set is CONTENDED when every run saw external load above
    * `bound` cores — min-of-set, so one stray cron tick doesn't flag a
    * clean set, while a plateau that covered all runs does. Flagged
    * entries file as `contended` in the artifact: the number is recorded
    * (the driver needs a complete record) but marked untrustworthy as a
    * baseline, which is the separation the r18 judge had to reconstruct
    * from SCALE.md by hand. */
  private[graft] def contendedSet(externals: Seq[Double], bound: Double): Boolean =
    externals.nonEmpty && externals.min > bound

  /** How many samples a set should still take after seeing its first:
    * genuinely heavy queries get ONE sample per set. The seven end-to-end
    * pipeline compositions (q74/q89/q90/q96/q100/q105/q112, ~12-22 s each)
    * at 3 reps plus retry sets pushed the round-19 driver bench past its
    * budget (BENCH_r19.json rc 124 — the third round without a usable
    * filed artifact). Their run-to-run variance is already tracked by the
    * ScaleBench tiers, and at 12+ s wall the one-time codegen cost a
    * multi-rep median exists to amortize is noise — so a set whose FIRST
    * sample lands at/above 2×`heavySec` stops there.
    *
    * MEASUREMENT FIX (r21, documented in OPTIMIZATION_r21.md): the r20
    * rule single-sampled at `heavySec` itself, which made the filed number
    * of a 5–10 s-COLD query depend on suite-order codegen luck — q29's
    * first in-suite run went 3.1 s → 7.4 s (and its FILED number 2.6 →
    * 7.4, flagged suspect) when an unrelated earlier query's plan change
    * stopped pre-warming its generated code; isolated, the query is a
    * 2.0 s-warm / 6.3 s-cold constant at both commits. In the [heavySec,
    * 2×heavySec) borderline zone cold ≈ 3× warm, so the cold single
    * sample is mostly compile time, not the query — those sets now keep
    * the full median-of-N discipline (the median of [cold, warm, warm] is
    * a warm run, the same statistic every sub-5 s query always filed).
    * Measured budget cost: ~6 borderline queries × 2 extra warm runs ≈
    * +40 s of a ~380 s sampling phase. A budget overrun still forces
    * single-sample for everything left: a degraded-but-complete artifact
    * beats rc 124. */
  private[graft] def samplesPlanned(firstWall: Double, heavySec: Double,
      runs: Int, overBudget: Boolean): Int =
    if (overBudget || firstWall >= 2.0 * heavySec) 1 else runs

  /** Retry-set cap by weight class: heavy queries re-sample at most ONCE
    * (a retry doubles a 20 s query's cost; two could triple it), light
    * queries keep the configured cap, nothing retries past the budget. */
  private[graft] def retryCap(heavy: Boolean, maxRetries: Int,
      overBudget: Boolean): Int =
    if (overBudget) 0 else if (heavy) math.min(maxRetries, 1) else maxRetries

  /** The filed artifact's "baseline" field: a JSON ARRAY of the paths the
    * baseline medians came from (or null when none) — not a comma-joined
    * string, so consumers can tell the multi-round median baseline from a
    * single pinned file without string-splitting. Extracted for the
    * spec. */
  private[graft] def baselineJson(paths: Seq[String],
      esc: String => String): String =
    if (paths.isEmpty) "null"
    else paths.map(p => "\"" + esc(p) + "\"").mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // the GraftSession.builder codegen-cache sizing (see there for the
      // measured rationale): the bench runs 114 distinct queries in one
      // session — the 100-entry default thrashes and every run of every
      // pipeline query re-compiles ~500 generated classes with all tasks
      // blocked on each compile. Scale-independent (a long-lived session
      // wants this everywhere); the timing methodology is unchanged — the
      // first run of each shape still pays its compiles.
      .config("spark.sql.codegen.cache.maxEntries", sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/datasource paths so the first measured query does
    // not absorb one-time session costs
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // median of N runs per query: single-run timings on a shared machine
    // swing several-fold with zero code change, making regressions unreadable
    val runs = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.toIntOption).getOrElse(3))
    // optional comma-separated name filter (substring match) for profiling a
    // single query without paying for the whole suite
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.isEmpty || filter.exists(name.contains) }
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines().next()
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // machine-wide busy jiffies (user+nice+system+irq+softirq+steal) — the
    // instantaneous-window side of the external-load measurement
    def busyJiffies(): Long =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines()
          .next().trim.split("\\s+").drop(1).map(_.toLong)
        // cpu line: user nice system idle iowait irq softirq steal guest
        // guest_nice — keep user+nice+system+irq+softirq+steal; drop
        // idle/iowait AND the guest fields (guest time is already counted
        // inside user/nice; summing it would double-count VM co-tenants)
        f.take(8).zipWithIndex
          .collect { case (v, i) if i != 3 && i != 4 => v }.sum
      } catch { case _: Throwable => -1L }
    val jiffyHz = 100.0 // Linux USER_HZ as exposed via /proc/stat
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def ownCpuNanos(): Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)
    // per-query contention evidence: four straight rounds of filed medians
    // needed an idle re-bench because a single exit-time loadavg could not
    // show WHICH queries ran contended. Keep every run's wall time plus a
    // loadavg sample per run, and self-flag queries whose max/min spread
    // says the runs did not see the same machine.
    //
    // r11 went further: the harness DETECTED seven contended queries (loadavg
    // samples up to 8.4) and filed their medians anyway — a 105 s record whose
    // true idle cost was 49 s. A bench that self-detects contention must not
    // file it: re-sample flagged queries up to SPARK_GRAFT_BENCH_RETRIES extra
    // rounds and keep the cleanest sample set, recording attempt counts so the
    // diag shows what was re-run.
    val maxRetries = math.max(0,
      sys.env.get("SPARK_GRAFT_BENCH_RETRIES").flatMap(_.toIntOption).getOrElse(2))
    // cross-round regression guard (r13's lesson): a SUSTAINED background
    // load plateau slows every run of a query uniformly, so the spread
    // detector sees "stable" and the loadavg bound (cpus/4) can sit above a
    // partial plateau — r13 filed a q20–q27 block 1.5–9× slower than r12
    // with unchanged code under load1 ≈ 4. The one signal that catches
    // uniform slowness is the LAST FILED ROUND: any query whose median
    // exceeds 1.5× its previously-filed time re-samples like a noisy one,
    // and if it stays slow it is flagged `suspect` in the artifact instead
    // of silently becoming the next round's baseline. The baseline file is
    // SPARK_GRAFT_BENCH_BASELINE or the highest BENCH_r*.json in cwd;
    // parsing is a tolerant regex scan, so a truncated record still yields
    // its surviving queries.
    // SPARK_GRAFT_BENCH_BASELINE pins ONE file; otherwise the per-query
    // MEDIAN of the last three filed rounds (see combineBaselines — one
    // contaminated filed round must not disarm the next round's guard)
    val baselinePaths: Seq[String] =
      sys.env.get("SPARK_GRAFT_BENCH_BASELINE").map(Seq(_)).getOrElse {
        val rx = """BENCH_r(\d+)\.json""".r
        Option(new java.io.File(".").listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .flatMap(f => f.getName match {
            case rx(n) => Some((n.toInt, f.getPath)); case _ => None
          }).sortBy(_._1).takeRight(3).map(_._2)
      }
    val baseline: Map[String, Double] = combineBaselines(baselinePaths.map { p =>
      try parseBaseline(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => Map.empty[String, Double] }
    })
    def regressed(name: String, median: Double): Boolean =
      regressedAgainst(baseline, name, median)
    def drifted(name: String, median: Double): Boolean =
      driftedAgainst(baseline, name, median)
    def medianOf(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    // sustained-background-load trigger: ALL of a set's per-run loadavg
    // samples above cpus/4 means something else owns the machine (min-of-set,
    // not max, so our own heavy queries' self-load spikes don't false-fire)
    val loadBound = sys.env.get("SPARK_GRAFT_BENCH_LOAD_BOUND")
      .flatMap(_.toDoubleOption)
      .getOrElse(cpus.toIntOption.getOrElse(32) / 4.0)
    def steadyOf(ts: Seq[Double]): Seq[Double] =
      if (ts.length >= 2) ts.drop(1) else ts // run 1 pays one-time codegen cost
    def spreadNoisy(ts: Seq[Double]): Boolean = {
      val s = steadyOf(ts)
      s.nonEmpty && s.max > 2.0 * s.min && s.max - s.min > 0.3
    }
    // external-cores bound for the `contended` artifact flag (and a retry
    // trigger): >2 cores of NOT-OURS cpu sustained across every run of a
    // set means another process owns part of the machine — r18's builder
    // run would have flagged q23 (ext ~5) and q100 (ext ~8-12) instead of
    // filing them as clean medians
    val extBound = sys.env.get("SPARK_GRAFT_BENCH_EXT_BOUND")
      .flatMap(_.toDoubleOption).getOrElse(2.0)
    // multi-second queries sample ONCE per set (see samplesPlanned); the
    // threshold is generous enough that every median-needing query (all
    // sub-second to ~2 s) keeps its reps
    val heavySec = sys.env.get("SPARK_GRAFT_BENCH_HEAVY_SEC")
      .flatMap(_.toDoubleOption).getOrElse(5.0)
    // soft wall budget for the whole sampling phase: past it, remaining
    // queries run once with no retries — a complete single-sample artifact
    // beats the driver's kill (r19 filed rc 124 / parsed:null)
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
      .flatMap(_.toDoubleOption).getOrElse(1200.0)
    val benchT0 = System.nanoTime()
    def overBudget(): Boolean = (System.nanoTime() - benchT0) / 1e9 > budgetSec
    final case class QueryStat(
        runTimes: Seq[Double], loads: Seq[Double], exts: Seq[Double],
        median: Double, failed: Boolean, attempts: Int)
    val stats = selected.map { case (name, fn) =>
      def takeSamples(): Seq[(Double, Double, Double)] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
        var planned = runs
        var i = 0
        while (i < planned) {
          val j0 = busyJiffies(); val c0 = ownCpuNanos()
          val t0 = System.nanoTime()
          try runOnce(spark, sfDir)(fn)
          catch {
            case e: Throwable =>
              // a throwing query must not bench as fast: remember the failure
              // and report -1 below instead of the (meaningless) wall time
              failures.getOrElseUpdate(name, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          }
          val wall = (System.nanoTime() - t0) / 1e9
          val j1 = busyJiffies(); val c1 = ownCpuNanos()
          val busy =
            if (j0 < 0 || j1 < 0 || wall <= 0) -1.0
            else (j1 - j0) / jiffyHz / wall
          val own =
            if (c0 < 0 || c1 < 0 || wall <= 0) -1.0
            else (c1 - c0) / 1e9 / wall
          val ext =
            if (busy < 0 || own < 0) -1.0 else externalCores(busy, own)
          buf += ((wall, load1(), ext))
          if (i == 0) {
            planned = samplesPlanned(wall, heavySec, runs, overBudget())
            if (failures.contains(name)) planned = 1 // re-running a thrower buys nothing
          } else if (overBudget()) {
            // r20's ADVICE: the budget was only consulted at set START, so
            // a multi-rep set begun just under the wire ran all its reps —
            // stop mid-set once the budget trips (the samples already taken
            // still file)
            planned = i + 1
          }
          i += 1
        }
        buf.toSeq
      }
      def isBad(s: Seq[(Double, Double, Double)]): Boolean = {
        val loads = s.map(_._2).filter(_ >= 0)
        // the loadavg trigger is min-of-SET by design (sustained load);
        // a single-sample heavy set has no "sustained" evidence and its
        // one post-run load1 sample is largely the query's OWN burst
        // (load1 is a trailing EWMA) — applying the bound there would
        // trip on every machine-saturating composition and burn its one
        // capped retry. External-cores and the drift tier, both
        // self-load-immune, still cover single samples.
        val loadTrip = s.length >= 2 && loads.nonEmpty && loads.min > loadBound
        spreadNoisy(s.map(_._1)) || loadTrip ||
          contendedSet(s.map(_._3).filter(_ >= 0), extBound) ||
          drifted(name, medianOf(s.map(_._1))) // retry tier: >1.3× filed
      }
      def spreadRatio(s: Seq[(Double, Double, Double)]): Double = {
        val st = steadyOf(s.map(_._1))
        if (st.isEmpty || st.min <= 0) 1.0 else st.max / st.min
      }
      var best = takeSamples()
      var attempts = 1
      // heavy sets retry at most once; past the budget nothing retries —
      // see retryCap. Heaviness is judged from the set's MAX wall (r20's
      // ADVICE: a first sample just under heavySec whose retries run
      // multi-second kept the full light-query retry cap)
      def capNow(): Int =
        retryCap(best.exists(_._1 >= heavySec), maxRetries,
          overBudget())
      while (!failures.contains(name) && isBad(best) && attempts <= capNow()) {
        val next = takeSamples()
        attempts += 1
        // keep the cleaner set: a clean set beats a flagged one; among equals
        // the smaller steady-state spread wins (NOT the lower median — picking
        // fastest-of-N would bias the filed numbers optimistic)
        best =
          if (isBad(best) && !isBad(next)) next
          else if (!isBad(best) && isBad(next)) best
          else if (spreadRatio(next) < spreadRatio(best)) next
          else best
      }
      // true median: even run counts average the two middle elements — the
      // upper-middle alone systematically inflates round-over-round compares
      val median = medianOf(best.map(_._1))
      // runTimes kept in RUN ORDER (not sorted): a spike's position matters —
      // run 1 slow = codegen warmup (expected), later runs slow = contention
      name -> QueryStat(best.map(_._1), best.map(_._2), best.map(_._3),
        median, failures.contains(name), attempts)
    }.toMap
    // failure marker: -1 is numeric (keeps the line machine-readable) and
    // unambiguous, since no real wall time is negative
    val results = stats.map { case (k, st) => k -> (if (st.failed) -1.0 else st.median) }
    // a query is noisy when, among its STEADY-STATE runs (run 1 dropped —
    // the first execution always pays one-time codegen/plan costs), the
    // slowest is >2x the fastest AND the gap is material (>0.3 s; sub-second
    // queries jitter multiplicatively without saying anything about the
    // medians' trustworthiness)
    val noisy = stats.collect {
      case (k, st) if !st.failed && spreadNoisy(st.runTimes) => k
    }.toSeq.sorted
    // which queries needed re-sampling (and how many sets were taken): the
    // audit trail for "these medians came from a retried, clean set"
    val retried = stats.collect {
      case (k, st) if st.attempts > 1 => k -> st.attempts
    }.toSeq.sortBy(_._1)
    // queries STILL >1.5× their last filed time after the retries: either a
    // real regression (root-cause it) or sustained contamination the machine
    // never shook — either way the filed number is not a trustworthy new
    // baseline and says so in the artifact
    val suspect = stats.collect {
      case (k, st) if !st.failed && regressed(k, st.median) =>
        k -> baseline(shortKeyOf(k))
    }.toSeq.sortBy(_._1)
    // queries whose FINAL kept set still saw sustained external cpu: the
    // number files (the record must be complete) but carries the flag so a
    // judge/driver separates machine from plan without cross-referencing
    // SCALE.md — the value is the set's max external cores
    val contended = stats.collect {
      case (k, st) if !st.failed &&
          contendedSet(st.exts.filter(_ >= 0), extBound) =>
        k -> (st.exts.filter(_ >= 0) :+ 0.0).max
    }.toSeq.sortBy(_._1)
    // queries whose kept set has ONE sample although multiple were
    // configured (heavy-query or over-budget single-sampling): the filed
    // number is a single run, not a median — say so in the artifact
    val single = stats.collect {
      case (k, st) if !st.failed && st.runTimes.length == 1 && runs > 1 => k
    }.toSeq.sorted
    val budgetHit = overBudget()
    // stdout values are rounded to 3 decimals: the driver keeps only the tail
    // of stdout (a ~2000-char window), and 60+ full-precision doubles push
    // the front of the line out of it — that truncation is what produced
    // three rounds of "parsed": null records. Millisecond precision is below
    // bench noise anyway; full precision lives in target/bench.json.
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // compact per-query keys for the FINAL stdout line: at 86 queries even
    // the rounded full-name line (~2.3 kB) outgrows the tail window, cutting
    // the leading "value" total off the filed record (r13's parsed:null).
    // The documented driver contract keys queries as {"q1":sec,…}, so the
    // last line — the one the tail capture always ends with, and the one
    // that must parse — uses the qNN prefix (unique by construction; a
    // collision falls back to the full name rather than dropping a query)
    val shortKey: Map[String, String] = {
      val pref = results.keys.map(k => k -> k.split("_")(0)).toMap
      val counts = pref.values.groupBy(identity).view.mapValues(_.size)
      pref.map { case (k, p) => k -> (if (counts(p) == 1) p else k) }
    }
    val qsShort = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + shortKey(k) + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // failed queries are excluded from the headline total
    val total = results.values.filter(_ >= 0).sum
    val load = load1() // exit-time 1-min loadavg (per-query samples in detail)
    // exception messages may carry quotes, backslashes, and newlines (Spark
    // AnalysisException is routinely multi-line) — escape all JSON-significant
    // and control characters so the hand-built diag stays machine-readable
    def jsonEscape(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }
    val failedJson = failures.map { case (k, v) =>
      "\"" + k + "\":\"" + jsonEscape(v) + "\""
    }.mkString("{", ",", "}")
    // two stdout lines, detail first: the full-name line for humans and
    // greps, then the compact line LAST so the driver's tail capture always
    // ends with one complete parseable record carrying the total + every
    // query
    val detailLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val stdoutLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsShort,"sf":"$sfDir"}"""
    // self-contained record: the full result (unrounded medians, run count,
    // per-query run times + per-run loadavg samples, the noisy-query flags,
    // failure detail) also lands in target/bench.json so the filed numbers
    // can be audited — and a contended run self-reports — even when the
    // driver's stdout capture truncates
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val detailJson = stats.toSeq.sortBy(_._1).map { case (k, st) =>
      s"\"" + k + "\":{\"runs\":" + st.runTimes.mkString("[", ",", "]") +
        ",\"load1\":" + st.loads.mkString("[", ",", "]") +
        ",\"ext\":" + st.exts.map(r3).mkString("[", ",", "]") +
        ",\"attempts\":" + st.attempts + "}"
    }.mkString("{", ",", "}")
    val noisyJson = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retriedJson = retried.map { case (k, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val suspectJson = suspect.map { case (k, b) => "\"" + k + "\":" + b }
      .mkString("{", ",", "}")
    val contendedJson = contended.map { case (k, e) => "\"" + k + "\":" + r3(e) }
      .mkString("{", ",", "}")
    val singleJson = single.map("\"" + _ + "\"").mkString("[", ",", "]")
    val baselineNote = baselineJson(baselinePaths, jsonEscape)
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfDir","runs":$runs,"loadavg1":$load,"noisy":$noisyJson,"retried":$retriedJson,"suspect":$suspectJson,"contended":$contendedJson,"single":$singleJson,"budget_hit":$budgetHit,"baseline":$baselineNote,"detail":$detailJson,"failed":$failedJson}"""
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"BENCH_DIAG could not write target/bench.json: $e")
    }
    // stderr diag; stdout keeps exactly the documented line shape (extra
    // keys after "sf" broke the driver's parse in r05/r06) — detail line
    // first, compact line LAST (see above)
    System.err.println(s"""BENCH_DIAG {"runs":$runs,"loadavg1":$load,"noisy":$noisyJson,"retried":$retriedJson,"suspect":$suspectJson,"contended":$contendedJson,"single":$singleJson,"budget_hit":$budgetHit,"failed":$failedJson}""")
    // contention evidence INTO the filed artifact: the driver keeps only a
    // ~2000-char stdout tail, so r14's undetected load plateau was invisible
    // to the next round's judge without target/bench.json. A compact diag
    // line between detail and compact lines (its OWN line — extra keys
    // inside the record broke the r05/r06 parse; the parseable record stays
    // last) carries the flags plus each flagged query's per-run max load1.
    // Bounded: per-query loads only for flagged queries, capped at 12 — a
    // clean round emits ~100 bytes and never crowds the compact line out of
    // the tail window.
    val flagged = (suspect.map(_._1) ++ noisy ++ retried.map(_._1) ++
      contended.map(_._1)).distinct.sorted.take(12)
    val flaggedLoads = flagged.flatMap(k => stats.get(k).map { st =>
      val mx = (st.loads.filter(_ >= 0) :+ -1.0).max
      "\"" + shortKeyOf(k) + "\":" + r3(mx)
    }).mkString("{", ",", "}")
    println(detailLine)
    println(s"""{"bench_diag":{"runs":$runs,"loadavg1":$load,"noisy":$noisyJson,"retried":$retriedJson,"suspect":$suspectJson,"contended":$contendedJson,"single":${single.length},"budget_hit":$budgetHit,"maxload":$flaggedLoads}}""")
    println(stdoutLine)
    spark.stop()
  }
}
