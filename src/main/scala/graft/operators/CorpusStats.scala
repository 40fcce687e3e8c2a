package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-level statistics and URL-policy operators for a web-crawl
 * pipeline — the per-host bookkeeping a 100 TB crawl needs around the
 * extraction kernel (the reference keys everything on the bare url,
 * /root/reference/src/queue.py:24-33, and has no host-level view at all;
 * these are the standard aggregations a distributed crawl adds first).
 *
 * Scale notes (100 TB):
 *  - hostProfile aggregates in TWO phases keyed on (host, source) first,
 *    so a hot host (a few domains hold double-digit percent of any real
 *    crawl) is split across many groups before the final per-host
 *    combine. The distinct-count never builds a per-host set: phase one
 *    dedups (host, source) pairs with map-side partial aggregation,
 *    phase two just counts rows. Both shuffles move tiny aggregate rows.
 *  - blockFlags joins the corpus against a blocklist by EQUALITY on
 *    exploded host suffixes (a host has at most label-count suffixes,
 *    ~4-6), so suffix matching is a broadcast hash join — never a LIKE
 *    scan or a cartesian theta-join. Blocklists (UT1-style) are
 *    config-sized: always broadcastable.
 *  - rareTokenStats is the two-pass corpus-frequency shape (count
 *    tokens corpus-wide, join the verdict back): both shuffles are keyed
 *    on xxhash64(token) — 8-byte keys, the token text never shuffles —
 *    and partial aggregation combines map-side, the same discipline as
 *    QualityFilters.lineDedupStats.
 */
object CorpusStats {

  /**
   * Per-host crawl profile with explicit skew handling: doc count,
   * distinct sources, total chars. Two-phase aggregation — phase one
   * groups by (host, source) which both pre-shards hot hosts and dedups
   * the distinct-count domain; phase two combines per host. Output is
   * integer-only (counts and BIGINT sums): exact and engine-portable.
   */
  def hostProfile(df: DataFrame, hostCol: String = "host",
                  srcCol: String = "source",
                  charsCol: String = "n_chars"): DataFrame = {
    val phase1 = df
      .groupBy(col(hostCol), col(srcCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(charsCol).cast("long")).as("chars"))
    // n_sources counts NON-NULL sources only — count(DISTINCT source)
    // semantics (a NULL source group still contributes its docs/chars but
    // is not a distinct source)
    phase1
      .groupBy(col(hostCol))
      .agg(sum(col("cnt")).cast("long").as("n_docs"),
        sum(when(col(srcCol).isNotNull, 1).otherwise(0)).cast("long")
          .as("n_sources"),
        sum(col("chars")).cast("long").as("sum_chars"))
  }

  /** All dot-boundary suffixes of a hostname, longest first:
    * "a.b.example.com" -> ["a.b.example.com", "b.example.com",
    * "example.com", "com"]. Pure codegen built-ins. */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /**
   * URL blocklist verdicts (RefinedWeb/UT1-style domain filtering): a
   * row is blocked when ANY dot-suffix of its host equals a blocklist
   * entry, so blocking "example.com" blocks every subdomain. The
   * suffix-set explode turns suffix matching into an equality join the
   * engine broadcasts; the blocked id set dedups before joining back.
   * Output: (idCol, hostCol, blocked 0/1).
   */
  def blockFlags(df: DataFrame, hostCol: String = "host",
                 idCol: String = "doc_id",
                 blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bl = blocked.toDF("sfx")
    val blockedIds = df
      .select(col(idCol), explode(hostSuffixes(col(hostCol))).as("sfx"))
      .join(broadcast(bl), "sfx")
      .select(col(idCol)).distinct()
      .withColumn("blocked", lit(1))
    df.join(blockedIds, Seq(idCol), "left")
      .select(col(idCol), col(hostCol),
        coalesce(col("blocked"), lit(0)).as("blocked"))
  }

  /**
   * Corpus-frequency rare-token quality score (the integer-exact analog
   * of CCNet's LM-based rarity bucketing): pass one counts every token
   * corpus-wide; pass two joins the counts back and reports, per
   * document, total tokens and tokens whose corpus count is <= rareMax
   * (misspellings, junk, boilerplate ids). A document is kept
   * (ok_rare=1) when rare tokens are at most 20% of its tokens —
   * integer cross-multiplied, never a float ratio. Documents with zero
   * tokens survive the explode via the left join back (0, 0, keep).
   */
  def rareTokenStats(df: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id",
                     rareMax: Long = 2L): DataFrame = {
    // hash in the scan projection: both shuffles move the 8-byte hash,
    // never the token text (collision odds ~n^2/2^65 — the accepted
    // standard shared by the minhash band hash and line dedup)
    val toks = df
      .select(col(idCol),
        explode(QualityFilters.words(lower(col(textCol)))).as("tok"))
      .select(col(idCol), xxhash64(col("tok")).as("tok_h"))
    val counts = toks.groupBy(col("tok_h")).agg(count(lit(1)).as("cnt"))
    val rare = counts.filter(col("cnt") <= rareMax)
      .select(col("tok_h"), lit(1).as("rare"))
    val perDoc = toks.join(rare, Seq("tok_h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("rare"), lit(0))).cast("long").as("n_rare"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare_tokens"))
      .withColumn("ok_rare",
        (col("n_rare_tokens") * 5 <= col("n_tokens")).cast("int"))
  }

  /**
   * Per-host document quota (the domain-balancing pass every open corpus
   * applies so one hot host cannot dominate the training mix): keep the
   * `cap` lowest-`idCol` documents of each host, flag the rest. The
   * reference has no host notion at all (it keys on the bare url,
   * /root/reference/src/queue.py:24-33).
   *
   * Scale shape (100 TB): the naive spelling is one window partitioned by
   * host — which serializes the hot host (double-digit percent of a real
   * crawl) onto a single task. Instead:
   *   1. host counts aggregate map-side (tiny rows);
   *   2. rows of under-cap hosts are kept outright — they never enter a
   *      window;
   *   3. rows of over-cap hosts first rank inside (host, salt) — the hot
   *      host fans across `salts` partitions — and only the ≤ cap
   *      candidates per salt (a row below ≥ cap smaller ids within its
   *      own salt can never be a global keeper) proceed to the final
   *      per-host rank over ≤ salts·cap rows.
   * Both windows move (id, host) pairs only; text never shuffles.
   *
   * Output: (idCol, hostCol, n_host_docs, kept 0/1).
   */
  def hostCapStats(df: DataFrame, hostCol: String = "host",
                   idCol: String = "doc_id", cap: Int = 5,
                   salts: Int = 16): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(hostCol))
      .agg(count(lit(1)).cast("long").as("n_host_docs"))
    val base = df.select(col(idCol), col(hostCol))
      .join(counts, Seq(hostCol))
    val under = base.filter(col("n_host_docs") <= cap)
      .withColumn("kept", lit(1))
    val overRows = base.filter(col("n_host_docs") > cap)
    val w1 = Window
      .partitionBy(col(hostCol), pmod(xxhash64(col(idCol)), lit(salts)))
      .orderBy(col(idCol))
    val candidates = overRows
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= cap)
    val w2 = Window.partitionBy(col(hostCol)).orderBy(col(idCol))
    val keepers = candidates
      .withColumn("r2", row_number().over(w2))
      .filter(col("r2") <= cap)
      .select(col(idCol), lit(1).as("k"))
    val overVerdict = overRows.join(keepers, Seq(idCol), "left")
      .withColumn("kept", coalesce(col("k"), lit(0)))
    under.select(col(idCol), col(hostCol), col("n_host_docs"), col("kept"))
      .unionByName(overVerdict
        .select(col(idCol), col(hostCol), col("n_host_docs"), col("kept")))
  }

  /**
   * Deterministic train/val/test split assignment — the held-out-split
   * discipline a training-data build needs BEFORE any model sees the
   * corpus. Assignment hashes `salt:id` with md5 and buckets on the first
   * two hex characters (1/256 granularity): bucket < 'e6' → train
   * (230/256 ≈ 89.8%), < 'f3' → val (13/256 ≈ 5.1%), else test.
   *
   * Why md5-of-id and not rand(): the split must be (a) reproducible
   * across reruns and resume (the pipeline is checkpointed), (b) stable
   * under corpus growth — adding documents never reassigns existing ones
   * (each row's verdict is a pure function of its own id), and (c)
   * engine-portable for verification (md5 hex is identical everywhere).
   * Pure codegen projection: no shuffle, no UDF, no state.
   *
   * Output: (idCol, bucket, split).
   */
  def splitAssign(df: DataFrame, idCol: String = "doc_id",
                  salt: String = "v1"): DataFrame = {
    val bucket = substring(
      md5(concat(lit(salt + ":"), col(idCol).cast("string")).cast("binary")),
      1, 2)
    df.select(col(idCol), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < "e6", "train")
          .when(col("bucket") < "f3", "val")
          .otherwise("test"))
  }

  /**
   * Deterministic corpus-mix sampling — the source-weighting pass that
   * turns raw per-source volumes into a target training mix (Pile/Dolma
   * style: oversampled curated sources, downsampled crawl). Each source
   * gets a keep-fraction; a document is kept iff the first 8 hex chars
   * of md5('mix:'‖id) compare lexicographically below the source's
   * threshold string `floor(rate·2³²)` rendered as 8 lowercase hex chars
   * (rate ≥ 1.0 ⇒ threshold "g", above every hex string, so keep-all is
   * exact). Hex-string comparison makes the verdict engine-portable with
   * NO float anywhere, and md5-of-id makes it reproducible across
   * reruns/resume and stable under corpus growth — the same discipline
   * as [[splitAssign]].
   *
   * Scale shape (100 TB): the rates map is config-sized — it broadcasts;
   * the verdict is a pure codegen projection after the broadcast hash
   * join. No shuffle, no state, text never moves. A source absent from
   * the map is dropped (kept = 0), the conservative default for an
   * unvetted source.
   *
   * Output: (idCol, srcCol, u_hex, kept 0/1).
   */
  def mixSample(df: DataFrame, rates: Map[String, Double],
                idCol: String = "doc_id",
                srcCol: String = "source"): DataFrame = {
    require(rates.nonEmpty, "rates must not be empty")
    rates.foreach { case (s, r) =>
      require(r >= 0.0, s"rate for '$s' must be >= 0, got $r")
    }
    sampleByThreshold(df,
      rates.toSeq.map { case (s, r) => (s, rateToHexThreshold(r)) },
      idCol, srcCol)
  }

  /**
   * Absolute-budget corpus sampling: instead of hand-set fractions
   * ([[mixSample]]), each source gets a target cost budget (tokens /
   * chars) and the keep fraction is DERIVED from the corpus —
   * `rate = target / total_cost(source)`, capped at keep-all. The
   * threshold is computed in EXACT integer arithmetic
   * (`(target << 32) / total`, keep-all when target ≥ total), so the
   * verdict is engine-portable with no float anywhere and the oracle can
   * recompute the very same thresholds in SQL
   * (`(HUGEINT(target)·2³²) // total` rendered as padded lowercase hex).
   * Expected kept cost per source ≈ its target (md5-uniform ids,
   * cost uncorrelated with the hash).
   *
   * Scale shape (100 TB): phase one is one map-side-combined aggregate
   * to per-source totals — one row PER SOURCE to the driver (sources are
   * config-sized, the same documented-bounded discipline as the rates
   * map itself); phase two is [[mixSample]]'s broadcast-join projection.
   *
   * Output: (idCol, srcCol, u_hex, kept 0/1); unlisted sources drop.
   */
  def budgetSample(df: DataFrame, targets: Map[String, Long],
                   idCol: String = "doc_id", srcCol: String = "source",
                   costCol: String = "n_chars"): DataFrame = {
    require(targets.nonEmpty, "targets must not be empty")
    targets.foreach { case (s, t) =>
      require(t >= 0L, s"target for '$s' must be >= 0, got $t")
    }
    val tots = df.groupBy(col(srcCol))
      .agg(sum(col(costCol).cast("long")).as("tot"))
      .collect().flatMap(r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else Some(r.getString(0) -> r.getLong(1))).toMap
    val thresholds = targets.toSeq.flatMap { case (s, tgt) =>
      tots.get(s).filter(_ > 0L).map { tot =>
        s -> budgetToHexThreshold(tgt, tot)
      }
    }
    if (thresholds.isEmpty)
      df.select(col(idCol), col(srcCol))
        .withColumn("u_hex", uHex(idCol)).withColumn("kept", lit(0))
    else sampleByThreshold(df, thresholds, idCol, srcCol)
  }

  /** Exact integer threshold for an absolute budget: keep-all ("g") when
    * target ≥ total, else ⌊target·2³²/total⌋ as 8 lowercase hex chars —
    * BigInt intermediate so petabyte-scale totals cannot overflow.
    * Exposed so oracle SQL can mirror it with HUGEINT `//`. */
  def budgetToHexThreshold(target: Long, total: Long): String = {
    require(total > 0L, s"total must be > 0, got $total")
    if (target >= total) "g"
    else f"${((BigInt(target) << 32) / BigInt(total)).toLong}%08x"
  }

  private def uHex(idCol: String): Column = substring(
    md5(concat(lit("mix:"), col(idCol).cast("string")).cast("binary")),
    1, 8)

  /** Shared verdict projection: broadcast the (source → hex threshold)
    * table, keep iff u_hex < threshold; sources without a threshold row
    * drop. */
  private def sampleByThreshold(df: DataFrame,
                                thresholds: Seq[(String, String)],
                                idCol: String,
                                srcCol: String): DataFrame = {
    val thrDf = df.sparkSession.createDataFrame(thresholds)
      .toDF(srcCol, "_thr")
    df.select(col(idCol), col(srcCol))
      .withColumn("u_hex", uHex(idCol))
      .join(org.apache.spark.sql.functions.broadcast(thrDf),
        Seq(srcCol), "left")
      .withColumn("kept",
        when(col("_thr").isNotNull && col("u_hex") < col("_thr"), 1)
          .otherwise(0))
      .select(col(idCol), col(srcCol), col("u_hex"), col("kept"))
  }

  /**
   * Exact per-group value quantiles (percentile_disc semantics: the
   * k = ⌈pct·n/100⌉-th smallest value) — the corpus QA report a data
   * build reads before setting truncation caps and length filters.
   *
   * Scale shape (100 TB): sorting each group's raw rows would put every
   * hot source through one task. Instead this is the value-HISTOGRAM
   * quantile: phase one collapses the corpus to (group, value) counts
   * with map-side combine, so the per-group window in phase two runs over
   * AT MOST |value domain| rows per group — bounded by the length cap
   * (the kernel truncates at a fixed code-point budget), NOT by corpus
   * size. Target ranks use pure integer arithmetic ((tot·pct+99) div
   * 100): no float anywhere, exact and engine-portable.
   *
   * Output: (groupCol, n_docs, p50, p90, p99).
   */
  def lengthQuantiles(df: DataFrame, groupCol: String = "source",
                      valCol: String = "n_chars",
                      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be in [1,100], got $pcts")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val tot = hist.groupBy(col(groupCol))
      .agg(sum(col("cnt")).cast("long").as("tot"))
    val aggs = pcts.map { p =>
      min(when(col("cum") >= expr(s"(tot * $p + 99) div 100"), col("v")))
        .as(s"p$p")
    }
    cum.join(tot, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("tot")).as("n_docs"), aggs: _*)
  }

  /** The 8-hex-char threshold string for a keep fraction: floor(rate·2³²)
    * zero-padded lowercase hex; rate ≥ 1.0 ⇒ "g" (sorts above every hex
    * string, exact keep-all). Exposed so oracle SQL can embed the very
    * same literals. */
  def rateToHexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0L, (rate * 4294967296.0).toLong)}%08x"

  /** xxhash64 of every length-`n` token n-gram of a text column (stride 1),
    * computed in the scan projection with codegen built-ins. Short texts
    * (< n tokens) yield an empty array — guarded explicitly because
    * Spark's sequence(1, k) counts DOWN when k < 1. */
  private def gramHashes(text: Column, n: Int): Column = {
    val w = QualityFilters.words(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => xxhash64(array_join(slice(w, i, lit(n)), " "))))
      .otherwise(array().cast("array<bigint>"))
  }

  /**
   * Benchmark decontamination (the GPT-3 appendix-C discipline, kept by
   * every open corpus since): flag any training document that shares a
   * length-`n` token n-gram with an evaluation benchmark, so eval
   * contamination is removed BEFORE training rather than explained after.
   * The reference has no corpus/benchmark notion (one file at a time);
   * this is a first-class operator of any 100 TB training-data build.
   *
   * Scale shape: an eval suite is config-sized next to the corpus (even
   * 100k benchmark docs make only a few-M distinct 13-gram hashes), so
   * the membership probe is a BROADCAST left join on 8-byte hashes: the
   * corpus side explodes gram hashes inside its scan stage, probes the
   * broadcast set executor-locally, and the per-doc aggregate combines
   * map-side — corpus text never shuffles, and the only exchange is the
   * final per-doc combine keyed on idCol. Documents with fewer than `n`
   * tokens contribute no grams and survive via the outer join back.
   *
   * Output: (idCol, n_grams, n_hit_grams, contaminated 0/1).
   */
  def decontamStats(corpus: DataFrame, bench: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    n: Int = 13): DataFrame = {
    require(n >= 1, s"n-gram length must be >= 1, got $n")
    val benchGrams = bench
      .select(explode(gramHashes(col(textCol), n)).as("gh"))
      .distinct()
      .withColumn("hit", lit(1))
    val corpusGrams = corpus
      .select(col(idCol), explode(gramHashes(col(textCol), n)).as("gh"))
    val perDoc = corpusGrams
      .join(broadcast(benchGrams), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit_grams"))
    corpus.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", (col("n_hit_grams") > 0).cast("int"))
  }

  /**
   * Incremental-crawl delta: classify every document across two crawl
   * snapshots as added / removed / changed / unchanged. This is the
   * planning pass of incremental processing — only `added`/`changed`
   * rows re-enter the extraction pipeline, the resume anti-join's
   * batch-level analog at snapshot granularity (the reference re-reads
   * its whole queue every run, /root/reference/src/queue.py:24-33).
   *
   * Scale notes: both sides collapse to (id, 32-char md5) in the scan
   * projection, so the full-outer join — the only shuffle — moves
   * fingerprints, never document text. Change detection by content
   * hash, not timestamps: re-crawled-but-identical pages classify
   * `unchanged` and skip reprocessing.
   *
   * Contract: inputs are SNAPSHOTS keyed uniquely by `idCol` (one row
   * per id, the invariant SnapshotTable maintains). A duplicated id
   * fans the join out — run exact dedup first if the crawl is raw.
   */
  def crawlDelta(oldDf: DataFrame, newDf: DataFrame,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    // presence is tracked by explicit markers, NOT by fingerprint
    // nullity: md5(NULL) is NULL, so a null-text row would otherwise
    // masquerade as absent and misclassify (removed -> added)
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("old_fp"),
      lit(1).as("in_old"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("new_fp"),
      lit(1).as("in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          // null-safe compare: two null-text snapshots are unchanged
          .when(col("old_fp") <=> col("new_fp"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /**
   * Dataset-card statistics: the one-row corpus summary a dataset
   * release ships with (HF dataset-card numbers) — doc/char/token
   * totals, exact and normalized distinct-document counts (the
   * dedup-rate headline), and the length-gate pass count. Exact, not
   * sketched, so an external engine certifies every figure.
   *
   * Scale notes: ONE pass — every per-row derivation (length, word
   * count, exact and normalized fingerprints) is computed once in the
   * scan projection, and the two DISTINCT aggregates share that single
   * scan via Expand. Expand triples only the already-narrow projected
   * rows (~80 B: two 32-char fingerprints + two BIGINTs), while the
   * separate-branch spelling it replaces scanned and decompressed the
   * corpus TEXT three times — at 100 TB the three extra text scans cost
   * orders of magnitude more than tripling 80-byte rows through one
   * map-side-combined exchange. Distinct counts use count(DISTINCT fp),
   * which (like the SQL oracle) counts non-NULL fingerprints only — a
   * null-text row contributes to n_docs but to neither distinct count.
   */
  def datasetCard(df: DataFrame, textCol: String = "text",
                  minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val ws = """[ \t\n\x0B\f\r]"""
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), """[^a-z0-9 \t\n\x0B\f\r]""", " "),
      ws + "+", " "))
    val nWords = size(QualityFilters.words(col(textCol))).cast("long")
    df.select(length(col(textCol)).cast("long").as("len"), nWords.as("nw"),
        md5(col(textCol)).as("fp"), md5(norm).as("fpn"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("len")).cast("long").as("n_chars"),
        sum(col("nw")).cast("long").as("n_tokens"),
        sum(when(col("nw") >= minWords && col("nw") <= maxWords, 1L)
          .otherwise(0L)).cast("long").as("n_len_ok"),
        countDistinct(col("fp")).cast("long").as("n_exact_unique"),
        countDistinct(col("fpn")).cast("long").as("n_norm_unique"))
      .select(col("n_docs"), col("n_chars"), col("n_tokens"),
        col("n_len_ok"), col("n_exact_unique"), col("n_norm_unique"))
  }

  /**
   * Per-source vocabulary signature: the k tokens most over-represented
   * in each source vs the whole corpus — the forensic view curation
   * teams use to spot template spam, SEO farms, and mislabeled sources.
   * Over-representation is the tf-share lift, computed as a SCALED
   * INTEGER: lift_x1000 = (tf_s · T_c · 1000) div (tf_c · T_s), so the
   * ranking is bit-exact across engines (a float ratio could not be
   * oracled). BIGINT bound: tf_s·T_c·1000 must stay under 2^63 — holds
   * through ~10^9-token corpora; larger corpora should lift the
   * multiplication to DECIMAL(38) (documented, not silently truncated).
   *
   * Scale notes: counts aggregate map-side at (source, token) first —
   * the same pre-sharding discipline as hostProfile; the corpus total
   * joins as a broadcast one-row aggregate; per-source top-k rides the
   * salted two-stage window (hostCapStats discipline) so a source with
   * a 10^8-token vocabulary never funnels into one window partition.
   */
  def sourceSignature(df: DataFrame, textCol: String = "text",
                      srcCol: String = "source", k: Int = 5,
                      salts: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(srcCol).as("source"),
      explode(QualityFilters.words(lower(col(textCol)))).as("tok"))
    val ts = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf_s"))
    val st = ts.groupBy(col("source"))
      .agg(sum(col("tf_s")).cast("long").as("t_s"))
    val ct = ts.groupBy(col("tok"))
      .agg(sum(col("tf_s")).cast("long").as("tf_c"))
    val tot = ts.agg(sum(col("tf_s")).cast("long").as("t_c"))
    val lifted = ts.join(st, Seq("source")).join(ct, Seq("tok"))
      .crossJoin(broadcast(tot))
      .withColumn("lift_x1000",
        expr("(tf_s * t_c * 1000) div (tf_c * t_s)"))
    val w1 = Window
      .partitionBy(col("source"), pmod(xxhash64(col("tok")), lit(salts)))
      .orderBy(col("lift_x1000").desc, col("tok"))
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("lift_x1000").desc, col("tok"))
    lifted
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("source"), col("tok"), col("lift_x1000"), col("rk"))
  }

  /**
   * robots.txt-style path verdicts: per (host, path-prefix) allow/deny
   * rules with the standard longest-match-wins semantics (ties break to
   * allow, the Google/RFC 9309 tie rule); paths with no matching rule
   * default to allowed. The crawl-side counterpart of `blockFlags` —
   * that one kills whole hosts, this one carves paths within a host.
   *
   * Scale notes: rule sets are config-sized, so they collapse to one
   * array-of-rules row per host and BROADCAST; the verdict is then a
   * pure projection (array filter for prefix matches + array_max over
   * (prefix-length, allow) structs picks the winner) — no shuffle at
   * all, no per-doc window, and the doc path never leaves its
   * partition.
   */
  def robotsVerdict(docs: DataFrame, rules: Seq[(String, String, Int)],
                    hostCol: String = "host", pathCol: String = "path",
                    idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ruleDf = rules.toDF("r_host", "prefix", "allow")
      .groupBy(col("r_host"))
      .agg(collect_list(struct(col("prefix"), col("allow"))).as("rules"))
    docs.join(broadcast(ruleDf), docs(hostCol) === ruleDf("r_host"), "left")
      .withColumn("matched",
        filter(col("rules"), r => col(pathCol).startsWith(r.getField("prefix"))))
      .withColumn("best", array_max(transform(col("matched"),
        r => struct(length(r.getField("prefix")).as("l"),
          r.getField("allow").as("a")))))
      .select(col(idCol),
        when(col("best").isNull, lit(1)).otherwise(col("best").getField("a"))
          .as("allowed"),
        coalesce(size(col("matched")), lit(0)).as("n_matched"))
  }

  /**
   * Unicode-script profile: per-document codepoint counts for the major
   * script classes plus a deterministic dominant-script verdict — the
   * cheap precursor every language-ID cascade runs first (a page that is
   * 90% CJK never reaches the Latin-alphabet n-gram model). Counts are
   * `length()` of the class-filtered text, so they are codepoint-exact
   * in any engine; classes are explicit codepoint ranges (never \p{...}
   * properties, which Java and RE2 spell differently). Dominant-script
   * ties break by the fixed priority latin > cyrillic > cjk > arabic.
   * Pure scan projection: codegen, no shuffle.
   */
  def scriptProfile(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    def cnt(cls: String): Column =
      length(regexp_replace(col(textCol), s"[^$cls]", ""))
    val latin = "A-Za-z"
    val cyr = "\\x{0400}-\\x{04FF}"
    val cjk = "\\x{4E00}-\\x{9FFF}"
    val arab = "\\x{0600}-\\x{06FF}"
    df.select(col(idCol),
        cnt(latin).cast("long").as("n_latin"),
        cnt(cyr).cast("long").as("n_cyrillic"),
        cnt(cjk).cast("long").as("n_cjk"),
        cnt(arab).cast("long").as("n_arabic"),
        length(regexp_replace(col(textCol), "[^0-9]", "")).cast("long")
          .as("n_digit"))
      .withColumn("dominant",
        when(col("n_latin") >= col("n_cyrillic") &&
          col("n_latin") >= col("n_cjk") &&
          col("n_latin") >= col("n_arabic"), "latin")
          .when(col("n_cyrillic") >= col("n_cjk") &&
            col("n_cyrillic") >= col("n_arabic"), "cyrillic")
          .when(col("n_cjk") >= col("n_arabic"), "cjk")
          .otherwise("arabic"))
  }
}
