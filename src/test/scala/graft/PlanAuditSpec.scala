package graft

/** Whole-battery plan audit: structural invariants asserted over the
  * PHYSICAL plan of every registered query, so a future edit that
  * regresses a plan shape (a stray cartesian, an exchange keyed on an
  * embedding) fails CI instead of surfacing as a 100 TB incident.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose nested-loop/cartesian is the documented intent:
    * q10 is the reference's cross-product `for` clause; q28/q41 are
    * the exact all-pairs baselines (broadcast NLJ by design); q82's
    * quantized candidate scan is a query-broadcast brute-force pass —
    * the same documented shape as q28 at a quarter the bytes. q46 and
    * q29 left this list in round 5: they now register the probe/
    * bucketed top-k itself, which must be NLJ-free (postings or
    * bucket tables hash-joined to broadcast probes).
    */
  private val exactBaselines = Set("q10_cross_for", "q28_ann_bruteforce",
    "q41_embedding_neardup", "q82_ann_quantized",
    // q108: docs × label-constants frame (|labels| rows, broadcast) —
    // scoring every document under every label IS the cross product;
    // q110: two one-row reduces (exact count × HLL estimate) crossed
    // into the single summary row. Both NLJ sides are O(1)-bounded.
    "q108_nb_classify", "q110_hll_distinct",
    // q134 wraps q108's classify (same docs × label-constants frame)
    // in the confusion aggregation — same O(1)-bounded NLJ side.
    "q134_nb_confusion",
    // q146 runs q108's classify once per fold — the same O(1)-bounded
    // docs × label-constants frame, three times.
    "q146_nb_crossval",
    // q150 wraps q108's classify (inherited label-constants frame)
    // and crosses two ONE-ROW reduces (agreement count × marginal
    // cross product) into the single kappa row — the q110 shape.
    "q150_classifier_kappa",
    // q151 crosses two one-row reduces (corpus totals, allocation
    // totals) into the sources-sized allocation frame — O(1) NLJ
    // sides again.
    "q151_mixture_alloc",
    // q155 crosses the one-row reference-quantile edge frame into the
    // scan and the one-row totals into the 10-bin frame — O(1) NLJ
    // sides.
    "q155_psi_drift",
    // q123: q28's documented all-pairs intent transplanted into the
    // 16-dim projected space — the exact in-space baseline; scale
    // corpora route through LSH/IVF over the same projected vectors.
    "q123_ann_projected",
    // q131: the label-consistency report runs q28's exact NN by
    // design (a diagnostic over a sampled query set, not a scale
    // path).
    "q131_knn_label_consistency",
    // q136: the one-row training-token-count frame (N for the
    // unigram backoff face) crossed into the scoring join — the q110
    // one-row-reduce shape; every count-table join is hash/broadcast.
    "q136_stupid_backoff",
    // q158 wraps q136's scorer (same one-row N frame) in the
    // per-source fold.
    "q158_lm_source_report",
    // q160 composes q136's scorer (one-row N frame) with the one-row
    // median-threshold frame — O(1) NLJ sides.
    "q160_model_curation",
    // q141: one-row quality-threshold bands (the q79 two-pass shape
    // collapsed to a single global band row) and the 4-row epoch
    // frame, both broadcast — O(1)-bounded NLJ sides.
    "q141_curriculum",
    // q161: two one-row broadcast frames (model totals for the
    // Laplace denominators; the 80th-percentile selection threshold)
    // crossed into B-row/corpus-row frames — O(1) NLJ sides.
    "q161_dsir_select",
    // q162: exact-kNN margin alignment — the q41/q28 documented
    // all-pairs intent (bench-exempt); the scale path is the IVF
    // probe with unchanged margin arithmetic.
    "q162_margin_align",
    // q163: the one-row normalizer Z crossed into the sources-sized
    // rate frame — the q151 shape.
    "q163_alpha_sampling",
    // q173: same one-row Z normalizer crossed into the per-source
    // weight frame — the q163/q151 shape.
    "q173_doremi_weights",
    // q174: the domain-bounded distinct-value table crossed with the
    // sources-sized cardinality frame (broadcast) — both NLJ sides
    // bounded by the value domain / source count, never corpus rows.
    "q174_ks_drift",
    // q178: q28's documented all-pairs intent, once per truncated
    // dimension (bounded broadcast query frame), plus the one-row
    // denominator cross — the q123/q110 shapes.
    "q178_mrl_recall",
    // q182: two one-row broadcast frames (the checkpoint thresholds
    // crossed into the vocab/docs scans; the one-row OLS beta crossed
    // into the 7-row spine) — O(1) NLJ sides, the q155/q163 shapes.
    "q182_heaps_fit",
    // q185: q155's one-row decile-edge frame crossed into the scan,
    // plus the 10-row bin spine crossed into the windows frame —
    // O(1) NLJ sides.
    "q185_rolling_psi",
    // q154: the one-row total-count frame crossed into the ranked
    // scan (the q110 one-row-reduce shape) — NTILE sizing needs n.
    "q154_calibration",
    // q193: two one-row broadcast frames (budget+k totals; the
    // capped-prefix P_m/m reduce) crossed into the |sources|-row
    // water-fill frame — the q151/q163 shape, O(1) NLJ sides.
    "q193_unimax_budget",
    // q196 inherits q193's water-fill frames (same one-row NLJ
    // sides); the manifest itself is hash-joined.
    "q196_unimax_manifest",
    // q198 composes q163's one-row Z cross and q193's water-fill
    // frames — all NLJ sides one-row broadcasts.
    "q198_mixture_compare",
    // q199 crosses the one-row corpus-token total into three one-row
    // per-policy reduces — the q110 shape.
    "q199_dedup_savings")

  private lazy val executions
      : Map[String, org.apache.spark.sql.execution.QueryExecution] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).queryExecution
    }

  private lazy val plans: Map[String, String] =
    executions.map { case (name, qe) =>
      name -> qe.executedPlan.toString
    }

  /** Queries whose optimized plan carries an UNPARTITIONED window,
    * each justified: the window rides a frame whose cardinality is
    * bounded by construction (a value domain, a config clamp, or a
    * one-row-per-group reduce) — never by corpus rows. Any query NOT
    * listed here that grows a global window fails the audit below:
    * the r10 q174 finding (a corpus-growable single-task window),
    * made structural so it cannot recur unreviewed.
    */
  private val boundedGlobalWindows: Map[String, String] = Map(
    "q139_auc" -> ("cum ranks over the distinct-6-decimal-score " +
      "histogram — ≤10^6 rows by the score rounding contract"),
    "q150_classifier_kappa" -> "inherits q139's score-histogram rank",
    "q152_moving_revenue" -> ("7-day range frame over the per-DAY " +
      "reduce — day-domain-bounded (≤ years×366 rows)"),
    "q154_calibration" -> ("Ranks.bucketedRowNumber offsets window " +
      "over the ≤65-row floor(p*64) bucket-count table (sigmoid " +
      "codomain bounds the buckets)"),
    "q157_temperature_scaling" -> ("best-of rank over the " +
      "|temps|-row (6) per-temperature NLL frame"),
    "q158_lm_source_report" -> ("report rank over the per-source " +
      "reduce — |sources| rows"),
    "q174_ks_drift" -> ("bucket-offset prefix sum over the " +
      "≤1025-row bucket-count table (the r10 fix — two-level CDF)"),
    "q95_token_budget_sample" -> ("prefix sum over the per-(lang, " +
      "quality-band) reduce — band-domain-bounded"),
    "q75_vocab_topk" -> ("rank over the post-TakeOrdered ≤k-row " +
      "frame (topNgrams limits BEFORE ranking)"),
    "q76_trigram_topk" -> "same ≤k topNgrams frame as q75",
    "q177_zipf_fit" -> "inherits q75's ≤k topNgrams rank",
    "q182_heaps_fit" -> ("two cumulative sums over the 7-row " +
      "checkpoint spine — config-bounded"),
    "q88_temperature_resample" -> ("keyless min over the per-CLASS " +
      "count frame — |langs| rows (documented at CorpusOps." +
      "temperatureResample)"),
    "q90_pretraining_program" -> ("inherits q88's class-count " +
      "frame window"),
    "q193_unimax_budget" -> ("water-fill prefix sum + row_number " +
      "over the per-SOURCE reduce — |sources| rows"),
    "q196_unimax_manifest" -> ("inherits q193's |sources|-row " +
      "water-fill window; the corpus-side prefix is q95's " +
      "partitioned two-level decomposition"),
    "q197_corpus_card" -> ("inherits q177's rank over the " +
      "post-TakeOrdered ≤100-row vocab frame"),
    "q198_mixture_compare" -> ("inherits q193's |sources|-row " +
      "water-fill window"))

  test("every unpartitioned window rides a justified bounded frame") {
    val flagged = executions.toSeq.sortBy(_._1).flatMap {
      case (name, qe) =>
        val n = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0 && !boundedGlobalWindows.contains(name))
          Some(s"$name($n)")
        else None
    }
    assert(flagged.isEmpty,
      s"unpartitioned windows with no bounded-frame justification: " +
        s"${flagged.mkString(", ")} — either decompose (Ranks." +
        s"bucketedRowNumber / the q174 two-level CDF) or add a " +
        s"justified boundedGlobalWindows entry")
  }

  /** Queries whose HASH exchange legitimately carries the raw document
    * text, each justified — the payload either IS the result being
    * re-organized for output, or the operator's semantics require the
    * string on the exchange (never as a join/group KEY wider than it
    * must be). Everything else in the registry must hash-shuffle ids /
    * fixed-width keys only: at 100 TB the text column is the corpus,
    * and an exchange that carries it pays the whole corpus in network
    * + spill (the q164 "no text on any exchange" claim, made a
    * registry-wide structural gate).
    */
  private val textExchangeAllowed: Map[String, String] = Map.empty

  /** The queries that opt into `Tables.loadWide` (PERF.md r13; the
    * r16 additions are the ranker/corpus-prep families whose
    * single-task tokenize/score scans topped the r15 bench).
    * On a degenerate input layout — fewer files than half the worker
    * count, the driver's 1-file test parquet — the loader inserts ONE
    * round-robin exchange directly over the scan so heavy per-row
    * stages aren't serialized on an unsplittable file, and that
    * exchange necessarily carries whatever the pruned scan produced
    * (text/vectors included). It is allowed ONLY for these queries
    * and ONLY as RoundRobinPartitioning, because the file-count guard
    * makes it vanish on any healthily-split production table
    * (`loadWide ≡ load` at files ≥ cores/2) — so at 100 TB the "no
    * text/vectors on any exchange" invariant holds unconditionally.
    * r13 verdict #3: previously the audits matched HashPartitioning
    * only, which let this exchange slip by TYPE rather than by a
    * named, justified entry.
    */
  private val wideningExchangeAllowed: Set[String] = Set(
    "q26_simhash", "q27_simhash_neardup", "q42_jaccard_topk",
    "q56_simhash128", "q103_dup_spans", "q104_winnowing",
    "q105_winnow_neardup", "q131_knn_label_consistency",
    "q161_dsir_select", "q164_containment_dedup",
    "q169_margin_align_ivf", "q183_curation_funnel",
    "q194_rejection_reasons", "q199_dedup_savings",
    // r16: the BM25/ranker family — the postings build (tokenize +
    // explode + combine) was a single-task scan stage (1.7–2.4 s of
    // serial CPU per query at sf0.1). Widening was ALSO tried and
    // REVERTED by measurement for q48/q62/q78/q90/q192 (deep
    // multi-stage pipelines: per-stage task overhead exceeded the
    // parallel-scan win — the r13 "opt-in per query" lesson holding).
    "q119_bm25_topk", "q120_rrf_fusion", "q128_hard_negatives",
    "q130_bm25_dfcap")

  /** Physical-plan traversal that descends into AQE wrappers and
    * subqueries (the Metrics.countSkewSplits recursion).
    */
  private def physicalNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val nested = p match {
      case a: AdaptiveSparkPlanExec => physicalNodes(a.executedPlan)
      case q: QueryStageExec => physicalNodes(q.plan)
      case other =>
        (other.children ++ other.subqueries).flatMap(physicalNodes)
    }
    p +: nested
  }

  /** EVERY shuffle exchange (hash, round-robin, range, single) whose
    * input carries a column matching `payload`, minus the one
    * justified widening shape: a RoundRobinPartitioning exchange in a
    * `wideningExchangeAllowed` query is `loadWide`'s file-count-
    * guarded scan widening, a no-op at production layouts. Everything
    * else — including a future unguarded `repartition` of the corpus
    * — is returned for the caller to flag.
    */
  private def payloadExchanges(
      qe: org.apache.spark.sql.execution.QueryExecution, name: String,
      payload: org.apache.spark.sql.catalyst.expressions.Attribute => Boolean)
      : Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    physicalNodes(qe.executedPlan).collect {
      case ex: ShuffleExchangeExec if ex.child.output.exists(payload) &&
          !(ex.outputPartitioning.isInstanceOf[RoundRobinPartitioning] &&
            wideningExchangeAllowed.contains(name)) =>
        s"${ex.outputPartitioning.getClass.getSimpleName}" +
          ex.child.output.map(_.name).mkString("[", ",", "]")
    }
  }

  private def isText(a: org.apache.spark.sql.catalyst.expressions.Attribute)
      : Boolean =
    a.name == "text" && a.dataType == org.apache.spark.sql.types.StringType

  test("no exchange of any partitioning carries raw document text") {
    val flagged = executions.toSeq.sortBy(_._1).flatMap { case (name, qe) =>
      val carriers = payloadExchanges(qe, name, isText)
      if (carriers.nonEmpty && !textExchangeAllowed.contains(name))
        Some(s"$name: ${carriers.mkString(" ; ")}")
      else None
    }
    assert(flagged.isEmpty,
      s"exchanges carrying the raw text column (restructure to " +
        s"shuffle ids/hashes and join text back, or add a justified " +
        s"textExchangeAllowed entry):\n${flagged.mkString("\n")}")
  }

  /** Queries whose hash exchange legitimately carries a raw embedding
    * ARRAY as payload, each justified: vectors may cross the wire
    * exactly once when an index/model BUILD re-organizes them (IVF
    * cell assignment, k-means training, PCA Gram accumulation), or
    * when the operator's verify step is defined ON the vectors. A
    * QUERY-time plan that ships vectors is wrong — scale paths score
    * on codes/cells and fetch floats only for a shortlist (q190's
    * shape) — so anything not listed here fails.
    */
  private val vectorExchangeAllowed: Map[String, String] = Map(
    "q73_semdedup" -> ("cluster-blocked exact-cosine verify: vectors " +
      "co-locate per prebuilt-IVF cell ONCE (keyed on list_id, " +
      "cell-bounded fanout) so the in-cell pair cosines are exact — " +
      "the operator's zero-false-positive contract is defined ON the " +
      "vectors; every other ANN-family query-time plan ships " +
      "codes/cells only"))

  private def isVector(a: org.apache.spark.sql.catalyst.expressions.Attribute)
      : Boolean = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, DoubleType}
    a.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
  }

  test("no exchange of any partitioning carries a raw embedding " +
      "array without a justified build/verify entry") {
    val flagged = executions.toSeq.sortBy(_._1).flatMap { case (name, qe) =>
      val carriers = payloadExchanges(qe, name, isVector)
      if (carriers.nonEmpty && !vectorExchangeAllowed.contains(name))
        Some(s"$name: ${carriers.mkString(" ; ")}")
      else None
    }
    assert(flagged.isEmpty,
      s"exchanges carrying raw float/double arrays (score on " +
        s"codes/cells and shortlist-fetch the floats, or add a " +
        s"justified vectorExchangeAllowed entry):\n${flagged.mkString("\n")}")
  }

  /** Queries whose hash exchange legitimately carries the media
    * `payload` BINARY column, each justified. The multimodal contract
    * is that decode/feature-extraction is scan-local and only
    * fixed-width frame/segment rows reach an exchange — media bytes
    * on a shuffle would be the media equivalent of shuffling text.
    * (Matched by the engine's payload column NAME + BinaryType:
    * a bare BinaryType match would false-positive on every partial
    * aggregation buffer, which also serializes as binary.)
    */
  private val binaryExchangeAllowed: Map[String, String] = Map.empty

  private def isMedia(a: org.apache.spark.sql.catalyst.expressions.Attribute)
      : Boolean =
    a.name == "payload" &&
      a.dataType == org.apache.spark.sql.types.BinaryType

  test("no exchange of any partitioning carries a binary media " +
      "payload") {
    val flagged = executions.toSeq.sortBy(_._1).flatMap { case (name, qe) =>
      val carriers = payloadExchanges(qe, name, isMedia)
      if (carriers.nonEmpty && !binaryExchangeAllowed.contains(name))
        Some(s"$name: ${carriers.mkString(" ; ")}")
      else None
    }
    assert(flagged.isEmpty,
      s"exchanges carrying media payload bytes (keep decode " +
        s"scan-local; shuffle fixed-width features only, or add a " +
        s"justified binaryExchangeAllowed entry):\n${flagged.mkString("\n")}")
  }

  test("at a scale where loadWide engages, the widening exchange is " +
      "the ONLY non-hash exchange carrying text/vectors — and only " +
      "in the opted-in queries (the r13 by-type carve-out, closed)") {
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$sf01/documents.parquet").exists())
    // widening must actually engage at this layout, else the audit
    // below proves nothing
    assert(Tables.wideningEngages(spark, sf01, "documents"),
      "sf0.1 layout no longer engages loadWide; move this audit to a " +
        "dir that does")
    var sawWidening = false
    val flagged = wideningExchangeAllowed.toSeq.sorted.flatMap { name =>
      val qe = SparkEntry.queries(name)(spark, sf01).queryExecution
      val bad = physicalNodes(qe.executedPlan).collect {
        case ex: ShuffleExchangeExec
            if ex.child.output.exists(a => isText(a) || isVector(a)) &&
              !ex.outputPartitioning.isInstanceOf[
                org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
          if (ex.outputPartitioning.isInstanceOf[RoundRobinPartitioning])
            { sawWidening = true; None }
          else Some(s"$name: ${ex.outputPartitioning}" +
            ex.child.output.map(_.name).mkString("[", ",", "]"))
      }.flatten
      // the hash-exchange audits hold at this scale too (same
      // allowlists as the sf0.001 sweep)
      val hashBad =
        payloadExchanges(qe, name, a => isText(a) || isVector(a))
          .filterNot(_ => textExchangeAllowed.contains(name) ||
            vectorExchangeAllowed.contains(name))
          .map(c => s"$name: $c")
      bad ++ hashBad
    }
    assert(flagged.isEmpty,
      s"non-widening exchanges carrying text/vectors at the engaged " +
        s"scale:\n${flagged.mkString("\n")}")
    assert(sawWidening,
      "no widening exchange found in any opted-in query at sf0.1 — " +
        "the wideningExchangeAllowed list is dead weight; prune it")
  }

  /** r15's biggest per-row CPU defect class, made a standing gate
    * (r15 verdict #7): a `split`/`md5`/`regexp_*`/`sha*` call nested
    * inside a higher-order-function lambda body re-derives its input
    * once PER ELEMENT of the outer array — the O(L²)-per-document
    * trap ee8be25 fixed in five operators (bind the derived array to
    * an attribute with withColumn BEFORE the lambda). Per-element
    * hashing of an already-bound element (xxhash64(x) in tokenHashes)
    * is fine and intended; what this bans is re-deriving a STRING
    * (split / digest / regex) inside the lambda.
    */
  private def expensiveInLambda(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions._
    def bannedName(e: Expression): Option[String] = e match {
      case _: StringSplit => Some("split")
      case _: Md5 => Some("md5")
      case _: Sha1 => Some("sha1")
      case _: Sha2 => Some("sha2")
      case _: RegExpReplace => Some("regexp_replace")
      case _: RegExpExtract => Some("regexp_extract")
      case _: RegExpExtractAll => Some("regexp_extract_all")
      case _ => None
    }
    // The trap is a banned call that is LOOP-INVARIANT inside the
    // lambda — its subtree references no lambda variable, so it
    // re-derives the same value once per element (the O(L²) class).
    // A banned call OF the lambda variable (md5(t) per token, the
    // simhash/winnowing per-element hash) is per-element work that
    // belongs exactly there and is not flagged.
    def loopInvariant(e: Expression): Boolean =
      !e.exists(_.isInstanceOf[NamedLambdaVariable])
    plan.flatMap { node =>
      node.expressions.flatMap { root =>
        root.collect {
          case lf: LambdaFunction =>
            lf.function.collect {
              case e if bannedName(e).nonEmpty && loopInvariant(e) =>
                bannedName(e).get
            }
        }.flatten
      }
    }
  }

  test("no split/digest/regex call inside any HOF lambda body " +
      "(the r15 O(L^2) trap, as a standing audit)") {
    val flagged = executions.toSeq.sortBy(_._1).flatMap {
      case (name, qe) =>
        val hits = expensiveInLambda(qe.optimizedPlan)
        if (hits.nonEmpty) Some(s"$name: ${hits.distinct.mkString(",")}")
        else None
    }
    assert(flagged.isEmpty,
      s"string re-derivation inside lambda bodies (bind the derived " +
        s"array to an attribute before the lambda — the ee8be25 fix):\n" +
        s"${flagged.mkString("\n")}")
  }

  test("the lambda audit fires on a seeded violation and stays quiet " +
      "on the hoisted fix") {
    import org.apache.spark.sql.functions._
    // non-literal text so constant folding cannot erase the split
    val base = spark.range(3)
      .select(concat(col("id").cast("string"), lit(" a b")).as("text"))
    val bad = base.select(transform(sequence(lit(1), lit(3)),
      i => element_at(split(col("text"), " "), i)).as("toks"))
    assert(expensiveInLambda(bad.queryExecution.optimizedPlan).nonEmpty,
      "seeded split-inside-lambda violation was not detected")
    // the ee8be25 fix shape: bind the array first, per-element hash ok
    val good = base.withColumn("_tk", split(col("text"), " "))
      .select(transform(col("_tk"), t => md5(t)).as("hashes"))
    assert(expensiveInLambda(good.queryExecution.optimizedPlan).isEmpty,
      "hoisted/bound-array shape must not be flagged")
  }

  test("no cartesian/nested-loop join outside the documented exact " +
      "baselines") {
    for ((name, plan) <- plans if !exactBaselines.contains(name)) {
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name grew a nested-loop/cartesian join:\n$plan")
    }
  }

  test("no exchange is ever keyed on an embedding/vector column") {
    for ((name, plan) <- plans) {
      val partitionings = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan)
      partitionings.foreach { p =>
        assert(!p.contains("vec") && !p.contains("embedding"),
          s"$name has a vector-keyed exchange: $p")
      }
    }
  }

  test("parquet filter queries push predicates into the scan") {
    // spot-invariant on the classic filter query: the quantity/flag
    // predicates must reach the parquet reader
    val plan = plans("q02_filter_project")
    assert(plan.contains("PushedFilters: [IsNotNull") &&
      plan.contains("l_quantity"),
      s"q02 lost parquet pushdown:\n$plan")
  }

  test("corpus scans prune to the columns the query needs") {
    // documents is (doc_id, text, lang, source, n_chars); operators
    // that only consume (doc_id, text) must not drag lang/source/
    // n_chars through the scan — at 100 TB unpruned columns are
    // terabytes of wasted IO. Representative spot checks across the
    // dedup/corpus families (every ReadSchema of a documents scan in
    // the plan must omit the unused columns).
    for (name <- Seq("q20_dedup_exact",
        "q63_repetition_filter", "q74_hashed_embedding",
        "q119_bm25_topk", "q127_token_entropy")) {
      val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plans(name))
        .filter(_.contains("text")).toList
      assert(schemas.nonEmpty, s"$name: no documents ReadSchema found")
      schemas.foreach { rs =>
        assert(!rs.contains("source") && !rs.contains("n_chars"),
          s"$name reads unused document columns: $rs")
      }
    }
    // q25's registered plan now hides its documents scan inside the
    // shared shingle-table localCheckpoint (r15: the compute-once
    // boundary that collapsed the q199 variance), so the checkpoint's
    // INNER plan is audited via the structurally identical
    // pre-checkpoint frame: signatures() plans the same
    // withShingleHashes subtree over the same loader, minus the
    // boundary. Same scan, same pruning obligation.
    {
      val docs = graft.Tables.load(spark, sf0001, "documents")
      val sig = graft.operators.MinHashDedup
        .signatures(docs, "doc_id", "text")
      val plan = sig.queryExecution.executedPlan.toString
      val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan)
        .filter(_.contains("text")).toList
      assert(schemas.nonEmpty,
        "minhash shingle frame: no documents ReadSchema found")
      schemas.foreach { rs =>
        assert(!rs.contains("source") && !rs.contains("n_chars"),
          s"minhash shingle frame reads unused document columns: $rs")
      }
    }
  }

  test("vector scans prune the unused label column") {
    // embeddings is (vec_id, embedding, label); the ANN family
    // consumes only (vec_id, embedding) — label must never reach a
    // scan it doesn't feed (at 100 TB every unpruned column is real
    // IO, even a 4-byte one next to a 3 KB vector).
    for (name <- Seq("q28_ann_bruteforce", "q45_embedding_neardup_lsh",
        "q46_ann_ivf", "q41_embedding_neardup", "q180_pq_adc",
        "q190_ivfpq")) {
      val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plans(name))
        .filter(_.contains("embedding")).toList
      assert(schemas.nonEmpty, s"$name: no embeddings ReadSchema found")
      schemas.foreach { rs =>
        assert(!rs.contains("label"),
          s"$name reads the unused label column: $rs")
      }
    }
  }
}
