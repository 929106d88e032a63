package graft

import graft.llmops.{TextOps, VectorOps}
import graft.queries.Queries
import graft.sources.KafkaOffsets
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan audits — the 100 TB posture checks. These assert the
  * plan SHAPE (what would scale), not timings: broadcasts where a side
  * is small, pushdown/pruning reaching the parquet scan, no accidental
  * cartesian products, codegen on the hot paths.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("plan-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("star join broadcasts the small dims, no cartesian product") {
    val plan = physical(Queries.q11RevenueNation(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), "nation/region should broadcast")
    assert(!plan.contains("CartesianProduct"), "no cartesian in the star join")
  }

  test("filter and projection push down to the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"),
      s"filter should reach the scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"only the 2 projected columns should be read:\n$scan")
  }

  test("near-dup joins are equi-joins on index keys, never all-pairs") {
    val j35 = physical(TextOps.q35JaccardPairs(spark, dir))
    val j37 = physical(TextOps.q37NeardupLsh(spark, dir))
    assert(!j35.contains("CartesianProduct") && !j35.contains("BroadcastNestedLoop"),
      "exact Jaccard must join on the shingle inverted index")
    assert(!j37.contains("CartesianProduct") && !j37.contains("BroadcastNestedLoop"),
      "LSH path must join on (band, bucket-hash)")
    val j53 = physical(TextOps.q53SimhashNeardup(spark, dir))
    assert(!j53.contains("CartesianProduct") && !j53.contains("BroadcastNestedLoop"),
      "SimHash near-dup must join on the 15-bit band chunks")
  }

  test("ANN path joins on LSH buckets; only the brute-force baseline is quadratic") {
    val ann = physical(VectorOps.q41AnnLsh(spark, dir))
    assert(!ann.contains("CartesianProduct"),
      "ANN must equi-join on (table, bucket), not cross join")
  }

  test("embedding near-dup (q43) joins on LSH buckets, never all-pairs") {
    val plan = physical(VectorOps.q43CosNeardup(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q43 must equi-join on (table, probed bucket):\n$plan")
  }

  test("bucketed join (q50): no exchange below the join, both scans bucketed") {
    val df = Queries.q50BucketedJoin(spark, dir)
    df.collect() // AQE final plan exists only after an action
    val plan = physical(df)
    // the join is the bottom-most operator: its subtree is everything
    // from the SortMergeJoin line to the end of the final-plan section
    val finalSection = plan.split("== Initial Plan ==").head
    val joinIdx = finalSection.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
    val joinSubtree = finalSection.substring(joinIdx)
    assert(!joinSubtree.contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$joinSubtree")
    assert("Bucketed: true".r.findAllIn(joinSubtree).length == 2,
      s"both scans must read bucketed layouts:\n$joinSubtree")
  }

  test("dot-product hot path stays inside whole-stage codegen") {
    val df = VectorOps.q40CosineTopk(spark, dir)
    assert(physical(df).contains("dotproduct("),
      "expected the native dot product in the plan")
    // the top-k also collapses to WindowGroupLimit (rank pushdown)
    assert(physical(df).contains("WindowGroupLimit"))
    df.collect() // AQE shows codegen stages only in the FINAL plan
    // codegen stages print as "*(n) Operator" in the final plan; the
    // projection computing sim must carry the star
    val simLine = physical(df).linesIterator.find(_.contains("dotproduct(v")).getOrElse("")
    assert(simLine.contains("*("),
      s"dot product fell out of codegen: $simLine")
  }

  test("vocab top-k: partial+final agg, rank pushed down as WindowGroupLimit") {
    val plan = physical(TextOps.q55VocabTopk(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "vocab aggregation must map-side combine — the shuffle carries the vocab, not the corpus")
    assert(plan.contains("WindowGroupLimit"),
      s"per-lang top-k must push below the full sort:\n$plan")
  }

  test("skew report (q149): key counts partial-agg'd, global top-k as TakeOrderedAndProject, no percentile buffer") {
    val plan = physical(graft.queries.MiningOps.q149SkewReport(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "the key-count aggregation must map-side combine")
    // the explicit orderBy+limit makes the distributed top-k
    // STRUCTURAL (the old rank-filter shape was rescued by
    // LimitPushDownThroughWindow, verified empirically — but a
    // rescue an optimizer-rule rename could silently lose)
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must ride TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("percentile_cont"),
      s"p99 must come from the frequency-of-frequency frame, not an " +
        s"aggregate that buffers every key count:\n$plan")
  }

  test("bm25 (q81): postings partial-agg'd, per-term top-k pushed as WindowGroupLimit, stats broadcast") {
    val plan = physical(TextOps.q81Bm25(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "the tf/inverted-index aggregation must map-side combine")
    assert(plan.contains("WindowGroupLimit"),
      s"per-term top-k must push below the full sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"only broadcast-sized stats may cross the postings:\n$plan")
  }

  test("packing (q56): distributed prefix sum, no per-language serial window") {
    val p56 = physical(TextOps.q56SeqPack(spark, dir))
    // the round-2 shape was `sum(tk) over (partition by lang order by
    // doc_id)` — one task per language; at 100 TB the dominant
    // language IS the corpus. No window may partition by lang alone
    // (partition spec = cols before the first ASC/DESC order col).
    val langOnlyWindow = """windowspecdefinition\(lang#\d+, \w+#\d+ (ASC|DESC)""".r
    assert(langOnlyWindow.findFirstIn(p56).isEmpty,
      s"q56 must not run a window partitioned by lang alone:\n$p56")
    // the per-partition offset table joins back as a broadcast; the
    // corpus itself is never shuffle-joined
    assert(p56.contains("BroadcastHashJoin") && !p56.contains("SortMergeJoin"),
      s"offsets must broadcast-join back:\n$p56")
  }

  test("packing (q56): pid-consistent across branches — cached parted + serial-window equality") {
    // round-3 ADVICE (medium), confirmed live on inspection: before
    // the persist, the executed plan materialized TWO independent
    // range exchanges (column pruning broke canonical equality for the
    // offsets branch, defeating exchange reuse), each drawing its own
    // RangePartitioner sample — boundary rows could get different pids
    // in totals vs. the window. The persisted `parted` substitutes on
    // the ANALYZED plan, so all three references read one cached RDD.
    val df = TextOps.q56SeqPack(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("InMemoryTableScan"),
      s"q56's range-partitioned frame must be read from the single cached RDD:\n$plan")
    // semantic pin, partitioning-independent: the distributed prefix
    // sum must equal the serial one-window-per-language formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("tk"))
      .withColumn("run", sum("tk").over(w))
      .withColumn("chunk", expr(s"(run - tk) div ${TextOps.PackBudget}"))
      .groupBy("lang", "chunk")
      .agg(count(lit(1)).as("n_docs"), sum("tk").as("chunk_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lang", "chunk")
      .collect().toSeq
    assert(df.collect().toSeq == expected,
      "distributed two-phase prefix sum must equal the serial window result")
  }

  test("modality agreement (q69): pair pipelines materialize once, plan reads no files") {
    // round-3 verdict #1: nt/nb and ne/nb each referenced an expensive
    // pipeline twice with no persist. Both pair sets are now eagerly
    // checkpointed at construction, so the aggregation plan must read
    // ONLY the two checkpointed RDDs — any FileScan would mean a
    // pipeline re-executes inside the final query.
    val df = TextOps.q69ModalityAgreement(spark, dir)
    val plan = physical(df)
    assert(!plan.contains("FileScan"),
      s"q69 must aggregate over the checkpointed pair sets, not re-run the pipelines:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"q69's leaves should be the checkpointed pair RDDs:\n$plan")
  }

  test("recall certifications (q47/q61) read the persisted exact top-k, not a fresh cross join") {
    // the exact side is the published q40 artifact: both certification
    // plans must reference it through an InMemoryTableScan leaf —
    // exactly one cross join may remain (the LSH/IVF side has none;
    // a second brute-force pass would mean the consumer face rebuilt)
    for (df <- Seq(VectorOps.q47AnnRecall(spark, dir),
                   VectorOps.q61IvfRecall(spark, dir))) {
      val plan = physical(df)
      assert(plan.contains("InMemoryTableScan"),
        s"cert must read the persisted exact top-k artifact:\n$plan")
    }
  }

  test("ANN artifact consumers (q41/q47/q61/q65) read persisted sets, not rebuilt pipelines") {
    // the round-7 artifact discipline, plan-locked: each consumer's
    // executed plan must reference its published set through an
    // InMemoryTableScan leaf — a missing leaf means a future edit
    // silently restored the per-action pipeline rebuild (the shape
    // that made q41 the suite's slowest entry)
    for ((name, df) <- Seq(
        "q41" -> VectorOps.q41AnnLsh(spark, dir),
        "q47" -> VectorOps.q47AnnRecall(spark, dir),
        "q61" -> VectorOps.q61IvfRecall(spark, dir),
        "q65" -> VectorOps.q65TruncFidelity(spark, dir))) {
      val plan = physical(df)
      assert(plan.contains("InMemoryTableScan"),
        s"$name must consume its published artifact:\n$plan")
    }
  }

  test("winnowing (q103): no joins, one doc_id exchange for the position windows") {
    val plan = physical(TextOps.q103Winnowing(spark, dir))
    assert(!plan.contains("Join"), s"winnowing needs no join:\n$plan")
    // exchanges: one hashpartitioning(doc_id) for the windows, one
    // final aggregation exchange, one rangepartitioning output sort —
    // nothing corpus-pair-shaped
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("pagerank (q75): edge set materializes once, iterations never re-run the pair pipeline") {
    // the q69 discipline applied to an ITERATIVE consumer: the q53 LSH
    // subplan must appear zero times in the composed 5-round plan —
    // its output is checkpointed once and every round joins the
    // checkpointed RDD. A FileScan anywhere means an iteration is
    // paying the pair-pipeline cost PrIters times.
    val df = TextOps.q75Pagerank(spark, dir)
    val plan = physical(df)
    assert(!plan.contains("FileScan"),
      s"q75 iterations must read the checkpointed edge set, not re-run q53:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"q75's leaves should be the checkpointed edges/degrees RDDs:\n$plan")
  }

  test("kmeans codebook (q74): assignment maps against literal centroids, no data-sized join") {
    // Lloyd assignment against literal-broadcast centroids: the final
    // plan is scan → project (codegen'd dot products) → hash agg. The
    // only permissible join is the 1-ROW broadcast of the global
    // (gmin, gmax) grid bounds; a shuffled join would mean the
    // centroids ride as a dataset instead of plan literals — the
    // shape that stops scaling.
    val df = VectorOps.q74KmeansCodebook(spark, dir)
    val plan = physical(df)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"q74 assignment must not shuffle-join — centroids are plan literals:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      s"only the scalar grid-bounds broadcast may join:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"q74's per-centroid stats should be a partial-agg'd hash aggregate:\n$plan")
  }

  test("semdedup (q78): cell equi-join over narrow id rows, no cartesian, vectors fetched by id") {
    val plan = physical(VectorOps.q78Semdedup(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"q78 pairs must equi-join on the cell id, never all-pairs:\n$plan")
    // the only nested-loops are 1-row (gmin, gmax) grid broadcasts —
    // one per reference to the assignment map (pair build side, pair
    // probe side, verdict join); anything more means a data-sized
    // cross join crept in
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 3,
      s"only scalar grid-bound broadcasts may nested-loop:\n$plan")
  }

  test("survivors (q79): label join + partial-agg'd max_by winner, no per-cluster window") {
    val plan = physical(TextOps.q79DedupSurvivors(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q79 must join corpus to labels by doc_id:\n$plan")
    assert(plan.contains("max_by"),
      s"the survivor rule is a partial-aggregable max_by, never a window " +
        s"that sorts a whole cluster on one reducer:\n$plan")
    assert(!"Window\\b".r.findFirstIn(plan).isDefined ||
        !plan.contains("row_number"),
      s"no per-cluster row_number window:\n$plan")
  }

  test("incremental dedup (q92): probe-vs-index equi-joins only, no cartesian") {
    val plan = physical(TextOps.q92IncrementalDedup(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q92 must never form all-pairs — banded candidates and fp probes only:\n$plan")
  }

  test("PMI (q93): corpus collapses at the pair aggregation, vocab tables broadcast") {
    val plan = physical(TextOps.q93PmiCollocations(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"no data-relation cartesian:\n$plan")
    // the only nested-loops are the two 1-row totals (n_tok, n_bg)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2,
      s"only the scalar totals may nested-loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the unigram lookups must broadcast, never shuffle the pair table:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"nothing may shuffle-join after the pair aggregation:\n$plan")
  }

  test("quality sampling (q94): joinless map + one partial-agg shuffle") {
    val plan = physical(TextOps.q94QualitySample(spark, dir))
    assert(!plan.contains("Join"), s"score+hash+compare needs no join:\n$plan")
    // one aggregation exchange + the output-order exchange, nothing else
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"the corpus must collapse in one (source, band) aggregation:\n$plan")
  }

  test("PII redaction (q95): joinless map + one partial-agg shuffle, no text past the map") {
    val plan = physical(TextOps.q95PiiRedact(spark, dir))
    assert(!plan.contains("Join"), s"regex cascade + counters need no join:\n$plan")
    // one aggregation exchange + the output-order exchange, nothing else
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"the corpus must collapse in one per-source aggregation:\n$plan")
    assert(plan.contains("partial_"),
      s"counters must pre-combine map-side before the source shuffle:\n$plan")
  }

  test("edit-dist verify (q96): text attaches to the bounded pair set by id equi-join, no cartesian") {
    val plan = physical(TextOps.q96EditdistVerify(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the verify must ride the q53 band-bucket candidates, never all pairs:\n$plan")
  }

  test("capped LM (q72): scoring joins broadcast, top-K is distributed, corpus never shuffle-joined") {
    val df = TextOps.q72LmScoreCapped(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"capped LM + context tables must broadcast to the scoring join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle against the LM table:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-K cut must be distributed partial top-K, not a global sort:\n$plan")
  }

  test("sampling plan (q57): no joins, one pass over the corpus") {
    val p57 = physical(TextOps.q57StratifiedSample(spark, dir))
    assert(!p57.contains("Join"), "hash-based sampling needs no join")
    // the sampling predicate must evaluate map-side, before the shuffle
    val filterIdx = p57.indexOf("Filter")
    val exchangeIdx = p57.indexOf("Exchange")
    assert(filterIdx > exchangeIdx && exchangeIdx >= 0,
      s"sample filter must run below the aggregation exchange:\n$p57")
  }

  test("quantization (q58) is map-only: no join/agg, only the output-order exchange") {
    val plan = physical(VectorOps.q58Quantize(spark, dir))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      "quantization must stay a per-row map")
    assert("Exchange".r.findAllIn(plan).length == 1 && plan.contains("rangepartitioning"),
      s"only the deterministic output ordering may shuffle:\n$plan")
  }

  test("decontamination (q59): eval shingle set broadcasts, no big-to-big shuffle join") {
    val plan = physical(TextOps.q59Decontaminate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"the eval shingle set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the contamination check must not shuffle the train shingles for a join:\n$plan")
  }

  test("partitioned layout (q60): lang predicate prunes partitions at the scan") {
    val df = Queries.q60PartitionPruning(spark, dir)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("PartitionFilters: [") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[", "").takeWhile(_ != ']').contains("lang"),
      s"lang = 'en' must land in PartitionFilters:\n$scan")
    assert(!scan.contains("PushedFilters: [IsNotNull(lang)"),
      "lang must be a directory predicate, not a row-level data filter")
  }

  test("z-order layout (q76): the Morton bucket IN-list prunes directories, box residue stays row-level") {
    val df = Queries.q76ZorderPruned(spark, dir)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("PartitionFilters")).getOrElse("")
    val pf = scan.replaceAll("(?s).*PartitionFilters: \\[", "").takeWhile(_ != ']')
    assert(pf.contains("zb"),
      s"zb IN (...) must land in PartitionFilters (directory pruning):\n$scan")
    // a 2-D box must NOT read the whole grid: the enumerated bucket
    // list is a strict subset of the 2^(2*ZBits) cells
    val inList = "\\d+".r.findAllIn(pf).toSeq
    assert(inList.nonEmpty && inList.size < (1 << (2 * Queries.ZBits)),
      s"the box should prune to a strict subset of the ${1 << (2 * Queries.ZBits)} buckets:\n$pf")
    // the exact box predicates remain as row-level filters
    assert(scan.contains("PushedFilters") &&
      (scan.contains("user_id") || df.queryExecution.executedPlan.toString.contains("user_id")),
      s"the exact box residue must still filter rows:\n$scan")
  }

  test("round-3 text ops: doc_id-keyed plans, no cartesian blowups") {
    val p62 = physical(TextOps.q62Repetition(spark, dir))
    assert(!p62.contains("CartesianProduct") && !p62.contains("BroadcastNestedLoop"),
      s"repetition profile must join per-doc aggregates on doc_id:\n$p62")
    val p64 = physical(TextOps.q64LmScore(spark, dir))
    assert(!p64.contains("CartesianProduct"), s"LM scoring must equi-join on bigram keys:\n$p64")
    // the only nested-loop allowed in q64 is the 1-row vocab-size broadcast
    assert("BroadcastNestedLoop".r.findAllIn(p64).length <= 1,
      s"unexpected non-equi join in the LM score plan:\n$p64")
  }

  test("BPE tokenize (q71): the merged vocabulary broadcasts to the corpus join") {
    val plan = physical(TextOps.q71BpeTokenize(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"tokenize-by-lookup must broadcast the vocabulary:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian in q71:\n$plan")
  }

  test("metrics aggregation is partial+final (map-side combine)") {
    val plan = physical(Queries.q01Metrics(spark, dir))
    val hashAggs = "HashAggregate".r.findAllIn(plan).length
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got $hashAggs")
  }

  test("seek end-N offset planning matches the reference arithmetic") {
    val begin = Map(0 -> 0L, 1 -> 5L, 2 -> 0L)
    val end = Map(0 -> 100L, 1 -> 80L, 2 -> 7L)
    // target 30 over 3 partitions -> ceil = 10 per partition
    val starts = KafkaOffsets.seekEndMinusN(begin, end, 30)
    assert(starts == Map(0 -> 90L, 1 -> 70L, 2 -> 0L)) // p2 clamped to beginning
    // ceiling division: target 31 -> 11 per partition
    assert(KafkaOffsets.seekEndMinusN(begin, end, 31)(0) == 89L)
    val json = KafkaOffsets.startingOffsetsJson("carga", starts)
    assert(json == """{"carga":{"0":90,"1":70,"2":0}}""")
    val opts = KafkaOffsets.tailScanOptions("carga", begin, end, 30, Some(64))
    assert(opts("minPartitions") == "64" && opts("endingOffsets") == "latest")
  }
}
