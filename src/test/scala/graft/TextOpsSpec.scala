package graft

import graft.llmops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics checks for the training-data text operators on the
  * sf0.001 testdata (cross-engine value equality is covered by the
  * DuckDB oracle at sf0.01; these pin engine-side invariants). */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("textops-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("textstats: totals add up and ratios are in range") {
    val rows = TextOps.q30TextStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_chars") > 0)
      assert(r.getAs[Long]("total_ws_tokens") <= r.getAs[Long]("total_re_tokens"))
      val stop = r.getAs[Double]("stop_ratio")
      assert(stop >= 0.0 && stop <= 1.0)
    }
  }

  test("langid: every document gets exactly one prediction") {
    val n = TextOps.q31LangId(spark, dir).agg(sum("n")).head().getLong(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(n == docs)
  }

  test("fingerprint: deterministic and normalization-insensitive") {
    val a = TextOps.q33Fingerprint(spark, dir).collect()
    val b = TextOps.q33Fingerprint(spark, dir).collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getAs[Long]("fp_bucket") < 1024))
  }

  test("exact dedup: n_docs == n_distinct + n_removed") {
    TextOps.q34ExactDedup(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_distinct") + r.getAs[Long]("n_removed"))
    }
  }

  test("LSH near-dup candidates recover all exact-Jaccard pairs") {
    val exact = TextOps.q35JaccardPairs(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.q37NeardupLsh(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH output is exact-verified, so it can only miss banding misses —
    // at these thresholds (J>=0.5, 4x4 bands) recall should be total
    assert(lsh == exact, s"LSH pairs $lsh != exact pairs $exact")
  }

  test("minhash signature agreement tracks Jaccard for a near-dup pair") {
    val pairs = TextOps.q35JaccardPairs(spark, dir).collect()
    assume(pairs.nonEmpty)
    val (da, db) = (pairs.head.getLong(0), pairs.head.getLong(1))
    val sig = TextOps.q36MinhashSig(spark, dir)
      .filter(col("doc_id").isin(da, db)).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    val agree = sig(da).zip(sig(db)).count { case (x, y) => x == y }.toDouble / TextOps.MinhashK
    val j = pairs.head.getAs[Double]("jaccard")
    assert(math.abs(agree - j) < 0.5, s"sig agreement $agree vs jaccard $j")
  }

  test("vocab top-k: dense ranks, non-increasing counts, df <= n") {
    val rows = TextOps.q55VocabTopk(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val ns = sorted.map(_.getAs[Long]("n")).toSeq
      assert(ns == ns.sorted.reverse, "counts must be non-increasing in rank")
      rs.foreach(r => assert(r.getAs[Long]("df") <= r.getAs[Long]("n")))
    }
  }

  test("seq packing: token totals conserved, chunk doc-ranges disjoint") {
    val chunks = TextOps.q56SeqPack(spark, dir).collect()
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), "\\s+")).cast("long").as("tk"))
      .agg(sum("tk")).head().getLong(0)
    assert(chunks.map(_.getAs[Long]("chunk_tokens")).sum == expected,
      "every token must land in exactly one chunk")
    chunks.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk"))
      sorted.foreach(r => assert(r.getAs[Long]("n_docs") >= 1))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("last_doc") < y.getAs[Long]("first_doc"),
            "doc ranges of consecutive chunks must not overlap")
        case _ =>
      }
    }
  }

  test("repetition: fractions bounded, counts consistent") {
    val rows = TextOps.q62Repetition(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs, "one repetition profile row per document")
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_tok"), r.getAs[Long]("d_tok"))
      assert(d >= 1 && d <= n)
      Seq("dup_tok_frac", "dup_tri_frac", "top_tok_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v out of range")
      }
      // word-salad corpus reuses tokens heavily: dup_tok_frac must not
      // be degenerate-zero everywhere (guards a broken distinct count)
    }
    assert(rows.count(_.getAs[Double]("dup_tok_frac") > 0) > rows.length / 2)
  }

  test("LM score: every multi-token doc scored, NLL positive and finite") {
    val rows = TextOps.q64LmScore(spark, dir).collect()
    val multiTok = spark.read.parquet(s"$dir/documents.parquet")
      .where(org.apache.spark.sql.functions.expr("size(split(text, '\\\\s+')) >= 2")).count()
    assert(rows.length == multiTok, "every doc with >= 2 tokens has bigrams to score")
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      assert(nll > 0.0 && !nll.isInfinite && !nll.isNaN, s"bad avg_nll $nll")
      assert(r.getAs[Long]("n_bigrams") >= 1)
    }
  }

  test("chunking: stride geometry, full coverage, overlap = W - S") {
    val rows = TextOps.q63ChunkOverlap(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.size == nDocs, "every document chunks (short docs -> 1 chunk)")
    rows.values.foreach { ch =>
      val sorted = ch.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.head.getAs[Long]("start_tok") == 0)
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") == i)
        assert(r.getAs[Long]("start_tok") == i.toLong * TextOps.ChunkStride)
        val nIn = r.getAs[Long]("n_in_chunk")
        assert(nIn >= 1 && nIn <= TextOps.ChunkTokens)
      }
      // chunks overlap by W - S: each next chunk starts before the
      // previous ends, and the last chunk reaches the document end
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_tok") < a.getAs[Long]("end_tok"))
        case _ => ()
      }
    }
  }

  test("BPE merges: k distinct non-self pairs with positive weighted counts") {
    val rows = TextOps.q70BpeMerges(spark, dir).collect()
    assert(rows.length == TextOps.BpeRounds)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to TextOps.BpeRounds).toSeq)
    val pairs = rows.map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    assert(pairs.distinct.length == pairs.length, "each round learns a new pair")
    rows.foreach { r =>
      assert(r.getAs[String]("left_sym") != r.getAs[String]("right_sym"),
        "self-pairs are excluded by design")
      assert(r.getAs[Long]("pair_count") > 0)
    }
  }

  test("BPE tokenize: symbol counts bounded by chars below, tokens above") {
    val rows = TextOps.q71BpeTokenize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ws, sym) = (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_symbols"))
      // every word is at least one symbol; merges can only shrink the
      // initial char decomposition
      assert(sym >= ws, s"${r.getAs[String]("lang")}: fewer symbols than words")
      val spt = r.getAs[Double]("symbols_per_token")
      assert(spt >= 1.0 && spt < 20.0, s"symbols_per_token $spt implausible")
    }
  }

  test("mix weights: no upsampling, binding language keeps weight 1") {
    val rows = TextOps.q68MixWeights(spark, dir).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet == TextOps.MixTarget.map(_._1).toSet)
    rows.foreach { r =>
      val w = r.getAs[Double]("keep_weight")
      assert(w > 0.0 && w <= 1.0 + 1e-12, s"keep_weight $w outside (0, 1]")
      assert(r.getAs[Double]("achieved_tokens") <= r.getAs[Long]("actual_tokens") + 1e-6)
    }
    // the scale is set by the scarcest language relative to its target:
    // that one is kept whole
    assert(rows.exists(r => math.abs(r.getAs[Double]("keep_weight") - 1.0) < 1e-12),
      "exactly the binding language must keep weight 1")
    // achieved tokens realize the target proportions
    val achieved = rows.map(r => r.getAs[String]("lang") -> r.getAs[Double]("achieved_tokens")).toMap
    val total = achieved.values.sum
    TextOps.MixTarget.foreach { case (l, share) =>
      assert(math.abs(achieved(l) / total - share) < 1e-9,
        s"achieved share for $l deviates from target $share")
    }
  }

  test("modality agreement: counts consistent, agreement bounded") {
    val r = TextOps.q69ModalityAgreement(spark, dir).collect().head
    val (nt, ne, nb) = (r.getAs[Long]("n_text"), r.getAs[Long]("n_embed"),
      r.getAs[Long]("n_both"))
    assert(nb <= math.min(nt, ne), "intersection cannot exceed either modality")
    val a = r.getAs[Double]("agreement")
    assert(a >= 0.0 && a <= 1.0)
  }

  test("dedup clusters: pairs co-clustered, root is the cluster minimum") {
    val clusters = TextOps.q67DedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_root"), r.getAs[Long]("cluster_size"))).toMap
    val pairs = TextOps.q53SimhashNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // every near-dup pair lands in one cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // root is the minimum member; size counts the members
    val byRoot = clusters.groupBy(_._2._1)
    byRoot.foreach { case (root, members) =>
      assert(members.keys.min == root, s"root $root is not the cluster minimum")
      assert(members.forall(_._2._2 == members.size))
      assert(members.size >= 2, "clustered docs come from pairs, so size >= 2")
    }
  }

  test("dedup survivors (q79): one survivor per cluster, longest-text rule, singletons kept") {
    val verdicts = TextOps.q79DedupSurvivors(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_root"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("kept")))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(verdicts.length == nDocs, "one verdict row per document")
    val chars = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val byCluster = verdicts.groupBy(_._2)
    byCluster.foreach { case (root, members) =>
      assert(members.count(_._4) == 1, s"cluster $root must keep exactly one")
      assert(members.forall(_._3 == members.length),
        s"cluster $root sizes inconsistent")
      // the survivor is the longest text, doc_id as tiebreak
      val want = members.map(_._1).minBy(id => (-chars(id), id))
      assert(members.find(_._4).get._1 == want,
        s"cluster $root kept the wrong survivor")
    }
    // singletons are their own root and trivially survive
    verdicts.filter(_._3 == 1L).foreach { case (id, root, _, kept) =>
      assert(root == id && kept, s"singleton $id must self-root and survive")
    }
    // clustered verdicts agree with q67's labels
    val labels = TextOps.q67DedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_root")).toMap
    verdicts.filter(_._3 > 1L).foreach { case (id, root, _, _) =>
      assert(labels(id) == root, s"doc $id root drifted from q67")
    }
    assert(byCluster.exists(_._2.length > 1), "fixture must contain real clusters")
  }

  test("bm25 (q81): full term coverage, ranks contiguous, scores positive and sorted") {
    val rows = TextOps.q81Bm25(spark, dir).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Int]("rnk"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    val byTerm = rows.groupBy(_._1)
    assert(byTerm.size == TextOps.Bm25Terms, s"want ${TextOps.Bm25Terms} query terms")
    byTerm.foreach { case (term, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rs.length), s"$term ranks not contiguous")
      assert(rs.length <= TextOps.Bm25TopDocs)
      val scores = sorted.map(_._4)
      assert(scores.forall(_ > 0.0), s"$term has non-positive BM25+ scores")
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$term scores not sorted: ${scores.toSeq}")
    }
    // the query terms are the corpus's own top-frequency vocabulary cut
    val topTerms = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t"))
      .limit(TextOps.Bm25Terms).collect().map(_.getString(0)).toSet
    assert(byTerm.keySet == topTerms, "query terms drifted from the vocab cut")
    // every scored doc really contains its term
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { case (term, _, id, _) =>
      assert(texts(id).split("\\s+").contains(term), s"doc $id lacks term $term")
    }
  }

  test("pagerank (q75): deterministic, damping floor holds, hubs outrank leaves") {
    val a = TextOps.q75Pagerank(spark, dir).collect()
    val b = TextOps.q75Pagerank(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "fixed-point pagerank must be bit-identical across runs")
    assert(a.nonEmpty && a.length <= TextOps.PrTopK)
    // output ordering and the teleport floor: with damping 0.85 no
    // node can fall below 15% of the initial mass
    val ranks = a.map(_.getAs[Long]("pr_rank"))
    assert(ranks.sameElements(ranks.sorted.reverse), "rows must be rank-descending")
    val floor = 15L * TextOps.PrScale / 100
    assert(ranks.forall(_ >= floor), s"ranks below the teleport floor $floor")
    a.foreach(r => assert(r.getAs[Long]("deg") >= 1,
      "every ranked node is incident to a near-dup edge"))
    // mass sanity: the symmetrized graph has no dangling nodes, so
    // total mass stays within the initial N*Scale budget
    val nodes = TextOps.q53SimhashNeardup(spark, dir)
      .select("doc_a").union(TextOps.q53SimhashNeardup(spark, dir).select("doc_b"))
      .distinct().count()
    assert(ranks.head <= nodes * TextOps.PrScale,
      "no node can hold more than the whole graph's mass")
  }

  test("dup-ngram coverage (q77): ratios consistent, duplicate spans fully covered, unique docs zero") {
    val rows = TextOps.q77DupNgramCoverage(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup"))
      assert(n > 0 && d >= 0 && d <= n, s"n_dup $d out of [0, $n]")
      assert(math.abs(r.getAs[Double]("dup_ratio") - d.toDouble / n) < 1e-12)
    }
    // controlled fixture: two identical 10-token docs (every 8-gram
    // occurs twice -> ratio 1.0) and one unique doc (ratio 0.0)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dup = "a b c d e f g h i j"
    val uniq = "k l m n o p q r s t"
    val d2 = graft.operators.PlanCache.tempDir("graft_q77_fix_")
    spark.createDataFrame(List(
      Row(1L, dup, "en", "s0", dup.length.toLong),
      Row(2L, dup, "en", "s0", dup.length.toLong),
      Row(3L, uniq, "en", "s0", uniq.length.toLong)).asJava, schema)
      .write.parquet(s"$d2/documents.parquet")
    val m = TextOps.q77DupNgramCoverage(spark, d2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_ratio")).toMap
    assert(m(1L) == 1.0 && m(2L) == 1.0,
      "exact-duplicate docs must be 100% covered by duplicated grams")
    assert(m(3L) == 0.0, "a unique doc shares no 8-gram with the corpus")
  }

  test("stratified sample: deterministic, en downsampled, other strata whole") {
    val a = TextOps.q57StratifiedSample(spark, dir).collect()
    val b = TextOps.q57StratifiedSample(spark, dir).collect()
    assert(a.sameElements(b), "hash-based sampling must be reproducible")
    val kept = a.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val totals = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") < totals("en"), "en stratum must be downsampled")
    totals.keys.filterNot(_ == "en").foreach { l =>
      assert(kept(l) == totals(l), s"stratum $l must be kept whole")
    }
  }

  test("simhash: near-dup pairs are hamming-close, fingerprints fit 60 bits") {
    val sh = TextOps.q38Simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.values.forall(v => v >= 0 && v < (1L << 60)))
    val pairs = TextOps.q35JaccardPairs(spark, dir).collect()
    pairs.foreach { p =>
      val d = java.lang.Long.bitCount(sh(p.getLong(0)) ^ sh(p.getLong(1)))
      assert(d <= 20, s"near-dup pair hamming distance $d > 20")
    }
  }

  test("bloom decontamination (q87): exact twin equals q59, certification booleans hold") {
    val rows = TextOps.q87BloomDecontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    // the pinned booleans: no false negatives ever; false positives
    // inside the generous wiring bound
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bloom_no_miss"),
        s"bloom lost a true hit for doc ${r.getLong(0)} — broken merge?")
      assert(r.getAs[Boolean]("bloom_fp_bounded"),
        s"bloom fp count out of bound for doc ${r.getLong(0)} — saturated filter?")
    }
    // the exact columns are q59 verbatim (same formula, same rows)
    val q59 = TextOps.q59Decontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val q87 = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(q87 == q59, "q87's exact side must equal q59 row-for-row")
  }

  test("winnowing (q103): profile invariants on the fixture") {
    val rows = TextOps.q103Winnowing(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val grams = r.getAs[Long]("n_grams")
      val wins = r.getAs[Long]("n_windows")
      val fp = r.getAs[Long]("n_fp")
      assert(wins == grams - TextOps.WinnowW + 1)
      // at least one fingerprint per window-span, never more than
      // one selection per window
      assert(fp >= 1 && fp <= wins)
      val d = r.getAs[Double]("fp_density")
      assert(d > 0.0 && d <= 1.0)
    }
    // realized corpus-level density sits near the 2/(w+1) expectation
    val tot = TextOps.q103Winnowing(spark, dir)
      .agg(sum("n_fp").cast("double") / sum("n_windows")).head().getDouble(0)
    val expected = 2.0 / (TextOps.WinnowW + 1)
    assert(math.abs(tot - expected) < 0.25,
      s"corpus density $tot far from winnowing expectation $expected")
  }

  test("winnowing guarantee: a shared k+w-1 token run yields a shared fingerprint") {
    val s = spark
    import s.implicits._
    // two documents sharing a 12-token run (> k + w - 1 = 6) inside
    // otherwise-distinct text; winnowing MUST select at least one
    // common (hash) fingerprint from the shared run — the property
    // uniform mod-p sampling cannot promise
    val shared = (1 to 12).map(i => s"run$i").mkString(" ")
    val docA = s"alpha beta gamma $shared delta epsilon zeta eta"
    val docB = s"one two three four five $shared six seven eight nine"
    val tok = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
      .withColumn("w", split(col("text"), "\\s+"))
    val fp = TextOps.winnowFingerprintsOf(tok)
      .select("doc_id", "fh").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "documents sharing a 12-token run must share a winnowed fingerprint")
  }

  test("winnowing: documents shorter than k + w - 1 tokens emit nothing") {
    val s = spark
    import s.implicits._
    val tok = Seq((1L, "a b c d e"), (2L, "a b c d e f")).toDF("doc_id", "text")
      .withColumn("w", split(col("text"), "\\s+"))
    // 5 tokens -> m = 3 < w: no complete window; 6 tokens -> m = 4 = w: one window
    val got = TextOps.winnowFingerprintsOf(tok)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }

  test("dedup report (q104): the funnel agrees with the stages it summarizes") {
    val r = TextOps.q104DedupReport(spark, dir).head()
    val verd = TextOps.q79DedupSurvivors(spark, dir)
    assert(r.getAs[Long]("n_docs") == verd.count())
    assert(r.getAs[Long]("n_kept") == verd.filter(col("kept")).count())
    val ex34 = TextOps.q34ExactDedup(spark, dir)
      .agg(sum("n_distinct"), sum("n_removed")).head()
    assert(r.getAs[Long]("n_exact_unique") == ex34.getLong(0))
    assert(r.getAs[Long]("n_exact_dups") == ex34.getLong(1))
    assert(r.getAs[Long]("n_neardup_clusters") <= r.getAs[Long]("n_neardup_docs"))
    assert(r.getAs[Double]("keep_ratio") > 0.0 && r.getAs[Double]("keep_ratio") <= 1.0)
  }

  test("q196: half-split language cross-tab equals a brute-force recompute") {
    val langs = TextOps.LangMarkers
    def predict(toks: Array[String]): String = {
      val cnt = langs.map { case (l, ws) =>
        l -> toks.count(ws.contains(_)).toLong
      }
      val mx = cnt.map(_._2).max
      cnt.find { case (_, c) => c > 0 && c == mx }.map(_._1).getOrElse("und")
    }
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map { r =>
        val w = r.getString(0).split("\\s+", -1)
        val h = w.length / 2
        (predict(w.take(h)), predict(w.drop(h)))
      }
      .groupBy(identity).map { case ((a, b), rows) =>
        (a, b, rows.length.toLong, a != b)
      }.toSeq.sortBy(t => (t._1, t._2))
    val got = TextOps.q196CodeSwitch(spark, dir).collect()
      .map(r => (r.getAs[String]("head_lang"), r.getAs[String]("tail_lang"),
        r.getAs[Long]("n"), r.getAs[Boolean]("switched")))
    assert(got.toSeq == want,
      "cross-tab must match the per-doc half-split recompute")
    // total mass equals the corpus: every document lands in one cell
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(got.map(_._3).sum == nDocs)
  }

  test("q200: CDC chunk dedup equals a brute-force recompute") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def h60(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(hex.take(15), 16) % TextOps.MinhashP).toLong
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val chunked = docs.map { case (id, text) =>
      val w = text.split("\\s+", -1)
      val chunks = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      w.foreach { t =>
        chunks.last += t
        if (h60(t) % TextOps.CdcMask == 0)
          chunks += scala.collection.mutable.ArrayBuffer.empty[String]
      }
      // a trailing boundary opens an empty chunk that never receives
      // a token — it has no rows in the engine's per-position frame
      id -> chunks.filter(_.nonEmpty).map(_.toSeq).toSeq
    }
    val copyCount = chunked.flatMap(_._2).map(_.mkString(" "))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val want = chunked.map { case (id, chs) =>
      val dup = chs.filter(c => copyCount(c.mkString(" ")) > 1)
      val nTok = chs.map(_.length).sum
      (id, nTok.toLong, chs.length.toLong, dup.length.toLong,
        dup.map(_.length).sum.toLong,
        r6(dup.map(_.length).sum.toDouble / nTok))
    }.sortBy(_._1)
    val got = TextOps.q200CdcChunks(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("dup_chunks"),
        r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_frac")))
    assert(got.toSeq == want.toSeq)
    // content-defined boundaries must actually split: average chunk
    // length should be near CdcMask, not one-chunk-per-doc
    val totalChunks = got.map(_._3).sum
    assert(totalChunks > got.length, "chunking must split documents")
  }

  test("q202: source sketch Jaccard equals a brute-force signature + set recompute") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def h60(sh: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sh.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(hex.take(15), 16) % TextOps.MinhashP).toLong
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bySource = docs.groupBy(_._3).map { case (src, ds) =>
      src -> ds.flatMap { case (_, text, _) =>
        val w = text.split("\\s+", -1)
        (0 until w.length - 2).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      }.toSet
    }.filter(_._2.nonEmpty)
    // the same universal-hash family as q36: h_j(x) = (a_j·x + b_j) mod P
    def sig(shs: Set[String]): IndexedSeq[Long] = {
      val hs = shs.toSeq.map(h60)
      (0 until TextOps.MinhashK).map { j =>
        hs.map(h => (h * (2L * j + 1) + 7919L * (j + 1)) % TextOps.MinhashP).min
      }
    }
    val sigs = bySource.map { case (s2, shs) => s2 -> sig(shs) }
    val srcs = bySource.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; k <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(k))
      inter = (bySource(a) & bySource(b)).size.toLong
      na = bySource(a).size.toLong; nb = bySource(b).size.toLong
      nMatch = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
    } yield (a, b, na, nb, inter, nMatch,
      r6(nMatch.toDouble / TextOps.MinhashK),
      r6(inter.toDouble / (na + nb - inter)))).toSeq
    val got = TextOps.q202SourceSketchJaccard(spark, dir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Long]("inter"),
        r.getAs[Long]("n_match"), r.getAs[Double]("est_j"),
        r.getAs[Double]("exact_j")))
    assert(got.toSeq == want,
      "source-pair sketch estimates and exact Jaccards must both match")
    // the estimate is a real estimator: components bounded, values in [0,1]
    got.foreach { g =>
      assert(g._6 >= 0 && g._6 <= TextOps.MinhashK)
      assert(g._7 >= 0.0 && g._7 <= 1.0 && g._8 >= 0.0 && g._8 <= 1.0)
    }
  }

  test("q207: kappa equals a brute-force contingency recompute; cells partition the corpus") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def labels(text: String): (Boolean, Boolean) = {
      val w = text.split("\\s+", -1)
      val counts = w.groupBy(identity).map(_._2.length)
      val nw = w.length.toLong
      val meanLen = w.map(_.length.toLong).sum.toDouble / nw
      val stp = w.count(TextOps.Stop.contains(_)).toLong
      val gopher = !(nw < TextOps.GopherMinWords || nw > TextOps.GopherMaxWords) &&
        !(meanLen < TextOps.GopherMinMeanLen || meanLen > TextOps.GopherMaxMeanLen) &&
        counts.size.toDouble / nw >= TextOps.GopherMinUniqueRatio &&
        counts.max.toDouble / nw <= TextOps.GopherMaxTopRatio &&
        stp >= TextOps.GopherMinStop
      // mirror the engine regex exactly: strip [a-zA-Z0-9\s]
      val punctExact = if (text.isEmpty) 0.0
        else text.replaceAll("[a-zA-Z0-9\\s]", "").length.toDouble / text.length
      val q = math.min(nw.toDouble / 100.0, 1.0) * 0.5 +
        (1.0 - punctExact) * 0.3 +
        math.min(stp.toDouble / nw * 5.0, 1.0) * 0.2
      (gopher, q >= TextOps.KappaQualThresh)
    }
    val cells = docs.map(d => labels(d._2))
    val pp = cells.count(c => c._1 && c._2).toLong
    val pf = cells.count(c => c._1 && !c._2).toLong
    val fp = cells.count(c => !c._1 && c._2).toLong
    val ff = cells.count(c => !c._1 && !c._2).toLong
    val n = pp + pf + fp + ff
    val peNum = (pp + pf) * (pp + fp) + (fp + ff) * (pf + ff)
    val r = TextOps.q207LabelerKappa(spark, dir).head()
    assert((r.getAs[Long]("n_pp"), r.getAs[Long]("n_pf"),
      r.getAs[Long]("n_fp"), r.getAs[Long]("n_ff")) == ((pp, pf, fp, ff)))
    assert(r.getAs[Long]("n_docs") == n && n == docs.length)
    assert(r.getAs[Double]("p_o") == r6((pp + ff).toDouble / n))
    assert(r.getAs[Double]("p_e") == r6(peNum.toDouble / (n * n)))
    assert(r.getAs[Double]("kappa") ==
      r6((n * (pp + ff) - peNum).toDouble / (n * n - peNum).toDouble))
    assert(r.getAs[Double]("kappa") >= -1.0 && r.getAs[Double]("kappa") <= 1.0)
  }

  test("q208: marginal novelty equals a brute-force first-seen recompute") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh = docs.flatMap { case (id, text) =>
      val w = text.split("\\s+", -1)
      (0 until w.length - 2).map(i => (id, s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
    }.distinct
    val firstDoc = sh.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).min }
    val mx = sh.map(_._1).max
    val want = sh.map { case (id, shg) =>
      (id * 10 / (mx + 1), id, if (firstDoc(shg) == id) 1L else 0L)
    }.groupBy(_._1).map { case (d, rows) =>
      (d, rows.map(_._2).distinct.length.toLong, rows.length.toLong,
        rows.map(_._3).sum)
    }.toSeq.sortBy(_._1)
      .map(t => (t._1, t._2, t._3, t._4, r6(t._4.toDouble / t._3)))
    val got = TextOps.q208MarginalNovelty(spark, dir).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
        r.getAs[Double]("novelty_frac")))
    assert(got.toSeq == want)
    // every shingle is novel exactly once: novel mass = |vocabulary|
    assert(got.map(_._4).sum == firstDoc.size)
  }

  test("q200/q202 plans: no unbroadcast pair enumeration") {
    // q200's dup accounting flows through the copy-count table keyed
    // on the content hash — no non-equi join of any kind; q202's
    // exact side is the shingle-keyed inverted-index join, and its
    // one permitted nested-loop is the |sources|-row BROADCAST
    // self-join of the signature table (constant-size by
    // construction) — an unbroadcast CartesianProduct anywhere means
    // a corpus-sized pair space materialized
    val p200 = TextOps.q200CdcChunks(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p200.contains("CartesianProduct") &&
        !p200.contains("BroadcastNestedLoopJoin"),
      s"q200 must not enumerate pairs:\n$p200")
    val p202 = TextOps.q202SourceSketchJaccard(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p202.contains("CartesianProduct"),
      s"q202 must not materialize an unbroadcast pair space:\n$p202")
  }
}
