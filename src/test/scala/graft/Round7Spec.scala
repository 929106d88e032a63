package graft

import graft.llmops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 curation operators: cross-source overlap (q90) and
  * vocabulary coverage (q91). Value equality vs DuckDB is the
  * oracle's job; these pin engine-side conservation invariants and
  * the non-vacuous calibration of the fixture. */
class Round7Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("round7-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q90: the matrix conserves the q53 pair graph; shares are valid fractions") {
    val matrix = TextOps.q90SourceOverlap(spark, dir).collect()
    assert(matrix.nonEmpty)
    val totalPairs = matrix.map(_.getAs[Long]("n_pairs")).sum
    val q53Pairs = TextOps.q53SimhashNeardup(spark, dir).count()
    assert(totalPairs == q53Pairs,
      s"every near-dup pair must land in exactly one matrix cell: $totalPairs vs $q53Pairs")
    matrix.foreach { r =>
      assert(r.getAs[String]("src_a") <= r.getAs[String]("src_b"), "ordered pairs")
      val (sa, sb) = (r.getAs[Double]("share_a"), r.getAs[Double]("share_b"))
      assert(sa > 0 && sa <= 1.0 && sb > 0 && sb <= 1.0, s"shares in (0,1]: $r")
      assert(r.getAs[Long]("n_docs_a") <= r.getAs[Long]("n_pairs") &&
        r.getAs[Long]("n_docs_b") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("q90: cross-source mirroring is visible on the fixture (off-diagonal rows)") {
    val matrix = TextOps.q90SourceOverlap(spark, dir).collect()
    assert(matrix.exists(r => r.getAs[String]("src_a") != r.getAs[String]("src_b")),
      "fixture must exercise the mirror-detection case, not just the diagonal")
  }

  test("q91: coverage identities hold and the fixture is non-vacuous") {
    val rows = TextOps.q91VocabCoverage(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, typ, vtok) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("vocab_tokens"))
      assert(vtok <= tok && typ > 0)
      val unk = r.getAs[Double]("unk_rate")
      assert(math.abs(unk - (1.0 - vtok.toDouble / tok)) < 1e-12)
      assert(unk >= 0 && unk < 1.0)
    }
    // the calibration point: CovVocabV must sit BELOW the fixture's
    // type count so the unk mass is nonzero — at V >= all types the
    // op measures nothing (the round-7 V=64 lesson)
    assert(rows.exists(_.getAs[Double]("unk_rate") > 0),
      "vocab budget must leave some token mass uncovered on the fixture")
  }

  test("q91: the top-V rank pushes down as WindowGroupLimit (never a full per-lang vocab sort)") {
    val plan = TextOps.q91VocabCoverage(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"q91's rank filter must ride InferWindowGroupLimit — a bare " +
        s"window here is a full vocabulary sort on one reducer per lang:\n$plan")
  }

  test("q92: incremental flags fire per axis; within-batch dups stay invisible") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val histA = (0 until 30).map(i => s"w$i").mkString(" ")
    val histB = (0 until 30).map(i => s"z$i").mkString(" ")
    val nearB = ((0 until 29).map(i => s"z$i") :+ "q99").mkString(" ")
    val fresh = (0 until 30).map(i => s"u$i").mkString(" ")
    val batchDup = (0 until 30).map(i => s"v$i").mkString(" ")
    def row(id: Long, t: String) = Row(id, t, "en", "src0", t.length.toLong)
    val crafted = graft.operators.PlanCache.tempDir("graft_incr_")
    spark.createDataFrame(List(
      row(1L, histA), row(2L, histB),          // history (id % 5 != 0)
      row(5L, histA),                          // exact + near copy of history
      row(10L, nearB),                         // near-only vs history (1 token differs)
      row(15L, fresh),                         // genuinely new
      row(20L, batchDup), row(25L, batchDup)   // dup WITHIN the new batch only
    ).asJava, docSchema).write.parquet(s"$crafted/documents.parquet")
    val out = TextOps.q92IncrementalDedup(spark, crafted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out.keySet == Set(5L, 10L, 15L, 20L, 25L), "only the new batch is emitted")
    assert(out(5L) == ((true, true, false)), "identical history copy: both axes fire")
    assert(out(10L) == ((false, true, false)),
      "one-token edit: fingerprint differs but LSH+Jaccard catches it")
    assert(out(15L) == ((false, false, true)), "unseen content survives")
    // the discriminating property vs q34/q37: incremental dedup checks
    // ONLY against history — a pair living entirely inside today's
    // batch is this op's non-goal (a within-batch pass handles it)
    assert(out(20L) == ((false, false, true)) && out(25L) == ((false, false, true)),
      "within-batch duplicates must not flag against each other")
  }

  test("q93: PMI matches the hand formula; glued pairs rank above chance pairs") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // "a b" repeated 12× → c(a,b)=12, c(b,a)=11, c(a)=c(b)=12, N=24, M=23
    val t = Seq.fill(12)("a b").mkString(" ")
    val crafted = graft.operators.PlanCache.tempDir("graft_pmi_")
    spark.createDataFrame(List(Row(1L, t, "en", "src0", t.length.toLong)).asJava,
      docSchema).write.parquet(s"$crafted/documents.parquet")
    val out = TextOps.q93PmiCollocations(spark, crafted).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("pair_n"), r.getAs[Double]("pmi")))).toMap
    assert(out.keySet == Set("a" -> "b", "b" -> "a"),
      s"both orders clear PmiMinCount=${TextOps.PmiMinCount}: $out")
    def pmi(cab: Long) = math.round(
      math.log(cab.toDouble * 24 * 24 / (23.0 * 12 * 12)) * 1e6) / 1e6
    assert(out("a" -> "b") == ((12L, pmi(12))), s"hand formula: ${out("a" -> "b")}")
    assert(out("b" -> "a") == ((11L, pmi(11))))
    // the statistic's point on the real fixture: SOME qualifying pair
    // must sit above 0 (above-chance gluing) — all-zero PMI would mean
    // the op measures nothing on the word-salad corpus
    val fix = TextOps.q93PmiCollocations(spark, dir).collect()
    assert(fix.nonEmpty, "fixture must have pairs over the count floor")
    assert(fix.exists(_.getAs[Double]("pmi") > 0), "above-chance pairs exist")
  }

  test("q94: retention conserved, rate-0/rate-1 bands exact, sampling non-vacuous") {
    val rows = TextOps.q94QualitySample(spark, dir).collect()
    assert(rows.nonEmpty)
    val corpus = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus,
      "every document lands in exactly one (source, band) cell")
    rows.foreach { r =>
      val (b, n, k) = (r.getAs[Int]("band"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"))
      assert(k >= 0 && k <= n, s"retention bounds: $r")
      assert(b >= 0 && b <= 10, s"band domain: $r")
      // the integer rule's exact endpoints: h·10 < 0 is impossible,
      // h·10 < 10·P always holds (h < P)
      if (b == 0) assert(k == 0, s"band 0 must drop everything: $r")
      if (b == 10) assert(k == n, s"band 10 must keep everything: $r")
    }
    // non-vacuity: at least one band is PARTIALLY sampled — all-or-
    // nothing everywhere would mean the hash gate never actually ran
    assert(rows.exists(r => r.getAs[Long]("n_kept") > 0 &&
      r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")),
      s"some band must sample strictly between 0 and all: ${rows.mkString(";")}")
  }

  test("q96: token-order shuffles slip past SimHash and are caught by the edit verify") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def doc(id: Long, text: String) =
      Row(id, text, "en", "s0", text.length.toLong)
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = List(
      doc(10, base),
      doc(11, base), // exact duplicate: sim 1.0, confirmed
      // same TOKEN SET, reversed order: identical simhash (hamming 0)
      // — the candidate SimHash cannot distinguish; the char-level
      // verify must reject it
      doc(12, base.split(" ").reverse.mkString(" ")))
    val d = graft.operators.PlanCache.tempDir("graft_r7_edit_")
    spark.createDataFrame(rows.asJava, schema)
      .write.parquet(s"$d/documents.parquet")
    val out = TextOps.q96EditdistVerify(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    // all three pairs are candidates (identical token set => identical
    // fingerprint => same band buckets)
    assert(out.keySet == Set((10L, 11L), (10L, 12L), (11L, 12L)), s"$out")
    val dup = out((10L, 11L))
    assert(dup.getAs[Int]("hamming") == 0 && dup.getAs[Long]("lev") == 0 &&
      dup.getAs[Double]("edit_sim") == 1.0 && dup.getAs[Boolean]("confirmed"))
    val shuffled = out((10L, 12L))
    assert(shuffled.getAs[Int]("hamming") == 0,
      s"SimHash is order-blind by construction: $shuffled")
    assert(!shuffled.getAs[Boolean]("confirmed") &&
      shuffled.getAs[Double]("edit_sim") < TextOps.EditSimMin,
      s"the char-level verify must reject the token shuffle: $shuffled")
    // similarity is a valid [0,1] fraction (NULL only beyond the DP
    // band, where lev = -1 and confirmed must be false) and the
    // verdict is exactly the threshold predicate on every pair
    out.values.foreach { r =>
      if (r.isNullAt(r.fieldIndex("edit_sim"))) {
        assert(r.getAs[Long]("lev") == -1L && !r.getAs[Boolean]("confirmed"))
      } else {
        val sim = r.getAs[Double]("edit_sim")
        assert(sim >= 0.0 && sim <= 1.0)
        assert(r.getAs[Boolean]("confirmed") == (sim >= TextOps.EditSimMin))
      }
    }
  }

  test("q95: PII cascade counts exactly; email local-parts never double-count as phones") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def doc(id: Long, text: String, src: String) =
      Row(id, text, "en", src, text.length.toLong)
    val rows = List(
      // 1 email whose local part contains '+digits' — the cascade
      // must redact it as ONE email, zero phones
      doc(1, "mail a+5551234567b@example.com for details", "s0"),
      // 1 intl phone + 1 IPv4 in one doc
      doc(2, "call +1 (555) 123-4567 or ping 10.0.0.1 now", "s0"),
      // 2 IPs; the dotted quad must not leak into the phone counter
      doc(3, "hosts 192.168.1.100 and 8.8.8.8 are up", "s1"),
      // clean doc: all counters zero but the row still lands in n_docs
      doc(4, "nothing sensitive in here at all", "s1"))
    val d = graft.operators.PlanCache.tempDir("graft_r7_pii_")
    spark.createDataFrame(rows.asJava, schema)
      .write.parquet(s"$d/documents.parquet")
    val out = TextOps.q95PiiRedact(spark, d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet == Set("s0", "s1"))
    val s0 = out("s0")
    assert(s0.getAs[Long]("n_docs") == 2 && s0.getAs[Long]("docs_with_pii") == 2)
    assert(s0.getAs[Long]("n_emails") == 1, s"one email, not a phone: $s0")
    assert(s0.getAs[Long]("n_phones") == 1 && s0.getAs[Long]("n_ips") == 1)
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_docs") == 2 && s1.getAs[Long]("docs_with_pii") == 1)
    assert(s1.getAs[Long]("n_emails") == 0 && s1.getAs[Long]("n_phones") == 0 &&
      s1.getAs[Long]("n_ips") == 2, s"dotted quads are IPs, not phones: $s1")
    // byte-level certification: the fingerprint must equal a direct
    // recomputation from the redacted strings (pins the md5-mod-sum)
    import org.apache.spark.sql.functions._
    val fp = spark.read.parquet(s"$d/documents.parquet")
      .select(col("source"),
        (conv(substring(md5(
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
            "\\+[0-9][0-9 ().-]{6,}[0-9]", "<PHONE>")), 1, 15), 16, 10)
          .cast("long") % 1000003L).as("h"))
      .groupBy("source").agg(sum("h").cast("long").as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (src, r) =>
      assert(r.getAs[Long]("redacted_fp") == fp(src),
        s"fingerprint mismatch for $src")
    }
  }
}
