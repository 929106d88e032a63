package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the scale-validation corpus construction (PERF.md §3): the
  * drill is only meaningful if the scaled corpus actually exhibits the
  * HOT-SHINGLE adversarial regime, so the properties the round-6
  * numbers were measured under are asserted here — a silent change to
  * the salting would otherwise turn future drills into soft tests. */
class ScaleCheckSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _
  private var out: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("scalecheck-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    base = java.nio.file.Files.createTempDirectory("graft_scbase_").toString
    out = java.nio.file.Files.createTempDirectory("graft_scout_").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta gamma delta", "en", "src0"),
      (2L, "alpha beta epsilon", "en", "src1"),
      (3L, "zeta eta theta iota kappa", "pt", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$base/documents.parquet")
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), 0),
      (2L, Array(4.0f, 5.0f, 6.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$base/embeddings.parquet")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 10L, "view", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 20L, "click", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/events.parquet")
    Seq((10L, "cust10", 1, 5.0, "SEG")).toDF(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$base/customer.parquet")
    ScaleCheck.materialize(spark, base, out)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("scaled corpus: 10x docs with distinct ids, 4x vectors with shifted values") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 30)
    assert(docs.select("doc_id").distinct().count() == 30, "copy ids must not collide")
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(emb.count() == 8)
    // per-copy shift keeps vectors distinct while preserving geometry
    val firsts = emb.select(element_at(col("embedding"), 1)).collect()
      .map(_.getFloat(0)).toSet
    assert(firsts.size >= 8 - 2 + 1, s"copies must perturb values: $firsts")
  }

  test("salting produces the hot-shingle regime: (salt, word, salt) trigram df tracks word df") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    // copy 0 of the base docs: tokens interleaved with salt0
    val copy0 = docs.filter(col("doc_id") <= 3)
    val toks = copy0.select(col("doc_id"),
      split(col("text"), "\\s+").as("w"))
    // every INTERIOR token is flanked by the salt, so the trigram
    // (salt0, w, salt0) occurs for each interior word occurrence —
    // its document frequency equals the word's own df over interior
    // positions. Check the shared interior word "beta": df 2 in base.
    val tri = toks.select(col("doc_id"), posexplode(col("w")).as(Seq("p", "t")))
      .filter(col("t") === "beta").select("doc_id").distinct().count()
    assert(tri == 2, s"'beta' must appear in 2 docs of copy 0, got $tri")
    // and the salt itself is in EVERY doc of the copy — the hot token
    val saltDf = toks.select(col("doc_id"), explode(col("w")).as("t"))
      .filter(col("t") === "salt0").select("doc_id").distinct().count()
    assert(saltDf == 3, "salt token must be corpus-hot within its copy")
    // token count doubles minus one: n words -> 2n-1 tokens
    val counts = toks.select(size(col("w")).as("n")).collect().map(_.getInt(0)).sorted
    assert(counts.toSeq == Seq(5, 7, 9), s"interleave must give 2n-1 tokens: ${counts.toSeq}")
  }

  test("scaled events: 10x rows, distinct event_ids, UNCHANGED hot user_ids; dimension unscaled") {
    val ev = spark.read.parquet(s"$out/events.parquet")
    assert(ev.count() == 30)
    assert(ev.select("event_id").distinct().count() == 30, "copy ids must not collide")
    // the skew/state regime: user_ids (and event types) do NOT scale —
    // every user becomes a 10x hot key and the sq10 distinct key set
    // stays fixed while input rows grow
    assert(ev.select("user_id").distinct().count() == 2)
    assert(ev.select("user_id", "event_type").distinct().count() == 3)
    assert(spark.read.parquet(s"$out/customer.parquet").count() == 1,
      "the customer dimension must copy over unscaled")
  }

  test("salts differ across copies so shingles never collide cross-copy") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val salts = docs.select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(col("t").startsWith("salt")).distinct().collect().map(_.getString(0)).toSet
    assert(salts == (0 until 10).map(c => s"salt$c").toSet)
  }

  test("ScaleSweep.materializeLevel: digit-append ids stay distinct at depth, salt families disjoint") {
    val lvl = java.nio.file.Files.createTempDirectory("graft_sclvl_").toString
    // chain on top of the already-materialized 10x dir — the depth
    // case ScaleCheck's additive offsets cannot survive
    ScaleSweep.materializeLevel(spark, out, lvl)
    val docs = spark.read.parquet(s"$lvl/documents.parquet")
    assert(docs.count() == 300, "10x the 30-doc level-1 corpus")
    assert(docs.select("doc_id").distinct().count() == 300,
      "digit-append ids must stay collision-free when chained")
    val salts = docs.select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(col("t").rlike("^s?salt[0-9]$")).select("t").distinct()
      .collect().map(_.getString(0)).toSet
    assert((0 until 10).forall(c => salts.contains(s"ssalt$c")),
      "level-2 salts present")
    assert((0 until 10).forall(c => salts.contains(s"salt$c")),
      "level-1 salts preserved inside level-2 copies")
    val ev = spark.read.parquet(s"$lvl/events.parquet")
    assert(ev.select("event_id").distinct().count() == ev.count(),
      "event ids distinct after chaining")
    assert(ev.select("user_id").distinct().count() == 2,
      "user ids unchanged — the hot-key/bounded-state regime compounds")
  }

  test("ScaleSweep.exchangeCounts separates shuffle from broadcast exchanges") {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    // one groupBy = one shuffle exchange, zero broadcasts
    val (s1, b1) = ScaleSweep.exchangeCounts(
      docs.groupBy("source").agg(count(lit(1))))
    assert(s1 == 1 && b1 == 0, s"groupBy counted ($s1, $b1)")
    // a broadcast-hinted join adds exactly one broadcast exchange and
    // no shuffle for the joined side
    val dims = docs.select(col("source")).distinct()
    val (s2, b2) = ScaleSweep.exchangeCounts(
      docs.join(broadcast(dims), Seq("source")).groupBy("lang")
        .agg(count(lit(1))))
    assert(b2 == 1, s"broadcast join counted ($s2, $b2)")
    assert(s2 >= 1 && s2 <= 2, s"distinct+agg shuffles counted ($s2, $b2)")
  }
}
