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
}
