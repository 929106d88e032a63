package graft

import graft.llmops.VectorOps
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q89 IVF-PQ + ADC (IVFADC): the combined-index certification.
  * Cross-engine value equality is the DuckDB oracle's job; these pin
  * the engine-side quality floor and the candidate-join discipline. */
class IvfPqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("ivfpq-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q89 IVFADC: recall beats the random baseline despite 3/8-cell probing") {
    val r = VectorOps.q89IvfpqRecall(spark, dir).collect().head
    val (nq, hits, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nq > 0 && hits >= 0)
    // the q84 floor still applies with the IVF half in the loop: the
    // probed cells are the query's own nearest, so pruning 5/8 cells
    // must not drag recall to the random-pick level (~0.01 here)
    val baseline = VectorOps.TopK.toDouble / (nq - 1).max(1)
    assert(recall > 3 * baseline && recall <= 1.0,
      s"IVFADC recall $recall must beat random $baseline by 3x+")
  }

  test("q89 candidates ride the cell equi-join — the only cross join is the exact baseline") {
    val plan = VectorOps.q89IvfpqRecall(spark, dir)
      .queryExecution.executedPlan.toString
    val cartesians = "CartesianProduct".r.findAllIn(plan).length +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(cartesians == 1,
      s"expected exactly the declared exact-baseline cross join, found $cartesians:\n$plan")
  }
}
