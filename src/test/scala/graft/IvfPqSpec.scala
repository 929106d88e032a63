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

  test("q89 candidates ride the cell equi-join — the exact baseline is the cached artifact") {
    // the exact side is the shared codeTopkCache artifact, so the
    // declared cross join lives INSIDE the InMemoryRelation's cached
    // plan. Walk the physical tree (which does not descend into cached
    // plans — and whose string form prints them a varying number of
    // times, so a regex count is the wrong instrument): the visible
    // plan must have ZERO cartesians and read the baseline through an
    // InMemoryTableScan.
    val exec = VectorOps.q89IvfpqRecall(spark, dir).queryExecution.executedPlan
    val cartesians = exec.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cartesians.isEmpty,
      s"candidate path must stay a cell equi-join, found ${cartesians.size}:\n$exec")
    assert(exec.toString.contains("InMemoryTableScan"),
      s"exact side must read the persisted codeTopkCache artifact:\n$exec")
  }
}
