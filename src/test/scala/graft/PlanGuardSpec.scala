package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Standing scale guardrails over EVERY registered query, enforced
  * plan-side (no execution): a true cartesian product or a fat
  * cross-join is how a 100 TB plan dies, and a one-line regression
  * anywhere in the registry should fail a named test — not wait for
  * the next bench. Also pins the repo-wide conventions the plan
  * audits rely on: no driver-side collect() and no Scala UDFs in
  * main sources.
  */
class PlanGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.codegen.maxFields", "300")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  // Generous estimate bound for the small side of an intentional
  // cross-join (broadcast literal grids, one-row scalar aggregates).
  // A cross-join whose SMALLER side is estimated fatter than this is
  // a corpus×corpus product, not a grid fan-out.
  private val MaxCrossSideBytes = BigInt(32L * 1024 * 1024)

  // ONE planning pass shared by both plan tests (round 15, test-wall
  // budget): building fn(spark, dir) twice re-ran analysis + the
  // optimizer for every registered query — and for the 12 streaming
  // replays, fn() EXECUTES the whole replay — so each test paid
  // ~2.5 min for the same QueryExecutions. sparkPlan forces
  // optimizedPlan, so both assertions read the same computed lineage.
  private lazy val qes = SparkEntry.queries.toSeq.map { case (name, fn) =>
    (name, fn(spark, dir).queryExecution)
  }

  test("no registered query plans a cartesian product") {
    val offenders = qes.flatMap { case (name, qe) =>
      val cart = qe.sparkPlan.collect { case c: CartesianProductExec => c }
      if (cart.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProductExec: ${offenders.toList.sorted}")
  }

  test("every cross-join keeps one broadcast-tiny side") {
    val offenders = qes.flatMap { case (name, qe) =>
      val fat = qe.optimizedPlan.collect {
        case j: Join if j.condition.isEmpty =>
          j.left.stats.sizeInBytes.min(j.right.stats.sizeInBytes)
      }.filter(_ > MaxCrossSideBytes)
      if (fat.nonEmpty) Some(s"$name(minSide=${fat.max})") else None
    }
    assert(offenders.isEmpty,
      s"cross-joins with a fat small side: ${offenders.toList.sorted}")
  }

  test("main sources: no driver collect()/first()/head() and no Scala UDFs outside diagnostics") {
    val root = java.nio.file.Paths.get("/root/repo/src/main/scala/graft")
    // Replay.scala: the streaming replay harness feeds MemoryStream,
    // which is driver-fed BY DESIGN (the sanctioned exception — see
    // its scaladoc; the registered query output is still distributed)
    // VerifyRecall.scala: recall-measurement main (driver-side scalar
    // reads of one-row aggregates only)
    // RangeStress.scala: range-join stress main (same shape — one-row
    // aggregate sinks read as scalars)
    // RangeJoinAuto.scala: plan-choice statistics — two one-row
    // aggregate reads over the smaller join side BEFORE planning (the
    // adaptive-planning pattern); the data path stays distributed
    val allowCollect = Set("Prof.scala", "Explain.scala", "Replay.scala",
      "VerifyRecall.scala", "RangeStress.scala", "RangeJoinAuto.scala")
    val bad = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(p => allowCollect(p.getFileName.toString))
      .flatMap { p =>
        val src = java.nio.file.Files.readString(p)
        val hits = Seq(
          ".collect()" -> src.contains(".collect()"),
          // .first()/.head() are collects too: a blocking scalar job
          // serialized before the main job (round-11 gl_odds finding)
          ".first()" -> src.contains(".first()"),
          ".head()" -> src.contains(".head()"),
          ".head(" -> src.contains(".head("),
          "functions.udf(" -> src.contains("functions.udf("),
          "spark.udf.register" -> src.contains("spark.udf.register"))
          .collect { case (what, true) => what }
        if (hits.nonEmpty) Some(s"${p.getFileName}: ${hits.mkString(",")}")
        else None
      }.toList
    assert(bad.isEmpty, s"convention violations: $bad")
  }
}
