package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared ScalaTest base: one local SparkSession per suite, UTC, small
  * shuffle parallelism (tests are tiny; 4 partitions keeps plans readable).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM (sbt forks once); don't stop.
    super.afterAll()
  }

  /** Collect to a sorted Seq of plain tuples-as-strings for order-free compare. */
  def rowsOf(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString(""))

  def assertSameRows(actual: DataFrame, expected: Seq[Seq[String]]): Unit = {
    val a = rowsOf(actual)
    val e = expected.map(_.map(String.valueOf(_))).sortBy(_.mkString(""))
    assert(a == e, s"\nactual:\n${a.mkString("\n")}\nexpected:\n${e.mkString("\n")}")
  }
}
