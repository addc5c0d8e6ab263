package graft.functions

import graft.SparkFixture
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FloatVectorDot: value agreement with the strict left-to-right fold,
  * null semantics of the UDF it replaced, and proof the plan stays
  * inside WholeStageCodegen (the point of being a native expression).
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("dot matches the left-to-right double fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zip(vecs.reverse).zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("i")
    val got = df.collect().map(_.getDouble(1))
    val want = vecs.zip(vecs.reverse).map { case (a, b) =>
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w) } // exact, not approx
  }

  test("null semantics: null array, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq[Option[Float]](Some(1f), Some(2f))), Some(Seq[Option[Float]](Some(3f), Some(4f)))),
      (2, None, Some(Seq[Option[Float]](Some(1f)))),                  // null array
      (3, Some(Seq[Option[Float]](Some(1f), None)), Some(Seq[Option[Float]](Some(1f), Some(1f)))), // null element
      (4, Some(Seq[Option[Float]](Some(1f))), Some(Seq[Option[Float]](Some(1f), Some(2f)))))       // length mismatch
      .toDF("i", "a", "b")
      .select(col("i"), Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("i")
    val rows = df.collect()
    assert(rows(0).getDouble(1) == 11.0)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1) && rows(3).isNullAt(1))
  }

  test("dot stays inside WholeStageCodegen (no UDF barrier)") {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(
        Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))), 1)
      .toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    val codegenNodes = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenNodes.nonEmpty,
      s"expected WholeStageCodegen in:\n${df.queryExecution.executedPlan}")
    assert(df.collect()(0).getDouble(0) == 32.0)
  }
}
