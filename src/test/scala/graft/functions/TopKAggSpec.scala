package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKAgg vs the window-function reference on multi-partition input
  * (the aggregate must survive partial/merge across partitions and
  * reproduce the exact (score DESC, id ASC) order, ties included).
  */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def data = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // deliberate score ties to exercise the id tie-break
    (0 until 2000).map(i => (i.toLong % 7, i.toLong, rnd.nextInt(50).toLong))
      .toDF("g", "id", "score").repartition(8)
  }

  test("topKBy matches row_number window ranking, ties broken by id") {
    val df = data
    val viaAgg = df.groupBy("g")
      .agg(TopKAgg.topKBy(col("score"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.score").as("score"), col("col.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("g", "rank", "score", "id")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaAgg == viaWindow)
  }

  test("double scores (mixed signs) match the window ranking") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // negative and positive scores exercise the IEEE-754 sortable-bits
    // mapping on both sides of zero
    val df = (0 until 1000).map(i =>
      (i.toLong % 5, i.toLong, rnd.nextDouble() * 2.0 - 1.0))
      .toDF("g", "id", "score").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(TopKAgg.topKBy(col("score"), col("id"), 7).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.score").as("score"), col("col.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select("g", "rank", "score", "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(viaAgg == viaWindow)
  }

  test("top_k_by SQL name is registered and k bounds the output") {
    MiintRegistry.registerAll(spark)
    data.createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      "SELECT g, size(top_k_by(score, id, 3)) AS n FROM topk_in GROUP BY g")
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) == 3))
  }
}
