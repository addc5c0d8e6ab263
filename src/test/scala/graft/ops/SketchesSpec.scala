package graft.ops

import graft.SparkFixture
import graft.kernel.Sketches.{FreqSketch, ThetaSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ---- kernel: theta / KMV ----

  test("theta: exact below k, for strings and longs") {
    val s = new ThetaSketch(1024)
    (0 until 500).foreach(i => s.update(s"item$i"))
    (0 until 500).foreach(i => s.update(s"item$i")) // duplicates ignored
    assert(s.estimate == 500.0)
    val t = new ThetaSketch(1024)
    (0L until 800L).foreach(t.update)
    assert(t.estimate == 800.0)
  }

  test("theta: estimate within 5% at 200k distinct, k=4096") {
    val s = new ThetaSketch(4096)
    (0L until 200000L).foreach(s.update)
    assert(math.abs(s.estimate - 200000.0) / 200000.0 < 0.05, s.estimate)
  }

  test("theta: merge == single-stream sketch (canonical bytes), any split/order") {
    val whole = new ThetaSketch(512)
    (0L until 5000L).foreach(whole.update)
    for (splitAt <- Seq(1, 1000, 2500, 4999)) {
      val a = new ThetaSketch(512)
      val b = new ThetaSketch(512)
      (0L until splitAt.toLong).foreach(a.update)
      (splitAt.toLong until 5000L).foreach(b.update)
      a.merge(b)
      assert(a.serialized.toSeq == whole.serialized.toSeq, s"split at $splitAt")
      val a2 = new ThetaSketch(512)
      val b2 = new ThetaSketch(512)
      (0L until splitAt.toLong).foreach(a2.update)
      (splitAt.toLong until 5000L).foreach(b2.update)
      b2.merge(a2) // commuted
      assert(b2.serialized.toSeq == whole.serialized.toSeq, s"commuted split $splitAt")
    }
  }

  test("theta: serialization round-trip preserves state exactly") {
    val s = new ThetaSketch(256)
    (0L until 10000L).foreach(s.update)
    val back = ThetaSketch.deserialize(s.serialized)
    assert(back.estimate == s.estimate)
    assert(back.serialized.toSeq == s.serialized.toSeq)
  }

  test("theta: intersection exact below k; bounded error above") {
    // exact regime
    val a = new ThetaSketch(4096)
    val b = new ThetaSketch(4096)
    (0L until 1000L).foreach(a.update)
    (700L until 1500L).foreach(b.update)
    assert(ThetaSketch.intersectEstimate(a, b) == 300.0)
    // saturated: |A|=|B|=100k, overlap 30k, k=4096
    val sa = new ThetaSketch(4096)
    val sb = new ThetaSketch(4096)
    (0L until 100000L).foreach(sa.update)
    (70000L until 170000L).foreach(sb.update)
    val est = ThetaSketch.intersectEstimate(sa, sb)
    assert(math.abs(est - 30000.0) / 30000.0 < 0.15, est)
  }

  // ---- kernel: Misra-Gries ----

  test("freq: exact when distinct <= k") {
    val s = new FreqSketch(8)
    val stream = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    scala.util.Random.shuffle(stream).foreach(x => s.update(x))
    assert(s.result().toSeq == Seq(("a", 40L, 40L), ("b", 25L, 25L), ("c", 3L, 3L)))
  }

  test("freq: heavy-hitter guarantee past capacity") {
    // 2 heavy items + 1000 singletons through k=16 counters
    val s = new FreqSketch(16)
    val stream = scala.util.Random.shuffle(
      Seq.fill(500)("heavy1") ++ Seq.fill(300)("heavy2") ++
        (0 until 1000).map(i => s"noise$i"))
    stream.foreach(x => s.update(x))
    val res = s.result().map(r => r._1 -> r).toMap
    val h1 = res("heavy1")
    val h2 = res("heavy2")
    assert(h1._2 <= 500 && 500 <= h1._3, h1)
    assert(h2._2 <= 300 && 300 <= h2._3, h2)
    // MG error bound: decrements <= n/(k+1)
    assert(s.decremented <= (500 + 300 + 1000) / (16 + 1) + 1)
  }

  test("freq: merge keeps bounds and exactness-when-unsaturated") {
    val a = new FreqSketch(64)
    val b = new FreqSketch(64)
    (0 until 30).foreach(i => { a.update("x"); a.update(s"a$i") })
    (0 until 20).foreach(i => { b.update("x"); b.update(s"b$i") })
    a.merge(b)
    val m = a.result().map(r => r._1 -> r).toMap
    assert(m("x") == (("x", 50L, 50L)))
    // round-trip
    val back = FreqSketch.deserialize(a.serialized)
    assert(back.result().toSeq == a.result().toSeq)
  }

  // ---- DataFrame aggregates: partial-agg + shuffle serialization ----

  test("thetaSketch agg: distributed == kernel, exact regime, 8 partitions") {
    val df = spark.range(0, 3000).select(
      (col("id") % 700).as("user"), (col("id") % 3).cast("string").as("g"))
      .repartition(8)
    val out = df.groupBy("g")
      .agg(Sketches.thetaEstimate(Sketches.thetaSketch(col("user"), 1024)).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.values.toSet == Set(700.0))
  }

  test("thetaUnion agg: per-group sketches re-merge to the global count") {
    val df = spark.range(0, 5000).select(
      (col("id") % 911).as("user"), (col("id") % 7).as("day"))
      .repartition(8)
    val perDay = df.groupBy("day").agg(Sketches.thetaSketch(col("user"), 2048).as("sk"))
    val global = perDay.agg(
      Sketches.thetaEstimate(Sketches.thetaUnion(col("sk"), 2048)).as("est"))
      .collect().head.getDouble(0)
    assert(global == 911.0)
  }

  test("thetaIntersect: overlap of two groups' sketches, exact regime") {
    val a = spark.range(0, 1000).select(col("id").as("user"))
    val b = spark.range(600, 1700).select(col("id").as("user"))
    val ska = a.agg(Sketches.thetaSketch(col("user"), 4096).as("sk")).collect()
      .head.getAs[Array[Byte]](0)
    val skb = b.agg(Sketches.thetaSketch(col("user"), 4096).as("sk")).collect()
      .head.getAs[Array[Byte]](0)
    val est = graft.kernel.Sketches.ThetaSketch.intersectEstimate(
      graft.kernel.Sketches.ThetaSketch.deserialize(ska),
      graft.kernel.Sketches.ThetaSketch.deserialize(skb))
    assert(est == 400.0)
  }

  test("freqItems agg: exact counts and order across partitions") {
    val rows = Seq.fill(9)("alpha") ++ Seq.fill(5)("beta") ++
      Seq.fill(5)("ties") ++ Seq.fill(2)("gamma")
    val df = rows.toDF("w").repartition(8)
    val out = df.agg(Sketches.freqItems(col("w"), 16).as("fi"))
      .selectExpr("inline(fi)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("alpha", 9L, 9L), ("beta", 5L, 5L), ("ties", 5L, 5L), ("gamma", 2L, 2L)))
  }

  // ---- kernel: KLL quantiles ----

  test("kll: exact regime equals quantile_disc (sorted[ceil(q*n)-1]) any order") {
    import graft.kernel.Sketches.QuantileSketch
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0) // n=7
    for (perm <- Seq(vals, vals.reverse, vals.sorted)) {
      val s = new QuantileSketch(64)
      perm.foreach(s.update)
      val sorted = vals.sorted
      for (q <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
        val idx = math.max(math.ceil(q * vals.size).toInt, 1) - 1
        assert(s.quantile(q) == sorted(idx), s"q=$q perm=$perm")
      }
    }
  }

  test("kll: merge in exact regime == single stream, serialized round-trip") {
    import graft.kernel.Sketches.QuantileSketch
    val whole = new QuantileSketch(256)
    (1 to 200).foreach(i => whole.update(i.toDouble))
    val a = new QuantileSketch(256)
    val b = new QuantileSketch(256)
    (1 to 77).foreach(i => a.update(i.toDouble))
    (78 to 200).foreach(i => b.update(i.toDouble))
    val a2 = QuantileSketch.deserialize(a.serialized)
    a2.merge(QuantileSketch.deserialize(b.serialized))
    assert(a2.n == 200L)
    for (q <- Seq(0.1, 0.5, 0.95))
      assert(a2.quantile(q) == whole.quantile(q), s"q=$q")
  }

  test("kll: rank error bounded past saturation (100k stream, k=256)") {
    import graft.kernel.Sketches.QuantileSketch
    val s = new QuantileSketch(256)
    // adversarial-ish order: interleave low/high halves
    (0 until 50000).foreach { i =>
      s.update(i.toDouble); s.update((99999 - i).toDouble)
    }
    assert(s.n == 100000L)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(q)
      val err = math.abs(est / 100000.0 - q)
      // KLL guarantee is ~O(1/k) ≈ 0.004 at k=256; 5x safety margin
      assert(err < 0.02, s"q=$q est=$est err=$err")
    }
    // state stays O(k log(n/k)), far below n
    assert(s.serialized.length < 256 * 8 * 8, s.serialized.length)
  }

  test("kll agg + merge agg: distributed exact regime across 8 partitions") {
    val df = spark.range(1, 501).select(col("id"),
      (col("id") % 4).as("g")).repartition(8)
    val perGroup = df.groupBy("g")
      .agg(Sketches.kllSketch(col("id"), 1024).as("sk"))
    val out = perGroup
      .select(col("g"), Sketches.kllN(col("sk")).as("n"),
        Sketches.kllQuantile(col("sk"), lit(0.5)).as("p50"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // group g holds {id : 1<=id<=500, id%4==g}; median = ceil(0.5n)-th
    def expect(g: Long): (Long, Long, Double) = {
      val vs = (1L to 500L).filter(_ % 4 == g).map(_.toDouble).sorted
      (g, vs.size.toLong, vs((math.ceil(0.5 * vs.size) - 1).toInt))
    }
    assert(out == (0L to 3L).map(expect).toSet)
    // merge the per-group sketches back to the global distribution
    val merged = perGroup.agg(Sketches.kllMerge(col("sk"), 1024).as("m"))
      .select(Sketches.kllN(col("m")), Sketches.kllQuantile(col("m"), lit(0.5)))
      .collect().head
    assert(merged.getLong(0) == 500L)
    assert(merged.getDouble(1) == 250.0) // ceil(0.5*500)=250th of 1..500
  }

  test("sketch state stays O(k) on a wide stream (map-side partial agg)") {
    // 200k distinct through k=256: estimate close, state tiny
    val df = spark.range(0, 200000).repartition(8)
    val sk = df.agg(Sketches.thetaSketch(col("id"), 256).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    assert(sk.length <= 8 + 256 * 8)
    val est = graft.kernel.Sketches.ThetaSketch.deserialize(sk).estimate
    assert(math.abs(est - 200000.0) / 200000.0 < 0.2, est)
  }
}
