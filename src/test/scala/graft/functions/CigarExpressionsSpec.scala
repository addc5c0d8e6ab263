package graft.functions

import graft.SparkFixture
import graft.kernel.Cigar
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The byte-level CigarCodegen twins must agree with the reference-
  * validated String kernel on every input, and the native expressions
  * must evaluate identically under codegen and interpreted paths.
  */
class CigarExpressionsSpec extends AnyFunSuite {

  /** Deterministic generator sampling (no scalatest-scalacheck bridge
    * in the offline cache): 500 seeded samples per property.
    */
  private def samples[A](g: Gen[A], n: Int = 500): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val opGen = Gen.oneOf("M", "I", "D", "N", "S", "H", "P", "=", "X")
  private val cigarGen: Gen[String] = for {
    n <- Gen.choose(0, 8)
    ops <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 500)
      op <- opGen
    } yield s"$len$op")
  } yield if (ops.isEmpty) "*" else ops.mkString

  private val mdGen: Gen[String] = for {
    n <- Gen.choose(0, 6)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(0, 99).map(_.toString),
      Gen.oneOf("A", "C", "G", "T"),
      Gen.oneOf("^A", "^ACG")))
  } yield parts.mkString

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  test("CigarCodegen.queryLength/queryCoverage agree with kernel on random CIGARs") {
    for (c <- samples(cigarGen); hard <- Seq(true, false)) {
      assert(CigarCodegen.queryLength(u(c), hard) === Cigar.queryLength(c, hard))
      assert(CigarCodegen.queryCoverage(u(c), u("aligned")) === Cigar.queryCoverage(c, "aligned"))
      assert(CigarCodegen.queryCoverage(u(c), u("mapped")) === Cigar.queryCoverage(c, "mapped"))
    }
  }

  test("CigarCodegen.seqIdentity agrees with kernel on random CIGAR/NM/MD") {
    val cases = samples(for {
      c <- cigarGen; nm <- Gen.choose(-1L, 30L); md <- mdGen
      t <- Gen.oneOf("gap_excluded", "blast", "gap_compressed")
    } yield (c, nm, md, t), 1500)
    for ((c, nm, md, t) <- cases) {
      val expected = Cigar.seqIdentity(c, nm, md, t)
      val got = Option(CigarCodegen.seqIdentity(u(c), nm < 0, nm, u(md), u(t)))
        .map(_.doubleValue())
      assert(got === expected, s"cigar=$c nm=$nm md=$md type=$t")
    }
  }

  test("CigarCodegen rejects malformed CIGARs exactly like the kernel") {
    for (bad <- Seq("M", "10", "10M5", "3Q", "10m")) {
      intercept[Cigar.InvalidCigarException](CigarCodegen.queryLength(u(bad), true))
      intercept[Cigar.InvalidCigarException](Cigar.queryLength(bad, true))
      // identity swallows parse errors → NULL on both paths
      assert(CigarCodegen.seqIdentity(u(bad), false, 1L, null, u("blast")) == null)
      assert(Cigar.seqIdentity(bad, 1L, null, "blast").isEmpty)
    }
  }

  test("native expressions evaluate under WholeStageCodegen with reference values") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // RDD-backed input: a local Seq would be constant-folded into a
    // LocalTableScan (interpreted eval), never reaching doGenCode.
    val df = spark.sparkContext.parallelize(Seq(
        ("8M2I5M", Some(2L), Some("11A1")),
        ("10M", Some(0L), None),
        ("*", Some(1L), Some("5")),
        ("5S10M3H", None, None)), 1)
      .toDF("cigar", "nm", "md") // 1 partition → collect preserves order
      .select(
        AlignmentFunctions.alignmentSeqIdentity(
          col("cigar"), col("nm"), col("md"), "gap_compressed").as("gc"),
        AlignmentFunctions.alignmentSeqIdentity(
          col("cigar"), col("nm"), col("md"), "gap_excluded").as("ge"),
        AlignmentFunctions.alignmentQueryLength(col("cigar")).as("qlen"),
        AlignmentFunctions.alignmentQueryLength(col("cigar"), includeHardClips = false).as("qlen_nh"),
        AlignmentFunctions.alignmentQueryCoverage(col("cigar"), "mapped").as("cov"))
    // plan must stay inside whole-stage codegen (no UDF barrier)
    val codegenNodes = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenNodes.nonEmpty,
      s"expected WholeStageCodegen in:\n${df.queryExecution.executedPlan}")
    val rows = df.collect()
    // 8M2I5M nm=2: m=13 g=2 o=1 → (13-2+2)/14
    assert(math.abs(rows(0).getDouble(0) - 13.0 / 14.0) < 1e-12)
    // MD 11A1 → 12 match 1 mismatch
    assert(math.abs(rows(0).getDouble(1) - 12.0 / 13.0) < 1e-12)
    assert(rows(0).getLong(2) == 15)
    // 10M nm=0 → identity 1, no MD → ge NULL
    assert(rows(1).getDouble(0) == 1.0 && rows(1).isNullAt(1))
    // "*" → NULL identity, qlen 0, cov 0
    assert(rows(2).isNullAt(0) && rows(2).getLong(2) == 0 && rows(2).getDouble(4) == 0.0)
    // NULL nm → gap_compressed NULL; clips count per flag
    assert(rows(3).isNullAt(0) && rows(3).getLong(2) == 18 && rows(3).getLong(3) == 15)
    assert(math.abs(rows(3).getDouble(4) - 10.0 / 18.0) < 1e-12)
  }

  test("SQL registration exposes native expressions with optional args") {
    val spark = SparkFixture.spark
    MiintRegistry.registerAll(spark)
    import spark.implicits._
    Seq(("8M2I5M", 2L)).toDF("cigar", "nm").createOrReplaceTempView("cig_sql")
    val r = spark.sql(
      """SELECT alignment_seq_identity(cigar, nm) AS gc,
        |       alignment_query_length(cigar) AS ql,
        |       alignment_query_length(cigar, false) AS qlnh,
        |       alignment_query_coverage(cigar) AS cov
        |  FROM cig_sql""".stripMargin).collect()
    assert(math.abs(r(0).getDouble(0) - 13.0 / 14.0) < 1e-12)
    assert(r(0).getLong(1) == 15 && r(0).getLong(2) == 15)
    assert(math.abs(r(0).getDouble(3) - 13.0 / 15.0) < 1e-12)
  }

  test("NULL optional args fall back to documented defaults (UDF parity)") {
    val spark = SparkFixture.spark
    MiintRegistry.registerAll(spark)
    val r = spark.sql(
      """SELECT alignment_query_length('5S10M3H', CAST(NULL AS BOOLEAN)) AS ql,
        |       alignment_query_coverage('5S10M3H', CAST(NULL AS STRING)) AS cov,
        |       alignment_query_length(CAST(NULL AS STRING)) AS qlnull""".stripMargin)
      .collect()
    assert(r(0).getLong(0) == 18) // NULL flag → include hard clips (default true)
    assert(math.abs(r(0).getDouble(1) - 10.0 / 18.0) < 1e-12) // NULL type → 'aligned'
    assert(r(0).isNullAt(2)) // NULL cigar still → NULL
  }
}
