package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{codecs, GraftExprs}

/** Round-trip laws for the serde-analog expressions (SURVEY.md §5
  * property layer): decode(encode(n)) == n; decode rejects wrong
  * lengths; rand_lowercase length/charset contract
  * (reference charset [a-z]: ErrorHandlingMapper.java:14-15). */
class CodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  test("decode(encode(n)) == n across the int range (columnar round trip)") {
    val ns = Seq(Int.MinValue, -1000000, -1, 0, 1, 42, 1048576, Int.MaxValue) ++
      Seq.fill(200)(rng.nextInt())
    val got = ns.toDF("n")
      .select(codecs.be_int4_decode(codecs.be_int4_encode(col("n"))).as("rt"))
      .as[Int].collect().toSeq
    assert(got == ns)
  }

  test("decode returns NULL unless payload is exactly 4 bytes") {
    val rows = Seq(
      Array[Byte](),
      Array[Byte](1),
      Array[Byte](1, 2, 3),
      Array[Byte](1, 2, 3, 4, 5),
      "10".getBytes("UTF-8") // the reference's deserialization fixture
    ).toDF("b").select(codecs.be_int4_decode(col("b")).as("d"))
    assert(rows.collect().forall(_.isNullAt(0)))
  }

  test("decode codegen compiles in the literal/hoisted-child shape (no fallback)") {
    // r16: janino misparses `((c[1] & 0xff) << 16)` when the child is
    // a mutable-state array reference (binary-literal children get
    // hoisted), so the inlined-arithmetic doGenCode failed whole-stage
    // compilation and the stage silently ran interpreted. Disabling
    // the fallback makes that failure FATAL, so this test fails on the
    // inlined form and passes on the static-helper form. The driving
    // plan is the flagship entry at sf0.001 — the exact shape that
    // logged `CodeGenerator: Failed to compile` in the r16 test run —
    // plus a direct literal-child decode.
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val branches = graft.SparkEntry.entry(spark).collect()
      assert(branches.nonEmpty)
      val lits = spark.range(1).select(
        codecs.be_int4_decode(lit(Array[Byte](0, 0, 1, 0))).as("a"),
        codecs.be_int4_decode(codecs.be_int4_encode(lit(-7))).as("b"))
        .collect().head
      assert(lits.getInt(0) == 256 && lits.getInt(1) == -7)
    } finally spark.conf.set(key, prev)
  }

  test("decode is big-endian (matches java.nio / Kafka IntegerDeserializer)") {
    val ns = Seq.fill(200)(rng.nextInt())
    ns.foreach { n =>
      val bytes = java.nio.ByteBuffer.allocate(4).putInt(n).array()
      val got = Seq(bytes).toDF("b")
        .select(codecs.be_int4_decode(col("b")).as("d")).as[Int].head()
      assert(got == n)
    }
  }

  test("rand_lowercase: length == n, charset [a-z], deterministic in seed") {
    (0 to 100).foreach { n =>
      val seed = rng.nextLong()
      val s1 = GraftExprs.randLowercase(seed, n)
      val s2 = GraftExprs.randLowercase(seed, n)
      assert(s1 == s2, "deterministic per (seed, n)")
      val str = s1.toString
      assert(str.length == n)
      assert(str.forall(c => c >= 'a' && c <= 'z'))
    }
  }

  test("rand_lowercase: negative length -> NULL (maps to error branch)") {
    assert(GraftExprs.randLowercase(7L, -1) == null)
    val viaCol = Seq((7L, -1)).toDF("s", "n")
      .select(codecs.rand_lowercase(col("s"), col("n")).as("g"))
    assert(viaCol.collect()(0).isNullAt(0))
  }

  test("SQL registration exposes the functions to spark.sql") {
    codecs.register(spark)
    val r = spark.sql(
      "SELECT be_int4_decode(be_int4_encode(7)) AS n, length(rand_lowercase(1L, 5)) AS l")
      .collect()(0)
    assert(r.getInt(0) == 7 && r.getInt(1) == 5)
  }
}
