package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

import graft.plans.GraftExtensions

/** The SparkSessionExtensions hook: injection wiring + SQL-side use
  * of every native expression. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("extensions hook injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
    assert(GraftExtensions.functions.size == 15)
  }

  test("oph_sig and kmv_kmin are usable from spark.sql (r7)") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT size(oph_sig('a b c d', 3)) AS slots, " +
        "oph_sig('a b', 3) AS nullsig").head
    assert(r.getInt(0) == graft.functions.PortableHash.MinhashK)
    assert(r.isNullAt(1))
    import spark.implicits._
    Seq(9L, 3L, 7L, 3L).toDF("h").createOrReplaceTempView("kmv_in")
    val m = spark.sql("SELECT kmv_kmin(h, 2) AS m FROM kmv_in").head
      .getSeq[Long](0)
    assert(m == Seq(3L, 7L))
  }

  test("centroid_argmin is usable from spark.sql with a literal codebook") {
    GraftExtensions.register(spark)
    // centroids 10 -> (1,0), 20 -> (0,1); vec (3,1) with norm 10 is
    // closer to (1,0): 10+1-6=5 vs 10+1-2=9
    val r = spark.sql(
      "SELECT centroid_argmin(array(3L, 1L), 10L, array(10L, 20L), " +
        "array(array(1L, 0L), array(0L, 1L))) AS cid, " +
        // offset form: score only the 2nd component (width-1 codebook)
        "centroid_argmin(array(3L, 1L), 0L, array(7L), array(array(5L)), 1) AS c2")
      .head
    assert(r.getLong(0) == 10L && r.getLong(1) == 7L)
  }

  test("nfc_normalize is usable from spark.sql and composes sequences") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS n, " +
        "length(nfc_normalize('cafe\u0301')) AS l").head
    assert(r.getString(0) == "caf\u00e9" && r.getInt(1) == 4)
  }

  test("minhash_sig is usable from spark.sql; NULL below the shingle width") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT size(minhash_sig('a b c d', 3)) AS k, minhash_sig('a b', 3) AS short").head
    assert(r.getInt(0) == graft.functions.PortableHash.MinhashK)
    assert(r.isNullAt(1))
  }

  test("simhash48 is usable from spark.sql and matches the operator") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT simhash48('a b c d e f') AS fp").head.getLong(0)
    import spark.implicits._
    val viaOp = graft.operators.Dedup.simhash(
        Seq((1L, "a b c d e f")).toDF("doc_id", "text"))
      .head.getLong(1)
    assert(viaSql == viaOp && viaSql > 0)
  }

  test("deflate_size is usable from spark.sql and shrinks repetitive text") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT deflate_size(repeat('abc ', 200), 6) AS rep, " +
        "deflate_size('abc', 6) AS tiny").head
    assert(r.getLong(0) < 100L, s"repetitive compressed to ${r.getLong(0)}")
    assert(r.getLong(1) > 0L)
  }

  test("all native expressions are usable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT
        be_int4_decode(be_int4_encode(42)) AS roundtrip,
        length(rand_lowercase(7L, 5)) AS randlen,
        size(word_shingles('a b c d', 3)) AS shingles,
        size(char_trigrams('abcd')) AS trigrams,
        qdot(quantize_vector(array(CAST(1.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 1024),
             quantize_vector(array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT)), 1024)) AS dot
    """).head
    assert(r.getInt(0) == 42)
    assert(r.getInt(1) == 5)
    assert(r.getInt(2) == 2)  // 'a b c', 'b c d'
    assert(r.getInt(3) == 2)  // 'abc', 'bcd'
    // floor(1.5*1024)*floor(2*1024) + floor(-0.5*1024)*floor(4*1024)
    assert(r.getLong(4) == 1536L * 2048L + (-512L) * 4096L)
  }
}
