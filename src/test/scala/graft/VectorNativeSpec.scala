package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{VectorOps => V}

/** Native vector expressions vs their HOF executable specs. */
class VectorNativeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vecGen = for {
    n <- Gen.chooseNum(0, 20)
    v <- Gen.listOfN(n, Gen.chooseNum(-8.0f, 8.0f))
  } yield v

  test("native quantize == HOF spec") {
    val vecs = Gen.listOfN(120, vecGen).sample.get
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = df.select(col("id"), V.quantize(col("v"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select(col("id"), V.quantizeHof(col("v"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
  }

  test("native qdot == HOF spec incl. length-mismatch NULL") {
    val pairs = Gen.listOfN(120, Gen.zip(vecGen, vecGen)).sample.get
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
      .select(col("id"), V.quantizeHof(col("a")).as("qa"),
        V.quantizeHof(col("b")).as("qb"))
    val got = df.select(col("id"), V.qdot(col("qa"), col("qb"))).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val want = df.select(col("id"), V.qdotHof(col("qa"), col("qb"))).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
    // sanity: mismatched lengths are NULL in both
    assert(pairs.zipWithIndex.exists { case ((a, b), i) =>
      a.length != b.length && got(i.toLong).isEmpty })
  }

  test("native sig_agree == HOF estimator spec incl. length mismatch and nulls") {
    import graft.functions.vectorNative
    // signature-shaped arrays: small value range so slots actually
    // agree; occasional null elements and length mismatches exercise
    // the zip_with-padding / when-otherwise 0 branches
    val slotGen = Gen.frequency(9 -> Gen.chooseNum(0L, 4L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    val sigGen = for {
      n <- Gen.chooseNum(0, 12)
      s <- Gen.listOfN(n, slotGen)
    } yield s
    val pairs = Gen.listOfN(150, Gen.zip(sigGen, sigGen)).sample.get
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    val want = df.select(col("id"), hof).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val got = df.select(col("id"), vectorNative.sig_agree(col("a"), col("b")))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
    // sanity: some pair actually agreed somewhere (the generator is
    // hot enough that an all-zero run means a broken test)
    assert(got.values.flatten.exists(_ > 0))
    // null INPUT array is null in both forms
    val withNull = Seq((0L, Seq(1L, 2L), Option.empty[Seq[Long]]))
      .toDF("id", "a", "b")
    assert(withNull.select(vectorNative.sig_agree(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("native centroid_argmin == least()-over-literals argmin (ties, offsets)") {
    import graft.functions.vectorNative
    val dim = 8
    // small value range so (dist, cid) ties actually occur
    val fixedVec = Gen.listOfN(dim, Gen.chooseNum(-2L, 2L))
    val vecs = Gen.listOfN(200, fixedVec).sample.get
    val cents: Seq[(Long, Seq[Long])] =
      Gen.listOfN(17, fixedVec).sample.get.zipWithIndex
        // sparse, non-contiguous ids — the model must rank by id
        // value, not position
        .map { case (c, i) => (i.toLong * 3 + 1, c: Seq[Long]) }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "qe")
      .select(col("id"), col("qe"),
        aggregate(transform(col("qe"), x => x * x), lit(0L), (a, v) => a + v)
          .as("qn"))
    val litForm = least(cents.map { case (cid, ce) =>
      val cn = ce.map(x => x * x).sum
      val dot = aggregate(zip_with(col("qe"), typedLit(ce), (x, y) => x * y),
        lit(0L), (a, v) => a + v)
      struct((col("qn") + cn - lit(2L) * dot).as("dist"), lit(cid).as("cid"))
    }: _*).getField("cid")
    val want = df.select(col("id"), litForm).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.select(col("id"),
      vectorNative.centroid_argmin(col("qe"), col("qn"),
        cents.map(_._1), cents.map(_._2))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // offset form: argmin over the second half of the vector equals
    // the literal argmin over sliced sub-vectors with normTerm 0
    // (candidate-constant ‖x_m‖² dropped from both rankings)
    val half = dim / 2
    val subCents = cents.map { case (cid, ce) => (cid, ce.drop(half)) }
    val litSub = least(subCents.map { case (cid, ce) =>
      val cn = ce.map(x => x * x).sum
      val dot = aggregate(zip_with(slice(col("qe"), half + 1, half),
        typedLit(ce), (x, y) => x * y), lit(0L), (a, v) => a + v)
      struct((lit(cn) - lit(2L) * dot).as("dist"), lit(cid).as("cid"))
    }: _*).getField("cid")
    val wantSub = df.select(col("id"), litSub).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotSub = df.select(col("id"),
      vectorNative.centroid_argmin(col("qe"), lit(0L),
        subCents.map(_._1), subCents.map(_._2), offset = half)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotSub == wantSub)
    // width mismatch yields NULL (matching zip_with null propagation)
    val shortCents = Seq((0L, Seq(1L, 2L)))
    val r = df.limit(1).select(vectorNative.centroid_argmin(col("qe"),
      col("qn"), shortCents.map(_._1), shortCents.map(_._2),
      offset = dim - 1)).collect()
    assert(r.head.isNullAt(0))
  }
}
