package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.relational.RelQueries

/** rel_zorder / rel_scd2 invariants (r6) beyond the oracle hash:
  * the z-curve's locality guarantee and the SCD2 merge's version
  * bookkeeping laws. */
class LayoutMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("zvalue: matches a reference bit-interleave and is a " +
    "bijection on the 16-bit square") {
    def ref(a: Int, b: Int): Int =
      (0 until RelQueries.ZorderBits).map { i =>
        (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))
      }.reduce(_ | _)
    val pairs = for (a <- 0 until 256 by 17; b <- 0 until 256 by 13)
      yield (a.toLong, b.toLong)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        RelQueries.zvalue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a.toInt, b.toInt).toLong, s"($a,$b)")
    }
    assert(got.values.toSet.size == pairs.size, "z is injective")
  }

  test("zorder buckets: every 1024-wide z-range spans at most a " +
    "32-wide rectangle in each dimension (the pruning guarantee)") {
    // 1024 z-values = 10 interleaved bits = 5 bits per dim → each
    // bucket covers one aligned 32×32 tile of the 256×256 square
    val rows = RelQueries.zorderSpans(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minC, maxC) = (r.getLong(2), r.getLong(3))
      val (minV, maxV) = (r.getLong(4), r.getLong(5))
      assert(maxC - minC < 32, s"bucket ${r.getLong(0)} cust span")
      assert(maxV - minV < 32, s"bucket ${r.getLong(0)} val span")
      assert(minC / 32 == maxC / 32 && minV / 32 == maxV / 32,
        s"bucket ${r.getLong(0)} not tile-aligned")
    }
  }

  test("scd2: version laws — changed keys close v1 and open v2, " +
    "churned close without reopen, inserts open v2 only, kept " +
    "stay open at v1; no key has two open rows with equal attrs") {
    val out = RelQueries.scd2Merge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val byKey = out.groupBy(_._1)
    val custkeys = graft.relational.Tables.customer(spark, sf)
      .select("c_custkey").as[Long].collect().toSet
    custkeys.foreach { k =>
      val acts = byKey(k).map(_._5).sorted.toSeq
      if (k % 89 == 0) assert(acts == Seq("closed_churn"), s"key $k")
      else if (k % 10 == 3) assert(acts == Seq("closed", "opened"), s"key $k")
      else assert(acts == Seq("kept"), s"key $k")
      if (k % 97 == 0)
        assert(byKey(k + 1000000L).map(_._5).toSeq == Seq("opened_new"))
    }
    // exactly one open (valid_to = -1) row per surviving key
    out.groupBy(_._1).foreach { case (k, rows) =>
      val open = rows.count(_._4 == -1L)
      assert(open == (if (custkeys.contains(k) && k % 89 == 0) 0 else 1),
        s"key $k open-row count")
    }
  }

  test("snapshotDiff: classification matches a driver-side rebuild " +
    "of both snapshots; flags consistent with status") {
    val cust = graft.relational.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100).toLong))
    val a = cust.map { case (k, s0, b) => k -> (s0, b) }.toMap
    val b = (cust.filter(_._1 % 89 != 0).map { case (k, s0, bal) =>
      k -> ((if (k % 10 == 3) s"MOVED_$s0" else s0),
        bal + (if (k % 7 == 2) 12345L else 0L))
    } ++ cust.filter(_._1 % 97 == 0).map { case (k, s0, bal) =>
      (k + 2000000L) -> (("NEWSEG", bal))
    }).toMap
    val expect = (a.keySet ++ b.keySet).map { k =>
      val status = (a.get(k), b.get(k)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(x), Some(y)) => if (x == y) "same" else "changed"
      }
      val segCh = (a.get(k), b.get(k)) match {
        case (Some((s1, _)), Some((s2, _))) if s1 != s2 => 1L
        case _ => 0L
      }
      val balCh = (a.get(k), b.get(k)) match {
        case (Some((_, b1)), Some((_, b2))) if b1 != b2 => 1L
        case _ => 0L
      }
      (k, status, segCh, balCh)
    }
    val got = RelQueries.snapshotDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expect)
    // all four statuses exercised
    assert(got.map(_._2) == Set("added", "removed", "changed", "same"))
    got.foreach { case (k, st, sc, bc) =>
      if (st == "added" || st == "removed")
        assert(sc == 0 && bc == 0, s"$k: $st rows carry no change flags")
      if (st == "changed")
        assert(sc + bc >= 1, s"$k: changed needs a flagged column")
      if (st == "same") assert(sc == 0 && bc == 0)
    }
  }

  test("bitmapDistinct: occupied bits match a driver-side md5 " +
    "reference; V <= min(m, exact)") {
    def h31(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 2147483647L
    }
    val raw = graft.relational.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = raw.groupBy(_._1).map { case (t, us) =>
      val ids = us.map(_._2).distinct
      (t, (ids.map(u => h31(u.toString) % 1008L).distinct.size.toLong,
        ids.size.toLong))
    }
    val got = RelQueries.bitmapDistinct(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    got.values.foreach { case (v, exact) =>
      assert(v <= math.min(1008L, exact))
      assert(v > 0)
    }
  }

  test("skyline: matches the brute-force quadratic domination " +
    "definition; frontier ascends strictly in price along days") {
    val rows = graft.relational.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"),
        expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (pri, rs) =>
      val pts = rs.map(t => (t._2, t._3)).distinct
      // quadratic definition: p survives iff NO q with day<=, price>=,
      // strict somewhere
      pts.filter { case (d, p) =>
        !pts.exists { case (d2, p2) =>
          d2 <= d && p2 >= p && (d2 < d || p2 > p)
        }
      }.map { case (d, p) => (pri, d, p) }
    }.toSet
    val got = RelQueries.skyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == expect)
    assert(got.nonEmpty)
    // within each priority the frontier ascends STRICTLY in price
    // along days (a later point not exceeding an earlier price would
    // be dominated via strict day)
    got.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 > a._3, s"frontier not ascending: $a then $b")
        case _ =>
      }
    }
  }

  test("hilbert_index: bijection on the 16-bit square; consecutive " +
    "indices are UNIT-STEP adjacent everywhere — the property the " +
    "z curve lacks at quadrant seams") {
    import spark.implicits._
    val pairs = (for (a <- 0 until 256; b <- 0 until 256)
      yield (a.toLong, b.toLong)).toSeq
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), graft.functions.layoutNative
        .hilbert_index(col("a"), col("b")).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    assert(got.map(_._1).distinct.length == 65536, "not a bijection")
    val byD = got.toMap
    (0L until 65535L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step at d=$d")
    }
    // expression output == the Scala reference (pins codegen path)
    got.foreach { case (d, (x, y)) =>
      assert(d == graft.functions.HilbertOps.xy2d(x, y))
    }
    // contrast: the Z curve's worst consecutive-key step is a seam
    // jump across half the grid
    def z(a: Long, b: Long): Long = (0 until 8).map(i =>
      (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i)))
      .reduce(_ | _)
    val zByD = pairs.map { case (a, b) => z(a, b) -> (a, b) }.toMap
    val maxZStep = (0L until 65535L).map { d =>
      val (x1, y1) = zByD(d); val (x2, y2) = zByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxZStep >= 128, s"expected z seam jumps, max step $maxZStep")
  }

  test("changepoint: a planted rate shift is located at the step " +
    "boundary; deviation is the exact cross-multiplied CUSUM") {
    import spark.implicits._
    val nph = 3600L * 1000000000L
    // type "a": 10 quiet hours (1 event) then 10 busy (5 events)
    val rows = (0 until 10).flatMap(h => Seq(("a", h.toLong * nph))) ++
      (10 until 20).flatMap(h => (1 to 5).map(_ => ("a", h.toLong * nph)))
    val ev = rows.toDF("event_type", "ts")
    val got = RelQueries.changepointOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // S=60, T=20; max |S_k*T - k*S| is at k=10 (last quiet hour):
    // |10*20 - 10*60| = 400
    assert(got.toSeq == Seq(("a", 9L * 3600L, 400L)))
  }

  test("fkOrphans: generator-consistent edges report zero; the " +
    "cross-domain edge matches a driver-side orphan count and bites") {
    val users = graft.relational.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
    val sup = graft.relational.Tables.supplier(spark, sf)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val expectOrphans = users.count(u => !sup.contains(u)).toLong
    val got = RelQueries.fkOrphans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("orders.custkey->customer") == 0L)
    assert(got("lineitem.orderkey->orders") == 0L)
    assert(got("lineitem.partkey->part") == 0L)
    assert(got("lineitem.suppkey->supplier") == 0L)
    assert(got("events.user_id->supplier") == expectOrphans)
    assert(expectOrphans > 0L, "the audit edge must actually bite")
  }

  test("keyDiscovery: the primary key is flagged, low-cardinality " +
    "columns are not; distinct counts match driver-side truth") {
    val rows = graft.relational.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .collect()
    val n = rows.length.toLong
    val got = RelQueries.keyDiscovery(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got("c_custkey") == ((n, n, 1L)))
    assert(got("c_nationkey")._2 ==
      rows.map(_.getAs[Number](2).longValue).distinct.length.toLong)
    assert(got("c_nationkey")._3 == 0L)
    assert(got("c_mktsegment")._3 == 0L)
  }

  test("backfillGaps: planted missing hours are located exactly; " +
    "a gap-free type reports zero with -1 sentinels") {
    import spark.implicits._
    val nph = 3600L * 1000000000L
    // type "a": hours 0..9 present except 3 and 7; type "b": 0..4 full
    val rows = (0 until 10).filterNot(h => h == 3 || h == 7)
      .map(h => ("a", h.toLong * nph)) ++
      (0 until 5).map(h => ("b", h.toLong * nph))
    val got = RelQueries.backfillGapsOf(rows.toDF("event_type", "ts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 10L, 2L, 3L, 7L), ("b", 5L, 0L, -1L, -1L)))
  }

  test("funnelWindow: the gap bound is inclusive and drops " +
    "out-of-window conversions per stage") {
    import spark.implicits._
    val gap = 1000L
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", gap), (1L, "purchase", 2 * gap),
      (2L, "view", 0L), (2L, "click", gap + 1),       // misses click
      (3L, "view", 0L), (3L, "click", 10L),
      (3L, "purchase", 10L + gap + 1))                // misses purchase
    val ev = rows.toDF("user_id", "event_type", "ts")
    val got = RelQueries.funnelWindowOf(ev, gap).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L))
    // and the unbounded funnel counts all three conversions
    val unbounded = RelQueries.funnelOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(unbounded == Map("1_view" -> 3L, "2_click" -> 3L,
      "3_purchase" -> 2L))
  }

  test("compactionPlan: per-type byte totals conserved, files near " +
    "target size, time spans non-overlapping across consecutive files") {
    val target = 65536L
    val ev = graft.relational.Tables.events(spark, sf)
      .select(col("event_type"),
        (octet_length(col("props")) + lit(24L)).cast("long").as("bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val totals = ev.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val maxRow = ev.map(_._2).max
    val got = RelQueries.compactionPlan(spark, sf, target).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // conservation
    got.groupBy(_._1).foreach { case (t, fs) =>
      assert(fs.map(_._4).sum == totals(t), s"$t bytes not conserved")
      // file ids dense from 0
      assert(fs.map(_._2).sorted.toSeq == (0L until fs.length).toSeq)
      // every file is bounded by target + one overhanging row
      fs.foreach { f => assert(f._4 <= target + maxRow, s"$t file $f") }
      // consecutive files cover non-overlapping, ordered time ranges
      fs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._6 <= b._5,
          s"$t files overlap in time: $a then $b")
        case _ =>
      }
    }
  }

  test("cmsTopk: estimates match a driver-side sketch rebuild; " +
    "CMS law estimate >= exact on every probe") {
    def h31(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 2147483647L
    }
    val ids = graft.relational.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
    val cells = scala.collection.mutable.Map[(Int, Long), Long]()
      .withDefaultValue(0L)
    ids.foreach { u =>
      (0 until 4).foreach { r => cells((r, h31(s"$r#$u") % 512L)) += 1L }
    }
    val exact = ids.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = exact.toSeq.sortBy { case (u, n) => (-n, u) }.take(10)
      .map { case (u, n) =>
        (u, n, (0 until 4).map(r => cells((r, h31(s"$r#$u") % 512L))).min)
      }.sortBy(_._1)
    val got = RelQueries.cmsTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    got.foreach { case (u, n, est) =>
      assert(est >= n, s"user $u: CMS must never underestimate")
    }
  }
}
