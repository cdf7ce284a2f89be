package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.gold.Surrogate

class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks latest right row at-or-before left time, per key") {
    val events = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")),   // exactly at order time → inclusive
      (3L, 10L, ts("2023-12-31 00:00:00")),   // before any order → dropped (inner)
      (4L, 20L, ts("2024-06-01 00:00:00")),
      (5L, 30L, ts("2024-06-01 00:00:00"))    // key with no right rows → dropped
    ).toDF("event_id", "user_id", "event_ts")
    val orders = Seq(
      (10L, ts("2024-01-01 00:00:00"), "a"),
      (10L, ts("2024-01-04 00:00:00"), "b"),
      (10L, ts("2024-02-01 00:00:00"), "c"),  // after event 1 → not picked
      (20L, ts("2024-05-30 00:00:00"), "d")
    ).toDF("o_custkey", "o_orderdate", "tag")
    val got = AsOfJoin.joinAsOfBackward(events, orders,
      "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("tag"))
      .select("event_id", "tag").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "b"), (2L, "a"), (4L, "d")))
  }

  test("as-of join: matched row's null values pass through, never stitched from older rows") {
    val events = Seq((1L, 10L, ts("2024-03-01 00:00:00"))).toDF("event_id", "user_id", "event_ts")
    val orders = Seq(
      (10L, ts("2024-01-01 00:00:00"), "a", "x"),
      (10L, ts("2024-02-01 00:00:00"), null.asInstanceOf[String], "y"))
      .toDF("o_custkey", "o_orderdate", "tag", "other")
    val got = AsOfJoin.joinAsOfBackward(events, orders,
      "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("tag", "other"))
      .select("event_id", "tag", "other").collect()
    // the true match is the 02-01 row: tag must be NULL (not "a" from
    // the older row), other must be "y" — one row, not a mix of two
    assert(got.length == 1 && got(0).isNullAt(1) && got(0).getString(2) == "y")
    // null keys never match (window must not group nulls together)
    val nullKey = Seq((2L, null.asInstanceOf[java.lang.Long], ts("2024-03-01 00:00:00")))
      .toDF("event_id", "user_id", "event_ts")
    val nullOrders = Seq((null.asInstanceOf[java.lang.Long], ts("2024-01-01 00:00:00"), "z"))
      .toDF("o_custkey", "o_orderdate", "tag")
    assert(AsOfJoin.joinAsOfBackward(nullKey, nullOrders,
      "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("tag")).count() == 0)
  }

  test("forward as-of join picks earliest right row at-or-after left time, per key") {
    val events = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),   // between b and c → c
      (2L, 10L, ts("2024-01-04 00:00:00")),   // exactly at order b → inclusive
      (3L, 10L, ts("2024-03-01 00:00:00")),   // after all orders → dropped (inner)
      (4L, 20L, ts("2024-05-01 00:00:00")),
      (5L, 30L, ts("2024-06-01 00:00:00"))    // key with no right rows → dropped
    ).toDF("event_id", "user_id", "event_ts")
    val orders = Seq(
      (10L, ts("2024-01-01 00:00:00"), "a"),
      (10L, ts("2024-01-04 00:00:00"), "b"),
      (10L, ts("2024-02-01 00:00:00"), "c"),
      (20L, ts("2024-05-30 00:00:00"), "d")
    ).toDF("o_custkey", "o_orderdate", "tag")
    val got = AsOfJoin.joinAsOfForward(events, orders,
      "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("tag"))
      .select("event_id", "tag").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "c"), (2L, "b"), (4L, "d")))
  }

  test("native sort-merge as-of exec equals the union+window composition") {
    val events = Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_ts")
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_custkey", $"o_orderdate")
    val native = graft.plans.AsOfJoinNative.joinAsOfBackward(
      events, orders, "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("o_orderdate"))
    val composed = AsOfJoin.joinAsOfBackward(
      events, orders, "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("o_orderdate"))
    assert(native.count() > 0)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    // the plan is the custom exec (nodeName strips the Exec suffix),
    // not a union+window
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected native exec in:\n$plan")
    assert(!plan.contains("Window"), s"expected no window operator in:\n$plan")
    // edge semantics on hand-built rows (inclusive <=, per-key reset)
    val ev = Seq((1L, 10L, ts("2024-01-04 00:00:00")),
      (2L, 10L, ts("2023-12-31 00:00:00")), (3L, 99L, ts("2024-01-04 00:00:00")))
      .toDF("event_id", "user_id", "event_ts")
    val or = Seq((10L, ts("2024-01-01 00:00:00"), "a"), (10L, ts("2024-01-04 00:00:00"), "b"))
      .toDF("o_custkey", "o_orderdate", "tag")
    val got = graft.plans.AsOfJoinNative.joinAsOfBackward(
      ev, or, "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("tag"))
      .select("event_id", "tag").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "b")))
  }

  test("native FORWARD as-of exec equals the union+window composition; children co-partitioned") {
    val events = Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_ts")
    val purchases = Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
      .filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_ts".as("purchase_ts"))
    // self-join lineage: left and right both derive from events — the
    // re-alias path must keep right values bound to RIGHT columns
    val native = graft.plans.AsOfJoinNative.joinAsOfForward(
      events, purchases, "user_id", "p_user", "event_ts", "purchase_ts", Seq("purchase_ts"))
    val composed = AsOfJoin.joinAsOfForward(
      events, purchases, "user_id", "p_user", "event_ts", "purchase_ts", Seq("purchase_ts"))
    assert(native.count() > 0)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    // zipPartitions pairs children positionally: both sides must hash-
    // partition on their key with the SAME partition count in the
    // final (post-AQE) plan
    native.collect()
    val plan = native.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val hp = """hashpartitioning\((\w+)#\d+L?(?:\s+ASC[^,]*)?, (\d+)\)""".r
      .findAllMatchIn(plan).map(m => (m.group(1), m.group(2))).toSeq
    assert(hp.map(_._1).toSet == Set("user_id", "p_user"),
      s"expected one exchange per side on the join keys, got $hp in:\n$plan")
    assert(hp.map(_._2).distinct.size == 1,
      s"children must share one partition count, got $hp")
    // edge semantics: inclusive >=, peeked (not consumed) match row
    // shared by consecutive left rows, per-key isolation
    val ev = Seq((1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")),   // same (key,time) → same match
      (3L, 10L, ts("2024-01-05 00:00:01")),   // after last purchase → dropped
      (4L, 99L, ts("2024-01-01 00:00:00")))   // key without purchases → dropped
      .toDF("event_id", "user_id", "event_ts")
    val pu = Seq((10L, ts("2024-01-01 00:00:00"), "a"), (10L, ts("2024-01-05 00:00:00"), "b"))
      .toDF("p_user", "purchase_ts", "tag")
    val got = graft.plans.AsOfJoinNative.joinAsOfForward(
      ev, pu, "user_id", "p_user", "event_ts", "purchase_ts", Seq("tag"))
      .select("event_id", "tag").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "a")))
  }

  test("native as-of with GENUINE exprId overlap binds right values to the right side") {
    // right is a filter of the SAME frame with UNRENAMED columns — its
    // attributes carry the left's exprIds, forcing the re-alias path;
    // without it, UnsafeProjection binds the appended right value to
    // the LEFT column and the bug is silent (values, not errors)
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "click"),
      (2L, 10L, ts("2024-01-01 11:00:00"), "purchase"),
      (3L, 10L, ts("2024-01-01 12:00:00"), "click"),
      (4L, 10L, ts("2024-01-01 13:00:00"), "purchase"))
      .toDF("event_id", "user_id", "event_ts", "event_type")
    val purchases = ev.filter($"event_type" === "purchase")
    val got = graft.plans.AsOfJoinNative.joinAsOfForward(
      ev, purchases, "user_id", "user_id", "event_ts", "event_ts", Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1)
    // left event 1 (click@10:00) must carry RIGHT event_id 2, not its
    // own id; event 3 → 4; purchases match themselves
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 4L), (4L, 4L)))
  }

  test("as-of joins reject unit-unsafe key/time columns loudly") {
    // an explicit epoch-long column (the shape the nanos-era events
    // table used to surface natively) — LongType passes the per-column
    // long-backed check but must be rejected when PAIRED with a
    // timestamp column, since raw long comparison can't mix scales
    val events = Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_ts",
        unix_micros($"event_ts").as("ts"), $"event_type")
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_custkey", $"o_orderdate")
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinNative.joinAsOfBackward(
        events, orders, "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderdate"))
    }
    assert(e1.getMessage.contains("share one type"))
    // composition: a string key would cast("long") to NULL under
    // ANSI-off and silently drop every row — must be rejected up front
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOfBackward(
        events, orders, "event_type", "o_custkey", "event_ts", "o_orderdate", Seq("o_orderdate"))
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("salted join equals the plain inner join exactly") {
    val left = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_partkey".as("partkey"), $"l_linenumber", $"l_quantity")
    val right = Tables.part(spark, "/root/testdata/sf0.001")
      .select($"p_partkey".as("partkey"), $"p_brand")
    val salted = graft.operators.SaltedJoin.innerJoin(left, right, "partkey", $"l_linenumber", 8)
    val plain = left.join(right, Seq("partkey"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("banded range join equals the raw inequality join") {
    val points = Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_custkey", $"c_acctbal")
    val intervals = Tables.supplier(spark, "/root/testdata/sf0.001")
      .select($"s_suppkey", ($"s_acctbal" - 50).as("lo"), ($"s_acctbal" + 50).as("hi"))
    val banded = graft.operators.RangeJoin.pointInInterval(
      points, "c_acctbal", intervals, "lo", "hi", 100.0)
      .select($"c_custkey", $"s_suppkey")
    val raw = points.join(intervals,
      $"c_acctbal" >= $"lo" && $"c_acctbal" < $"hi")
      .select($"c_custkey", $"s_suppkey")
    assert(banded.count() > 0)
    assert(banded.exceptAll(raw).isEmpty && raw.exceptAll(banded).isEmpty)
    // empty intervals (hi <= lo) match nothing
    val empty = graft.operators.RangeJoin.pointInInterval(
      points, "c_acctbal", intervals.withColumn("hi", $"lo"), "lo", "hi", 100.0)
    assert(empty.count() == 0)
  }

  test("denseId assigns a dense 1..N sequence in sort order, distributed") {
    val df = (1 to 1000).map(i => (s"k${1000 - i}", i)).toDF("k", "v")
    val got = Surrogate.denseId(df, "v", "id")
    val rows = got.select("v", "id").as[(Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == (1L to 1000L))
  }
}
