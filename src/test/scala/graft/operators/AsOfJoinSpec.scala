package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // facts: (key, event_ts, fact_payload); versions: (key, effective_from, attr)
  private lazy val facts = {
    import spark.implicits._
    Seq(
      ("a", ts("2024-01-01 00:00:00"), 1), // before any version -> null
      ("a", ts("2024-01-01 10:00:00"), 2), // exactly at v1 -> v1 (>= semantics)
      ("a", ts("2024-01-01 15:00:00"), 3), // between v1 and v2 -> v1
      ("a", ts("2024-01-02 00:00:00"), 4), // exactly at v2 -> v2
      ("a", ts("2024-01-03 00:00:00"), 5), // after v2 -> v2
      ("b", ts("2024-01-01 12:00:00"), 6), // other key -> b's v1
      ("c", ts("2024-01-01 12:00:00"), 7)  // key with no versions -> null
    ).toDF("k", "event_ts", "f")
  }
  private lazy val versions = {
    import spark.implicits._
    Seq(
      ("a", ts("2024-01-01 10:00:00"), "a-v1"),
      ("a", ts("2024-01-02 00:00:00"), "a-v2"),
      ("b", ts("2024-01-01 00:00:00"), "b-v1")
    ).toDF("k", "effective_from", "attr")
  }

  private val expected = Seq(
    (1, null), (2, "a-v1"), (3, "a-v1"), (4, "a-v2"), (5, "a-v2"),
    (6, "b-v1"), (7, null))

  test("broadcast variant resolves >= asof semantics") {
    val out = AsOfJoin.broadcast(facts, versions, Seq("k"), "event_ts", "effective_from")
      .orderBy("f").collect().map(r => (r.getInt(2), r.getAs[String]("attr")))
    assert(out.toSeq == expected)
    assert(out.length == facts.count()) // every left row exactly once
  }

  test("merge variant agrees with broadcast variant") {
    val out = AsOfJoin.merge(facts, versions, Seq("k"), "event_ts", "effective_from")
      .orderBy("f").collect().map(r => (r.getAs[Int]("f"), r.getAs[String]("attr")))
    assert(out.toSeq == expected)
  }

  test("forward direction picks the next version; both variants agree") {
    val expectedFwd = Seq(
      (1, "a-v1"), // before any version -> next is v1
      (2, "a-v1"), // exactly at v1 -> v1 (ties match forward too)
      (3, "a-v2"), // between -> next version
      (4, "a-v2"), (5, null), // after last version -> null
      (6, null),   // b's only version is earlier
      (7, null))
    val bc = AsOfJoin.broadcast(facts, versions, Seq("k"), "event_ts",
        "effective_from", direction = "forward")
      .orderBy("f").collect().map(r => (r.getInt(2), r.getAs[String]("attr")))
    val mg = AsOfJoin.merge(facts, versions, Seq("k"), "event_ts",
        "effective_from", direction = "forward")
      .orderBy("f").collect().map(r => (r.getAs[Int]("f"), r.getAs[String]("attr")))
    assert(bc.toSeq == expectedFwd)
    assert(mg.toSeq == expectedFwd)
  }

  test("tolerance nulls matches farther than the bound") {
    // fact 5 is 24h after a-v2; with a 1h tolerance it must lose its match
    val tol = Some(3600L)
    val expectedTol = Seq(
      (1, null), (2, "a-v1"), (3, null), (4, "a-v2"), (5, null),
      (6, null), (7, null)) // fact 3 is 5h past v1; fact 6 is 12h past b-v1
    val bc = AsOfJoin.broadcast(facts, versions, Seq("k"), "event_ts",
        "effective_from", toleranceSeconds = tol)
      .orderBy("f").collect().map(r => (r.getInt(2), r.getAs[String]("attr")))
    val mg = AsOfJoin.merge(facts, versions, Seq("k"), "event_ts",
        "effective_from", toleranceSeconds = tol)
      .orderBy("f").collect().map(r => (r.getAs[Int]("f"), r.getAs[String]("attr")))
    assert(bc.toSeq == expectedTol)
    assert(mg.toSeq == expectedTol)
  }

  test("null keys: default matches null-key versions; bypass resolves to null") {
    import spark.implicits._
    val factsN = Seq(
      (null.asInstanceOf[String], ts("2024-01-01 12:00:00"), 1),
      ("a", ts("2024-01-01 12:00:00"), 2)
    ).toDF("k", "event_ts", "f")
    val versionsN = Seq(
      (null.asInstanceOf[String], ts("2024-01-01 00:00:00"), "null-v1"),
      ("a", ts("2024-01-01 00:00:00"), "a-v1")
    ).toDF("k", "effective_from", "attr")
    // default: null-safe matching (nulls group together in the window)
    val matched = AsOfJoin.merge(factsN, versionsN, Seq("k"),
        "event_ts", "effective_from")
      .orderBy("f").collect().map(_.getAs[String]("attr"))
    assert(matched.toSeq == Seq("null-v1", "a-v1"))
    // bypass: the null-keyed fact routes around the window, keeps its
    // row, resolves to null; keyed facts are untouched
    val bypassed = AsOfJoin.merge(factsN, versionsN, Seq("k"),
        "event_ts", "effective_from", nullKeysMatch = false)
      .orderBy("f").collect()
    assert(bypassed.length == 2)
    assert(bypassed.map(_.getAs[String]("attr")).toSeq == Seq(null, "a-v1"))
    assert(bypassed(0).getAs[java.sql.Timestamp]("event_ts") != null)
  }

  test("merge carries whole version structs (no attribute mixing across versions)") {
    import spark.implicits._
    // v2 has a null attr2: a fact after v2 must see (x2, null), never (x2, y1)
    val right = Seq(
      ("a", ts("2024-01-01 00:00:00"), "x1", "y1"),
      ("a", ts("2024-01-02 00:00:00"), "x2", null.asInstanceOf[String])
    ).toDF("k", "effective_from", "attr1", "attr2")
    val left = Seq(("a", ts("2024-01-03 00:00:00"), 1)).toDF("k", "event_ts", "f")
    val row = AsOfJoin.merge(left, right, Seq("k"), "event_ts", "effective_from")
      .collect().head
    assert(row.getAs[String]("attr1") == "x2")
    assert(row.getAs[String]("attr2") == null)
  }
}
