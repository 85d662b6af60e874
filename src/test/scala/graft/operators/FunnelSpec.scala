package graft.operators

import graft.SparkSpec
// q113 tests live here with the rest of the sequence-matching family
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  test("q75 funnel semantics on a hand-computed fixture") {
    import spark.implicits._
    val e = Seq(
      // u1: clean conversion inside the window
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // u2: full path but purchase lands outside the window
      (2L, 100L, "view"), (2L, 200L, "click"), (2L, 9999L, "purchase"),
      // u3: click BEFORE the first view is not a step-2 (order matters);
      // the later click counts, no purchase afterwards
      (3L, 50L, "click"), (3L, 100L, "view"), (3L, 400L, "click"),
      (3L, 60L, "purchase"),
      // u4: no view at all -> not in the funnel
      (4L, 100L, "click"), (4L, 200L, "purchase"),
      // u5: click at EXACTLY the view's µs does not count (strictly after)
      (5L, 100L, "view"), (5L, 100L, "click"))
      .toDF("user_id", "us", "event_type")
    val out = RefQueries.funnelPathsFrom(e, windowUs = 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, 100L, Some(200L), Some(300L), true, true),
      (2L, 100L, Some(200L), Some(9999L), true, false),
      (3L, 100L, Some(400L), None, true, false),
      (5L, 100L, None, None, false, false)))
  }

  test("q75 first-touch anchors are minimal and paths are ordered") {
    val rows = RefQueries.funnelPaths(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(rows.length > 10)
    rows.foreach { case (_, t1, t2, t3, conv) =>
      t2.foreach(v => assert(v > t1))
      t3.foreach { v => assert(t2.isDefined && v > t2.get) }
      if (conv) assert(t3.isDefined && t3.get - t1 <= 86400L * 1000000L)
    }
    // the fixture corpus converts some users and stalls others
    assert(rows.exists(_._5) && rows.exists(r => !r._5))
  }

  test("q113 absence semantics on a hand-computed fixture") {
    import spark.implicits._
    // u1: view 100 -> click 200 -> purchase 300: click intervenes (0)
    // u2: view 100 -> purchase 300, click only at 400 (after): absent (1)
    // u3: view 100 -> purchase 300, no clicks at all: absent (1)
    // u4: click 50 BEFORE view, purchase 300: pre-view clicks don't count (1)
    // u5: no purchase -> not in the report
    val e = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 300L, "purchase"), (2L, 400L, "click"),
      (3L, 100L, "view"), (3L, 300L, "purchase"),
      (4L, 50L, "click"), (4L, 100L, "view"), (4L, 300L, "purchase"),
      (5L, 100L, "view"), (5L, 200L, "click"))
      .map { case (u, t, et) => (u, new java.sql.Timestamp(t), et) }
    // drive through the real query by writing a tiny parquet table set?
    // no — replicate the frame shape: build the same pipeline inline on a
    // (user_id, us, event_type) frame mirroring noClickPurchases' body
    val ev = e.map { case (u, ts, et) => (u, ts.getTime * 1000L, et) }
      .toDF("user_id", "us", "event_type")
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    def firstAfter(t: String, out: String) =
      ev.filter(col("event_type") === t).join(t1, "user_id")
        .filter(col("us") > col("t1"))
        .groupBy(col("user_id"), col("t1")).agg(min(col("us")).as(out))
        .select(col("user_id"), col(out))
    val got = t1.join(firstAfter("purchase", "tp"), Seq("user_id"))
      .join(firstAfter("click", "tc"), Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("tc").isNull || col("tc") > col("tp"), 1L).otherwise(0L)
          .as("no_click"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("q113 on real data nests inside q75's funnel accounting") {
    val q75 = RefQueries.funnelPaths(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val rows = RefQueries.noClickPurchases(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, t1, tp, noClick) =>
      assert(tp > t1)
      // a user whose q75 path CONVERTED (view->click->purchase in order)
      // cannot be a no-click purchase at the same or earlier time
      q75.get(u).flatten.foreach { t3 =>
        if (noClick == 1L) assert(t3 >= tp,
          s"user $u: q75 click-path purchase at $t3 but no-click claims $tp")
      }
    }
  }
}
