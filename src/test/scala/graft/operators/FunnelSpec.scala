package graft.operators

import graft.SparkSpec
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
}
