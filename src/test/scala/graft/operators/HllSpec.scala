package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q132 HyperLogLog: the declared query's registers/estimate against an
  * independent driver-side re-implementation, plus the mergeability and
  * invariance properties that make the sketch usable at scale. */
class HllSpec extends SparkSpec {

  /** Driver-side replica: md5-prefix h60, m=32 registers, integer-exact
    * raw estimate — written against the algorithm, not the Spark plan. */
  private def referenceEstimate(ids: Seq[Long]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = new Array[Int](Hll.M)
    ids.foreach { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h % Hll.M).toInt
      val rem = h >>> 5
      val rho = if (rem == 0) 56 else 56 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val rMax = regs.max
    val sSum = regs.map(r => BigInt(1) << (rMax - r)).sum
    val num = BigInt(Hll.AlphaPpm) * Hll.M * Hll.M * (BigInt(1) << rMax)
    val raw = (num / (sSum * BigInt(1000000))).toLong
    val nZero = regs.count(_ == 0)
    if (nZero > 0 && raw <= Hll.LcThreshold) Hll.LcEst(nZero - 1) else raw
  }

  test("estimate matches an independent driver-side HLL implementation") {
    val rows = Hll.distinctUsers(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val events = Tables.load(spark, sf, "events")
      .select(date_format(timestamp_seconds(expr("ts div 1000000000")),
        "yyyy-MM-dd").as("day"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byDay = events.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq)
    byDay.foreach { case (day, ids) =>
      assert(rows(day)._1 == ids.size, s"exact_uv off for $day")
      assert(rows(day)._2 == referenceEstimate(ids), s"est_uv off for $day")
    }
    val allIds = events.map(_._2).distinct.toSeq
    assert(rows("__all")._2 == referenceEstimate(allIds),
      "merged registers must equal the sketch built over the union directly")
  }

  test("estimates are partition-invariant and within the raw-HLL envelope") {
    val a = Hll.distinctUsers(spark, sf).collect().map(_.toString).sorted
    val b = Hll.distinctUsers(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val errs = Hll.distinctUsers(spark, sf).collect().map(_.getLong(3))
    // raw HLL at m=32: σ ≈ 1.04/√32 ≈ 18.4%; 3σ ≈ 55% — anything past
    // that indicates a broken register, not sketch variance
    assert(errs.forall(_ < 550000), s"error out of envelope: ${errs.max}")
  }

  test("incremental register merge equals batch, re-delivery is a no-op") {
    import org.apache.spark.sql.DataFrame
    val base = Tables.load(spark, sf, "events")
      .select(date_format(timestamp_seconds(expr("ts div 1000000000")),
        "yyyy-MM-dd").as("grp"), col("user_id").as("id"))
      .withColumn("bucket3", col("id") % 3)
    def slice(b: Long): DataFrame =
      base.filter(col("bucket3") === b).select(col("grp"), col("id"))
    // fold three uneven micro-batches through max-merge, replaying the
    // middle batch's registers twice (at-least-once delivery)
    var st = Hll.registersFrom(slice(0)).localCheckpoint(true)
    val b1 = Hll.registersFrom(slice(1)).localCheckpoint(true)
    st = Hll.mergeRegisters(st, b1).localCheckpoint(true)
    st = Hll.mergeRegisters(st, b1).localCheckpoint(true) // replay
    st = Hll.mergeRegisters(st, Hll.registersFrom(slice(2)))
      .localCheckpoint(true)
    val streamed = Hll.estimatesFrom(st).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Hll.estimatesFrom(
      Hll.registersFrom(base.select(col("grp"), col("id")))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
