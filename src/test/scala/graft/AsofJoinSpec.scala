package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of semantics: latest ref at or before probe ts, per key") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // before any ref for key 2
    ).toDF("k", "ts", "tag")
    val ref = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (2L, ts("2024-01-01 10:00:00"), 300L),
    ).toDF("k", "ts", "v")
    val out = AsofJoin.leftAsOf(probe, ref, "k", "ts", Seq("v"))
      .orderBy("tag").collect()
    assert(out.map(r => Option(r.get(3)).map(_.asInstanceOf[Long])).toSeq ===
      Seq(Some(100L), Some(200L), None)) // p1<-9:30, p2<-11:00, p3<-no match
  }

  test("inclusive match at equal timestamps; probe keeps all columns") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), 7.5)).toDF("k", "ts", "x")
    val ref = Seq((1L, ts("2024-01-01 10:00:00"), 42L)).toDF("k", "ts", "v")
    val out = AsofJoin.leftAsOf(probe, ref, "k", "ts", Seq("v")).collect()
    assert(out.head.getLong(3) === 42L) // ts_ref == ts_probe matches
    assert(out.head.getDouble(2) === 7.5)
  }

  test("keys absent from reference yield nulls, not dropped rows") {
    val probe = Seq((9L, ts("2024-01-01 10:00:00"), "lonely")).toDF("k", "ts", "tag")
    val ref = Seq((1L, ts("2024-01-01 09:00:00"), 1L)).toDF("k", "ts", "v")
    val out = AsofJoin.leftAsOf(probe, ref, "k", "ts", Seq("v")).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(3))
  }
}
