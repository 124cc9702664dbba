package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedStats equals the unsalted aggregation") {
    val rows = (1 to 500).map(i => (if (i % 10 == 0) 2L else 1L, i.toDouble))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedStats(df, "k", "v", saltOn = $"v", salts = 8)
      .orderBy("k").collect()
    val plain = df.groupBy("k").agg(sum($"v"), count($"v"), min($"v"),
      max($"v"), avg($"v")).orderBy("k").collect()
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getDouble(1) == p.getDouble(1))          // sum
      assert(s.getLong(2) == p.getLong(2))              // count
      assert(s.getDouble(3) == p.getDouble(3))          // min
      assert(s.getDouble(4) == p.getDouble(4))          // max
      assert(math.abs(s.getDouble(5) - p.getDouble(5)) < 1e-9) // avg
    }
  }

  test("saltedJoin is row-identical to the plain join and shuffles (no broadcast)") {
    // 90% of the big side lands on one hot key — the shape salting exists for
    val big = (1 to 1000)
      .map(i => (i.toLong, if (i % 10 == 0) i.toLong % 7 else 99L))
      .toDF("id", "k")
    val small = Seq((99L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "tag")
    val salted = Skew.saltedJoin(big, small, "k", saltOn = $"id", salts = 8)
      .select("id", "k", "tag")
    val plain = big.join(small, Seq("k")).select("id", "k", "tag")
    assert(salted.count() == 1000)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    val planStr = salted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!planStr.contains("BroadcastHashJoin"),
      s"salted join was broadcast — salting demonstrates the shuffle path:\n$planStr")
  }

  test("salt is deterministic and bounded") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val a = df.select(Skew.salt($"v", 8)).as[Int].collect()
    val b = df.select(Skew.salt($"v", 8)).as[Int].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(s => s >= 0 && s < 8))
  }

  test("repair approx mode stays close to exact mode") {
    val rows = (1 to 200).map(i => (1L, s"c${i % 2}", i.toLong, i.toDouble))
    val df = rows.toDF("u", "code", "id", "amt")
    val ex = Repair(df, "u", "code", "amt", nAmt = 5, nMcc = 3)
      .agg(sum("amt")).as[Double].head()
    val ap = Repair(df, "u", "code", "amt", nAmt = 5, nMcc = 3,
      exact = false).agg(sum("amt")).as[Double].head()
    assert(math.abs(ex - ap) / math.abs(ex) < 0.05, s"$ex vs $ap")
  }
}
