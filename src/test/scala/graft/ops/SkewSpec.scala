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
