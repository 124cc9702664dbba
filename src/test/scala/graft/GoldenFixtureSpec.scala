package graft

import org.apache.spark.sql.functions._
import graft.schema.Fixtures

/** The committed golden-output fixtures equal the live query outputs at the
  * scale they were generated at (sf0.01, the driver's verify scale). The
  * fixtures were produced by an INDEPENDENT pure-Python float64 forward pass
  * (tools/make_rnn_fixture.py) over the same committed weights — this spec
  * re-proves, on every test run, that the native Scala recurrence still
  * bit-matches that independent implementation after HALF_UP round-6. */
class GoldenFixtureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def fixtureDf(name: String) = {
    Fixtures.oracleSelect(name, "*") // register…
    Fixtures.extractRegistered()     // …and extract to the stable tmp path
    spark.read.parquet(Fixtures.path(name))
  }

  test("q80 native GRU scores bit-match the committed golden fixture") {
    val live = SparkEntry.queries("q80_rnn_scores")(spark, sf)
    val expected = fixtureDf("q80_expected_sf001.parquet")
    assert(live.count() === 150)
    // exceptAll both ways = multiset equality on (user_id, target) bits
    assert(live.exceptAll(expected).isEmpty &&
      expected.exceptAll(live).isEmpty)
  }

  test("q83 native LSTM latents bit-match the committed golden fixture") {
    val live = SparkEntry.queries("q83_vrae_latent")(spark, sf)
    val expected = fixtureDf("q83_expected_sf001.parquet")
    assert(live.count() === 150)
    assert(live.exceptAll(expected).isEmpty &&
      expected.exceptAll(live).isEmpty)
  }
}
