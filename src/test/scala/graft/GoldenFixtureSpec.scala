package graft

import graft.schema.Fixtures

/** The committed golden-output fixtures equal the live query outputs at
  * EVERY scale the driver runs (sf0.001 smoke, sf0.01 verify; sf0.1 is also
  * committed for local bench-scale iteration). The fixtures were produced by
  * an INDEPENDENT pure-Python float64 forward pass
  * (tools/make_rnn_fixture.py) over the same committed weights — this spec
  * re-proves, on every test run, that the native Scala recurrence still
  * bit-matches that independent implementation after HALF_UP round-6.
  *
  * Scope note (FIXTURES.md §3): the fixture is independent for the FORWARD
  * PASS only — the input tensors come from the engine's own sequence
  * assembly. The assembly itself is independently checked by the q86/q87
  * registry rows (DuckDB SQL replay of the scalarized tensors). */
class GoldenFixtureSpec extends SparkSpec {

  private def fixtureDf(base: String, tag: String) = {
    Fixtures.oracleSelect(base, "*") // register…
    Fixtures.extractRegistered()     // …and extract every committed variant
    spark.read.parquet(Fixtures.path(base, tag))
  }

  private def check(qname: String, base: String, sfDir: String,
                    expectRows: Long): Unit = {
    val live = SparkEntry.queries(qname)(spark, sfDir)
    val expected = fixtureDf(base, Fixtures.scaleTag(sfDir))
    assert(live.count() === expectRows)
    // exceptAll both ways = multiset equality on all columns, bit-exact
    assert(live.exceptAll(expected).isEmpty &&
      expected.exceptAll(live).isEmpty)
  }

  test("q80 native GRU scores bit-match the sf0.01 golden fixture") {
    check("q80_rnn_scores", "q80_expected", "/root/testdata/sf0.01", 150)
  }

  test("q80 native GRU scores bit-match the sf0.001 golden fixture") {
    check("q80_rnn_scores", "q80_expected", "/root/testdata/sf0.001", 15)
  }

  test("q83 native LSTM latents bit-match the sf0.01 golden fixture") {
    check("q83_vrae_latent", "q83_expected", "/root/testdata/sf0.01", 150)
  }

  test("q83 native LSTM latents bit-match the sf0.001 golden fixture") {
    check("q83_vrae_latent", "q83_expected", "/root/testdata/sf0.001", 15)
  }
}
