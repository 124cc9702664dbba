package graft.schema

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Committed golden-output fixtures (under src/main/resources/graft/
  * fixtures/) made visible to the driver's DuckDB oracle.
  *
  * The correctness gate runs every oracle as SQL in DuckDB; a model forward
  * pass (q80's GRU, q83's LSTM latent) is not SQL-expressible, so its oracle
  * is a committed expected-output parquet produced by an INDEPENDENT
  * implementation (`tools/make_rnn_fixture.py` — pure-Python float64 forward
  * over the same committed weights, see FIXTURES.md). DuckDB needs a
  * filesystem path for `read_parquet`, and the checkout location isn't
  * known at authoring time, so fixtures are extracted from the classpath to
  * a stable tmp location by graft.Verify (which runs on the same machine as
  * the driver's DuckDB step, immediately before it).
  *
  * [[oracleSelect]] only REGISTERS the fixture and builds the SQL — no IO —
  * so registry construction (and graft.FixtureDump, which must run before a
  * fixture is first committed) never depends on the fixture existing. */
object Fixtures {
  // per-user + per-checkout suffix: a fixed shared path raced concurrent
  // runs from different checkouts (one run's DuckDB step could read the
  // other's fixture bytes) and failed outright on multi-user machines
  // where another user owned /tmp/graft_fixtures. The SQL path and the
  // extraction are both produced by the same JVM run, so any stable
  // suffix works — user + cwd-hash makes it collision-free.
  private val dir = {
    val user = sys.props.getOrElse("user.name", "anon")
    val cwd = math.abs(sys.props.getOrElse("user.dir", "").hashCode.toLong)
    Paths.get(sys.props("java.io.tmpdir"), s"graft_fixtures_${user}_$cwd")
  }
  private val registered =
    scala.collection.mutable.LinkedHashSet.empty[String]

  /** Stable extraction path for a fixture (no IO). */
  def path(name: String): String = dir.resolve(name).toString

  /** Oracle SQL for a fixture-checked query: read the expected output.
    * Registers `name` for [[extractRegistered]]. */
  def oracleSelect(name: String, cols: String): String = synchronized {
    registered += name
    s"SELECT $cols FROM read_parquet('${path(name)}')"
  }

  /** Extract every registered fixture resource to its [[path]]. Called by
    * graft.Verify before it writes oracle_sql.json; fails loudly if a
    * registered fixture was never committed (always re-copies, so a stale
    * tmp file from an older build can't win). */
  def extractRegistered(): Unit = synchronized {
    Files.createDirectories(dir)
    registered.foreach { name =>
      val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
      require(in != null, s"fixture resource not found: /graft/fixtures/$name")
      // copy-to-temp + atomic move: a reader racing a re-extraction from
      // the same checkout must never see a half-written parquet
      val tmp = Files.createTempFile(dir, s".$name", ".part")
      try {
        Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, dir.resolve(name),
          StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      } finally {
        in.close()
        Files.deleteIfExists(tmp)
      }
    }
  }
}
