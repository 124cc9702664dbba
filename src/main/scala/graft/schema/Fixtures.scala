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

  /** Every scale the driver (or local iteration) can run verify at; a
    * fixture base may be committed for any subset — [[extractRegistered]]
    * extracts whichever exist. */
  val scaleTags: Seq[String] = Seq("sf0001", "sf001", "sf01")

  /** Extraction path of one committed per-scale variant (no IO). */
  def path(base: String, tag: String): String =
    dir.resolve(s"${base}_$tag.parquet").toString

  /** Scale tag for a testdata dir: basename with dots stripped, so
    * /root/testdata/sf0.01 → "sf001", sf0.001 → "sf0001", sf0.1 → "sf01" —
    * matching the committed fixture file suffixes. */
  def scaleTag(sfDir: String): String =
    Paths.get(sfDir).getFileName.toString.replace(".", "")

  /** Oracle SQL for a fixture-checked query. oracleSql is a STATIC map but
    * the expected output depends on the verify scale, which only
    * graft.Verify knows — so the SQL globs over ALL extracted per-scale
    * variants and selects the one whose row count equals the live user
    * count of the `events` table being verified (fixture row count = one
    * row per user, and the scales differ 10× in users, so the match is
    * unambiguous). This also makes interleaved verify runs at different
    * scales from the same checkout safe: extraction is additive, never a
    * clobber. Registers `base` for [[extractRegistered]]. */
  def oracleSelect(base: String, cols: String): String = synchronized {
    registered += base
    val glob = dir.resolve(s"${base}_*.parquet").toString
    s"SELECT $cols FROM (SELECT *, count(*) OVER (PARTITION BY filename) " +
      s"AS _n FROM read_parquet('$glob', filename=true)) " +
      "WHERE _n = (SELECT count(DISTINCT user_id) FROM events)"
  }

  /** Extract every committed per-scale variant of every registered fixture
    * base to its [[path]]. Called by graft.Verify before it writes
    * oracle_sql.json; fails loudly if a registered base has NO committed
    * variant at all (always re-copies, so a stale tmp file from an older
    * build can't win).
    *
    * `requiredTag` (graft.Verify passes [[scaleTag]] of its sfDir): assert
    * that EVERY registered base has a committed variant at the scale being
    * verified. Without this, a verify run at a scale with no committed
    * variant (e.g. sf1) would let [[oracleSelect]]'s row-count filter match
    * nothing and the oracle silently return 0 rows — an opaque rows/hash
    * mismatch instead of a loud 'missing fixture' error. */
  def extractRegistered(requiredTag: Option[String] = None): Unit = synchronized {
    Files.createDirectories(dir)
    registered.foreach { base =>
      val found = scaleTags.flatMap { tag =>
        val res = s"${base}_$tag.parquet"
        Option(getClass.getResourceAsStream(s"/graft/fixtures/$res")).map { in =>
          // copy-to-temp + atomic move: a reader racing a re-extraction
          // from the same checkout must never see a half-written parquet
          val tmp = Files.createTempFile(dir, s".$res", ".part")
          try {
            Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
            Files.move(tmp, Paths.get(path(base, tag)),
              StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          } finally {
            in.close()
            Files.deleteIfExists(tmp)
          }
          tag
        }
      }
      require(found.nonEmpty,
        s"no committed fixture variant for base $base (tried $scaleTags)")
      requiredTag.foreach { tag =>
        require(found.contains(tag),
          s"fixture base $base has no committed variant for verify scale " +
            s"$tag (committed: ${found.mkString(",")}) — run " +
            s"graft.FixtureDump + tools/make_rnn_fixture.py --tag $tag " +
            "and commit the parquet, or verify at a committed scale")
      }
    }
  }
}
