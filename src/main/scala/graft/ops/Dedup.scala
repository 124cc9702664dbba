package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines: exact (hash groupBy),
 * n-gram Jaccard, MinHash+LSH, SimHash. Beyond the reference's own surface —
 * these are the 100 TB-corpus capabilities a user of this engine needs.
 *
 * Scale design notes (the part that matters at 1000 executors):
 *  - Exact dedup is one shuffle on a 16-byte digest, never on the document
 *    body; map-side combine collapses most groups before the exchange.
 *  - Jaccard/MinHash candidate generation joins on SHINGLE or BAND KEY, never
 *    all-pairs. The shingle join's skew risk is hot shingles (stopword-only
 *    n-grams): `maxPostings` caps a shingle's posting list — standard
 *    df-cutoff, analogous to the reference's rare-category cutoffs.
 *  - MinHash signatures here use an md5-derived hash family so the DuckDB
 *    oracle can reproduce them bit-for-bit. For production throughput swap
 *    `hashFamily = Dedup.xxhashFamily` (codegen'd xxhash64, one pass, no hex
 *    round-trip) — identical structure, faster primitive.
 */
object Dedup {

  /** 60-bit positive int from the first 15 hex chars of md5(s + "#" + seed).
    * Reproducible in DuckDB as ('0x'||substr(md5(s||'#'||seed),1,15))::BIGINT. */
  def md5Hash(s: Column, seed: Column): Column =
    conv(substring(md5(concat(s, lit("#"), seed.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Production hash family: Spark's codegen'd xxhash64 with per-index seed.
    * NOT oracle-reproducible (DuckDB has no xxhash64) — use for real runs. */
  def xxhashFamily(s: Column, seed: Column): Column = xxhash64(s, seed)

  /** Exact dedup: canonical fingerprint → one group per digest, keep the
    * smallest id, count duplicates (`TextOps.fingerprint` for the robust
    * variant, plain `md5` for byte-exact). */
  def exact(df: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    df.groupBy(keyExpr.as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct (doc, shingle) pairs, with hot-shingle posting lists capped at
    * `maxPostings` docs (df-cutoff: a shingle every document contains carries
    * no dedup signal but would quadratically blow up the pair join). */
  def docShingles(df: DataFrame, idCol: String, textCol: String, n: Int,
                  maxPostings: Int = 0): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("s"))
      .distinct()
    if (maxPostings <= 0) sh
    else {
      val hot = sh.groupBy("s").count().filter(col("count") > maxPostings)
        .select("s")
      sh.join(hot, Seq("s"), "left_anti")
    }
  }

  /** Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold).
    * Candidate pairs come from the shingle join (docs sharing >= 1 shingle);
    * |A∪B| = |A| + |B| − |A∩B| keeps everything integer-exact. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   threshold: Double, maxPostings: Int = 0): DataFrame = {
    val sh = docShingles(df, idCol, textCol, n, maxPostings)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val l = sh.select(col("doc").as("a"), col("s"))
    val r = sh.select(col("doc").as("b"), col("s"))
    val inter = l.join(r, Seq("s")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc").as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("jaccard", round(col("inter").cast("double")
        / (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash signatures: one row per (doc, j) with j in [0, k), sig = min
    * over the doc's shingles of hashFamily(shingle, j). One shuffle
    * (groupBy doc,j with map-side min combine). */
  def minhashSignatures(sh: DataFrame, k: Int,
                        hashFamily: (Column, Column) => Column = md5Hash)
  : DataFrame =
    sh.select(col("doc"), explode(sequence(lit(0), lit(k - 1))).as("j"),
        col("s"))
      .select(col("doc"), col("j"), hashFamily(col("s"), col("j")).as("h"))
      .groupBy(col("doc"), col("j")).agg(min(col("h")).as("sig"))

  /** LSH band keys: `bands` groups of `k/bands` signature rows; band key =
    * md5 of the ordered signature slice. Docs sharing any band key are
    * candidates — probability of sharing a band rises sharply with true
    * Jaccard (the (1/b)^(1/r) S-curve). */
  def lshBandKeys(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    sigs.withColumn("band", floor(col("j") / rows))
      .groupBy(col("doc"), col("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("j"), col("sig")))),
          r => r.getField("sig").cast("string")))).as("bkey"))
  }

  /** Full MinHash+LSH near-dup detection: candidate pairs from band-key
    * collisions, scored by estimated Jaccard = matching signature fraction.
    * Returns (a, b, est_jaccard). The band join shuffles on 16-byte band
    * keys only — signatures and documents never fan out quadratically. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String, n: Int,
                 k: Int, bands: Int, maxPostings: Int = 0,
                 hashFamily: (Column, Column) => Column = md5Hash)
  : DataFrame = {
    val sh = docShingles(df, idCol, textCol, n, maxPostings)
    val sigs = minhashSignatures(sh, k, hashFamily)
    val bk = lshBandKeys(sigs, k, bands)
    val cand = bk.select(col("doc").as("a"), col("band"), col("bkey"))
      .join(bk.select(col("doc").as("b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val sl = sigs.select(col("doc").as("a"), col("j"), col("sig").as("siga"))
    val sr = sigs.select(col("doc").as("b"), col("j"), col("sig").as("sigb"))
    cand.join(sl, Seq("a")).join(sr, Seq("b", "j"))
      .groupBy(col("a"), col("b"))
      .agg(round(sum(when(col("siga") === col("sigb"), 1).otherwise(0))
        .cast("double") / lit(k.toDouble), 6).as("est_jaccard"))
  }

  /** SimHash of width `bits` over the doc's distinct tokens: bit i of the
    * hash is 1 when more token-hashes have bit i set than not. Computed as
    * `bits` conditional sums in ONE aggregation pass (no per-bit explode).
    * Near-dups = pairs with small hamming distance on the resulting long. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int,
              hashFamily: (Column, Column) => Column = md5Hash): DataFrame = {
    require(bits <= 60, "md5-derived hashes carry 60 usable bits")
    val toks = df.select(col(idCol).as("doc"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("t"))
    val hashed = toks.select(col("doc"), hashFamily(col("t"), lit(0)).as("h"))
    val bitSums = (0 until bits).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L))).as(s"b$i"))
    val aggCols = count(lit(1)).as("n") +: bitSums
    val agg = hashed.groupBy(col("doc"))
      .agg(aggCols.head, aggCols.tail: _*)
    val hash = (0 until bits).map(i =>
      when(col(s"b$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc"), hash.as("simhash"))
  }

  /** Hamming-distance pairs over simhash values (a < b, dist <= maxDist).
    * All-pairs here; the scale path is banding the simhash into segments
    * (pigeonhole: dist <= d implies an exact match on one of d+1 segments)
    * — same LSH-join shape as minhashLsh. */
  def simhashPairs(hashes: DataFrame, maxDist: Int): DataFrame =
    hashes.select(col("doc").as("a"), col("simhash").as("ha"))
      .crossJoin(hashes.select(col("doc").as("b"), col("simhash").as("hb")))
      .filter(col("a") < col("b"))
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
}
