package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * DSIR-style data selection via importance resampling (Xie et al., NeurIPS
 * 2023, "Data Selection for Language Models via Importance Resampling"):
 * score every raw document by how much it looks like a TARGET domain under
 * hashed n-gram bag-of-features models, then resample the raw corpus with
 * Gumbel-top-k on those weights. This is the selection step that sits
 * between corpus curation (d41-d62) and a pretraining run: "give me the
 * 10% of the crawl that most resembles Wikipedia".
 *
 * Method, exactly as published (their §3, hashed n-gram variant):
 *  - features are unigrams ∪ word bigrams hashed into `buckets` buckets;
 *  - fit two multinomial bag-of-buckets models — p from the target slice,
 *    q from the full raw corpus — with add-one smoothing;
 *  - per-document log importance weight  log w(d) = Σ_f c_f(d)·(ln p_f −
 *    ln q_f)  over the document's feature multiset;
 *  - select k documents WITHOUT replacement by Gumbel-top-k:
 *    argtop-k ( log w(d) + g_d ),  g_d ~ Gumbel(0,1) — equivalent to
 *    sampling ∝ w(d) without replacement, which preserves diversity where
 *    straight top-k collapses onto near-copies of the target mode.
 *
 * Determinism/scale discipline (the repo-wide contract):
 *  - the bucket hash is the md5-derived family ([[Dedup.md5Hash]]) so a
 *    SQL oracle replays signatures bit-for-bit; production swaps xxhash64;
 *  - the Gumbel noise is content-addressed: u_d derives from
 *    md5Hash(doc_id # salt), so the draw is reproducible across engines,
 *    partitionings and re-runs (same policy as [[Sampling]]'s hashFold);
 *  - per-bucket log-ratios are computed once in a `buckets`-row table and
 *    pre-rounded (8 dp); the per-document sum runs in DECIMAL(25,10) —
 *    exact, so partial-aggregation order cannot move the result (the
 *    kmeans/e12 pattern) — then rounds once to 6 dp;
 *  - shape: one corpus-sized exchange for the (doc, bucket) counts (map-
 *    side combine on an exploded token stream — linear in corpus tokens),
 *    ONE B-row broadcast join for the log-ratios, a per-doc aggregate, and
 *    a TakeOrdered top-k. No window over the corpus, no all-pairs, nothing
 *    driver-side beyond the B-row ratio table; at 100 TB raise `buckets`
 *    (the paper uses 10k) and nothing else changes.
 */
object Dsir {

  /** (doc, bucket, c) feature-bucket counts of the unigram∪bigram multiset
    * of `textCol`, hashed into `buckets` buckets. Counts are MULTISET
    * counts (a repeated feature counts each occurrence — multinomial
    * model), unlike the dedup family's distinct posting lists. */
  def bucketCounts(df: DataFrame, idCol: String, textCol: String,
                   buckets: Int,
                   hashFamily: (Column, Column) => Column = Dedup.md5Hash)
  : DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val feats = concat(toks, TextOps.shingles(toks, 2))
    df.select(col(idCol).as("doc"), explode(feats).as("f"))
      .select(col("doc"),
        pmod(hashFamily(col("f"), lit("dsir")), lit(buckets.toLong))
          .as("bucket"))
      .groupBy(col("doc"), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** The `buckets`-row log-ratio table ln p_f − ln q_f with add-one
    * smoothing, from target-slice counts vs raw-corpus counts. Both
    * marginals ride in as 1-row broadcasts; the ln runs on ONE double
    * ratio of exact integer products (identical expression shape in the
    * SQL oracle), pre-rounded to 8 dp so downstream decimal sums are
    * engine-exact. Missing buckets (0 count on either side) still get
    * their smoothed mass via the dense bucket spine. */
  def logRatios(tgtCounts: DataFrame, rawCounts: DataFrame, buckets: Int)
  : DataFrame = {
    val spark = rawCounts.sparkSession
    val spine = spark.range(0, buckets).select(col("id").as("bucket"))
    val tgt = tgtCounts.groupBy(col("bucket")).agg(sum(col("c")).as("ct"))
    val raw = rawCounts.groupBy(col("bucket")).agg(sum(col("c")).as("cr"))
    val dense = spine
      .join(tgt, Seq("bucket"), "left")
      .join(raw, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    // ONE 1-row aggregate for both marginals (the oracle's `tot` CTE
    // shape) — two separate aggs would plan the dense subtree twice more
    val tot = dense.agg(sum(col("ct")).as("_nt"), sum(col("cr")).as("_nr"))
    dense.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(log(((col("ct") + lit(1)).cast("double")
            * (col("_nr") + lit(buckets.toLong)).cast("double"))
          / ((col("cr") + lit(1)).cast("double")
            * (col("_nt") + lit(buckets.toLong)).cast("double"))), 8)
          .as("lr"))
  }

  /** Per-document log importance weight: Σ_f c_f·lr_f over the doc's
    * buckets. `ratios` is the B-row [[logRatios]] table — broadcast, so
    * this is a map-side join plus one per-doc aggregate. Also returns the
    * feature count (the weight's natural length normalizer, reported so a
    * consumer can audit length bias). */
  def logWeights(counts: DataFrame, ratios: DataFrame): DataFrame =
    counts.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc"))
      .agg(sum(col("c")).as("n_feats"),
        round(sum((col("c").cast("double") * col("lr"))
          .cast("decimal(25,10)")).cast("double"), 6).as("logw"))

  /** Content-addressed Gumbel(0,1) noise: u = ((h>>8)+1)/(2^52+1) with h
    * the 60-bit md5Hash(id # salt). The top 52 hash bits keep every
    * integer in the ratio EXACTLY representable as a double (2^52+1 is;
    * 2^60+1 is not), so u ∈ (0,1) strictly — g = −ln(−ln u) is always
    * finite — and the draw replays bit-for-bit in any engine. */
  def gumbel(id: Column, salt: String): Column =
    -log(-log((shiftright(Dedup.md5Hash(id.cast("string"), lit(salt)), 8)
        + lit(1L)).cast("double")
      / lit(4503599627370497L).cast("double")))

  /** Gumbel-top-k selection: rank by round(logw + g, 6) desc (doc id
    * tiebreak) and keep `k` — sampling ∝ w without replacement, the
    * paper's resampling step. TakeOrdered shape: per-partition top-k +
    * one k-row merge, never a global sort. */
  def gumbelTopK(weights: DataFrame, k: Int, salt: String): DataFrame =
    Relevance.topKRanks(
      weights.withColumn("score",
        round(col("logw") + gumbel(col("doc"), salt), 6)),
      "score", "doc", k)
}
