package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crafted-input checks for the corpus-curation operators added for
  * LLM-training pipelines: repetition metrics, rule filter,
  * decontamination, domain-mix sampling, semantic dedup. The driver's
  * DuckDB oracle checks them at data scale (d12–d15, e05); these specs pin
  * the decision semantics on inputs built to hit each branch. */
class CorpusFilterSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionCols flags a degenerate repeater and passes diverse text") {
    // doc 2: 20 distinct tokens → top unigram 1/20, top bigram 1/19 — under
    // every threshold (10 tokens would fail: top bigram 1/9 > 0.10)
    val diverse = ('a' to 't').map(c => s"word$c$c").mkString(" ")
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, diverse),
      (3L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +:
        TextOps.repetitionCols(TextOps.tokens(col("text"))): _*)
      .orderBy("doc_id").collect()
    // all-one-token doc: top fraction 1.0, dup fraction 0.9 → rejected
    assert(out(0).getAs[Long]("top_token_count") == 10)
    assert(out(0).getAs[Double]("top_token_frac") == 1.0)
    assert(out(0).getAs[Double]("dup_token_frac") == 0.9)
    assert(out(0).getAs[Long]("keep_repetition") == 0)
    // all-distinct doc: top fractions 1/10 and 1/9, dup 0 → kept
    assert(out(1).getAs[Double]("dup_token_frac") == 0.0)
    assert(out(1).getAs[Long]("keep_repetition") == 1)
    // empty doc: all metrics zero-guarded, no null/NaN
    assert(out(2).getAs[Long]("n_tokens") == 0)
    assert(out(2).getAs[Double]("top_token_frac") == 0.0)
  }

  test("ruleFilterCols emits the FIRST failing rule in order") {
    // digit-free distinct words (digits in tokens would trip the digit rule)
    val longDiverse = ('a' to 'z').map(c => s"word$c").mkString(" ")
    // natural-looking doc: diverse words WITH stopwords (C4 stopword rule
    // rejects docs lacking them) — sr = 2/28, mtl = 136/28 ≈ 4.9, ttr 27/28
    val natural = longDiverse + " the the"
    val df = Seq(
      (1L, "short text"), // < 20 tokens → too_short
      (2L, (1 to 25).map(_ => "a").mkString(" ")), // mtl=1 → token_len (before repetition)
      (3L, natural),
      (4L, longDiverse)).toDF("doc_id", "text") // zero stopwords → stopword
    val out = df.select(col("doc_id") +:
        TextOps.ruleFilterCols(col("text"), TextOps.tokens(col("text"))): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("reject_reason") == "too_short")
    assert(out(1).getAs[String]("reject_reason") == "token_len")
    assert(out(2).getAs[String]("reject_reason") == "ok")
    assert(out(2).getAs[Long]("keep") == 1)
    assert(out(3).getAs[String]("reject_reason") == "stopword")
  }

  test("piiCols counts and redacts emails and digit runs") {
    val df = Seq(
      (1L, "contact bob@example.com or 12345678 now"),
      (2L, "clean prose only"),
      (3L, "mail bob123456@x.com")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +: TextOps.piiCols(col("text")): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 1)
    assert(out(0).getAs[Long]("n_digit_runs") == 1)
    assert(out(0).getAs[Long]("pii_free") == 0)
    // a digit run inside an email is covered by <EMAIL>, not double-counted
    assert(out(2).getAs[Long]("n_emails") == 1)
    assert(out(2).getAs[Long]("n_digit_runs") == 0)
    // digest is md5 of the text with both PII shapes replaced
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("contact <EMAIL> or <ID> now".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("redacted_digest") == exp)
    assert(out(1).getAs[Long]("pii_free") == 1)
  }

  test("pseudonymize: same entity → same placeholder across docs; " +
      "distinct entities differ; non-matches untouched") {
    val df = Seq(
      (1L, "pay bob@example.com ref 12345678 ok"),
      (2L, "also bob@example.com and eve@x.org"),
      (3L, "ref 12345678 again plus 99887766")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.pseudonymize(
          TextOps.pseudonymize(col("text"), TextOps.emailPattern,
            "user", 997, "piiem"),
          TextOps.digitRunPattern, "id", 997, "piiid").as("p"))
      .as[(Long, String)].collect().map(r => r._1 -> r._2).toMap
    def tok(s: String, pre: String) =
      ("<" + pre + "_[0-9]+>").r.findAllIn(s).toList
    val bob1 = tok(out(1L), "user").head
    val List(bob2, eve2) = tok(out(2L), "user")
    assert(bob1 == bob2)     // referential integrity across documents
    assert(bob2 != eve2)     // distinct entities get distinct tokens
    val ref1 = tok(out(1L), "id").head
    val List(ref3, other3) = tok(out(3L), "id")
    assert(ref1 == ref3 && ref3 != other3)
    // surrounding prose is byte-identical
    assert(out(1L) == s"pay $bob1 ref $ref1 ok")
    assert(out(2L) == s"also $bob2 and $eve2")
  }

  test("chunkCols covers every token with overlapping windows") {
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        explode(TextOps.chunkCols(TextOps.tokens(col("text")), 64, 48))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_chunk_tokens"))
      .orderBy("chunk_id").collect()
    // 150 tokens, size 64 / stride 48 → starts 1, 49, 97, 145
    assert(out.forall(_.getAs[Long]("doc_id") == 1L)) // empty doc: no chunks
    assert(out.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq ==
      Seq(64L, 64L, 54L, 6L))
  }

  test("entropyCols: uniform tokens → ratio 1; constant → 0; empty → 0") {
    val df = Seq(
      (1L, "aa bb cc dd"), // 4 distinct, uniform → H = 2 bits, ratio 1
      (2L, "xx xx xx xx"), // one distinct token → H = 0
      (3L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +:
        TextOps.entropyCols(TextOps.tokens(col("text"))): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("token_entropy") == 2.0)
    assert(out(0).getAs[Double]("entropy_ratio") == 1.0)
    assert(out(1).getAs[Double]("token_entropy") == 0.0)
    assert(out(1).getAs[Double]("entropy_ratio") == 0.0)
    assert(out(2).getAs[Long]("n_tokens") == 0L)
    assert(out(2).getAs[Double]("token_entropy") == 0.0)
  }

  test("incrementalDedup admits first-new, rejects corpus and batch dups") {
    val df = Seq(
      (1L, "existing doc", false),
      (2L, "Existing DOC!", false), // same fingerprint as 1 (canonical)
      (10L, "existing doc", true), // batch copy of corpus doc → dup_corpus
      (11L, "fresh content", true), // first claimant → new
      (12L, "FRESH   content", true), // canonical dup of 11 → dup_batch
      (13L, "another one", true)).toDF("doc_id", "text", "isnew")
    val out = Dedup.incrementalDedup(df, "doc_id",
        TextOps.fingerprint(col("text")), col("isnew"))
      .orderBy("doc").collect()
    val reasons = out.map(r => r.getAs[Long]("doc") ->
      r.getAs[String]("reason")).toMap
    assert(out.length == 4) // corpus rows are not re-emitted
    assert(reasons(10L) == "dup_corpus")
    assert(reasons(11L) == "new")
    assert(reasons(12L) == "dup_batch")
    assert(reasons(13L) == "new")
    assert(out.count(_.getAs[Long]("admitted") == 1L) == 2)
  }

  test("decontaminate flags only train docs sharing an eval n-gram") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon"), // eval (id % 2 == 0 here)
      (1L, "alpha beta gamma delta zeta"), // shares 4-gram "alpha beta gamma delta"
      (3L, "one two three four five six")) // no overlap
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(df, "doc_id", "text", n = 4,
        isEval = col("doc_id") % 2 === 0)
      .orderBy("doc").collect()
    assert(out.map(_.getAs[Long]("doc")).toSeq == Seq(1L, 3L)) // eval excluded
    assert(out(0).getAs[Long]("n_overlap") == 1)
    assert(out(0).getAs[Long]("contaminated") == 1)
    assert(out(1).getAs[Long]("n_overlap") == 0)
    assert(out(1).getAs[Long]("contaminated") == 0)
  }

  test("domainMix keeps a deterministic subset at the domain's rate") {
    val df = (0 until 200).map(i => (i.toLong, s"dom${i % 2}"))
      .toDF("doc_id", "source")
    val kept = Sampling.domainMix(df, col("doc_id"), col("source"),
      weightOf = dom => when(dom === "dom0", 3).otherwise(1), frac = 0.5)
    val rates = kept.select(col("source"), col("rate")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // target shares 3/4 vs 1/4 over equal actual shares (100 each):
    // rate = 0.5 * w * 200 / (4 * 100) = 0.25 * w
    assert(rates("dom0") == 0.75 && rates("dom1") == 0.25)
    // determinism: same input → identical kept set
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = Sampling.domainMix(df, col("doc_id"), col("source"),
        weightOf = dom => when(dom === "dom0", 3).otherwise(1), frac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2) && ids1.nonEmpty)
  }

  test("semanticDedup drops the later of two near-identical same-bucket vectors") {
    // 4 base vectors (centroids) + one near-copy of vector 0
    def unit(axis: Int): Seq[Float] =
      (0 until 8).map(i => if (i == axis) 1.0f else 0.0f)
    val rows = Seq(
      (0L, unit(0)), (1L, unit(1)), (2L, unit(2)), (3L, unit(3)),
      (4L, (0 until 8).map(i => if (i == 0) 0.99f else 0.01f)))
    val df = rows.toDF("id", "vec")
    val out = Similarity.semanticDedup(df, threshold = 0.9, nCentroids = 4)
      .orderBy("id").collect()
    assert(out.length == 5)
    assert(out.take(4).forall(_.getAs[Long]("keep") == 1))
    val nearCopy = out(4)
    assert(nearCopy.getAs[Long]("cid") == 0L) // bucketed with vector 0
    assert(nearCopy.getAs[Long]("keep") == 0) // dropped: earlier near-dup
  }

  test("semanticDedup pair join is equi on cid — no nested-loop corpus join") {
    val df = (0 until 40).map(i =>
      (i.toLong, (0 until 8).map(j => ((i * 7 + j * 3) % 11 - 5).toFloat)))
      .toDF("id", "vec")
    val out = Similarity.semanticDedup(df, 0.9, nCentroids = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the corpus pair join must be an equi-join on cid (the scale claim);
    // the only nested loop is the tiny centroid broadcast inside the cached
    // assignment (its plan text repeats per InMemoryTableScan consumer, so
    // counting BNLJ strings would over-count a single execution)
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[cid".r
      .findFirstIn(plan).isDefined,
      s"pair join is not an equi-join on cid:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    // the centroid assignment is localCheckpoint-ed (NOT .cache()d — the
    // CacheManager would pin it until clearCache; the checkpoint RDD is
    // reclaimed by the ContextCleaner once unreachable), so its three
    // consumers all read the materialized RDD instead of recomputing
    assert(plan.contains("Scan ExistingRDD"),
      "centroid assignment is not materialized across its three consumers")
  }

  test("mmrRerank trades relevance for diversity past step one") {
    // A and B are IDENTICAL vectors (sim 1.0); C is orthogonal. Pure
    // relevance would pick A, B, C; MMR at λ=0.7 must demote the
    // redundant B below the diverse C: step2 scores are
    // B = 0.7·0.8 − 0.3·1.0 = 0.26 < C = 0.7·0.5 − 0.3·0.0 = 0.35.
    val a = Seq(1.0, 0.0); val c = Seq(0.0, 1.0)
    val pool = Seq(
      (7L, 10L, 0.9, a), (7L, 11L, 0.8, a), (7L, 12L, 0.5, c))
      .toDF("qid", "nid", "rel", "nv")
    val out = Similarity.mmrRerank(pool, k = 3, lam = 0.7,
        oneMinusLam = 0.3)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("nid"),
        r.getAs[Double]("score")))
    assert(out.toSeq == Seq((1L, 10L, 0.63), (2L, 12L, 0.35),
      (3L, 11L, 0.26)))
  }

  test("mmrRerank re-ranks each query's pool independently") {
    val v1 = Seq(1.0, 0.0); val v2 = Seq(0.0, 1.0)
    val pool = Seq(
      (1L, 10L, 0.9, v1), (1L, 11L, 0.4, v2),
      (2L, 11L, 0.7, v2), (2L, 10L, 0.6, v1))
      .toDF("qid", "nid", "rel", "nv")
    val out = Similarity.mmrRerank(pool, k = 2, lam = 0.7,
        oneMinusLam = 0.3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("step"))
        -> r.getAs[Long]("nid")).toMap
    assert(out((1L, 1L)) == 10L && out((2L, 1L)) == 11L)
    assert(out((1L, 2L)) == 11L && out((2L, 2L)) == 10L)
  }
}
