package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Subword (BPE-style) encoding: the replace-chain must equal classic
  * "repeatedly merge the lowest-rank pair present" BPE, merges must never
  * jump word boundaries, and `passes`=6 must exhaust long runs. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  /** Classic BPE encode, per word: find the lowest-rank merge whose pair
    * occurs, merge its occurrences left-to-right non-overlapping, repeat
    * until no merge applies. The convention Subword.encode claims to be
    * equivalent to. */
  private def classicBpe(text: String, merges: Seq[(String, String)]): Seq[String] = {
    def encodeWord(w: String): Seq[String] = {
      var units: Vector[String] = w.map(_.toString).toVector
      var changed = true
      while (changed) {
        changed = false
        merges.iterator
          .find { case (x, y) =>
            units.indices.dropRight(1).exists(i => units(i) == x && units(i + 1) == y)
          }
          .foreach { case (x, y) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < units.length) {
              if (i + 1 < units.length && units(i) == x && units(i + 1) == y) {
                out += (x + y); i += 2
              } else { out += units(i); i += 1 }
            }
            units = out.result(); changed = true
          }
      }
      units
    }
    text.split(" ").filter(_.nonEmpty).toSeq.flatMap(encodeWord)
  }

  private def sparkEncode(text: String, merges: Seq[(String, String)]): String =
    Seq(text).toDF("t").select(Subword.encode(col("t"), merges)).as[String].head()

  /** Parse "·th·e· ·a·" back into word-wise unit lists for comparison. */
  private def units(encoded: String): Seq[String] =
    encoded.split("·").filter(u => u.nonEmpty && u != " ").toSeq

  test("encode matches hand-computed merges, stops at word boundaries") {
    // defaultMerges rank order: t+h first, then th+e — "the" collapses to
    // one unit; the space between words blocks any cross-word merge.
    val got = sparkEncode("the thin in", Subword.defaultMerges)
    assert(units(got) == classicBpe("the thin in", Subword.defaultMerges))
    assert(units(got).head == "the")
    assert(got.contains("· ·"), "space must remain its own framed unit")
  }

  test("replace-chain equals classic BPE on randomized corpora") {
    val rnd = new scala.util.Random(41)
    val alphabet = "thein aorgs".toSeq
    val texts = (Seq.tabulate(60) { _ =>
      (1 to (3 + rnd.nextInt(20)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        .split(" ").filter(_.nonEmpty).mkString(" ")
    } ++ Seq("ththththththth", "thethethethe", "iiiiii",
      "ininininin in ththth")).filter(_.nonEmpty)
    val enc = texts.toDF("t")
      .select(col("t"), Subword.encode(col("t"), Subword.defaultMerges).as("e"))
      .as[(String, String)].collect()
    enc.foreach { case (t, e) =>
      assert(units(e) == classicBpe(t, Subword.defaultMerges), s"text=<$t>")
    }
  }

  test("passes=6 exhausts a 64-pair x·y run; unitCount excludes spaces") {
    // each pass halves the unmerged x·y pairs: 64 pairs need 6 passes.
    val run = "xy" * 64
    val got = sparkEncode(run, Seq("x" -> "y"))
    assert(units(got) == Seq.fill(64)("xy"),
      "64 xy pairs must all merge within the pass budget")
    assert(units(got) == classicBpe(run, Seq("x" -> "y")))
    val df = Seq(("the in", 2), ("", 0)).toDF("t", "n")
    val counts = df.select(
      Subword.unitCount(Subword.encode(col("t"), Subword.defaultMerges), col("n")))
      .as[Long].collect()
    // "the"→1 unit, "in"→1 unit, the space excluded; empty doc → 0
    assert(counts.toSeq == Seq(2L, 0L))
  }

  /** Reference BPE trainer over a word histogram: count adjacent unit
    * pairs weighted by word count (same-symbol pairs excluded, matching
    * learnMerges' documented restriction), take the (count DESC, x, y)
    * argmax, apply it left-to-right non-overlapping, repeat. */
  private def classicLearn(words: Seq[(String, Long)], n: Int)
      : Seq[(String, String, Long)] = {
    var hist = words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    (1 to n).flatMap { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      hist.foreach { case (u, c) =>
        u.indices.dropRight(1).foreach { i =>
          if (u(i) != u(i + 1))
            counts((u(i), u(i + 1))) = counts.getOrElse((u(i), u(i + 1)), 0L) + c
        }
      }
      if (counts.isEmpty) Seq.empty
      else {
        val ((x, y), c) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        hist = hist.map { case (u, wc) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < u.length) {
            if (i + 1 < u.length && u(i) == x && u(i + 1) == y) {
              out += (x + y); i += 2
            } else { out += u(i); i += 1 }
          }
          (out.result(), wc)
        }
        Seq((x, y, c))
      }
    }
  }

  test("learnMerges equals the classic histogram trainer") {
    val corpus = Seq(
      "the thin thing then", "in the ring a thing sang",
      "the rain in spain", "singing in the rain", "a ring and a thing",
      "then the thin one sang in the rain")
    val words = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val got = words.toDF("word", "cnt")
      .transform(Subword.learnMerges(_, "word", "cnt", nMerges = 5))
      .orderBy("rank")
      .select("x", "y", "cnt").as[(String, String, Long)].collect().toSeq
    assert(got == classicLearn(words, 5))
    // the learned table must be applicable by encode (x != y throughout)
    got.foreach { case (x, y, _) => assert(x != y) }
  }

  test("learnMerges weights pairs by word count, not word presence") {
    // "ab" appears 10×, "cd" 3× — (a,b) must win rank 1 on weight
    val words = Seq(("ab", 10L), ("cd", 3L), ("cd", 4L))
    val got = words.toDF("word", "cnt")
      .transform(Subword.learnMerges(_, "word", "cnt", nMerges = 2))
      .orderBy("rank").select("x", "y", "cnt")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 10L), ("c", "d", 7L)))
  }

  test("framing chars and same-symbol merges are rejected") {
    intercept[IllegalArgumentException] {
      Subword.encode(lit("x"), Seq("a" -> "b c"))
    }
    intercept[IllegalArgumentException] {
      Subword.encode(lit("x"), Seq("·" -> "a"))
    }
    // (a,a) on "aaa" would orphan the middle unit vs classic BPE — the
    // chain refuses rather than silently diverging.
    intercept[IllegalArgumentException] {
      Subword.encode(lit("x"), Seq("a" -> "a"))
    }
  }

  test("spanCorruptionCols: digests match a reconstruction from the same " +
      "hash decisions; zero-token docs digest empty streams") {
    import spark.implicits._
    val text = "a b c d e f g h i j" // 10 tokens → blocks [abc][def][ghi][j]
    val df = Seq((7L, text), (8L, "!!!")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +: TextOps.spanCorruptionCols(
        col("doc_id"), TextOps.tokens(col("text")), block = 3,
        modulus = 7, salt = "span"): _*)
      .as[(Long, Long, Long, Long, Double, String, String)]
      .collect().map(r => r._1 -> r).toMap
    // recover the content-addressed mask decisions with the SAME hash
    val masked = (0 until 4).map { b =>
      val h = Seq.empty[Int].toDF("x").sparkSession.range(1)
        .select(Dedup.md5Hash(lit(s"7#$b"), lit("span")) % 7 === 0)
        .as[Boolean].head()
      b -> h
    }.toMap
    val toks = text.split(" ")
    val blocks = toks.grouped(3).toArray
    val input = blocks.indices.flatMap { b =>
      if (masked(b)) Seq(s"<extra_id_$b>") else blocks(b).toSeq
    }.mkString(" ")
    val target = blocks.indices.filter(masked).map { b =>
      s"<extra_id_$b> " + blocks(b).mkString(" ")
    }.mkString(" ")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nSpans = blocks.indices.count(masked)
    val nMasked = blocks.indices.filter(masked).map(blocks(_).length).sum
    assert(out(7L) == ((7L, 10L, nSpans.toLong, nMasked.toLong,
      math.round(nMasked / 10.0 * 1e6) / 1e6, md5hex(input),
      md5hex(target))))
    // zero tokens: no spans, both digests are of the empty stream
    assert(out(8L) == ((8L, 0L, 0L, 0L, 0.0, md5hex(""), md5hex(""))))
  }
}
