package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form
import graft.ops._
import graft.schema.Tables

/**
 * Driver-contract query registry, part 2: training-data-pipeline operators
 * (dedup, similarity search, text analysis, multimodal plumbing) over the
 * `documents` and `embeddings` tables.
 *
 * MinHash/SimHash use the md5-derived hash family so the DuckDB oracle can
 * reproduce signatures bit-for-bit (Dedup.md5Hash); integer signature
 * arithmetic keeps every comparison exact. The xxhash64 family is the
 * production path (see Dedup docs).
 */
object QueriesText {
  type QFn = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  // word 3-gram shingle list over the token array (empty when < 3 tokens)
  private val shingleListSql =
    s"""list_transform(range(1, greatest(len($tokSql) - 1, 1)),
       | i -> array_to_string(list_slice($tokSql, i, i + 2), ' '))"""
      .stripMargin.replaceAll("\n", "")
  private val shCte =
    s"""toks AS (SELECT doc_id, $tokSql AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
       |  unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
       |  FROM toks))""".stripMargin
  private def md5HashSql(expr: String) =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  // d03's linear quality score as a DuckDB expression — identical term
  // order/associativity to TextOps.qualityCols (shared by d03's sibling
  // d31, which ranks this score within each source)
  private val qScoreSql: String = {
    val stopList = TextOps.langStopwords.flatMap(_._2)
      .map(w => s"'$w'").mkString(", ")
    val nToks = s"len($tokSql)"
    val meanLen = s"CASE WHEN $nToks > 0 THEN " +
      s"list_sum(list_transform($tokSql, x -> len(x))) / $nToks ELSE 0 END"
    val stopRatio = s"CASE WHEN $nToks > 0 THEN " +
      s"len(list_filter($tokSql, x -> list_contains([$stopList], x))) " +
      s"/ $nToks ELSE 0 END"
    val ttr = s"CASE WHEN $nToks > 0 THEN " +
      s"len(list_distinct($tokSql)) / $nToks ELSE 0 END"
    val digitRatio = s"CASE WHEN length(text) > 0 THEN " +
      s"len(regexp_extract_all(text, '[0-9]')) / length(text) ELSE 0 END"
    s"round(0.35 * ($ttr) + 0.35 * ($stopRatio) " +
      s"+ 0.2 * (1.0 - ($digitRatio)) " +
      s"+ 0.1 * least(($meanLen) / 10.0, 1.0), 6)"
  }

  // d04's language-ID pieces as DuckDB fragments (shared by d38's corpus
  // report): per-language stopword-hit scores and the argmax CASE
  private val langScoreDefsSql: String = TextOps.langStopwords.map {
    case (l, sw) =>
      val list = sw.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($tokSql, x -> list_contains([$list], x))) AS s_$l"
  }.mkString(", ")
  private val langCaseSql: String = {
    val langs = TextOps.langStopwords
    val whens = langs.map { case (l, _) =>
      val others = langs.collect { case (o, _) if o != l =>
        s"s_$l >= s_$o" }.mkString(" AND ")
      s"WHEN s_$l > 0 AND $others THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  // ------------------------------------------------------- exact dedup
  private val d01: (String, QFn, Option[String]) = ("d01_exact_dedup",
    (s, d) => Dedup.exact(docs(s, d), "doc_id", md5(col("text"))),
    Some("""SELECT md5(text) AS fp, min(doc_id) AS keep_id,
      | count(*) AS dup_count
      |FROM documents GROUP BY md5(text)""".stripMargin))

  // ----------------------------------------------------- token counting
  private val d02: (String, QFn, Option[String]) = ("d02_token_counts",
    (s, d) => TextOps.withTokenCounts(docs(s, d), "text")
      .select(col("doc_id"), col("n_tokens_regex"), col("n_tokens_ws"),
        col("n_distinct_tokens")),
    Some(s"""SELECT doc_id, len($tokSql) AS n_tokens_regex,
      | len(list_filter(string_split(text, ' '), x -> len(x) > 0))
      |   AS n_tokens_ws,
      | len(list_distinct($tokSql)) AS n_distinct_tokens
      |FROM documents""".stripMargin))

  // ----------------------------------------------------- quality scoring
  private val d03: (String, QFn, Option[String]) = ("d03_quality_score",
    (s, d) => {
      val t = docs(s, d)
      t.select(col("doc_id") +:
        TextOps.qualityCols(col("text"), TextOps.tokens(col("text"))): _*)
    },
    Some {
      val stopList = TextOps.langStopwords.flatMap(_._2)
        .map(w => s"'$w'").mkString(", ")
      val t = tokSql
      val nToks = s"len($t)"
      val meanLen = s"CASE WHEN $nToks > 0 THEN " +
        s"list_sum(list_transform($t, x -> len(x))) / $nToks ELSE 0 END"
      val stopRatio = s"CASE WHEN $nToks > 0 THEN " +
        s"len(list_filter($t, x -> list_contains([$stopList], x))) / $nToks ELSE 0 END"
      val ttr = s"CASE WHEN $nToks > 0 THEN " +
        s"len(list_distinct($t)) / $nToks ELSE 0 END"
      val digitRatio = s"CASE WHEN length(text) > 0 THEN " +
        s"len(regexp_extract_all(text, '[0-9]')) / length(text) ELSE 0 END"
      s"""SELECT doc_id,
        | length(text)::BIGINT AS n_chars_calc,
        | len($t)::BIGINT AS n_tokens,
        | len(list_distinct($t))::BIGINT AS n_distinct_tokens,
        | round($meanLen, 6) AS mean_token_len,
        | round($stopRatio, 6) AS stopword_ratio,
        | round($ttr, 6) AS type_token_ratio,
        | round($digitRatio, 6) AS digit_ratio,
        | round(0.35 * ($ttr) + 0.35 * ($stopRatio)
        |   + 0.2 * (1.0 - ($digitRatio))
        |   + 0.1 * least(($meanLen) / 10.0, 1.0), 6) AS quality_score
        |FROM documents""".stripMargin
    })

  // --------------------------------------------------------- language ID
  private val d04: (String, QFn, Option[String]) = ("d04_lang_id",
    (s, d) => docs(s, d).select(col("doc_id"),
      TextOps.langId(TextOps.tokens(col("text"))).as("lang_pred")),
    Some(s"""WITH sc AS (SELECT doc_id, $langScoreDefsSql FROM documents)
      |SELECT doc_id, $langCaseSql AS lang_pred FROM sc""".stripMargin))

  // --------------------------------------------- n-gram Jaccard near-dup
  // Hot-shingle df-cutoff (maxPostings=50) mirrored in the oracle: a
  // shingle appearing in >50 docs carries no dedup signal but makes the
  // pair join quadratic in its posting list — the standard scale guard.
  private val d05: (String, QFn, Option[String]) = ("d05_ngram_jaccard",
    (s, d) => Dedup.jaccardPairs(docs(s, d), "doc_id", "text", n = 3,
      threshold = 0.2, maxPostings = 50),
    Some(s"""WITH $shCte,
      |shc AS (SELECT sh.* FROM sh JOIN (SELECT s FROM sh GROUP BY s
      |  HAVING count(*) <= 50) ok ON sh.s = ok.s),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
      |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      |  FROM shc x JOIN shc y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b, round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
      |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
      |WHERE round(i / (sa.n_sh + sb.n_sh - i), 6) >= 0.2""".stripMargin))

  // --------------------------------------------------------- MinHash+LSH
  private val MINHASH_K = 16
  private val MINHASH_BANDS = 4
  private val d06: (String, QFn, Option[String]) = ("d06_minhash_lsh",
    (s, d) => Dedup.minhashLsh(docs(s, d), "doc_id", "text", n = 3,
      k = MINHASH_K, bands = MINHASH_BANDS),
    Some(s"""WITH $shCte,
      |mh AS (SELECT doc_id, j,
      |    min(${md5HashSql("s || '#' || j")}) AS sig
      |  FROM sh, (SELECT unnest(range(0, $MINHASH_K)) AS j) js
      |  GROUP BY doc_id, j),
      |bk AS (SELECT doc_id, j // ${MINHASH_K / MINHASH_BANDS} AS band,
      |    md5(string_agg(sig::VARCHAR, ',' ORDER BY j)) AS bkey
      |  FROM mh GROUP BY doc_id, band),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
      |   AND x.doc_id < y.doc_id)
      |SELECT c.a, c.b,
      | round(sum(CASE WHEN ma.sig = mb.sig THEN 1 ELSE 0 END)
      |   / ${MINHASH_K.toDouble}, 6) AS est_jaccard
      |FROM cand c JOIN mh ma ON ma.doc_id = c.a
      | JOIN mh mb ON mb.doc_id = c.b AND mb.j = ma.j
      |GROUP BY c.a, c.b""".stripMargin))

  // ---------------------------------------- MinHash, production hash family
  // d06 with hashFamily = xxhash64 — the family a real deployment runs
  // (Dedup.scala:33: codegen'd, one pass, no hex round-trip; the md5-hex
  // conv() family exists only so DuckDB can replay signatures). DuckDB has
  // no xxhash64, so this registers WITHOUT an oracle (rows-only check);
  // its purpose is the BENCH row: d06 vs d49 in the same bench run is the
  // measured cost of oracle-parity hashing, i.e. what switching families
  // buys a production corpus run. Row count differs slightly from d06 —
  // different hash family, different band collisions — that is expected.
  private val d49: (String, QFn, Option[String]) = ("d49_minhash_xxhash",
    (s, d) => Dedup.minhashLsh(docs(s, d), "doc_id", "text", n = 3,
      k = MINHASH_K, bands = MINHASH_BANDS,
      hashFamily = Dedup.xxhashFamily),
    None)

  // ------------------------------------------------------------ SimHash
  private val SIMHASH_BITS = 60
  private val d07: (String, QFn, Option[String]) = ("d07_simhash",
    (s, d) => Dedup.simhash(docs(s, d), "doc_id", "text", SIMHASH_BITS)
      .select(col("doc").as("doc_id"), col("simhash")),
    Some {
      val bitSums = (0 until SIMHASH_BITS)
        .map(i => s"sum((hv >> $i) & 1) AS b$i").mkString(", ")
      val hash = (0 until SIMHASH_BITS)
        .map(i => s"CASE WHEN b$i * 2 > n THEN ${1L << i} ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest(list_distinct($tokSql)) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, ${md5HashSql("w || '#0'")} AS hv FROM tok),
        |agg AS (SELECT doc_id, count(*) AS n, $bitSums FROM h
        |  GROUP BY doc_id)
        |SELECT doc_id, ($hash)::BIGINT AS simhash FROM agg""".stripMargin
    })

  private val d08: (String, QFn, Option[String]) = ("d08_simhash_pairs",
    (s, d) => Dedup.simhashPairs(
      Dedup.simhash(docs(s, d), "doc_id", "text", SIMHASH_BITS),
      maxDist = 4, bits = SIMHASH_BITS),
    Some {
      val simhashSql = d07._3.get
      s"""WITH s AS ($simhashSql)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        | bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
        |FROM s x JOIN s y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 4""".stripMargin
    })

  // ------------------------------------------ end-to-end corpus dedup
  // Exact groups + LSH near-dup edges → connected components → one
  // representative per cluster. The fixpoint RESULT is deterministic
  // (components are well-defined), so the oracle reproduces it with a
  // recursive CTE over the same edge set: enumerate reachable labels,
  // take the minimum per doc.
  private val d10: (String, QFn, Option[String]) = ("d10_dedup_corpus",
    (s, d) => Dedup.dedupCorpus(docs(s, d), "doc_id", "text", n = 3,
      k = MINHASH_K, bands = MINHASH_BANDS, minEstJaccard = 0.5),
    Some(s"""WITH RECURSIVE $shCte,
      |mh AS (SELECT doc_id, j,
      |    min(${md5HashSql("s || '#' || j")}) AS sig
      |  FROM sh, (SELECT unnest(range(0, $MINHASH_K)) AS j) js
      |  GROUP BY doc_id, j),
      |bk AS (SELECT doc_id, j // ${MINHASH_K / MINHASH_BANDS} AS band,
      |    md5(string_agg(sig::VARCHAR, ',' ORDER BY j)) AS bkey
      |  FROM mh GROUP BY doc_id, band),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
      |   AND x.doc_id < y.doc_id),
      |near AS (SELECT a, b FROM (
      |  SELECT c.a, c.b,
      |   round(sum(CASE WHEN ma.sig = mb.sig THEN 1 ELSE 0 END)
      |     / ${MINHASH_K.toDouble}, 6) AS ej
      |  FROM cand c JOIN mh ma ON ma.doc_id = c.a
      |   JOIN mh mb ON mb.doc_id = c.b AND mb.j = ma.j
      |  GROUP BY c.a, c.b) WHERE ej >= 0.5),
      |exg AS (SELECT md5(text) AS fp, min(doc_id) AS keep_id
      |  FROM documents GROUP BY 1),
      |exp AS (SELECT d.doc_id AS doc, g.keep_id AS peer FROM documents d
      |  JOIN exg g ON md5(d.text) = g.fp WHERE d.doc_id <> g.keep_id),
      |edges AS (SELECT doc, peer FROM exp
      |  UNION SELECT peer, doc FROM exp
      |  UNION SELECT a, b FROM near
      |  UNION SELECT b, a FROM near),
      |cc(doc, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.doc, c.label FROM edges e JOIN cc c ON c.doc = e.peer)
      |SELECT doc, min(label) AS keep_id FROM cc GROUP BY doc"""
      .stripMargin))

  // ------------------------------------------------------ fingerprinting
  private val d09: (String, QFn, Option[String]) = ("d09_fingerprint",
    (s, d) => docs(s, d).select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp")),
    Some("""SELECT doc_id,
      | md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin))

  // ------------------------------------------------- brute-force cosine KNN
  private val e01: (String, QFn, Option[String]) = ("e01_knn_brute",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      Similarity.bruteKnn(e.filter(col("id") < 20), e, 5)
    },
    Some("""WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |scored AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
      |  round(list_dot_product(q.v, c.v)
      |    / (sqrt(list_dot_product(q.v, q.v))
      |       * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
      |  FROM q JOIN c ON q.vec_id <> c.vec_id),
      |ranked AS (SELECT qid, nid, sim, row_number() OVER
      |  (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM scored)
      |SELECT qid, nid, rank, sim FROM ranked WHERE rank <= 5"""
      .stripMargin))

  // -------------------------------------------- LSH-bucketed approximate NN
  // The hyperplanes are deterministic driver-side constants, so the oracle
  // gets them as literal arrays and replays the full pipeline: sign-bit
  // signature → band buckets → exact cosine rerank within candidates.
  private val LSH_DIMS = 64
  private val LSH_PLANES = 16
  private val LSH_BANDS = 4
  // shared by e02 (inline index) and e13 (the SAME pipeline through a
  // persisted parquet index — storage must not change a single bit)
  private lazy val lshKnnOracleSql: String = {
    val rows = LSH_PLANES / LSH_BANDS
    val mask = (1L << rows) - 1
    val sigExpr = (0 until LSH_PLANES).map { p =>
      val plane = Similarity.planeVector(p, LSH_DIMS)
        .map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM embeddings),
      |sigs AS (SELECT vec_id, v, ($sigExpr)::BIGINT AS sig FROM e),
      |banded AS (SELECT vec_id, v, band,
      |   (sig >> (band * $rows)) & $mask AS bits
      |  FROM sigs, (SELECT unnest(range(0, $LSH_BANDS)) AS band) b),
      |cand AS (SELECT DISTINCT q.vec_id AS qid, q.v AS qv,
      |   c.vec_id AS nid, c.v AS nv
      |  FROM banded q JOIN banded c
      |   ON q.band = c.band AND q.bits = c.bits AND q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 20),
      |scored AS (SELECT qid, nid,
      |   round(list_dot_product(qv, nv)
      |     / (sqrt(list_dot_product(qv, qv))
      |        * sqrt(list_dot_product(nv, nv))), 6) AS sim FROM cand),
      |ranked AS (SELECT qid, nid, sim, row_number() OVER
      |  (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM scored)
      |SELECT qid, nid, rank, sim FROM ranked WHERE rank <= 5"""
      .stripMargin
  }

  private val e02: (String, QFn, Option[String]) = ("e02_knn_lsh",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      Similarity.lshKnn(e.filter(col("id") < 20), e, 5,
        dims = LSH_DIMS, planes = LSH_PLANES, bands = LSH_BANDS)
    },
    Some(lshKnnOracleSql))

  // ------------------------------------------------ IVF approximate NN
  // Assignment ranks on rounded cosine with centroid-id tiebreak, so the
  // whole pipeline (centroid sample → inverted file → nProbe rerank) is
  // deterministic and the oracle replays it exactly.
  private val e04: (String, QFn, Option[String]) = ("e04_knn_ivf",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      Similarity.ivfKnn(e.filter(col("id") < 20), e, 5,
        nCentroids = 16, nProbe = 4)
    },
    Some {
      val cos = (a: String, b: String) =>
        s"""round(list_dot_product($a, $b)
           | / (sqrt(list_dot_product($a, $a))
           |    * sqrt(list_dot_product($b, $b))), 6)"""
          .stripMargin.replaceAll("\n", "")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |  ORDER BY vec_id LIMIT 16),
        |ca AS (SELECT e.vec_id, e.v, c.cid, ${cos("e.v", "c.cv")} AS cs
        |  FROM e, cents c),
        |corpusb AS (SELECT vec_id AS nid, v AS nv, cid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cs DESC, cid) AS r FROM ca) WHERE r = 1),
        |queryb AS (SELECT vec_id AS qid, v AS qv, cid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cs DESC, cid) AS r FROM ca WHERE vec_id < 20)
        |  WHERE r <= 4),
        |cand AS (SELECT DISTINCT qid, qv, nid, nv
        |  FROM queryb JOIN corpusb USING (cid) WHERE qid <> nid),
        |scored AS (SELECT qid, nid, ${cos("qv", "nv")} AS sim FROM cand),
        |ranked AS (SELECT qid, nid, sim, row_number() OVER
        |  (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM scored)
        |SELECT qid, nid, rank, sim FROM ranked WHERE rank <= 5"""
        .stripMargin
    })

  // ---------------------------------------- embedding-cosine near-dup
  // Vector-space dedup, registered in its SCALE form: LSH band equi-join
  // generates candidate pairs (same banding as e02_knn_lsh), exact cosine
  // verifies them — no corpus×corpus nested loop anywhere in the plan. The
  // oracle replays the banding with the same literal hyperplanes. The exact
  // all-pairs form survives as Similarity.cosineNearDupExact, cross-checked
  // against this plan by SimilarityNearDupSpec.
  private val e03: (String, QFn, Option[String]) = ("e03_cosine_neardup",
    (s, d) => Similarity.lshNearDupPairs(
      emb(s, d).select(col("vec_id").as("id"), col("embedding").as("vec")),
      0.5, dims = LSH_DIMS, planes = LSH_PLANES, bands = LSH_BANDS),
    Some {
      val rows = LSH_PLANES / LSH_BANDS
      val mask = (1L << rows) - 1
      val sigExpr = (0 until LSH_PLANES).map { p =>
        val plane = Similarity.planeVector(p, LSH_DIMS)
          .map(_.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |sigs AS (SELECT vec_id, v, ($sigExpr)::BIGINT AS sig FROM e),
        |banded AS (SELECT vec_id, v, band,
        |   (sig >> (band * $rows)) & $mask AS bits
        |  FROM sigs, (SELECT unnest(range(0, $LSH_BANDS)) AS band) b),
        |cand AS (SELECT DISTINCT x.vec_id AS a, x.v AS va,
        |   y.vec_id AS b, y.v AS vb
        |  FROM banded x JOIN banded y
        |   ON x.band = y.band AND x.bits = y.bits AND x.vec_id < y.vec_id),
        |scored AS (SELECT a, b,
        |   round(list_dot_product(va, vb)
        |     / (sqrt(list_dot_product(va, va))
        |        * sqrt(list_dot_product(vb, vb))), 6) AS sim FROM cand)
        |SELECT a, b, sim FROM scored WHERE sim >= 0.5""".stripMargin
    })

  // ------------------------------------------------- multimodal plumbing
  private val m01: (String, QFn, Option[String]) = ("m01_binary_meta",
    (s, d) => Multimodal.withPayloadMeta(
      docs(s, d).withColumn("payload", col("text").cast("binary")), "payload")
      .select(col("doc_id"), col("n_bytes"), col("digest")),
    Some("""SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
      | md5(text) AS digest FROM documents""".stripMargin))

  // Stubbed decode + frame sampling through the per-partition batch path
  // (typed-Dataset mapPartitions with amortized per-partition decoder init).
  // The stand-in decoder is md5-derived ON PURPOSE: DuckDB replays it
  // exactly, so the whole mapPartitions stage is hash-checked, and the
  // outputs are SCALAR columns (array cells crash the driver's checker).
  private val m02: (String, QFn, Option[String]) = ("m02_decode_stub",
    (s, d) => {
      val withPayload = docs(s, d)
        .withColumn("payload", col("text").cast("binary"))
      val feats = Multimodal.decodeBatched(withPayload, "doc_id", "payload")
      val frames = docs(s, d).select(
        col("doc_id") +: Multimodal.frameSampleMd5(col("text"), 4): _*)
      feats.join(frames, Seq("doc_id"))
    },
    Some {
      def res(hexExpr: String, m: Int) =
        s"(('0x'||substr($hexExpr,1,15))::BIGINT % $m)::DOUBLE"
      val frs = (0 until 4).map { i =>
        val off = s"floor($i * (length(text) - 1) / 3.0)::BIGINT + 1"
        s"""CASE WHEN length(text) > 0
           | THEN ${res(s"md5(substr(text, $off, 1))", 251)}
           | ELSE 0.0 END AS fr$i""".stripMargin
      }.mkString(", ")
      s"""SELECT doc_id,
        | octet_length(encode(text)) / 1024.0 AS f0,
        | ${res("md5(text)", 997)} AS f1,
        | ${res("md5(text)", 251)} AS f2,
        | ${res("md5(text)", 127)} AS f3,
        | $frs
        |FROM documents""".stripMargin
    })

  // ------------------------------------------- token-budget packing
  // LLM-training sequence packing: per shard, consecutive documents (by
  // doc_id) accumulate until the running token total crosses the budget;
  // pack_id = floor((cumsum - 1) / budget). The streaming-greedy shape
  // that fills fixed-length context windows — one window per shard, no
  // driver participation, oracle = the same window SQL.
  private val d11: (String, QFn, Option[String]) = ("d11_pack_budget",
    (s, d) => {
      val t = docs(s, d)
        .withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("long"))
        .withColumn("shard", (col("doc_id") % 8).cast("long"))
      Sequences.packByBudget(t, Seq("shard"), Seq(col("doc_id")),
          col("n_tok"), 256)
        .select(col("doc_id"), col("shard"), col("n_tok"), col("pack_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
      |  len($tokSql)::BIGINT AS n_tok FROM documents)
      |SELECT doc_id, shard, n_tok,
      | ((sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) - 1) // 256)::BIGINT AS pack_id
      |FROM t""".stripMargin))

  // ------------------------------------------- repetition filtering
  // Gopher-style repetition metrics (top unigram/bigram fraction,
  // duplicate-token fraction) + keep flag. Pure projection — the keep
  // decision compares UNROUNDED int/int ratios (exact in any engine).
  private val d12: (String, QFn, Option[String]) = ("d12_repetition",
    (s, d) => TextOps.repetitionStats(docs(s, d), "doc_id", col("text")),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |uni AS (SELECT doc_id, max(c) AS topu FROM (
      |  SELECT doc_id, t, count(*) AS c FROM (
      |    SELECT doc_id, unnest(w) AS t FROM toks) GROUP BY 1, 2)
      |  GROUP BY 1),
      |big AS (SELECT doc_id, max(c) AS topb FROM (
      |  SELECT doc_id, s, count(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w), 1)),
      |      i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS s
      |    FROM toks) GROUP BY 1, 2) GROUP BY 1),
      |m AS (SELECT t.doc_id, len(w)::BIGINT AS n,
      |  len(list_distinct(w))::BIGINT AS nd,
      |  coalesce(topu, 0)::BIGINT AS topu, coalesce(topb, 0)::BIGINT AS topb,
      |  greatest(len(w) - 1, 0)::BIGINT AS nb
      |  FROM toks t LEFT JOIN uni USING (doc_id) LEFT JOIN big USING (doc_id)),
      |f AS (SELECT doc_id, n, topu, topb,
      |  CASE WHEN n > 0 THEN topu::DOUBLE / n::DOUBLE ELSE 0 END AS fu,
      |  CASE WHEN nb > 0 THEN topb::DOUBLE / nb::DOUBLE ELSE 0 END AS fb,
      |  CASE WHEN n > 0 THEN 1.0::DOUBLE - nd::DOUBLE / n::DOUBLE
      |    ELSE 0 END AS fd FROM m)
      |SELECT doc_id, n AS n_tokens, topu AS top_token_count,
      | topb AS top_bigram_count, round(fu, 6) AS top_token_frac,
      | round(fb, 6) AS top_bigram_frac, round(fd, 6) AS dup_token_frac,
      | (fu <= 0.12 AND fb <= 0.10 AND fd <= 0.6)::BIGINT AS keep_repetition
      |FROM f""".stripMargin))

  // --------------------------------------------- rule-based quality filter
  // C4-style ordered reject rules with first-fail reason ('ok' = keep).
  // Stopword rule is C4-directional: reject docs LACKING stopwords.
  private val d13: (String, QFn, Option[String]) = ("d13_rule_filter",
    (s, d) => docs(s, d).select(col("doc_id") +:
      TextOps.ruleFilterCols(col("text"), TextOps.tokens(col("text"))): _*),
    Some {
      val stopList = TextOps.langStopwords.flatMap(_._2)
        .map(w => s"'$w'").mkString(", ")
      s"""WITH m AS (SELECT doc_id, len($tokSql)::BIGINT AS n,
        | CASE WHEN len($tokSql) > 0 THEN
        |   list_sum(list_transform($tokSql, x -> len(x)))::DOUBLE
        |     / len($tokSql)::DOUBLE ELSE 0 END AS mtl,
        | CASE WHEN len($tokSql) > 0 THEN
        |   len(list_filter($tokSql, x -> list_contains([$stopList], x)))::DOUBLE
        |     / len($tokSql)::DOUBLE ELSE 0 END AS sr,
        | CASE WHEN len($tokSql) > 0 THEN
        |   len(list_distinct($tokSql))::DOUBLE / len($tokSql)::DOUBLE
        |   ELSE 0 END AS ttr,
        | CASE WHEN length(text) > 0 THEN
        |   len(regexp_extract_all(text, '[0-9]'))::DOUBLE
        |     / length(text)::DOUBLE ELSE 0 END AS dr
        | FROM documents),
        |r AS (SELECT *, CASE WHEN n < 20 THEN 'too_short'
        |  WHEN n > 1000 THEN 'too_long'
        |  WHEN mtl < 3.0 OR mtl > 10.0 THEN 'token_len'
        |  WHEN dr > 0.2 THEN 'digit'
        |  WHEN sr < 0.01 THEN 'stopword'
        |  WHEN ttr < 0.35 THEN 'repetition'
        |  ELSE 'ok' END AS reject_reason FROM m)
        |SELECT doc_id, n AS n_tokens, round(mtl, 6) AS mean_token_len,
        | round(sr, 6) AS stopword_ratio, round(ttr, 6) AS type_token_ratio,
        | reject_reason, (reject_reason = 'ok')::BIGINT AS keep
        |FROM r""".stripMargin
    })

  // ------------------------------------------- benchmark decontamination
  // Train docs sharing any word 4-gram with the eval slice (doc_id % 25 = 0)
  // are flagged — the test-set-leakage guard. Eval n-gram set is broadcast
  // (benchmarks are KBs, corpora are TBs).
  private val d14: (String, QFn, Option[String]) = ("d14_decontaminate",
    (s, d) => Dedup.decontaminate(docs(s, d), "doc_id", "text", n = 4,
        isEval = col("doc_id") % 25 === 0)
      .select(col("doc").as("doc_id"), col("n_overlap"), col("contaminated")),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
      |  unnest(list_transform(range(1, greatest(len(w) - 2, 1)),
      |    i -> array_to_string(list_slice(w, i, i + 3), ' '))) AS s
      |  FROM toks)),
      |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 25 = 0),
      |hit AS (SELECT doc_id, count(*) AS n_overlap FROM sh JOIN ev USING (s)
      |  WHERE doc_id % 25 <> 0 GROUP BY 1)
      |SELECT d.doc_id, coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
      | (coalesce(h.n_overlap, 0) > 0)::BIGINT AS contaminated
      |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 25 <> 0""".stripMargin))

  // ----------------------------------------------- domain-mix sampling
  // Deterministic re-weighting toward a target source mix: keep rate per
  // source = frac × targetShare / actualShare (target ∝ 1 + srcnum % 3),
  // membership via content-addressed md5 uniform — bit-replayable.
  private val d15: (String, QFn, Option[String]) = ("d15_domain_mix",
    (s, d) => Sampling.domainMix(
        docs(s, d).select(col("doc_id"), col("source")),
        key = col("doc_id"), domain = col("source"),
        // digit-free sources: regexp_extract yields "" → null after cast;
        // coalesce to 0 so the domain gets weight 1 instead of silently
        // vanishing (and the oracle's try_cast mirrors it, where a plain
        // ''::BIGINT would abort the whole DuckDB query)
        weightOf = dom => lit(1) +
          coalesce(regexp_extract(dom, "[0-9]+", 0).cast("long"), lit(0L)) % 3,
        frac = 0.6)
      .select(col("doc_id"), col("source"), col("rate")),
    Some("""WITH c AS (SELECT source, count(*)::BIGINT AS cnt,
      |  (1 + (coalesce(try_cast(regexp_extract(source, '[0-9]+') AS BIGINT),
      |                 0) % 3))::DOUBLE AS w
      |  FROM documents GROUP BY source),
      |t AS (SELECT sum(cnt)::DOUBLE AS total, sum(w) AS sumw FROM c),
      |r AS (SELECT source, least(1.0::DOUBLE,
      |  round(0.6::DOUBLE * w * total / (sumw * cnt::DOUBLE), 6)) AS rate
      |  FROM c, t)
      |SELECT d.doc_id, d.source, r.rate
      |FROM documents d JOIN r USING (source)
      |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || '#mix'), 1, 15))::BIGINT
      |  / 1152921504606846976.0 < r.rate""".stripMargin))

  // ------------------------------------------------------ PII scrub
  // Email + long-digit-run detection/redaction. The redacted text is
  // compared by digest (scrubbed corpora are TB-sized; digests are 32B).
  // Patterns are RE2-safe so the oracle replays them verbatim.
  private val d16: (String, QFn, Option[String]) = ("d16_pii_redact",
    (s, d) => docs(s, d).select(col("doc_id") +:
      TextOps.piiCols(col("text")): _*),
    Some {
      val em = TextOps.emailPattern // backslash survives the SQL literal
      val dr = TextOps.digitRunPattern
      s"""WITH t AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '$em'))::BIGINT AS n_emails,
        |  regexp_replace(text, '$em', '<EMAIL>', 'g') AS er
        |  FROM documents)
        |SELECT doc_id, n_emails,
        | len(regexp_extract_all(er, '$dr'))::BIGINT AS n_digit_runs,
        | (n_emails = 0
        |  AND len(regexp_extract_all(er, '$dr')) = 0)::BIGINT AS pii_free,
        | md5(regexp_replace(er, '$dr', '<ID>', 'g')) AS redacted_digest
        |FROM t""".stripMargin
    })

  // ------------------------------------------------ token chunking
  // Overlapping context windows (size 64, stride 48) — the sequence-prep
  // step between curation and tokenized training shards. Rows ≈ n/stride
  // per doc; chunk text travels as a digest.
  private val d17: (String, QFn, Option[String]) = ("d17_chunking",
    (s, d) => docs(s, d)
      .select(col("doc_id"),
        explode(TextOps.chunkCols(TextOps.tokens(col("text")), 64, 48))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_chunk_tokens"),
        col("c.chunk_digest")),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |c AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, 48)) AS s
      |  FROM toks)
      |SELECT doc_id, ((s - 1) // 48)::BIGINT AS chunk_id,
      | len(list_slice(w, s, s + 63))::BIGINT AS n_chunk_tokens,
      | md5(array_to_string(list_slice(w, s, s + 63), ' ')) AS chunk_digest
      |FROM c""".stripMargin))

  // ------------------------------------------- token-entropy scoring
  // Unigram Shannon entropy + length-normalized ratio. Spark computes
  // Σ c·log2(c) in ONE sorted-run aggregate pass per row (no per-doc
  // group-by); the oracle takes the classic unnest → count route.
  private val d18: (String, QFn, Option[String]) = ("d18_token_entropy",
    (s, d) => docs(s, d).select(col("doc_id") +:
      TextOps.entropyCols(TextOps.tokens(col("text"))): _*),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |u AS (SELECT doc_id, unnest(w) AS t FROM toks),
      |cnt AS (SELECT doc_id, t, count(*)::DOUBLE AS c FROM u GROUP BY 1, 2),
      |s AS (SELECT doc_id, sum(c * log2(c)) AS sl, sum(c) AS n
      |  FROM cnt GROUP BY 1)
      |SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
      | CASE WHEN s.n > 0 THEN round(log2(s.n) - sl / s.n, 6)
      |   ELSE 0.0 END AS token_entropy,
      | CASE WHEN s.n > 1 THEN round((log2(s.n) - sl / s.n) / log2(s.n), 6)
      |   ELSE 0.0 END AS entropy_ratio
      |FROM toks t LEFT JOIN s USING (doc_id)""".stripMargin))

  // --------------------------------------------- KMV distinct sketch
  // Distinct users per event_type, estimated from the k smallest 60-bit
  // md5 hashes (integer ranking → exact cross-engine selection; the lone
  // division is round-6). n_exact kept alongside for error inspection.
  private val d19: (String, QFn, Option[String]) = ("d19_kmv_sketch",
    (s, d) => Sketches.kmvDistinct(Tables.events(s, d),
        col("event_type"), col("user_id"), k = 64)
      .select(col("grp").as("event_type"), col("n_exact"),
        col("est_distinct")),
    Some(s"""WITH h AS (SELECT DISTINCT event_type,
      |  ('0x'||substr(md5(user_id::VARCHAR||'#kmv'),1,15))::BIGINT AS h
      |  FROM events),
      |r AS (SELECT event_type, h,
      |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h),
      |sk AS (SELECT event_type, count(*)::BIGINT AS m, max(h) AS hk
      |  FROM r WHERE rn <= 64 GROUP BY 1),
      |ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
      |  FROM events GROUP BY 1)
      |SELECT ex.event_type, ex.n_exact,
      | round(CASE WHEN sk.m >= 64
      |   THEN 63.0 * 1152921504606846976.0 / sk.hk::DOUBLE
      |   ELSE sk.m::DOUBLE END, 6) AS est_distinct
      |FROM ex JOIN sk USING (event_type)""".stripMargin))

  // ------------------------------------------ weighted priority sample
  // Per-source weighted top-k sample: longer docs carry weight 1..3 and
  // are proportionally likelier to survive. Integer-only ranking
  // (h·6 div w) — no float boundary can flip the kept set.
  private val d20: (String, QFn, Option[String]) = ("d20_weighted_sample",
    (s, d) => Sampling.prioritySample(
        docs(s, d).select(col("doc_id"), col("source"), col("n_chars")),
        group = col("source"), key = col("doc_id"),
        weight = least(lit(3L), lit(1L) + expr("n_chars div 500")),
        lcm = 6, k = 20)
      .select(col("doc_id"), col("source"), col("_w").as("w"),
        col("priority")),
    Some("""WITH t AS (SELECT doc_id, source,
      |  least(3, 1 + n_chars // 500)::BIGINT AS w,
      |  ('0x'||substr(md5(doc_id::VARCHAR||'#wps'),1,15))::BIGINT AS h
      |  FROM documents),
      |p AS (SELECT doc_id, source, w, (h * 6) // w AS priority,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY (h * 6) // w, doc_id) AS rn FROM t)
      |SELECT doc_id, source, w, priority FROM p WHERE rn <= 20"""
      .stripMargin))

  // ----------------------------------------------------------- TF-IDF
  // Corpus-level term weighting: exact tf/df counts, one ln in the value
  // (round-6), df table joined SHUFFLED on term (vocabulary-sized at
  // corpus scale — deliberately not broadcast).
  private val d21: (String, QFn, Option[String]) = ("d21_tfidf",
    (s, d) => TextOps.tfidf(docs(s, d), "doc_id",
      TextOps.tokens(col("text"))),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |t AS (SELECT doc_id, unnest(w) AS term FROM toks),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
      |  FROM t GROUP BY 1, 2),
      |dfq AS (SELECT term, count(*)::BIGINT AS df_count FROM tf GROUP BY 1),
      |n AS (SELECT count(*)::DOUBLE AS nd FROM documents)
      |SELECT tf.doc_id, tf.term, tf.tf, dfq.df_count,
      | round(tf.tf * (ln((nd + 1.0) / (df_count::DOUBLE + 1.0)) + 1.0), 6)
      |   AS tfidf
      |FROM tf JOIN dfq USING (term), n""".stripMargin))

  // --------------------------------------------- incremental dedup
  // Continuous-curation shape: docs with doc_id % 10 = 7 arrive as the
  // NEW batch; the rest are the standing corpus, reduced to a distinct
  // digest index. Anti-join on the 16-byte fp at corpus scale; the
  // batch-internal first-wins window runs over the batch only.
  private val d22: (String, QFn, Option[String]) = ("d22_incremental_dedup",
    (s, d) => Dedup.incrementalDedup(docs(s, d), "doc_id",
      TextOps.fingerprint(col("text")), col("doc_id") % 10 === 7),
    Some("""WITH f AS (SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
      |    AS fp,
      |  (doc_id % 10 = 7) AS isnew FROM documents),
      |c AS (SELECT DISTINCT fp FROM f WHERE NOT isnew),
      |b AS (SELECT doc_id, fp,
      |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM f WHERE isnew)
      |SELECT b.doc_id AS doc, b.fp,
      | CASE WHEN c.fp IS NOT NULL THEN 'dup_corpus'
      |      WHEN b.rn > 1 THEN 'dup_batch'
      |      ELSE 'new' END AS reason,
      | (CASE WHEN c.fp IS NOT NULL THEN 'dup_corpus'
      |       WHEN b.rn > 1 THEN 'dup_batch'
      |       ELSE 'new' END = 'new')::BIGINT AS admitted
      |FROM b LEFT JOIN c USING (fp)""".stripMargin))

  // ------------------------------------------------- semantic dedup
  // SemDeDup shape: centroid bucketing caps the pairwise-cosine term at
  // bucket size; a vector is dropped when an earlier same-bucket member is
  // 0.3-similar. Same deterministic assignment policy as e04.
  private val e05: (String, QFn, Option[String]) = ("e05_semantic_dedup",
    (s, d) => Similarity.semanticDedup(
        emb(s, d).select(col("vec_id").as("id"), col("embedding").as("vec")),
        threshold = 0.3, nCentroids = 16)
      .select(col("id").as("vec_id"), col("cid"), col("keep")),
    Some {
      val cos = (a: String, b: String) =>
        s"""round(list_dot_product($a, $b)
           | / (sqrt(list_dot_product($a, $a))
           |    * sqrt(list_dot_product($b, $b))), 6)"""
          .stripMargin.replaceAll("\n", "")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |  ORDER BY vec_id LIMIT 16),
        |ca AS (SELECT e.vec_id, e.v, c.cid, ${cos("e.v", "c.cv")} AS cs
        |  FROM e, cents c),
        |asg AS (SELECT vec_id, v, cid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cs DESC, cid) AS r FROM ca) WHERE r = 1),
        |drp AS (SELECT DISTINCT y.vec_id FROM asg x JOIN asg y
        |  ON x.cid = y.cid AND x.vec_id < y.vec_id
        |  WHERE ${cos("x.v", "y.v")} >= 0.3)
        |SELECT a.vec_id, a.cid,
        | (d.vec_id IS NULL)::BIGINT AS keep
        |FROM asg a LEFT JOIN drp d USING (vec_id)""".stripMargin
    })

  // ------------------------------------------------- BM25 relevance
  // Okapi/Lucene BM25 of every document against a fixed query bag —
  // the seed-set mining primitive. Corpus stats (N, avgdl, per-term df)
  // are ONE 1-row aggregate broadcast to a map-side scoring projection.
  // The oracle spells the literals as the same arithmetic ((1.2 + 1.0),
  // (1 - 0.75)) so both engines run the identical double expression.
  private val bm25Terms = Seq("spark", "join", "data")
  private val d23: (String, QFn, Option[String]) = ("d23_bm25",
    (s, d) => Relevance.bm25(docs(s, d), "doc_id", "text", bm25Terms),
    Some {
      val tfs = bm25Terms.indices.map(i =>
        s"len(list_filter(w, x -> x = '${bm25Terms(i)}'))::DOUBLE AS tf$i")
        .mkString(", ")
      val dfs = bm25Terms.indices.map(i =>
        s"sum((tf$i > 0)::INT)::DOUBLE AS df$i").mkString(", ")
      val score = bm25Terms.indices.map(i =>
        s"""ln(1.0 + (nd - df$i + 0.5) / (df$i + 0.5)) * tf$i * (1.2 + 1.0)
           | / (tf$i + 1.2 * ((1 - 0.75) + 0.75 * n / avgdl))"""
          .stripMargin.replaceAll("\n", "")).mkString(" + ")
      s"""WITH t AS (SELECT doc_id, $tokSql AS w FROM documents),
        |p AS (SELECT doc_id, len(w)::DOUBLE AS n, $tfs FROM t),
        |s AS (SELECT count(*)::DOUBLE AS nd, avg(n) AS avgdl, $dfs FROM p)
        |SELECT doc_id, n::BIGINT AS n_tokens, round($score, 6) AS bm25
        |FROM p, s""".stripMargin
    })

  // ------------------------------------------------- rank fusion
  // Reciprocal-rank fusion of two top-100 rankings: BM25 (rounded score)
  // and raw query-term hit count. Each list is a TakeOrdered top-k —
  // never a global-sort single-partition window over the corpus — so the
  // fusion aggregate sees 2k rows regardless of corpus size.
  private val d24: (String, QFn, Option[String]) = ("d24_rrf_fusion",
    (s, d) => {
      val terms = bm25Terms
      val byBm25 = Relevance.topKRanks(
        Relevance.bm25(docs(s, d), "doc_id", "text", terms),
        "bm25", "doc_id", 100)
      val hits = docs(s, d).select(col("doc_id"),
        size(filter(TextOps.tokens(col("text")),
          x => x.isin(terms.map(lit): _*).cast("boolean")))
          .cast("double").as("hits"))
      val byHits = Relevance.topKRanks(hits, "hits", "doc_id", 100)
      Relevance.rrfFuse(Seq(byBm25, byHits), "doc_id", "rank")
    },
    Some {
      val terms = bm25Terms
      val tfs = terms.indices.map(i =>
        s"len(list_filter(w, x -> x = '${terms(i)}'))::DOUBLE AS tf$i")
        .mkString(", ")
      val dfs = terms.indices.map(i =>
        s"sum((tf$i > 0)::INT)::DOUBLE AS df$i").mkString(", ")
      val score = terms.indices.map(i =>
        s"""ln(1.0 + (nd - df$i + 0.5) / (df$i + 0.5)) * tf$i * (1.2 + 1.0)
           | / (tf$i + 1.2 * ((1 - 0.75) + 0.75 * n / avgdl))"""
          .stripMargin.replaceAll("\n", "")).mkString(" + ")
      val list = terms.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $tokSql AS w FROM documents),
        |p AS (SELECT doc_id, len(w)::DOUBLE AS n, $tfs,
        |  len(list_filter(w, x -> list_contains([$list], x)))::DOUBLE
        |    AS hits FROM t),
        |s AS (SELECT count(*)::DOUBLE AS nd, avg(n) AS avgdl, $dfs FROM p),
        |b AS (SELECT doc_id, round($score, 6) AS sc, hits FROM p, s),
        |ra AS (SELECT doc_id, row_number()
        |    OVER (ORDER BY sc DESC, doc_id ASC) AS r
        |  FROM (SELECT * FROM b ORDER BY sc DESC, doc_id ASC LIMIT 100)),
        |rb AS (SELECT doc_id, row_number()
        |    OVER (ORDER BY hits DESC, doc_id ASC) AS r
        |  FROM (SELECT * FROM b ORDER BY hits DESC, doc_id ASC LIMIT 100)),
        |u AS (SELECT doc_id, 1.0::DOUBLE / (60.0 + r::DOUBLE) AS c FROM ra
        |  UNION ALL
        |  SELECT doc_id, 1.0::DOUBLE / (60.0 + r::DOUBLE) AS c FROM rb)
        |SELECT doc_id, round(sum(c), 6) AS rrf_score,
        | count(*) AS n_lists
        |FROM u GROUP BY doc_id""".stripMargin
    })

  // ------------------------------------------------- vocabulary top-k
  // Corpus-wide term frequencies, top 500 — the vocab/BPE-seed builder.
  // One shuffle (term counts with map-side combine), then TakeOrdered
  // top-k: per-partition top-500 + a 500-row merge, never a global sort
  // or a single-partition window over the vocabulary.
  private val d25: (String, QFn, Option[String]) = ("d25_vocab_topk",
    (s, d) => {
      val counts = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      Relevance.topKRanks(counts, "cnt", "term", 500)
        .withColumn("rank", col("rank").cast("long"))
    },
    Some(s"""WITH t AS (SELECT unnest($tokSql) AS term FROM documents),
      |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1)
      |SELECT term, cnt,
      | row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
      |FROM c ORDER BY cnt DESC, term ASC LIMIT 500""".stripMargin))

  // --------------------------------------------- unigram LM surprisal
  // Mean per-token surprisal −log2 p(t) under the corpus's own unigram
  // LM — the deterministic stand-in for perplexity-based quality
  // filtering (CCNet-style: implausibly low/high surprisal → machine
  // text / noise). LM table is vocabulary-sized: joined SHUFFLED on term
  // (same policy as d21 TF-IDF — never collected; AQE may broadcast a
  // small vocab on its own), total count rides as a 1-row broadcast.
  private val d26: (String, QFn, Option[String]) = ("d26_unigram_surprisal",
    (s, d) => {
      val toks = docs(s, d).select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      val lm = toks.groupBy(col("term")).agg(count(lit(1)).as("tc"))
      val tot = lm.agg(sum(col("tc")).cast("double").as("_tot"))
      toks.join(lm, Seq("term"))
        .crossJoin(broadcast(tot))
        .withColumn("_nll", log2(col("_tot") / col("tc").cast("double")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(col("_nll")), 6).as("mean_surprisal"))
    },
    Some(s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS term
      |  FROM documents),
      |lm AS (SELECT term, count(*) AS tc FROM t GROUP BY 1),
      |tot AS (SELECT sum(tc)::DOUBLE AS tt FROM lm)
      |SELECT doc_id, count(*) AS n_tokens,
      | round(avg(log2(tt / tc::DOUBLE)), 6) AS mean_surprisal
      |FROM t JOIN lm USING (term), tot
      |GROUP BY doc_id""".stripMargin))

  // --------------------------------------------- shingle containment
  // Asymmetric containment |A∩B|/|A| over the same posting-list join as
  // d05 — catches a short doc wholly quoted inside a longer one, which
  // symmetric Jaccard dilutes away. Integer intersection counts; the two
  // ratios are the only floats.
  private val d27: (String, QFn, Option[String]) = ("d27_containment",
    (s, d) => Dedup.containmentPairs(docs(s, d), "doc_id", "text", n = 3,
      threshold = 0.5, maxPostings = 50),
    Some(s"""WITH $shCte,
      |shc AS (SELECT sh.* FROM sh JOIN (SELECT s FROM sh GROUP BY s
      |  HAVING count(*) <= 50) ok ON sh.s = ok.s),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
      |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      |  FROM shc x JOIN shc y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b, round(i / sa.n_sh, 6) AS cont_a_in_b,
      | round(i / sb.n_sh, 6) AS cont_b_in_a
      |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
      |WHERE round(i / sa.n_sh, 6) >= 0.5
      |   OR round(i / sb.n_sh, 6) >= 0.5""".stripMargin))

  // --------------------------------------------- PMI collocations
  // Pointwise mutual information of adjacent token pairs vs their unigram
  // marginals — phrase mining over the corpus. Bigram/unigram count
  // tables are vocabulary-sized (shuffled joins on the word keys; totals
  // are 1-row broadcasts); the final ranking is a TakeOrdered top-200.
  private val d28: (String, QFn, Option[String]) = ("d28_pmi_collocations",
    (s, d) => {
      val toks = docs(s, d).select(col("doc_id"),
        TextOps.tokens(col("text")).as("w"))
      val uni = toks.select(explode(col("w")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("cu"))
      val big = toks.select(explode(TextOps.shingles(col("w"), 2)).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      val totU = uni.agg(sum(col("cu")).cast("double").as("_tu"))
      val totB = big.agg(sum(col("cb")).cast("double").as("_tb"))
      val scored = big.filter(col("cb") >= 5)
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
        .join(uni.select(col("t").as("w1"), col("cu").as("c1")), Seq("w1"))
        .join(uni.select(col("t").as("w2"), col("cu").as("c2")), Seq("w2"))
        .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
        .withColumn("pmi", round(log2(
          (col("cb").cast("double") / col("_tb")) /
            ((col("c1").cast("double") / col("_tu")) *
              (col("c2").cast("double") / col("_tu")))), 6))
        .select(col("bg"), col("cb"), col("pmi"))
      Relevance.topKRanks(scored, "pmi", "bg", 200)
        .withColumn("rank", col("rank").cast("long"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS w FROM documents),
      |uc AS (SELECT t, count(*) AS cu FROM (SELECT unnest(w) AS t FROM t)
      |  GROUP BY 1),
      |bc AS (SELECT bg, count(*) AS cb FROM (SELECT
      |    unnest(list_transform(range(1, greatest(len(w), 1)),
      |      i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS bg
      |  FROM t) GROUP BY 1),
      |tu AS (SELECT sum(cu)::DOUBLE AS tu FROM uc),
      |tb AS (SELECT sum(cb)::DOUBLE AS tb FROM bc),
      |p AS (SELECT bg, cb, round(log2((cb::DOUBLE / tb)
      |    / ((c1.cu::DOUBLE / tu) * (c2.cu::DOUBLE / tu))), 6) AS pmi
      |  FROM bc JOIN uc c1 ON string_split(bg, ' ')[1] = c1.t
      |    JOIN uc c2 ON string_split(bg, ' ')[2] = c2.t, tu, tb
      |  WHERE cb >= 5)
      |SELECT bg, cb, pmi,
      | row_number() OVER (ORDER BY pmi DESC, bg ASC) AS rank
      |FROM p ORDER BY pmi DESC, bg ASC LIMIT 200""".stripMargin))

  // --------------------------------------------- per-source KL drift
  // KL(source token distribution ‖ corpus distribution) in bits — the
  // domain-shift score deciding whether a source needs its own mixing
  // weight. Count tables are integer and vocabulary-sized; only the final
  // Σ p·log2(p/q) is float (round 6; accumulation noise ~1e-13).
  private val d29: (String, QFn, Option[String]) = ("d29_source_kl",
    (s, d) => {
      val toks = docs(s, d).select(col("source"),
        explode(TextOps.tokens(col("text"))).as("tk"))
      val sc = toks.groupBy(col("source"), col("tk"))
        .agg(count(lit(1)).as("cs"))
      val cc = toks.groupBy(col("tk")).agg(count(lit(1)).as("cc2"))
      val ns = sc.groupBy(col("source")).agg(sum(col("cs")).as("ns"))
      val nc = toks.agg(count(lit(1)).as("nc"))
      val ps = col("cs").cast("double") / col("ns").cast("double")
      val pc = col("cc2").cast("double") / col("nc").cast("double")
      sc.join(cc, Seq("tk")).join(ns, Seq("source"))
        .crossJoin(broadcast(nc))
        .groupBy(col("source"), col("ns"))
        .agg(round(sum(ps * log2(ps / pc)), 6).as("kl_bits"))
        .select(col("source"), col("ns").as("n_tokens"), col("kl_bits"))
    },
    Some(s"""WITH t AS (SELECT source, unnest($tokSql) AS tk
      |  FROM documents),
      |sc AS (SELECT source, tk, count(*) AS cs FROM t GROUP BY 1, 2),
      |cc AS (SELECT tk, count(*) AS cc2 FROM t GROUP BY 1),
      |ns AS (SELECT source, sum(cs)::BIGINT AS ns FROM sc GROUP BY 1),
      |nc AS (SELECT count(*)::BIGINT AS nc FROM t)
      |SELECT source, ns AS n_tokens,
      | round(sum((cs::DOUBLE / ns::DOUBLE)
      |   * log2((cs::DOUBLE / ns::DOUBLE) / (cc2::DOUBLE / nc::DOUBLE))), 6)
      |   AS kl_bits
      |FROM sc JOIN cc USING (tk) JOIN ns USING (source), nc
      |GROUP BY source, ns""".stripMargin))

  // --------------------------------------------- duplicated-span fraction
  // Per-doc fraction of n-gram OCCURRENCES whose n-gram appears in >= 2
  // distinct docs — the linear-cost proxy for suffix-array substring dedup
  // (Lee et al. 2022), used to cut boilerplate/mirror text. No pair join:
  // the only shuffles are the df table build and the occurrence probe.
  private val d30: (String, QFn, Option[String]) = ("d30_dup_spans",
    (s, d) => Dedup.dupSpans(docs(s, d), "doc_id", "text", n = 3)
      .withColumnRenamed("doc", "doc_id"),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |occ AS (SELECT doc_id,
      |  unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
      |    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
      |  FROM toks),
      |dfq AS (SELECT s, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, s FROM occ) GROUP BY s),
      |per AS (SELECT doc_id, count(*) AS n_spans,
      |  sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS dup_spans
      |  FROM occ JOIN dfq USING (s) GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(n_spans, 0)::BIGINT AS n_spans,
      | COALESCE(dup_spans, 0)::BIGINT AS dup_spans,
      | round(COALESCE(dup_spans::DOUBLE / n_spans::DOUBLE, 0.0), 6)
      |   AS dup_frac
      |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin))

  // --------------------------------------- per-source quality calibration
  // percent_rank / cume_dist of the d03 quality score WITHIN each source —
  // cross-source score calibration (a 0.8 from a clean source and a 0.8
  // from a spam-heavy one are not comparable; mixing decisions want the
  // within-source quantile). Computed via RankStats: the window runs over
  // the distinct-(source, score) table, NOT per row — the shape that
  // survives a 10-source 100 TB corpus where a row-level window would fan
  // every row of a source into one task.
  private val d31: (String, QFn, Option[String]) = ("d31_quality_calibrate",
    (s, d) => {
      val scored = docs(s, d).select(col("doc_id"), col("source"),
        TextOps.qualityCols(col("text"), TextOps.tokens(col("text"))).last)
      RankStats.groupPercentRank(scored, "source", "quality_score",
        "src_pct_rank", "src_cume_dist")
    },
    Some(s"""WITH q AS (SELECT doc_id, source, $qScoreSql AS quality_score
      |  FROM documents)
      |SELECT doc_id, source, quality_score,
      | round(percent_rank() OVER
      |   (PARTITION BY source ORDER BY quality_score), 6) AS src_pct_rank,
      | round(cume_dist() OVER
      |   (PARTITION BY source ORDER BY quality_score), 6) AS src_cume_dist
      |FROM q""".stripMargin))

  // --------------------------------------------- interpolated bigram LM
  // Per-doc mean negative log2 prob under a Jelinek-Mercer bigram LM
  // trained on the corpus itself: p(w2|w1) = 0.9·cb/cu(w1) + 0.1·cu(w2)/N.
  // The KenLM-perplexity quality filter's deterministic stand-in — extends
  // d26's unigram surprisal with first-order context. Count tables are
  // vocabulary-sized (shuffled joins on bigram/word keys); the corpus total
  // rides as a 1-row broadcast; never collected.
  private val d32: (String, QFn, Option[String]) = ("d32_bigram_lm",
    (s, d) => {
      val t = docs(s, d).select(col("doc_id"),
        TextOps.tokens(col("text")).as("w"))
      // occurrences feed the bigram count table AND the probe join —
      // materialize once (same policy as jaccardPairs)
      val occ = t.select(col("doc_id"),
          explode(TextOps.shingles(col("w"), 2)).as("bg"))
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
        .localCheckpoint(true)
      val uni = t.select(explode(col("w")).as("t1"))
        .groupBy(col("t1")).agg(count(lit(1)).as("cu"))
      val tot = uni.agg(sum(col("cu")).cast("double").as("_tu"))
      val bc = occ.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      val nll = occ.join(bc, Seq("bg"))
        .join(uni.select(col("t1").as("w1"), col("cu").as("c1")), Seq("w1"))
        .join(uni.select(col("t1").as("w2"), col("cu").as("c2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .withColumn("_nll", log2(lit(1.0) /
          (lit(0.9) * (col("cb").cast("double") / col("c1").cast("double"))
            + lit(0.1) * (col("c2").cast("double") / col("_tu")))))
      val per = nll.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(col("_nll")), 6).as("mean_nll"))
      docs(s, d).select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("mean_nll"), lit(0.0)).as("mean_nll"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS w FROM documents),
      |occ AS (SELECT doc_id,
      |  unnest(list_transform(range(1, greatest(len(w), 1)),
      |    i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS bg
      |  FROM t),
      |o2 AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1,
      |  string_split(bg, ' ')[2] AS w2 FROM occ),
      |uc AS (SELECT t1, count(*) AS cu
      |  FROM (SELECT unnest(w) AS t1 FROM t) GROUP BY 1),
      |bc AS (SELECT bg, count(*) AS cb FROM occ GROUP BY 1),
      |tu AS (SELECT sum(cu)::DOUBLE AS tu FROM uc),
      |p AS (SELECT doc_id, log2(1.0 /
      |    (0.9 * (cb::DOUBLE / c1.cu::DOUBLE)
      |      + 0.1 * (c2.cu::DOUBLE / tu))) AS nll
      |  FROM o2 JOIN bc USING (bg)
      |    JOIN uc c1 ON o2.w1 = c1.t1
      |    JOIN uc c2 ON o2.w2 = c2.t1, tu),
      |per AS (SELECT doc_id, count(*) AS n_bigrams,
      |  round(avg(nll), 6) AS mean_nll FROM p GROUP BY 1)
      |SELECT d.doc_id, COALESCE(n_bigrams, 0)::BIGINT AS n_bigrams,
      | COALESCE(mean_nll, 0.0) AS mean_nll
      |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin))

  // --------------------------------------------- curriculum ordering
  // Global training order: rank every doc by quality (desc, doc_id ties)
  // and cut the corpus into 4 curriculum phases. The global row_number is
  // computed via RankStats.globalOrderIndex — cumulative counts over the
  // DISTINCT-score grid plus a within-tie window — never a whole-corpus
  // single-task sort. Driver-checked equal to the naive SQL window.
  private val d33: (String, QFn, Option[String]) = ("d33_curriculum_order",
    (s, d) => {
      val scored = docs(s, d).select(col("doc_id"),
        TextOps.qualityCols(col("text"), TextOps.tokens(col("text"))).last)
      val ranked = RankStats.globalOrderIndex(scored, "quality_score",
        "doc_id", "global_rank")
      val tot = scored.agg(count(lit(1)).as("_n"))
      ranked.crossJoin(broadcast(tot))
        .select(col("doc_id"), col("quality_score"), col("global_rank"),
          floor((col("global_rank") - 1) * 4 / col("_n")).cast("long")
            .as("phase"))
    },
    Some(s"""WITH q AS (SELECT doc_id, $qScoreSql AS quality_score
      |  FROM documents),
      |n AS (SELECT count(*)::BIGINT AS n FROM q),
      |r AS (SELECT doc_id, quality_score, row_number() OVER
      |  (ORDER BY quality_score DESC, doc_id) AS global_rank FROM q)
      |SELECT doc_id, quality_score, global_rank,
      | ((global_rank - 1) * 4) // n AS phase FROM r, n""".stripMargin))

  // ----------------------------------------- canonical doc per cluster
  // The dedup DECISION step: d10's connected components + d03's quality
  // score → one keeper per near-dup cluster (highest quality, lowest
  // doc_id on ties). Spark side selects keepers with a single max(struct)
  // aggregation — order-independent, no per-cluster window; the oracle
  // re-derives clusters with d10's recursive CTE and picks by window.
  private val d34: (String, QFn, Option[String]) = ("d34_cluster_keeper",
    (s, d) => {
      val cl = Dedup.dedupCorpus(docs(s, d), "doc_id", "text", n = 3,
        k = MINHASH_K, bands = MINHASH_BANDS, minEstJaccard = 0.5)
      val q = docs(s, d).select(col("doc_id").as("doc"),
        TextOps.qualityCols(col("text"), TextOps.tokens(col("text"))).last)
      cl.join(q, Seq("doc"))
        .groupBy(col("keep_id").as("cluster"))
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("quality_score"), (-col("doc")).as("negdoc")))
            .as("m"))
        .select(col("cluster"), col("n_docs"),
          (-col("m.negdoc")).as("keeper_id"),
          col("m.quality_score").as("keeper_quality"))
    },
    Some(s"""WITH RECURSIVE $shCte,
      |mh AS (SELECT doc_id, j,
      |    min(${md5HashSql("s || '#' || j")}) AS sig
      |  FROM sh, (SELECT unnest(range(0, $MINHASH_K)) AS j) js
      |  GROUP BY doc_id, j),
      |bk AS (SELECT doc_id, j // ${MINHASH_K / MINHASH_BANDS} AS band,
      |    md5(string_agg(sig::VARCHAR, ',' ORDER BY j)) AS bkey
      |  FROM mh GROUP BY doc_id, band),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
      |   AND x.doc_id < y.doc_id),
      |near AS (SELECT a, b FROM (
      |  SELECT c.a, c.b,
      |   round(sum(CASE WHEN ma.sig = mb.sig THEN 1 ELSE 0 END)
      |     / ${MINHASH_K.toDouble}, 6) AS ej
      |  FROM cand c JOIN mh ma ON ma.doc_id = c.a
      |   JOIN mh mb ON mb.doc_id = c.b AND mb.j = ma.j
      |  GROUP BY c.a, c.b) WHERE ej >= 0.5),
      |exg AS (SELECT md5(text) AS fp, min(doc_id) AS keep_id
      |  FROM documents GROUP BY 1),
      |exp AS (SELECT d.doc_id AS doc, g.keep_id AS peer FROM documents d
      |  JOIN exg g ON md5(d.text) = g.fp WHERE d.doc_id <> g.keep_id),
      |edges AS (SELECT doc, peer FROM exp
      |  UNION SELECT peer, doc FROM exp
      |  UNION SELECT a, b FROM near
      |  UNION SELECT b, a FROM near),
      |cc(doc, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.doc, c.label FROM edges e JOIN cc c ON c.doc = e.peer),
      |cl AS (SELECT doc, min(label) AS cluster FROM cc GROUP BY doc),
      |qv AS (SELECT doc_id, $qScoreSql AS q FROM documents),
      |rk AS (SELECT cluster, doc, q,
      |  row_number() OVER (PARTITION BY cluster
      |    ORDER BY q DESC, doc ASC) AS rn,
      |  count(*) OVER (PARTITION BY cluster) AS n_docs
      |  FROM cl JOIN qv ON doc = doc_id)
      |SELECT cluster, n_docs::BIGINT AS n_docs, doc AS keeper_id,
      | q AS keeper_quality FROM rk WHERE rn = 1""".stripMargin))

  // ----------------------------------------- edit-distance verification
  // The standard two-stage near-dup pipeline made explicit: cheap LSH
  // candidates (d06's band join) -> EXPENSIVE exact verification, here
  // Levenshtein distance + normalized similarity on the candidate pairs
  // only. At 100 TB the O(len^2) edit distance is affordable precisely
  // because it runs on the candidate set (thousands of pairs), never the
  // corpus cross-product; both engines' levenshtein are exact integers.
  private val d35: (String, QFn, Option[String]) = ("d35_edit_verify",
    (s, d) => {
      val t = docs(s, d)
      val cand = Dedup.minhashLsh(t, "doc_id", "text", n = 3,
        k = MINHASH_K, bands = MINHASH_BANDS).select(col("a"), col("b"))
      val ta = t.select(col("doc_id").as("a"), col("text").as("_ta"))
      val tb = t.select(col("doc_id").as("b"), col("text").as("_tb"))
      cand.join(ta, Seq("a")).join(tb, Seq("b"))
        .withColumn("lev",
          levenshtein(col("_ta"), col("_tb")).cast("long"))
        .withColumn("nsim", round(lit(1.0) - col("lev").cast("double")
          / greatest(length(col("_ta")), length(col("_tb")))
            .cast("double"), 6))
        .select(col("a"), col("b"), col("lev"), col("nsim"),
          (col("nsim") >= 0.8).cast("long").as("verified"))
    },
    Some(s"""WITH $shCte,
      |mh AS (SELECT doc_id, j,
      |    min(${md5HashSql("s || '#' || j")}) AS sig
      |  FROM sh, (SELECT unnest(range(0, $MINHASH_K)) AS j) js
      |  GROUP BY doc_id, j),
      |bk AS (SELECT doc_id, j // ${MINHASH_K / MINHASH_BANDS} AS band,
      |    md5(string_agg(sig::VARCHAR, ',' ORDER BY j)) AS bkey
      |  FROM mh GROUP BY doc_id, band),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
      |   AND x.doc_id < y.doc_id),
      |v AS (SELECT a, b,
      |  levenshtein(da.text, db.text)::BIGINT AS lev,
      |  round(1.0 - levenshtein(da.text, db.text)::DOUBLE
      |    / greatest(length(da.text), length(db.text))::DOUBLE, 6) AS nsim
      |  FROM cand JOIN documents da ON da.doc_id = a
      |   JOIN documents db ON db.doc_id = b)
      |SELECT a, b, lev, nsim,
      | (CASE WHEN nsim >= 0.8 THEN 1 ELSE 0 END)::BIGINT AS verified
      |FROM v""".stripMargin))

  // ----------------------------------------- Count-Min heavy hitters
  // CMS counters (4×64, md5 hash family) over the token stream, queried
  // back for every vocabulary term with the exact count alongside —
  // est >= exact by construction (PropertiesSpec asserts; the driver
  // hash-checks the full error audit). The counter table is 256 rows no
  // matter the corpus size and merges across shards by addition — the
  // bounded-state frequency path next to KMV (d19) and the histogram
  // sketch (q44).
  private val d36: (String, QFn, Option[String]) = ("d36_count_min",
    (s, d) => {
      val toks = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      Sketches.countMin(toks, col("term"), depth = 4, width = 64)
        .select(col("val").as("term"), col("n_exact"), col("est"),
          col("overcount"))
    },
    Some(s"""WITH t AS (SELECT unnest($tokSql) AS term FROM documents),
      |js AS (SELECT unnest(range(0, 4)) AS j),
      |cnt AS (SELECT j,
      |   ${md5HashSql("term || '#' || 'cms' || j")} % 64 AS b,
      |   count(*) AS cnt
      |  FROM t, js GROUP BY 1, 2),
      |ex AS (SELECT term, count(*) AS n_exact FROM t GROUP BY 1),
      |pr AS (SELECT term, n_exact, j,
      |   ${md5HashSql("term || '#' || 'cms' || j")} % 64 AS b
      |  FROM ex, js)
      |SELECT term, n_exact, min(cnt) AS est,
      | min(cnt) - n_exact AS overcount
      |FROM pr JOIN cnt USING (j, b) GROUP BY term, n_exact"""
      .stripMargin))

  // ----------------------------------------- token-stream sequence carve
  // GPT-style packing: concatenate the corpus into one virtual token
  // stream (doc_id order) and carve fixed 512-token training sequences —
  // each doc reports its cumulative offset and which sequences it spans.
  // The global running sum uses Sequences.globalCumsum (range partitions +
  // per-partition window + broadcast prefix offsets), NOT a single-task
  // `ORDER BY` window; the oracle is the naive global window, which must
  // match exactly since token counts are integers.
  private val d37: (String, QFn, Option[String]) = ("d37_token_stream_pack",
    (s, d) => {
      val t = docs(s, d).select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      Sequences.globalCumsum(t, "doc_id", col("n_tokens"), "cum_tokens")
        .withColumn("seq_first",
          floor((col("cum_tokens") - col("n_tokens")) / 512).cast("long"))
        .withColumn("seq_last",
          floor((col("cum_tokens") - 1) / 512).cast("long"))
        .withColumn("n_seqs", greatest(lit(0L),
          col("seq_last") - col("seq_first") + 1))
    },
    Some(s"""WITH t AS (SELECT doc_id, len($tokSql)::BIGINT AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |  (sum(n_tokens) OVER (ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens FROM t)
      |SELECT doc_id, n_tokens, cum_tokens,
      | ((cum_tokens - n_tokens) // 512)::BIGINT AS seq_first,
      | ((cum_tokens - 1) // 512)::BIGINT AS seq_last,
      | greatest(0, (cum_tokens - 1) // 512
      |   - (cum_tokens - n_tokens) // 512 + 1)::BIGINT AS n_seqs
      |FROM c""".stripMargin))

  // ----------------------------------------------- corpus data card
  // The per-source report a dataset release ships with: volume (docs,
  // tokens), corpus-wide exact-duplicate share, mean quality, and language
  // spread — one grouped pass over per-doc projections plus the
  // fingerprint-count join (dup status is CORPUS-wide, so a mirror source
  // shows up even when its docs are unique within itself). Every column
  // integer or round-6; the whole card is one shuffle on source plus the
  // vocabulary-sized fp join.
  private val d38: (String, QFn, Option[String]) = ("d38_corpus_report",
    (s, d) => {
      val toks = TextOps.tokens(col("text"))
      val t = docs(s, d).select(col("doc_id"), col("source"),
        md5(col("text")).as("fp"), size(toks).cast("long").as("nt"),
        TextOps.qualityCols(col("text"), toks).last,
        TextOps.langId(toks).as("lang_pred"))
      val fpc = t.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      t.join(fpc, Seq("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"),
          round(avg(col("quality_score")), 6).as("mean_quality"),
          countDistinct(col("lang_pred")).as("n_langs"),
          round(sum(when(col("c") > 1, 1L).otherwise(0L)).cast("double")
            / count(lit(1)).cast("double"), 6).as("dup_frac"))
    },
    Some(s"""WITH sc AS (SELECT doc_id, source, md5(text) AS fp,
      |  len($tokSql)::BIGINT AS nt, $qScoreSql AS q, $langScoreDefsSql
      |  FROM documents),
      |t AS (SELECT doc_id, source, fp, nt, q,
      |  $langCaseSql AS lang_pred FROM sc),
      |fpc AS (SELECT fp, count(*) AS c FROM t GROUP BY 1)
      |SELECT source, count(*)::BIGINT AS n_docs,
      | sum(nt)::BIGINT AS n_tokens,
      | round(avg(q), 6) AS mean_quality,
      | count(DISTINCT lang_pred)::BIGINT AS n_langs,
      | round(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::DOUBLE
      |   / count(*)::DOUBLE, 6) AS dup_frac
      |FROM t JOIN fpc USING (fp) GROUP BY source""".stripMargin))

  // ------------------------------------------- centroid outlier scan
  // Per-label mean embedding + squared distance to own centroid + outlier
  // flag — the embedding-space label-quality sweep. Centroids are a
  // dim × labels aggregate broadcast back; vectors shuffle zero times.
  private val e06: (String, QFn, Option[String]) = ("e06_centroid_dist",
    (s, d) => Similarity.centroidDistances(
        emb(s, d), "vec_id", "embedding", "label")
      .select(col("vec_id"), col("label"), col("dist2"),
        col("label_mean_dist2"), col("is_outlier")),
    Some("""WITH e AS (SELECT vec_id, label, pos,
      |  embedding[pos + 1]::DOUBLE AS v
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS pos) p),
      |c AS (SELECT label, pos, avg(v) AS mu FROM e GROUP BY 1, 2),
      |d AS (SELECT vec_id, e.label, sum((v - mu) * (v - mu)) AS d2
      |  FROM e JOIN c ON e.label = c.label AND e.pos = c.pos GROUP BY 1, 2),
      |m AS (SELECT label, avg(d2) AS md2 FROM d GROUP BY 1)
      |SELECT vec_id, d.label, round(d2, 6) AS dist2,
      | round(md2, 6) AS label_mean_dist2,
      | (d2 > 2.0 * md2)::BIGINT AS is_outlier
      |FROM d JOIN m USING (label)""".stripMargin))

  // ------------------------------------------------- Zipf rank-frequency
  // Least-squares fit of log2(freq) on log2(rank) over the top-500 terms —
  // the classic corpus sanity check (natural language ≈ slope −1; far off
  // → boilerplate or synthetic text). The fit runs over ONE 500-row
  // top-k (TakeOrdered), then a single 1-row aggregate of the power sums;
  // slope/intercept/R² use the textbook closed forms with the SAME
  // parenthesization in both engines.
  private val d40: (String, QFn, Option[String]) = ("d40_zipf_fit",
    (s, d) => {
      val counts = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val ranked = Relevance.topKRanks(counts, "cnt", "term", 500)
      val pts = ranked.select(
        log2(col("rank").cast("double")).as("x"),
        log2(col("cnt").cast("double")).as("y"))
      val agg = pts.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      agg.select(col("n").cast("long").as("n_terms"),
        round(slope, 6).as("zipf_slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6)
          .as("zipf_intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy"))
          * (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
    },
    Some(s"""WITH t AS (SELECT unnest($tokSql) AS term FROM documents),
      |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
      |r AS (SELECT term, cnt, row_number() OVER
      |  (ORDER BY cnt DESC, term) AS rank
      |  FROM c ORDER BY cnt DESC, term LIMIT 500),
      |p AS (SELECT log2(rank::DOUBLE) AS x, log2(cnt::DOUBLE) AS y
      |  FROM r),
      |s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
      |  sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM p)
      |SELECT n::BIGINT AS n_terms,
      | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
      | round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
      |   6) AS zipf_intercept,
      | round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |   ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM s""".stripMargin))

  // ----------------------------------------- cross-source overlap matrix
  // Shingle containment at SOURCE granularity — the mirror detector ("is
  // source B mostly a copy of source A?"). Collapsing (doc, shingle) to
  // DISTINCT (source, shingle) first bounds every posting list at the
  // number of sources, so the pair join is |vocab| × sources², never
  // doc-quadratic — the aggregation-level analog of d27's df-cutoff.
  private val d39: (String, QFn, Option[String]) = ("d39_source_overlap",
    (s, d) => {
      val ss = docs(s, d).select(col("source"),
          explode(array_distinct(
            TextOps.shingles(TextOps.tokens(col("text")), 3))).as("sh"))
        .distinct().localCheckpoint(true)
      val sz = ss.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
      val inter = ss.select(col("source").as("sa"), col("sh"))
        .join(ss.select(col("source").as("sb"), col("sh")), Seq("sh"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("source").as("sa"), col("n_sh").as("na")),
          Seq("sa"))
        .join(sz.select(col("source").as("sb"), col("n_sh").as("nb")),
          Seq("sb"))
        .select(col("sa"), col("sb"), col("inter"),
          round(col("inter").cast("double") / col("na").cast("double"), 6)
            .as("cont_a_in_b"),
          round(col("inter").cast("double") / col("nb").cast("double"), 6)
            .as("cont_b_in_a"))
    },
    Some(s"""WITH toks AS (SELECT source, $tokSql AS w FROM documents),
      |ss AS (SELECT DISTINCT source, s FROM (SELECT source,
      |  unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
      |    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
      |  FROM toks)),
      |sz AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY 1),
      |i AS (SELECT a.source AS sa, b.source AS sb, count(*) AS inter
      |  FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT sa, sb, inter,
      | round(inter::DOUBLE / za.n_sh::DOUBLE, 6) AS cont_a_in_b,
      | round(inter::DOUBLE / zb.n_sh::DOUBLE, 6) AS cont_b_in_a
      |FROM i JOIN sz za ON za.source = sa
      | JOIN sz zb ON zb.source = sb""".stripMargin))

  // ------------------------------------------- embedding dim diagnostics
  // Per-dimension mean/variance + variance rank over the embedding
  // column — the collapsed-dimension audit (a dim whose variance ≈ 0
  // carries no signal; a dominant dim distorts cosine). Dimension stats
  // are a dim-sized aggregate (64 rows) no matter the corpus size; the
  // rank window runs over those 64 rows only. Same exploded-position
  // arithmetic as e06's centroids, mirrored exactly in the oracle.
  private val e08: (String, QFn, Option[String]) = ("e08_dim_variance",
    (s, d) => {
      val e = emb(s, d).select(posexplode(col("embedding")))
        .select(col("pos").cast("long").as("pos"),
          col("col").cast("double").as("v"))
      val m = e.groupBy(col("pos"))
        .agg(avg(col("v")).as("mu"), count(lit(1)).as("n"))
      val vv = e.join(m, Seq("pos"))
        .groupBy(col("pos"), col("n"), col("mu"))
        .agg((sum((col("v") - col("mu")) * (col("v") - col("mu")))
          / col("n")).as("vp"))
        .select(col("pos"), col("n"), round(col("mu"), 6).as("mean_v"),
          round(col("vp"), 6).as("var_pop"))
      Relevance.topKRanks(vv, "var_pop", "pos", 64)
        .withColumnRenamed("rank", "var_rank")
        .withColumn("var_rank", col("var_rank").cast("long"))
    },
    Some("""WITH e AS (SELECT vec_id, pos, embedding[pos + 1]::DOUBLE AS v
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS pos) p),
      |m AS (SELECT pos, avg(v) AS mu, count(*) AS n FROM e GROUP BY 1),
      |vv AS (SELECT e.pos, n, round(mu, 6) AS mean_v,
      |  round(sum((v - mu) * (v - mu)) / n, 6) AS var_pop
      |  FROM e JOIN m USING (pos) GROUP BY e.pos, n, mu)
      |SELECT pos, n, mean_v, var_pop,
      | row_number() OVER (ORDER BY var_pop DESC, pos) AS var_rank
      |FROM vv""".stripMargin))

  // ------------------------------------------------- ANN recall audit
  // recall@5 of the LSH index against the exact scan, PER QUERY, as a
  // driver-verified table — the measurement that decides whether an ANN
  // index is usable (spec-level recall asserts exist; this pins the exact
  // per-query numbers). Composes e01's and e02's own query fns and oracle
  // SQL (nested WITH subqueries), so the audit can never drift from the
  // things it audits.
  private val e09: (String, QFn, Option[String]) = ("e09_ann_recall",
    (s, d) => {
      val ex = e01._2(s, d).select(col("qid"), col("nid"))
      val ap = e02._2(s, d).select(col("qid"), col("nid"))
      val hits = ex.join(ap, Seq("qid", "nid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
      ex.select(col("qid")).distinct()
        .join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)).cast("double") / 5.0, 6)
            .as("recall_at_5"))
    },
    Some(s"""WITH exact AS (${e01._3.get}),
      |approx AS (${e02._3.get}),
      |h AS (SELECT e.qid, count(*) AS hits FROM exact e
      |  JOIN approx a ON a.qid = e.qid AND a.nid = e.nid GROUP BY 1)
      |SELECT q.qid, COALESCE(hits, 0)::BIGINT AS hits,
      | round(COALESCE(hits, 0) / 5.0, 6) AS recall_at_5
      |FROM (SELECT DISTINCT qid FROM exact) q
      |LEFT JOIN h USING (qid)""".stripMargin))

  // ------------------------------------------- int8-quantized KNN
  // Cosine top-k over symmetric int8 codes — the 4× memory lever for a
  // corpus-scale embedding store. floor(x + 0.5) quantization (no
  // engine-dependent rounding rule), scales cancel in the cosine ratio,
  // so both engines replay the exact codes and integer dot products.
  private val e07: (String, QFn, Option[String]) = ("e07_quantized_knn",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      Similarity.quantizedKnn(e.filter(col("id") < 20), e, 5)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM embeddings),
      |sca AS (SELECT vec_id, v,
      |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS s FROM e),
      |qz AS (SELECT vec_id, CASE WHEN s > 0 THEN
      |    list_transform(v, x -> greatest(-127.0, least(127.0,
      |      floor(x / s + 0.5))))
      |  ELSE list_transform(v, x -> 0.0) END AS q FROM sca),
      |n AS (SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS qn FROM qz),
      |sc2 AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
      |  CASE WHEN a.qn * b.qn > 0
      |    THEN round(list_dot_product(a.q, b.q) / (a.qn * b.qn), 6)
      |  END AS qsim
      |  FROM n a JOIN n b ON a.vec_id <> b.vec_id WHERE a.vec_id < 20),
      |r AS (SELECT qid, nid, qsim, row_number() OVER (PARTITION BY qid
      |  ORDER BY qsim DESC, nid) AS rank FROM sc2)
      |SELECT qid, nid, rank, qsim FROM r WHERE rank <= 5""".stripMargin))

  // ------------------------------------ sparse TF-IDF cosine near-dup
  // Weighted sibling of d05: shared shingles weighted by rarity (smoothed
  // sklearn idf, d21's formula), cosine over the FULL weighted vectors;
  // candidate pairs must share >= 2 distinct shingles with df <= 10 (both
  // knobs mirrored in the oracle). One rare hit is weak evidence on this
  // repetitive vocabulary — at sf0.1 the single-hit df<=50 rule emitted
  // 1.13M candidates for 256 true pairs (13 s, 72M verify rows); the
  // two-hit rule emits 17k candidates at 255/256 recall. Boilerplate
  // shared by everything barely moves the score; shared rare phrases
  // dominate.
  /** d41's oracle, parametrized by the minimum shared-rare-shingle count
    * so d48's recall audit can replay the single-hit truth set with the
    * same SQL text (nested as a WITH subquery, like e09 does for e01/e02). */
  private def sparseCosineSql(minShared: Int): String =
    s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |tf AS (SELECT doc_id, s, count(*)::BIGINT AS tf FROM (
      |  SELECT doc_id, unnest(list_transform(
      |    range(1, greatest(len(w) - 1, 1)),
      |    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
      |  FROM toks) GROUP BY 1, 2),
      |nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
      |dfq AS (SELECT s, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |wt AS (SELECT doc_id, s, df,
      |  tf::DOUBLE * (ln((n + 1.0) / (df::DOUBLE + 1.0)) + 1.0) AS w
      |  FROM tf JOIN dfq USING (s), nd),
      |nrm AS (SELECT doc_id, round(sqrt(sum(w * w)), 9) AS nrm
      |  FROM wt GROUP BY 1),
      |cand AS (SELECT x.doc_id AS a, y.doc_id AS b
      |  FROM wt x JOIN wt y ON x.s = y.s AND x.doc_id < y.doc_id
      |  WHERE x.df <= 10 AND y.df <= 10
      |  GROUP BY 1, 2 HAVING count(*) >= $minShared),
      |num AS (SELECT c.a, c.b, sum(x.w * y.w) AS num
      |  FROM cand c JOIN wt x ON x.doc_id = c.a
      |  JOIN wt y ON y.doc_id = c.b AND y.s = x.s
      |  GROUP BY 1, 2)
      |SELECT a, b, round(num / (na.nrm * nb.nrm), 6) AS sim
      |FROM num JOIN nrm na ON na.doc_id = a JOIN nrm nb ON nb.doc_id = b
      |WHERE round(num / (na.nrm * nb.nrm), 6) >= 0.3""".stripMargin

  private val d41: (String, QFn, Option[String]) = ("d41_sparse_cosine",
    (s, d) => Relevance.sparseCosinePairs(docs(s, d), "doc_id",
      TextOps.tokens(col("text")), n = 3, threshold = 0.3,
      maxPostings = 10, minShared = 2),
    Some(sparseCosineSql(minShared = 2)))

  // ------------------------------------ d41 candidate-rule recall audit
  // The two-hit rule buys 66× fewer candidates (measured: 1.13M -> 17k at
  // sf0.1) at a recall cost this query makes DRIVER-VISIBLE instead of a
  // code-comment claim: truth = the single-hit candidate rule's output
  // (every pair >= threshold reachable through any df<=10 shingle), found
  // = d41's registered two-hit output. Same composition move as e09 for
  // the ANN index: both sides reuse the audited query's own fn/SQL, so
  // the audit can't drift from the thing it audits.
  private val d48: (String, QFn, Option[String]) = ("d48_sparse_recall",
    (s, d) => {
      val truth = Relevance.sparseCosinePairs(docs(s, d), "doc_id",
        TextOps.tokens(col("text")), n = 3, threshold = 0.3,
        maxPostings = 10, minShared = 1)
        .select(col("a"), col("b"))
      val found = d41._2(s, d).select(col("a"), col("b"))
      found.join(truth, Seq("a", "b"))
        .agg(count(lit(1)).as("found"))
        .crossJoin(truth.agg(count(lit(1)).as("true_pairs")))
        .select(col("found"), col("true_pairs"),
          round(col("found").cast("double") /
            col("true_pairs").cast("double"), 6).as("recall"))
    },
    Some(s"""WITH truth AS (${sparseCosineSql(minShared = 1)}),
      |two AS (${sparseCosineSql(minShared = 2)}),
      |f AS (SELECT count(*)::BIGINT AS found FROM two
      |  JOIN truth USING (a, b)),
      |t AS (SELECT count(*)::BIGINT AS true_pairs FROM truth)
      |SELECT found, true_pairs,
      | round(found::DOUBLE / true_pairs::DOUBLE, 6) AS recall
      |FROM f, t""".stripMargin))

  // ------------------------------------ fuzzy benchmark decontamination
  // d14's exact 4-gram probe misses paraphrased leakage; this flags train
  // docs whose MinHash signature estimates Jaccard >= 0.5 against any
  // eval doc (doc_id % 25 = 0) sharing an LSH band. Train×eval band join
  // only — never train×train — with the eval side broadcast.
  private val d42: (String, QFn, Option[String]) =
    ("d42_fuzzy_decontaminate",
      (s, d) => Dedup.fuzzyDecontaminate(docs(s, d), "doc_id", "text",
        isEval = col("doc_id") % 25 === 0, n = 3, k = MINHASH_K,
        bands = MINHASH_BANDS, minEstJaccard = 0.5),
      Some(s"""WITH $shCte,
        |mh AS (SELECT doc_id, j,
        |    min(${md5HashSql("s || '#' || j")}) AS sig
        |  FROM sh, (SELECT unnest(range(0, $MINHASH_K)) AS j) js
        |  GROUP BY doc_id, j),
        |bk AS (SELECT doc_id, j // ${MINHASH_K / MINHASH_BANDS} AS band,
        |    md5(string_agg(sig::VARCHAR, ',' ORDER BY j)) AS bkey
        |  FROM mh GROUP BY doc_id, band),
        |cand AS (SELECT DISTINCT t.doc_id AS t, e.doc_id AS e
        |  FROM bk t JOIN bk e ON t.band = e.band AND t.bkey = e.bkey
        |  WHERE t.doc_id % 25 <> 0 AND e.doc_id % 25 = 0),
        |m AS (SELECT c.t, c.e,
        |    sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS eq
        |  FROM cand c JOIN mh a ON a.doc_id = c.t
        |  JOIN mh b ON b.doc_id = c.e AND b.j = a.j
        |  GROUP BY 1, 2),
        |f AS (SELECT t, count(*) AS n_flagged FROM m
        |  WHERE round(eq / ${MINHASH_K}.0, 6) >= 0.5 GROUP BY 1)
        |SELECT d.doc_id AS doc, coalesce(n_flagged, 0)::BIGINT AS n_flagged,
        | (coalesce(n_flagged, 0) > 0)::BIGINT AS contaminated
        |FROM documents d LEFT JOIN f ON f.t = d.doc_id
        |WHERE d.doc_id % 25 <> 0""".stripMargin))

  // ------------------------------------- boilerplate strip + reconstruct
  // d30 measures the duplicated-span fraction; this REWRITES the corpus:
  // tokens covered by any 3-gram present in more than 10 documents are
  // cut and the survivors reassemble in order (the header/footer removal
  // pass of a web pipeline). The oracle rebuilds every document with the
  // same zipped positional unnest and compares md5 digests of the cleaned
  // text — a full-text equality check in 16 bytes per row.
  private val d44: (String, QFn, Option[String]) =
    ("d44_boilerplate_strip",
      (s, d) => Dedup.stripBoilerplate(docs(s, d), "doc_id", "text",
        n = 3, maxDf = 10),
      Some(s"""WITH toks AS (SELECT doc_id AS doc, $tokSql AS w
        |  FROM documents),
        |tok AS (SELECT doc, unnest(range(1, len(w) + 1)) AS pos,
        |    unnest(w) AS t FROM toks),
        |sh AS (SELECT doc,
        |    unnest(range(1, greatest(len(w) - 1, 1))) AS spos,
        |    unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |      i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
        |  FROM toks),
        |hot AS (SELECT s FROM (SELECT s, count(DISTINCT doc) AS df
        |  FROM sh GROUP BY 1) WHERE df > 10),
        |cov AS (SELECT DISTINCT doc, spos + o AS pos
        |  FROM sh JOIN hot USING (s),
        |       (SELECT unnest(range(0, 3)) AS o) os),
        |kept AS (SELECT tok.doc, tok.pos, tok.t FROM tok
        |  LEFT JOIN cov ON cov.doc = tok.doc AND cov.pos = tok.pos
        |  WHERE cov.doc IS NULL),
        |reb AS (SELECT doc, string_agg(t, ' ' ORDER BY pos) AS clean
        |  FROM kept GROUP BY 1),
        |rem AS (SELECT doc, count(*) AS n_removed FROM cov GROUP BY 1)
        |SELECT t.doc, len(t.w)::BIGINT AS n_tokens,
        | coalesce(rem.n_removed, 0)::BIGINT AS n_removed,
        | md5(coalesce(reb.clean, '')) AS clean_fp
        |FROM toks t LEFT JOIN rem USING (doc)
        |LEFT JOIN reb USING (doc)""".stripMargin))

  // --------------------------------------------- vocabulary-id encoding
  // The text→token-ids step between cleaning (d44) and sequence packing
  // (d11/d37): top-256 vocabulary by (count desc, term asc) — ids are
  // fully deterministic — OOV → 0, and the per-doc id sequence ships as
  // an md5 digest with OOV accounting. The vocabulary is a TakeOrdered
  // top-V broadcast to the positional token table; the oracle rebuilds
  // the identical vocabulary and digests the same comma-joined stream.
  private val d45: (String, QFn, Option[String]) = ("d45_vocab_encode",
    (s, d) => TextOps.vocabEncode(docs(s, d), "doc_id", col("text"),
      vocabSize = 256),
    Some(s"""WITH toks AS (SELECT doc_id AS doc, $tokSql AS w
      |  FROM documents),
      |tok AS (SELECT doc, unnest(range(1, len(w) + 1)) AS pos,
      |    unnest(w) AS t FROM toks),
      |cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
      |voc AS (SELECT t, row_number() OVER (ORDER BY c DESC, t) AS tid
      |  FROM (SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT 256)),
      |enc AS (SELECT tok.doc, tok.pos, coalesce(voc.tid, 0) AS tid
      |  FROM tok LEFT JOIN voc USING (t)),
      |agg AS (SELECT doc, count(*)::BIGINT AS n_tokens,
      |  sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
      |  md5(string_agg(tid::VARCHAR, ',' ORDER BY pos)) AS ids_fp
      |  FROM enc GROUP BY doc)
      |SELECT doc_id AS doc, coalesce(n_tokens, 0) AS n_tokens,
      | coalesce(n_oov, 0) AS n_oov, coalesce(ids_fp, md5('')) AS ids_fp
      |FROM documents LEFT JOIN agg ON doc_id = doc""".stripMargin))

  // --------------------------------------- temperature mixture sampling
  // d15 reweights toward EXPLICIT target shares; this is the
  // temperature form multilingual/multi-source training uses: keep rate
  // ∝ cnt^(1/T)/cnt with T = 2 (sqrt — correctly rounded IEEE, so the
  // oracle replays rates exactly), flattening the mix so small sources
  // upsample. Same broadcast-rates + content-addressed membership as
  // d15: re-runs and re-partitionings keep the identical set.
  private val d47: (String, QFn, Option[String]) = ("d47_temperature_mix",
    (s, d) => Sampling.domainMixByCount(
        docs(s, d).select(col("doc_id"), col("source")),
        key = col("doc_id"), domain = col("source"),
        weightOfCount = sqrt(_), frac = 0.6, salt = "tmix")
      .select(col("doc_id"), col("source"), col("rate")),
    Some("""WITH c AS (SELECT source, count(*)::BIGINT AS cnt,
      |  sqrt(count(*)::DOUBLE) AS w
      |  FROM documents GROUP BY source),
      |t AS (SELECT sum(cnt)::DOUBLE AS total, sum(w) AS sumw FROM c),
      |r AS (SELECT source, least(1.0::DOUBLE,
      |  round(0.6::DOUBLE * w * total / (sumw * cnt::DOUBLE), 6)) AS rate
      |  FROM c, t)
      |SELECT d.doc_id, d.source, r.rate
      |FROM documents d JOIN r USING (source)
      |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || '#tmix'), 1, 15))::BIGINT
      |  / 1152921504606846976.0 < r.rate""".stripMargin))

  // ------------------------------------------ release-set materialization
  // The capstone composition — what a user actually runs to cut a corpus
  // release: exact-dup keepers (d01) ∩ decontaminated (d14) ∩ quality
  // floor (d03's score), rolled up per source with token budgets. Every
  // stage is individually oracle-verified; this query verifies the
  // PLUMBING between them (joins, filters, the decimal-exact quality
  // mean). Per-source output rows: the release manifest.
  private val d46: (String, QFn, Option[String]) = ("d46_release_set",
    (s, d) => {
      val base = docs(s, d)
      val keepers = Dedup.exact(base, "doc_id",
          TextOps.fingerprint(col("text")))
        .select(col("keep_id").as("doc_id"))
      val clean = Dedup.decontaminate(base, "doc_id", "text", n = 4,
          isEval = col("doc_id") % 25 === 0)
        .filter(col("contaminated") === 0)
        .select(col("doc").as("doc_id"))
      base.select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
          TextOps.qualityCols(col("text"), TextOps.tokens(col("text"))).last)
        .join(keepers, Seq("doc_id"))
        .join(clean, Seq("doc_id"))
        .filter(col("quality_score") >= 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(sum(col("quality_score").cast("decimal(18,9)"))
            .cast("double") / count(lit(1)), 6).as("mean_quality"))
    },
    Some(s"""WITH exg AS (SELECT min(doc_id) AS keep_id FROM documents
      |  GROUP BY md5(trim(regexp_replace(lower(text),
      |    '[^a-z0-9]+', ' ', 'g')))),
      |toks AS (SELECT doc_id, $tokSql AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
      |  unnest(list_transform(range(1, greatest(len(w) - 2, 1)),
      |    i -> array_to_string(list_slice(w, i, i + 3), ' '))) AS s
      |  FROM toks)),
      |evs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 25 = 0),
      |hit AS (SELECT doc_id, count(*) AS n_overlap
      |  FROM sh JOIN evs USING (s) WHERE doc_id % 25 <> 0 GROUP BY 1),
      |q AS (SELECT doc_id, source, len($tokSql)::BIGINT AS n_tokens,
      |  $qScoreSql AS quality_score FROM documents)
      |SELECT source, count(*)::BIGINT AS n_docs,
      | sum(n_tokens)::BIGINT AS n_tokens,
      | round(CAST(sum(CAST(quality_score AS DECIMAL(18,9))) AS DOUBLE)
      |   / count(*), 6) AS mean_quality
      |FROM q JOIN exg ON q.doc_id = exg.keep_id
      |LEFT JOIN hit h ON q.doc_id = h.doc_id
      |WHERE q.doc_id % 25 <> 0 AND coalesce(h.n_overlap, 0) = 0
      | AND quality_score >= 0.5
      |GROUP BY source""".stripMargin))

  // ------------------------------------- HyperLogLog distinct sketch
  // Per-event-type distinct users via 64-register HLL. Register build is
  // ALL-INTEGER (rho via the exact bitlen identity), the harmonic sum is
  // an exact long sum of powers of two (order-independent — partial aggs
  // can't move it), so the oracle replays the whole sketch bit-for-bit;
  // the only floats are the final estimator division and the
  // linear-counting ln, rounded 4 dp. Registers merge by MAX — this is
  // the sketch a 1000-executor rollup (or a streaming window union)
  // composes without re-reading raw data.
  private val d43: (String, QFn, Option[String]) = ("d43_hll_distinct",
    (s, d) => Sketches.hllDistinct(Tables.events(s, d), col("event_type"),
      col("user_id"), p = 6)
      .select(col("grp").as("event_type"), col("n_exact"),
        col("est_distinct")),
    Some {
      val m = 64
      val numConst = 0.709 * m * m * math.pow(2.0, 55)
      s"""WITH h AS (SELECT event_type AS grp,
        |    ${md5HashSql("user_id::VARCHAR || '#hll'")} AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |rr AS (SELECT grp, h & 63 AS j,
        |    CASE WHEN (h >> 6) = 0 THEN 55
        |         ELSE 55 - length(bin(h >> 6)) END AS rho
        |  FROM h),
        |regs AS (SELECT grp, j, max(rho) AS mj FROM rr GROUP BY 1, 2),
        |grid AS (SELECT g.grp, gs.j
        |  FROM (SELECT DISTINCT grp FROM regs) g,
        |       (SELECT unnest(range(0, $m)) AS j) gs),
        |fl AS (SELECT grid.grp, coalesce(regs.mj, 0) AS mj
        |  FROM grid LEFT JOIN regs USING (grp, j)),
        |agg AS (SELECT grp,
        |    sum(1::BIGINT << (55 - mj))::BIGINT AS sint,
        |    sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS v
        |  FROM fl GROUP BY 1),
        |est AS (SELECT grp,
        |    CASE WHEN $numConst / sint::DOUBLE <= ${2.5 * m} AND v > 0
        |      THEN round($m.0 * ln($m.0 / v::DOUBLE), 4)
        |      ELSE round($numConst / sint::DOUBLE, 4) END AS est_distinct
        |  FROM agg),
        |ex AS (SELECT event_type AS grp,
        |    count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT ex.grp AS event_type, n_exact, est_distinct
        |FROM ex JOIN est USING (grp)""".stripMargin
    })

  // ------------------------------------------- product-quantized ANN
  // PQ codes + asymmetric-distance scan: corpus vectors become m=4
  // centroid codes (12 bits vs 256 float bytes — the memory lever that
  // keeps a 100 TB embedding store scan-resident); queries rank via a
  // per-query lookup table, fixed-order m-term sums, so the oracle
  // replays the arithmetic bit-for-bit. Composes with e04's IVF buckets
  // for candidate pruning; this registers the full-scan ADC baseline.
  private val PQ_M = 4
  private val PQ_KC = 8
  private val e10: (String, QFn, Option[String]) = ("e10_knn_pq",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      Similarity.pqKnn(e.filter(col("id") < 20), e, 5, m = PQ_M,
        kCent = PQ_KC, dims = LSH_DIMS)
    },
    Some {
      val sub = LSH_DIMS / PQ_M
      def fixedSum(expr: Int => String): String =
        (0 until PQ_M).map(expr).mkString(" + ")
      s"""WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |samp AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
        |    embedding::DOUBLE[] AS v
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $PQ_KC)),
        |ms AS (SELECT unnest(range(0, $PQ_M)) AS m),
        |cw AS (SELECT samp.cid, ms.m,
        |    list_slice(samp.v, ms.m * $sub + 1, ms.m * $sub + $sub) AS cv
        |  FROM samp, ms),
        |cw2 AS (SELECT cid, m, cv, list_dot_product(cv, cv) AS cn2
        |  FROM cw),
        |cs AS (SELECT c.vec_id AS nid, ms.m,
        |    list_slice(c.v, ms.m * $sub + 1, ms.m * $sub + $sub) AS sv
        |  FROM c, ms),
        |sc AS (SELECT nid, cs.m, cid, cn2,
        |    round(list_dot_product(sv, sv) - 2 * list_dot_product(sv, cv)
        |      + cn2, 6) AS d2
        |  FROM cs JOIN cw2 ON cs.m = cw2.m),
        |codes AS (SELECT nid, m, cid, cn2 FROM (SELECT *, row_number()
        |    OVER (PARTITION BY nid, m ORDER BY d2, cid) AS r FROM sc)
        |  WHERE r = 1),
        |enc AS (SELECT nid,
        |    ${fixedSum(i => s"max(CASE WHEN m = $i THEN cn2 END)")} AS nb2
        |  FROM codes GROUP BY nid),
        |qn AS (SELECT vec_id AS qid, sqrt(list_dot_product(v, v)) AS qn
        |  FROM q),
        |lut AS (SELECT q.vec_id AS qid, cw2.m, cw2.cid,
        |    list_dot_product(list_slice(q.v, cw2.m * $sub + 1,
        |      cw2.m * $sub + $sub), cw2.cv) AS part
        |  FROM q, cw2),
        |adc AS (SELECT l.qid, k.nid,
        |    ${fixedSum(i => s"max(CASE WHEN l.m = $i THEN part END)")}
        |      AS dp
        |  FROM codes k JOIN lut l ON k.m = l.m AND k.cid = l.cid
        |  WHERE l.qid <> k.nid GROUP BY 1, 2),
        |scored AS (SELECT adc.qid, adc.nid,
        |    round(CASE WHEN qn.qn * sqrt(e.nb2) > 0
        |      THEN adc.dp / (qn.qn * sqrt(e.nb2)) END, 6) AS sim
        |  FROM adc JOIN enc e ON e.nid = adc.nid
        |  JOIN qn ON qn.qid = adc.qid),
        |ranked AS (SELECT qid, nid, sim, row_number() OVER (PARTITION BY
        |  qid ORDER BY sim DESC NULLS LAST, nid) AS rank FROM scored)
        |SELECT qid, nid, rank, sim FROM ranked WHERE rank <= 5"""
        .stripMargin
    })

  // ---------------------------------------------- IVF + PQ composed ANN
  // The production index shape: e04's inverted file prunes WHICH corpus
  // codes each query scans (bucket equi-join on the probed centroid ids),
  // e10's PQ codes decide WHAT is scanned (12-bit codes, ADC lookup
  // table). Both stages keep the deterministic-sample + rounded-rank
  // policy, so the oracle replays assignment, codes and the fixed-order
  // ADC arithmetic bit-for-bit.
  private val e11: (String, QFn, Option[String]) = ("e11_knn_ivfpq",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      Similarity.ivfPqKnn(e.filter(col("id") < 20), e, 5,
        nCentroids = 16, nProbe = 4, m = PQ_M, kCent = PQ_KC,
        dims = LSH_DIMS)
    },
    Some {
      val sub = LSH_DIMS / PQ_M
      def fixedSum(expr: Int => String): String =
        (0 until PQ_M).map(expr).mkString(" + ")
      val cos = (a: String, b: String) =>
        s"""round(list_dot_product($a, $b)
           | / (sqrt(list_dot_product($a, $a))
           |    * sqrt(list_dot_product($b, $b))), 6)"""
          .stripMargin.replaceAll("\n", "")
      s"""WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |icents AS (SELECT vec_id AS icid, v AS icv FROM c
        |  ORDER BY vec_id LIMIT 16),
        |ica AS (SELECT c.vec_id, c.v, i.icid, ${cos("c.v", "i.icv")} AS cs
        |  FROM c, icents i),
        |corpusb AS (SELECT vec_id AS nid, icid AS bucket FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cs DESC, icid) AS r FROM ica) WHERE r = 1),
        |queryb AS (SELECT vec_id AS qid, icid AS bucket FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cs DESC, icid) AS r FROM ica WHERE vec_id < 20)
        |  WHERE r <= 4),
        |cnd AS (SELECT qid, nid FROM queryb JOIN corpusb USING (bucket)
        |  WHERE qid <> nid),
        |samp AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
        |    embedding::DOUBLE[] AS v
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $PQ_KC)),
        |ms AS (SELECT unnest(range(0, $PQ_M)) AS m),
        |cw AS (SELECT samp.cid, ms.m,
        |    list_slice(samp.v, ms.m * $sub + 1, ms.m * $sub + $sub) AS cv
        |  FROM samp, ms),
        |cw2 AS (SELECT cid, m, cv, list_dot_product(cv, cv) AS cn2
        |  FROM cw),
        |cs AS (SELECT c.vec_id AS nid, ms.m,
        |    list_slice(c.v, ms.m * $sub + 1, ms.m * $sub + $sub) AS sv
        |  FROM c, ms),
        |sc AS (SELECT nid, cs.m, cid, cn2,
        |    round(list_dot_product(sv, sv) - 2 * list_dot_product(sv, cv)
        |      + cn2, 6) AS d2
        |  FROM cs JOIN cw2 ON cs.m = cw2.m),
        |codes AS (SELECT nid, m, cid, cn2 FROM (SELECT *, row_number()
        |    OVER (PARTITION BY nid, m ORDER BY d2, cid) AS r FROM sc)
        |  WHERE r = 1),
        |enc AS (SELECT nid,
        |    ${fixedSum(i => s"max(CASE WHEN m = $i THEN cn2 END)")} AS nb2
        |  FROM codes GROUP BY nid),
        |qn AS (SELECT vec_id AS qid, sqrt(list_dot_product(v, v)) AS qn
        |  FROM q),
        |lut AS (SELECT q.vec_id AS qid, cw2.m, cw2.cid,
        |    list_dot_product(list_slice(q.v, cw2.m * $sub + 1,
        |      cw2.m * $sub + $sub), cw2.cv) AS part
        |  FROM q, cw2),
        |adc AS (SELECT cd.qid, cd.nid,
        |    ${fixedSum(i => s"max(CASE WHEN l.m = $i THEN part END)")}
        |      AS dp
        |  FROM cnd cd JOIN codes k ON k.nid = cd.nid
        |  JOIN lut l ON l.qid = cd.qid AND l.m = k.m AND l.cid = k.cid
        |  GROUP BY 1, 2),
        |scored AS (SELECT adc.qid, adc.nid,
        |    round(CASE WHEN qn.qn * sqrt(e.nb2) > 0
        |      THEN adc.dp / (qn.qn * sqrt(e.nb2)) END, 6) AS sim
        |  FROM adc JOIN enc e ON e.nid = adc.nid
        |  JOIN qn ON qn.qid = adc.qid),
        |ranked AS (SELECT qid, nid, sim, row_number() OVER (PARTITION BY
        |  qid ORDER BY sim DESC NULLS LAST, nid) AS rank FROM scored)
        |SELECT qid, nid, rank, sim FROM ranked WHERE rank <= 5"""
        .stripMargin
    })

  // -------------------------------------------------- k-means clustering
  // Lloyd iterations with order-independent centroid math: per-dim sums in
  // DECIMAL(25,10) (exact — partial-agg order can't move the result), mean
  // rounded 6 dp; assignment ranks rounded L2² with centroid-id tiebreak.
  // Each Spark iteration is a narrow projection + a k-row aggregate
  // (centroids live driver-side as literals, the Spark-ML pattern), and
  // the oracle replays the SAME two iterations as chained CTEs. The
  // learned centroids slot straight into ivfKnn's bucket shape — this is
  // the "production plugs k-means into the same shape" path the IVF
  // scaladocs promise.
  private val KM_K = 4
  private val KM_ITERS = 2
  private val e12: (String, QFn, Option[String]) = ("e12_kmeans",
    (s, d) => Similarity.kmeans(
      emb(s, d).select(col("vec_id").as("id"), col("embedding").as("vec")),
      KM_K, KM_ITERS, dims = LSH_DIMS)
      .select(col("id").as("vec_id"), col("cid").cast("long").as("cid"),
        col("d2")),
    Some {
      val comps = (0 until LSH_DIMS).map(i =>
        s"round(CAST(sum(CAST(v[${i + 1}] AS DECIMAL(25,10))) AS DOUBLE)" +
          s" / count(*), 6)").mkString(", ")
      def assignCte(name: String, centsCte: String): String =
        s"""$name AS (SELECT vec_id, v, cid, d2 FROM (
           |  SELECT vec_id, v, cid, d2, row_number() OVER (
           |    PARTITION BY vec_id ORDER BY d2, cid) AS r FROM (
           |    SELECT e.vec_id, e.v, c.cid,
           |      round(list_dot_product(e.v, e.v)
           |        - 2 * list_dot_product(e.v, c.cv)
           |        + list_dot_product(c.cv, c.cv), 6) AS d2
           |    FROM e, $centsCte c)) WHERE r = 1)""".stripMargin
      def updateCtes(i: Int): String =
        s"""u$i AS (SELECT cid, list_value($comps) AS cv
           |  FROM a$i GROUP BY cid),
           |c$i AS (SELECT p.cid, coalesce(u$i.cv, p.cv) AS cv
           |  FROM c${i - 1} p LEFT JOIN u$i USING (cid))""".stripMargin
      val iterCtes = (1 to KM_ITERS).map(i =>
        assignCte(s"a$i", s"c${i - 1}") + ",\n" + updateCtes(i))
        .mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
        |    embedding::DOUBLE[] AS cv
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $KM_K)),
        |$iterCtes,
        |${assignCte("fin", s"c$KM_ITERS")}
        |SELECT vec_id, cid::BIGINT AS cid, d2 FROM fin""".stripMargin
    })

  // ------------------------------------- JL random projection (64→16)
  // Dimensionality reduction as a pure map-side projection: the same
  // deterministic hyperplanes as e02's LSH (sign-quantized there, real-
  // valued here), scaled √(3/16) (planes are uniform[-1,1), variance
  // 1/3) so distances survive in expectation. Output scalarized to
  // (vec_id, dim, comp) rows — the driver checker hashes scalars, not
  // arrays (the q17 lesson).
  private val PROJ_DIMS = 16
  private val e14: (String, QFn, Option[String]) = ("e14_random_projection",
    (s, d) => emb(s, d).select(col("vec_id"),
      posexplode(Similarity.randomProject(col("embedding"), LSH_DIMS,
        PROJ_DIMS)).as(Seq("dim", "comp"))),
    Some {
      val scale = math.sqrt(3.0 / PROJ_DIMS)
      val comps = (0 until PROJ_DIMS).map { p =>
        val plane = Similarity.planeVector(p, LSH_DIMS)
          .map(_.toString).mkString("[", ", ", "]")
        s"round(list_dot_product(v, $plane) * $scale, 6)"
      }.mkString(",\n|    ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings)
        |SELECT vec_id, unnest(range(0, $PROJ_DIMS)) AS dim,
        |  unnest([$comps]) AS comp
        |FROM e""".stripMargin
    })

  // --------------------------------------------- persisted ANN index
  // The serving shape: lshIndexTable (signatures + norms, banded) is
  // WRITTEN to parquet and the query half runs against the RE-READ table
  // — index built once, amortized over every query batch, with signature
  // computation never repeated. Hash-equal to e02's inline pipeline: the
  // storage round-trip must not change a single bit.
  private val e13: (String, QFn, Option[String]) = ("e13_ann_persisted",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      // Queries.rtDir registers the path with the shutdown-hook cleanup
      // (an inline tmpdir here leaked one index dir per run)
      val dir = Queries.rtDir("e13", d)
      Similarity.lshIndexTable(e, LSH_DIMS, LSH_PLANES, LSH_BANDS)
        .write.mode("overwrite").parquet(dir)
      Similarity.lshKnnIndexed(e.filter(col("id") < 20),
        s.read.parquet(dir), 5, LSH_DIMS, LSH_PLANES, LSH_BANDS)
    },
    Some(lshKnnOracleSql))

  val defs: Seq[(String, QFn, Option[String])] = Seq(
    d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12, d13, d14,
    d15, d16, d17, d18, d19, d20, d21, d22, d23, d24, d25, d26, d27, d28,
    d29, d30, d31, d32, d33, d34, d35, d36, d37, d38, d39, d40, d41, d42,
    d43, d44, d45, d46, d47, d48, d49,
    e01, e02, e03, e04, e05, e06, e07, e08, e09, e10, e11, e12, e13, e14,
    m01, m02)
}
