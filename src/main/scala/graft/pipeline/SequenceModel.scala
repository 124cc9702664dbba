package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.DoubleType

/**
 * Native sequence-model scorer — the engine-side forward pass of the
 * reference's torch RNN (`model.py:28-91` `TransactionsRnn`), closing the
 * last `run.py` parity gap without torch:
 *
 *   categorical indices → per-feature embedding lookup (`model.py:80-82`,
 *   `padding_idx=0` so index 0 embeds to the zero vector) → bidirectional
 *   GRU (`model.py:40`) → [max-pool, avg-pool, last-hidden] concat
 *   (`model.py:69-73`) → 2-layer ReLU classifier (`model.py:46-50`) →
 *   softmax, class-1 probability (`model.py:75-76`, `model.py:244`).
 *
 * Parity notes, each pinned by `SequenceModelSpec`:
 *  - torch GRU gate math, gate order r,z,n in the stacked weight rows:
 *    r = σ(W_ir x + b_ir + W_hr h + b_hr), z likewise,
 *    n = tanh(W_in x + b_in + r ⊙ (W_hn h + b_hn)),
 *    h' = (1−z) ⊙ n + z ⊙ h.
 *  - The avg-pool divides by the FULL padded length T (`states.sum(dim=1) /
 *    states.shape[1]`, `model.py:70`) — padding steps participate in the
 *    recurrence and the pooling, exactly as in the reference (right-padding
 *    with index 0, `model.py:193`: the pad EMBEDS to zeros but still
 *    evolves the GRU state).
 *  - `last_hidden.permute(1,2,0).reshape(B, 2H)` (`model.py:71`)
 *    INTERLEAVES the two directions per hidden unit
 *    [f0,b0,f1,b1,…] — not a plain concat; mirrored in [[forward]].
 *  - Dropout layers are identity here: this is the eval-mode semantics
 *    (`model.py:234` calls `model.eval()`; the reference's functional
 *    dropout at `model.py:74` technically stays live even in eval — a
 *    torch-API quirk it papers over with seeding — and a DETERMINISTIC
 *    engine takes the intended eval behavior).
 *
 * The model is a committed TEXT artifact (same policy as
 * `TreeEnsemble.scala`): matrices of `Double.toString` literals, which
 * round-trip bit-exactly, so scores are reproducible across JVMs.
 * `tools/convert_nn_ckpt.py` emits this format from the reference's
 * `nn_weights.ckpt` + `nn_bins.pickle` pair (driver-side, needs torch).
 *
 * Scale: scoring is per-row compute over the assembled sequence tensors
 * (`Sequences.assembleSequences` — one shuffle on user_id), embarrassingly
 * parallel, O(T · H · (E+H)) per user with zero additional shuffle. The
 * model is broadcast once per job. This is deliberately a `mapPartitions`
 * stage (the brief's option (d)): a 300-step recurrence with per-step
 * nonlinearities is imperative math, not a relational expression — the
 * same judgment productionized Spark inference makes (pandas/arrow UDF or
 * mapPartitions around the native runtime).
 */
final case class GruLayer(wIh: Array[Array[Double]], wHh: Array[Array[Double]],
                          bIh: Array[Double], bHh: Array[Double]) {
  val hidden: Int = bIh.length / 3
  require(wIh.length == 3 * hidden && wHh.length == 3 * hidden &&
    bHh.length == 3 * hidden, "GRU weight shapes must be (3H x E)/(3H x H)/3H")

  private def dot(w: Array[Double], x: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += w(i) * x(i); i += 1 }
    s
  }
  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** One recurrence step; returns the new hidden state (length H). */
  def step(x: Array[Double], h: Array[Double]): Array[Double] = {
    val out = new Array[Double](hidden)
    var j = 0
    while (j < hidden) {
      val r = sigmoid(dot(wIh(j), x) + bIh(j) + dot(wHh(j), h) + bHh(j))
      val z = sigmoid(dot(wIh(hidden + j), x) + bIh(hidden + j) +
        dot(wHh(hidden + j), h) + bHh(hidden + j))
      val n = math.tanh(dot(wIh(2 * hidden + j), x) + bIh(2 * hidden + j) +
        r * (dot(wHh(2 * hidden + j), h) + bHh(2 * hidden + j)))
      out(j) = (1.0 - z) * n + z * h(j)
      j += 1
    }
    out
  }
}

final case class SequenceModel(
    features: Seq[String],
    /** Per feature: (cardinality+1) x dim embedding table; row 0 is the
      * padding row (zeros, `padding_idx=0`). */
    embed: Map[String, Array[Array[Double]]],
    /** Optional pd.cut bin edges per feature (the `nn_bins` digitization,
      * `model.py:172-181`) — features without edges arrive pre-indexed. */
    edges: Map[String, Array[Double]],
    seqLen: Int,
    fwd: GruLayer, bwd: GruLayer,
    w1: Array[Array[Double]], b1: Array[Double],
    w2: Array[Array[Double]], b2: Array[Double]) {

  val hidden: Int = fwd.hidden
  private val embDims: Seq[Int] = features.map(f => embed(f)(0).length)
  val inputDim: Int = embDims.sum

  /** Embed one timestep's feature indices into the concatenated input
    * vector. Out-of-vocabulary indices clamp to the padding row — the
    * defensive stance for drifted vocab (torch would throw; a 100 TB batch
    * job should not die on one stray code). */
  private def embedStep(idx: Array[Int]): Array[Double] = {
    val x = new Array[Double](inputDim)
    var off = 0; var i = 0
    while (i < features.length) {
      val table = embed(features(i))
      val row = if (idx(i) >= 0 && idx(i) < table.length) table(idx(i)) else table(0)
      System.arraycopy(row, 0, x, off, row.length)
      off += row.length; i += 1
    }
    x
  }

  /** Class-1 probability for one user's (T x F) index sequence. */
  def forward(seq: Array[Array[Int]]): Double = {
    val t = seq.length
    require(t > 0, "empty sequence")
    val xs = new Array[Array[Double]](t)
    var i = 0
    while (i < t) { xs(i) = embedStep(seq(i)); i += 1 }
    // forward and backward scans; states(t) = [h_fwd(t) ++ h_bwd(t)]
    val sf = new Array[Array[Double]](t)
    var h = new Array[Double](hidden)
    i = 0
    while (i < t) { h = fwd.step(xs(i), h); sf(i) = h; i += 1 }
    val sb = new Array[Array[Double]](t)
    h = new Array[Double](hidden)
    i = t - 1
    while (i >= 0) { h = bwd.step(xs(i), h); sb(i) = h; i -= 1 }
    // pooling over the time axis (max, sum/T) on the 2H state vectors
    val twoH = 2 * hidden
    val mx = Array.fill(twoH)(Double.NegativeInfinity)
    val av = new Array[Double](twoH)
    i = 0
    while (i < t) {
      var j = 0
      while (j < hidden) {
        val f = sf(i)(j); val b = sb(i)(j)
        if (f > mx(j)) mx(j) = f
        if (b > mx(hidden + j)) mx(hidden + j) = b
        av(j) += f; av(hidden + j) += b
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j < twoH) { av(j) /= t; j += 1 }
    // last_hidden: fwd final state h_fwd(T-1), bwd final state h_bwd(0),
    // INTERLEAVED per hidden unit (the permute/reshape at model.py:71)
    val last = new Array[Double](twoH)
    j = 0
    while (j < hidden) {
      last(2 * j) = sf(t - 1)(j); last(2 * j + 1) = sb(0)(j); j += 1
    }
    val combined = mx ++ av ++ last
    // classifier: Linear -> ReLU -> Linear -> softmax, return p(class 1)
    val h1 = new Array[Double](b1.length)
    j = 0
    while (j < b1.length) {
      var s = b1(j); var k = 0
      while (k < combined.length) { s += w1(j)(k) * combined(k); k += 1 }
      h1(j) = if (s > 0) s else 0.0
      j += 1
    }
    val logits = new Array[Double](2)
    j = 0
    while (j < 2) {
      var s = b2(j); var k = 0
      while (k < h1.length) { s += w2(j)(k) * h1(k); k += 1 }
      logits(j) = s; j += 1
    }
    val m = math.max(logits(0), logits(1))
    val e0 = math.exp(logits(0) - m); val e1 = math.exp(logits(1) - m)
    e1 / (e0 + e1)
  }

  /** Text artifact (see [[SequenceModel.fromLines]] for the grammar). */
  def toLines: Seq[String] = {
    def mat(name: String, m: Array[Array[Double]]): Seq[String] =
      s"matrix $name ${m.length} ${m(0).length}" +: m.toSeq.map(_.mkString(" "))
    def vec(name: String, v: Array[Double]): Seq[String] =
      Seq(s"vector $name ${v.length}", v.mkString(" "))
    val head = Seq("seqmodel", s"seqlen $seqLen",
      "features " + features.mkString(" "), s"hidden $hidden")
    val embLines = features.flatMap(f => mat(s"embed_$f", embed(f)))
    val edgeLines = features.filter(edges.contains)
      .flatMap(f => Seq(s"edges $f ${edges(f).length}", edges(f).mkString(" ")))
    head ++ embLines ++ edgeLines ++
      mat("fwd_wih", fwd.wIh) ++ mat("fwd_whh", fwd.wHh) ++
      vec("fwd_bih", fwd.bIh) ++ vec("fwd_bhh", fwd.bHh) ++
      mat("bwd_wih", bwd.wIh) ++ mat("bwd_whh", bwd.wHh) ++
      vec("bwd_bih", bwd.bIh) ++ vec("bwd_bhh", bwd.bHh) ++
      mat("cls_w1", w1) ++ vec("cls_b1", b1) ++
      mat("cls_w2", w2) ++ vec("cls_b2", b2)
  }
}

object SequenceModel {

  /** Parse the text artifact: a `seqmodel` header, then `seqlen`/`features`/
    * `hidden` lines, then named `matrix <name> R C` (R following lines of C
    * doubles), `vector <name> N` (one line), and `edges <feature> N` (one
    * line) sections in any order. */
  def fromLines(lines: Seq[String]): SequenceModel = {
    val it = lines.iterator.map(_.trim).filter(_.nonEmpty).buffered
    require(it.hasNext && it.next() == "seqmodel",
      "sequence model artifact must start with 'seqmodel'")
    var seqLen = 0; var hidden = 0; var features = Seq.empty[String]
    val mats = scala.collection.mutable.Map[String, Array[Array[Double]]]()
    val vecs = scala.collection.mutable.Map[String, Array[Double]]()
    val edg = scala.collection.mutable.Map[String, Array[Double]]()
    def doubles(s: String): Array[Double] =
      s.split("\\s+").map(java.lang.Double.parseDouble)
    while (it.hasNext) {
      val parts = it.next().split("\\s+")
      parts(0) match {
        case "seqlen" => seqLen = parts(1).toInt
        case "features" => features = parts.drop(1).toSeq
        case "hidden" => hidden = parts(1).toInt
        case "matrix" =>
          val rows = parts(2).toInt
          mats(parts(1)) = Array.fill(rows)(doubles(it.next()))
        case "vector" => vecs(parts(1)) = doubles(it.next())
        case "edges" => edg(parts(1)) = doubles(it.next())
        case other => throw new IllegalArgumentException(
          s"unknown seqmodel section: $other")
      }
    }
    require(seqLen > 0 && hidden > 0 && features.nonEmpty,
      "seqmodel artifact missing seqlen/hidden/features")
    def gru(p: String) =
      GruLayer(mats(s"${p}_wih"), mats(s"${p}_whh"),
        vecs(s"${p}_bih"), vecs(s"${p}_bhh"))
    SequenceModel(features,
      features.map(f => f -> mats(s"embed_$f")).toMap, edg.toMap, seqLen,
      gru("fwd"), gru("bwd"),
      mats("cls_w1"), vecs("cls_b1"), mats("cls_w2"), vecs("cls_b2"))
  }

  /** `.gz` paths/resources decompress transparently — the full-size
    * converted reference checkpoint is ~8 MB of text, ~3.6 MB gzipped. */
  private def reader(path: String, in: java.io.InputStream): scala.io.Source =
    scala.io.Source.fromInputStream(
      if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(in) else in)

  def fromFile(path: String): SequenceModel = {
    val src = reader(path, new java.io.FileInputStream(path))
    try fromLines(src.getLines().toSeq) finally src.close()
  }

  def fromResource(path: String): SequenceModel = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"resource not found: $path")
    val src = reader(path, in)
    try fromLines(src.getLines().toSeq) finally src.close()
  }

  /** Sniff whether a model file is a seqmodel artifact (vs the
    * TreeEnsembleModel text format, whose first line is `features ...`). */
  def isSequenceArtifact(path: String): Boolean = {
    val src = reader(path, new java.io.FileInputStream(path))
    try src.getLines().find(_.trim.nonEmpty).exists(_.trim == "seqmodel")
    finally src.close()
  }

  /** Deterministic pseudo-random model (splitmix64-derived uniforms in
    * [-0.5, 0.5) scaled by 1/sqrt(fanIn)) — the committed-artifact stand-in
    * for a trained checkpoint, reproducible from (seed, shape) alone.
    * `featureSpec` is (name, cardinality, embedDim[, edges]); embedding
    * row 0 is zeroed (padding_idx). */
  def synthetic(featureSpec: Seq[(String, Int, Int)], hidden: Int,
                clsUnits: Int, seqLen: Int, seed: Long,
                edges: Map[String, Array[Double]] = Map.empty): SequenceModel = {
    var ctr = seed
    def u(): Double = {
      ctr += 0x9E3779B97F4A7C15L
      var z = ctr
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    def mat(r: Int, c: Int): Array[Array[Double]] = {
      val scale = 1.0 / math.sqrt(c.toDouble)
      Array.fill(r)(Array.fill(c)(u() * 2.0 * scale))
    }
    def vz(n: Int): Array[Double] = Array.fill(n)(u() * 0.1)
    val emb = featureSpec.map { case (f, card, dim) =>
      val m = mat(card + 1, dim)
      java.util.Arrays.fill(m(0), 0.0) // padding row
      f -> m
    }.toMap
    val e = featureSpec.map(_._3).sum
    def gru() = GruLayer(mat(3 * hidden, e), mat(3 * hidden, hidden),
      vz(3 * hidden), vz(3 * hidden))
    SequenceModel(featureSpec.map(_._1), emb, edges, seqLen, gru(), gru(),
      mat(clsUnits, 6 * hidden), vz(clsUnits), mat(2, clsUnits), vz(2))
  }
}

/** [[Scorer]] plug for [[SequenceModel]]: appends `target` = class-1
  * probability (rounded, reproducibly) to a frame carrying `seqCol` as the
  * `array<array<double>>` tensor `Sequences.assembleSequences` emits
  * (values are integer-valued feature indices). */
final case class SequenceScorer(model: SequenceModel, seqCol: String = "seq",
                                roundTo: Int = 6) extends Scorer {
  override def score(features: DataFrame): DataFrame = {
    val spark = features.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val idx = features.schema.fieldIndex(seqCol)
    val outSchema = features.schema.add("target", DoubleType)
    val scale = roundTo
    val rdd = features.rdd.mapPartitions { rows =>
      val m = bc.value
      rows.map { r =>
        val seq = r.getSeq[scala.collection.Seq[Double]](idx)
          .map(_.map(_.toInt).toArray).toArray
        val p = m.forward(seq)
        val rounded = BigDecimal(p)
          .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
        Row.fromSeq(r.toSeq :+ rounded)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
