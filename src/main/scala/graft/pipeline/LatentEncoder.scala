package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.DoubleType

/**
 * Native VRAE latent encoder — the engine-side forward pass of the
 * reference's torch LSTM-VRAE *transform* path, closing the last torch
 * boundary in the `run.py` dataflow:
 *
 *   per-user dense feature sequence → single-layer LSTM
 *   (`vrae/vrae.py:30-47` Encoder: `_, (h_end, c_end) = lstm(x)`, keep the
 *   last layer's final hidden state) → `hidden_to_mean` linear
 *   (`vrae/vrae.py:57-84` Lambda; `self.training` is false on the transform
 *   path — `vrae.py:389` calls `self.eval()` — so the reparametrization
 *   noise branch is dead and the latent IS the mean) → 40-dim latent vector
 *   consumed as CatBoost features (`run.py:176-178,463-466`).
 *
 * Parity notes (pinned by `LatentEncoderSpec`):
 *  - torch LSTM gate math, gate order i,f,g,o in the stacked 4H weight
 *    rows: i = σ(W_ii x + b_ii + W_hi h + b_hi), f and o likewise,
 *    g = tanh(W_ig x + b_ig + W_hg h + b_hg);
 *    c' = f ⊙ c + i ⊙ g; h' = o ⊙ tanh(c').
 *  - The reference encoder is depth-1 (`run.py:145` hidden_layer_depth=1),
 *    hidden 120, latent 40, 394 input features (`run.py:104` cols + the 3
 *    appended cumsums); `h_end[-1]` is then just the final hidden state.
 *  - Dropout (0.1) lives INSIDE nn.LSTM between layers, so with depth 1 it
 *    is structurally a no-op — no eval-mode caveat needed here.
 *
 * Model artifact: committed TEXT (matrices of `Double.toString` literals,
 * bit-exact round-trip), emitted by `tools/convert_vrae_ckpt.py` from the
 * reference's `model_dir/vrae_5896.pth` (`run.py:176`) without torch.
 *
 * Scale: same shape as [[SequenceModel]] — one user_id shuffle to assemble
 * sequences, then an embarrassingly parallel per-user O(T · H · (F+H))
 * forward pass with the model broadcast once; the imperative recurrence is
 * the one justified `mapPartitions` class (brief option (d)).
 */
final case class LstmLayer(wIh: Array[Array[Double]], wHh: Array[Array[Double]],
                           bIh: Array[Double], bHh: Array[Double]) {
  val hidden: Int = bIh.length / 4
  require(wIh.length == 4 * hidden && wHh.length == 4 * hidden &&
    bHh.length == 4 * hidden, "LSTM weight shapes must be (4H x F)/(4H x H)/4H")

  private def dot(w: Array[Double], x: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += w(i) * x(i); i += 1 }
    s
  }
  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** One recurrence step; mutates nothing, returns (h', c'). */
  def step(x: Array[Double], h: Array[Double],
           c: Array[Double]): (Array[Double], Array[Double]) = {
    val hN = new Array[Double](hidden)
    val cN = new Array[Double](hidden)
    var j = 0
    while (j < hidden) {
      val i = sigmoid(dot(wIh(j), x) + bIh(j) + dot(wHh(j), h) + bHh(j))
      val f = sigmoid(dot(wIh(hidden + j), x) + bIh(hidden + j) +
        dot(wHh(hidden + j), h) + bHh(hidden + j))
      val g = math.tanh(dot(wIh(2 * hidden + j), x) + bIh(2 * hidden + j) +
        dot(wHh(2 * hidden + j), h) + bHh(2 * hidden + j))
      val o = sigmoid(dot(wIh(3 * hidden + j), x) + bIh(3 * hidden + j) +
        dot(wHh(3 * hidden + j), h) + bHh(3 * hidden + j))
      cN(j) = f * c(j) + i * g
      hN(j) = o * math.tanh(cN(j))
      j += 1
    }
    (hN, cN)
  }
}

final case class LatentEncoderModel(
    nFeatures: Int,
    lstm: LstmLayer,
    /** `hidden_to_mean`: latent x hidden weight + latent bias. */
    meanW: Array[Array[Double]], meanB: Array[Double]) {

  val hidden: Int = lstm.hidden
  val latent: Int = meanB.length
  require(meanW.length == latent && meanW(0).length == hidden,
    "mean head must be (latent x hidden)")

  /** Latent mean vector for one user's (T x F) dense sequence. */
  def transform(seq: Array[Array[Double]]): Array[Double] = {
    require(seq.nonEmpty, "empty sequence")
    var h = new Array[Double](hidden)
    var c = new Array[Double](hidden)
    var i = 0
    while (i < seq.length) {
      val hc = lstm.step(seq(i), h, c)
      h = hc._1; c = hc._2
      i += 1
    }
    val z = new Array[Double](latent)
    var j = 0
    while (j < latent) {
      var s = meanB(j); var k = 0
      while (k < hidden) { s += meanW(j)(k) * h(k); k += 1 }
      z(j) = s; j += 1
    }
    z
  }

  /** Text artifact (grammar mirrors [[SequenceModel.toLines]]). */
  def toLines: Seq[String] = {
    def mat(name: String, m: Array[Array[Double]]): Seq[String] =
      s"matrix $name ${m.length} ${m(0).length}" +: m.toSeq.map(_.mkString(" "))
    def vec(name: String, v: Array[Double]): Seq[String] =
      Seq(s"vector $name ${v.length}", v.mkString(" "))
    Seq("latentmodel", s"nfeatures $nFeatures", s"hidden $hidden",
      s"latent $latent") ++
      mat("enc_wih", lstm.wIh) ++ mat("enc_whh", lstm.wHh) ++
      vec("enc_bih", lstm.bIh) ++ vec("enc_bhh", lstm.bHh) ++
      mat("mean_w", meanW) ++ vec("mean_b", meanB)
  }
}

object LatentEncoderModel {

  def fromLines(lines: Seq[String]): LatentEncoderModel = {
    val it = lines.iterator.map(_.trim).filter(_.nonEmpty).buffered
    require(it.hasNext && it.next() == "latentmodel",
      "latent encoder artifact must start with 'latentmodel'")
    var nFeatures = 0
    val mats = scala.collection.mutable.Map[String, Array[Array[Double]]]()
    val vecs = scala.collection.mutable.Map[String, Array[Double]]()
    def doubles(s: String): Array[Double] =
      s.split("\\s+").map(java.lang.Double.parseDouble)
    while (it.hasNext) {
      val parts = it.next().split("\\s+")
      parts(0) match {
        case "nfeatures" => nFeatures = parts(1).toInt
        case "hidden" | "latent" => // derived from the weight shapes
        case "matrix" =>
          val rows = parts(2).toInt
          mats(parts(1)) = Array.fill(rows)(doubles(it.next()))
        case "vector" => vecs(parts(1)) = doubles(it.next())
        case other => throw new IllegalArgumentException(
          s"unknown latentmodel section: $other")
      }
    }
    require(nFeatures > 0, "latentmodel artifact missing nfeatures")
    LatentEncoderModel(nFeatures,
      LstmLayer(mats("enc_wih"), mats("enc_whh"),
        vecs("enc_bih"), vecs("enc_bhh")),
      mats("mean_w"), vecs("mean_b"))
  }

  private def reader(path: String, in: java.io.InputStream): scala.io.Source =
    scala.io.Source.fromInputStream(
      if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(in) else in)

  def fromFile(path: String): LatentEncoderModel = {
    val src = reader(path, new java.io.FileInputStream(path))
    try fromLines(src.getLines().toSeq) finally src.close()
  }

  def fromResource(path: String): LatentEncoderModel = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"resource not found: $path")
    val src = reader(path, in)
    try fromLines(src.getLines().toSeq) finally src.close()
  }

  /** Sniff for the artifact dispatch in `graft.Submit`. */
  def isLatentArtifact(path: String): Boolean = {
    val src = reader(path, new java.io.FileInputStream(path))
    try src.getLines().find(_.trim.nonEmpty).exists(_.trim == "latentmodel")
    finally src.close()
  }

  /** Deterministic pseudo-random model (same splitmix64 recipe as
    * [[SequenceModel.synthetic]]) — reproducible from (seed, shape). */
  def synthetic(nFeatures: Int, hidden: Int, latent: Int,
                seed: Long): LatentEncoderModel = {
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
    LatentEncoderModel(nFeatures,
      LstmLayer(mat(4 * hidden, nFeatures), mat(4 * hidden, hidden),
        vz(4 * hidden), vz(4 * hidden)),
      mat(latent, hidden), vz(latent))
  }
}

/** Appends `z_0..z_{L-1}` latent columns (rounded, reproducibly) to a frame
  * carrying `seqCol` as the dense `array<array<double>>` tensor
  * `Sequences.assembleSequences` emits — the engine form of
  * `vrae.transform(...)` → `df_z` (`run.py:178-179`). */
final case class LatentTransformer(model: LatentEncoderModel,
                                   seqCol: String = "seq",
                                   prefix: String = "z_",
                                   roundTo: Int = 6) {
  def transform(features: DataFrame): DataFrame = {
    val spark = features.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val idx = features.schema.fieldIndex(seqCol)
    val outSchema = (0 until model.latent).foldLeft(features.schema) {
      (s, j) => s.add(s"$prefix$j", DoubleType)
    }
    val scale = roundTo
    val rdd = features.rdd.mapPartitions { rows =>
      val m = bc.value
      rows.map { r =>
        val seq = r.getSeq[scala.collection.Seq[Double]](idx)
          .map(_.toArray).toArray
        val z = m.transform(seq).map(v => BigDecimal(v)
          .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
        Row.fromSeq(r.toSeq ++ z)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
