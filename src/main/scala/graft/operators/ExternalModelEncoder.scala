package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.TextFunctions.tokens
import graft.functions.expressions.{MlpEncode, MlpModel}

/** The EXTERNAL-MODEL bridge for the channel registry — how a user
  * holding real encoder weights serves them through graft with zero
  * per-channel code (reference analog: `SentenceTransformer(...)` /
  * `CLIPModel.from_pretrained(...)`, vector_db.py:451-545, which load
  * weight FILES a training run produced elsewhere).
  *
  * The on-disk format is GEM1, a deliberately minimal public layout
  * (all big-endian via DataOutputStream):
  * {{{
  *   magic   "GEM1"
  *   featDim int     hashed bag-of-tokens width (FNV-1a 64 + seed)
  *   seed    long
  *   nLayers int
  *   per layer: outDim int, inDim int, act byte (0 none/1 relu/2 tanh),
  *              weights outDim×inDim double (row-major), bias outDim double
  * }}}
  * Anything expressible as token-features → dense layers exports into
  * it (a distilled MiniLM-class text tower fits exactly this shape);
  * the loader validates every declared dimension and fails loudly on
  * a truncated or mis-shaped file.
  *
  * THE SWAP POINT for a real runtime: [[MlpModel.forwardBatch]] is
  * the one method [[embedBatch]] calls per batch — an ONNX/torch
  * bridge replaces its body with a session invocation (same
  * [batch, featDim] → [batch, dim] contract) and keeps the
  * partition-init + batching + ChannelDef wiring below unchanged.
  *
  * Three serving forms, bit-identical by construction (one forward
  * fold shared by all — ChannelRegistrySpec asserts the parity):
  *  - [[channel]].encode — the in-plan Column ([[MlpEncode]], torrent
  *    broadcast) for ingest pipelines and scan-side query embedding;
  *  - [[channel]].encodeLocal — the driver-local one-job form;
  *  - [[embedBatch]] — mapPartitions batch inference: the model
  *    initializes ONCE per partition (the session-per-executor
  *    pattern heavy runtimes need) and inputs run through
  *    [[MlpModel.forwardBatch]] in fixed-size batches.
  */
object ExternalModelEncoder {

  private val Magic = Array[Byte]('G', 'E', 'M', '1')
  /** Declared-dimension sanity bound: a corrupt header must fail on
    * its numbers, not on an allocator OOM. */
  private val MaxDim = 1 << 20

  /** Write a model in GEM1 form (the export half a user's training
    * script mirrors). */
  def save(model: MlpModel, path: String): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      out.write(Magic)
      out.writeInt(model.featDim)
      out.writeLong(model.seed)
      out.writeInt(model.layers.length)
      model.layers.foreach { l =>
        out.writeInt(l.outDim); out.writeInt(l.inDim); out.writeByte(l.act)
        l.w.foreach(row => row.foreach(out.writeDouble))
        l.b.foreach(out.writeDouble)
      }
    } finally out.close()
  }

  /** Load and validate a GEM1 file; loud on every malformation. */
  def load(path: String): MlpModel =
    load(new BufferedInputStream(new FileInputStream(path)), path)

  /** Stream form — the per-partition session init reads the broadcast
    * file bytes directly (no executor temp files). */
  private def load(raw: java.io.InputStream, what: String): MlpModel = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"GEM load ($what): $msg")
    val in = new DataInputStream(raw)
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!magic.sameElements(Magic)) fail("not a GEM1 file (bad magic)")
      val featDim = in.readInt()
      if (featDim <= 0 || featDim > MaxDim) fail(s"feature width $featDim out of range")
      val seed = in.readLong()
      val nLayers = in.readInt()
      if (nLayers <= 0 || nLayers > 64) fail(s"layer count $nLayers out of range")
      val layers = Array.tabulate(nLayers) { li =>
        val outDim = in.readInt(); val inDim = in.readInt(); val act = in.readByte().toInt
        if (outDim <= 0 || outDim > MaxDim || inDim <= 0 || inDim > MaxDim)
          fail(s"layer $li shape ${outDim}x$inDim out of range")
        if (act < 0 || act > 2) fail(s"layer $li unknown activation $act")
        val w = Array.fill(outDim)(Array.fill(inDim)(in.readDouble()))
        val b = Array.fill(outDim)(in.readDouble())
        new MlpModel.Layer(outDim, inDim, act, w, b)
      }
      if (in.read() != -1) fail("trailing bytes after the declared layers")
      try new MlpModel(featDim, seed, layers)
      catch { case e: IllegalArgumentException => fail(e.getMessage) }
    } catch {
      case _: java.io.EOFException => fail("truncated file")
    } finally in.close()
  }

  /** A ready [[GraftVectorDB.ChannelDef]] from a model file: register
    * it and the WHOLE lifecycle (ingest-with-index-append, ANN/PQ
    * build + search, delete, maintenance) serves the external model
    * with no further code. The model broadcasts once per session. */
  def channel(spark: SparkSession, name: String,
      contentTypes: Seq[String], path: String): GraftVectorDB.ChannelDef = {
    val model = load(path)
    val bc = spark.sparkContext.broadcast(model)
    GraftVectorDB.ChannelDef(name, contentTypes,
      (c: Column) => MlpEncode(tokens(c), bc),
      (s: String) => model.embed(s),
      model.dim)
  }

  /** Batch-inference embedding over a whole frame: appends `outCol`
    * (array<double>) computed from `inCol` through the model in
    * `batchSize` groups per partition. The mapPartitions shape a
    * heavyweight runtime needs — model/session init happens ONCE per
    * partition, rows stream through fixed-size batches (bounded
    * memory at any partition size), and the output order preserves
    * the input order. Used for BULK (re-)embedding jobs; in-plan
    * ingest uses [[channel]].encode, which stays inside codegen. */
  def embedBatch(df: DataFrame, inCol: String, outCol: String,
      path: String, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = df.sparkSession
    // ship the FILE BYTES, not the deserialized net: the per-partition
    // init below is the real session-construction seam
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bcBytes = spark.sparkContext.broadcast(bytes)
    val inIdx = df.schema.fieldIndex(inCol)
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType))
    val rowEnc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      // session init, once per partition (per executor core) — the
      // model deserializes from the broadcast file bytes; a real
      // runtime bridge would hand the same bytes to its session ctor
      val model = load(
        new java.io.ByteArrayInputStream(bcBytes.value), "broadcast bytes")
      it.grouped(batchSize).flatMap { batch =>
        val feats = batch.map { r =>
          // trim spaces + split, the tokens() Column twin
          val t = Option(r.getString(inIdx)).getOrElse("")
          var a = 0; var b = t.length
          while (a < b && t.charAt(a) == ' ') a += 1
          while (b > a && t.charAt(b - 1) == ' ') b -= 1
          model.featurize(t.substring(a, b).split("\\s+", -1).iterator)
        }.toArray
        val vecs = model.forwardBatch(feats)
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ (v.toSeq: Seq[Double]))
        }
      }
    }(rowEnc)
  }
}
