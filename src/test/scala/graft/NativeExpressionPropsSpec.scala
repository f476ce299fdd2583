package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions._

/** Property-based checks of the native Catalyst expressions against
  * independent plain-Scala models (the models recompute md5 etc. from
  * the documented contracts, sharing no code with the expressions).
  * The oracle gate proves these on the corpus; the properties prove
  * them on arbitrary inputs — empty arrays, unicode, ties, duplicate
  * scores — where corpus data never treads. */
class NativeExpressionPropsSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def md5(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
  private def hash32(s: String): Long = {
    val d = md5(s)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  private val token: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(12)), Gen.oneOf("", "a", "π", "句", ""))
  private val tokens: Gen[List[String]] = Gen.listOfN(40, token).map(_.take(40))
  private def utf8Array(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  test("HashingCounts matches the first-md5-byte-mod-dim model (and normalized variant)") {
    val dim = 64
    check(Prop.forAll(tokens) { ts =>
      val got = HashingCounts(Literal(null), dim)
        .nullSafeEval(utf8Array(ts)).asInstanceOf[GenericArrayData].toDoubleArray()
      val exp = new Array[Double](dim)
      ts.foreach(t => exp((md5(t)(0) & 0xFF) % dim) += 1.0)
      val gotN = HashingCounts(Literal(null), dim, normalized = true)
        .nullSafeEval(utf8Array(ts)).asInstanceOf[GenericArrayData].toDoubleArray()
      val nrm = math.sqrt(exp.map(x => x * x).sum)
      val expN = exp.map(x => BigDecimal(x / nrm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      got.sameElements(exp) && (ts.isEmpty || gotN.sameElements(expN))
    })
  }

  test("TokenCounts matches the multiset model: counts exact, tokens sorted, nulls dropped") {
    check(Prop.forAll(tokens) { ts =>
      val got = TokenCounts(Literal(null))
        .nullSafeEval(utf8Array(ts)).asInstanceOf[GenericArrayData]
      val pairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
      val exp = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // exact multiset counts
      val countsOk = pairs.toMap == exp && pairs.map(_._2).sum == ts.size
      // one struct per distinct token, sorted by UTF8 binary order
      val sortedOk = pairs.map(_._1) ==
        exp.keys.toSeq.map(UTF8String.fromString)
          .sorted(Ordering.comparatorToOrdering(
            java.util.Comparator.naturalOrder[UTF8String]()))
          .map(_.toString)
      countsOk && sortedOk
    })
    // null ELEMENTS drop (tokens() never yields them; the contract
    // still pins the behavior)
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("a")))
    val got = TokenCounts(Literal(null)).nullSafeEval(withNull)
      .asInstanceOf[GenericArrayData]
    assert(got.numElements() == 1 && got.getStruct(0, 2).getLong(1) == 2L)
  }

  test("embedTextLocal/embedImageLocal match the distributed embedders bit-for-bit") {
    // the serving path embeds queries driver-side; any drift from the
    // tokens()+HashingCounts pipeline would silently skew every ANN
    // probe — so compare against the actual SQL expressions, including
    // SQL trim/split edge semantics (tabs, newlines, edge spaces)
    val sep: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val text: Gen[String] = for {
      ts <- Gen.listOfN(10, token)
      ss <- Gen.listOfN(11, sep)
      pad <- Gen.oneOf("", " ", "\t", "  ")
    } yield pad + ts.zip(ss).map { case (t, s) => t + s }.mkString + pad
    val spark = SparkTestSession.spark
    import spark.implicits._
    check(Prop.forAll(text) { s =>
      val row = Seq(Tuple1(s)).toDF("t").select(
        graft.operators.VectorStore.embedText($"t").as("te"),
        graft.operators.VectorStore.embedImage($"t").as("ie")).collect()(0)
      row.getSeq[Double](0) == graft.operators.VectorStore.embedTextLocal(s).toSeq &&
        row.getSeq[Double](1) == graft.operators.VectorStore.embedImageLocal(s).toSeq
    }, n = 60)
  }

  test("SimHash60 matches the hex-digit vote model") {
    check(Prop.forAll(tokens) { ts =>
      val got = SimHash60(Literal(null)).nullSafeEval(utf8Array(ts)).asInstanceOf[Long]
      val votes = new Array[Int](60)
      ts.foreach { t =>
        val d = md5(t)
        for (bit <- 0 until 60) {
          val digit = bit / 4
          val b0 = d(digit / 2) & 0xFF
          val nibble = if (digit % 2 == 0) b0 >>> 4 else b0 & 0xF
          votes(bit) += (((nibble >>> (3 - bit % 4)) & 1) * 2) - 1
        }
      }
      got == votes.foldLeft(0L)((acc, v) => acc * 2 + (if (v > 0) 1L else 0L))
    })
  }

  test("MinHashSignature matches the affine-permutation model") {
    val seeds = 16
    val P = 4294967311L
    val as = (0 until seeds).map(k => 1L + hash32(s"mha:$k") % ((1L << 31) - 1))
    val bs = (0 until seeds).map(k => hash32(s"mhb:$k") % P)
    check(Prop.forAll(tokens) { ts =>
      val got = MinHashSignature(Literal(null), seeds)
        .nullSafeEval(utf8Array(ts)).asInstanceOf[GenericArrayData].toLongArray()
      val exp = (0 until seeds).map { k =>
        if (ts.isEmpty) Long.MaxValue
        else ts.map(t => (as(k) * hash32(t) + bs(k)) % P).min
      }.toArray
      got.sameElements(exp)
    })
  }

  test("DotProduct eval matches a left-fold model bit-for-bit, shorter-prefix lengths") {
    val arr = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3)).map(_.toArray)
    check(Prop.forAll(arr, arr, Gen.chooseNum(0, 16)) { (a, b, cut) =>
      val bc = b.take(cut)
      val got = DotProduct(Literal(null), Literal(null))
        .nullSafeEval(new GenericArrayData(a), new GenericArrayData(bc))
        .asInstanceOf[Double]
      var exp = 0.0
      for (i <- 0 until math.min(a.length, bc.length)) exp += a(i) * bc(i)
      java.lang.Double.compare(got, exp) == 0
    })
  }

  test("TopKBuffer: arbitrary insert orders and split-merges equal sort-take-k, with ties") {
    val pair = for {
      s <- Gen.oneOf(0.0, 0.5, 0.5, 1.0, -1.0, 2.5) // duplicates force ties
      id <- Gen.chooseNum(0L, 30L)
    } yield (s, id)
    val pairs = Gen.listOf(pair)
    check(Prop.forAll(pairs, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) { (ps, k, splitSeed) =>
      val exp = ps.sortBy { case (s, id) => (-s, id) }.take(k)
      val single = new TopKBuffer(k)
      ps.foreach { case (s, id) => single.insert(s, id) }
      // split into two buffers at an arbitrary point, merge
      val cut = if (ps.isEmpty) 0 else splitSeed % (ps.size + 1)
      val (l, r) = ps.splitAt(cut)
      val bl = new TopKBuffer(k); l.foreach { case (s, id) => bl.insert(s, id) }
      val br = new TopKBuffer(k); r.foreach { case (s, id) => br.insert(s, id) }
      bl.merge(br)
      def contents(buf: TopKBuffer) =
        (0 until buf.n).map(i => (buf.scores(i), buf.ids(i))).toList
      contents(single) == exp && contents(bl) == exp
    })
  }

  test("TopKByScore codegen/exec path agrees with the buffer model on a generated frame") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(3000) { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(5) / 2.0, i.toLong) // few groups, tied scores
    }
    val df = rows.toDF("g", "s", "id").repartition(8)
    val got = df.groupBy($"g")
      .agg(TopKByScore($"s", $"id", 4).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"col.score", $"col.id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val exp = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map { case (_, s, id) => (s, id) }.sortBy { case (s, id) => (-s, id) }
        .take(4).map { case (s, id) => (g, s, id) }
    }.toSet
    assert(got == exp)
  }

  test("PqEncode: fused encoder == slice/dot/argmax Column reference == plain model (ties, ragged dims)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val subDim = 4
    val m = 4; val k = 5
    // quantized values make score TIES common — the first-max
    // tie-break is the contract most worth pinning
    val books = Array.tabulate(m, k, subDim)((_, _, _) => (rnd.nextInt(5) - 2) / 2.0)
    val vecs = Seq.tabulate(300)(i =>
      (i.toLong, Seq.tabulate(m * subDim)(_ => (rnd.nextInt(5) - 2) / 2.0)))
    // ragged lengths: shorter than m·subDim (partial + missing
    // subspaces), empty, and longer (extra dims ignored)
    val ragged = Seq((1000L, Seq(0.5)), (1001L, Seq.empty[Double]),
      (1002L, Seq.tabulate(m * subDim + 3)(_ => 0.25)))
    val df = (vecs ++ ragged).toDF("id", "v").repartition(4)
    val got = df.select($"id", PqEncode($"v", books, subDim).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val ref = df.select($"id", array((0 until m).map(i =>
        graft.operators.AnnIndex.encodeSubModel(i, books(i))): _*).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got == ref, "fused encoder must equal the Column reference bit-for-bit")
    val model = (vecs ++ ragged).map { case (id, v) =>
      id -> (0 until m).map { mi =>
        val base = mi * subDim
        val scores = books(mi).map { c =>
          (0 until subDim).map(d =>
            if (base + d < v.length) v(base + d) * c(d) else 0.0).sum -
            c.map(x => x * x).sum / 2
        }
        scores.indexOf(scores.max)
      }.toList
    }.toMap
    assert(got == model, "fused encoder must equal the plain-Scala model")
  }

  test("RpSignature: fused signatures == per-plane Column reference == plain model (ragged dims)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val tables = 3; val planes = 5
    val mat = graft.operators.AnnIndex.planeMatrix(tables, planes)
    val vecs = Seq.tabulate(200)(i =>
      (i.toLong, Seq.tabulate(64)(_ => rnd.nextDouble() * 2 - 1)))
    // ragged lengths: shorter than the 64-dim planes (prefix dot),
    // empty (all-zero dot -> all '1': 0.0 >= 0), and longer (extra
    // dims ignored — the min-length contract)
    val ragged = Seq((1000L, Seq(0.5, -0.25)), (1001L, Seq.empty[Double]),
      (1002L, Seq.tabulate(70)(_ => -0.1)))
    val df = (vecs ++ ragged).toDF("id", "v").repartition(4)
    val got = df.select($"id", RpSignature($"v", mat).as("sg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // the replaced formulation: per-plane when(dot >= 0) literals
    val refCols = (0 until tables).map(t => concat_ws("", (0 until planes).map(p =>
      when(DotProduct($"v", typedLit(mat(t)(p).toSeq)) >= 0, lit(1))
        .otherwise(lit(0)).cast("string")): _*))
    val ref = df.select($"id", array(refCols: _*).as("sg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got == ref, "fused signatures must equal the Column reference bit-for-bit")
    val model = (vecs ++ ragged).map { case (id, v) =>
      id -> mat.map(tbl => tbl.map { plane =>
        val n = math.min(v.length, plane.length)
        var acc = 0.0; var i = 0
        while (i < n) { acc += v(i) * plane(i); i += 1 }
        if (acc >= 0) '1' else '0'
      }.mkString).toList
    }.toMap
    assert(got == model, "fused signatures must equal the plain-Scala model")
    // the INTERPRETED eval path too (codegen fallback): the frame runs
    // above exercise only the generated code
    (vecs ++ ragged).foreach { case (id, v) =>
      val arr = RpSignature(Literal(null), mat)
        .nullSafeEval(new GenericArrayData(v.toArray[Any]))
        .asInstanceOf[GenericArrayData]
      val sigs = (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toList
      assert(sigs == model(id), s"interpreted eval diverges for id=$id")
    }
  }

  test("ParseGft round-trips arbitrary well-formed containers (unicode bodies, byte offsets)") {
    val pageBody: Gen[String] = for {
      n <- Gen.chooseNum(0, 40)
      cs <- Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar, Gen.const(' '), Gen.const('π'), Gen.const('句')))
    } yield cs.mkString
    val image: Gen[(String, Array[Double])] = for {
      id <- Gen.listOfN(8, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
      c <- Gen.listOfN(4, Gen.chooseNum(0, 9999))
    } yield (id, c.map(_.toDouble).toArray)
    val doc: Gen[List[(String, List[(String, Array[Double])])]] =
      Gen.listOfN(4, Gen.zip(pageBody, Gen.listOfN(2, image))).map(_.map {
        case (p, is) => (p, is)
      })
    check(Prop.forAll(doc) { pages =>
      val payload = pages.map { case (body, images) =>
        val len = body.getBytes("UTF-8").length
        f"PG$len%04d$body" + images.map { case (id, c) =>
          s"IM$id" + c.map(x => f"${x.toInt}%04d").mkString
        }.mkString
      }.mkString
      val rows = ParseGft(Literal(null))
        .nullSafeEval(UTF8String.fromString(payload))
        .asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[
          org.apache.spark.sql.catalyst.InternalRow])
      val textRows = rows.filter(_.getUTF8String(1).toString == "text_block")
      val imgRows = rows.filter(_.getUTF8String(1).toString == "image")
      val bodiesOk = textRows.map(_.getUTF8String(3).toString).toSeq ==
        pages.map(_._1)
      // byte offsets: y0 of page i == cumulative octet length of 0..i-1
      val offs = pages.map(_._1.getBytes("UTF-8").length.toDouble)
        .scanLeft(0.0)(_ + _)
      val offsOk = textRows.zipWithIndex.forall { case (r, i) =>
        r.getDouble(5) == offs(i) && r.getDouble(7) == offs(i + 1)
      }
      val imgsOk = imgRows.length == pages.map(_._2.size).sum &&
        imgRows.zip(pages.flatMap(_._2)).forall { case (r, (id, c)) =>
          r.getUTF8String(2).toString == id &&
            (0 until 4).forall(k => r.getDouble(4 + k) == c(k))
        }
      bodiesOk && offsOk && imgsOk
    }, n = 100)
  }

  test("zValue16 interleaves the low 16 bits of both columns (model parity on a frame)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 16), rnd.nextInt(1 << 16)))
    val got = pts.toDF("a", "b")
      .select(graft.functions.VectorFunctions.zValue16($"a", $"b").as("z"))
      .collect().map(_.getLong(0))
    val exp = pts.map { case (a, b) =>
      (0 until 16).map { i =>
        (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
      }.sum
    }
    assert(got.sameElements(exp))
  }
}
