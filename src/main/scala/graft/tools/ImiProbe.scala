package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measures the IMI-vs-flat-IVF ROUTING crossover the AnnIndex
  * Scaladoc claims (AnnIndex.scala `imi`: past ~10⁵ cells a flat
  * routing table costs `cells` full-dim evaluations per query and a
  * cells-row broadcast, where the IMI pays 2·√cells half-dim
  * evaluations) — VERDICT r16 item #6: "nothing has ever measured
  * it". Cost, not recall, is the question, so centroids are
  * deterministic splitmix vectors (routing work is independent of
  * centroid VALUES; recall parity is AnnIndexSpec/ann_imi_exh's
  * axis), and the cell count scales past what any local corpus's
  * occupancy anchor would pick.
  *
  * Per cell count C (k1 = √C):
  *  - routing: Q queries → top-nProbe cells. Flat = the ivf
  *    probeCells shape (crossJoin a broadcast C-row table, window
  *    rank). IMI = the imi qCells shape (two k1-row half crossJoins,
  *    k1² scalar pair sums, window rank).
  *  - assignment: n corpus vectors → cell id. Flat = cellOf's fused
  *    PqEncode over one C-entry book (C·dim mults/vector). IMI =
  *    PqEncode over two k1-entry half books (2·k1·dim/2 mults).
  *
  * Run: SPARK_GRAFT_SF_DIR=data/sf1 sbt "runMain graft.tools.ImiProbe"
  * → one JSON line for BENCH_imi_r{N}.json.
  */
object ImiProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-imi-probe")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val Dim = 64
    val Half = 32
    val NProbe = 64
    val NQueries = 100
    val NAssign = sys.env.getOrElse("SPARK_GRAFT_IMI_ASSIGN", "10000").toInt

    def mix(seed: Long): Iterator[Double] = new Iterator[Double] {
      var s = seed
      def hasNext = true
      def next(): Double = {
        s += 0x9e3779b97f4a7c15L
        var z = s
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
    }
    def book(n: Int, dim: Int, seed: Long): Array[Array[Double]] = {
      val it = mix(seed)
      Array.fill(n)(Array.fill(dim)(it.next()))
    }

    val vecs = graft.Tables.spread(
      graft.Tables.load(spark, sfDir, "embeddings"))
      .select($"vec_id", graft.functions.VectorFunctions.toDouble($"embedding").as("v"))
    val queries = graft.Tables.materializeSmall(
      vecs.filter($"vec_id" < NQueries).select($"vec_id".as("q_id"), $"v".as("qv")))
    val corpus = vecs.filter($"vec_id" >= NQueries).limit(NAssign)
      .select($"vec_id", $"v")
    corpus.count() // warm the scan

    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.dot(a, b)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      require(n > 0, "empty probe result")
      (System.nanoTime() - t0) / 1e9
    }

    val results = Seq(1024, 4096, 16384, 65536).map { cells =>
      val k1 = math.sqrt(cells).toInt
      require(k1 * k1 == cells)

      // ---- flat IVF ----
      val flatBook = book(cells, Dim, 7L)
      val flatCentroids = flatBook.zipWithIndex
        .map { case (c, i) => (i, c.toSeq, c.map(x => x * x).sum / 2) }
        .toSeq.toDF("cell", "cv", "chalf")
      val tFlatRoute = time {
        queries.crossJoin(broadcast(flatCentroids))
          .select($"q_id", $"cell", (dot($"qv", $"cv") - $"chalf").as("cdist"))
          .withColumn("crnk", row_number().over(
            Window.partitionBy($"q_id").orderBy($"cdist".desc, $"cell")))
          .filter($"crnk" <= NProbe).count()
      }
      val tFlatAssign = time {
        val enc = graft.functions.expressions.PqEncode($"v", Array(flatBook), Dim)
        corpus.select(element_at(enc, 1).as("cell")).groupBy($"cell")
          .count().count()
      }

      // ---- IMI (k1 × k1 product) ----
      val halfBooks = Array(book(k1, Half, 11L), book(k1, Half, 23L))
      def halfDf(h: Int) = halfBooks(h).zipWithIndex
        .map { case (c, i) => (i, c.toSeq, c.map(x => x * x).sum / 2) }
        .toSeq.toDF(s"i$h", s"cv$h", s"chalf$h")
      val tImiRoute = time {
        val s0 = queries.crossJoin(broadcast(halfDf(0)))
          .select($"q_id", $"qv", $"i0",
            (dot(slice($"qv", 1, Half), $"cv0") - $"chalf0").as("s0"))
        val s1 = queries.crossJoin(broadcast(halfDf(1)))
          .select($"q_id".as("q1"), $"i1",
            (dot(slice($"qv", Half + 1, Half), $"cv1") - $"chalf1").as("s1"))
        s0.join(s1, $"q_id" === $"q1")
          .select($"q_id", ($"i0" * k1 + $"i1").as("cell"),
            ($"s0" + $"s1").as("cdist"))
          .withColumn("crnk", row_number().over(
            Window.partitionBy($"q_id").orderBy($"cdist".desc, $"cell")))
          .filter($"crnk" <= NProbe).count()
      }
      val tImiAssign = time {
        val enc = graft.functions.expressions.PqEncode($"v", halfBooks, Half)
        corpus.select((element_at(enc, 1) * k1 + element_at(enc, 2)).as("cell"))
          .groupBy($"cell").count().count()
      }
      // the r17 serving path: multi-sequence traversal (ImiRoute) —
      // no k1² pair materialization
      val tMsqRoute = time {
        queries.select($"q_id", explode(graft.functions.expressions.ImiRoute(
          $"qv", halfBooks, Half, NProbe)).as("cell")).count()
      }

      println(f"[imi] cells=$cells%6d k1=$k1%3d  route flat ${tFlatRoute}%6.2f s" +
        f" vs imi-enum ${tImiRoute}%6.2f s vs imi-msq ${tMsqRoute}%6.2f s" +
        f" | assign($NAssign) flat ${tFlatAssign}%6.2f s vs imi ${tImiAssign}%6.2f s")
      (cells, tFlatRoute, tImiRoute, tMsqRoute, tFlatAssign, tImiAssign)
    }

    val json = results.map { case (c, fr, ir, mr, fa, ia) =>
      s"""{"cells":$c,"flat_route_s":$fr,"imi_enum_route_s":$ir,""" +
        s""""imi_msq_route_s":$mr,"flat_assign_s":$fa,"imi_assign_s":$ia}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"imi_crossover","queries":$NQueries,""" +
      s""""assign_vectors":$NAssign,"nprobe":$NProbe,"points":$json,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
