package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Relational}

/** LSH exactness and sketch error bounds, proven in-Spark. */
class DedupExactnessSpec extends AnyFunSuite {
  import SparkTestSession._

  test("minhash LSH output == exact all-pairs jaccard at the threshold") {
    import spark.implicits._
    val sets = Tables.load(spark, sf, "documents")
      .select($"doc_id", array_distinct(shingles(tokens($"text"), 2)).as("s"))
    val a = sets.select($"doc_id".as("a_id"), $"s".as("sa"))
    val b = sets.select($"doc_id".as("b_id"), $"s".as("sb"))
    val exact = a.crossJoin(b).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        round(size(array_intersect($"sa", $"sb")).cast("double") /
          size(array_union($"sa", $"sb")), 4).as("j_r"))
      .filter($"j_r" >= Dedup.JaccardThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact,
      s"missed: ${exact -- lsh}; spurious: ${lsh -- exact}")
  }

  test("dd_semdedup: pairs are the exact within-cluster subset under the argmax assignment") {
    import spark.implicits._
    val sd = Dedup.semdedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("cl"), r.getAs[Long]("a_id"),
        r.getAs[Long]("b_id"), r.getAs[Double]("sim_r")))
    assert(sd.nonEmpty, "seeded clustering must surface within-cluster pairs")
    // 1) precision: every semdedup pair is a global all-pairs match
    val global = Dedup.embedPairs(spark, sf, audit = true).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("sim_r"))).toSet
    assert(sd.map(p => (p._2, p._3, p._4)).toSet.subsetOf(global))
    // 2) the cluster partition is the 6dp argmax over the seeds, and
    // the emitted pairs are EXACTLY the global pairs whose members
    // co-cluster — recomputed independently in plain Scala
    val vecs = Tables.load(spark, sf, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    def nrm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum / (nrm(a) * nrm(b))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val seeds = (0L until Dedup.SemClusters.toLong).map(i => i -> vecs(i))
    val clOf = vecs.map { case (id, v) =>
      id -> seeds.map { case (cl, cv) => (-r6(cos(v, cv)), cl) }.min._2 }
    sd.foreach { case (cl, a, b, _) =>
      assert(clOf(a) == cl && clOf(b) == cl, s"pair ($a,$b) cluster $cl") }
    val expected = global.filter { case (a, b, _) => clOf(a) == clOf(b) }
    assert(sd.map(p => (p._2, p._3, p._4)).toSet == expected,
      "semdedup must emit exactly the co-clustered global pairs")
    // 4) fitted config: exact precision (same verify), recall bounded
    // by its own cluster partition — measured, not assumed
    val fit = Dedup.semdedupFitted(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("sim_r"))).toSet
    assert(fit.nonEmpty && fit.subsetOf(global),
      s"fitted pairs must be global pairs; spurious: ${fit -- global}")
    info(f"semdedup recall vs global all-pairs: seeded ${
      sd.length.toDouble / global.size}%.2f, fitted ${
      fit.size.toDouble / global.size}%.2f (${global.size} global)")
  }

  test("semdedupFitted hierarchical branch: planted duplicates found, precision exact") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    // corpus vectors + 3 planted exact copies under fresh ids — an
    // identical vector ALWAYS co-clusters with its original (same
    // argmax at both stages), so the planted pairs are a recall-1.0
    // oracle for the hierarchical assignment specifically
    val base = Tables.spread(Tables.load(spark, sf, "embeddings"))
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", l2Norm($"v"))
    val planted = base.filter($"vec_id".isin(3L, 57L, 111L))
      .select(($"vec_id" + 100000L).as("vec_id"), $"v", $"nrm")
    val v = base.unionByName(planted)
    val n = v.count()
    // occupancy 2 → k ≈ n/2 ≫ flatMax 8 → the hierarchical path runs
    val pairs = Dedup.semdedupFittedOf(v, n, occupancy = 2L, flatMax = 8)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("sim_r")))
    Seq(3L, 57L, 111L).foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 100000L && p._3 == 1.0),
        s"planted duplicate pair ($id, ${id + 100000L}) missed")
    }
    // precision: every emitted pair meets the threshold against the
    // exact cosine recomputed independently
    val byId = v.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Double](r.fieldIndex("v")).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    pairs.foreach { case (a, b, s) =>
      val exact = BigDecimal(cos(byId(a), byId(b)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(exact == s && s >= Dedup.EmbedThreshold, s"pair ($a,$b): $s vs $exact")
    }
    // determinism: the whole fit/assign/verify replays identically
    val again = Dedup.semdedupFittedOf(v, n, occupancy = 2L, flatMax = 8)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(again.toSeq == pairs.map(p => (p._1, p._2)).toSeq)
  }

  test("semdedup hot-cluster guard: a planted giant near-dup cluster sub-splits to bounded join keys") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    // a giant near-dup family — 301 perturbed copies of one corpus
    // vector all carrying ONE cluster id — is the adversarial mass the
    // occupancy anchor cannot see (it holds the MEAN cluster size, not
    // the max); without the guard the verify join puts 301² rows on a
    // single key
    val base0 = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
    val fam = base0.filter($"vec_id" === 0L)
      .crossJoin(spark.range(301).select($"id"))
      .select(($"id" + 100000L).as("vec_id"),
        transform($"v", (x, i) =>
          x + (pmod(xxhash64($"id", i), lit(1000)).cast("double") / 1000 - 0.5) * 0.02).as("v"),
        lit(0L).as("cl"))
    val cold = base0.filter($"vec_id" > 0 && $"vec_id" <= 100)
      .select($"vec_id", $"v", (($"vec_id" % 4) + 1).as("cl"))
    val assigned = fam.unionByName(cold)
      .withColumn("nrm", l2Norm($"v"))
      .select($"vec_id", $"v", $"nrm", $"cl")
    val hotCap = 32L
    val guarded = Dedup.semdedupHotGuard(assigned, hotCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // no vector lost or duplicated by the re-assignment
      val inIds = assigned.select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq
      val outIds = guarded.select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(outIds == inIds, "guard must preserve the row multiset")
      // cold clusters pass through untouched
      val coldOut = guarded.filter($"vec_id" <= 100)
        .select($"vec_id", $"cl").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      cold.collect().foreach(r =>
        assert(coldOut(r.getLong(0)) == r.getLong(2), s"cold row ${r.getLong(0)} moved"))
      // THE pin: no post-guard cluster exceeds the cap — the verify
      // join's per-key row count is bounded
      val sizes = guarded.groupBy($"cl").count().collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(sizes.forall(_._2 <= hotCap),
        s"hot cluster survived the guard: ${sizes.filter(_._2 > hotCap).toSeq}")
      // hot members landed on FRESH globally-unique ids (> the old max)
      val famCls = guarded.filter($"vec_id" >= 100000L)
        .select($"cl").distinct().collect().map(_.getLong(0))
      assert(famCls.forall(_ > 4L) && famCls.length > 1,
        s"family must sub-split onto fresh ids, got ${famCls.toSeq}")
      // determinism: the guard replays identically
      val again = Dedup.semdedupHotGuard(assigned, hotCap)
        .select($"vec_id", $"cl").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(again == guarded.select($"vec_id", $"cl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    } finally guarded.unpersist(blocking = false)
    // end-to-end through the fitted operator on the same mass:
    // precision stays exact (every pair meets the recomputed 4dp
    // cosine), recall on the family is REPORTED (sub-splitting trades
    // cross-sub pairs for the join-size bound, by design)
    val v = base0.limit(200).unionByName(fam.drop("cl"))
      .withColumn("nrm", l2Norm($"v"))
    val n = v.count()
    val pairs = Dedup.semdedupFittedOf(v, n, occupancy = 64L, flatMax = 1000)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("sim_r")))
    val byId = v.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Double](r.fieldIndex("v")).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    pairs.foreach { case (a, b, s) =>
      assert(r4(cos(byId(a), byId(b))) == s && s >= Dedup.EmbedThreshold,
        s"pair ($a,$b): $s") }
    val famIds = byId.keys.filter(_ >= 100000L).toSeq.sorted
    val famPairs = (for { i <- famIds.indices; j <- i + 1 until famIds.length
      if r4(cos(byId(famIds(i)), byId(famIds(j)))) >= Dedup.EmbedThreshold }
      yield (famIds(i), famIds(j))).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    info(f"family recall under the guard: ${
      (found & famPairs).size.toDouble / math.max(1, famPairs.size)}%.2f " +
      f"(${famPairs.size} exact family pairs)")
  }

  test("connectedComponents: min-label parity with driver union-find; O(log) rounds on a long chain") {
    import spark.implicits._
    // adversarial diameter: a 1024-node chain (one-hop propagation
    // would pay ~diameter rounds here) plus a random sparse graph
    // with many components — both through the one star-contraction
    // loop dd_cluster runs in production
    val rnd = new scala.util.Random(42)
    val chain = (0 until 1023).map(i => (i.toLong + 5000L, i.toLong + 5001L))
    val rand = (0 until 400)
      .map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter(p => p._1 != p._2)
    val pairs = (chain ++ rand).toDF("a_id", "b_id")
    // localFinish = 0 forces the DISTRIBUTED contraction loop (the
    // 100 TB path); the default driver-finish path is checked below
    val (cc, rounds) = Dedup.connectedComponents(pairs, localFinish = 0L)
    // ground truth: driver union-find with union-by-min (root of every
    // component ends at the component minimum — the oracle semantics)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    (chain ++ rand).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (chain ++ rand).flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => (v, find(v))).toSet
    val got = cc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing: ${expected -- got take 5}; spurious: ${got -- expected take 5}")
    // the round bound this rewrite exists for: star contraction is
    // O(log n) in the component DIAMETER's worst case; a regression
    // to one-hop propagation would need ~1023 rounds here
    assert(rounds <= 15, s"expected O(log n) convergence, got $rounds rounds")
    info(s"converged in $rounds rounds (1023-edge chain + 400 random edges)")
    // the driver-finish path (residue fits) must produce the identical
    // labels with zero distributed rounds
    val (ccLocal, roundsLocal) = Dedup.connectedComponents(pairs)
    assert(roundsLocal == 0)
    assert(ccLocal.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == got)
  }

  test("connectedComponents: 10k-node path — pass bound pinned at every residue threshold") {
    import spark.implicits._
    // the VERDICT r15 item-7 plant: a single path component of 10,001
    // nodes (diameter 10,000 — the worst case for any label-
    // propagation scheme) with ids descending so the component
    // minimum sits at the FAR end of the path from most nodes
    val n = 10000
    val chain = (0 until n).map(i => (100000L + i, 100000L + i + 1))
    val pairs = chain.toDF("a_id", "b_id")
    val expected = (0 to n).map(i => (100000L + i, 100000L)).toSet

    // (1) fully distributed (localFinish = 0): the documented pass
    // bound — star contraction halves residual depth per round, so
    // ceil(log2(diameter)) + a small constant; a one-hop regression
    // would need ~10,000 rounds
    val (cc0, r0) = Dedup.connectedComponents(pairs, localFinish = 0L)
    assert(cc0.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(r0 <= 18, s"10k path should converge in <= 18 rounds, took $r0")
    info(s"10k path: fully distributed convergence in $r0 rounds")

    // (2) mid threshold, BELOW the component's node count: star
    // contraction cannot shrink a component's edge residue under
    // (nodes - 1) — the converged star forest carries one edge per
    // non-minimum node — so for a single 10k-node component a 2k
    // threshold NEVER fires and the loop converges distributed in
    // the same rounds. The driver finish exists for the many-small-
    // components tail, not for shrinking one big component; labels
    // stay exact either way.
    val (ccMid, rMid) = Dedup.connectedComponents(pairs, localFinish = 2000L)
    assert(ccMid.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(rMid == r0,
      s"a sub-node-count threshold must not change convergence: $rMid vs $r0")
    info(s"10k path: threshold 2000 never fires -> $rMid distributed rounds")

    // (3) default threshold (2M): everything fits at once — zero
    // distributed rounds, same labels
    val (ccAll, rAll) = Dedup.connectedComponents(pairs)
    assert(rAll == 0)
    assert(ccAll.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("embed-dedup scale path: exact precision; recall 1.0 at the dedup operating point") {
    import spark.implicits._
    // (1) precision is exact by construction: every emitted pair also
    // appears in the audit verifier with the IDENTICAL rounded cosine
    val audit = Dedup.embedPairs(spark, sf, audit = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.embedPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert((lsh -- audit).isEmpty, s"spurious pairs: ${lsh -- audit}")
    // (2) threshold recall on THIS corpus: 0.35 sits below sign-LSH's
    // effective range (per-plane gap 0.613 vs 0.54 — the deliberately
    // unclustered worst case), so it is measured and documented, not
    // asserted high; the audit flag covers sub-LSH thresholds
    val recall = if (audit.isEmpty) 1.0 else (lsh & audit).size.toDouble / audit.size
    info(f"recall at threshold 0.35 on the worst-case corpus: $recall%.2f " +
      f"(${lsh.size}/${audit.size} pairs; md5-deterministic)")
    // (3) at the REAL dedup operating point — planted near-dups with
    // cos ≥ 0.9 (perturbed copies, the reference's duplicate-ingest
    // shape) — banding recall is 1.0: P(miss) ≈ (1-0.571)^8 ≈ 1e-3
    // per pair and the md5 planes make the outcome deterministic
    val v = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", graft.functions.VectorFunctions.toDouble($"embedding").as("v"))
      .limit(100)
    val planted = v.select(($"vec_id" + 1000000).as("vec_id"),
      // deterministic small perturbation: +2% of a hash-derived unit
      // direction keeps cosine(original, copy) ≥ 0.99
      transform($"v", (x, i) =>
        x + (pmod(xxhash64($"vec_id", i), lit(1000)).cast("double") / 1000 - 0.5) * 0.04).as("v"))
    val both = v.unionByName(planted)
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm($"v"))
    val found = Dedup.embedPairsOf(both).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = v.select($"vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 1000000)).toSet
    val plantedRecall = (found & expected).size.toDouble / expected.size
    info(f"planted near-dup (cos≥0.99) recall: $plantedRecall%.3f")
    assert(plantedRecall == 1.0,
      s"missed planted near-dups: ${expected -- found}")
  }

  test("threshold-range guard: analytic recall floor tracks the geometry") {
    // the operating point the geometry was designed for: near-exact
    assert(Dedup.signatureRecallBound(0.9) >= 0.99,
      f"cos=0.9 floor ${Dedup.signatureRecallBound(0.9)}%.4f")
    assert(!Dedup.belowLshRange(0.9))
    assert(!Dedup.belowLshRange(0.8),
      f"cos=0.8 floor ${Dedup.signatureRecallBound(0.8)}%.4f")
    // this corpus's deliberately adversarial threshold: the guard must
    // classify it below range (the measured 0.25 recall is geometry,
    // not a bug — the warning tells the caller exactly that)
    assert(Dedup.belowLshRange(0.35))
    assert(Dedup.signatureRecallBound(0.35) < 0.5)
    // monotone in the threshold — no window where the guard flaps
    val floors = Seq(0.1, 0.3, 0.5, 0.7, 0.9, 0.99).map(Dedup.signatureRecallBound)
    assert(floors.zip(floors.tail).forall { case (a, b) => a <= b + 1e-12 })
  }

  test("adaptive embed-LSH geometry: pinned at check scales, occupancy-bounded past them, floor held") {
    import spark.implicits._
    // at the calibration anchor (and below) the adaptive sizing IS the
    // pinned hash-checked geometry — oracle continuity
    Seq(1L, 500L, 2000L).foreach(n =>
      assert(Dedup.adaptivePlanes(n) == Dedup.EmbedLshPlanes, s"n=$n"))
    assert(Dedup.adaptiveTables(Dedup.EmbedLshPlanes) == Dedup.EmbedLshTables)
    // growth: 10× the anchor corpus raises planes by ~log₂(10), and
    // expected bucket occupancy n/2^planes stays at the anchor bound —
    // the property whose absence made the fixed geometry scale 7.7×
    val ns = Seq(500L, 2000L, 20000L, 200000L, 2000000L, 100000000000L)
    ns.foreach { n =>
      val p = Dedup.adaptivePlanes(n)
      assert(n.toDouble / math.pow(2.0, p) <= Dedup.EmbedLshOccupancy + 1e-9,
        s"occupancy unbounded at n=$n (planes=$p)")
      // every derived geometry keeps the pinned recall floor at the
      // cos-0.9 operating point — growing the corpus never lowers the
      // recall contract
      val t = Dedup.adaptiveTables(p)
      assert(Dedup.signatureRecallBound(Dedup.EmbedOperatingCosine, p, t)
        >= Dedup.EmbedRecallFloor, s"floor broken at n=$n ($t x $p)")
    }
    val ps = ns.map(Dedup.adaptivePlanes)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "planes must be monotone")
    assert(Dedup.adaptivePlanes(20000) > Dedup.EmbedLshPlanes,
      "the sf1-sized corpus must actually grow the geometry")
    // result identity where the gate checks: the adaptive entry runs
    // the SAME plan as the hash-checked dd_embed_lsh at this scale
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val pinned = Dedup.embedPairs(spark, sf).collect().map(key).toSet
    val adaptive = Dedup.embedPairsAdaptive(spark, sf).collect().map(key).toSet
    assert(adaptive == pinned, "adaptive config must match the pinned plan at check scale")
    // planted near-dups (cos ≥ 0.99) through a GROWN geometry (the
    // sf1-sized 13×16): recall stays 1.0 — the floor is analytic, the
    // planted outcome deterministic (md5 planes)
    val grownPlanes = Dedup.adaptivePlanes(20000)
    val grownTables = Dedup.adaptiveTables(grownPlanes)
    val v = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", graft.functions.VectorFunctions.toDouble($"embedding").as("v"))
      .limit(100)
    val planted = v.select(($"vec_id" + 1000000).as("vec_id"),
      transform($"v", (x, i) =>
        x + (pmod(xxhash64($"vec_id", i), lit(1000)).cast("double") / 1000 - 0.5) * 0.04).as("v"))
    val both = v.unionByName(planted)
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm($"v"))
    val found = Dedup.embedPairsOf(both, Dedup.EmbedThreshold, grownTables, grownPlanes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = v.select($"vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 1000000)).toSet
    assert((found & expected) == expected,
      s"grown geometry missed planted near-dups: ${expected -- found}")
  }

  test("approx sketches within tolerance of exact counterparts") {
    import spark.implicits._
    val approx = Relational.approxStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("u"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (u, p50)) =>
      val (au, ap50) = approx(k)
      assert(math.abs(au - u).toDouble / u <= 0.05, s"$k HLL error > 5%")
      assert(math.abs(ap50 - p50) / math.max(math.abs(p50), 1e-9) <= 0.05,
        s"$k approx p50 error > 5%")
    }
  }

  test("dd_jaccard sorted-merge kernel row-identical to the string-set formulation") {
    import spark.implicits._
    // the r17 jaccardPairs (xxhash64-sorted sets + SortedIntersectCount
    // merge walk) must reproduce the original array_intersect/
    // array_union string-set form row for row, scores included
    val t = Tables.spread(Tables.load(spark, sf, "documents"))
      .select($"doc_id", array_distinct(shingles(tokens($"text"), 2)).as("s"))
      .filter($"doc_id" % 10 === 0)
    val a = t.select($"doc_id".as("a_id"), $"s".as("sa"))
    val b = t.select($"doc_id".as("b_id"), $"s".as("sb"))
    val reference = a.crossJoin(b).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        round(size(array_intersect($"sa", $"sb")).cast("double") /
          size(array_union($"sa", $"sb")), 4).as("j_r"))
      .filter($"j_r" >= 0.05).orderBy($"a_id", $"b_id")
      .collect().map(_.toSeq)
    val kernel = Dedup.jaccardPairs(spark, sf).collect().map(_.toSeq)
    assert(kernel.length == reference.length)
    kernel.zip(reference).foreach { case (x, y) => assert(x == y) }
  }
}
