package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HammingPairs

/** The occupancy-safe Hamming pairing stage, proven exact at every
  * geometry it can select — rung 0 (the pinned gate plan), rung 1
  * (wide keys + the 1-bit probe ring), and the hot-bucket sub-band
  * split — each against an exhaustive all-pairs scan on planted
  * corpora, including adversarial mass no uniform model produces. */
class HammingPairsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def exhaustive(rows: Seq[(Long, Long)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (a, pa) <- rows; (b, pb) <- rows if a < b
      h = java.lang.Long.bitCount(pa ^ pb)
      if h <= k
    } yield (a, b, h.toLong)).toSet

  private def run(rows: Seq[(Long, Long)], bits: Int, k: Int,
      anchor: Long, hotCap: Long,
      fastRows: Long = 0L): Set[(Long, Long, Long)] =
    // fastRows = 0 by default HERE: these tests force the routing
    // machinery (rungs, hot split) and must not be bypassed by the
    // small-corpus fast path; the fast path has its own tests below
    HammingPairs.pairs(rows.toDF("doc_id", "ph"), "doc_id",
        rows.length.toLong, bits, k, anchor, hotCap, fastRows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Deterministic splitmix64 stream — planted corpora must not
    * depend on JVM RNG defaults. */
  private def mix(i: Long): Long = {
    var z = i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 200 base hashes + planted families at every hamming 0..k+1:
    * flips of base hashes at exact distances (k+1 plants the
    * must-NOT-pair control). */
  private def planted(bits: Int, k: Int): Seq[(Long, Long)] = {
    val mask = if (bits >= 64) -1L else (1L << bits) - 1
    val base = (0L until 200L).map(i => i -> (mix(i) & mask))
    val fam = (0 to k + 1).flatMap { d =>
      val (_, ph) = base((d * 13) % 200)
      // flip d DISTINCT bit positions spread across the hash
      val flipped = (0 until d).foldLeft(ph)((p, j) =>
        p ^ (1L << ((j * (bits / (k + 2)) + d) % bits)))
      Seq((1000L + d) -> flipped)
    }
    base ++ fam ++ Seq(2000L -> base(5)._2, 2001L -> base(5)._2) // identical mass
  }

  // 64/7 = mm_phash_px, 32/3 = mm_phash, 60/3 = dd_simhash
  for ((bits, k) <- Seq((64, 7), (32, 3), (60, 3))) {
    val rows = planted(bits, k)
    val want = exhaustive(rows.map(r => (r._1, r._2)), k)

    test(s"$bits-bit k=$k rung 0 (pinned gate geometry) = exhaustive scan") {
      assert(want.nonEmpty && want.exists(_._3 == k.toLong),
        "fixture must plant pairs up to the hamming edge")
      // huge anchor → rung 0; huge hotCap → cold path only: exactly
      // the plan the hash-checked rounds shipped
      assert(run(rows, bits, k, anchor = Long.MaxValue / 2,
        hotCap = Long.MaxValue / 2) == want)
    }

    test(s"$bits-bit k=$k rung 1 (wide keys + probe ring) = exhaustive scan") {
      // anchor 0 → the ladder's last rung
      assert(HammingPairs.pick(bits, k, rows.length.toLong, 0L).radius == 1)
      assert(run(rows, bits, k, anchor = 0L, hotCap = Long.MaxValue / 2) == want)
    }

    test(s"$bits-bit k=$k hot-bucket sub-band split = exhaustive scan, both rungs") {
      // hotCap 0 forces EVERY bucket through the sub-band path
      assert(run(rows, bits, k, anchor = Long.MaxValue / 2, hotCap = 0L) == want)
      assert(run(rows, bits, k, anchor = 0L, hotCap = 0L) == want)
    }
  }

  test("planted hot bucket: concentrated band mass sub-splits without losing the edge pair") {
    // 3000 hashes agreeing on band 0 (low byte 0x5A) — one join key
    // holding the whole corpus, the |bucket|² failure mode — with one
    // planted pair at exactly hamming 7 hidden inside and everything
    // else far apart in the upper bits
    val rows = (0L until 3000L).map(i => i -> ((mix(i) << 8) | 0x5AL)) ++
      Seq(9001L -> (((mix(42L) << 8) | 0x5AL) ^ (0x7FL << 9))) // 7 flips upstairs
    val want = exhaustive(rows.map(r => (r._1, r._2)), 7)
    assert(want.contains((42L, 9001L, 7L)), "fixture must plant the edge pair")
    val got = run(rows, 64, 7, anchor = Long.MaxValue / 2, hotCap = 256L)
    assert(got == want,
      s"hot split missed ${(want -- got).size}, invented ${(got -- want).size}")
  }

  test("identical-hash mass collapses before the join and pairs at hamming 0") {
    // 500 copies of ONE hash: the mass no bucketing can split — layer
    // 1 must collapse it to a single distinct row; output = all id
    // pairs at hamming 0 plus nothing invented
    val rows = (0L until 500L).map(i => i -> 0xDEADBEEFCAFEL) :+
      (9000L -> (0xDEADBEEFCAFEL ^ 1L))
    val got = run(rows, 64, 7, HammingPairs.Anchor, HammingPairs.HotCap)
    assert(got.size == 500 * 499 / 2 + 500)
    assert(got.count(_._3 == 0L) == 500 * 499 / 2)
    assert(got.count(_._3 == 1L) == 500)
  }

  test("measured occupancy: rung 1 collapses candidate volume where rung 0 saturates") {
    // 20k uniform 64-bit hashes: rung 0's 256 buckets/band hold ~78
    // hashes each → ~8·n·occ/2 ≈ 6M candidate pairs; rung 1's 65536
    // buckets hold ~0.3 → candidates collapse by orders of magnitude.
    // This is the EFFICIENCY claim measured, not argued — the
    // exactness tests above prove both emit the same verified pairs.
    val rows = (0L until 20000L).map(i => i -> mix(i)).toDF("doc_id", "ph")
    val c0 = HammingPairs.candidateCount(rows, "doc_id", 64, 7, rungIdx = 0)
    val c1 = HammingPairs.candidateCount(rows, "doc_id", 64, 7, rungIdx = 1)
    assert(c0 > 1000000L, s"rung 0 should saturate at this density: $c0")
    // theory: c0 ≈ 8·n·(n/256)/2, c1 ≈ 4·17·n·(n/65536)/2 — a 30x
    // collapse at n=20k, and the RATIO grows linearly with n (that is
    // the point: c1's per-row work is what the anchor holds constant)
    assert(c1 * 20 < c0, s"rung 1 must collapse candidates: $c0 -> $c1")
    // the hot-bucket sub-split bounds a planted pile-up: 5k hashes
    // sharing band 0's key at rung 0 → one 5k²/2 bucket without the
    // guard; with it the volume drops by >10x
    val hot = (0L until 5000L).map(i => i -> ((mix(i) << 8) | 0x11L))
      .toDF("doc_id", "ph")
    val unguarded = HammingPairs.candidateCount(hot, "doc_id", 64, 7,
      rungIdx = 0, hotCap = Long.MaxValue / 2)
    val guarded = HammingPairs.candidateCount(hot, "doc_id", 64, 7,
      rungIdx = 0, hotCap = 256L)
    assert(unguarded > 12000000L, s"the planted pile-up should be quadratic: $unguarded")
    assert(guarded * 10 < unguarded, s"sub-split must bound it: $unguarded -> $guarded")
  }

  test("small-corpus fast path: identical pair set, no counts aggregate, one join") {
    // output: the fast path (default knobs, n = 210 ≤ FastRows) must
    // emit the exact set the forced-machinery runs and the exhaustive
    // scan emit — the routing can only change the plan, never the set
    for ((bits, k) <- Seq((64, 7), (32, 3), (60, 3))) {
      val rows = planted(bits, k)
      val want = exhaustive(rows.map(r => (r._1, r._2)), k)
      assert(run(rows, bits, k, HammingPairs.Anchor, HammingPairs.HotCap,
        fastRows = HammingPairs.FastRows) == want, s"fast path at $bits/$k")
    }
    // plan pin: the fast-path candidate stage is ONE band equi-join +
    // distinct — no count(1) occupancy aggregate, no second join
    val ph = (0L until 100L).map(mix).toDF("ph").select($"ph")
    def planOf(fastRows: Long): String =
      HammingPairs.candidateFrame(ph, 100L, 64, 7,
        HammingPairs.Anchor, HammingPairs.HotCap, fastRows)
        .queryExecution.executedPlan.toString
    val fastPlan = planOf(HammingPairs.FastRows)
    assert(!fastPlan.contains("count(1)"),
      "fast path must not build the occupancy counts frame")
    assert("(?i)join".r.findAllIn(fastPlan).size > 0)
    val joins = "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
    assert(joins.findAllIn(fastPlan).size == 1,
      s"fast path must be a single equi-join:\n$fastPlan")
    val slowPlan = planOf(0L)
    assert(slowPlan.contains("count(1)"),
      "forced machinery must keep the counts frame (the pin is meaningful)")
  }

  test("group form: groups + keeper cross pairs reproduce the pair form exactly") {
    // heavy identical mass (3 hashes x 40 copies) + planted cross
    // pairs: the group form must carry the hamming-0 stratum as one
    // row per hash and the cross strata as keeper pairs, and its
    // EXPANSION must equal pairs() — the output-cardinality contract
    val base = (0L until 50L).map(i => i -> mix(i))
    val mass = (0 until 3).flatMap { g =>
      (0 until 40).map(j => (1000L + g * 100 + j) -> base(g * 7)._2)
    }
    val near = Seq(5000L -> (base(0)._2 ^ 0x11L)) // hamming 2 of the heavy hash
    val rows = base ++ mass ++ near
    val df = rows.toDF("doc_id", "ph")
    val (groups, cross) = HammingPairs.pairsGrouped(df, "doc_id",
      rows.length.toLong, 64, 7)
    val g = groups.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // one row per distinct hash, keeper = min id, n_ids = multiplicity
    val byPh = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(g.keySet == byPh.keySet)
    byPh.foreach { case (ph, ids) =>
      assert(g(ph) == (ids.min, ids.length.toLong), s"group $ph")
    }
    // cross pairs: between keepers only, hamming ≥ 1
    val c = cross.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(c.forall(_._3 >= 1L))
    val keepers = byPh.map { case (ph, ids) => ph -> ids.min }
    val wantCross = (for {
      (pa, ka) <- keepers; (pb, kb) <- keepers if pa < pb
      h = java.lang.Long.bitCount(pa ^ pb)
      if h <= 7
    } yield (math.min(ka, kb), math.max(ka, kb), h.toLong)).toSet
    assert(c == wantCross)
    // the equivalence: expanding groups + cross = pairs()
    val expanded = byPh.values.flatMap { ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b, 0L)
    }.toSet ++ (for {
      (a, b, h) <- c
      pa = rows.find(_._1 == a).get._2; pb = rows.find(_._1 == b).get._2
      ia <- byPh(pa); ib <- byPh(pb)
    } yield (math.min(ia, ib), math.max(ia, ib), h))
    val pairForm = run(rows, 64, 7, HammingPairs.Anchor, HammingPairs.HotCap,
      fastRows = HammingPairs.FastRows)
    assert(expanded == pairForm,
      "group expansion must reproduce the pair form exactly")
    // and the cardinality contract: 40 copies collapse to ONE group
    // row where the pair form spends 40·39/2 rows
    assert(pairForm.count(_._3 == 0L) >= 3 * (40 * 39) / 2)
    assert(g.count(_._2._2 >= 40L) == 3)
  }

  test("rung selection: footer count drives the ladder at the occupancy anchor") {
    // rung 0 holds while expected occupancy n/2^8 <= anchor
    assert(HammingPairs.pick(64, 7, 16384).radius == 0)
    assert(HammingPairs.pick(64, 7, HammingPairs.Anchor * 256).width == 8)
    assert(HammingPairs.pick(64, 7, HammingPairs.Anchor * 256 + 1).width == 16)
    assert(HammingPairs.pick(32, 3, HammingPairs.Anchor * 256 + 1) ==
      HammingPairs.Rung(2, 16, 1))
    // past the ladder: the top rung carries (with the logged warning)
    assert(HammingPairs.pick(64, 7, Long.MaxValue / 4).width == 16)
  }
}
