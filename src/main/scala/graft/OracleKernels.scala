package graft

import scala.collection.mutable

/** Independently-coded NAIVE re-implementations of the sketch-kernel
  * DEFINITIONS (the definitions live in htmlspark.pipeline.Sketches'
  * scaladoc; none of its code is shared): direct per-position polynomial
  * hashing instead of rolling updates, per-window linear minimum scans
  * instead of the monotonic deque, regex tokenization + fold hashing
  * instead of hand-rolled scanning. Used ONLY by Verify to materialize
  * expected parquet for the driver's DuckDB gate — a differential oracle
  * in the ExtractorDifferentialSpec mold: a bug in the production kernels'
  * incremental machinery (rolling-hash subtraction, the winnow deque,
  * buffer reuse) surfaces as a driver-visible hash mismatch, while a bug
  * in the shared definition itself stays caught by the property/recall
  * specs (SketchRecallSpec audits LSH against exact all-pairs Jaccard).
  *
  * Everything here is driver-bounded BY DESIGN: it runs once per Verify
  * invocation over the sampled sf corpus (≤ a few thousand docs), never
  * inside an operator.
  */
object OracleKernels {

  private val P = 1099511628211L

  private def mix64(z0: Long): Long = {
    var z = z0 ^ (z0 >>> 33)
    z *= 0xFF51AFD7ED558CCDL
    z ^= z >>> 33
    z *= 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }

  /** Whole-string lowercase polyhash (the sub-k fallback both kernels use). */
  private def wholeHash(t: String): Long = {
    var h = 0L
    var i = 0
    while (i < t.length) {
      h = h * P + Character.toLowerCase(t.charAt(i)).toLong
      i += 1
    }
    h
  }

  /** k-gram hash at position i by direct O(k) accumulation — no rolling. */
  private def gramHash(t: String, i: Int, k: Int): Long = {
    var h = 0L
    var j = 0
    while (j < k) {
      h = h * P + Character.toLowerCase(t.charAt(i + j)).toLong
      j += 1
    }
    mix64(h)
  }

  def shingleSet(text: String, k: Int): Set[Long] = {
    val n = text.length
    if (n == 0) return Set(0L)
    if (n < k) return Set(mix64(wholeHash(text)))
    (0 to n - k).iterator.map(i => gramHash(text, i, k)).toSet
  }

  def minhashSig(shingles: Set[Long], numPerm: Int): IndexedSeq[Long] =
    (1 to numPerm).map { p =>
      val seed = mix64(0x9E3779B97F4A7C15L * p)
      shingles.iterator.map(h => mix64(h ^ seed)).min
    }

  def bandKeys(sig: IndexedSeq[Long], bandSize: Int): IndexedSeq[Long] =
    (0 until sig.length / bandSize).map { b =>
      sig.slice(b * bandSize, (b + 1) * bandSize)
        .foldLeft(mix64(b + 0x7F4A7C15L))((h, v) => mix64(h ^ v))
    }

  /** Robust winnowing by per-window LINEAR minimum scan, rightmost tie. */
  def winnowSet(text: String, k: Int, w: Int): Set[Long] = {
    val n = text.length
    if (n == 0) return Set.empty
    if (n < k) return Set(mix64(wholeHash(text)))
    val hs = Array.tabulate(n - k + 1)(i => gramHash(text, i, k))
    val m = hs.length
    if (m <= w) return Set(hs.min)
    (0 to m - w).iterator.map { start =>
      var best = start
      var j = start + 1
      while (j < start + w) {
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      hs(best)
    }.toSet
  }

  /** SimHash over letter-or-digit token runs. Token boundaries use the
    * SAME per-UTF-16-char Character.isLetterOrDigit definition as the
    * production kernel (a code-point regex like \p{L} would disagree on
    * supplementary-plane letters — surrogate pairs are non-alnum CHARS
    * under the production definition); the mechanism differs (span
    * splitting + fold hashing vs a hand-rolled scan). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val len = text.length
    var i = 0
    while (i < len) {
      // token boundaries by index scan (O(n) — no per-token suffix copies),
      // hash by range fold: still a different mechanism from production's
      // single fused scan-and-hash loop
      while (i < len && !Character.isLetterOrDigit(text.charAt(i))) i += 1
      val start = i
      while (i < len && Character.isLetterOrDigit(text.charAt(i))) i += 1
      if (i > start) {
        val th = mix64((start until i).foldLeft(0xCBF29CE484222325L)(
          (h, j) => (h ^ Character.toLowerCase(text.charAt(j)).toLong) * P))
        var b = 0
        while (b < 64) {
          if (((th >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    (0 until 64).foldLeft(0L)((sig, b) =>
      if (counts(b) > 0) sig | (1L << b) else sig)
  }

  // -------------------------------------------------------------------
  // Expected result sets for the driver gate, computed from the naive
  // kernels with the operators' published parameters.
  // -------------------------------------------------------------------

  private def sortedPairs(ids: Seq[Long]): Iterator[(Long, Long)] = {
    val s = ids.sorted
    for {
      i <- s.indices.iterator
      j <- (i + 1 until s.length).iterator
    } yield (s(i), s(j))
  }

  /** q15: docs sharing any in-cap LSH band bucket, distinct pairs. */
  def expectedLshPairs(docs: Seq[(Long, String)], numPerm: Int, bandSize: Int,
                       shingleK: Int, maxBucket: Int): Seq[(Long, Long)] = {
    val bandRows = docs.flatMap { case (id, t) =>
      bandKeys(minhashSig(shingleSet(t, shingleK), numPerm), bandSize)
        .zipWithIndex.map { case (key, b) => ((b, key), id) }
    }
    bandRows.groupBy(_._1).valuesIterator
      .filter(g => g.size > 1 && g.size <= maxBucket)
      .flatMap(g => sortedPairs(g.map(_._2)))
      .toSet.toSeq
  }

  /** q20: the one-row bucket-stats face over the same band rows. */
  def expectedLshStats(docs: Seq[(Long, String)], numPerm: Int, bandSize: Int,
                       shingleK: Int, maxBucket: Int): (Long, Long, Long, Long, Long) = {
    val bandRows = docs.flatMap { case (id, t) =>
      bandKeys(minhashSig(shingleSet(t, shingleK), numPerm), bandSize)
        .zipWithIndex.map { case (key, b) => ((b, key), id) }
    }
    val buckets = bandRows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sizes = buckets.valuesIterator.map(_.size).toSeq
    val droppedDocs = buckets.valuesIterator
      .filter(_.size > maxBucket).flatten.toSet
    (sizes.size.toLong,
      sizes.count(s => s > 1 && s <= maxBucket).toLong,
      sizes.count(_ > maxBucket).toLong,
      sizes.max.toLong,
      droppedDocs.size.toLong)
  }

  /** q22: winnow partial-dup pairs under the df cap + minShared filter. */
  def expectedWinnowPairs(docs: Seq[(Long, String)], k: Int, w: Int,
                          maxDf: Int, minShared: Int): Seq[(Long, Long, Long)] = {
    val fpRows = docs.flatMap { case (id, t) =>
      winnowSet(t, k, w).iterator.map(fp => (fp, id))
    }
    val shared = mutable.Map.empty[(Long, Long), Long]
    fpRows.groupBy(_._1).valuesIterator
      .filter(g => g.size > 1 && g.size <= maxDf)
      .foreach(g => sortedPairs(g.map(_._2)).foreach { p =>
        shared(p) = shared.getOrElse(p, 0L) + 1L
      })
    shared.iterator.collect {
      case ((a, b), n) if n >= minShared => (a, b, n)
    }.toSeq
  }

  /** q23: the one-row winnow fp-stats face. */
  def expectedWinnowStats(docs: Seq[(Long, String)], k: Int, w: Int,
                          maxDf: Int): (Long, Long, Long, Long, Long) = {
    val fpRows = docs.flatMap { case (id, t) =>
      winnowSet(t, k, w).iterator.map(fp => (fp, id))
    }
    val byFp = fpRows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sizes = byFp.valuesIterator.map(_.size).toSeq
    val droppedDocs = byFp.valuesIterator.filter(_.size > maxDf).flatten.toSet
    (sizes.size.toLong,
      sizes.count(s => s > 1 && s <= maxDf).toLong,
      sizes.count(_ > maxDf).toLong,
      sizes.max.toLong,
      droppedDocs.size.toLong)
  }

  /** q16: per-doc simhash + 16-bit band. */
  def expectedSimhash(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    docs.map { case (id, t) =>
      val s = simhash64(t)
      (id, s, s & 0xFFFFL)
    }

  /** q17: exact shingle-set intersections on the LSH candidate pairs,
    * thresholded on the derived jaccard. */
  def expectedJaccardCand(docs: Seq[(Long, String)], numPerm: Int,
                          bandSize: Int, shingleK: Int, maxBucket: Int,
                          threshold: Double): Seq[(Long, Long, Long, Long, Long)] = {
    val shingles = docs.map { case (id, t) => id -> shingleSet(t, shingleK) }.toMap
    expectedLshPairs(docs, numPerm, bandSize, shingleK, maxBucket)
      .flatMap { case (a, b) =>
        val (sa, sb) = (shingles(a), shingles(b))
        val inter = (sa & sb).size.toLong
        val j = inter.toDouble / (sa.size + sb.size - inter)
        if (j >= threshold) Some((a, b, inter, sa.size.toLong, sb.size.toLong))
        else None
      }
  }

  /** Hyperplane sign-bit buckets by fold instead of nested while loops.
    * The projection accumulates in the same index order as the production
    * kernel, so sign decisions are bitwise identical. */
  def hyperplaneBuckets(v: Array[Float], nPlanes: Int, nTables: Int): IndexedSeq[Long] =
    (0 until nTables).map { t =>
      (0 until nPlanes).foldLeft(0L) { (bucket, p) =>
        val plane = (t * nPlanes + p).toLong
        val proj = v.indices.foldLeft(0.0) { (acc, d) =>
          val h = mix64((plane << 32) | d)
          acc + v(d) * ((Math.floorMod(h, 2000001L) - 1000000L) / 1000000.0)
        }
        if (proj > 0) bucket | (1L << p) else bucket
      }
    }

  /** In-order double-precision cosine (same accumulation order as the
    * operator's zip_with/aggregate expression). A zero-norm input yields
    * NaN; every consumer below FILTERS NaN scores, matching the operators'
    * !isnan guard (ADVICE r3 — Spark ranks NaN largest, Scala's total
    * order ranks it last; dropping undefined scores on both sides makes
    * the comparison well-defined). */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dotAB = 0.0; var dotAA = 0.0; var dotBB = 0.0
    var i = 0
    while (i < a.length) {
      dotAB += a(i).toDouble * b(i).toDouble
      dotAA += a(i).toDouble * a(i).toDouble
      dotBB += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dotAB / (math.sqrt(dotAA) * math.sqrt(dotBB))
  }

  /** Naive Lloyd k-means with the SAME definition as the production
    * quantizer (init = first k, max-cosine assignment with lowest-index
    * ties, per-dim double mean accumulated in sample order, empty cell
    * keeps its centroid) but a different mechanism: per-cell filtered
    * folds instead of one fused assignment loop with preallocated
    * accumulator matrices. Identical addition ORDER → bit-identical
    * centroids, so cell assignments agree exactly. */
  private def naiveKmeans(sample: Seq[Array[Float]], k: Int,
                          iters: Int): Seq[Array[Float]] = {
    val kk = math.min(k, sample.size)
    if (kk == 0) return Seq.empty
    val dim = sample.head.length
    def assign(v: Array[Float], cents: Seq[Array[Float]]): Int =
      cents.zipWithIndex.map { case (c, i) => (cosine(v, c), i) }
        .sortBy { case (c, i) => (-c, i) }.head._2
    (1 to iters).foldLeft(sample.take(kk)) { (cents, _) =>
      val assigned = sample.map(v => assign(v, cents))
      (0 until kk).map { c =>
        val members = sample.zip(assigned).collect { case (v, a) if a == c => v }
        if (members.isEmpty) cents(c)
        else {
          val sums = members.foldLeft(new Array[Double](dim)) { (acc, v) =>
            (0 until dim).foreach(d => acc(d) += v(d)); acc
          }
          Array.tabulate(dim)(d => (sums(d) / members.size).toFloat)
        }
      }
    }
  }

  /** q24: IVF ANN — centroids from the naive sampled k-means (or first
    * nCells when untrained); candidates live in the query's nProbe
    * max-cosine cells; rank exact cosine. */
  def expectedAnnIvf(vecs: Seq[(Long, Array[Float])], nQueries: Int, k: Int,
                     nCells: Int, nProbe: Int, trained: Boolean = true,
                     // defaults REFERENCE the operator's published params —
                     // literals here would re-create the silent-drift hazard
                     // the FrameCorpusN fix removed (ADVICE r3 #4)
                     sampleCap: Int = htmlspark.pipeline.AnnOps.IvfSampleCap,
                     iters: Int = htmlspark.pipeline.AnnOps.IvfKmeansIters): Seq[(Long, Long, Long)] = {
    // trained sample order mirrors the operator's seeded distributed
    // sample (Sketches.sampleKey asc, id asc); the untrained seam stays
    // lowest-id
    val seededOrder = vecs
      .sortBy { case (id, _) => (htmlspark.pipeline.Sketches.sampleKey(id), id) }
      .map(_._2)
    val centroids =
      if (trained) naiveKmeans(seededOrder.take(sampleCap), nCells, iters)
      else vecs.sortBy(_._1).map(_._2).take(nCells)
    def cellScores(v: Array[Float]): Seq[(Double, Int)] =
      centroids.zipWithIndex.map { case (c, i) => (cosine(v, c), i) }
    val cellOf = vecs.map { case (id, v) =>
      // max-cosine centroid, lowest index on ties — maxBy keeps the FIRST
      // maximum only with a strict comparison, so sort instead
      id -> cellScores(v).sortBy { case (c, i) => (-c, i) }.head._2
    }.toMap
    vecs.filter(_._1 < nQueries).flatMap { case (qid, qv) =>
      val probes = cellScores(qv).sortBy { case (c, i) => (-c, i) }
        .take(nProbe).map(_._2).toSet
      vecs.iterator
        .filter { case (id, _) => id != qid && probes.contains(cellOf(id)) }
        .map { case (id, v) => (id, cosine(qv, v)) }
        .filterNot(_._2.isNaN)
        .toSeq
        .sortBy { case (id, c) => (-c, id) }
        .take(k).zipWithIndex
        .map { case ((id, _), r) => (qid, id, (r + 1).toLong) }
    }
  }

  /** (table, bucket) → member ids, the shared body of the q25/q27
    * expectations (mirrors the operator's bucketed frame, built naively
    * from per-vector bucket signatures). */
  private def embedBucketGroups(vecs: Seq[(Long, Array[Float])],
                                nPlanes: Int, nTables: Int): Map[(Int, Long), Seq[Long]] =
    vecs.flatMap { case (id, v) =>
      hyperplaneBuckets(v, nPlanes, nTables).zipWithIndex
        .map { case (b, t) => ((t, b), id) }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  /** q25: embedding near-dup — top-n highest-cosine pairs among those
    * sharing any IN-CAP hyperplane bucket (cosine desc, pair-id asc
    * tiebreak); buckets over `maxBucket` members are dropped, mirroring
    * the operator's degenerate-bucket cap. */
  def expectedEmbedNearDup(vecs: Seq[(Long, Array[Float])], n: Int,
                           nPlanes: Int, nTables: Int,
                           maxBucket: Int): Seq[(Long, Long)] = {
    val byId = vecs.toMap
    val candidates = embedBucketGroups(vecs, nPlanes, nTables).valuesIterator
      .filter(g => g.size > 1 && g.size <= maxBucket)
      .flatMap(g => sortedPairs(g))
      .toSet
    val pairs = candidates.iterator
      .map { case (a, b) => (a, b, cosine(byId(a), byId(b))) }
      .filterNot(_._3.isNaN)
    pairs.toSeq.sortBy { case (a, b, c) => (-c, a, b) }
      .take(n).map { case (a, b, _) => (a, b) }
  }

  /** q27: the one-row embed-bucket-stats face over the same groups. */
  def expectedEmbedBucketStats(vecs: Seq[(Long, Array[Float])], nPlanes: Int,
                               nTables: Int, maxBucket: Int): (Long, Long, Long, Long, Long) = {
    val groups = embedBucketGroups(vecs, nPlanes, nTables)
    val sizes = groups.valuesIterator.map(_.size).toSeq
    val droppedVecs = groups.valuesIterator
      .filter(_.size > maxBucket).flatten.toSet
    (sizes.size.toLong,
      sizes.count(s => s > 1 && s <= maxBucket).toLong,
      sizes.count(_ > maxBucket).toLong,
      sizes.max.toLong,
      droppedVecs.size.toLong)
  }

  /** q19: LSH-ANN — candidates share any table's bucket with the query,
    * ranked by exact cosine desc (neighbor_id tiebreak), top k. */
  def expectedAnnLsh(vecs: Seq[(Long, Array[Float])], nQueries: Int, k: Int,
                     nPlanes: Int, nTables: Int): Seq[(Long, Long, Long)] = {
    val buckets = vecs.map { case (id, v) =>
      id -> hyperplaneBuckets(v, nPlanes, nTables) }.toMap
    vecs.filter(_._1 < nQueries).flatMap { case (qid, qv) =>
      val qb = buckets(qid)
      vecs.iterator
        .filter { case (id, _) => id != qid &&
          (0 until nTables).exists(t => buckets(id)(t) == qb(t)) }
        .map { case (id, v) => (id, cosine(qv, v)) }
        .filterNot(_._2.isNaN)
        .toSeq
        .sortBy { case (id, c) => (-c, id) }
        .take(k).zipWithIndex
        .map { case ((id, _), r) => (qid, id, (r + 1).toLong) }
    }
  }
}
