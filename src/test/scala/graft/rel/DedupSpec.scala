package graft.rel

import graft.SparkSpec

/** Promised invariants from Dedup's scaladocs: the LSH/fingerprint
  * approximations must agree with the exact ground truth (d03 n-gram
  * Jaccard) on the test corpus.
  */
class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = pairs(
    Dedup.all.find(_.name == "d03_ngram_jaccard").get.fn(spark, sfDir))

  test("minhash LSH recovers the exact jaccard>=0.8 pairs") {
    val lsh = pairs(Dedup.minhashNearDup(spark, sfDir, 0.8))
    // LSH verifies candidates with exact jaccard, so no false positives;
    // banding at 16x4 catches j>=0.8 with prob ~1-(1-0.8^4)^16 ≈ 0.9997
    // per pair — on this corpus it must find every pair.
    assert(lsh == exact)
  }

  test("d16: incremental near-dup equals the exact cross-split ground truth") {
    // d03's full within-corpus pair set, restricted to pairs crossing
    // the %10>=8 batch split, rolled up per batch doc — must equal
    // d16's per-doc match counts exactly (LSH + exact verify = exact)
    def side(id: Long): Boolean = id % 10 >= 8
    val truth = exact.toSeq
      .filter { case (a, b) => side(a) != side(b) }
      .map { case (a, b) => if (side(a)) a else b }
      .groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
    assert(truth.nonEmpty, "fixture has no cross-split near-dup pairs — gate vacuous")
    val got = Dedup.incrementalNearDup(spark, sfDir, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gotMatches = got.filter(_._2 > 0).map(t => t._1 -> t._2).toMap
    assert(gotMatches == truth, s"got $gotMatches expected $truth")
    // every batch doc is present, keep flag consistent
    got.foreach { case (id, n, keep) =>
      assert(side(id) && keep == (if (n == 0) 1L else 0L)) }
    val nBatch = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 >= 8).count()
    assert(got.length.toLong == nBatch)
  }

  test("d13: minhash estimate errors match an in-JVM recompute with >=2x margin") {
    import org.apache.spark.sql.functions.col
    // contract flags must all pass on the registry corpus
    val row = Dedup.minhashEstimateContract(spark, sfDir,
      minJ = 0.5, meanBound = 0.05, maxBound = 0.3).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((1L, 1L, 1L)))
    // brute-force the same audit driver-side: banding over every doc,
    // in-bucket pairs, exact-J filter, per-pair lane-agreement estimate
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sigs = docs.map { case (id, t) =>
      id -> Dedup.minhashSignature(Dedup.shingleSet(t).iterator.map(Dedup.fnv1a64))
    }.toMap
    val texts = docs.toMap
    val rowsPerBand = Dedup.MinhashK / Dedup.MinhashBands
    val cand = (for {
      (id, sig) <- sigs.toSeq
      b <- 0 until Dedup.MinhashBands
    } yield (Dedup.bandBucket(sig, b, rowsPerBand), id))
      .groupBy(_._1).values.filter(_.size > 1)
      .flatMap { bucket =>
        val ids = bucket.map(_._2).distinct.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size)
          yield (ids(i), ids(j))
      }.toSet
    val errs = cand.toSeq.flatMap { case (a, b) =>
      val exactJ = Dedup.exactJaccard(texts(a), texts(b))
      if (exactJ < 0.5) None
      else {
        val (sa, sb) = (sigs(a), sigs(b))
        val m = sa.zip(sb).count { case (x, y) => x == y }
        Some(math.abs(m.toDouble / Dedup.MinhashK - exactJ))
      }
    }
    assert(errs.nonEmpty, "no audited pairs — the contract pins nothing")
    val mean = errs.sum / errs.size
    val worst = errs.max
    info(f"d13 measured: ${errs.size} pairs, mean err $mean%.4f, max err $worst%.4f")
    // the asserted bounds must hold with >=2x headroom on this corpus,
    // or the contract is one unlucky hash away from a false failure
    assert(mean <= 0.025, s"mean err $mean leaves <2x margin on 0.05")
    assert(worst <= 0.15, s"max err $worst leaves <2x margin on 0.3")
  }

  test("simhash near-dups overlap the exact near-dup set") {
    val sim = pairs(Dedup.simhashNearDup(spark, sfDir, 3))
    // simhash(hamming<=3) is a different similarity (token-frequency
    // cosine); on near-identical docs it must fire. Require that it
    // finds at least half of the exact pairs and that exact dups
    // (jaccard=1.0 => identical token multisets => identical simhash)
    // are all present.
    val identical = pairs(
      Dedup.all.find(_.name == "d03_ngram_jaccard").get.fn(spark, sfDir)
        .filter("jaccard >= 0.9999"))
    assert(identical.subsetOf(sim),
      s"identical docs missing from simhash: ${identical.diff(sim)}")
  }

  test("d06 tiled broadcast: multi-block result is bit-identical to single-block") {
    // force tiny blocks: the 100-vector sf0.001 corpus must split into
    // >1 broadcast blocks, and the pair set + cosines must match the
    // single-block run exactly (every pair lands once, in the block
    // holding its larger id, with identical accumulation order)
    spark.conf.set("spark.graft.d06.blockRows", "7")
    try {
      val (multi, nbMulti) = Dedup.embeddingNearDupBlocked(spark, sfDir, 0.4)
      assert(nbMulti > 1, s"expected >1 blocks at blockRows=7, got $nbMulti")
      val multiRows = multi.collect().toSeq
      spark.conf.set("spark.graft.d06.blockRows", "1000000")
      val (single, nbSingle) = Dedup.embeddingNearDupBlocked(spark, sfDir, 0.4)
      assert(nbSingle == 1)
      val singleRows = single.collect().toSeq
      assert(multiRows.nonEmpty && multiRows == singleRows)
    } finally spark.conf.unset("spark.graft.d06.blockRows")
  }

  test("semdedup matches a driver-side brute force") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = e.filter(_._1 < Dedup.SemdedupK)
    val asg = e.map { case (id, v) =>
      id -> cents.maxBy(c => (cos(v, c._2), -c._1))._1
    }.toMap
    val droppedIds = (for {
      (a, va) <- e.iterator
      (b, vb) <- e.iterator
      if a < b && asg(a) == asg(b) && cos(va, vb) >= 0.4
    } yield b).toSet
    val got = Dedup.semdedup(spark, sfDir, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == e.length)
    got.foreach { case (id, cid, kept) =>
      assert(cid == asg(id), s"vec $id cluster")
      assert(kept == (if (droppedIds(id)) 0 else 1), s"vec $id kept flag")
    }
  }

  test("minhash signature is deterministic and k-long") {
    val sig1 = Dedup.minhashSignature(Iterator(1L, 2L, 3L))
    val sig2 = Dedup.minhashSignature(Iterator(3L, 2L, 1L)) // order-free
    assert(sig1.length == Dedup.MinhashK)
    assert(sig1.sameElements(sig2))
  }

  test("fnv1a64 matches reference vectors") {
    // FNV-1a 64 published test vectors
    assert(Dedup.fnv1a64("") == 0xcbf29ce484222325L)
    assert(Dedup.fnv1a64("a") == 0xaf63dc4c8601ec8cL)
    assert(Dedup.fnv1a64("foobar") == 0x85944171f73967e8L)
  }

  test("substring spans match a driver-side brute force on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val W = Dedup.SpanW
    // small vocab + short docs force frequent real collisions
    def doc(): Array[String] =
      Array.fill(W + rnd.nextInt(30))("w" + rnd.nextInt(6))
    (0 until 3).foreach { trial =>
      val corpus = Array.fill(30)(doc())
      val docs = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      // brute force: count every W-window occurrence corpus-wide,
      // then per doc merge duplicated starts into interval unions
      val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
      corpus.foreach(ws => ws.sliding(W).foreach { g =>
        counts(g.toSeq) = counts.getOrElse(g.toSeq, 0) + 1
      })
      val expect = corpus.zipWithIndex.map { case (ws, i) =>
        val dupStarts = ws.sliding(W).zipWithIndex
          .collect { case (g, p) if counts(g.toSeq) >= 2 => p + 1 }.toArray
        var spans = 0L; var covered = 0L; var start = -1; var end = -1
        dupStarts.foreach { p =>
          if (start < 0) { start = p; end = p + W - 1; spans = 1 }
          else if (p <= end + 1) end = p + W - 1
          else { covered += end - start + 1; start = p; end = p + W - 1; spans += 1 }
        }
        if (start >= 0) covered += end - start + 1
        i.toLong -> ((ws.length.toLong, dupStarts.length.toLong, spans, covered))
      }.toMap
      val got = Dedup.substringSpansOn(spark, docs).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("substring spans: hand-derived intervals on a planted corpus") {
    import spark.implicits._
    // W=8. doc 0 and doc 1 share tokens a1..a10 (positions 1-10 in
    // both): duplicated 8-gram starts {1,2,3} → ONE span covering
    // tokens 1..10. doc 2 is all-unique. doc 3 repeats its own first
    // 8 tokens at position 20 (within-doc duplication counts).
    val shared = (1 to 10).map("a" + _).mkString(" ")
    val u = (1 to 12).map("u" + _).mkString(" ")
    val b8 = (1 to 8).map("b" + _).mkString(" ")
    val mid = (1 to 11).map("m" + _).mkString(" ")
    val docs = Seq(
      (0L, shared + " x1 x2"),            // 12 tokens
      (1L, shared + " y1 y2 y3"),         // 13 tokens
      (2L, u),                            // 12 tokens, no dups
      (3L, b8 + " " + mid + " " + b8)     // 27 tokens, self-repeat at p=20
    ).toDF("doc_id", "text")
    val rows = Dedup.substringSpansOn(spark, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(0L) == ((12L, 3L, 1L, 10L)), rows(0L))
    assert(rows(1L) == ((13L, 3L, 1L, 10L)), rows(1L))
    assert(rows(2L) == ((12L, 0L, 0L, 0L)), rows(2L))
    // doc 3: dup starts {1, 20} — gap 19 > 8 → two spans of 8 tokens
    assert(rows(3L) == ((27L, 2L, 2L, 16L)), rows(3L))
  }

  test("d20: blocked near-dup recall, purity, and comparison win with margin") {
    val r = Dedup.ivfNearDupRaw(spark, sfDir).collect()(0)
    val planted = r.getAs[Long]("planted_pairs")
    val found = r.getAs[Long]("found")
    val foundPlanted = r.getAs[Long]("found_planted")
    val cmp = r.getAs[Long]("comparisons")
    val quad = r.getAs[Long]("quadratic_comparisons")
    info(s"planted=$planted found=$found foundPlanted=$foundPlanted " +
      s"cmp=$cmp quad=$quad ratio=${cmp.toDouble / quad}")
    assert(planted > 0, "fixture has no planted twins")
    // the gate bound is 0.9 — the spec pins extra margin so a drift
    // toward the bound is visible before the gate reds
    assert(foundPlanted >= math.ceil(0.95 * planted).toLong,
      s"blocked recall $foundPlanted/$planted below the 0.95 spec margin")
    // every emitted pair is a planted pair (θ=0.9 sits far above the
    // fixture's max unplanted cosine 0.479) and pairs are distinct
    assert(found == foundPlanted)
    // the blocking win: well under the gate's ≤ 1/2-quadratic bound
    assert(cmp <= (quad * 3) / 10,
      s"comparisons $cmp above 0.3×quadratic $quad — blocking degenerated")
  }

  test("d20: planted twins measure cosine ≥ 0.99 against their source") {
    import org.apache.spark.sql.functions._
    val aug = Dedup.d20Corpus(spark, sfDir)
    val twins = aug.filter(col("vec_id") >= Dedup.D20SiblingOffset)
      .select((col("vec_id") - Dedup.D20SiblingOffset).as("vec_id"),
        col("embedding").as("twin"))
    val joined = aug.join(twins, "vec_id")
      .select(Similarity.cosine(col("embedding"), col("twin")).as("c"))
      .agg(min("c")).collect()(0).getDouble(0)
    assert(joined >= 0.99, s"min twin cosine $joined")
  }

  test("d21: ladder is monotone, full-band recall has margin, truth nonempty") {
    val rows = Dedup.lshCalibrationRaw(spark, sfDir)
      .orderBy("bands").collect()
    val hits = rows.map(_.getAs[Long]("hits"))
    val total = rows(0).getAs[Long]("total")
    info(s"total=$total hits=${hits.mkString(",")}")
    assert(total > 0)
    assert(hits.sliding(2).forall(p => p(0) <= p(1)), "ladder not monotone")
    // gate bound 0.9; fixture pairs are all J ≥ 0.875, where a 16-band
    // miss has probability ~7e-7 — pin full recall with deterministic
    // hashes so any signature-machinery drift is loud
    assert(hits.last == total,
      s"full-band recall ${hits.last}/$total — signature drift?")
  }

  test("d21: the ladder discriminates on moderate-jaccard pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // every doc = a shared 60-token prefix + an 11-token unique suffix,
    // so EVERY pair measures J = 56/78 ≈ 0.718 — just above the 0.7
    // truth threshold, where a 4-row band agrees with probability
    // 0.718⁴ ≈ 0.266: 2 bands catch ~46% of pairs, 16 bands ~99%. The
    // rungs must genuinely separate, not saturate at rung 1.
    // Deterministic hashes make the measured counts stable.
    val base = (0 until 60).map(i => s"w$i").mkString(" ")
    val docs = (0L until 80L).map { i =>
      val suf = (0 until 11).map(j => s"u${i}_$j").mkString(" ")
      (i, s"$base $suf")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("d21disc").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.lshCalibrationRaw(spark, dir).orderBy("bands").collect()
    val hits = rows.map(_.getAs[Long]("hits"))
    val total = rows(0).getAs[Long]("total")
    info(s"moderate-J ladder: total=$total hits=${hits.mkString(",")}")
    // rung 1 must sit well inside the ladder (~46% expected) and the
    // rungs must separate — a saturated ladder measures nothing
    assert(hits.head < hits.last,
      s"ladder saturated: hits=${hits.mkString(",")} — rungs don't discriminate")
    assert(hits.head <= (total * 3) / 4,
      s"rung 1 caught ${hits.head}/$total — fixture J too high to discriminate")
  }

  test("d21: empty ground truth fails loudly, not vacuously green") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0L until 30L)
      .map(i => (i, (0 until 20).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("d21empty").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Dedup.lshCalibrationRaw(spark, dir).collect()
    }
    assert(e.getMessage.contains("nothing to measure"))
  }

  test("hot-bucket guard fails loudly DURING aggregation, not after materializing") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // MaxBucketDocs + 5 identical documents: every shingle bucket
    // crosses the ceiling, so the bounded collect must throw its
    // advice message from inside the aggregate
    val dir = java.nio.file.Files.createTempDirectory("hotbucket").toString
    (0 until Dedup.MaxBucketDocs + 5)
      .map(i => (i.toLong, "the same boilerplate text in every doc"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Throwable] {
      Dedup.all.find(_.name == "d03_ngram_jaccard").get
        .fn(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("df-cap hot shingles")),
      s"expected the advice message, got: ${messages(e).mkString(" | ")}")
  }
}
