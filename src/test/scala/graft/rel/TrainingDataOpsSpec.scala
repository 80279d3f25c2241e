package graft.rel

import graft.SparkSpec

/** Semantic cross-checks for the round-3 training-data operators
  * (d09 decontamination, t11 PII scrub, t12 boilerplate): each query's
  * distributed result is compared against a direct in-memory
  * recomputation from the same parquet inputs. */
class TrainingDataOpsSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String)] = {
    import org.apache.spark.sql.functions.col
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
  }

  test("q40 weighted sample: deterministic, k rows, weight-skewed, no shuffle") {
    val q = RelQueries.all.find(_.name == "q40_weighted_sample").get
    val df = q.fn(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 100)
    // deterministic draw: identical on re-run
    val again = q.fn(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // P(pick) ∝ n_chars ⟹ the sample's mean length exceeds the
    // corpus mean (size-biased sampling is longer in expectation)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = docs.map(_._2.length).sum.toDouble / docs.size
    assert(sampleMean > corpusMean,
      s"weighted sample not size-biased: $sampleMean <= $corpusMean")
    // scale shape: per-partition top-k merged at the driver
    // (TakeOrderedAndProject), never a global sort of the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q41 temperature sampling upsamples low-resource languages") {
    val q = RelQueries.all.find(_.name == "q41_temperature_sample").get
    val rows = q.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // per-lang sampled counts and corpus counts
    val sampled = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val byLang = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("lang").isNotNull)
      .groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble)).toMap
    // α = 0.5 < 1 ⟹ the sampling RATE k_l/n_l strictly decreases with
    // n_l: the rarest language is sampled at a higher rate than the
    // most common one
    val rates = byLang.collect { case (l, n) if sampled.contains(l) =>
      (n, sampled(l) / n)
    }.toSeq.sortBy(_._1)
    assert(rates.size >= 2, s"need >=2 langs, got $rates")
    assert(rates.head._2 > rates.last._2, s"rarest lang not upsampled: $rates")
    // deterministic
    val again = q.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q41 degrades cleanly on empty/all-null-lang input (no division guard needed)") {
    // the budgets fold in-plan (histogram → window Σ → div): an empty
    // histogram must flow through as an empty broadcast join with the
    // output schema intact, not a runtime error — this pins the
    // behavior the old driver-side branch handled explicitly
    val dir = java.nio.file.Files.createTempDirectory("q41-empty").toString
    Tables.documents(spark, sfDir).limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = RelQueries.all.find(_.name == "q41_temperature_sample").get
    val out = q.fn(spark, dir)
    assert(out.columns.toSeq == Seq("doc_id", "lang", "rn"))
    assert(out.count() == 0)
  }

  test("t16 charEntropy counts code points, not UTF-16 units (non-BMP goldens)") {
    // U+1F600 is a surrogate pair: 4 emoji = 4 chars of ONE symbol →
    // entropy 0. A UTF-16-unit iteration would see 8 units of 2
    // distinct surrogates and report (8, ln 2) — the ADVICE bug.
    assert(TextOps.charEntropy("😀😀😀😀") == (4L, 0.0))
    // alternating BMP/non-BMP: 4 chars, two symbols at p=1/2 → ln 2
    assert(TextOps.charEntropy("a😀a😀") == (4L, 0.6931))
    // pure-BMP baseline unchanged by the codepoint walk
    assert(TextOps.charEntropy("abab") == (4L, 0.6931))
    assert(TextOps.charEntropy("𝕏y") == (2L, 0.6931))
  }

  private def wordGrams(text: String, n: Int): Seq[String] = {
    val w = text.split(" ").filter(_.nonEmpty)
    if (w.length < n) Seq.empty
    else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
  }

  test("d09: flagged docs and hit counts match a brute-force overlap check") {
    val n = Dedup.DecontamN
    val evalGrams = docs.filter(_._1 < 20).flatMap(d => wordGrams(d._2, n)).toSet
    val expected = docs.filter(_._1 >= 20)
      .map { case (id, t) => id -> wordGrams(t, n).distinct.count(evalGrams.contains) }
      .filter(_._2 > 0).toMap
    val got = SparkEntryLookup("d09_decontaminate")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.map { case (k, v) => k -> v.toLong })
    assert(got.nonEmpty, "corpus plants near-dups — expected at least one hit")
  }

  test("t11: counts and scrubbed md5 match an in-JVM regex replay; no PII survives") {
    val rows = SparkEntryLookup("t11_pii_scrub")(spark, sfDir).collect()
    assert(rows.length == docs.length)
    val byId = docs.toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val injected = byId(id) +
        s" contact user$id@mail.example.com or 555-" +
        f"${id % 1000}%03d-${(id * 7) % 10000}%04d" +
        s" ip 10.0.${id % 256}.${(id * 3) % 256}"
      val afterEmail = injected.replaceAll(TextOps.PiiEmail, "<EMAIL>")
      val afterIp = afterEmail.replaceAll(TextOps.PiiIpv4, "<IP>")
      val scrubbed = afterIp.replaceAll(TextOps.PiiPhone, "<PHONE>")
      assert(r.getLong(1) == TextOps.PiiEmail.r.findAllIn(injected).size) // n_email
      assert(r.getLong(2) == TextOps.PiiIpv4.r.findAllIn(afterEmail).size) // n_ip
      assert(r.getLong(3) == TextOps.PiiPhone.r.findAllIn(afterIp).size) // n_phone
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1 && r.getLong(3) >= 1,
        s"injected PII must be detected (doc $id)")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(scrubbed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(4) == md5, s"scrub divergence on doc $id")
      Seq(TextOps.PiiEmail, TextOps.PiiIpv4, TextOps.PiiPhone).foreach { p =>
        assert(p.r.findFirstIn(scrubbed).isEmpty, s"PII survives scrub: doc $id")
      }
    }
  }

  test("t12: boilerplate fractions match a brute-force doc-frequency check") {
    val grams = docs.map { case (id, t) => id -> wordGrams(t, 3) }
      .filter(_._2.nonEmpty)
    val docFreq = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = grams.map { case (id, gs) =>
      val freqHits = gs.count(g => docFreq(g) >= 3)
      // raw integer ratio, no rounding (the query emits the exact
      // division now — round(x, 6) was the cross-engine hazard)
      (id, gs.size.toLong, freqHits.toLong, freqHits.toDouble / gs.size)
    }.sortBy(_._1)
    val got = SparkEntryLookup("t12_boilerplate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._4 == e._4, s"doc ${g._1}: ${g._4} vs ${e._4}")
    }
  }

  private object SparkEntryLookup {
    def apply(name: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      graft.SparkEntry.queries(name)
  }

  test("q39 heavy hitters equals the exact full-groupBy answer (sketch loses nothing)") {
    // the MG sketch only generates CANDIDATES; this pins that the
    // verified output equals the brute-force frequency filter — i.e.
    // the 64-counter guarantee covers the n/40 threshold on this corpus
    val toks = docs.flatMap(_._2.split(' ').filter(_.nonEmpty))
    val n = toks.size
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= n / 40.0).toMap
    val got = SparkEntryLookup("q39_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(got.nonEmpty, "threshold must bite on the test corpus")
  }

  test("t17 gopher rules match a brute-force recompute; keep = AND of flags") {
    // raw integer-ratio doubles, no rounding — the query emits the
    // exact division now (round(x, 6) was the cross-engine hazard)
    val expected = docs.map { case (id, t) =>
      val w = t.split(' ').filter(_.nonEmpty)
      val nWords = w.length.toLong
      val meanLen = w.map(_.length.toLong).sum.toDouble / nWords
      val symbol = w.count(x => x.contains("#") || x.contains("...")).toDouble / nWords
      val alpha = w.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toDouble / nWords
      val stops = w.count(TextOps.stopwords.contains).toLong
      val flags = Seq(nWords >= 50 && nWords <= 100000,
        meanLen >= 3 && meanLen <= 10, symbol <= 0.1, alpha >= 0.8,
        stops >= 2).map(b => if (b) 1L else 0L)
      (id, nWords, meanLen, symbol, alpha, stops, flags,
        flags.product)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = SparkEntryLookup("t17_gopher_rules")(spark, sfDir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert((g.getLong(0), g.getInt(1).toLong, g.getInt(5).toLong) ==
        ((e._1, e._2, e._6)), s"$g vs $e")
      // exact equality: one division of exact integers on both sides
      assert(g.getDouble(2) == e._3 && g.getDouble(3) == e._4 &&
        g.getDouble(4) == e._5, s"$g vs $e")
      assert((6 to 10).map(g.getLong) == e._7, s"flags: $g vs $e")
      assert(g.getLong(11) == e._8, s"keep != AND of flags: $g")
    }
    // thresholds must discriminate on this corpus, or the rules pin nothing
    assert(got.exists(_.getLong(11) == 1L) && got.exists(_.getLong(11) == 0L))
  }

  test("d12 incremental dedup: kept batch = within-batch survivors minus corpus hits") {
    def prefixDigest(t: String): String = {
      val key = t.split(' ').filter(_.nonEmpty).take(8).mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val withDg = docs.map { case (id, t) => (id, prefixDigest(t)) }
    val (batch, corpus) = withDg.partition(_._1 % 10 < 2)
    val corpusDgs = corpus.map(_._2).toSet
    val expected = batch.groupBy(_._2).view
      .mapValues(g => (g.map(_._1).min, g.size.toLong)).toMap
      .filter { case (dg, _) => !corpusDgs.contains(dg) }
      .map { case (dg, (keeper, copies)) => (dg, keeper, copies) }
      .toSeq.sortBy(_._1)
    val df = SparkEntryLookup("d12_incremental_dedup")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // both mechanisms must bite on this corpus: some batch key collides
    // with the corpus (anti-join drops it)…
    assert(batch.exists(b => corpusDgs.contains(b._2)), "no cross hit")
    // …and the digest join never ships text, nor sort-merges
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("t18 bm25 matches a brute-force recompute; stats fold to one broadcast row") {
    val terms = Seq("spark", "table", "vector")
    val toks = docs.map { case (id, t) => (id, t.split(' ').filter(_.nonEmpty)) }
    val n = toks.size.toDouble
    val sumdl = toks.map(_._2.length.toLong).sum.toDouble
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    val expected = toks.map { case (id, w) =>
      val dl = w.length.toDouble
      val score = terms.map { t =>
        val tf = w.count(_ == t).toDouble
        math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (dl / (sumdl / n))))
      }.reduce(_ + _)
      (id, w.length.toLong, terms.map(t => w.count(_ == t).toLong),
        BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val qdf = SparkEntryLookup("t18_bm25_score")(spark, sfDir)
    val got = qdf.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (2 to 4).map(r.getLong).toList, r.getDouble(5))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ==
      expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-9, s"${g._1}: ${g._4} vs ${e._4}")
    }
    // scores must discriminate, and the corpus must never self-join
    assert(got.map(_._4).distinct.size > 10)
    val plan = qdf.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("s07 range search equals brute-force cosine thresholding") {
    import org.apache.spark.sql.functions.col
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
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
    val queries = vecs.filter(_._1 < 5)
    val expected = (for {
      (qid, qe) <- queries
      (nid, ne) <- vecs if nid != qid
      c = cos(qe, ne) if c >= 0.3
    } yield (qid, nid,
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(t => (t._1, t._2))
    val got = SparkEntryLookup("s07_range_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"$g vs $e")
    }
    assert(got.nonEmpty, "threshold must admit neighbors on this corpus")
  }

  test("t19 tf-idf matches a brute-force recompute; df broadcasts at vocab size") {
    val tokenized = docs.map { case (id, t) =>
      (id, t.split(' ').filter(_.nonEmpty).toSeq)
    }
    val n = docs.size.toDouble
    val dfT = tokenized.flatMap { case (_, w) => w.distinct }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = (for {
      (id, w) <- tokenized
      (term, tf) <- w.groupBy(identity).view.mapValues(_.size.toLong)
    } yield {
      val raw = tf * (math.log((n + 1.0) / (dfT(term) + 1.0)) + 1.0)
      (id, term, tf, dfT(term),
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).sortBy(t => (t._1, t._2))
    val q = SparkEntryLookup("t19_tfidf")(spark, sfDir)
    val got = q.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ==
      expected.map(t => (t._1, t._2, t._3, t._4)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-9, s"$g vs $e")
    }
    // the df side of the join must broadcast (vocab-bounded), never
    // sort-merge the (doc, term) matrix against it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("d15 bloom-prefiltered incremental dedup is EXACT and actually prunes") {
    def prefixDigest(t: String): String = {
      val key = t.split(' ').filter(_.nonEmpty).take(8).mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val withDg = docs.map { case (id, t) => (id, prefixDigest(t)) }
    val (batch, corpus) = withDg.partition(_._1 % 10 >= 8)
    val corpusDgs = corpus.map(_._2).toSet
    val expected = batch.groupBy(_._2).view
      .mapValues(g => (g.map(_._1).min, g.size.toLong)).toMap
      .filter { case (dg, _) => !corpusDgs.contains(dg) }
      .map { case (dg, (keeper, copies)) => (dg, keeper, copies) }
      .toSeq.sortBy(_._1)
    val got = SparkEntryLookup("d15_bloom_incremental")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // exactness is unconditional — bloom false positives only ride
    // into the anti-join and lose there, never change the result
    assert(got == expected)
    // both mechanisms bite: some batch digest collides with the corpus
    assert(batch.exists(b => corpusDgs.contains(b._2)), "no cross hit")
    // prune power: replay the same bloom and count the corpus sliver
    // that survives — matches plus a bounded false-positive tail,
    // far below the full distinct-corpus input a plain anti-join reads
    val batchDgs = batch.map(_._2).distinct
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(1024L, batchDgs.size.toLong), 0.01)
    batchDgs.foreach(bloom.putString)
    val sliver = corpusDgs.count(bloom.mightContainString)
    val matches = corpusDgs.count(dg => batchDgs.contains(dg))
    assert(sliver <= matches + math.max(8, (0.05 * corpusDgs.size).toInt),
      s"bloom sliver $sliver vs $matches matches of ${corpusDgs.size}")
    // plan shape: digests anti-join without sort-merge, and the bloom
    // predicate sits in the corpus scan stage (narrow pre-prune)
    val df = SparkEntryLookup("d15_bloom_incremental")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("d15 handles NULL-text rows: null digests survive the batch, never NPE the bloom") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // synthetic corpus: doc_ids chosen so 8 and 18 (batch % 10 >= 8 and
    // corpus % 10 < 8 respectively) carry NULL text on both sides
    val dir = java.nio.file.Files.createTempDirectory("d15-nulls").toString
    val rows = Seq[(Long, String)](
      (1L, "shared text one"), (8L, null), (18L, null),
      (9L, "only in batch"), (3L, "shared text one"),
      (19L, "shared text one"), (28L, "batch dup"), (38L, "batch dup"))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntryLookup("d15_bloom_incremental")(spark, dir)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    // d12 semantics: docs 8 and 18 are BOTH batch (%10 >= 8) with NULL
    // text — they form ONE null-digest group (SQL GROUP BY folds nulls)
    // that SURVIVES the anti-join (equality never matches NULL);
    // "batch dup" (28, 38) dedups within the batch and survives; doc 9
    // survives; doc 19's text collides with corpus docs 1/3 and is
    // eliminated
    assert(got.map(t => (t._2, t._3)).toSet ==
      Set((8L, 2L), (9L, 1L), (28L, 2L)), got.mkString(", "))
    assert(got.exists(_._1.isEmpty), "null digest must survive as null")
  }

  test("t20 url domain cap matches a driver replay; selection rides TopKPerKey") {
    val ids = docs.map(_._1)
    def urlOf(id: Long): String = {
      val sub = if (id % 2 == 0) "www." else if (id % 5 == 0) "cdn." else ""
      val tld = Seq("com", "org", "net")((id % 3).toInt)
      s"https://${sub}site${id % 13}.$tld/p/$id?utm=x"
    }
    def normOf(id: Long): String = urlOf(id).toLowerCase
      .replaceFirst("^[a-z]+://", "").replaceFirst("\\?.*$", "")
      .replaceFirst("^www\\.", "")
    def domainOf(id: Long): String = {
      val host = normOf(id).takeWhile(_ != '/')
      host.split('.').takeRight(2).mkString(".")
    }
    val byDomain = ids.groupBy(domainOf)
    val expected = (for {
      (dom, g) <- byDomain
      sorted = g.sorted
      (id, i) <- sorted.take(5).zipWithIndex
    } yield (id, normOf(id), dom, (i + 1).toLong, g.size.toLong)).toSet
    val q = SparkEntryLookup("t20_url_domain_cap")(spark, sfDir)
    val got = q.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // the cap bites: some domain exceeds 5 docs on this corpus
    assert(byDomain.values.exists(_.size > 5), "cap never engaged")
    // selection is the native bounded top-k, not a corpus-wide window
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("q45/q46 data-quality tier: profile matches direct queries; check suite fires AND passes") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val prof = SparkEntryLookup("q45_profile")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet ==
      Set("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
    val n = li.count()
    prof.values.foreach(r => assert(r.getLong(1) == n))
    assert(prof("l_quantity").getLong(3) ==
      li.select("l_quantity").distinct().count())
    assert(prof("l_returnflag").getString(7) ==
      li.agg(max("l_returnflag")).head().getString(0))
    // the check suite must exercise BOTH outcomes on this corpus
    val checks = SparkEntryLookup("q46_quality_checks")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(checks("orderkey_unique") == ((0L, 1L)), "keys must be unique")
    assert(checks("lineitem_ref_orders") == ((0L, 1L)), "FK must hold")
    val (domViol, domPassed) = checks("quantity_domain_1_45")
    assert(domViol > 0L && domPassed == 0L,
      s"domain check must FIRE on this corpus, got $domViol")
  }

  test("q43 funnel equals a reference driver replay; one user_id shuffle") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    var nV = 0L; var nC = 0L; var nP = 0L
    ev.groupBy(_._1).foreach { case (_, g) =>
      val views = g.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        nV += 1
        val vT = views.min
        val clicks = g.filter(e => e._2 == "click" && e._3 > vT).map(_._3)
        if (clicks.nonEmpty) {
          nC += 1
          val cT = clicks.min
          if (g.exists(e => e._2 == "purchase" && e._3 > cT)) nP += 1
        }
      }
    }
    val row = SparkEntryLookup("q43_funnel")(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((nV, nC, nP)))
    // monotone narrowing (non-strict: at spec sf the corpus is ~67
    // events/user, so every user converts) and a live final stage
    assert(nV >= nC && nC >= nP && nP > 0, s"degenerate funnel $nV/$nC/$nP")
  }

  test("q44 retention cohorts: cells partition the event set; week-0 covers every cohort user") {
    import org.apache.spark.sql.functions._
    val got = SparkEntryLookup("q44_retention_cohorts")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // weeks_since >= 0 always (first-seen is the min)
    assert(got.forall(_._2 >= 0L))
    // week-0 exists for every cohort and counts every user whose first
    // event fell in that week (a user is active in their own first week
    // by definition)
    val firstSeen = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy("user_id").agg(min("ts").as("f"))
      .select(date_format(date_trunc("week", col("f")), "yyyy-MM-dd"))
      .collect().map(_.getString(0))
    val cohortSizes = firstSeen.groupBy(identity).view.mapValues(_.size.toLong)
    cohortSizes.foreach { case (wk, n) =>
      val cell = got.find(c => c._1 == wk && c._2 == 0L)
      assert(cell.exists(_._3 == n), s"week-0 of $wk: got $cell want $n")
    }
  }

  test("t21 BPE training: distributed merge list equals a reference driver BPE exactly") {
    // reference implementation: classic Sennrich BPE over the word-
    // frequency dict, overlapping pair counts, left-to-right
    // non-overlapping merge application, (freq desc, l, r) tie-break
    val wordFreq = docs.flatMap(_._2.split(' ').filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var symbols: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp))) -> f
    }
    def totalSyms = symbols.map { case (ss, f) => ss.size * f }.sum
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    for (_ <- 0 until 8) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      symbols.foreach { case (ss, f) =>
        ss.indices.dropRight(1).foreach(i =>
          pairs((ss(i), ss(i + 1))) += f)
      }
      if (pairs.nonEmpty) {
        val ((l, r), freq) = pairs.toSeq
          .sortBy { case ((l, r), fr) => (-fr, l, r) }.head
        expected += ((l, r, freq))
        symbols = symbols.map { case (ss, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += ss(i); i += 1 }
          }
          b.result() -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    val got = TextOps.bpeTrainMerges(spark, sfDir, merges = 8)
    assert(got.map(t => (t._1, t._2, t._3)) == expected.toSeq,
      s"merge lists diverge:\n got=${got.map(t => (t._1, t._2, t._3))}\n exp=$expected")
    // symbol-count bookkeeping is consistent and strictly decreasing
    got.foreach { case (_, _, _, after, before) => assert(after < before) }
    // and the registry contract row is green
    val row = SparkEntryLookup("t21_bpe_train")(spark, sfDir).collect().head
    assert(row.getString(0) == expected.head._1)
    assert(row.getString(1) == expected.head._2)
    assert(row.getLong(2) == expected.head._3)
    assert(row.getLong(3) == 8L && row.getLong(4) == 1L && row.getLong(5) == 1L)
  }

  test("p18 compaction is lossless and actually reduces the file count") {
    val got = SparkEntryLookup("p18_compact_files")(spark, sfDir).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = docs.map(_._1) // sanity: totals preserved
    assert(got.map(_._2).sum == expected.size.toLong)
    // per-lang counts equal the source's
    val perLang = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    got.foreach { case (lang, n, compacted, bounded) =>
      assert(perLang(lang) == n, s"lang $lang count drifted")
      assert(compacted == 1L, "file count did not drop")
      assert(bounded == 1L, "file count above target")
    }
  }

  test("p20 dead-letter routing: both corrupt classes flag, payloads replayable, nothing dropped") {
    // pins the PERMISSIVE semantics the query depends on: a truncated
    // line AND a wrong-typed field both set the corrupt column (the
    // latter still parses its prefix fields — Spark's partial-parse
    // behavior, probed before the query was written), the raw payload
    // survives verbatim, and good+dead row counts partition the feed
    val out = graft.SparkEntry.queries("p20_dead_letter")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    val docs = Tables.documents(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val total = docs.count()
    val expectedDead = docs.filter(col("doc_id") % 4 >= 2).count()
    val (deadN, deadSum, deadWords) = out("_dead_letter")
    assert(deadN == expectedDead, s"dead count $deadN != $expectedDead")
    assert(deadWords == -1L, "dead bucket must carry NULL sum_words")
    // replay guarantee: recovered ids sum to the true dead-id sum
    val expectedDeadSum = docs.filter(col("doc_id") % 4 >= 2)
      .agg(org.apache.spark.sql.functions.sum("doc_id")).head().getLong(0)
    assert(deadSum == expectedDeadSum, "raw payloads not replayable")
    // nothing dropped: good + dead == corpus
    val goodN = out.filterKeys(_ != "_dead_letter").values.map(_._1).sum
    assert(goodN + deadN == total, s"$goodN + $deadN != $total")
  }

  test("t22 NB classifier beats the majority baseline — it actually learned the heuristic") {
    // the confusion matrix is hash-gated against DuckDB; this pins the
    // MODEL QUALITY claim: accuracy on the held-out half must beat
    // predicting the majority class (a broken model that predicts one
    // class everywhere still produces a stable confusion matrix — this
    // is the assertion that would catch it). Both classes must also be
    // genuinely present in the test half, or the baseline is vacuous.
    val conf = TextOps.all.find(_.name == "t22_nb_classifier").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val total = conf.values.sum.toDouble
    val correct = conf.filter { case ((l, p), _) => l == p }.values.sum
    val class0 = conf.collect { case ((0L, _), n) => n }.sum
    val class1 = conf.collect { case ((1L, _), n) => n }.sum
    assert(class0 > 0 && class1 > 0, s"degenerate test labels: $conf")
    val acc = correct / total
    val majority = math.max(class0, class1) / total
    info(f"t22 accuracy $acc%.3f vs majority baseline $majority%.3f")
    assert(acc > majority,
      f"NB accuracy $acc%.3f does not beat majority $majority%.3f — no signal learned")
    // and the model predicts BOTH classes (not a constant classifier)
    assert(conf.keys.map(_._2).toSet == Set(0L, 1L), conf.toString)
  }

  test("t22 vocab switch: a non-Heaps corpus plans the distributed model by itself") {
    import org.apache.spark.sql.functions._
    // pathological corpus: one UNIQUE token per doc, so the
    // "vocabulary" grows linearly with the corpus instead of
    // Heaps'-law-bounded. nbClassifier's bounded probe (limit(cap+2),
    // ≤ cap+2 driver rows at any corpus size) detects this and
    // switches to the distributed shuffle-join scorer on its own —
    // the t15b/t25 discipline; the old throwing guard is retired.
    val dir = java.nio.file.Files.createTempDirectory("t22guard").toString
    spark.range(100)
      .select(col("id").as("doc_id"),
        // half the docs carry the 'hash' class marker so BOTH class
        // priors exist; the uniqtok suffix keeps the vocab linear
        // id%4 so both classes land in the even-id TRAINING half too
        concat(when(col("id") % 4 === 0, "hash ").otherwise("sort "),
          lit("uniqtok"), col("id")).as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val switched = TextOps.nbClassifier(spark, dir, maxVocab = 8)
    assert(switched.collect().toSeq ==
      TextOps.nbClassifierDistributed(spark, dir).collect().toSeq,
      "t22's over-cap switch diverged from the distributed scorer")
    // and the REAL corpus is comfortably under the real cap (the
    // switch never leaves the collect path on the gate fixtures)
    assert(TextOps.nbClassifier(spark, sfDir).collect().nonEmpty)
  }

  test("t15 LM model-path switch: an over-budget model goes distributed by itself, bounded probe, no human step") {
    import org.apache.spark.sql.functions._
    // adversarial corpus: every doc is two unique space-separated
    // tokens, so BOTH model tables (distinct unigrams AND distinct
    // bigrams) grow linearly with the corpus instead of
    // Heaps'-bounding. lmPerplexity must now SWITCH to the
    // distributed-model plan on its own (the r11 guard made a human
    // swap in lmPerplexityDistributed; the sf1 measurement — t26/t15
    // = 0.75 — showed the distributed plan is the cheaper one in
    // exactly this regime, so failing was the wrong answer). The
    // probe stays limit(cap+1)-bounded: the driver materializes at
    // most cap+1 rows no matter how large the corpus is.
    val dir = java.nio.file.Files.createTempDirectory("lmguard").toString
    spark.range(100)
      .select(col("id").as("doc_id"),
        concat(lit("aa"), col("id"), lit(" bb"), col("id")).as("text"),
        // two langs so t25's tercile machinery below has real groups
        when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val switched = TextOps.lmPerplexity(spark, dir, maxModelRows = 8)
    // the switched plan is the distributed one: model stays in-plan,
    // nothing was collected to the driver
    assert(!switched.queryExecution.executedPlan.toString
        .contains("LocalTableScan"),
      "over-budget model was still collected to the driver")
    assert(switched.collect().toSeq ==
      TextOps.lmPerplexityDistributed(spark, dir).collect().toSeq)
    // below the budget the same call keeps the collect-and-broadcast
    // plan (this 200-row "model" fits the default cap) and both paths
    // agree on the same corpus
    val collected = TextOps.lmPerplexity(spark, dir)
    assert(collected.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(switched.collect().toSeq == collected.collect().toSeq)
    // t25 takes the SAME cost-based switch (the old loud guard is
    // retired): over the budget the tercile scorer plans the
    // distributed model — nothing collected to the driver — and the
    // buckets are identical to the collect path's. nocut keeps the
    // scoring subtree visible through the per-doc Lineage.cut (which
    // would otherwise collapse both paths to the same LogicalRDD scan)
    sys.props("graft.lineage.nocut") = "true"
    try {
      val switchedPlan = TextOps.pplBuckets(spark, dir, maxModelRows = 8)
        .queryExecution.executedPlan.toString
      assert(!switchedPlan.contains("LocalTableScan"),
        "t25's over-budget model was still collected to the driver")
      assert(TextOps.pplBuckets(spark, dir)
          .queryExecution.executedPlan.toString.contains("LocalTableScan"),
        "t25's under-budget model left the collect-and-broadcast path")
    } finally sys.props.remove("graft.lineage.nocut")
    assert(TextOps.pplBuckets(spark, dir, maxModelRows = 8).collect().toSeq ==
      TextOps.pplBuckets(spark, dir).collect().toSeq,
      "t25's two model paths disagree on the buckets")
    // and the REAL corpus is comfortably under the real cap (the
    // switch never leaves the collect path on the gate fixtures)
    assert(TextOps.lmPerplexity(spark, sfDir).collect().nonEmpty)
  }

  test("t15/t22 distributed-model fallbacks match the executor-memory paths row-for-row") {
    // the guards name lmPerplexityDistributed / nbClassifierDistributed
    // as the 100 TB escape hatch for non-Heaps' vocabularies; this pins
    // that both produce the executor-memory results EXACTLY on the gate
    // corpus — with broadcasting disabled, so the token-keyed shuffle
    // joins (the shape that actually replaces the driver model) are the
    // code path being measured, not an auto-broadcast of a small model
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lmD = TextOps.lmPerplexityDistributed(spark, sfDir)
      assert(lmD.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        "distributed LM scorer must shuffle-join the token keys when broadcast is off")
      assert(lmD.collect().toSeq ==
        TextOps.lmPerplexity(spark, sfDir).collect().toSeq)
      assert(TextOps.nbClassifierDistributed(spark, sfDir).collect().toSeq ==
        TextOps.nbClassifier(spark, sfDir).collect().toSeq)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("t23 DSIR weights carry the target signal and drive the resample stage") {
    import org.apache.spark.sql.functions._
    // the per-doc weights are hash-gated against DuckDB; this pins the
    // METHOD claim: importance weights under the lang='en' target must
    // rank English documents above the rest ON AVERAGE (a broken lambda
    // table — e.g. target/raw swapped — flips the sign), and the top-k
    // resampling stage over the scores must be English-enriched vs the
    // corpus base rate.
    val scored = TextOps.dsirScores(spark, sfDir)
      .join(graft.rel.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("logw"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(scored.length > 50, s"only ${scored.length} scored docs")
    val (en, rest) = scored.partition(_._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty, "need both target and non-target docs")
    val meanEn = en.map(_._3).sum / en.length
    val meanRest = rest.map(_._3).sum / rest.length
    info(f"t23 mean logw: en $meanEn%.4f vs rest $meanRest%.4f")
    assert(meanEn > meanRest,
      f"target docs do not outscore the rest ($meanEn%.4f <= $meanRest%.4f)")
    // resample: top-quarter by weight (doc_id tie-break) is en-enriched
    val k = scored.length / 4
    val top = scored.sortBy(t => (-t._3, t._1)).take(k)
    val topRate = top.count(_._2 == "en").toDouble / k
    val baseRate = en.length.toDouble / scored.length
    info(f"t23 resample en-rate $topRate%.3f vs base $baseRate%.3f")
    assert(topRate > baseRate,
      f"top-$k resample ($topRate%.3f) not enriched over base ($baseRate%.3f)")
  }

  test("t24 quantile bins partition the corpus into balanced, ordered, member-keepered deciles") {
    import org.apache.spark.sql.functions.col
    val bins = TextOps.all.find(_.name == "t24_quantile_bins").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = Tables.documents(spark, sfDir).count()
    // a partition: every doc in exactly one bin
    assert(bins.map(_._2).sum == n, s"bins don't partition the corpus: $bins")
    assert(bins.map(_._1).toSeq == bins.map(_._1).toSeq.sorted)
    assert(bins.length >= 5 && bins.length <= 10, bins.map(_._1).mkString(","))
    // bins are VALUE-ordered: each bin's hi <= next bin's lo (equal
    // values share a bin, so strict ranges never interleave)
    bins.sliding(2).foreach {
      case Array((_, _, _, hi1, _), (_, _, lo2, _, _)) =>
        assert(hi1 <= lo2, s"bin ranges interleave: $hi1 > $lo2")
      case _ =>
    }
    // integer-rank binning bounds each bin at N/10 + the largest tie
    // group (ties share a bin and can only inflate ONE bin each)
    val maxTie = Tables.documents(spark, sfDir)
      .groupBy("n_chars").count().collect().map(_.getLong(1)).max
    bins.foreach { case (b, nd, _, _, _) =>
      assert(nd <= n / 10 + maxTie, s"bin $b has $nd docs (n=$n, maxTie=$maxTie)")
    }
    // the keeper is a member of its own bin
    val docChars = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    bins.foreach { case (b, _, lo, hi, keeper) =>
      val c = docChars(keeper)
      assert(c >= lo && c <= hi, s"bin $b keeper $keeper n_chars $c outside [$lo,$hi]")
    }
  }

  test("t28 token-budget mix: greedy-by-quality per lang, budgets exact, maximal") {
    import org.apache.spark.sql.functions._
    val got = TextOps.tokenBudgetMix(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // in-memory reference: same tokenizer/quality/order, same
    // integer-split budget formula
    val toks = docs.map { case (id, t) =>
      (id, t.split(" ").filter(_.nonEmpty))
    }.filter(_._2.nonEmpty)
    val langOf = Tables.documents(spark, sfDir).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = toks.map { case (id, w) =>
      (id, langOf(id), w.length.toLong, w.distinct.length.toDouble / w.length)
    }
    val tByLang = perDoc.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val b = tByLang.values.sum / 4
    val uByLang = tByLang.view.mapValues(t => math.floor(math.sqrt(t.toDouble)).toLong).toMap
    val s0 = uByLang.values.sum
    val budget = uByLang.map { case (l, u) => l -> (u * (b / s0) + u * (b % s0) / s0) }
    val want = perDoc.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(x => (-x._4, x._1)).flatMap { case (id, _, n, _) =>
        val keep = cum < budget(lang)
        val r = if (keep) Some((id, lang, n, cum)) else None
        cum += n
        r
      }
    }.toSet
    assert(got.toSet == want, s"got ${got.length} rows, want ${want.size}")
    // each lang stops within one doc of its budget (greedy maximality)
    got.groupBy(_._2).foreach { case (lang, sel) =>
      val kept = sel.map(_._3).sum
      assert(sel.forall(_._4 < budget(lang)))
      // the last kept doc started under budget; total tokens of the
      // lang either exhaust it or the next doc would overshoot
      assert(kept >= math.min(budget(lang), tByLang(lang)),
        s"$lang kept $kept < budget ${budget(lang)}")
    }
  }
}
