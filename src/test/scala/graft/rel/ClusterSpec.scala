package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-components (d07) semantics: star-rounds must converge to
  * min-label components on hand-built graphs, and the cluster query
  * must be the transitive closure of the exact d03 pair set.
  */
class ClusterSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Cluster.connectedComponents(spark, edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to its minimum") {
    // worst case for label propagation: a path graph
    val chain = (1L until 12L).map(i => (i, i + 1))
    val m = cc(chain)
    assert(m == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate roots") {
    val m = cc(Seq((5L, 3L), (3L, 9L), (20L, 21L), (40L, 41L), (41L, 42L)))
    assert(m == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L,
      40L -> 40L, 41L -> 40L, 42L -> 40L))
  }

  test("duplicate and reversed edges are harmless") {
    val m = cc(Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("randomized graphs match driver-side union-find (property-style)") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 12) {
      val nNodes = 2 + rng.nextInt(40)
      val nEdges = 1 + rng.nextInt(60)
      val ids = Seq.fill(nNodes)(rng.nextInt(1000).toLong).distinct
      val edges = Seq.fill(nEdges) {
        (ids(rng.nextInt(ids.length)), ids(rng.nextInt(ids.length)))
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        assert(cc(edges) == expected, s"trial $trial: edges $edges")
      }
    }
  }

  test("hub nodes fail loudly with advice, not an executor OOM") {
    // the guard the star rounds call on every collected neighbor list
    val err = intercept[IllegalArgumentException] {
      Cluster.checkDegree(42L, Cluster.MaxDegree + 1)
    }
    assert(err.getMessage.contains("node 42"))
    assert(err.getMessage.contains("dedup exact duplicates first"))
    Cluster.checkDegree(42L, Cluster.MaxDegree) // at the cap: fine
    // and a (small) hub graph still resolves correctly
    val m = cc((1L to 5L).map(i => (0L, i)))
    assert(m == (0L to 5L).map(_ -> 0L).toMap)
  }

  test("d07 assignment is the transitive closure of the d03 pairs") {
    val pairSet = Dedup.all.find(_.name == "d03_ngram_jaccard").get
      .fn(spark, sfDir).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val asg = Cluster.nearDupClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // union-find ground truth on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairSet.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap

    assert(asg.map(t => t._1 -> t._2).toMap == expected)
    // sizes consistent with the assignment itself
    val bySize = asg.groupBy(_._2).view.mapValues(_.length).toMap
    assert(asg.forall { case (_, cid, sz) => bySize(cid) == sz })
    // every cluster id is a member of its own cluster
    val members = asg.map(_._1).toSet
    assert(asg.map(_._2).toSet.subsetOf(members))
  }

  test("d14 materialization: keepers are exactly the cluster minima, counts add up") {
    val asg = Cluster.nearDupClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mat = Cluster.dedupMaterialize(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(mat.length == nDocs, "one verdict row per document")
    val byDoc = asg.map(t => t._1 -> (t._2, t._3)).toMap
    mat.foreach { case (id, canon, keep, nDups) =>
      byDoc.get(id) match {
        case Some((cid, sz)) =>
          assert(canon == cid && keep == (id == cid) && nDups == sz - 1,
            s"doc $id diverged from its cluster row")
        case None =>
          assert(canon == id && keep && nDups == 0L,
            s"unclustered doc $id must keep itself")
      }
    }
    // the deduped corpus keeps exactly one doc per component plus all
    // unclustered docs
    val keepers = mat.count(_._3)
    val components = asg.map(_._2).distinct.length
    val clustered = asg.length
    assert(keepers == nDocs - clustered + components)
  }

  test("d22 split: no cluster straddles a split; the naive doc_id split leaks") {
    val split = Cluster.clusterSplit(spark, sfDir)
    // leakage audit over the REAL assignment: every cluster lives in
    // exactly one split (by construction — split hashes canonical_id)
    val leaky = split.groupBy("canonical_id")
      .agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(leaky == 0L, s"$leaky clusters straddle a split boundary")
    // total coverage + sane shape: every doc assigned once, train the
    // strict majority (90/5/5 buckets; the fixture is small so val and
    // test get a loose nonempty-union check, not exact fractions)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val byS = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.values.sum == nDocs)
    assert(byS.getOrElse("train", 0L) >
      byS.getOrElse("val", 0L) + byS.getOrElse("test", 0L))
    // the contrast that justifies the operator, on a CRAFTED fixture
    // (not the shared sf corpus, whose md5-bucket luck a testdata
    // regeneration could change): one near-dup pair whose doc_ids are
    // CHOSEN to hash across the 90/95 split boundaries, so the naive
    // doc_id-keyed split provably scatters the cluster while the
    // cluster-keyed split provably does not
    import spark.implicits._
    def naiveBucketOf(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(6).map(b => f"${b & 0xff}%02x").mkString
      (BigInt(hex, 16) % 100).toLong
    }
    val trainId = (1L to 1000L).find(naiveBucketOf(_) < 90).get
    val testId = (1L to 1000L).find(naiveBucketOf(_) >= 95).get
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val crafted = java.nio.file.Files.createTempDirectory("d22fix").toString
    try {
      ((1L to 30L).filterNot(i => i == trainId || i == testId)
        .map(i => (i, s"filler$i w$i x$i y$i z$i q$i r$i s$i")) ++
        Seq((trainId, dup), (testId, dup)))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$crafted/documents.parquet")
      val cSplit = Cluster.clusterSplit(spark, crafted)
      // the planted pair IS one cluster, and the cluster-keyed split
      // keeps it whole...
      val pairSplits = cSplit
        .filter(col("doc_id").isin(trainId, testId))
        .select("canonical_id", "split").distinct().collect()
      assert(pairSplits.map(_.getLong(0)).distinct.length == 1,
        s"planted near-dup pair did not cluster: ${pairSplits.toSeq}")
      assert(pairSplits.length == 1,
        s"cluster-keyed split scattered the planted cluster: ${pairSplits.toSeq}")
      // ...while the naive doc_id-keyed split provably scatters it
      val naiveBucket = conv(substring(
        md5(col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long") % 100
      val naiveLeaky = cSplit
        .withColumn("nsplit",
          when(naiveBucket < 90, "train").when(naiveBucket < 95, "val")
            .otherwise("test"))
        .groupBy("canonical_id")
        .agg(countDistinct("nsplit").as("ns"))
        .filter(col("ns") > 1).count()
      assert(naiveLeaky > 0L,
        "naive split failed to scatter the deterministically planted " +
          "boundary-straddling cluster")
    } finally {
      val p = new org.apache.hadoop.fs.Path(crafted)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
