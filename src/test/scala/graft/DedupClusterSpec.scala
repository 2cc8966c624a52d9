package graft

import graft.ext.{Dedup, DedupCluster, Quality, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupCluster.connectedComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find, the test-side ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("planted chain, separate pair, and hub resolve to component minima") {
    // chain 1-2-3 (transitive!), pair 10-11, star around 20
    val labels = cc(Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (20L, 22L), (23L, 20L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("empty edge list yields empty labels") {
    assert(cc(Seq.empty).isEmpty)
  }


  test("long path graph (worst diameter for propagation) converges to one component") {
    val n = 300L
    val labels = cc((1L until n).map(i => (i, i + 1)))
    assert(labels.size == n)
    assert(labels.values.forall(_ == 1L), "every path node must label to the minimum")
  }

  test("random graphs match union-find across seeds") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) == unionFind(edges), s"seed $seed")
    }
  }

  test("2000-node random graphs with many components match union-find") {
    // stress for the one-job-per-round loop: sparse enough for hundreds
    // of components, dense clusters, and a long path all at once
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      val edges =
        Seq.fill(1500)((rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
          .filter { case (a, b) => a != b } ++
        (5000L until 5300L).map(i => (i, i + 1)) // planted 300-node path
      assert(cc(edges) == unionFind(edges), s"seed $seed")
    }
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val labels = cc(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    // 3 only ever appears in a self-loop → no edge evidence → absent
    assert(labels == Map(1L -> 1L, 2L -> 1L))
  }

  test("cluster assignments: singletons label themselves, members label to min") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "y"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = DedupCluster.clusterAssignments(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("canonical corpus keeps one representative per cluster with the right size") {
    import spark.implicits._
    val docs = Seq((1L, "en", "s1", 5L), (2L, "en", "s1", 5L),
        (3L, "en", "s2", 6L), (9L, "de", "s3", 7L))
      .toDF("doc_id", "lang", "source", "n_chars")
      .withColumn("text", lit("t"))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = DedupCluster.canonicalCorpus(docs, pairs)
      .select("doc_id", "cluster_size")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 9L -> 1L))
  }

  test("cluster labels on testdata close the jaccard pair graph exactly") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.ngramJaccardPairs(docs, 0.12)
    val pairList = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = unionFind(pairList)
    val got = DedupCluster.clusterAssignments(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(got(id) == expected.getOrElse(id, id), s"doc $id")
    }
  }
}

class QualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("repetition profile: degenerate repeated doc vs all-distinct doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),   // 4 tokens, 1 distinct, bigram "spam spam" ×3
      (2L, "alpha beta gamma"),      // all distinct
      (3L, "solo")                   // single token → no bigrams
    ).toDF("doc_id", "text")
    val got = Quality.repetitionProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 4 && got(1L).getLong(2) == 1)
    assert(got(1L).getLong(3) == 4, "top unigram count")
    assert(got(1L).getLong(4) == 3 && got(1L).getLong(5) == 3)
    assert(got(1L).getDouble(6) == 0.75, "rep_unigram_frac = (4-1)/4")
    assert(got(1L).getDouble(7) == 1.0, "one bigram carries all bigram mass")
    assert(got(2L).getDouble(6) == 0.0 && got(2L).getDouble(7) < 0.51)
    assert(got(3L).getLong(4) == 0 && got(3L).getDouble(7) == 0.0)
  }

  test("decontamination flags exactly the training docs sharing an 8-gram") {
    import spark.implicits._
    val eightGram = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"benchmark doc containing $eightGram verbatim"),
      (2L, s"training doc leaking $eightGram right here"),     // contaminated
      (3L, "clean training doc with entirely different words spread around"),
      (4L, "short")
    ).toDF("doc_id", "text")
    val got = Quality.decontaminationReport(docs, col("doc_id") === 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L))
  }

  test("tfidf ranks by tf desc then rarity then term, k per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat dog fish"),  // cat tf=2; dog/fish tf=1, dog df=2 > fish df=1
      (2L, "dog bird")
    ).toDF("doc_id", "text")
    val got = Quality.tfidfTopTerms(docs, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(got((1L, 1)) == "cat")
    assert(got((1L, 2)) == "fish", "tf tie broken toward the rarer term")
    assert(got((1L, 3)) == "dog")
    assert(got((2L, 1)) == "bird", "within-doc tf tie: rarity first")
    assert(got((2L, 2)) == "dog")
  }

  test("tfidf on testdata: every doc gets at most 3 ranked rows, ranks contiguous") {
    val rows = Quality.tfidfTopTerms(Tables.documents(spark, sf), 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(3) == 1 && r.getInt(2) == r.getLong(1))
    }
  }

  test("decontamination report on testdata agrees with a brute-force recount") {
    val docs = Tables.documents(spark, sf)
    val evalSide = Sampling.hashBucket(col("doc_id")) < 6554
    // brute force: distinct 8-grams per doc via the same expression,
    // intersected in test code
    val sh = docs.select(col("doc_id"), col("text"),
        graft.functions.WordShingles.wordShingles(col("text"), 8).as("g"),
        evalSide.as("ev")).collect()
    val bench = sh.filter(_.getBoolean(3)).flatMap(_.getSeq[String](2)).toSet
    val expected = sh.filterNot(_.getBoolean(3))
      .map(r => r.getLong(0) -> r.getSeq[String](2).toSet.intersect(bench).size.toLong)
      .filter(_._2 > 0).toMap
    val got = Quality.decontaminationReport(docs, evalSide)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("incremental jaccard equals the batch-vs-corpus slice of a brute-force recount") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base + " one extra tail"),        // batch
      (2L, base + " different ending here"), // corpus: near-dup of 1
      (3L, base),                            // corpus: near-dup of 1
      (4L, "wholly unrelated content about tides and harbors and ships at sea"),
      (5L, base + " another tail entirely")  // batch: near-dup of 2,3
    ).toDF("doc_id", "text")
    val isBatch = col("doc_id").isin(1L, 5L)
    val got = Dedup.incrementalJaccardPairs(docs, isBatch, 0.3)
      .select("batch_doc", "corpus_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: full pair list from the symmetric operator, sliced
    val all = Dedup.ngramJaccardPairs(docs, 0.3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val batchSet = Set(1L, 5L)
    val expected = all.flatMap { case (a, b) =>
      (batchSet.contains(a), batchSet.contains(b)) match {
        case (true, false) => Some((a, b))
        case (false, true) => Some((b, a))
        case _             => None
      }
    }.toSet
    assert(expected.nonEmpty && got == expected)
  }

  test("curated corpus: every survivor is canonical, uncontaminated, quality-passing") {
    val docs = Tables.documents(spark, sf)
    val evalSide = Sampling.hashBucket(col("doc_id")) < 6554
    val kept = graft.ext.Curate.curateCorpus(docs, evalSide)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    val train = docs.filter(!evalSide)
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(trainIds), "eval docs must never survive")
    // canonical: survivor = min of its cluster in the train-only graph
    val labels = DedupCluster.clusterAssignments(train,
        Dedup.ngramJaccardPairs(train, 0.12))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept.foreach(id => assert(labels(id) == id, s"doc $id kept but not canonical"))
    // uncontaminated
    val dirty = Quality.decontaminationReport(docs, evalSide)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(dirty).isEmpty)
    // and the pipeline dropped someone at each gate on this corpus
    val nonCanonical = trainIds.filter(id => labels(id) != id)
    assert(nonCanonical.nonEmpty, "fixture should exercise the dedup gate")
  }
}
