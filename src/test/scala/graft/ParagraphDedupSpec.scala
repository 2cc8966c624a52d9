package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Paragraph keep-first dedup: segmentation, winner selection,
  * byte-exact reconstruction, and the dup/boilerplate profiles.
  */
class ParagraphDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def df(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (id, text, src) => (id, text, "l", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // 16-token paragraphs: build from letter runs of exactly 16 tokens
  private def para(c: Char): String = Seq.fill(16)(c.toString).mkString(" ")

  test("segments: non-overlapping 16-token windows, short tail kept") {
    val d = df((1L, (1 to 35).map(i => s"w$i").mkString(" "), "s0"))
    val segs = ext.ParagraphDedup.segments(d)
      .orderBy("idx").collect().map(r => (r.getLong(2), r.getString(3)))
    assert(segs.length == 3)
    assert(segs(0)._2.startsWith("w1 ") && segs(1)._2.startsWith("w17 "))
    assert(segs(2)._2 == "w33 w34 w35") // the 3-token tail survives as-is
    // token-less docs emit nothing
    assert(ext.ParagraphDedup.segments(df((2L, "  ", "s0"))).count() == 0)
  }

  test("keepFirst: exactly one copy of a repeated paragraph survives, by (doc_id, idx)") {
    val a = para('a'); val b = para('b'); val c = para('c')
    val d = df(
      (1L, s"$a $b", "s0"),   // a@(1,0) b@(1,1) — both first
      (2L, s"$b $c", "s0"),   // b@(2,0) repeat, c@(2,1) first
      (3L, s"$a $a", "s1"))   // both repeats of a@(1,0) (and of each other)
    val got = ext.ParagraphDedup.keepFirst(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == ((2L, 2L, s"$a $b")))
    assert(got(2L) == ((2L, 1L, c)))
    assert(got(3L) == ((2L, 0L, "")))
  }

  test("keepFirst: within-doc repeats keep only the earliest index") {
    val a = para('a')
    val d = df((4L, s"$a $a $a", "s0"))
    val got = ext.ParagraphDedup.keepFirst(d).collect()(0)
    assert((got.getLong(2), got.getLong(3), got.getString(4)) == ((3L, 1L, a)))
  }

  test("dupProfile counts non-winner occurrences and their chars") {
    val a = para('a'); val b = para('b')
    val d = df(
      (1L, s"$a $b", "s0"),
      (3L, s"$a $a", "s1"))
    val got = ext.ParagraphDedup.dupProfile(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("s0") == ((2L, 0L, 0L, 0L)))
    assert(got("s1") == ((2L, 2L, 2L * a.length, 1000000L)))
  }

  test("boilerplateProfile flags families with df >= minDf across docs") {
    val a = para('a'); val b = para('b')
    // a appears in 4 distinct docs (boilerplate at minDf=4); b in 1
    val d = df(
      (1L, s"$a $b", "s0"), (2L, a, "s0"), (3L, a, "s1"), (4L, a, "s1"))
    val got = ext.ParagraphDedup.boilerplateProfile(d, minDf = 4).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("s0") == ((3L, 2L, 2L * a.length)))
    assert(got("s1") == ((2L, 2L, 2L * a.length)))
  }

  test("checksum face folds keepFirst exactly (counts, chars, fingerprints)") {
    val a = para('a'); val b = para('b'); val c = para('c')
    val d = df((1L, s"$a $b", "s0"), (2L, s"$b $c", "s0"), (3L, s"$a $a", "s1"))
    val kf = ext.ParagraphDedup.keepFirst(d).collect()
    val cs = ext.ParagraphDedup.checksum(d).collect()(0)
    assert(cs.getLong(0) == kf.length)
    assert(cs.getLong(1) == kf.map(_.getLong(3)).sum)
    assert(cs.getLong(2) == kf.map(_.getString(4).length.toLong).sum)
    // fp of "" is 0, so the all-dropped doc contributes nothing
    def fp(s: String): Long =
      s.zipWithIndex.map { case (ch, i) => ch.toLong * (i + 1) }.sum % 1000000007L
    assert(cs.getLong(3) == kf.map(r => fp(r.getString(4))).sum)
  }

  test("incremental: corpus paragraphs are dropped from the batch, fresh ones kept") {
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    // find ids on each side of the md5-bucket split with spark itself
    val spark2 = spark
    import spark2.implicits._
    val buckets = (0L until 200L).toDF("id")
      .select(col("id"), conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10)
        .cast("long").as("b")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchId = buckets.collectFirst { case (i, b) if b < 6554 => i }.get
    val corpusIds = buckets.collect { case (i, b) if b >= 6554 => i }.take(2).toSeq
    val a = para('a'); val b = para('b'); val c = para('c')
    val d = df(
      (corpusIds(0), s"$a $b", "s0"),  // standing corpus holds a and b
      (corpusIds(1), c, "s0"),         // and c
      (batchId, s"$a $c ${para('z')}", "s1")) // batch: a, c known; z fresh
    val got = ext.ParagraphDedup.incremental(d).collect()
    assert(got.length == 1 && got(0).getLong(0) == batchId)
    assert((got(0).getLong(2), got(0).getLong(3), got(0).getString(4)) ==
      ((3L, 1L, para('z'))))
  }

  test("registry faces run on testdata; reconstruction conserves text on a dup-free doc") {
    val dir = "/root/testdata/sf0.001"
    val kf = SparkEntry.queries("dedup_paragraph_keepfirst")(spark, dir)
    assert(kf.columns.toSeq == Seq("doc_id", "source", "n_segs", "n_kept", "new_text"))
    assert(kf.count() > 0)
    // invariant: n_kept <= n_segs, and a fully-kept doc reconstructs its
    // whitespace-normalized text byte for byte
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(ext.TextAnalysis.tokens(col("text")), " ").as("norm"))
    val joined = kf.join(docs, "doc_id")
    assert(joined.where(col("n_kept") > col("n_segs")).count() == 0)
    assert(joined.where(col("n_kept") === col("n_segs") &&
      col("new_text") =!= col("norm")).count() == 0)
    val prof = SparkEntry.queries("paragraph_dup_profile")(spark, dir)
    assert(prof.columns.toSeq == Seq("source", "n_segs", "n_dup", "dup_chars", "dup_ppm"))
    val boiler = SparkEntry.queries("paragraph_boilerplate_profile")(spark, dir)
    assert(boiler.columns.toSeq ==
      Seq("source", "n_segs", "n_boiler", "boiler_chars", "boiler_ppm"))
  }
}
