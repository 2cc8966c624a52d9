package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** WordPiece tokenizer TRAINING (Schuster & Nakajima 2012; the BERT
  * tokenizer's trainer): identical merge mechanics to [[BpeTrain]] —
  * start from characters within words, merge one adjacent pair per
  * round, greedy LTR within runs — but the pair picked each round
  * maximizes the LIKELIHOOD GAIN score
  *
  *   score(a,b) = freq(ab) / (freq(a) · freq(b))
  *
  * (the pointwise-mutual-information argmax: merging the pair that
  * most exceeds its independence expectation) instead of BPE's raw
  * frequency argmax. The score is carried as a scaled integer,
  * `score_x1e9 = n·10⁹ div (n_lft·n_rgt)`, with deterministic ties
  * (score desc, n desc, lft, rgt) — truncating div both engines
  * implement identically, so the DuckDB oracle replays the argmax bit
  * for bit. Headroom: the numerator holds to n ≤ 9.2·10⁹ pair
  * occurrences and the denominator to ~3·10⁹ total symbol occurrences
  * per trainer run (multi-TB of text; shard the dictionary beyond).
  *
  * Scale shape = [[BpeTrain]]'s exactly (the round loop rides DISTINCT
  * WORD TYPES with corpus frequency — Heaps-sublinear; one exchange +
  * sort per round; the best pair is ONE collected row): the only new
  * per-round cost is the symbol-count aggregate, which is
  * vocabulary-keyed and map-side combined, and the pair↔symbol joins
  * run on the PAIR TABLE (alphabet², broadcast-sized), never the
  * stream. Serialized persist/unpersist chain per the BpeTrain
  * memory discipline.
  */
object WordPiece {

  /** The first `rounds` learned merges: (round, lft, rgt, n,
    * score_x1e9) — the likelihood-gain argmax of each round with its
    * pair count and scaled score at merge time.
    */
  def trainMerges(docs: DataFrame, rounds: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainCore(docs, rounds)._1.toDF("round", "lft", "rgt", "n", "score_x1e9")
  }

  /** Final symbol vocabulary after the learned merges: (tok,
    * n_occurrences), corpus-frequency-weighted — the vocabulary a
    * WordPiece run ships. Type-bounded output.
    */
  def symbolVocab(docs: DataFrame, rounds: Int = 5): DataFrame =
    trainCore(docs, rounds)._2
      .groupBy(col("tok")).agg(sum(col("freq")).as("n_occurrences"))

  /** The per-instance token stream AFTER the learned merges — the
    * [[BpeTrain.bpeApplyStream]] contract under the WordPiece argmax
    * (training maintains the applied tokenization; apply = fan the
    * final word-TYPE stream back to instances by ONE equi-join on the
    * word string): (doc_id, word_id, pos, tok).
    */
  def applyStream(docs: DataFrame, rounds: Int = 5): DataFrame = {
    val instances = docs
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), "\\s+"), w => w =!= ""))
          .as(Seq("word_id", "word")))
    instances.join(trainCore(docs, rounds)._2, "word")
      .select(col("doc_id"), col("word_id"), col("pos"), col("tok"))
  }

  /** How many of the first `rounds` merges WordPiece and BPE share on
    * this corpus — ONE row (n_rounds, n_common). The likelihood-gain
    * argmax diverges from the frequency argmax exactly where a
    * frequent pair is frequent only because its parts are (the
    * "of the" case WordPiece exists to skip).
    */
  def vsBpeOverlap(docs: DataFrame, rounds: Int = 5): DataFrame = {
    val wp = trainMerges(docs, rounds).select(col("lft"), col("rgt"))
    val bpe = BpeTrain.bpeTrainMerges(docs, rounds).select(col("lft"), col("rgt"))
    wp.intersect(bpe)
      .agg(count(lit(1)).as("n_common"))
      .select(lit(rounds).as("n_rounds"), col("n_common"))
  }

  /** The BpeTrain round loop with the WordPiece argmax. Returns the
    * merge list and the final word-TYPE stream (word, freq, pos, tok).
    */
  private def trainCore(docs: DataFrame, rounds: Int): (Seq[(Int, String, String, Long, Long)], DataFrame) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val wWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    val wRunning = wWord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var t = docs
      .select(explode(filter(split(col("text"), "\\s+"), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        posexplode(filter(split(col("word"), ""), c => c =!= "")).as(Seq("pos", "tok")))
      // 1-based from the start: every merge round re-densifies pos via
      // row_number anyway, but a corpus whose pair supply exhausts
      // BEFORE round 1 (single-char words only) would otherwise emit
      // the 0-based posexplode index where the oracle's t0 is 1-based
      .withColumn("pos", col("pos") + lit(1))
      .persist(ser)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var toFree: List[DataFrame] = Nil
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      r += 1
      val pre = t.withColumn("nxt", lead(col("tok"), 1).over(wWord))
        .persist(ser)
      // per-round model: pair counts × the two symbols' unigram counts.
      // Both tables are alphabet-bounded; the joins ride the PAIR table.
      val syms = pre.groupBy(col("tok")).agg(sum(col("freq")).as("m"))
      val bestRows = pre.filter(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt")).agg(sum(col("freq")).as("n"))
        .join(syms.withColumnRenamed("tok", "lft_sym")
          .withColumnRenamed("m", "n_lft"), col("tok") === col("lft_sym"))
        .join(syms.withColumnRenamed("tok", "rgt_sym")
          .withColumnRenamed("m", "n_rgt"), col("nxt") === col("rgt_sym"))
        .select(col("tok"), col("nxt"), col("n"),
          expr("n * 1000000000L div (n_lft * n_rgt)").as("score"))
        .orderBy(col("score").desc, col("n").desc, col("tok"), col("nxt"))
        .limit(1)
        .collect()
      toFree.foreach(_.unpersist())
      toFree = Nil
      if (bestRows.isEmpty) {
        exhausted = true
        pre.unpersist()
      } else {
        val best = bestRows(0)
        val (lft, rgt, n, score) =
          (best.getString(0), best.getString(1), best.getLong(2), best.getLong(3))
        val m = pre
          .withColumn("cand",
            when(col("tok") === lit(lft) && col("nxt") === lit(rgt), 1).otherwise(0))
          .withColumn("ct", sum(col("cand")).over(wRunning))
          .withColumn("anchor",
            last(when(col("cand") === 0, col("ct")), ignoreNulls = true).over(wRunning))
          .withColumn("do_merge",
            when(col("cand") === 1 &&
              (col("ct") - coalesce(col("anchor"), lit(0L)) - 1) % 2 === 0, 1)
              .otherwise(0))
        val tNew = m.withColumn("prev_m", lag(col("do_merge"), 1).over(wWord))
          .filter(coalesce(col("prev_m"), lit(0)) === 0)
          .select(col("word"), col("freq"),
            row_number().over(wWord).as("pos"),
            when(col("do_merge") === 1, concat(col("tok"), col("nxt")))
              .otherwise(col("tok")).as("tok"))
          .persist(ser)
        toFree = List(pre, t)
        t = tNew
        merges += ((r, lft, rgt, n, score))
      }
    }
    (merges.toSeq, t)
  }

  val queries: Map[String, Q] = Map(
    "wordpiece_train_merges" -> ((s, dir) =>
      trainMerges(Tables.documents(s, dir), rounds = 5)),
    "wordpiece_symbol_vocab" -> ((s, dir) =>
      symbolVocab(Tables.documents(s, dir), rounds = 5)),
    "wordpiece_vs_bpe_overlap" -> ((s, dir) =>
      vsBpeOverlap(Tables.documents(s, dir), rounds = 5)),
    "wordpiece_apply_merges" -> ((s, dir) =>
      applyStream(Tables.documents(s, dir), rounds = 5))
  )

  /** One unrolled oracle round. The word-INSTANCE formulation (count(*)
    * = Spark's freq-weighted type counts, bit-identical); `wt$p` is
    * referenced by both the pair scan and the symbol counts →
    * AS MATERIALIZED per the round-14 CTE convention.
    */
  private def roundSql(r: Int): String = {
    val p = r - 1
    s"""wpre$r AS MATERIALIZED (
       |  SELECT doc_id, word_id, pos, tok,
       |    lead(tok) OVER (PARTITION BY doc_id, word_id ORDER BY pos) AS nxt
       |  FROM wt$p),
       |wsym$r AS (SELECT tok, CAST(count(*) AS BIGINT) AS m FROM wpre$r GROUP BY tok),
       |wb$r AS MATERIALIZED (
       |  SELECT lft, rgt, n, n * 1000000000 // (nl * nr) AS score
       |  FROM (
       |    SELECT p.tok AS lft, p.nxt AS rgt, CAST(count(*) AS BIGINT) AS n,
       |      any_value(sl.m) AS nl, any_value(sr.m) AS nr
       |    FROM wpre$r p
       |    JOIN wsym$r sl ON sl.tok = p.tok
       |    JOIN wsym$r sr ON sr.tok = p.nxt
       |    WHERE p.nxt IS NOT NULL
       |    GROUP BY p.tok, p.nxt)
       |  ORDER BY score DESC, n DESC, lft, rgt LIMIT 1),
       |wm$r AS (
       |  SELECT doc_id, word_id, pos, tok, nxt, cand,
       |    CASE WHEN cand = 1 AND
       |        (ROW_NUMBER() OVER (PARTITION BY doc_id, word_id, cand, grp ORDER BY pos) - 1) % 2 = 0
       |      THEN 1 ELSE 0 END AS do_merge
       |  FROM (
       |    SELECT a.*, CASE WHEN a.tok = b.lft AND a.nxt = b.rgt THEN 1 ELSE 0 END AS cand,
       |      a.pos - ROW_NUMBER() OVER (PARTITION BY a.doc_id, a.word_id,
       |        CASE WHEN a.tok = b.lft AND a.nxt = b.rgt THEN 1 ELSE 0 END ORDER BY a.pos) AS grp
       |    FROM wpre$r a CROSS JOIN wb$r b)),
       |wt$r AS MATERIALIZED (
       |  SELECT doc_id, word_id,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id, word_id ORDER BY pos) AS pos,
       |    CASE WHEN do_merge = 1 THEN tok || nxt ELSE tok END AS tok
       |  FROM (SELECT *, lag(do_merge) OVER (PARTITION BY doc_id, word_id ORDER BY pos) AS prev_m
       |        FROM wm$r)
       |  WHERE coalesce(prev_m, 0) = 0
       |  -- pair supply exhausted: wb$r is empty, the branch above yields
       |  -- zero rows, and the stream must pass through unchanged (the
       |  -- Spark trainer's early stop)
       |  UNION ALL
       |  SELECT doc_id, word_id, pos, tok FROM wt$p
       |  WHERE NOT EXISTS (SELECT 1 FROM wb$r))""".stripMargin
  }

  private val coreCtes: String =
    """WITH wwords AS (
      |  SELECT doc_id, wi AS word_id, ws[wi] AS word
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
      |    UNNEST(generate_series(1, len(ws))) AS t(wi)
      |  WHERE ws[wi] != ''),
      |wt0 AS (
      |  SELECT doc_id, word_id, ci AS pos, cs[ci] AS tok
      |  FROM (SELECT doc_id, word_id, string_split(word, '') AS cs FROM wwords),
      |    UNNEST(generate_series(1, len(cs))) AS t(ci)),
      |""".stripMargin +
    (1 to 5).map(roundSql).mkString(",\n")

  val oracleSql: Map[String, String] = Map(
    "wordpiece_train_merges" -> (coreCtes +
      "\nSELECT * FROM (" +
      (1 to 5).map(r =>
        s"SELECT CAST($r AS INTEGER) AS round, lft, rgt, CAST(n AS BIGINT) AS n, " +
          s"CAST(score AS BIGINT) AS score_x1e9 FROM wb$r")
        .mkString(" UNION ALL ") +
      ") ORDER BY round"),

    "wordpiece_symbol_vocab" -> (coreCtes +
      "\nSELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences FROM wt5 GROUP BY tok"),

    // the final instance stream; the oracle's 1-based word_id aligns to
    // Spark's 0-based posexplode index by the -1 (the bpe_apply_merges
    // convention)
    "wordpiece_apply_merges" -> (coreCtes +
      "\nSELECT doc_id, CAST(word_id - 1 AS INTEGER) AS word_id, " +
      "CAST(pos AS INTEGER) AS pos, tok FROM wt5"),

    // both unrolled chains in one WITH (the BPE chain's CTE names don't
    // collide with the w-prefixed ones), intersected on the merge pair
    "wordpiece_vs_bpe_overlap" -> (coreCtes + ",\n" +
      BpeTrain.oracleCoreCtesBody + s""",
      |wp_merges AS (${(1 to 5).map(r => s"SELECT lft, rgt FROM wb$r").mkString(" UNION ALL ")}),
      |bpe_merges AS (${(1 to 5).map(r => s"SELECT lft, rgt FROM b$r").mkString(" UNION ALL ")})
      |SELECT CAST(5 AS INTEGER) AS n_rounds,
      |  CAST((SELECT count(*) FROM (SELECT lft, rgt FROM wp_merges
      |        INTERSECT SELECT lft, rgt FROM bpe_merges)) AS BIGINT) AS n_common""".stripMargin)
  )
}
