package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for the training-data pipeline: exact,
  * n-gram-Jaccard (brute pairwise — correctness baseline), MinHash+LSH
  * (the scale path: shingle → minhash → band → bucket-join), and SimHash
  * with pigeonhole-banded candidate generation.
  *
  * Oracle-checked variants hash with md5 (identical hex in Spark and
  * DuckDB); the `xxhash64` variants are the production/bench path (codegen'd
  * long hashing, no string materialization).
  *
  * Scale discipline (the 100 TB rules all candidate paths obey):
  *   - exact dedup groups by a content DIGEST — full document bytes never
  *     enter a shuffle;
  *   - signatures (minhash, simhash bands) are computed per-row from the
  *     doc's shingle array — no exploded shingle rows through any shuffle;
  *   - similarity is VERIFIED only for LSH/band candidates, via
  *     array_intersect over per-doc shingle-set arrays — never all pairs;
  *   - the only all-pairs path left is [[jaccardPairs]], the labeled brute
  *     baseline, which supports a frequent-shingle cap (`maxDf`) so a
  *     stop-shingle posting list cannot go quadratic.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct text with the
    * surviving (min) id and the duplicate count. Grouping on
    * (xxhash64, md5) — 192 bits of digest, collision-free in practice —
    * keeps the shuffle to (digest, id) rows instead of full document bytes.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        xxhash64(col(textCol)).as("__hx"), md5(col(textCol)).as("__hm"))
      .groupBy(col("__hx"), col("__hm"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select("keep_id", "dup_cnt")

  /** Per-doc distinct shingle SET as an array column, with its size:
    * (doc, sh: array<string>, n: long); docs with no shingles dropped.
    * This is the shared substrate for signature generation (per-row, no
    * shuffle) and candidate verification (array_intersect, no re-shuffle
    * of shingle rows). Call `.localCheckpoint(true)` when reused.
    */
  private def shingleSets(docs: DataFrame, n: Int, idCol: String,
                          textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        TextOps.shingles(TextOps.tokens(col(textCol)), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("n", size(col("sh")).cast("long"))

  /** Exact Jaccard over candidate pairs only: joins each (doc1, doc2) pair
    * to the two shingle-set arrays and intersects in-row. Work is
    * O(|candidates| × doc size), never corpus-quadratic.
    */
  private def verifyJaccard(cand: DataFrame, sets: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(sets.toDF("doc1", "sh1", "n1"), "doc1")
      .join(sets.toDF("doc2", "sh2", "n2"), "doc2")
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")

  /** Pairwise intersection counts over a shingle-rows table (equi-join on
    * shingle — the inverted-index join; quadratic only within a posting
    * list). `maxDf` drops shingles appearing in more than maxDf docs (the
    * standard stop-shingle cap — one frequent shingle otherwise goes
    * quadratic at scale); None = exact, for the oracle gate.
    */
  private def intersections(sh: DataFrame,
                            maxDf: Option[Long]): DataFrame = {
    val capped = maxDf match {
      case Some(cap) =>
        val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
        sh.join(dfreq.where(col("__df") <= cap).select("shingle"), "shingle")
      case None => sh
    }
    val a = capped.toDF("doc1", "shingle")
    val b = capped.toDF("doc2", "shingle")
    a.join(b, Seq("shingle"))
      .where(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("inter"))
  }

  /** Brute-force n-gram Jaccard near-dup pairs with jaccard ≥ threshold
    * (threshold applied to the 6-decimal-rounded value, matching the
    * oracle). Output: (doc1, doc2, jaccard). Correctness baseline — at
    * scale pass `maxDf` or use [[minhashLsh]].
    */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                   idCol: String = "doc_id",
                   textCol: String = "text",
                   maxDf: Option[Long] = None): DataFrame = {
    val sh = TextOps.shingleRows(docs, idCol, textCol, n)
    val sz = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    intersections(sh, maxDf)
      .join(sz.toDF("doc1", "n1"), "doc1")
      .join(sz.toDF("doc2", "n2"), "doc2")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  /** MinHash signature rows (doc, i, h) computed per-row from the shingle
    * array: h_i = min over shingles of md5("<i>:<shingle>"). No groupBy, no
    * exploded shingle rows — signature generation is shuffle-FREE.
    */
  private def minhashSigRows(sets: DataFrame, numHashes: Int): DataFrame = {
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("sh"),
        s => md5(concat(lit(s"$i:"), s)))).as(s"h$i")
    }
    val stackArgs = (0 until numHashes).map(i => s"$i, h$i").mkString(", ")
    sets.select(col("doc") +: sigCols: _*)
      .selectExpr("doc", s"stack($numHashes, $stackArgs) AS (i, h)")
  }

  /** MinHash signatures, md5 variant, from raw shingle rows — kept for API
    * compatibility/tests: (doc_id, i, h).
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int,
                        idCol: String = "doc_id"): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i"))
    val stackArgs = (0 until numHashes).map(i => s"$i, h$i").mkString(", ")
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .selectExpr(idCol, s"stack($numHashes, $stackArgs) AS (i, h)")
  }

  /** MinHash + LSH near-dup pairs: per-row signatures → band buckets (r=1:
    * any matching hash makes a candidate — recall ≈ 1 for J ≥ 0.5 at 16
    * hashes) → exact Jaccard verification of the CANDIDATES ONLY via
    * array_intersect (candidate-first: no all-pairs aggregate anywhere).
    * Output identical to [[jaccardPairs]] whenever LSH recall is 1, which
    * is what the DuckDB oracle checks. Candidate generation cost is
    * bucket-quadratic, not corpus-quadratic — the 100 TB path.
    */
  def minhashLsh(docs: DataFrame, n: Int, numHashes: Int, threshold: Double,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val sets = shingleSets(docs, n, idCol, textCol).localCheckpoint(true)
    val sig = minhashSigRows(sets, numHashes)
    val cand = sig.toDF("doc1", "i", "h")
      .join(sig.toDF("doc2", "i", "h"), Seq("i", "h"))
      .where(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
    verifyJaccard(cand, sets.select("doc", "sh", "n"), threshold)
  }

  /** Production minhash banding path: per-row xxhash64 signatures banded
    * into `bands` buckets of `rowsPerBand` via a second-level hash —
    * entirely shuffle-free (one projection over the docs table). Returns
    * (doc_id, band, bucket).
    */
  def minhashBucketsXx(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val sets = shingleSets(docs, n, idCol, textCol)
    val hCols = (0 until bands * rowsPerBand).map { i =>
      array_min(transform(col("sh"),
        s => xxhash64(lit(i), s))).as(s"h$i")
    }
    val bandCols = (0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      xxhash64(rows: _*).as(s"b$b")
    }
    val stackArgs = (0 until bands).map(b => s"$b, b$b").mkString(", ")
    sets.select(col("doc") +: hCols: _*)
      .select(col("doc").as(idCol) +: bandCols: _*)
      .selectExpr(idCol, s"stack($bands, $stackArgs) AS (band, bucket)")
  }

  /** 16-bit SimHash from md5 bits of tokens, weighted by token frequency.
    * Bit b of token t comes from hex digit b/4 of md5(t); the simhash bit
    * is the sign of the weighted ±1 vote. Fully reproducible in ANSI SQL.
    * Output: (doc_id, simhash).
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val tokRows = docs.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("tok")))
    val hexDigits = "0123456789abcdef"
    // vote_b = Σ_tokens cnt * (bit_b ? 1 : -1); simhash = Σ_b (vote_b>0)<<b
    val votes = (0 until 16).map { b =>
      val dval = expr(s"instr('$hexDigits', substring(h, ${b / 4 + 1}, 1)) - 1")
      val bit = shiftright(dval, 3 - b % 4).bitwiseAND(lit(1))
      sum(col("cnt") * (bit * 2 - 1)).as(s"v$b")
    }
    tokRows.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 16).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup candidate pairs at hamming distance ≤ maxHamming,
    * verified by exact n-gram Jaccard ≥ threshold. Candidate generation is
    * a pigeonhole band equi-join, NOT a cross join: the 16-bit signature is
    * split into maxHamming+1 bands, and any pair within hamming ≤ maxHamming
    * must agree on at least one whole band — identical output to the
    * all-pairs filter, bucket-local cost.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int, n: Int,
                   threshold: Double, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val s = simhash(docs, idCol, textCol)
    val numBands = maxHamming + 1
    val width = math.max(1, (16 + numBands - 1) / numBands)
    val banded = s.select(col(idCol).as("doc"), col("simhash"),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("bval"))
      }: _*)).as("bb"))
      .select(col("doc"), col("simhash"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    val cand = banded.toDF("doc1", "h1", "band", "bval")
      .join(banded.toDF("doc2", "h2", "band", "bval"), Seq("band", "bval"))
      .where(col("doc1") < col("doc2") &&
        bit_count(col("h1").bitwiseXOR(col("h2"))) <= maxHamming)
      .select("doc1", "doc2").distinct()
    val sets = shingleSets(docs, n, idCol, textCol).localCheckpoint(true)
    verifyJaccard(cand, sets, threshold)
  }
}
