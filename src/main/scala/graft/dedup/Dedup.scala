package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for the training-data pipeline: exact,
  * n-gram-Jaccard (brute pairwise — correctness baseline), MinHash+LSH
  * (the scale path: shingle → minhash → band → bucket-join), and SimHash.
  *
  * Oracle-checked variants hash with md5 (identical hex in Spark and
  * DuckDB); the `xxhash64` variants are the production/bench path (codegen'd
  * long hashing, no string materialization).
  */
object Dedup {

  /** Exact dedup by full content: one row per distinct text with the
    * surviving (min) id and the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select("keep_id", "dup_cnt")

  /** Shingle-set sizes: (doc_id, n). */
  private def sizes(sh: DataFrame, idCol: String): DataFrame =
    sh.groupBy(idCol).agg(count(lit(1)).as("n"))

  /** Pairwise intersection counts over a shingle-rows table (equi-join on
    * shingle — the inverted-index join; quadratic only within a posting
    * list).
    */
  private def intersections(sh: DataFrame, idCol: String): DataFrame = {
    val a = sh.toDF("doc1", "shingle")
    val b = sh.toDF("doc2", "shingle")
    a.join(b, Seq("shingle"))
      .where(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("inter"))
  }

  private def jaccardOf(pairs: DataFrame, sz: DataFrame): DataFrame =
    pairs
      .join(sz.toDF("doc1", "n1"), "doc1")
      .join(sz.toDF("doc2", "n2"), "doc2")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")), 6))

  /** Brute-force n-gram Jaccard near-dup pairs with jaccard ≥ threshold
    * (threshold applied to the 6-decimal-rounded value, matching the
    * oracle). Output: (doc1, doc2, jaccard).
    */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val sh = TextOps.shingleRows(docs, idCol, textCol, n)
    jaccardOf(intersections(sh, idCol), sizes(sh, idCol))
      .where(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  /** MinHash signatures, md5 variant: numHashes rows per doc,
    * (doc_id, i, h) with h = min over shingles of md5("<i>:<shingle>").
    * Computed as one wide aggregate over the shingle rows (single shuffle)
    * then unpivoted — exploding shingle rows ×numHashes through the shuffle
    * costs numHashes× the shuffle volume for identical values.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int,
                        idCol: String = "doc_id"): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i"))
    val stackArgs = (0 until numHashes).map(i => s"$i, h$i").mkString(", ")
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .selectExpr(idCol, s"stack($numHashes, $stackArgs) AS (i, h)")
  }

  /** MinHash + LSH near-dup pairs: signatures → band buckets (r=1: any
    * matching hash makes a candidate — recall ≈ 1 for J ≥ 0.5 at 16
    * hashes) → exact Jaccard verification of candidates ≥ threshold.
    * Output identical to [[jaccardPairs]] whenever LSH recall is 1, which
    * is what the DuckDB oracle checks. Candidate generation cost is
    * bucket-quadratic, not corpus-quadratic — the 100 TB path.
    */
  def minhashLsh(docs: DataFrame, n: Int, numHashes: Int, threshold: Double,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val sh = TextOps.shingleRows(docs, idCol, textCol, n)
    val sig = minhashSignatures(sh, numHashes, idCol)
    val cand = sig.toDF("doc1", "i", "h")
      .join(sig.toDF("doc2", "i", "h"), Seq("i", "h"))
      .where(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
    jaccardOf(intersections(sh, idCol).join(cand, Seq("doc1", "doc2"),
        "left_semi"), sizes(sh, idCol))
      .where(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  /** Production minhash signature path: xxhash64(i, shingle) — codegen'd
    * long hashing, banded into `bands` buckets of `rowsPerBand` via a
    * second-level hash. Returns (doc_id, band, bucket).
    */
  def minhashBucketsXx(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val sh = TextOps.shingleRows(docs, idCol, textCol, n)
    val numHashes = bands * rowsPerBand
    sh.withColumn("i", explode(sequence(lit(0), lit(numHashes - 1))))
      .groupBy(col(idCol), col("i"))
      .agg(min(xxhash64(col("i"), col("shingle"))).as("h"))
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(xxhash64(sort_array(collect_list(struct("i", "h")))).as("bucket"))
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
      val digit = substring(col("h"), b / 4 + 1, 1)
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
    * verified by exact n-gram Jaccard ≥ threshold.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int, n: Int,
                   threshold: Double, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val s = simhash(docs, idCol, textCol)
    val cand = s.toDF("doc1", "h1").crossJoin(s.toDF("doc2", "h2"))
      .where(col("doc1") < col("doc2") &&
        bit_count(col("h1").bitwiseXOR(col("h2"))) <= maxHamming)
      .select("doc1", "doc2")
    val sh = TextOps.shingleRows(docs, idCol, textCol, n)
    jaccardOf(intersections(sh, idCol).join(cand, Seq("doc1", "doc2"),
        "left_semi"), sizes(sh, idCol))
      .where(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }
}
