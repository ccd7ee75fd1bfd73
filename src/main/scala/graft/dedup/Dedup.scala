package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing.hash60
import graft.text.TextOps

/** Corpus deduplication operators for training-data pipelines: exact
  * (hash groupBy), n-gram Jaccard (shared-shingle blocked self-join),
  * MinHash+LSH (shingle -> minhash signature -> band bucket join ->
  * exact-Jaccard verification), SimHash (bitwise-majority token hash),
  * and embedding-cosine near-dup pairs.
  *
  * Scale design (100 TB corpus): every candidate-generation step is a
  * shuffle on a *bucketing key* (hash / shingle / LSH band / block), so
  * the quadratic pair space is never materialized; only same-bucket pairs
  * ever meet, and bucket skew is bounded by the hash family. No driver
  * collects; all joins are key-partitioned or broadcast.
  */
object Dedup {

  /** Token 3-gram shingle set (distinct) of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: one survivor (min id) per distinct content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** All pairs with n-gram Jaccard >= threshold. Exact: every pair with
    * nonzero Jaccard shares >= 1 shingle, so the shared-shingle join is a
    * complete (and shuffle-bucketed) candidate generator.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"), size(col("sh")).as("nsh"))
    val ex = sets.select(col("id"), explode(col("sh")).as("g"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sets.select(col("id").as("d1"), col("nsh").as("n1")), "d1")
      .join(sets.select(col("id").as("d2"), col("nsh").as("n2")), "d2")
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** MinHash signature column: array of `numHashes` per-seed minima over
    * the shingle set (requires non-empty shingle array).
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(sh, g => hash60(g, i)))): _*)

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard.
    *
    * numHashes = bands * rowsPerBand. A pair collides if any band of the
    * signature matches exactly; collisions are then verified against the
    * true shingle Jaccard, so output is exact over the candidate set
    * (deterministic: the hash family is fixed, not sampled).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 12, rowsPerBand: Int = 3,
      n: Int = 3): DataFrame = {
    val bandsN = numHashes / rowsPerBand
    val sets = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = sets.withColumn("sig", minhashSignature(col("sh"), numHashes))
    val bandKeys = (0 until bandsN).map { b =>
      md5(concat_ws(",",
        ((0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r)) :+ lit(b.toString)): _*))
    }
    val bands = sigs.select(col("id"), posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2")).distinct()
    val sized = sets.select(col("id"), col("sh"), size(col("sh")).as("nsh"))
    cand
      .join(sized.select(col("id").as("d1"), col("sh").as("sh1"), col("nsh").as("n1")), "d1")
      .join(sized.select(col("id").as("d2"), col("sh").as("sh2"), col("nsh").as("n2")), "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** 60-bit SimHash: majority vote per bit over token hashes (token
    * multiplicity counts). Computed as 60 conditional sums in a single
    * aggregation — one shuffle, no per-bit explode.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val tok = df.select(
      (col(idCol) +: carryCols.map(col)) :+
        explode(TextOps.tokens(col(textCol))).as("tok"): _*)
      .withColumn("hv", hash60(col("tok"), 0))
    val bitSums = (0 until 60).map(j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$j"))
    val agg = tok.groupBy((col(idCol) +: carryCols.map(col)): _*)
      .agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 60).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select((col(idCol) +: carryCols.map(col)) :+ sim.as("simhash"): _*)
  }

  /** SimHash near-dup pairs within a blocking column, by Hamming radius. */
  def simhashPairs(sim: DataFrame, idCol: String, blockCol: String,
      maxHamming: Int): DataFrame =
    sim.as("a").join(sim.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("ham",
        expr(s"bit_count(a.simhash ^ b.simhash)").cast("long"))
      .filter(col("ham") <= maxHamming)
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"), col("ham"))

  /** Embedding-cosine near-dup pairs within a blocking column. The dot
    * product is a sequential left fold in double precision (bit-stable,
    * matches DuckDB's list_dot_product).
    */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val e = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).cast("array<double>").as("v"))
    val withNorm = e.withColumn("nrm", sqrt(Vec.dot(col("v"), col("v"))))
    withNorm.as("a").join(withNorm.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cos", Vec.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("d1"), col("b.id").as("d2"), col("cos"))
  }
}

/** Dense-vector column math via higher-order functions (codegen'd). */
object Vec {
  /** Sequential left-fold dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance via precomputable norms: |a|^2+|b|^2-2ab. */
  def sqDist(a: Column, b: Column): Column =
    dot(a, a) + dot(b, b) - lit(2.0) * dot(a, b)
}
