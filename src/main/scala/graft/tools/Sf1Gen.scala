package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Dev tool: synthesize an sf1 (~10× sf0.1) `documents` + `embeddings`
  * directory for the VERDICT r7 #4 scale probe. The driver only ships
  * sf0.001/0.01/0.1; the heavy dedup/ANN family needs one data point above
  * sf0.1 to show the plans survive a 10× scale-up, not just that their
  * shape is right.
  *
  * Mirrors the shipped generator's statistical character (measured from
  * /root/testdata/sf0.1): documents = 10–100 words uniform over the same
  * 31-word vocabulary, lang mix ≈ en 41% / zh,es,fr,de ~15% each, 20
  * uniform sources, ~3% of docs near-copies of an earlier doc (5% token
  * mutation) so the near-dup family has real hits; embeddings = unit-norm
  * 64-d vectors around the 10 per-label sf0.1 centroids (per-label,
  * per-dim mean/σ FIT from the shipped data — a model-sized pull), labels
  * uniform. Deterministic: every partition seeds java.util.Random from
  * (SEED, partitionId); re-runs are byte-stable.
  *
  * Usage: runMain graft.tools.Sf1Gen [outDir] [multiplier] [vocabMode]
  * (defaults: target/sf1, 10×, dense).
  *
  * `vocabMode = zipf` swaps the shipped 31-word DENSE vocabulary for a
  * 20,000-word Zipf(s=1.07) one (word frequencies ∝ rank^-s — the
  * standard web-text shape) with everything else identical — the
  * VERDICT r9 #5 probe isolating whether the p85/p94 exact-join
  * candidate blowup is the degenerate test vocabulary (every doc shares
  * shingles with every other) or the algorithms: on a realistic
  * vocabulary, prefix selectivity is the PPJoin guarantee and candidate
  * growth should track OUTPUT growth.
  */
object Sf1Gen {
  private val SEED = 42L

  private val vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  /** Zipf(s) sampler over ranks 1..V as a cumulative array — one binary
    * search per token, deterministic under the caller's Random. */
  private final class ZipfVocab(v: Int, s: Double) extends Serializable {
    private val cum: Array[Double] = {
      val w = Array.tabulate(v)(i => math.pow(i + 1.0, -s))
      val c = w.scanLeft(0.0)(_ + _).tail
      val t = c(v - 1)
      c.map(_ / t)
    }
    private val words: Array[String] = Array.tabulate(v)(i => f"w$i%05d")
    def pick(rnd: java.util.Random): String = {
      val u = rnd.nextDouble()
      var lo = 0; var hi = cum.length - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (u < cum(mid)) hi = mid else lo = mid + 1
      }
      words(lo)
    }
  }

  private val langs: Array[(String, Double)] = Array(
    "en" -> 0.41, "zh" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "de" -> 0.14)
  private val langCum: Array[Double] = langs.scanLeft(0.0)(_ + _._2).tail

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/sf1")
    val mult = if (args.length > 1) args(1).toInt else 10
    val zipf: Option[ZipfVocab] =
      if (args.length > 2 && args(2) == "zipf") Some(new ZipfVocab(20000, 1.07))
      else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("sf1gen").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = 5000 * mult
    val nVecs = 2000 * mult
    val nParts = 32

    // ---- documents -------------------------------------------------------
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))

    val perPart = (nDocs + nParts - 1) / nParts
    val docRdd = spark.sparkContext
      .parallelize(0 until nParts, nParts)
      .flatMap { pid =>
        val rnd = new java.util.Random(SEED * 7919L + pid)
        def word(): String = zipf match {
          case Some(z) => z.pick(rnd)
          case None => vocab(rnd.nextInt(vocab.length))
        }
        val lo = pid.toLong * perPart
        val hi = math.min(lo + perPart, nDocs.toLong)
        // base docs first; a near-copy mutates a base doc from THIS
        // partition (keeps generation partition-local and deterministic)
        val base = new scala.collection.mutable.ArrayBuffer[Array[String]]
        (lo until hi).iterator.map { id =>
          val toks: Array[String] =
            if (base.nonEmpty && rnd.nextDouble() < 0.03) {
              val src = base(rnd.nextInt(base.size))
              src.map(t => if (rnd.nextDouble() < 0.05) word() else t)
            } else {
              val n = 10 + rnd.nextInt(91)
              Array.fill(n)(word())
            }
          if (base.size < 64) base += toks
          val text = toks.mkString(" ")
          // cumulative-array pick: evaluation-order-independent, unlike a
          // side-effecting guard inside a PartialFunction
          val u = rnd.nextDouble()
          val hit = langCum.indexWhere(u < _)
          val lang = if (hit >= 0) langs(hit)._1 else "de"
          Row(id, text, lang, s"src${rnd.nextInt(20)}", text.length.toLong)
        }
      }
    spark.createDataFrame(docRdd, docSchema)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // ---- embeddings ------------------------------------------------------
    // `vecMode = aniso` (args(3)) replaces the centroid-fitted generator
    // with a REALISM fixture for the vector-side recall audit (r11 VERDICT
    // missing #3): real embedding corpora are ANISOTROPIC (variance
    // concentrated in a few leading directions — the spectrum decays as a
    // power law) with HEAVY-TAILED cluster sizes (a few giant clusters,
    // a long tail of tiny ones — Zipf, like everything else in web text).
    // This is exactly the configuration where hyperplane LSH (planes
    // waste bits on low-variance directions) and fixed-stride IVF seeds
    // (stride sampling lands mostly in the giant clusters) degrade; the
    // shipped generator's 10 equal balanced clusters can't exhibit it.
    // 64 clusters, sizes ∝ rank^-1.2; per-dim σ ∝ (d+1)^-0.7 for both
    // centroid placement and within-cluster noise; unit-normalized like
    // the shipped data.
    val anisoVec = args.length > 3 && args(3) == "aniso"
    import org.apache.spark.sql.functions._
    if (anisoVec) {
      val dim = 64; val nClusters = 64
      val spectrum = Array.tabulate(dim)(d => math.pow(d + 1.0, -0.7))
      val cr = new java.util.Random(SEED * 13L)
      val cents = Array.tabulate(nClusters, dim)((_, d) =>
        cr.nextGaussian() * spectrum(d) * 2.0)
      val clusterCum = {
        val w = Array.tabulate(nClusters)(i => math.pow(i + 1.0, -1.2))
        val c = w.scanLeft(0.0)(_ + _).tail
        c.map(_ / c.last)
      }
      val centB = spark.sparkContext.broadcast(cents)
      val vecSchema = StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = true)),
        StructField("label", IntegerType, nullable = false)))
      val perPartV = (nVecs + nParts - 1) / nParts
      val vecRdd = spark.sparkContext
        .parallelize(0 until nParts, nParts)
        .flatMap { pid =>
          val rnd = new java.util.Random(SEED * 104729L + pid)
          val lo = pid.toLong * perPartV
          val hi = math.min(lo + perPartV, nVecs.toLong)
          (lo until hi).iterator.map { id =>
            val u = rnd.nextDouble()
            var lab = java.util.Arrays.binarySearch(clusterCum, u)
            if (lab < 0) lab = -lab - 1
            val c = centB.value(lab)
            val v = Array.tabulate(dim)(d =>
              c(d) + rnd.nextGaussian() * spectrum(d) * 0.5)
            val norm = math.sqrt(v.map(x => x * x).sum)
            Row(id, v.map(x => (x / norm).toFloat).toSeq, lab)
          }
        }
      spark.createDataFrame(vecRdd, vecSchema)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"sf1gen: wrote $nDocs docs + $nVecs ANISO vecs to $outDir")
      spark.stop()
      return
    }
    // Fit per-label per-dim mean/σ from the shipped sf0.1 bank (10×64×2
    // doubles — model-sized), then sample around those centroids and
    // re-normalize to unit length like the shipped data.
    val ref = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val stats = ref.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg(avg(col("col")).as("mu"), stddev_pop(col("col")).as("sigma"))
      .collect()
    val dim = stats.map(_.getInt(1)).max + 1
    val labels = stats.map(_.getInt(0)).distinct.sorted
    val mu = Array.ofDim[Double](labels.length, dim)
    val sg = Array.ofDim[Double](labels.length, dim)
    stats.foreach { r =>
      mu(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      sg(r.getInt(0))(r.getInt(1)) = r.getDouble(3)
    }
    val muB = spark.sparkContext.broadcast(mu)
    val sgB = spark.sparkContext.broadcast(sg)

    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType, nullable = false)))
    val perPartV = (nVecs + nParts - 1) / nParts
    val vecRdd = spark.sparkContext
      .parallelize(0 until nParts, nParts)
      .flatMap { pid =>
        val rnd = new java.util.Random(SEED * 104729L + pid)
        val m = muB.value; val s = sgB.value
        val lo = pid.toLong * perPartV
        val hi = math.min(lo + perPartV, nVecs.toLong)
        (lo until hi).iterator.map { id =>
          val lab = rnd.nextInt(m.length)
          val v = Array.tabulate(m(lab).length)(d =>
            m(lab)(d) + rnd.nextGaussian() * s(lab)(d))
          val norm = math.sqrt(v.map(x => x * x).sum)
          Row(id, v.map(x => (x / norm).toFloat).toSeq, lab)
        }
      }
    spark.createDataFrame(vecRdd, vecSchema)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"sf1gen: wrote $nDocs docs + $nVecs vecs to $outDir")
    spark.stop()
  }
}
