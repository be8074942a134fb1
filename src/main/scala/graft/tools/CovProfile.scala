package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev tool: VERDICT r8 #7 — measure-then-maybe-optimize the PCA
  * covariance scan. Compares the shipped shape (explode d(d+3)/2 structs
  * per row → hash partial agg) against a partition-local accumulator
  * prototype (one exact-BigDecimal matrix per partition, merged at the
  * end — the TypedImperativeAggregate shape, prototyped over
  * `mapPartitions` for measurement). Both produce the identical exact
  * decimal sums (same Double.toString staging), so the swap would be
  * hash-invisible; this tool decides whether it is worth shipping.
  *
  * Usage: runMain graft.tools.CovProfile [dir] [reps]
  */
object CovProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("covprofile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ve = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("embedding").cast("array<double>").as("v"))
      .filter(size(col("v")) > 0)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cov] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // ---- shipped shape: explode + hash partial agg ----------------------
    def shipped(): Array[(Int, Int, java.math.BigDecimal, Long)] =
      ve.select(explode(expr(
        """concat(
          |  transform(sequence(0, size(v) - 1),
          |    i -> struct(i AS i, -1 AS j, CAST(v[i] AS DECIMAL(38,18)) AS p)),
          |  flatten(transform(sequence(0, size(v) - 1),
          |    i -> transform(sequence(i, size(v) - 1),
          |      j -> struct(i AS i, j AS j,
          |             CAST(v[i] * v[j] AS DECIMAL(38,18)) AS p)))))"""
          .stripMargin)).as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
        .groupBy("i", "j")
        .agg(sum(col("p")).as("s"), count(col("p")).as("cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2), r.getLong(3)))

    // ---- prototype: partition-local exact accumulation ------------------
    // one BigDecimal matrix + count matrix per partition; rows stage
    // through the SAME Double.toString cast, sums are exact, so the
    // totals are bit-identical to the shipped shape's
    def local(): Array[(Int, Int, java.math.BigDecimal, Long)] = {
      val rdd = ve.select(col("v")).rdd.mapPartitions { it =>
        var sums: Array[java.math.BigDecimal] = null
        var counts: Array[Long] = null
        var d = -1
        def idx(i: Int, j: Int): Int =
          // (i,-1) dims first [0, d), then upper triangle packed
          if (j < 0) i else d + (i * (2 * d - i - 1)) / 2 + j
        it.foreach { row =>
          val v = row.getSeq[Double](0)
          if (d < 0) {
            d = v.length
            sums = Array.fill(d + d * (d + 1) / 2)(java.math.BigDecimal.ZERO)
            counts = new Array[Long](sums.length)
          }
          var i = 0
          while (i < d) {
            val vi = v(i)
            sums(idx(i, -1)) = sums(idx(i, -1)).add(
              new java.math.BigDecimal(java.lang.Double.toString(vi))
                .setScale(18, java.math.RoundingMode.HALF_UP))
            counts(idx(i, -1)) += 1
            var j = i
            while (j < d) {
              val k = idx(i, j)
              sums(k) = sums(k).add(
                new java.math.BigDecimal(java.lang.Double.toString(vi * v(j)))
                  .setScale(18, java.math.RoundingMode.HALF_UP))
              counts(k) += 1
              j += 1
            }
            i += 1
          }
        }
        if (d < 0) Iterator.empty
        else Iterator.single((d, sums, counts))
      }
      val merged = rdd.reduce { case ((d1, s1, c1), (d2, s2, c2)) =>
        require(d1 == d2, s"ragged: $d1 vs $d2")
        var k = 0
        while (k < s1.length) {
          s1(k) = s1(k).add(s2(k)); c1(k) += c2(k); k += 1
        }
        (d1, s1, c1)
      }
      val (d, sums, counts) = merged
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, java.math.BigDecimal, Long)]
      var i = 0
      var k = d
      while (i < d) { out += ((i, -1, sums(i), counts(i))); i += 1 }
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { out += ((i, j, sums(k), counts(k))); k += 1; j += 1 }
        i += 1
      }
      out.toArray
    }

    // ---- shipped since r9: the CovMomentsAgg native aggregate -----------
    def agg(): Array[(Int, Int, java.math.BigDecimal, Long)] =
      ve.agg(graft.functions.CovMomentsAgg.covMoments(col("v")).as("m"))
        .select(explode(col("m")).as("e"))
        .select(col("e.i"), col("e.j"), col("e.s"), col("e.cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2), r.getLong(3)))

    // warmup + three-way exact-equality check once
    val a = time("explode (warmup)")(shipped())
    val b = time("rdd-proto (warmup)")(local())
    val c = time("cov-agg (warmup)")(agg())
    def toMapOf(xs: Array[(Int, Int, java.math.BigDecimal, Long)]) =
      xs.map { case (i, j, s, n) => ((i, j), (s, n)) }.toMap
    val am = toMapOf(a); val bm = toMapOf(b); val cm = toMapOf(c)
    require(am.keySet == bm.keySet && am.keySet == cm.keySet,
      "group sets differ")
    val diffs = am.count { case (k, (s, n)) =>
      bm(k)._1.compareTo(s) != 0 || bm(k)._2 != n ||
        cm(k)._1.compareTo(s) != 0 || cm(k)._2 != n }
    println(s"[cov] exact-value mismatches: $diffs of ${am.size} groups")

    (1 to reps).foreach { r =>
      time(s"explode #$r")(shipped())
      time(s"cov-agg #$r")(agg())
    }
    spark.stop()
  }
}
