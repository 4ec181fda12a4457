package graft.pipeline

import graft.SparkSpec

/** Pipeline-operator invariants that the DuckDB oracle cannot express
  * directly (equality between independent implementations).
  */
class PipelineSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH candidates recover the exhaustive jaccard result") {
    val exact = pairs(Dedup.ngramJaccard(spark, sfDir))
    val lsh = pairs(Dedup.minhashLsh(spark, sfDir))
    assert(exact.nonEmpty, "calibration: no near-dup pairs in test corpus")
    assert(lsh == exact)
  }

  test("simhash chunk join is lossless for hamming <= radius") {
    // pigeonhole: 10 chunks of 6 bits; any pair with hamming <= 7 keeps
    // >= 3 chunks intact, so it matches exactly on its lex-first intact
    // chunk TRIPLE and the bucketed join must equal brute force —
    // asserted literally here (and against the DuckDB oracle).
    import org.apache.spark.sql.functions._
    import graft.functions.HashFunctions
    val sigs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), HashFunctions.simhash60(split(col("text"), " ")).as("sim"))
    val brute = sigs.alias("a").join(sigs.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .filter(expr(s"bit_count(a.sim ^ b.sim) <= ${Dedup.HammingRadius}"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val df = Dedup.simhash(spark, sfDir)
    assert(df.count() > 0)
    assert(df.filter(s"hamming > ${Dedup.HammingRadius}").count() == 0)
    assert(pairs(df) == pairs(brute))
  }

  test("canonical-triple kernel rank matches the combinations(10,3) enumeration") {
    import graft.functions.HashKernels
    val combos = (0 until 10).combinations(3).toSeq
    for ((Seq(a, b, c), t) <- combos.zipWithIndex) {
      // x flips one bit in every chunk EXCEPT a, b, c: hamming 7
      // (qualifying), intact set exactly {a, b, c} — so the kernel must
      // accept exactly the rank t and reject the other 119
      var x = 0L
      for (i <- 0 until 10 if i != a && i != b && i != c) x |= 1L << (6 * i)
      assert(HashKernels.simhashCanonicalTriple(x, t.toLong), s"accept ($a,$b,$c)")
      for (t2 <- combos.indices if t2 != t)
        assert(!HashKernels.simhashCanonicalTriple(x, t2.toLong), s"reject $t2 for ($a,$b,$c)")
    }
    // 8 disturbed chunks = hamming 8 > radius: rejected for every rank
    val x8 = (0 until 8).map(i => 1L << (6 * i)).reduce(_ | _)
    assert(combos.indices.forall(t => !HashKernels.simhashCanonicalTriple(x8, t.toLong)))
  }

  test("prefix-filtered jaccard equals the unfiltered inverted-index result") {
    import org.apache.spark.sql.functions._
    import graft.functions.HashFunctions.shingle3_sorted_hashes
    // full (unfiltered) inverted index, independently built
    val arr = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingle3_sorted_hashes(split(col("text"), " ")).as("hs"))
      .filter(size(col("hs")) > 0)
    val ex = arr.select(col("doc_id"), explode(col("hs")).as("h"))
    val sz = arr.select(col("doc_id"), size(col("hs")).as("sz"))
    val full = ex.alias("a").join(ex.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
      .join(sz.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sz.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .filter(col("common").cast("double") /
        (col("sz1") + col("sz2") - col("common")) >= Dedup.JaccardThreshold)
    assert(pairs(full) == pairs(Dedup.ngramJaccard(spark, sfDir)))
  }

  test("simhash60 kernel is bit-identical to the portable SQL formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions.{HashFunctions, Portable}
    // independent declarative implementation: explode + md5-hex hash +
    // 60 wide bit sums (the formulation the DuckDB oracle uses)
    val toks = graft.Tables.documents(spark, sfDir).limit(200)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", expr(Portable.tokenHashSpark("w")))
    val bitSums = (0 until 60).map { k =>
      sum(expr(s"CAST((shiftright(h, $k) & 1) AS INT) * 2 - 1")).as(s"b$k")
    }
    val simExpr = (0 until 60).map { k =>
      s"(CASE WHEN b$k >= 0 THEN 1 ELSE 0 END) * ${1L << k}L"
    }.mkString(" + ")
    val declarative = toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), expr(simExpr).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = graft.Tables.documents(spark, sfDir).limit(200)
      .select(col("doc_id"), HashFunctions.simhash60(split(col("text"), " ")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == declarative)
  }

  test("shingle kernel set sizes match string-based distinct 3-grams") {
    import org.apache.spark.sql.functions._
    import graft.functions.HashFunctions
    val viaStrings = graft.Tables.documents(spark, sfDir).limit(500)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), size(array_distinct(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaKernel = graft.Tables.documents(spark, sfDir).limit(500)
      .select(col("doc_id"),
        size(HashFunctions.shingle3_sorted_hashes(split(col("text"), " "))).as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaKernel == viaStrings)
  }

  test("decodeMeta parses a real PNG container: length, magic, IHDR dims, pixel sum") {
    import graft.sources.Png
    val px = Array.tabulate(16)(_.toByte) // pixels 0..15, sum 120
    val a = Multimodal.Asset(7L, Png.encodeGray(4, 4, px, stored = true))
    val m = Multimodal.decodeMeta(a)
    assert(m == Multimodal.AssetMeta(7L, Png.storedGraySize(4, 4),
      0x89504E47L, 4L, 4L, 120L))
    assert(m.n_bytes == a.payload.length) // closed form matches reality
  }

  test("imageHash is a true aHash over decoded pixels and buckets near-dups") {
    import org.apache.spark.sql.functions.{col, md5}
    // direct per-doc recompute of the integer aHash definition, and
    // the dedup contract: identical text (same PNG bytes) → same hash,
    // and n_dups equals the hash's actual bucket size
    val rows = Multimodal.imageHash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.map(t => t._1 -> t._2).toMap
    val expected = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("hex"))
      .collect().map { r =>
        val px = r.getString(1).sliding(2, 2)
          .map(Integer.parseInt(_, 16)).toArray
        val sum = px.sum
        r.getLong(0) -> px.zipWithIndex.map { case (p, i) =>
          if (p * 16 > sum) 1L << (15 - i) else 0L }.sum
      }.toMap
    assert(byDoc == expected)
    val bucket = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (_, h, n) => assert(n == bucket(h)) }
  }

  test("decodeResize area-averages each 2x2 block of the decoded 4x4 PNG") {
    import graft.sources.Png
    // pixel value = its row-major index ×16, so block means are exact
    val bytes = Array.tabulate(16)(i => (i * 16).toByte)
    val a = Multimodal.Asset(3L, Png.encodeGray(4, 4, bytes, stored = true))
    val out = Multimodal.decodeResize(a)
    def mean(idxs: Seq[Int]) = idxs.map(i => (bytes(i) & 0xff)).sum / 4.0
    assert(out.toSet == Set(
      Multimodal.ResizedAsset(3L, 0, 0, mean(Seq(0, 1, 4, 5))),
      Multimodal.ResizedAsset(3L, 0, 1, mean(Seq(2, 3, 6, 7))),
      Multimodal.ResizedAsset(3L, 1, 0, mean(Seq(8, 9, 12, 13))),
      Multimodal.ResizedAsset(3L, 1, 1, mean(Seq(10, 11, 14, 15)))))
  }

  test("embPq codes are the true argmin against an independent codebook rebuild") {
    import org.apache.spark.sql.functions.col
    // independent recomputation: rebuild the codebook from its md5
    // definition here (not via Similarity's private field) and check a
    // sample of assignments is the exhaustive minimum
    val md = java.security.MessageDigest.getInstance("MD5")
    def centroid(m: Int, k: Int): Array[Double] = {
      val hex = md.digest(s"pq${m}_$k".getBytes("US-ASCII"))
        .map(b => f"${b & 0xff}%02x").mkString
      Array.tabulate(Similarity.PqSubDim) { d =>
        (Integer.parseInt(hex.substring(2 * d, 2 * d + 2), 16) - 127.5) / 640.0
      }
    }
    val vecsById = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 50)
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val got = Similarity.embPq(spark, sfDir)
      .filter(col("vec_id") < 50).collect()
    assert(got.length == vecsById.size * Similarity.PqM)
    got.foreach { r =>
      val (id, m) = (r.getLong(0), r.getLong(1).toInt)
      val v = vecsById(id)
      val dists = (0 until Similarity.PqK).map { k =>
        val c = centroid(m, k)
        val d2 = (0 until Similarity.PqSubDim).map { d =>
          val diff = v(m * Similarity.PqSubDim + d) - c(d)
          diff * diff
        }.sum
        graft.Num.roundEpsJvm(d2, 6)
      }
      assert(dists(r.getLong(2).toInt) == dists.min, s"vec $id sub $m")
      assert(r.getDouble(3) == dists.min)
    }
    // every code value is exercised somewhere in the corpus (codebook
    // scale matches the embedding scale, so assignments spread)
    val usedCodes = Similarity.embPq(spark, sfDir)
      .select("code").distinct().collect().map(_.getLong(0)).toSet
    assert(usedCodes.size > Similarity.PqK / 2, s"only $usedCodes used")
  }

  test("ann brute-force and IVF agree on most neighbors (recall sanity)") {
    val bf = Similarity.annTopK(spark, sfDir)
      .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sfDir)
      .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }
}
