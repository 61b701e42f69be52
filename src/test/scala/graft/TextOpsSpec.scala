package graft

import graft.textops.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Property tests for operators the DuckDB oracle can't check
  * (hash-family-specific or heuristic outputs). */
class TextOpsSpec extends SparkSpec {

  test("simhash: identical text -> identical fingerprint, deterministic across runs") {
    val a = run("d05_simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = run("d05_simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "simhash must be deterministic")
    assert(a.values.toSet.size > 1, "simhash should spread across documents")
  }

  test("simhash: near-dup pairs have small hamming distance") {
    val sim = run("d05_simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = run("d04_jaccard_pairs").collect().map(r => (r.getLong(0), r.getLong(1)))
    if (pairs.nonEmpty) {
      val dists = pairs.map { case (x, y) => java.lang.Long.bitCount(sim(x) ^ sim(y)) }
      assert(dists.max <= 16, s"near-dups should be close in simhash space, got ${dists.max}")
    }
  }

  test("minhash LSH finds the same pairs as exact jaccard at sf0.001") {
    val lsh = run("d03_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("d04_jaccard_pairs").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH pairs $lsh != exact $exact")
  }

  test("langid: outputs one valid prediction per document") {
    val out = run("d08_langid").collect()
    val docs = T(spark, sfDir, "documents").count()
    assert(out.length == docs)
    val langs = T(spark, sfDir, "documents").select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(out.forall(r => langs.contains(r.getString(2))))
  }

  test("knn LSH: results are a subset-quality approximation of brute force") {
    val bf = run("d09_knn_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = run("d10_knn_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every ANN neighbor must be a real vector; recall is reported, not asserted
    // hard (random hyperplanes on near-orthogonal vectors are genuinely lossy)
    val recalls = bf.keys.toSeq.map { q =>
      val hits = ann.getOrElse(q, Set.empty) intersect bf(q)
      hits.size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    info(f"ANN mean recall@3 = $mean%.2f over ${bf.size} queries")
    assert(ann.nonEmpty, "LSH should return candidates for at least some queries")
  }

  test("knn LSH: recall@3 >= 0.6 on planted clustered fixtures") {
    // The corpus embeddings are i.i.d. gaussian (near-neighbors sit in
    // the bulk — no LSH can separate them), so the quality floor is
    // asserted on PLANTED clusters instead: 12 well-separated centers ×
    // 10 members each, member = center + small noise. A cluster
    // member's true top-3 are overwhelmingly its cluster-mates, which
    // random-hyperplane buckets DO co-locate.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64
    val centers = Array.fill(12)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- centers.indices
      m <- 0 until 10
    } yield (c.toLong * 10 + m,
      centers(c).map(v => (v + rnd.nextGaussian() * 0.05).toFloat))
    val emb = rows.toDF("vec_id", "embedding")

    val ann = graft.textops.Similarity.lshKnn(emb, dim = dim).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // exact cosine top-3 as truth
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q"))
    val exact = q.crossJoin(emb.select(col("vec_id").as("n_id"), col("embedding")))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.functions.GraftFunctions.dot_product(col("q"), col("embedding")) /
          (sqrt(graft.functions.GraftFunctions.dot_product(col("q"), col("q"))) *
           sqrt(graft.functions.GraftFunctions.dot_product(col("embedding"), col("embedding")))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val truth = exact.withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rk") <= 3).select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = truth.keys.toSeq.map { qid =>
      (ann.getOrElse(qid, Set.empty) intersect truth(qid)).size.toDouble / truth(qid).size
    }
    val mean = recalls.sum / recalls.size
    info(f"clustered-fixture LSH recall@3 = $mean%.2f over ${truth.size} queries")
    assert(mean >= 0.6, f"LSH recall on clustered fixtures too low: $mean%.2f")
  }

  test("sample: fraction lands near 10%") {
    val total = T(spark, sfDir, "lineitem").count()
    val sampled = run("q92_sample").agg(sum("n")).collect()(0).getLong(0)
    val frac = sampled.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"sample fraction $frac far from 0.1")
  }

  test("sample: seeded sample is reproducible") {
    val a = run("q92_sample").collect().toSeq
    val b = run("q92_sample").collect().toSeq
    assert(a == b)
  }

  test("multimodal: decode stub produces stable typed features") {
    val out = run("d11_multimodal_features")
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "h1"))
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(1) > 0 && r.getInt(2) >= 16 && r.getInt(3) >= 9))
    val again = run("d11_multimodal_features").collect()
    assert(rows.toSeq == again.toSeq, "decode stub must be deterministic")
  }

  test("multimodal: REAL PNG bytes decode to true dimensions and luminance histogram") {
    import graft.textops.Multimodal
    // 40x20 PNG: left half black (luminance bucket 0), right half white (bucket 3)
    val img = new java.awt.image.BufferedImage(40, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 40)
      img.setRGB(x, y, if (x < 20) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    // direct decode: real dims, not the stub's length-derived ones
    val f = Multimodal.decodeMedia(7L, png)
    assert(f.width == 40 && f.height == 20, s"${f.width}x${f.height}")
    assert(math.abs(f.histogram(0) - 0.5) < 1e-9 && math.abs(f.histogram(3) - 0.5) < 1e-9,
      f.histogram.toSeq)

    // the same bytes through the Spark pipeline shape (binary col → mapPartitions)
    import spark.implicits._
    val row = Seq((7L, png)).toDF("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => Multimodal.decodeMedia(id, b) })
      .collect().head
    assert(row.width == 40 && row.height == 20)

    // non-image bytes keep the deterministic stub twin (oracle path)
    val stub = Multimodal.decodeMedia(1L, "plain text".getBytes("UTF-8"))
    assert(stub.width == 16 + "plain text".length % 64)
  }

  test("multimodal: real resize letterboxes onto the target canvas") {
    import graft.textops.Multimodal
    val img = new java.awt.image.BufferedImage(40, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val Some((resized, sw, sh)) = Multimodal.resizeImage(baos.toByteArray, 224, 126)
    // scale = min(224/40, 126/20) = 5.6 → content 224x112, canvas 224x126
    assert((sw, sh) == (224, 112), s"${sw}x$sh")
    val back = Multimodal.decodeMedia(0L, resized)
    assert(back.width == 224 && back.height == 126, s"${back.width}x${back.height}")
    assert(Multimodal.resizeImage("not an image".getBytes, 224, 126).isEmpty)
  }

  test("asof join: every matched click is at-or-before its purchase") {
    val out = run("q96_asof_join").collect()
    assert(out.length > 0)
    out.foreach { r =>
      val ts = r.getAs[java.sql.Timestamp]("ts")
      val clickTs = r.getAs[java.sql.Timestamp]("click_ts")
      if (clickTs != null) assert(!clickTs.after(ts), s"click $clickTs after purchase $ts")
    }
  }

  test("recursive union: depth-k rows are seed*2^k") {
    val rows = run("q97_recursive_union").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.contains((512L, 9))) // 1 * 2^9
    rows.foreach { case (n, d) =>
      assert(n % (1L << d) == 0, s"$n not a 2^$d multiple of a seed")
    }
  }

  test("knn IVF: trained quantizer returns ranked neighbors with usable recall") {
    val bf = run("d09_knn_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = run("d12_knn_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.nonEmpty)
    val recalls = bf.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty) intersect bf(q)).size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@3 = $mean%.2f over ${bf.size} queries (nProbe=4/16 cells)")
    assert(mean > 0.1, "IVF should beat random cell selection")
  }

  test("IVF assignment stage is an aggregate, never a window sort (plan gate)") {
    // the corpus-sized nearest-centroid argmin must get map-side partial
    // aggregation (min_by), not a row_number window over corpus×k rows —
    // at 100 TB the window sort is the difference between one reduced
    // shuffle and sorting the full candidate set (VERDICT r12 item 5)
    val emb = T(spark, sfDir, "embeddings")
    val cdf = spark.createDataFrame(
      Seq((0, Seq(0.0, 0.0, 0.0, 0.0)), (1, Seq(1.0, 1.0, 1.0, 1.0))))
      .toDF("cid", "centroid")
    val assigned = textops.IvfAnn.assignCells(emb, broadcast(cdf))
    val windows = assigned.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "assignment must not plan a Window")
    val aggs = assigned.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.nonEmpty, "assignment should be an Aggregate (min_by)")
    // semantics unchanged: every vector lands in exactly one cell, ties
    // to the lower cid — identical to the former window argmin
    val n = emb.count()
    assert(assigned.count() == n)
    assert(assigned.select("vec_id").distinct().count() == n)
  }

  test("shingle df cap: hot shingles leave candidate generation, results stay exact") {
    import spark.implicits._
    // 40 docs all sharing one corpus-hot shingle ("HOT HOT HOT"); docs
    // 0/1 are also true near-dups through doc-specific shingles
    val mk: Int => Seq[String] = i => Seq("HOT", "HOT", "HOT") ++
      (if (i <= 1) Seq(s"alpha", "beta", "gamma", "delta", "epsilon")
       else Seq(s"u$i", s"v$i", s"w$i", s"x$i", s"y$i"))
    val docs = (0 until 40).map { i =>
      val w = mk(i)
      val ws = w.sliding(3).map(_.mkString(" ")).toArray.distinct
      (i.toLong, ws, ws.length)
    }.toDF("doc_id", "ws", "sz")
    // cap ENGAGES: with maxDf=10 the HOT-only shingle is dropped, so the
    // all-pairs bucket it would create never materializes …
    val capped = Dedup.jaccardPairs(docs, maxDf = 10, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // … but the true near-dup pair rides its doc-specific shingles
    assert(capped == Set((0L, 1L)), s"got $capped")
    // and the verification is on FULL sets: jac includes the hot shingle
    val jac = Dedup.jaccardPairs(docs, maxDf = 10, threshold = 0.6)
      .collect().head.getDouble(2)
    // docs 0,1 share all shingles (identical text) -> jac == 1.0
    assert(jac == 1.0, s"full-set verification must include capped shingles, jac=$jac")
    // uncapped control: the hot shingle creates 40*39/2 candidate pairs;
    // capped candidate generation must not (observable as identical
    // output but vastly fewer verified pairs — assert via a low threshold)
    val uncappedLow = Dedup.jaccardPairs(docs, maxDf = 1000, threshold = 0.01).count()
    val cappedLow = Dedup.jaccardPairs(docs, maxDf = 10, threshold = 0.01).count()
    assert(uncappedLow == 40L * 39 / 2, s"control: hot shingle connects all pairs, got $uncappedLow")
    assert(cappedLow == 1L, s"cap must keep only the doc-specific candidate, got $cappedLow")
  }

  test("domain pre-cap: a skewed source reaches the window as <= k*partitions rows") {
    import spark.implicits._
    val k = 10
    val skewed = (1 to 5000).map(i => (i.toLong, if (i <= 4900) "hot.com" else s"s${i % 7}"))
      .toDF("doc_id", "source").repartition(8)
    val pre = graft.textops.Curation.domainPreCap(skewed, k)
    val hotRows = pre.filter(col("source") === "hot.com").count()
    assert(hotRows <= k * 8, s"pre-cap must bound the hot domain, got $hotRows")
    // end-to-end equivalence with the single-window reference
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ref = skewed.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("doc_id", "source", "rk").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val w2 = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val got = pre.withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select("doc_id", "source", "rk").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == ref, "two-level cap must match the single-window result")
  }

  test("d41 DSIR selection prefers target-like documents") {
    val sel = run("d41_dsir_select").collect()
    assert(sel.length == 50, s"top-k must keep 50 docs, got ${sel.length}")
    // weights are positive BIGINTs, strictly ordered desc then by id
    val ws = sel.map(r => (r.getLong(1), r.getLong(0)))
    assert(ws.forall(_._1 > 0))
    assert(ws.sameElements(ws.sortBy { case (w, id) => (-w, id) }),
      "selection must be ordered by weight desc, doc_id")
    // the target slice (lang=en) should dominate the selection: en docs
    // are scored by their own distribution, so a majority of the top-50
    // is en (sanity of the importance signal, not an exact contract)
    val en = T(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val enHits = sel.count(r => en.contains(r.getLong(0)))
    assert(enHits > 25, s"expected en-majority in the DSIR top-50, got $enHits")
  }
}
