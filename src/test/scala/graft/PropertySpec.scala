package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators._

/** Property-based invariants (SURVEY §5.3) over generated event frames.
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest-scalacheck
  * bridge artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private type Ev = TestEv

  private val evGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 1000000L)
    sec <- Gen.choose(0L, 100000L)
    uid <- Gen.choose(0L, 20L)
    et <- Gen.oneOf("click", "view", "signup", "purchase", "error")
    v <- Gen.choose(0.0, 200.0).map(x => math.round(x * 100) / 100.0)
    k <- Gen.choose(0, 99)
  } yield TestEv(id, new Timestamp(1704067200000L + sec * 1000), uid, et, v, s"""{"k": $k}""")

  private def sampleFrames(n: Int): Seq[List[Ev]] =
    (1 to n).map { i =>
      Gen.listOfN(60, evGen)(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error("gen failed"))
    }

  test("streak invariants: counts partition the input; 0 <= units <= span/7") {
    sampleFrames(5).foreach { evs =>
      val sessions = Streaks.sessions(evs.toDF()).collect()
      assert(sessions.map(_.getAs[Long]("n_events")).sum == evs.length)
      sessions.foreach { r =>
        val units = r.getAs[Long]("streak_units")
        val span = (r.getAs[Timestamp]("streak_end").getTime -
          r.getAs[Timestamp]("streak_start").getTime) / 1000 / 7
        assert(units >= 0 && units <= span)
      }
    }
  }

  test("A3 count invariant: totals equal input rows") {
    sampleFrames(5).foreach { evs =>
      val total = Stats.eventTypeCounts(evs.toDF()).agg(sum("n")).as[Long].head()
      assert(total == evs.length)
    }
  }

  test("join containment: enriched equals events with known users") {
    sampleFrames(5).foreach { evs =>
      val dim = Seq((1L, "A", 1), (2L, "B", 2), (3L, "C", 3))
        .toDF("c_custkey", "c_mktsegment", "c_nationkey")
      val e = evs.toDF()
      val out = Enrich.enriched(e, dim)
      assert(out.count() == e.filter(col("user_id").isin(1L, 2L, 3L)).count())
    }
  }

  test("A6 two-level rollup conserves attempts") {
    sampleFrames(5).foreach { evs =>
      val df = evs.toDF()
      val clicks = evs.count(_.event_type == "click")
      val level2 = Questions.pageRollup(df).agg(coalesce(sum("total_attempts"), lit(0L)))
        .as[Long].head()
      assert(level2 == clicks)
    }
  }

  private val docGen: Gen[(Long, String, String, String)] = for {
    id <- Gen.choose(0L, 100000L)
    words <- Gen.listOf(Gen.oneOf("the", "data", "spark", "row", "join", "x9"))
    lang <- Gen.oneOf("en", "de", "fr")
    src <- Gen.oneOf("s1", "s2", "s3")
  } yield (id, words.mkString(" "), lang, src)

  private def docFrames(n: Int): Seq[List[(Long, String, String, String)]] =
    (1 to n).map { i =>
      Gen.listOfN(40, docGen)(Gen.Parameters.default, Seed(7L + i))
        .getOrElse(sys.error("gen failed"))
        .distinctBy(_._1) // unique doc_ids
    }

  test("bpe apply: window-parity form equals the sequential greedy reference") {
    // the obviously-correct sequential tokenizer pass the windows replace
    def greedyRef(toks: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += s"${a}_$b"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toSeq
    }
    // tiny alphabet maximizes chains ("a a a a"), boundary pairs, a = b runs
    val wordGen = Gen.oneOf("a", "b", "c")
    val docGen2 = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    (1 to 6).foreach { seed =>
      val docs = (1 to 30).map { i =>
        (i.toLong, Gen.resize(12, docGen2)(Gen.Parameters.default, Seed(seed * 100L + i))
          .getOrElse(sys.error("gen failed")))
      }
      val (pa, pb) = Seq(("a", "a"), ("a", "b"), ("b", "c"))(seed % 3)
      val got = graft.ext.TextAnalysis.bpeApplyMerge(docs.toDF("doc_id", "text"), pa, pb)
        .select("doc_id", "n_before", "n_merges", "n_after", "merged_hash")
        .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      val expectStr = docs.map { case (id, text) =>
        id -> greedyRef(text.split(" ", -1).toSeq, pa, pb)
      }.toMap
      val expectHash = expectStr.toSeq.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "t")
        .select(col("doc_id"), graft.functions.Exact.md5Hash60(col("t")).as("h"))
        .as[(Long, Long)].collect().toMap
      for ((id, text) <- docs) {
        val n = text.split(" ", -1).length
        val ref = expectStr(id)
        val r = got(id)
        assert(r._2 == n && r._4 == ref.length && r._3 == n - ref.length,
          s"seed=$seed doc=$id pair=($pa,$pb) text='$text': got $r want ${ref.mkString(" ")}")
        assert(r._5 == expectHash(id),
          s"seed=$seed doc=$id pair=($pa,$pb) stream mismatch: want '${ref.mkString(" ")}'")
      }
    }
  }

  test("chunker: full coverage, stride-aligned starts, reconstruction from prefixes") {
    docFrames(4).foreach { docs =>
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val chunks = graft.ext.Curation.chunkDocuments(df, chunkLen = 8, stride = 5)
        .orderBy("doc_id", "chunk_id")
        .select("doc_id", "chunk_id", "start_tok", "chunk_tokens", "chunk_text")
        .as[(Long, Long, Long, Long, String)].collect()
      val norm = df.select(col("doc_id"),
          graft.ext.TextAnalysis.normalized(col("text")).as("n"))
        .as[(Long, String)].collect().toMap
      for ((docId, grp0) <- chunks.groupBy(_._1)) {
        val grp = grp0.sortBy(_._2)
        val n = norm(docId).split(" ", -1).length
        // starts advance by exactly stride from 0; ids are dense
        assert(grp.map(_._3).toSeq == grp.indices.map(_ * 5L))
        assert(grp.map(_._2).toSeq == grp.indices.map(_.toLong))
        // every token index is covered: last chunk reaches the end, and
        // consecutive windows overlap (stride < chunkLen) or abut
        assert(grp.last._3 + grp.last._4 == n)
        assert(grp.forall(c => c._4 > 0))
        // reconstruction: the stride-prefix of each window (all of the last)
        // concatenates back to the normalized text
        val rebuilt = grp.zipWithIndex.flatMap { case (c, i) =>
          val toks = c._5.split(" ", -1)
          if (i == grp.length - 1) toks else toks.take(5)
        }.mkString(" ")
        assert(rebuilt == norm(docId), s"doc $docId reconstruction mismatch")
      }
    }
  }

  test("token budget: in_budget is prefix-closed per source (monotone running sum)") {
    docFrames(5).foreach { docs =>
      val out = graft.ext.Curation.tokenBudget(
        docs.toDF("doc_id", "text", "lang", "source"), budgetPerSource = 20L)
        .orderBy("source", "doc_id")
        .select("source", "in_budget").as[(String, Boolean)].collect()
      out.groupBy(_._1).values.foreach { grp =>
        val flags = grp.map(_._2)
        // once a doc falls out of budget, every later doc in the stratum is out
        assert(!flags.zip(flags.tail).exists { case (a, b) => !a && b })
      }
    }
  }

  test("stratified sampling: bucket always in [0,100); decision independent of partitioning") {
    docFrames(3).foreach { docs =>
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val a = graft.ext.Curation.sampleStrata(df)
        .select("doc_id", "sampled").as[(Long, Boolean)].collect().toMap
      val b = graft.ext.Curation.sampleStrata(df.repartition(7))
        .select("doc_id", "sampled").as[(Long, Boolean)].collect().toMap
      assert(a == b)
      val buckets = graft.ext.Curation.sampleStrata(df).select("bucket").as[Long].collect()
      assert(buckets.forall(x => x >= 0 && x < 100))
    }
  }

  test("boilerplate: kept + boilerplate = sentences; minDf=1 removes everything") {
    docFrames(3).foreach { docs =>
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val out = graft.ext.Curation.boilerplate(df).collect()
      assert(out.forall(r => r.getAs[Long]("n_kept") + r.getAs[Long]("n_boilerplate")
        == r.getAs[Long]("n_sentences")))
      // minDf = 1: every sentence trivially reaches the threshold, so every
      // doc (with at least one sentence) reconstructs to the same empty text
      val all = graft.ext.Curation.boilerplate(df, minDf = 1L).collect()
      assert(all.forall(_.getAs[Long]("n_kept") == 0L))
      assert(all.map(_.getAs[Long]("kept_hash")).distinct.length <= 1)
    }
  }

  test("vocab totals and tfidf rank-1 agree with independent counts") {
    docFrames(3).foreach { docs =>
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val toks = df.select(col("doc_id"),
          explode(graft.ext.TextAnalysis.tokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
      val vocab = graft.ext.TextAnalysis.vocabTop(df, 1000)
      assert(vocab.agg(coalesce(sum("tf"), lit(0L))).as[Long].head() == toks.count())
      assert(vocab.filter(col("df") > df.count()).count() == 0)
      // each doc's rank-1 keyword carries that doc's max term frequency
      val kw = graft.ext.TextAnalysis.tfidfKeywords(df, 1)
      val maxTf = toks.groupBy("doc_id", "t").count()
        .groupBy("doc_id").agg(max("count").as("m"))
      assert(kw.join(maxTf, "doc_id").filter(col("tf") =!= col("m")).count() == 0)
    }
  }

  test("bucket_topk kernel matches the rank-window reference, ties included") {
    import graft.ext.Similarity
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.AnnKernels.register(spark)
    (1 to 3).foreach { i =>
      val base = Gen.listOfN(60, Gen.listOfN(8, Gen.choose(-1.0, 1.0).map(_.toFloat)))(
        Gen.Parameters.default, Seed(7L + i)).getOrElse(sys.error("gen failed"))
      // duplicate a third of the vectors under new ids: exact-equal
      // embeddings force sim TIES, exercising the min-id tie-break
      val vecs = (base ++ base.take(20)).zipWithIndex
        .map { case (v, idx) => (idx.toLong, v.toArray) }
      val df = vecs.toDF("vec_id", "embedding")
        .withColumn("bucket", Similarity.signBucket(col("embedding"), 3))
      val viaKernel = df.groupBy("bucket")
        .agg(collect_list(struct(col("vec_id").as("id"), col("embedding").as("emb"))).as("vs"))
        .select(explode(expr("bucket_topk(vs, vs, 3)")).as("w"))
        .select("w.vec_id", "w.rank", "w.neighbor_id")
        .as[(Long, Long, Long)].collect().toSet
      val l = df.select(col("bucket"), col("vec_id"), col("embedding").as("l_emb"))
      val r = df.select(col("bucket"), col("vec_id").as("neighbor_id"),
        col("embedding").as("r_emb"))
      val reference = l.join(r, "bucket")
        .filter(col("vec_id") =!= col("neighbor_id"))
        .withColumn("sim", expr("cosine_sim(l_emb, r_emb)"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
            .orderBy(col("sim").desc, col("neighbor_id").asc)).cast("long"))
        .filter(col("rank") <= 3)
        .select("vec_id", "rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(viaKernel == reference)
    }
  }

  test("bucket_top1/topk are order-insensitive with NaN embeddings (total ordering)") {
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.AnnKernels.register(spark)
    // cosine against the NaN vector is NaN; Spark's desc window orders NaN
    // FIRST, so the NaN-producing member (id 9) must win every probe — no
    // matter where it sits in collect_list's input order
    val nan = Array(Float.NaN, 1f, 1f, 1f)
    val vs: Seq[(Long, Array[Float])] = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)), (9L, nan))
    def winners(order: Seq[(Long, Array[Float])]): Map[Long, Long] = {
      val df = order.toDF("vec_id", "embedding")
      df.agg(collect_list(struct(col("vec_id").as("id"), col("embedding").as("emb"))).as("vs"))
        .select(explode(expr("bucket_top1(vs, vs)")).as("w"))
        .select("w.vec_id", "w.neighbor_id").as[(Long, Long)].collect().toMap
    }
    val fwd = winners(vs)
    val rev = winners(vs.reverse)
    assert(fwd == rev)
    assert(fwd(1L) == 9L && fwd(2L) == 9L && fwd(3L) == 9L) // NaN sorts first, as desc window would
    val topk = vs.toDF("vec_id", "embedding")
      .agg(collect_list(struct(col("vec_id").as("id"), col("embedding").as("emb"))).as("vs"))
      .select(explode(expr("bucket_topk(vs, vs, 2)")).as("w"))
      .select("w.vec_id", "w.rank", "w.neighbor_id").as[(Long, Long, Long)].collect()
    assert(topk.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq == Seq(9L, 2L))
  }

  test("pq_encode guards: short vector → null; null/short codebook entries skipped") {
    graft.functions.AnnKernels.register(spark)
    val cb: Seq[(Long, Array[Float])] = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (1L, Array(1f, 1f, 1f, 1f)))
    val rows = Seq(
      (10L, Array(1f, 1f, 1f, 1f), cb),                        // → nearest entry pos 1 per subspace
      (11L, Array(1f, 1f), cb),                                // short input → null
      (12L, Array(0f, 0f, 0f, 0f), Seq((0L, null: Array[Float]), (1L, Array(1f, 1f, 1f, 1f)))),
      (13L, Array(0f, 0f, 0f, 0f), Seq((0L, Array(1f, 1f): Array[Float]))))  // all entries short → null
    val out = rows.toDF("vec_id", "embedding", "cb")
      .select(col("vec_id"), expr("pq_encode(embedding, cb, 2, 2)").as("code"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(10L) == Some((1L << 0) + (1L << 4))) // position 1 in both subspaces
    assert(out(11L).isEmpty)
    assert(out(12L) == Some((1L << 0) + (1L << 4))) // null entry at pos 0 skipped, pos 1 wins
    assert(out(13L).isEmpty)
  }

  test("hot-bucket cap: adversarial one-bucket corpus shards lists, results unchanged") {
    import graft.ext.Similarity
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.AnnKernels.register(spark)
    // every coordinate strictly positive -> EVERY sign bucket (any offset)
    // is the all-ones pattern: the entire corpus lands in one bucket, the
    // worst case the cap exists for
    val n = 200
    val dims = 32
    val vecs = (0 until n).map { i =>
      val base = Gen.listOfN(dims, Gen.choose(0.05, 1.0).map(_.toFloat))(
        Gen.Parameters.default, Seed(100L + i)).getOrElse(sys.error("gen failed"))
      (i.toLong, base.toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val maxBucket = 32
    // 1) the gathered lists really are capped (hash sharding is uneven, so
    //    allow 2x headroom) and the group fan-out is the expected m^2 grid
    val lists = Similarity.shardedSelfLists(
      df.withColumn("bucket", Similarity.signBucket(col("embedding"), 8)), maxBucket)
      .select(size(col("vs")).as("nv"), size(col("ps")).as("np")).collect()
    val m = math.ceil(n.toDouble / maxBucket).toInt
    assert(lists.length == m * m, s"expected ${m * m} shard groups, got ${lists.length}")
    assert(lists.forall(r => r.getAs[Int]("nv") <= 2 * maxBucket &&
      r.getAs[Int]("np") <= 2 * maxBucket),
      s"list over cap: ${lists.map(r => (r.getAs[Int]("nv"), r.getAs[Int]("np"))).mkString(",")}")
    // 2) sharded results equal the unsharded reference (guard off — the
    //    default) on every family member
    val big = graft.ext.Similarity.NoMaxBucket
    def t1(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long)].collect().toSet
    assert(t1(Similarity.lshTopNeighbor(df, 8, maxBucket)) ==
      t1(Similarity.lshTopNeighbor(df, 8, big)))
    assert(t1(Similarity.lshTopNeighborMulti(df, 4, 8, maxBucket)) ==
      t1(Similarity.lshTopNeighborMulti(df, 4, 8, big)))
    assert(Similarity.ivfTopNeighbor(df, 8, maxBucket).as[(Long, Long, Long)].collect().toSet ==
      Similarity.ivfTopNeighbor(df, 8, big).as[(Long, Long, Long)].collect().toSet)
    assert(Similarity.ivfTopKNeighbors(df, 3, 8, maxBucket).as[(Long, Long, Long)].collect().toSet ==
      Similarity.ivfTopKNeighbors(df, 3, 8, big).as[(Long, Long, Long)].collect().toSet)
    assert(t1(Similarity.ivfTopNeighborProbed(df, 2, 8, maxBucket)) ==
      t1(Similarity.ivfTopNeighborProbed(df, 2, 8, big)))
    assert(t1(Similarity.nearDupPairs(df, 0.8, 8, maxBucket)) ==
      t1(Similarity.nearDupPairs(df, 0.8, 8, big)))
  }

  test("pii scrub: output has no residual email/phone matches on any input") {
    docFrames(3).foreach { docs =>
      val df = graft.ext.Curation.withPiiInjected(
        docs.toDF("doc_id", "text", "lang", "source"))
      val out = graft.ext.Curation.piiScrub(df)
      // scrubbed hash must differ from the raw hash whenever something was redacted
      val raw = df.select(col("doc_id"),
        graft.functions.Exact.md5Hash60(col("text")).as("raw_hash"))
      val changed = out.join(raw, "doc_id")
        .filter(col("n_redactions") > 0 && col("scrubbed_hash") === col("raw_hash"))
      assert(changed.count() == 0)
    }
  }

  test("span dup invariants over random corpora; verbatim twin means full coverage") {
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.choose(3, 30).flatMap(len =>
      Gen.listOfN(len, wordGen).map(_.mkString(" ")))
    val n = 3 // span length for the test
    (1 to 3).foreach { i =>
      val texts = Gen.listOfN(25, docGen)(Gen.Parameters.default, Seed(7L + i))
        .getOrElse(sys.error("gen failed"))
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val out = graft.ext.Dedup.spanDups(docs, n).collect()
      assert(out.length == texts.length) // every doc gets a row
      out.foreach { r =>
        val Seq(id, spans, dup, run, cov) = (0 to 4).map(r.getLong)
        val tokens = texts(id.toInt).split(" ").length
        assert(spans == math.max(tokens - n + 1, 0))
        assert(dup <= spans)
        assert(run <= dup)
        // coverage: bounded by the doc, at least the longest run's stretch,
        // never more than the per-span sum
        assert(cov <= tokens && cov <= dup * n)
        if (dup > 0) assert(cov >= run + n - 1)
        else assert(run == 0 && cov == 0)
      }
    }
    // a corpus of two identical docs: every span duplicated, full coverage
    val twins = Seq((1L, "p q r s t u v"), (2L, "p q r s t u v"))
      .toDF("doc_id", "text")
    graft.ext.Dedup.spanDups(twins, n).collect().foreach { r =>
      assert(r.getLong(1) == 5L && r.getLong(2) == 5L)
      assert(r.getLong(3) == 5L && r.getLong(4) == 7L) // all 7 tokens covered
    }
  }

  test("substr apply invariants: token conservation, elder keeps, suppression leaves no pairs") {
    // wide token alphabet (100k ids): a splice at a cut boundary cannot
    // accidentally reproduce another doc's 8-gram, so suppressing once
    // must leave a PAIR-FREE corpus — the Lee-et-al fixed point in one
    // step; the planted 10-token runs are the only cross-doc runs
    val rng = new scala.util.Random(11)
    def tok(): String = "t" + rng.nextInt(100000)
    val runs = Seq.fill(2)(Seq.fill(10)(tok()).mkString(" "))
    val texts = (1L to 12L).map { i =>
      val pre = Seq.fill(3 + rng.nextInt(5))(tok()).mkString(" ")
      val post = Seq.fill(3 + rng.nextInt(5))(tok()).mkString(" ")
      val body =
        if (i % 3 == 0) runs(0)        // docs 3, 6, 9, 12 share run 0
        else if (i % 4 == 1) runs(1)   // docs 1, 5, 9 share run 1 (9: both)
        else Seq.fill(10)(tok()).mkString(" ")
      (i, s"$pre $body $post")
    }
    val docs = texts.toDF("doc_id", "text")
    val out = graft.ext.Dedup.substrApply(docs)
      .as[(Long, Long, String)].collect().toSeq
    // accounting: every doc exactly once
    assert(out.map(_._1) == (1L to 12L))
    val byId = texts.toMap
    out.foreach { case (id, nCut, clean) =>
      // conservation: removed tokens are counted exactly
      val orig = byId(id).split(" ").length
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(orig - kept == nCut, s"doc $id: $orig - $kept != $nCut")
    }
    // the ELDER of each run keeps its text (docs 3 and 1 are the younger
    // bound of nothing — nothing cut)
    assert(out.find(_._1 == 3L).get._2 == 0L)
    assert(out.find(_._1 == 1L).get._2 == 0L)
    // every younger run-carrier lost at least the run
    Seq(6L, 9L, 12L, 5L).foreach { id =>
      assert(out.find(_._1 == id).get._2 >= 10L, id.toString)
    }
    // one suppression pass leaves a corpus with NO cross-doc runs
    val cleaned = out.map { case (id, _, clean) => (id, clean) }
      .toDF("doc_id", "text")
    assert(graft.ext.Dedup.substrDups(cleaned).count() == 0L)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  test("substr decontaminate equals a brute window-match reference on random plants") {
    // random 30-token train docs over a wide alphabet, with 0-2 bench
    // runs PLANTED by overwriting positions (overlapping plants clobber
    // each other — the reference recomputes from the final arrays, so
    // partial clobbers are handled by construction). The reference is
    // computed token-wise in Scala with no shared code: a train window
    // matches iff some bench doc contains its 8-gram contiguously;
    // coverage = union of matching windows' token spans (equal to the
    // operator's island interval-union — every island is a union of its
    // consecutive matching windows); longest_run = the longest common
    // contiguous token run ≥ 8 over all (train, bench) pairs, brute
    // extended from every (i, j) start.
    val rng = new scala.util.Random(23)
    def tok(): String = "u" + rng.nextInt(100000)
    val n = graft.ext.Dedup.SpanN
    val bench = (1L to 3L).map(i => (i, Array.fill(12)(tok())))
    val train = (100L to 107L).map { i =>
      val arr = Array.fill(30)(tok())
      (0 until rng.nextInt(3)).foreach { _ =>
        val b = bench(rng.nextInt(bench.length))._2
        val p = rng.nextInt(arr.length - b.length)
        Array.copy(b, 0, arr, p, b.length)
      }
      (i, arr)
    }
    // reference verdicts
    val expected = train.flatMap { case (id, t) =>
      val benchGrams = bench.flatMap(_._2.sliding(n).map(_.toSeq)).toSet
      val matching = (0 to t.length - n)
        .filter(w => benchGrams.contains(t.slice(w, w + n).toSeq))
      if (matching.isEmpty) None
      else {
        val covered = matching.flatMap(w => w until w + n).toSet.size.toLong
        var longest = 0
        var hit = Set.empty[Long]
        bench.foreach { case (bid, b) =>
          var found = false
          for (i <- t.indices; j <- b.indices) {
            var k = 0
            while (i + k < t.length && j + k < b.length && t(i + k) == b(j + k))
              k += 1
            if (k >= n) { found = true; if (k > longest) longest = k }
          }
          if (found) hit += bid
        }
        Some((id, longest.toLong, covered, hit.size.toLong))
      }
    }
    val out = graft.ext.Dedup.substrDecontaminate(
        train.map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text"),
        bench.map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == expected.sortBy(_._1), s"got $out\nexpected $expected")
    // the randomized corpus must actually exercise the operator
    assert(expected.nonEmpty)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  test("ANN kernels: NaN/Inf/short vectors are partition-order invariant") {
    // pins the kernel guard contracts (beats()'s NaN total order, PqEncode's
    // short-vector null, length-mismatch skips, SQ8's non-finite sanitize):
    // a corpus laced with NaN/Inf components and mixed vector lengths must
    // produce IDENTICAL results under different partitionings — i.e. under
    // different collect_list input orders — for every kernel-backed operator
    import graft.ext.Similarity
    val rnd = new scala.util.Random(7)
    def mkVec(len: Int): Array[Float] =
      Array.tabulate(len) { _ =>
        rnd.nextInt(20) match {
          case 0 => Float.NaN
          case 1 => Float.PositiveInfinity
          case 2 => Float.NegativeInfinity
          case 3 => -0.0f
          case _ => (rnd.nextInt(2001) - 1000) / 100.0f
        }
      }
    (1 to 3).foreach { trial =>
      val rows = (0L until 40L).map { id =>
        // lengths 8/12 exercise pair-length-mismatch skips; 4 is shorter
        // than PqEncode's subs*subDim = 8 and must encode as null
        val len = if (id % 11 == 3) 4 else if (id % 2 == 0) 8 else 12
        (id, mkVec(len))
      }
      val df = rows.toDF("vec_id", "embedding")
      def ops(d: org.apache.spark.sql.DataFrame) = Seq(
        "lsh" -> Similarity.lshTopNeighbor(d, signBits = 3),
        "lsh_capped" -> Similarity.lshTopNeighbor(d, signBits = 3, maxBucket = 4),
        "ivf_top1" -> Similarity.ivfTopNeighbor(d, k = 4),
        "ivf_topk" -> Similarity.ivfTopKNeighbors(d, topK = 2, k = 4),
        "pq_codes" -> Similarity.pqCodes(d, subs = 2, subDim = 4, k = 4),
        "sq8" -> Similarity.sq8TopK(d, numQueries = 5, k = 2))
      val one = ops(df.repartition(1))
      val many = ops(df.repartition(7, col("vec_id")))
      one.zip(many).foreach { case ((name, a), (_, b)) =>
        val ra = a.collect().map(_.toString).sorted.toSeq
        val rb = b.collect().map(_.toString).sorted.toSeq
        assert(ra == rb, s"trial $trial op $name diverged between partitionings")
      }
    }
  }

  test("jaccardJoin losslessness holds over random corpora and thresholds") {
    // the prefix AND positional (PPJoin) filters' no-false-negative proof,
    // exercised empirically: on random token-bag corpora (Zipf-ish via
    // geometric word draw), the filtered join equals the naive all-pairs
    // join at every τ. τ values include the 850000 default and boundary
    // thresholds where the positional overlap bound
    // (min(na−ra, nb−rb)+1)·(1+τ) ≥ τ·(na+nb) sits tightest (near-identical
    // docs at high τ — trial 4's duplicated corpus forces exact-equality
    // pairs through the prune).
    val words = (0 until 40).map(i => s"w$i")
    (1 to 4).foreach { trial =>
      val rnd = new scala.util.Random(1000L + trial)
      val base = (0L until 50L).map { id =>
        val n = 3 + rnd.nextInt(12)
        // geometric-ish draw: low ids common, tail rare — realistic df skew
        val toks = (0 until n).map { _ =>
          var i = 0
          while (i < words.size - 1 && rnd.nextBoolean()) i += 1
          words(i)
        }
        (id, toks.mkString(" "))
      }
      // trial 4: every doc duplicated under a new id — J=1 pairs abound, the
      // positional filter's equality corner (ra=rb, na=nb) must keep them all
      val docs = (if (trial == 4)
        base ++ base.map { case (id, t) => (id + 100L, t) }
      else base).toDF("doc_id", "text")
      Seq(500000L, 700000L, 850000L, 900000L, 990000L).foreach { tau =>
        val fast = ext.Dedup.jaccardJoin(docs, tau)
          .select("doc_a", "doc_b", "n_common", "j_ppm")
          .as[(Long, Long, Long, Long)].collect().toSet
        val tk = docs.select($"doc_id",
          array_remove(array_distinct(ext.TextAnalysis.tokens($"text")), "").as("ts"))
        val naive = tk.as("x").crossJoin(tk.as("y"))
          .filter($"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
            size(array_intersect($"x.ts", $"y.ts")).cast("long").as("n_common"),
            (size($"x.ts") + size($"y.ts")).cast("long").as("sz"))
          .filter($"sz" > $"n_common")
          .select($"doc_a", $"doc_b", $"n_common",
            expr("(n_common * 1000000L) div (sz - n_common)").as("j_ppm"))
          .filter($"j_ppm" >= tau)
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(fast == naive, s"trial $trial tau $tau: ${fast.size} vs ${naive.size}")
      }
    }
  }

  test("winnow_fps equals the naive per-window formulation on random inputs") {
    // differential fuzz of the monotonic-deque kernel against a naive
    // O(m·w) reference over random shingle streams, covering empties,
    // short-input (m < w) whole-sequence windows, heavy duplicate hashes
    // (small alphabet), and long monotone stretches
    val rnd = new scala.util.Random(7)
    val alphabets = Seq(3, 8, 1000) // tiny alphabet → many equal hashes
    for (alpha <- alphabets; trial <- 1 to 50) {
      val m = rnd.nextInt(40)
      val shingles = Array.fill(m)(s"tok${rnd.nextInt(alpha)}")
      val w = 1 + rnd.nextInt(6)
      val fast = graft.functions.HashKernels.winnowFps(shingles, w).toSeq
      val hs = shingles.map(graft.functions.HashKernels.md5Hash60).toSeq
      val naive =
        if (m == 0) Seq.empty[Long]
        else {
          val wEff = math.min(w, m)
          (0 to m - wEff).map(j => hs.slice(j, j + wEff).min)
            .distinct.sorted
        }
      assert(fast == naive, s"alpha=$alpha m=$m w=$w")
      // the split kernel over pre-computed hashes must compose identically
      // (winnowingFrom consumes the materialized md5 stream via this path)
      assert(graft.functions.HashKernels.winnowMins(hs.toArray, w).toSeq == naive,
        s"winnowMins alpha=$alpha m=$m w=$w")
    }
    intercept[IllegalArgumentException] {
      graft.functions.HashKernels.winnowMins(Array(1L, 2L), 0)
    }
    // w < 1 must be a clear error, not an out-of-bounds deque walk — both
    // at the kernel and at the SQL registration (checkInputDataTypes)
    intercept[IllegalArgumentException] {
      graft.functions.HashKernels.winnowFps(Array("a", "b"), 0)
    }
    assert(graft.functions.WinnowFps(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array("a", "b"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      0).checkInputDataTypes().isFailure)
  }

  test("bm25 fixed point tracks the float rational-idf model on random corpora") {
    import graft.ext.Retrieval
    // random corpora over a small alphabet; doc 0 is always present so the
    // % 97 carve yields a query. The fixed-point pipeline (idf ppm, dl
    // ratio bp, saturation bp) must stay within floor-rounding distance of
    // the exact float model — the invariant that catches unit/scale slips
    // in any of the nested integer divisions.
    val tokGen = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.choose(3, 14).flatMap(n => Gen.listOfN(n, tokGen))
    (1 to 4).foreach { round =>
      val texts = Gen.listOfN(12, docGen)(Gen.Parameters.default, Seed(900L + round))
        .getOrElse(sys.error("gen failed"))
      val docs = texts.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Retrieval.bm25Rank(
        Retrieval.withBm25Weights(
          Retrieval.bm25Postings(docs), Retrieval.bm25StatsDelta(docs)),
        Retrieval.bm25Queries(docs), k = 12)
        .collect().map(r => (r.getLong(2), r.getLong(3))).toMap

      // driver-side float model over the same corpus
      val toks = texts.map(_.toArray)
      val n = toks.length
      val avgdl = toks.map(_.length).sum.toDouble / n
      val df = toks.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
      val qTerms = toks.head.slice(2, 6).distinct // tokens 3..6, 1-based
      val expect = toks.zipWithIndex.map { case (dt, i) =>
        val dl = dt.length
        val score = qTerms.filter(dt.contains(_)).map { t =>
          val tf = dt.count(_ == t).toDouble
          val idf = (n - df(t) + 0.5) / (df(t) + 0.5) * 1e6
          val sat = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e4
          idf * sat
        }.sum
        i.toLong -> score
      }.toMap
      got.foreach { case (docId, fp) =>
        val ref = expect(docId)
        // each of the ~4 per-term products floors idf (±1 ppm of ~1e6+),
        // the dl ratio (±1 bp), and the saturation (±1 bp of ~1e4): allow
        // 1% relative plus a small absolute floor
        assert(math.abs(fp - ref) <= ref * 0.01 + 4e6,
          s"round $round doc $docId: fixed $fp vs float $ref")
      }
      // ranking agreement where the float model separates scores clearly
      val gotOrder = got.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
      gotOrder.sliding(2).foreach {
        case Seq(hi, lo) =>
          assert(expect(hi) >= expect(lo) - math.max(expect(lo) * 0.01, 4e6),
            s"round $round: fixed ranks $hi above $lo against the float model")
        case _ => ()
      }
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on random sorted sets") {
    // differential fuzz of the native merge-walk kernel against the
    // built-in, over its whole documented domain: sorted-distinct arrays
    // of either element width, including empties and disjoint/identical
    // extremes
    graft.functions.SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      def set() = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted.toSeq
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        expr("sorted_intersect_count(a, b)").as("fast"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0L)
    // int-element arrays (the batch join's row_number tids) walk the same
    val dfInt = rows.map { case (i, a, b) =>
      (i, a.map(_.toInt), b.map(_.toInt)) }.toDF("id", "a", "b")
    val diffInt = dfInt.select(
        expr("sorted_intersect_count(a, b)").as("fast"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(diffInt == 0L)
  }

  // unique event ids (zipWithIndex) so the (ts, event_id) total order is
  // collision-free — the determinism contract sessions/transitions rely on
  private def uniqueIdFrames(n: Int): Seq[List[Ev]] =
    sampleFrames(n).map(_.zipWithIndex.map { case (e, i) =>
      e.copy(event_id = i.toLong)
    })

  test("sessions equal a plain fold reference on random frames") {
    uniqueIdFrames(5).foreach { evs =>
      val rows = Stats.sessionStats(evs.toDF())
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val got = rows.toSet
      assert(rows.length == got.size, "duplicate group rows emitted")
      val want = evs.groupBy(_.user_id).map { case (u, es) =>
        val us = es.map(e => (e.ts.getTime * 1000L, e.event_id)).sorted
        val sessions = us.tail.foldLeft(List(List(us.head))) { (acc, e) =>
          if (e._1 - acc.head.head._1 > Stats.SessionGapUs)
            List(e) :: acc
          else (e :: acc.head) :: acc.tail
        }.map(_.reverse).reverse
        (u, sessions.size.toLong,
          sessions.count(_.size == 1).toLong,
          es.size.toLong,
          sessions.map(_.size).max.toLong,
          sessions.map(s => s.map(_._1).max - s.map(_._1).min).sum)
      }.toSet
      assert(got == want)
    }
  }

  test("transitions equal a plain bigram reference on random frames") {
    uniqueIdFrames(5).foreach { evs =>
      val rows = Stats.transitions(evs.toDF())
        .as[(String, String, Long, Long, Long)].collect()
      val got = rows.toSet
      assert(rows.length == got.size, "duplicate group rows emitted")
      val pairs = evs.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
        val ordered = es.sortBy(e => (e.ts.getTime, e.event_id))
        ordered.zip(ordered.tail).map { case (a, b) => (a.event_type, b.event_type) }
      }
      val cnt = pairs.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      val srcTotal = cnt.groupBy(_._1._1).map { case (s, m) => (s, m.values.sum) }
      val want = cnt.map { case ((s, d), n) =>
        (s, d, n, srcTotal(s), n * 1000000L / srcTotal(s))
      }.toSet
      assert(got == want)
    }
  }

  test("co-occurrence equals a plain basket reference on random frames") {
    uniqueIdFrames(5).foreach { evs =>
      val rows = Stats.cooccurrence(evs.toDF())
        .as[(String, String, Long, Long)].collect()
      val got = rows.toSet
      assert(rows.length == got.size, "duplicate group rows emitted")
      val dayMs = 86400000L
      // .toSeq BEFORE the map: mapping the Map directly would re-key on
      // user_id alone and collapse a user's baskets from different days
      val baskets = evs.groupBy(e => (e.user_id, e.ts.getTime / dayMs))
        .toSeq.map { case ((u, _), es) => (u, es.map(_.event_type).toSet) }
        .filter(_._2.size <= Stats.CooccurCap)
      val pairRows = baskets.flatMap { case (u, types) =>
        types.toSeq.sorted.combinations(2).map(p => (p(0), p(1), u))
      }
      val want = pairRows.groupBy(r => (r._1, r._2)).map { case ((a, b), xs) =>
        (a, b, xs.size.toLong, xs.map(_._3).distinct.size.toLong)
      }.toSet
      assert(got == want)
    }
  }

  test("crawl pipeline accounting equals a brute sequential reference on random corpora") {
    // Random raw docs (short no-span docs, empty text, random lang/source,
    // stopword sprinkles) with PLANTED structure per stage: bench content
    // copied into train docs (decontamination), a shared 9-token block
    // across ALL bench docs (the > maxAnchorDocs hot-anchor suppression),
    // train windows copied across train docs (dedup pairs), one window
    // into 4 docs (survivor-side hot suppression). The reference
    // recomputes every stage token-wise in Scala with no shared code,
    // applying the SEQUENTIAL semantics directly: blocked by URL-suffix
    // chain, contaminated = shares any non-hot bench 8-gram, dedup-
    // dropped = some shared non-hot 8-gram has a smaller surviving
    // holder, then quality/lang/exact-canonical/source-quota.
    val n = graft.ext.Dedup.SpanN
    val cap = 2 // hot-anchor cap small enough for 3 bench docs to trip it
    val langsKeep = Set("en", "de")
    val budget = 200L
    val blockSet = Set("ads.example.net", "site7.example.org")
    (1 to 3).foreach { round =>
      val rng = new scala.util.Random(400 + round)
      def tok(): String = "u" + rng.nextInt(50000)
      val shared = Array.fill(9)(tok()) // in EVERY bench doc -> hot
      val bench = (1L to 3L).map { i =>
        val own = Array.fill(11)(tok())
        (i, own.take(5) ++ shared ++ own.drop(5))
      }
      val raw = (1L to 60L).map { i =>
        val len = rng.nextInt(4) match {
          case 0 => rng.nextInt(4) + 1 // short: no spans even with tails
          case _ => rng.nextInt(20) + 10
        }
        val arr = Array.fill(len)(
          if (rng.nextInt(5) == 0) Seq("the", "a", "of")(rng.nextInt(3))
          else tok())
        (i, arr)
      }.toMap ++ Map(61L -> Array.empty[String])
      val planted = scala.collection.mutable.Map(raw.toSeq: _*)
      def plantInto(id: Long, block: Array[String]): Unit = {
        val t = planted(id)
        if (t.length >= block.length) {
          val p = rng.nextInt(t.length - block.length + 1)
          val c = t.clone(); Array.copy(block, 0, c, p, block.length)
          planted(id) = c
        }
      }
      // bench leakage: own-window plants (contaminating) and the shared
      // block (hot -> NOT contaminating on its own)
      (1 to 4).foreach { _ =>
        plantInto(rng.nextInt(60) + 1L, bench(rng.nextInt(3))._2.take(n))
      }
      plantInto(rng.nextInt(60) + 1L, shared)
      // train-train dup plants + one 4-doc boilerplate window
      (1 to 3).foreach { _ =>
        val src = planted(rng.nextInt(60) + 1L)
        if (src.length >= n) plantInto(rng.nextInt(60) + 1L, src.take(n))
      }
      val boiler = Array.fill(n)(tok())
      (1 to 4).foreach(_ => plantInto(rng.nextInt(60) + 1L, boiler))
      val langs = Seq("en", "fr", "de")
      val srcs = Seq("s0", "s1")
      val meta = planted.keys.map(i =>
        i -> (srcs(rng.nextInt(2)), langs(rng.nextInt(3)))).toMap

      // ---- reference: replicate withCrawlCorpus token-wise ----
      def tailOf(id: Long): Array[String] = {
        val base = Array("see", s"https://site${id % 50}.example.org/p${id % 7}",
          "and", s"http://mirror${id % 3}.example.com/x")
        if (id % 5 == 0) base ++ Array("ad", s"https://cdn${id % 4}.ads.example.net/t")
        else base
      }
      val crawlRef: Seq[(Long, Array[String], String, String)] =
        planted.toSeq.flatMap { case (i, t) =>
          val (src, lg) = meta(i)
          val twin = if (t.isEmpty) t else t.drop(1) // no-space doc: twin = copy
          // a ONE-token doc has no space either -> twin keeps the token
          val twinArr = if (t.length <= 1) t else twin
          Seq((i, t ++ tailOf(i), src, lg),
            (i + 1000000L, twinArr ++ tailOf(i + 1000000L), src, lg))
        }.sortBy(_._1)
      def hosts(toks: Array[String]): Seq[String] =
        toks.toSeq.flatMap(w =>
          "https?://([a-z0-9.-]+)/".r.findAllMatchIn(w).map(_.group(1)))
      def blockedRef(toks: Array[String]): Boolean =
        hosts(toks).exists { h =>
          val ls = h.split("\\.")
          (0 to ls.length - 2).exists(k => blockSet(ls.drop(k).mkString(".")))
        }
      def grams(t: Array[String]): Set[Seq[String]] =
        if (t.length < n) Set.empty else t.sliding(n).map(_.toSeq).toSet
      val benchGramDocs = bench.flatMap { case (bid, b) =>
        grams(b).map(_ -> bid)
      }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val benchOk = benchGramDocs.filter(_._2 <= cap).keySet
      val n0 = crawlRef.size.toLong
      val s1 = crawlRef.filterNot(d => blockedRef(d._2))
      val s2 = s1.filterNot(d => grams(d._2).exists(benchOk))
      val gramHolders = s2.flatMap(d => grams(d._2).map(_ -> d._1))
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.sorted }
        .filter { case (_, hs) => hs.size >= 2 && hs.size <= cap }
      val dropped = gramHolders.values.flatMap(_.drop(1)).toSet
      val s3 = s2.filterNot(d => dropped(d._1))
      def nrm(t: Array[String]): String = t.mkString(" ")
      val canonical = s3.groupBy(d => nrm(d._2))
        .map { case (_, ds) => ds.map(_._1).min }.toSet
      val q = s3.filter { case (id, t, _, lg) =>
        val nt = t.length
        nt >= 10 && nt <= 100000 &&
          t.exists(Set("the", "a", "of", "and", "to", "in", "is")) &&
          nrm(t).replace(" ", "").length < nt * 12 &&
          langsKeep(lg) && canonical(id)
      }
      val kept = q.groupBy(_._3).values.flatMap { ds =>
        var cum = 0L
        ds.sortBy(_._1).flatMap { d =>
          cum += d._2.length; if (cum <= budget) Some(d._1) else None
        }
      }
      val n1 = s1.size.toLong; val n2 = s2.size.toLong
      val n3 = s3.size.toLong; val n4 = kept.size.toLong
      val expected = Seq(
        (1L, "blocklist", n0, n0 - n1, n1),
        (2L, "decontaminate", n1, n1 - n2, n2),
        (3L, "dedup", n2, n2 - n3, n3),
        (4L, "quality_quota", n3, n3 - n4, n4))

      // ---- the operator over the SAME raw docs ----
      val rawDf = planted.toSeq.sortBy(_._1).map { case (i, t) =>
        val (src, lg) = meta(i)
        (i, t.mkString(" "), src, lg)
      }.toDF("doc_id", "text", "source", "lang")
      val out = graft.ext.Curation.crawlPipeline(
          graft.ext.Curation.withCrawlCorpus(rawDf),
          blockSet.toSeq.sorted.toDF("domain"),
          graft.ext.Dedup.spanTable(
            bench.map { case (i, b) => (i, b.mkString(" ")) }
              .toDF("doc_id", "text"), n),
          n, cap, langsKeep.toSeq.sorted, budget)
        .as[(Long, String, Long, Long, Long)].collect().toSeq
      assert(out == expected, s"round $round\ngot      $out\nexpected $expected")
      // every stage must actually fire across the rounds' constructions
      assert(expected.forall(_._4 >= 0) && n0 > n4)
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  test("histogram quantile bins are monotone and consistent with a reference histogram") {
    sampleFrames(5).foreach { evs =>
      val got = graft.ext.Sketches.histQuantiles(evs.toDF())
        .as[(String, Long, Long, Long, Long)].collect()
      val byType = evs.groupBy(_.event_type)
      // every event type present in the input must come back as a group —
      // a filter regression dropping a group would otherwise pass silently
      assert(got.map(_._1).toSet == byType.keySet)
      got.foreach { case (et, n, p50, p90, p99) =>
        val vals = byType(et).map(_.value)
        assert(n == vals.size)
        assert(p50 <= p90 && p90 <= p99)
        val bins = vals.map(v =>
          math.min(63, math.max(0, math.floor(v / 8.0).toInt)))
          .groupBy(identity).map { case (b, xs) => (b, xs.size.toLong) }
        def q(pct: Int): Long = {
          val rank = (n * pct + 99) / 100
          (0 to 63).find(b =>
            (0 to b).map(i => bins.getOrElse(i, 0L)).sum >= rank).get.toLong
        }
        assert((p50, p90, p99) == (q(50), q(90), q(99)))
      }
    }
  }
}
