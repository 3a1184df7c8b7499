package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/** Invariant tests for the LLM-pipeline operators on the sf0.001 tables. */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  private def embeddings: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  /** Recursive delete for test temp dirs (repeated suite runs were
    * accumulating corpus copies under /tmp).
    */
  private def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { f => java.nio.file.Files.deleteIfExists(f); () }
      finally walk.close()
    }

  test("minhash-LSH finds every pair the exact all-pairs Jaccard rates >= 0.9") {
    // ground truth: exact Jaccard across ALL pairs (no blocking) on 500 docs
    val withSh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val a = withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val exact = a.crossJoin(b)
      .where(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "testdata should contain near-duplicates")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
    assert(lsh.subsetOf(exact), s"LSH emitted sub-threshold pairs ${lsh -- exact}")
  }

  test("connected components: chain + clique + isolated pair label to min id") {
    import spark.implicits._
    // chain 0-1-...-15 exercises multi-round large/small-star convergence
    // (a path is the adversarial diameter case); 100-101-102 clique and the
    // isolated pair (200,201) must stay separate components
    val chain = (0L until 15L).map(i => (i, i + 1))
    val clique = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pair = Seq((201L, 200L)) // reversed orientation on purpose
    val edges = (chain ++ clique ++ pair).toDF("doc_a", "doc_b")
    // distributed loop forced (cap=0): the path case is ITS adversarial
    // diameter case; the default fast path is covered by the random-graph
    // property test
    val got = Dedup.connectedComponents(edges, driverEdgeCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 16 + 3 + 2)
    (0L to 15L).foreach(i => assert(got(i) == 0L, s"chain node $i"))
    (100L to 102L).foreach(i => assert(got(i) == 100L))
    assert(got(200L) == 200L && got(201L) == 200L)
  }

  test("connected components match union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      // reference: in-memory union-find with min-label roots
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      // default path (<= cap: driver union-find inside connectedComponents)
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"trial $trial: ${got.toSeq.sorted} vs ${want.toSeq.sorted}")
      // driverEdgeCap = 0 forces the DISTRIBUTED large-star/small-star
      // loop — this assert is what keeps the over-cap branch covered now
      // that small graphs take the fast path
      val dist = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"),
          driverEdgeCap = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(dist == want, s"trial $trial distributed loop diverged")
      // the raw union-find primitive shared with streamCcRun's relabel:
      // the three label routes are interchangeable, which is what keeps
      // every under-cap and over-cap branch ==batch
      val (fIds, fLabels) = Dedup.driverMinLabels(edges.iterator, edges.size)
      val fast = fIds.zip(fLabels).toMap
      assert(fIds.length == fast.size, s"trial $trial duplicate node emitted")
      assert(fast == want, s"trial $trial driverMinLabels diverged")
    }
  }

  test("connected components with non-Long ids keep the type-generic distributed loop") {
    // the r10 driver fast path is gated on LongType endpoints (r9 ADVICE:
    // collecting a non-Long id column would ClassCastException and
    // silently change the output type): an int-typed graph under the
    // default cap must still resolve — via the distributed loop — and
    // keep its integer label type
    val edges = spark.range(10).selectExpr(
      "cast(id AS int) AS doc_a", "cast(id + 1 AS int) AS doc_b")
    val got = Dedup.connectedComponents(edges)
    assert(got.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.IntegerType),
      got.schema.treeString)
    val labels = got.collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(labels.size == 11 && labels.values.forall(_ == 0))
  }

  test("driverMinLabels primitive map survives rehash growth, negative ids, undersized hint") {
    // 5000-node single chain over scattered ids (negatives included) with a
    // deliberately tiny sizeHint: the open-addressed table starts at 128
    // slots and must double ~6 times, and the id/parent arrays must grow —
    // the code paths a well-sized hint never touches
    val ids = new scala.util.Random(11).shuffle(
      (-2500 until 2500).map(_.toLong * 104729L).toVector)
    val chain = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val (outIds, labels) = Dedup.driverMinLabels(chain.iterator, sizeHint = 4)
    assert(outIds.length == 5000)
    assert(outIds.toSet == ids.toSet)
    val want = ids.min
    assert(labels.forall(_ == want), "single chain must collapse to the min id")
  }

  test("jaccard prefix spill guard refuses an over-budget corpus, naming the alternative") {
    // synthetic over-budget estimate: any real corpus at a 1 KiB budget
    val ex = intercept[IllegalStateException] {
      Dedup.jaccardPrefixPairs(docs, maxSpillBytes = 1024L)
    }
    assert(ex.getMessage.contains("dedup_jaccard_prefix_subset"),
      s"guard must name the scale sibling: ${ex.getMessage}")
    assert(ex.getMessage.contains("maxSpillBytes"),
      "guard must name the deliberate override")
    // the guard estimates from n_chars when present and length(text) when
    // not — both routes must agree on this corpus (n_chars IS the length)
    val ex2 = intercept[IllegalStateException] {
      Dedup.jaccardPrefixPairs(docs.drop("n_chars"), maxSpillBytes = 1024L)
    }
    assert(ex2.getMessage.contains("refusing up front"))
    // the auto (free-scratch) budget admits the test corpus and the
    // operator still computes: guard wired in, not replacing the result
    assert(Dedup.jaccardPrefixPairs(docs).count() > 0)
  }

  test("bench host-drift index: geomean of current/pinned kernel medians") {
    // the drift-normalization math the round-over-round bench comparison
    // now rests on (r9 VERDICT #1): identical medians → exactly 1.0, a
    // uniformly 2x-slower host → 2.0, missing/failed kernels → -1 (unknown
    // host, never silently nominal), partial overlap uses only shared keys
    val pinned = Map(
      "chowlin_objective_eval_n4800_ms" -> 106.943,
      "denton_cholette_y2m_n4800_ms" -> 164.882)
    assert(math.abs(Bench.hostIndex(pinned) - 1.0) < 1e-12)
    assert(math.abs(Bench.hostIndex(pinned.map { case (k, v) =>
      k -> v * 2.0 }) - 2.0) < 1e-12)
    assert(Bench.hostIndex(Map.empty) == -1.0)
    assert(Bench.hostIndex(Map("unknown_kernel_ms" -> 5.0)) == -1.0)
    // geomean, not mean: one 4x + one 1x reads 2x
    assert(math.abs(Bench.hostIndex(Map(
      "chowlin_objective_eval_n4800_ms" -> 106.943 * 4.0,
      "denton_cholette_y2m_n4800_ms" -> 164.882)) - 2.0) < 1e-12)
    // sub-ms kernels are EXCLUDED (±50% JIT swing on identical code — the
    // r10 bracketing runs): a wildly-off small kernel must not move the
    // index, and small kernels alone leave the host unknown
    assert(math.abs(Bench.hostIndex(pinned +
      ("chowlin_objective_eval_n158_ms" -> 0.573 * 10.0)) - 1.0) < 1e-12)
    assert(Bench.hostIndex(Map(
      "denton_a2q_n144_ms" -> 1.088,
      "chowlin_objective_eval_n158_ms" -> 0.573)) == -1.0)
  }

  test("spill guard covers every exploded-index operator (r9 VERDICT #3)") {
    // same corpus×expansion shuffle shape as jaccard-prefix — each of the
    // four refuses an over-budget corpus up front, naming its alternative,
    // and still computes under the auto budget
    val exNovelty = intercept[IllegalStateException] {
      TextOps.noveltySignals(docs, maxSpillBytes = 1024L)
    }
    assert(exNovelty.getMessage.contains("noveltySignals") &&
      exNovelty.getMessage.contains("subsetDocs"))
    val exQuote = intercept[IllegalStateException] {
      TextOps.quoteAttribution(docs, maxSpillBytes = 1024L)
    }
    assert(exQuote.getMessage.contains("quoteAttribution") &&
      exQuote.getMessage.contains("subsetDocs"))
    val exNgram = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairs(docs, maxSpillBytes = 1024L)
    }
    assert(exNgram.getMessage.contains("ngramJaccardPairs") &&
      exNgram.getMessage.contains("minhashLshPairs"))
    val exLrs = intercept[IllegalStateException] {
      Queries.dedupLrsLadder(spark, dir, maxSpillBytes = 1024L)
    }
    assert(exLrs.getMessage.contains("dedup_lrs_ladder") &&
      exLrs.getMessage.contains("subsetDocs"))
    // under the auto budget all four still produce their results
    assert(TextOps.noveltySignals(docs).count() > 0)
    assert(Queries.dedupLrsLadder(spark, dir).count() == 4)
  }

  test("spill guard default (-1) audits against measured scratch dirs (r10 ADVICE)") {
    // the gate used to read `maxSpillBytes >= 0`, which silently DISABLED
    // the default auto-audit (-1) and ran it for the documented-disabled 0.
    // Prove -1 measures: a corpus claiming 2^50 chars/doc (n_chars is the
    // guard's column-pruned estimate source) must exceed any real scratch
    // disk and refuse up front under the DEFAULT argument...
    val huge = docs.withColumn("n_chars", lit(1L << 50))
    val ex = intercept[IllegalStateException] {
      Dedup.jaccardPrefixPairs(huge)
    }
    assert(ex.getMessage.contains("refusing up front") &&
      ex.getMessage.contains("scratch"), ex.getMessage)
    // ...while 0 means deliberately disabled: the same absurd claim goes
    // un-audited and the operator computes on the (actually small) text
    assert(Dedup.jaccardPrefixPairs(huge, maxSpillBytes = 0L).count() > 0)
  }

  test("connected components never mutate the session shuffle-partition conf") {
    import spark.implicits._
    // the loop used to shrink spark.sql.shuffle.partitions session-wide and
    // restore it in a finally — a concurrent query on the same session
    // silently inherited the shrunken count. Sample the conf from another
    // thread for the whole run: every observation must equal the session
    // setting (the sizing now happens via explicit repartition on the loop
    // frames only).
    val expected = spark.conf.get("spark.sql.shuffle.partitions")
    @volatile var sampling = true
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val sampler = new Thread(() => {
      while (sampling) {
        if (spark.conf.get("spark.sql.shuffle.partitions") != expected)
          violations.incrementAndGet()
        Thread.sleep(1)
      }
    })
    sampler.start()
    try {
      val edges = (0L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      // cap=0: the sampler watches the DISTRIBUTED loop's conf behavior —
      // the driver fast path runs no loop at all
      val got = Dedup.connectedComponents(edges, driverEdgeCap = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got.size == 31 && got.values.forall(_ == 0L))
    } finally { sampling = false; sampler.join() }
    assert(violations.get() == 0,
      s"session conf observed mutated ${violations.get()} times during the CC loop")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == expected)
  }

  test("connected components: reliable-checkpoint mode yields identical labels") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }.toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    try {
      val reliable = Dedup.connectedComponents(edges,
          checkpointDir = Some(ckptDir.toString))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliable == local, "checkpoint modes must agree")
    } finally rmTree(ckptDir)
  }

  test("simhash pairs == exact all-pairs at hamming<=3 (pigeonhole recall)") {
    val p1 = Dedup.simhashPairs(docs).collect()
    assert(p1.forall(_.getInt(2) <= 3))
    val p2 = Dedup.simhashPairs(docs).collect()
    assert(p1.map(_.toString).toSeq == p2.map(_.toString).toSeq)
    // exact ground truth: brute-force hamming over full signatures
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb"))
    val exact = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = p1.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"banded=${lsh.size} exact=${exact.size}")
  }

  test("quadratic-contract guards: over-cap simhash bucket and skewed block load fail loudly") {
    import spark.implicits._
    // ---- simhashPairs: a template corpus whose identical signatures pile
    // every doc onto one bucket per band — past maxBucket the old behavior
    // silently DROPPED the bucket (and the banded == all-pairs claim);
    // the guard must refuse instead
    val template = (1L to 6L)
      .map(i => (i, "identical template text alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalStateException] {
      Dedup.simhashPairs(template, maxBucket = 4)
    }
    assert(e1.getMessage.contains("simhashPairsBlocked"),
      "guard message must name the scale sibling")
    // explicit opt-out keeps the documented valve semantics (pairs lost)
    val dropped = Dedup.simhashPairs(template, maxBucket = 4,
      failOnOverCap = false).collect()
    assert(dropped.isEmpty, "over-cap buckets are dropped under the opt-out")
    // and the natural corpus stays under the cap — default call unchanged
    assert(Dedup.simhashPairs(docs).collect().nonEmpty)

    // ---- block-load guard: a fixed block column with every vector in ONE
    // block is the Θ(N²) shape; a tight budget must trip it, naming the
    // bucketed sibling, and the natural corpus must clear the default
    val e2 = intercept[IllegalStateException] {
      Similarity.semDedupPrune(embeddings.withColumn("label", lit("all")),
        maxCompPerRow = 8L)
    }
    assert(e2.getMessage.contains("semDedupPruneBucketed"))
    val e3 = intercept[IllegalStateException] {
      Similarity.knnGraphBlocked(embeddings.withColumn("label", lit("all")),
        maxCompPerRow = 8L)
    }
    assert(e3.getMessage.contains("knnGraphBucketed"))
    assert(Similarity.semDedupPrune(embeddings).collect().nonEmpty)
  }

  test("multi-table (Manku) simhash == banded == all-pairs, incl. planted h<=3 flips") {
    // planted positives: exact copies of 5 docs with 1..3 bit-positions'
    // worth of appended tokens removed — guaranteed-by-construction pairs
    // are NOT relied on (token edits move several signature bits); instead
    // plant at the signature level by checking blocked == banded on the
    // natural corpus, whose near-dup set is known non-trivial (stream test
    // asserts nonEmpty), and then brute-force-audit the blocked output.
    val banded = Dedup.simhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = Dedup.simhashPairsBlocked(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded.nonEmpty, "corpus must contain simhash near-dups")
    assert(blocked == banded,
      s"blocked=${blocked.size} banded=${banded.size} (both must equal all-pairs)")
    // synthetic adversarial flips: for one real signature, flipping any 3
    // bits must still be caught by some clean block-triple table
    val sig0 = docs.select(Dedup.simhash64(col("text"))).first().getLong(0)
    val spark2 = docs.sparkSession
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val flipped = (1L to 40L).map { i =>
      val k = 1 + rnd.nextInt(3)
      val s = (1 to k).foldLeft(sig0)((s, _) => s ^ (1L << rnd.nextInt(64)))
      (i + 1000000L, s)
    } :+ (1000000L, sig0)
    val sigDf = flipped.toDF("doc_id", "sig")
    // feed pre-built signatures through the PRODUCTION probe machinery
    // (simhashPairsFromSigs is the same code simhashPairsBlocked runs —
    // a layout regression cannot hide behind a test-local re-implementation)
    val got = Dedup.simhashPairsFromSigs(sigDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val aS = sigDf.select(col("doc_id").as("da"), col("sig").as("sa"))
    val bS = sigDf.select(col("doc_id").as("db"), col("sig").as("sb"))
    val exactF = aS.crossJoin(bS).where(col("da") < col("db"))
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactF,
      s"flip audit: got=${got.size} exact=${exactF.size} — a <=3-bit flip escaped every table")
  }

  test("bucketed semdedup: decision table is total, witnesses valid, blocks bounded") {
    val out = Similarity.semDedupPruneBucketed(embeddings, threshold = 0.3)
      .collect()
    assert(out.length == embeddings.count(), "one decision row per vector")
    // witness validity: dropped rows name a lower-id witness; kept rows none
    out.foreach { r =>
      val kept = r.getBoolean(2)
      if (kept) assert(r.isNullAt(3), s"kept row with witness: $r")
      else {
        assert(r.getLong(3) < r.getLong(0), s"witness not lower-id: $r")
        assert(r.getDouble(4) >= 0.3, s"witness below threshold: $r")
      }
    }
    // the size bound the blocking exists for: expected ~targetBlock, assert
    // a generous multiple (skew tolerance) — the label-blocked variant's
    // blocks grow ~N/10 and fail this at any testdata size >= sf0.01
    val maxBlock = out.groupBy(_.getLong(1)).map(_._2.length).max
    assert(maxBlock <= 8 * 160, s"block size $maxBlock breaches the SRP bound")
  }

  test("embedding LSH finds exactly the brute-force cosine pairs (planted near-dups)") {
    // the natural corpus has no pairs above 0.9 (max pairwise cosine ~0.5),
    // so plant scaled copies: same direction => cosine ~1, guaranteed band
    // collisions, while the 0.9 threshold keeps every natural pair out
    val base = embeddings.select(col("vec_id"), col("embedding"))
    val planted = base.where(col("vec_id") < 10)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.01f)).cast("float")).as("embedding"))
    val all = base.unionByName(planted)

    val e = all.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    val exact = a.crossJoin(b)
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .where(col("cosine") >= 0.9)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Dedup.embeddingCosinePairs(all, threshold = 0.9)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.size >= 10, "planted near-duplicates must be in the ground truth")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
    assert(lsh.subsetOf(exact), s"LSH emitted sub-threshold pairs ${lsh -- exact}")

    val again = Dedup.embeddingCosinePairs(all, threshold = 0.9)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == lsh, "LSH must be deterministic (no runtime RNG)")
  }

  test("IVF top-k scores are a subset of brute-force top-k x 3 (bounded recall loss)") {
    val brute = Similarity.bruteForceTopK(embeddings, 0L, 30)
      .collect().map(r => r.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(embeddings, 0L, 10)
      .collect().map(r => r.getLong(0))
    assert(ivf.length == 10)
    // every IVF hit must be a genuinely high-scoring vector
    assert(ivf.count(brute.contains) >= 8, s"IVF drifted: $ivf")
  }

  test("brute-force top-k is sorted descending and excludes the query") {
    val rows = Similarity.bruteForceTopK(embeddings, 0L, 10).collect()
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(!rows.map(_.getLong(0)).contains(0L))
  }

  test("streaming queries never mutate the caller session's shuffle partitions") {
    // the streaming harness runs at 8 shuffle partitions — on a CHILD
    // session; the caller's conf must be untouched for the whole run
    // (the previous set/restore-in-finally leaked 8 to concurrent queries)
    val expected = spark.conf.get("spark.sql.shuffle.partitions")
    @volatile var sampling = true
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val sampler = new Thread(() => {
      while (sampling) {
        if (spark.conf.get("spark.sql.shuffle.partitions") != expected)
          violations.incrementAndGet()
        Thread.sleep(1)
      }
    })
    sampler.start()
    try {
      val out = graft.streaming.StreamingOps.streamStratifiedSample(spark, dir)
      assert(out.count() > 0)
    } finally { sampling = false; sampler.join() }
    assert(violations.get() == 0,
      s"caller conf mutated ${violations.get()} times during the streaming run")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == expected)
  }

  test("streaming windowed counts equal the batch equivalent") {
    val streamed = graft.streaming.StreamingOps.windowedEventCounts(spark, dir)
      .collect().map(_.toString).sorted
    val batch = graft.streaming.StreamingOps.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("day", "event_type")
      .collect().map(_.toString).sorted
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stateful streaming sessionization equals the batch/SQL formulation") {
    // sum_value included: the stream's fixed-point session sums must be
    // BIT-equal to the batch decimal-string route (the shared-oracle claim)
    val stream = graft.streaming.StreamingOps.sessionizeStream(spark, dir)
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect().map(_.toString).sorted
    val batch = graft.streaming.StreamingOps.sessionizeBatch(spark, dir)
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect().map(_.toString).sorted
    assert(stream.length > 0)
    assert(stream.toSeq == batch.toSeq)
  }

  test("incremental streaming disagg upsert equals the batch many-series rerun") {
    import spark.implicits._
    val low = (1L to 5L).flatMap(sid => (1995 to 2001).map(y =>
      (sid, java.time.LocalDateTime.of(y, 1, 1, 0, 0),
        100.0 * sid + (y - 1995) * 7.0)))
      .toDF("series_id", "ts", "value")
      .select(col("series_id"), col("ts").cast("timestamp_ntz").as("ts"), col("value"))
    val params = graft.disagg.Disaggregate.Params(
      method = "denton-cholette", aggFunc = "sum", targetFreq = Some("QS"))
    val streamed = graft.streaming.StreamingOps.incrementalDisagg(low, params)
      .collect().map(_.toString).sorted
    val batch = graft.disagg.Disaggregate.manySeries(low, None, params = params)
      .orderBy(col("series_id"), col("ts"))
      .collect().map(_.toString).sorted
    assert(streamed.length == 5 * 7 * 4)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming ivfpq upsert == batch encode+search with the frozen base-trained model") {
    // frozen-model contract: train on the base ¾, encode the FULL corpus
    // in one batch pass — the streamed index (base build + 2 upsert
    // micro-batches through dynamic-partition-overwrite) must land on the
    // identical code table, so the ADC top-10 must match bit-for-bit
    val emb = embeddings
    val model = Similarity.ivfPqTrain(emb.where(col("vec_id") % 4 =!= 3))
    val batch = Similarity.ivfPqSearch(model, Similarity.ivfPqEncode(model, emb), emb)
      .collect()
    val streamed = graft.streaming.StreamingOps.streamIvfPqUpsert(spark, dir)
      .collect()
    assert(batch.length == 10 && streamed.length == 10)
    assert(streamed.toSeq == batch.toSeq,
      s"streamed ${streamed.mkString(";")} != batch ${batch.mkString(";")}")
    // the upsert actually contributed: at least one probed candidate set
    // member should come from the streamed quarter across the full coded
    // surface (not necessarily the top-10, so check the index contents via
    // a second search with a larger k)
    val wide = Similarity.ivfPqSearch(model, Similarity.ivfPqEncode(model, emb),
      emb, topK = 100)
    assert(wide.where(col("vec_id") % 4 === 3).count() > 0,
      "no upserted vector is reachable by the probe — split or probe broken")
  }

  test("streaming incremental CC: cross-batch merge lands on the batch labels") {
    import spark.implicits._
    // b1 establishes two components {1,2,3} and {10,11}; b2 extends the
    // second ({11,12}); b3 merges BOTH established components through a
    // FRESH bridge doc 7 — the hardest path: contraction must route the
    // bridge edges onto the two old representatives and the relabel must
    // rewrite every member of the losing component
    val pairs = Seq(
      (1, 1L, 2L), (1, 2L, 3L), (1, 10L, 11L),
      (2, 11L, 12L),
      (3, 3L, 7L), (3, 7L, 10L)
    ).toDF("b", "doc_a", "doc_b")
    val streamed = graft.streaming.StreamingOps.streamDedupClustersOf(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.connectedComponents(
        pairs.select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"streamed $streamed != batch $batch")
    assert(streamed.size == 7 && streamed.forall(_._2 == 1L),
      s"merge did not converge to the global min: $streamed")
  }

  test("stream_dedup_clusters == batch dedup labels on the corpus pair set") {
    val batch = Dedup.connectedComponents(
        Dedup.minhashLshPairs(docs, bands = 32))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = graft.streaming.StreamingOps.streamDedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty && streamed == batch,
      s"streamed labels diverge from batch CC (${streamed.size} vs ${batch.size})")
  }

  test("a session spanning micro-batches is not split (event-time-timeout state)") {
    import spark.implicits._
    // user 1: events at 0/10/20/30 min, all within the 30-min gap => ONE
    // session. The harness splits the stream at the median timestamp, so
    // events 0,10 arrive in batch 1 and 20,30 in batch 2 — state must carry
    // the open session across the boundary.
    val t0 = 1700000000000000L // epoch micros
    val min = 60L * 1000000L
    val ev = Seq(
      (1L, t0, 1.0), (1L, t0 + 10 * min, 1.0),
      (1L, t0 + 20 * min, 1.0), (1L, t0 + 30 * min, 1.0))
      .toDF("user_id", "ts_us", "value")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("value"))
    val out = graft.streaming.StreamingOps.sessionizeStreamOf(ev).collect()
    assert(out.length == 1, s"session was split: ${out.mkString(";")}")
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getLong(1) == t0 && out(0).getLong(2) == t0 + 30 * min)
    assert(out(0).getLong(3) == 4L)
  }

  test("rolling fingerprint is order-sensitive, token-hash is not") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = df.select(TextOps.rollingFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
    val sh = df.select(Dedup.shingles(col("text"), 1).as("sh"))
      .select(array_sort(col("sh"))).collect().map(_.getSeq[String](0))
    assert(sh(0) == sh(1))
  }

  test("multimodal features: byte stats of ascii payloads match char counts") {
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(media, parallelism = 4)
    val joined = feats.join(docs, "doc_id")
      .where(col("n_bytes") =!= length(col("text")))
      .count()
    assert(joined == 0, "ascii text: n_bytes must equal n_chars")
    assert(feats.count() == docs.count())
  }

  test("native NgramShingles equals the declarative HOF formulation") {
    val native = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val hof = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("toks")).as("sh"))
    val joined = native.as("a").join(hof.as("b"), "doc_id")
      .where(col("a.sh") =!= col("b.sh"))
    assert(joined.count() == 0, "native shingles diverge from HOF semantics")
  }

  test("k-means centroids: deterministic, k buckets, assignment is argmax-cosine") {
    val c1 = Similarity.trainCentroids(embeddings, 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val c2 = Similarity.trainCentroids(embeddings, 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(c1.length == 8 && c1.toSeq == c2.toSeq, "training must be deterministic")
    // every vector sits in the bucket of its max-cosine centroid
    val assigned = Similarity.assignBuckets(embeddings, 8)
    val cents = Similarity.trainCentroids(embeddings, 8)
      .select(col("bucket").as("cb"), col("cv"))
    val mismatches = assigned.crossJoin(cents)
      .withColumn("sim", Similarity.cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"), col("bucket"))
      .agg(max_by(col("cb"), struct(col("sim"), -col("cb"))).as("best"))
      .where(col("bucket") =!= col("best"))
      .count()
    assert(mismatches == 0)
  }

  test("IVF buckets as a partition column prune the scan (the at-scale layout)") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_buckets").toString
    ops.Similarity.assignBuckets(embeddings, 8)
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val reread = spark.read.parquet(tmp).where(col("bucket").isin(1, 3))
    val plan = reread.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("bucket#") || plan.contains("bucket IN")),
      s"expected partition pruning in:\n${plan.take(800)}")
    val full = spark.read.parquet(tmp).count()
    val pruned = reread.count()
    assert(pruned < full && pruned > 0)
  }

  test("ORC source round-trips the documents table") {
    // source breadth: same pipeline over an ORC copy of the corpus — the
    // columnar alternatives (parquet/ORC) and the row formats (JSON/CSV)
    // all feed the identical operator surface
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
    try {
      docs.select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").orc(tmp.toString)
      val back = spark.read.orc(tmp.toString)
      assert(back.count() == docs.count())
      val viaOrc = TextOps.tfidfTopK(back).collect().map(_.toString)
      val viaParquet = TextOps.tfidfTopK(
        docs.select("doc_id", "text", "lang", "source", "n_chars"))
        .collect().map(_.toString)
      assert(viaOrc.toSeq == viaParquet.toSeq)
    } finally rmTree(tmp)
  }

  test("JSON source round-trips the documents table") {
    // source breadth: the same pipeline runs when the corpus arrives as
    // JSON lines instead of parquet
    val tmp = java.nio.file.Files.createTempDirectory("graft_json")
    try {
      docs.select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").json(tmp.toString)
      val back = spark.read.json(tmp.toString)
      assert(back.count() == docs.count())
      val viaJson = TextOps.saltedTokenFrequencies(back).collect().map(_.toString)
      val viaParquet = TextOps.saltedTokenFrequencies(docs).collect().map(_.toString)
      assert(viaJson.toSeq == viaParquet.toSeq)
    } finally rmTree(tmp)
  }

  test("filters and projection reach the parquet scan (pushdown + pruning)") {
    val plan = SparkEntry.queries("a1_scan_project_filter")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(l_quantity"),
      s"predicate not pushed:\n${plan.take(900)}")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"projection not pruned: $readSchema")
  }

  test("bucketed tables join without a shuffle (co-located join layout)") {
    // the 100 TB recipe for repeated equi-joins: bucket both sides on the
    // join key at write time; the sort-merge join then reads co-located
    // buckets with NO Exchange on either side
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_bucketed")
        .saveAsTable("orders_bucketed")
      val a = spark.table("orders_bucketed").select(col("o_orderkey"), col("o_totalprice"))
      val b = spark.table("orders_bucketed").select(col("o_orderkey"), col("o_orderdate"))
      val joined = a.join(b, "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed self-join must not shuffle:\n${plan.take(1200)}")
      assert(joined.count() == orders.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      rmTree(java.nio.file.Paths.get(wh))
    }
  }

  test("streamed simhash dedup equals the batch pairs exactly (chunked arrival)") {
    val streamed = graft.streaming.StreamingOps.streamDedupSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = Dedup.simhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch.nonEmpty, "corpus must contain simhash near-dups")
    assert(streamed == batch,
      s"stream-batch divergence: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
  }

  test("streaming ingest pipeline equals the batch filter->dedup->sample") {
    val streamed = graft.streaming.StreamingOps.streamPipelineIngest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
    val union = base.unionAll(base.where(pmod(col("doc_id"), lit(50)) === 0)
      .select((-col("doc_id") - 1).as("doc_id"), col("lang"), col("text")))
    val toks = split(trim(col("text")), "\\s+")
    val kept = union
      .withColumn("n_tokens", size(toks))
      .withColumn("nonalpha_ratio",
        length(regexp_replace(col("text"), "[a-z ]", "")).cast("double") /
          length(col("text")))
      .where(col("n_tokens") >= 5 && col("nonalpha_ratio") < 0.3)
      .select(md5(lower(trim(col("text")))).as("fp"), col("doc_id"), col("lang"))
    val canon = kept.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), min_by(col("lang"), col("doc_id")).as("lang"))
    val ticket = pmod(graft.functions.HashOps.md5Low64(
      concat(lit("strat:"), col("doc_id").cast("string"))), lit(10000L)).cast("int")
    val threshold = when(col("lang") === "fr", 8000)
      .when(col("lang") === "es", 6000)
      .when(col("lang") === "en", 3500).otherwise(10000)
    val batch = canon.where(ticket < threshold)
      .select(col("doc_id"), col("lang"), col("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(batch.nonEmpty && streamed == batch,
      s"ingest divergence: only-stream=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    // non-vacuous: the stateful dedup must have SELECTED canonicals (the
    // planted negative-id copies win the min rule and appear in the
    // output), and the sampler must drop some canonical docs
    assert(streamed.exists(_._1 < 0),
      "planted duplicate canonicals missing: dedup stage not exercised")
    assert(kept.count() > canon.count(), "planted dups must pass the filter")
    assert(batch.size < canon.count(), "sampler must drop some canonical docs")
  }

  test("pii scrub redacts emails/ips/phones with exact counts, idempotently") {
    import spark.implicits._
    val df = Seq(
      (1L, "write bob.smith+x@mail.example.org or see 10.1.2.3 call +4915551234567"),
      (2L, "no pii here, just 1.2 numbers and an at sign @ alone"),
      (3L, "two mails a@b.co c@d.io and ips 1.2.3.4 255.255.255.255")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +:
        TextOps.piiScrub(col("text")).as("scrubbed") +:
        TextOps.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == (("write <EMAIL> or see <IP> call <PHONE>", 1, 1, 1)))
    assert(out(2L)._1 == "no pii here, just 1.2 numbers and an at sign @ alone")
    assert((out(2L)._2, out(2L)._3, out(2L)._4) == ((0, 0, 0)))
    assert(out(3L) == (("two mails <EMAIL> <EMAIL> and ips <IP> <IP>", 2, 2, 0)))
    // idempotent: the tags never re-match any pattern
    val twice = df.select(TextOps.piiScrub(TextOps.piiScrub(col("text"))).as("s"))
      .collect().map(_.getString(0)).toSet
    assert(twice == out.values.map(_._1).toSet)
  }

  test("mixture weights: max rate is 1, rates downsample toward the target shares") {
    val targets = Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
      "fr" -> 0.15, "zh" -> 0.15)
    val rows = graft.ops.PipelineOps.mixtureWeights(docs, targets).collect()
    assert(rows.length >= 2)
    val rates = rows.map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(math.abs(rates.values.max - 1.0) < 1e-12, s"max rate: $rates")
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
    rows.foreach { r =>
      val (tokens, natural, target, rate, expected) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(math.abs(expected - tokens * rate) < 1e-9)
      assert(natural > 0 && target > 0)
    }
    // post-sampling shares must be proportional to the targets:
    // expected_l / target_l is constant across languages
    val keyed = rows.map(r => r.getDouble(6) / r.getDouble(4))
    assert(keyed.forall(v => math.abs(v - keyed.head) / keyed.head < 1e-12),
      s"resampled mixture not proportional to targets: ${keyed.toSeq}")
  }

  test("misra-gries: heavy hitter survives, estimates within n/(k+1), merge-order-safe") {
    val k = 8
    val mg = new graft.ops.MisraGries(k)
    // skewed stream: "hot" 300x, "warm" 120x, 600 singletons; n = 1020
    val stream = Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 600).map(i => s"t$i")
    val n = stream.size
    val bound = n.toDouble / (k + 1) // ~113
    // two adversarial merge orders must both satisfy the MG bounds
    val orders = Seq(stream, scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(stream))
    orders.foreach { st =>
      val parts = st.grouped(97).toSeq // uneven partitions
      val sketch = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      assert(sketch.size <= k)
      assert(sketch.contains("hot"), "count 300 > n/(k+1) must survive")
      assert(sketch.contains("warm"), "count 120 > n/(k+1) must survive")
      Seq("hot" -> 300L, "warm" -> 120L).foreach { case (t, c) =>
        val e = sketch(t)
        assert(e <= c && c - e <= bound, s"$t est $e vs true $c bound $bound")
      }
    }
  }

  test("corpus minhash-union sketch: diagonal ~1, symmetric bounds, mergeable") {
    val sim = ops.Sketches.corpusSimilarity(docs).collect()
    val self = sim.filter(r => r.getString(0) == r.getString(1))
    assert(self.nonEmpty && self.forall(_.getDouble(2) == 1.0),
      "a corpus is identical to itself")
    assert(sim.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // shared synthetic vocabulary -> cross-language corpora overlap heavily
    val cross = sim.filter(r => r.getString(0) != r.getString(1))
    assert(cross.nonEmpty && cross.forall(_.getDouble(2) > 0.0))
  }

  test("lang-id emits only profile languages and is stable") {
    val preds = docs.select(TextOps.langId(col("text")).as("l"))
      .groupBy("l").count().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(TextOps.langProfiles.map(_._1).toSet))
  }

  test("rolling fingerprint composes: h(a++b) == (h(a)*31^|b| + h(b)) mod M") {
    import graft.functions.RollingPolyHash.M
    def modpow(b: Long, e: Long, m: Long): Long = {
      var r = java.math.BigInteger.ONE
      val bb = java.math.BigInteger.valueOf(b); val mm = java.math.BigInteger.valueOf(m)
      r = bb.modPow(java.math.BigInteger.valueOf(e), mm)
      r.longValueExact()
    }
    val pairs = Seq(("hello ", "world"), ("", "abc"), ("x", ""),
      ("the quick brown fox ", "jumps over the lazy dog"))
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      graft.functions.HashOps.rollingPolyHash(col("a")).as("ha"),
      graft.functions.HashOps.rollingPolyHash(col("b")).as("hb"),
      graft.functions.HashOps.rollingPolyHash(concat(col("a"), col("b"))).as("hab"),
      length(col("b")).as("lb")).collect()
    rows.foreach { r =>
      val (ha, hb, hab, lb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      val expect = java.math.BigInteger.valueOf(ha)
        .multiply(java.math.BigInteger.valueOf(modpow(31L, lb.toLong, M)))
        .add(java.math.BigInteger.valueOf(hb))
        .mod(java.math.BigInteger.valueOf(M)).longValueExact()
      assert(hab == expect, s"composition broken for ${r}")
    }
  }

  test("native lang-id features equal the declarative score formulation") {
    val n = TextOps.langProfiles.length
    val feat = TextOps.langIdFeatures(col("text"))
    val declScores = TextOps.langIdScores(col("text"))
    val both = docs.select(
      (col("doc_id") +: feat.getField("lang_pred").as("pred") +:
        ((0 until n).map(i =>
          element_at(feat.getField("scores"), i + 1).as(s"nat_$i")) ++
          declScores.zipWithIndex.map { case ((_, c), i) =>
            c.cast("double").as(s"dec_$i") })): _*)
      .collect()
    both.foreach { r =>
      val nat = (0 until n).map(i => r.getDouble(r.fieldIndex(s"nat_$i")))
      val dec = (0 until n).map(i => r.getDouble(r.fieldIndex(s"dec_$i")))
      assert(nat == dec, s"scores diverge for doc ${r.getLong(0)}")
      // argmax with first-wins tie-break
      val best = nat.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2
      assert(r.getString(1) == TextOps.langProfiles(best)._1)
    }
  }

  test("decontamination flags exactly the docs sharing an 8-gram with the eval split") {
    import spark.implicits._
    import graft.ops.PipelineOps
    // find ids landing in the eval (>=95) and train (<95) buckets under the
    // REAL hash — planting text, not planting buckets
    val buckets = spark.range(0, 300)
      .select(col("id"),
        pmod(graft.functions.HashOps.md5Low64(col("id").cast("string")), lit(100L))
          .as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalId = buckets.collectFirst { case (id, b) if b >= 95 => id }.get
    val trainIds = buckets.collect { case (id, b) if b < 95 => id }.take(2).toSeq
    val evalText = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val dirty = s"prefix tokens then w2 w3 w4 w5 w6 w7 w8 w9 trailing" // 8-gram hit
    val clean = "totally different content with no overlapping eight gram run here"
    val docs = Seq(
      (evalId, evalText), (trainIds.head, dirty), (trainIds(1), clean))
      .toDF("doc_id", "text")
    val got = PipelineOps.decontaminate(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got.keySet == trainIds.toSet, "eval doc must not appear in output")
    assert(got(trainIds.head)._1 == 1L && got(trainIds.head)._2,
      s"planted 8-gram not flagged: $got")
    assert(got(trainIds(1))._1 == 0L && !got(trainIds(1))._2)
  }

  test("repetition signals: known dup fractions on degenerate and clean docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),              // 4 tokens, 1 distinct
      (2L, "w x y z"),              // no repetition at any n
      (3L, "spam ham spam ham spam")) // alternating: bigrams repeat
      .toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getInt(1) == 4 && d1.getInt(2) == 1)
    assert(d1.getDouble(5) == 3.0 / 4 && d1.getDouble(6) == 2.0 / 3 &&
      d1.getDouble(7) == 1.0 / 2)
    val d2 = got(2L)
    assert(d2.getDouble(5) == 0.0 && d2.getDouble(6) == 0.0 && d2.getDouble(7) == 0.0)
    val d3 = got(3L) // 5 toks: bigrams {spam ham, ham spam}x2 -> dup 2/4
    assert(d3.getInt(3) == 2 && d3.getDouble(6) == 2.0 / 4)
  }

  test("packing: greedy concat-and-chunk pack ids and straddle flags, per lang") {
    import spark.implicits._
    import graft.ops.PipelineOps
    // en: 3,3,2 tokens at budget 4 -> packs 0, 0(straddle), 1; fr independent
    val docs = Seq(
      (1L, "en", "t1 t2 t3"), (2L, "en", "t1 t2 t3"), (3L, "en", "t1 t2"),
      (4L, "fr", "a b c d e")) // fr starts its own stream at pack 0
      .toDF("doc_id", "lang", "text")
    val got = PipelineOps.packTokenBudget(docs, budget = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(1L) == ((0L, 0L, false)))
    assert(got(2L) == ((3L, 0L, true)), "doc 2 spans the pack-0/1 boundary")
    assert(got(3L) == ((6L, 1L, false)))
    assert(got(4L) == ((0L, 0L, true)), "5 tokens at budget 4 straddles")
  }

  test("substring windows: planted 32-char boilerplate found; offset shifts are invisible") {
    import spark.implicits._
    val boiler = "this exact boilerplate string is shared verbatim" // 49 chars
    val docs = Seq(
      (1L, s"$boiler plus unique tail one"),
      (2L, s"$boiler plus other material here"),
      // same boilerplate at a NON-stride-aligned offset: windowed hashing
      // (unlike a suffix array) only sees stride-aligned duplicates — the
      // documented approximation
      (3L, s"xy $boiler completely different ending"),
      (4L, "no shared content in this document at all, long enough to window"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDuplicateWindows(docs).collect()
    assert(got.nonEmpty, "aligned planted boilerplate must be detected")
    got.foreach { r =>
      assert(r.getLong(1) >= 2L)
      val (lo, hi) = (r.getLong(3), r.getLong(4))
      assert(Set(lo, hi).subsetOf(Set(1L, 2L)),
        s"only the aligned pair shares windows, got docs $lo..$hi")
    }
    // doc pair (1,2) shares windows at offsets 0 and 16 inside the 49-char
    // prefix -> exactly 2 duplicate windows
    assert(got.length == 2, s"expected 2 shared windows, got ${got.length}")
  }

  test("blocked knn graph: per-node degree, rank contiguity, nonincreasing cosine") {
    val k = 3
    val got = Similarity.knnGraphBlocked(embeddings, k = k).collect()
    val blockSizes = embeddings.groupBy(col("label")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val byVec = got.groupBy(_.getLong(0))
    assert(byVec.size == embeddings.count(), "every vector needs neighbors")
    byVec.foreach { case (vec, rows) =>
      val block = rows.head.getInt(1)
      val expected = math.min(k.toLong, blockSizes(block) - 1)
      assert(rows.length == expected, s"vec $vec degree ${rows.length} != $expected")
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length),
        s"vec $vec ranks not contiguous")
      val cosines = rows.sortBy(_.getInt(2)).map(_.getDouble(4))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y },
        s"vec $vec cosines not nonincreasing")
      assert(rows.forall(r => !r.isNullAt(3) && r.getLong(3) != vec),
        s"vec $vec lists itself")
    }
  }

  test("bucketed knn graph: degenerates to blocked at B=0, buckets bound blocks adaptively") {
    // targetBlock >= corpus: the integer loop picks b=0, the SRP refinement
    // is a no-op, and the result must equal the exact within-label graph
    // (modulo the extra bucket column, which must be all-zero)
    val n = embeddings.count()
    val atB0 = Similarity.knnGraphBucketed(embeddings,
      k = 3, targetBlock = (n + 1).toInt).collect()
    assert(atB0.forall(_.getInt(2) == 0), "b=0 must put every vector in bucket 0")
    val exact = Similarity.knnGraphBlocked(embeddings, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    val b0 = atB0
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3), r.getLong(4), r.getDouble(5)))
    assert(b0.toSeq == exact.toSeq, "b=0 bucketed graph must equal the exact blocked graph")
    // default targetBlock: bucket width derives from the corpus count via
    // the shared integer loop; every edge joins within (label, bucket) and
    // bucket ids stay under 2^b
    var b = 0
    while (b < 16 && 160L * (1L << b) < n) b += 1
    val got = Similarity.knnGraphBucketed(embeddings, k = 3).collect()
    assert(got.forall(r => r.getInt(2) >= 0 && r.getInt(2) < (1 << b)),
      s"bucket ids must be in [0, 2^$b)")
    assert(got.forall(r => r.getLong(4) != r.getLong(0)), "no self edges")
    // refined blocks only shrink candidate sets: every bucketed cosine at
    // rank 1 is <= the exact blocked rank-1 cosine for the same vector
    val exactTop = exact.filter(_._3 == 1).map(t => t._1 -> t._5).toMap
    got.filter(_.getInt(3) == 1).foreach { r =>
      assert(r.getDouble(5) <= exactTop(r.getLong(0)) + 1e-12,
        s"vec ${r.getLong(0)}: bucketed top-1 beats exact top-1")
    }
  }

  test("stratified sample: kept == ticket under threshold, stable under repartition") {
    import graft.ops.PipelineOps
    val rates = Map("en" -> 0.35, "es" -> 0.6, "fr" -> 0.8)
    val out = PipelineOps.stratifiedSample(docs, rates).collect()
    out.foreach { r =>
      val expected = rates.getOrElse(r.getString(1), 1.0)
      assert(r.getInt(3) == (expected * 10000).toInt, s"threshold for ${r.getString(1)}")
      assert(r.getBoolean(4) == (r.getInt(2) < r.getInt(3)))
    }
    val again = PipelineOps.stratifiedSample(docs.repartition(7), rates).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "assignment must be partitioning-independent")
  }

  test("streamed stratified sample emits exactly the batch rows") {
    val streamed = graft.streaming.StreamingOps.streamStratifiedSample(spark, dir)
      .collect().map(_.toString)
    val batch = graft.ops.PipelineOps.stratifiedSample(
      spark.read.parquet(s"$dir/documents.parquet"),
      rates = Map("en" -> 0.35, "es" -> 0.6, "fr" -> 0.8))
      .select("doc_id", "lang", "ticket", "threshold", "kept")
      .collect().map(_.toString)
    assert(streamed.toSeq == batch.toSeq,
      "hash-deterministic sampling must be stream/batch/replay invariant")
  }

  test("count-min sketch is merge-order independent and one-sided over EVERY token") {
    import graft.ops.{CountMin, Sketches}
    val toks = docs.select(explode(Dedup.tokens(col("text"))).as("token"))
    val s = spark
    import s.implicits._
    val sk1 = toks.as[String].select(CountMin.toColumn).head()
    val sk2 = toks.repartition(7).as[String].select(CountMin.toColumn).head()
    val sk3 = toks.coalesce(1).as[String].select(CountMin.toColumn).head()
    assert(sk1.toSeq == sk2.toSeq && sk1.toSeq == sk3.toSeq,
      "additive counters must be identical under any partitioning")
    // one-sided guarantee on the FULL vocabulary, not just the audited top-10
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (t, cnt) =>
      val est = (0 until CountMin.d)
        .map(j => sk1(j * CountMin.w + CountMin.cell(t, j))).min
      assert(est >= cnt, s"CM undercounted '$t': $est < $cnt")
    }
    // the sketch must be genuinely lossy at this sizing (w < vocabulary):
    // at least one token overcounts, or the audit demonstrates nothing
    val lossy = exact.exists { case (t, cnt) =>
      (0 until CountMin.d).map(j => sk1(j * CountMin.w + CountMin.cell(t, j))).min > cnt
    }
    assert(lossy, "w is so wide the sketch degenerated into an exact counter")
  }

  test("int8 quantization: reconstruction bound holds, values stay in [-127,127]") {
    val out = Similarity.quantizeInt8(embeddings).collect()
    assert(out.length == embeddings.count())
    out.foreach { r =>
      assert(r.getBoolean(7), s"reconstruction bound violated for vec ${r.getLong(0)}")
      assert(r.getDouble(5) <= r.getDouble(2) / 2 + 1e-15)
    }
    // q_l1 <= 127 * dims pins the value range without materializing q
    out.foreach(r => assert(r.getLong(4) <= 127L * r.getInt(1)))
    val again = Similarity.quantizeInt8(embeddings.repartition(7))
      .collect().map(_.toString).sorted
    assert(again.toSeq == out.map(_.toString).sorted.toSeq,
      "quantization must be partitioning-independent")
  }

  test("kmv distinct sketch: order-independent, sorted-distinct buffer, sane estimates") {
    import graft.ops.{KMinValues, Sketches}
    val s = spark
    import s.implicits._
    val sh = docs.select(col("lang"), explode(Dedup.shingles(col("text"), 3)).as("s"))
      .as[(String, String)]
    val agg = new KMinValues(64)
    val a = sh.groupByKey(_._1).agg(agg.toColumn).collect().toMap
    val b = sh.repartition(7).groupByKey(_._1).agg(agg.toColumn).collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (lang, arr) =>
      assert(arr.toSeq == b(lang).toSeq, s"$lang sketch differs by partitioning")
      assert(arr.toSeq == arr.toSeq.sorted && arr.toSeq.distinct.size == arr.length,
        "buffer must stay sorted and distinct")
    }
    val out = Sketches.kmvDistinct(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(3), s"estimate out of bound for ${r.getString(0)}: " +
        s"est=${r.getDouble(2)} exact=${r.getLong(1)}")
    }
  }

  test("cdc merge: last op wins, deletes drop, inserts add, untouched rows pass through") {
    val merged = Queries.all("pipeline_cdc_merge")(spark, dir)
    val base = spark.read.parquet(s"$dir/orders.parquet")
    val byKey = merged.collect().map(r => r.getLong(0) -> r).toMap
    val baseRows = base.collect().map(r => r.getLong(0) -> r).toMap

    val nDel = baseRows.keys.count(_ % 10 == 7)
    val nIns = baseRows.keys.count(_ % 100 == 1)
    assert(byKey.size == baseRows.size - nDel + nIns,
      s"rows ${byKey.size} != ${baseRows.size} - $nDel + $nIns")

    baseRows.foreach { case (k, b) =>
      val price = b.getAs[Double]("o_totalprice")
      if (k % 10 == 7) assert(!byKey.contains(k), s"deleted key $k survived")
      else if (k % 10 == 3) { // seq-2 update beats the seq-1 update
        val m = byKey(k)
        assert(m.getAs[String]("o_orderstatus") == "F" &&
          m.getAs[Double]("o_totalprice") == price + 200.0 &&
          m.getAs[String]("src") == "updated", s"key $k: wrong seq-2 apply")
      } else if (k % 5 == 2 || k % 5 == 3) { // only the seq-1 update touched it
        val m = byKey(k)
        assert(m.getAs[String]("o_orderstatus") == "P" &&
          m.getAs[Double]("o_totalprice") == price + 100.0, s"key $k: wrong seq-1 apply")
      } else {
        val m = byKey(k)
        assert(m.getAs[String]("src") == "base" &&
          m.getAs[Double]("o_totalprice") == price &&
          m.getAs[String]("o_orderstatus") == b.getAs[String]("o_orderstatus"),
          s"untouched key $k mutated")
      }
      if (k % 100 == 1) {
        val ins = byKey(-k)
        assert(ins.getAs[String]("src") == "inserted" &&
          ins.getAs[String]("o_orderstatus") == "N" &&
          ins.getAs[Double]("o_totalprice") == price &&
          ins.getAs[Long]("o_custkey") == b.getAs[Long]("o_custkey"),
          s"insert -$k wrong")
      }
    }
  }

  test("as-of planted ties: equal-(key,ts) rows resolve deterministically in both directions") {
    import spark.implicits._
    // Every asof CONSUMER pre-reduces right rows to one per (key, ts)
    // (join_asof_nearest / join_asof_click_error: max(event_id);
    // join_scd2_pointintime: max_by(priority, version)) — but a regenerated
    // corpus must not be able to change OPERATOR behavior either, so pin
    // the operator's own tie rule with planted duplicates (r6 VERDICT #8).
    val left = Seq((1L, 10L, "c1"), (1L, 10L, "c2"), (1L, 30L, "c3"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 5L), (1L, 10L, 9L), // backward tie AT a left ts (inclusive)
      (1L, 20L, 3L), (1L, 20L, 7L)) // forward tie strictly after ts=10
      .toDF("k", "ts", "p")
    def runAsOf() = graft.ops.AsOfJoin.asOf(left, right, "k", "ts", Seq("p"))
      .orderBy(col("ts"), col("tag")).collect().map(_.toSeq).toSeq
    val a = runAsOf()
    // inclusive backward at equal ts; tied right rows -> GREATEST payload
    // struct (the __p asc / last() rule); both equal-ts left rows agree;
    // c3's most recent rights are the tied pair at ts=20 -> 7
    assert(a.map(r => (r(1), r(2), r(3))) == Seq(
      (10L, "c1", 9L), (10L, "c2", 9L), (30L, "c3", 7L)))
    assert(a == runAsOf(), "tie resolution must be run-to-run deterministic")

    def runBoth() = graft.ops.AsOfJoin.asOfBoth(left, right, "k", "ts", Seq("p"))
      .orderBy(col("ts"), col("tag")).collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[String]("tag"),
        r.getAs[Long]("back_p"), Option(r.getAs[Any]("fwd_p")))).toSeq
    val b = runBoth()
    assert(b == Seq(
      // backward: greatest tied payload at ts<=10; forward: STRICTLY after
      // (the equal-ts rights at 10 are excluded), tied rights at 20 ->
      // SMALLEST payload struct (the first() over the following frame)
      (10L, "c1", 9L, Some(3L)), (10L, "c2", 9L, Some(3L)),
      (30L, "c3", 7L, None)))
    assert(b == runBoth(), "bidirectional ties must be deterministic")
  }

  test("scd2: islands match brute-force run compression, intervals tile, one current row") {
    val out = Queries.all("window_scd2")(spark, dir).collect()
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority").collect()

    // brute force: sort each customer's orders, compress runs of equal priority
    val expect = orders.groupBy(_.getLong(0)).map { case (cust, rows) =>
      val sorted = rows.sortBy(r => (r.getAs[java.time.LocalDateTime](1).toString, r.getLong(2)))
      val islands = sorted.foldLeft(Vector.empty[(String, String, Long)]) { (acc, r) =>
        val pri = r.getString(3)
        val from = r.getAs[java.time.LocalDateTime](1).toString
        if (acc.nonEmpty && acc.last._1 == pri)
          acc.init :+ ((pri, acc.last._2, acc.last._3 + 1))
        else acc :+ ((pri, from, 1L))
      }
      cust -> islands
    }

    val got = out.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    assert(got.keys.toSet == expect.keySet)
    got.foreach { case (cust, rows) =>
      val exp = expect(cust)
      assert(rows.length == exp.length, s"cust $cust: ${rows.length} islands vs ${exp.length}")
      rows.zip(exp).zipWithIndex.foreach { case ((r, (pri, from, n)), i) =>
        assert(r.getString(2) == pri && r.getLong(5) == n, s"cust $cust island $i")
        assert(r.getAs[java.time.LocalDateTime]("effective_from").toString == from,
          s"cust $cust island $i from")
        // consecutive islands always change priority
        if (i > 0) assert(rows(i - 1).getString(2) != pri, s"cust $cust island $i no change")
        // intervals tile: effective_to == next effective_from; only last is open/current
        if (i < rows.length - 1)
          assert(r.getAs[java.time.LocalDateTime]("effective_to") ==
            rows(i + 1).getAs[java.time.LocalDateTime]("effective_from") &&
            !r.getAs[Boolean]("is_current"), s"cust $cust island $i not tiled")
        else assert(r.isNullAt(4) && r.getAs[Boolean]("is_current"),
          s"cust $cust last island not current")
      }
    }
  }

  test("zorder layout: interleave matches brute force, z-order prunes more files than ingest order") {
    // brute-force Morton check against an independent Scala implementation
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val (maxp, maxs) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    def morton(pb: Long, sb: Long): Long =
      (0 until 8).map(i => (((pb >> i) & 1) << (2 * i)) | (((sb >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    li.limit(50).collect().foreach { r =>
      val pb = r.getLong(1) * 256 / (maxp + 1)
      val sb = r.getLong(2) * 256 / (maxs + 1)
      val z = morton(pb, sb)
      assert(z >= 0 && z < 65536 && (z >> 10) < 64)
      // de-interleave recovers the buckets — the defining Morton property
      val pBack = (0 until 8).map(i => ((z >> (2 * i)) & 1) << i).reduce(_ | _)
      val sBack = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1) << i).reduce(_ | _)
      assert(pBack == pb && sBack == sb, s"interleave not invertible for ($pb,$sb)")
    }

    val out = Queries.all("layout_zorder")(spark, dir).collect()
    assert(out.length == 32, s"expected 32 probe rows, got ${out.length}")
    Seq("part", "supp").foreach { dim =>
      val rows = out.filter(_.getString(0) == dim)
      assert(rows.length == 16, s"$dim: ${rows.length} probes")
      val zTotal = rows.map(_.getAs[Long]("files_zorder")).sum
      val lTotal = rows.map(_.getAs[Long]("files_linear")).sum
      assert(zTotal < lTotal,
        s"$dim: z-order scanned $zTotal file-probes, ingest order $lTotal — no advantage")
      rows.foreach { r =>
        val fz = r.getAs[Long]("files_zorder")
        val fl = r.getAs[Long]("files_linear")
        assert(fz <= 64 && fl <= 64, s"$dim: counts out of range fz=$fz fl=$fl")
        assert(r.getAs[Double]("scan_frac_zorder") == fz / 64.0)
      }
    }
  }

  test("pagerank: query equals brute-force integer power iteration, mass bounded, hubs rank high") {
    // independent ground truth: collect the graph and iterate in plain Scala
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_suppkey")
    val ord = spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_custkey")
    val fwd = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = fwd ++ fwd.map { case (a, b) => (b, a) }
    val outdeg = edges.groupBy(_._1).map { case (k, es) => k -> es.length.toLong }
    var r: Map[Long, Long] = outdeg.map { case (k, _) => k -> 1000000000L }
    for (_ <- 1 to 3) {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = s.map { case (n, sum) => n -> (150000000L + (85L * sum) / 100L) }
    }

    val got = Queries.all("graph_pagerank")(spark, dir).collect()
    assert(got.length == r.size, s"node count ${got.length} != ${r.size}")
    got.foreach { row =>
      val node = row.getAs[Long]("node")
      assert(row.getAs[Long]("rank_raw") == r(node),
        s"node $node: ${row.getAs[Long]("rank_raw")} != brute ${r(node)}")
      assert(row.getAs[Long]("outdeg") == outdeg(node))
      assert(row.getAs[Double]("rank") == row.getAs[Long]("rank_raw") / 1.0e9)
    }
    // total mass stays within the teleport/damping envelope of n·SCALE
    val total = r.values.sum
    assert(total <= r.size * 1000000000L && total > r.size * 150000000L)
    // output is rank-descending and the top node is a genuine hub
    val ranks = got.map(_.getAs[Long]("rank_raw"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    val topDeg = got.head.getAs[Long]("outdeg")
    val medianDeg = outdeg.values.toArray.sorted.apply(outdeg.size / 2)
    assert(topDeg > medianDeg, s"top-ranked node degree $topDeg not above median $medianDeg")
  }

  test("pagerank knobs: dangling mass conserved exactly, convergence stops early and deterministically") {
    import spark.implicits._
    // cycle 1→2→3→1 plus 1→4 with node 4 DANGLING (no out-edges)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val n = 4L
    val base = graft.ops.Graph.Base

    // with redistribution: per iteration Σr loses strictly less than one
    // 1e-9 ulp per node (the final floor), and never grows — the r5
    // VERDICT #6 invariant. 5 rounds ⇒ Σr ∈ (n·Base − 5n, n·Base].
    val iters = 5
    val kept = graft.ops.Graph.pageRank(edges, maxIter = iters,
      handleDangling = true, parts = 4)
      .agg(sum(col("r")), count(lit(1))).head()
    assert(kept.getLong(1) == n, "node universe is src ∪ dst")
    val massKept = kept.getLong(0)
    assert(massKept <= n * base, s"mass grew: $massKept > ${n * base}")
    assert(massKept > n * base - iters * n,
      s"mass leaked beyond the floor bound: $massKept ≤ ${n * base - iters * n}")

    // without it, the dangling node's entire rank leaks every round: after
    // 5 rounds the deficit is orders of magnitude above the n·iters floor
    // dust (node 4 holds ≥ teleport ≈ 0.15·Base each round)
    val massLeaky = graft.ops.Graph.pageRank(edges, maxIter = iters,
      handleDangling = false, parts = 4)
      .agg(sum(col("r"))).head().getLong(0)
    assert(massLeaky < n * base - base / 10,
      s"expected a visible dangling leak, got Σr = $massLeaky")

    // convergence termination: tolRaw stops before the cap, the stop is
    // exactly the round where max|Δr| first ≤ tol (checked against fixed
    // runs), and the early-stopped result is bit-identical to the fixed
    // run of the same length
    val tol = 1000L
    def fixed(k: Int) = graft.ops.Graph.pageRank(edges, maxIter = k,
      handleDangling = true, parts = 4)
      .select(col("node"), col("r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conv = graft.ops.Graph.pageRank(edges, maxIter = 100,
      tolRaw = tol, handleDangling = true, parts = 4)
      .select(col("node"), col("r"), col("iters")).collect()
    val k = conv.head.getLong(2).toInt
    assert(k < 100, s"tolRaw never triggered (ran all $k rounds)")
    assert(conv.map(r => r.getLong(0) -> r.getLong(1)).toMap == fixed(k),
      "early-stopped ranks differ from the fixed run of the same length")
    def maxDelta(a: Map[Long, Long], b: Map[Long, Long]): Long =
      a.map { case (nd, v) => math.abs(v - b(nd)) }.max
    assert(maxDelta(fixed(k), fixed(k - 1)) <= tol,
      "stop round's delta exceeds tolRaw")
    if (k >= 2)
      assert(maxDelta(fixed(k - 1), fixed(k - 2)) > tol,
        "loop should have stopped one round earlier")
  }

  test("compaction plan: bins match brute-force next-fit-decreasing, no partition mixing") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_shipdate", "l_returnflag", "l_linestatus")
    // brute force: rebuild files and bin them sequentially per month
    val files = li.collect().map { r =>
      val month = r.getAs[java.time.LocalDateTime](1).withDayOfMonth(1)
        .toLocalDate.toString
      ((month, r.getLong(0) / 16),
        64L + r.getString(2).getBytes("UTF-8").length + r.getString(3).getBytes("UTF-8").length)
    }.groupBy(_._1).map { case (k, rows) => (k._1, k._2, rows.map(_._2).sum) }.toSeq
    val expect = files.groupBy(_._1).toSeq.flatMap { case (month, fs) =>
      val sorted = fs.sortBy(f => (-f._3, f._2))
      var cum = 0L
      sorted.map { case (_, fid, bytes) =>
        val bin = cum / 8192; cum += bytes; ((month, bin), (fid, bytes))
      }
    }.groupBy(_._1).map { case ((month, bin), fs) =>
      (month, bin) -> (fs.size, fs.map(_._2._2).sum, fs.map(_._2._1).min, fs.map(_._2._1).max)
    }

    val got = Queries.all("layout_compaction_plan")(spark, dir).collect()
    assert(got.length == expect.size, s"${got.length} bins != ${expect.size}")
    got.foreach { r =>
      val month = r.getTimestamp(0).toLocalDateTime.toLocalDate.toString
      val key = (month, r.getAs[Long]("bin_id"))
      val (n, bytes, first, last) = expect(key)
      assert(r.getAs[Long]("n_files") == n.toLong, s"$key n_files")
      assert(r.getAs[Long]("bin_bytes") == bytes, s"$key bytes")
      assert(r.getAs[Long]("first_file") == first && r.getAs[Long]("last_file") == last)
      assert(r.getAs[Double]("fill_ratio") == bytes / 8192.0)
    }
  }

  test("skew profile: exact histogram stats and ceil salt factor per key") {
    val got = Queries.all("diag_skew_profile")(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("l_partkey", "l_suppkey", "o_custkey"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    Seq(("l_partkey", li), ("l_suppkey", li),
      ("o_custkey", spark.read.parquet(s"$dir/orders.parquet"))).foreach { case (key, df) =>
      val hist = df.select(key).collect().map(_.getLong(0))
        .groupBy(identity).map(_._2.length.toLong)
      val (distinct, total, mx) = (hist.size.toLong, hist.sum, hist.max)
      val r = got.find(_.getString(0) == key).get
      assert(r.getAs[Long]("distinct_keys") == distinct)
      assert(r.getAs[Long]("total_rows") == total)
      assert(r.getAs[Long]("max_key_rows") == mx)
      assert(r.getAs[Double]("avg_key_rows") == total / distinct.toDouble)
      assert(r.getAs[Double]("max_share") == mx / total.toDouble)
      // integer ceil(max/avg) = ceil(max*distinct/total)
      val salt = (mx * distinct + total - 1) / total
      assert(r.getAs[Long]("salt_factor") == salt, s"$key salt")
      assert(salt >= 1)
    }
  }

  test("bpe vocab: six merge rounds equal an independent list-based trainer, weights non-increasing") {
    // independent ground truth: symbol VECTORS with an explicit left-to-right
    // single-pass merge scan (the query uses framed-string replace instead)
    val corpus = docs.select("text").collect().flatMap(
      _.getString(0).toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
    val counts = corpus.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    var vocab: Map[Vector[String], Long] =
      counts.map { case (w, c) => w.map(_.toString).toVector -> c }.toMap
        .groupBy(_._1).map { case (k, m) => k -> m.values.sum }
    val expect = (1 to 6).map { k =>
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p => pairs(p) = pairs.getOrElse(p, 0L) + c }
      }
      val ((pa, pb), tot) = pairs.toSeq.minBy { case ((a, b), t) => (-t, a, b) }
      def merge(l: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < l.length) {
          if (i + 1 < l.length && l(i) == pa && l(i + 1) == pb) { out += pa + pb; i += 2 }
          else { out += l(i); i += 1 }
        }
        out.result()
      }
      vocab = vocab.toSeq.map { case (syms, c) => (merge(syms), c) }
        .groupBy(_._1).map { case (kk, vs) => kk -> vs.map(_._2).sum }
      (k, pa, pb, pa + pb, tot)
    }

    val got = Queries.all("text_bpe_vocab")(spark, dir).collect()
    assert(got.length == 6)
    got.zip(expect).foreach { case (r, (k, pa, pb, m, tot)) =>
      assert(r.getInt(0) == k)
      assert(r.getString(1) == pa && r.getString(2) == pb && r.getString(3) == m,
        s"round $k: got (${r.getString(1)},${r.getString(2)}) want ($pa,$pb)")
      assert(r.getLong(4) == tot, s"round $k weight ${r.getLong(4)} != $tot")
    }
    // classic BPE property: the selected pair weight never increases
    val ws = got.map(_.getLong(4))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, ws.mkString(","))
  }

  test("incremental agg: merged state equals full recompute in every group, delta non-vacuous") {
    val got = Queries.all("pipeline_incremental_agg")(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Boolean]("matches_full")), "a merged group diverged from recompute")
    // cross-check totals against a direct pass over orders
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
    val deltaRows = orders.count(_.getLong(0) % 97 == 0)
    assert(deltaRows > 0, "CDC carve-out is empty — the merge test is vacuous")
    assert(got.map(_.getAs[Long]("n_orders")).sum == orders.length)
    val totalRevenue = got.map(_.getAs[Double]("revenue")).sum
    val direct = orders.map(r => BigDecimal(r.getDouble(1)).setScale(4)).sum
    assert(math.abs(totalRevenue - direct.toDouble) < 1e-4 * orders.length,
      s"revenue drift: $totalRevenue vs $direct")
  }

  test("triangles: degree-oriented count equals brute-force enumeration, participation exact") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.as("a").join(li.as("b"), col("a.ok") === col("b.ok"))
      .where(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
      .where(pmod(graft.functions.HashOps.md5Low64(
        concat(col("u").cast("string"), lit("_"), col("v").cast("string"))),
        lit(4L)) === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: check every adjacent vertex triple
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val triangles = for {
      (u, v) <- edges.toSeq
      w <- adj(u) if w > v && edges.contains((v, w))
    } yield (u, v, w)
    val part = triangles.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }

    val got = Queries.all("graph_triangles")(spark, dir).collect()
    assert(got.nonEmpty, "no triangles at sf0.001 — test is vacuous")
    assert(got.head.getAs[Long]("total_triangles") == triangles.length.toLong,
      s"total ${got.head.getAs[Long]("total_triangles")} != brute ${triangles.length}")
    assert(got.head.getAs[Long]("doulion_estimate") == 64L * triangles.length)
    got.foreach { r =>
      val k = r.getAs[Long]("part_key")
      assert(r.getAs[Long]("tri_count") == part(k), s"node $k participation")
    }
    // top-100 really is the top of the full participation ranking
    val floor = got.last.getAs[Long]("tri_count")
    val above = part.values.count(_ > floor).toLong
    assert(above <= got.count(_.getAs[Long]("tri_count") > floor))
  }

  // --- shared independent PQ reference implementation (plain Scala) ---
  private def pqMd5Low64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 8).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).reduce(_ | _)
  }
  private def pqCosine(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    i = 0; while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0; while (i < b.length) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  private def pqVecs: Seq[(Long, Vector[Double])] = embeddings
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toVector)).toSeq
    .sortBy(_._1)
  private def pqTrainOne(sub: Seq[(Long, Vector[Double])]): IndexedSeq[Vector[Double]] = {
    var cents: Map[Long, Vector[Double]] = sub.sortBy(_._1).take(16)
      .zipWithIndex.map { case ((_, v), i) => i.toLong -> v }.toMap
    for (_ <- 1 to 3) {
      val assigned = sub.map { case (id, v) =>
        val best = cents.toSeq.map { case (b, cv) => (pqCosine(v, cv), -b, b) }.max._3
        (best, id, v)
      }
      val updated = assigned.groupBy(_._1).map { case (b, rows) =>
        val sorted = rows.sortBy(_._2)
        val dims = sorted.head._3.length
        b -> Vector.tabulate(dims) { d =>
          sorted.foldLeft(0.0)((acc, r) => acc + r._3(d)) / sorted.length
        }
      }
      cents = cents.map { case (b, cv) => b -> updated.getOrElse(b, cv) }
    }
    (0L to 15L).map(cents).toIndexedSeq
  }
  private def pqSample(vecs: Seq[(Long, Vector[Double])]): Seq[(Long, Vector[Double])] =
    vecs.sortBy { case (id, _) => (pqMd5Low64(id.toString), id) }.take(4096)
  private def pqTrainBooks(vecs: Seq[(Long, Vector[Double])]): Seq[IndexedSeq[Vector[Double]]] = {
    val sample = pqSample(vecs)
    (0 until 4).map { j =>
      pqTrainOne(sample.map { case (id, v) => (id, v.slice(j * 16, j * 16 + 16)) })
    }
  }

  test("product quantization: codes and recon cosine equal a full independent PQ run") {
    def cosine(a: Seq[Double], b: Seq[Double]): Double = pqCosine(a, b)
    val vecs = pqVecs
    val books = pqTrainBooks(vecs)
    val got = Queries.all("embed_pq")(spark, dir).collect()
    assert(got.length == vecs.length)
    got.zip(vecs).foreach { case (r, (id, v)) =>
      assert(r.getLong(0) == id)
      val codes = (0 until 4).map { j =>
        val sub = v.slice(j * 16, j * 16 + 16)
        books(j).zipWithIndex.map { case (cv, b) => (cosine(sub, cv), -b, b) }.max._3
      }
      (0 until 4).foreach(j =>
        assert(r.getAs[Long](s"c$j") == codes(j).toLong, s"vec $id subspace $j"))
      assert(r.getAs[Long]("code") ==
        codes.map(_.toLong).reduce((a, b) => a * 16 + b))
      val recon = (0 until 4).flatMap(j => books(j)(codes(j))).toVector
      assert(r.getAs[Double]("recon_cosine") == cosine(v, recon),
        s"vec $id recon ${r.getAs[Double]("recon_cosine")} != ${cosine(v, recon)}")
    }
    // quantization must actually be useful: median recon cosine well above chance
    val rc = got.map(_.getAs[Double]("recon_cosine")).sorted
    assert(rc(rc.length / 2) > 0.5, s"median recon cosine ${rc(rc.length / 2)}")
  }

  test("pq adc search: LUT scores, ranking, and audit cosines equal the independent model") {
    val vecs = pqVecs
    val books = pqTrainBooks(vecs)
    val qv = vecs.find(_._1 == 0L).get._2
    val qNorm = math.sqrt(qv.foldLeft(0.0)((a, x) => a + x * x))
    def code(v: Vector[Double], j: Int): Int = {
      val sub = v.slice(j * 16, j * 16 + 16)
      books(j).zipWithIndex.map { case (cv, b) => (pqCosine(sub, cv), -b, b) }.max._3
    }
    val scored = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val cs = (0 until 4).map(j => code(v, j))
      val d = (0 until 4).map { j =>
        var acc = 0.0; var i = 0
        while (i < 16) { acc += qv(j * 16 + i) * books(j)(cs(j))(i); i += 1 }
        acc
      }.reduce(_ + _)
      val n = (0 until 4).map { j =>
        var acc = 0.0; var i = 0
        while (i < 16) { val x = books(j)(cs(j))(i); acc += x * x; i += 1 }
        acc
      }.reduce(_ + _)
      (id, d / (qNorm * math.sqrt(n)), pqCosine(v, qv))
    }
    val expect = scored.sortBy { case (id, adc, _) => (-adc, id) }.take(10)

    val got = Queries.all("sim_pq_adc")(spark, dir).collect()
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, (id, adc, exact)) =>
      assert(r.getLong(0) == id, s"rank order: got ${r.getLong(0)} want $id")
      assert(r.getAs[Double]("adc_cosine") == adc, s"vec $id adc")
      assert(r.getAs[Double]("exact_cosine") == exact, s"vec $id exact")
    }
    // ADC must be a useful surrogate: its top-10 overlaps the exact top-10
    val exactTop = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, pqCosine(v, qv)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    // tiny-corpus floor: 4x4-bit codes on ~50 near-random vectors are a
    // coarse surrogate; the bit-exactness asserts above are the real spec
    val overlap = expect.map(_._1).count(exactTop)
    assert(overlap >= 1, s"ADC top-10 shares only $overlap with exact top-10")
  }

  test("bpe apply: per-doc token accounting equals independent merge application") {
    val merges = Queries.all("text_bpe_vocab")(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    def tokenize(word: String): Int = {
      var syms = word.map(_.toString).toVector
      merges.foreach { case (pa, pb) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
            out += pa + pb; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    val expect = docs.select("doc_id", "text").collect().map { r =>
      val words = r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      (r.getLong(0), (words.length.toLong,
        words.map(_.length.toLong).sum, words.map(w => tokenize(w).toLong).sum))
    }.filter(_._2._1 > 0).toMap

    val got = Queries.all("text_bpe_apply")(spark, dir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nw, nc, nt) = expect(r.getLong(0))
      assert(r.getAs[Long]("n_words") == nw, s"doc ${r.getLong(0)} words")
      assert(r.getAs[Long]("n_chars") == nc, s"doc ${r.getLong(0)} chars")
      assert(r.getAs[Long]("n_tokens") == nt, s"doc ${r.getLong(0)} tokens")
      assert(r.getAs[Double]("compression") == nc.toDouble / nt.toDouble)
      assert(nt <= nc, "merging can only shrink the token count")
    }
    // the vocabulary must actually compress: total tokens strictly below total chars
    val totT = expect.values.map(_._3).sum
    val totC = expect.values.map(_._2).sum
    assert(totT < totC, s"no compression: $totT tokens vs $totC chars")
  }

  test("salted join: result identical to the plain join, build side replicated per salt") {
    val got = Queries.all("join_skew_salted")(spark, dir).collect()
    // ground truth: the plain unsalted join computed directly
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)").as("rev"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("month"))
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("month"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("r"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
        (r.getLong(2), r.getDecimal(3).toPlainString)).toMap
    assert(got.length == plain.size)
    got.foreach { r =>
      val (n, rev) = plain((r.getTimestamp(0).toString, r.getString(1)))
      assert(r.getAs[Long]("n_lines") == n)
      assert(r.getAs[Double]("revenue") == java.lang.Double.parseDouble(rev),
        s"${r.getTimestamp(0)} ${r.getString(1)} revenue mismatch")
    }
  }

  test("ivfpq: coarse routing, residual codes, probes and ADC equal the independent pipeline") {
    val vecs = pqVecs
    val coarse = pqTrainOne(pqSample(vecs))
    def assign(v: Vector[Double]): Int =
      coarse.zipWithIndex.map { case (cv, b) => (pqCosine(v, cv), -b, b) }.max._3
    val residuals = vecs.map { case (id, v) =>
      val b = assign(v)
      (id, b, Vector.tabulate(v.length)(i => v(i) - coarse(b)(i)), v)
    }
    val rBooks = {
      val rmap = residuals.map(t => t._1 -> t._3).toMap
      pqTrainBooks(vecs.map { case (id, _) => (id, rmap(id)) })
    }
    def code(r: Vector[Double], j: Int): Int = {
      val sub = r.slice(j * 16, j * 16 + 16)
      rBooks(j).zipWithIndex.map { case (cv, b) => (pqCosine(sub, cv), -b, b) }.max._3
    }
    val qv = vecs.find(_._1 == 0L).get._2
    val qNorm = math.sqrt(qv.foldLeft(0.0)((a, x) => a + x * x))
    val probes = coarse.zipWithIndex
      .map { case (cv, b) => (pqCosine(qv, cv), b) }
      .sortBy { case (s, b) => (-s, b) }.take(4).map(_._2).toSet
    def dot(a: Seq[Double], off: Int, b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += a(off + i) * b(i); i += 1 }
      acc
    }
    def sq(b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += b(i) * b(i); i += 1 }
      acc
    }
    val scored = residuals.filter(t => t._1 != 0L && probes(t._2)).map {
      case (id, b, r, v) =>
        val cs = (0 until 4).map(j => code(r, j))
        val dc = dot(qv, 0, coarse(b))
        val dots = (0 until 4).map(j => dot(qv, j * 16, rBooks(j)(cs(j))))
          .foldLeft(dc)(_ + _)
        val cross = (0 until 4).map(j => dot(coarse(b), j * 16, rBooks(j)(cs(j)))).reduce(_ + _)
        val nsum = (0 until 4).map(j => sq(rBooks(j)(cs(j)))).reduce(_ + _)
        val norm = sq(coarse(b)) + 2.0 * cross + nsum
        (id, b.toLong, dots / (qNorm * math.sqrt(norm)), pqCosine(v, qv))
    }
    val expect = scored.sortBy { case (id, _, adc, _) => (-adc, id) }.take(10)

    val got = Queries.all("sim_ivfpq")(spark, dir).collect()
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, (id, b, adc, exact)) =>
      assert(r.getLong(0) == id, s"rank: got ${r.getLong(0)} want $id")
      assert(r.getAs[Long]("bucket") == b, s"vec $id bucket")
      assert(r.getAs[Double]("adc_cosine") == adc, s"vec $id adc")
      assert(r.getAs[Double]("exact_cosine") == exact, s"vec $id exact")
    }
  }

  test("funnel and retention: per-user scans match the set-based queries exactly") {
    val ev = graft.streaming.StreamingOps.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // funnel brute force: per-user ordered scan for view -> click -> purchase
    val byUser = ev.groupBy(_._1).map { case (u, es) => u -> es.sortBy(_._3) }
    val expectDepth = byUser.map { case (u, es) =>
      val t1 = es.find(_._2 == "view").map(_._3)
      val t2 = t1.flatMap(a => es.find(e => e._2 == "click" && e._3 > a).map(_._3))
      val t3 = t2.flatMap(a => es.find(e => e._2 == "purchase" && e._3 > a).map(_._3))
      val depth = if (t3.isDefined) 3 else if (t2.isDefined) 2 else if (t1.isDefined) 1 else 0
      val elapsed = (t3.orElse(t2), t1) match {
        case (Some(t), Some(a)) => t - a
        case _ => 0L
      }
      u -> (depth, elapsed)
    }
    val hist = expectDepth.values.groupBy(_._1)
      .map { case (d, vs) => d -> (vs.size.toLong, vs.map(_._2).sum) }
    val gotF = Queries.all("window_funnel")(spark, dir).collect()
    assert(gotF.map(_.getInt(0)).toSet == hist.keySet)
    gotF.foreach { r =>
      val (n, sum) = hist(r.getInt(0))
      assert(r.getAs[Long]("n_users") == n, s"depth ${r.getInt(0)} users")
      assert(r.getAs[Long]("sum_elapsed_us") == sum, s"depth ${r.getInt(0)} elapsed")
    }
    assert(hist.contains(3) && hist(3)._1 > 0, "no full conversions — funnel test vacuous")

    // retention brute force
    val days = ev.map(t => (t._1, t._2, t._3 / 86400000000L))
    val cohorts = days.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val active = days.map(t => (t._1, t._3)).toSet
    val gotR = Queries.all("agg_retention_cohorts")(spark, dir).collect()
    val expectR = cohorts.groupBy(_._2).map { case (cd, us) =>
      val users = us.keys.toSeq
      cd -> (users.size.toLong,
        Seq(0L, 1L, 7L, 14L).map(k => users.count(u => active((u, cd + k))).toLong))
    }
    assert(gotR.length == expectR.size)
    gotR.foreach { r =>
      val (n, rs) = expectR(r.getLong(0))
      assert(r.getAs[Long]("n_users") == n)
      assert(Seq(r.getAs[Long]("active_d0"), r.getAs[Long]("active_d1"),
        r.getAs[Long]("active_d7"), r.getAs[Long]("active_d14")) == rs,
        s"cohort ${r.getLong(0)} retention row mismatch")
    }
    // d0 is definitionally full (the signup itself is activity on day 0)
    gotR.foreach(r => assert(r.getAs[Long]("active_d0") == r.getAs[Long]("n_users")))
  }

  test("hll distinct sketch: registers are set-deterministic, duplicates no-ops, estimate in band") {
    import graft.ops.{HyperLogLog, Sketches}
    val s = spark
    import s.implicits._
    val hashes = docs.select(col("lang"),
      explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .select(col("lang"), graft.functions.HashOps.md5Low64(col("sh")).as("h"))
      .as[(String, Long)]
    val a = hashes.groupByKey(_._1).agg(HyperLogLog.toColumn).collect().toMap
    val b = hashes.repartition(7).groupByKey(_._1).agg(HyperLogLog.toColumn).collect().toMap
    val dup = hashes.union(hashes).groupByKey(_._1).agg(HyperLogLog.toColumn).collect().toMap
    assert(a.keySet == b.keySet && a.keySet == dup.keySet)
    a.foreach { case (lang, arr) =>
      assert(arr.toSeq == b(lang).toSeq, s"$lang registers differ by partitioning")
      assert(arr.toSeq == dup(lang).toSeq, s"$lang registers changed on duplicate arrivals")
      // registers equal an independent per-index max over the raw hashes
      val raw = hashes.filter(_._1 == lang).map(_._2).collect()
      val expect = new Array[Long](64)
      raw.foreach { h =>
        val idx = (h & 63).toInt
        val r = HyperLogLog.rho(h >>> 6).toLong
        if (r > expect(idx)) expect(idx) = r
      }
      assert(arr.toSeq == expect.toSeq, s"$lang registers != per-index max derivation")
    }
    // known-cardinality synthetic set: 5000 distinct keys, est within the band
    val syn = (1 to 5000).map(i => ("x", Sketches.md5Low64String(s"hll-syn-$i")))
      .toDS()
    val regs = syn.groupByKey(_._1).agg(HyperLogLog.toColumn).collect().head._2
    val zNum = regs.map(m => BigInt(1) << (59 - m.toInt)).sum
    val est = 0.7213 / (1.0 + 1.079 / 64.0) * 4096.0 * 5.76460752303423488e17 /
      zNum.toDouble
    assert(math.abs(est / 5000.0 - 1.0) <= 0.4, s"synthetic est $est vs 5000")
    // the full query: non-empty, every group in-band and out of small-range regime
    val out = Sketches.hllDistinct(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("zeros") == 0, s"${r.getString(0)} in small-range regime")
      assert(r.getAs[Boolean]("hll_ok"), s"${r.getString(0)} estimate out of band: " +
        s"est=${r.getAs[Double]("est")} exact=${r.getAs[Long]("n_distinct")}")
    }
  }

  test("bloom decontamination: no false negatives, real false positives, order-independent bits") {
    import graft.ops.{BloomBits, PipelineOps}
    val s = spark
    import s.implicits._
    val out = PipelineOps.decontaminateBloom(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nBloom, nExact) = (r.getLong(2), r.getLong(3))
      assert(nBloom >= nExact, s"false negative on doc ${r.getLong(0)}")
      assert(r.getBoolean(7), "sound column must be deterministically true")
      if (r.getBoolean(5)) assert(r.getBoolean(4),
        "exact contamination must imply bloom contamination")
    }
    assert(out.map(_.getLong(6)).sum > 0,
      "m sizing should surface at least one false positive at test scale")
    // OR-additivity: bit set identical under any partitioning
    val ev = docs.select(explode(Dedup.shingles(col("text"), 8)).as("sh")).distinct()
    val b1 = ev.as[String].select(BloomBits.toColumn).head()
    val b2 = ev.repartition(7).as[String].select(BloomBits.toColumn).head()
    assert(b1.toSeq == b2.toSeq)
  }

  test("streamed count-min accumulation is bit-equal to the batch sketch") {
    val streamed = graft.streaming.StreamingOps.streamCountMin(spark, dir)
      .collect().map(_.toString)
    val batch = graft.ops.Sketches.countMinAudit(
      docs.select(col("doc_id"), col("text"))).collect().map(_.toString)
    assert(streamed.toSeq == batch.toSeq,
      "additive sketch must not depend on micro-batch chunking")
  }

  // --- engine-state kill-and-resume (r8 VERDICT #2): the three RocksDB-
  // backed streams are exactly the queries that get RESTARTED at the
  // 100 TB target. Each test runs phase 1 over a staged prefix, stops the
  // query (the "kill"), stages the remainder — arranged so the resumed
  // plan can only be right if the RocksDB state store restored from the
  // engine checkpoint — and asserts the final sink equals the batch
  // answer. The driver-fold family's state.bin restart contract is pinned
  // separately below.

  /** Stage `df` into `src` as `name.parquet` with an explicit, strictly
    * increasing modification time: within one resume phase two staged
    * chunks must be consumed in staging order (watermark choreography),
    * and sub-millisecond stageOne moves can otherwise tie on modTime.
    */
  private def stageOrdered(df: DataFrame, src: java.nio.file.Path,
      name: String, seq: Int): Unit = {
    graft.streaming.StreamingOps.stageOne(df, src, name)
    java.nio.file.Files.setLastModifiedTime(src.resolve(s"$name.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + seq * 10000L))
    ()
  }

  test("RocksDB kill-and-resume: exact-dedup stream restart drops re-delivered in-watermark ids (==batch)") {
    import graft.streaming.StreamingOps
    val ev = StreamingOps.events(spark, dir).select(col("event_id"), col("ts"))
    val nEvents = ev.count()
    // ascending-time chunks (monotone arrival, the ingest-pipeline
    // pattern — id-based chunks would make later chunks LATE against the
    // advanced watermark and diverge from batch by design)
    val times = ev.select(unix_micros(col("ts")).as("us")).orderBy(col("us"))
      .collect().map(_.getLong(0))
    val (t1, t2) = (times(times.length / 3), times(2 * times.length / 3))
    val usCol = unix_micros(col("ts"))
    val chunk0 = ev.where(usCol < t1)
    val chunk0Max = times.takeWhile(_ < t1).last
    // re-delivered duplicates for phase 2: rows STRICTLY inside the 1-hour
    // watermark window (59 min for margin; always non-empty — the max-ts
    // row of chunk0 is inside any window). If the restart loses the dedup
    // state these re-emit into the sink and the id-uniqueness assert dies.
    val redeliver = chunk0.where(usCol > chunk0Max - 3540000000L)
    val nRedeliver = redeliver.count()
    assert(nRedeliver >= 1, "re-delivery set must be non-empty")
    val src = java.nio.file.Files.createTempDirectory("rdb_dedup_src")
    val ckpt = java.nio.file.Files.createTempDirectory("rdb_dedup_ck")
    val out = java.nio.file.Files.createTempDirectory("rdb_dedup_out")
    try {
      stageOrdered(chunk0, src, "chunk0", 0)
      StreamingOps.dedupEventsResumeRun(spark, src, chunk0.schema, ckpt, out)
      val phase1 = spark.read.schema(chunk0.schema).parquet(out.toString)
      assert(phase1.count() == chunk0.count(),
        "phase 1 must emit each chunk0 id exactly once")
      // the kill: the query above is stopped; phase 2 resumes from the
      // engine checkpoint with the remainder + the re-delivered tail
      stageOrdered(ev.where(usCol >= t1 && usCol < t2).unionAll(redeliver),
        src, "chunk1", 1)
      stageOrdered(ev.where(usCol >= t2), src, "chunk2", 2)
      StreamingOps.dedupEventsResumeRun(spark, src, chunk0.schema, ckpt, out)
      val sink = spark.read.schema(chunk0.schema).parquet(out.toString)
      assert(sink.count() == nEvents,
        s"resumed dedup emitted ${sink.count()} rows for $nEvents distinct ids " +
          s"($nRedeliver re-delivered in-watermark ids must hit restored state)")
      assert(sink.select(col("event_id")).distinct().count() == nEvents,
        "resumed dedup re-emitted an id (state lost across restart)")
      // idle restart: nothing new staged, nothing may change
      StreamingOps.dedupEventsResumeRun(spark, src, chunk0.schema, ckpt, out)
      assert(spark.read.schema(chunk0.schema).parquet(out.toString).count() == nEvents,
        "idle restart changed the sink")
      // the production query's output shape: day-level distinct == batch
      val streamedDays = spark.read.schema(chunk0.schema).parquet(out.toString)
        .groupBy(window(col("ts"), "1 day")("start").as("day"))
        .agg(count(lit(1)).as("n")).orderBy(col("day"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
      val batchDays = ev
        .groupBy(window(col("ts"), "1 day")("start").as("day"))
        .agg(count(lit(1)).as("n")).orderBy(col("day"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
      assert(streamedDays == batchDays)
    } finally Seq(src, ckpt, out).foreach(rmTree)
  }

  test("RocksDB kill-and-resume: interval-join state survives restart (straddling pair, ==batch)") {
    import graft.streaming.StreamingOps
    val ev = StreamingOps.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val usCol = unix_micros(col("ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("u"), col("event_id").as("click_id"), usCol.as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("event_id").as("purchase_id"), usCol.as("pts"))
    val batchPairs = c.join(p, Seq("u"))
      .where(col("pts") >= col("cts") && col("pts") <= col("cts") + 1800000000L)
      .select(col("click_id"), col("purchase_id"), col("cts"), col("pts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batchPairs.nonEmpty, "corpus must contain click->purchase pairs")
    // split at a purchase ts of a strictly-ordered pair: the click lands in
    // chunk0 (pre-kill), its purchase in chunk1 (post-resume) — the pair
    // only emits if the click's join state survived the restart
    val strict = batchPairs.filter(q => q._4 > q._3)
    assert(strict.nonEmpty, "need a pair with purchase strictly after click")
    val t1 = strict.maxBy(q => q._4 - q._3)._4
    val straddling = batchPairs.count(q => q._3 < t1 && q._4 >= t1)
    assert(straddling >= 1, "split must leave at least one straddling pair")
    val src = java.nio.file.Files.createTempDirectory("rdb_join_src")
    val ckpt = java.nio.file.Files.createTempDirectory("rdb_join_ck")
    val out = java.nio.file.Files.createTempDirectory("rdb_join_out")
    try {
      stageOrdered(ev.where(usCol < t1), src, "chunk0", 0)
      StreamingOps.clickPurchaseResumeRun(spark, src, ev.schema, ckpt, out)
      stageOrdered(ev.where(usCol >= t1), src, "chunk1", 1)
      StreamingOps.clickPurchaseResumeRun(spark, src, ev.schema, ckpt, out)
      val sinkSchema = org.apache.spark.sql.types.StructType(
        Seq("user_id", "click_id", "purchase_id", "click_ts_us", "purchase_ts_us")
          .map(n => org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.LongType)))
      val got = spark.read.schema(sinkSchema).parquet(out.toString)
        .select(col("click_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = batchPairs.map(q => (q._1, q._2)).sorted.toSeq
      assert(got == want,
        s"resumed interval join diverged from batch (straddling=$straddling): " +
          s"only-stream=${(got.toSet -- want.toSet).take(5)} " +
          s"only-batch=${(want.toSet -- got.toSet).take(5)}")
    } finally Seq(src, ckpt, out).foreach(rmTree)
  }

  test("RocksDB kill-and-resume: simhash bucket state survives restart (cross-restart pairs, ==batch)") {
    import graft.streaming.StreamingOps
    val d = docs.select(col("doc_id"), col("text"))
    val batch = Dedup.simhashPairs(d.sparkSession.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch.nonEmpty, "corpus must contain simhash near-dups")
    // phase 1 = pmod class 0; the resumed phases deliver classes 1 and 2.
    // Non-vacuity: at least one near-dup pair must straddle the restart
    // (one member each side) for the resumed bucket state to matter.
    assert(batch.exists(q => (q._1 % 3 == 0) != (q._2 % 3 == 0)),
      "no near-dup pair straddles the pmod-3 restart boundary: chunking vacuous")
    val src = java.nio.file.Files.createTempDirectory("rdb_sim_src")
    val ckpt = java.nio.file.Files.createTempDirectory("rdb_sim_ck")
    val out = java.nio.file.Files.createTempDirectory("rdb_sim_out")
    try {
      stageOrdered(d.where(pmod(col("doc_id"), lit(3)) === 0), src, "chunk0", 0)
      StreamingOps.dedupSimhashResumeRun(spark, src, d.schema, ckpt, out)
      stageOrdered(d.where(pmod(col("doc_id"), lit(3)) === 1), src, "chunk1", 1)
      stageOrdered(d.where(pmod(col("doc_id"), lit(3)) === 2), src, "chunk2", 2)
      StreamingOps.dedupSimhashResumeRun(spark, src, d.schema, ckpt, out)
      val sinkSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("hamming",
          org.apache.spark.sql.types.IntegerType)))
      val got = spark.read.schema(sinkSchema).parquet(out.toString)
        .dropDuplicates("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == batch,
        s"resumed simhash diverged: only-stream=${(got -- batch).take(5)} " +
          s"only-batch=${(batch -- got).take(5)}")
    } finally Seq(src, ckpt, out).foreach(rmTree)
  }

  test("idempotent-sink kill-and-resume: CDC delta runs survive restart + uncommitted-batch replay (==batch)") {
    import graft.streaming.StreamingOps
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val log = Queries.cdcLog(o)
    // three chunks hashed on (k, seq), the production chunking: at least
    // one key's ops must SPLIT across the restart so the arg-max fold
    // crosses the boundary (non-vacuity)
    val withB = log.withColumn("b", pmod(xxhash64(col("k"), col("seq")), lit(3L)))
    val crossing = withB.groupBy(col("k"))
      .agg(countDistinct(col("b")).as("nb")).where(col("nb") > 1).count()
    assert(crossing > 0, "no key's ops straddle the restart: chunking vacuous")
    val src = java.nio.file.Files.createTempDirectory("cdc_resume_src")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_resume_ck")
    val runs = java.nio.file.Files.createTempDirectory("cdc_resume_runs")
    try {
      stageOrdered(withB.where(col("b") === 0).drop("b"), src, "chunk0", 0)
      StreamingOps.cdcMergeResumeRun(spark, src, log.schema, ckpt, runs)
      // crash simulation: the previous incarnation wrote batch 1's run dir
      // but died BEFORE the offset commit. Plant a POISONED stale bid=1 —
      // a seq=99 tombstone for an untouched base key — that the restarted
      // batch 1 must overwrite; if the stale run survived, arg-max would
      // pick seq=99 and the key would vanish from the snapshot.
      val poison = o.where(pmod(col("o_orderkey"), lit(10)) === 9).limit(1)
        .select(col("o_orderkey").as("k"), lit(99L).as("seq"),
          lit("D").as("op"), lit(-1L).as("custkey"), lit("").as("status"),
          lit(-1.0).as("price"),
          lit("1970-01-01 00:00:00")
            .cast(o.schema("o_orderdate").dataType).as("odate"))
      val poisonKey = poison.head().getLong(0)
      poison.write.mode("overwrite").parquet(runs.resolve("bid=1").toString)
      stageOrdered(withB.where(col("b") === 1).drop("b"), src, "chunk1", 1)
      stageOrdered(withB.where(col("b") === 2).drop("b"), src, "chunk2", 2)
      StreamingOps.cdcMergeResumeRun(spark, src, log.schema, ckpt, runs)
      def snapshot(): Seq[String] =
        Queries.cdcApply(o,
          Queries.cdcCompact(spark.read.parquet(runs.toString)))
          .collect().map(_.toString).toSeq
      val got = snapshot()
      val want = Queries.cdcApply(o, Queries.cdcCompact(log))
        .collect().map(_.toString).toSeq
      assert(got == want, "resumed merge-on-read snapshot diverged from batch")
      assert(got.exists(_.contains(s"[$poisonKey,")),
        s"poisoned stale bid=1 run survived the replay: key $poisonKey deleted")
      // idle restart: no new files, snapshot unchanged
      StreamingOps.cdcMergeResumeRun(spark, src, log.schema, ckpt, runs)
      assert(snapshot() == want, "idle restart changed the snapshot")
    } finally Seq(src, ckpt, runs).foreach(rmTree)
  }

  test("driver-sketch kill-and-resume: checkpointed count-min and bottom-k recover bit-equal") {
    import graft.streaming.StreamingOps
    // --- count-min: phase 1 sees one chunk, then the driver "dies" ---
    val docs3 = docs.select(col("doc_id"), col("text"))
    val cmSrc = java.nio.file.Files.createTempDirectory("cm_resume_src")
    val cmCkpt = java.nio.file.Files.createTempDirectory("cm_resume_ckpt")
    StreamingOps.stageOne(docs3.where(pmod(col("doc_id"), lit(3)) === 0), cmSrc, "chunk0")
    val (t1, n1) = StreamingOps.countMinRun(spark, cmSrc, docs3.schema, Some(cmCkpt))
    assert(n1 == 1, s"phase 1 should fold exactly one micro-batch, got $n1")
    assert(t1.sum > 0, "phase 1 accumulated nothing")
    // phase 2: the rest of the corpus lands; a FRESH run over the same
    // checkpoint must restore the accumulator from state.bin, let the
    // engine checkpoint skip the committed batch, and fold only the rest
    StreamingOps.stageOne(docs3.where(pmod(col("doc_id"), lit(3)) === 1), cmSrc, "chunk1")
    StreamingOps.stageOne(docs3.where(pmod(col("doc_id"), lit(3)) === 2), cmSrc, "chunk2")
    val (t2, n2) = StreamingOps.countMinRun(spark, cmSrc, docs3.schema, Some(cmCkpt))
    assert(n2 == 3, s"resume should see 3 folded batches total, got $n2")
    val cmFull = graft.ops.Sketches.countMinSketch(docs3)
    assert(t2.toSeq == cmFull.toSeq,
      "resumed count-min differs from the one-pass batch sketch")
    // phase 3: restart with nothing new — at-least-once replay must not
    // double-fold anything
    val (t3, n3) = StreamingOps.countMinRun(spark, cmSrc, docs3.schema, Some(cmCkpt))
    assert(n3 == 3 && t3.toSeq == cmFull.toSeq,
      "idle restart changed the checkpointed accumulator")

    // --- bottom-k: same choreography for the keyed sketch ---
    val ev = StreamingOps.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    val bkSrc = java.nio.file.Files.createTempDirectory("bk_resume_src")
    val bkCkpt = java.nio.file.Files.createTempDirectory("bk_resume_ckpt")
    StreamingOps.stageOne(ev.where(pmod(col("event_id"), lit(3)) === 0), bkSrc, "chunk0")
    val (a1, m1) = StreamingOps.bottomKRun(spark, bkSrc, ev.schema, Some(bkCkpt))
    assert(m1 == 1 && a1.nonEmpty)
    StreamingOps.stageOne(ev.where(pmod(col("event_id"), lit(3)) === 1), bkSrc, "chunk1")
    StreamingOps.stageOne(ev.where(pmod(col("event_id"), lit(3)) === 2), bkSrc, "chunk2")
    val (a2, m2) = StreamingOps.bottomKRun(spark, bkSrc, ev.schema, Some(bkCkpt))
    assert(m2 == 3)
    val bk = new graft.ops.BottomKSample(256)
    import spark.implicits._
    val bkFull = ev.as[(String, Long, Double)]
      .groupByKey(_._1).agg(bk.toColumn.name("bk")).collect().toMap
    assert(a2.keySet == bkFull.keySet, "resumed bottom-k lost a group")
    a2.foreach { case (k, arr) =>
      assert(arr.toSeq == bkFull(k).toSeq,
        s"group $k: resumed buffer differs from the one-pass batch sketch")
    }
    Seq(cmSrc, cmCkpt, bkSrc, bkCkpt).foreach(rmTree)
  }

  test("driver-fold kill-and-resume: window-quantile, window-distinct, set-algebra, shard manifest (r6 #6)") {
    import graft.streaming.StreamingOps
    import graft.ops.Sketches
    val ev = StreamingOps.events(spark, dir)

    // shared choreography: phase 1 folds chunk0 against a checkpoint, the
    // driver "dies"; a fresh run restores state.bin, the engine checkpoint
    // skips the committed batch, and only the remainder folds; an idle
    // third run must change nothing. Reference = a one-chunk run of the
    // same fold (the keyed sketch algebras are set-deterministic, so
    // chunked+resumed == one-pass bit-for-bit).
    def choreograph[S](label: String, el: org.apache.spark.sql.DataFrame,
        chunkOf: Int => org.apache.spark.sql.DataFrame,
        run: (java.nio.file.Path, Option[java.nio.file.Path]) => (S, Int))(
        assertEq: (S, S) => Unit): Unit = {
      val src = java.nio.file.Files.createTempDirectory(s"${label}_resume_src")
      val ckpt = java.nio.file.Files.createTempDirectory(s"${label}_resume_ck")
      val full = java.nio.file.Files.createTempDirectory(s"${label}_resume_fl")
      StreamingOps.stageOne(el, full, "all")
      val (ref, _) = run(full, None)
      StreamingOps.stageOne(chunkOf(0), src, "chunk0")
      val (s1, n1) = run(src, Some(ckpt))
      assert(n1 == 1, s"$label: phase 1 should fold one batch, got $n1")
      StreamingOps.stageOne(chunkOf(1), src, "chunk1")
      StreamingOps.stageOne(chunkOf(2), src, "chunk2")
      val (s2, n2) = run(src, Some(ckpt))
      assert(n2 == 3, s"$label: resume should total 3 batches, got $n2")
      assertEq(s2, ref)
      val (s3, n3) = run(src, Some(ckpt))
      assert(n3 == 3, s"$label: idle restart re-folded a batch")
      assertEq(s3, ref)
      val _ = s1
      Seq(src, ckpt, full).foreach(rmTree)
    }
    def eqLongArrayMap(a: Map[String, Array[Long]],
        b: Map[String, Array[Long]]): Unit = {
      assert(a.keySet == b.keySet)
      a.foreach { case (k, arr) => assert(arr.toSeq == b(k).toSeq,
        s"key $k: resumed buffer differs from the one-pass fold") }
    }

    val wq = Sketches.windowQuantileElements(ev)
    choreograph("wq", wq,
      i => wq.where(pmod(col("event_id"), lit(3)) === i),
      (s, c) => StreamingOps.windowQuantileRun(spark, s, wq.schema, c))(eqLongArrayMap)

    val wd = Sketches.activityElements(ev)
    choreograph("wd", wd,
      i => wd.where(pmod(xxhash64(col("e")), lit(3)) === i),
      (s, c) => StreamingOps.kmvMapFoldRun(spark, s, wd.schema, 1, "d", 256,
        c))(eqLongArrayMap)

    val se = Sketches.setElements(ev)
    choreograph("se", se,
      i => se.where(pmod(xxhash64(col("e")), lit(3)) === i),
      (s, c) => StreamingOps.kmvMapFoldRun(spark, s, se.schema, 1, "t",
        Sketches.setAlgebraK, c))(eqLongArrayMap)

    val sh = Queries.shardShuffleElements(docs)
    choreograph("sh", sh,
      i => sh.where(pmod(col("doc_id"), lit(3)) === i),
      (s, c) => StreamingOps.shardShuffleRun(spark, s, sh.schema, c)) {
      (a, b) => assert(a == b, "resumed shard manifest differs from one-pass")
    }
  }

  test("ridge quality model: exact solve, streamed == batch, kill-and-resume") {
    import graft.ops.QualityModel
    import graft.streaming.StreamingOps
    // the solved betas satisfy the integer normal equations (A β = b) to
    // double rounding — validates the BigInt Cramer route end-to-end
    val docs3 = docs.select(col("doc_id"), col("text"), col("n_chars"))
    val st = QualityModel.sufficient(QualityModel.features(docs3))
    assert(st.n == docs3.count() && st.s11 > 0 && st.t0 > 0)
    val (b0, b1, b2) = QualityModel.solve(st)
    def d(x: BigInt) = x.toDouble
    val r0 = (d(st.n + 1) * b0 + d(st.s1) * b1 + d(st.s2) * b2) - d(st.t0)
    val r1 = (d(st.s1) * b0 + d(st.s11 + 1) * b1 + d(st.s12) * b2) - d(st.t1)
    val r2 = (d(st.s2) * b0 + d(st.s12) * b1 + d(st.s22 + 1) * b2) - d(st.t2)
    val scale = math.max(1.0, d(st.t2).abs)
    assert(math.abs(r0) / scale < 1e-9 && math.abs(r1) / scale < 1e-9 &&
      math.abs(r2) / scale < 1e-9,
      s"normal-equation residuals too large: $r0 $r1 $r2")

    // streamed sufficient statistics land on the bit-identical model
    val streamed = StreamingOps.streamQualityRidge(spark, dir)
      .collect().map(_.toString)
    val batch = QualityModel.ridgeQuality(docs3).collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      "additive training statistics must not depend on micro-batch chunking")

    // kill-and-resume: phase 1 folds one chunk, driver "dies", fresh run
    // restores the accumulator and folds only the remainder
    val src = java.nio.file.Files.createTempDirectory("ridge_resume_src")
    val ckpt = java.nio.file.Files.createTempDirectory("ridge_resume_ckpt")
    StreamingOps.stageOne(docs3.where(pmod(col("doc_id"), lit(3)) === 0), src, "chunk0")
    val (s1, n1) = StreamingOps.ridgeRun(spark, src, docs3.schema, Some(ckpt))
    assert(n1 == 1 && s1.n > 0)
    StreamingOps.stageOne(docs3.where(pmod(col("doc_id"), lit(3)) === 1), src, "chunk1")
    StreamingOps.stageOne(docs3.where(pmod(col("doc_id"), lit(3)) === 2), src, "chunk2")
    val (s2, n2) = StreamingOps.ridgeRun(spark, src, docs3.schema, Some(ckpt))
    assert(n2 == 3 && s2 == st,
      "resumed sufficient statistics differ from the one-pass batch aggregation")
    val (s3, n3) = StreamingOps.ridgeRun(spark, src, docs3.schema, Some(ckpt))
    assert(n3 == 3 && s3 == st, "idle restart changed the accumulator")
    Seq(src, ckpt).foreach(rmTree)
  }

  test("centroid outliers: globally the lowest best-centroid cosines, ascending") {
    val out = Similarity.centroidOutliers(embeddings, nBuckets = 16, topN = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 50)
    assert(out.forall(t => t._3 >= -1.0 - 1e-12 && t._3 <= 1.0 + 1e-12))
    assert(out.sliding(2).forall(p => p(0)._3 <= p(1)._3),
      "outliers must be emitted worst (lowest cosine) first")
    // ground truth: driver-side best-centroid cosine per vector (same
    // left-to-right fold as the native expression), 50 smallest
    val cents = Similarity.trainCentroids(embeddings, 16).orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val vecs = embeddings.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val best = vecs.map { case (id, v) =>
      val scored = cents.map { case (bkt, c) => (cos(v, c), -bkt, bkt) }
      (id, scored.max)
    }
    val expected = best.sortBy { case (id, (sim, _, _)) => (sim, id) }
      .take(50).map { case (id, (sim, _, bkt)) => (id, bkt, sim) }.toSeq
    assert(out.toSeq == expected,
      "operator result must equal the exact driver-side recompute bit-for-bit")
  }

  test("snapshot diff: status partition matches the derivation buckets exactly") {
    import graft.functions.HashOps
    val out = graft.ops.PipelineOps.snapshotDiff(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val h = docs.select(col("doc_id"),
      pmod(HashOps.md5Low64(concat(lit("v2|"), col("doc_id").cast("string"))),
        lit(20L)).as("h")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expRemoved = h.filter(_._2 == 0L).keySet
    val expChanged = h.filter(_._2 == 1L).keySet
    val expAdded = h.filter(_._2 == 2L).keys.map(_ + 100000000L).toSet
    assert(out.collect { case (id, "removed", _) => id }.toSet == expRemoved)
    assert(out.collect { case (id, "changed", _) => id }.toSet == expChanged)
    assert(out.collect { case (id, "added", _) => id }.toSet == expAdded)
    assert(expRemoved.nonEmpty && expChanged.nonEmpty && expAdded.nonEmpty,
      "derivation must exercise all three statuses at test scale")
    // per-status totals ride on every row and agree with the partition
    out.groupBy(_._2).foreach { case (status, rows) =>
      assert(rows.map(_._3).distinct.toSeq == Seq(rows.size.toLong),
        s"status_total wrong for $status")
    }
    // delta only: no 'unchanged' rows, ids unique
    assert(out.map(_._1).distinct.length == out.length)
    assert(!out.exists(_._2 == "unchanged"))
  }

  test("quote attribution: every mangled quote resolves at full containment") {
    val out = TextOps.quoteAttribution(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))
    assert(out.nonEmpty, "the md5-7th split must yield queries at test scale")
    // the true source contains all 7 query words, so the winner must too
    out.foreach { case (qid, isSelf, matched, shared, nq, cont) =>
      assert(shared == nq && cont == 1.0,
        s"quote $qid: winner $matched has containment $cont (< 1.0)")
      assert(isSelf == (qid == matched))
    }
    // one row per query, and at least one query resolves to itself
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.exists(_._2), "no quote resolved to its own source")
  }

  test("streamed dataset diff is bit-equal to the batch snapshot diff") {
    val streamed = graft.streaming.StreamingOps.streamDatasetDiff(spark, dir)
      .collect().map(_.toString)
    val batch = graft.ops.PipelineOps.snapshotDiff(docs)
      .collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      "per-arrival verdicts + at-close anti-join must reproduce the batch diff")
  }

  test("streamed cdc merge is bit-equal to the batch merge") {
    val streamed = graft.streaming.StreamingOps.streamCdcMerge(spark, dir)
      .collect().map(_.toString)
    val batch = SparkEntry.queries("pipeline_cdc_merge")(spark, dir)
      .collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      "associative per-bucket changelog folding must reproduce the batch merge")
  }

  test("cdc compaction folds associatively across arbitrary chunkings") {
    // split the feed into 3 chunks by a hash UNALIGNED with keys (ops for
    // one key land in different chunks), fold incrementally in two orders,
    // and require both to equal the one-pass compaction bit-for-bit
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val log = Queries.cdcLog(o).localCheckpoint()
    val chunk = pmod(xxhash64(col("k"), col("seq")), lit(3L))
    val chunks = (0 to 2).map(i => log.where(chunk === i))
    def fold(order: Seq[Int]): Seq[String] =
      Queries.cdcCompact(order.map(chunks).reduce { (st, nx) =>
        Queries.cdcCompact(st).unionByName(nx)
      }).orderBy(col("k")).collect().map(_.toString).toSeq
    val onePass = Queries.cdcCompact(log)
      .orderBy(col("k")).collect().map(_.toString).toSeq
    assert(onePass.nonEmpty && fold(Seq(0, 1, 2)) == onePass &&
      fold(Seq(2, 0, 1)) == onePass,
      "arg-max-by-seq with retained seq must be chunking/order-independent")
  }

  test("label propagation: labels are exact k-hop min-id basins") {
    val sp = spark
    import sp.implicits._
    // path 1-…-9 plus a triangle {20,21,22}: radius semantics are visible
    // on the path (min reaches exactly 3 hops), totality on the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 9L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("u", "v")
    val got = graft.ops.Graph.labelPropagation(edges, rounds = 3, parts = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (1L to 9L).map(k => k -> math.max(1L, k - 3)).toMap ++
      Map(20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == expected, s"3-hop min basins wrong: $got")
  }

  test("schema drift profiler flags the planted null-rate and distinct drifts") {
    val rows = SparkEntry.queries("diag_schema_drift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(rows.size == 6, s"expected 6 metric rows, got ${rows.size}")
    val (n1, n2, nd) = rows(("lang", "nulls"))
    assert(n1 == 0.0 && n2 > 0 && nd, s"planted lang nulls must drift: $n1 -> $n2")
    val (l1, l2, ld) = rows(("lang", "n_distinct"))
    assert(l2 == l1 + 1 && ld, s"'xx' must add one lang: $l1 -> $l2")
    val (s1, s2, sd) = rows(("source", "n_distinct"))
    assert(s2 == s1 + 1 && sd, s"'crawl_v2' must add one source: $s1 -> $s2")
  }

  test("dataset diff kill-and-resume: idempotent batch dirs + engine checkpoint") {
    import graft.ops.PipelineOps
    import graft.streaming.StreamingOps
    val v1 = PipelineOps.v1Fingerprints(docs).persist()
    val v2 = PipelineOps.v2Fingerprints(docs)
    val src = java.nio.file.Files.createTempDirectory("diff_resume_src")
    val work = java.nio.file.Files.createTempDirectory("diff_resume_work")
    val ckpt = java.nio.file.Files.createTempDirectory("diff_resume_ckpt")
    StreamingOps.stageOne(v2.where(pmod(col("doc_id"), lit(3)) === 0), src, "chunk0")
    val s1 = StreamingOps.diffRun(spark, src, v2.schema, v1, work, Some(ckpt), 1)
    assert(s1.size == 1, s"phase 1 should fold one batch, got ${s1.size}")
    // driver "dies"; the rest of v2 lands; a fresh run over the same
    // checkpoint + work dir folds ONLY the new batches (engine checkpoint
    // skips the committed one; its output dirs are already on disk)
    StreamingOps.stageOne(v2.where(pmod(col("doc_id"), lit(3)) === 1), src, "chunk1")
    StreamingOps.stageOne(v2.where(pmod(col("doc_id"), lit(3)) === 2), src, "chunk2")
    val s2 = StreamingOps.diffRun(spark, src, v2.schema, v1, work, Some(ckpt), 1)
    assert(s2.size == 2 && (s1 & s2).isEmpty,
      s"resume must fold exactly the two new batches, got $s2")
    val streamed = StreamingOps.diffAssemble(spark, v1, work)
      .collect().map(_.toString)
    val batch = PipelineOps.snapshotDiff(docs).collect().map(_.toString)
    assert(streamed.toSeq == batch.toSeq,
      "resumed diff differs from the one-pass batch diff")
    v1.unpersist()
    Seq(src, work, ckpt).foreach(rmTree)
  }

  test("source round-trips (jsonl, csv) are lossless on planted hard content") {
    // direct recompute of the planted projection — NO round-trip
    val gnarly = " \"q,uo|te\"\nüñïçødé \\back\tslash"
    val direct = docs.select(col("doc_id"), col("lang"),
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(gnarly)))
          .when(pmod(col("doc_id"), lit(10)) === 5,
            concat(lit(" "), col("text"), lit("  ")))
          .when(pmod(col("doc_id"), lit(10)) === 3, lit(""))
          .otherwise(col("text")).as("text"))
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("int").as("n_chars_rt"),
        md5(col("text")).as("fp"))
      .orderBy(col("doc_id")).collect().map(_.toString)
    assert(direct.exists(_.contains("slash")) == false) // fp/len only
    for (q <- Seq("source_jsonl_roundtrip", "source_csv_roundtrip",
        "source_orc_roundtrip")) {
      val rt = SparkEntry.queries(q)(spark, dir).collect().map(_.toString)
      assert(rt.toSeq == direct.toSeq, s"$q lost content in the round-trip")
    }
  }

  test("streamed ewma (bounded ring state) is bit-equal to the batch window") {
    val streamed = graft.streaming.StreamingOps.streamEwma(spark, dir)
      .collect().map(_.toString)
    val batch = SparkEntry.queries("window_ewma")(spark, dir)
      .collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      "ring-state fold must reproduce the batch window exactly")
  }

  test("ewma: exact BigInt recompute and pandas adjust=True semantics") {
    val out = SparkEntry.queries("window_ewma")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    // group daily integer totals driver-side and replay the exact fold
    val daily = graft.streaming.StreamingOps.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
          .cast("long").as("v4"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v4")).as("d4")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), BigInt(r.getLong(2)))).toMap
    val series = daily.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    out.foreach { case (et, day, dv, n, ewma) =>
      val days = series(et)
      val idx = days.indexOf(day)
      val win = days.slice(math.max(0, idx - 31), idx + 1)
      assert(win.size == n)
      val num = win.zipWithIndex
        .map { case (d, i) => daily((et, d)) * (BigInt(1) << i) }.sum
      val denom = ((BigInt(1) << n) - 1) * 10000
      val expected =
        java.lang.Double.parseDouble(num.toString) / denom.toDouble
      assert(ewma == expected, s"($et,$day): $ewma != exact $expected")
      assert(dv == java.lang.Double.parseDouble(daily((et, day)).toString) / 10000.0)
      // a weighted mean must sit inside the window's value range
      val lo = win.map(d => daily((et, d))).min.toDouble / 10000.0
      val hi = win.map(d => daily((et, d))).max.toDouble / 10000.0
      assert(ewma >= lo - 1e-9 && ewma <= hi + 1e-9)
    }
  }

  test("semdedup: witness is the LOWEST qualifying lower-id neighbor; kept iff none") {
    val tau = 0.3
    val out = Similarity.semDedupPrune(embeddings, threshold = tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(out.map(_._1).toSet.size == out.size, "one decision row per vector")
    // brute-force ground truth: all lower-id same-block neighbors above tau
    val e = embeddings.select(col("vec_id"), col("label"),
      Similarity.asDouble(col("embedding")).as("v")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = e.map(t => t._1 -> t).toMap
    out.foreach { case (id, block, kept, witness) =>
      val (_, lbl, v) = byId(id)
      assert(lbl == block)
      val qualifying = e.filter(t => t._2 == lbl && t._1 < id && cos(t._3, v) >= tau)
        .map(_._1)
      if (kept) assert(witness.isEmpty && qualifying.isEmpty,
        s"vec $id kept but has qualifying neighbors ${qualifying.take(3).toSeq}")
      else assert(witness.contains(qualifying.min),
        s"vec $id witness $witness != min qualifying ${qualifying.min}")
    }
  }

  test("tfidf: ranks are 1..k per doc, scores descend, score == tf*N/df exactly") {
    val n = docs.count()
    val out = TextOps.tfidfTopK(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.size == docs.count(), "every document gets ranked terms")
    byDoc.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      val scores = sorted.map(_._6).toSeq
      assert(scores == scores.sorted.reverse, "scores descend with rank")
    }
    out.foreach { case (_, _, _, tf, df, score) =>
      assert(score == (tf * n).toDouble / df, "exact-rational score surface")
    }
    // df sanity: a token appearing in every doc scores N/df == 1 per occurrence
    assert(out.forall { case (_, _, _, tf, df, _) => tf >= 1 && df >= 1 && df <= n })
  }

  test("bottom-k sample sketch: merge-order independent, duplicates are no-ops") {
    val bk = new graft.ops.BottomKSample(16)
    val rows = (0 until 200).map(i => ("g", i.toLong, i.toDouble * 1.5))
    // three adversarial accumulation shapes must land on the SAME buffer:
    // sequential, shuffled + uneven partitions, and with every row replayed
    val seq1 = rows.foldLeft(bk.zero)(bk.reduce)
    val shuffled = scala.util.Random.javaRandomToRandom(new java.util.Random(3))
      .shuffle(rows)
    val seq2 = shuffled.grouped(37).toSeq
      .map(p => p.foldLeft(bk.zero)(bk.reduce))
      .reduce(bk.merge)
    val seq3 = (rows ++ rows).foldLeft(bk.zero)(bk.reduce)
    assert(seq1.toSeq == seq2.toSeq, "merge order changed the retained sample")
    assert(seq1.toSeq == seq3.toSeq, "replayed rows must be no-ops")
    assert(seq1.length == 48, "buffer holds exactly k (hash, id, bits) triples")
    // the retained triples are the k smallest (hash, id) composite keys of
    // the whole key set — the oracle's ORDER BY hs, event_id tie-break
    val allKeys = rows.map(t =>
      (graft.ops.Sketches.md5Low64String(t._2.toString), t._2))
    val expect = allKeys.sorted.take(16)
    assert((0 until 16).map(i => (seq1(3 * i), seq1(3 * i + 1))) == expect)
  }

  test("quantile bottom-k: DKW band holds, sample caps at k, est within group range") {
    val events = graft.streaming.StreamingOps.events(spark, dir)
    val out = ops.Sketches.quantileBottomK(events).collect()
    assert(out.nonEmpty && out.length % 4 == 0, "4 quantiles per event_type")
    val nByType = events.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (et, q, n, m) = (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3))
      assert(n == nByType(et))
      assert(m == math.min(256L, n).toInt, "sample_m must be min(k, group size)")
      val (est, estRank, exactQ, rankErr, ok) =
        (r.getDouble(4), r.getLong(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8))
      assert(ok && rankErr <= 0.1, s"$et q=$q rank error $rankErr")
      assert(rankErr == math.abs(estRank.toDouble / n - q))
      // both the estimate and the exact quantile are real data values
      assert(estRank >= 1 && estRank <= n)
      assert((est <= exactQ) == (estRank <= math.ceil(q * n)) ||
        est == exactQ, "rank ordering consistent with value ordering")
    }
  }

  test("streamed quantile sketch is bit-equal to the batch sketch") {
    // merge-order independence: the accumulated per-chunk bottom-k buffers
    // must land on the same retained sample as one batch pass, so the two
    // audits agree on every double
    val batch = ops.Sketches.quantileBottomK(
      graft.streaming.StreamingOps.events(spark, dir))
      .collect().map(_.toString).toSeq
    val streamed = graft.streaming.StreamingOps.streamQuantileBottomK(spark, dir)
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("anomaly z-score: planted spike flagged, moments match brute force") {
    val out = Queries.all("window_anomaly_zscore")(spark, dir).collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6)))
    assert(out.nonEmpty)
    // the planted 200-event spike must be an unmistakable click anomaly
    val spikes = out.filter(r => r._1 == "click" && r._3 >= 200)
    assert(spikes.nonEmpty && spikes.forall(r => r._7 && r._6.exists(_ > 10)),
      s"planted spike not flagged: ${spikes.toSeq}")
    out.foreach { case (_, _, n, mean, variance, z, flag) =>
      z match {
        case Some(zv) =>
          assert(variance > 0.0)
          assert(zv == (n.toDouble - mean) / math.sqrt(variance))
          assert(flag == (math.abs(zv) > 3.0))
        case None => assert(!flag && variance <= 0.0)
      }
    }
    // brute-force the trailing-24 moments for every scored bucket
    out.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._2)
      // the query only emits rows with a full 24-bucket baseline, so the
      // first emitted bucket's baseline is not recomputable here; verify
      // every bucket whose 24 predecessors are all present in the output
      // ordered(m) is hourly row m+24 (the first 24 per type lack a full
      // baseline and are dropped), so its baseline is ordered(m-24..m-1)
      ordered.indices.drop(24).foreach { i =>
        val s1 = (i - 24 until i).map(ordered(_)._3).sum
        assert(ordered(i)._4 == s1.toDouble / 24.0)
      }
    }
  }

  test("interval overlap join matches brute force, emits each pair once") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // spans chosen around the bin width so pairs often share several bins —
    // the dedup-by-first-shared-bin predicate is what's under test
    val as = (0 until 60).map { i =>
      val st = rnd.nextInt(5000).toLong
      (i.toLong, st, st + 1 + rnd.nextInt(700))
    }
    val bs = (0 until 40).map { j =>
      val st = rnd.nextInt(5000).toLong
      (j.toLong, st, st + 1 + rnd.nextInt(700))
    }
    val got = graft.ops.RangeJoin.intervalOverlap(
        as.toDF("a_id", "a_start", "a_end"), bs.toDF("b_id", "b_start", "b_end"),
        "a_start", "a_end", "b_start", "b_end", binWidth = 256L)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (ai, as1, ae) <- as
      (bi, bs1, be) <- bs
      if as1 < be && bs1 < ae
    } yield (ai, bi)
    assert(got.length == got.toSet.size, "a pair must appear exactly once")
    assert(got.toSet == want.toSet,
      s"missing=${(want.toSet -- got.toSet).take(5)} extra=${(got.toSet -- want.toSet).take(5)}")
    assert(want.nonEmpty)
  }

  test("prefix-filter jaccard matches brute force and the minhash route") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val base = (0 until 90).map { i =>
      val len = 8 + rnd.nextInt(18)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    // planted: exact dup, one-word edit (high J), and a short-doc pair
    val docs = base ++ Seq(
      (200L, base(0)._2), (201L, base(1)._2.replaceFirst("\\w+$", "omega")),
      (202L, "red blue"), (203L, "red blue"))
    val got = graft.ops.Dedup.jaccardPrefixPairs(
        docs.toDF("doc_id", "text"), tNum = 7, tDen = 10, parts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // ground truth: brute-force exact jaccard over the SAME shingle sets
    val sets = graft.ops.Dedup.withShingles(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys; if a < b
      c = (sets(a) & sets(b)).size
      u = (sets(a) | sets(b)).size
      if u > 0 && c * 17 >= (sets(a).size + sets(b).size) * 7
    } yield (a, b) -> (c.toDouble / u)).toMap
    assert(want.nonEmpty && want.keySet.exists(_._1 == 202L),
      "planted short-doc pair must qualify")
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
    // route equality on the real corpus: deterministic prefix recall ==
    // the 4e-10-miss-probability minhash banding, pair for pair
    val real = "/root/testdata/sf0.001"
    val viaPrefix = Queries.all("dedup_jaccard_prefix")(spark, real)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaMinhash = Queries.all("dedup_minhash_lsh")(spark, real)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaPrefix == viaMinhash && viaPrefix.nonEmpty)
  }

  test("interval agg sweep matches brute force incl. boundary ties and empty intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val pts = (0 until 400).map { i =>
      // quantize a quarter of the timestamps onto multiples of 100 so many
      // land EXACTLY on interval boundaries (the inclusive-BETWEEN tie path)
      val t = if (i % 4 == 0) (rnd.nextInt(50) * 100).toLong else rnd.nextInt(5000).toLong
      (t, BigDecimal(rnd.nextInt(2001) - 1000) / 100) // negative values too
    }
    val ivs = (0 until 80).map { j =>
      val st = (rnd.nextInt(50) * 100).toLong
      // zero-width, short, and multi-bucket spans; some fall past the data
      val span = j % 5 match {
        case 0 => 0L
        case 1 => 1L + rnd.nextInt(80)
        case _ => 1L + rnd.nextInt(1500)
      }
      (j.toLong, st, st + span)
    } :+ ((80L, 9000L, 9500L)) // entirely outside the point span: empty
    val got = graft.ops.RangeJoin.intervalAggSweep(
        pts.toDF("ts", "value"), ivs.toDF("wid", "st", "en"),
        "ts", "st", "en", "value", idCols = Seq("wid"), bucketWidth = 256L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros.doubleValue))).toMap
    assert(got.size == ivs.length, "every interval emits exactly one row")
    ivs.foreach { case (wid, st, en) =>
      val in = pts.filter(p => p._1 >= st && p._1 <= en)
      val (c, v) = got(wid)
      assert(c == in.length.toLong, s"wid=$wid count")
      assert(v == in.map(_._2).sum.doubleValue, s"wid=$wid sum")
    }
    assert(got(80L) == ((0L, 0.0)), "out-of-span interval retained as empty")
  }

  test("upsampling mixture: copies bounded by rate, shares approach targets") {
    val out = Queries.all("pipeline_mix_upsample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(out.nonEmpty)
    out.foreach { case (_, nDocs, nCopies, tokBefore, tokAfter, rate, _, _) =>
      assert(rate >= 1.0, "upsampling never drops a document")
      val lo = nDocs * math.floor(rate).toLong
      assert(nCopies >= lo && nCopies <= lo + nDocs,
        s"copies $nCopies outside [$lo, ${lo + nDocs}]")
      assert(tokAfter >= tokBefore)
    }
    // the most overrepresented language keeps exactly rate 1 -> no copies
    val anchor = out.minBy(_._6)
    assert(anchor._6 == 1.0 && anchor._2 == anchor._3)
    // achieved shares land near the targets (law of large numbers at n>=64)
    out.foreach { case (lang, _, _, _, _, _, target, after) =>
      assert(math.abs(after - target) < 0.05, s"$lang share $after vs $target")
    }
    assert(math.abs(out.map(_._8).sum - 1.0) < 1e-12)
  }

  test("streamed anomaly detector is bit-equal to the batch scorer") {
    val batch = Queries.all("window_anomaly_zscore")(spark, dir)
      .collect().map(_.toString).toSeq
    val streamed = graft.streaming.StreamingOps.streamAnomalyZscore(spark, dir)
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("nearest asof join matches brute force on both directions") {
    val ev = graft.streaming.StreamingOps.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val errsByUser = ev.filter(_._4 == "error").groupBy(_._1)
    val out = Queries.all("join_asof_nearest")(spark, dir).collect()
    assert(out.nonEmpty)
    val clicks = ev.filter(_._4 == "click")
    assert(out.length == clicks.length, "one output row per click")
    out.foreach { r =>
      val (uid, ts) = (r.getLong(0), r.getLong(2))
      val errs = errsByUser.getOrElse(uid, Array.empty)
      val back = errs.filter(_._3 <= ts).sortBy(e => (e._3, e._2)).lastOption
      val fwd = errs.filter(_._3 > ts).sortBy(e => (e._3, e._2)).headOption
      back match {
        case Some(b) => assert(r.getLong(4) == b._3, s"back ts for $uid@$ts")
        case None => assert(r.isNullAt(3))
      }
      fwd match {
        case Some(f) => assert(r.getLong(6) == f._3, s"fwd ts for $uid@$ts")
        case None => assert(r.isNullAt(5))
      }
      // nearest = smaller absolute gap, tie -> backward; delta signed
      (back, fwd) match {
        case (None, None) => assert(r.isNullAt(7) && r.isNullAt(8))
        case (Some(b), None) => assert(r.getLong(8) == b._3 - ts)
        case (None, Some(f)) => assert(r.getLong(8) == f._3 - ts)
        case (Some(b), Some(f)) =>
          val expected = if (ts - b._3 <= f._3 - ts) b._3 - ts else f._3 - ts
          assert(r.getLong(8) == expected)
      }
    }
  }

  test("dataset card: planted duplicate mass accounted, rates consistent") {
    val rows = Queries.all("pipeline_dataset_card")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7), r.getDouble(8)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nDocs, nFp, nDup, totTok, meanTok, nKeep, keepRate) =>
      assert(nDocs == nFp + nDup && nDup >= 0)
      assert(nKeep >= 0 && nKeep <= nDocs)
      assert(meanTok == totTok.toDouble / nDocs)
      assert(keepRate == nKeep.toDouble / nDocs)
    }
    // every 50th doc is planted verbatim -> corpus-wide duplicate mass is
    // exactly the planted count (the natural corpus has no exact dups here)
    val planted = docs.where(pmod(col("doc_id"), lit(50)) === 0).count()
    assert(planted > 0 && rows.map(_._5).sum == planted)
    // the card covers every (lang, source) combination in the corpus
    assert(rows.length ==
      docs.select(col("lang"), col("source")).distinct().count())
  }

  test("ts decomposition: trend edges, per-month seasonal, exact identity") {
    val rows = Queries.all("ts_decompose")(spark, dir).collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getInt(2),
        r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    assert(rows.nonEmpty)
    val bySeries = rows.groupBy(_._1)
    bySeries.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._2)
      val n = ordered.length
      ordered.zipWithIndex.foreach { case ((_, _, moy, y, trend, seas, resid), i) =>
        // 12-month centered window exists only for interior rows
        assert(trend.isDefined == (i >= 6 && i <= n - 6),
          s"trend defined at position $i of $n")
        assert(resid.isDefined == trend.isDefined)
        // exact decomposition identity where defined
        resid.foreach(r => assert(r == y - trend.get - seas))
        // trend == mean of the surrounding 12 observations, via exact r4
        trend.foreach { tr =>
          val win = (i - 6 to i + 5).map(j => math.round(ordered(j)._4 * 10000))
          assert(tr == win.sum.toDouble / 120000.0)
        }
        assert(moy >= 1 && moy <= 12)
      }
      // seasonal is a pure function of (series, month-of-year)
      ordered.groupBy(_._3).foreach { case (_, ms) =>
        assert(ms.map(_._6).distinct.length == 1)
      }
    }
  }

  test("late data: watermark drops exactly the closed-window stragglers") {
    val rows = Queries.all("stream_late_data")(spark, dir).collect()
      .map(r => (r.get(0) != null, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (hasDay, et, total, onTime, dropped, sum) =>
      assert(hasDay && et != "sentinel")
      assert(onTime + dropped == total && onTime >= 0 && dropped >= 0)
      if (onTime == 0) assert(sum == 0.0, "fully-late windows sum to zero")
    }
    // non-vacuity both ways: the straggler batch really lost rows to the
    // watermark, and the on-time batch really landed
    assert(rows.exists(_._5 > 0), "no late rows were dropped")
    assert(rows.exists(_._4 > 0), "no on-time rows survived")
    // total events are fully accounted between on-time and dropped
    val nEvents = graft.streaming.StreamingOps.events(spark, dir).count()
    assert(rows.map(_._3).sum == nEvents)
  }

  test("gopher rules: planted suffixes drive the bullet/ellipsis/symbol rules") {
    val out = Queries.all("text_gopher_rules")(spark, dir).collect()
    assert(out.nonEmpty)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    byId.foreach { case (id, r) =>
      val nWords = r.getInt(1)
      val fracBullet = r.getDouble(5)
      val fracEllipsis = r.getDouble(6)
      // every 7th doc ends with a planted "..." and (single logical line
      // unless also bulleted) must fail the ellipsis-line rule
      if (id % 7 == 0 && id % 11 != 0)
        assert(fracEllipsis == 1.0 && !r.getBoolean(12),
          s"doc $id should fail the ellipsis rule")
      // every 11th doc gains 3 bullet lines on top of its 1 natural line
      if (id % 11 == 0)
        assert(fracBullet == 0.75 && r.getBoolean(11),
          s"doc $id should carry 3/4 bullet lines")
      if (id % 5 != 0 && id % 7 != 0)
        assert(r.getDouble(3) == 0.0, s"doc $id has no planted symbols")
      // keep == conjunction of the seven flags
      val flags = (8 to 14).map(r.getBoolean)
      assert(r.getBoolean(15) == flags.forall(identity))
      assert(nWords >= 1)
    }
    // the 50-word rule must split the natural corpus both ways
    assert(out.exists(_.getBoolean(8)) && out.exists(!_.getBoolean(8)))
  }

  test("novelty: a planted verbatim duplicate zeroes both copies' novelty") {
    val out = Queries.all("text_novelty")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == docs.count())
    out.foreach { case (_, nSh, nNovel, ratio) =>
      assert(nSh >= 1 && nNovel >= 0 && nNovel <= nSh)
      assert(ratio == nNovel.toDouble / nSh)
    }
    assert(out.exists(_._4 > 0.5), "the corpus should contain fresh content")
    // plant a verbatim copy of the first doc under a new id: a doc sharing
    // ALL its shingles with another must score exactly 0 novelty — on BOTH
    val minId = docs.agg(min(col("doc_id"))).head().getLong(0)
    val dup = docs.where(col("doc_id") === minId)
      .select(lit(9000L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
    val withDup = TextOps.noveltySignals(docs.unionByName(dup)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(withDup(minId) == 0.0 && withDup(9000L) == 0.0,
      s"duplicated docs scored ${withDup(minId)} / ${withDup(9000L)}")
  }

  test("random projection: exact 2x-linearity, stable bits, JL ratio sane") {
    import spark.implicits._
    val base = embeddings.limit(8)
    val doubled = base.select(col("vec_id") + 1000L as "vec_id",
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"),
      col("label"))
    val out = Similarity.randomProjection(base.unionAll(doubled))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    out.keys.filter(_ < 1000L).foreach { id =>
      val (bits, p0, p1, p2, p3, jl) = out(id)
      val (bits2, q0, q1, q2, q3, jl2) = out(id + 1000L)
      // scaling by a power of two commutes with IEEE rounding, so the
      // projection is EXACTLY homogeneous and the signs (bits) identical
      assert(bits == bits2)
      assert(q0 == 2 * p0 && q1 == 2 * p1 && q2 == 2 * p2 && q3 == 2 * p3)
      assert(jl == jl2, "JL ratio is scale-invariant")
      assert(jl > 0.05 && jl < 5.0, s"JL ratio $jl wildly off its mean of 1")
    }
    // determinism: a second run reproduces the projection bit-for-bit
    val again = Similarity.randomProjection(base).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.keys.filter(_ < 1000L).foreach(id => assert(again(id) == out(id)._2))
  }

  test("entity resolution: pigeonhole recall, verified distances, honest ambiguity") {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val res = graft.ops.EntityResolution.resolve(customer)
    val rows = res.collect()
    // deterministic recall: every planted dirty record resolves (the true
    // source is always reachable through at least one clean block triple)
    val expectedDirty = customer
      .select(concat(lit("Customer#"),
        lpad(col("c_custkey").cast("string"), 12, "0")).as("canon"))
      .where(pmod(graft.functions.HashOps.md5Low64(
        concat(lit("er-sel|"), col("canon"))), lit(4L)) === 0L)
      .count()
    assert(rows.length == expectedDirty && rows.nonEmpty)
    rows.foreach { r =>
      val dist = r.getAs[Int]("dist")
      val correct = r.getAs[Boolean]("correct")
      assert(dist == 0 || dist == 1)
      assert(r.getAs[Long]("n_cand") >= 1L)
      // a dist-0 hit is by construction a DIFFERENT entity whose id the
      // corruption happened to recreate — never the true source
      if (dist == 0) assert(!correct)
      if (correct) assert(dist == 1)
    }
    // the corruption is recoverable for the vast majority: acctbal
    // corroboration breaks dist-1 ties toward the true source
    val nCorrect = rows.count(_.getAs[Boolean]("correct"))
    assert(nCorrect.toDouble / rows.length > 0.8,
      s"only $nCorrect/${rows.length} resolved correctly")
  }

  test("MMR rerank: rank-1 is the relevance argmax; selections distinct and penalty-consistent") {
    val res = Similarity.mmrRerank(embeddings, queryId = 0L).collect()
    assert(res.length == 8)
    val ids = res.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 8)
    // rank 1 == exact brute-force top-1 (same fold, same tie-break)
    val top1 = Similarity.bruteForceTopK(embeddings, 0L, 1).collect()(0)
    val r1 = res.find(_.getAs[Int]("rank") == 1).get
    assert(r1.getAs[Long]("vec_id") == top1.getLong(0))
    assert(r1.getAs[Double]("relevance") == top1.getDouble(1))
    assert(r1.getAs[Double]("max_sim") == 0.0)
    // every later pick: score = 0.5*rel - 0.5*max_sim exactly, and the
    // penalty is a real cosine in [-1, 1]
    res.filter(_.getAs[Int]("rank") > 1).foreach { r =>
      val (rel, ms, sc) = (r.getAs[Double]("relevance"),
        r.getAs[Double]("max_sim"), r.getAs[Double]("score"))
      assert(sc == 0.5 * rel - 0.5 * ms)
      assert(ms >= -1.0 && ms <= 1.0 + 1e-12)
    }
  }

  test("mojibake: planted corruptions detected and repaired to clean text") {
    val out = SparkEntry.queries("text_mojibake")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bad"), r.getAs[String]("repaired_fp"))).toMap
    val orig = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    orig.foreach { case (id, text) =>
      val (nBad, fp) = out(id)
      if (id % 13 == 0) {
        assert(nBad == 2L)
        // repair of the planted insertion: digraphs collapse to the
        // intended codepoints, everything else untouched
        val expected = text.substring(0, math.min(20, text.length)) +
          "é" + (if (text.length > 20) text.substring(20) else "") +
          "’"
        assert(fp == md5hex(expected), s"doc $id repair mismatch")
      } else if (id % 13 == 5) {
        assert(nBad == 2L)
        assert(fp == md5hex("“" + text + "ñ"))
      } else {
        assert(nBad == 0L)
        assert(fp == md5hex(text))
      }
    }
  }

  test("streaming entity resolution == batch (chunking-invariant verdicts)") {
    val batch = SparkEntry.queries("join_entity_resolution")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.queries("stream_entity_resolution")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("holt trend: coefficient dot products reproduce the exact rational recurrence") {
    import graft.ops.HoltTrend
    // exact simulation with BigInt numerators over denominator 4^t
    val ys = Vector[Long](31415L, -92653L, 58979L, 323846L, -2643L, 38327L,
      95028L, 84197L, 16939L, 93751L, 5820L, -97494L, 45923L, 7816L, 40628L, 6208L)
    for (n <- 1 to HoltTrend.W) {
      val w = ys.take(n)
      // simulate: state (Lnum, Bnum) scaled by 4^t at step t
      var l = BigInt(4) * w(0); var b = BigInt(0)
      for (t <- 2 to n) {
        // rescale previous 4^(t-1) values to 4^t, then halve per the
        // recurrence: l_t = (y_t + l + b)/2, b_t = (l_t - l + b)/2
        val l4 = 4 * l; val b4 = 4 * b
        val lNew = (BigInt(4).pow(t) * w(t - 1) + l4 + b4) / 2
        val bNew = (lNew - l4 + b4) / 2
        l = lNew; b = bNew
      }
      val (lc, bc) = HoltTrend.coefs(n - 1)
      val lDot = w.lazyZip(lc).map((y, c) => BigInt(y) * c).sum
      val bDot = w.lazyZip(bc).map((y, c) => BigInt(y) * c).sum
      assert(lDot == l, s"level coefficients diverge at n=$n")
      assert(bDot == b, s"trend coefficients diverge at n=$n")
    }
    // operator sanity on real data: a constant series has trend 0 and
    // level == the value; checked via the registered query's own output
    val out = SparkEntry.queries("window_holt_trend")(spark, dir).collect()
    assert(out.nonEmpty)
    out.filter(_.getAs[Int]("n_window") == 1).foreach { r =>
      assert(r.getAs[Double]("level") == r.getAs[Double]("daily_value"))
      assert(r.getAs[Double]("trend") == 0.0)
    }
  }

  test("truncation recall: exact agreement with brute-force top-k recompute") {
    val res = SparkEntry.queries("sim_truncation_recall")(spark, dir).collect()
    assert(res.length == 10)
    val fullTop = Similarity.bruteForceTopK(embeddings, 0L, 10).collect()
      .map(_.getLong(0)).toVector
    // full_vec_id column IS the brute-force ranking
    val gotFull = res.sortBy(_.getAs[Int]("k")).map(_.getAs[Long]("full_vec_id")).toVector
    assert(gotFull == fullTop)
    // recall@k: overlap counts against a driver recompute of the prefix-16
    // ranking (same fold via slice + cosine through the operator itself)
    val truncTop = res.sortBy(_.getAs[Int]("k")).map(_.getAs[Long]("trunc_vec_id")).toVector
    res.foreach { r =>
      val k = r.getAs[Int]("k")
      val expect = fullTop.take(k).toSet.intersect(truncTop.take(k).toSet).size
      assert(r.getAs[Long]("overlap") == expect.toLong)
      assert(r.getAs[Double]("recall") == expect.toDouble / k)
    }
  }

  test("streaming holt trend == batch window (exact coefficient fold in ring state)") {
    val batch = SparkEntry.queries("window_holt_trend")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.queries("stream_holt_trend")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("join-size estimate: deterministic CM overestimate, exact side verified") {
    val events = graft.streaming.StreamingOps.events(spark, dir)
    val res = SparkEntry.queries("diag_join_size_cm")(spark, dir).collect()
    assert(res.length == 1)
    val r = res(0)
    // exact side against an independent driver recompute
    val byUser = events.select(col("event_type"), col("user_id")).collect()
      .groupBy(_.getLong(1))
      .map { case (u, rows) =>
        u -> (rows.count(_.getString(0) == "error").toLong,
          rows.count(_.getString(0) == "click").toLong)
      }
    val exact = byUser.values.map { case (a, b) => a * b }.sum
    // sizes travel as decimal strings (int64 overflows at 100 TB join sizes)
    assert(BigInt(r.getAs[String]("exact_size")) == BigInt(exact))
    assert(r.getAs[Long]("n_a") == byUser.values.map(_._1).sum)
    assert(r.getAs[Long]("n_b") == byUser.values.map(_._2).sum)
    // the CM inner product bounds the join size from above DETERMINISTICALLY
    assert(r.getAs[Boolean]("overestimate"))
    assert(BigInt(r.getAs[String]("cm_estimate")) >= BigInt(exact))
    assert(exact > 0, "natural events corpus should share error/click users")
    assert(r.getAs[Double]("ratio") >= 1.0)
  }

  test("join-size estimate: disjoint key sets give exact = 0 and a NULL ratio, not Infinity") {
    import spark.implicits._
    val ev = Seq(
      (1L, "error", "2024-01-01 00:00:00"),
      (2L, "error", "2024-01-01 00:00:01"),
      (3L, "click", "2024-01-01 00:00:02"),
      (4L, "click", "2024-01-01 00:00:03"))
      .toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"))
    val r = graft.ops.Sketches.joinSizeEstimate(ev).collect()(0)
    assert(r.getAs[String]("exact_size") == "0")
    assert(r.isNullAt(r.fieldIndex("ratio")), "zero-denominator ratio must be NULL")
    assert(r.getAs[Boolean]("overestimate"), "0 <= any CM estimate")
  }

  test("dp release: clamped, bounded noise, suppressed small groups") {
    val truth = docs.groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rel = SparkEntry.queries("pipeline_dp_release")(spark, dir).collect()
    assert(rel.nonEmpty)
    rel.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val released = r.getAs[Long]("released")
      assert(released >= 0L)
      assert(truth(key) >= 10L, "suppression must keep only groups >= 10")
      assert(math.abs(released - truth(key)) <= 10L, s"noise out of range at $key")
    }
    // suppressed groups never leak into the release
    val released = rel.map(r => (r.getAs[String]("lang"), r.getAs[String]("source"))).toSet
    truth.filter(_._2 < 10L).keys.foreach(k => assert(!released.contains(k)))
  }

  test("streaming set-algebra sketches == batch (set-deterministic KMV fold)") {
    val batch = SparkEntry.queries("sketch_set_intersection")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.queries("stream_set_intersection")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("theta-sketch set algebra matches an independent driver replay") {
    val events = graft.streaming.StreamingOps.events(spark, dir)
    val elems = ops.Sketches.setElements(events).distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sets: Map[String, Set[Long]] = elems.groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.map(r => ops.Sketches.md5Low64String(r._2)).toSet
      }
    val k = 1024
    def sketch(t: String): Array[Long] =
      sets.getOrElse(t, Set.empty).toArray.sorted.take(k)
    def theta(a: Array[Long]): Double =
      if (a.length < k) 1.0
      else (a(k - 1).toDouble + math.pow(2, 63)) / math.pow(2, 64)
    val out = SparkEntry.queries("sketch_set_intersection")(spark, dir).collect()
    assert(out.length == 3)
    val types = Map("view_click" -> ("view", "click"),
      "view_purchase" -> ("view", "purchase"),
      "click_purchase" -> ("click", "purchase"))
    out.foreach { r =>
      val (ta, tb) = types(r.getAs[String]("pair"))
      val (sa, sb) = (sets.getOrElse(ta, Set.empty), sets.getOrElse(tb, Set.empty))
      assert(r.getAs[Long]("exact_a") == sa.size.toLong)
      assert(r.getAs[Long]("exact_b") == sb.size.toLong)
      assert(r.getAs[Long]("exact_inter") == sa.intersect(sb).size.toLong)
      assert(r.getAs[Long]("exact_union") == sa.union(sb).size.toLong)
      val (ka, kb) = (sketch(ta), sketch(tb))
      val thr = (ka.length == k, kb.length == k) match {
        case (true, true) => Some(math.min(ka(k - 1), kb(k - 1)))
        case (true, false) => Some(ka(k - 1))
        case (false, true) => Some(kb(k - 1))
        case _ => None
      }
      val tm = math.min(theta(ka), theta(kb))
      val ba = thr.map(x => ka.filter(_ < x)).getOrElse(ka).toSet
      val bb = thr.map(x => kb.filter(_ < x)).getOrElse(kb).toSet
      assert(r.getAs[Double]("est_inter") == ba.intersect(bb).size.toDouble / tm)
      assert(r.getAs[Double]("est_union") == ba.union(bb).size.toDouble / tm)
      assert(r.getAs[Boolean]("ok_inter") && r.getAs[Boolean]("ok_union"))
    }
  }

  test("cusum changepoint matches a BigInt driver replay of the daily series") {
    val daily = graft.streaming.StreamingOps.ewmaDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), BigInt(r.getDecimal(2).toBigInteger)))
    val out = SparkEntry.queries("ts_changepoint_cusum")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == et).sortBy(_._2)
      val n = series.length
      val tot = series.map(_._3).sum
      var pre = BigInt(0)
      val cands = series.zipWithIndex.take(n - 1).map { case ((_, day, v), i) =>
        pre += v
        (day, (i + 1).toLong, pre, (BigInt(n) * pre - BigInt(i + 1) * tot).abs)
      }
      val best = cands.minBy { case (day, _, _, s) => (-s, day) }
      assert(r.getAs[Long]("cp_day") == best._1)
      assert(r.getAs[Long]("cp_t") == best._2)
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Double]("cusum_abs_max") ==
        best._4.toString.toDouble)
      assert(r.getAs[Double]("mean_before") ==
        best._3.toString.toDouble / (best._2 * 10000L).toString.toDouble)
      assert(r.getAs[Double]("mean_after") ==
        (tot - best._3).toString.toDouble /
          ((n - best._2) * 10000L).toString.toDouble)
    }
  }

  test("node jaccard matches a brute-force co-occurrence recompute") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val co = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.foreach { parts =>
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        co((parts(i), parts(j))) = co.getOrElse((parts(i), parts(j)), 0L) + 1L
    }
    val deg = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = co.toSeq.map { case ((u, v), c) =>
      (u, v, c, deg(u), deg(v), c.toDouble / (deg(u) + deg(v) - c).toDouble)
    }.sortBy { case (u, v, c, _, _, j) => (-j, -c, u, v) }.take(20)
    val got = SparkEntry.queries("graph_node_jaccard")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "no co-occurring part pairs at sf0.001 — vacuous")
  }

  test("boilerplate strip matches a full driver replay; planted banner dropped") {
    val raw = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val banner = "graft common boilerplate banner shared across many documents "
    val segsOf = raw.map { case (id, text) =>
      val t2 = if (id % 10 == 0) banner + text else text
      val toks = t2.trim.toLowerCase.split("\\s+")
      id -> toks.grouped(4).map(_.mkString(" ")).toVector
    }.toMap
    val dfCount = segsOf.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val out = SparkEntry.queries("text_boilerplate_strip")(spark, dir).collect()
    assert(out.length == raw.length)
    out.foreach { r =>
      val id = r.getLong(0)
      val ss = segsOf(id)
      val kept = ss.filter(s => dfCount(s) < 3)
      assert(r.getAs[Long]("n_segments") == ss.length.toLong)
      assert(r.getAs[Long]("n_dropped") == (ss.length - kept.length).toLong)
      val clean = kept.mkString(" ")
      assert(r.getAs[Long]("clean_len") == clean.length.toLong)
      assert(r.getAs[String]("clean_md5") ==
        java.security.MessageDigest.getInstance("MD5")
          .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      if (id % 10 == 0)
        assert(r.getAs[Long]("n_dropped") >= 2L,
          s"planted banner not stripped from doc $id")
    }
  }

  test("hybrid rrf: ranks consistent, fused score recomputable, both modalities present") {
    val out = SparkEntry.queries("sim_hybrid_rrf")(spark, dir).collect()
    assert(out.length == 10)
    var prev = Double.MaxValue
    out.foreach { r =>
      val tr = if (r.isNullAt(r.fieldIndex("text_rank"))) None
        else Some(r.getAs[Long]("text_rank"))
      val vr = if (r.isNullAt(r.fieldIndex("vec_rank"))) None
        else Some(r.getAs[Long]("vec_rank"))
      assert(tr.nonEmpty || vr.nonEmpty)
      val rrf = tr.map(x => 1.0 / (60L + x).toDouble).getOrElse(0.0) +
        vr.map(x => 1.0 / (60L + x).toDouble).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == rrf)
      assert(r.getAs[Double]("rrf") <= prev)
      prev = r.getAs[Double]("rrf")
      tr.foreach(x => assert(x >= 1L && x <= 100L))
      vr.foreach(x => assert(x >= 1L && x <= 100L))
    }
    // the fusion is non-degenerate: the winning docs draw on both lists
    assert(out.exists(r => !r.isNullAt(r.fieldIndex("text_rank"))))
    assert(out.exists(r => !r.isNullAt(r.fieldIndex("vec_rank"))))
    // text ranks follow text scores (higher score never ranks worse)
    val both = out.filter(r => !r.isNullAt(r.fieldIndex("text_rank")))
      .map(r => (r.getAs[Long]("text_score"), r.getAs[Long]("text_rank")))
    both.combinations(2).foreach { case Array((s1, r1), (s2, r2)) =>
      if (s1 > s2) assert(r1 < r2)
    }
  }

  test("seasonal-naive backtest matches a BigInt driver replay") {
    val daily = graft.streaming.StreamingOps.ewmaDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), BigInt(r.getDecimal(2).toBigInteger)))
    val out = SparkEntry.queries("ts_backtest_snaive")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      val ev = (7 until xs.length).map(i => (xs(i), xs(i - 7), xs(i - 1)))
      val n = ev.length
      assert(r.getAs[Long]("n_eval") == n.toLong)
      def mae(f: ((BigInt, BigInt, BigInt)) => BigInt): Double =
        ev.map(f).sum.toString.toDouble / (n * 10000L).toString.toDouble
      val maeS = mae { case (x, l7, _) => (x - l7).abs }
      val maeN = mae { case (x, _, l1) => (x - l1).abs }
      assert(r.getAs[Double]("mae_snaive") == maeS)
      assert(r.getAs[Double]("mae_naive") == maeN)
      assert(r.getAs[Double]("me_snaive") ==
        ev.map { case (x, l7, _) => x - l7 }.sum.toString.toDouble /
          (n * 10000L).toString.toDouble)
      if (maeN != 0.0) assert(r.getAs[Double]("skill") == maeS / maeN)
    }
  }

  test("streaming window-distinct sketches == batch (per-day set-deterministic fold)") {
    val batch = SparkEntry.queries("sketch_window_distinct")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.queries("stream_window_distinct")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("temporal sketch rollup matches an independent window-merge replay") {
    val events = graft.streaming.StreamingOps.events(spark, dir)
    val elems = ops.Sketches.activityElements(events).distinct().collect()
      .map(r => (r.getString(0).toLong, r.getString(1)))
    val rawByDay = elems.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byDay = rawByDay.view
      .mapValues(_.map(ops.Sketches.md5Low64String)).toMap
    val days = byDay.keys.toSeq.sorted
    val k = 256
    val out = SparkEntry.queries("sketch_window_distinct")(spark, dir).collect()
    assert(out.length == days.length)
    out.foreach { r =>
      val w = r.getAs[Long]("day")
      val inWin = days.filter(d => d >= w - 6 && d <= w)
      assert(r.getAs[Long]("window_days") == inWin.length.toLong)
      // exact side counts raw element strings, not hashes
      assert(r.getAs[Long]("exact_distinct") ==
        inWin.flatMap(rawByDay).toSet.size.toLong)
      val union = inWin.flatMap(byDay).toSet
      val sk = union.toSeq.sorted.take(k)
      val th = if (sk.length < k) 1.0
        else (sk(k - 1).toDouble + math.pow(2, 63)) / math.pow(2, 64)
      val cb = if (sk.length < k) sk.length else sk.count(_ < sk(k - 1))
      assert(r.getAs[Double]("est") == cb.toDouble / th)
      assert(r.getAs[Boolean]("sketch_ok"))
    }
  }

  test("referential integrity gate matches a driver replay of the planted corruption") {
    def corrupted(key: Long, salt: Long, mod: Long): Long = {
      val h = ops.Sketches.md5Low64String(s"${key}_$salt")
      if (((h % mod) + mod) % mod == 0) -key else key
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => corrupted(r.getLong(0), r.getInt(1).toLong, 97L))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey")).collect()
    val ordKeys = orders.map(_.getLong(0)).toSet
    val custFeed = orders.map(r => corrupted(r.getLong(1), r.getLong(0), 89L))
    val custKeys = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val out = SparkEntry.queries("diag_referential_integrity")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (lc, lo) = (li.length.toLong, li.count(k => !ordKeys(k)).toLong)
    assert(out("lineitem.orderkey->orders") ==
      ((lc, lo, lo.toDouble / lc.toDouble)))
    val (oc, oo) = (custFeed.length.toLong, custFeed.count(k => !custKeys(k)).toLong)
    assert(out("orders.custkey->customer") ==
      ((oc, oo, oo.toDouble / oc.toDouble)))
    assert(lo > 0L && oo > 0L, "planted orphans missing — gate is vacuous")
  }

  test("autocorrelation matches a BigInt driver replay; coefficients bounded") {
    val daily = graft.streaming.StreamingOps.ewmaDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), BigInt(r.getDecimal(2).toBigInteger)))
    val out = SparkEntry.queries("ts_autocorrelation")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val h = r.getAs[Long]("lag").toInt
      val xs = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      val n = xs.length
      val tot = xs.sum
      val dev = xs.map(x => BigInt(n) * x - tot)
      val den = dev.map(d => d * d).sum
      val num = (0 until n - h).map(i => dev(i) * dev(i + h)).sum
      assert(r.getAs[Long]("n_days") == n.toLong)
      val acf = num.toString.toDouble / den.toString.toDouble
      assert(r.getAs[Double]("acf") == acf)
      assert(math.abs(acf) <= 1.0 + 1e-9)
    }
  }

  test("url canonicalization: regex chain lands on the semantic canonical form") {
    val out = SparkEntry.queries("text_url_canonicalize")(spark, dir).collect()
    assert(out.nonEmpty)
    // independent SEMANTIC construction (no regexes): what the
    // normalization rules are supposed to produce for the derived feed
    val expectByDoc = out.map { r =>
      val id = r.getLong(0)
      val ref = if (id % 4 == 1) "?ref=home" else ""
      id -> s"http://example-${id % 5}.com/docs/${id / 7}$ref"
    }.toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[String]("canonical") == expectByDoc(id),
        s"doc $id: ${r.getAs[String]("canonical")}")
      assert(r.getAs[String]("url").toLowerCase.startsWith("http://example-"))
    }
    val sizes = out.groupBy(_.getAs[String]("canonical")).view.mapValues(_.length)
    out.foreach { r =>
      assert(r.getAs[Long]("n_dup") == sizes(r.getAs[String]("canonical")).toLong)
    }
    assert(out.exists(_.getAs[Long]("n_dup") >= 2L),
      "no collision clusters — the canonicalization demo is vacuous")
  }

  test("activity streaks match a brute gaps-and-islands replay") {
    val act = graft.streaming.StreamingOps.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = act.groupBy(_._1).map { case (u, rows) =>
      val days = rows.map(_._2).distinct.sorted
      // island boundaries where the gap exceeds one day
      val runs = days.foldLeft(Vector.empty[Vector[Long]]) { (acc, d) =>
        if (acc.nonEmpty && acc.last.last == d - 1) acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      val best = runs.map(r => (r.length.toLong, r.head))
        .minBy { case (len, st) => (-len, st) }
      u -> (days.length.toLong, runs.length.toLong, best._1, best._2)
    }
    val got = SparkEntry.queries("window_streaks")(spark, dir).collect()
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { r =>
      val u = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == expect(u))
    }
    // the emitted top-50 really is the top of the total order
    val gotUsers = got.map(_.getLong(0)).toSet
    val ranked = expect.toSeq.sortBy { case (u, (_, _, ms, _)) => (-ms, u) }
      .take(got.length).map(_._1).toSet
    assert(gotUsers == ranked)
  }

  test("column-stats manifest matches a driver replay of the file buckets") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("l_partkey"), col("l_returnflag")).collect()
    val byFile = rows.groupBy { r =>
      val h = ops.Sketches.md5Low64String(s"${r.getLong(0)}_${r.getInt(1)}")
      ((h % 16) + 16) % 16
    }
    val out = SparkEntry.queries("layout_column_stats")(spark, dir).collect()
    assert(out.length == byFile.size)
    out.foreach { r =>
      val g = byFile(r.getLong(0))
      assert(r.getAs[Long]("n_rows") == g.length.toLong)
      assert(r.getAs[Long]("min_partkey") == g.map(_.getLong(3)).min)
      assert(r.getAs[Long]("max_partkey") == g.map(_.getLong(3)).max)
      assert(r.getAs[Long]("ndv_partkey") == g.map(_.getLong(3)).distinct.length.toLong)
      assert(r.getAs[Long]("ndv_returnflag") == g.map(_.getString(4)).distinct.length.toLong)
      assert(r.getAs[Long]("nulls_returnflag") == 0L)
      // l_shipdate is TIMESTAMP_NTZ → LocalDateTime on the JVM side
      val tsOrd = Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _)
      def ldt(row: org.apache.spark.sql.Row) =
        row.getAs[java.time.LocalDateTime](2)
      assert(r.getAs[java.time.LocalDateTime]("min_shipdate") == g.map(ldt).min(tsOrd))
      assert(r.getAs[java.time.LocalDateTime]("max_shipdate") == g.map(ldt).max(tsOrd))
    }
  }

  test("band join matches the brute inequality join exactly (recall by construction)") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"), col("s_acctbal")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val brute = for {
      (ck, cb) <- cust; (sk, sb) <- supp
      if math.abs(cb - sb) <= 10.0
    } yield (ck, sk, cb, sb, math.abs(cb - sb))
    val expect = brute.sortBy { case (ck, sk, _, _, d) => (d, ck, sk) }.take(20)
    val got = SparkEntry.queries("join_band_balance")(spark, dir).collect()
    assert(got.nonEmpty, "no band pairs at sf0.001 — vacuous")
    got.zip(expect).foreach { case (r, (ck, sk, cb, sb, d)) =>
      assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)) == ((ck, sk, cb, sb, d)))
      assert(r.getAs[Long]("total_band_pairs") == brute.length.toLong)
    }
  }

  test("frame dedup: planted promo frames found with full cross-doc incidence") {
    val planted = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .count(_ % 20 == 0)
    val promo = "promo frame xyz " * 8
    val promoHashes = (0 until promo.length / 32).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(promo.substring(i * 32, i * 32 + 32).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toSet
    val out = SparkEntry.queries("multimodal_frame_dedup")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(promoHashes.nonEmpty && planted >= 2)
    promoHashes.foreach { h =>
      val (nd, occ) = out.getOrElse(h, fail(s"planted promo frame $h missing"))
      assert(nd == planted.toLong)
      assert(occ >= nd)
    }
  }

  test("shard shuffle is a reproducible bijection with balanced shards") {
    val ids = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keyed = ids.map { case (id, text) =>
      val k = ops.Sketches.md5Low64String(s"shuf|$id")
      (id, k, ((k % 8) + 8) % 8, text.trim.toLowerCase.split("\\s+").length.toLong)
    }
    val byShard = keyed.groupBy(_._3)
    val out = SparkEntry.queries("pipeline_shard_shuffle")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == ids.length.toLong,
      "shards do not partition the corpus — not a bijection")
    out.foreach { r =>
      val g = byShard(r.getLong(0))
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("total_tokens") == g.map(_._4).sum)
      assert(r.getAs[Double]("key_checksum") ==
        g.map(x => BigInt(x._2)).sum.toString.toDouble)
      val head = g.sortBy(x => (x._2, x._1)).take(3).map(_._1).mkString(",")
      assert(r.getAs[String]("head_docs") == head)
      assert(r.getAs[Boolean]("balanced"))
    }
  }

  test("streaming shard manifest == batch (associative folds, bottom-k heads)") {
    val batch = SparkEntry.queries("pipeline_shard_shuffle")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.queries("stream_shard_shuffle")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("mad outliers match an exact order-statistic replay") {
    val daily = graft.streaming.StreamingOps.ewmaDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), BigInt(r.getDecimal(2).toBigInteger)))
    val out = SparkEntry.queries("ts_mad_outliers")(spark, dir).collect()
    assert(out.nonEmpty)
    val byType = daily.groupBy(_._1)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = byType(et).sortBy(_._2)
      val n = series.length
      def stat(vals: Seq[(BigInt, Long)]): BigInt = {
        val sorted = vals.sortBy { case (v, day) => (v, day) }
        sorted((n + 1) / 2 - 1)._1
      }
      val med = stat(series.map(x => (x._3, x._2)).toSeq)
      val day = r.getAs[Long]("day")
      val x = series.find(_._2 == day).get._3
      val mad = stat(series.map(s => ((s._3 - med).abs, s._2)).toSeq)
      assert(r.getAs[Double]("daily_value") ==
        x.toString.toDouble / 10000.0)
      assert(r.getAs[Double]("median") == med.toString.toDouble / 10000.0)
      assert(r.getAs[Double]("mad") == mad.toString.toDouble / 10000.0)
      assert(r.getAs[Boolean]("is_outlier") == ((x - med).abs > mad * 10))
    }
  }

  test("ivf recall sweep: monotone curve, exact-overlap hits, consistent recall") {
    val out = SparkEntry.queries("sim_ivf_recall_sweep")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_probe")).toSeq == Seq(1L, 2L, 4L, 8L))
    // wider probe budgets only add candidates, never lose hits
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_candidates") <= b.getAs[Long]("n_candidates"))
      assert(a.getAs[Long]("n_hits") <= b.getAs[Long]("n_hits"))
    }
    // hits vs an independent exact/approx overlap recompute at each rung
    val exact = ops.Similarity.bruteForceTopK(embeddings, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    out.foreach { r =>
      val approx = ops.Similarity.ivfTopK(embeddings, 0L, 10, 16,
          r.getAs[Long]("n_probe").toInt)
        .collect().map(_.getLong(0))
      assert(r.getAs[Long]("n_hits") == approx.count(exact).toLong)
      assert(r.getAs[Double]("recall") ==
        r.getAs[Long]("n_hits").toDouble / 10.0)
    }
  }

  test("duplicated-substring ladder matches a brute per-rung replay") {
    val txts = docs.select(col("doc_id"), trim(lower(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val out = SparkEntry.queries("dedup_lrs_ladder")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("window_len")).toSeq ==
      Seq(16L, 32L, 64L, 128L))
    out.foreach { r =>
      val l = r.getAs[Long]("window_len").toInt
      val st = l / 2
      val wins = txts.filter(_._2.length >= l).flatMap { case (id, t) =>
        (0 to (t.length - l) / st).map(i => (id, t.substring(i * st, i * st + l)))
      }
      assert(r.getAs[Long]("n_windows") == wins.length.toLong)
      val dup = wins.groupBy(_._2).filter(_._2.length >= 2)
      assert(r.getAs[Long]("n_dup_substrings") == dup.size.toLong)
      assert(r.getAs[Long]("n_dup_positions") ==
        dup.values.map(_.length.toLong).sum)
      assert(r.getAs[Long]("max_docs") ==
        (if (dup.isEmpty) 0L
         else dup.values.map(_.map(_._1).distinct.length).max.toLong))
      if (dup.nonEmpty) {
        val wmin = dup.keys.min
        assert(r.getAs[String]("witness") == wmin)
        assert(r.getAs[Long]("witness_count") == dup(wmin).length.toLong)
      } else {
        assert(r.isNullAt(r.fieldIndex("witness")))
      }
    }
  }

  test("temporal quantile rollup matches an independent window-merge replay") {
    val events = graft.streaming.StreamingOps.events(spark, dir)
    val rows = events.select(
        expr("unix_micros(ts) div 86400000000").as("d"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDay = rows.groupBy(_._1)
    val days = byDay.keys.toSeq.sorted
    val k = 1024
    val out = SparkEntry.queries("sketch_window_quantile")(spark, dir).collect()
    assert(out.length == days.length * 2)
    out.foreach { r =>
      val w = r.getAs[Long]("day")
      val q = r.getAs[Double]("q")
      val win = days.filter(d => d >= w - 6 && d <= w).flatMap(byDay(_))
      assert(r.getAs[Long]("n_exact") == win.length.toLong)
      // independent sketch: k smallest (md5(event_id), event_id) of the
      // window's event set, then the rank-⌈q·m⌉ value
      val sample = win
        .map(x => (ops.Sketches.md5Low64String(x._2.toString), x._2, x._3))
        .sortBy(t => (t._1, t._2)).take(k)
        .map(t => (t._3, t._2)).sortBy(identity)
      val est = sample(math.ceil(q * sample.length).toInt - 1)._1
      assert(r.getAs[Double]("est") == est)
      val exact = win.map(x => (x._3, x._2)).sorted
        .apply(math.ceil(q * win.length).toInt - 1)._1
      assert(r.getAs[Double]("exact_q") == exact)
      val rank = win.count(_._3 <= est)
      assert(r.getAs[Double]("rank_err") ==
        math.abs(rank.toDouble / win.length.toDouble - q))
      assert(r.getAs[Boolean]("sketch_ok"))
    }
  }

  test("streaming quantile rollup == batch (per-day set-deterministic bottom-k fold)") {
    val batch = SparkEntry.queries("sketch_window_quantile")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.queries("stream_window_quantile")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("Fs materialization lifecycle: free() releases scratch dirs, tables, and checkpoint blocks") {
    import graft.util.Fs
    val df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    // big branch (bigRows = 1 forces scratch parquet): dir exists while the
    // handle is live, free() deletes it and drops it from the deferred queue
    val before = Fs.deferredCount
    val big = Fs.materializeTracked(df, rowsHint = 100, bigRows = 1)
    assert(Fs.deferredCount == before + 1)
    assert(big.scratch.exists(java.nio.file.Files.exists(_)))
    assert(big.df.count() == 100)
    big.free()
    assert(Fs.deferredCount == before)
    assert(big.scratch.forall(!java.nio.file.Files.exists(_)))
    // big KEYED branch: bucketed catalog table + dir, both gone after free()
    val keyed = Fs.materializeTrackedKeyed(df, parts = 4, keys = Seq("k"),
      rowsHint = 100, bigRows = 1)
    val tableName = keyed.table.map(_._2).get
    assert(spark.catalog.tableExists(tableName))
    assert(keyed.df.count() == 100)
    keyed.free()
    assert(!spark.catalog.tableExists(tableName))
    assert(keyed.scratch.forall(!java.nio.file.Files.exists(_)))
    assert(Fs.deferredCount == before)
    // small branch: free() unpersists the localCheckpoint blocks (r7
    // ADVICE — loops below bigRows otherwise pin one block copy per round
    // for the session lifetime)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val small = Fs.materializeTracked(df, rowsHint = 100)
    assert(small.scratch.isEmpty && small.table.isEmpty)
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore + 1)
    small.free()
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore)
    // iterative operators free their loop scratch before returning
    // (r7 VERDICT #8): a full labelPropagation run leaves the deferred
    // count unchanged and adds no pinned checkpoint blocks beyond the
    // returned (materialized) final frame
    val edges = spark.range(50).selectExpr("id AS u", "(id + 1) % 50 AS v")
    val persisted0 = spark.sparkContext.getPersistentRDDs.size
    val labels = graft.ops.Graph.labelPropagation(edges, rounds = 3, parts = 4)
    assert(labels.count() == 50)
    assert(Fs.deferredCount == before)
    // at most the final label frame remains pinned
    assert(spark.sparkContext.getPersistentRDDs.size <= persisted0 + 1)
    // pageRank with finalizeAndFree: the edge/nd scratch is freed before
    // return (r8 — previously impossible because the returned plan was
    // lazy); only the materialized final ranks frame remains pinned, and
    // the values are identical to the lazy path's
    val persisted1 = spark.sparkContext.getPersistentRDDs.size
    val prEdges = edges.selectExpr("u AS src", "v AS dst")
    val prLazyDf = graft.ops.Graph.pageRank(prEdges, maxIter = 3, parts = 4)
    val prLazy = prLazyDf
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val prFin = graft.ops.Graph.pageRank(prEdges, maxIter = 3, parts = 4,
      finalizeAndFree = true)
    val prFinRows = prFin.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(prFinRows == prLazy)
    assert(Fs.deferredCount == before)
    // free the lazy run's e/nd checkpoint blocks after the comparison
    // (the Materialized.free route) so this test leaves the shared-JVM
    // suite's pinned-RDD accounting clean (r8 ADVICE)
    prLazyDf.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
    // only the finalize call's materialized final ranks frame remains
    assert(spark.sparkContext.getPersistentRDDs.size <= persisted1 + 1)
  }

  test("schema evolution read: null-filled v1, populated v2, partition col discovered") {
    val res = SparkEntry.queries("source_schema_evolution")(spark, dir).collect()
    assert(res.length == docs.count())
    res.foreach { r =>
      val v = r.getAs[Int]("v")
      assert(v == (if (r.getAs[Long]("doc_id") % 2 == 0) 1 else 2))
      if (v == 1) {
        assert(r.isNullAt(r.fieldIndex("quality")))
        assert(r.isNullAt(r.fieldIndex("source")))
      } else {
        assert(!r.isNullAt(r.fieldIndex("quality")))
        assert(r.getAs[String]("source") != null)
      }
    }
  }

  test("native SrpPackedBits / ArgmaxCosine are value-equal to the HOF forms") {
    import spark.implicits._
    // deterministic vectors incl. a zero vector (null-cosine path) and a
    // vector equal to a centroid (exact sim 1.0); signs are an arbitrary
    // rectangular +-1 matrix -- the equivalence under test is the
    // expression semantics, not a particular hyperplane family
    val dim = 8
    val vecs: Seq[(Long, Array[Double])] =
      (0L until 12L).map { i =>
        (i, Array.tabulate(dim)(d =>
          if (i == 5L) 0.0 else math.sin(i * 31 + d * 7) * (d + 1)))
      }
    val nBits = 6
    val signs: IndexedSeq[Seq[Double]] = IndexedSeq.tabulate(nBits)(j =>
      Seq.tabulate(dim)(d => if ((j * dim + d) % 3 == 0) 1.0 else -1.0))
    val mask = (1 << 4) - 1
    val df = vecs.toDF("vec_id", "v").repartition(2)

    // HOF formulation the native expression replaced (verbatim shape)
    val projCols = (0 until nBits).map { j =>
      aggregate(zip_with(col("v"), typedLit(signs(j)), (x, sg) => x * sg),
        lit(0.0), (acc, x) => acc + x).as(s"__p$j")
    }
    val bitsHof = (0 until nBits)
      .map(j => when(col(s"__p$j") > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _).cast(org.apache.spark.sql.types.IntegerType)
    val hof = df.select((col("vec_id") +: projCols): _*)
      .select(col("vec_id"), bitsHof.bitwiseAND(lit(mask)).as("srp"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val native = df.select(col("vec_id"),
        graft.functions.VectorOps.srpPackedBits(col("v"), signs, mask).as("srp"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(native == hof)

    // argmax: centroids include vec 3 itself (sim 1.0) and a zero centroid
    // (null sim must lose to any non-null)
    val cents: Seq[(Long, Seq[Double])] = Seq(
      (0L, vecs(3)._2.toSeq),
      (1L, Seq.fill(dim)(0.0)),
      (2L, vecs(7)._2.map(-_).toSeq),
      (3L, vecs(9)._2.toSeq))
    val scoredHof = transform(typedLit(cents), c => struct(
      graft.functions.VectorOps.cosine(col("v"), c.getField("_2")).as("sim"),
      (-c.getField("_1")).as("nb"),
      c.getField("_1").as("bucket")))
    val hofMax = df.select(col("vec_id"), array_max(scoredHof).as("best"))
      .select(col("vec_id"), col("best.sim"), col("best.bucket"))
      .collect().map(r =>
        (r.getLong(0), (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getLong(2)))).toMap
    val nativeMax = df.select(col("vec_id"),
        graft.functions.VectorOps.argmaxCosine(col("v"), cents).as("best"))
      .select(col("vec_id"), col("best.sim"), col("best.bucket"))
      .collect().map(r =>
        (r.getLong(0), (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getLong(2)))).toMap
    assert(nativeMax == hofMax)
    // the zero VECTOR's row: every sim null -> ties break to lowest bucket
    assert(nativeMax(5L) == ((None, 0L)))
    // self-match wins its row (sim ~ 1.0 up to sqrt(s)*sqrt(s) rounding)
    assert(nativeMax(3L)._2 == 0L)
    assert(math.abs(nativeMax(3L)._1.get - 1.0) < 1e-12)
  }
}
