package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.tokens
import graft.operators.{Curation, Dedup}

/** Curation operators: the distributed prefix-sum sharder must equal
  * the naive global-window reference, decontamination must equal
  * all-pairs intersection, and hash-based membership must be stable
  * and monotone in the rate. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("tokenShards == naive global-window prefix sum, at several partition counts") {
    import spark.implicits._
    val tok = size(tokens(col("text")))
    val naive = docs
      .select(col("doc_id"), tok.cast("long").as("toks"))
      .withColumn("strt", coalesce(sum("toks").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), floor(col("strt") / 2000L).as("shard"))
      .as[(Long, Long)].collect().toMap
    for (p <- Seq(1, 4, 32)) {
      val got = Curation.tokenShards(docs, 2000L, tok, partitions = p)
        .select(col("doc_id"), col("shard")).as[(Long, Long)].collect().toMap
      assert(got == naive, s"shard assignment diverged at partitions=$p")
    }
  }

  test("decontaminate == all-pairs shingle intersection at the threshold") {
    import spark.implicits._
    val ev = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val tr = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val got = Curation.decontaminate(tr, ev, n = 3, minOverlap = 2)
      .as[(Long, Long, Long)].collect().toSet
    def sh(df: org.apache.spark.sql.DataFrame, as: String) = df
      .select(col("doc_id").as(as), Dedup.shingles(col("text"), 3).as(s"sh_$as"))
      .filter(size(col(s"sh_$as")) > 0)
    val naive = sh(tr, "a").crossJoin(sh(ev, "b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n"))
      .filter(col("n") >= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("splitAssign is deterministic, ~80/10/10, and id-stable under corpus growth") {
    import spark.implicits._
    val full = Curation.splitAssign(docs).select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = full.size.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9, s"$counts")
    assert(counts.getOrElse("val", 0) > 0 && counts.getOrElse("test", 0) > 0, s"$counts")
    // growth stability: assignments over a subset match the full corpus
    val sub = Curation.splitAssign(docs.filter(col("doc_id") < 100))
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, sp) => full(id) == sp })
  }

  test("packSequences covers each doc exactly, fills interior sequences, and is partition-invariant") {
    import spark.implicits._
    val tok = size(tokens(col("text")))
    val packed = Curation.packSequences(docs, 512L, tok, partitions = 4)
    // per-doc coverage: a doc's overlap counts sum to its token count
    val broken = packed.groupBy("doc_id")
      .agg(sum("n_tok_in_seq").as("covered"), first("toks").as("toks"))
      .filter(col("covered") =!= col("toks")).count()
    assert(broken == 0, "doc token spans must be covered exactly once")
    // interior sequences hold exactly seqLen tokens; only the last may be short
    val seqs = packed.groupBy("seq").agg(sum("n_tok_in_seq").as("s"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(seqs.dropRight(1).forall(_._2 == 512L),
      s"interior sequences must be full: ${seqs.filter(_._2 != 512L).toSeq}")
    assert(seqs.last._2 <= 512L)
    // the (doc, seq, overlap) incidence is invariant to the partition count
    def asSet(p: Int) = Curation.packSequences(docs, 512L, tok, partitions = p)
      .select(col("doc_id"), col("seq"), col("n_tok_in_seq"))
      .as[(Long, Long, Long)].collect().toSet
    assert(asSet(1) == asSet(32))
  }

  test("chunkDocs windows cover every character with the declared overlap") {
    import spark.implicits._
    val d = Seq(
      (1L, "abcdefghij"),   // 10 chars: size 4 / overlap 1 -> starts 1,4,7,10
      (2L, "xyz"),          // shorter than one chunk -> single short chunk
      (3L, "")              // empty -> no chunks
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocs(d, size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0, 1L, "abcd"), (1L, 1, 4L, "defg"), (1L, 2, 7L, "ghij"), (1L, 3, 10L, "j"),
      (2L, 0, 1L, "xyz")))
    // reconstruction: dropping each chunk's overlap prefix (except the
    // first) and concatenating rebuilds the document exactly
    val rebuilt = got.filter(_._1 == 1L).zipWithIndex
      .map { case ((_, _, _, c), i) => if (i == 0) c else c.drop(1) }.mkString
    assert(rebuilt == "abcdefghij")
    // fixture-scale invariants: every chunk starts on the stride grid
    // with length min(size, remaining), and the windows reach the last
    // character of every non-empty document
    val chunks = Curation.chunkDocs(docs, size = 256, overlap = 32)
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
    val bad = chunks.filter(
      col("start_pos") =!= col("chunk_idx").cast("long") * 224L + 1L ||
        length(col("chunk")) =!= least(lit(256), col("len") - col("start_pos") + 1))
    assert(bad.count() == 0, "chunk grid/length invariant violated")
    val tails = chunks.groupBy("doc_id")
      .agg(max(col("start_pos") + length(col("chunk")) - 1).as("end"),
        first(col("len")).as("len"))
    assert(tails.filter(col("end") =!= col("len")).count() == 0,
      "windows must reach each document's last character")
  }

  test("negativeSample: never same-label or self, bucket-contained, exactly k, deterministic") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val anchors = e.filter(col("vec_id") < 10)
    val got = Curation.negativeSample(anchors, e, k = 5, buckets = 4L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.groupBy(_._1).size == 10 && got.forall(_._2 <= 5))
    got.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length), "ranks dense from 1")
      assert(rows.length == 5, s"anchor $a pool must fill k=5 on this fixture")
    }
    got.foreach { case (a, _, n) =>
      assert(n != a, "anchor must never sample itself")
      assert(labels(n) != labels(a), "negatives must come from another label")
      // bucket containment: the candidate's pool assignment matches the
      // anchor's probe bucket (independent hash families)
      assert((n * 2654435761L % 4294967296L) % 4 ==
        ((a * 2246822519L + 98765L) % 4294967296L) % 4)
    }
    val again = Curation.negativeSample(anchors, e, k = 5, buckets = 4L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq.sorted == again.toSeq.sorted, "pure function of the ids")
  }

  test("upsample emits the requested multiplicity with 1..n copy tags") {
    import spark.implicits._
    val up = Curation.upsample(docs, when(col("lang") === "en", 1).otherwise(3))
      .select(col("doc_id"), col("lang"), col("copy"))
      .as[(Long, String, Int)].collect()
    val byDoc = up.groupBy(_._1)
    assert(byDoc.forall { case (_, rows) =>
      val want = if (rows.head._2 == "en") 1 else 3
      rows.length == want && rows.map(_._3).sorted.toSeq == (1 to want)
    })
    // dropped entirely when the weight is < 1
    assert(Curation.upsample(docs, lit(0)).count() == 0L)
  }

  test("domainCap == ranking window, incl. ties, at several partition counts") {
    val score = floor(graft.functions.TextFunctions.qualityScore(col("text")) * 10000.0) / 10000.0
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id").asc)
    val want = docs.withColumn("q", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("source"), col("rnk"), col("doc_id"), col("q"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    for (parts <- Seq(1, 7)) {
      val got = Curation.domainCap(docs.repartition(parts), cap = 3, scoreCol = score)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == want, s"parts=$parts: heap top-3 must equal the ranking window")
    }
  }

  test("domainCap excludes NaN/null scores deterministically at any partitioning") {
    import spark.implicits._
    // NaN sits outside the heap comparator's total order; the contract
    // is exclusion, identical no matter which partition sees it first
    val rows = Seq(("a", 1L, 1.0), ("a", 2L, Double.NaN), ("a", 3L, 0.5),
      ("b", 4L, Double.NaN)).toDF("source", "doc_id", "q")
    for (parts <- Seq(1, 4)) {
      val got = Curation.domainCap(rows.repartition(parts), cap = 2, scoreCol = col("q"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == Set(("a", 1, 1L), ("a", 2, 3L)),
        s"parts=$parts: NaN rows must drop, domain 'b' (all NaN) must vanish")
    }
  }

  test("domainCap keeps every domain when cap exceeds the domain size") {
    val n = docs.count()
    val all = Curation.domainCap(docs, cap = n.toInt, scoreCol = lit(1.0))
    assert(all.count() == n, "cap >= domain size must pass every row through")
  }

  test("upsampleFractional: multiplicities bound by floor/ceil of the weight, rates converge") {
    import spark.implicits._
    val w17 = Curation.upsampleFractional(docs, lit(17000L))
      .groupBy("doc_id").count().as[(Long, Long)].collect()
    assert(w17.forall { case (_, n) => n == 1L || n == 2L },
      "weight 1.7 must emit 1 or 2 copies, never 0 or 3")
    val frac2 = w17.count(_._2 == 2L) / w17.length.toDouble
    assert(frac2 > 0.6 && frac2 < 0.8, s"expected ~70% double-copies, got $frac2")
    val kept = Curation.upsampleFractional(docs, lit(5000L)).select("doc_id").distinct().count()
    val rate = kept / docs.count().toDouble
    assert(rate > 0.4 && rate < 0.6, s"weight 0.5 must keep ~half, got $rate")
    // deterministic multiset at any parallelism
    def multiset(parts: Int) = Curation.upsampleFractional(
        docs.repartition(parts), lit(17000L))
      .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(multiset(1) == multiset(32))
  }

  test("piiCounts + redactPii: typed placeholders, multi-hit and zero-hit rows") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach jo.doe+x@a-b.co or admin@example.org, server 192.168.1.10, tel +44 201-5551"),
      (2L, "no contact info here at all"),
      (3L, "1.2.3.4 then text 10.0.0.255 end")).toDF("id", "text")
    val (ne, ni, np) = Curation.piiCounts(col("text"))
    val rows = df.select(col("id"), ne.as("e"), ni.as("i"), np.as("p"),
        Curation.redactPii(col("text")).as("r"))
      .orderBy("id").collect()
    assert(rows(0).getInt(1) == 2 && rows(0).getInt(2) == 1 && rows(0).getInt(3) == 1)
    assert(rows(0).getString(4) ==
      "reach <EMAIL> or <EMAIL>, server <IP>, tel <PHONE>")
    assert(rows(1).getInt(1) == 0 && rows(1).getInt(2) == 0 && rows(1).getInt(3) == 0)
    assert(rows(1).getString(4) == "no contact info here at all",
      "a PII-free row must pass through byte-identical")
    assert(rows(2).getInt(2) == 2)
    assert(rows(2).getString(4) == "<IP> then text <IP> end")
  }

  test("redactPii placeholders cannot cascade into later passes") {
    import spark.implicits._
    // a placeholder inserted by an earlier pass is letter-only, so the
    // IP/phone passes must leave it alone
    val r = Seq("mail a@b.co then +1 555-0001")
      .toDF("text").select(Curation.redactPii(col("text"))).head.getString(0)
    assert(r == "mail <EMAIL> then <PHONE>")
  }

  test("stratifiedSample membership is monotone in the rate and never upsamples") {
    import spark.implicits._
    def ids(bps: Long) = Curation.stratifiedSample(docs, lit(bps))
      .select("doc_id").as[Long].collect().toSet
    val (r25, r50, r100) = (ids(2500L), ids(5000L), ids(10000L))
    assert(r25.subsetOf(r50) && r50.subsetOf(r100), "bucket membership must nest")
    assert(r100.size == docs.count(), "rate 10000 bps must keep everything")
    val frac = r25.size / r100.size.toDouble
    assert(frac > 0.15 && frac < 0.35, s"rate 2500 bps kept $frac")
  }

  test("weightedSample draws proportionally to weight (20:1 odds dominate the top-k)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    // 2000 ids, half weight 20, half weight 1 -> a 200-row sample
    // should be overwhelmingly heavy (A-ES inclusion ∝ weight)
    val df = (0L until 2000L).toDF("id")
      .withColumn("w", when(col("id") % 2 === 0, lit(20)).otherwise(lit(1)))
    val picked = Curation.weightedSample(df, col("id"), col("w"), k = 200)
      .select("id").as[Long].collect()
    assert(picked.length == 200)
    val heavy = picked.count(_ % 2 == 0)
    assert(heavy > 150, s"only $heavy/200 heavy rows at 20:1 odds — race key wrong")
  }

  test("grouped weighted sample == standalone sample of each group, partition-invariant") {
    import org.apache.spark.sql.functions.col
    def run(parts: Int) = Curation.weightedSampleGrouped(
        docs.repartition(parts), col("source"), col("doc_id"), col("n_chars"), k = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val grouped = run(8)
    assert(run(1) == grouped, "grouped sample must not depend on partitioning")
    val sources = docs.select("source").distinct().collect().map(_.getString(0))
    for (src <- sources.take(3)) {
      val solo = Curation.weightedSample(
          docs.filter(col("source") === src), col("doc_id"), col("n_chars"), k = 4)
        .collect().zipWithIndex
        .map { case (r, i) => (src, i + 1, r.getLong(0), r.getDouble(1)) }.toSet
      assert(grouped.filter(_._1 == src) == solo,
        s"group $src diverges from its standalone sample")
    }
  }

  test("weightedSample rejects non-positive weights loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 5), (2L, 0)).toDF("id", "w")
    val ex = intercept[Exception] {
      Curation.weightedSample(df, col("id"), col("w"), k = 2).collect()
    }
    assert(ex.getMessage.contains("strictly positive"),
      s"expected the in-plan weight guard, got: ${ex.getMessage}")
  }

  test("weightedSample global arm compiles to a bounded top-k (no global sort)") {
    import org.apache.spark.sql.functions.col
    val p = Curation.weightedSample(docs, col("doc_id"), col("n_chars"), k = 50)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"k-smallest race keys must be a bounded heap, not a sort:\n$p")
  }

  test("cluster-aware split: zero leakage across every detected near-dup pair") {
    // q_split_leakage measures what the per-doc split inflicts;
    // q_split_cluster is the remedy — every near-dup pair (its own
    // detector's graph) must land in ONE split, by construction
    val sp = graft.queries.TextQueries.qSplitCluster(spark, sfDir)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.operators.MinHash.lshDedup(docs, tau = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs for this to mean anything")
    val leaks = pairs.filter { case (a, b) => sp(a) != sp(b) }
    assert(leaks.isEmpty, s"cluster-level splitting must never separate a near-dup pair: $leaks")
    // and it is still a real split (more than one label in use)
    assert(sp.values.toSet.size > 1, "the corpus must still spread across splits")
  }

  test("budgetAllocate waterfills: small sources whole, large capped at one level, total = budget") {
    import spark.implicits._
    // counts (1, 2, 100), budget 50% of 103 = 51: candidate caps walk
    // 17, 25, 48 — the first two keep everything, the big source caps
    // at 48, and the allocation lands EXACTLY on the budget
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(100)("c"))
      .map(k => (k, "x")).toDF("src", "text")
    val out = Curation.budgetAllocate(df, col("src"), lit(1L), 5L, 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") == ((1L, 1L, false)) && out("b") == ((2L, 2L, false)),
      s"small sources keep everything: $out")
    assert(out("c") == ((100L, 48L, true)), s"large source caps at the water level: $out")
    assert(out.values.map(_._2).sum == 51L, "the allocation exhausts the integer budget")
    // budget >= total: nobody capped
    val free = Curation.budgetAllocate(df, col("src"), lit(1L), 10L, 10L)
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(free.forall(!_._2) && free.map(_._1).sum == 103L,
      s"a full budget must cap nothing: ${free.toSeq}")
  }

  test("decontaminateSemantic flags a planted paraphrase-style duplicate; eval broadcasts") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ev = e.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding")
    // plant each eval vector back into the corpus under a new id — the
    // "paraphrased into the training set" case the shingle screen
    // can't see (no text here at all)
    val planted = ev.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") % 50 =!= 0)
      .select("vec_id", "embedding").union(planted)
    val out = Curation.decontaminateSemantic(corpus, ev, tau = 0.999)
    val hits = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val evIds = ev.collect().map(_.getLong(0))
    for (id <- evIds)
      assert(hits.contains((id + 1000000L, id)),
        s"planted copy of eval vector $id must be flagged, got $hits")
    // the eval side rides in as a broadcast; the corpus side never shuffles
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the bounded eval set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"),
      s"the corpus side must stay map-only (no shuffle):\n$p")
  }

  test("dsirScore separates target-vocabulary docs from off-target docs") {
    import spark.implicits._
    // target slice speaks vocabulary A, the rest vocabulary B; two
    // held-out raw docs (t = false) are scored by which vocabulary
    // they use. The A-speaker must land strictly above the B-speaker
    // and above 0 (more target-like than the crawl average), the
    // B-speaker strictly below 0 — the importance-resampling ordering
    // DSIR selection relies on.
    val corpus = (
      (1L to 8L).map(i => (i, true, "alpha beta gamma alpha beta")) ++
      (9L to 16L).map(i => (i, false, "delta epsilon zeta delta epsilon")) ++
      Seq((17L, false, "alpha beta gamma alpha beta"),
          (18L, false, "delta epsilon zeta delta epsilon"))
    ).toDF("doc_id", "is_tgt", "text")
    // buckets = 64 (not the production 1024): add-1 smoothing adds
    // `buckets` pseudo-tokens to each model, and this fixture's target
    // slice is only 40 tokens — at 1024 buckets the smoothing mass
    // flattens the target model into uselessness (a real property:
    // the bucket count must stay well below the target token count)
    val out = Curation.dsirScore(corpus, targetPred = col("is_tgt"), buckets = 64)
      .select("doc_id", "log_ratio", "selected")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val (aScore, aSel) = out(17L)
    val (bScore, bSel) = out(18L)
    assert(aScore > 0 && aSel, s"target-vocab doc must score > 0 and select: $aScore")
    assert(bScore < 0 && !bSel, s"off-target doc must score < 0 and drop: $bScore")
    assert(aScore > bScore)
    // identical text ⇒ identical score, regardless of the target flag
    assert(out(17L)._1 == out(1L)._1,
      "the score is a function of the TEXT alone (the flag only feeds the models)")
  }

  test("dsirScore model side stays O(buckets): both model joins broadcast") {
    import org.apache.spark.sql.functions.col
    val p = Curation.dsirScore(docs, targetPred = col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the O(buckets) model table must broadcast onto the tf stream:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      s"both 1-row totals must ride in as broadcast cross joins:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus-sized shuffle join belongs in the scoring path:\n$p")
  }

  // ---- content-defined chunking ----

  private def cdcHashes(texts: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    import spark.implicits._
    graft.operators.Curation.cdcChunks(texts.toDF("doc_id", "text"))
      .select(col("doc_id"), col("chunk_ord"), col("chunk_md5"))
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
  }

  test("cdcChunks: chunks tile the document exactly (coverage, order, no empties)") {
    import spark.implicits._
    val text = (0 until 120).map(i => s"w$i").mkString(" ")
    val rows = graft.operators.Curation.cdcChunks(Seq((1L, text), (2L, "ab")).toDF("doc_id", "text"))
      .orderBy("doc_id", "chunk_ord").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    for ((id, rs) <- byDoc) {
      val txt = if (id == 1L) text else "ab"
      assert(rs.map(_.getAs[String]("chunk")).mkString("") == txt,
        s"doc $id: chunks must concatenate back to the text")
      assert(rs.forall(_.getAs[Long]("len") > 0), s"doc $id: empty chunk emitted")
      val starts = rs.map(_.getAs[Long]("start"))
      assert(starts.head == 1L && starts.toSeq == starts.sorted.toSeq)
    }
    // a doc shorter than the window is one whole chunk
    assert(byDoc(2L).length == 1 && byDoc(2L).head.getAs[Long]("len") == 2L)
  }

  test("cdcChunks: a prefix insertion re-synchronizes, fixed-width chunking does not") {
    val base = (0 until 400).map(i => s"w$i").mkString(" ") // ~1900 chars
    val shifted = "INSERTED PREFIX " + base
    val cdc = cdcHashes(Seq((1L, base), (2L, shifted)))
    val shared = cdc(1L).toSet.intersect(cdc(2L).toSet).size
    val frac = shared.toDouble / cdc(1L).size
    info(f"CDC chunks shared after prefix insertion: $shared/${cdc(1L).size} (${frac * 100}%.0f%%)")
    // fixed-width control: every boundary shifts by the insertion, so
    // no full-width chunk survives (the last ragged tail may — allow 1)
    import spark.implicits._
    import org.apache.spark.sql.functions.md5
    val fixed = graft.operators.Curation
      .chunkDocs(Seq((1L, base), (2L, shifted)).toDF("doc_id", "text"), size = 64, overlap = 0)
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("h"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val fixedShared = fixed(1L).intersect(fixed(2L)).size
    info(s"fixed-width chunks shared: $fixedShared/${fixed(1L).size}")
    // measured 2026-08-15 (deterministic fixture): CDC re-syncs all but
    // the first chunk(s) — >= 75% shared; fixed-width shares <= 1
    assert(frac >= 0.75,
      f"CDC must re-synchronize after an insertion: only $frac%.2f of chunks shared")
    assert(fixedShared <= 1,
      s"control broken: fixed-width chunking shared $fixedShared chunks across the shift")
    assert(frac * cdc(1L).size > fixedShared,
      "CDC must beat the fixed-width control on shared chunks")
  }

  test("cdcChunks: boundaries are position-local (chunk set is partition-invariant)") {
    import spark.implicits._
    val texts = (0 until 24).map(i => (i.toLong, (0 until 80).map(j => s"t${i}x$j").mkString(" ")))
    val one = cdcHashes(texts)
    val many = {
      val df = texts.toDF("doc_id", "text").repartition(13)
      graft.operators.Curation.cdcChunks(df)
        .select(col("doc_id"), col("chunk_ord"), col("chunk_md5"))
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
    }
    assert(one == many, "chunking must not depend on partitioning")
  }

  private def anon(rows: Seq[(String, String)], k: Long): Map[(String, String), (Long, Long)] = {
    import spark.implicits._
    Curation.kAnonLadder(rows.toDF("nat", "seg"), Seq("nat", "seg"), Seq("seg"), k)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("kAnonLadder: publish / generalize / suppress hand case") {
    // seg X: (a,X)x5 publishes at level 0; (b,X)x2 generalizes (X total 7 >= 5)
    // seg Y: (c,Y)x2 alone — even the coarser group misses k → suppress
    val rows = Seq.fill(5)(("a", "X")) ++ Seq.fill(2)(("b", "X")) ++
      Seq.fill(2)(("c", "Y"))
    val r = anon(rows, k = 5)
    assert(r(("a", "X")) == ((5L, 0L)))
    assert(r(("b", "X")) == ((2L, 1L)))
    assert(r(("c", "Y")) == ((2L, 2L)))
  }

  test("kAnonLadder: level-1 membership counts the WHOLE coarser group") {
    // three under-k groups in one segment: 2+2+2 = 6 >= 5 → all generalize
    val rows = Seq.fill(2)(("a", "X")) ++ Seq.fill(2)(("b", "X")) ++
      Seq.fill(2)(("c", "X"))
    val r = anon(rows, k = 5)
    assert(r.values.forall(_ == ((2L, 1L))),
      s"each pair is k-anonymous within the pooled segment: $r")
  }

  test("kAnonLadder: k = 1 publishes everything; misuse is rejected loudly") {
    val rows = Seq(("a", "X"), ("b", "Y"))
    assert(anon(rows, k = 1).values.forall(_._2 == 0L))
    import spark.implicits._
    val df = rows.toDF("nat", "seg")
    intercept[IllegalArgumentException] {
      Curation.kAnonLadder(df, Seq("nat", "seg"), Seq("nat", "seg"), 5)
    }
    intercept[IllegalArgumentException] {
      Curation.kAnonLadder(df, Seq("nat", "seg"), Seq("other"), 5)
    }
  }

  // ---- distinct l-diversity -----------------------------------------

  private def ldiv(rows: Seq[(String, String)], k: Long, l: Long): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    Curation.lDiversity(rows.toDF("qi", "sens"), Seq("qi"), "sens", k, l)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("lDiversity: the homogeneity attack — k-anonymous but single-valued suppresses") {
    // group A: 5 members, all sensitive 'flu' → clears k=5, fails l=2;
    // group B: 5 members, 2 values → publishes;
    // group C: 3 members → fails k (reported as the k failure even
    // though its diversity is also 1)
    val rows = Seq.fill(5)(("A", "flu")) ++
      Seq(("B", "flu"), ("B", "flu"), ("B", "cold"), ("B", "cold"), ("B", "cold")) ++
      Seq.fill(3)(("C", "flu"))
    val r = ldiv(rows, k = 5, l = 2)
    assert(r("A") == ((5L, 1L, 2L)), s"homogeneous group must suppress on l: $r")
    assert(r("B") == ((5L, 2L, 0L)), s"diverse group publishes: $r")
    assert(r("C") == ((3L, 1L, 1L)), s"under-k reports the k failure first: $r")
  }

  test("lDiversity: NULL sensitive values count toward n but never toward l") {
    import spark.implicits._
    val df = Seq(("A", Some("x")), ("A", None), ("A", None),
      ("B", None), ("B", None)).toDF("qi", "sens")
    val r = Curation.lDiversity(df, Seq("qi"), "sens", k = 2, l = 1)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("A") == ((3L, 1L, 0L)))
    assert(r("B") == ((2L, 0L, 2L)), s"all-NULL group has zero diversity: $r")
  }

  // ---- high-entropy secret screen ------------------------------------

  private def secrets(texts: Seq[String]): Set[String] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Curation.secretScan(df).collect().map(_.getString(1)).toSet
  }

  test("secretScan: a credential-shaped token is flagged; natural text never is") {
    val key = "a3f8c2e917b4d605a3f8c2e917b4d605" // 16 distinct hex chars → ln16 ≈ 2.77 nats
    val got = secrets(Seq(
      s"please rotate the key $key immediately",
      "the internationalization documentation paragraph describes exceedingly long words",
      "account 123456789012345678 balance pending", // digit run: no letter → shape-screened
      "xxxxxxxx1111111111xxxxxxxx1111111111 repeated"))  // mixed but ~0.69 nats → entropy-screened
    assert(got == Set(key), s"got $got")
  }

  test("secretScan: per-doc dedup — one secret pasted twice is one finding") {
    val key = "a3f8c2e917b4d605a3f8c2e917b4d605"
    import spark.implicits._
    val df = Seq((1L, s"$key appears then again $key here")).toDF("doc_id", "text")
    assert(Curation.secretScan(df).count() == 1L)
  }

  test("redactSecrets: flagged fragments rewrite to <SECRET>; spacing is lossless") {
    import spark.implicits._
    val key = "a3f8c2e917b4d605a3f8c2e917b4d605"
    val df = Seq(
      (1L, s"rotate  $key  now"), // double spaces must survive
      (2L, "plain words stay untouched")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        Curation.redactSecrets(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "rotate  <SECRET>  now", s"got ${got(1L)}")
    assert(got(2L) == "plain words stay untouched")
  }

  test("redactSecrets agrees with secretScan on every whitespace-delimited secret") {
    import spark.implicits._
    val key = "a3f8c2e917b4d605a3f8c2e917b4d605"
    val texts = Seq(
      (1L, s"a $key b"), (2L, "nothing here"),
      (3L, s"$key"), (4L, s"x ${key}distinct0123456789AB y"))
    val df = texts.toDF("doc_id", "text")
    val scanned = Curation.secretScan(df)
      .collect().map(_.getLong(0)).toSet
    val redacted = df.select(col("doc_id"),
        Curation.redactSecrets(col("text")).as("red"))
      .collect().filter(_.getString(1).contains("<SECRET>")).map(_.getLong(0)).toSet
    assert(scanned == redacted, s"scan $scanned != redact $redacted")
  }

  test("secretScan: a permissive minLen is rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Curation.secretScan(df, minLen = 4) }
  }

  test("local point arms agree with the distributed scan/redact over the whole fixture") {
    // the PyFacade serving arms must be bit-identical to the engine's
    // column expressions — including the integer-exact entropy
    // quantization (per-term HALF_UP 6-dp rounding, floored report)
    val rows = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val dist = Curation.secretScan(docs.filter(col("text").isNotNull))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val local = rows.flatMap { case (id, t) =>
      Curation.secretScanLocal(t).map { case (tok, e) => (id, tok, e) }
    }.toSet
    assert(dist == local,
      s"scan arms disagree: only-dist ${dist -- local}, only-local ${local -- dist}")
    val distRed = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), Curation.redactSecrets(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, t) =>
      assert(Curation.redactSecretsLocal(t) == distRed(id), s"doc $id")
    }
    // the entropy kernel itself, on a value-bearing token set
    Seq("a3f8c2e917b4d605", "AKIA1234567890EXAMPLE", "aaaa1111aaaa1111",
      "x9", "").foreach { t =>
      val viaCol = spark.range(1)
        .select(graft.functions.TextFunctions.charEntropy(lit(t))).head().getDouble(0)
      assert(Curation.charEntropyLocal(t) == viaCol, s"token '$t'")
    }
  }

  // ---- temperature-scaled mixture weights ---------------------------

  private def mix(sizes: Seq[(String, Long)], q: Int): Map[String, (Long, Long, Long, Long)] = {
    import spark.implicits._
    Curation.mixtureWeights(sizes.toDF("g", "n"), "g", "n", q)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  /** Independent BigInt replay of the quarter-power + ppm/milli floors. */
  private def mixModel(sizes: Seq[(String, Long)], q: Int): Map[String, (Long, Long, Long, Long)] = {
    def w(n: Long): Double = {
      val d = n.toDouble
      var p = 1.0
      if ((q & 4) != 0) p *= d
      if ((q & 2) != 0) p *= math.sqrt(d)
      if ((q & 1) != 0) p *= math.sqrt(math.sqrt(d))
      p
    }
    val wu = sizes.map { case (g, n) => (g, n, BigInt(math.floor(w(n) * 1e6).toLong)) }
    val s = wu.map(_._3).sum
    val tot = BigInt(sizes.map(_._2).sum)
    wu.map { case (g, n, u) =>
      val ppm = u * 1000000 / s
      g -> (n, u.toLong, ppm.toLong, (ppm * tot / (BigInt(n) * 1000)).toLong)
    }.toMap
  }

  test("mixtureWeights: matches the BigInt model at every quarter exponent") {
    val sizes = Seq(("a", 1000000L), ("b", 10000L), ("c", 137L), ("d", 999L))
    for (q <- 0 to 4)
      assert(mix(sizes, q) == mixModel(sizes, q), s"alphaQuarters=$q")
  }

  test("mixtureWeights: α<1 flattens the head — small sources gain share, and " +
    "uniform sizes imply exactly 1 epoch") {
    val sizes = Seq(("big", 1000000L), ("small", 10000L))
    val half = mix(sizes, 2)
    // proportional share of 'small' is ~9901 ppm; sqrt smoothing lifts it
    assert(half("small")._3 > 9901L * 5,
      s"sqrt mix must lift the small source well above proportional: $half")
    assert(half("small")._4 > 1000L && half("big")._4 < 1000L,
      "the small source repeats (epochs>1) while the big one is undersampled")
    val uni = mix(Seq(("a", 5000L), ("b", 5000L), ("c", 5000L), ("d", 5000L)), 3)
    assert(uni.values.forall(_._4 == 1000L), s"uniform sizes → exactly 1.0 epochs: $uni")
  }

  test("mixtureWeights: misuse rejected loudly (bad α, non-positive sizes)") {
    import spark.implicits._
    val df = Seq(("a", 10L)).toDF("g", "n")
    intercept[IllegalArgumentException] { Curation.mixtureWeights(df, "g", "n", 5) }
    val bad = Seq(("a", 10L), ("b", 0L)).toDF("g", "n")
    val e = intercept[Exception] { Curation.mixtureWeights(bad, "g", "n", 2).collect() }
    assert(e.getMessage.contains("positive sizes"))
  }

  test("lDiversity: misuse rejected loudly (sensitive inside the QI; bad thresholds)") {
    import spark.implicits._
    val df = Seq(("a", "x")).toDF("qi", "sens")
    intercept[IllegalArgumentException] {
      Curation.lDiversity(df, Seq("qi", "sens"), "sens", 2, 2)
    }
    intercept[IllegalArgumentException] {
      Curation.lDiversity(df, Seq("qi"), "sens", 0, 2)
    }
  }
}
