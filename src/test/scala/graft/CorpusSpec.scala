package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.CorpusOps

/** Corpus-prep operators (q63–q67): repetition stats (HOF route vs
  * explode route parity), PII redaction on crafted strings, chunking
  * boundary cases, deterministic resampling, and boilerplate fractions
  * against hand-computed expectations.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a a a a"),                    // one token: top=1.0 dup=1.0
    (1L, "a b c d"),                    // all unique: top=.25 dup=0
    (2L, "a b a b c"),                  // top=2/5, dup=4/5
    (3L, "x"),                          // single token
    (4L, "the cat sat on the mat")      // top=2/6, dup=2/6
  ).toDF("doc_id", "text")

  test("repetition stats: HOF route matches hand-computed values") {
    val got = docs.select(col("doc_id"),
        topWordFrac(col("text")).as("top"), dupWordFrac(col("text")).as("dup"))
      .orderBy("doc_id").as[(Long, Double, Double)].collect()
    val want = Seq(
      (0L, 1.0, 1.0), (1L, 0.25, 0.0), (2L, 0.4, 0.8),
      (3L, 1.0, 0.0), (4L, 2.0 / 6, 2.0 / 6))
    got.zip(want).foreach { case ((id, t, d), (wid, wt, wd)) =>
      assert(id == wid)
      assert(math.abs(t - wt) < 1e-12, s"top_word_frac doc $id")
      assert(math.abs(d - wd) < 1e-12, s"dup_word_frac doc $id")
    }
  }

  test("repetition stats: explode route agrees with the HOF route") {
    val corpus = Tables.load(spark, sf0001, "documents")
    val hof = corpus.select(col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      topWordFrac(col("text")).as("top_word_frac"),
      dupWordFrac(col("text")).as("dup_word_frac"))
    val exploded = CorpusOps.repetitionStatsExploded(corpus, "doc_id", "text")
    assert(hof.exceptAll(exploded).isEmpty && exploded.exceptAll(hof).isEmpty)
  }

  test("PII redaction replaces every family and counts match") {
    val rows = Seq(
      (1L, "mail bob.smith+x@sub.example.co.uk and eve@x.io now"),
      (2L, "call 415-555-0042 or 800.555.1234 today"),
      (3L, "host 10.0.255.3 and 192.168.1.1"),
      (4L, "mixed a@b.com 1.2.3.4 555-123-4567"),
      (5L, "clean text with no pii at all 1234")
    ).toDF("id", "s")
    val got = rows.select(col("id"),
        piiCount(col("s"), "email").as("e"),
        piiCount(col("s"), "ip").as("i"),
        piiCount(col("s"), "phone").as("p"),
        redactPii(col("s")).as("r"))
      .orderBy("id").as[(Long, Int, Int, Int, String)].collect()
    assert(got(0) == ((1L, 2, 0, 0, "mail <EMAIL> and <EMAIL> now")))
    assert(got(1) == ((2L, 0, 0, 2, "call <PHONE> or <PHONE> today")))
    assert(got(2) == ((3L, 0, 2, 0, "host <IP> and <IP>")))
    assert(got(3) == ((4L, 1, 1, 1, "mixed <EMAIL> <IP> <PHONE>")))
    assert(got(4) == ((5L, 0, 0, 0, "clean text with no pii at all 1234")))
  }

  test("chunking covers every token with the configured overlap") {
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkByTokens(d, "doc_id", "text", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 4L, "t6 t7 t8 t9"),
      (1L, 3L, 1L, "t9"),
      (2L, 0L, 1L, "a"),
      (3L, 0L, 3L, "a b c")))
    // every token index appears in at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (0 until 10).map(i => s"t$i").toSet)
  }

  test("weighted resample is deterministic, rate-accurate, and total for missing classes") {
    val n = 4000
    val d = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "keepish" else "cutish"))
      .toDF("id", "cls")
    val rates = Map("keepish" -> 0.9, "cutish" -> 0.1)
    val a = CorpusOps.weightedResample(d, "id", "cls", rates)
    val b = CorpusOps.weightedResample(d.repartition(13), "id", "cls", rates)
    // identical under repartitioning
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val byCls = a.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(math.abs(byCls("keepish").toDouble / (n / 2) - 0.9) < 0.05)
    assert(math.abs(byCls("cutish").toDouble / (n / 2) - 0.1) < 0.05)
    // class not in the rate map keeps everything
    val e = Seq((1L, "other"), (2L, "other")).toDF("id", "cls")
    assert(CorpusOps.weightedResample(e, "id", "cls", rates).count() == 2)
  }

  test("temperature resample: rarest class fully kept, dominant " +
      "flattened to sqrt share, deterministic under repartitioning") {
    val d = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("id", "cls")
    val a = CorpusOps.temperatureResample(d, "id", "cls", alpha = 0.5)
    val b = CorpusOps.temperatureResample(d.repartition(13), "id", "cls",
      alpha = 0.5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val byCls = a.groupBy("cls").count().as[(String, Long)].collect().toMap
    // rarest class keeps 100% by construction
    assert(byCls("small") == 100L)
    // dominant class rate = sqrt(100/900) = 1/3 (±hash noise)
    assert(math.abs(byCls("big").toDouble / 900 - 1.0 / 3) < 0.05,
      byCls.toString)
    // alpha = 1 is the identity (natural distribution untouched)
    assert(CorpusOps.temperatureResample(d, "id", "cls", alpha = 1.0)
      .count() == 1000L)
    // kept set agrees with weightedResample at the same derived rates:
    // the same Knuth draw decides both
    val viaRates = CorpusOps.weightedResample(d, "id", "cls",
      Map("big" -> math.floor(math.sqrt(100.0 / 900) * 10000) / 10000,
        "small" -> 1.0))
    assert(a.select("id").exceptAll(viaRates.select("id")).isEmpty &&
      viaRates.select("id").exceptAll(a.select("id")).isEmpty)
    intercept[IllegalArgumentException] {
      CorpusOps.temperatureResample(d, "id", "cls", alpha = 0.0)
    }
    // a NULL class is a class, not a row-loss: here it is the rarest,
    // so all its rows survive
    val withNull = ((0 until 200).map(i => (i.toLong, "big")) ++
      (200 until 210).map(i => (i.toLong, null: String)))
      .toDF("id", "cls")
    val kept = CorpusOps.temperatureResample(withNull, "id", "cls", 0.5)
    assert(kept.filter(col("cls").isNull).count() == 10L)
  }

  test("boilerplate n-gram fractions match a hand-built corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown"+"quick brown fox" with doc 2
      (2L, "the quick brown fox sleeps"),
      (3L, "entirely novel words here now"),
      (4L, "xs")                           // < 3 tokens: no output row
    ).toDF("doc_id", "text")
    val got = CorpusOps.boilerplateNgrams(corpus, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 2.0 / 3),
      (2L, 3L, 2L, 2.0 / 3),
      (3L, 3L, 0L, 0.0)))
  }

  test("greedy packing matches a sequential brute force and its invariants") {
    val rng = new scala.util.Random(42)
    val docs = (0L until 500L).map(i => (i, 1L + rng.nextInt(120)))
    val df = docs.toDF("id", "n")
    val budget = 256L
    val nShards = 7
    val got = CorpusOps.packGreedy(df, "id", "n", budget, nShards)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, sh, n, p) => id -> ((sh, n, p)) }.toMap
    // sequential reference walk
    val want = docs.groupBy(_._1 % nShards).flatMap { case (sh, ds) =>
      var acc = 0L; var pack = -1L
      ds.sortBy(_._1).map { case (id, n) =>
        if (pack < 0 || acc + n > budget) { pack += 1; acc = n } else acc += n
        id -> ((sh, n, pack))
      }
    }
    assert(got == want)
    // every pack within budget unless it holds a single oversized doc
    val packSums = got.values.groupBy(v => (v._1, v._3))
      .map { case (_, vs) => (vs.map(_._2).sum, vs.size) }
    assert(packSums.forall { case (sum, cnt) => sum <= budget || cnt == 1 })
    // deterministic under input repartitioning
    val again = CorpusOps.packGreedy(df.repartition(17), "id", "n", budget, nShards)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, sh, n, p) => id -> ((sh, n, p)) }.toMap
    assert(again == got)
  }

  test("greedy packing gives an oversized document its own pack") {
    val df = Seq((0L, 10L), (7L, 999L), (14L, 10L)).toDF("id", "n")
    val got = CorpusOps.packGreedy(df, "id", "n", budget = 100, nShards = 1)
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._4).toSeq == Seq(0L, 1L, 2L))
  }

  test("decreasing packing matches the longest-first walk and beats " +
      "arrival order on a planted mix") {
    // planted worst case for arrival order: longs alternate with
    // shorts and every adjacent pair overflows the budget (one doc
    // per bin); longest-first separates the phases so the shorts
    // pack two per bin
    val docs = (0L until 100L).map(i =>
      (i, if (i % 2 == 0) 200L else 100L))
    val df = docs.toDF("id", "n")
    val budget = 256L
    val got = CorpusOps.packGreedy(df, "id", "n", budget,
      nShards = 1, decreasing = true)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, sh, n, p) => id -> ((sh, n, p)) }.toMap
    // sequential reference: same walk over (n desc, id) order
    val want = {
      var acc = 0L; var pack = -1L
      docs.sortBy { case (id, n) => (-n, id) }.map { case (id, n) =>
        if (pack < 0 || acc + n > budget) { pack += 1; acc = n } else acc += n
        id -> ((0L, n, pack))
      }.toMap
    }
    assert(got == want)
    val binsDec = got.values.map(_._3).max + 1
    val binsArr = CorpusOps.packGreedy(df, "id", "n", budget,
      nShards = 1)
      .as[(Long, Long, Long, Long)].collect().map(_._4).max + 1
    assert(binsDec < binsArr,
      s"decreasing ($binsDec bins) must beat arrival order ($binsArr)")
  }

  test("bigram cross-entropy matches hand-computed corpus LM values") {
    // corpus positions: (a,b)×3 [2 in d0, 1 in d1], (b,a)×1, (b,c)×1
    // cu: a·=3, b·=2  →  P(b|a)=1, P(a|b)=P(c|b)=1/2
    val df = Seq(
      (0L, "a b a b"), (1L, "a b c"), (2L, "x")).toDF("id", "text")
    val got = CorpusOps.bigramCrossEntropy(df, "id", "text")
      .orderBy("id")
      .as[(Long, Option[Long], Option[Double])].collect()
    val half = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // 0.6931
    assert(got(0) == ((0L, Some(3L), Some(half / 3))))
    assert(got(1) == ((1L, Some(2L), Some(half / 2))))
    assert(got(2) == ((2L, None, None)))
  }

  test("bigram cross-entropy is invariant under repartitioning") {
    val rng = new scala.util.Random(7)
    val words = Array("the", "cat", "sat", "on", "mat", "dog", "ran")
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(3 + rng.nextInt(30))(words(rng.nextInt(words.length)))
        .mkString(" ")))
    val df = docs.toDF("id", "text")
    val a = CorpusOps.bigramCrossEntropy(df, "id", "text")
      .orderBy("id").collect().toSeq
    val b = CorpusOps.bigramCrossEntropy(df.repartition(13), "id", "text")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("hashed BoW embedding matches a reference computation and sums " +
      "to the signed token count") {
    val df = Seq((0L, "a b a"), (1L, "c"), (2L, "a c")).toDF("id", "text")
    val dim = 8
    val got = CorpusOps.hashedBowEmbedding(df, "id", "text", dim)
      .orderBy("id").as[(Long, Seq[Double])].collect()
    // reference: same md5 slot/sign arithmetic in plain Scala
    def slotSign(w: String): (Int, Long) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(h.substring(0, 8), 16) % dim).toInt,
        if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L)
    }
    val want = Seq(0L -> "a b a", 1L -> "c", 2L -> "a c").map { case (id, t) =>
      val v = Array.fill(dim)(0L)
      t.split(" ").foreach { w => val (j, s) = slotSign(w); v(j) += s }
      (id, v.map(_.toDouble).toSeq)
    }
    assert(got.toSeq == want)
    // each vector's abs-sum ≤ token count, equality when no collisions
    got.zip(want).foreach { case ((_, v), _) =>
      assert(v.map(math.abs).sum <= 3.0)
    }
  }

  test("hashed BoW embeddings feed the ANN operators directly") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the mat"), // exact dup → cosine 1
      (2L, "a completely different document here")).toDF("id", "text")
    val emb = CorpusOps.hashedBowEmbedding(docs, "id", "text", dim = 16)
      .select(col("id"), col("vec"))
    val pairs = graft.operators.Similarity
      .cosineNearDupPairs(emb, threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
  }

  test("hashed BoW embedding plans codegen'd aggregation, one md5 per " +
      "token") {
    val df = Seq((0L, "a b"), (1L, "c d")).toDF("id", "text")
    val plan = CorpusOps.hashedBowEmbedding(df, "id", "text", dim = 16)
      .queryExecution.executedPlan.toString
    // two-level agg: at most the (id, slot) exchange + the (id) one
    assert("Exchange".r.findAllIn(plan).size <= 2, s"extra shuffles:\n$plan")
    // the md5 bucketing evaluates once per token in the scan, not per
    // slot (the expression-reuse trap)
    assert("\\bmd5\\b".r.findAllIn(plan.toLowerCase).size <= 2,
      s"md5 re-inlined per slot:\n$plan")
  }

  test("TF-IDF hashed embedding matches a reference computation; " +
      "corpus-wide terms vanish") {
    val df = Seq((0L, "a b a"), (1L, "a c"), (2L, "a d")).toDF("id", "text")
    val dim = 8
    val got = CorpusOps.tfidfHashedEmbedding(df, "id", "text", dim)
      .orderBy("id").as[(Long, Seq[Double])].collect()
    def slotSign(w: String): (Int, Long) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(h.substring(0, 8), 16) % dim).toInt,
        if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L)
    }
    val docs = Seq(0L -> "a b a", 1L -> "a c", 2L -> "a d")
    val n = docs.size
    val dfc = docs.flatMap(_._2.split(" ").distinct).groupBy(identity)
      .map { case (w, ws) => w -> ws.size }
    val want = docs.map { case (id, t) =>
      val v = Array.fill(dim)(BigDecimal(0))
      t.split(" ").groupBy(identity).foreach { case (w, ws) =>
        val (j, s) = slotSign(w)
        val idf = BigDecimal(math.log(n.toDouble / dfc(w)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        v(j) += idf * ws.length * s
      }
      (id, v.map(_.toDouble).toSeq)
    }
    assert(got.toSeq == want)
    // "a" appears in every doc → idf = ln(1) = 0 → no slot carries it
    val aSlot = slotSign("a")._1
    got.foreach { case (id, v) =>
      val expectA = want.find(_._1 == id).get._2(aSlot)
      assert(v(aSlot) == expectA) // already net of the zero idf
    }
  }

  test("top-k n-grams: counts, deterministic tie-break, windowed form") {
    val df = Seq(
      (0L, "b a b c"), (1L, "a c a")).toDF("id", "text")
    // unigrams: a=3, b=2, c=2 → ties broken alphabetically
    val uni = CorpusOps.topNgrams(df, "text", n = 1, k = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(uni == Seq(("a", 3L, 1L), ("b", 2L, 2L), ("c", 2L, 3L)))
    // trigrams: "b a b", "a b c", "a c a" each once; k caps at 2
    val tri = CorpusOps.topNgrams(df, "text", n = 3, k = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(tri == Seq(("a b c", 1L, 1L), ("a c a", 1L, 2L)))
  }

  test("top-k n-grams: hash-first route equals a brute-force string " +
      "count on random corpora, ties included") {
    val rng = new scala.util.Random(23)
    val words = Array("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 80L).map(i =>
      (i, Seq.fill(4 + rng.nextInt(20))(words(rng.nextInt(words.length)))
        .mkString(" ")))
    val df = docs.toDF("id", "text")
    for (n <- Seq(2, 3); k <- Seq(5, 1000)) {
      val got = CorpusOps.topNgrams(df, "text", n, k)
        .as[(String, Long, Long)].collect().toSeq
      val brute = docs.flatMap(_._2.split(" ").sliding(n).filter(_.size == n)
          .map(_.mkString(" ")))
        .groupBy(identity).map { case (g, gs) => (g, gs.size.toLong) }
        .toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
        .zipWithIndex.map { case ((g, c), i) => (g, c, i + 1L) }
      assert(got == brute, s"n=$n k=$k")
    }
  }

  test("boilerplate counts distinct grams once per document") {
    // "a b a b a b" has 4 3-gram positions but only 2 distinct grams,
    // none shared with another doc
    val corpus = Seq((1L, "a b a b a b"), (2L, "c d e")).toDF("doc_id", "text")
    val got = CorpusOps.boilerplateNgrams(corpus, "doc_id", "text", 3, 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 0L, 0.0), (2L, 1L, 0L, 0.0)))
  }

  test("bounded top-k per group equals the window formulation under " +
      "heavy skew and many partitions") {
    val rng = new scala.util.Random(41)
    // one hot group with 3000 rows, several cold ones, duplicate
    // priorities to exercise the id tie-break
    val rows = (0L until 3000L).map(i => (i, "hot", rng.nextInt(50))) ++
      (3000L until 3030L).map(i => (i, s"cold${i % 3}", rng.nextInt(50)))
    val df = rows.toDF("id", "grp", "pri").repartition(17)
    val topk = udaf(graft.functions.Aggregators.topKByPriority(5))
    val got = df.groupBy(col("grp"))
      .agg(topk(col("pri").cast("double"), col("id")).as("kept"))
      .select(col("grp"), posexplode(col("kept")).as(Seq("r", "id")))
      .select(col("grp"), (col("r") + 1).as("rnk"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    val want = rows.groupBy(_._2).flatMap { case (g, gs) =>
      gs.sortBy(r => (-r._3, r._1)).take(5).zipWithIndex
        .map { case ((id, _, _), i) => (g, i + 1, id) }
    }.toSet
    assert(got == want)
  }

  test("span removal splices cross-doc, in-doc, and overlapping " +
      "duplicated spans; short and unique docs pass untouched") {
    val corpus = Seq(
      // docs 1/2 share the 5-token licence block at different offsets
      (1L, "u1 u2 all rights reserved by corp u3"),
      (2L, "all rights reserved by corp v1 v2 v3"),
      // 3: the duplicated span occurs twice WITHIN one doc (positions
      // 1 and 6 — windows overlap nothing, both removed)
      (3L, "p q r s t p q r s t tail1"),
      // 4: unique text, same length — untouched
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      // 5: shorter than the window — untouched even though its tokens
      // appear inside doc 1's span
      (5L, "rights reserved")
    ).toDF("doc_id", "text")
    val got = CorpusOps.removeDuplicateSpans(corpus, "doc_id", "text",
        n = 5, minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 8L, 3L, 5L, "u1 u2 u3"),
      (2L, 8L, 3L, 5L, "v1 v2 v3"),
      (3L, 11L, 1L, 10L, "tail1"),
      (4L, 8L, 8L, 0L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (5L, 2L, 2L, 0L, "rights reserved")))
  }

  test("span removal: a fully-boilerplate document survives as an " +
      "empty row, and minCount raises the dup threshold") {
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val all = CorpusOps.removeDuplicateSpans(corpus, "doc_id", "text",
        n = 5, minCount = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect()
    assert(all.toSeq == Seq(
      (1L, 5L, 0L, 5L, ""), (2L, 5L, 0L, 5L, ""), (3L, 5L, 0L, 5L, "")))
    // minCount=4 > multiplicity 3 ⇒ nothing is duplicated enough
    val kept = CorpusOps.removeDuplicateSpans(corpus, "doc_id", "text",
        n = 5, minCount = 4)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect()
    assert(kept.forall(r => r._3 == 5L && r._5 == "a b c d e"))
  }

  test("quantile-bucket resample: buckets are value-monotone quartiles, " +
      "keep rates follow the schedule, deterministic under repartition") {
    val d = (0 until 4000).map(i => (i.toLong, i.toDouble / 40.0))
      .toDF("id", "v")
    val rates = Seq(10000, 7000, 4000, 1000)
    val a = CorpusOps.quantileBucketResample(d, "id", "v", rates)
    val b = CorpusOps.quantileBucketResample(d.repartition(17), "id", "v",
      rates)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val rows = a.select("id", "v", "bucket")
      .as[(Long, Double, Int)].collect()
    // bucket is monotone in the value: quartile boundaries at 25/50/75
    rows.foreach { case (_, v, bk) =>
      val want = if (v <= 24.975) 0 else if (v <= 49.975) 1
        else if (v <= 74.975) 2 else 3
      assert(bk == want, s"v=$v bucket=$bk")
    }
    // bucket 0 is fully kept; later buckets thin out per the schedule
    val byB = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert(byB(0) == 1000)
    assert(math.abs(byB(1) - 700) < 60 && math.abs(byB(2) - 400) < 60 &&
      math.abs(byB(3) - 100) < 40, byB.toString)
  }

  test("token-budget sample: kept set is the exact hash-order prefix, " +
      "per-class budget respected within one doc, repartition-invariant") {
    val d = (0 until 600).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", 10L + i % 17)
    }.toDF("id", "cls", "tok")
    val budget = 800L
    val kept = CorpusOps.tokenBudgetSample(d, "id", "tok", "cls", budget)
      .select("id", "cls", "tok").as[(Long, String, Long)].collect()
    // brute-force replay: global prefix in (knuth-hash, id) order
    def knuth(id: Long) = (id * 2654435761L) % 2147483647L
    val want = d.as[(Long, String, Long)].collect()
      .groupBy(_._2).toSeq.flatMap { case (_, rs) =>
        var run = 0L
        rs.sortBy(r => (knuth(r._1), r._1)).takeWhile { r =>
          val in = run < budget; run += r._3; in }.toSeq
      }.toSet
    assert(kept.toSet == want, s"got=${kept.size} want=${want.size}")
    // budget respected within one overshooting doc per class
    kept.groupBy(_._2).foreach { case (cls, rs) =>
      val total = rs.map(_._3).sum
      assert(total < budget + rs.map(_._3).max, s"$cls total=$total")
      assert(total >= budget - 26, s"$cls underfilled: $total")
    }
    val reparted = CorpusOps.tokenBudgetSample(
      d.repartition(13), "id", "tok", "cls", budget)
      .select("id", "cls", "tok").as[(Long, String, Long)].collect().toSet
    assert(reparted == kept.toSet)
    // tiny nBuckets exercises many boundary buckets; result unchanged
    val coarse = CorpusOps.tokenBudgetSample(d, "id", "tok", "cls", budget,
      nBuckets = 3)
      .select("id", "cls", "tok").as[(Long, String, Long)].collect().toSet
    assert(coarse == kept.toSet)
  }

  test("token-budget sample: a bucket summing EXACTLY to the budget with " +
      "trailing zero-token docs follows the per-row rule (advisor r5)") {
    // Construct the adversarial case the advisor flagged: bucket 0's
    // cumulative token sum lands exactly on the budget and the bucket
    // ends (in the consistent hash order) with zero-token docs. The
    // naive rule admits iff run-before < budget, so those docs must be
    // DROPPED — a whole-bucket keep at `<= budget` wrongly admitted
    // them.
    def knuth(id: Long) = (id * 2654435761L) % 2147483647L
    val nB = 2
    val width = (2147483647L + nB - 1) / nB
    val ids = (0L until 40L).toSeq
    val b0 = ids.filter(id => knuth(id) / width == 0L)
      .sortBy(id => (knuth(id), id))
    assert(b0.size > 2, s"fixture needs a populated bucket 0: ${b0.size}")
    val zeroTail = b0.takeRight(2).toSet
    val toks = ids.map(id => id -> (if (zeroTail(id)) 0L else 10L)).toMap
    val budget = (b0.size - 2) * 10L // bucket 0 sums EXACTLY to budget
    val d = ids.map(id => (id, "c", toks(id))).toDF("id", "cls", "tok")
    val kept = CorpusOps.tokenBudgetSample(d, "id", "tok", "cls", budget,
      nBuckets = nB).select("id").as[Long].collect().toSet
    var run = 0L
    val want = ids.sortBy(id => (knuth(id), id)).flatMap { id =>
      val in = run < budget; run += toks(id)
      if (in) Some(id) else None
    }.toSet
    assert(kept == want, s"got=$kept want=$want")
    assert(zeroTail.forall(!kept.contains(_)),
      s"zero-token tail of the exact-budget bucket must be dropped: " +
        s"$zeroTail vs $kept")
  }

  test("stratified split: exact ceiling proportions per stratum, " +
      "non-empty strata always train, repartition-invariant") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CorpusOps.stratifiedSplit(docs, "doc_id", "source", 9000)
      .cache()
    val per = out.groupBy("source").agg(
      count(lit(1)).as("n"),
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("tr"))
    assert(per.filter(
      col("tr") =!= expr("(n * 9000 + 9999) div 10000")).isEmpty)
    assert(per.filter(col("tr") < 1).isEmpty)
    assert(out.count() === docs.count())
    val b = CorpusOps.stratifiedSplit(
      docs.repartition(11, col("text")), "doc_id", "source", 9000)
    assert(out.exceptAll(b).isEmpty && b.exceptAll(out).isEmpty)
  }

  test("weighted sample-k: exactly k per class (or all), ranks " +
      "contiguous, weight-biased vs uniform, repartition-invariant") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CorpusOps.weightedSampleK(docs, "doc_id", "lang",
      "n_chars", k = 10).cache()
    val perClass = out.groupBy("lang").agg(
      count(lit(1)).as("n"), max("samp_rank").as("mx"),
      min("samp_rank").as("mn"))
    val avail = docs.filter(col("n_chars") > 0).groupBy("lang")
      .agg(count(lit(1)).as("av"))
    val j = perClass.join(avail, Seq("lang"))
    assert(j.filter(col("n") =!= least(lit(10), col("av")) ||
      col("mx") =!= col("n") || col("mn") =!= 1).isEmpty)
    // Efraimidis–Spirakis property: the weighted sample's mean weight
    // must exceed the population mean (inclusion prob increases in w)
    val sampMean = out.agg(avg("n_chars")).head.getDouble(0)
    val popMean = docs.filter(col("n_chars") > 0)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(sampMean > popMean,
      s"weighted sample mean $sampMean should exceed population $popMean")
    val b = CorpusOps.weightedSampleK(
      docs.repartition(9, col("text")), "doc_id", "lang", "n_chars", 10)
    assert(out.exceptAll(b).isEmpty && b.exceptAll(out).isEmpty)
  }
}
