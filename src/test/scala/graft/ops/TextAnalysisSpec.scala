package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).head().get(0)
  }

  test("token counting: whitespace and subword") {
    assert(one("hello world  foo", TextAnalysis.tokenCount(col("text"))) == 3)
    // "don't stop!" -> don, ', t, stop, ! = 5 subword tokens
    assert(one("don't stop!", TextAnalysis.subwordTokenCount(col("text"))) == 5)
  }

  test("punct and stopword ratios") {
    assert(one("no punct here", TextAnalysis.punctRatio(col("text"))) == 0.0)
    val p = one("a,b.c!", TextAnalysis.punctRatio(col("text"))).asInstanceOf[Double]
    assert(p == 3.0 / 6.0)
    val s = one("the cat is on a mat", TextAnalysis.stopwordRatio(col("text"))).asInstanceOf[Double]
    assert(s == 3.0 / 6.0) // the, is, a
  }

  test("language guess by marker voting") {
    assert(one("the quick fox is in the barn", TextAnalysis.langGuess(col("text"))) == "en")
    assert(one("der hund und die katze ist", TextAnalysis.langGuess(col("text"))) == "de")
    assert(one("el perro y la casa es bonita", TextAnalysis.langGuess(col("text"))) == "es")
    assert(one("le chien et les chats est", TextAnalysis.langGuess(col("text"))) == "fr")
    assert(one("xyzzy qwerty", TextAnalysis.langGuess(col("text"))) == "unknown")
  }

  test("fingerprints are normalization-invariant") {
    val a = one("Hello,  World!", TextAnalysis.fingerprint(col("text")))
    val b = one("hello world", TextAnalysis.fingerprint(col("text")))
    assert(a == b)
  }

  test("robust fingerprint survives a small local edit") {
    // min-of-window-hashes: an edit near the end usually leaves the global
    // min window untouched
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and AGAIN")
    import spark.implicits._
    val fps = texts.toDF("text")
      .select(TextAnalysis.robustFingerprint(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    // ...but a completely different text changes it
    val other = one("entirely unrelated content here", TextAnalysis.robustFingerprint(col("text")))
    assert(other != fps(0))
  }

  test("quality score bounds and monotony") {
    val good = one("the quick brown fox is seen in a glen and it runs to the den",
      TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val bad = one("!!! ??? ,,, ...", TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(good > bad)
    assert(good <= 1.0 && bad >= 0.0)
  }

  test("profile emits one row per doc with all features") {
    val df = TextAnalysis.profile(graft.T.t(spark, "/root/testdata/sf0.001", "documents"))
    assert(df.columns.length == 10)
    assert(df.count() == 500)
  }

  test("repetition profile: counts, top-word share, dup-bigram share") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),      // bigrams: "a a","a a","a b" -> 3 total, 2 distinct
      (2L, "x y z"),        // no repetition at all
      (3L, "solo")          // one word: no bigrams -> dup share 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(1) == 4 && d1.getLong(2) == 2)
    assert(d1.getDouble(3) == 0.5)        // distinct ratio 2/4
    assert(d1.getDouble(4) == 0.75)       // "a" is 3 of 4 words
    assert(d1.getDouble(5) == 0.333333)   // 1 - 2/3 rounded
    val d2 = out(2L)
    assert(d2.getDouble(3) == 1.0 && d2.getDouble(5) == 0.0)
    val d3 = out(3L)
    assert(d3.getLong(1) == 1 && d3.getDouble(5) == 0.0)
  }

  test("tf-idf top-k: corpus-wide terms score low, rare terms rank first") {
    import spark.implicits._
    // "common" is in every doc (df=3, idf=1); each doc has a unique term
    val docs = Seq(
      (1L, "common rare1 rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare3")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: rare1 tf=2 df=1 -> 2*(3/1)=6; common tf=2 df=3 -> 2*(3/3)=2
    assert(out((1L, 1)) == (("rare1", 2L, 1L, 6.0)))
    assert(out((1L, 2)) == (("common", 2L, 3L, 2.0)))
    // doc 2: rare2 1*3=3 beats common 1*1=1
    assert(out((2L, 1))._1 == "rare2" && out((2L, 2))._1 == "common")
  }

  test("BPE tokenization follows the ranked merge table exactly") {
    import spark.implicits._
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "r")
    val docs = Seq((1L, "Low lower!"), (2L, "lolo"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.bpeTokens(col("text"), merges).as("toks"),
        TextAnalysis.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getInt(2)))).toMap
    // "low lower" -> [low] [low, er] (lowest-rank pair first, per word)
    assert(got(1L) == ((Seq("low", "low", "er"), 3)))
    // one merge pass merges EVERY occurrence of the best pair
    assert(got(2L) == ((Seq("lo", "lo"), 2)))
    // no applicable merges: one token per code point
    assert(got(3L) == ((Seq("x", "y", "z"), 3)))
  }

  test("distributed BPE training learns the classic merges deterministically") {
    import spark.implicits._
    // the standard subword-NMT example vocabulary:
    // low x5, lower x2, newest x6, widest x3
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(docs, k = 3)
    // hand-derived: (e,s)=9 ties (s,t)=9 -> lexicographic; then (es,t)=9;
    // then (l,o)=7 ties (o,w)=7 -> lexicographic
    assert(merges == Seq("e" -> "s", "es" -> "t", "l" -> "o"), merges.toString)
    // integer counts + total-order tie-break: partition-invariant
    assert(TextAnalysis.trainBpeMerges(docs.repartition(7), k = 3) == merges)
    // applying the learned merges tokenizes as the algorithm dictates
    val newest = Seq((1L, "newest")).toDF("doc_id", "text")
      .select(TextAnalysis.bpeTokens(col("text"), merges)).head().getSeq[String](0)
    assert(newest == Seq("n", "e", "w", "est"))
  }

  test("BPE oracle envelope: corpus words fit the fixpoint iteration bound") {
    // the text_bpe_train oracle (BpeSql) iterates each tokenization pass
    // L = 8 times — sufficient iff every normalized word has <= 9 code
    // points (tokens shrink by >= 1 per iteration). Pin the corpus bound
    // so a future data change cannot silently under-iterate the mirror.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val maxLen = graft.T.t(spark, s"/root/testdata/$sf", "documents")
        .select(explode(split(Dedup.normalize(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .agg(max(length(col("w"))))
        .head().getInt(0)
      assert(maxLen <= 9,
        s"$sf: max word length $maxLen exceeds the BPE oracle's L=8 bound")
    }
  }

  test("hash embedding: signed counts, sparse rows, similarity ordering") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta iota"), (4L, "rho rho rho")).toDF("doc_id", "text")
    val rows = TextAnalysis.hashEmbedding(docs, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // one repeated word = exactly one bucket with |value| = count
    val d4 = rows.filter(_._1 == 4L)
    assert(d4.length == 1 && math.abs(d4.head._3) == 3, s"got ${d4.toSeq}")
    // all values bound by word count; buckets in range
    assert(rows.forall { case (_, idx, v) => idx >= 0 && idx < 64 && math.abs(v) <= 4 })
    // sparse dot product: near-identical docs score higher than disjoint
    def dot(a: Long, b: Long): Long = {
      val ma = rows.filter(_._1 == a).map(r => r._2 -> r._3).toMap
      rows.filter(_._1 == b).map(r => ma.getOrElse(r._2, 0L) * r._3).sum
    }
    assert(dot(1L, 2L) > dot(1L, 3L), s"${dot(1L, 2L)} vs ${dot(1L, 3L)}")
    // partition-invariant (integer sums)
    val again = TextAnalysis.hashEmbedding(docs.repartition(7), dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("dense hash embeddings separate planted topics under k-means") {
    import spark.implicits._
    // two disjoint vocabularies -> orthogonal hash embeddings -> k-means
    // with k=2 must put the topics in different cells
    val sports = Seq("goal match striker keeper penalty corner",
      "match goal keeper offside striker league")
    val cooking = Seq("flour butter oven sugar yeast dough",
      "butter sugar dough oven flour recipe")
    val docs = (sports ++ cooking).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dense = TextAnalysis.denseHashEmbedding(docs, dim = 64)
    // dense form agrees with the sparse relation
    val sparse = TextAnalysis.hashEmbedding(docs, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    dense.collect().foreach { r =>
      val id = r.getLong(0)
      r.getSeq[Float](1).zipWithIndex.foreach { case (v, i) =>
        assert(v == sparse.getOrElse((id, i), 0L).toFloat, s"doc $id idx $i")
      }
    }
    val cents = Similarity.trainIvfCentroids(dense, k = 2, iters = 3, idCol = "doc_id")
    val cells = Similarity.assignCells(dense, cents, idCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(0L) == cells(1L) && cells(2L) == cells(3L),
      s"topic members must share a cell: $cells")
    assert(cells(0L) != cells(2L), s"topics must separate: $cells")
  }

  test("bigram LM score: smoothed conditionals, hand-computed micro-units") {
    import spark.implicits._
    // corpus: "the cat" occurs twice (frequent continuation), everything
    // else is a singleton. First-word vocab V = {the, cat, zebra, quark}.
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"),
      (3L, "zebra quark blip"), (4L, "single")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: "the cat" -> 1e6*(2+1) div (2+4) = 500000;
    //        "cat sat" -> 1e6*(1+1) div (2+4) = 333333; mean = 416666
    assert(out(1L) == (2L, 416666L), s"got ${out(1L)}")
    assert(out(2L) == (2L, 416666L))
    // doc 3: singleton bigrams w/ singleton first words:
    //        1e6*2 div (1+4) = 400000 each — smoothing keeps them BELOW
    //        the frequent-continuation doc (unsmoothed they'd be 1e6)
    assert(out(3L) == (2L, 400000L), s"got ${out(3L)}")
    assert(out(1L)._2 > out(3L)._2)
    // doc 4 has no bigrams but still gets a row
    assert(out(4L) == (0L, 0L))
  }

  test("trigram LM with backoff: hand-computed interpolated micro-units") {
    import spark.implicits._
    // "a b c" occurs twice; next-word vocab V = {c, d, e}, N = 4 trigrams
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.trigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "a b c": p3 = 1e6·3 div (2+3) = 600000, p2("b c"|b) = 1e6·3 div
    //   (2+3) = 600000, p1(c) = 1e6·3 div (4+3) = 428571
    //   → (4·600000 + 2·600000 + 428571) div 7 = 575510
    // "b c d": p3 = 1e6·2 div 5 = 400000, p2("c d"|c) = 400000,
    //   p1(d) = 1e6·2 div 7 = 285714 → 2685714 div 7 = 383673
    // doc mean: (575510 + 383673) div 2 = 479591
    assert(out(1L) == (2L, 479591L), s"got ${out(1L)}")
    assert(out(2L) == (2L, 479591L))
    // < 3 words: zero trigrams but still a row
    assert(out(3L) == (0L, 0L))
    // backoff property: an unseen trigram whose suffix bigram is common
    // outranks pure word soup — score via a probe doc scored against the
    // SAME corpus (append and rescore)
    val probe = docs.union(Seq((9L, "z b c")).toDF("doc_id", "text"))
    val probed = TextAnalysis.trigramLmScore(probe).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(probed(9L) > 0L)
  }

  test("PMI collocations: hand-computed ratios, marginals unaffected by minCount") {
    import spark.implicits._
    // Two alternating-pair docs. Pair relation (N = 18):
    //   (new,york) x5, (york,new) x4, (big,apple) x5, (apple,big) x4
    // marginals: c1(new)=5 c1(york)=4 c1(big)=5 c1(apple)=4 (c2 mirror)
    val docs = Seq(
      (1L, "new york new york new york new york new york"),
      (2L, "big apple big apple big apple big apple big apple"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 4, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // (18*4*1e6) div (4*4) = 4500000; (18*5*1e6) div (5*5) = 3600000
    assert(out.toSeq == Seq(
      ("apple", "big", 4L, 4500000L), ("york", "new", 4L, 4500000L),
      ("big", "apple", 5L, 3600000L), ("new", "york", 5L, 3600000L)))
    // raising minCount drops rows but never changes surviving scores:
    // the marginals and N come from the UNfiltered pair counts
    val strict = TextAnalysis.pmiCollocations(docs, minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(strict.toSeq == Seq(
      ("big", "apple", 5L, 3600000L), ("new", "york", 5L, 3600000L)))
  }

  test("corpus drift χ²: hand-computed contributions, zero for identical slices") {
    import spark.implicits._
    val a = Seq((1L, "a a b")).toDF("doc_id", "text")
    val b = Seq((2L, "a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.corpusDriftChisq(a, b, k = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // o_a(a)=2, o_b(a)=1, N_A=N_B=3: d = 2·3−1·3 = 3,
    // χ² = 10⁶·9·6 div (3·3·3) = 2_000_000 — symmetric for "b"
    assert(out("a") == (2L, 1L, 2000000L), s"got ${out("a")}")
    assert(out("b") == (1L, 2L, 2000000L))
    // identical slices: every contribution is exactly zero
    val same = TextAnalysis.corpusDriftChisq(a, a, k = 10).collect()
    assert(same.nonEmpty && same.forall(_.getLong(3) == 0L))
    // a slice-private word carries its full mass as drift
    val priv = TextAnalysis.corpusDriftChisq(
      Seq((1L, "x x")).toDF("doc_id", "text"),
      Seq((2L, "y")).toDF("doc_id", "text"), k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(priv("x") > 0L && priv("y") > 0L)
  }

  test("fuzzyVocabPairs: exact edit-distance-1 pairs, no cross product") {
    import spark.implicits._
    val docs = Seq(
      "kitten sleeps", "kiten sleeps",   // deletion typo of kitten
      "mitten purrs",                    // substitution neighbor of kitten
      "dog barks", "dogs bark",          // insertion neighbor
      "xa ay zz").toDF("text")           // xa/ay share deletion variant "a"
                                         // but are distance 2 — must NOT pair
    val got = TextAnalysis.fuzzyVocabPairs(docs)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = Set(
      ("kiten", "kitten"), ("kitten", "mitten"),
      ("bark", "barks"), ("dog", "dogs"))
    assert(got == want, s"got $got")
    assert(!got.contains(("xa", "ay")) && !got.contains(("ay", "xa")))
    val plan = TextAnalysis.fuzzyVocabPairs(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay an equi-join on deletion variants:\n$plan")
  }

  test("fuzzyVocabPairs agrees with brute-force levenshtein on a real slice") {
    val docs = graft.T.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val vocab = docs
      .select(explode(split(Dedup.normalize(col("text")), " ")).as("w"))
      .filter(length(col("w")).between(2, 24)).distinct()
    val brute = vocab.as("a").crossJoin(vocab.as("b"))
      .filter(col("a.w") < col("b.w") &&
        levenshtein(col("a.w"), col("b.w")) <= 1)
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
    val fast = TextAnalysis.fuzzyVocabPairs(docs)
    assert(fast.except(brute).isEmpty && brute.except(fast).isEmpty,
      "FastSS must return exactly the brute-force pair set")
  }

  test("readability: hand-computed Flesch / FK milli-units") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world. it is sunny!"), // W=5 S=2 SY=7
      (2L, "tv hmm."),                   // vowel-less words floor at 1 syllable
      (3L, "ababababab")                 // dense: FRE clamps to 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).orderBy("doc_id").collect()
    // doc 1: FRE = (206835*2*5 - 1015*25 - 84600*7*2) div 10 = 85857
    //        FKGL = (390*25 + 11800*14 - 15590*10) div 10 = 1905
    assert(r(0).getAs[Long]("words") == 5)
    assert(r(0).getAs[Long]("sentences") == 2)
    assert(r(0).getAs[Long]("syllables") == 7)
    assert(r(0).getAs[Long]("fre_milli") == 85857)
    assert(r(0).getAs[Long]("fkgl_milli") == 1905)
    // doc 2: W=2, S=1 (one "." run), zero vowel runs -> SY = 2 (floor)
    assert(r(1).getAs[Long]("syllables") == 2)
    // doc 3: one word, 5 'a'-runs -> 84.6*5 sinks FRE below zero -> clamp
    assert(r(2).getAs[Long]("syllables") == 5)
    assert(r(2).getAs[Long]("fre_milli") == 0)
    assert(r(2).getAs[Long]("fkgl_milli") == 390 + 11800 * 5 - 15590)
  }

  test("vocabGrowth: hand-computed curve, holes filled, invariance") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), // introduces "a b", "b c"
      (1L, "a b"),   // nothing new
      (2L, "b c d"), // introduces "c d"
      (3L, "")       // no bigrams at all
    ).toDF("doc_id", "text")
    val r = TextAnalysis.vocabGrowth(docs, bucketDocs = 2)
      .orderBy("bucket").collect()
    assert(r.map(x => (x.getAs[Long]("bucket"), x.getAs[Long]("docs_n"),
      x.getAs[Long]("new_grams"), x.getAs[Long]("cum_vocab"))).toSeq ==
      Seq((0L, 2L, 2L, 2L), (1L, 2L, 1L, 3L)))
    // a bucket whose docs introduce nothing still appears with 0
    val r2 = TextAnalysis.vocabGrowth(
        Seq((0L, "x y"), (1L, "q r"), (2L, "x y"), (3L, "q r"))
          .toDF("doc_id", "text"), bucketDocs = 2)
      .orderBy("bucket").collect()
    assert(r2.map(x => (x.getAs[Long]("bucket"),
      x.getAs[Long]("new_grams"), x.getAs[Long]("cum_vocab"))).toSeq ==
      Seq((0L, 2L, 2L), (1L, 0L, 2L)))
    // partition-invariant: min-id first-occurrence is order-free
    val base = TextAnalysis.vocabGrowth(docs, bucketDocs = 2)
    val shuffled = TextAnalysis.vocabGrowth(docs.repartition(7), bucketDocs = 2)
    assert(base.except(shuffled).isEmpty && shuffled.except(base).isEmpty)
  }

  test("ctLangPredict: planted disjoint vocabularies classify correctly") {
    import spark.implicits._
    // two "languages" with disjoint character content
    val aa = "foo bar bazz foo bar"
    val bb = "qux quux corge qux"
    val docs = Seq(
      (0L, aa, "aa"), (1L, "bar bazz foo", "aa"),
      (2L, bb, "bb"), (3L, "corge qux quux", "bb"),
      (4L, "foo foo bar", "aa"), (5L, "quux qux corge corge", "bb"))
      .toDF("doc_id", "text", "lang")
    val train = docs.filter(col("doc_id") < 4)
    val out = TextAnalysis.ctLangPredict(docs, train)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(out.size == 6)
    out.foreach { case (id, (truth, pred, _)) =>
      assert(pred == truth, s"doc $id predicted $pred, wanted $truth")
    }
    // own-profile docs sit closer than the penalty-everything distance
    assert(out(0L)._3 < out.values.map(_._3).max * 2)
    // partition invariance: ranks and argmin are total-ordered
    val again = TextAnalysis.ctLangPredict(docs.repartition(7), train)
      .collect().map(_.toSeq).toSet
    assert(again == TextAnalysis.ctLangPredict(docs, train)
      .collect().map(_.toSeq).toSet)
  }

  test("stripHtml: scripts/styles/comments/tags go, entities decode, double-escape kept") {
    import spark.implicits._
    val html = "<html><head><style>p{x:1}</style></head><body>" +
      "<script>if (1 < 2) alert('hi');</script>" +
      "<!-- secret --><h1>Title</h1><p>A &amp; B &lt;ok&gt;   spaced" +
      "&nbsp;out</p><p>&amp;lt;literal&amp;gt;</p></body></html>"
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.stripHtml(col("h")).as("t")).head().getString(0)
    assert(out == "Title A & B <ok> spaced out &lt;literal&gt;", s"got: $out")
    // no tags, scripts, or comment payloads survive
    assert(!out.contains("secret") && !out.contains("alert") &&
      !out.contains("x:1"))
  }

  test("docNovelty: hand-computed novel shares, zeros for gram-less docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"),  // "a b", "b c" both first here -> 2/2
      (1L, "a b d"),  // "a b" seen, "b d" novel -> 1/2
      (2L, ""),       // no grams -> zeros
      (3L, "a b"))    // "a b" seen -> 0/1
      .toDF("doc_id", "text")
    val out = TextAnalysis.docNovelty(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      0L -> (2L, 2L, 1000000L), 1L -> (2L, 1L, 500000L),
      2L -> (0L, 0L, 0L), 3L -> (1L, 0L, 0L)), s"got $out")
    // min-doc-id attribution is partition-invariant
    val again = TextAnalysis.docNovelty(docs.repartition(7))
      .collect().map(_.toSeq).toSet
    assert(again == TextAnalysis.docNovelty(docs).collect().map(_.toSeq).toSet)
  }

  test("ngramImportanceScore: target-like docs outscore raw-like docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha alpha gamma alpha", true),
      (1L, "alpha gamma alpha alpha", true),
      (2L, "beta beta delta beta", false),
      (3L, "beta delta beta beta", false),
      (4L, "alpha alpha alpha alpha", false), // target-looking raw doc
      (5L, "beta beta beta beta", false))     // raw-looking raw doc
      .toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.ngramImportanceScore(docs, col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.size == 6)
    // the alpha-heavy doc carries target-heavy buckets -> higher ratio
    assert(out(4L) > out(5L),
      s"target-like ${out(4L)} should outscore raw-like ${out(5L)}")
    assert(out(0L) > out(2L))
    // partition invariance (bucket counts are combine-aggs; ratios exact)
    val again = TextAnalysis.ngramImportanceScore(docs.repartition(7), col("is_t"))
      .collect().map(_.toSeq).toSet
    assert(again == TextAnalysis.ngramImportanceScore(docs, col("is_t"))
      .collect().map(_.toSeq).toSet)
  }

  test("watermarkDetect: greedy-green chain flags, natural text does not") {
    import spark.implicits._
    // replicate Dedup.hashStr(b, 71) to steer generation toward green
    def green(b: String): Boolean = BigInt(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("71|" + b)
        .take(15), 16) % 2 == 0
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    // watermarked generator: always pick a green continuation
    val wm = new StringBuilder("alpha")
    var cur = "alpha"
    for (_ <- 1 to 60) {
      val nxt = vocab.find(v => green(s"$cur $v")).getOrElse(vocab.head)
      wm.append(" ").append(nxt); cur = nxt
    }
    // natural text: fixed pseudo-random walk, ignores greenness
    val nat = (0 until 60).map(i => vocab((i * 7 + i * i * 3) % 8))
      .mkString(" ")
    val docs = Seq((1L, wm.toString), (2L, nat), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.watermarkDetect(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_green"),
          r.getAs[Long]("is_watermarked"))).toMap
    assert(got(1L)._2 == got(1L)._1 && got(1L)._3 == 1L, got) // all green
    assert(got(2L)._3 == 0L, got)
    assert(got(3L) == ((0L, 0L, 0L))) // no bigrams, still a row
  }

  test("scriptProfile: each planted script dominates; ties break by order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain latin text"),
      (2L, "这是中文文本测试"),
      (3L, "русский текст"),
      (4L, "نص عربي"),
      (5L, "한국어 텍스트"),
      (6L, "ελληνικά"),
      (7L, ""),        // empty -> none
      (8L, "ab 中文")). // 2 latin vs 2 cjk: tie -> latin (fixed order)
      toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs)
      .collect().map(r => r.getLong(0) ->
        r.getAs[String]("dominant_script")).toMap
    assert(got == Map(1L -> "latin", 2L -> "cjk", 3L -> "cyrillic",
      4L -> "arabic", 5L -> "hangul", 6L -> "greek", 7L -> "none",
      8L -> "latin"), got)
  }

  test("codeDetect: code blob flags, prose and empty text do not") {
    import spark.implicits._
    val code =
      """def main(argc): return compute_sum(a, b) { var x = items[0]; }
        |import os; class FooBar { const innerValue = myVar; }""".stripMargin
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "sleeps in the afternoon sun without a care in the world"
    val docs = Seq((1L, code), (2L, prose), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.codeDetect(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("code_score"), r.getAs[Long]("is_code"))).toMap
    assert(got(1L)._2 == 1L, s"code must flag: ${got(1L)}")
    assert(got(2L)._2 == 0L, s"prose must not: ${got(2L)}")
    assert(got(3L) == ((0L, 0L))) // empty text scores 0, still gets a row
    // partition invariance (pure map)
    val again = TextAnalysis.codeDetect(docs.repartition(5))
      .collect().map(_.toSeq).toSet
    assert(again == TextAnalysis.codeDetect(docs).collect().map(_.toSeq).toSet)
  }

  test("simpsonDiversity: hand-computed concentration, empty doc gets a 0 row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),            // counts 2,1 -> ss=5, n=3 -> 5e6 div 9
      (2L, "loop loop loop"),   // single type -> concentration = unit
      (3L, "w x y z"),          // all distinct -> 4e6 div 16 = 250000
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.simpsonDiversity(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((3L, 555555L, 444445L)))
    assert(got(2L) == ((3L, 1000000L, 0L)))
    assert(got(3L) == ((4L, 250000L, 750000L)))
    assert(got(4L) == ((0L, 0L, 0L))) // wordless doc still gets a row
    // partition invariance
    val again = TextAnalysis.simpsonDiversity(docs.repartition(5))
      .collect().map(_.toSeq).toSet
    assert(again ==
      TextAnalysis.simpsonDiversity(docs).collect().map(_.toSeq).toSet)
  }

  test("gopherGate: each rule trips on its planted violation, good doc keeps") {
    import spark.implicits._
    val good = (Seq("the", "of") ++ Seq.fill(40)("steady")).mkString(" ")
    val short = "the of tiny doc here"
    val shortWords = (Seq("the", "of") ++ Seq.fill(40)("aa")).mkString(" ")
    val numeric = (Seq("the", "of") ++ Seq.fill(35)("12345")).mkString(" ")
    val noStop = Seq.fill(35)("steady").mkString(" ")
    val docs = Seq((1L, good), (2L, short), (3L, shortWords),
      (4L, numeric), (5L, noStop)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherGate(docs, minWords = 30)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("r_word_count"), r.getAs[Long]("r_word_len"),
          r.getAs[Long]("r_alpha"), r.getAs[Long]("r_stopwords"),
          r.getAs[Long]("keep"))).toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L, 1L)))
    assert(got(2L)._1 == 0L && got(2L)._5 == 0L) // too few words
    assert(got(3L)._2 == 0L && got(3L)._5 == 0L) // mean word length < 3
    assert(got(4L)._3 == 0L && got(4L)._5 == 0L) // digit soup
    assert(got(5L)._4 == 0L && got(5L)._5 == 0L) // no stopwords
    // every doc gets a row, map-only plan
    assert(got.size == 5)
    val plan = TextAnalysis.gopherGate(docs).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate shuffles:\n$plan")
  }

  test("hashCosineTopK: identical text scores exactly unit, ranks first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta"),
      (3L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val qs = Seq((7, "alpha beta gamma")).toDF("query_id", "qtext")
    val got = TextAnalysis.hashCosineTopK(docs, qs, k = 3)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("cossq_micro")))
      .sortBy(_._1)
    // exact self-similarity: dot = cn2 = qn2, so unit·dot² div (cn2·qn2)
    // is exactly 10^6 with zero float involvement
    assert(got.head == ((1, 1L, 1000000L)))
    assert(got.forall(_._3 <= 1000000L))
    assert(got.map(_._2).contains(2L) && got.map(_._2).contains(3L))
    // partition invariance: sparse feature sums are combine-aggs
    val again = TextAnalysis.hashCosineTopK(docs.repartition(5), qs, k = 3)
      .collect().map(_.toSeq).toSet
    assert(again ==
      TextAnalysis.hashCosineTopK(docs, qs, k = 3).collect().map(_.toSeq).toSet)
  }

  test("topicSegments: boundary at the cohesion drop, none within a topic") {
    import spark.implicits._
    val d = Seq(
      // two topics: cat sentences cohere, then a rocket sentence
      (1L, "the cat sat here. the cat ran fast. rocket fuel burns hot."),
      // one topic throughout
      (2L, "alpha beta gamma one. alpha beta gamma two. alpha beta gamma three."),
      // single sentence -> one segment, no boundary
      (3L, "hello world")).toDF("doc_id", "text")
    val got = TextAnalysis.topicSegments(d)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 1L, 2L)), got(1L).toString)
    assert(got(2L) == ((3L, 0L, 1L)), got(2L).toString)
    assert(got(3L) == ((1L, 0L, 1L)), got(3L).toString)
  }

  test("sentenceLangProfile: switches, dominant share, mixed-doc exposure") {
    import spark.implicits._
    val d = Seq(
      // en, de, en -> 2 switches, dominant en 2/3
      (1L, "the cat is a friend. der hund ist und brav. the end is near."),
      // uniform en, no switches
      (2L, "the a of. and the is. of and a."),
      // single sentence
      (3L, "la y el es")).toDF("doc_id", "text")
    val got = TextAnalysis.sentenceLangProfile(d)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(got(1L) == ((3L, 2L, "en", 666666L)), got(1L).toString)
    assert(got(2L) == ((3L, 0L, "en", 1000000L)), got(2L).toString)
    assert(got(3L) == ((1L, 0L, "es", 1000000L)), got(3L).toString)
  }

  test("kneserNeyBigramScore: continuation counts, hand-check, short docs") {
    import spark.implicits._
    // Corpus: 'york' occurs often but ONLY after 'new' (continuation
    // fan-in 1); 'run' appears after many distinct words (high fan-in).
    // Both test docs use an UNSEEN bigram '<ctx> <word>'? No — both
    // probe bigrams seen exactly once with the same c(w1.), so the
    // discounted first term is equal and the score difference is purely
    // the continuation term: KN must score 'go run' above 'go york',
    // while a frequency-based smoother would favor the more frequent
    // 'york'.
    val docs = Seq(
      (0L, "new york new york new york new york"),
      (1L, "we run they run you run dogs run"),
      (2L, "go york"), (3L, "go run"),
      (4L, "solo"), (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyBigramScore(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // < 2 words: zero row, never dropped
    assert(got(4L) == ((0L, 0L)) && got(5L) == ((0L, 0L)))
    val (nYork, sYork) = got(2L)
    val (nRun, sRun) = got(3L)
    assert(nYork == 1 && nRun == 1)
    assert(sRun > sYork,
      s"continuation backoff must favor high-fan-in 'run': $sRun vs $sYork")
    // hand check of doc 3 ('go run'): c(go run)=1, c(go.)=2, N1+(go.)=2,
    // N1+(.run)=5, N_types=12 (new york, york new, we run, run they,
    // they run, run you, you run, run dogs, dogs run, go york, go run,
    // solo has none; york appears after new and go -> recount:
    // types = {new york, york new, go york, go run, we run, run they,
    // they run, run you, you run, run dogs, dogs run} = 11;
    // N1+(.run)=5 (we,they,you,dogs,go), N1+(.york)=2 (new,go).
    // occ(go run) = 1e6*(4-3) div (4*2) + 1e6*3*2*5 div (4*2*11)
    //             = 125000 + 340909 = 465909
    assert(sRun == 465909L, s"hand-computed KN occurrence: $sRun")
    // occ(go york) = 125000 + 1e6*3*2*2 div (4*2*11) = 125000 + 136363
    assert(sYork == 261363L, s"hand-computed KN occurrence: $sYork")
  }

  test("kneserNeyTrigramScore: exact-rational differential + unit mass per history") {
    import spark.implicits._
    // exact fractions — the no-floor reference model
    case class Fr(n: BigInt, d: BigInt) {
      private def norm = { val g = n.gcd(d); Fr(n / g, d / g) }
      def +(o: Fr) = Fr(n * o.d + o.n * d, d * o.d).norm
      def *(o: Fr) = Fr(n * o.n, d * o.d).norm
      def micro: BigInt = n * 1000000 / d
    }
    val texts = Seq(
      0L -> "the cat sat on the mat and the cat ran",
      1L -> "the cat sat on a rug and a dog ran",
      2L -> "a dog sat on the mat while the cat sat",
      3L -> "go go go",
      4L -> "two words", 5L -> "")
    val docs = texts.toDF("doc_id", "text")
    // reference counts (texts are pre-normalized)
    val perDoc = texts.map { case (id, t) =>
      val w = t.split(" ").filter(_.nonEmpty)
      id -> w.sliding(3).filter(_.length == 3)
        .map(a => (a(0), a(1), a(2))).toSeq
    }.toMap
    val occ = perDoc.values.flatten.toSeq
    val c3 = occ.groupBy(identity).view.mapValues(_.size).toMap
    // (.toSeq before the count lookup: the key groups are SETS, and a
    // set-map would collapse equal counts before the sum)
    val ctx3 = c3.keys.groupBy(t => (t._1, t._2)).view
      .mapValues(ks => (ks.toSeq.map(c3).sum, ks.size)).toMap // (ctx3, n3)
    val cc2 = c3.keys.groupBy(t => (t._2, t._3)).view
      .mapValues(_.map(_._1).toSet.size).toMap // N1+(.w2w3)
    val ctx2 = cc2.keys.groupBy(_._1).view
      .mapValues(ks => (ks.toSeq.map(cc2).sum, ks.size)).toMap // (ctx2c, nb2)
    val cc1 = cc2.keys.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet.size).toMap // N1+(..w3)
    val nbt = cc2.size
    val d34 = Fr(3, 4)
    def p1(w3: String) = Fr(BigInt(cc1.getOrElse(w3, 0)), nbt)
    def p2(w2: String, w3: String): Fr = {
      val (c2c, nb2) = ctx2(w2)
      val disc = Fr(BigInt(4 * cc2.getOrElse((w2, w3), 0) - 3).max(0), 4 * c2c)
      disc + (d34 * Fr(nb2, c2c) * p1(w3))
    }
    def p3(h: (String, String), w3: String): Fr = {
      val (cx3, n3) = ctx3(h)
      val disc = Fr(BigInt(4 * c3.getOrElse((h._1, h._2, w3), 0) - 3).max(0), 4 * cx3)
      disc + (d34 * Fr(n3, cx3) * p2(h._2, w3))
    }
    // LAW 1 — unit mass: over the model's support V = {w3 : N1+(..w3)>0},
    // every observed history's dense conditional sums to EXACTLY 1 in
    // rationals (the floors in the micro form are the only loss), and
    // every term is >= 0
    val vocab = cc1.keySet
    ctx3.keys.foreach { h =>
      val terms = vocab.toSeq.map(w3 => p3(h, w3))
      terms.foreach(f => assert(f.n >= 0, s"negative KN mass at $h"))
      val s = terms.reduce(_ + _)
      assert(s == Fr(1, 1), s"history $h mass ${s.n}/${s.d} != 1")
    }
    // LAW 2 — differential: the operator's floored-micro chain tracks
    // the rational model within the compounding-floor envelope (3
    // nested floors + the mean floor; each loses < 1 micro, the nested
    // ones amplified by factors <= 3/4)
    val got = TextAnalysis.kneserNeyTrigramScore(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(4L) == ((0L, 0L)) && got(5L) == ((0L, 0L)),
      "<3-word docs come back zero, never dropped")
    perDoc.filter(_._2.nonEmpty).foreach { case (id, tris) =>
      val exp = (tris.map(t => p3((t._1, t._2), t._3)).reduce(_ + _) *
        Fr(1, tris.size)).micro
      val (n, kn) = got(id)
      assert(n == tris.size, s"doc $id trigram count")
      assert((BigInt(kn) - exp).abs <= 8,
        s"doc $id: micro chain $kn vs rational $exp")
      assert(kn > 0 && kn <= 1000000L, s"doc $id score out of (0, unit]")
    }
  }

  test("rakeKeywords: hand-computed deg/freq scores, corpus-driven stopword") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick fox the lazy dog"),
      (2L, "the fox")).toDF("doc_id", "text")
    // corpus stopword (top-1): 'the' (freq 3). Phrases: doc1 [quick fox],
    // [lazy dog]; doc2 [fox]. Word scores (unit·deg div freq):
    //   quick 2e6, lazy 2e6, dog 2e6, fox (2+1)e6 div 2 = 1500000.
    // Phrase scores: lazy dog 4e6 > quick fox 3.5e6; doc2 fox 1.5e6.
    val got = TextAnalysis.rakeKeywords(docs, nStop = 1, topK = 2,
        maxPhraseLen = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(got == Map(
      (1L, 1) -> (("lazy dog", 4000000L)),
      (1L, 2) -> (("quick fox", 3500000L)),
      (2L, 1) -> (("fox", 1500000L))), got.toString)
  }

  test("rakeKeywords: maxPhraseLen drops oversized runs; ranks pin ties") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e x y")).toDF("doc_id", "text")
    // no stopwords (nStop=0) -> the whole doc is ONE 7-token phrase,
    // over the 2-token cap -> no keywords at all
    assert(TextAnalysis.rakeKeywords(docs, nStop = 0, topK = 3,
      maxPhraseLen = 2).collect().isEmpty)
    // equal scores tie-break by phrase text ascending ('the' is the
    // clear top-frequency stopword here)
    val two = Seq((1L, "aa the bb the")).toDF("doc_id", "text")
    val r = TextAnalysis.rakeKeywords(two, nStop = 1, topK = 2,
        maxPhraseLen = 4)
      .orderBy("rank").collect().map(x => (x.getInt(1), x.getString(2)))
    assert(r.toSeq == Seq((1, "aa"), (2, "bb")), r.mkString(","))
  }

  test("oovRate: head vocabulary covers, tail tokens count as OOV") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "c"), (3L, ""))
      .toDF("doc_id", "text")
    // top-1 vocab = {a}; b and c are OOV
    val got = TextAnalysis.oovRate(docs, vocabSize = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((3L, 1L, 333333L)),
      2L -> ((1L, 1L, 1000000L)),
      3L -> ((0L, 0L, 0L))), got.toString)
  }

  test("blocklistFilter: exact flag fractions, zero-token doc kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good words only here"),
      (2L, "bad bad good good good good good good good bad"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistFilter(docs, Seq("bad", "BAD"),
        maxFracMicro = 250000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got(0) == ((4L, 0L, 0L, true)))
    // 3 of 10 flagged = 300000 micro > 250000 -> dropped
    assert(got(1) == ((10L, 3L, 300000L, false)))
    assert(got(2) == ((0L, 0L, 0L, true)))
  }

  test("gazetteerSpans: positions, overlaps, case-folding, short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alpha beta gamma beta gamma"),
      (2L, "beta"), // shorter than the 2- and 3-token phrases
      (3L, "nothing here"),
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gazetteerSpans(docs,
        Seq("beta gamma", "ALPHA", "gamma beta gamma"))
      .orderBy("doc_id", "start_token", "phrase_len")
      .collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    assert(r.toSeq === Seq(
      (1L, 0, 1, "alpha"),
      (1L, 1, 2, "beta gamma"),            // first occurrence
      (1L, 2, 3, "gamma beta gamma"),      // nested across the overlap
      (1L, 3, 2, "beta gamma")))           // overlapping second occurrence
  }

  test("minKProbBigram keeps ceil(k%) lowest types; never exceeds the mean") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b c d"), // types: (a,b)x3 (b,a)x2 (b,c) (c,d) -> 4 types, k=1
      (2L, "x y"),             // 1 type -> k = max(1, ceil(0.2)) = 1
      (3L, "solo"),            // no bigram -> zero row
    ).toDF("doc_id", "text")
    val kn = TextAnalysis.kneserNeyBigramScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val r = TextAnalysis.minKProbBigram(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_types") === 4L)
    assert(r(0).getAs[Long]("k_types") === 1L) // ceil(4/5) = 1
    // the bottom type's score cannot exceed the occurrence-weighted mean
    assert(r(0).getAs[Long]("min_k_micro") <= kn(1L))
    assert(r(1).getAs[Long]("k_types") === 1L)
    assert(r(1).getAs[Long]("min_k_micro") === kn(2L)) // single type = mean
    assert(r(2).getAs[Long]("n_types") === 0L &&
      r(2).getAs[Long]("min_k_micro") === 0L)
  }

  test("gazetteerSpans matches a brute-force token scan (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    def randDoc(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(4))).mkString(" ")
    val corpus = (0 until 30).map(i => (i.toLong, randDoc(5 + rnd.nextInt(25))))
    val phrases = Seq("aa", "bb cc", "cc cc", "aa bb cc", "dd aa dd")
    val expected = (for {
      (id, text) <- corpus
      toks = text.split(" ").toSeq
      ph <- phrases; pt = ph.split(" ").toSeq
      s <- 0 to toks.size - pt.size
      if toks.slice(s, s + pt.size) == pt
    } yield (id, s, pt.size, ph)).toSet
    val got = TextAnalysis.gazetteerSpans(corpus.toDF("doc_id", "text"),
        phrases)
      .collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
      .toSet
    assert(got == expected)
  }

  test("textRank: the hub sentence ranks first; isolated sentences never rank") {
    import spark.implicits._
    // s0 overlaps s1 AND s2; s1/s2 share nothing; s3 is isolated.
    val docs = Seq(
      (1L, "alpha beta. alpha gamma delta. beta epsilon zeta. totally different words.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.textRankSentences(docs, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // only the three connected sentences rank, hub s0 first
    assert(out.map(_._2).toSet == Set(0L, 1L, 2L), out.mkString(","))
    assert(out.find(_._3 == 1L).get._2 == 0L, out.mkString(","))
  }

  test("textRank is per-doc (no cross-doc edges) and deterministic under repartition") {
    import spark.implicits._
    // same words in both docs: if edges crossed docs the ranks would move
    val docs = Seq(
      (1L, "spark join window. spark shuffle."),
      (2L, "spark join window. spark shuffle. unrelated closing words."))
      .toDF("doc_id", "text")
    val a = TextAnalysis.textRankSentences(docs, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(a.map(_._1).distinct.toSeq == Seq(1L, 2L))
    val b = TextAnalysis.textRankSentences(docs.repartition(4), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(a.toSeq == b.toSeq)
  }

  test("unigram tokenizer: hand-computed Viterbi stats, tie and UNK pins") {
    import spark.implicits._
    import graft.functions.{ExactMicroOps, UnigramVocab}
    import org.apache.spark.unsafe.types.UTF8String
    // expression-level pins first: a hand vocab where [ab] ties [a,b]
    // exactly — the (score, MIN pieces) value must pick 1 piece
    val tie = new UnigramVocab(
      Seq("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L), 2)
    val tr = tie.stats(UTF8String.fromString("ab"))
    assert((tr.getLong(0), tr.getLong(1)) == ((-2000000L, 1L)), tr.toString)
    // unseen characters fall back to the UNK single-char score
    val ur = tie.stats(UTF8String.fromString("xy"))
    assert((ur.getLong(0), ur.getLong(1)) == ((-80000000L, 2L)), ur.toString)
    // corpus-trained: "ab ab cd" — piece counts a,b,ab = 2; c,d,cd = 1;
    // total 9; L := log2Micro. [ab] beats [a,b] since L(9) > 10⁶.
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val vocab = TextAnalysis.trainUnigramVocab(docs, maxPieceLen = 2,
      maxVocab = 64)
    val l9 = ExactMicroOps.log2Micro(9L)
    val got = TextAnalysis.unigramSegmentStats(docs, vocab)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).head
    assert(got == ((3L, 3L, 2L * (1000000L - l9) - l9, 6L, 500000L)),
      s"$got l9=$l9")
  }

  test("unigram tokenizer: long words chunk at 16; invariance under repartition") {
    import spark.implicits._
    val w20 = "abcdefghijklmnopqrst" // 20 chars -> chunks of 16 + 4
    val docs = Seq((1L, w20), (2L, "short words here")).toDF("doc_id", "text")
    val vocab = TextAnalysis.trainUnigramVocab(docs)
    val a = TextAnalysis.unigramSegmentStats(docs, vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(a.contains((1L, 2L, 20L)), a.toString) // 2 chunks, 20 chars
    val b = TextAnalysis.unigramSegmentStats(docs.repartition(5), vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(a == b)
    // single-char coverage: every doc segments (pieces >= 1 per chunk)
    val full = TextAnalysis.unigramSegmentStats(docs, vocab).collect()
    assert(full.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("textRank: negative doc ids decode exactly (floor-division node decode)") {
    import spark.implicits._
    // doc −1 encodes nodes −1000+idx; a trunc-div decode would emit
    // doc_id 0 with a mangled sent_idx — the floor decode must return
    // the original (doc_id, sent_idx) pairs
    val docs = Seq(
      (-1L, "alpha beta. alpha gamma. beta gamma."),
      (7L, "alpha beta. alpha gamma."))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textRankSentences(docs, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSet == Set(-1L, 7L), out.mkString(","))
    assert(out.filter(_._1 == -1L).map(_._2).toSet == Set(0L, 1L, 2L),
      out.mkString(","))
    assert(out.filter(_._1 == 7L).map(_._2).toSet == Set(0L, 1L),
      out.mkString(","))
  }
  test("zipf fit: exact closed-form replay, natural-ish slope is negative") {
    import spark.implicits._
    // planted power-law-ish head: word k appears ~ 60/k times
    val words = (1 to 12).flatMap(k => Seq.fill(60 / k)(s"w$k"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, headWords = 12).collect()(0)
    val (n, slope, icept, r2) = (got.getLong(0), got.getLong(1),
      got.getLong(2), got.getLong(3))
    assert(n == 12L)
    assert(slope < -700000L && slope > -1300000L, s"slope $slope")
    assert(r2 > 900000L, s"r2 $r2") // near-perfect log-log line
    // sequential replay with BigInt arithmetic
    import graft.functions.ExactMicroOps.log2Micro
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (w, c) => (-c, w) }
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (log2Micro(i + 1L) / 1000L, log2Micro(c) / 1000L) }
    val nn = BigInt(pts.size)
    val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val syy = pts.map(p => BigInt(p._2) * p._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val num = nn * sxy - sx * sy
    val dx = nn * sxx - sx * sx; val dy = nn * syy - sy * sy
    val eSlope = ((num.abs * 1000000) / dx) * num.signum
    val iNum = sy * dx - num * sx
    val eIcept = ((iNum.abs / (nn * dx)) * iNum.signum)
    val eR2 = (num * num * 1000000) / (dx * dy)
    assert(slope == eSlope.toLong && icept == eIcept.toLong &&
      r2 == eR2.toLong, s"($slope,$icept,$r2) vs ($eSlope,$eIcept,$eR2)")
    // partition invariance
    val got2 = TextAnalysis.zipfFit(docs.repartition(4), headWords = 12)
      .collect()(0)
    assert(got2.getLong(1) == slope && got2.getLong(3) == r2)
  }

  test("heaps fit: growing-vocab corpus reads beta > 0, exact replay") {
    import spark.implicits._
    // docs introduce NEW words steadily: doc i has words w{5i}..w{5i+4}
    // plus fillers -> V grows like N^beta with beta in (0, 1)
    val docs = (0 until 40).map { i =>
      val fresh = (0 until 5).map(j => s"w${i * 5 + j}")
      val filler = Seq.fill(15)("the")
      (i.toLong, (fresh ++ filler).mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.heapsFit(docs, bucketDocs = 5).collect()(0)
    val (n, slope, _, r2) = (got.getLong(0), got.getLong(1),
      got.getLong(2), got.getLong(3))
    assert(n == 8L)
    assert(slope > 500000L && slope < 1100000L, s"slope $slope")
    assert(r2 > 900000L, s"r2 $r2")
    // exact replay: cumulative tokens/vocab per bucket -> milli logs ->
    // closed forms
    import graft.functions.ExactMicroOps.log2Micro
    val pts = (1 to 8).map { b =>
      val nDocs = b * 5
      val toks = nDocs * 20L
      val vocab = nDocs * 5L + 1L // fresh words + 'the'
      (log2Micro(toks) / 1000L, log2Micro(vocab) / 1000L)
    }
    val nn = BigInt(pts.size)
    val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val num = nn * sxy - sx * sy
    val dx = nn * sxx - sx * sx
    val eSlope = ((num.abs * 1000000) / dx) * num.signum
    assert(slope == eSlope.toLong, s"$slope vs $eSlope")
  }

  test("wordpiece: greedy longest-match, UNK-whole-chunk, position kinds") {
    // hand-built vocab: initial {hel, h, e, l, o}, continuation
    // {lo, l, o, e} -- "hello" greedy: hel (initial, longest) + lo = 2
    // pieces; "ohe" -> o + h? no: initial o, then cont: e not at pos 1..
    // o|h? h not in cont -> actually cont has {lo,l,o,e}: pos1 'h' no
    // match -> whole chunk UNK
    val v = new graft.functions.WordPieceVocab(
      Seq("hel", "h", "e", "l", "o"), Seq("lo", "l", "o", "e"), 6)
    def st(s: String) = {
      val r = v.stats(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (r.getLong(0), r.getLong(1))
    }
    assert(st("hello") == ((2L, 0L)))   // hel + ##lo
    assert(st("helo") == ((2L, 0L)))    // hel + ##o
    assert(st("ohe") == ((1L, 1L)))     // pos 1 'h' unmatched -> [UNK]
    assert(st("h") == ((1L, 0L)))
    assert(st("") == ((0L, 0L)))
    assert(st("zz") == ((1L, 1L)))      // unseen char -> [UNK]
  }

  test("wordpiece: trained vocab segments the corpus with zero UNK; repartition-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the catalog of cats"),
      (3L, "abcdefghijklmnopqrst and more")).toDF("doc_id", "text")
    val vocab = TextAnalysis.trainWordPieceVocab(docs)
    val a = TextAnalysis.wordPieceSegmentStats(docs, vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    // every char of the training corpus is in the vocab both ways ->
    // no UNK anywhere; chunks of >16-char word split 16+4
    assert(a.forall(_._4 == 0L), a.mkString(","))
    assert(a.forall(t => t._2 >= 1L && t._5 > 0L))
    val d3 = a.find(_._1 == 3L).get
    assert(d3._2 == 4L, d3.toString) // 2 chunks for the 20-char word + 2
    // greedy uses longest pieces -> fertility strictly below 1 piece/char
    assert(a.forall(_._6 < 1000000L), a.mkString(","))
    val b = TextAnalysis.wordPieceSegmentStats(docs.repartition(5), vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("goodTuringSpectrum: hand-computed spectrum, f* identity, unseen mass") {
    import spark.implicits._
    // counts: a=3, b=2, c=2, d=1, e=1, f=1 -> N=10, N1=3, N2=2, N3=1
    val docs = Seq((1L, "a a a b b"), (2L, "c c d e f"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.goodTuringSpectrum(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_f"), r.getAs[Long]("f_star_micro"),
          r.getAs[Long]("p0_micro"), r.getAs[Long]("n_tokens")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // f* = (f+1)·N_{f+1}/N_f: f=1 -> 2·2/3 = 1333333; f=2 -> 3·1/2 =
    // 1500000; f=3 -> N4 = 0 -> 0 (the raw estimator's gap)
    assert(got(1L) === ((3L, 1333333L, 300000L, 10L)))
    assert(got(2L) === ((2L, 1500000L, 300000L, 10L)))
    assert(got(3L) === ((1L, 0L, 300000L, 10L)))
    // spectrum identity: Σ f·N_f = token total
    assert(got.map { case (f, (nf, _, _, _)) => f * nf }.sum == 10L)
    val again = TextAnalysis.goodTuringSpectrum(docs.repartition(5))
      .collect().map(_.toSeq).toSet
    assert(again == TextAnalysis.goodTuringSpectrum(docs)
      .collect().map(_.toSeq).toSet)
  }

  test("sgtFit: Z-transform hand-check, kernel-replayed smoothing, degenerate spectrum") {
    import spark.implicits._
    import graft.functions.ExactMicroOps.{log2Micro, exp2Micro}
    // counts: a=3, b=2, c=2, d=1, e=1, f=1 -> spectrum (1,3) (2,2) (3,1)
    // Z: f=1: q=0,t=2 -> 2·3e6/2 = 3e6; f=2: q=1,t=3 -> 2·2e6/2 = 2e6;
    //    f=3: q=2,t=2·3−2=4 -> 2·1e6/2 = 1e6
    val docs = Seq((1L, "a a a b b"), (2L, "c c d e f")).toDF("doc_id", "text")
    val rows = TextAnalysis.sgtFit(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("z_micro") == 3000000L)
    assert(rows(2L).getAs[Long]("z_micro") == 2000000L)
    assert(rows(3L).getAs[Long]("z_micro") == 1000000L)
    val slope = rows(1L).getAs[Long]("slope_micro")
    assert(slope < 0L, s"Z must fall with f here: $slope")
    // smoothed counts replay through the shared integer kernels
    rows.foreach { case (f, r) =>
      val d = log2Micro(f + 1) - log2Micro(f)
      val be = math.max(math.min(slope * d / 1000000L, 0L), -64000000L)
      assert(r.getAs[Long]("sgt_star_micro") == (f + 1) * exp2Micro(be),
        s"f=$f")
      assert(r.getAs[Long]("sgt_star_micro") <= (f + 1) * 1000000L)
    }
    // one-frequency corpus: dx = 0 -> slope 0 -> f* = (f+1)·10⁶
    val uni = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val u = TextAnalysis.sgtFit(uni).collect()
    assert(u.length == 1 && u.head.getAs[Long]("slope_micro") == 0L)
    assert(u.head.getAs[Long]("sgt_star_micro") == 2000000L)
    // partition invariance
    assert(TextAnalysis.sgtFit(docs.repartition(5)).collect()
      .map(_.toSeq).toSet == rows.values.map(_.toSeq).toSet)
  }

  test("dirichletQlMultiQuery: kernel-replayed scores; missing terms carry collection mass") {
    import spark.implicits._
    import graft.functions.ExactMicroOps.log2Micro
    val docs = Seq(
      (1L, "spark spark join"),       // dl 3
      (2L, "spark window window"),    // dl 3
      (3L, "filler words only here")) // dl 4, no query terms
      .toDF("doc_id", "text")
    val qs = Seq((1, Seq("spark", "window"))).toDF("query_id", "terms")
    val mu = 10L
    val got = TextAnalysis.dirichletQlMultiQuery(docs, qs, k = 10, mu = mu)
      .collect().map(r => r.getLong(1) ->
        ((r.getAs[Long]("n_matched"), r.getAs[Long]("ql_micro")))).toMap
    // NT = 10; cf(spark) = 3, cf(window) = 2
    def score(cSpark: Long, cWindow: Long, dl: Long): Long = {
      def term(c: Long, cfw: Long) =
        log2Micro(c * 10 + mu * cfw) - log2Micro((dl + mu) * 10)
      term(cSpark, 3) + term(cWindow, 2)
    }
    assert(got.keySet == Set(1L, 2L), "only matching docs rank")
    assert(got(1L) === ((1L, score(2, 0, 3))), s"${got(1L)}")
    assert(got(2L) === ((2L, score(1, 2, 3))), s"${got(2L)}")
    // doc 2 matches both terms and must outrank doc 1's spark-burst
    assert(got(2L)._2 > got(1L)._2)
    // partition invariance
    val again = TextAnalysis.dirichletQlMultiQuery(
      docs.repartition(5), qs, k = 10, mu = mu)
      .collect().map(_.toSeq).toSet
    assert(again == TextAnalysis.dirichletQlMultiQuery(docs, qs, k = 10,
      mu = mu).collect().map(_.toSeq).toSet)
  }

  test("rm3ExpansionTerms: feedback terms surface; lambda endpoints; invariance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark cluster"),   // relevant: has both query terms
      (2L, "spark join shuffle cluster"), // relevant
      (3L, "cooking recipes nothing"),    // irrelevant
      (4L, "spark alone here"))
      .toDF("doc_id", "text")
    val qs = Seq((1, Seq("spark", "join"))).toDF("query_id", "terms")
    val got = TextAnalysis.rm3ExpansionTerms(docs, qs, kDocs = 2,
      mTerms = 6, mu = 10L, lambdaMicro = 500000L).collect()
    val terms = got.map(_.getAs[String]("term")).toSet
    // the co-occurring feedback vocabulary must surface as expansion
    assert(terms.contains("cluster"), s"expansion missing: $terms")
    assert(!terms.contains("cooking"),
      "terms outside the feedback docs must not appear")
    val orig = got.filter(_.getAs[Boolean]("is_original"))
      .map(_.getAs[String]("term")).toSet
    assert(orig == Set("spark", "join"))
    // every rm3 weight is the documented interpolation of its parts
    got.foreach { r =>
      val rm1 = r.getAs[Long]("rm1_micro")
      assert(rm1 >= 0L && rm1 <= 1000000L)
      assert(r.getAs[Long]("rm3_micro") >= rm1 / 2 - 1,
        s"interpolation lost mass: $r")
    }
    // lambda = unit: pure query MLE — only original terms carry weight
    val pure = TextAnalysis.rm3ExpansionTerms(docs, qs, kDocs = 2,
      mTerms = 2, mu = 10L, lambdaMicro = 1000000L).collect()
    assert(pure.forall(_.getAs[Boolean]("is_original")))
    assert(pure.forall(_.getAs[Long]("rm3_micro") == 500000L))
    // partition invariance
    val again = TextAnalysis.rm3ExpansionTerms(docs.repartition(5), qs,
      kDocs = 2, mTerms = 6, mu = 10L, lambdaMicro = 500000L)
      .collect().map(_.toSeq).toSet
    assert(again == got.map(_.toSeq).toSet)
  }

  test("rm3Retrieve: expansion recalls docs sharing NO original term; lambda=1 preserves QL ranking") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark cluster shuffle"), // feedback doc
      (2L, "spark join cluster shuffle stage"), // feedback doc
      (3L, "cluster shuffle stage worker"),     // NO original terms
      (4L, "cooking recipes dinner tonight"),   // unrelated
      (5L, "spark mentioned once here"))
      .toDF("doc_id", "text")
    val qs = Seq((1, Seq("spark", "join"))).toDF("query_id", "terms")
    val got = TextAnalysis.rm3Retrieve(docs, qs, kDocs = 2, mTerms = 8,
      kFinal = 5, mu = 10L, lambdaMicro = 500000L).collect()
    val ids = got.map(_.getLong(1)).toSet
    // the PRF payoff: doc 3 matches only expansion terms, yet ranks
    assert(ids.contains(3L), s"expansion must recall doc 3: $ids")
    assert(!ids.contains(4L), "unrelated docs must not match")
    // lambda = 1: expansion reduces to the (uniform-weight) original
    // query, so the ranked ids equal plain Dirichlet QL's
    val pure = TextAnalysis.rm3Retrieve(docs, qs, kDocs = 2, mTerms = 8,
      kFinal = 5, mu = 10L, lambdaMicro = 1000000L)
      .collect().map(r => (r.getLong(1), r.getAs[Int]("rk")))
    val ql = TextAnalysis.dirichletQlMultiQuery(docs, qs, k = 5, mu = 10L)
      .collect().map(r => (r.getLong(1), r.getAs[Int]("rk")))
    assert(pure.toSet == ql.toSet,
      s"lambda=1 must preserve the QL ranking: $pure vs $ql")
    // partition invariance
    val again = TextAnalysis.rm3Retrieve(docs.repartition(5), qs,
      kDocs = 2, mTerms = 8, kFinal = 5, mu = 10L,
      lambdaMicro = 500000L).collect().map(_.toSeq).toSet
    assert(again == got.map(_.toSeq).toSet)
  }

  test("wordBurstiness: cf/df in exact micro, df gate, deterministic ties") {
    import spark.implicits._
    // 'x': cf=6 over 3 docs -> 2e6; 'y': cf=3 over 3 docs -> 1e6 (spread);
    // 'z': df=2 < minDf -> gated out
    val docs = Seq((1L, "x x x y z"), (2L, "x x y z"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.wordBurstiness(docs, minDf = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getAs[Long]("cf"),
        r.getAs[Long]("df"), r.getAs[Long]("burstiness_micro")))
    assert(got.toSeq == Seq(("x", 6L, 3L, 2000000L), ("y", 3L, 3L, 1000000L)))
  }

  test("missingMassBySource: hand-derived p0 and Chao1; invariance") {
    import spark.implicits._
    // A: tokens (a a b) -> N=3 types=2 N1=1 N2=1, p0=1/3, chao1=2+0=2
    // B: tokens (x y z) -> all singletons, p0=1, chao1=3+3*2/2=6
    val docs = Seq((1L, "a a b", "A"), (2L, "x y", "B"), (3L, "z", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.missingMassBySource(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("A", 3L, 2L, 1L, 1L, 333333L, 2L),
      ("B", 3L, 3L, 3L, 0L, 1000000L, 6L)), got.mkString(","))
    val again = TextAnalysis.missingMassBySource(docs.repartition(5))
      .collect().map(_.toSeq).toSet
    assert(again == TextAnalysis.missingMassBySource(docs)
      .collect().map(_.toSeq).toSet)
  }
}
