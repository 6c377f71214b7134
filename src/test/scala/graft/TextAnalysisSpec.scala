package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** X4 text analysis: counts, quality gate, language ID, fingerprint
  * normalization invariance, rolling-hash determinism. */
class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("token and punctuation counts") {
    val df = Seq("the quick, brown fox. runs!").toDF("t")
    val r = df.select(
      TextAnalysis.tokenCount(col("t")).as("n"),
      TextAnalysis.punctCount(col("t")).as("p")).collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 3L) // comma, period, bang
  }

  test("language ID picks the dominant marker language, CASE-order tie-break") {
    val df = Seq(
      ("en", "the cat and the dog is in the house"),
      ("de", "der hund und die katze ist nicht zu hause"),
      ("fr", "le chat et la souris est un animal les deux"),
      ("xx", "zzz qqq www")
    ).toDF("expected", "t")
    val out = df.select(col("expected"), TextAnalysis.languageId(col("t")).as("got"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("en") == "en")
    assert(out("de") == "de")
    assert(out("fr") == "fr")
    assert(out("xx") == "unknown")
  }

  test("fingerprint is invariant to case, punctuation, and whitespace runs") {
    val df = Seq(
      ("a", "The quick   brown fox."),
      ("b", "the quick brown fox"),
      ("c", "THE QUICK\tBROWN   FOX!?"),
      ("d", "a different document")
    ).toDF("id", "t")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fp("a") == fp("b") && fp("b") == fp("c"))
    assert(fp("a") != fp("d"))
    assert(fp("a").length == 16)
  }

  test("quality gate: word-soup passes, degenerate docs fail") {
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog again and again today"),
      ("short", "hi"),
      ("nostops", "zzz qqq www rrr ttt yyy uuu iii ooo ppp")
    ).toDF("id", "t")
    val nt = TextAnalysis.tokenCount(col("t"))
    val out = df.select(col("id"),
      TextAnalysis.qualityGate(nt, length(col("t")).cast("long"),
        TextAnalysis.wordOccurrences(lower(col("t")), TextAnalysis.englishStopwords)).as("q"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("good"))
    assert(!out("short"))
    assert(!out("nostops"))
  }

  test("rolling hash: deterministic, order-sensitive, bounded by the modulus") {
    val df = Seq("abc", "acb", "abc").toDF("t")
    val out = df.select(TextAnalysis.rollingHash(col("t")).as("h")).collect().map(_.getLong(0))
    assert(out(0) == out(2))
    assert(out(0) != out(1))
    assert(out.forall(h => h >= 0 && h < 1000000007L))
  }

  test("subword estimate: ~len/4 per long word, min 1 per word") {
    val df = Seq("a supercalifragilistic cat").toDF("t")
    val r = df.select(TextAnalysis.subwordCountEstimate(col("t")).as("n")).collect().head
    // a->1, supercalifragilistic(20 chars)->5, cat->1
    assert(r.getLong(0) == 7L)
  }

  test("chunkByTokens: stride windows, short-doc single chunk, overlap reconstruction") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "only three tokens")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // stride 3: windows at 0,3,6,9 — the last is a 1-token tail
    assert(out((1L, 0L)) == ((4L, "w1 w2 w3 w4")))
    assert(out((1L, 1L)) == ((4L, "w4 w5 w6 w7")))
    assert(out((1L, 2L)) == ((4L, "w7 w8 w9 w10")))
    assert(out((1L, 3L)) == ((1L, "w10")))
    assert(!out.contains((1L, 4L)))
    // doc shorter than chunkSize → exactly one full-copy chunk
    assert(out((2L, 0L)) == ((3L, "only three tokens")))
    assert(!out.contains((2L, 1L)))
    // every adjacent pair overlaps by exactly `overlap` tokens
    val c0 = out((1L, 0L))._2.split(" ").toSeq
    val c1 = out((1L, 1L))._2.split(" ").toSeq
    assert(c0.takeRight(1) == c1.take(1))
  }

  test("linearScore: count-weighted sum, bias-only on zero hits, case-folded") {
    val docs = Seq(
      (1L, "Good good stuff"),        // good×2 (case-folded) + stuff×1
      (2L, "nothing matches here"),   // no model terms → bias only
      (3L, "stuff")                   // stuff×1
    ).toDF("doc_id", "text")
    val model = Seq(("good", "0.500000"), ("stuff", "-0.250000"))
      .toDF("term", "weight")
      .select(col("term"), col("weight").cast("decimal(18,6)").as("weight"))
    val got = TextAnalysis.linearScore(docs, "doc_id", "text", model,
        bias = new java.math.BigDecimal("0.100000"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 850000L)))  // 2·0.5 − 0.25 + 0.1, in micros
    assert(got(2L) == ((0L, 100000L)))
    assert(got(3L) == ((1L, -150000L)))
  }

  test("bm25TopTerms: rare beats common at equal tf; long docs are damped") {
    val docs = Seq(
      (1L, "rare common filler1 words words"),
      (2L, "common filler2 other other tokens"),
      (3L, "common filler3 more tokens here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopTerms(docs, "doc_id", "text", 10, minTokenLen = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // 'rare' (df=1) must outscore 'common' (df=3) in doc 1 at tf=1 each
    assert(out((1L, "rare")) > out((1L, "common")))
    // same term, same tf: the doc with more terms scores lower (length norm)
    // third doc without 'target' keeps idf > 0 (df < N)
    val short = Seq((1L, "target pad1a pad2a"),
      (2L, "target pad1b pad2b pad3b pad4b pad5b"),
      (3L, "unrelated padding words")).toDF("doc_id", "text")
    val o2 = TextAnalysis.bm25TopTerms(short, "doc_id", "text", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(o2((1L, "target")) > o2((2L, "target")))
  }

  test("BPE: canonical merges on the Sennrich-style corpus; greedy merge pass") {
    // low×5 lower×2 newest×6 widest×3 → merges: (e,s,9) then (es,t,9)
    // then (l,o,7) — the textbook sequence, ties broken (a,b)-ascending
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(docs, "text", 3)
    assert(merges == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
    // round-1 argmax must equal the fully-oracled census's top row
    val vocab = TextAnalysis.wordVocab(docs, "text")
      .select(split(col("word"), "").as("sym"), col("cnt"))
    val top = TextAnalysis.bpePairCensus(vocab)
      .orderBy(col("n").desc, col("a").asc, col("b").asc).limit(1)
      .collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2)) == (("e", "s", 9L)))
    // leftmost-greedy non-overlap: "aaa" under (a,a) → [aa, a]
    val g = TextAnalysis.bpeMergePair(
        Seq((Seq("a", "a", "a"), 1L)).toDF("sym", "cnt"), "a", "a")
      .collect().head.getSeq[String](0)
    assert(g == Seq("aa", "a"))
    // merged symbols stay atomic: [x, ab] under (a,b) is untouched
    val h = TextAnalysis.bpeMergePair(
        Seq((Seq("x", "ab"), 1L)).toDF("sym", "cnt"), "a", "b")
      .collect().head.getSeq[String](0)
    assert(h == Seq("x", "ab"))
  }

  test("BPE loop chaining: rounds 3/4 consume rounds 1/2's outputs (the case the natural fixture never hits)") {
    // engineered counts force the argmax chain: (x,y)=160 → (a,a)=90
    // (self-overlap: 'aaaa' has 3 adjacencies but merges to [aa,aa]) →
    // (xy,z)=60 (left side is round 1's OUTPUT) → (aa,aa)=30 (both
    // sides are round 2's outputs) → (p,q)=20
    val words = Seq.fill(100)("xy") ++ Seq.fill(60)("xyz") ++
      Seq.fill(30)("aaaa") ++ Seq.fill(20)("pq")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(docs, "text", 5)
    assert(merges == Seq((1, "x", "y", 160L), (2, "a", "a", 90L),
      (3, "xy", "z", 60L), (4, "aa", "aa", 30L), (5, "p", "q", 20L)))
    // a 6th round has no pairs left — the trainer stops, not crashes
    assert(TextAnalysis.trainBpeMerges(docs, "text", 6) == merges)
  }

  test("pretokenized BPE: punctuation splits off, merges never cross the boundary") {
    // raw whitespace words keep 'end.' as one census word, so the word
    // trainer can merge 'd' with '.'; the pretokenizer separates the
    // classes first — the real GPT-2 pipeline shape
    val docs = Seq.tabulate(8)(i => (i.toLong, "the end. the end. the end."))
      .toDF("doc_id", "text")
    val pv = graft.ops.TextAnalysis.pretokenVocab(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pv == Map("the" -> 24L, "end" -> 24L, "." -> 24L))
    val merges = graft.ops.TextAnalysis.trainBpeMergesPretokenized(docs, "text", 4)
    // every merged symbol stays single-class: no alpha+punct pair exists
    // in any round because no pretoken mixes the classes
    merges.foreach { case (_, a, b, _) =>
      val joined = a + b
      assert(joined.forall(_.isLetter) || joined.forall(!_.isLetter),
        s"merge ($a,$b) crossed a pretoken class boundary")
    }
    // the word-vocab trainer on the same corpus CAN produce the cross-
    // class merge (d + .) once (e,n,d) merges complete — the contrast
    // that makes the pretokenizer stage meaningful
    val wordMerges = graft.ops.TextAnalysis.trainBpeMerges(docs, "text", 4)
    assert(wordMerges.exists { case (_, a, b, _) =>
      (a + b).exists(_.isLetter) && (a + b).exists(!_.isLetter) })
  }

  test("BPE encode: merges-as-data fold == sequential literal passes; greedy holds") {
    // apply in rank order: l o w e r →(l,o)→(lo,w)→(e,r)→ [low, er]
    val sym = Seq((Seq("l", "o", "w", "e", "r"), 1L)).toDF("sym", "cnt")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val enc = sym.select(TextAnalysis.bpeApplyMerges(col("sym"),
        typedLit(merges).cast("array<struct<a:string,b:string>>")).as("e"))
      .collect().head.getSeq[String](0)
    assert(enc == Seq("low", "er"))
    // the data-form must equal folding literal bpeMergePair passes
    val viaLiteral = merges.foldLeft(sym) { case (v, (a, b)) =>
      TextAnalysis.bpeMergePair(v, a, b) }
      .collect().head.getSeq[String](0)
    assert(enc == viaLiteral)
    // greedy non-overlap survives the data form: aaaa → [aa, aa], aaa → [aa, a]
    val aa = Seq((Seq("a", "a", "a", "a"), 1L), (Seq("a", "a", "a"), 1L))
      .toDF("sym", "cnt")
      .select(TextAnalysis.bpeApplyMerges(col("sym"),
        typedLit(Seq(("a", "a"))).cast("array<struct<a:string,b:string>>")).as("e"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(aa.contains(Seq("aa", "aa")) && aa.contains(Seq("aa", "a")))
    // empty merge table: encode is the char split
    val none = sym.select(TextAnalysis.bpeApplyMerges(col("sym"),
        typedLit(Seq.empty[(String, String)])
          .cast("array<struct<a:string,b:string>>")).as("e"))
      .collect().head.getSeq[String](0)
    assert(none == Seq("l", "o", "w", "e", "r"))
  }

  test("BPE encode counts: occurrence-weighted doc totals under trained merges") {
    val docs = Seq(
      (1L, "low low lower"),   // low×2, lower×1
      (2L, "newest widest")).toDF("doc_id", "text")
    // merges chosen by hand: (l,o) and (lo,w) — low → [low] (1 tok),
    // lower → [low,e,r] (3), newest → 6 chars, widest → 6
    val m = Seq(("l", "o"), ("lo", "w"))
    val got = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 2L * 1 + 1 * 3)))
    assert(got(2L) == ((2L, 12L)))
    // pretoken mode tokenizes through the regex classes: "end." is two
    // pretokens (3 + 1 chars with no merges), one whitespace word
    val p = Seq((1L, "end.")).toDF("doc_id", "text")
    val gotP = TextAnalysis.bpeEncodeCounts(p, "doc_id", "text", Nil, pretoken = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val gotW = TextAnalysis.bpeEncodeCounts(p, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotP(1L) == ((2L, 4L)) && gotW(1L) == ((1L, 4L)))
  }

  test("unigram LM NLL: hand-checked micros, OOV mass, reference-likeness ordering") {
    // reference: "the cat" ×2 → counts the=2 cat=2, N=4 V=2
    val ref = Seq((1L, "the cat"), (2L, "the cat")).toDF("doc_id", "text")
    val lm = TextAnalysis.unigramLm(ref, "text")
    val got = lm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def micro(p: Double) = math.floor(math.log(p) * 1e6 + 0.5).toLong
    assert(got("the") == micro(3.0 / 6) && got("cat") == micro(3.0 / 6))
    assert(got(graft.ops.UnigramLm.OovWord) == micro(1.0 / 6))
    // scoring: "the the" = 2·lp(the); "dog dog dog" = 3·lp(oov) — exact
    val docs = Seq((10L, "the the"), (11L, "dog dog dog")).toDF("doc_id", "text")
    val nll = TextAnalysis.unigramNll(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(nll(10L) == ((2L, -2 * micro(3.0 / 6))))
    assert(nll(11L) == ((3L, -3 * micro(1.0 / 6))))
    // the filter property the op exists for: per-token NLL of reference-
    // like text is lower than OOV noise
    assert(nll(10L)._2.toDouble / 2 < nll(11L)._2.toDouble / 3)
  }

  test("pmiBigrams: hand-computed ratio on a tiny corpus") {
    // "x y x y x": T=5 tokens, bigrams (x,y),(y,x),(x,y),(y,x) -> B=4
    // c_xy(x,y)=2, c_x=3, c_y=2: ratio = 2*25/(4*3*2) = 50/24 = 2.083333
    val df = Seq(Tuple1("x y x y x")).toDF("text")
    val r = graft.ops.TextAnalysis.pmiBigrams(df, "text", minCount = 1L)
      .orderBy("w1", "w2").collect()
    assert(r.length == 2)
    val xy = r.find(x => x.getString(0) == "x" && x.getString(1) == "y").get
    assert(xy.getLong(2) == 2 && xy.getLong(3) == 3 && xy.getLong(4) == 2)
    assert(xy.getLong(5) == 2083333L)
    val yx = r.find(x => x.getString(0) == "y" && x.getString(1) == "x").get
    assert(yx.getLong(5) == 2083333L)
  }

  test("pmiBigrams: fixed phrase scores far above independent pair; minCount floors") {
    // "new york" always adjacent; "the" is everywhere so ("of","the")-style
    // pairs score near 1.0 ratio
    val docs = (1 to 20).map(i => s"new york trip $i the a the b the c")
    val df = docs.map(Tuple1(_)).toDF("text")
    val r = graft.ops.TextAnalysis.pmiBigrams(df, "text", minCount = 5L).collect()
    val ny = r.find(x => x.getString(0) == "new" && x.getString(1) == "york").get
    // singleton-count words in a fixed phrase: ratio ~ T^2/(B*c_x*c_y) >> 1e6 micros
    assert(ny.getLong(5) > 5000000L, s"new york ratio ${ny.getLong(5)}")
    assert(!r.exists(x => x.getString(1) == "1"), "minCount=5 drops the unique-suffix pairs")
  }

  test("bigramNll: hand-computed Laplace backoff (pair / seen-prefix / unseen-prefix), order sensitivity") {
    val s = spark; import s.implicits._
    val ref = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    // ref bigrams: (a,b)×2 (b,a)×1 (b,c)×1 → cx: a=2, b=2; V = |{a,b,c}| = 3
    def lp(num: Double, den: Long): Long =
      math.floor(math.log(num / den.toDouble) * 1e6 + 0.5).toLong
    val score = Seq((1L, "a b c z"), (3L, "z"), (5L, "b a c a")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bigramNll(score, "doc_id", "text", ref)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: (a,b)=ln(3/5), (b,c)=ln(2/5), (c,z)=unseen prefix → ln(1/3)
    val d1 = -(lp(3.0, 5) + lp(2.0, 5) + lp(1.0, 3))
    // doc 5: (b,a)=ln(2/5), (a,c)=seen prefix a → ln(1/5), (c,a)=ln(1/3)
    val d5 = -(lp(2.0, 5) + lp(1.0, 5) + lp(1.0, 3))
    assert(got == Seq((1L, 3L, d1), (3L, 0L, 0L), (5L, 3L, d5)))
    // order sensitivity: same bag as "a b" scored differently reversed
    val fwd = graft.ops.TextAnalysis.bigramNll(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", ref)
      .collect().head.getLong(2)
    val rev = graft.ops.TextAnalysis.bigramNll(
      Seq((1L, "b a")).toDF("doc_id", "text"), "doc_id", "text", ref)
      .collect().head.getLong(2)
    assert(fwd == -lp(3.0, 5) && rev == -lp(2.0, 5) && fwd != rev)
  }

  test("invertedIndex: df/cf, impact order with doc-id tie-break, pruning caps, minDf floor") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple banana banana banana"),
      (3L, "apple cherry"),
      (4L, "Apple") // case folds into 'apple'
    ).toDF("doc_id", "text")
    val idx = graft.ops.TextAnalysis.invertedIndex(docs, "doc_id", "text",
        minDf = 2, maxPostings = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // apple: df=4 > maxPostings=3 — pruned to top-3 by (tf desc, id asc):
    // doc1 tf2, then tf-1 tie broken by id: doc2, doc3 (doc4 cut)
    assert(idx("apple") == (4L, 5L, "1:2 2:1 3:1"))
    // banana: impact order puts doc2 (tf 3) before doc1 (tf 1)
    assert(idx("banana") == (2L, 4L, "2:3 1:1"))
    // cherry: df=1 < minDf — pruned from the index entirely
    assert(!idx.contains("cherry"))
  }

  test("readability: syllable/sentence heuristics and Flesch micros, hand-computed") {
    import spark.implicits._
    // "The cat sat. It ran!" — 5 words; 2 sentences; vowel groups:
    // e,a,a,i,a = 5 syllables.
    // flesch = 206.835 − 1.015·(5/2) − 84.6·(5/5) = 206.835 − 2.5375 −
    // 84.6 = 119.6975 → micros: 206835000 − (203·5·1e6)div(200·2)
    // − (423·5·1e6)div(5·5) = 206835000 − 2537500 − 84600000
    val df = Seq("The cat sat. It ran!").toDF("text")
    val got = df.select(
        graft.ops.TextAnalysis.tokenCount(col("text")).as("w"),
        graft.ops.TextAnalysis.sentenceCount(col("text")).as("se"),
        graft.ops.TextAnalysis.syllableCount(col("text")).as("sy"))
      .select(col("w"), col("se"), col("sy"),
        graft.ops.TextAnalysis.fleschMicro(col("w"), col("se"), col("sy"))
          .as("f"))
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((5L, 2L, 5L, 206835000L - 2537500L - 84600000L)))
    // terminator RUNS count once ("?!" and "..." are one boundary);
    // unterminated text floors at 1 sentence; 'y' counts as a vowel
    val runs = Seq("Really?! Yes... maybe", "no terminator here")
      .toDF("text")
      .select(graft.ops.TextAnalysis.sentenceCount(col("text")).as("se"),
        graft.ops.TextAnalysis.syllableCount(col("text")).as("sy"))
      .as[(Long, Long)].collect().toSeq
    // "Really?! Yes... maybe": runs "?!" and "..." → 2; vowel groups:
    // ea,y | e | ay,e → 5
    assert(runs.head == ((2L, 5L)))
    assert(runs(1)._1 == 1L)
  }

  test("canonicalizeUrl: case, ports, fragment, utm, param order by hand") {
    val s = spark; import s.implicits._
    import graft.ops.TextAnalysis.canonicalizeUrl
    def canon(u: String): String =
      Seq(u).toDF("u").select(canonicalizeUrl(col("u"))).as[String].head()
    assert(canon("HTTP://WWW.Site.COM:80/Path?utm_source=x&b=2&a=1#frag") ==
      "http://www.site.com/Path?a=1&b=2")
    assert(canon("https://Example.Org:443") == "https://example.org/")
    assert(canon("https://cdn.io:8443/x?a=1#s") == "https://cdn.io:8443/x?a=1")
    // :80 on https is NOT default — kept; empty query components drop
    assert(canon("https://h.io:80/p?&&a=1") == "https://h.io:80/p?a=1")
    // utm-only query collapses to no query at all
    assert(canon("http://h.io/p?utm_a=1&utm_b=2") == "http://h.io/p")
    assert(canon("  http://h.io  ") == "http://h.io/")
  }

  test("repairMojibake: un-corrupts UTF-8-as-Latin-1, never touches " +
      "clean or non-Latin-1 text") {
    val s = spark; import s.implicits._
    import graft.ops.TextAnalysis.repairMojibake
    def fix(t: String): String =
      Seq(t).toDF("t").select(repairMojibake(col("t"))).as[String].head()
    val original = "café déjà vu — naïve"
    val moji = new String(original.getBytes("UTF-8"), "ISO-8859-1")
    assert(moji != original && fix(moji) == original)
    // clean text (even with accents) passes through untouched
    assert(fix(original) == original)
    assert(fix("plain ascii text") == "plain ascii text")
    // text outside the Latin-1 range is never re-encoded (lossy guard)
    val cjk = "Ã© 中文"
    assert(fix(cjk) == cjk)
  }

  test("PSL registered domain: exception > wildcard > longest match > " +
      "default; public-suffix hosts have none") {
    import graft.ops.PublicSuffix
    val hosts = Seq(
      "shop.example.com",          // plain 2nd-level
      "a.shop.example.com",        // deeper subdomain, same domain
      "news.bbc.co.uk",            // ccTLD 2nd-level (the quota grain)
      "bbc.co.uk",                 // exactly suffix+1
      "co.uk",                     // IS a public suffix -> null
      "alice.github.io",           // private-section suffix
      "www.ck",                    // exception to *.ck -> registrable
      "x.foo.ck",                  // wildcard *.ck -> foo.ck is suffix
      "deep.x.foo.ck",             // deeper under the wildcard
      "portal.city.kawasaki.jp",   // 3-label exception
      "pref.kawasaki.jp",          // wildcard *.kawasaki.jp: IS a suffix
      "host.unknowntld",           // default rule: last label
      "singlelabel"                // 1 label, is the (default) suffix
    ).toDF("host")
    val got = PublicSuffix.withRegisteredDomain(hosts, "host", "dom")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("shop.example.com") == Some("example.com"))
    assert(got("a.shop.example.com") == Some("example.com"))
    assert(got("news.bbc.co.uk") == Some("bbc.co.uk"))
    assert(got("bbc.co.uk") == Some("bbc.co.uk"))
    assert(got("co.uk").isEmpty)
    assert(got("alice.github.io") == Some("alice.github.io"))
    assert(got("www.ck") == Some("www.ck"))
    assert(got("x.foo.ck") == Some("x.foo.ck"))
    assert(got("deep.x.foo.ck") == Some("x.foo.ck"))
    assert(got("portal.city.kawasaki.jp") == Some("city.kawasaki.jp"))
    assert(got("pref.kawasaki.jp").isEmpty)
    assert(got("host.unknowntld") == Some("host.unknowntld"))
    assert(got("singlelabel").isEmpty)
  }

  test("bm25Retrieve: a distinctive query term retrieves its document " +
      "at rank 1; scores are deterministic decimal sums") {
    import graft.ops.TextAnalysis
    val corpus = Seq(
      (1L, "zebra zebra zebra grazing savanna grassland"),
      (2L, "common words fill this document with nothing special"),
      (3L, "another common document about words and things here"),
      (4L, "grassland savanna with one zebra mention only")
    ).toDF("doc_id", "text")
    val qterms = Seq((100L, "zebra")).toDF("qid", "term")
    val out = TextAnalysis.bm25Retrieve(corpus, "doc_id", "text", qterms, 3)
      .orderBy("rk").collect()
    // only docs containing the term score at all
    assert(out.map(_.getLong(1)).toSet == Set(1L, 4L))
    // tf saturation still ranks the 3x mention first
    assert(out.head.getLong(1) == 1L && out.head.getLong(3) == 1L)
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }
}
