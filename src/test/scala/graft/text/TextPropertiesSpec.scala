package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.SparkFixture

/** Property-based checks for the compiled text expressions against
  * independent Scala reference implementations on generated inputs —
  * guards the custom-expression semantics the oracles depend on. */
class TextPropertiesSpec extends AnyFunSuite {
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(60).foreach(body)

  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // printable-ASCII-ish text with whitespace runs
  private val genText: Gen[String] = Gen.listOfN(
    40, Gen.frequency(
      (8, Gen.alphaNumChar),
      (3, Gen.const(' ')),
      (1, Gen.oneOf('\t', '\n')),
      (2, Gen.oneOf('.', ',', '!', '-', ';')))).map(_.mkString)

  private def evalOne(name: String, c: org.apache.spark.sql.Column,
      text: String): Any =
    Seq(text).toDF("text").select(c.as("r")).head().get(0)

  test("tokenEntropy == independent scalar Shannon entropy (micro-quantized)") {
    val docs = Seq(
      (1L, "a a a a a a"),                  // zero entropy: one token
      (2L, "a b c d e f"),                  // max entropy: ln 6
      (3L, "a a b b c c"),                  // uniform over 3: ln 3
      (4L, "the the the cat sat"),
      (5L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    def ref(toks: Seq[String]): (Long, Long, Long) = {
      val counts = toks.groupBy(identity).map(_._2.size.toLong).toSeq
      val n = counts.sum
      val sumMicro = counts
        .map(c => math.floor(c.toDouble * math.log(c.toDouble) * 1e6 + 0.5).toLong)
        .sum
      val h = math.floor(
        (math.log(n.toDouble) - sumMicro.toDouble / 1e6 / n.toDouble) * 1e6 + 0.5).toLong
      (n, counts.size.toLong, h)
    }
    docs.collect().foreach { r =>
      val toks = r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq
      assert(got(r.getLong(0)) == ref(toks), s"doc ${r.getLong(0)}")
    }
    assert(got(1L)._3 == 0L, "single-token doc has zero entropy")
    assert(got(2L)._3 == math.floor(math.log(6.0) * 1e6 + 0.5).toLong)
    assert(got(3L)._3 > got(4L)._3, "more skew, less entropy")
  }

  test("Shingles == distinct sliding n-grams of lowercased whitespace tokens") {
    forAll(Gen.zip(genText, Gen.choose(1, 4))) { case (text, n) =>
      val got = evalOne("sh", TextAnalysis.shingles($"text", n), text)
        .asInstanceOf[scala.collection.Seq[String]].toSeq
      // SQL trim() (Spark AND DuckDB) strips only ' ', unlike Java's
      // String.trim which also strips \n\t — the expression follows SQL
      // semantics so the oracles agree; mirror that here
      val sqlTrimmed = text.toLowerCase
        .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = sqlTrimmed.split("\\s+", -1).toSeq
      val expect =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      assert(got == expect, s"text=${text.take(60)} n=$n")
    }
  }

  test("NGrams == sliding n-grams WITH repeats; count = max(0, tokens-n+1)") {
    forAll(Gen.zip(genText, Gen.choose(1, 4))) { case (text, n) =>
      val got = evalOne("ng", TextAnalysis.ngrams($"text", n), text)
        .asInstanceOf[scala.collection.Seq[String]].toSeq
      val sqlTrimmed = text.toLowerCase
        .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = sqlTrimmed.split("\\s+", -1).toSeq
      val expect =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      assert(got == expect, s"text=${text.take(60)} n=$n")
      assert(got.size == math.max(0, toks.length - n + 1))
    }
  }

  test("IntDotProduct == exact BigInt dot over random int vectors") {
    val genVec = Gen.listOfN(16, Gen.choose(-127, 127))
    forAll(Gen.zip(genVec, genVec)) { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(TextExpressions.qdot($"a", $"b").as("d")).head().getLong(0)
      val expect = a.zip(b).map { case (x, y) =>
        BigInt(x) * BigInt(y) }.sum
      assert(BigInt(got) == expect)
    }
  }

  test("BpeTokenCount == letter-run ceil(len/4) + digits + punct reference") {
    forAll(genText) { text =>
      val got = evalOne("bpe", TextAnalysis.bpeTokenCount($"text"), text)
        .asInstanceOf[Long]
      var expect = 0L
      for (m <- "[A-Za-z]+".r.findAllIn(text)) expect += (m.length + 3) / 4
      expect += text.count(_.isDigit)
      expect += text.count(c => !c.isLetterOrDigit &&
        !" \t\n\r\f".contains(c))
      assert(got == expect, s"text=${text.take(60)}")
    }
  }

  test("MarkerCount == count of tokens in the marker set") {
    val markers = Seq("the", "and", "der", "und")
    forAll(genText) { text =>
      val got = evalOne("mc", TextAnalysis.markerCount($"text", markers), text)
        .asInstanceOf[Int]
      val expect = text.toLowerCase.trim.split("\\s+", -1)
        .count(markers.contains)
      assert(got == expect, s"text=${text.take(60)}")
    }
  }

  test("MinHash signature: containment monotonicity on planted supersets") {
    // signatures of A ⊆ B agree on at least the containment fraction in
    // expectation; here we check the deterministic invariant instead:
    // equal inputs give equal signatures and any input gives k values
    forAll(Gen.zip(genText, Gen.oneOf(16, 32))) { case (text, k) =>
      val sig1 = evalOne("s1", TextExpressions.minhashSignature(
        TextAnalysis.shingles($"text", 2), k), text).asInstanceOf[scala.collection.Seq[Long]].toSeq
      val sig2 = evalOne("s2", TextExpressions.minhashSignature(
        TextAnalysis.shingles($"text", 2), k), text).asInstanceOf[scala.collection.Seq[Long]].toSeq
      assert(sig1.length == k && sig1 == sig2)
    }
  }

  test("winnowing == independent reference (rightmost-min per window, value-deduped)") {
    // straight reimplementation from the Schleimer/Wilkerson/Aiken paper:
    // polynomial gram hashes, rightmost minimal hash of each w-window,
    // first-occurrence dedup — written against the PAPER, not the
    // expression code, so a transcription bug in either shows up here
    def winnowRef(raw: String, k: Int, w: Int): Seq[Long] = {
      val s = raw.toLowerCase
        .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .replaceAll("\\s+", " ")
      if (s.length < k) return Seq.empty
      val Base = 1000003L
      val grams = (0 to s.length - k).map { i =>
        var h = 0L
        (i until i + k).foreach(j => h = h * Base + s.charAt(j))
        h
      }
      if (grams.length <= w) return Seq(grams.min)
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      (0 to grams.length - w).foreach { start =>
        var minIdx = start
        ((start + 1) until (start + w)).foreach(i =>
          if (grams(i) <= grams(minIdx)) minIdx = i)
        out += grams(minIdx)
      }
      out.toSeq
    }
    forAll(Gen.zip(genText, Gen.choose(2, 6), Gen.choose(1, 6))) { case (text, k, w) =>
      val got = evalOne("wf", TextExpressions.winnow($"text", k, w), text)
        .asInstanceOf[scala.collection.Seq[Long]].toSeq
      assert(got == winnowRef(text, k, w), s"text=${text.take(60)} k=$k w=$w")
    }
  }

  test("SpanDedup.spans == brute-force k-token window enumeration (positions + hash bijection)") {
    // small vocab forces cross-doc repeats, so the hash-bijection check
    // actually exercises equal-span collisions across documents
    val genDoc = Gen.listOfN(10, Gen.oneOf("a", "b", "c", "ab")).map(_.mkString(" "))
      .flatMap(t => Gen.choose(0, 10).map(cut => t.split(" ").take(cut).mkString(" ")))
    forAll(Gen.zip(Gen.listOfN(6, genDoc), Gen.choose(2, 4))) { case (texts, k) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = SpanDedup.spans(docs, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getInt(1), (r.getLong(2), r.getLong(3))))
      // brute force: every k-token window of every doc with >= k tokens
      val expect = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
          .reverse.split("\\s+", -1).toSeq
        if (t.isEmpty || toks.length < k) Nil
        else (0 to toks.length - k).map(p =>
          ((i.toLong, p), toks.slice(p, p + k).mkString(" ")))
      }.toMap
      assert(got.map(r => (r._1, r._2)).toSet == expect.keySet,
        s"span positions diverged, k=$k texts=${texts.take(3)}")
      // (h1, h2) must be a bijection of the span STRING on this sample:
      // equal spans hash equal (dedup completeness), different spans hash
      // different (no false merges at property scale)
      val byHash = got.groupBy(_._3).view.mapValues(_.map(r => expect((r._1, r._2))).toSet)
      byHash.foreach { case (h, ss) =>
        assert(ss.size == 1, s"hash $h covers distinct spans $ss")
      }
      val bySpan = got.groupBy(r => expect((r._1, r._2))).view.mapValues(_.map(_._3).toSet)
      bySpan.foreach { case (sp, hs) =>
        assert(hs.size == 1, s"span '$sp' got distinct hashes $hs")
      }
    }
  }

  test("winnowing guarantee: shared substring >= w+k-1 chars -> shared fingerprint") {
    val gk = 5; val gw = 4
    val genPair = for {
      a <- genText; b <- genText
      shared <- Gen.listOfN(gk + gw - 1 + 5, Gen.alphaNumChar).map(_.mkString)
    } yield (s"$a $shared $b", s"$b $shared $a")
    forAll(genPair) { case (d1, d2) =>
      val f1 = evalOne("w1", TextExpressions.winnow($"text", gk, gw), d1)
        .asInstanceOf[scala.collection.Seq[Long]].toSeq.toSet
      val f2 = evalOne("w2", TextExpressions.winnow($"text", gk, gw), d2)
        .asInstanceOf[scala.collection.Seq[Long]].toSeq.toSet
      assert(f1.intersect(f2).nonEmpty,
        s"no shared fingerprint for planted substring: ${d1.take(50)}")
    }
  }
}
