package graft

import graft.functions.Wordpiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WordpieceSpec extends AnyFunSuite {
  import TestSpark._

  test("greedy longest-match tokenization goldens") {
    val vocab = Set("un", "##aff", "##able", "##a", "##f", "hello",
      "h", "e", "l", "o", "##e", "##l", "##o")
    assert(Wordpiece.tokenizeWord("unaffable", vocab) == Seq("un", "##aff", "##able"))
    assert(Wordpiece.tokenizeWord("hello", vocab) == Seq("hello"))
    assert(Wordpiece.tokenizeWord("helo", vocab) == Seq("h", "##e", "##l", "##o"))
    assert(Wordpiece.tokenizeWord("xyz", vocab) == Seq("[UNK]"))
  }

  test("corpus vocab covers the documents table; known words stay whole") {
    val docs = Tables.documents(spark, sf)
    val vocab = Wordpiece.buildVocab(docs, minFreq = 50)
    assert(vocab.contains("table") || vocab.contains("query") || vocab.nonEmpty)
    val pieces = Wordpiece.tokenize(spark, docs, vocab)
    val r = pieces.agg(sum(size(col("pieces"))).as("total")).head()
    assert(r.getLong(0) > 0)
    // frequent whole words should not fragment
    val frag = pieces
      .select(explode(col("pieces")).as("p"))
      .filter(col("p") === "[UNK]")
      .count()
    val total = pieces.select(explode(col("pieces"))).count()
    assert(frag.toDouble / total < 0.05, s"$frag/$total UNK")
  }

  test("BPE goldens: iterative lowest-rank merge, not greedy longest match") {
    import graft.functions.Bpe
    // merge order decides the segmentation: with (h,u) ranked first,
    // "hug" merges h+u before u+g can ever pair
    val ranksHU = Map(("h", "u") -> 0, ("u", "g") -> 1)
    assert(Bpe.bpeWord("hug", ranksHU) == Seq("hu", "g"))
    // flip the ranks and the same word segments differently
    val ranksUG = Map(("u", "g") -> 0, ("h", "u") -> 1)
    assert(Bpe.bpeWord("hug", ranksUG) == Seq("h", "ug"))
    // merges chain: learned symbols merge further up the table
    val chain = Map(("h", "u") -> 0, ("hu", "g") -> 1)
    assert(Bpe.bpeWord("hug", chain) == Seq("hug"))
    // no applicable merge: stays fully split (BPE has no [UNK])
    assert(Bpe.bpeWord("xyz", ranksHU) == Seq("x", "y", "z"))
    assert(Bpe.bpeWord("", ranksHU) == Seq.empty)

    // DISTINGUISHING case vs greedy wordpiece: with "hug" in the vocab,
    // wordpiece consumes the whole word; BPE with only the (h,u) merge
    // learned cannot — it replays merge history, not vocab lookup
    val vocab = Set("hug", "h", "u", "g", "##u", "##g")
    assert(Wordpiece.tokenizeWord("hug", vocab) == Seq("hug"))
    assert(Bpe.bpeWord("hug", Map(("h", "u") -> 0)) == Seq("hu", "g"))
  }

  test("BPE training learns the most frequent pair first, deterministically") {
    import graft.functions.Bpe
    // corpus: "aa ab aa ab aa" repeated — pair (a,a) appears 3x/doc,
    // (a,b) 2x/doc → first merge must be (a,a)
    val docs = spark
      .createDataFrame((1L to 10L).map(i => (i, "aa ab aa ab aa")))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, nMerges = 2, minFreq = 1)
    assert(merges.head == ("a", "a"))
    assert(merges.size == 2)
    // tokenize with the learned table: map-side UDF over a broadcast
    val pieces = Bpe.tokenize(spark, docs, merges)
      .select(col("doc_id"), col("pieces"))
      .head()
      .getAs[scala.collection.Seq[String]]("pieces")
    assert(pieces.contains("aa"))
  }

  test("BPE invariants over seeded random merge tables") {
    import graft.functions.Bpe
    val rng = new scala.util.Random(20260812L)
    val alphabet = "abcde"
    def randWord(n: Int) =
      (1 to n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 200) {
      val word = randWord(1 + rng.nextInt(12))
      // random rank table over random symbol pairs (1-2 chars a side)
      val pairs = (1 to rng.nextInt(8)).map { _ =>
        (randWord(1 + rng.nextInt(2)), randWord(1 + rng.nextInt(2)))
      }.distinct
      val ranks = pairs.zipWithIndex.toMap
      val pieces = Bpe.bpeWord(word, ranks)
      // losslessness: pieces always concatenate back to the word
      assert(pieces.mkString == word, s"$word via $ranks -> $pieces")
      // merging monotonicity: a longer merge table never splits finer
      val fewer = Bpe.bpeWord(word, pairs.take(pairs.size / 2).zipWithIndex.toMap)
      assert(pieces.size <= fewer.size,
        s"$word: ${pairs.size} merges -> ${pieces.size} pieces, " +
          s"${pairs.size / 2} merges -> ${fewer.size}")
    }
  }

  test("oracled pair stats pick the trainer's first merge (the weld)") {
    import graft.functions.Bpe
    // text_bpe_pair_stats is the DuckDB-oracled distributed core of the
    // trainer; this pins that its (weight desc, a, b) argmax IS the
    // trainer's first learned merge on the real testdata table — so the
    // oracle transitively checks the trainer's step-1 choice.
    val top = SparkEntry.queries("text_bpe_pair_stats")(spark, sf).head()
    val merges =
      Bpe.learnMerges(Tables.documents(spark, sf), nMerges = 1, minFreq = 50)
    assert(merges.head == ((top.getString(0), top.getString(1))))
  }

  test("text_bpe query runs over the documents table with sane shape") {
    val out = SparkEntry.queries("text_bpe")(spark, sf)
    assert(out.columns.toSeq == Seq("doc_id", "n_pieces", "head_pieces"))
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("n_pieces") > 0).count() > 0)
  }

  test("non-BMP input: code-point walk, whole-emoji vocab chars, no lone surrogates") {
    // tokenizeWord boundaries are code points: a surrogate pair is one
    // position, matching engines that index strings by code point
    // (the DuckDB oracle's substring/length)
    val vocab = Set("a", "##a", "🎉", "##🎉") // 🎉
    assert(Wordpiece.tokenizeWord("a🎉a", vocab) ==
      Seq("a", "##🎉", "##a"))
    // unmatched non-BMP char → [UNK], never a half-surrogate piece
    assert(Wordpiece.tokenizeWord("💡", vocab) == Seq("[UNK]"))
    // buildVocab char augmentation is per code point
    val docs = spark.createDataFrame(Seq((1L, "x🎉"))).toDF("doc_id", "text")
    val built = Wordpiece.buildVocab(docs, minFreq = 1)
    assert(built.contains("🎉") && built.contains("##🎉"))
    def wellFormed(p: String): Boolean = {
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        if (Character.isHighSurrogate(c)) {
          if (i + 1 >= p.length || !Character.isLowSurrogate(p.charAt(i + 1)))
            return false
          i += 2
        } else if (Character.isLowSurrogate(c)) return false
        else i += 1
      }
      true
    }
    assert(built.forall(wellFormed))
    // BPE splits the same way: one symbol per code point
    import graft.functions.Bpe
    assert(Bpe.bpeWord("a🎉", Map.empty) == Seq("a", "🎉"))
  }

  test("custom-delimiter text read (multibyte_split equivalent)") {
    // read_text on arbitrary delimiter (io/text/multibyte_split.hpp:92) →
    // textinputformat.record.delimiter
    val dir = java.nio.file.Files.createTempDirectory("graft-delim").toString
    val payload = (1 to 100).map(i => s"rec$i").mkString("|~|")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.txt"), payload)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "|~|")
    val rdd = spark.sparkContext
      .newAPIHadoopFile(
        s"$dir/data.txt",
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text],
        conf)
      .map(_._2.toString)
    assert(rdd.count() == 100)
    assert(rdd.first() == "rec1")
  }
}
