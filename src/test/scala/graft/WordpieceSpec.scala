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
