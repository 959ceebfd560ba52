package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-22 (optimization round) kernel parity locks: each r22 rewrite
  * must stay BIT-IDENTICAL to the formula it replaced — same discipline
  * as Round21Spec.
  */
class Round22Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- JaccardSim long fast path (sorted-merge distinct counts) --------

  test("JaccardSim simLong equals the set-op formula on long arrays") {
    def refJac(a: Seq[java.lang.Long], b: Seq[java.lang.Long]): Double = {
      if (a == null || b == null) return 1.0
      val sa = a.toSet; val sb = b.toSet
      val union = (sa ++ sb).size
      if (union > 0) sa.intersect(sb).size.toDouble / union else 1.0
    }
    val rnd = new scala.util.Random(22)
    val rows: Seq[(Int, Seq[java.lang.Long], Seq[java.lang.Long])] =
      (1 to 150).map { i =>
        def arr(n: Int): Seq[java.lang.Long] =
          Seq.fill(n)(java.lang.Long.valueOf(rnd.nextInt(40).toLong))
        (i, arr(rnd.nextInt(20)), arr(rnd.nextInt(20)))
      } ++ Seq(
        (151, Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]),
        (152, Seq[java.lang.Long](1L, 1L, 2L), Seq.empty[java.lang.Long]),
        (153, Seq[java.lang.Long](Long.MaxValue, Long.MinValue, 0L),
          Seq[java.lang.Long](0L, Long.MaxValue)),
        (154, Seq[java.lang.Long](5L, null, 5L), Seq[java.lang.Long](null, 7L)),
        (155, null, Seq[java.lang.Long](1L)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id", graft.plans.JaccardSim($"a", $"b").as("j"))
      .as[(Int, Double)].collect().toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == refJac(a, b), s"jaccard id=$id")
    }
  }

  // ---- BpeishCount == the lookaround-split formula ---------------------

  test("BpeishCount equals size(filter(split(lookarounds)))") {
    def oldForm(text: org.apache.spark.sql.Column) =
      size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        t => length(t) > 0))
    val rows = Seq("hello world", "", "   ", "a", "abc123", "a-b_c.d",
      "É中文x9", "emoji 😀 mixed 🎉🎉", "...###...", "CamelCase42x",
      "tabs\tand\nnewlines", "ünïcödé wörds", "1+1=2") ++
      (1 to 80).map { i =>
        val rnd = new scala.util.Random(i)
        (0 until rnd.nextInt(50)).map(_ =>
          "aZ9 ,.é中\t😀#-".charAt(rnd.nextInt(12))).mkString
      }
    val df = rows.zipWithIndex.map(_.swap).toDF("id", "t")
    val got = df.select($"id",
        graft.text.TextFunctions.bpeishTokens($"t").as("g"),
        oldForm($"t").as("ref"))
      .as[(Int, Int, Int)].collect()
    got.foreach { case (id, g, ref) => assert(g == ref, s"bpeish id=$id") }
    // null text → null count in both forms
    val n = Seq((1, null: String)).toDF("id", "t")
      .select(graft.text.TextFunctions.bpeishTokens($"t").as("g"),
        oldForm($"t").as("ref"))
      .as[(Option[Int], Option[Int])].head()
    assert(n._1 == n._2 && n._1.isEmpty)
  }

  // ---- ChunksFixed == the sequence+transform formula -------------------

  test("ChunksFixed equals the sequence/transform formula incl. null text") {
    def oldForm(text: org.apache.spark.sql.Column, width: Int) = {
      val nC = greatest(((length(text) + (width - 1)) / width).cast("int"), lit(1))
      transform(sequence(lit(0), nC - 1), i => text.substr(i * width + 1, lit(width)))
    }
    val rows = Seq("", "a", "é中文😀" * 7, "x" * 100, "y" * 101, "z" * 199,
      null: String) ++ (1 to 40).map(i => "ab é😀" * i)
    val df = rows.zipWithIndex.map(_.swap).toDF("id", "t")
    for (w <- Seq(3, 100)) {
      val got = df.select($"id",
          graft.text.TextFunctions.chunksFixed($"t", w).as("g"),
          oldForm($"t", w).as("ref"))
        .as[(Int, Seq[String], Seq[String])].collect()
      got.foreach { case (id, g, ref) => assert(g == ref, s"chunks w=$w id=$id") }
    }
  }

  // ---- RepetitionStats == repetitionFeaturesTok(ngramsOf) --------------

  test("RepetitionStats equals the HOF repetition formula") {
    import graft.text.TextFunctions
    // the inline HOF formula (kept in TextFunctions.repetitionFeatures)
    // is the reference; the staged kernel must match it exactly
    val rows = Seq("the cat sat on the mat the cat", "", "solo",
      "a a a a a a", "x y x y x y x y", "é 中文 é 中文 mixed tokens here",
      "one two three four five six seven eight") ++
      (1 to 60).map { i =>
        val rnd = new scala.util.Random(100 + i)
        val vocab = Seq("the", "cat", "sat", "é", "中文", "x9", "lorem")
        (0 until rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      }
    val df = rows.zipWithIndex.map(_.swap).toDF("id", "text")
    val cmp = TextFunctions.withRepetitionFeatures(df, "text", 2, out = "k")
      .withColumn("ref", TextFunctions.repetitionFeatures(col("text"), 2))
      .select($"id",
        $"k.dup_token_frac", $"ref.dup_token_frac",
        $"k.dup_token_char_frac", $"ref.dup_token_char_frac",
        $"k.dup_ngram_frac", $"ref.dup_ngram_frac")
      .as[(Int, Double, Double, Double, Double, Double, Double)].collect()
    cmp.foreach { case (id, a1, b1, a2, b2, a3, b3) =>
      assert(a1 == b1 && a2 == b2 && a3 == b3,
        s"repetition id=$id: ($a1,$a2,$a3) vs ($b1,$b2,$b3)")
    }
    // null text: the tokenizer yields a null array → all-zero struct in
    // both forms (every `when` falls through to 0.0)
    val ndf = Seq((1, null: String)).toDF("id", "text")
    val n = TextFunctions.withRepetitionFeatures(ndf, "text", 2, out = "k")
      .withColumn("ref", TextFunctions.repetitionFeatures(col("text"), 2))
      .select($"k.dup_token_frac", $"ref.dup_token_frac",
        $"k.dup_ngram_frac", $"ref.dup_ngram_frac")
      .as[(Double, Double, Double, Double)].head()
    assert(n._1 == n._2 && n._3 == n._4 && n._1 == 0.0)
  }
}
