package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Held-out sentences (NOT the embedded seeds) per language. */
class LangIdSpec extends AnyFunSuite {

  private val samples = Seq(
    "en" -> "yesterday the children walked to the old library because they wanted to read about the history of their little town",
    "en" -> "this software reads every document and writes the extracted text into a table that other people can query later",
    "de" -> "gestern gingen die kinder zur alten bibliothek weil sie über die geschichte ihrer kleinen stadt lesen wollten",
    "de" -> "diese software liest jedes dokument und schreibt den extrahierten text in eine tabelle die andere später abfragen können",
    "es" -> "ayer los niños caminaron hasta la vieja biblioteca porque querían leer sobre la historia de su pequeño pueblo",
    "es" -> "este programa lee cada documento y escribe el texto extraído en una tabla que otras personas pueden consultar después",
    "fr" -> "hier les enfants sont allés à la vieille bibliothèque parce qu'ils voulaient lire sur l'histoire de leur petite ville",
    "it" -> "ieri i bambini sono andati alla vecchia biblioteca perché volevano leggere la storia della loro piccola città",
    "pt" -> "ontem as crianças caminharam até a velha biblioteca porque queriam ler sobre a história da sua pequena cidade")

  test("held-out sentences classify to the right language") {
    samples.foreach { case (expected, text) =>
      val got = LangId.detect(text)
      assert(got === expected, s"'${text.take(40)}...' -> $got, expected $expected")
    }
  }

  test("too-short or empty input is und; detection is deterministic") {
    assert(LangId.detect("") === LangId.Unknown)
    assert(LangId.detect(null) === LangId.Unknown)
    assert(LangId.detect("hi there") === LangId.Unknown)
    val t = samples(3)._2
    assert(LangId.detect(t) === LangId.detect(t))
    val (lang, margin) = LangId.detectScored(t)
    assert(lang === "de" && margin > 0.0)
  }

  test("lang_id_ngram expression matches the kernel over a DataFrame") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = samples.map(_._2).toDF("text")
      .select(col("text"), graft.functions.TextFunctions.lang_id_ngram(col("text")).as("lang"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    samples.foreach { case (expected, text) =>
      assert(rows(text) === expected)
    }
    // SQL registration surface
    graft.functions.TextFunctions.register(spark)
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT lang_id_ngram(text) FROM t").collect().map(_.getString(0))
    assert(viaSql.toSet.subsetOf(Set("en", "de", "es", "fr", "it", "pt", "und")))
  }
}
