package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification (north-star "text analysis" tier):
  * score each candidate language by how many of its marker words (high-
  * frequency function words) appear in the document's token set, pick the
  * argmax. Pure Column expressions — the argmax is
  * `greatest(struct(score, lang)...)`, so the whole thing is one
  * projection, no shuffle, trivially 100 TB-parallel.
  *
  * Deterministic: ties break toward the lexicographically larger language
  * code via the struct ordering. A real-world profile set would be larger
  * (char n-gram profiles); the operator shape would not change.
  */
object LangId {

  /** Top function words per language (public-knowledge frequency lists). */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans", "qui", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Number of DISTINCT markers of `markers` present in the token set. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(array_intersect(TextAnalysis.tokens(text),
      array(markers.map(lit): _*)))

  /** Predicted language code. */
  def predict(text: Column,
              profiles: Map[String, Seq[String]] = defaultProfiles): Column = {
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(markerHits(text, markers).as("s"), lit(lang).as("lang"))
    }
    greatest(scored: _*).getField("lang")
  }
}
