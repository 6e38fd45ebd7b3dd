package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks as pure `functions._` column
  * expressions (whole-stage codegen; no UDFs anywhere on the 100 TB
  * hot path).
  *
  * Hashing convention: every cross-engine-reproducible hash is the
  * first 15 hex chars of md5 read as a 60-bit integer — md5 is
  * identical in any engine, and 60 bits always fits a signed BIGINT.
  */
object TextFunctions {

  /** lower + collapse whitespace + trim: the canonical form used by
    * dedup/fingerprint operators.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Normalized whitespace tokens. */
  def words(text: Column): Column = split(normalize(text), " ")

  /** 60-bit integer hash of a string (md5-derived, engine-portable). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (distinct) over an existing array column
    * (referenced by name — lambda expressions need a resolvable
    * attribute), empty array when the document has fewer than n words.
    */
  def shingles(wordsColName: String, n: Int = 3): Column = {
    val w = wordsColName
    val mk = (0 until n).map(j => s"$w[i+$j]").mkString(", ")
    when(size(col(w)) >= n,
      array_distinct(expr(
        s"transform(sequence(0, size($w) - $n), i -> concat_ws(' ', $mk))")))
      .otherwise(array().cast("array<string>"))
  }

  /** Language stopword profiles for the heuristic language-ID
    * operator (argmax of per-language stopword hits).
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4"))

  /** Count of words (in the named array column) present in a fixed
    * vocabulary.
    */
  def hitCount(wordsColName: String, vocab: Seq[String]): Column = {
    val arr = vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
    expr(s"size(filter($wordsColName, x -> array_contains($arr, x)))").cast("long")
  }
}
