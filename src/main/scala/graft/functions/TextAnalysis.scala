package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, sub-word token counting, document fingerprinting.
  * All are narrow per-row expressions (no shuffle) built from codegen'd
  * built-ins, with arithmetic restricted to exactly-rounded IEEE ops so the
  * DuckDB oracle reproduces them bit-for-bit (no exp/log/libm calls).
  */
object TextAnalysis {

  /** Per-language stopword marker lists for the n-gram/stopword heuristic. */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "los"),
    "fr" -> Seq("le", "la", "les", "et"),
    "de" -> Seq("der", "die", "und", "das"))

  private def hits(toks: Column, ws: Seq[String]): Column =
    size(filter(toks, t => t.isin(ws.map(_.asInstanceOf[Any]): _*)))

  /** Heuristic language ID: argmax of stopword hits with fixed priority
    * order (en > es > fr > de), 'und' when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val hs = langWords.map { case (l, ws) => l -> hits(toks, ws) }
    // priority argmax: first language whose hits >= all later ones and > 0
    val expr = hs.zipWithIndex.foldRight(lit("und")) { case (((l, h), i), els) =>
      val laterMax = hs.drop(i + 1).map(_._2)
      val geAllLater = laterMax.foldLeft(lit(true))((acc, o) => acc && h >= o)
      when(h > 0 && geAllLater, lit(l)).otherwise(els)
    }
    expr
  }

  /** Quality score in [0,1]: length saturation (70%) + stopword density
    * (30%). Exactly-rounded arithmetic only.
    */
  def qualityScore(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks).cast("double")
    val stop = hits(toks, Seq("the", "a", "of", "and", "to", "in")).cast("double")
    val lenScore = least(n, lit(60.0)) / 60.0
    val stopRatio = when(n > 0, stop / n).otherwise(lit(0.0))
    lenScore * 0.7 + stopRatio * 0.3
  }

  /** BPE-ish sub-word token count: letter runs, single digits, single
    * punctuation marks — the usual pre-tokenizer shape.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Rolling polynomial fingerprint of the first 32 ASCII chars:
    * h = (h*31 + code) mod 1e9+7, space-padded — a locality-stable document
    * signature computable in any engine (no md5 needed).
    */
  def fingerprint32(text: Column): Column = {
    val cleaned = rpad(regexp_replace(text, "[^ -~]", ""), 32, " ")
    (0 until 32).foldLeft(lit(0L).cast("long")) { (h, i) =>
      (h * 31 + ascii(substring(cleaned, i + 1, 1))) % 1000000007L
    }
  }
}
