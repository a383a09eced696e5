package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-analysis column builders. All are stock
  * `org.apache.spark.sql.functions` compositions — fully codegen'd, no
  * UDFs — so they stay inside WholeStageCodegen on the scan projection
  * (the reference's own "refactored for Spark SQL performance" rule,
  * sales_aw_silver_layer_dim_customer.py:21).
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lowercased canonical form. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokenization (lowercased). */
  def wsTokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** BPE-ish sub-word token count: letter runs, digit runs, single
    * non-alphanumeric symbols. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Count of matches of a word-list regex like `\b(the|and)\b`. */
  def stopwordHits(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))
}
