package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators (Group C):
  * tokenization, shingling, MinHash, SimHash nibbles, fingerprinting.
  * All pure Catalyst expressions — deterministic and reproducible in the
  * DuckDB oracle (md5 / strpos / list functions).
  */
object TextFunctions {

  /** Whitespace tokenizer (the synthetic corpus is single-space separated,
    * lowercase, punctuation-free).
    */
  def words(text: Column): Column = split(text, " ")

  /** Overlapping word n-gram shingles, space-joined.
    * slice() is 1-based; i ranges over 0..size-n, yielding size-n+1 grams.
    */
  def shingles(ws: Column, n: Int): Column =
    // guard: sequence(0, size-n) counts DOWN when size < n (Spark infers
    // a negative step), producing invalid slice starts — short docs get
    // an empty shingle set instead
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))

  /** One MinHash value: min over shingles of md5(seed ":" shingle).
    * Fixed-width lowercase hex means lexicographic min == numeric min,
    * so the signature is a plain string min in any engine.
    */
  def minhash(shingleSet: Column, seed: Int): Column =
    array_min(transform(shingleSet, s => md5(concat(lit(s"$seed:"), s))))

  /** Jaccard similarity of two arrays as an exact rational in doubles
    * (intersection / union sizes — int division promotes to double
    * identically in Spark and DuckDB).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** Value of hex digit `p` (1-based) of md5(word) — the SimHash bit
    * source. conv() mirrors the oracle's strpos('0123...f', c)-1.
    */
  def md5Nibble(h: Column, p: Int): Column =
    conv(substring(h, p, 1), 16, 10).cast("int")

  /** Polynomial rolling hash over characters: fold h = (h*31 + code) % M.
    * Oracle mirror: list_reduce([0] || codes, (h,c) -> (h*31+c) % M).
    */
  def fingerprint(text: Column, mod: Long = 1000000007L): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => pmod(h * 31 + ascii(c), lit(mod)))
}
