package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text MinHash-LSH building blocks shared by the batch dedup queries
  * (`LlmQueries`) and the streaming corpus ingest: ONE definition of
  * the signature and band hashes so the stored/broadcast index a
  * screen probes is always byte-compatible with the index the batch
  * side builds (and with the DuckDB oracles that replay it).
  */
object TextLsh {

  val DefaultShingleK = 3
  val DefaultNPerm = 12
  val DefaultBandSize = 3

  /** MinHash signature column over word k-shingles; empty/short text →
    * empty signature array. */
  def signature(text: Column, k: Int = DefaultShingleK,
      nPerm: Int = DefaultNPerm): Column =
    graft.expressions.MinHashSignatures.of(TextFunctions.shingles(text, k), nPerm)

  /** The band-hash array of a signature: band b is the md5 of
    * `b|h_{b·size+1}|…` — the exact format the batch oracles replay. */
  def bandArray(hs: Column, nPerm: Int = DefaultNPerm,
      bandSize: Int = DefaultBandSize): Column = {
    require(nPerm % bandSize == 0, s"nPerm $nPerm not divisible by band size $bandSize")
    array((0 until nPerm / bandSize).map { b =>
      md5(concat_ws("|", lit(b.toString) +:
        (0 until bandSize).map(j => element_at(hs, b * bandSize + j + 1)): _*))
    }: _*)
  }

  /** `(idCol, band)` rows for a document frame — the LSH index shape.
    * Documents with no shingles produce no rows (nothing to collide). */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultShingleK, nPerm: Int = DefaultNPerm,
      bandSize: Int = DefaultBandSize): DataFrame =
    docs.select(col(idCol),
        signature(col(textCol), k, nPerm).as("__hs"))
      .filter(size(col("__hs")) > 0)
      .select(col(idCol), explode(bandArray(col("__hs"), nPerm, bandSize)).as("band"))
}
