package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured nested-JSON parsing — the reference's address-metadata path
  * (update_etl.py:1380-1398 parse_metadata_json): multi-field extract
  * including the nested optional `metadata` object (twitter/website) and
  * the `sameAs` URL list, from which a twitter handle is recovered when
  * the structured field is missing.
  *
  * Spark-first design: one `from_json` with an EXPLICIT schema (never
  * schema inference, which would require a second pass over 100 TB), then
  * codegen'd struct-field projections. A malformed document yields a null
  * struct, not a task failure (PERMISSIVE mode), mirroring the reference's
  * per-row try/except.
  */
object JsonOps {

  /** Profile-metadata schema: the shape of the reference's OpenSea account
    * document (display name, nested user object, nullable nested metadata
    * object, sameAs URL list, ISO created date).
    */
  val profileSchema: StructType = StructType(Seq(
    StructField("displayName", StringType),
    StructField("user", StructType(Seq(
      StructField("username", StringType),
      StructField("balance", DoubleType)))),
    StructField("metadata", StructType(Seq(
      StructField("twitterUsername", StringType),
      StructField("websiteUrl", StringType)))),
    StructField("sameAs", ArrayType(StringType)),
    StructField("createdDate", StringType)))

  /** Parse `jsonCol` into typed profile fields. Twitter handle resolution
    * order mirrors the reference: the structured `metadata.twitterUsername`
    * first, else the first twitter.com URL in `sameAs` (reference's sameAs
    * scan), else null. Output columns: display_name, username, balance,
    * twitter_username, website, has_metadata.
    */
  def parseProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val m = from_json(col(jsonCol), profileSchema)
    // get() (0-based) instead of element_at(): null on an empty filtered
    // array rather than an ANSI out-of-bounds error
    val twitterFromSameAs = regexp_extract(
      get(filter(col("__m.sameAs"), (u: Column) => u.startsWith("https://twitter.com/")),
        lit(0)),
      "twitter\\.com/(.+)$", 1)
    df.withColumn("__m", m).select(
      df.columns.filterNot(_ == jsonCol).map(col) ++ Seq(
        col("__m.displayName").as("display_name"),
        col("__m.user.username").as("username"),
        col("__m.user.balance").as("balance"),
        coalesce(col("__m.metadata.twitterUsername"),
          when(twitterFromSameAs =!= "", twitterFromSameAs)).as("twitter_username"),
        col("__m.metadata.websiteUrl").as("website"),
        col("__m.metadata").isNotNull.as("has_metadata")): _*)
  }
}
