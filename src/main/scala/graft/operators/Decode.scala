package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variable-length hex payload decoding — the reference's calldata/ABI
  * tuple-array decode (decode_utls.py:126-175 decode_list_tuple /
  * convert_to_hex, :186-233 currency extraction from calldata): a
  * length-prefixed hex blob is exploded into one row per decoded element.
  *
  * The reference decodes row-at-a-time in a pandas apply; here the layout
  * parse (fixed-offset header fields) and the element explode are
  * codegen'd expressions — `transform(sequence(...))` builds the element
  * array per row and `posexplode` flattens it, so the whole decode stays
  * inside whole-stage codegen with no UDF.
  */
object Decode {

  /** Decode a length-prefixed hex array payload:
    *   hex[1..2]  = version byte
    *   hex[3..4]  = raw count byte; element count = (raw % maxElems) + 1
    *   hex[5.. ]  = `n` elements of `elemHexWidth` hex chars each.
    * Output: idCol, version (int), n_elems (int), elem_idx (0-based int),
    * elem_value (bigint). The payload must be long enough for maxElems
    * elements (caller contract, like an ABI schema).
    */
  def explodeHexArray(df: DataFrame, idCol: String, payloadCol: String,
                      maxElems: Int, elemHexWidth: Int): DataFrame =
    df.select(col(idCol), col(payloadCol).as("__payload"))
      .withColumn("version", conv(substring(col("__payload"), 1, 2), 16, 10).cast("int"))
      .withColumn("n_elems",
        (conv(substring(col("__payload"), 3, 2), 16, 10).cast("int") % maxElems) + 1)
      .select(col(idCol), col("version"), col("n_elems"),
        posexplode(expr(
          s"""transform(sequence(0, n_elems - 1),
             |  i -> CAST(conv(substring(__payload, 5 + i * $elemHexWidth, $elemHexWidth), 16, 10) AS BIGINT))"""
            .stripMargin)))
      .select(col(idCol), col("version"), col("n_elems"),
        col("pos").cast("int").as("elem_idx"), col("col").as("elem_value"))
}
