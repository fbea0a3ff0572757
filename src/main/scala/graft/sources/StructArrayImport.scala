package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** StructArray file import (reference feature inventory
  * docs/plans/2026-07-07-milvus-3-feature-inventory.md §1 "StructArray
  * 更多向量类型 csv/json import"): JSONL / CSV rows carrying nested
  * element lists become entities whose StructArray column is an array
  * of typed structs.
  *
  * Spark-first: `spark.read.schema(...).json` is a distributed,
  * strictly-typed parse (a malformed nested value becomes null, never
  * an exception on an executor), so import scales with input splits.
  * Validation is a single column predicate over the parsed frame —
  * every element's vector subfield must be present with the declared
  * dim — and rows are SPLIT into valid/malformed rather than silently
  * dropped: the import-2PC caller (Collection.prepareImport/
  * commitImport/abortImport) aborts the transaction when malformed
  * rows exist, matching the reference's import lifecycle where a bad
  * file fails the whole task.
  *
  * CSV cannot nest, so the CSV form carries the element list as one
  * JSON-encoded string column (the shape Milvus bulk import uses for
  * vectors in CSV) and parses it with `from_json` into the same
  * StructArray type.
  */
object StructArrayImport {

  /** The parse result, split by the dim/shape contract. */
  final case class Imported(valid: DataFrame, malformed: DataFrame)

  /** Element struct type: scalar subfields plus a float-vector
    * subfield.
    */
  def elementType(scalarSubs: Seq[(String, DataType)],
      vecSub: String): StructType =
    StructType(scalarSubs.map { case (n, t) => StructField(n, t) } :+
      StructField(vecSub, ArrayType(FloatType)))

  /** Top-level row schema: id field + the StructArray column. */
  def rowSchema(idField: String, idType: DataType, structArrayCol: String,
      elem: StructType): StructType =
    StructType(Seq(
      StructField(idField, idType, nullable = false),
      StructField(structArrayCol, ArrayType(elem))))

  /** Every element's vector subfield present with exactly `dim`
    * components. An empty element list is valid (an entity with no
    * elements); a missing list or a wrong-dim vector is not.
    */
  private def wellFormed(idField: String, structArrayCol: String,
      vecSub: String, dim: Int): Column =
    col(idField).isNotNull && col(structArrayCol).isNotNull &&
      forall(col(structArrayCol), e =>
        e.getField(vecSub).isNotNull && size(e.getField(vecSub)) === dim)

  /** JSONL import: one JSON object per line, elements as a native
    * nested array.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      idField: String,
      idType: DataType,
      structArrayCol: String,
      elem: StructType,
      vecSub: String,
      dim: Int): Imported = {
    val df = spark.read
      .schema(rowSchema(idField, idType, structArrayCol, elem))
      .json(path)
    split(df, idField, structArrayCol, vecSub, dim)
  }

  /** CSV import: scalar columns native, the element list JSON-encoded
    * in `structArrayCol`'s column, parsed with `from_json`.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      idField: String,
      idType: DataType,
      structArrayCol: String,
      elem: StructType,
      vecSub: String,
      dim: Int,
      header: Boolean = true): Imported = {
    val raw = spark.read
      .schema(StructType(Seq(
        StructField(idField, idType, nullable = false),
        StructField(structArrayCol, StringType))))
      .option("header", header.toString)
      // RFC-4180 doubled-quote escaping ("" inside a quoted field),
      // the form spreadsheet exports and the reference's CSV fixtures
      // use — Spark's default escape is backslash.
      .option("escape", "\"")
      .csv(path)
    val df = raw.withColumn(structArrayCol,
      from_json(col(structArrayCol), ArrayType(elem)))
    split(df, idField, structArrayCol, vecSub, dim)
  }

  private def split(df: DataFrame, idField: String, structArrayCol: String,
      vecSub: String, dim: Int): Imported = {
    val ok = wellFormed(idField, structArrayCol, vecSub, dim)
    // A malformed row is any row that fails the contract, including
    // null propagation from an unparseable line (3VL: NOT ok is null
    // for null inputs, so use the explicit complement).
    Imported(df.filter(ok), df.filter(!coalesce(ok, lit(false))))
  }
}
