package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Row->document projection pipeline (SURVEY.md P1-P6, §2.3), expressed as
 * DataFrame transformations so Catalyst keeps column pruning / pushdown /
 * codegen (the reference forfeits these by dropping to RDD[Row] at
 * `PAHive2ES.scala:100,202`).
 *
 * Semantics reproduced from the reference:
 *  - name normalization (`PAHive2ES.scala:91-98`): ES key = lowercase with
 *    `&` and `$` replaced by `-`; keys of a map column whose name ends in
 *    `_il` are prefixed `{col}-{key}`, other map keys keep just `{key}`.
 *    Scalar columns keep their raw name; array columns are normalized.
 *  - null dropping (`PAHive2ES.scala:164-173`): a field is omitted when its
 *    value is null, an empty string, or the literal string "null" (any case).
 *  - coercions (`PAHive2ES.scala:175-199`): date -> "yyyyMMdd" string,
 *    decimal -> double, manual type overrides (long/integer/double/string),
 *    JSON-string cells parsed to arrays.
 */
object Names {
  /** `PAHive2ES.scala:96-97` normalization, driver-side. */
  def normalize(name: String): String =
    name.toLowerCase.replaceAll("&", "-").replaceAll("\\$", "-")

  /** ES key for a dynamic map entry (`PAHive2ES.scala:91-98`). */
  def mapFieldName(colName: String, key: String): String =
    normalize(if (colName.endsWith("_il")) colName + "-" + key else key)

  /** Same normalization as a Catalyst expression over a key column. */
  def normalizeExpr(c: Column): Column =
    lower(regexp_replace(regexp_replace(c, "&", "-"), "\\$", "-"))

  def mapFieldNameExpr(colName: String, key: Column): Column =
    normalizeExpr(if (colName.endsWith("_il")) concat(lit(colName + "-"), key) else key)
}

object DocTransform {

  /** P2: null/""/"null" -> SQL NULL for string columns (then dropped from the
    * JSON doc by to_json's ignoreNullFields). */
  def nullifyEmpty(c: Column): Column =
    when(c.isNull || c === "" || lower(c) === "null", lit(null).cast(StringType)).otherwise(c)

  /** P4 scalar coercion for one field, given the final ES type. */
  def coerce(c: Column, sparkType: DataType, esType: String): Column =
    (sparkType, esType) match {
      case (_: DateType | _: TimestampType | _: TimestampNTZType, _) =>
        date_format(c, "yyyyMMdd")
      case (_: DecimalType, _)                 => c.cast(DoubleType)
      case (_, "long")                         => c.cast(LongType)
      case (_, "integer")                      => c.cast(IntegerType) // double -> int truncates, like intValue()
      case (_, "double")                       => c.cast(DoubleType)
      case (_, "string")                       => c.cast(StringType)
      case (st: StringType, _)                 => nullifyEmpty(c)
      case _                                   => c
    }

  /** Clean one MapType column: rename keys per P3 and drop null-ish values
    * per P2, entirely with codegen'd builtins. */
  def cleanMap(colName: String, mt: MapType): Column = {
    val renamed = transform_keys(col(colName), (k, _) => Names.mapFieldNameExpr(colName, k))
    val mapped =
      if (mt.valueType.isInstanceOf[StringType])
        map_filter(renamed, (_, v) => v.isNotNull && v =!= "" && lower(v) =!= "null")
      else map_filter(renamed, (_, v) => v.isNotNull)
    mapped
  }

  /**
   * P1/P2/P3/P4 + §2.3 in one pass: build the JSON document column.
   * Scalars go through coercion + null-drop into a struct serialized by
   * to_json (nulls omitted); each map column is cleaned and serialized
   * separately, then the JSON objects are merged textually — a pure
   * string concat that stays inside WholeStageCodegen.
   *
   * @param typeOverrides esKey -> es type ("long"/"integer"/"double"/"string")
   */
  def docColumn(schema: StructType, typeOverrides: Map[String, String] = Map.empty): Column = {
    val scalarFields = schema.fields.filterNot(_.dataType.isInstanceOf[MapType])
    val scalarCols = scalarFields.map { f =>
      f.dataType match {
        case _: ArrayType => col(f.name).as(Names.normalize(f.name))
        case dt => coerce(col(f.name), dt, typeOverrides.getOrElse(f.name, "")).as(f.name)
      }
    }
    val scalarJson = to_json(struct(scalarCols.toIndexedSeq: _*), Map("ignoreNullFields" -> "true"))
    val mapJsons = schema.fields.collect { case f if f.dataType.isInstanceOf[MapType] =>
      to_json(cleanMap(f.name, f.dataType.asInstanceOf[MapType]))
    }
    if (mapJsons.isEmpty) scalarJson
    else {
      // strip outer braces from each object, join non-empty pieces
      def inner(j: Column): Column =
        nullif(regexp_replace(j, "^\\{|\\}$", ""), lit(""))
      val pieces = (scalarJson +: mapJsons.toIndexedSeq).map(inner)
      concat(lit("{"), concat_ws(",", pieces: _*), lit("}"))
    }
  }

  /** Full projection: (id, routing, doc). Routing falls back to id, then to a
    * seeded random key (reference `Hive2ES.scala:58-62` uses an unseeded
    * random 10-char string; we keep it deterministic under a seed). */
  def docs(df: DataFrame, idCol: String, routingCol: Option[String],
           typeOverrides: Map[String, String] = Map.empty,
           randomSeed: Long = 42L,
           keepCols: Seq[String] = Seq.empty): DataFrame = {
    val idExpr =
      if (idCol != null) col(idCol).cast(StringType)
      else lit(null).cast(StringType)
    val routing = routingCol match {
      case Some(r) if idCol != null =>
        coalesce(col(r).cast(StringType), col(idCol).cast(StringType))
      case Some(r) => col(r).cast(StringType)
      case None if idCol != null => col(idCol).cast(StringType)
      // neither routing nor id: seeded random key, the reference's
      // round-robin-ish spread (`Hive2ES.scala:58-62`)
      case None => conv(floor(rand(randomSeed) * 1e10).cast(LongType).cast(StringType), 10, 36)
    }
    df.select(Seq(
      idExpr.as("_id"),
      routing.as("_routing"),
      docColumn(df.schema, typeOverrides).as("doc")) ++ keepCols.map(col): _*)
  }

  /**
   * Columnar document form: the source columns stay TYPED columns instead
   * of being serialized into one JSON string — consumers get projection
   * pushdown and predicate pushdown INTO document fields (a reader that
   * wants 2 of 40 fields scans 2 columns, not every byte of every doc).
   * Same _id/_routing extraction (and random fallback) as [[docs]]. Field
   * names get the same ES normalization (P3) the JSON path applies.
   */
  def docsColumnar(df: DataFrame, idCol: String, routingCol: Option[String],
                   randomSeed: Long = 42L): DataFrame = {
    val normalized = df.columns.map(c =>
      col(c).as(graft.transform.Names.normalize(c)))
    val idExpr =
      if (idCol != null) col(idCol).cast(StringType)
      else lit(null).cast(StringType)
    val routing = routingCol match {
      case Some(r) if idCol != null =>
        coalesce(col(r).cast(StringType), col(idCol).cast(StringType))
      case Some(r) => col(r).cast(StringType)
      case None if idCol != null => col(idCol).cast(StringType)
      case None => conv(floor(rand(randomSeed) * 1e10).cast(LongType).cast(StringType), 10, 36)
    }
    df.select(idExpr.as("_id") +: routing.as("_routing") +: normalized.toSeq: _*)
  }
}
