package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sink-schema inference (SURVEY.md A1/A4, P5; reference
 * `PAHive2ES.scala:100-150`): derive the ES mapping from the source schema
 * plus a distributed discovery of dynamic map keys.
 *
 * The reference runs a full RDD pass emitting a spec triple per field per
 * row and `.distinct().collect()`s it; here discovery is a DataFrame
 * aggregation over only the MapType columns (`explode(map_keys)` +
 * `distinct`), so Catalyst prunes every other column from the scan — at
 * 100 TB the discovery job reads just the map columns. Optionally sample.
 */
object SchemaInfer {

  /** Per-field mapping entry: {type, index?, format?} — the reference's
    * "schema object" (`PAHive2ES.scala:128-150`). */
  case class FieldSpec(esKey: String, esType: String,
                       index: Option[String], format: Option[String]) {
    def toJson: String = {
      val parts = Seq(s""""type":"$esType"""") ++
        index.map(i => s""""index":"$i"""") ++
        format.map(f => s""""format":"$f"""")
      parts.mkString("{", ",", "}")
    }
  }

  /** `PAHive2ES.scala:82-89`: manual override wins, else hive->ES rename. */
  def dataTypeConvert(esKey: String, sparkSimpleName: String,
                      overrides: Map[String, String]): String =
    overrides.getOrElse(esKey, sparkSimpleName.toLowerCase match {
      case "bigint"                       => "long"
      case "int"                          => "integer"
      case x if x.startsWith("decimal")   => "double"
      case x if x.startsWith("timestamp") => "date" // incl. timestamp_ntz
      case "date"                         => "date"
      case other                          => other
    })

  /** P5 (`PAHive2ES.scala:53-64`): explicit include lists win; `_il`/`_ex`
    * suffixed hive fields are not indexed; everything else is. */
  def needIndex(hiveName: String, esKey: String,
                indexHiveFields: Set[String], indexEsFields: Set[String]): Boolean =
    indexHiveFields.contains(hiveName) || indexEsFields.contains(esKey) ||
      !(hiveName.endsWith("_il") || hiveName.endsWith("_ex"))

  /** Distributed discovery of dynamic map keys: one aggregation per run over
    * only the MapType columns. `sampleFraction < 1.0` trades completeness for
    * a bounded scan (strict mode at full scale should keep 1.0). */
  def discoverMapKeys(df: DataFrame, sampleFraction: Double = 1.0): Map[String, Seq[String]] = {
    val mapCols = df.schema.fields.filter(_.dataType.isInstanceOf[MapType]).map(_.name)
    if (mapCols.isEmpty) return Map.empty
    val src = if (sampleFraction < 1.0) df.sample(sampleFraction, 42L) else df
    // one job for all map columns: union of per-column key sets
    val keyDfs = mapCols.map { c =>
      src.select(lit(c).as("col"), explode(map_keys(col(c))).as("key")).distinct()
    }
    val all = keyDfs.reduce(_ unionAll _).distinct().collect()
    all.groupBy(_.getString(0)).map { case (c, rows) =>
      c -> rows.map(_.getString(1)).toSeq.sorted
    }
  }

  /**
   * Build the full inferred mapping: static fields from the StructType,
   * dynamic fields from discovered map keys (indexed only when included,
   * `PAHive2ES.scala:103-111` emits needIndex=false for map entries).
   */
  def infer(df: DataFrame,
            typeOverrides: Map[String, String] = Map.empty,
            indexHiveFields: Set[String] = Set.empty,
            indexEsFields: Set[String] = Set.empty,
            sampleFraction: Double = 1.0): Seq[FieldSpec] = {
    val dynamicKeys = discoverMapKeys(df, sampleFraction)
    val specs = df.schema.fields.flatMap { f =>
      f.dataType match {
        case mt: MapType =>
          dynamicKeys.getOrElse(f.name, Nil).map { key =>
            val esKey = Names.mapFieldName(f.name, key)
            val indexed = indexHiveFields.contains(f.name) || indexEsFields.contains(esKey)
            spec(esKey, mt.valueType.simpleString, indexed, typeOverrides)
          }
        case at: ArrayType =>
          // reference discovery emits needIndex=true for array fields
          // unconditionally (`PAHive2ES.scala:113-117`), so include lists
          // and suffix rules don't apply here
          val esKey = Names.normalize(f.name)
          Seq(spec(esKey, at.simpleString, indexed = true, typeOverrides))
        case dt =>
          Seq(spec(f.name, dt.simpleString, needIndex(f.name, f.name, indexHiveFields, indexEsFields), typeOverrides))
      }
    }
    // distinct by esKey (overlapping map keys across rows collapse)
    specs.toIndexedSeq.groupBy(_.esKey).map(_._2.head).toSeq.sortBy(_.esKey)
  }

  private def spec(esKey: String, sparkType: String, indexed: Boolean,
                   overrides: Map[String, String]): FieldSpec = {
    val esType = dataTypeConvert(esKey, sparkType, overrides)
    val index =
      if (!indexed) Some("no")
      else if (esType.equalsIgnoreCase("string")) Some("not_analyzed")
      else None
    val format = if (esType.equalsIgnoreCase("date")) Some("yyyyMMdd") else None
    FieldSpec(esKey, esType, index, format)
  }

  /** Serialize specs to the mapping.json the bundle manifest carries. */
  def toMappingJson(specs: Seq[FieldSpec]): String =
    specs.sortBy(_.esKey).map(s => s""""${s.esKey}":${s.toJson}""").mkString("{", ",", "}")
}
