package graft.pipeline

import graft.sink.BundleSink
import graft.transform.{DocTransform, SchemaInfer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/**
 * End-to-end jobs mirroring the reference's two entry points
 * (SURVEY.md §3.1/§3.2) as one declarative Spark pipeline:
 *
 *   scan(+pushdown where) -> doc transform -> es_shard -> bundle sink
 *
 * Unlike the reference (which drops to RDD[Row] immediately,
 * `Hive2ES.scala:46`), the whole job stays a DataFrame until the write, so
 * Catalyst applies predicate pushdown, column pruning and whole-stage
 * codegen end to end.
 */
object Hive2Es {

  /** CLI-parity config (reference `ArgsParser.scala:5-29`). `input` is a
    * table name or a path; tests use parquet paths. */
  case class GraftConfig(
    input: String,
    outDir: String,
    indexName: String,
    numShards: Int = 3,
    where: String = "1 = 1",
    id: String = null,
    routing: String = null,
    partitionMultiples: Int = 10,
    repartition: Boolean = false,
    jsonSource: Boolean = false,
    mappingJson: Option[String] = None,     // user-supplied (generic mode)
    typeOverrides: Map[String, String] = Map.empty,
    indexHiveFields: Set[String] = Set.empty,
    indexEsFields: Set[String] = Set.empty,
    format: String = "json",
    inferSampleFraction: Double = 1.0,
    compression: Option[String] = None,
    typeName: String = "doc",
    // reference --hive-input-fields: project the scan to these columns
    // (ArgsParser.scala:106-109) — Catalyst prunes the parquet read to them
    hiveInputFields: Seq[String] = Seq.empty,
    // reference bulk buffering knobs (ArgsParser.scala:21-23,
    // ESContainer.scala:118-140) mapped to writer sizing: --bulk-actions
    // caps docs per output file, --bulk-size (MB) sets the parquet
    // row-group target
    bulkActions: Option[Long] = None,
    bulkSizeMb: Option[Long] = None,
    // reference alias swap + health-gated final settings
    // (ESClient.java:154-170, NodeService.java:129-152): recorded in the
    // manifest for the downstream loader to apply at install time
    alias: Option[String] = None,
    finalSettings: Map[String, String] = Map.empty)

  /** S3/A2 parity (`PAHive2ES.scala:66-77`): collect a small metadata table
    * of (field_name, data_type) into the driver-side override map that
    * coercion and mapping inference consume — the broadcast-lookup-join
    * pattern for tiny dimension tables. */
  def typeOverridesFromTable(meta: DataFrame,
                             fieldCol: String = "index_name",
                             typeCol: String = "data_type"): Map[String, String] =
    meta.select(trim(col(fieldCol)).as("f"), trim(col(typeCol)).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  def read(spark: SparkSession, config: GraftConfig): DataFrame = {
    val df =
      if (config.input.contains("/")) spark.read.parquet(config.input)
      else spark.read.table(config.input)
    val filtered = df.where(config.where)
    if (config.hiveInputFields.isEmpty) filtered
    else filtered.select(config.hiveInputFields.map(col): _*)
  }

  /** Generic mode (`Hive2ES.main`, SURVEY.md §3.1): no inference; doc =
    * whole row (or the raw first column when jsonSource). */
  def runGeneric(spark: SparkSession, config: GraftConfig): BundleSink.Result = {
    val input = read(spark, config)
    val docs =
      if (config.format == "columnar") {
        // typed columns instead of a JSON doc string (readers prune/push
        // into document fields); json-source has no row schema to keep
        require(!config.jsonSource, "--json-source cannot produce columnar bundles")
        DocTransform.docsColumnar(input, Option(config.id).getOrElse(input.columns.head),
          Option(config.routing))
      } else if (config.jsonSource) {
        // --json-source: column 0 is already the JSON document
        // (`Hive2ES.scala:48-49`); id/routing extracted from the JSON.
        val docCol = col(input.columns.head).cast(StringType)
        val idExpr = Option(config.id)
          .map(i => get_json_object(docCol, s"$$.$i")).getOrElse(lit(null).cast(StringType))
        val routingExpr = Option(config.routing)
          .map(r => get_json_object(docCol, s"$$.$r")).orElse(Option(config.id)
          .map(i => get_json_object(docCol, s"$$.$i")))
          .getOrElse(conv(floor(rand(42L) * 1e10).cast("long").cast(StringType), 10, 36))
        input.select(idExpr.as("_id"), routingExpr.as("_routing"), docCol.as("doc"))
      } else {
        DocTransform.docs(input, Option(config.id).getOrElse(input.columns.head),
          Option(config.routing))
      }
    BundleSink.write(docs, s"${config.outDir}/${config.indexName}", config.numShards,
      config.partitionMultiples, config.repartition, config.format, config.mappingJson,
      indexName = config.indexName, typeName = config.typeName,
      compression = config.compression,
      bulkActions = config.bulkActions,
      bulkSizeBytes = config.bulkSizeMb.map(_ * 1024L * 1024L),
      alias = config.alias, finalSettings = config.finalSettings)
  }

  /** `indexName = {alias}_{dt}` split (reference `PAHive2ES.scala:41-42`). */
  def aliasAndDt(indexName: String): (String, String) = {
    val cut = indexName.lastIndexOf("_")
    if (cut < 0) (indexName, "")
    else (indexName.substring(0, cut), indexName.substring(cut + 1))
  }

  /** Schema-inferring production mode (`PAHive2ES.main`, SURVEY.md §3.2):
    * discovery pass -> mapping.json -> value pass -> bundles. */
  def runInferred(spark: SparkSession, config: GraftConfig): BundleSink.Result = {
    require(!config.jsonSource,
      "--json-source is schema-less; use --mode generic (inference has no row schema to infer from)")
    require(config.format != "columnar",
      "columnar bundles keep raw typed columns; inferred mode's flatten/coerce " +
        "semantics are JSON-doc-shaped — use --mode generic")
    val input = read(spark, config)
    // two passes over the source are inherent (reference jobs #2 and #3);
    // cache only when the source has dynamic map columns to discover
    val hasMaps = input.schema.fields.exists(_.dataType.isInstanceOf[MapType])
    val src = if (hasMaps) input.persist() else input
    try {
      val specs = SchemaInfer.infer(src, config.typeOverrides,
        config.indexHiveFields, config.indexEsFields, config.inferSampleFraction)
      val mappingJson = SchemaInfer.toMappingJson(specs)
      val docs = DocTransform.docs(src, Option(config.id).getOrElse(src.columns.head),
        Option(config.routing), config.typeOverrides)
      BundleSink.write(docs, s"${config.outDir}/${config.indexName}", config.numShards,
        config.partitionMultiples, config.repartition, config.format, Some(mappingJson),
        indexName = config.indexName, typeName = config.typeName,
        compression = config.compression,
        bulkActions = config.bulkActions,
        bulkSizeBytes = config.bulkSizeMb.map(_ * 1024L * 1024L),
        alias = config.alias, finalSettings = config.finalSettings)
    } finally if (hasMaps) src.unpersist()
  }
}
