package graft.queries

import graft.Tables
import graft.functions.Transformers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transformer-equivalence queries (SURVEY.md §2b): each exercises one or
  * more reference transformers (/root/reference/.../transformers/) through
  * the graft.functions.Transformers library against a DuckDB oracle.
  */
object TransformerQueries {

  // Concat.scala — prefix/separator/suffix concatenation.
  private def tConcat(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      concatAll("|", "[", "]", col("c_name"), col("c_mktsegment")).as("tag"))

  private val tConcatSql =
    """SELECT c_custkey, '[' || c_name || '|' || c_mktsegment || ']' AS tag FROM customer"""

  // Replace.scala — replace-all vs count-limited replace (custom expression).
  private def tReplace(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      replaceAllOf(col("c_name"), Seq("0"), "x").as("all_replaced"),
      replaceSome(col("c_name"), "0", "x", 2).as("two_replaced"))

  private val tReplaceSql =
    """SELECT c_custkey,
      | regexp_replace(c_name, '0', 'x', 'g') AS all_replaced,
      | regexp_replace(regexp_replace(c_name, '0', 'x'), '0', 'x') AS two_replaced
      |FROM customer""".stripMargin

  // Split.scala — split on pattern, select element.
  private def tSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      splitSelect(col("c_name"), "#", 0).as("name_part"),
      splitSelect(col("c_name"), "#", 1).as("num_part"),
      splitSelect(col("c_name"), "#", 5).as("missing_part"))

  private val tSplitSql =
    """SELECT c_custkey,
      | split_part(c_name, '#', 1) AS name_part,
      | split_part(c_name, '#', 2) AS num_part,
      | '' AS missing_part
      |FROM customer""".stripMargin

  // CastStringToLong.scala — parse the numeric suffix of c_name.
  private def tCastLong(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      castStringToLong(splitSelect(col("c_name"), "#", 1)).as("parsed_id"))

  private val tCastLongSql =
    """SELECT c_custkey, CAST(split_part(c_name, '#', 2) AS BIGINT) AS parsed_id FROM customer"""

  // LowerOrUpper.scala — all four modes.
  private def tLowerUpper(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      lowerOrUpper(col("c_mktsegment"), "lower").as("lo"),
      lowerOrUpper(col("c_name"), "upper").as("up"),
      lowerOrUpper(col("c_name"), "firstlower").as("flo"),
      lowerOrUpper(lowerOrUpper(col("c_mktsegment"), "lower"), "firstupper").as("fup"))

  private val tLowerUpperSql =
    """SELECT c_custkey, lower(c_mktsegment) AS lo, upper(c_name) AS up,
      | lower(substr(c_name, 1, 1)) || substr(c_name, 2) AS flo,
      | upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS fup
      |FROM customer""".stripMargin

  // MergeAndExtractByRegEx.scala — regex group extraction joined by filler.
  private def tMergeExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      mergeExtract(col("c_name"), "([A-Za-z]+)#0*([0-9]+)", "-", Seq(0, 1)).as("merged"))

  private val tMergeExtractSql =
    """SELECT c_custkey,
      | regexp_extract(c_name, '([A-Za-z]+)#0*([0-9]+)', 1) || '-' ||
      | regexp_extract(c_name, '([A-Za-z]+)#0*([0-9]+)', 2) AS merged
      |FROM customer""".stripMargin

  // DateConverter.scala — epoch millis ↔ timestamp, both directions.
  private def tDateConvert(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      timestampToEpochMillis(col("o_orderdate")).as("epoch_ms"),
      epochMillisToTimestamp(timestampToEpochMillis(col("o_orderdate"))).as("roundtrip"))

  private val tDateConvertSql =
    """SELECT o_orderkey, epoch_ms(o_orderdate) AS epoch_ms, o_orderdate AS roundtrip FROM orders"""

  // DateTypeConverter.scala + DateValueToString.scala — type conversion and
  // formatting of temporals.
  private def tDateFormat(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      dateTypeConvert(col("o_orderdate"), "date").as("as_date"),
      dateTypeConvert(col("o_orderdate"), "time").as("as_time"),
      dateValueToString(col("o_orderdate"), "yyyy-MM-dd").as("formatted"),
      year(col("o_orderdate")).cast(LongType).as("yr"),
      month(col("o_orderdate")).cast(LongType).as("mo"))

  private val tDateFormatSql =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS as_date,
      | strftime(o_orderdate, '%H:%M:%S') AS as_time,
      | strftime(o_orderdate, '%Y-%m-%d') AS formatted,
      | CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo
      |FROM orders""".stripMargin

  // TimestampCalibrate.scala / atomic/TimestampAdjuster.scala — s ↔ ms.
  private def tCalibrate(spark: SparkSession, dir: String): DataFrame = {
    val ms = timestampToEpochMillis(col("o_orderdate"))
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      timestampCalibrate(ms, "reduce").as("epoch_s"),
      timestampCalibrate(timestampCalibrate(ms, "reduce"), "add").as("back_to_ms"))
  }

  private val tCalibrateSql =
    """SELECT o_orderkey, epoch_ms(o_orderdate) // 1000 AS epoch_s,
      | (epoch_ms(o_orderdate) // 1000) * 1000 AS back_to_ms
      |FROM orders""".stripMargin

  // TimestampOffsetTransformer.scala — fixed +HH:MM offset shift.
  private def tOffset(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      timestampOffset(col("o_orderdate"), "+02:30").as("shifted"))

  private val tOffsetSql =
    """SELECT o_orderkey, o_orderdate + INTERVAL 150 MINUTE AS shifted FROM orders"""

  // IfThenElseNumeric.scala — mini-grammar if/then/else on numerics.
  private def tIfThenElse(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      ifThenElseNumeric(col("p_size"), "x<25", "x=x*2", "x=x+1").as("sized"),
      ifThenElseNumeric(col("p_size"), "x>=40", "100", "x=x-1").as("capped"))

  private val tIfThenElseSql =
    """SELECT p_partkey,
      | CAST(CASE WHEN p_size < 25 THEN p_size * 2 ELSE p_size + 1 END AS BIGINT) AS sized,
      | CAST(CASE WHEN p_size >= 40 THEN 100 ELSE p_size - 1 END AS BIGINT) AS capped
      |FROM part""".stripMargin

  // Nullify.scala / EmptyString.scala / Overwrite.scala — erasure/constants.
  private def tOverwrite(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      nullify().as("erased"),
      emptyString.as("empty"),
      overwrite("fixed", "string").as("fixedval"),
      overwrite("42", "long").as("answer"),
      overwrite("", "date").as("epoch_date"))

  private val tOverwriteSql =
    """SELECT c_custkey, CAST(NULL AS VARCHAR) AS erased, '' AS empty,
      | 'fixed' AS fixedval, CAST(42 AS BIGINT) AS answer, DATE '1970-01-01' AS epoch_date
      |FROM customer""".stripMargin

  // ExtractBiggestValue.scala — numeric max and longest-string forms.
  private def tBiggest(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      extractBiggestNumeric(col("p_size").cast(LongType), lit(20L)).as("biggest_num"),
      extractBiggestString(col("p_name"), col("p_brand")).as("biggest_str"))

  private val tBiggestSql =
    """SELECT p_partkey, CAST(greatest(p_size, 20) AS BIGINT) AS biggest_num,
      | CASE WHEN length(p_name) >= length(p_brand) THEN p_name ELSE p_brand END AS biggest_str
      |FROM part""".stripMargin

  // ToJson.scala / MergeToJson.scala — labelled JSON objects.
  private def tToJson(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      toJsonLabelled("name", col("c_name")).as("single"),
      mergeToJson("name" -> col("c_name"), "segment" -> col("c_mktsegment")).as("merged"))

  private val tToJsonSql =
    """SELECT c_custkey,
      | '{"name":"' || c_name || '"}' AS single,
      | '{"name":"' || c_name || '","segment":"' || c_mktsegment || '"}' AS merged
      |FROM customer""".stripMargin

  // IDTransformer.scala + processor/AutoIncrementValueBuffer.scala — dense
  // re-key of a table plus foreign-key remap in a child table. DenseId
  // replaces the global-window rank (single-task scan) with a parallel
  // sort + per-partition-offset numbering; see operators/DenseId.scala.
  private def tRekey(spark: SparkSession, dir: String): DataFrame = {
    val mapping = graft.operators.DenseId.withDenseId(
      Tables.customer(spark, dir).select(col("c_custkey").as("old_id")),
      orderCol = "old_id", idCol = "new_id", startAt = 1000000L)
    Tables.orders(spark, dir)
      .join(mapping, col("o_custkey") === col("old_id"))
      .select(col("o_orderkey"), col("new_id").as("o_custkey_new"))
  }

  private val tRekeySql =
    """WITH m AS (
      | SELECT c_custkey AS old_id,
      |  CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) + 999999 AS BIGINT) AS new_id
      | FROM customer)
      |SELECT o_orderkey, new_id AS o_custkey_new FROM orders JOIN m ON o_custkey = old_id""".stripMargin

  // processor/UniqueValueBuffer.scala — keep one row per unique key.
  // A window partitioned by `lang` (~5 values) would put the whole table
  // on 5 tasks; min_by aggregation partial-combines map-side and is
  // skew-tolerant at any key cardinality.
  private def tUnique(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .groupBy(col("lang"))
      .agg(min_by(col("doc_id"), col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("lang"))

  private val tUniqueSql =
    """SELECT doc_id, lang FROM (
      | SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      | FROM documents) t WHERE rn = 1""".stripMargin

  // IDGenerator.scala — the reference hands out consecutive IDs in row
  // order. Over a keyed table that order is the key order, so the sequence
  // is deterministic and oracle-checkable: DenseId numbers rows 1..n in
  // c_custkey order with every stage parallel. (uuid()/
  // monotonically_increasing_id() remain available for the opaque-ID
  // variant; their nondeterminism is why this query doesn't use them.)
  private def tIdGen(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DenseId.withDenseId(
      Tables.customer(spark, dir).select(col("c_custkey")),
      orderCol = "c_custkey", idCol = "gen_id", startAt = 1L)

  private val tIdGenSql =
    """SELECT c_custkey,
      | CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS gen_id
      |FROM customer""".stripMargin

  // Cookbook recipe end-to-end (Processor/RecipeWorker equivalents): a
  // one-projection recipe mixing one-to-one chains, an all-to-all combine,
  // and a generated constant — the reference's whole mapping model in one
  // declarative pass.
  private def tRecipe(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Pipeline
    val recipe = Pipeline.Recipe(Seq(
      Pipeline.oneToOne("cust_id", "c_custkey"),
      Pipeline.oneToOne("name_upper", "c_name", c => lowerOrUpper(c, "upper")),
      Pipeline.oneToOne("id_from_name", "c_name",
        c => castStringToLong(splitSelect(c, "#", 1))),
      Pipeline.allToAll("label", Seq("c_name", "c_mktsegment"),
        cols => concatAll("/", "", "", cols: _*)),
      Pipeline.generated("source_system", lit("tensei"))
    ))
    Pipeline.transform(Tables.customer(spark, dir), recipe)
  }

  private val tRecipeSql =
    """SELECT c_custkey AS cust_id, upper(c_name) AS name_upper,
      | CAST(split_part(c_name, '#', 2) AS BIGINT) AS id_from_name,
      | c_name || '/' || c_mktsegment AS label,
      | 'tensei' AS source_system
      |FROM customer""".stripMargin

  // ------------------------------------------------------ t_json_extract
  // Semi-structured field extraction: parse the events stream's JSON props
  // column with Spark's native from_json (schema'd struct, codegen'd Jackson
  // parse; malformed rows surface as null, never an error) and type the
  // extracted field. The mirror of t_to_json — together they round-trip
  // structured <-> JSON, the format-bridging the reference's DFASDL
  // transformers do per-field. Oracle: DuckDB json_extract_string.
  private def tJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("event_id"), col("event_type"),
      from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .getField("k").as("k"))

  private val tJsonExtractSql =
    """SELECT event_id, event_type,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("t_json_extract", tJsonExtract, Some(tJsonExtractSql)),
    QueryDef("t_recipe_pipeline", tRecipe, Some(tRecipeSql)),
    QueryDef("t_concat", tConcat, Some(tConcatSql)),
    QueryDef("t_replace", tReplace, Some(tReplaceSql)),
    QueryDef("t_split", tSplit, Some(tSplitSql)),
    QueryDef("t_cast_long", tCastLong, Some(tCastLongSql)),
    QueryDef("t_lower_upper", tLowerUpper, Some(tLowerUpperSql)),
    QueryDef("t_merge_extract_regex", tMergeExtract, Some(tMergeExtractSql)),
    QueryDef("t_date_convert", tDateConvert, Some(tDateConvertSql)),
    QueryDef("t_date_format", tDateFormat, Some(tDateFormatSql)),
    QueryDef("t_timestamp_calibrate", tCalibrate, Some(tCalibrateSql)),
    QueryDef("t_timestamp_offset", tOffset, Some(tOffsetSql)),
    QueryDef("t_if_then_else", tIfThenElse, Some(tIfThenElseSql)),
    QueryDef("t_nullify_overwrite", tOverwrite, Some(tOverwriteSql)),
    QueryDef("t_extract_biggest", tBiggest, Some(tBiggestSql)),
    QueryDef("t_to_json", tToJson, Some(tToJsonSql)),
    QueryDef("t_id_rekey", tRekey, Some(tRekeySql)),
    QueryDef("t_unique_value", tUnique, Some(tUniqueSql)),
    QueryDef("t_id_generator", tIdGen, Some(tIdGenSql))
  )
}
