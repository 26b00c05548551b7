package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Cookbook-style pipeline API — the Spark form of the reference's
  * processing model (/root/reference/src/main/scala/com/wegtam/tensei/agent/
  * Processor.scala + processor/MappingOneToOneWorker.scala,
  * MappingAllToAllWorker.scala, RecipeWorker.scala, RecipesWorker.scala).
  *
  * A Tensei cookbook maps source DFASDL elements to target elements through
  * per-recipe transformer chains, one element at a time through actors. Here
  * a Recipe compiles to ONE `select` projection — every mapping is a Column
  * expression, so the whole cookbook fuses into a single whole-stage-
  * codegen'd pass and distributes over any partitioning.
  */
object Pipeline {

  /** One target field fed by one source column through a transformer chain
    * (MappingOneToOneWorker.scala).
    */
  def oneToOne(target: String, source: String,
               chain: Column => Column = identity): FieldMapping =
    FieldMapping(target, Seq(source), cols => chain(cols.head))

  /** One target field fed by ALL listed source columns at once
    * (MappingAllToAllWorker.scala) — e.g. a Concat or MergeToJson
    * transformer over several fields.
    */
  def allToAll(target: String, sources: Seq[String],
               combine: Seq[Column] => Column): FieldMapping =
    FieldMapping(target, sources, combine)

  /** A constant/generated target field with no source (the reference's
    * generator-fed mappings).
    */
  def generated(target: String, gen: Column): FieldMapping =
    FieldMapping(target, Nil, _ => gen)

  final case class FieldMapping(target: String, sources: Seq[String],
                                build: Seq[Column] => Column)

  /** A recipe = ordered list of field mappings (RecipeWorker.scala). */
  final case class Recipe(mappings: Seq[FieldMapping]) {
    def columns: Seq[Column] =
      mappings.map(m => m.build(m.sources.map(col)).as(m.target))
  }

  /** Apply a recipe: the whole mapping set is one projection. */
  def transform(df: DataFrame, recipe: Recipe): DataFrame =
    df.select(recipe.columns: _*)

  /** Full agent run (TenseiAgent.scala's parse→process→write): source →
    * recipe → sink, each end pluggable.
    */
  def run(spark: SparkSession,
          source: SparkSession => DataFrame,
          recipe: Recipe,
          sink: DataFrame => Unit): Unit =
    sink(transform(source(spark), recipe))
}
