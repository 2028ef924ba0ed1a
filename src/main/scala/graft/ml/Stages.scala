package graft.ml

import graft.functions.{SentimentFns, TextFns}
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ML Pipeline stages (SURVEY §2.8 U1/U2/U6): the reference packages
  * clean-text and agg-news as pyspark.ml Transformers composed in a
  * Pipeline (batchPipeline.py:20-94,151-160). Same composition here with
  * org.apache.spark.ml — estimator-free stages whose transform is the
  * native-expression pipeline (fit is a no-op, as in the reference where
  * only the BERT download does anything).
  */

/** U1 CleanNews: inputCol text -> cleaned outputCol, rows with null
  * (short/invalid) dropped — batchPipeline.py:41-66 semantics.
  */
class CleanNewsTransformer(override val uid: String,
                           inputCol: String, outputCol: String) extends Transformer {
  def this(inputCol: String = "Text", outputCol: String = "Text") =
    this(Identifiable.randomUID("cleanNews"), inputCol, outputCol)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.withColumn(outputCol, TextFns.cleanText(col(inputCol)))
      .na.drop(Seq(outputCol))

  override def transformSchema(schema: StructType): StructType =
    if (schema.fieldNames.contains(outputCol)) schema
    else schema.add(StructField(outputCol, StringType, nullable = true))

  override def copy(extra: ParamMap): CleanNewsTransformer = this
}

/** U5 sentiment stage: per-document 3-class scores from the lexicon
  * scorer (the pluggable slot where a real model Transformer would sit).
  */
class SentimentTransformer(override val uid: String, inputCol: String)
    extends Transformer {
  def this(inputCol: String = "Text") =
    this(Identifiable.randomUID("sentiment"), inputCol)

  override def transform(ds: Dataset[_]): DataFrame =
    SentimentFns.withSentiment(ds.toDF, inputCol, "Positive", "Negative", "Neutre")

  override def transformSchema(schema: StructType): StructType =
    schema.add("Positive", DoubleType).add("Negative", DoubleType).add("Neutre", DoubleType)

  override def copy(extra: ParamMap): SentimentTransformer = this
}

/** U2 AggNews: daily count + mean scores (batchPipeline.py:69-94). */
class AggNewsTransformer(override val uid: String, dateCol: String)
    extends Transformer {
  def this(dateCol: String = "Date") = this(Identifiable.randomUID("aggNews"), dateCol)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.withColumn("Nbr_article", lit(1))
      .groupBy(col(dateCol))
      .agg(sum(col("Nbr_article")).as("Nbr_article"),
        avg(col("Positive")).as("Positive"),
        avg(col("Negative")).as("Negative"),
        avg(col("Neutre")).as("Neutre"))

  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField(dateCol, StringType), StructField("Nbr_article", LongType),
      StructField("Positive", DoubleType), StructField("Negative", DoubleType),
      StructField("Neutre", DoubleType)))

  override def copy(extra: ParamMap): AggNewsTransformer = this
}
