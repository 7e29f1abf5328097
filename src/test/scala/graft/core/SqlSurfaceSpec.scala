package graft.core

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The pure-SQL user surface: registered views + injected native
  * functions must answer the same queries as the DataFrame API — a
  * reference user who lives in SQL can stay in SQL.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views + SQL agree with the DataFrame dashboard core") {
    Tables.registerAll(spark, sf())
    val viaSql = spark.sql(
      """SELECT CASE WHEN l_quantity <= 9 THEN 'Freezing'
        |    WHEN l_quantity <= 20 THEN 'Cold' WHEN l_quantity <= 35 THEN 'Mild'
        |    WHEN l_quantity <= 45 THEN 'Warm' ELSE 'Hot' END AS weather_band,
        |  COUNT(*) AS days_count
        |FROM lineitem GROUP BY 1 ORDER BY days_count DESC, weather_band""".stripMargin)
      .collect().toSeq
    val viaDf = graft.etl.Dashboard.bandCounts(spark, sf()).collect().toSeq
    assert(viaSql.map(r => (r.getString(0), r.getLong(1))) ==
      viaDf.map(r => (r.getString(0), r.getLong(1))))
  }

  test("native kernels are callable from SQL on real tables") {
    Tables.registerAll(spark, sf())
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT a.vec_id, b.vec_id, vector_cosine(a.embedding, b.embedding) AS cs
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .head().getDouble(2)
    val viaDf = {
      val emb = Tables(spark, sf(), "embeddings")
      emb.filter(col("vec_id") === 0).select(col("embedding").as("ea"))
        .crossJoin(emb.filter(col("vec_id") === 1).select(col("embedding").as("eb")))
        .select(graft.operators.Similarity.cosine(col("ea"), col("eb")))
        .head().getDouble(0)
    }
    assert(viaSql == viaDf)
    val fp = spark.sql(
      "SELECT rolling_fingerprint(text, 64) AS fp FROM documents WHERE doc_id = 0")
      .head().getLong(0)
    val fpDf = graft.operators.TextAnalysis.fingerprint(
      Tables(spark, sf(), "documents").filter(col("doc_id") === 0))
      .head().getAs[Long]("fingerprint")
    assert(fp == fpDf)
  }
}
