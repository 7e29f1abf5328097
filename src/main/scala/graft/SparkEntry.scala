package graft

import graft.core.Tables
import graft.etl.{Dashboard, WeatherMart}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query is deterministically ordered and every computed double is
  * rounded to 4 decimals on BOTH the Spark side and the DuckDB oracle side
  * (SURVEY.md §5) so value hashes compare exactly.
  */
object SparkEntry {

  /** Flagship: the full mart build (star join + window metrics). */
  def entry(spark: SparkSession): DataFrame =
    WeatherMart.fact(spark, "/root/testdata/sf0.001")

  private val factOrder = Seq("location_key", "date_key", "l_orderkey", "l_linenumber")

  /** Dump DATE columns as ISO strings: pandas renders Spark's date32 and
    * DuckDB's DATE differently ("1995-01-02" vs "1995-01-02 00:00:00"),
    * which would fail a value-hash compare even though values are equal.
    * ISO strings sort identically to dates, so ordering is unaffected.
    */
  private def datesAsStrings(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DateType
    df.schema.fields.filter(_.dataType == DateType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name, col(f.name).cast("string"))
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = raw.map {
    case (name, fn) => name -> ((s: SparkSession, d: String) => datesAsStrings(fn(s, d)))
  }

  private def raw: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stg_load" -> ((s, d) => WeatherMart.staging(s, d)
      .orderBy("l_orderkey", "l_linenumber")),
    "dim_date" -> ((s, d) => WeatherMart.dimDate(s, d).orderBy("date_key")),
    "dim_location" -> ((s, d) => WeatherMart.dimLocation(s, d).orderBy("location_key")),
    "dim_band" -> ((s, d) => WeatherMart.dimBand(s, d)),
    "dim_precip_type" -> ((s, d) => WeatherMart.dimPrecipType(s, d)),
    "dim_source" -> ((s, _) => WeatherMart.dimSource(s)),
    "normalized_3nf" -> ((s, d) => WeatherMart.normalizedLocation(s, d)),
    "fact_build" -> ((s, d) => WeatherMart.fact(s, d)
      .orderBy(factOrder.map(col): _*)),
    "validate_fact" -> ((s, d) => WeatherMart.validateFact(s, d)),
    "q1_avg_by_date" -> ((s, d) => Dashboard.avgByDate(s, d)),
    "q2_topn_by_location" -> ((s, d) => Dashboard.topNByLocation(s, d)),
    "q3_avg_by_class" -> ((s, d) => Dashboard.avgByClass(s, d)),
    "q4_band_counts" -> ((s, d) => Dashboard.bandCounts(s, d)),
    "q5_pct_positive" -> ((s, d) => Dashboard.pctPositiveByDate(s, d)),
    // --- deduplication (SURVEY.md §2) ---
    "dedup_exact" -> ((s, d) => Dedup.exact(Tables(s, d, "documents"))),
    "ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(Tables(s, d, "documents"))),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(Tables(s, d, "documents"))),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(Tables(s, d, "documents"))),
    "dedup_embedding" -> ((s, d) =>
      Similarity.embeddingNearDup(Tables(s, d, "embeddings"))),
    // --- similarity search (SURVEY.md §2) ---
    "ann_bruteforce" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10))
    }),
    "ann_ivf" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10))
    }),
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles. Shared SQL fragments keep Spark and oracle semantics
  // aligned in one place.
  // ---------------------------------------------------------------------

  /** Staging CTE — mirrors WeatherMart.staging. */
  private val stgSql =
    """SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS date_valid, l_suppkey AS loc_ref,
      |  l_extendedprice AS avg_temp_f, l_discount AS precipitation_in,
      |  l_tax AS snowfall_in, l_quantity AS band_q,
      |  l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
      |FROM lineitem""".stripMargin

  /** Mirrors WeatherMart.weatherBand (bounds 9/20/35/45). */
  private val bandCase =
    """CASE WHEN band_q <= 9 THEN 'Freezing' WHEN band_q <= 20 THEN 'Cold'
      |  WHEN band_q <= 35 THEN 'Mild' WHEN band_q <= 45 THEN 'Warm'
      |  ELSE 'Hot' END""".stripMargin

  /** Mirrors WeatherMart.precipitationType (snow 0.06 / rain 0.05). */
  private val precipCase =
    """CASE WHEN snowfall_in > 0.06 THEN 'Snow'
      |  WHEN precipitation_in > 0.05 THEN 'Rain' ELSE 'None' END""".stripMargin

  /** Location natural rows — mirrors WeatherMart.dimLocation input. */
  private val locNaturalSql =
    """SELECT DISTINCT s_suppkey AS postal_code, s_name AS city_name,
      |  n_name AS country, r_name AS region_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey""".stripMargin

  private val dimLocationSql =
    s"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY postal_code) AS BIGINT) AS location_key,
       |  postal_code, city_name, country, region_name,
       |  '${WeatherMart.ValidFrom}' AS valid_from,
       |  CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
       |FROM ($locNaturalSql)""".stripMargin

  /** Fact CTE — mirrors WeatherMart.fact. */
  private val factSql =
    s"""WITH stg AS ($stgSql),
       |dim_loc AS ($dimLocationSql)
       |SELECT f.date_valid AS date_key, l.location_key,
       |  $bandCase AS weather_band,
       |  $precipCase AS precipitation_type,
       |  CAST(1 AS BIGINT) AS source_key,
       |  f.l_orderkey, f.l_linenumber,
       |  f.avg_temp_f, f.precipitation_in, f.snowfall_in,
       |  ROUND(f.avg_temp_f - LAG(f.avg_temp_f) OVER
       |    (PARTITION BY l.location_key
       |     ORDER BY f.date_valid, f.l_orderkey, f.l_linenumber), 4)
       |    AS temp_day_delta,
       |  ROUND(SUM(f.precipitation_in) OVER
       |    (PARTITION BY l.location_key
       |     ORDER BY f.date_valid, f.l_orderkey, f.l_linenumber
       |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
       |    AS precipitation_7d_sum
       |FROM stg f JOIN dim_loc l ON f.loc_ref = l.postal_code AND l.is_current""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "stg_load" ->
      s"SELECT * FROM ($stgSql) ORDER BY l_orderkey, l_linenumber",
    "dim_date" ->
      """SELECT CAST(dk AS VARCHAR) AS date_key, CAST(dk AS VARCHAR) AS full_date,
        |  CAST(year(dk) AS BIGINT) AS year,
        |  CAST(month(dk) AS BIGINT) AS month,
        |  CAST(day(dk) AS BIGINT) AS day,
        |  CAST(isodow(dk) AS BIGINT) AS day_of_week,
        |  CAST(weekofyear(dk) AS BIGINT) AS week_of_year,
        |  CAST(dayofyear(dk) AS BIGINT) AS day_of_year
        |FROM (SELECT DISTINCT CAST(l_shipdate AS DATE) AS dk FROM lineitem)
        |ORDER BY date_key""".stripMargin,
    "dim_location" -> s"SELECT * FROM ($dimLocationSql) ORDER BY location_key",
    "dim_band" ->
      s"""SELECT DISTINCT $bandCase AS weather_band
         |FROM (SELECT l_quantity AS band_q FROM lineitem)
         |ORDER BY weather_band""".stripMargin,
    "dim_precip_type" ->
      s"""SELECT DISTINCT $precipCase AS precipitation_type
         |FROM (SELECT l_tax AS snowfall_in, l_discount AS precipitation_in FROM lineitem)
         |ORDER BY precipitation_type""".stripMargin,
    "dim_source" ->
      """SELECT CAST(1 AS BIGINT) AS source_key, 'graft' AS provider,
        |  'testdata' AS dataset_name, 'parquet' AS ingest_method""".stripMargin,
    "normalized_3nf" ->
      s"SELECT * FROM ($locNaturalSql) ORDER BY postal_code",
    "fact_build" ->
      s"""$factSql
         |ORDER BY l.location_key, f.date_valid, f.l_orderkey, f.l_linenumber""".stripMargin,
    "validate_fact" ->
      s"""WITH fact AS ($factSql)
         |SELECT CAST(SUM(CASE WHEN location_key IS NULL OR date_key IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS null_fk_count,
         |  ROUND(MIN(avg_temp_f), 4) AS min_temp,
         |  ROUND(MAX(avg_temp_f), 4) AS max_temp
         |FROM fact""".stripMargin,
    "q1_avg_by_date" ->
      """SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS full_date,
        |  ROUND(SUM(l_extendedprice) * 100, 0) / COUNT(*) / 100.0 AS avg_temp_f
        |FROM lineitem GROUP BY 1 ORDER BY full_date""".stripMargin,
    "q2_topn_by_location" ->
      """SELECT s_name AS city_name, ROUND(SUM(l_extendedprice) * 100, 0) / COUNT(*) / 100.0 AS avg_temp_f
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY avg_temp_f DESC, city_name LIMIT 15""".stripMargin,
    "q3_avg_by_class" ->
      """SELECT CASE WHEN l_tax > 0.06 THEN 'Snow'
        |    WHEN l_discount > 0.05 THEN 'Rain' ELSE 'None' END
        |    AS precipitation_type,
        |  ROUND(SUM(l_extendedprice) * 100, 0) / COUNT(*) / 100.0 AS avg_temp_f
        |FROM lineitem GROUP BY 1
        |ORDER BY avg_temp_f DESC, precipitation_type""".stripMargin,
    "q4_band_counts" ->
      """SELECT CASE WHEN l_quantity <= 9 THEN 'Freezing'
        |    WHEN l_quantity <= 20 THEN 'Cold' WHEN l_quantity <= 35 THEN 'Mild'
        |    WHEN l_quantity <= 45 THEN 'Warm' ELSE 'Hot' END AS weather_band,
        |  COUNT(*) AS days_count
        |FROM lineitem GROUP BY 1
        |ORDER BY days_count DESC, weather_band""".stripMargin,
    "q5_pct_positive" ->
      """SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS date_key,
        |  ROUND(100.0 * CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 4) AS pct_locations_with_rain
        |FROM lineitem GROUP BY 1 ORDER BY date_key""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id,
        |  COUNT(*) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    // Mirrors Dedup.ngramJaccard (n=3, maxDf=100, minJaccard=0.6):
    // DuckDB list slice w[i:i+2] is 1-based inclusive = Spark slice(w,i,3).
    "ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(generate_series(1, greatest(len(w)-2, 0))) AS t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |rare AS (SELECT * FROM sh WHERE shingle IN
        |         (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) <= 100)),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |          FROM rare a JOIN rare b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
