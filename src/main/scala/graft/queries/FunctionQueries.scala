package graft.queries

import graft.Tables.{dec4, t, us}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 Part C (C1–C9) — scalar function families.
  *
  * All Spark built-ins (codegen'd; no UDFs except the declared C9 UDF
  * surface). Oracles are DuckDB 1.0 dialect; every double output is rounded
  * per the §2 determinism rules, timestamps compared as epoch µs.
  */
object FunctionQueries {

  // C1 — string functions.
  def c01_string(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        upper(substring(col("text"), 1, 10)).as("head10"),
        length(col("text")).cast("long").as("len"),
        regexp_replace(col("lang"), "e", "E").as("langx"),
        lpad(col("source"), 8, "_").as("src8"),
        instr(col("text"), "table").cast("long").as("tbl_at"),
        translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"))
      .orderBy("doc_id")
      .limit(200)

  // C2 — date/time functions + the reference's 5-minute truncate transform
  // (reference Constants.java:25,33-35: truncate(timeperiod, 300000000 µs)).
  def c02_datetime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(us(date_trunc("hour", col("ts"))).as("h_us"))
      .agg(count(lit(1)).as("n"))
      .orderBy("h_us")

  def c02_timebucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select((us(col("ts")) - us(col("ts")) % 300000000L).as("bucket"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"))
      .distinct()
      .orderBy("bucket", "y", "m", "d", "h")
      .limit(200)

  // C3 — math functions.
  def c03_math(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        dec4(sqrt(col("l_extendedprice"))).as("sq"),
        dec4(pow(col("l_discount"), lit(2))).as("d2"),
        dec4(ln(col("l_extendedprice") + 1)).as("lg"),
        floor(col("l_quantity")).as("fl"),
        ceil(col("l_quantity")).as("ce"),
        pmod(col("l_orderkey"), lit(7)).as("m7"),
        signum(col("l_discount") - 0.05).cast("long").as("sg"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(500)

  // C4 — array functions (size / element ops / fold).
  def c04_array(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("n"),
        dec4(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("sq"),
        dec4(element_at(col("embedding"), 1).cast("double")).as("first_v"))
      .orderBy("vec_id")
      .limit(200)

  // C1b — split / array_join round-trip + token slicing.
  def c01_split(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 5), "|").as("head5"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        element_at(split(col("text"), " "), -1).as("last_tok"))
      .orderBy("doc_id")
      .limit(200)

  // C4b — array predicates and ordering: contains, sort, distinct count.
  def c04_array_ops(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_contains(split(col("text"), " "), "table").as("has_table"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"),
        element_at(sort_array(array_distinct(split(col("text"), " "))), 1)
          .as("first_sorted"))
      .orderBy("doc_id")
      .limit(200)

  // C5 — struct construction + field access.
  def c05_struct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        struct(col("event_type").as("t"), col("user_id").as("u"))
          .getField("t").as("typ"),
        struct(col("event_type").as("t"), col("user_id").as("u"))
          .getField("u").as("uid"))
      .orderBy("event_id")
      .limit(100)

  // C5b — map functions: construction from entries, key lookup, keys/values.
  def c05_map(s: SparkSession, dir: String): DataFrame = {
    val m = map_from_entries(array(struct(
      col("event_type").as("k"), col("value").as("v"))))
    t(s, dir, "events")
      .select(col("event_id"),
        dec4(element_at(m, col("event_type"))).as("v"),
        map_keys(m).getItem(0).as("k0"),
        dec4(map_values(m).getItem(0)).as("v0"))
      .orderBy("event_id")
      .limit(300)
  }

  // C6 — JSON extraction (reference parses queue-event JSON,
  // StorageQueueBasedBookkeeper.java:178-212).
  def c06_json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")
      .limit(500)

  // C7 — binary/encoding (reference: base64 queue bodies, binary payloads).
  def c07_binary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        sha2(col("text").cast("binary"), 256).as("h256"),
        md5(col("text").cast("binary")).as("hmd5"),
        // Spark's base64 MIME-chunks past 76 chars (\r\n); strip to match
        // DuckDB's unchunked encoding.
        regexp_replace(base64(col("text").cast("binary")), "\r\n", "").as("b64"),
        length(col("text").cast("binary")).cast("long").as("blen"))
      .orderBy("doc_id")
      .limit(100)

  // C8 — conditional / cast.
  def c08_case(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("sz"),
        coalesce(col("o_orderstatus"), lit("?")).as("st"),
        nullif(col("o_orderstatus"), lit("O")).as("nn"),
        // floor, not cast: Spark's double→long cast truncates while
        // DuckDB's rounds — floor agrees in both engines.
        floor(col("o_totalprice")).cast("long").as("price_l"))
      .orderBy("o_orderkey")
      .limit(500)

  // C9 — the declared UDF surface: cosine similarity vs vec 0 as a Scala
  // UDF over Array[Float] (SURVEY C9/D2). The distributed top-K variant
  // uses the codegen'd native expression instead (PipelineQueries.d02).
  private val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def c09_udf_cosine(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val v0 = e.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    e.crossJoin(broadcast(v0))
      .select(col("vec_id"), dec4(cosineUdf(col("embedding"), col("e0"))).as("cos"))
      .orderBy("vec_id")
  }

  // C9b — the typed UDAF surface: per-label embedding centroid via
  // Aggregator[IN, BUF, OUT] (graft.functions.VectorMean), exploded to
  // (label, pos, value) for the oracle compare.
  def c09_udaf_centroid(s: SparkSession, dir: String): DataFrame = {
    val centroid = udaf(graft.functions.VectorMean)
    t(s, dir, "embeddings")
      .groupBy("label")
      .agg(centroid(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        dec4(col("col")).as("v"))
      .orderBy("label", "pos")
  }

  // C23 — ordered string aggregation: Spark 4's LISTAGG ... WITHIN GROUP
  // (the SQL-standard form; DuckDB replays as string_agg with ORDER BY).
  // Deterministic because the within-group order is total.
  def c23_string_agg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("nation")
    s.sql(
      """SELECT n_regionkey,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  // C24 — error-safe conversion family (the data-cleaning workhorse):
  // try_cast on malformed strings yields NULL instead of failing the job
  // (derived malformed values: every 3rd doc's n_chars renders with a
  // trailing "x"), and zero-denominator division nulls via try_divide.
  // DuckDB replays with TRY_CAST and a NULLIF-guarded division.
  def c24_try_fns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("n_chars").cast("string"), lit("x")))
          .otherwise(col("n_chars").cast("string")).as("raw"),
        col("n_chars"))
      .select(col("doc_id"),
        expr("try_cast(raw AS BIGINT)").as("parsed"),
        dec4(expr("try_divide(CAST(n_chars AS DOUBLE), " +
          "CAST(doc_id % 5 AS DOUBLE))")).as("ratio"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c24_try_fns" -> c24_try_fns _,
    "c23_string_agg" -> c23_string_agg _,
    "c09_udaf_centroid" -> c09_udaf_centroid _,
    "c01_string" -> c01_string _,
    "c01_split" -> c01_split _,
    "c04_array_ops" -> c04_array_ops _,
    "c02_datetime" -> c02_datetime _,
    "c02_timebucket" -> c02_timebucket _,
    "c03_math" -> c03_math _,
    "c04_array" -> c04_array _,
    "c05_struct" -> c05_struct _,
    "c05_map" -> c05_map _,
    "c06_json" -> c06_json _,
    "c07_binary" -> c07_binary _,
    "c08_case" -> c08_case _,
    "c09_udf_cosine" -> c09_udf_cosine _,
  )

  val oracle: Map[String, String] = Map(
    "c24_try_fns" ->
      """SELECT doc_id,
        |  TRY_CAST(CASE WHEN doc_id % 3 = 0
        |    THEN CAST(n_chars AS VARCHAR) || 'x'
        |    ELSE CAST(n_chars AS VARCHAR) END AS BIGINT) AS parsed,
        |  CAST(CAST(round(CAST(n_chars AS DOUBLE) /
        |    NULLIF(CAST(doc_id % 5 AS DOUBLE), 0), 4)
        |    AS DECIMAL(28,4)) AS DOUBLE) AS ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c23_string_agg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "c09_udaf_centroid" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS pos,
        | CAST(CAST(round(AVG(CAST(x AS DOUBLE)), 4) AS DECIMAL(28,4)) AS DOUBLE) AS v
        |FROM (SELECT label, generate_subscripts(embedding, 1) AS i,
        |        unnest(embedding) AS x FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "c01_string" ->
      """SELECT doc_id, UPPER(SUBSTR(text, 1, 10)) AS head10,
        | CAST(LENGTH(text) AS BIGINT) AS len,
        | regexp_replace(lang, 'e', 'E', 'g') AS langx,
        | lpad(source, 8, '_') AS src8,
        | CAST(instr(text, 'table') AS BIGINT) AS tbl_at,
        | translate(lang, 'aeiou', 'AEIOU') AS lang_tr
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "c01_split" ->
      """SELECT doc_id,
        | array_to_string(string_split(text, ' ')[1:5], '|') AS head5,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        | string_split(text, ' ')[-1] AS last_tok
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "c04_array_ops" ->
      """SELECT doc_id,
        | list_contains(string_split(text, ' '), 'table') AS has_table,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        | list_sort(list_distinct(string_split(text, ' ')))[1] AS first_sorted
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "c02_datetime" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS h_us, COUNT(*) AS n
        |FROM events GROUP BY h_us ORDER BY h_us""".stripMargin,
    "c02_timebucket" ->
      """SELECT DISTINCT epoch_us(ts) - epoch_us(ts) % 300000000 AS bucket,
        | CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        | CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h
        |FROM events ORDER BY bucket, y, m, d, h LIMIT 200""".stripMargin,
    "c03_math" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST(round(SQRT(l_extendedprice), 4) AS DECIMAL(28,4)) AS DOUBLE) AS sq,
        | CAST(CAST(round(POW(l_discount, 2), 4) AS DECIMAL(28,4)) AS DOUBLE) AS d2,
        | CAST(CAST(round(LN(l_extendedprice + 1), 4) AS DECIMAL(28,4)) AS DOUBLE) AS lg,
        | CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
        | CAST(CEIL(l_quantity) AS BIGINT) AS ce,
        | l_orderkey % 7 AS m7,
        | CAST(SIGN(l_discount - 0.05) AS BIGINT) AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin,
    "c04_array" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n,
        | CAST(CAST(round(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS DECIMAL(28,4)) AS DOUBLE) AS sq,
        | CAST(CAST(round(CAST(embedding[1] AS DOUBLE), 4) AS DECIMAL(28,4)) AS DOUBLE) AS first_v
        |FROM embeddings ORDER BY vec_id LIMIT 200""".stripMargin,
    "c05_struct" ->
      """SELECT event_id, struct_extract({'t': event_type, 'u': user_id}, 't') AS typ,
        | struct_extract({'t': event_type, 'u': user_id}, 'u') AS uid
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,
    "c05_map" ->
      """SELECT event_id,
        | CAST(CAST(round(map_from_entries([{'k': event_type, 'v': value}])[event_type][1], 4)
        |   AS DECIMAL(28,4)) AS DOUBLE) AS v,
        | map_keys(map_from_entries([{'k': event_type, 'v': value}]))[1] AS k0,
        | CAST(CAST(round(map_values(map_from_entries([{'k': event_type, 'v': value}]))[1], 4)
        |   AS DECIMAL(28,4)) AS DOUBLE) AS v0
        |FROM events ORDER BY event_id LIMIT 300""".stripMargin,
    "c06_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
    "c07_binary" ->
      """SELECT doc_id, sha256(text) AS h256, md5(text) AS hmd5,
        | base64(CAST(text AS BLOB)) AS b64,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS blen
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin,
    "c08_case" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 200000 THEN 'big'
        |      WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS sz,
        | COALESCE(o_orderstatus, '?') AS st,
        | NULLIF(o_orderstatus, 'O') AS nn,
        | CAST(FLOOR(o_totalprice) AS BIGINT) AS price_l
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,
    "c09_udf_cosine" ->
      """WITH z AS (SELECT embedding AS e0 FROM embeddings WHERE vec_id = 0),
        |prod AS (
        |  SELECT e.vec_id,
        |    CAST(generate_subscripts(e.embedding, 1) AS INT) AS i,
        |    unnest(e.embedding) AS x, z.e0 AS e0
        |  FROM embeddings e CROSS JOIN z),
        |terms AS (
        |  SELECT vec_id, CAST(x AS DOUBLE) AS x, CAST(e0[i] AS DOUBLE) AS y FROM prod),
        |sums AS (
        |  SELECT vec_id, SUM(x*y) AS dot, SUM(x*x) AS na, SUM(y*y) AS nb
        |  FROM terms GROUP BY vec_id)
        |SELECT vec_id,
        | CAST(CAST(round(dot / (sqrt(na) * sqrt(nb)), 4) AS DECIMAL(28,4)) AS DOUBLE) AS cos
        |FROM sums ORDER BY vec_id""".stripMargin,
  )
}
