package graft

import graft.functions.GraftFunctions
import graft.sources.Tables

/** The SQL front door: every harness table as a temp view + the native
  * graft functions registered — the same engine surface through
  * spark.sql, exercising Catalyst's full parse→analyze→optimize path. */
class SqlSurfaceSpec extends SparkSuite {

  private lazy val ready: Unit = {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    GraftFunctions.register(spark)
  }

  test("relational query through pure SQL matches the operator result") {
    ready
    val viaSql = spark.sql(
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        .stripMargin).collect()
    val viaOps = operators.RelationalOps.distinctCustomersByStatus(
      Tables.load(spark, "/root/testdata/sf0.001", "orders")).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaOps.map(_.toSeq).toSeq)
  }

  test("registered builders validate arity at analysis time: extra " +
      "arguments are an error, never silently dropped") {
    ready
    // pre-guard, graft_rolling_hash('a','b') ran on 'a' and ignored 'b'
    val extra = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_rolling_hash('a', 'b')").collect()
    }
    assert(extra.getMessage.contains("graft_rolling_hash"))
    val missing = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_vector_dot(array(CAST(1.0 AS FLOAT)))")
        .collect()
    }
    assert(missing.getMessage.contains("graft_vector_dot"))
  }

  test("native functions are callable from SQL") {
    ready
    val row = spark.sql(
      """SELECT graft_rolling_hash('hello world') AS rh,
        |  graft_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
        |    AS dot,
        |  graft_simhash63(array(CAST(5 AS BIGINT))) AS sh""".stripMargin)
      .head
    assert(row.getAs[Long]("rh") == 204910434L)
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Long]("sh") == 5L) // single hash: its bits win
    val cr = spark.sql(
      "SELECT graft_collapse_runs(' x x  y ') AS cr").head.getStruct(0)
    assert(cr.getString(0) == "x y")
    assert(cr.getLong(1) == 3L && cr.getLong(2) == 2L)
    // repetition counters: "a b a b b" → 4 bigrams ("a b"x2 top),
    // 3 trigrams all distinct, trailing run of 2
    val rs = spark.sql(
      "SELECT graft_repetition_stats('a b a b b') AS rs").head.getStruct(0)
    assert(rs.getLong(0) == 4L && rs.getLong(1) == 2L &&
      rs.getLong(2) == 3L && rs.getLong(3) == 3L && rs.getLong(4) == 2L)
    // doc-profile counters: 4 tokens (1 stopword "The"→lowered "the"
    // marker hit), 3 sub-token runs in "x-1 y"
    val dp = spark.sql(
      "SELECT graft_doc_profile_stats('The cat x-1 y') AS dp")
      .head.getStruct(0)
    assert(dp.getLong(0) == 4L)   // n_tokens
    assert(dp.getLong(1) == 10L)  // token_len_sum 3+3+3+1
    assert(dp.getLong(2) == 0L)   // "The" != "the": raw stopword miss
    assert(dp.getLong(3) == 1L)   // lowered "the" is an en marker
    assert(dp.getLong(4) == 5L)   // the|cat|x|1|y sub-token runs
    assert(dp.getLong(5) == 8L)   // T,h,e,c,a,t,x,y
    // whole-row bounded top-k: 2 smallest keys, payloads in key order
    val tk = spark.sql(
      """SELECT graft_row_top_k(v, s, 2) AS t FROM (
        |  SELECT * FROM VALUES (3.0D, 'c'), (1.0D, 'a'), (2.0D, 'b')
        |    AS r(v, s))""".stripMargin).head.getSeq[String](0)
    assert(tk == Seq("a", "b"))
    // any orderable key type works — string keys, long payloads
    val tks = spark.sql(
      """SELECT graft_row_top_k(s, n, 2) AS t FROM (
        |  SELECT * FROM VALUES ('zz', 1L), ('aa', 2L), ('mm', 3L)
        |    AS r(s, n))""".stripMargin).head.getSeq[Long](0)
    assert(tks == Seq(2L, 3L))
    // text normalization: control chars strip, runs collapse, NFC
    // composes e + combining acute (U+0301) into é
    val nt = spark.sql(
      "SELECT graft_normalize_text('  a\tb  café  ') AS t").head
      .getString(0)
    assert(nt == "a b café")
    assert(spark.sql(
      "SELECT graft_normalize_text(CAST(NULL AS STRING)) AS t")
      .head.isNullAt(0))
    // Luhn card scrub: checksum-valid grouped card redacts, the
    // failed-checksum twin stays
    val ls = spark.sql(
      """SELECT graft_luhn_scrub(
        |  'a 4111 1111 1111 1111 b 4111111111111112') AS s"""
        .stripMargin).head.getStruct(0)
    assert(ls.getString(0) == "a [CARD] b 4111111111111112")
    assert(ls.getLong(1) == 1L)
    val extraNt = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_normalize_text('a', 'b')").collect()
    }
    assert(extraNt.getMessage.contains("graft_normalize_text"))
    val extraLs = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_luhn_scrub('a', 'b')").collect()
    }
    assert(extraLs.getMessage.contains("graft_luhn_scrub"))
  }

  test("aggregate + vector natives are callable from SQL: misra_gries " +
      "sketch and nearest-centroid argmax") {
    ready
    val mg = spark.sql(
      """SELECT graft_misra_gries(t, 4) AS mg FROM (
        |  SELECT explode(array('a','a','a','b','c','a','b')) AS t)"""
        .stripMargin).head.getStruct(0)
    assert(mg.getLong(0) == 7L)
    assert(mg.getSeq[String](1).contains("a")) // freq 4 > 7/4
    val nc = spark.sql(
      """SELECT graft_nearest_centroid(
        |  array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT)), 2.0D,
        |  array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |        array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))),
        |  array(1.0D, 1.0D)) AS i""".stripMargin).head.getInt(0)
    assert(nc == 1)
  }

  test("documents analysis through SQL: fingerprint + token count") {
    ready
    val rows = spark.sql(
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' '))))
        |         AS fp,
        |       graft_rolling_hash(text) AS rh
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[String]("fp").length == 32))
    assert(rows.forall(_.getAs[Long]("rh") >= 0L))
  }

  test("graft_bpe_segment from SQL: foldable literal rules and a " +
      "non-foldable per-row rules COLUMN segment identically") {
    ready
    // literal rules → the prebuilt-rank-map path
    val lit = spark.sql(
      """SELECT graft_bpe_segment('lowest low', array('o w', 'l ow'))
        |         AS toks""".stripMargin).collect().head.getSeq[String](0)
    assert(lit == Seq("low", "e", "s", "t", "low"))
    // the same rules arriving as a genuinely non-foldable per-row
    // COLUMN (data-dependent on range(1)'s id, so constant folding
    // cannot collapse it) must take the per-row fallback and agree
    val col = spark.sql(
      """SELECT graft_bpe_segment('lowest low',
        |         array(if(id >= 0, 'o w', 'x'), 'l ow')) AS toks
        |FROM range(1)""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(col == lit)
    // a null rule entry (nullable SQL arrays) is inert, not an NPE
    val withNull = spark.sql(
      """SELECT graft_bpe_segment('lowest low',
        |         array('o w', if(id < 0, 'x', NULL), 'l ow')) AS toks
        |FROM range(1)""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(withNull == lit)
  }
}
