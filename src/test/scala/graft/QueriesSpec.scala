package graft

/** Smoke tier over the harness contract: every declared query runs on
  * sf0.001, every oracle entry points at a declared query, and the
  * flagship entry returns rows. (Exact value checking happens in the
  * DuckDB oracle gate — tools/check_oracle.py / driver CORRECTNESS.) */
class QueriesSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and is deterministic") {
      val df = fn(spark, sf)
      val first = df.collect()
      assert(first != null)
      // re-run: deterministic row multiset
      val second = fn(spark, sf).collect()
      assert(first.toSeq == second.toSeq, s"$name not deterministic")
    }
  }

  test("x12 per-source approx quantiles track q60's exact values (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact =
      SparkEntry.queries("q60_source_length_quantiles")(spark, sf01)
        .collect().map(r => r.getAs[String]("source") -> r).toMap
    val approx =
      SparkEntry.queries("x12_approx_source_length_quantiles")(spark, sf01)
        .collect()
    assert(approx.length == exact.size)
    approx.foreach { a =>
      val e = exact(a.getAs[String]("source"))
      // max is exact in both
      assert(a.getAs[Long]("max_tokens") == e.getAs[Long]("max_tokens"))
      Seq("p25", "p50", "p75", "p99").foreach { c =>
        val ev = e.getAs[Double](c)
        val av = a.getAs[Number](c).doubleValue()
        // the sketch returns a real order statistic; the exact percentile
        // interpolates — allow 5% relative slack for the interpolation gap
        assert(math.abs(av - ev) / math.abs(ev) <= 0.05,
          s"${a.getAs[String]("source")}/$c: approx $av vs exact $ev " +
            "exceeds 5% relative error")
      }
    }
  }

  test("x17 approx vocabulary tracks q69's exact distinct counts " +
      "within the sketch's rsd (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q69_source_vocabulary")(spark, sf01)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val approx =
      SparkEntry.queries("x17_source_vocabulary_approx")(spark, sf01)
        .collect()
    assert(approx.length == exact.size)
    approx.foreach { a =>
      val e = exact(a.getAs[String]("source"))
      // per-doc shingle totals are exact in both
      assert(a.getAs[Long]("n_shingles") == e.getAs[Long]("n_shingles"))
      val ev = e.getAs[Long]("vocab").toDouble
      val av = a.getAs[Long]("vocab").toDouble
      // rsd=0.02 → allow 3 sigma
      assert(math.abs(av - ev) / ev <= 0.06,
        s"${a.getAs[String]("source")}: approx $av vs exact $ev " +
          "exceeds 6% relative error")
    }
  }

  test("x07 approx quantiles within 1% of q32's exact values (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q32_order_price_quantiles")(spark, sf01)
      .head()
    val approx =
      SparkEntry.queries("x07_approx_order_price_quantiles")(spark, sf01)
        .head()
    Seq("p25", "p50", "p75", "p90").foreach { c =>
      val e = exact.getAs[Double](c)
      val a = approx.getAs[Double](c)
      assert(math.abs(a - e) / math.abs(e) <= 0.01,
        s"$c: approx $a vs exact $e exceeds 1% relative error")
    }
  }

  test("x41 quantile-sketch self-evaluation: sweep is complete, errors " +
      "are tight at high accuracy and approx values stay in-range") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("x41_quantile_sketch_eval")(spark, sf01)
      .collect()
    assert(rows.length == 12, "3 accuracies x 4 quantiles")
    val range = spark.read.parquet(s"$sf01/orders.parquet")
      .agg(org.apache.spark.sql.functions.min("o_totalprice"),
        org.apache.spark.sql.functions.max("o_totalprice"))
      .head()
    val (lo, hi) = (range.getDouble(0), range.getDouble(1))
    rows.foreach { r =>
      val ap = r.getAs[Double]("approx")
      assert(ap >= lo && ap <= hi, "sketch value must be a data value")
      assert(r.getAs[Double]("rel_err") >= 0.0)
    }
    rows.filter(_.getAs[Long]("accuracy") == 10000L).foreach { r =>
      assert(r.getAs[Double]("rel_err") <= 0.01,
        s"accuracy 10000 must be within 1%: $r")
    }
  }
}
