package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSuite
import graft.operators.{EventOps, NearDup, TextOps}

/** Streaming twins vs their batch operators: identical results on the
  * same data (the streaming==batch parity that makes the incremental
  * path trustworthy), plus the end-to-end AvailableNow ETL pass. */
class StreamingSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val fixtureJson = new String(Files.readAllBytes(
    java.nio.file.Paths.get(
      getClass.getResource("/usajobs_page.json").getPath)))

  test("AvailableNow ETL: land -> curate -> dedup -> merge, twice") {
    val landing = tmp("land"); val target = tmp("tgt") + "/t"
    val checkpoint = tmp("ckpt")
    Files.writeString(java.nio.file.Paths.get(landing, "p1.json"),
      fixtureJson)
    StreamingEtl.runAvailableNow(spark, landing, target, checkpoint)
    val after1 = spark.read.parquet(target)
    assert(after1.count() == 2)
    assert(after1.columns.contains("created_at"))

    // second landing of the same page: file-source tracking skips the old
    // file; the new one merges as updates, count stays 2
    Files.writeString(java.nio.file.Paths.get(landing, "p2.json"),
      fixtureJson)
    StreamingEtl.runAvailableNow(spark, landing, target, checkpoint)
    assert(spark.read.parquet(target).count() == 2)
  }

  test("streaming hourly counts (Complete) == batch hourlyEventCounts") {
    val dir = tmp("events")
    import spark.implicits._
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 1.0, ""),
      (2L, Timestamp.valueOf("2024-01-01 10:45:00"), 2L, "view", 1.0, ""),
      (3L, Timestamp.valueOf("2024-01-01 11:10:00"), 1L, "click", 1.0, ""),
      (4L, Timestamp.valueOf("2024-01-01 12:00:00"), 3L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = StreamingEvents.hourlyEventCounts(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT * FROM hourly")
      .orderBy("hour_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val batch = EventOps.hourlyEventCounts(events)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stream-stream range join == batch rangeJoinWithin on a closed " +
      "input (watermark-bounded state)") {
    val dir = tmp("rjevents")
    import spark.implicits._
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:59"), 7L, "click", 1.0, ""),
      (2L, Timestamp.valueOf("2024-01-01 10:01:30"), 7L, "view", 1.0, ""),
      (3L, Timestamp.valueOf("2024-01-01 10:01:59"), 7L, "click", 1.0, ""),
      (4L, Timestamp.valueOf("2024-01-01 10:30:00"), 7L, "view", 1.0, ""),
      (5L, Timestamp.valueOf("2024-01-01 10:01:00"), 9L, "click", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = StreamingEvents.rangeJoinWithin(stream, gapMinutes = 1)
      .writeStream.format("memory").queryName("rj")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT * FROM rj")
      .orderBy("user_id", "a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = graft.operators.EventOps
      .rangeJoinWithin(events.select("event_id", "ts", "user_id"), 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("MisraGries sketch aggregates in a streaming query (state-store " +
      "serialize/merge path) and keeps its guarantee") {
    val dir = tmp("mgdocs")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 'hot' + 40 spread over a 20-word noise vocab; k=8 < vocab
    val docs = (0 until 100).map { i =>
      (i.toLong, if (i < 60) "hot" else s"w${i % 20}")
    }.toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = stream
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .agg(graft.functions.GraftFunctions.misraGries(col("token"), 8)
        .as("mg"))
      .select(col("mg.n").as("n"), col("mg.candidates").as("cand"))
      .writeStream.format("memory").queryName("mg_sketch")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val row = spark.sql("SELECT * FROM mg_sketch").head
    assert(row.getLong(0) == 100L)
    val cand = row.getSeq[String](1)
    assert(cand.size <= 8)
    assert(cand.contains("hot"), s"heavy hitter lost in streaming: $cand")
  }

  test("sessionize: a late event in a later micro-batch never regresses " +
      "the session boundary") {
    val dir = tmp("late"); val ckpt = tmp("lateckpt")
    import spark.implicits._
    val closed = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamingEvents.Session]())
    def run(): Unit = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[
          StreamingEvents.Event]].schema)
        .parquet(dir).as[StreamingEvents.Event]
      val q = StreamingEvents.sessionize(spark, stream)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[StreamingEvents.Session],
              _: Long) => batch.collect().foreach(closed.add(_): Unit)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: one event at 10:00
    Seq(StreamingEvents.Event(1L, 1L, "click",
      Timestamp.valueOf("2024-01-01 10:00:00"))).toDS()
      .write.mode("append").parquet(dir)
    run()
    // batch 2: LATE 9:45 plus 10:20 — all gaps < 30 min, so the session
    // must stay open; regressing lastTs to 9:45 would falsely close it
    Seq(
      StreamingEvents.Event(2L, 1L, "view",
        Timestamp.valueOf("2024-01-01 09:45:00")),
      StreamingEvents.Event(3L, 1L, "click",
        Timestamp.valueOf("2024-01-01 10:20:00"))).toDS()
      .write.mode("append").parquet(dir)
    run()
    assert(closed.isEmpty,
      s"no session should close across the late arrival, got $closed")
  }

  test("stateful sessionize emits closed sessions matching batch gaps") {
    val dir = tmp("sess")
    import spark.implicits._
    // user 1: two sessions (gap 60 min); user 2: one session — only
    // user 1's FIRST session closes within the data
    val events = Seq(
      StreamingEvents.Event(1L, 1L, "click",
        Timestamp.valueOf("2024-01-01 10:00:00")),
      StreamingEvents.Event(2L, 1L, "view",
        Timestamp.valueOf("2024-01-01 10:10:00")),
      StreamingEvents.Event(3L, 1L, "click",
        Timestamp.valueOf("2024-01-01 11:10:00")), // closes session 1
      StreamingEvents.Event(4L, 2L, "view",
        Timestamp.valueOf("2024-01-01 10:00:00")))
    events.toDS().write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(events.toDS().schema).parquet(dir)
      .as[StreamingEvents.Event]
    val q = StreamingEvents.sessionize(spark, stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val closed = spark.sql("SELECT * FROM sessions").as[StreamingEvents.Session]
      .collect()
    assert(closed.length == 1)
    assert(closed.head.user_id == 1L && closed.head.n_events == 2L)
    assert(closed.head.started_at == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(closed.head.ended_at == Timestamp.valueOf("2024-01-01 10:10:00"))
    // batch twin agrees on total session structure: user 1 has 2 sessions
    val batch = EventOps.sessionize(
      events.toDS().toDF().withColumn("value", lit(1.0))).collect()
    assert(batch.find(_.getLong(0) == 1L).get.getLong(1) == 2L)
  }

  test("streaming incremental dedup: in-batch collapse, corpus probe " +
      "across micro-batches, band index tracks the corpus") {
    val landing = tmp("dl"); val ckpt = tmp("dc")
    val corpus = tmp("dcorp") + "/c"; val bandIdx = tmp("dband") + "/b"
    import spark.implicits._
    val base =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    val oneEdit = base.replace("november", "EDITED") // J = 15/21 >= 0.7
    val other = "zulu yankee xray whiskey victor uniform tree stone " +
      "rock moon lake iron hill glass fire earth dust cloud brick ash"
    val novel2 = "red orange yellow green blue indigo violet umber " +
      "teal navy coral pink white black gray silver gold bronze tin lead"

    // batch 1: 1 and 2 are byte-identical (in-batch cluster), 10 distinct
    val b1 = Seq((1L, base), (2L, base), (10L, other))
      .toDF("doc_id", "text")
    b1.write.mode("append").parquet(landing)
    // bands=32 (r=2): detection probability at J~0.71 is ~1 and the
    // fixed-seed result is deterministic either way
    StreamingDedup.runAvailableNow(spark, landing, corpus, bandIdx, ckpt,
      b1.schema, bands = 32)
    val after1 = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(after1 == Set(1L, 10L))

    // batch 2: 20 near-dups corpus doc 1; 21/22 are an in-batch pair
    Seq((20L, oneEdit), (21L, novel2), (22L, novel2))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    StreamingDedup.runAvailableNow(spark, landing, corpus, bandIdx, ckpt,
      b1.schema, bands = 32)
    val after2 = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(after2 == Set(1L, 10L, 21L),
      s"near-dup of corpus and in-batch dup must be dropped, got $after2")

    // the band index covers exactly the accumulated corpus
    val idxDocs = spark.read.option("recursiveFileLookup", "true")
      .parquet(bandIdx).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(idxDocs == after2)

    // the streaming result equals the direct two-step batch computation
    val direct1 = StreamingDedup.novelDocs(b1, None, None, 3, 64, 32, 0.7)
    val direct2 = StreamingDedup.novelDocs(
      Seq((20L, oneEdit), (21L, novel2), (22L, novel2))
        .toDF("doc_id", "text"),
      Some(direct1), None, 3, 64, 32, 0.7)
    val directIds = (direct1.collect() ++ direct2.collect())
      .map(_.getAs[Long]("doc_id")).toSet
    assert(directIds == after2)

    // REPLAY idempotence: re-running a batch with the same batchId (the
    // crash-before-checkpoint-commit retry) must not treat its own
    // prior output as corpus — a replay that saw itself would flag
    // every doc a self-duplicate and overwrite the dir with nothing
    StreamingDedup.processBatch(
      Seq((20L, oneEdit), (21L, novel2), (22L, novel2))
        .toDF("doc_id", "text"),
      batchId = 1L, corpus, bandIdx, 3, 64, 32, 0.7)
    val afterReplay = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(afterReplay == after2,
      s"replay of batch 1 changed the corpus: $afterReplay")

    // COMPACTION: land a third batch (so two CLOSED batches exist),
    // fold them, and verify the data, the exclusion contract and a
    // subsequent probe are all unchanged
    Seq((30L, "only a completely fresh document sails through " +
      "untouched with many novel words here")).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    StreamingDedup.runAvailableNow(spark, landing, corpus, bandIdx, ckpt,
      b1.schema, bands = 32)
    val before = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("doc_id")).toSet
    val dirCount = (d: String) => new java.io.File(d).listFiles()
      .count(_.getName.startsWith("batch="))
    assert(dirCount(corpus) == 3)
    val folded = StreamingDedup.compactAccumulated(spark, corpus)
    assert(folded == 2, s"expected 2 dirs folded, got $folded")
    assert(dirCount(corpus) == 2) // consolidated + newest
    val afterCompact = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(afterCompact == before,
      s"compaction changed the corpus: $afterCompact vs $before")
    // nothing to fold at <= 2 dirs: a second call is a no-op
    assert(StreamingDedup.compactAccumulated(spark, corpus) == 0)
    // readAccumulated still sees every compacted row when excluding a
    // NEW batch id (the only exclusion a live stream performs)
    val acc = StreamingDedup.readAccumulated(spark, corpus, 99L)
    assert(acc.map(_.collect().map(_.getAs[Long]("doc_id")).toSet)
      .contains(before))
  }

  test("streaming ingestion with quality pre-filter: rejected docs " +
      "never reach the corpus or band index; equals filter-then-dedup " +
      "batch computation") {
    val landing = tmp("ql"); val ckpt = tmp("qc")
    val corpus = tmp("qcorp") + "/c"; val bandIdx = tmp("qband") + "/b"
    import spark.implicits._
    val good =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    // run of 10 identical tokens → fails the repetition family
    val junk = Array.fill(10)("spam").mkString(" ")
    val filter: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame =
      d => TextOps.filterQuality(d, minTokens = 10L, maxTokens = 90L,
        maxDupFrac = 0.5, maxRun = 3L, swLo = 0.0, swHi = 1.0,
        mtlLo = 1.0, mtlHi = 10.0)
    // 1 and 3 are byte-identical (in-batch pair); 2 is junk
    val b1 = Seq((1L, good), (2L, junk), (3L, good)).toDF("doc_id", "text")
    b1.write.mode("append").parquet(landing)
    StreamingDedup.runAvailableNow(spark, landing, corpus, bandIdx, ckpt,
      b1.schema, bands = 32, qualityFilter = Some(filter))
    val corpusIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(corpusIds == Set(1L),
      s"junk must be filtered and the dup collapsed, got $corpusIds")
    val idxIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(bandIdx).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(idxIds == Set(1L), "band index must track the filtered corpus")
    // parity: the direct batch pipeline (filterQuality → novelDocs)
    val direct = StreamingDedup.novelDocs(filter(b1), None, None,
      3, 64, 32, 0.7).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(direct == corpusIds)
  }

  test("streaming embedding ingestion: in-batch collapse, corpus probe " +
      "across micro-batches, band index tracks the corpus, replay " +
      "idempotent") {
    val landing = tmp("el"); val ckpt = tmp("ec")
    val corpus = tmp("ecorp") + "/c"; val bandIdx = tmp("eband") + "/b"
    import spark.implicits._
    def vec(axis: Int, eps: Float): Seq[Float] = {
      val a = Array.fill(4)(0.0f); a(axis) = 1.0f; a(3) = eps; a.toSeq
    }
    // batch 1: 1 and 2 identical (in-batch cluster), 10 orthogonal
    val b1 = Seq((1L, vec(0, 0f), 0), (2L, vec(0, 0f), 0),
      (10L, vec(1, 0f), 1)).toDF("vec_id", "embedding", "label")
    b1.write.mode("append").parquet(landing)
    StreamingEmbeddingDedup.runAvailableNow(spark, landing, corpus,
      bandIdx, ckpt, b1.schema, threshold = 0.9)
    val after1 = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(after1 == Set(1L, 10L))
    // batch 2: 20 near-dups corpus vec 1 (cos ~ 0.99995); 21/22 are a
    // novel in-batch pair on a fresh axis
    val b2 = Seq((20L, vec(0, 0.01f), 0), (21L, vec(2, 0f), 2),
      (22L, vec(2, 0f), 2)).toDF("vec_id", "embedding", "label")
    b2.write.mode("append").parquet(landing)
    StreamingEmbeddingDedup.runAvailableNow(spark, landing, corpus,
      bandIdx, ckpt, b1.schema, threshold = 0.9)
    val after2 = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(after2 == Set(1L, 10L, 21L),
      s"corpus near-dup and in-batch dup must be dropped, got $after2")
    // the band index covers exactly the accumulated corpus
    val idxIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(bandIdx).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(idxIds == after2)
    // parity with the direct two-step batch computation
    val d1 = StreamingEmbeddingDedup.novelVectors(b1, None, None,
      0.9, 12, 3)
    val d2 = StreamingEmbeddingDedup.novelVectors(b2, Some(d1), None,
      0.9, 12, 3)
    assert((d1.collect() ++ d2.collect())
      .map(_.getAs[Long]("vec_id")).toSet == after2)
    // replay of batch 1 (crash-retry) must not see its own output
    StreamingEmbeddingDedup.processBatch(b2, batchId = 1L, corpus,
      bandIdx, 0.9, 12, 3)
    val afterReplay = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpus).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(afterReplay == after2,
      s"replay of batch 1 changed the corpus: $afterReplay")
  }

  test("ingestStatic (x23 surface): two-pass AvailableNow ingestion " +
      "over the harness embeddings == direct two-step batch dedup") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = StreamingEmbeddingDedup.ingestStatic(spark, emb,
        threshold = 0.45)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    val d1 = StreamingEmbeddingDedup.novelVectors(even, None, None,
      0.45, 12, 3)
    val d2 = StreamingEmbeddingDedup.novelVectors(odd, Some(d1), None,
      0.45, 12, 3)
    val expect = (d1.collect() ++ d2.collect())
      .map(_.getAs[Long]("vec_id")).toSet
    assert(got.nonEmpty && got == expect,
      s"streamed corpus must equal the two-step batch result; " +
        s"only-stream=${got -- expect} only-batch=${expect -- got}")
  }

  test("streaming curation (gate -> scrub -> dedup -> pack) across two " +
      "passes == batch Curation.pipeline on the union") {
    val landing = tmp("cl"); val ckpt = tmp("cc")
    val corpus = tmp("ccorp") + "/c"; val bandIdx = tmp("cband") + "/b"
    import spark.implicits._
    // docs must pass the DEFAULT quality gate (30..90 unique-ish tokens,
    // >=1 stopword); clusters are PAIRWISE similar and batches split in
    // doc_id order, so greedy incremental dedup and the global CC agree
    def mk(ts: String*): String = ts.mkString(" ")
    val base = mk(("alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango the cedar birch maple aspen willow poplar hazel " +
      "rowan alder laurel olive elm oak pine fir yew ash beech").split(' ')
      .toIndexedSeq: _*) // 39 unique tokens incl "the"
    val oneEdit = base.replace("november", "edited") // J = 38/40 >= 0.7
    val other = mk(("zulu yankee xray whiskey victor uniform stone rock " +
      "moon lake iron hill glass fire earth dust cloud brick mica sand " +
      "and river delta2 canyon mesa butte ridge valley creek brook " +
      "pond marsh fen bog heath moor dune reef atoll").split(' ')
      .toIndexedSeq: _*)
    val novel2 = mk(("red orange yellow green blue indigo violet umber " +
      "teal navy coral pink white black gray silver gold bronze tin " +
      "lead for crimson scarlet amber jade ruby pearl onyx topaz opal " +
      "quartz slate copper brass nickel zinc iron2 steel").split(' ')
      .toIndexedSeq: _*)
    // identical after PII scrub, different before: scrub-before-dedup
    // is what makes these collapse — on BOTH sides. Token set disjoint
    // from every other cluster (sharing base's tokens would J-merge
    // them into doc 1's cluster).
    val pii = mk(("apple banana cherry damson elder fig grape guava " +
      "kiwi lemon mango melon nectarine orange2 papaya peach pear plum " +
      "quince raspberry of apricot currant date dewberry durian " +
      "feijoa jackfruit jujube kumquat longan loquat lychee mulberry " +
      "persimmon pomelo sapote soursop tamarind").split(' ')
      .toIndexedSeq: _*)
    val email1 = pii.replace("tamarind", "contact@example.com")
    val email2 = pii.replace("tamarind", "other@sample.org")
      .replace("apple", "apple2") // still J = 37/41 >= 0.7 post-scrub
    val junk = Array.fill(40)("spam").mkString(" ")

    val b1 = Seq((1L, base, "s1"), (2L, base, "s1"), (4L, junk, "s1"),
      (10L, other, "s2")).toDF("doc_id", "text", "source")
    val b2 = Seq((20L, oneEdit, "s1"), (21L, novel2, "s2"),
      (22L, novel2, "s2"), (30L, email1, "s2"), (31L, email2, "s2"))
      .toDF("doc_id", "text", "source")

    b1.write.mode("append").parquet(landing)
    StreamingDedup.runCurationAvailableNow(spark, landing, corpus,
      bandIdx, ckpt, b1.schema, packTokens = 64L, bands = 32)
    b2.write.mode("append").parquet(landing)
    val streamed = StreamingDedup.runCurationAvailableNow(spark, landing,
      corpus, bandIdx, ckpt, b1.schema, packTokens = 64L, bands = 32)

    val batch = graft.operators.Curation.pipeline(b1.unionByName(b2),
      packTokens = 64L, bands = 32)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "n_tokens", "start_offset",
        "pack_first", "pack_last").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val s = rows(streamed)
    assert(s == rows(batch),
      s"streaming curation must equal the batch pipeline, got $s")
    // sanity on the fixture's intent: junk gated out, all three clusters
    // collapsed (incl. the PII-only-difference pair), packs assigned
    assert(s.map(_._1) == Set(1L, 10L, 21L, 30L))
  }

  // ---- compaction crash recovery (ADVICE r9) -------------------------
  // The swap is: write staging parquet → write fold manifest → delete
  // source dirs → rename staging into place. A crash can land between
  // any two steps; recovery on the next compactAccumulated call must
  // never lose rows — in particular it must NOT delete the staging dir
  // when that dir is the only remaining copy of folded data.

  private def hadoopFs(root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def writeBatches(root: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.foreach { id =>
      Seq((id, s"document number $id body")).toDF("doc_id", "text")
        .write.mode("overwrite")
        .parquet(StreamingDedup.subdir(root, id))
    }
  }

  private def corpusIds(root: String): Set[Long] =
    StreamingDedup.readAccumulated(spark, root, excludeBatchId = -1L)
      .map(_.collect().map(_.getAs[Long]("doc_id")).toSet)
      .getOrElse(Set.empty)

  /** Simulate a compaction run that crashed AFTER the staging write
    * (+ manifest) and after deleting `deleted` of its source dirs. */
  private def stageCrash(root: String, fold: Seq[Long],
      deleted: Seq[Long]): org.apache.hadoop.fs.Path = {
    val fs = hadoopFs(root)
    val staging = new org.apache.hadoop.fs.Path(root, "_compacting")
    spark.read
      .parquet(fold.map(StreamingDedup.subdir(root, _)): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    StreamingDedup.writeFoldManifest(fs, staging, fold)
    deleted.foreach(id => fs.delete(
      new org.apache.hadoop.fs.Path(StreamingDedup.subdir(root, id)), true))
    staging
  }

  test("compaction recovery: crash after ALL source deletes, before " +
      "rename — staging is the only copy and must be swapped in, " +
      "never deleted") {
    val root = tmp("ccr1") + "/c"
    writeBatches(root, Seq(0L, 1L, 2L, 3L))
    val staging = stageCrash(root, fold = Seq(0L, 1L, 2L),
      deleted = Seq(0L, 1L, 2L))
    assert(corpusIds(root) == Set(3L), "pre-recovery: folded rows are " +
      "invisible (staging is a hidden _-dir)")
    val folded = StreamingDedup.compactAccumulated(spark, root)
    // recovery completed the interrupted swap; only 2 dirs remain so
    // no NEW fold happens this call
    assert(folded == 0)
    assert(corpusIds(root) == Set(0L, 1L, 2L, 3L),
      "all folded rows must be recovered")
    val fs = hadoopFs(root)
    assert(!fs.exists(staging), "staging must be renamed away")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      StreamingDedup.subdir(root, 0L))), "folded data lands at batch=min")
  }

  test("compaction recovery: crash after a PARTIAL source delete — " +
      "remaining sources are deleted and staging swapped in, no " +
      "duplicates and no loss") {
    val root = tmp("ccr2") + "/c"
    writeBatches(root, Seq(0L, 1L, 2L, 3L))
    stageCrash(root, fold = Seq(0L, 1L, 2L), deleted = Seq(1L))
    assert(StreamingDedup.compactAccumulated(spark, root) == 0)
    val ids = StreamingDedup.readAccumulated(spark, root, -1L)
      .get.collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.sorted == Seq(0L, 1L, 2L, 3L),
      s"exactly-once across recovery, got $ids")
  }

  test("compaction recovery: crash BEFORE any source delete — staging " +
      "is redundant, gets discarded, and a fresh fold proceeds") {
    val root = tmp("ccr3") + "/c"
    writeBatches(root, Seq(0L, 1L, 2L, 3L))
    stageCrash(root, fold = Seq(0L, 1L, 2L), deleted = Seq.empty)
    val folded = StreamingDedup.compactAccumulated(spark, root)
    assert(folded == 3, "all sources intact -> normal fold of 0..2")
    assert(corpusIds(root) == Set(0L, 1L, 2L, 3L))
    assert(!hadoopFs(root).exists(
      new org.apache.hadoop.fs.Path(root, "_compacting")))
  }

  test("compaction recovery: INCOMPLETE staging (no _SUCCESS/manifest) " +
      "is discarded — sources are by construction still intact") {
    val root = tmp("ccr4") + "/c"
    writeBatches(root, Seq(0L, 1L, 2L, 3L))
    val fs = hadoopFs(root)
    val staging = new org.apache.hadoop.fs.Path(root, "_compacting")
    fs.mkdirs(staging)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(staging, "part-00000.parquet"), true)
    out.write("not a parquet file".getBytes("UTF-8")); out.close()
    val folded = StreamingDedup.compactAccumulated(spark, root)
    assert(folded == 3)
    assert(corpusIds(root) == Set(0L, 1L, 2L, 3L))
  }

  test("maintainStatic (x26): ingest -> IVF append -> compact -> " +
      "search answers identically to a from-scratch index rebuild " +
      "over the same corpus") {
    import spark.implicits._
    import graft.operators.VectorOps
    def vec(axis: Int, eps: Float): Seq[Float] = {
      val a = Array.fill(4)(0.0f); a(axis) = 1.0f; a(3) = eps; a.toSeq
    }
    // 9 vectors over 3 mod-3 batches; 4 and 8 duplicate 1 and 2
    // (cross-batch near-dups), labels give 3 coarse centroids
    val emb = Seq(
      (0L, vec(0, 0f), 0), (1L, vec(1, 0f), 1), (2L, vec(2, 0f), 2),
      (3L, vec(0, 0.3f), 0), (4L, vec(1, 0.005f), 1),
      (5L, vec(2, 0.3f), 2), (6L, vec(0, 0.6f), 0),
      (7L, vec(1, 0.6f), 1), (8L, vec(2, 0.004f), 2))
      .toDF("vec_id", "embedding", "label")
    val result = StreamingEmbeddingDedup.maintainStatic(spark, emb,
      threshold = 0.98, k = 3)
    val rows = result.collect()
    assert(rows.nonEmpty, "the maintained index must answer")
    // near-dups 4 and 8 must have been dropped at ingest (cos > 0.98
    // against 1 and 2), so they can never be neighbors
    val ids = rows.flatMap(r =>
      Seq(r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    assert(!ids.contains(4L) && !ids.contains(8L),
      s"deduped vectors resurfaced in the index: $ids")
    // sharp property: the appended+compacted index answers exactly as
    // a from-scratch rebuild over the same deduped corpus with the
    // same codebook. Rebuild = dedup the full table in one batch
    // (same threshold), index it fresh, search the same queries.
    val corpus = VectorOps.dedupEmbeddings(emb, 0.98)
    val centroids = VectorOps.labelCentroids(
      corpus.filter(col("vec_id") % 3 === 0)).localCheckpoint()
    val freshIdx = java.nio.file.Files
      .createTempDirectory("x26_rebuild").toString + "/ivf"
    VectorOps.writeIvfIndex(corpus, centroids, freshIdx)
    val queryIds = corpus.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(3).collect().map(_.getLong(0)).toSeq
    val rebuilt = VectorOps.annIvfIndexed(spark, freshIdx, corpus,
      queryIds, 3, 2, centroids)
    val asSet = (d: org.apache.spark.sql.DataFrame) => d.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        math.round(r.getAs[Double]("cosine") * 1e9))).toSet
    assert(asSet(result) == asSet(rebuilt),
      "maintained and rebuilt indexes must answer identically")
  }

  test("fold manifest round-trips and is removed from the swapped-in " +
      "directory") {
    val root = tmp("ccr5") + "/c"
    writeBatches(root, Seq(0L, 1L, 2L, 3L))
    val fs = hadoopFs(root)
    assert(StreamingDedup.compactAccumulated(spark, root) == 3)
    // the live batch=0 dir must NOT look like a staging dir to any
    // later run (manifest deleted after the rename)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      StreamingDedup.subdir(root, 0L) + "/_GRAFT_FOLD")))
    val staging = new org.apache.hadoop.fs.Path(root, "_x")
    StreamingDedup.writeFoldManifest(fs, staging, Seq(7L, 8L, 42L))
    assert(StreamingDedup.readFoldManifest(fs, staging)
      .contains(Seq(7L, 8L, 42L)))
  }
  test("mixDrift: a batch matching the reference mix reports zero L1; " +
      "a flooded batch reports the flooding type; the streaming " +
      "ledger equals the direct per-slice computation") {
    import spark.implicits._
    import graft.streaming.StreamingEvents
    val baseline = Map("view" -> 0.5, "click" -> 0.25, "error" -> 0.25)
    // exact-match batch: 2 view, 1 click, 1 error
    val exact = Seq("view", "view", "click", "error").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("event_id", "event_type")
    val a = StreamingEvents.auditBatch(exact, 0L, baseline)
    assert(a.l1_drift == 0.0 && a.n_events == 4L)
    // flooded batch: all error
    val flood = (0 until 4).map(i => (i.toLong, "error"))
      .toDF("event_id", "event_type")
    val f = StreamingEvents.auditBatch(flood, 1L, baseline)
    assert(f.top_over_type == "error")
    assert(math.abs(f.l1_drift - 1.5) < 1e-12) // |1-.25|+.5+.25
    assert(math.abs(f.top_over_dev - 0.75) < 1e-12)
    // a type absent from the reference counts its full batch share
    val novel = Seq((0L, "view"), (1L, "purchase"))
      .toDF("event_id", "event_type")
    val nv = StreamingEvents.auditBatch(novel, 2L, baseline)
    assert(nv.top_over_type == "purchase")
    // end-to-end static harness: ledger rows == direct audit of each
    // event_id-mod slice against the full-table mix
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("event_type"))
    val ledger = StreamingEvents.mixDriftStatic(spark, events, nBatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getString(3), r.getDouble(4))).toSeq
    assert(ledger.map(_._1) == Seq(0L, 1L, 2L))
    val counts = events.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = counts.map(_._2).sum.toDouble
    val base = counts.map { case (t, n) => t -> (n / total) }.toMap
    (0 until 3).foreach { i =>
      val slice = events.filter(pmod(col("event_id"), lit(3L)) === i)
      val direct = StreamingEvents.auditBatch(slice, i.toLong, base)
      assert(ledger(i) == ((direct.batch_id, direct.n_events,
        direct.l1_drift, direct.top_over_type, direct.top_over_dev)),
        s"batch $i: ledger ${ledger(i)} != direct $direct")
    }
  }
  test("streaming z-order maintenance: two micro-batch appends == " +
      "batch base+deltas, one manifest commit per batch, and a " +
      "REPLAYED batch is a provable no-op") {
    import org.apache.spark.sql.functions.col
    val base = tmp("graft_szo")
    val landing = base + "/landing"
    val table = base + "/ztable"
    val ckpt = base + "/ckpt"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val baseDf = li.filter(col("l_orderkey") > 1000L)
    val d1 = li.filter(col("l_orderkey") <= 500L)
    val d2 = li.filter(col("l_orderkey") > 500L &&
      col("l_orderkey") <= 1000L)
    graft.operators.Layout.zOrderWriteIndexed(baseDf,
      Seq("l_orderkey", "l_partkey"), table)
    // batch 0 lands, drains; batch 1 lands, drains — two commits
    d1.write.mode("append").parquet(landing)
    StreamingZOrder.runAvailableNow(spark, landing, table, ckpt,
      d1.schema)
    val tagAfter1 = graft.operators.Layout.lastCommitTag(spark, table)
    assert(tagAfter1.exists(_.startsWith("batch-")),
      s"the batch id must ride the manifest commit, got $tagAfter1")
    d2.write.mode("append").parquet(landing)
    StreamingZOrder.runAvailableNow(spark, landing, table, ckpt,
      d2.schema)
    def payload(): Seq[Seq[Any]] =
      graft.operators.Layout.readZOrdered(spark, table)
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_extendedprice"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val want = baseDf.unionByName(d1).unionByName(d2)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(payload() == want,
      "streamed appends must equal the batch base+d1+d2 multiset")
    // REPLAY: re-running the last batch's body with the same id must
    // no-op — the tag in the manifest is the exactly-once guard
    val lastTag = graft.operators.Layout.lastCommitTag(spark, table).get
    val lastId = lastTag.stripPrefix("batch-").toLong
    StreamingZOrder.processBatch(d2, lastId, table)
    assert(payload() == want,
      "a replayed micro-batch must not duplicate rows")
    // a FRESH id does apply (the guard is id-specific, not a latch)
    StreamingZOrder.processBatch(d1.limit(0), lastId + 1, table)
    assert(payload() == want, "an empty batch is skipped entirely")
    // compaction between batches carries the tag forward — the guard
    // still recognizes the replay afterwards
    graft.operators.Layout.zOrderCompact(spark, table,
      targetRows = 100000L)
    assert(graft.operators.Layout.lastCommitTag(spark, table)
      .contains(lastTag), "compaction must carry the commit tag forward")
    StreamingZOrder.processBatch(d2, lastId, table)
    assert(payload() == want,
      "replay after compaction must still no-op")
  }

  test("corpusStats: incrementally-maintained streaming aggregate " +
      "equals the from-scratch batch aggregate over the full corpus") {
    import graft.streaming.StreamingEvents
    import graft.functions.TextFunctions
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val streamed = StreamingEvents.corpusStatsStatic(spark, docs,
      nBatches = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val batch = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(streamed == batch,
      s"incremental state must equal from-scratch: $streamed vs $batch")
  }

  test("qualityGateStatic: ledger rows equal the direct per-slice " +
      "audit; a junk batch fires the alert, an empty batch audits as " +
      "a zero-rate alert") {
    import graft.streaming.StreamingQuality
    import spark.implicits._
    // direct auditBatch goldens first: all-stopword batch passes,
    // digit-wall batch alerts
    val good = Seq((1L, "the of and to in is")).toDF("doc_id", "text")
    val g = StreamingQuality.auditBatch(good, 0L, minPassRate = 0.5)
    assert(g.n_docs == 1L && g.n_pass == 1L && !g.alert)
    val junk = Seq((1L, "11111 22222 33333")).toDF("doc_id", "text")
    val j = StreamingQuality.auditBatch(junk, 1L, minPassRate = 0.5)
    assert(j.n_pass == 0L && j.alert)
    val empty = good.filter(col("doc_id") < 0L)
    val e = StreamingQuality.auditBatch(empty, 2L, minPassRate = 0.5)
    assert(e.n_docs == 0L && e.pass_rate == 0.0 && e.alert)
    // end-to-end static harness on the harness corpus: ledger ==
    // direct audit of each doc_id-mod slice
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val ledger = StreamingQuality.qualityGateStatic(spark, docs,
      nBatches = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSeq
    assert(ledger.map(_._1) == Seq(0L, 1L, 2L))
    (0 until 3).foreach { i =>
      val slice = docs.filter(pmod(col("doc_id"), lit(3L)) === i)
      val direct = StreamingQuality.auditBatch(slice, i.toLong, 0.02)
      assert(ledger(i) == ((direct.batch_id, direct.n_docs,
        direct.n_pass, direct.pass_rate, direct.mean_score,
        direct.alert)),
        s"batch $i: ledger ${ledger(i)} != direct $direct")
    }
  }

  test("streaming exact-substring dedup: two micro-batches == batch " +
      "stripDuplicateSpans on the union (the parity theorem), cross-" +
      "batch spans cut by the index probe, replay no-ops") {
    import spark.implicits._
    val landing = tmp("sl"); val ckpt = tmp("sc")
    val clean = tmp("sclean") + "/c"; val gramIdx = tmp("sgram") + "/g"
    // batch 1: an in-batch duplicated span (docs 1->2) + a clean doc
    val b1 = Seq(
      (1L, "a b c d e x1 x2"),
      (2L, "z1 a b c d e z2 z3"),
      (3L, "m1 m2 m3 m4 m5 m6"))
      .toDF("doc_id", "text")
    // batch 2: doc 10 repeats batch-1's span (index probe must cut
    // it), doc 11 repeats doc 3's full text (cut to ""), doc 12 clean
    val b2 = Seq(
      (10L, "w1 a b c d e w2"),
      (11L, "m1 m2 m3 m4 m5 m6"),
      (12L, "q1 q2 q3 q4 q5 q6"))
      .toDF("doc_id", "text")
    b1.write.mode("append").parquet(landing)
    StreamingSubstrDedup.runAvailableNow(spark, landing, clean, gramIdx,
      ckpt, b1.schema)
    b2.write.mode("append").parquet(landing)
    StreamingSubstrDedup.runAvailableNow(spark, landing, clean, gramIdx,
      ckpt, b1.schema)
    def streamed(): Map[Long, (Long, Long, String)] =
      spark.read.option("recursiveFileLookup", "true").parquet(clean)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
            r.getAs[String]("text_clean")))).toMap
    val got = streamed()
    // the parity theorem: streamed == batch over the concatenation
    val direct = TextOps.stripDuplicateSpans(b1.unionByName(b2))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text_clean")))).toMap
    assert(got == direct,
      s"streamed result diverged from the batch transform:\n$got\n$direct")
    // spot goldens: the cross-batch probe and the full-doc cut
    assert(got(10L) == ((7L, 5L, "w1 w2")))
    assert(got(11L) == ((6L, 6L, "")))
    assert(got(12L)._2 == 0L)
    // the gram index holds every distinct original-text span once
    val idx = spark.read.option("recursiveFileLookup", "true")
      .parquet(gramIdx).collect().map(_.getString(0)).toSeq
    assert(idx.distinct.size == idx.size, "index must stay gram-distinct")
    val allGrams = TextOps.spanGramTable(b1.unionByName(b2), 5)
      .select("gram").distinct().collect().map(_.getString(0)).toSet
    assert(idx.toSet == allGrams,
      "index == distinct spans of the ORIGINAL concatenated text")
    // replay idempotence: re-running batch 1's work must change nothing
    StreamingSubstrDedup.processBatch(b1, 0L, clean, gramIdx, 5)
    assert(streamed() == got, "a replayed batch must no-op")
  }

  test("streaming winnowing: union of per-batch match reports == batch " +
      "winnowMatches on the concatenation (uncapped), and a replayed " +
      "batch does not re-emit later batches' pairs") {
    import spark.implicits._
    val landing = tmp("wl"); val ckpt = tmp("wc")
    val matches = tmp("wm") + "/m"; val fpIdx = tmp("wf") + "/f"
    val run = "sierra tango uniform victor whiskey xray"
    val b1 = Seq(
      (1L, s"one two three $run four five"),
      (2L, s"p1 p2 p3 p4 $run p5 p6"),      // within-batch match of 1
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, s"z1 z2 $run z3 z4"),           // cross-batch match of 1, 2
      (11L, "n1 n2 n3 n4 n5 n6 n7 n8"))
      .toDF("doc_id", "text")
    val noCap = Long.MaxValue
    b1.write.mode("append").parquet(landing)
    StreamingWinnow.runAvailableNow(spark, landing, matches, fpIdx,
      ckpt, b1.schema, minShared = 1L, maxFpFreq = noCap)
    b2.write.mode("append").parquet(landing)
    StreamingWinnow.runAvailableNow(spark, landing, matches, fpIdx,
      ckpt, b1.schema, minShared = 1L, maxFpFreq = noCap)
    def streamed(): Map[(Long, Long), Long] =
      spark.read.option("recursiveFileLookup", "true").parquet(matches)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
          -> r.getAs[Long]("n_shared")).toMap
    val got = streamed()
    val direct = NearDup.winnowMatches(b1.unionByName(b2),
        minShared = 1L, maxFpFreq = noCap)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
        -> r.getAs[Long]("n_shared")).toMap
    assert(got == direct,
      s"streamed reports diverged from batch:\n$got\n$direct")
    assert(got.contains((1L, 2L)) && got.contains((1L, 10L)) &&
      got.contains((2L, 10L)), "within- and cross-batch pairs expected")
    // replay batch 0: the index now holds batch 1's fingerprints, but
    // strictly-earlier accumulated reads hide them, so batch 0
    // recomputes its identical report
    StreamingWinnow.processBatch(b1, 0L, matches, fpIdx, 3, 4, 1L, noCap)
    assert(streamed() == got, "a replayed batch must no-op")
  }

  test("StreamingWinnow CAPPED replay is bit-exact: a batch replayed " +
      "after later batches committed re-emits its original pairs " +
      "instead of tripping the frequency cap on the larger index") {
    import spark.implicits._
    val matches = tmp("wcm") + "/m"; val fpIdx = tmp("wcf") + "/f"
    val run = "sierra tango uniform victor whiskey xray"
    // the shared run appears in docs 1, 2 (batch 0) and 10 (batch 1):
    // at maxFpFreq = 2 the run's fingerprints are exactly at the cap
    // within batch 0 and OVER it once batch 1's copy is indexed
    val b1 = Seq(
      (1L, s"one two three $run four five"),
      (2L, s"p1 p2 p3 p4 $run p5 p6"))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, s"z1 z2 $run z3 z4")).toDF("doc_id", "text")
    StreamingWinnow.processBatch(b1, 0L, matches, fpIdx, 3, 4, 1L, 2L)
    StreamingWinnow.processBatch(b2, 1L, matches, fpIdx, 3, 4, 1L, 2L)
    def streamed(): Map[(Long, Long), Long] =
      spark.read.option("recursiveFileLookup", "true").parquet(matches)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
          -> r.getAs[Long]("n_shared")).toMap
    val got = streamed()
    assert(got.contains((1L, 2L)),
      s"batch 0 must emit its within-batch pair under the at-cap df: $got")
    // crash-retry of batch 0: with current-id-only exclusion (the r14
    // advisory's bug) the replay would see doc 10's fingerprints,
    // evaluate df = 3 > 2, cap the run out, and OVERWRITE batch=0
    // with an empty report — permanently losing (1, 2). The
    // strictly-earlier read reconstructs the original empty index.
    StreamingWinnow.processBatch(b1, 0L, matches, fpIdx, 3, 4, 1L, 2L)
    assert(streamed() == got,
      "capped replay must reproduce the original report bit-exactly")
  }
}
