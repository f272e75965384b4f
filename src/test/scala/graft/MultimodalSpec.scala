package graft

import org.apache.spark.sql.functions._
import graft.queries.Multimodal
import graft.queries.Multimodal.{MediaRecord, MediaFeatures}

/** M7 — the rows-only parts of the multimodal tier get their real check
  * here: the batched extractor's output is re-derived independently in
  * plain Scala and compared record-for-record. */
class MultimodalSpec extends SparkSpec {

  test("feature extractor matches an independent byte-level recomputation") {
    val feats = Multimodal.qMediaFeatures(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_bytes"), r.getAs[Double]("mean_byte"), r.getAs[String]("hist_csv"))))
      .toMap
    val docs = graft.io.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(feats.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val hist = new Array[Long](8)
      bytes.foreach(b => hist((b & 0xFF) >> 5) += 1)
      val mean = math.round(bytes.map(_ & 0xFF).map(_.toLong).sum.toDouble / bytes.length * 1e6) / 1e6
      val (n, m, h) = feats(id)
      assert(n == bytes.length, s"doc $id n_bytes")
      assert(m == mean, s"doc $id mean_byte")
      assert(h == hist.mkString(","), s"doc $id histogram")
    }
  }

  test("extractor is iterator-disciplined and batch-shaped (no partition materialization)") {
    import spark.implicits._
    // a partition larger than one decode batch still streams through
    val recs = (1L to 200L).map(i =>
      MediaRecord(i, "image", Array.fill(8)((i % 251).toByte))).toDS().repartition(2)
    val out = Multimodal.extractFeatures(recs).collect()
    assert(out.length == 200)
    assert(out.forall(_.n_bytes == 8))
  }

  test("frame sampling yields ceil(len/64) digests per doc, idx dense from 0") {
    val rows = Multimodal.qFrameSample(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), min("frame_idx").as("lo"),
        max("frame_idx").as("hi")).collect()
    val lens = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("len")).toMap
    rows.foreach { r =>
      val want = (lens(r.getAs[Long]("doc_id")) - 1) / 64 + 1
      assert(r.getAs[Long]("n") == want)
      assert(r.getAs[Int]("lo") == 0 && r.getAs[Int]("hi") == want - 1)
    }
  }
}
