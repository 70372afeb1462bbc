package graft

import java.nio.file.Files

import graft.model.{SchemaRegistry, TableId, TableMeta}
import graft.ops.Dedup
import graft.stream.{CdcStreamEngine, TableStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The two halves of the engine COMPOSE: a CDC-replicated document
  * table is the corpus input of the training-data ops, and the
  * replication stream's changed-key set is exactly the incremental
  * unit the curation layer needs — near-dup detection after a batch
  * probes only the batch's docs against the persisted band index
  * (cost ∝ batch, the [[graft.ops.Dedup.incrementalNearDuplicates]]
  * contract), never rescanning the corpus the CDC merge just
  * maintained.
  */
class CdcCurationSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))
  private val tid = TableId("srcdb", "public", "docs")

  private def spoolBatch(rows: (Long, String)*) =
    rows.toSeq.toDF("lsn_start", "payload")
      .withColumn("insert_timestamp",
        timestamp_seconds(lit(1700000000L) + col("lsn_start")))
      .withColumn("database", lit("srcdb"))
      .withColumn("xid", col("lsn_start"))
      .withColumn("xid_timestamp", col("insert_timestamp"))
      .withColumn("source_slotname", lit("slot1"))

  test("CDC-maintained corpus + incremental near-dup: batch-sized curation after replay") {
    val root = Files.createTempDirectory("graft-cur-store-").toString
    val spool = Files.createTempDirectory("graft-cur-spool-").toString
    val ckpt = Files.createTempDirectory("graft-cur-ckpt-").toString
    val registry = new SchemaRegistry
    registry.register(TableMeta(tid, docSchema, Seq("doc_id")))
    val store = new TableStore(spark, root)
    store.stage(tid, Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (3L, "y1 y2 y3 y4 y5 y6 y7 y8")).toDF("doc_id", "text"), 0L)
    store.commit(Map(tid -> 0L))
    val engine = new CdcStreamEngine(spark, registry, store)

    // the curation layer's persisted state: a band index frozen from
    // the seeded corpus version
    val params = (32, 16, 0.8)
    var index = Dedup.minhashBandIndex(store.read(tid), "doc_id", "text",
      numHashes = params._1, bands = params._2)
      .localCheckpoint()

    // CDC batch: a near-dup INSERT of doc 1 (one appended token →
    // shingle jaccard 6/7), a fresh INSERT, and an UPDATE that
    // rewrites doc 3 into a near-dup of doc 2 (same one-token-appended
    // shape, 6/7 ≥ 0.8)
    spoolBatch(
      (1L, """{"kind":"insert","schema":"public","table":"docs",
        "columnnames":["doc_id","text"],
        "columnvalues":[10,"w1 w2 w3 w4 w5 w6 w7 w8 x1"]}"""),
      (2L, """{"kind":"insert","schema":"public","table":"docs",
        "columnnames":["doc_id","text"],
        "columnvalues":[11,"q1 q2 q3 q4 q5 q6 q7 q8"]}"""),
      (3L, """{"kind":"update","schema":"public","table":"docs",
        "columnnames":["doc_id","text"],
        "columnvalues":[3,"z1 z2 z3 z4 z5 z6 z7 z8 z9"],
        "oldkeys":{"keynames":["doc_id"],"keyvalues":[3]}}"""))
      .coalesce(1).write.mode("append").parquet(spool)
    val q = engine.start(spool, ckpt)
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))

    // the replicated corpus reflects the batch
    val corpus = store.read(tid)
    assert(corpus.count() == 5L)

    // incremental curation: probe ONLY the batch's changed keys
    // against the index — the changed-key set comes straight from the
    // CDC records, no corpus diff needed
    val changedKeys = Seq(10L, 11L, 3L)
    val batchDocs = corpus.filter(col("doc_id").isin(changedKeys: _*))
    // an UPDATE retires the doc's OLD signature before re-probing —
    // otherwise doc 3's stale bands would match its own new text
    index = index.join(Seq(3L).toDF("id"), Seq("id"), "left_anti")
      .localCheckpoint()
    val pairs = Dedup.incrementalNearDuplicates(batchDocs, index,
      "doc_id", "text", params._1, params._2, params._3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // doc 10 near-dups doc 1 (shingle jaccard 6/7); the UPDATE made
    // doc 3 a near-dup of doc 2 (6/7); doc 11 is fresh — all decided
    // by the op's exact-jaccard verify, probing ONLY 3 docs
    assert(pairs.map(p => Set(p._1, p._2)) == Set(Set(1L, 10L), Set(2L, 3L)),
      pairs.toString)

    // curated view: drop the non-canonical member of each cluster —
    // the corpus the training pipeline reads
    val curated = Dedup.dedupCorpus(corpus, "doc_id", "text",
      params._1, params._2, params._3)
    assert(curated.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 11L), "keep lowest id per cluster + singletons")
  }
}
