package graft.streaming

import graft.{PipelineQueries, SparkSpec}

/** The live-crawl dedup row: new docs replayed as a multi-micro-batch
  * stream (4-file fixture, maxFilesPerTrigger=1), each batch deduped
  * against the persisted reference signatures. The union of per-batch
  * outputs must equal the batch stored-incremental run bit-for-bit —
  * that identity is what lets the row share the batch row's oracle.
  */
class StreamDedupRefSpec extends SparkSpec {

  test("streaming incremental dedup equals the batch stored run") {
    val d = "/root/testdata/sf0.001"
    val streamed =
      PipelineQueries.queries("stream_dedup_ref")(spark, d).collect().toSeq
    val batch =
      PipelineQueries.queries("dedup_against_ref_stored")(spark, d).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }
}
