package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The Spark-side plumbing is real — binary column, metadata schema,
  * partition-wise typed decode via `mapPartitions` (the Scala analog of a
  * batch `mapInPandas` decode: opaque per-record compute that runs inside
  * each partition, embarrassingly parallel, no shuffle) — while the media
  * decode itself is a clearly-marked STUB (`FakeDecoder`): the real codec
  * libraries are not in this container, so it derives deterministic fake
  * width/height/frame values from the payload size. Swap `FakeDecoder.decode`
  * for a real codec and nothing else changes.
  *
  * The test corpus has no binary table, so `withBlob` materialises the
  * documents' text as UTF-8 bytes — the plumbing (schema, batching,
  * partitioning) is what is under test, not the codec.
  */
object Mm {

  case class MmBlob(doc_id: Long, blob: Array[Byte])
  case class MmMeta(doc_id: Long, blob_bytes: Long, blob_md5: String,
                    n_chunks: Long, decoded_w: Long, decoded_h: Long, frames: Long)

  /** STUB decoder: deterministic fake dimensions from payload size. A real
    * deployment replaces this object with an actual image/audio decoder.
    */
  object FakeDecoder {
    def decode(blob: Array[Byte]): (Long, Long, Long) = {
      val n = blob.length.toLong
      (64 + n % 512, 64 + (n * 7) % 512, 1 + n % 8)
    }
  }

  /** Attach the opaque binary payload column (here: UTF-8 of `textCol`). */
  def withBlob(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("bigint").as("doc_id"),
      col(textCol).cast("binary").as("blob"))

  /** Partition-wise typed decode: one decoder instance per partition (the
    * expensive-init pattern for real codecs), rows streamed through it.
    * chunkBytes models the storage chunking of large payloads.
    */
  def decodeMeta(blobs: DataFrame, chunkBytes: Int): Dataset[MmMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.as[MmBlob].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val hex = md.digest(r.blob).map("%02x".format(_)).mkString
        val bytes = r.blob.length.toLong
        val (w, h, f) = FakeDecoder.decode(r.blob)
        MmMeta(r.doc_id, bytes, hex, (bytes + chunkBytes - 1) / chunkBytes, w, h, f)
      }
    }
  }

  /** Chunk table: one row per fixed-size slice of each payload — the
    * storage layout for large media (each chunk separately addressable /
    * hashable). Pure expressions: sequence + binary substring, no UDF.
    */
  def chunkTable(blobs: DataFrame, chunkBytes: Int): DataFrame =
    blobs
      .withColumn("ci", explode(expr(
        s"sequence(0, CAST((octet_length(blob) + ${chunkBytes - 1}) / $chunkBytes AS INT) - 1)")))
      .select(col("doc_id"), col("ci").cast("bigint").as("ci"),
        expr(s"octet_length(substring(blob, ci * $chunkBytes + 1, $chunkBytes))")
          .cast("bigint").as("chunk_bytes"),
        expr(s"md5(substring(blob, ci * $chunkBytes + 1, $chunkBytes))").as("chunk_md5"))

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> ((s, d) =>
      decodeMeta(withBlob(Tables.documents(s, d), "doc_id", "text"), chunkBytes = 256)
        .toDF().orderBy("doc_id")),

    "mm_chunks" -> ((s, d) =>
      chunkTable(withBlob(Tables.documents(s, d), "doc_id", "text"), chunkBytes = 64)
        .orderBy("doc_id", "ci"))
  )

  val oracles: Map[String, String] = Map(
    // mirrors FakeDecoder: the fake decode is integer arithmetic on the
    // payload size, so the oracle can recompute it
    "mm_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS blob_bytes, md5(text) AS blob_md5, (octet_length(encode(text)) + 255) // 256 AS n_chunks, 64 + octet_length(encode(text)) % 512 AS decoded_w, 64 + (octet_length(encode(text)) * 7) % 512 AS decoded_h, 1 + octet_length(encode(text)) % 8 AS frames FROM documents ORDER BY doc_id""",
    // DuckDB lacks BLOB substring; the corpus is ASCII so char slices of
    // the VARCHAR are byte-identical to the engine's binary slices
    "mm_chunks" ->
      """WITH c AS (SELECT doc_id, unnest(range(0, ((length(text) + 63) // 64)::INT)) AS ci, text FROM documents) SELECT doc_id, ci::BIGINT AS ci, length(substr(text, (ci * 64 + 1)::INT, 64))::BIGINT AS chunk_bytes, md5(substr(text, (ci * 64 + 1)::INT, 64)) AS chunk_md5 FROM c ORDER BY doc_id, ci"""
  )
}
