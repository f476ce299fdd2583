package graft.model

import java.sql.Timestamp

/** The store row — field-for-field the reference's record shape
  * (vector_db.py:260-273: doc_name, doc_type, page_num, content_type,
  * content_id, content_raw, embedding, file_hash, timestamp, bbox).
  * Embeddings are double (exact float upcast, oracle-stable math);
  * bbox holds the chunk's character range in this text-corpus build
  * (page-coordinate boxes for real PDF/PPTX sources).
  */
case class VectorRecord(
    doc_name: String,
    doc_type: String,
    page_num: Long,
    content_type: String,
    content_id: String,
    content_raw: String,
    embedding: Seq[Double],
    file_hash: String,
    ts: Timestamp,
    bbox: Seq[Double])

object ContentTypes {
  val TextChunk = "text_chunk"
  val Image = "image"
  val ImageCaption = "image_caption"
}
