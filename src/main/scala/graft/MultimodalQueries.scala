package graft

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal catalog entry: binary-payload plumbing exercised end to end
  * (documents → media table → partition-wise stub decode → rollup). The
  * oracle recomputes byte_len/checksum from the text in SQL — exact
  * integers, so the compare validates the whole binary path including the
  * UTF-8 encode. */
object MultimodalQueries {

  val qModalityStats = QueryDef("q_multimodal_stats",
    (spark, dir) => Multimodal.modalityStats(
      spark, Multimodal.fromDocuments(Tables.documents(spark, dir))),
    Some("""SELECT modality, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(length(text)) AS BIGINT) AS total_bytes,
           |       CAST(sum(list_sum(list_apply(string_split_regex(text, ''),
           |                                    c -> ascii(c)))) AS BIGINT)
           |         AS total_checksum
           |FROM (SELECT text,
           |        CASE CAST(doc_id % 3 AS INT)
           |          WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           |        END AS modality
           |      FROM documents)
           |GROUP BY modality ORDER BY modality""".stripMargin))

  def all: Seq[QueryDef] = Seq(qModalityStats)
}
