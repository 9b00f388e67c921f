package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.multimodal.Multimodal
import graft.pipeline.Thumbnail

/** Multimodal binary-column pipeline through the driver surface. Media
  * bytes are generated in-process (deterministic JPEGs from the
  * pipeline's own thumbnail encoder + stub video/audio payloads, sized
  * by the documents table so the row count scales with SF); the decoded
  * per-media features are dumped to parquet (Work.oracleDump) so DuckDB
  * independently recomputes the per-kind metric union — decode itself is
  * pinned by MultimodalSpec.
  */
object MultimodalQueries {

  val imagePipeline = QueryDef("q49_image_features",
    """SELECT media_id, 'image' AS kind,
      |  CAST(width * height AS BIGINT) AS metric
      |FROM read_parquet('/tmp/graft-oracle/q49_img/*.parquet')
      |UNION ALL
      |SELECT media_id, 'video' AS kind, count(*) AS metric
      |FROM read_parquet('/tmp/graft-oracle/q49_frames/*.parquet')
      |GROUP BY media_id
      |UNION ALL
      |SELECT media_id, 'audio' AS kind, zero_crossings AS metric
      |FROM read_parquet('/tmp/graft-oracle/q49_audio/*.parquet')
      |ORDER BY kind, media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val n = math.min(graft.Tables.documents(s, d).count(), 64L).toInt
    val rows = (0 until n).map { i =>
      val kind = i % 3 match {
        case 0 => "image"; case 1 => "video"; case 2 => "audio"
      }
      val content = kind match {
        case "image" => Thumbnail.jpeg(
          Array.tabulate(16, 16)((y, x) => (y * 16 + x + i).toDouble))
        case _ => Array.tabulate[Byte](64)(b => ((b * (i + 3)) % 127).toByte)
      }
      Row(i.toLong, kind, s"$kind/x", content,
        Map("duration_ms" -> ((i + 1) * 500).toString))
    }
    val media = s.createDataFrame(
      s.sparkContext.parallelize(rows, 4), Multimodal.mediaSchema)
    val imgFeats = graft.Work.oracleDump(s, "q49_img",
      Multimodal.imageFeatures(media), d)
    val frames = graft.Work.oracleDump(s, "q49_frames",
      Multimodal.sampleFrames(media, 3).select("media_id", "frame_idx"), d)
    val audFeats = graft.Work.oracleDump(s, "q49_audio",
      Multimodal.audioFeatures(media), d)
    val img = imgFeats
      .select(col("media_id"), lit("image").as("kind"),
        (col("width") * col("height")).cast("long").as("metric"))
    val vid = frames
      .groupBy(col("media_id")).agg(count(lit(1)).as("metric"))
      .select(col("media_id"), lit("video").as("kind"), col("metric"))
    val aud = audFeats
      .select(col("media_id"), lit("audio").as("kind"),
        col("zero_crossings").as("metric"))
    img.unionByName(vid).unionByName(aud)
  }

  val all: Seq[QueryDef] = Seq(imagePipeline)
}
