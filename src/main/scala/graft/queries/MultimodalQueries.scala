package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.multimodal.Multimodal
import graft.pipeline.Thumbnail

/** Multimodal binary-column pipeline through the driver surface
  * (rows-only: media bytes are generated in-process; exact values are
  * pinned by MultimodalSpec). Corpus: deterministic JPEGs from the
  * pipeline's own thumbnail encoder + stub video/audio payloads, sized
  * by the documents table so the row count scales with SF.
  */
object MultimodalQueries {

  val imagePipeline = QueryDef.rowsOnly("q49_image_features") { (s, d) =>
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
    val img = Multimodal.imageFeatures(media)
      .select(col("media_id"), lit("image").as("kind"),
        (col("width") * col("height")).cast("long").as("metric"))
    val vid = Multimodal.sampleFrames(media, 3)
      .groupBy(col("media_id")).agg(count(lit(1)).as("metric"))
      .select(col("media_id"), lit("video").as("kind"), col("metric"))
    val aud = Multimodal.audioFeatures(media)
      .select(col("media_id"), lit("audio").as("kind"),
        col("zero_crossings").as("metric"))
    img.unionByName(vid).unionByName(aud)
  }

  val all: Seq[QueryDef] = Seq(imagePipeline)
}
