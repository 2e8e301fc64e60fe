package graft.meta

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OME identifier generation — direct analog of
  * /root/reference/bioio/ome_utils.py:17-63, exposed both as Scala utils
  * (driver-side metadata) and as Column expressions (distributed).
  */
object OmeUtils {
  /** "Image:{i}" (ome_utils.py:47-63). */
  def omeImageId(idx: Long): String = s"Image:$idx"

  /** "Channel:{imageIdx}:{c}" where imageIdx strips a leading "Image:"
    * prefix if present (ome_utils.py:17-44). */
  def omeChannelId(imageId: String, channelIdx: Long): String = {
    val img = if (imageId.startsWith("Image:")) imageId.drop(6) else imageId
    s"Channel:$img:$channelIdx"
  }

  def omeChannelId(imageIdx: Long, channelIdx: Long): String =
    s"Channel:$imageIdx:$channelIdx"

  /** Column forms (codegen'd string concat, no UDF). */
  def omeImageIdCol(idx: Column): Column = concat(lit("Image:"), idx)

  def omeChannelIdCol(imageIdx: Column, channelIdx: Column): Column =
    concat(lit("Channel:"), imageIdx, lit(":"), channelIdx)
}
