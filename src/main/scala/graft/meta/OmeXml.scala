package graft.meta

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import javax.xml.parsers.DocumentBuilderFactory

import org.w3c.dom.Element

import graft.core.PixelType

/** Minimal OME data model + XML emit/parse — the analog of the reference's
  * `ome_metadata` surface (/root/reference/bioio/bio_image.py:1021-1036).
  * The reference's own bar for generated OME is "valid but not complete"
  * (bio_image.py:1026-1030); this model covers Image/Pixels/Channel with
  * the size, physical-size and time-increment attributes the engine
  * round-trips through its OME-TIFF reader/writer.
  */
final case class OmeChannel(
    id: String,
    name: Option[String],
    samplesPerPixel: Int = 1)

final case class OmePixels(
    id: String,
    dimensionOrder: String, // e.g. "XYZCT" (storage order, X fastest)
    pixelType: String, // OME type string: uint8, int16, float, double, …
    sizeX: Long,
    sizeY: Long,
    sizeZ: Long,
    sizeC: Long,
    sizeT: Long,
    physicalSizeX: Option[Double],
    physicalSizeY: Option[Double],
    physicalSizeZ: Option[Double],
    timeIncrement: Option[Double],
    channels: Seq[OmeChannel])

final case class OmeImage(id: String, name: String, pixels: OmePixels)

final case class OME(images: Seq[OmeImage])

object OmeXml {
  val Namespace = "http://www.openmicroscopy.org/Schemas/OME/2016-06"

  /** OME PixelType attribute string ↔ engine PixelType. */
  val omeTypeOf: Map[PixelType.Value, String] = Map(
    PixelType.Int8 -> "int8", PixelType.Int16 -> "int16",
    PixelType.Int32 -> "int32", PixelType.UInt8 -> "uint8",
    PixelType.UInt16 -> "uint16", PixelType.UInt32 -> "uint32",
    PixelType.Float32 -> "float", PixelType.Float64 -> "double",
    PixelType.Complex64 -> "complex", PixelType.Complex128 -> "double-complex")

  val pixelTypeOf: Map[String, PixelType.Value] =
    omeTypeOf.map(_.swap)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Emit OME-XML (the ImageDescription payload of an OME-TIFF). */
  def toXml(ome: OME): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
    sb ++= s"""<OME xmlns="$Namespace">"""
    ome.images.foreach { img =>
      sb ++= s"""<Image ID="${esc(img.id)}" Name="${esc(img.name)}">"""
      val p = img.pixels
      sb ++= s"""<Pixels ID="${esc(p.id)}" DimensionOrder="${p.dimensionOrder}"""" +
        s""" Type="${p.pixelType}" SizeX="${p.sizeX}" SizeY="${p.sizeY}"""" +
        s""" SizeZ="${p.sizeZ}" SizeC="${p.sizeC}" SizeT="${p.sizeT}""""
      p.physicalSizeX.foreach(v => sb ++= s""" PhysicalSizeX="$v"""")
      p.physicalSizeY.foreach(v => sb ++= s""" PhysicalSizeY="$v"""")
      p.physicalSizeZ.foreach(v => sb ++= s""" PhysicalSizeZ="$v"""")
      p.timeIncrement.foreach(v => sb ++= s""" TimeIncrement="$v"""")
      sb ++= ">"
      p.channels.foreach { c =>
        sb ++= s"""<Channel ID="${esc(c.id)}""""
        c.name.foreach(n => sb ++= s""" Name="${esc(n)}"""")
        sb ++= s""" SamplesPerPixel="${c.samplesPerPixel}"/>"""
      }
      sb ++= s"""<TiffData PlaneCount="${p.sizeT * p.sizeC * p.sizeZ}"/>"""
      sb ++= "</Pixels></Image>"
    }
    sb ++= "</OME>"
    sb.toString
  }

  /** Parse OME-XML (namespace-tolerant; unknown elements ignored). */
  def fromXml(xml: String): OME = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // no external entity resolution — the payload is data, not a document
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    val imgs = doc.getElementsByTagNameNS("*", "Image")
    val images = (0 until imgs.getLength).map { i =>
      val img = imgs.item(i).asInstanceOf[Element]
      val px = img.getElementsByTagNameNS("*", "Pixels").item(0)
        .asInstanceOf[Element]
      def attr(e: Element, a: String): Option[String] =
        Option(e.getAttribute(a)).filter(_.nonEmpty)
      val chans = px.getElementsByTagNameNS("*", "Channel")
      val channels = (0 until chans.getLength).map { c =>
        val ch = chans.item(c).asInstanceOf[Element]
        OmeChannel(ch.getAttribute("ID"), attr(ch, "Name"),
          attr(ch, "SamplesPerPixel").map(_.toInt).getOrElse(1))
      }
      OmeImage(
        id = img.getAttribute("ID"),
        name = attr(img, "Name").getOrElse(img.getAttribute("ID")),
        pixels = OmePixels(
          id = px.getAttribute("ID"),
          dimensionOrder = attr(px, "DimensionOrder").getOrElse("XYZCT"),
          pixelType = px.getAttribute("Type"),
          sizeX = px.getAttribute("SizeX").toLong,
          sizeY = px.getAttribute("SizeY").toLong,
          sizeZ = attr(px, "SizeZ").map(_.toLong).getOrElse(1L),
          sizeC = attr(px, "SizeC").map(_.toLong).getOrElse(1L),
          sizeT = attr(px, "SizeT").map(_.toLong).getOrElse(1L),
          physicalSizeX = attr(px, "PhysicalSizeX").map(_.toDouble),
          physicalSizeY = attr(px, "PhysicalSizeY").map(_.toDouble),
          physicalSizeZ = attr(px, "PhysicalSizeZ").map(_.toDouble),
          timeIncrement = attr(px, "TimeIncrement").map(_.toDouble),
          channels = channels))
    }
    OME(images)
  }
}
