package graft.plugins

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer

import graft.{BioSpark, SparkSpec}
import graft.core.NDArray

/** S9 remote-scheme evidence: the registry's readers resolve sources via
  * `FileSystem.get(uri)` (the fsspec analog), so any Hadoop-registered
  * scheme works unchanged. file:// is exercised everywhere; this spec
  * pins http:// end-to-end against an in-JVM HTTP server — the
  * read-only remote case (Hadoop's HttpFileSystem, HADOOP-14383). */
class HttpReadSpec extends SparkSpec {

  test("BioSpark.open reads a PNG over http:// through plugin resolution") {
    // a formulaic PNG on local disk, then served over HTTP
    val arr = NDArray.tabulate(Seq(4, 5))(idx => idx(0) * 10.0 + idx(1))
    val dir = Files.createTempDirectory("graft-http")
    val png = dir.resolve("img.png").toString
    BioSpark.fromArray(spark, arr).save(png)
    val bytes = Files.readAllBytes(dir.resolve("img.png"))

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/img.png", exchange => {
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      try exchange.getResponseBody.write(bytes)
      finally exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/img.png"
      val back = BioSpark.open(spark, url)
      assert(back.reader.name == "ImageIoReader")
      assert(back.dims.shape == Seq(1, 1, 1, 4, 5))
      val nd = back.getImageData("YX")
      for (y <- 0 until 4; x <- 0 until 5)
        assert(nd.array(y, x) == y * 10.0 + x, s"($y,$x)")
    } finally server.stop(0)
  }
}
