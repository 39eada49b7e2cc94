package graft

import java.nio.file.{Files, Paths}

import graft.flow.{E2EPipeline, PipelineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end flow smoke on a local fakeTSD-shaped CSV (FIXTURES.md §4:
  * leading unnamed index col, year, y, x1, x2) — mirrors the reference's
  * documented example run (`/root/reference/README.md:27–52`,
  * flow.py:19–52) without the network.
  */
class E2EPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeFixture(): String = {
    // deterministic LCG so the fixture is stable across runs
    var seed = 42L
    def next(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      ((seed >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val rows = (0 until 100).map { i =>
      val x1 = next(); val x2 = next()
      val y  = 2.0 * x1 - 1.0 * x2 + 0.1 * next()
      s"$i,${1920 + i},$y,$x1,$x2"
    }
    val path = Files.createTempFile("fakeTSD", ".csv")
    Files.writeString(path, "Unnamed: 0,year,y,x1,x2\n" + rows.mkString("\n"))
    path.toString
  }

  test("e2e pipeline: csv → clean → encode → cc → standardize → OLS → chart") {
    val res = E2EPipeline.run(
      spark,
      PipelineConfig(
        url = writeFixture(),
        naStrategy = "cc",
        endog = "y",
        exog = Seq("x1", "x2")))
    assert(res.data.count() == 100)
    assert(!res.data.columns.contains("unnamed:_0"))
    assert(res.model.regressors == Seq("x1", "x2"))
    // standardization rescales both sides; signs and significance survive
    assert(res.model.coef(0) > 0 && res.model.coef(1) < 0)
    assert(res.model.tstat(0) > 5 && res.model.tstat(1) < -5)
    assert(res.chartSpec.contains("boxplot"))
  }

  test("sanitized user column lists match sanitized headers") {
    val res = E2EPipeline.run(
      spark,
      PipelineConfig(
        url = writeFixture(),
        naStrategy = "cc",
        endog = " Y ",
        exog = Seq(" x1", "X2 ")))
    assert(res.model.regressors == Seq("x1", "x2"))
  }

  test("retrieve_data reads CSV over http (reference test_flow.py:9 shape, egress-free)") {
    // serve the fixture from a loopback HttpServer — same entry point the
    // reference exercises with a live URL, no network needed
    val csv    = Files.readString(Paths.get(writeFixture()))
    val server = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/data.csv",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = csv.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "text/csv")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.csv"
      val df  = E2EPipeline.retrieveData(spark, url)
      assert(df.count() == 100)
      assert(df.columns.toSeq == Seq("year", "y", "x1", "x2")) // Unnamed dropped
      val limited = E2EPipeline.retrieveData(spark, url, nrows = Some(7))
      assert(limited.count() == 7)
    } finally server.stop(0)
  }
}
