package graft.chess

import graft.SparkTestBase
import org.json4s._
import org.json4s.jackson.JsonMethods

/** S8 socket transport: a real TCP round-trip against the serve loop. */
class TcpServerSpec extends SparkTestBase {
  import spark.implicits._
  implicit private val fmts: Formats = DefaultFormats

  test("TCP round-trip: request line in, response line out") {
    val agg = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark,
        ChessIngest.parseGames(spark, spark.createDataset(Seq(SampleGames.pgn)),
          Core.Level.Human))).cache()
    agg.count()
    val port = {
      val probe = new java.net.ServerSocket(0)
      try probe.getLocalPort finally probe.close()
    }
    val serverThread = new Thread(() =>
      ChessServer.serveTcp(spark, agg, port, maxRequests = 2))
    serverThread.setDaemon(true)
    serverThread.start()

    // wait for the listener, then speak the protocol
    var sock: java.net.Socket = null
    var tries = 0
    while (sock == null && tries < 50) {
      try sock = new java.net.Socket("127.0.0.1", port)
      catch { case _: java.net.ConnectException => Thread.sleep(100); tries += 1 }
    }
    assert(sock != null, "server socket never came up")
    try {
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      out.println(s"""{"token":"tcp1","query":{"positions":[{"fen":"${Position.StartFen}"}],"fetchChildren":false}}""")
      val resp = JsonMethods.parse(in.readLine())
      assert((resp \ "token").extract[String] == "tcp1")
      out.println("""{"not":"a valid request"}""")
      val err = in.readLine()
      assert(err.contains("error"), s"malformed request must yield error line, got $err")
    } finally sock.close()
    serverThread.join(10000)
    assert(!serverThread.isAlive, "server should stop after maxRequests")
  }

  test("concurrent clients: mixed explore/retraction/batch load, responses isolated") {
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val agg = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark, games)).cache()
    agg.count()
    // the GUI's request mix: root explore, child fetch, filtered
    // explore, a multi-position batch, a retraction probe (stored and
    // synthesized) — each line tagged with its own token
    val e2e4 = "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0 1"
    val lines = Seq(
      s"""{"token":"root","query":{"positions":[{"fen":"${Position.StartFen}"}],"fetchChildren":true}}""",
      s"""{"token":"noch","query":{"positions":[{"fen":"${Position.StartFen}"}],"fetchChildren":false}}""",
      s"""{"token":"mv","query":{"positions":[{"fen":"${Position.StartFen}","move":"e2e4"}],"fetchChildren":true}}""",
      s"""{"token":"filt","query":{"positions":[{"fen":"$e2e4"}],"levels":["human"],"results":["w","d"],"fetchChildren":false}}""",
      s"""{"token":"batch","query":{"positions":[{"fen":"${Position.StartFen}"},{"fen":"$e2e4"},{"fen":"${Position.StartFen}","move":"d2d4"}],"fetchChildren":true}}""",
      s"""{"token":"retr","retractions":{"fen":"$e2e4","synthesize":true}}""")
    // single-threaded reference responses — concurrency must change
    // NOTHING about any individual answer
    val expected = lines.map(l =>
      l -> ChessServer.handle(spark, agg, l, Some(games))).toMap
    val (rps, responses) =
      ChessServer.throughput(spark, agg, lines, clients = 8, perClient = 12,
        games = Some(games))
    responses.zipWithIndex.foreach { case (rs, c) =>
      assert(rs.size == 12, s"client $c lost responses")
      rs.zipWithIndex.foreach { case (resp, i) =>
        val sent = lines((c + i * 8) % lines.size)
        assert(resp == expected(sent),
          s"client $c request $i: response does not match its request " +
            s"(cross-talk or nondeterminism)\nsent: $sent\ngot:  $resp")
      }
    }
    assert(rps > 0, "throughput probe must report a positive rate")
    info(f"concurrent server throughput: $rps%.1f req/s (8 clients x 12 requests)")
  }
}
