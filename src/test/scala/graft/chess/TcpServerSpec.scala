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
}
