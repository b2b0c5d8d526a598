package graft.chess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON query protocol (SURVEY.md §2.1 S8, §3.2; role of the reference's
  * TCP server + `Query.h` Request/Response used by the companion GUI).
  *
  * v1 transport is CLI/file line-in line-out (the TCP loop is a thin
  * wrapper to add later — the protocol codec and execution path are the
  * substance). Request:
  * {{{
  * {"token":"t1","query":{
  *   "positions":[{"fen":"...","move":"e2e4"?}, ...],
  *   "levels":["human","engine","server"]?,
  *   "results":["w","l","d"]?,
  *   "fetchChildren":true?}}
  * }}}
  * Response: per position -> per select -> per level -> per result
  * counts (+eloDiffSum, first/last gameId), and per child move the same,
  * mirroring the reference's nested response the GUI consumes.
  *
  * Execution: ONE Spark job for the whole request batch — all probe
  * keys (roots + children) go into a single broadcast join against the
  * agg store (J1), then the driver nests the few returned rows.
  */
object ChessServer {
  implicit private val fmts: Formats = DefaultFormats

  case class ReqPosition(fen: String, move: Option[String])
  case class Request(token: String, positions: Seq[ReqPosition],
                     levels: Seq[String], results: Seq[String],
                     fetchChildren: Boolean,
                     fetchFirstGame: Boolean = false,
                     fetchLastGame: Boolean = false)

  private val levelNames = Map("human" -> Core.Level.Human,
    "engine" -> Core.Level.Engine, "server" -> Core.Level.Server)
  private val levelBack = levelNames.map(_.swap)
  private val resultNames = Map("w" -> Core.Result.WhiteWin,
    "l" -> Core.Result.BlackWin, "d" -> Core.Result.Draw)
  private val resultBack = resultNames.map(_.swap)

  def parseRequest(json: String): Request = {
    val j = JsonMethods.parse(json)
    val q = j \ "query"
    // a structurally-wrong request must error, not yield an empty
    // response — json4s maps missing keys to empty collections.
    if (q == JNothing)
      throw new IllegalArgumentException("request has no 'query' object")
    if ((q \ "positions") == JNothing)
      throw new IllegalArgumentException("query has no 'positions' array")
    // json4s extracts a MISSING key as Seq() for Seq[String], so
    // extractOrElse never falls back — test JNothing explicitly.
    def seqOr(v: JValue, default: Seq[String]): Seq[String] = v match {
      case JNothing => default
      case other => other.extract[Seq[String]]
    }
    Request(
      token = (j \ "token").extractOrElse[String](""),
      positions = (q \ "positions").extract[Seq[JValue]].map { p =>
        ReqPosition((p \ "fen").extract[String], (p \ "move").extractOpt[String])
      },
      levels = seqOr(q \ "levels", levelNames.keys.toSeq),
      results = seqOr(q \ "results", resultNames.keys.toSeq),
      fetchChildren = flag(q, "fetchChildren", default = true),
      fetchFirstGame = flag(q, "fetchFirstGame", default = false),
      fetchLastGame = flag(q, "fetchLastGame", default = false))
  }

  /** Flags are accepted flat (`query.fetchChildren`) or in the
    * reference GUI's nested shape (`query.fetchingOptions.<select>.
    * fetchChildren` — OR across selects, since we always return both
    * select classes in one pass). */
  private def flag(q: JValue, name: String, default: Boolean): Boolean =
    (q \ name) match {
      case JBool(b) => b
      case _ =>
        (q \ "fetchingOptions") match {
          case JObject(fields) =>
            val set = fields.exists { case (_, v) => (v \ name) == JBool(true) }
            val unset = fields.nonEmpty &&
              fields.forall { case (_, v) => (v \ name) == JNothing }
            if (set) true else if (unset) default else false
          case _ => default
        }
    }

  /** Execute a request against the agg store; returns the response as a
    * JSON string. Pass `games` to honor fetchFirstGame/fetchLastGame
    * (J2 header join). */
  def execute(spark: SparkSession, positionsAgg: DataFrame, req: Request,
              games: Option[org.apache.spark.sql.Dataset[ChessIngest.GameRow]] = None): String = {
    import org.apache.spark.sql.functions._
    val levelSet = req.levels.flatMap(levelNames.get)
    val resultSet = req.results.flatMap(resultNames.get)
    val probes = req.positions.map(p => p.fen -> p.move)

    val explored = QueryEngine.explore(spark, positionsAgg, probes)
      .filter(col("level").isin(levelSet.map(_.toInt): _*) &&
              col("result").isin(resultSet.map(_.toInt): _*))
    val wantHeaders = (req.fetchFirstGame || req.fetchLastGame) && games.isDefined
    val rows = (if (wantHeaders) QueryEngine.withHeaders(explored, games.get)
                else explored).collect()

    def hdrJson(r: org.apache.spark.sql.Row, field: String): List[(String, JValue)] =
      if (!wantHeaders || r.schema.fieldNames.contains(field) == false) Nil
      else Option(r.getAs[org.apache.spark.sql.Row](field)).toList.map { h =>
        field -> JObject(List(
          "event" -> JString(h.getAs[String]("event")),
          "date" -> JString(h.getAs[String]("date")),
          "white" -> JString(h.getAs[String]("white")),
          "black" -> JString(h.getAs[String]("black")),
          "whiteElo" -> JInt(h.getAs[Int]("whiteElo")),
          "blackElo" -> JInt(h.getAs[Int]("blackElo")),
          "result" -> JString(resultBack(h.getAs[Byte]("result"))),
          "eco" -> JString(h.getAs[String]("eco"))))
      }

    // driver-side nesting of the (small) aggregated result
    def statsJson(rs: Seq[org.apache.spark.sql.Row]): JValue =
      JObject(rs.groupBy(_.getAs[String]("select")).toList.sortBy(_._1).map {
        case (sel, perSel) =>
          sel -> JObject(perSel.groupBy(_.getAs[Byte]("level")).toList
            .sortBy(_._1).map { case (lv, perLv) =>
              levelBack(lv) -> JObject(perLv.groupBy(_.getAs[Byte]("result"))
                .toList.sortBy(_._1).map { case (rz, perR) =>
                  val firstRow = perR.minBy(_.getAs[Long]("firstGameId"))
                  val lastRow = perR.maxBy(_.getAs[Long]("lastGameId"))
                  resultBack(rz) -> JObject(List(
                    "count" -> JLong(perR.map(_.getAs[Long]("games")).sum),
                    "eloDiffSum" -> JLong(perR.map(_.getAs[Long]("eloDiffSum")).sum),
                    "firstGameId" -> JLong(firstRow.getAs[Long]("firstGameId")),
                    "lastGameId" -> JLong(lastRow.getAs[Long]("lastGameId"))) ++
                    (if (req.fetchFirstGame) hdrJson(firstRow, "firstGame") else Nil) ++
                    (if (req.fetchLastGame) hdrJson(lastRow, "lastGame") else Nil))
                })
            })
      })

    // each request entry resolves by its batch index, not its FEN — a
    // batch may repeat one FEN with different 'move' values and those
    // must not merge
    val results = req.positions.zipWithIndex.map { case (p, idx) =>
      val mine = rows.filter(_.getAs[Int]("probeIdx") == idx)
      val root = mine.filter(_.getAs[String]("childUci") == "")
      val children =
        if (!req.fetchChildren) JNothing
        else JObject(mine.filter(_.getAs[String]("childUci") != "")
          .groupBy(_.getAs[String]("childUci")).toList.sortBy(_._1)
          .map { case (uci, rs) => uci -> statsJson(rs.toSeq) })
      JObject(List(
        "fen" -> JString(p.fen)) ++
        p.move.map(m => "move" -> JString(m)).toList ++ List(
        "stats" -> statsJson(root.toSeq),
        "children" -> children))
    }
    JsonMethods.compact(JsonMethods.render(
      JObject(List("token" -> JString(req.token), "results" -> JArray(results.toList)))))
  }

  /** Serve line-delimited JSON over TCP (the reference's GUI transport):
    * one response line per request line, connection-per-client loop. */
  def serveTcp(spark: SparkSession, positionsAgg: DataFrame, port: Int,
               maxRequests: Long = Long.MaxValue,
               games: Option[org.apache.spark.sql.Dataset[ChessIngest.GameRow]] = None): Unit = {
    val server = new java.net.ServerSocket(port)
    try {
      var served = 0L
      while (served < maxRequests) {
        val sock = server.accept()
        try {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          val out = new java.io.PrintWriter(
            new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
          var line = in.readLine()
          while (line != null && served < maxRequests) {
            if (line.trim.nonEmpty) {
              val resp = try execute(spark, positionsAgg, parseRequest(line), games) catch {
                case e: Exception =>
                  s"""{"error":${JsonMethods.compact(JsonMethods.render(JString(e.getMessage)))}}"""
              }
              out.println(resp)
              served += 1
            }
            line = if (served < maxRequests) in.readLine() else null
          }
        } finally sock.close()
      }
    } finally server.close()
  }

  /** CLI loop: line-delimited JSON requests on stdin (or a file arg),
    * responses on stdout; `--tcp <port>` serves the reference's socket
    * transport instead. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // default corpus: embedded sample games; trailing arg may point at a
    // PGN file
    val pgnArg = args.drop(if (args.headOption.contains("--tcp")) 2 else 1)
    val pgn = pgnArg.headOption.map(p =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
      .getOrElse(SampleGames.pgn)
    val games = ChessIngest.parseGames(spark, spark.createDataset(Seq(pgn)),
      Core.Level.Human)
    val agg = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark, games)).cache()
    if (args.headOption.contains("--tcp")) {
      serveTcp(spark, agg, args(1).toInt, games = Some(games))
      spark.stop()
      return
    }
    val in: Iterator[String] =
      if (args.nonEmpty && args(0) != "-")
        scala.io.Source.fromFile(args(0)).getLines()
      else scala.io.Source.stdin.getLines()
    in.filter(_.trim.nonEmpty).foreach { line =>
      val out = try execute(spark, agg, parseRequest(line), Some(games)) catch {
        case e: Exception =>
          s"""{"error":${JsonMethods.compact(JsonMethods.render(JString(e.getMessage)))}}"""
      }
      println(out)
    }
    spark.stop()
  }
}
