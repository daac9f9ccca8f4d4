package graft.chat

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files
import java.time.LocalDate

/** Property-based differential test (SURVEY.md §5.2): random chat files are
  * run through BOTH the Spark pipeline and an independent plain-Scala
  * simulator of the reference's analyze loop (backend/main.py:281-325).
  * Graph equality + structural invariants must hold on every sample
  * (fixed seeds — deterministic CI).
  */
class NetworkPropertySpec extends SparkSpec {

  // --- independent reference simulator (direct transcription of the loop) ---
  private def simulate(lines: Seq[String], start: Option[LocalDate],
      end: Option[LocalDate], limit: Option[Int]): (Set[String], Map[(String, String), Long]) = {
    var prev: Option[String] = None
    var count = 0
    val nodes = scala.collection.mutable.Set[String]()
    val edges = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val lim = limit.getOrElse(0)
    for (line <- lines) {
      if (lim > 0 && count >= lim) ()
      else if (line.contains("הושמט")) ()
      else if (!(line.startsWith("[") && line.contains("]") && line.contains(": "))) ()
      else {
        val parts = line.split("\\] ", 2)
        val dateStr = parts(0).dropWhile(c => c == '[' || c == ']')
          .reverse.dropWhile(c => c == '[' || c == ']').reverse.split(",")(0)
        parseDate(dateStr) match {
          case None => ()
          case Some(d) =>
            val inRange = (start, end) match {
              case (Some(s), Some(e)) => !d.isBefore(s) && !d.isAfter(e)
              case _ => true
            }
            if (inRange) {
              val sender = parts(1).split(":")(0)
                .replaceAll("^~+|~+$", "").replace(" ", "").trim
              if (sender.nonEmpty) {
                nodes += sender
                prev.foreach { p =>
                  if (p != sender) {
                    val k = if (p < sender) (p, sender) else (sender, p)
                    edges(k) += 1L
                  }
                }
                prev = Some(sender)
                count += 1
              }
            }
        }
      }
    }
    (nodes.toSet, edges.toMap)
  }

  private def parseDate(s: String): Option[LocalDate] =
    try {
      val p = s.trim.split("\\.")
      if (p.length != 3) None
      else Some(LocalDate.of(p(2).toInt, p(1).toInt, p(0).toInt))
    } catch { case _: Exception => None }

  // --- generators ---
  private val senders = Gen.oneOf("Ann", "Bob", "~ Dana C ", "🦋", "אבי", "Eve~")
  private val validLine = for {
    s <- senders
    day <- Gen.choose(1, 28)
    month <- Gen.choose(9, 11)
    msg <- Gen.oneOf("hi", "ok then", "x: y", "word word")
  } yield s"[$day.$month.2023, 10:00:00] $s: $msg"
  private val junkLine = Gen.oneOf(
    "no brackets here",
    "[7.10.2023, 10:00:00] תמונה הושמטה",
    "[99.99.2023, 10:00:00] Ghost: invalid date",
    "[7.10.2023, 10:00:00] : empty sender",
    "[7.10.2023] missing colon-space")
  private val chatGen: Gen[List[String]] =
    Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(4 -> validLine, 1 -> junkLine)))

  // --- upload-dialect simulator (backend/main.py:363-378 transcription) ---
  private val uploadRe = java.util.regex.Pattern.compile(
    "^\\[([^\\]]+)\\]\\s*([^:]+):\\s*(.+)")
  private def simulateUpload(lines: Seq[String]): (Option[String], Seq[String]) = {
    var group: Option[String] = None
    val senders = scala.collection.mutable.ArrayBuffer[String]()
    for (line <- lines) {
      val m = uploadRe.matcher(line)
      if (m.find() && m.start() == 0) {
        val sender = m.group(2)
        if (group.isEmpty) group = Some(sender) // first match defines & is dropped
        else if (sender != group.get) senders += sender
      }
    }
    (group, senders.toSeq)
  }

  test("upload dialect == reference simulator (group-name state machine)") {
    val params = Gen.Parameters.default
    for (seed <- 100 until 106) {
      val lines = chatGen(params, Seed(seed.toLong)).get
      val dir = Files.createTempDirectory("graft_prop_up")
      val f = dir.resolve("c.txt")
      Files.writeString(f, lines.mkString("", "\n", "\n"))
      val up = ChatParser.uploadDialect(ChatLines.read(spark, f.toString))
      val rows = up.orderBy("date_time", "sender").collect()
      val (wantGroup, wantSenders) = simulateUpload(lines)
      wantGroup match {
        case None => assert(rows.isEmpty)
        case Some(g) =>
          assert(rows.forall(_.getAs[String]("group_name") == g), s"seed=$seed")
          assert(rows.map(_.getAs[String]("sender")).sorted.toSeq ==
            wantSenders.sorted, s"seed=$seed\n${lines.mkString("\n")}")
      }
    }
  }

  test("Spark graph == reference simulator on random chats (all branches)") {
    val params = Gen.Parameters.default
    for (seed <- 0 until 8) {
      val lines = chatGen(params, Seed(seed.toLong)).get
      val limit = if (seed % 3 == 0) Some(seed + 2) else None
      val (start, end) =
        if (seed % 2 == 0) (Some(LocalDate.of(2023, 10, 1)), Some(LocalDate.of(2023, 10, 28)))
        else (None, None)

      val dir = Files.createTempDirectory("graft_prop")
      val f = dir.resolve("c.txt")
      Files.writeString(f, lines.mkString("", "\n", "\n"))
      val g = Network.analyzeFile(spark, f.toString, start, end, limit)

      val (wantNodes, wantEdges) = simulate(lines, start, end, limit)
      val gotNodes = g.nodes.collect().map(_.getString(0)).toSet
      val gotEdges = g.links.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

      assert(gotNodes == wantNodes, s"nodes mismatch seed=$seed\n${lines.mkString("\n")}")
      assert(gotEdges == wantEdges, s"edges mismatch seed=$seed\n${lines.mkString("\n")}")
      gotEdges.keys.foreach { case (a, b) =>
        assert(a < b, "canonical order, no self-loops")
        assert(gotNodes.contains(a) && gotNodes.contains(b), "endpoints ⊆ nodes")
      }
    }
  }
}
