package graft.chat

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Golden-output parity tests for the chat pipeline (SURVEY.md §5.1):
  * every semantic branch of the reference's analyze loop
  * (backend/main.py:281-325) and upload loop (366-378) on one fixture.
  */
class ChatPipelineSpec extends SparkSpec {

  private lazy val lines = ChatLines.read(spark, fixture("chat/fixture1.txt"))
  private lazy val msgs = ChatParser.analyzeDialect(lines).cache()

  private def linksOf(g: Network.Graph): Seq[(String, String, Long)] =
    g.links.orderBy("source", "target").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  private def nodesOf(g: Network.Graph): Seq[String] =
    g.nodes.orderBy("id").collect().map(_.getString(0)).toSeq

  test("line numbers are stable and 0-based per file") {
    val nums = lines.orderBy("line_no").select("line_no").collect().map(_.getLong(0)).toSeq
    assert(nums == (0L until 10L))
  }

  test("analyze dialect: filters + normalization (F1,F2,F4,F6,P1-P4)") {
    val got = msgs.orderBy("line_no")
      .select("sender", "message_date").collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSeq
    assert(got == Seq(
      "🦋" -> "2023-10-07",
      "DanaCohen" -> "2023-10-07", // "~ Dana Cohen " → strip ~, drop spaces
      "Bob" -> "2023-10-07",
      "Bob" -> "2023-10-07",
      // media-omitted Hebrew line skipped; 32.13.2023 invalid date skipped
      "Zed" -> "2022-01-01",
      "Carol" -> "2023-10-08",
      // plain non-bracket line skipped
      "🦋" -> "2023-10-09"))
  }

  test("network, no filters: runs collapse, no self-loops, canonical pairs") {
    val g = Network.analyze(msgs)
    assert(nodesOf(g) == Seq("Bob", "Carol", "DanaCohen", "Zed", "🦋"))
    assert(linksOf(g) == Seq(
      ("Bob", "DanaCohen", 1L), ("Bob", "Zed", 1L), ("Carol", "Zed", 1L),
      ("Carol", "🦋", 1L), ("DanaCohen", "🦋", 1L)))
  }

  test("network: date-filtered rows bridge the lag (J1 gap semantics)") {
    val g = Network.analyze(msgs,
      Some(LocalDate.parse("2023-10-07")), Some(LocalDate.parse("2023-10-09")))
    // Zed (2022) drops out; Bob→Carol bridges the gap; Zed not a node
    assert(nodesOf(g) == Seq("Bob", "Carol", "DanaCohen", "🦋"))
    assert(linksOf(g) == Seq(
      ("Bob", "Carol", 1L), ("Bob", "DanaCohen", 1L),
      ("Carol", "🦋", 1L), ("DanaCohen", "🦋", 1L)))
  }

  test("network: one-sided date bound applies no filter (F5 both-or-nothing)") {
    val g = Network.analyze(msgs, startDate = Some(LocalDate.parse("2023-10-07")))
    assert(nodesOf(g).size == 5) // Zed still present
  }

  test("network: limit counts accepted messages; limit+1 contributes nothing (L1)") {
    val g = Network.analyze(msgs, limit = Some(3))
    assert(nodesOf(g) == Seq("Bob", "DanaCohen", "🦋"))
    assert(linksOf(g) == Seq(("Bob", "DanaCohen", 1L), ("DanaCohen", "🦋", 1L)))
    // limit 0 = unlimited
    assert(nodesOf(Network.analyze(msgs, limit = Some(0))).size == 5)
  }

  test("upload dialect: raw senders, group-name exclusion (F3,F7,J3,P5)") {
    val up = ChatParser.uploadDialect(lines)
    val rows = up.orderBy("date_time").collect()
    assert(rows.forall(_.getAs[String]("group_name") == "~🦋"))
    val senders = up.select("sender").collect().map(_.getString(0)).toSet
    // raw (unnormalized): includes spaces and ~; excludes the group name;
    // includes media-omitted and invalid-date lines (no F1/F4 here)
    assert(senders == Set("~ Dana Cohen ", "Bob", "Eve", "Carol", "Zed"))
    assert(up.count() == 7) // first matched line dropped; later ~🦋 line dropped
  }

  test("word frequency: count-desc with word tiebreak (A5/L4)") {
    val top = WordFrequency.top(msgs.filter(col("message_date") >= lit("2023-01-01")), 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("again", 2L), ("hey", 2L), ("back", 1L)))
  }

  test("multi-file corpus: windows partition by file — no cross-file edges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_multi")
    java.nio.file.Files.writeString(dir.resolve("g1.txt"),
      "[7.10.2023, 10:00:00] Ann: a\n[7.10.2023, 10:01:00] Ben: b\n")
    java.nio.file.Files.writeString(dir.resolve("g2.txt"),
      "[7.10.2023, 10:02:00] Cat: c\n[7.10.2023, 10:03:00] Dan: d\n")
    val g = Network.analyzeFile(spark, dir.toString)
    assert(nodesOf(g) == Seq("Ann", "Ben", "Cat", "Dan"))
    // last sender of g1 (Ben) must NOT link to first of g2 (Cat)
    assert(linksOf(g) == Seq(("Ann", "Ben", 1L), ("Cat", "Dan", 1L)))
  }

  test("decodeReplace matches CPython maximal-subpart semantics case by case") {
    def d(bs: Int*) = ChatLines.decodeReplace(bs.map(_.toByte).toArray)
    assert(d(0xe2, 0x82, 0xac) == "€")
    assert(d(0xff) == "�") // invalid starter
    assert(d(0xc0, 0xaf) == "��") // overlong starter + lone continuation
    assert(d(0x80) == "�") // lone continuation
    assert(d(0xe2, 0x82) == "�") // truncated 3-byte: ONE maximal subpart
    assert(d(0xe0, 0x80) == "��") // E0 second byte must be A0-BF
    assert(d(0xf0, 0x80) == "��") // F0 second byte must be 90-BF
    assert(d(0xed, 0xa0, 0x80) == "���") // surrogate rejected at byte 2
    assert(d(0xf4, 0x90, 0x80, 0x80) == "����") // above U+10FFFF
    assert(d(0xf0, 0x9f, 0xa6, 0x8b) == "🦋")
    assert(d(0xf0, 0x9f, 0xa6) == "�") // truncated 4-byte: ONE subpart
    assert(d('a', 0xc3) == "a�") // truncated 2-byte at EOF
  }

  test("readExact: CPython errors=replace + universal newlines, stable line_no (S2)") {
    // golden verified against CPython: open(p, encoding='utf-8',
    // errors='replace') iterated line by line on these exact bytes
    val bytes =
      "one ".getBytes("UTF-8") ++ Array(0xe2, 0x82, 0xac).map(_.toByte) ++
      " ok\r\nbad ".getBytes("UTF-8") ++ Array(0xff, 0xc0, 0xaf).map(_.toByte) ++
      " mid\rtrunc ".getBytes("UTF-8") ++ Array(0xe2, 0x82).map(_.toByte) ++
      " end\nlone".getBytes("UTF-8") ++ Array(0x80.toByte) ++
      "\nsurr ".getBytes("UTF-8") ++ Array(0xed, 0xa0, 0x80).map(_.toByte) ++
      "!\nlast no newline ".getBytes("UTF-8") ++ Array(0xf0, 0x9f, 0xa6).map(_.toByte)
    val dir = java.nio.file.Files.createTempDirectory("graft_exact")
    java.nio.file.Files.write(dir.resolve("m.txt"), bytes)
    val got = ChatLines.readExact(spark, dir.toString)
      .orderBy("line_no").select("line_no", "value").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      0L -> "one € ok",
      1L -> "bad ��� mid",
      2L -> "trunc � end",
      3L -> "lone�",
      4L -> "surr ���!",
      5L -> "last no newline �"))
  }

  test("graph JSON escapes quotes, backslashes, and control characters") {
    import spark.implicits._
    val nodes = Seq("a\"b", "c\\d", "e\tf").toDF("id")
    val links = Seq(("a\"b", "c\\d", 1L)).toDF("source", "target", "weight")
    val json = Network.toJson(Network.Graph(nodes, links))
    assert(json.contains("\"a\\\"b\"") && json.contains("\"c\\\\d\"") &&
      json.contains("\"e\\tf\""))
    // stays machine-parseable
    assert(json.startsWith("{\"nodes\": [") && json.endsWith("]}"))
  }

  test("graph JSON matches the reference response shape") {
    val g = Network.analyze(msgs, limit = Some(3))
    val json = Network.toJson(g)
    assert(json ==
      """{"nodes": [{"id": "Bob"}, {"id": "DanaCohen"}, {"id": "🦋"}], """ +
      """"links": [{"source": "Bob", "target": "DanaCohen", "weight": 1}, """ +
      """{"source": "DanaCohen", "target": "🦋", "weight": 1}]}""")
  }

  test("writeGraph/readGraph round-trips the graph through files (no collect)") {
    val g = Network.analyze(msgs)
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    Network.writeGraph(g, dir, jsonLines = true)
    val back = Network.readGraph(spark, dir)
    assert(nodesOf(back) == nodesOf(g))
    assert(linksOf(back) == linksOf(g))
    // JSON-lines sidecar holds the same link rows in toJson's field shape
    val jl = spark.read.json(s"$dir/links_json")
      .orderBy("source", "target")
      .select("source", "target", "weight").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(jl == linksOf(g))
  }
}
