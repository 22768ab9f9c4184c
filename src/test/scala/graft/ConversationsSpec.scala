package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Conversations

/** Structural invariants of the conversational/SFT family that the
  * oracle compare can't express — the parse must be lossless, the
  * injection must hit exactly the planned rows, and the cards must
  * conserve the turn stream. */
class ConversationsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  def docs = graft.queries.QueryDef.t(spark, dir, "documents")
  def turns = Conversations.chatTurns(docs)

  test("chatTurns: boilerplate turns 0/1 and alternating roles per conv") {
    val bad = turns.filter(
      (col("turn_idx") % 2 === 0 && col("role") =!= "user") ||
        (col("turn_idx") % 2 === 1 && col("role") =!= "assistant")).count()
    assert(bad === 0, "role must be parity of turn_idx")
    val g = Conversations.Greetings
    val a = Conversations.Acks
    val t0 = turns.filter(col("turn_idx") === 0)
      .filter(!col("text").isin(g: _*)).count()
    val t1 = turns.filter(col("turn_idx") === 1)
      .filter(!col("text").isin(a: _*)).count()
    assert(t0 === 0 && t1 === 0, "turns 0/1 must be the canonical boilerplate")
  }

  test("chatTurns: content turns reconstruct the document verbatim") {
    // losslessness: joining each conversation's content turns (idx >= 2,
    // in order) with single spaces must reproduce documents.text exactly.
    val rebuilt = turns.filter(col("turn_idx") >= 2)
      .groupBy("conv_id")
      .agg(concat_ws(" ",
        sort_array(collect_list(struct(col("turn_idx"), col("text"))))
          .getField("text")).as("rebuilt"))
    val diff = rebuilt
      .join(docs.select(col("doc_id").as("conv_id"), col("text")), "conv_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(diff === 0, "content turns must partition the document's words")
    assert(rebuilt.count() === docs.count(), "every document becomes a conversation")
  }

  test("turn templates find exactly the injected boilerplate") {
    val tm = Conversations.turnTemplates(docs)
      .select("role", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected =
      Conversations.Greetings.map(("user", _)).toSet ++
        Conversations.Acks.map(("assistant", _)).toSet
    assert(tm === expected,
      "template mine must surface the planted greeting/ack strings and nothing else")
  }

  test("assistant decontam flags exactly the injected conversations, one span each") {
    val flagged = Conversations.assistantDecontam(spark, docs)
    val rows = flagged.collect()
    assert(rows.forall(_.getAs[Long]("n_bench_spans") === 1L),
      "each planted passage is exactly one benchmark span")
    assert(rows.forall(_.getAs[Long]("turn_idx") === 3L))
    val expected = turns.filter(col("conv_id") % 17 === 5 && col("turn_idx") === 3)
      .select("conv_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("conv_id")).toSet === expected,
      "flagged set == injected convs that are long enough to have turn 3")
  }

  test("conversation packing conserves budgets and never splits a conversation") {
    import org.apache.spark.sql.functions.{col => c, expr, sum => fsum, count => fcount, lit}
    val bins = Conversations.packConversations(docs)
    val convBudgets = Conversations.chatTurns(docs)
      .withColumn("n_words", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(c("text"), " ")).cast("long"))
      .groupBy("conv_id")
      .agg((fsum("n_words") + fcount(lit(1)) * Conversations.TagTokens).as("n_tok"))
    assert(bins.agg(fsum("n_convs")).collect()(0).getLong(0) === docs.count(),
      "every conversation lands in exactly one bin")
    assert(bins.agg(fsum("n_tokens")).collect()(0).getLong(0) ===
      convBudgets.agg(fsum("n_tok")).collect()(0).getLong(0),
      "bin token totals conserve the conversation budgets")
    // bins are contiguous id ranges per source: next bin's first conv
    // must exceed this bin's last
    val overlaps = bins.as("a").join(bins.as("b"),
      c("a.source") === c("b.source") && c("a.bin") + 1 === c("b.bin") &&
        c("b.first_conv") <= c("a.last_conv")).count()
    assert(overlaps === 0)
  }

  test("rendered conversations match the layout card exactly") {
    import org.apache.spark.sql.functions.{col => c, length}
    val card = Conversations.chatRenderCard(docs)
      .select("conv_id", "n_chars")
    val rendered = Conversations.renderConversations(turns)
      .select(c("conv_id"), length(c("rendered")).cast("long").as("len"))
    val diff = card.join(rendered, "conv_id")
      .filter(c("n_chars") =!= c("len")).count()
    assert(diff === 0, "card geometry must equal materialized string lengths")
    assert(card.count() === docs.count())
  }

  test("parroting screen flags exactly the injected echo turns") {
    import org.apache.spark.sql.functions.{col => c}
    val flagged = Conversations.parrotingScreen(docs).collect()
    assert(flagged.forall(_.getAs[Long]("turn_idx") === 3L))
    val expected = turns.filter(c("conv_id") % 23 === 7 && c("turn_idx") === 3)
      .select("conv_id").collect().map(_.getLong(0)).toSet
    assert(flagged.map(_.getAs[Long]("conv_id")).toSet === expected,
      "flagged set == injected convs long enough to have turn 3")
    // the parrot copies turn 2: word counts must match the user turn's
    val t2 = turns.filter(c("turn_idx") === 2)
      .select(c("conv_id"), org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(c("text"), " ")).cast("long").as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.forall(f => f.getAs[Long]("n_words") == t2(f.getAs[Long]("conv_id"))))
  }

  test("instruction tags: first-word shortcut equals the turn-derived tag") {
    import org.apache.spark.sql.functions.{col => c, expr}
    // the op reads the doc's first word; the semantic definition is the
    // first word of the first CONTENT user turn — must be identical
    val fromTurns = turns.filter(c("turn_idx") === 2)
      .select(c("conv_id"), expr("split(text, ' ')[0]").as("t_tag"))
    val fromDocs = docs.select(c("doc_id").as("conv_id"),
      expr("split(text, ' ')[0]").as("d_tag"))
    assert(fromTurns.join(fromDocs, "conv_id")
      .filter(c("t_tag") =!= c("d_tag")).count() === 0)
    val card = Conversations.instructionTags(docs).collect()
    assert(card.map(_.getAs[Long]("n_convs")).sum === docs.count())
    card.foreach { r =>
      val inv = r.getAs[Long]("inv_simpson_micro")
      assert(inv >= 1000000L && inv <= r.getAs[Long]("n_tags") * 1000000L,
        s"inverse Simpson must sit in [1, n_tags]: $inv")
      assert(r.getAs[Long]("top_share_micro") >= 1000000L / r.getAs[Long]("n_tags"))
    }
  }

  test("fromMessages: a null-role turn dead-letters instead of vanishing") {
    import org.apache.spark.sql.functions.{col => c}
    import org.apache.spark.sql.Row
    val schema = Conversations.ChatSchema
    val rows = java.util.Arrays.asList(
      Row(1L, scala.collection.mutable.ArraySeq(
        Row("user", "hi"), Row(null, "orphan"), Row("assistant", "yo"))))
    val convs = spark.createDataFrame(rows, schema)
    val turns = Conversations.fromMessages(convs)
    val good = turns.filter(c("valid_role")).count()
    val bad = turns.filter(!c("valid_role")).count()
    assert(good === 2 && bad === 1,
      "the null-role turn must route to the dead-letter side, not be dropped by both filters")
  }

  test("JSONL chat ingest round-trips the turn table exactly; torn lines quarantine") {
    import org.apache.spark.sql.functions.{col => c}
    val dir = java.nio.file.Files.createTempDirectory("chat-jsonl").toString
    // export the derived conversations as messages-array JSONL...
    graft.sources.JsonlCorpus.write(Conversations.toMessages(turns), dir)
    // ...append one torn line to a shard
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json")).head
    java.nio.file.Files.write(shard.toPath,
      "{\"conv_id\": 999999, \"messages\": [{\"role\": \"user\", \"co".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    // the raw append invalidates the local-FS checksum sidecar Spark's
    // writer left; a real torn upload has no crc — drop it
    new java.io.File(shard.getParent, s".${shard.getName}.crc").delete()
    val back = graft.sources.JsonlCorpus.read(spark, dir, Conversations.ChatSchema)
    val (good, bad) = graft.sources.JsonlCorpus.quarantine(back)
    assert(bad.count() === 1, "the torn line must land in the dead-letter side")
    val reparsed = Conversations.fromMessages(good)
    assert(reparsed.filter(!c("valid_role")).count() === 0)
    val a = reparsed.select("conv_id", "turn_idx", "role", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = turns.collect().map(_.toString).sorted.toSeq
    assert(a == b, "JSONL export -> read -> parse must reproduce the turn table")
  }

  test("role balance card conserves the turn stream and ends on a role") {
    val card = Conversations.roleBalanceCard(docs).collect()
      .map(r => r.getAs[String]("role") -> r).toMap
    val total = card.values.map(_.getAs[Long]("n_turns")).sum
    assert(total === turns.count(), "card turn counts partition the stream")
    val endTotal = card.values.map(_.getAs[Long]("n_convs_last")).sum
    assert(endTotal === docs.count(), "every conversation ends in exactly one role")
    // every conv has turns 0 (user) and 1 (assistant)
    assert(card("user").getAs[Long]("n_convs") === docs.count())
    assert(card("assistant").getAs[Long]("n_convs") === docs.count())
  }
}
