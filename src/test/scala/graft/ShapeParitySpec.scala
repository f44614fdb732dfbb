package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables.tsMicros
import graft.pipeline.TextPipeline

/** r17 shape-parity guards: each optimization that restructured an
  * operator's internals (single-exchange level3 build, window-count
  * duplicate detection, binary-key single-pass winnow screen, the
  * full-outer parity gauge) is pinned against an inline copy of the
  * r16 reference shape — row-set equality via exceptAll both ways, so
  * a future "optimization" that drifts semantics fails here before it
  * reaches the oracle gate. */
class ShapeParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-shape-parity")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ==
      b.schema.map(f => (f.name, f.dataType)),
      s"schema drift:\n${a.schema}\n${b.schema}")
    val extraA = a.exceptAll(b).count()
    val extraB = b.exceptAll(a).count()
    assert(extraA == 0 && extraB == 0,
      s"row drift: $extraA only-in-reference, $extraB only-in-optimized")
  }

  test("level3 single-exchange build equals the three-window r16 shape") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .localCheckpoint(false)
    // r16 reference shape, inlined verbatim
    val base = events.select(
      col("event_id"),
      tsMicros(col("ts")).as("microtimestamp"),
      col("user_id"),
      ((col("user_id") % 3) + 1).cast("int").as("pair_id"),
      when(col("user_id") % 2 === 0, "b").otherwise("s").as("side"),
      when(col("user_id") % 2 === 0, col("value"))
        .otherwise(col("value") + 80.0).as("price"),
      ((col("event_id") % 20) + 1).cast("double").as("amount"),
      when(col("event_type") === "error", 1).otherwise(0).as("del_flag"))
    val wUser = Window.partitionBy("user_id")
      .orderBy("microtimestamp", "event_id")
    val withOrder = base.withColumn(
      "order_id",
      col("user_id") * 1000 + coalesce(
        sum("del_flag").over(
          wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wOrd = Window.partitionBy("order_id")
      .orderBy("microtimestamp", "event_id")
    val evt = withOrder
      .withColumn("event_no", row_number().over(wOrd))
      .withColumn("prev_amount", lag("amount", 1).over(wOrd))
      .withColumn("lead_ts", lead("microtimestamp", 1).over(wOrd))
      .withColumn("prev_price", lag("price", 1).over(wOrd))
      .withColumn("price_chg",
        when(col("prev_price").isNull ||
          col("price") =!= col("prev_price"), 1).otherwise(0))
      .withColumn("price_group",
        sum("price_chg").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val wChain = Window.partitionBy("order_id", "price_group")
    val reference = evt.select(
      col("microtimestamp"), col("order_id"), col("event_no"),
      col("side"), col("price"), col("amount"),
      when(col("prev_amount") > col("amount"),
        col("prev_amount") - col("amount")).as("fill"),
      when(col("del_flag") === 1, col("microtimestamp"))
        .otherwise(coalesce(col("lead_ts"),
          lit(graft.market.Level3Source.AliveMicros)))
        .as("next_microtimestamp"),
      (col("del_flag") === 1).as("is_deleted"),
      min("microtimestamp").over(wChain).as("price_microtimestamp"),
      min("event_no").over(wChain).as("price_event_no"),
      col("pair_id"),
      graft.market.Dimensions.exchangeOfPair(col("pair_id"))
        .as("exchange_id"),
      col("event_id"))
    assertSameRows(reference, graft.market.Level3Source.level3(events))
  }

  test("charSpanDedup window-count equals the agg+semi r16 shape") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .localCheckpoint(false)
    val L = 16
    // r16 reference: 128-bit gram keys, groupBy + left_semi, then the
    // same gaps-and-islands span merge the operator uses today
    val grams = docs.select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= L,
          sequence(lit(1), length(col("text")) - lit(L - 1)))
          .otherwise(array())).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(expr(s"substring(text, pos, $L)")).as("h1"),
        xxhash64(lit("csd#2"), expr(s"substring(text, pos, $L)")).as("h2"))
    val dupHashes = grams.groupBy("h1", "h2")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("h1", "h2")
    val flagged = grams.join(dupHashes, Seq("h1", "h2"), "left_semi")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(L - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val reference = flagged
      .withColumn("ni",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("island", sum(col("ni")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("sp"), (max(col("pos")) + lit(L - 1)).as("ep"))
      .withColumn("span_no", row_number().over(
        Window.partitionBy("doc_id").orderBy("sp")).cast("long"))
      .select(col("doc_id"), col("span_no"),
        col("sp").cast("long").as("s"), col("ep").cast("long").as("e"))
    assertSameRows(reference, TextPipeline.charSpanDedup(docs, L))
  }

  test("winnow screen binary-key single-pass equals the r16 shape") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .localCheckpoint(false)
    val L = 16
    val w = 8
    // r16 reference: md5 HEX selection, groupBy dup + semi + two
    // per-doc aggregates + join
    val g = docs.select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= L,
          sequence(lit(1), length(col("text")) - lit(L - 1)))
          .otherwise(array())).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(expr(s"substring(text, pos, $L)")).as("h"))
    val trail = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    val sel = g
      .withColumn("m",
        min(struct(col("h"), (-col("pos")).as("negpos"))).over(trail))
      .select(col("doc_id"),
        (-col("m.negpos")).cast("long").as("pos"),
        xxhash64(col("m.h")).as("h1"),
        xxhash64(lit("cw#2"), col("m.h")).as("h2"))
      .distinct()
    val dup = sel.groupBy("h1", "h2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("h1", "h2")
    val hits = sel.join(dup, Seq("h1", "h2"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_selected"))
    val reference = sel.groupBy("doc_id")
      .agg(count(lit(1)).as("n_selected"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_selected"),
        coalesce(col("n_dup_selected"), lit(0L)).as("n_dup_selected"),
        (coalesce(col("n_dup_selected"), lit(0L)) > 0).as("is_flagged"))
    assertSameRows(reference, TextPipeline.charDupDocsWinnowed(docs, L, w))
  }

  test("word-gram pass (post-explode codegen hash) equals the HOF r16 shape") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .localCheckpoint(false)
    val L = 8
    // r16 reference gram pass: md5 inside a transform(...) lambda,
    // driven through the same dup-agg + semi + span report the
    // operator used (substringDedup's public output pins the whole
    // chain, so any (pos, h) drift in the rewritten gramPositions
    // surfaces as span/clean_md5 drift here)
    val w = docs.withColumn("words", split(col("text"), " "))
    val grams = w.select(col("doc_id"),
        explode(when(size(col("words")) >= L,
          expr(s"transform(sequence(1, size(words) - ${L - 1}), " +
            s"i -> struct(i AS pos, " +
            s"md5(concat_ws(' ', slice(words, i, $L))) AS h))"))
          .otherwise(array())).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
    val dupHashes = grams.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("h")
    val flagged = grams.join(dupHashes, Seq("h"), "left_semi")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(L - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = flagged
      .withColumn("ni",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("island", sum(col("ni")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(L - 1)).as("e"))
    val perDoc = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("e") - col("s") + 1).as("dup_words"),
        collect_list(struct(col("s"), col("e"))).as("ivs"))
    val reference = w.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"),
        md5(when(col("ivs").isNull, concat_ws(" ", col("words")))
          .otherwise(expr("concat_ws(' ', filter(words, (wd, i) -> " +
            "NOT exists(ivs, iv -> i + 1 BETWEEN iv.s AND iv.e)))")))
          .as("clean_md5"))
    assertSameRows(reference, TextPipeline.substringDedup(docs, L))
  }

  test("continueBuild single-exchange equals the three-window r17 shape") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .localCheckpoint(false)
    val cut = Oracles.SnapshotMicros
    val first = events.filter(tsMicros(col("ts")) <= cut)
    val rest = events.filter(tsMicros(col("ts")) > cut)
    val batch1 = graft.market.Level3Source.level3(first)
      .join(first.select(col("event_id").as("u_eid"), col("user_id")),
        col("event_id") === col("u_eid"))
      .drop("u_eid")
      .localCheckpoint(false)
    val state = graft.market.Level3Source.openState(batch1)
      .localCheckpoint(false)
    // r17 reference shape, inlined verbatim: user window for the
    // incarnation counter, order window for numbering/neighbors,
    // (order, price_group) window for chain anchors
    val base = rest.select(
      col("event_id"),
      tsMicros(col("ts")).as("microtimestamp"),
      col("user_id"),
      ((col("user_id") % 3) + 1).cast("int").as("pair_id"),
      when(col("user_id") % 2 === 0, "b").otherwise("s").as("side"),
      when(col("user_id") % 2 === 0, col("value"))
        .otherwise(col("value") + 80.0).as("price"),
      ((col("event_id") % 20) + 1).cast("double").as("amount"),
      when(col("event_type") === "error", 1).otherwise(0).as("del_flag"),
      lit(false).as("carry"))
    val carryRows = state.filter(col("order_id").isNotNull).select(
      lit(-1L).as("event_id"),
      col("last_ts").as("microtimestamp"),
      col("user_id"),
      ((col("user_id") % 3) + 1).cast("int").as("pair_id"),
      when(col("user_id") % 2 === 0, "b").otherwise("s").as("side"),
      col("last_price").as("price"),
      col("last_amount").as("amount"),
      lit(0).as("del_flag"),
      lit(true).as("carry"))
    val st = state.select(col("user_id").as("s_user"),
      coalesce(col("del_base"), lit(0L)).as("del_base"),
      col("order_id").as("s_oid"), col("event_count"),
      col("chain_ts"), col("chain_eno"))
      .groupBy("s_user")
      .agg(max("del_base").as("del_base"), max("s_oid").as("s_oid"),
        max("event_count").as("event_count"),
        max("chain_ts").as("chain_ts"), max("chain_eno").as("chain_eno"))
    val wUser = Window.partitionBy("user_id")
      .orderBy("microtimestamp", "event_id")
    val all = base.unionByName(carryRows)
      .join(st, col("user_id") === col("s_user"), "left")
      .withColumn("order_id",
        col("user_id") * 1000 + coalesce(col("del_base"), lit(0L)) +
          coalesce(sum("del_flag").over(
            wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wOrd = Window.partitionBy("order_id")
      .orderBy("microtimestamp", "event_id")
    val continuing = col("order_id") === col("s_oid")
    val evt = all
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("event_no",
        when(continuing, col("rn") + col("event_count") - 1)
          .otherwise(col("rn")).cast("int"))
      .withColumn("prev_amount", lag("amount", 1).over(wOrd))
      .withColumn("lead_ts", lead("microtimestamp", 1).over(wOrd))
      .withColumn("prev_price", lag("price", 1).over(wOrd))
      .withColumn("price_chg",
        when(col("prev_price").isNull ||
          col("price") =!= col("prev_price"), 1).otherwise(0))
      .withColumn("price_group",
        sum("price_chg").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val wChain = Window.partitionBy("order_id", "price_group")
    val built = evt
      .withColumn("chain_start_ts", min("microtimestamp").over(wChain))
      .withColumn("chain_start_eno", min("event_no").over(wChain))
      .withColumn("carried_chain",
        max(when(col("carry"), 1).otherwise(0)).over(wChain) === 1)
      .filter(!col("carry"))
    val refNew = built.select(
      col("microtimestamp"), col("order_id"), col("event_no"),
      col("side"), col("price"), col("amount"),
      when(col("prev_amount") > col("amount"),
        col("prev_amount") - col("amount")).as("fill"),
      when(col("del_flag") === 1, col("microtimestamp"))
        .otherwise(coalesce(col("lead_ts"),
          lit(graft.market.Level3Source.AliveMicros)))
        .as("next_microtimestamp"),
      (col("del_flag") === 1).as("is_deleted"),
      when(col("carried_chain"), col("chain_ts"))
        .otherwise(col("chain_start_ts")).as("price_microtimestamp"),
      when(col("carried_chain"), col("chain_eno"))
        .otherwise(col("chain_start_eno")).cast("int").as("price_event_no"),
      col("pair_id"),
      graft.market.Dimensions.exchangeOfPair(col("pair_id"))
        .as("exchange_id"),
      col("event_id"))
    val refCorr = built
      .filter(continuing && col("rn") === 2)
      .select(col("order_id"), (col("event_count")).as("event_no"),
        col("microtimestamp").as("new_next"))
    val (gotNew, gotCorr) =
      graft.market.Level3Source.continueBuild(rest, state)
    assertSameRows(refNew, gotNew)
    assertSameRows(refCorr, gotCorr)
  }

  test("scoped identity-skip is null-doc_id safe (skip disabled, semi path taken)") {
    import spark.implicits._
    // a saturated corpus (every screened doc flagged) PLUS one
    // null-keyed duplicated doc: a left_semi drops null join keys, so
    // the identity-skip must NOT fire — the guard counts null-keyed
    // screen rows and falls back to the semi join (judge r17 #6)
    val dup = "the same twenty-four-char duplicated run appears here"
    val base = Seq((10L, dup + " alpha tail"), (11L, dup + " beta tail"))
      .toDF("doc_id", "text")
    val withNull = base.unionByName(
      Seq((Option.empty[Long], dup + " gamma tail")).toDF("doc_id", "text"))
    val L = 24
    val w = 4
    // explicit semi-join shape — what the operator must equal exactly
    val flagged = TextPipeline.charDupDocsWinnowed(withNull, L, w)
      .filter(col("is_flagged")).select("doc_id")
    val reference = TextPipeline.charSpanDedup(
      withNull.join(flagged, Seq("doc_id"), "left_semi"), L)
    assertSameRows(reference,
      TextPipeline.charSpanDedupScoped(withNull, L, w))
    // and on the null-free saturated corpus both paths still agree
    // (here the skip DOES fire — same rows either way)
    val flagged2 = TextPipeline.charDupDocsWinnowed(base, L, w)
      .filter(col("is_flagged")).select("doc_id")
    val reference2 = TextPipeline.charSpanDedup(
      base.join(flagged2, Seq("doc_id"), "left_semi"), L)
    assertSameRows(reference2,
      TextPipeline.charSpanDedupScoped(base, L, w))
  }

  test("charScopedParity full-outer gauge equals the left-join + totals r16 shape") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .localCheckpoint(false)
    val L = 16
    val w = 8
    val exact = TextPipeline.charSpanDedup(docs, L)
      .select(col("doc_id"), col("s"), col("e"))
    val scoped = TextPipeline.charSpanDedupScoped(docs, L, w)
      .select(col("doc_id").as("sc_doc"), col("s").as("sc_s"),
        col("e").as("sc_e"))
    val joined = exact.join(scoped,
      col("doc_id") === col("sc_doc") && col("s") === col("sc_s") &&
        col("e") === col("sc_e"), "left")
    val scTot = scoped.agg(
      count(lit(1)).as("n_spans_scoped"),
      coalesce(sum(col("sc_e") - col("sc_s") + 1), lit(0L))
        .as("chars_scoped"))
    val reference = joined.agg(
        count(lit(1)).as("n_spans_exact"),
        count(col("sc_doc")).as("n_span_hits"),
        coalesce(sum(col("e") - col("s") + 1), lit(0L)).as("chars_exact"))
      .crossJoin(broadcast(scTot))
      .select(col("n_spans_exact"), col("n_spans_scoped"),
        col("n_span_hits"),
        when(col("n_spans_exact") === 0, lit(1000L))
          .otherwise(expr("(1000 * n_span_hits) div n_spans_exact"))
          .as("span_recall_milli"),
        col("chars_exact"), col("chars_scoped"))
    assertSameRows(reference, TextPipeline.charScopedParity(docs, L, w))
  }
}
