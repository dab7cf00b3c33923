package graft

import graft.queries.Queries
import org.apache.spark.sql.DataFrame

/**
 * Plan-shape regression guard: the physical plans we tuned for must stay
 * that way (SURVEY.md §4; a correctness-green query with a degraded plan is
 * still a regression at 100 TB).
 */
class PlanQualitySpec extends SparkSpec {

  def plan(name: String): String = {
    val q = Queries.all.find(_.name == name).get
    // formatted mode is untruncated (toString cuts PushedFilters/ReadSchema)
    q.build(spark, "/root/testdata/sf0.01").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q01: filters are pushed to the parquet scan") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity,45.0)"), p)
    // projection pruned to the 4 selected columns
    assert("ReadSchema: [^\\n]*l_orderkey".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("l_tax"), s"scan reads pruned column l_tax:\n$p")
  }

  test("q03: all three dimension joins broadcast; fact side never shuffles for the join") {
    val p = plan("q03_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q04/q48: semi joins plan as joins, not per-row subqueries") {
    assert(plan("q04_semi_join").contains("LeftSemi"))
    assert(plan("q48_in_subquery").contains("LeftSemi"))
  }

  test("q09: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("q09_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q02: aggregation is partial+final hash aggregate") {
    val p = plan("q02_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q14: as-of join is one exchange + window, no inequality join") {
    val p = plan("q14_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("q26: minhash pipeline has no cartesian stage") {
    val p = plan("q26_minhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q56 pipeline: pruned 3-col scan, filter at scan, group-limit dedup, partial+final agg") {
    val p = plan("q56_pipeline")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      s"scan should read exactly (doc_id,text,source):\n$p")
    // single scan of documents (formatted mode lists it twice: tree + detail)
    assert("Scan parquet".r.findAllIn(p).length <= 2, p)
    // rn=1 dedup optimizes to WindowGroupLimit (partial before the exchange,
    // final after) instead of materializing full row_number output
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      s"expected map-side + final WindowGroupLimit:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("LSH near-dup paths: no cartesian stage, vectors dropped before the pair-dedup exchange") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = (0 until 50).map(i => (i.toLong, Seq.fill(8)(i / 10.0f))).toDF("vec_id", "embedding")
    for (df <- Seq(
        graft.ext.Similarity.cosineNearDupsLsh(emb, "vec_id", "embedding", 0.9, dim = 8),
        graft.ext.Similarity.crossCorpusNearDups(emb, emb, "vec_id", "vec_id", "embedding", 0.9, dim = 8))) {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
      // the final dedup aggregate must group bare id pairs — no vector
      // columns (_va/_vb/_vl/_vr) may survive past the scoring projection
      val aggSection = p.linesIterator.filter(_.contains("HashAggregate")).mkString("\n")
      assert(!aggSection.contains("_v"), s"vector column reaches an aggregate:\n$p")
    }
  }

  test("q76 temperature mix: budget join broadcasts; no cartesian; scan pruned to 3 cols") {
    val p = plan("q76_temperature_mix")
    // the per-source budget frame is tiny and must ride a broadcast join —
    // a shuffled join here would exchange the whole corpus against a
    // 20-row frame
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"budget join fell back to SMJ:\n$p")
    assert(!p.contains(" text"), s"scan reads the text payload it never needs:\n$p")
  }

  test("q77 rank shard: map-only derivation — the only exchange is the output sort") {
    val p = plan("q77_rank_shard")
    // md5 -> rank/order_key is per-row; nothing may shuffle except the
    // final presentation ORDER BY
    // count tree nodes ("Exchange (4)"), not the detail section repeats
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).length <= 1,
      s"extra exchanges:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q54 BPE word-count: top-K words is TakeOrderedAndProject over partial+final agg") {
    import org.apache.spark.sql.functions._
    val df = graft.ext.Bpe.wordCountsPlan(
      Tables.load(spark, "/root/testdata/sf0.01", "documents"), "text", 1000)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), s"top-K words must not global-sort:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }
}
