package graft

/** Blanket structural guard over EVERY operator's physical plan: no
  * cartesian/broadcast-nested-loop join may appear unless the operator
  * is on the explicit whitelist of intentionally product-shaped plans
  * (bounded brute-force baselines, tiny-side theta joins, 16-row
  * centroid fan-outs). A refactor that silently degrades an equi join
  * to a product — the classic 100 TB plan regression — fails here by
  * name instead of surfacing as a bench mystery.
  */
class PlanHygieneSpec extends SparkSpecBase {

  /** Operators whose plan CONTAINS a product join by design — each with
    * the reason the product is bounded. The whitelist is exact in both
    * directions: a product outside it fails, and an entry whose plan no
    * longer contains one is stale and fails too.
    */
  private val intentionalProducts: Map[String, String] = Map(
    "join_cross" -> "the operator IS a cross join (bounded dims)",
    "sim_search_topk" -> "brute-force baseline: bounded query side x corpus",
    "emb_mrl_topk" -> "coarse tier: bounded query side x corpus (8-dim prefix)",
    "emb_bitpack_hamming" -> "3-probe broadcast x packed corpus (8 B signatures)",
    "sim_search_cosine" -> "brute-force baseline: bounded query side x corpus",
    "ann_ivf_topk" -> "16-centroid broadcast fan-out per vector",
    "dedup_semantic" -> "~sqrt(N)-centroid broadcast fan-out per vector (assignment)",
    "contamination_embedding" -> "bounded benchmark side broadcast, non-equi cosine gate",
    "ann_ivf_built_topk" -> "k=8-centroid broadcast fan-out per vector",
    "source_minhash_sim" -> "pairwise over |sources| = 20 sketch rows",
    "text_lm_score" -> "single-row vocab-size frame crossed onto the scorer",
    // (the ccnet bucketing ops read the r9 lm_scores ARTIFACT, so the
    // vocab cross no longer appears in their measured plans)
    "text_bm25_topk" -> "single-row corpus-stats frame crossed onto postings",
    "graph_pagerank" -> "single-row node-count frame crossed onto the node list",
    "mix_temperature" -> "single-row max-count frame crossed onto the rate table",
    "agg_histogram" -> "single-row bin-total frame crossed onto the <=10 bins",
    "table_clone" -> "1-row source aggregate crossed onto the 1-row clone aggregate",
    "ts_rfm_scores" -> "1-row quartile-cuts aggregate broadcast onto the profile",
    "agg_pareto_share" -> "1-row p80-cut aggregate broadcast onto the revenue profile",
    "agg_benford" -> "1-row digit-total aggregate crossed onto the <=9 digit rows",
    "text_zipf_fit" -> "non-equi rank self-join over the vocab-bounded count table",
    "graph_modularity" -> "1-row |E2| aggregate crossed onto the 1-row stats aggregate",
    "emb_diversity_histogram" -> "bounded all-pairs cosine over the 1/16 hash sample (C(sample,2) by construction)",
    "agg_ks_test" -> "1-row sample-sizes aggregate crossed onto the <=50 cum rows",
    "agg_mann_whitney" -> "non-equi cum join over the <=50-row counts table (the ks shape)",
    "text_langid_kappa" -> "1-row agreement aggregate crossed onto the 1-row chance-agreement aggregate",
    "text_boilerplate_frac" -> "1-row corpus-count aggregate crossed onto the gram df table (2% gate)",
    "ts_dau_mau" -> "1-row span/DAU aggregate crossed onto the 1-row MAU aggregate",
    "ts_seasonality_strength" -> "1-row sum-of-squares aggregate crossed onto the 1-row hour stats",
    "ann_recall_audit" -> "ground-truth side: bounded 10-query probe set x corpus"
  )

  private lazy val framesByQuery
      : Map[String, Either[String, org.apache.spark.sql.DataFrame]] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> (
        try Right(fn(spark, sfDir))
        catch { case e: Throwable => Left(s"PLANFAIL ${e.getMessage}") })
    }

  private lazy val plansByQuery: Map[String, String] =
    framesByQuery.view.mapValues {
      case Right(df) =>
        try df.queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANFAIL ${e.getMessage}" }
      case Left(err) => err
    }.toMap

  private lazy val productsByQuery: Map[String, Boolean] =
    plansByQuery.view.mapValues(p =>
      p.contains("CartesianProduct") ||
        p.contains("BroadcastNestedLoopJoin")).toMap

  test("every operator's plan constructs (a PLANFAIL would mask the guard)") {
    val broken = plansByQuery.collect {
      case (name, p) if p.startsWith("PLANFAIL") => s"$name: $p"
    }.toSeq.sorted
    assert(broken.isEmpty, broken.mkString("\n"))
  }

  test("no operator plan contains an unintentional product join") {
    val offenders = productsByQuery.collect {
      case (name, true) if !intentionalProducts.contains(name) => name
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"product joins outside the whitelist: ${offenders.mkString(", ")}")
  }

  test("every whitelisted product is still present (no stale entries)") {
    intentionalProducts.keys.toSeq.sorted.foreach { k =>
      assert(productsByQuery.getOrElse(k, false),
        s"whitelist entry $k no longer plans a product join — remove it")
    }
  }

  // r6 VERDICT item 6: an unpartitioned window (Window.partitionBy()
  // with no keys) funnels every input row through ONE partition — fine
  // on a 20-row rate table today, a silent full-data serialization
  // point the day someone reuses the shape on a corpus-sized frame.
  // Global aggregates belong in a 1-row agg + broadcast cross-join
  // (the text_bm25_topk pattern). Checked on the optimized LOGICAL
  // plan: the physical Window node's string form doesn't expose an
  // empty partition spec distinguishably.
  test("no operator plans an unpartitioned window") {
    val offenders = framesByQuery.collect {
      case (name, Right(df))
          if df.queryExecution.optimizedPlan.collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
                if w.partitionSpec.isEmpty => w
          }.nonEmpty => name
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"unpartitioned Window (single-partition funnel) in: ${offenders.mkString(", ")}")
  }

  // r9 VERDICT item 2: the driver's DuckDB comparator stringifies and
  // hashes each result column via pandas sort_values/factorize — a
  // nested column (array/map/struct) is unhashable there and the whole
  // comparison hard-errors (exactly how stream_tws_list_recent shipped
  // red in r9; the r2 Decimal episode was the same class). Every
  // oracle-paired query must therefore emit scalar columns only;
  // list-shaped results flatten through array_join (the
  // agg_collect_list pattern). Declared-N queries (no oracleSql entry)
  // are exempt — the driver only row-counts them.
  test("every oracle-paired query emits scalar (non-nested) columns only") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = framesByQuery.collect {
      case (name, Right(df)) if SparkEntry.oracleSql.contains(name) &&
          df.schema.fields.exists(f => f.dataType match {
            case _: ArrayType | _: MapType | _: StructType => true
            case _ => false
          }) =>
        s"$name: ${df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"${f.name}:${f.dataType.simpleString}"
        }.mkString(", ")}"
    }.toSeq.sorted
    assert(offenders.isEmpty,
      "nested output columns the driver comparator cannot hash:\n" +
        offenders.mkString("\n"))
  }

  // r5 VERDICT's last named scale-killer: ts_ewma once collected each
  // user's entire history into a single aggregate buffer. The r6 plan
  // is repartition + external sort + streaming fold — re-introducing a
  // per-key collect_list (unbounded per-key state) fails here by name.
  test("ts_ewma plans without a per-key collect_list buffer") {
    val p = plansByQuery("ts_ewma")
    assert(!p.contains("collect_list"),
      "ts_ewma plan collects per-key history into an aggregate buffer " +
        "(unbounded per-key state — the r5 scale-killer):\n" + p)
  }
}
