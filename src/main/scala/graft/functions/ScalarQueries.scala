package graft.functions

import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.H — scalar function surface (string / date / math /
  * conditional / array / map / json / struct).
  *
  * Football reading: name normalization, season extraction, per-90
  * math, event-JSON parsing (derived — `/root/reference/README.md:2`).
  *
  * All expressions here are Catalyst built-ins (whole-stage codegen'd);
  * no UDFs in this file. Cross-engine notes are inline where Spark and
  * DuckDB semantics needed aligning.
  */
object ScalarQueries {

  val queries: Map[String, Q] = Map(
    "fn_string_basic" -> ((s, d) =>
      customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          length(col("c_name")).as("len"),
          substring(col("c_name"), 1, 8).as("sub8"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("tagged"),
          lpad(col("c_custkey").cast(StringType), 10, "0").as("padded"))
        .orderBy(col("c_custkey"))),

    "fn_string_regex" -> ((s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1)
            .cast(IntegerType).as("brand_num"),
          // DuckDB regexp_replace needs the 'g' flag to match Spark's
          // replace-all semantics.
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          size(split(col("p_name"), " ")).as("n_words"),
          instr(col("p_name"), "red").as("red_at"))
        .orderBy(col("p_partkey"))),

    "fn_date_extract" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          // Spark dayofweek: Sunday=1; DuckDB dayofweek: Sunday=0.
          (dayofweek(col("o_orderdate")) - 1).as("dow"),
          // DuckDB date_trunc('month', ts) yields DATE; cast Spark's
          // timestamp result to match.
          date_trunc("month", col("o_orderdate")).cast(DateType)
            .as("month_start"))
        .orderBy(col("o_orderkey"))),

    "fn_date_arith" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          datediff(col("o_orderdate").cast(DateType), lit("1995-01-01"))
            .as("days_since"),
          date_add(col("o_orderdate").cast(DateType), 30).as("plus_30"),
          // Whole-month difference == DuckDB date_diff('month', ...)
          // (boundary-crossing count) when both sides are
          // month-truncated first.
          months_between(date_trunc("month", col("o_orderdate")),
            lit("1995-01-01").cast(TimestampType))
            .cast(IntegerType).as("months_since"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy(col("o_orderkey"))),

    // ANSI INTERVAL types (r6, Spark 4 surface distinct from
    // fn_date_arith's date functions): year-month and day-time
    // interval LITERAL arithmetic on timestamps, plus timestamp
    // subtraction yielding a day-time interval whose components are
    // extracted as integers. Interval values themselves never reach
    // the output (no stable cross-engine rendering); what leaves the
    // plan is timestamps and BIGINT components. Both engines clamp
    // month-adds to month end (Jan 31 + 1 month = Feb 29/28) and
    // split a negative difference into same-signed components, so
    // the anchor mid-range of the feed exercises both signs.
    "fn_interval_arith" -> ((s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          (col("ts_ts") + expr("INTERVAL '2-3' YEAR TO MONTH"))
            .as("plus_ym"),
          (col("ts_ts") + expr("INTERVAL '10 12:30:00' DAY TO SECOND"))
            .as("plus_dts"),
          expr("extract(DAY FROM (TIMESTAMP '2024-01-15 12:00:00' - ts_ts))")
            .cast(LongType).as("days_comp"),
          expr("extract(HOUR FROM (TIMESTAMP '2024-01-15 12:00:00' - ts_ts))")
            .cast(LongType).as("hours_comp"),
          expr("extract(MINUTE FROM (TIMESTAMP '2024-01-15 12:00:00' - ts_ts))")
            .cast(LongType).as("mins_comp"))
        .orderBy(col("event_id"))),

    "fn_math" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 1000.0).as("abs_diff"),
          // DuckDB ceil/floor return DOUBLE; Spark returns LONG — cast
          // both to BIGINT in the oracle.
          ceil(col("l_quantity")).as("qty_ceil"),
          floor(col("l_quantity")).as("qty_floor"),
          sqrt(col("l_quantity")).as("qty_sqrt"), // IEEE correctly-rounded
          pow(lit(2.0), col("l_linenumber")).as("pow2"), // exact powers of 2
          // ln/log10 are libm-dependent; round via exact double ops
          // (floor(x*1e6+0.5)/1e6) identically on both engines.
          (floor(log(col("l_quantity") + 1.0) * 1e6 + 0.5) / 1e6).as("ln6"),
          // decimal round (HALF_UP both engines), double output surface
          // (decimal outputs can't hash-match — Tables.moneySumD)
          round(money(col("l_extendedprice")), 1)
            .cast(DoubleType).as("price_r1"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod"))
        // lineitem (orderkey, linenumber) is non-unique — order by the
        // full output row for cross-engine stability.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("abs_diff"),
          col("qty_sqrt"), col("pow2"))),

    "fn_conditional_null" -> ((s, d) =>
      customer(s, d)
        .select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("NONE"))
            .as("seg_or_none"),
          greatest(col("c_acctbal"), lit(1000.0)).as("floor_bal"),
          least(col("c_acctbal"), lit(9000.0)).as("cap_bal"))
        .orderBy(col("c_custkey"))),

    "fn_array_ops" -> ((s, d) =>
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          array_contains(col("toks"), "spark").as("has_spark"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          array_join(slice(sort_array(col("toks")), 1, 5), ",").as("first5"))
        .orderBy(col("doc_id"))),

    // Padding / trimming surface (r8): lpad/rpad (fixed-width report
    // and key formatting), btrim with a custom character set, and
    // directional trims — the normalization scalars ingestion uses
    // before key comparison. All codegen'd built-ins, exact string
    // semantics in both engines.
    "fn_string_pad_trim" -> ((s, d) =>
      nation(s, d)
        .select(col("n_nationkey"),
          lpad(col("n_name"), 20, ".").as("padded_l"),
          rpad(col("n_name"), 20, "_").as("padded_r"),
          expr("btrim(n_name, 'AEIOU')").as("vowel_trimmed"),
          ltrim(rpad(col("n_name"), 20, " ")).as("space_roundtrip"))
        .orderBy(col("n_nationkey"))),

    // Array higher-order functions (r8): exists / forall / filter /
    // zip_with — the lambda surface fn_array_ops' plain builtins do
    // not touch. All codegen-adjacent built-ins (no UDF); the
    // zip_with demo multiplies per-token lengths against a ones
    // vector and folds, exercising the three-arg lambda form. DuckDB
    // has no exists/forall: the oracle spells them as
    // filter-count comparisons — semantics, not syntax, under test.
    "fn_array_higher_order" -> ((s, d) =>
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          expr("exists(toks, t -> length(t) > 8)").as("has_long"),
          expr("forall(toks, t -> length(t) > 1)").as("all_multi"),
          expr("size(filter(toks, t -> length(t) = 4))").cast("long")
            .as("n_four"),
          expr("aggregate(zip_with(transform(toks, t -> length(t)), " +
            "transform(toks, t -> 1), (a, b) -> a * b), 0, " +
            "(acc, x) -> acc + x)").cast("long").as("len_sum"))
        .orderBy(col("doc_id"))),

    // Word count via explode (Generator surface).
    "fn_explode_wordcount" -> ((s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)),

    // Map construction + element_at + explode to rows (stable output).
    "fn_map_ops" -> ((s, d) =>
      orders(s, d)
        .withColumn("m", map(
          lit("prio"), col("o_orderpriority"),
          lit("status"), col("o_orderstatus")))
        .withColumn("prio_v", element_at(col("m"), "prio"))
        .select(col("o_orderkey"), explode(col("m")).as(Seq("k", "v")),
          col("prio_v"))
        .orderBy(col("o_orderkey"), col("k"))),

    // The four higher-order MAP functions (r5) — transform_keys /
    // transform_values / map_filter / map_zip_with — the map-side
    // complement of the array lambdas used throughout; results
    // flattened to scalars via element_at/size so the oracle mirrors
    // the per-column arithmetic directly. All lambdas run inside
    // codegen'd MapObjects loops — a narrow map stage.
    "fn_map_higher_order" -> ((s, d) =>
      orders(s, d)
        .withColumn("m", map(
          lit("prio"), col("o_orderpriority"),
          lit("status"), col("o_orderstatus")))
        .withColumn("tv",
          expr("transform_values(m, (k, v) -> concat(k, ':', v))"))
        .select(col("o_orderkey"),
          expr("element_at(transform_keys(m, (k, v) -> upper(k)), 'PRIO')")
            .as("tk_prio"),
          expr("element_at(tv, 'status')").as("tv_status"),
          expr("size(map_filter(m, (k, v) -> k = 'prio'))").as("mf_size"),
          expr("element_at(map_zip_with(m, tv, (k, v1, v2) -> " +
            "concat(v1, '|', v2)), 'prio')").as("mz_prio"))
        .orderBy(col("o_orderkey"))),

    "fn_json" -> ((s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k_typed"))
        .orderBy(col("event_id"))),

    // VARIANT (r4, the Spark 4 semi-structured type): ingest the JSON
    // props column as VARIANT once, extract typed fields lazily with
    // variant_get — the open-schema path for feeds whose payload
    // evolves (vs fn_json's fixed-schema from_json). VARIANT's binary
    // encoding parses each document ONCE at ingest instead of once per
    // extraction — at 100 TB that is the difference between a parse
    // per column access and a pointer chase. The VARIANT itself never
    // leaves the plan (no stable cross-engine rendering); the extracted
    // typed columns pair with DuckDB's JSON operators exactly.
    "fn_variant" -> ((s, d) =>
      events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("cast(variant_get(v, '$.k', 'string') as string)")
            .as("k_str"),
          expr("variant_get(v, '$.missing') is null")
            .as("missing_is_null"))
        .orderBy(col("event_id"))),

    // Collated string semantics (r5, Spark 4 collation support):
    // grouping under UTF8_LCASE merges case variants WITHOUT
    // rewriting the data — the collation travels in the type, so
    // comparisons/joins/aggregations all honor it engine-wide (vs the
    // lower()-everywhere workaround, which loses the original values
    // and costs a projection per use). Mixed-case values are
    // synthesized from fixture columns; the output representative is
    // normalized with lower() because a collated GROUP BY keeps an
    // arbitrary case variant per group. Oracle: the lower() grouping
    // is semantically identical for ASCII inputs.
    "fn_collation" -> ((s, d) =>
      documents(s, d)
        .withColumn("src_mixed",
          when(col("doc_id") % 2 === 0, upper(col("source")))
            .otherwise(col("source")))
        .groupBy(expr("collate(src_mixed, 'UTF8_LCASE')").as("src_ci"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct_docs"))
        .select(lower(col("src_ci")).as("src_norm"), col("n_docs"),
          col("n_distinct_docs"))
        .orderBy(col("src_norm"))),

    // XML ingestion (r5, Spark 4 built-in XML support): per-row
    // records synthesized from fixture columns, parsed back BOTH ways
    // the engine offers — schema-full from_xml (struct extraction)
    // and XPath string lookup. The oracle mirrors the synthesis, so a
    // parser misread of any field hash-mismatches (same technique as
    // text_url_parse/mm_wav_meta). Narrow map, no shuffle but the
    // output sort.
    "fn_xml" -> ((s, d) =>
      nation(s, d)
        .withColumn("xml", concat(lit("<rec><k>"), col("n_nationkey"),
          lit("</k><name>"), col("n_name"), lit("</name><r>"),
          col("n_regionkey"), lit("</r></rec>")))
        .withColumn("p",
          expr("from_xml(xml, 'k BIGINT, name STRING, r BIGINT')"))
        .select(col("n_nationkey"), col("p.k").as("xml_k"),
          col("p.name").as("xml_name"), col("p.r").as("xml_r"),
          expr("xpath_string(xml, '/rec/name')").as("xp_name"))
        .orderBy(col("n_nationkey"))),

    "fn_struct_nested" -> ((s, d) =>
      customer(s, d)
        .withColumn("s", struct(col("c_nationkey").as("nkey"),
          col("c_acctbal").as("bal")))
        .select(
          col("c_custkey"),
          col("s").getField("nkey").as("nkey_out"),
          col("s").getField("bal").as("bal_out"))
        .orderBy(col("c_custkey"))),

    // Bitwise operators over integer keys.
    "fn_bitwise" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(lit(255L)).as("and_lo"),
          col("l_orderkey").bitwiseOR(lit(4096L)).as("or_hi"),
          col("l_orderkey").bitwiseXOR(col("l_linenumber").cast(LongType))
            .as("xored"),
          shiftleft(col("l_linenumber"), 3).as("shl3"),
          shiftright(col("l_orderkey"), 2).as("shr2"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("xored"))),

    // Cryptographic digests (content-addressing / dedup keys).
    "fn_hash_digest" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"))
        .orderBy(col("doc_id"))),

    // AES column-encryption round-trip (r9): encrypt the text column
    // (AES-128-ECB — the DETERMINISTIC mode; GCM's random IV would
    // make the ciphertext unhashable by design), decrypt it back, and
    // emit proofs the oracle can mirror WITHOUT implementing AES:
    // the PKCS5 ciphertext length is pure arithmetic over the
    // plaintext byte count (ASCII fixture ⇒ len == octet_length,
    // pinned by FixtureSchemaSpec), and the decrypted digest must
    // equal the original text's digest — the at-rest
    // PII-column-protection leg of a curation pipeline. ECB's
    // determinism is also its weakness (equal blocks leak equality);
    // production randomized modes are exactly the ones an exact
    // oracle cannot pair, which is why the roundtrip is the contract
    // here.
    "fn_aes_roundtrip" -> ((s, d) =>
      documents(s, d)
        .withColumn("cipher",
          expr("aes_encrypt(text, '0123456789abcdef', 'ECB')"))
        .select(col("doc_id"),
          length(col("cipher")).cast("long").as("n_cipher_bytes"),
          md5(expr(
            "cast(aes_decrypt(cipher, '0123456789abcdef', 'ECB') as string)"))
            .as("dec_md5"),
          (expr(
            "cast(aes_decrypt(cipher, '0123456789abcdef', 'ECB') as string)")
            === col("text")).as("roundtrips"))
        .orderBy(col("doc_id"))),

    // Base64 round-trip (r9): the text→binary→base64 encode/decode leg
    // of any wire/storage-format pipeline. This Spark build ships the
    // legacy CHUNKED (MIME, CRLF every 76 chars) base64 encoder, so
    // the canonical RFC 4648 form is recovered by stripping the fold
    // breaks — the chunking is pure presentation, the octets are
    // identical (unbase64 accepts both). The canonical STRING itself
    // is hash-compared against DuckDB's to_base64 — not just length
    // arithmetic — plus the decode-back digest proves losslessness.
    // Pure map stage.
    "fn_base64_roundtrip" -> ((s, d) =>
      documents(s, d)
        .withColumn("b64",
          regexp_replace(base64(col("text").cast("binary")), "\r\n", ""))
        .select(col("doc_id"), col("b64"),
          length(col("b64")).cast("long").as("n_b64_chars"),
          md5(unbase64(col("b64")).cast("string")).as("dec_md5"))
        .orderBy(col("doc_id"))),

    // Parse a delimited string column with an explicit schema
    // (from_csv — embedded delimited payloads without a re-read).
    "fn_from_csv" -> ((s, d) =>
      customer(s, d)
        .withColumn("line", concat_ws(",",
          col("c_custkey"), col("c_nationkey"), col("c_mktsegment")))
        .withColumn("parsed", from_csv(col("line"),
          StructType(Seq(
            StructField("id", LongType),
            StructField("nk", IntegerType),
            StructField("seg", StringType))),
          Map.empty[String, String]))
        .select(col("c_custkey"),
          col("parsed.id").as("id"), col("parsed.nk").as("nk"),
          col("parsed.seg").as("seg"))
        .orderBy(col("c_custkey"))),

    // Key=value string -> map -> typed lookups (str_to_map).
    "fn_str_to_map" -> ((s, d) =>
      orders(s, d)
        .withColumn("kv", concat(lit("status="), col("o_orderstatus"),
          lit(";prio="), col("o_orderpriority")))
        .withColumn("m", expr("str_to_map(kv, ';', '=')"))
        .select(col("o_orderkey"),
          element_at(col("m"), "status").as("status_val"),
          element_at(col("m"), "prio").as("prio_val"))
        .orderBy(col("o_orderkey"))),

    // try_cast: error-tolerant ingestion casts — malformed cells become
    // NULL instead of failing the job (at 100 TB scale SOME cell is
    // always malformed; a throwing cast is a job-killer, a try_cast is
    // a filterable quality signal). Columns cover all-succeed,
    // row-mixed, and all-fail cases.
    "fn_try_cast" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          expr("try_cast(substring(source, 4) AS INT)").as("src_num"),
          expr("try_cast(CASE WHEN doc_id % 2 = 0 THEN substring(source, 4) " +
            "ELSE lang END AS INT)").as("mixed_num"),
          expr("try_cast(lang AS INT)").as("never_num"),
          expr("try_cast(n_chars AS SMALLINT)").as("small_n"))
        .orderBy(col("doc_id"))),

    // try_* arithmetic (r8): ANSI mode (Spark 4 default) makes
    // overflow and division-by-zero hard ERRORS; the try_ family is
    // the per-row safety valve a dirty-data pipeline uses instead of
    // switching ANSI off globally — bad rows yield NULL, good rows
    // keep exact arithmetic. Columns cover div-by-zero (every doc_id
    // % 7 == 0 row), bigint multiply overflow (deterministic huge
    // factor), and the all-succeed control. DuckDB has no try_divide;
    // the oracle mirrors with explicit CASE guards — semantics, not
    // syntax, are under test.
    "fn_try_arith" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          expr("try_divide(n_chars, doc_id % 7)").as("div7"),
          // factor chosen so the int64 overflow threshold (307) falls
          // INSIDE the fixture's n_chars range — both outcomes occur
          expr("try_multiply(CAST(n_chars AS BIGINT), " +
            "CAST(30000000000000000 AS BIGINT))").as("mul_overflow"),
          expr("try_add(n_chars, doc_id)").as("add_ok"))
        .orderBy(col("doc_id"))),

    // stack(): generator that pivots N column groups into rows (the
    // inline-table cousin of unpivot).
    "fn_stack" -> ((s, d) =>
      nation(s, d)
        .select(col("n_nationkey"),
          expr("stack(2, 'name', n_name, 'region_key', cast(n_regionkey AS STRING))")
            .as(Seq("attr", "val")))
        .orderBy(col("n_nationkey"), col("attr"))),

    // split_part (r9): the positional field extractor both engines
    // ship under the SAME name and 1-based contract — the
    // delimited-code parse ('1-URGENT' → rank + label) that regex
    // capture groups over-solve. Aggregated so the dump stays a
    // |priorities|-row table at any scale.
    "fn_split_part" -> ((s, d) =>
      orders(s, d)
        .select(
          expr("split_part(o_orderpriority, '-', 1)").as("prio_rank"),
          expr("split_part(o_orderpriority, '-', 2)").as("prio_label"))
        .groupBy(col("prio_rank"), col("prio_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prio_rank"))),

    // Date-series generation (r9): per-row explode of a bounded date
    // range (order date → +3 days, the delivery-window expansion
    // every calendar join starts from). `sequence` + `explode` is
    // NARROW — each task expands its own rows, no shuffle, no
    // driver-side range; the per-row fan-out is the constant 4, so
    // output ∝ input at any corpus size. Keyed filter bounds the
    // dumped fixture slice.
    "fn_sequence_explode" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          explode(expr(
            "sequence(cast(o_orderdate as date), " +
              "date_add(cast(o_orderdate as date), 3), interval 1 day)"))
            .as("cal_day"))
        .orderBy(col("o_orderkey"), col("cal_day"))),

    // Rounding-mode semantics (r9): floor / ceil / HALF_UP round /
    // HALF_EVEN (banker's) bround / cast-truncation, exercised on
    // EXACT half-way doubles (k + 0.5 is exactly representable, so
    // both engines see the identical tie) in both signs — the
    // mode-mismatch class that silently skews financial aggregates.
    // DuckDB spells banker's rounding round_even; semantics, not
    // names, under test. Pure map stage collapsed to |k| rows.
    "fn_round_modes" -> ((s, d) =>
      orders(s, d)
        .select((col("o_orderkey") % 7).as("k"),
          (col("o_orderkey") % 7).cast("double").plus(lit(0.5)).as("v"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          min(col("v")).as("v"),
          min(floor(col("v"))).as("fl"),
          min(ceil(col("v"))).as("ce"),
          min(round(col("v"), 0)).cast("long").as("rd"),
          min(bround(col("v"), 0)).cast("long").as("brd"),
          min(round(-col("v"), 0)).cast("long").as("rd_neg"),
          min(bround(-col("v"), 0)).cast("long").as("brd_neg"),
          min(col("v").cast("long")).as("tr"),
          min((-col("v")).cast("long")).as("tr_neg"))
        .orderBy(col("k"))),

    // Character-level string surgery (r9): translate (per-char map),
    // overlay (splice a replacement into a position range), and
    // mask (the PII-redaction builtin: upper→X, lower→x, digit→n) —
    // the remaining string family the ETL surface lacked. DuckDB has
    // translate but neither overlay nor mask, so those mirror through
    // substring-concat and chained regexp_replace — semantics, not
    // names, under test. Aggregated to |priority| rows.
    "fn_string_surgery" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderpriority").as("p"))
        .select(col("p"),
          translate(col("p"), "-AEIOU", "_aeiou").as("translated"),
          expr("overlay(p PLACING '##' FROM 2 FOR 1)").as("spliced"),
          expr("mask(p)").as("masked"))
        .groupBy(col("p"), col("translated"), col("spliced"), col("masked"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("p")))
  )

  val oracle: Map[String, String] = Map(
    "fn_string_pad_trim" ->
      """SELECT n_nationkey,
        |  lpad(n_name, 20, '.') AS padded_l,
        |  rpad(n_name, 20, '_') AS padded_r,
        |  trim(n_name, 'AEIOU') AS vowel_trimmed,
        |  ltrim(rpad(n_name, 20, ' ')) AS space_roundtrip
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // exists/forall spelled as filter-count comparisons; zip_with via
    // list_zip's struct pairs
    "fn_array_higher_order" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |)
        |SELECT doc_id,
        |  len(list_filter(toks, x -> length(x) > 8)) > 0 AS has_long,
        |  len(list_filter(toks, x -> NOT length(x) > 1)) = 0 AS all_multi,
        |  CAST(len(list_filter(toks, x -> length(x) = 4)) AS BIGINT) AS n_four,
        |  CAST(list_sum(list_transform(
        |    list_zip(list_transform(toks, x -> length(x)),
        |             list_transform(toks, x -> 1)),
        |    p -> p[1] * p[2])) AS BIGINT) AS len_sum
        |FROM t ORDER BY doc_id""".stripMargin,
    // CASE-guard mirrors of the try_ semantics: div-by-zero and
    // past-threshold multiplies go NULL, everything else is the same
    // exact arithmetic (double division of integers is IEEE-exact)
    "fn_try_arith" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |       ELSE CAST(n_chars AS DOUBLE) / (doc_id % 7) END AS div7,
        |  CASE WHEN n_chars > 9223372036854775807 // 30000000000000000
        |       THEN NULL
        |       ELSE n_chars * 30000000000000000 END AS mul_overflow,
        |  CAST(n_chars + doc_id AS BIGINT) AS add_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_try_cast" ->
      """SELECT doc_id,
        |  TRY_CAST(substr(source, 4) AS INTEGER) AS src_num,
        |  TRY_CAST(CASE WHEN doc_id % 2 = 0 THEN substr(source, 4)
        |           ELSE lang END AS INTEGER) AS mixed_num,
        |  TRY_CAST(lang AS INTEGER) AS never_num,
        |  TRY_CAST(n_chars AS SMALLINT) AS small_n
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_string_basic" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  length(c_name) AS len, substring(c_name, 1, 8) AS sub8,
        |  concat_ws('-', c_mktsegment, c_name) AS tagged,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_string_regex" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
        |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  strpos(p_name, 'red') AS red_at
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date_extract" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m, day(o_orderdate) AS dom,
        |  dayofweek(o_orderdate) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_date_arith" ->
      """SELECT o_orderkey,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS plus_30,
        |  CAST(date_diff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS months_since,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_interval_arith" ->
      """WITH e AS (SELECT event_id, make_timestamp(epoch_us(ts)) AS t FROM events)
        |SELECT event_id,
        |  t + INTERVAL '2 years 3 months' AS plus_ym,
        |  t + INTERVAL '10 days 12 hours 30 minutes' AS plus_dts,
        |  CAST(extract(day FROM (TIMESTAMP '2024-01-15 12:00:00' - t)) AS BIGINT) AS days_comp,
        |  CAST(extract(hour FROM (TIMESTAMP '2024-01-15 12:00:00' - t)) AS BIGINT) AS hours_comp,
        |  CAST(extract(minute FROM (TIMESTAMP '2024-01-15 12:00:00' - t)) AS BIGINT) AS mins_comp
        |FROM e ORDER BY event_id""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_extendedprice - 1000.0) AS abs_diff,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  power(2.0, l_linenumber) AS pow2,
        |  floor(ln(l_quantity + 1.0) * 1e6 + 0.5) / 1e6 AS ln6,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, abs_diff, qty_sqrt, pow2""".stripMargin,
    "fn_conditional_null" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_or_none,
        |  greatest(c_acctbal, 1000.0) AS floor_bal,
        |  least(c_acctbal, 9000.0) AS cap_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array_ops" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_toks,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |  array_to_string((list_sort(string_split(text, ' ')))[1:5], ',') AS first5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_explode_wordcount" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> '' GROUP BY token
        |ORDER BY n DESC, token ASC""".stripMargin,
    // Each lambda's effect is a pure per-column expression over the
    // two map entries, so the mirror needs no map type at all.
    "fn_map_higher_order" ->
      """SELECT o_orderkey,
        |  o_orderpriority AS tk_prio,
        |  'status:' || o_orderstatus AS tv_status,
        |  CAST(1 AS INT) AS mf_size,
        |  o_orderpriority || '|' || 'prio:' || o_orderpriority AS mz_prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_map_ops" ->
      """SELECT o_orderkey, k, v, o_orderpriority AS prio_v FROM (
        |  SELECT o_orderkey, 'prio' AS k, o_orderpriority AS v, o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'status' AS k, o_orderstatus AS v, o_orderpriority FROM orders) t
        |ORDER BY o_orderkey, k""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
        |FROM events ORDER BY event_id""".stripMargin,
    // For ASCII inputs UTF8_LCASE grouping ≡ lower() grouping.
    "fn_collation" ->
      """WITH m AS (
        |  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN upper(source)
        |    ELSE source END AS src_mixed
        |  FROM documents)
        |SELECT lower(src_mixed) AS src_norm,
        |  count(*) AS n_docs,
        |  count(DISTINCT doc_id) AS n_distinct_docs
        |FROM m GROUP BY lower(src_mixed) ORDER BY src_norm""".stripMargin,
    // Mirrors the XML synthesis (nation names are XML-safe: letters
    // and spaces only), not the parser.
    "fn_xml" ->
      """SELECT n_nationkey,
        |  n_nationkey AS xml_k,
        |  n_name AS xml_name,
        |  n_regionkey AS xml_r,
        |  n_name AS xp_name
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract(props, '$.missing') IS NULL AS missing_is_null
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_struct_nested" ->
      """SELECT c_custkey, c_nationkey AS nkey_out,
        |  c_acctbal AS bal_out
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS and_lo,
        |  l_orderkey | 4096 AS or_hi,
        |  xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS xored,
        |  l_linenumber << 3 AS shl3,
        |  l_orderkey >> 2 AS shr2
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, xored""".stripMargin,
    "fn_hash_digest" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    // no AES needed: PKCS5 length is arithmetic, the decrypted digest
    // is the original digest iff the round-trip is lossless
    "fn_aes_roundtrip" ->
      """SELECT doc_id,
        |  CAST(16 * (len(text) // 16 + 1) AS BIGINT) AS n_cipher_bytes,
        |  md5(text) AS dec_md5,
        |  true AS roundtrips
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_base64_roundtrip" ->
      """SELECT doc_id, to_base64(encode(text)) AS b64,
        |  CAST(len(to_base64(encode(text))) AS BIGINT) AS n_b64_chars,
        |  md5(decode(from_base64(to_base64(encode(text))))) AS dec_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_from_csv" ->
      """SELECT c_custkey, c_custkey AS id, c_nationkey AS nk,
        |  c_mktsegment AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_str_to_map" ->
      """SELECT o_orderkey, o_orderstatus AS status_val,
        |  o_orderpriority AS prio_val
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_stack" ->
      """SELECT n_nationkey, 'name' AS attr, n_name AS val FROM nation
        |UNION ALL
        |SELECT n_nationkey, 'region_key', CAST(n_regionkey AS VARCHAR) FROM nation
        |ORDER BY n_nationkey, attr""".stripMargin,
    // same function name, same 1-based positional contract
    "fn_split_part" ->
      """SELECT split_part(o_orderpriority, '-', 1) AS prio_rank,
        |  split_part(o_orderpriority, '-', 2) AS prio_label,
        |  count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY prio_rank""".stripMargin,
    // generate_series is inclusive on both ends, like Spark sequence
    "fn_sequence_explode" ->
      """SELECT o_orderkey,
        |  CAST(unnest(generate_series(CAST(o_orderdate AS DATE),
        |    CAST(o_orderdate AS DATE) + INTERVAL 3 DAY,
        |    INTERVAL 1 DAY)) AS DATE) AS cal_day
        |FROM orders WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey, cal_day""".stripMargin,
    // round = half away from zero on both engines' doubles (Spark
    // HALF_UP on the exact binary value ≡ DuckDB half-away for ties);
    // bround ≡ round_even. Spark's double→int CAST truncates toward
    // zero but DuckDB's ROUNDS half-even (3.9→4, 2.5→2) — exactly the
    // mode-mismatch class this operator pins, so the truncation legs
    // mirror through explicit trunc()
    "fn_round_modes" ->
      """WITH v AS (
        |  SELECT o_orderkey % 7 AS k,
        |    CAST(o_orderkey % 7 AS DOUBLE) + 0.5 AS v
        |  FROM orders
        |)
        |SELECT k, count(*) AS n, min(v) AS v,
        |  CAST(min(floor(v)) AS BIGINT) AS fl,
        |  CAST(min(ceil(v)) AS BIGINT) AS ce,
        |  CAST(min(round(v, 0)) AS BIGINT) AS rd,
        |  CAST(min(round_even(v, 0)) AS BIGINT) AS brd,
        |  CAST(min(round(-v, 0)) AS BIGINT) AS rd_neg,
        |  CAST(min(round_even(-v, 0)) AS BIGINT) AS brd_neg,
        |  CAST(min(trunc(v)) AS BIGINT) AS tr,
        |  CAST(min(trunc(-v)) AS BIGINT) AS tr_neg
        |FROM v GROUP BY k ORDER BY k""".stripMargin,
    // overlay ≡ substring splice; mask ≡ three chained char-class
    // regexp_replace passes (X/x/n)
    "fn_string_surgery" ->
      """WITH t AS (
        |  SELECT o_orderpriority AS p,
        |    translate(o_orderpriority, '-AEIOU', '_aeiou') AS translated,
        |    substring(o_orderpriority, 1, 1) || '##' ||
        |      substring(o_orderpriority, 3) AS spliced,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      o_orderpriority, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
        |      '[0-9]', 'n', 'g') AS masked
        |  FROM orders
        |)
        |SELECT p, translated, spliced, masked, count(*) AS n
        |FROM t GROUP BY 1, 2, 3, 4 ORDER BY p""".stripMargin
  )
}
