package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.G — scalar functions: string / date / math / array / map /
  * json, CASE/cast, a registered Scala UDF, and a generator (UDTF surface).
  *
  * All of these are per-row projections — embarrassingly parallel, inside
  * whole-stage codegen (except the two declared UDF/generator rows, which
  * exist precisely to prove the extension surface). Determinism contract
  * §2.0: libm outputs rounded to 4dp, no double→int casts (Spark truncates,
  * DuckDB rounds — floor first instead).
  */
object ScalarFnOps {

  /** L2 norm with an index-ascending fold — same accumulation order as the
    * DuckDB twin, round(4) absorbs ulps (SURVEY §7.3.7). */
  private val l2norm = udf { (a: Seq[Float]) =>
    var s = 0.0; var i = 0
    while (i < a.length) { val x = a(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
                upper(col("c_name")).as("up"),
                lower(col("c_name")).as("lo"),
                substring(col("c_name"), 1, 8).as("sub"),
                length(col("c_name")).as("len"),
                trim(lit("  pad  ")).as("trimmed"),
                lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
                concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
                regexp_replace(col("c_name"), "0", "_").as("replaced"),
                regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey")),
    "fn_date" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
                year(col("o_orderdate")).as("y"),
                month(col("o_orderdate")).as("m"),
                dayofmonth(col("o_orderdate")).as("dom"),
                date_trunc("month", col("o_orderdate")).as("month_start"),
                date_add(to_date(col("o_orderdate")), 30).as("plus30"),
                datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy("o_orderkey")),
    "fn_math" -> ((s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"),
                abs(col("p_size") - 25).as("abs_sz"),
                // Spark floor/ceil return BIGINT, DuckDB's return DOUBLE —
                // emit DOUBLE on both sides (lossless: values are integral)
                floor(col("p_retailprice")).cast("double").as("floor_p"),
                ceil(col("p_retailprice")).cast("double").as("ceil_p"),
                pmod(col("p_partkey"), lit(7)).as("mod7"),
                graft.Det.r(col("p_retailprice"), 1).as("round1"),
                graft.Det.r(log(col("p_retailprice")), 4).as("ln_p"),
                graft.Det.r(sqrt(col("p_retailprice")), 4).as("sqrt_p"))
        .orderBy("p_partkey")),
    "fn_bitwise" -> ((s, d) =>
      // Bitwise surface — the hash/partition/bloom primitives (AND mask,
      // OR tag, XOR mix, shifts, popcount). Pure map-side projections:
      // codegen'd, shuffle-free. bit_count emits INT on both engines
      // (DuckDB's native return is TINYINT — cast in the oracle).
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_orderkey").bitwiseAND(lit(255L)).as("b_and"),
                col("l_orderkey").bitwiseOR(lit(4096L)).as("b_or"),
                col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
                shiftleft(col("l_linenumber"), 3).as("b_shl"),
                shiftright(col("l_orderkey"), 2).as("b_shr"),
                bit_count(col("l_orderkey")).as("b_cnt"))
        // (l_orderkey, l_linenumber) is not unique in the fixture — order
        // by every emitted column so remaining ties are full-row dups
        .orderBy("l_orderkey", "l_linenumber", "b_xor", "b_shl")),
    "fn_array" -> ((s, d) =>
      Tables(s, d, "embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"),
                posexplode(slice(col("embedding"), 1, 8)))
        .select(col("vec_id"), col("dim"), col("pos"),
                graft.Det.r(col("col").cast("double"), 4).as("v"))
        .orderBy("vec_id", "pos")),
    "fn_json" -> ((s, d) =>
      Tables(s, d, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"),
             graft.Det.davg(col("k")).as("avg_k"))
        .orderBy("event_type")),
    "fn_case_cast" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
                when(col("c_acctbal") < 0, "neg")
                  .when(col("c_acctbal") < 5000, "mid")
                  .otherwise("high").as("tier"),
                coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("UNKNOWN")).as("seg"),
                floor(col("c_acctbal")).cast("long").as("bal_floor"),
                // decimal(18,2) cast exercises HALF_UP rounding; emit DOUBLE
                // (decimal renderings are not hash-stable across engines)
                col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal_dec"),
                col("c_custkey").cast("string").as("key_str"))
        .orderBy("c_custkey")),
    "fn_map_struct" -> ((s, d) =>
      // map + struct construction/access (§2.G complex-type surface):
      // build per-row MAP and STRUCT, extract fields, enumerate keys.
      // DuckDB's m['k'] yields a 1-element list (extracted with [1] in
      // the twin); keys are sorted on both sides so key order is never
      // engine-defined.
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
                map_from_arrays(array(lit("s"), lit("p")),
                                array(col("o_orderstatus"), col("o_orderpriority"))).as("m"),
                struct(col("o_custkey").as("k"), col("o_totalprice").as("tp")).as("st"))
        .select(col("o_orderkey"),
                expr("m['s']").as("status"),
                expr("m['p']").as("prio"),
                size(col("m")).as("n_keys"),
                array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
                col("st.k").as("custkey"),
                col("st.tp").cast("double").as("totalprice"))
        .orderBy("o_orderkey", "custkey")),
    "udf_scalar" -> ((s, d) =>
      Tables(s, d, "embeddings")
        .select(col("vec_id"), graft.Det.r(l2norm(col("embedding")), 4).as("norm"))
        .orderBy("vec_id")),
    "udtf_char_ngrams" -> ((s, d) => {
      // native Generator expression (graft.expr.CharNGrams) — the UDTF
      // surface without explode(udf) row materialization
      graft.expr.GraftFunctions.register(s)
      Tables(s, d, "documents")
        .select(expr("char_ngrams(text, 3)"))
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram")).limit(20)
    }),
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      ("SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo, " +
        "substring(c_name, 1, 8) AS sub, CAST(length(c_name) AS INT) AS len, " +
        "trim('  pad  ') AS trimmed, lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded, " +
        "concat_ws('|', c_name, c_mktsegment) AS joined, " +
        "regexp_replace(c_name, '0', '_', 'g') AS replaced, " +
        "regexp_extract(c_name, '([0-9]+)', 1) AS digits " +
        "FROM customer ORDER BY c_custkey"),
    "fn_date" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, " +
        "CAST(month(o_orderdate) AS INT) AS m, CAST(day(o_orderdate) AS INT) AS dom, " +
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, " +
        "CAST(o_orderdate AS DATE) + 30 AS plus30, " +
        "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) " +
        "AS days_since FROM orders ORDER BY o_orderkey"),
    "fn_math" ->
      ("SELECT p_partkey, CAST(abs(p_size - 25) AS INT) AS abs_sz, " +
        "floor(p_retailprice) AS floor_p, ceil(p_retailprice) AS ceil_p, " +
        "CAST(p_partkey % 7 AS BIGINT) AS mod7, " +
        graft.Det.sql.r("p_retailprice", 1) + " AS round1, " +
        graft.Det.sql.r("ln(p_retailprice)", 4) + " AS ln_p, " +
        graft.Det.sql.r("sqrt(p_retailprice)", 4) + " AS sqrt_p " +
        "FROM part ORDER BY p_partkey"),
    "fn_bitwise" ->
      ("SELECT l_orderkey, l_linenumber, l_orderkey & 255 AS b_and, " +
        "l_orderkey | 4096 AS b_or, xor(l_orderkey, l_partkey) AS b_xor, " +
        "CAST(l_linenumber << 3 AS INT) AS b_shl, l_orderkey >> 2 AS b_shr, " +
        "CAST(bit_count(l_orderkey) AS INT) AS b_cnt " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, b_xor, b_shl"),
    "fn_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INT) AS dim, CAST(g.i - 1 AS INT) AS pos, " +
        graft.Det.sql.r("CAST(embedding[g.i] AS DOUBLE)", 4) + " AS v " +
        "FROM embeddings, generate_series(1, 8) g(i) ORDER BY vec_id, pos"),
    "fn_json" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(min(json_extract_string(props, '$.k')::INT) AS INT) AS min_k, " +
        "CAST(max(json_extract_string(props, '$.k')::INT) AS INT) AS max_k, " +
        graft.Det.sql.davg("json_extract_string(props, '$.k')::INT") + " AS avg_k " +
        "FROM events GROUP BY 1 ORDER BY event_type"),
    "fn_case_cast" ->
      ("SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'neg' " +
        "WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier, " +
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg, " +
        "CAST(floor(c_acctbal) AS BIGINT) AS bal_floor, " +
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal_dec, " +
        "CAST(c_custkey AS VARCHAR) AS key_str FROM customer ORDER BY c_custkey"),
    "fn_map_struct" ->
      ("SELECT o_orderkey, m['s'][1] AS status, m['p'][1] AS prio, " +
        "CAST(cardinality(m) AS INT) AS n_keys, " +
        "array_to_string(list_sort(map_keys(m)), ',') AS keys, " +
        "st.k AS custkey, CAST(st.tp AS DOUBLE) AS totalprice FROM (" +
        "SELECT o_orderkey, MAP {'s': o_orderstatus, 'p': o_orderpriority} AS m, " +
        "struct_pack(k := o_custkey, tp := o_totalprice) AS st FROM orders) " +
        "ORDER BY o_orderkey, custkey"),
    "udf_scalar" ->
      ("SELECT vec_id, " +
        graft.Det.sql.r("sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
          "CAST(embedding AS DOUBLE[])))", 4) + " AS norm FROM embeddings ORDER BY vec_id"),
    "udtf_char_ngrams" ->
      ("SELECT gram, count(*) AS cnt FROM (SELECT substring(text, i, 3) AS gram FROM " +
        "(SELECT text, unnest(generate_series(1, greatest(length(text) - 2, 0))) AS i " +
        "FROM documents)) GROUP BY 1 ORDER BY cnt DESC, gram LIMIT 20"),
  )
}
