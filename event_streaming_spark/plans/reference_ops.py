"""Queries porting the reference's own operator semantics (SURVEY §2.2/2.3).

Each query is the oracle-checkable relational restatement of a concrete
reference behavior, cited per query.  Fixtures: FIXTURES.md §B — synthesized
here from the driver tables (deterministically) since only §A tables exist
on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.operators.dedup import dedup_keep_first, dedup_keep_latest
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# O23 discard-first dedup policy (email-sender.c:122-124): first event per
# (user_id, event_type) by (ts, event_id).
# ---------------------------------------------------------------------------

_DEDUP_FIRST_ORACLE = """
SELECT user_id, event_type, event_id,
       epoch_ms(date_trunc('millisecond', ts)) AS ts_ms
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


@register("dedup_keep_first_event", _DEDUP_FIRST_ORACLE, tags=("dedup", "reference"))
def dedup_keep_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = dedup_keep_first(ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")])
    return out.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_millis(F.date_trunc("millisecond", F.col("ts"))).alias("ts_ms"),
    )


# ---------------------------------------------------------------------------
# O23 replace-with-latest policy + O27 keep-latest header map
# (email-sender.c:125-128, :208-212): latest value/props per key.
# ---------------------------------------------------------------------------

_DEDUP_LATEST_ORACLE = """
SELECT user_id, event_type, event_id, value,
       cast(json_extract_string(props, '$.k') as int) AS latest_k
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("dedup_keep_latest_event", _DEDUP_LATEST_ORACLE, tags=("dedup", "reference"))
def dedup_keep_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = dedup_keep_latest(ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")])
    return out.select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("latest_k"),
    )


# ---------------------------------------------------------------------------
# O41-O43: recipient-list folding — sorted collect per group, conditional
# routing, ", " separator (email-sender.c:414-434).  bcc-exclusion becomes
# the category filter.
# ---------------------------------------------------------------------------

_FOLD_ORACLE = """
SELECT n_nationkey AS nation_key,
       string_agg(c_name, ', ' ORDER BY c_custkey) FILTER (WHERE c_mktsegment <> 'MACHINERY') AS visible_list,
       string_agg(c_name, ', ' ORDER BY c_custkey) FILTER (WHERE c_mktsegment = 'MACHINERY') AS machinery_list,
       count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_nationkey
"""


@register("fold_concat_recipients", _FOLD_ORACLE, tags=("reference", "agg", "string"))
def fold_concat_recipients(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    def folded(pred) -> F.Column:
        pairs = F.array_sort(
            F.collect_list(F.when(pred, F.struct(F.col("c_custkey"), F.col("c_name"))))
        )
        return F.nullif(F.array_join(F.transform(pairs, lambda s: s.c_name), ", "), F.lit(""))

    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nation_key"))
        .agg(
            folded(F.col("c_mktsegment") != "MACHINERY").alias("visible_list"),
            folded(F.col("c_mktsegment") == "MACHINERY").alias("machinery_list"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# O47 address parse + O46 enum dict: synthesize `name (comment) <email>`
# addresses, parse them back with regexp_extract (the reference declares the
# parsed-out fields but never implemented the parser — email-sender.h:66-77).
# ---------------------------------------------------------------------------

_ADDR_ORACLE = """
WITH addrs AS (
  SELECT c_custkey,
         c_name || ' (' || c_mktsegment || ') <cust' || c_custkey || '@example.com>' AS addr
  FROM customer
)
SELECT c_custkey, addr,
       regexp_extract(addr, '^(.*?) \\((.*)\\) <(.+)>$', 1) AS display_name,
       regexp_extract(addr, '^(.*?) \\((.*)\\) <(.+)>$', 2) AS comment,
       regexp_extract(addr, '^(.*?) \\((.*)\\) <(.+)>$', 3) AS email_addr
FROM addrs
"""


@register("scalar_address_parse", _ADDR_ORACLE, tags=("reference", "string", "regex"))
def scalar_address_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    addr = F.concat(
        F.col("c_name"),
        F.lit(" ("),
        F.col("c_mktsegment"),
        F.lit(") <cust"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com>"),
    )
    pat = r"^(.*?) \((.*)\) <(.+)>$"
    df = cust.withColumn("addr", addr)
    return df.select(
        "c_custkey",
        "addr",
        F.regexp_extract("addr", pat, 1).alias("display_name"),
        F.regexp_extract("addr", pat, 2).alias("comment"),
        F.regexp_extract("addr", pat, 3).alias("email_addr"),
    )


# ---------------------------------------------------------------------------
# O34 canned regex corpus + O33 capture groups: the reference's validation
# patterns (utils/regex.c:196-217) applied as rlike filters over synthesized
# and natural columns.
# ---------------------------------------------------------------------------

_REGEX_ORACLE = """
SELECT p_partkey, p_name, p_brand,
       regexp_matches(p_name, '^(red|blue|green) ') AS is_colored,
       regexp_matches(p_brand, '^Brand#[0-9]+$') AS brand_valid,
       cast(regexp_extract(p_brand, '^Brand#([0-9]+)$', 1) as int) AS brand_num,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_words
FROM part
WHERE regexp_matches(p_name, '(widget|gizmo|gadget)$')
"""


@register("regex_canned_patterns", _REGEX_ORACLE, tags=("reference", "regex"))
def regex_canned_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.filter(F.col("p_name").rlike(r"(widget|gizmo|gadget)$")).select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.col("p_name").rlike(r"^(red|blue|green) ").alias("is_colored"),
        F.col("p_brand").rlike(r"^Brand#[0-9]+$").alias("brand_valid"),
        F.regexp_extract("p_brand", r"^Brand#([0-9]+)$", 1).cast("int").alias("brand_num"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[a-z]+"), 0)).alias("n_words"),
    )


# ---------------------------------------------------------------------------
# O45 record serialization + O44 dot-stuffing escape + O36 RFC-2822-ish
# date: compose a full message payload per order (email-sender.c:387-495).
# ---------------------------------------------------------------------------

_SERIALIZE_ORACLE = """
SELECT o_orderkey,
       'Date: ' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || chr(13) || chr(10) ||
       'From: orders@example.com' || chr(13) || chr(10) ||
       'To: cust' || o_custkey || '@example.com' || chr(13) || chr(10) ||
       'Subject: order ' || o_orderkey || ' [' || o_orderpriority || ']' || chr(13) || chr(10) ||
       chr(13) || chr(10) ||
       replace('total: ' || cast(round(o_totalprice, 2) as varchar) || ' status ' || o_orderstatus,
               '.', '..') AS payload
FROM orders
WHERE o_orderkey % 100 = 0
"""


@register("serialize_order_payload", _SERIALIZE_ORACLE, tags=("reference", "string"))
def serialize_order_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    crlf = "\r\n"
    body = F.concat(
        F.lit("total: "),
        F.round(F.col("o_totalprice"), 2).cast("string"),
        F.lit(" status "),
        F.col("o_orderstatus"),
    )
    payload = F.concat(
        F.lit("Date: "),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.lit(crlf),
        F.lit("From: orders@example.com"),
        F.lit(crlf),
        F.lit("To: cust"),
        F.col("o_custkey").cast("string"),
        F.lit("@example.com"),
        F.lit(crlf),
        F.lit("Subject: order "),
        F.col("o_orderkey").cast("string"),
        F.lit(" ["),
        F.col("o_orderpriority"),
        F.lit("]"),
        F.lit(crlf),
        F.lit(crlf),
        F.replace(body, F.lit("."), F.lit("..")),
    )
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", payload.alias("payload")
    )


# ---------------------------------------------------------------------------
# O40 trim + O22 KV pairs as map + O29 ordered foreach (sorted map emit):
# build a map per row, emit entries in key order.
# ---------------------------------------------------------------------------

_KVMAP_ORACLE = """
SELECT s_suppkey,
       trim('  ' || s_name || '  ') AS name_trimmed,
       ltrim('  ' || s_name) AS name_ltrimmed,
       rtrim(s_name || '  ') AS name_rtrimmed,
       'acctbal=' || cast(round(s_acctbal,2) as varchar) || ',nation=' || cast(s_nationkey as varchar)
         AS kv_sorted
FROM supplier
"""


@register("scalar_trim_and_kv_emit", _KVMAP_ORACLE, tags=("reference", "string"))
def scalar_trim_and_kv_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    m = F.create_map(
        F.lit("nation"), F.col("s_nationkey").cast("string"),
        F.lit("acctbal"), F.round(F.col("s_acctbal"), 2).cast("string"),
    )
    entries = F.array_sort(F.map_entries(m))  # ordered foreach = sorted entry emit (O29)
    kv = F.array_join(F.transform(entries, lambda e: F.concat(e.key, F.lit("="), e.value)), ",")
    return supp.select(
        "s_suppkey",
        F.trim(F.concat(F.lit("  "), F.col("s_name"), F.lit("  "))).alias("name_trimmed"),
        F.ltrim(F.concat(F.lit("  "), F.col("s_name"))).alias("name_ltrimmed"),
        F.rtrim(F.concat(F.col("s_name"), F.lit("  "))).alias("name_rtrimmed"),
        kv.alias("kv_sorted"),
    )


# ---------------------------------------------------------------------------
# O49 uuid: deterministic uuid-shaped id derived from md5 (the reference
# mints random uuids for jti, tests/test-jwt.c:145-147; a deterministic
# variant keeps the oracle checkable — format 8-4-4-4-12 from the digest).
# ---------------------------------------------------------------------------

_UUID_ORACLE = """
SELECT o_orderkey,
       substr(md5('jti:' || o_orderkey), 1, 8) || '-' ||
       substr(md5('jti:' || o_orderkey), 9, 4) || '-' ||
       substr(md5('jti:' || o_orderkey), 13, 4) || '-' ||
       substr(md5('jti:' || o_orderkey), 17, 4) || '-' ||
       substr(md5('jti:' || o_orderkey), 21, 12) AS jti
FROM orders WHERE o_orderkey < 100
"""


@register("scalar_deterministic_uuid", _UUID_ORACLE, tags=("reference", "scalar"))
def scalar_deterministic_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    d = F.md5(F.concat(F.lit("jti:"), F.col("o_orderkey").cast("string")))
    jti = F.concat_ws(
        "-",
        F.substring(d, 1, 8),
        F.substring(d, 9, 4),
        F.substring(d, 13, 4),
        F.substring(d, 17, 4),
        F.substring(d, 21, 12),
    )
    return orders.select("o_orderkey", jti.alias("jti"))


# ---------------------------------------------------------------------------
# O19 resumable sorted iterator → keyset pagination (ORDER BY + LIMIT/OFFSET
# is the driver-friendly phrasing; at scale, keyset predicates beat OFFSET).
# ---------------------------------------------------------------------------

_PAGE_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 20 OFFSET 40
"""


@register("sorted_iter_page3", _PAGE_ORACLE, tags=("reference", "sort"))
def sorted_iter_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .offset(40)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# O6/O17 point lookup on a composite key (tfind on (broker, topic) →
# filter on (user_id, event_type)).
# ---------------------------------------------------------------------------

_LOOKUP_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE user_id = 42 AND event_type = 'purchase'
"""


@register("point_lookup_composite_key", _LOOKUP_ORACLE, tags=("reference", "scan"))
def point_lookup_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.filter((F.col("user_id") == 42) & (F.col("event_type") == "purchase")).select(
        "event_id", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# O48 varargs fan-in with duplicate counting: the reference's
# add_recipents(to, a1, a2, ..., NULL) loop counts how many inserts were
# duplicates (email-sender.c:315-334).  Relational form: explode a
# synthesized per-row address array (with deliberate dups), dedup per
# message, report kept vs duplicate counts.
# ---------------------------------------------------------------------------

_FANIN_ORACLE = """
WITH fanned AS (
  SELECT o_orderkey,
         unnest(['cust' || o_custkey || '@example.com',
                 'sales@example.com',
                 'cust' || o_custkey || '@example.com',   -- duplicate
                 'archive@example.com']) AS addr
  FROM orders WHERE o_orderkey < 200
)
SELECT o_orderkey,
       count(*) AS n_given,
       count(DISTINCT addr) AS n_kept,
       count(*) - count(DISTINCT addr) AS n_duplicates
FROM fanned
GROUP BY o_orderkey
"""


@register("varargs_fanin_dedup_count", _FANIN_ORACLE, tags=("reference", "dedup"))
def varargs_fanin_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    cust_addr = F.concat(F.lit("cust"), F.col("o_custkey").cast("string"), F.lit("@example.com"))
    fanned = orders.select(
        "o_orderkey",
        F.explode(
            F.array(cust_addr, F.lit("sales@example.com"), cust_addr, F.lit("archive@example.com"))
        ).alias("addr"),
    )
    return fanned.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_given"),
        F.countDistinct("addr").alias("n_kept"),
        (F.count(F.lit(1)) - F.countDistinct("addr")).alias("n_duplicates"),
    )
