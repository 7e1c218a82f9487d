"""Scalar / parse operators (§2.C) over documents + events — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

import tempfile
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from spider_spark import parse, textops, webindex
from spider_spark.canon import canonical_col, host_col
from spider_spark.registry._base import T, q


# =====================================================================
# Scalar / parse operators (§2.C) over documents + events
# =====================================================================

@q(
    "ts_convert",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           floor(epoch(ts))::BIGINT AS epoch_s,
           strftime(ts + 8 * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M') AS ts_cn
    FROM events
    """,
)
def ts_convert(spark, sf_dir):
    """C9: epoch/ISO → formatted strings, +8h shift (抖音.py:37-40,
    Kline_analyze.py:40-43)."""
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format(F.col("ts") + F.expr("INTERVAL 8 HOURS"), "yyyy-MM-dd HH:mm").alias("ts_cn"),
    )


_NOW = "2026-06-01 10:00:00"

@q(
    "relative_date_norm",
    f"""
    WITH r AS (
      SELECT event_id,
             CASE event_id % 4
               WHEN 0 THEN '刚刚'
               WHEN 1 THEN ((event_id % 59) + 1)::VARCHAR || '分钟前'
               WHEN 2 THEN '昨天'
               ELSE lpad(((event_id % 12) + 1)::VARCHAR, 2, '0') || '-' ||
                    lpad(((event_id % 28) + 1)::VARCHAR, 2, '0')
             END AS rel
      FROM events)
    SELECT event_id, rel,
           CASE
             WHEN rel = '刚刚' THEN strftime(TIMESTAMP '{_NOW}', '%Y-%m-%d %H:%M')
             WHEN rel LIKE '%分钟前' THEN strftime(
                TIMESTAMP '{_NOW}' - CAST(regexp_extract(rel, '(\\d+)', 1) AS BIGINT) * INTERVAL 1 MINUTE,
                '%Y-%m-%d %H:%M')
             WHEN rel = '昨天' THEN strftime(TIMESTAMP '{_NOW}' - INTERVAL 1 DAY, '%Y-%m-%d') || ' 00:00'
             ELSE '2026-' || rel || ' 00:00'
           END AS norm
    FROM r
    """,
)
def relative_date_norm(spark, sf_dir):
    """C8: '刚刚/N分钟前/昨天/MM-DD' → absolute '%Y-%m-%d %H:%M' strings
    (weibo/pipelines.py:24-38, with §2.H.6's 昨天 TypeError fixed), against
    a frozen now for determinism."""
    ev = T(spark, sf_dir, "events")
    rel = (
        F.when(F.col("event_id") % 4 == 0, F.lit("刚刚"))
        .when(F.col("event_id") % 4 == 1, F.concat(((F.col("event_id") % 59) + 1).cast("string"), F.lit("分钟前")))
        .when(F.col("event_id") % 4 == 2, F.lit("昨天"))
        .otherwise(
            F.concat(
                F.lpad(((F.col("event_id") % 12) + 1).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad(((F.col("event_id") % 28) + 1).cast("string"), 2, "0"),
            )
        )
    )
    d = ev.select("event_id", rel.alias("rel"))
    now = F.lit(_NOW).cast("timestamp")
    mins = F.regexp_extract(F.col("rel"), r"(\d+)", 1).cast("long")
    norm = (
        F.when(F.col("rel") == "刚刚", F.date_format(now, "yyyy-MM-dd HH:mm"))
        .when(
            F.col("rel").endswith("分钟前"),
            F.date_format(F.timestamp_seconds(F.unix_timestamp(now) - mins * 60), "yyyy-MM-dd HH:mm"),
        )
        .when(F.col("rel") == "昨天", F.concat(F.date_format(F.date_sub(now, 1), "yyyy-MM-dd"), F.lit(" 00:00")))
        .otherwise(F.concat(F.lit("2026-"), F.col("rel"), F.lit(" 00:00")))
    )
    return d.select("event_id", "rel", norm.alias("norm"))


@q(
    "json_projection",
    """
    SELECT event_id, CAST(props->>'k' AS BIGINT) AS k,
           CASE WHEN CAST(props->>'k' AS BIGINT) >= 50 THEN 'hi' ELSE 'lo' END AS bucket
    FROM events
    """,
)
def json_projection(spark, sf_dir):
    """C7: json.loads + field-map projection (weibo/spiders/weibocn.py:31-43)
    → from_json + select."""
    ev = T(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k long").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, F.lit("hi")).otherwise(F.lit("lo")).alias("bucket"),
    )


@q(
    "weibo_field_map",
    """
    WITH j AS (
      SELECT event_id,
             '{"id": ' || user_id || ', "screen_name": "u' || user_id
               || '", "verified": ' || CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END
               || ', "followers_count": ' || (event_id % 1000)
               || ', "statuses_count": ' || (event_id % 500) || '}' AS payload
      FROM events)
    SELECT event_id,
           CAST(payload->>'id' AS BIGINT) AS uid,
           payload->>'screen_name' AS nickname,
           CAST(payload->>'verified' AS BOOLEAN) AS verified,
           CAST(payload->>'followers_count' AS BIGINT) AS fans,
           CAST(payload->>'statuses_count' AS BIGINT) AS weibos
    FROM j
    """,
)
def weibo_field_map(spark, sf_dir):
    """C7 at full depth: the weibo user field_map projection
    (weibo/spiders/weibocn.py:31-43) — from_json + rename-select over JSON
    synthesized identically on both engines."""
    ev = T(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"id": '), F.col("user_id").cast("string"),
        F.lit(', "screen_name": "u'), F.col("user_id").cast("string"),
        F.lit('", "verified": '),
        F.when(F.col("user_id") % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit(', "followers_count": '), (F.col("event_id") % 1000).cast("string"),
        F.lit(', "statuses_count": '), (F.col("event_id") % 500).cast("string"),
        F.lit("}"),
    )
    j = ev.select("event_id", payload.alias("payload"))
    projected = j.select("event_id", *parse.project_weibo_user(F.col("payload")))
    return projected.select("event_id", "uid", "nickname", "verified", "fans", "weibos")


_CITIES = ["北京", "上海", "广州", "深圳", "成都", "武汉", "杭州", "南京", "天津", "苏州"]
_PINYIN = ["beijing", "shanghai", "guangzhou", "shenzhen", "chengdu",
           "wuhan", "hangzhou", "nanjing", "tianjin", "suzhou"]


@q(
    "pinyin_city_urls",
    "SELECT doc_id, CASE doc_id % 10 "
    + " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(_CITIES)
    )
    + " END AS city, 'https://hotel.meituan.com/' || CASE doc_id % 10 "
    + " ".join(
        f"WHEN {i} THEN '{p}'" for i, p in enumerate(_PINYIN)
    )
    + " END || '/' AS url FROM documents",
)
def pinyin_city_urls(spark, sf_dir):
    """C12: the reference's pinyin city-URL synthesis
    (Meituan/spiders/meituan.py:42 ``'https://hotel.meituan.com/' +
    ''.join(lazy_pinyin(city)) + '/'``) — transliteration via the built-in
    city table (pypinyin takes over when installed; readings here are
    single-valued so both paths agree). Oracle maps city → pinyin
    explicitly."""
    from spider_spark import textops

    d = T(spark, sf_dir, "documents")
    city = F.element_at(
        F.array(*[F.lit(c) for c in _CITIES]), (F.col("doc_id") % 10 + 1).cast("int")
    )
    py = textops.transliterate_udf()(city)
    return d.select(
        "doc_id", city.alias("city"),
        F.concat(F.lit("https://hotel.meituan.com/"), py, F.lit("/")).alias("url"),
    )


@q(
    "sql_ddl_roundtrip",
    """
    SELECT doc_id, upper(source) AS src_up, n_chars
    FROM documents WHERE doc_id < 100
    """,
)
def sql_ddl_roundtrip(spark, sf_dir):
    """D6: SQL DDL + INSERT + read-back through the session catalog — the
    reference's MySQL table-create/insert sinks (拉钩 position tables;
    Meituan pipelines) as Spark SQL DDL over a parquet-backed catalog
    table. Exercises the pure-SQL API surface end-to-end: CREATE TEMP VIEW
    → CREATE TABLE USING parquet → INSERT OVERWRITE → SELECT."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _docs_v AS "
        f"SELECT * FROM parquet.`{sf_dir}/documents.parquet`"
    )
    loc = tempfile.mkdtemp(prefix="ddl_roundtrip_")
    spark.sql("DROP TABLE IF EXISTS lagou_positions")
    spark.sql(
        "CREATE TABLE lagou_positions (doc_id BIGINT, src_up STRING, n_chars BIGINT) "
        f"USING parquet LOCATION '{loc}/lagou_positions'"
    )
    spark.sql(
        "INSERT OVERWRITE TABLE lagou_positions "
        "SELECT doc_id, upper(source), n_chars FROM _docs_v WHERE doc_id < 100"
    )
    return spark.sql("SELECT doc_id, src_up, n_chars FROM lagou_positions")


_ZHIHU_ORACLE = """
    SELECT 'u' || doc_id::VARCHAR AS url_token,
           source || '-n' AS name,
           CASE WHEN doc_id % 2 = 0 THEN n_chars + 7 ELSE n_chars END AS answer_count,
           2::INT AS n_educations,
           'S' || (doc_id % 7)::VARCHAR AS first_school,
           '城市' || (doc_id % 13)::VARCHAR AS location0,
           'C' || (doc_id % 17)::VARCHAR AS company0,
           CASE WHEN doc_id % 2 = 0
                THEN (doc_id + 1)::VARCHAR || ',' || (doc_id + 2)::VARCHAR || ',' || (doc_id + 3)::VARCHAR
                ELSE (doc_id + 1)::VARCHAR || ',' || (doc_id + 2)::VARCHAR END AS follows
    FROM documents
"""


@q("zhihu_user_items", _ZHIHU_ORACLE)
def zhihu_user_items(spark, sf_dir):
    """The nested-array item family end-to-end (VERDICT r01 item 7):
    zhihuuser items.py:86-91 carries locations/educations/employments as
    raw JSON arrays-of-objects and zhihu.py:51-65 copy-projects every
    matching field; weibo/pipelines.py:74-82 merges relation arrays with
    $addToSet/$each and upserts scalars by id.

    Spark shape: synthesize two observation rounds of the user JSON per
    doc, parse ONCE with from_json into ArrayType(StructType) columns (C7,
    fully JVM-side), then D2 latest-wins window for scalars + D3 addToSet
    (flatten → array_distinct → array_sort) for the follows relation. The
    oracle reconstructs every planted value straight from documents."""
    did = F.col("doc_id")
    answer = F.when(F.col("round") == 2, F.col("n_chars") + 7).otherwise(F.col("n_chars"))
    follows = F.when(
        F.col("round") == 2,
        F.concat((did + 2).cast("string"), F.lit(","), (did + 3).cast("string")),
    ).otherwise(F.concat((did + 1).cast("string"), F.lit(","), (did + 2).cast("string")))
    js = F.concat(
        F.lit('{"url_token":"u'), did.cast("string"),
        F.lit('","name":"'), F.col("source"), F.lit('-n"'),
        F.lit(',"answer_count":'), answer.cast("string"),
        F.lit(',"gender":'), (did % 3).cast("string"),
        F.lit(',"locations":[{"name":"城市'), (did % 13).cast("string"), F.lit('"}]'),
        F.lit(',"educations":[{"school":"S'), (did % 7).cast("string"),
        F.lit('","major":"M'), (did % 5).cast("string"),
        F.lit('"},{"school":"S'), (did % 11).cast("string"),
        F.lit('","major":"M'), (did % 3).cast("string"), F.lit('"}]'),
        F.lit(',"employments":[{"company":"C'), (did % 17).cast("string"),
        F.lit('","job":"J'), (did % 5).cast("string"), F.lit('"}]'),
        F.lit(',"follows":['), follows, F.lit("]}"),
    )
    obs = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars", F.explode(F.array(F.lit(1), F.lit(2))).alias("round"))
        # round 2 re-observes only even users — odd users keep round-1 state
        .where((F.col("round") == 1) | (did % 2 == 0))
        .withColumn("js", js)
    )
    schema = (
        "url_token string, name string, answer_count long, gender long, "
        "locations array<struct<name:string>>, "
        "educations array<struct<school:string,major:string>>, "
        "employments array<struct<company:string,job:string>>, "
        "follows array<long>"
    )
    p = obs.select("round", F.from_json("js", schema).alias("u")).select("round", "u.*")
    w = Window.partitionBy("url_token").orderBy(F.desc("round"))
    latest = (
        p.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "url_token", "name", "answer_count",
            F.size("educations").alias("n_educations"),
            F.col("educations")[0]["school"].alias("first_school"),
            F.col("locations")[0]["name"].alias("location0"),
            F.col("employments")[0]["company"].alias("company0"),
        )
    )
    add_to_set = p.groupBy("url_token").agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("follows")))), ","
        ).alias("follows")
    )
    return latest.join(add_to_set, "url_token")


@q(
    "md5_ids",
    f"""
    SELECT doc_id, md5(text) AS text_md5, {textops.hash60_sql('text')} AS h60
    FROM documents
    """,
)
def md5_ids(spark, sf_dir):
    """C14: _id = md5(content) (mongo_redis_mgr.py:49) + the shared 60-bit
    integer hash used by the seen-set/minhash family."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5("text").alias("text_md5"), textops.hash60(F.col("text")).alias("h60"))


@q(
    "regex_extract_scan",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]*an[a-z]*'))::INT AS n_matches,
           coalesce(regexp_extract_all(text, '[a-z]*an[a-z]*')[1], '') AS first_match
    FROM documents
    """,
)
def regex_extract_scan(spark, sf_dir):
    """C4/C5: regex findall link/field discovery (client_crawler.py:139,
    lagou.py:29-36) as builtin regexp_extract_all."""
    d = T(spark, sf_dir, "documents")
    m = F.regexp_extract_all(F.col("text"), F.lit("[a-z]*an[a-z]*"), 0)
    return d.select(
        "doc_id",
        F.size(m).alias("n_matches"),
        F.coalesce(F.try_element_at(m, F.lit(1)), F.lit("")).alias("first_match"),
    )


def _html_escape(col):
    """&/</> escaping for planted HTML text (order matters: & first)."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def _qcc_expected_cols():
    """The planted qcc field values, as Spark exprs over documents columns.
    The oracle SQL reproduces these verbatim — the query output itself comes
    ONLY from DOM extraction, so a green hash proves extraction == planted."""
    did = F.col("doc_id")
    return {
        "company_name": F.concat(
            F.lit("公司"), did.cast("string"), F.lit(" & <"), F.col("source"), F.lit(">")
        ),
        "registered_capital": F.concat(F.col("n_chars").cast("string"), F.lit("万元")),
        "contributed_capital": F.concat(
            (F.col("n_chars") * 2).cast("string"), F.lit("万元")
        ),
        "management_forms": F.when(F.col("lang") == "en", F.lit("存续")).otherwise(
            F.lit("注销")
        ),
        "established_data": F.concat(
            (F.lit(1990) + did % 30).cast("string"),
            F.lit("-0"), (F.lit(1) + did % 9).cast("string"), F.lit("-11"),
        ),
        "credit_code": F.concat(
            F.lit("91"), F.lpad(did.cast("string"), 12, "0"), F.lit("XG")
        ),
        "address": F.concat(F.col("source"), F.lit("市"), F.substring("text", 1, 12)),
        "business_scope": F.concat(
            F.substring("text", 1, 20), F.lit(" & <"), F.col("source"), F.lit(">")
        ),
    }


_QCC_ORACLE = """
    SELECT doc_id,
           '公司' || doc_id::VARCHAR || ' & <' || source || '>' AS company_name,
           n_chars::VARCHAR || '万元' AS registered_capital,
           (n_chars * 2)::VARCHAR || '万元' AS contributed_capital,
           CASE WHEN lang = 'en' THEN '存续' ELSE '注销' END AS management_forms,
           (1990 + doc_id % 30)::VARCHAR || '-0' || (1 + doc_id % 9)::VARCHAR || '-11' AS established_data,
           '91' || lpad(doc_id::VARCHAR, 12, '0') || 'XG' AS credit_code,
           source || '市' || substr(text, 1, 12) AS address,
           substr(text, 1, 20) || ' & <' || source || '>' AS business_scope
    FROM documents
"""


@q("qcc_xpath_fields", _QCC_ORACLE)
def qcc_xpath_fields(spark, sf_dir):
    """C1/C2 structural parity: the reference's exact lxml XPath family
    (qcc.py:52-59 — ``//div[@class="row title"]/h1`` + 7×
    ``//table[@class="ntable"]//tr/td[contains(text(),"<label>")]/
    following-sibling::td[1]``) evaluated by the from-scratch DOM engine
    (dom.py) over deliberately MESSY html built from documents columns:
    mixed-case tags, attribute noise on the label cells, unclosed <tr>/<td>,
    entity-encoded values (& < >), a trailing <span> after the value text,
    and a decoy non-ntable table carrying the same labels with wrong values
    — every one of which defeats the round-1 regex surface. Output columns
    come ONLY from extraction; the oracle reconstructs the planted values
    from the raw columns."""
    exp = _qcc_expected_cols()
    esc = {k: _html_escape(v) for k, v in exp.items()}
    html = F.concat(
        F.lit('<HTML><Head><meta charset="utf-8"></head><BODY>'
              '<div class="decoy"><table class="other" width="50%">'
              "<tr><td>注册资本：</td><td>DECOY</td></tr></table></div>"
              '<div class="row title"><h1>'),
        esc["company_name"],
        F.lit('</h1><span class="tag">core</span></div>'
              '<div id="info"><TABLE width="100%" class="ntable">'
              '<tr><td width="20%">注册资本：</td><td>'),
        esc["registered_capital"],
        F.lit('<span class="tip">?</span><td class="lb">实缴资本：</td><td>'),
        esc["contributed_capital"],
        F.lit("<tr><td>经营状态：</td><td>"),
        esc["management_forms"],
        F.lit("</td><td>成立日期：</td><td>"),
        esc["established_data"],
        F.lit("</td></tr><tr><td>统一社会信用代码：</td><td>"),
        esc["credit_code"],
        F.lit("<tr><td>企业地址：</td><td>"),
        esc["address"],
        F.lit("<tr><td>经营范围：</td><td>"),
        esc["business_scope"],
        F.lit("</TABLE></div></BODY></html>"),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    fields = [(n, x) for n, x in parse.QCC_XPATH_FIELDS]
    p = parse.xpath_fields_udf(fields)(F.col("html"))
    return d.select("doc_id", p.alias("p")).select(
        "doc_id", *[F.col(f"p.{n}").alias(n) for n, _ in fields]
    )


_CSS_ORACLE = """
    SELECT doc_id,
           (doc_id % 223)::VARCHAR || '.' || ((doc_id * 7) % 256)::VARCHAR || '.' ||
           ((doc_id * 13) % 256)::VARCHAR || '.' || (1 + doc_id % 254)::VARCHAR AS ip,
           (1024 + doc_id % 48000)::VARCHAR AS port,
           lang AS proto
    FROM documents
"""


@q("css_select_fields", _CSS_ORACLE)
def css_select_fields(spark, sf_dir):
    """C3 pyquery parity: ProxyPool/proxypool/crawler.py:50-67,81 —
    ``td:nth-child(1)`` / ``td:nth-child(2)`` over an #ip_list table with a
    header row, ``.tbBottomLine:nth-child(1)``, and the ``find('p').remove()
    `` pre-strip (the ip cell carries a decoy <p> the way kuaidaili pages
    do). CSS evaluated by the from-scratch engine; oracle reconstructs the
    planted values."""
    did = F.col("doc_id")
    ip = F.concat(
        (did % 223).cast("string"), F.lit("."), ((did * 7) % 256).cast("string"),
        F.lit("."), ((did * 13) % 256).cast("string"), F.lit("."),
        (F.lit(1) + did % 254).cast("string"),
    )
    port = (F.lit(1024) + did % 48000).cast("string")
    html = F.concat(
        F.lit('<html><body><table id="ip_list" class="table">'
              "<tr><th>IP</th><th>PORT</th></tr><tr><td>"),
        ip,
        F.lit('<p class="tip">辅助</p></td><td>'),
        port,
        F.lit('</td></tr></table><div class="row"><span class="tbBottomLine">'),
        F.col("lang"),
        F.lit('</span><span class="tbBottomLine">x</span></div></body></html>'),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    p = parse.css_fields_udf(
        [
            ("ip", "#ip_list tr:nth-child(2) td:nth-child(1)"),
            ("port", "#ip_list tr:nth-child(2) td:nth-child(2)"),
            ("proto", "div.row .tbBottomLine:nth-child(1)"),
        ],
        strip="p",
    )(F.col("html"))
    return d.select("doc_id", p.alias("p")).select(
        "doc_id", F.col("p.ip").alias("ip"), F.col("p.port").alias("port"),
        F.col("p.proto").alias("proto"),
    )


_ANCHOR_ORACLE = """
    WITH links AS (
      SELECT doc_id,
             'https://h' || ((doc_id * 3 + j) % 20)::VARCHAR ||
             '.example.com/p/' || ((doc_id * 7 + j) % 97)::VARCHAR AS target,
             substr(text, 1 + 5 * j, 6) AS anchor
      FROM documents, (SELECT unnest([0, 1, 2]) AS j)
    )
    SELECT target,
           count(*)::BIGINT AS n_links,
           count(DISTINCT doc_id)::BIGINT AS n_src_docs,
           array_to_string((list_sort(list(DISTINCT anchor)))[1:50], '|') AS anchor_texts
    FROM links GROUP BY target
"""


@q("anchor_text_agg", _ANCHOR_ORACLE)
def anchor_text_agg(spark, sf_dir):
    """Anchor-text corpus op: extract every (href, anchor-text) pair from
    the DOM and aggregate the per-target link-context profile — inlink
    count, distinct linking docs, and the (capped, sorted) distinct anchor
    texts. The standard web-corpus signal built from crawl link structure
    (anchor text describes the TARGET page; used for ranking features and
    query-doc training pairs).

    Each doc plants three anchors whose text is an escaped slice of the
    doc's own text (entities round-trip through the DOM), plus a decoy
    href-less ``<a name=...>`` and an empty-href anchor that extraction
    must drop; output is built ONLY from extraction, the oracle replants
    from raw columns.

    Scale shape: extraction is an Arrow-batched map (no shuffle); the
    profile is webindex.anchor_profile's salted TWO-stage aggregation —
    bench_skew measured the naive one-shuffle groupBy at 1.8-2.2× wall
    under a 6%-hot-dst Zipf graph (collect_set state is unbounded before
    the shuffle; countDistinct expands), while the salted plan bounds
    per-reducer state at ≤50 anchors × n_salt at ANY in-degree and stays
    exactly equal to the naive result (see anchor_profile's proof)."""
    did = F.col("doc_id")

    def target(j):
        return F.concat(
            F.lit("https://h"), ((did * 3 + j) % 20).cast("string"),
            F.lit(".example.com/p/"), ((did * 7 + j) % 97).cast("string"),
        )

    def anchor(j):
        return _html_escape(F.substring("text", 1 + 5 * j, 6))

    html = F.concat(
        F.lit('<html><body><nav><a name="top">skip me</a><a href="">empty</a></nav>'),
        F.lit('<p><a href="'), target(0), F.lit('">'), anchor(0), F.lit("</a> "),
        F.lit('<a href="'), target(1), F.lit('">'), anchor(1), F.lit("</a></p>"),
        F.lit('<div><a href="'), target(2), F.lit('"><b>'), anchor(2),
        F.lit("</b></a></div></body></html>"),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    pair = F.explode(parse.anchor_pairs_udf()(F.col("html"))).alias("pair")
    pairs = d.select("doc_id", pair).select(
        "doc_id", F.col("pair.href").alias("target"),
        F.col("pair.anchor").alias("anchor"),
    )
    prof = webindex.anchor_profile(pairs, n_anchors=50)
    return prof.select(
        "target", "n_links", "n_src_docs",
        # Serialized (not ARRAY) because the driver's pandas-based
        # canonicalizer cannot hash list cells (CORRECTNESS_r02 err);
        # the array form stays exercised in tests/test_webindex.
        F.concat_ws("|", "anchor_texts").alias("anchor_texts"),
    )


@q(
    "string_cleanup",
    """
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')[1] AS first_word,
           length(replace(' ' || text || ' ', ' the ', ' '))::INT AS len_nothe,
           trim(upper(substr(text, 1, 10))) AS head_up
    FROM documents
    """,
)
def string_cleanup(spark, sf_dir):
    """C11: strip/split/replace chains (client_crawler.py:97, meituan.py:74)."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(textops.tokens_col(F.col("text")), 1).alias("first_word"),
        F.length(F.replace(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), F.lit(" the "), F.lit(" "))).alias("len_nothe"),
        F.trim(F.upper(F.substring(F.col("text"), 1, 10))).alias("head_up"),
    )


@q(
    "url_normalize",
    """
    SELECT doc_id,
           'https://' || lower(source) || '.example.com/Doc/' || doc_id || '?q=1' AS url_canon,
           lower(source) || '.example.com' AS host
    FROM documents
    """,
)
def url_normalize(spark, sf_dir):
    """C6: URL canonicalization (canon.py): lowercase scheme+host, drop
    default :443, strip #fragment, keep path case + query. The oracle states
    the expected output directly; the Spark side derives it through
    parse_url — a real parity check of the canonicalizer."""
    d = T(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.COM:443/Doc/"),
        F.col("doc_id").cast("string"), F.lit("?q=1#frag"),
    )
    return d.select(
        "doc_id",
        canonical_col(raw).alias("url_canon"),
        host_col(raw).alias("host"),
    )


@q(
    "robots_filter",
    """
    WITH u AS (
      SELECT doc_id,
             '/' || (CASE WHEN doc_id % 3 = 0 THEN 'private' ELSE 'p' END)
                 || '/' || doc_id AS path
      FROM documents)
    SELECT doc_id, path,
           CASE WHEN path LIKE '/private%' THEN 'denied' ELSE 'allowed' END AS verdict
    FROM u
    """,
)
def robots_filter(spark, sf_dir):
    """A13: robots deny filter — the engine's RFC 9309 longest-match
    verdict (robots.denied_col over compiled rules, the exact expression
    run_round applies against the broadcast host_policy) on synthetic
    paths. With a single prefix deny rule and no allow rules, longest-match
    reduces to the prefix test the oracle states."""
    from spider_spark import robots as R

    d = T(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("private")).otherwise(F.lit("p")),
        F.lit("/"), F.col("doc_id").cast("string"),
    )
    rules = [R.compile_rule("/private")]
    deny_rules = F.array(*[
        F.struct(F.lit(c["prefix"]).alias("prefix"),
                 F.lit(c["re"]).cast("string").alias("re"),
                 F.lit(c["ln"]).alias("ln"))
        for c in rules
    ])
    allow_rules = F.array().cast(R.RULES_TYPE)
    u = d.select("doc_id", path.alias("path"))
    denied = R.denied_col(F.col("path"), allow_rules, deny_rules)
    return u.select(
        "doc_id", "path",
        F.when(denied, F.lit("denied")).otherwise(F.lit("allowed")).alias("verdict"),
    )


@q(
    "robots_wildcard_match",
    """
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 4
                  WHEN 0 THEN '/cgi/' || doc_id::VARCHAR || '.php'
                  WHEN 1 THEN '/pub/' || doc_id::VARCHAR || '.php'
                  WHEN 2 THEN '/pub/files/' || doc_id::VARCHAR
                  ELSE '/open/' || doc_id::VARCHAR END AS path
      FROM documents),
    m AS (
      SELECT doc_id, path,
             greatest(
               CASE WHEN regexp_matches(path, '^/.*\\.php$') THEN 7 ELSE 0 END,
               CASE WHEN path LIKE '/pub/files%' THEN 10 ELSE 0 END) AS deny_len,
             greatest(
               CASE WHEN regexp_matches(path, '^/pub/.*\\.php$') THEN 11 ELSE 0 END,
               CASE WHEN path LIKE '/open%' THEN 5 ELSE 0 END) AS allow_len
      FROM u)
    SELECT doc_id, path,
           CASE WHEN deny_len > allow_len THEN 'denied' ELSE 'allowed' END AS verdict
    FROM m
    """,
)
def robots_wildcard_match(spark, sf_dir):
    """A13, RFC 9309 §2.2.2-2.2.3 wildcard + longest-match verdicts through
    the REAL engine path: raw Allow/Disallow patterns → compile_policy
    (pandas-compiled prefix/regex/length structs) → denied_col (the JVM
    expression run_round uses). Rules: deny ['/*.php$', '/pub/files'],
    allow ['/pub/*.php$', '/open'] — exercising wildcard deny beaten by a
    longer wildcard allow, literal-prefix deny, and no-match default. The
    oracle independently hand-compiles each rule to DuckDB regex/LIKE with
    its octet length and replays the longest-match comparison."""
    from spider_spark import robots as R

    d = T(spark, sf_dir, "documents")
    did = F.col("doc_id")
    path = (
        F.when(did % 4 == 0, F.concat(F.lit("/cgi/"), did.cast("string"), F.lit(".php")))
        .when(did % 4 == 1, F.concat(F.lit("/pub/"), did.cast("string"), F.lit(".php")))
        .when(did % 4 == 2, F.concat(F.lit("/pub/files/"), did.cast("string")))
        .otherwise(F.concat(F.lit("/open/"), did.cast("string")))
    )
    pol = spark.createDataFrame(
        [("h", 1.0, ["/pub/*.php$", "/open"], ["/*.php$", "/pub/files"], -1)],
        "host string, crawl_delay double, robots_allow array<string>, "
        "robots_deny array<string>, host_budget int",
    )
    u = d.select("doc_id", path.alias("path"), F.lit("h").alias("host"))
    j = u.join(F.broadcast(R.compile_policy(pol)), "host")
    denied = R.denied_col(F.col("path"), F.col("allow_rules"), F.col("deny_rules"))
    return j.select(
        "doc_id", "path",
        F.when(denied, F.lit("denied")).otherwise(F.lit("allowed")).alias("verdict"),
    )


_ROBOTS_ORACLE = """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 10.0 WHEN 1 THEN 2.5 ELSE 5.0 END AS crawl_delay,
           CASE doc_id % 4
                WHEN 1 THEN '/a' || doc_id::VARCHAR
                WHEN 2 THEN '/ok'
                ELSE '' END AS allow,
           CASE doc_id % 4
                WHEN 0 THEN '/private/'
                WHEN 1 THEN '/d' || doc_id::VARCHAR
                ELSE '' END AS deny
    FROM documents
"""


@q("robots_policy_parse", _ROBOTS_ORACLE)
def robots_policy_parse(spark, sf_dir):
    """A13 bootstrap: parse robots.txt BODIES into the host-policy table
    (robots.py — RFC 9309 subset: group selection with agent-over-*
    precedence, Allow/Disallow prefixes, Crawl-delay, comments, case
    mixing, empty-Disallow). Four planted body shapes: star-only group,
    specific-beats-star, messy casing/comments, empty file ⇒ defaults.
    Oracle reconstructs the expected policy per shape."""
    from spider_spark import robots as R

    did = F.col("doc_id")
    body = (
        F.when(did % 4 == 0, F.lit(
            "# generic\nUser-agent: *\nDisallow: /private/\nCrawl-delay: 10\n"))
        .when(did % 4 == 1, F.concat(
            F.lit("User-agent: *\nDisallow: /all/\n\nUser-agent: spider\nAllow: /a"),
            did.cast("string"),
            F.lit("\nDisallow: /d"), did.cast("string"),
            F.lit("\nCrawl-delay: 2.5\n")))
        .when(did % 4 == 2, F.lit(
            "# messy\nUSER-AGENT: SPIDER\nDisallow:\nAllow: /ok  # inline\n"))
        .otherwise(F.lit(""))
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("h"), did.cast("string")).alias("host"),
        body.alias("robots_txt"),
    )
    pol = R.policy_from_robots(d, agent="spider")
    return d.select("doc_id", "host").join(pol, "host").select(
        "doc_id", "crawl_delay",
        F.array_join("robots_allow", ",").alias("allow"),
        F.array_join("robots_deny", ",").alias("deny"),
    )


_SITEMAP_ORACLE = """
    SELECT doc_id,
           'https://s' || (doc_id % 7)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR AS url,
           (1990 + doc_id % 30)::VARCHAR || '-06-15' AS lastmod
    FROM documents
    UNION ALL
    SELECT doc_id,
           'https://s' || (doc_id % 7)::VARCHAR || '.example.com/q?a=' || doc_id::VARCHAR
             || '&b=' || (doc_id % 9)::VARCHAR AS url,
           NULL AS lastmod
    FROM documents
"""


@q("sitemap_seeds", _SITEMAP_ORACLE)
def sitemap_seeds(spark, sf_dir):
    """Sitemap ingestion (sitemaps.org urlset) → seed rows: two <url>
    entries per doc — one with <lastmod>, one with an entity-escaped query
    URL (&amp; must come back decoded) plus whitespace padding inside
    <loc>. Parsed by the DOM engine via sitemap.sitemap_entries_udf; the
    oracle reconstructs the planted values."""
    from spider_spark import sitemap as S

    did = F.col("doc_id")
    u1 = F.concat(F.lit("https://s"), (did % 7).cast("string"),
                  F.lit(".example.com/p/"), did.cast("string"))
    lastmod = F.concat((F.lit(1990) + did % 30).cast("string"), F.lit("-06-15"))
    u2_esc = F.concat(F.lit("https://s"), (did % 7).cast("string"),
                      F.lit(".example.com/q?a="), did.cast("string"),
                      F.lit("&amp;b="), (did % 9).cast("string"))
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>'), u1,
        F.lit("</loc><lastmod>"), lastmod, F.lit("</lastmod></url>"),
        F.lit("<url><loc> "), u2_esc, F.lit(" </loc></url></urlset>"),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(xml, "UTF-8").alias("sitemap_xml")
    )
    e = F.explode(S.sitemap_entries_udf()(F.col("sitemap_xml"))).alias("e")
    return d.select("doc_id", e).select(
        "doc_id", F.col("e.loc").alias("url"), F.col("e.lastmod").alias("lastmod")
    )


@q(
    "pagination_explode",
    """
    SELECT doc_id,
           'https://' || lower(source) || '.example.com/list?page=' || p AS page_url
    FROM documents, LATERAL unnest(generate_series(1, (doc_id % 5) + 1)) t(p)
    """,
)
def pagination_explode(spark, sf_dir):
    """B5: page-number pagination = URL synthesis via sequence + explode
    (scrapyseleniumtest taobao.py:13-17's page loop, declaratively)."""
    d = T(spark, sf_dir, "documents")
    pages = F.explode(F.sequence(F.lit(1), (F.col("doc_id") % 5 + 1).cast("int")))
    return d.select("doc_id", "source", pages.alias("p")).select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.lower("source"), F.lit(".example.com/list?page="),
            F.col("p").cast("string"),
        ).alias("page_url"),
    )


@q(
    "retry_budget",
    """
    SELECT event_id,
           CASE WHEN event_type != 'error' THEN 'done'
                WHEN (event_id % 3) + 1 >= 2 THEN 'failed'
                ELSE 'new' END AS status,
           CASE WHEN event_type = 'error' THEN (event_id % 3) + 1 ELSE 0 END AS attempt
    FROM events
    """,
)
def retry_budget(spark, sf_dir):
    """B6: retry-then-fail routing (MAX_PAGE_TRIED=2, client_crawler.py:362)
    — the same when-chain run_round uses for status updates."""
    ev = T(spark, sf_dir, "events")
    attempt = (F.col("event_id") % 3) + 1
    is_err = F.col("event_type") == "error"
    return ev.select(
        "event_id",
        F.when(~is_err, F.lit("done"))
        .when(attempt >= 2, F.lit("failed"))
        .otherwise(F.lit("new"))
        .alias("status"),
        F.when(is_err, attempt).otherwise(F.lit(0)).cast("long").alias("attempt"),
    )


@q(
    "coalesce_best_of",
    """
    SELECT user_id,
           round(coalesce(
             max(value) FILTER (WHERE event_type = 'purchase'),
             max(value) FILTER (WHERE event_type = 'click'),
             max(value) FILTER (WHERE event_type = 'view'),
             0.0), 6) AS best_value
    FROM events GROUP BY user_id
    """,
)
def coalesce_best_of(spark, sf_dir):
    """F6: best-of-N source coalesce (Kline_analyze.py:88-110 okex→binance→
    huobi fallback) as conditional aggregates + coalesce."""
    ev = T(spark, sf_dir, "events")
    pick = lambda t: F.max(F.when(F.col("event_type") == t, F.col("value")))  # noqa: E731
    return ev.groupBy("user_id").agg(
        F.round(
            F.coalesce(pick("purchase"), pick("click"), pick("view"), F.lit(0.0)), 6
        ).alias("best_value")
    )


@q(
    "orderbook_pick",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
               FROM documents)
    SELECT doc_id, w[1] AS best_bid, w[-1] AS best_ask, len(w)::INT AS depth
    FROM t
    """,
)
def orderbook_pick(spark, sf_dir):
    """F7: order-book head/tail pick (get_market_info.py:38-44: bids[0],
    asks[-1]) — element_at ±1 over an array column."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("w"))
    return toks.select(
        "doc_id",
        F.try_element_at(F.col("w"), F.lit(1)).alias("best_bid"),
        F.try_element_at(F.col("w"), F.lit(-1)).alias("best_ask"),
        F.size("w").alias("depth"),
    )


@q(
    "list_projection",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
               FROM documents)
    SELECT doc_id,
           array_to_string(list_transform(w[1:5], x -> upper(x)), ',') AS head_upper,
           len(list_filter(w, x -> length(x) > 4))::INT AS n_long
    FROM t
    """,
)
def list_projection(spark, sf_dir):
    """C13: list comprehension projections (weibo/pipelines.py:46
    ``[pic['url'] for pic in pictures]``) as higher-order array functions."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("w"))
    return toks.select(
        "doc_id",
        F.concat_ws(",", F.transform(F.slice("w", 1, 5), lambda x: F.upper(x))).alias("head_upper"),
        F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long"),
    )


