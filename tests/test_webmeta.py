"""Unit tests for the page-metadata / SURT-CDX / script-signal family
(clawrag_spark/operators/webtext.py) — the edge cases the entry-level
oracle fixtures don't construct: ports, www-stripping, missing paths,
absent head tags, all-zero script counts, duplicate-body digests.
"""

from pyspark.sql import functions as F

from clawrag_spark.operators import webtext as WT


def _one(spark, **cols):
    return spark.createDataFrame([cols])


# ------------------------------------------------------------- SURT


def test_surt_key_basic(spark):
    df = _one(spark, url="https://host001.example.com/s42/page/0000001")
    got = df.select(WT.surt_key(F.col("url")).alias("s")).first()["s"]
    assert got == "com,example,host001)/s42/page/0000001"


def test_surt_key_www_port_case_and_query(spark):
    df = _one(spark, url="http://www.Host01.Example.COM:8080/a/b?q=1&r=2")
    got = df.select(WT.surt_key(F.col("url")).alias("s")).first()["s"]
    assert got == "com,example,host01)/a/b?q=1&r=2"


def test_surt_key_no_path(spark):
    df = _one(spark, url="https://example.com")
    got = df.select(WT.surt_key(F.col("url")).alias("s")).first()["s"]
    assert got == "com,example)/"


def test_surt_domain_prefix_property(spark):
    # The reason SURT exists: every url of one registered domain shares
    # the key prefix "tld,domain," — range partitioning clusters them.
    rows = [
        ("https://a.shop.example.org/x",),
        ("https://shop.example.org/y",),
        ("https://example.org/",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    keys = [r["s"] for r in df.select(WT.surt_key(F.col("url")).alias("s")).collect()]
    assert all(k.startswith("org,example") for k in keys)


# ------------------------------------------------------------- CDX


def test_cdx_digest_shared_by_duplicate_bodies(spark):
    rows = [
        ("https://a.example.com/1", b"<html>same</html>"),
        ("https://b.example.com/2", b"<html>same</html>"),
        ("https://c.example.com/3", b"<html>other</html>"),
    ]
    df = spark.createDataFrame(rows, ["url", "html"]).withColumn(
        "warc_ts", F.to_timestamp(F.lit("2025-06-01 00:00:00"))
    )
    url_to_surt = df.select(
        "url", WT.surt_key(F.col("url")).alias("surt")
    )
    out = {
        r["url"]: (r["digest"], r["n_bytes"])
        for r in WT.cdx_index(df).join(url_to_surt, "surt").collect()
    }
    assert out["https://a.example.com/1"][0] == out["https://b.example.com/2"][0]
    assert out["https://a.example.com/1"][0] != out["https://c.example.com/3"][0]
    assert out["https://a.example.com/1"][1] == len(b"<html>same</html>")


# ------------------------------------------------- page metadata


def test_page_metadata_all_fields(spark):
    html = (
        "<html><head><title>My Page</title>"
        '<meta property="og:title" content="OG Title">'
        '<meta property="og:description" content="A desc">'
        '<link rel="canonical" href="https://x.example.com/p">'
        '<script type="application/ld+json">{"@context":"https://schema.org",'
        '"@type":"NewsArticle","headline":"h"}</script>'
        '<meta name="robots" content="noindex,nofollow">'
        "</head><body>body</body></html>"
    )
    r = WT.page_metadata(_one(spark, html_str=html)).first()
    assert r["title"] == "My Page"
    assert r["og_title"] == "OG Title"
    assert r["og_description"] == "A desc"
    assert r["canonical_url"] == "https://x.example.com/p"
    assert r["jsonld_type"] == "NewsArticle"
    assert r["noindex"] is True


def test_page_metadata_absent_fields(spark):
    r = WT.page_metadata(
        _one(spark, html_str="<html><head></head><body>no head tags</body></html>")
    ).first()
    assert r["title"] == "" and r["og_title"] == "" and r["canonical_url"] == ""
    assert r["jsonld_type"] is None
    assert r["noindex"] is False


def test_page_metadata_on_synthetic_corpus(spark, tmp_path):
    # Real fixture pages carry a <title>; extraction must recover it
    # from every complete utf-8 html page.
    from clawrag_spark.corpus import write_pages_parquet

    path = str(tmp_path / "pages.parquet")
    write_pages_parquet(path, 50)
    pages = spark.read.parquet(path)
    magic = b"<!DOCTYPE html>"
    html_pages = pages.filter(
        F.substring(F.col("html"), 1, len(magic)) == F.lit(magic)
    ).withColumn("html_str", F.col("html").cast("string"))
    out = WT.page_metadata(html_pages, "html_str")
    assert out.filter(F.col("title") == "").count() == 0
    # fixture heads carry no og tags — absence must not invent values
    assert out.filter(F.col("og_title") != "").count() == 0


# ------------------------------------------------- script signals


def test_script_signals_dominance_and_zero(spark):
    rows = [
        (1, "hello world plain latin"),
        (2, "Привет мир Привет мир xx"),
        (3, "你好世界你好世界 hi"),
        (4, "مرحبا بالعالم مرحبا"),
        (5, "12345 !!! ..."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in WT.script_signals(df, "doc_id", "text").collect()}
    assert got[1]["dominant_script"] == "latin" and got[1]["n_cyrillic"] == 0
    assert got[2]["dominant_script"] == "cyrillic"
    assert got[3]["dominant_script"] == "cjk"
    assert got[4]["dominant_script"] == "arabic"
    assert got[5]["dominant_script"] == "other"
    assert got[5]["n_latin"] == 0


def test_script_signals_tie_prefers_fixed_order(spark):
    # equal latin and cyrillic counts → 'latin' (first maximum in the
    # fixed latin→cyrillic→cjk→arabic order, both engines)
    df = spark.createDataFrame([(1, "abПр")], ["doc_id", "text"])
    r = WT.script_signals(df, "doc_id", "text").first()
    assert r["n_latin"] == r["n_cyrillic"] == 2
    assert r["dominant_script"] == "latin"


# ---------------------------------------------------- URL spam signals


def test_url_spam_clean_and_each_rule(spark):
    rows = [
        (1, "https://clean.example.com/a/b?x=1"),           # clean
        (2, "https://shop12345.example.com/x"),             # host digits
        (3, "https://a-b-c-d-e.example.com/x"),             # host hyphens
        (4, "https://h.example.com/" + "s/" * 70),          # path length
        (5, "https://h.example.com/a/b/c/d/e/f/g"),         # path depth
        (6, "https://h.example.com/x?a=1&b=2&c=3&d=4&e=5&f=6"),  # params
        (7, "https://noquery.example.com"),                 # no path/query
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {r["id"]: r for r in WT.url_spam_signals(df).collect()}
    assert got[1]["url_spam"] is False
    for i in range(2, 7):
        assert got[i]["url_spam"] is True, i
    assert got[7]["url_spam"] is False
    assert got[7]["n_params"] == 0 and got[7]["path_len"] == 0
    assert got[6]["n_params"] == 6
    assert got[5]["path_depth"] == 7


# ---------------------------------------------------- blocklist gating


def test_blocklist_hits_counts_and_zero_docs(spark):
    docs = spark.createDataFrame(
        [(1, "spam and more SPAM, spam!"), (2, "clean text here"), (3, "junk spam")],
        ["doc_id", "text"],
    )
    bl = spark.createDataFrame([("spam",), ("junk",)], ["term"])
    got = {r["doc_id"]: r for r in WT.blocklist_hits(docs, bl, "doc_id", "text").collect()}
    assert got[1]["n_bad_tokens"] == 3 and got[1]["n_bad_distinct"] == 1
    assert got[2]["n_bad_tokens"] == 0 and got[2]["n_bad_distinct"] == 0  # kept
    assert got[3]["n_bad_tokens"] == 2 and got[3]["n_bad_distinct"] == 2


def test_blocklist_join_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    bl = spark.createDataFrame([("a",)], ["term"])
    plan = WT.blocklist_hits(docs, bl, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------- table extraction


def test_extract_tables_rows_and_cells(spark):
    html = (
        "<html><body><table>"
        "<tr><td>a</td><td>b</td></tr>"
        "<tr><th>header only</th></tr>"
        "<tr><td>c 1</td><td>d 2</td><td>e</td></tr>"
        "</table></body></html>"
    )
    out = WT.extract_tables(_one(spark, url="u", html_str=html)).orderBy("row_idx")
    rows = out.collect()
    assert [r["row_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["cells"] == ["a", "b"]
    assert rows[1]["cells"] == []          # th-only row kept, empty cells
    assert rows[2]["cells"] == ["c 1", "d 2", "e"]


def test_extract_tables_no_table_page(spark):
    out = WT.extract_tables(_one(spark, url="u", html_str="<html><p>x</p></html>"))
    assert out.count() == 0
