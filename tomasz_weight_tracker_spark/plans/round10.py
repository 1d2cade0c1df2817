"""Round-10 catalog queries.

1) The three SURVEY rows the round-9 verdict listed as
   pytest-only coverage gaps, now under the value-hash gate via the
   pathbound pattern (derive deterministic file-shaped inputs from the
   gate tables, run the REAL production code path, oracle recomputes
   closed-form):

   - ``inferred_csv_roundtrip`` (S2): literal inferSchema CSV scan;
   - ``html_table_extract`` (S8): <table> rows out of real HTML files
     through the binaryFile + mapInPandas parser;
   - ``report_render_lines`` (S12): the grouped text report rendered,
     written through the text sink, read back line-exact.

2) URL-granularity dedup — the standard pretraining stage (C4/CCNet
   dedup at URL level before content dedup) the catalog lacked:
   ``url_canonical_dedup`` and ``url_domain_profile``.

Reference parity anchors: utils/loose_thoughts_TD2.py:41-60 (HTML
tables), utils/loose_thoughts.py:121-133 (report sink),
utils/20251223-csv-for-duckdb.py (read_csv_auto).  URL canonicalization
follows the C4 paper's preprocessing (Raffel et al. 2020) +
common-crawl practice; it is an extension, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load, register, sql_dsum, dsum

# ===========================================================================
# S2: inferSchema CSV round-trip
# ===========================================================================

_INFCSV_ORACLE = f"""
    SELECT o_orderstatus,
           count(*)::BIGINT AS n,
           sum(o_orderkey)::BIGINT AS sum_key,
           sum(o_custkey)::BIGINT AS sum_cust,
           {sql_dsum('o_totalprice')} AS sum_price,
           min(o_orderdate::DATE) AS min_date,
           max(o_orderdate::DATE) AS max_date,
           sum(CASE WHEN month(o_orderdate) = 3 THEN 1 ELSE 0 END)::BIGINT
               AS n_march
    FROM orders
    GROUP BY o_orderstatus
"""


@register(
    "inferred_csv_roundtrip",
    _INFCSV_ORACLE,
    survey_ids=("S2", "G13"),
    doc="The literal inferSchema CSV scan (sources/csv_normalized.py:"
    "inferred_csv_scan — the reference's read_csv_auto mode, "
    "utils/20251223-csv-for-duckdb.py) under the value gate: a CSV "
    "twin of orders is written to scratch with DELIBERATELY messy "
    "headers (leading/trailing spaces, a '(calibrated ...)' "
    "annotation — the S4 normalizer's diet), read back through the "
    "inference path, and aggregated per order status.  Every agg arm "
    "PROVES a type inference: sum_key/sum_cust need integer columns, "
    "sum_price a double, min/max/month(o_orderdate) a temporal type — "
    "a column left as string nulls or errors the arm, so a wrong "
    "inference cannot hash-match the oracle reading the ORIGINAL "
    "parquet.  Scale shape: the CSV write/scan are full-width but "
    "one-pass; the aggregate is map-side combined on status.",
)
def q_inferred_csv_roundtrip(spark, sf_dir):
    from ..session import fixed_scratch_dir
    from ..sources.csv_normalized import inferred_csv_scan

    orders = load(spark, sf_dir, "orders")
    path = f"{fixed_scratch_dir('infcsv')}/orders_csv"
    (
        orders.select(
            F.col("o_orderkey").alias("o_orderkey"),
            F.col("o_custkey").alias(" o_custkey "),
            F.col("o_orderstatus").alias("o_orderstatus"),
            F.col("o_totalprice").alias("o_totalprice(calibrated -0.1 deg C)"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )
    df = inferred_csv_scan(spark, path)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.sum("o_custkey").cast("long").alias("sum_cust"),
        dsum("o_totalprice").alias("sum_price"),
        F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
        F.sum(
            F.when(F.month("o_orderdate") == 3, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_march"),
    )


# ===========================================================================
# S8: HTML table extraction over real files
# ===========================================================================

_N_HTML_FILES = 16

_HTMLTBL_ORACLE = f"""
    WITH e AS (
        SELECT event_id, event_type, user_id, event_id % {_N_HTML_FILES} AS r
        FROM events
    ),
    data_rows AS (
        SELECT 'tbl_' || r::VARCHAR || '.html' AS fname,
               0::BIGINT AS table_idx,
               row_number() OVER (PARTITION BY r ORDER BY event_id)::BIGINT
                   AS row_idx,
               3::BIGINT AS n_cells,
               event_id::VARCHAR || ' | ' || event_type || ' | ' ||
                   (user_id % 100)::VARCHAR AS row_text
        FROM e
    ),
    header_rows AS (
        SELECT DISTINCT 'tbl_' || r::VARCHAR || '.html' AS fname,
               0::BIGINT AS table_idx, 0::BIGINT AS row_idx,
               3::BIGINT AS n_cells,
               'id | type | u' AS row_text
        FROM e
    ),
    extra_rows AS (
        SELECT DISTINCT 'tbl_' || r::VARCHAR || '.html' AS fname,
               1::BIGINT AS table_idx, 0::BIGINT AS row_idx,
               1::BIGINT AS n_cells,
               'second table ' || r::VARCHAR AS row_text
        FROM e WHERE r % 3 = 0
    )
    SELECT * FROM data_rows
    UNION ALL SELECT * FROM header_rows
    UNION ALL SELECT * FROM extra_rows
"""


@register(
    "html_table_extract",
    _HTMLTBL_ORACLE,
    survey_ids=("S8", "P9"),
    doc="S8 (utils/loose_thoughts_TD2.py:41-60) under the value gate: "
    f"{_N_HTML_FILES} REAL .html files are derived from the events "
    "table (one per event_id residue; rows carry ragged whitespace "
    "and a <th> header the parser must normalize; every third file "
    "holds a SECOND table for table_idx), written to scratch, and "
    "parsed through the production path — binaryFile scan + "
    "mapInPandas HTML state machine "
    "(pipelines/jobsearch.py:extract_html_tables).  The oracle "
    "recomputes every (file, table, row) closed-form from events.  "
    "Driver boundedness: the file materialization collects exactly "
    f"{_N_HTML_FILES} pre-aggregated rows (one per file — bounded by "
    "construction, not by data volume); the PARSE runs distributed.  "
    "At 100 TB the files come from a crawl store and the same "
    "binaryFile-glob plan applies per shard.",
)
def q_html_table_extract(spark, sf_dir):
    from pathlib import Path

    from ..pipelines.jobsearch import extract_html_tables
    from ..session import fixed_scratch_dir

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    r = F.col("event_id") % _N_HTML_FILES
    # Ragged whitespace inside cells: the parser's whitespace
    # normalization (' '.join(split())) must collapse it.
    row_html = F.concat(
        F.lit("<tr><td>  "),
        F.col("event_id").cast("string"),
        F.lit("\n</td><td> "),
        F.col("event_type"),
        F.lit(" </td><td>"),
        (F.col("user_id") % 100).cast("string"),
        F.lit("</td></tr>"),
    )
    per_file = (
        ev.groupBy(r.alias("r"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("event_id"), row_html.alias("h")))
                    ),
                    lambda x: x["h"],
                ),
                "",
            ).alias("rows_html")
        )
        .select(
            "r",
            F.concat(
                F.lit("<html><body><h1>not a table</h1><table>"),
                F.lit("<tr><th>id</th><th> type </th><th>u</th></tr>"),
                F.col("rows_html"),
                F.lit("</table>"),
                F.when(
                    F.col("r") % 3 == 0,
                    F.concat(
                        F.lit("<p>between</p><table><tr><td>second  table "),
                        F.col("r").cast("string"),
                        F.lit("</td></tr></table>"),
                    ),
                ).otherwise(F.lit("")),
                F.lit("</body></html>"),
            ).alias("html"),
        )
    )
    root = Path(fixed_scratch_dir("htmltbl"))
    # Bounded collect: exactly _N_HTML_FILES rows by construction.
    for row in per_file.collect():
        (root / f"tbl_{row.r}.html").write_text(row.html, encoding="utf-8")
    out = extract_html_tables(spark, f"{root}/*.html")
    return out.select(
        F.regexp_extract("path", r"(tbl_\d+\.html)$", 1).alias("fname"),
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.size("cells").cast("long").alias("n_cells"),
        "row_text",
    )


# ===========================================================================
# S12: text-report sink, line-exact
# ===========================================================================


def _report_oracle() -> str:
    from .pathbound import _BLOCK_ORACLE

    # The surviving-block relation is block_capture's oracle verbatim
    # (shared CTE text — the two gates cannot drift); the report is
    # rebuilt closed-form: groups keyed by the block's first line,
    # snapshots DESC within group, groups by first-snapshot date DESC
    # then key ASC, 4 lines per snapshot + header + trailing blank,
    # global line numbers via running group sizes.
    # Keep only the CTE chain (everything before the final SELECT):
    # the QUALIFY dedup is replayed inside `snaps` below.
    ctes = _BLOCK_ORACLE.strip().removeprefix("WITH")
    cut = ctes.rindex("SELECT file_label, block_date, group_key, n_lines")
    ctes = ctes[:cut].rstrip()
    return f"""
    WITH {ctes},
    snaps AS (
        SELECT file_label, block_date, group_key,
               string_split(signature, chr(31)) AS ls,
               signature
        FROM (SELECT * FROM allb QUALIFY row_number() OVER (
                  PARTITION BY signature
                  ORDER BY file_label, block_date) = 1)
    ),
    g AS (
        SELECT group_key, max(block_date) AS group_date,
               count(*)::BIGINT AS n_snap
        FROM snaps GROUP BY group_key
    ),
    go AS (
        SELECT *,
               coalesce(sum(2 + 4 * n_snap) OVER (
                   ORDER BY group_date DESC, group_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS goff
        FROM g
    ),
    so AS (
        SELECT s.*, go.goff,
               row_number() OVER (
                   PARTITION BY s.group_key
                   ORDER BY s.block_date DESC, s.file_label DESC,
                            s.signature DESC)::BIGINT AS srn
        FROM snaps s JOIN go USING (group_key)
    ),
    lines AS (
        SELECT goff AS line_no,
               '## ' || group_key || '  (' || group_date::VARCHAR || ')'
                   AS line
        FROM go
        UNION ALL
        SELECT goff + 1 + 4 * (srn - 1), '- [' || file_label || ']' FROM so
        UNION ALL
        SELECT goff + 2 + 4 * (srn - 1), '  ' || ls[1] FROM so
        UNION ALL
        SELECT goff + 3 + 4 * (srn - 1), '  ' || ls[2] FROM so
        UNION ALL
        SELECT goff + 4 + 4 * (srn - 1), '  ' || ls[3] FROM so
        UNION ALL
        SELECT goff + 1 + 4 * n_snap, '' FROM go
    )
    SELECT line_no::BIGINT AS line_no, line FROM lines
    """


@register(
    "report_render_lines",
    _report_oracle(),
    survey_ids=("S12", "O3", "P6"),
    doc="S12 (utils/loose_thoughts.py:121-133) under the value gate: "
    "block_capture's MIME corpus (shared blob builder — "
    "pathbound.mime_blobs) runs the production chain extract -> "
    "dedup -> grouped_report -> render_report -> write_text_report, "
    "the written file is read back, and every (line_no, line) must "
    "hash-match the oracle's closed-form reconstruction of the "
    "report — group headers, snapshot labels, indented block lines, "
    "blank separators, global line numbering.  The render/sink is "
    "driver-side BY CONTRACT (reports are human-scale; max_groups "
    "caps the collect — pipelines/jobsearch.py:render_report), so "
    "the gate here is line-exactness of the sink format, with the "
    "heavy lifting (parse, dedup, group, sort) distributed upstream.",
)
def q_report_render_lines(spark, sf_dir):
    from pathlib import Path

    from ..pipelines.jobsearch import (
        dedup_blocks,
        extract_blocks,
        grouped_report,
        render_report,
    )
    from ..session import fixed_scratch_dir
    from ..sources.writers import write_text_report
    from .pathbound import mime_blobs

    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    blocks = dedup_blocks(extract_blocks(mime_blobs(ev)))
    grouped = grouped_report(blocks, descending=True)
    # <= 91 groups by construction (50 'Job k' + 41 'Role m' keys).
    lines = render_report(grouped, max_groups=1000)
    out = Path(fixed_scratch_dir("report")) / "report.txt"
    write_text_report(lines, out)
    read_back = out.read_text(encoding="utf-8").splitlines()
    return spark.createDataFrame(
        list(enumerate(read_back)), "line_no long, line string"
    )


# ===========================================================================
# URL-granularity dedup (C4/CCNet's first dedup stage)
# ===========================================================================

# Messy-URL synthesis from doc_id (closed-form on both engines): mixed
# scheme/host case, optional www., default and non-default ports,
# duplicate slashes, /index.html and trailing-slash variants, tracking
# params in shuffled order, fragments.  Distinct raw URLs collapse to
# one canonical form exactly when they differ only in canonicalizable
# parts — which the residue classes arrange in volume.

_TWO_LEVEL_SUFFIXES = ("co.uk", "com.au", "co.jp", "org.uk", "ac.uk")
_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid)="


def _url_gen_spark(h):
    scheme = F.when(h % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("https://"))
    www = F.when(h % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    host = F.concat(
        F.lit("Example"),
        (h % 7).cast("string"),
        F.when(h % 5 == 0, F.lit(".CO.UK")).otherwise(F.lit(".COM")),
    )
    port = (
        F.when(h % 11 == 0, F.lit(":8080"))
        .when((h % 4 == 0) & (h % 2 == 0), F.lit(":80"))
        .when((h % 4 == 1) & (h % 2 == 1), F.lit(":443"))
        .otherwise(F.lit(""))
    )
    base_path = F.concat(F.lit("/articles//item-"), (h % 13).cast("string"))
    path = (
        F.when(h % 6 == 0, F.concat(base_path, F.lit("/")))
        .when(h % 6 == 1, F.concat(base_path, F.lit("/index.html")))
        .otherwise(base_path)
    )
    idq = (h % 17).cast("string")
    query = (
        F.when(h % 8 == 0, F.concat(F.lit("?utm_source=feed&id="), idq, F.lit("&utm_campaign=x")))
        .when(h % 8 == 1, F.concat(F.lit("?id="), idq, F.lit("&fbclid=abc")))
        .when(h % 8 == 2, F.lit("?b=2&a=1"))
        .when(h % 8 == 3, F.lit("?a=1&b=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(h % 9 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(scheme, www, host, port, path, query, frag)


def _url_gen_sql(h="doc_id"):
    return f"""
        (CASE WHEN {h} % 2 = 0 THEN 'HTTP://' ELSE 'https://' END) ||
        (CASE WHEN {h} % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        'Example' || ({h} % 7)::VARCHAR ||
        (CASE WHEN {h} % 5 = 0 THEN '.CO.UK' ELSE '.COM' END) ||
        (CASE WHEN {h} % 11 = 0 THEN ':8080'
              WHEN {h} % 4 = 0 AND {h} % 2 = 0 THEN ':80'
              WHEN {h} % 4 = 1 AND {h} % 2 = 1 THEN ':443'
              ELSE '' END) ||
        '/articles//item-' || ({h} % 13)::VARCHAR ||
        (CASE WHEN {h} % 6 = 0 THEN '/'
              WHEN {h} % 6 = 1 THEN '/index.html' ELSE '' END) ||
        (CASE WHEN {h} % 8 = 0
                  THEN '?utm_source=feed&id=' || ({h} % 17)::VARCHAR || '&utm_campaign=x'
              WHEN {h} % 8 = 1 THEN '?id=' || ({h} % 17)::VARCHAR || '&fbclid=abc'
              WHEN {h} % 8 = 2 THEN '?b=2&a=1'
              WHEN {h} % 8 = 3 THEN '?a=1&b=2'
              ELSE '' END) ||
        (CASE WHEN {h} % 9 = 0 THEN '#section-2' ELSE '' END)"""


def url_canonicalize(url):
    """Canonical dedup key of a raw URL, all native Column expressions:
    fragment dropped; scheme dropped from the KEY (http/https treated
    equal for dedup — C4-style); authority lowercased, leading 'www.'
    and default ports (:80/:443) stripped, other ports kept; path
    double-slashes collapsed, trailing '/index.html' and trailing
    slashes stripped, empty -> '/'; tracking params (utm_*, fbclid,
    gclid) dropped and survivors SORTED.  One projection, no UDF."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    auth = F.lower(F.regexp_extract(nofrag, "^[A-Za-z]+://([^/?#]+)", 1))
    auth = F.regexp_replace(auth, "^www\\.", "")
    auth = F.regexp_replace(auth, ":(80|443)$", "")
    path = F.regexp_extract(nofrag, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/index\\.html$", "")
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(nofrag, "\\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda x: ~x.rlike(_TRACKING_RE),
        )
    )
    query = F.when(
        (rawq == "") | (F.size(params) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(params, "&")))
    return F.concat(auth, path, query)


def sql_url_canonicalize(url_expr):
    """DuckDB twin of :func:`url_canonicalize` (identical pipeline)."""
    nofrag = f"regexp_replace({url_expr}, '#.*$', '')"
    auth = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({nofrag}, "
        f"'^[A-Za-z]+://([^/?#]+)', 1)), '^www\\.', ''), ':(80|443)$', '')"
    )
    path = (
        f"regexp_replace(regexp_replace(regexp_replace("
        f"regexp_extract({nofrag}, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1), "
        f"'/{{2,}}', '/', 'g'), '/index\\.html$', ''), '/+$', '')"
    )
    path = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    rawq = f"regexp_extract({nofrag}, '\\?([^#]*)', 1)"
    params = (
        f"list_sort(list_filter(string_split({rawq}, '&'), "
        f"x -> NOT regexp_matches(x, '{_TRACKING_RE}')))"
    )
    query = (
        f"(CASE WHEN {rawq} = '' OR len({params}) = 0 THEN '' "
        f"ELSE '?' || array_to_string({params}, '&') END)"
    )
    return f"({auth} || {path} || {query})"


def registered_domain(canon):
    """Registered domain off the canonical key: last 2 host labels, or
    3 when the last two form a known two-level public suffix (small
    built-in set — the full PSL is a data file swap, same plan)."""
    host = F.regexp_replace(F.regexp_extract(canon, "^([^/?]+)", 1), ":\\d+$", "")
    labels = F.split(host, "\\.")
    last2 = F.concat(
        F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
    )
    return F.when(
        (F.size(labels) >= 3) & last2.isin(*_TWO_LEVEL_SUFFIXES),
        F.concat(F.element_at(labels, -3), F.lit("."), last2),
    ).otherwise(last2)


def sql_registered_domain(canon):
    host = (
        f"regexp_replace(regexp_extract({canon}, '^([^/?]+)', 1), ':\\d+$', '')"
    )
    labels = f"string_split({host}, '.')"
    last2 = f"({labels}[-2] || '.' || {labels}[-1])"
    suf = ", ".join(f"'{s}'" for s in _TWO_LEVEL_SUFFIXES)
    return (
        f"(CASE WHEN len({labels}) >= 3 AND {last2} IN ({suf}) "
        f"THEN {labels}[-3] || '.' || {last2} ELSE {last2} END)"
    )


_URL_CTES = f"""
    WITH raw AS (
        SELECT doc_id, {_url_gen_sql("doc_id")} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, url, {sql_url_canonicalize("url")} AS curl FROM raw
    )"""


@register(
    "url_canonical_dedup",
    _URL_CTES
    + """
    SELECT curl AS canonical_url,
           min(doc_id)::BIGINT AS kept_doc_id,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT url)::BIGINT AS n_raw_urls
    FROM canon GROUP BY curl
    """,
    survey_ids=("A6", "A7", "G3"),
    doc="URL-granularity dedup — the FIRST dedup stage of a C4/CCNet "
    "pretraining pipeline, run before any content dedup: messy crawl "
    "URLs (mixed case, www., default ports, doubled slashes, "
    "/index.html + trailing-slash variants, utm_*/fbclid/gclid "
    "params in shuffled order, fragments — synthesized closed-form "
    "per doc) are canonicalized in ONE native projection "
    "(url_canonicalize: regexp extract/replace + array filter/sort, "
    "no UDF) and collapsed keep-first per canonical key.  Output is "
    "one row per canonical URL with the kept doc and collapse "
    "counts.  Scale shape: a scan-side projection plus one keyed "
    "aggregation with map-side combine — the same single-shuffle "
    "profile as exact_dedup, at 100 TB the cheapest stage in the "
    "stack; the canonical key is computed once and reusable by the "
    "downstream content-dedup stages.",
)
def q_url_canonical_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    canon = docs.select(
        "doc_id",
        _url_gen_spark(F.col("doc_id")).alias("url"),
    ).withColumn("curl", url_canonicalize(F.col("url")))
    return canon.groupBy(F.col("curl").alias("canonical_url")).agg(
        F.min("doc_id").cast("long").alias("kept_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("url").cast("long").alias("n_raw_urls"),
    )


@register(
    "url_domain_profile",
    _URL_CTES
    + f""",
    dom AS (
        SELECT doc_id, curl, {sql_registered_domain("curl")} AS domain,
               regexp_extract(curl, '^([^/?]+)', 1) AS host
        FROM canon
    ),
    tot AS (SELECT count(*)::BIGINT AS n_total FROM dom)
    SELECT domain,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT curl)::BIGINT AS n_canonical,
           count(DISTINCT host)::BIGINT AS n_hosts,
           (count(*) * 1000000 // tot.n_total)::BIGINT AS share_ppm
    FROM dom CROSS JOIN tot
    GROUP BY domain, tot.n_total
    """,
    survey_ids=("A1", "A3"),
    doc="Per-registered-domain corpus profile over the canonical URL "
    "relation — the domain-skew input mixture design consumes "
    "(token_budget_mix / source_temperature_mix operate per source; "
    "this is the same accounting at web granularity): docs, distinct "
    "canonical URLs, distinct hosts, and integer-ppm corpus share "
    "per registered domain (last-2 host labels, or 3 over a "
    "two-level public suffix — the suffix set is a broadcast data "
    "file at production scale, identical plan).  Shape: the dedup "
    "projection + one domain-keyed aggregate; the total-count attach "
    "is a 1-row broadcast cross join, never a shuffle of the corpus.",
)
def q_url_domain_profile(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    canon = docs.select(
        "doc_id", _url_gen_spark(F.col("doc_id")).alias("url")
    ).withColumn("curl", url_canonicalize(F.col("url")))
    dom = canon.select(
        "doc_id",
        "curl",
        registered_domain(F.col("curl")).alias("domain"),
        F.regexp_extract("curl", "^([^/?]+)", 1).alias("host"),
    )
    tot = dom.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        dom.crossJoin(F.broadcast(tot))
        .groupBy("domain", "n_total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("curl").cast("long").alias("n_canonical"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
        )
        .select(
            "domain",
            "n_docs",
            "n_canonical",
            "n_hosts",
            ((F.col("n_docs") * 1000000) / F.col("n_total"))
            .cast("long")
            .alias("share_ppm"),
        )
    )


# ===========================================================================
# Rebuild on MAXIMAL excision regions (dedup-consumer integration)
# ===========================================================================


def _rebuild_maximal_oracle() -> str:
    from .round8b import _pspan_ctes

    # The excision-side twin of dup_passage_maximal's interval union,
    # in DOC-B coordinates (the doc being excised), collapsed across
    # ALL partners: regions are disjoint maximal intervals, so the
    # dropped-position relation needs no DISTINCT and n_dropped is the
    # plain sum of region widths.  kept_text must equal
    # dup_passage_rebuild's DISTINCT-position excision exactly.
    return (
        _pspan_ctes()
        + """, bint AS (
        SELECT id_b AS doc_id, b_start AS s, b_start + span_toks AS e,
               id_a, a_start
        FROM spans
    ), bu AS (
        -- (id_a, a_start) tiebreaks make the order TOTAL: brk and the
        -- running sum are SEPARATE window layers, and with duplicate
        -- (s, e) rows (one passage shared with many partners — the 10x
        -- replica corpus) the two sorts need not agree on tie order —
        -- rows the second sort placed before the flagged row got
        -- grp=0 and one island split in two (found at sf1, 18 docs
        -- with n_dropped = 2 x n_toks).
        SELECT doc_id, s, e, id_a, a_start,
               CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s, e, id_a, a_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS brk
        FROM bint
    ), bg AS (
        SELECT doc_id, s, e,
               sum(brk) OVER (PARTITION BY doc_id
                              ORDER BY s, e, id_a, a_start
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM bu
    ), reg AS (
        SELECT doc_id, min(s) AS s, max(e) AS e FROM bg GROUP BY doc_id, grp
    ), nreg AS (
        SELECT doc_id, count(*)::BIGINT AS n_regions,
               sum(e - s)::BIGINT AS n_dropped
        FROM reg GROUP BY doc_id
    ), dropped AS (
        SELECT doc_id, u.pos::BIGINT AS pos
        FROM reg, unnest(range(s, e)) AS u(pos)
    ), tok AS (
        SELECT t.doc_id, len(t.toks)::BIGINT AS n_toks,
               u.pos::BIGINT AS pos, t.toks[u.pos] AS tk
        FROM t JOIN nreg USING (doc_id),
             unnest(range(1, len(t.toks) + 1)) AS u(pos)
    )
    SELECT tok.doc_id, max(tok.n_toks) AS n_toks,
           max(nreg.n_dropped) AS n_dropped,
           max(nreg.n_regions) AS n_regions,
           coalesce(string_agg(tok.tk, ' ' ORDER BY tok.pos)
                        FILTER (WHERE d.pos IS NULL), '') AS kept_text
    FROM tok JOIN nreg USING (doc_id)
         LEFT JOIN dropped d ON tok.doc_id = d.doc_id AND tok.pos = d.pos
    GROUP BY tok.doc_id
    """
    )


@register(
    "dup_passage_rebuild_maximal",
    _rebuild_maximal_oracle(),
    survey_ids=("A7", "G2", "W1"),
    doc="dup_passage_rebuild CONSUMING maximal excision regions (the "
    "round-9 verdict's dedup-consumer integration): the span "
    "relation's b-side intervals are interval-unioned PER EXCISED "
    "DOC across all partners (dup_passage_maximal's islands trick in "
    "doc-B coordinates), so a passage duplicated at two offsets — or "
    "reported as overlapping diagonal fragments — excises ONCE: the "
    "regions are disjoint maximal intervals, the dropped-position "
    "explode needs no DISTINCT (the old rebuild's per-position dedup "
    "shuffle disappears), and n_dropped is the closed-form sum of "
    "region widths.  Output adds n_regions (contiguous excised "
    "regions per doc) for audit; kept_text is hash-checked to equal "
    "the DISTINCT-position rebuild exactly — union-then-excise-once "
    "== excise-with-dedup, per the oracle.  Plan: span plan -> one "
    "per-doc interval window (bounded by the doc's span count) -> "
    "bounded explode of disjoint regions -> the shared anti-join "
    "rebuild.",
)
def q_dup_passage_rebuild_maximal(spark, sf_dir):
    from pyspark.sql import Window

    from .round8b import _passage_spans

    spans = _passage_spans(spark, sf_dir)
    ivl = spans.select(
        F.col("id_b").alias("doc_id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("span_toks")).alias("e"),
        "id_a",
        "a_start",
    )
    # Total order via (id_a, a_start) tiebreaks — see the oracle's bu
    # comment: island determinism must not hinge on tie order.
    w = Window.partitionBy("doc_id").orderBy("s", "e", "id_a", "a_start")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_end.isNull() | (F.col("s") > prev_end), F.lit(1)).otherwise(
        F.lit(0)
    )
    grp = F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    regions = (
        ivl.withColumn("__brk", brk)
        .withColumn("__grp", grp)
        .groupBy("doc_id", "__grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        # Tiny (one row per excised region); read by three consumers
        # below, and materializing stops the span plan re-running.
        .localCheckpoint(eager=True)
    )
    nreg = regions.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_regions"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("n_dropped"),
    )
    # Regions are disjoint by construction: no DISTINCT needed.
    dropped = regions.select(
        "doc_id",
        F.explode(F.sequence(F.col("s"), F.col("e") - 1)).alias("pos"),
    )
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tok = (
        docs.join(nreg.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_toks"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks")),
                    lambda p: F.struct(
                        p.cast("long").alias("pos"),
                        F.element_at("toks", p.cast("int")).alias("tk"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "n_toks", "s.pos", "s.tk")
    )
    kept = (
        tok.join(dropped, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.max("n_toks").alias("n_toks_k"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tk"))),
                    lambda x: x["tk"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )
    base = tok.groupBy("doc_id").agg(F.max("n_toks").alias("n_toks"))
    return (
        base.join(nreg, "doc_id")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            "n_dropped",
            "n_regions",
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


# ===========================================================================
# Streaming URL dedup (keep-first ingestion fold)
# ===========================================================================

_STREAM_URL_BATCHES = 3


def make_url_dedup_batch(log):
    """The streaming_url_dedup foreachBatch sink, as a module-level
    factory so the chaos-replay test (tests/test_streaming_replay.py)
    drives the EXACT production sink twice with the same batch id."""

    def apply_batch(batch_df, _batch_id):
        canon = batch_df.select(
            "doc_id", _url_gen_spark(F.col("doc_id")).alias("url")
        ).select("doc_id", url_canonicalize(F.col("url")).alias("curl"))
        partial = canon.groupBy("curl").agg(
            F.min("doc_id").alias("min_doc"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        # Deterministic per-batch path + overwrite = IDEMPOTENT sink:
        # foreachBatch is only at-least-once, and a batch replayed
        # after a successful append but before the checkpoint commit
        # would double its cnt partials under a flat append log (the
        # min leg absorbs replay; the sum leg does not — round-10
        # ADVICE).  Overwriting batch=<id> makes replay a no-op.
        partial.write.mode("overwrite").parquet(f"{log}/batch={_batch_id}")

    return apply_batch


def url_dedup_fold(spark, log):
    """Drain fold for the url-dedup state log (min/sum per canonical
    key) — shared by the catalog query and the replay test."""
    return (
        spark.read.parquet(log)
        .groupBy(F.col("curl").alias("canonical_url"))
        .agg(
            F.min("min_doc").cast("long").alias("kept_doc_id"),
            F.sum("cnt").cast("long").alias("n_docs"),
        )
    )


@register(
    "streaming_url_dedup",
    _URL_CTES
    + """
    SELECT curl AS canonical_url,
           min(doc_id)::BIGINT AS kept_doc_id,
           count(*)::BIGINT AS n_docs
    FROM canon GROUP BY curl
    """,
    survey_ids=("ST1", "S11", "A6"),
    doc="URL-granularity dedup as STREAMING INGESTION — the crawl "
    "front-door shape: documents arrive as a file-source stream in "
    f"{_STREAM_URL_BATCHES} micro-batches (availableNow, "
    "maxFilesPerTrigger=1); each micro-batch canonicalizes its URLs "
    "(url_canonicalize — the same native projection as "
    "url_canonical_dedup, shared code) and appends per-batch PARTIAL "
    "aggregates (canonical key, min doc, count) to the state log; "
    "writes them to a DETERMINISTIC per-batch path with overwrite "
    "(foreachBatch sinks are at-least-once, so a replayed batch must "
    "be a no-op — append-only logs double the count partials on "
    "replay); the drained state folds the log with min/sum — both "
    "associative and commutative — and must hash-equal the ONE-SHOT "
    "keep-first oracle "
    "on the union corpus.  Per-batch state traffic is O(distinct "
    "keys in batch), never the corpus; the fold is the "
    "decomposable-aggregate discipline (incremental_agg_events) "
    "applied at the crawl's entry point, BEFORE content dedup ever "
    "sees a duplicate URL's bytes.",
)
def q_streaming_url_dedup(spark, sf_dir):
    from ..session import scratch_dir

    docs = load(spark, sf_dir, "documents").select("doc_id")
    root = scratch_dir("stream_url")
    src = f"{root}/src"
    log = f"{root}/state_log"
    for r in range(_STREAM_URL_BATCHES):
        docs.filter(F.col("doc_id") % _STREAM_URL_BATCHES == r).coalesce(
            1
        ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    apply_batch = make_url_dedup_batch(log)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_url_dedup drain timed out")
    return url_dedup_fold(spark, log)
