"""Unicode-correct edit-distance parity: snm_near_dup and
doc_edit_distance_pairs must agree with their DuckDB oracles on a
corpus containing CJK and diacritic text, with distances counted in
CODEPOINTS (Spark semantics), not bytes (DuckDB levenshtein's native
unit) — the oracle's codepoint-relabel CTE closes the gap."""

from __future__ import annotations

import duckdb
import pytest

from tomasz_weight_tracker_spark.plans import REGISTRY


@pytest.fixture(scope="module")
def cjk_docs_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cjkdocs"))
    rows = [
        # CJK near-dup pair: one codepoint differs ('語' vs '誤' — a
        # 1-codepoint, 1-byte-tail substitution that byte-counting
        # would still get right; '処理' vs '管理' adds a clean
        # 1-codepoint/3-byte case) — same normalized prefix block.
        (0, "日本語 テスト 文書 サンプル データ 処理 エンジン 検証", "ja", "cjk", 0),
        (1, "日本誤 テスト 文書 サンプル データ 管理 エンジン 検証", "ja", "cjk", 0),
        # Diacritics pair: é/e, ü/u, ß survive vs strip — codepoint
        # distance is 3, the old ASCII-strip path saw distance 0.
        (2, "café résumé münchen straße gemeinsamer anhang text", "de", "eu", 0),
        (3, "cafe resume munchen strasse gemeinsamer anhang text", "de", "eu", 0),
        # Plain ASCII near-dup pair (the regression guard).
        (4, "plain ascii document body with shared prefix tail one", "en", "eu", 0),
        (5, "plain ascii document body with shared prefix tail two", "en", "eu", 0),
        # Empty + whitespace-only docs (tokenizer/edge guard).
        (6, "", "en", "eu", 0),
        (7, "   ", "en", "eu", 0),
        # Mixed-script doc, no partner (must not pair with anything).
        (8, "混合 mixed スクリプト content 999", "ja", "cjk", 0),
        # Turkish UPPERCASE with U+0130 İ — Java FULL case mapping
        # lowers İ to 'i'+U+0307 while utf8proc's simple mapping gives
        # plain 'i'; portable_lower folds İ->i first so both engines
        # agree (round-10 advice fix).
        (9, "İSTANBUL ŞEHİR NÜFUS RAPORU GENEL ÖZET BİR", "tr", "tr", 0),
        (10, "İSTANBUL ŞEHİR NÜFUS RAPORU GENEL ÖZET İKİ", "tr", "tr", 0),
        # Greek UPPERCASE with word-final Σ — full mapping emits
        # contextual ς, simple mapping always σ; same fold closes it.
        (11, "ΑΘΗΝΑ ΚΕΝΤΡΙΚΗ ΟΔΟΣ ΑΡΙΘΜΟΣ ΕΝΑ ΤΕΛΟΣ", "el", "el", 0),
        (12, "ΑΘΗΝΑ ΚΕΝΤΡΙΚΗ ΟΔΟΣ ΑΡΙΘΜΟΣ ΔΥΟ ΤΕΛΟΣ", "el", "el", 0),
    ]
    rows = [(i, t, lg, s, len(t)) for (i, t, lg, s, _) in rows]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{root}/documents.parquet")
    return root


def _duck(root: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{root}/documents.parquet/*.parquet')"
    )
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ["snm_near_dup", "doc_edit_distance_pairs"])
def test_unicode_parity(spark, cjk_docs_dir, name):
    q = REGISTRY[name]
    sdf = q.build(spark, cjk_docs_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = _duck(cjk_docs_dir)
    cur = con.execute(q.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert _canon(srows, sdf.columns) == _canon(orows, ocols)
    assert srows, f"{name} found no pairs on the fixture corpus"


def test_distances_are_codepoint_counted(spark, cjk_docs_dir):
    rows = {
        (r.id_a, r.id_b): r.edit_dist
        for r in REGISTRY["doc_edit_distance_pairs"].build(spark, cjk_docs_dir).collect()
    }
    # CJK pair: two single-codepoint substitutions within the 40-char
    # head -> distance 2 (byte counting would report 1+3=4... or more).
    assert rows[(0, 1)] == 2
    # Diacritics vs ASCII-folded: é->e, é->e, ü->u, ß->ss plus the
    # window shift the extra 's' causes at the 40-codepoint cut = 7
    # (recomputed with a reference codepoint DP).
    assert rows[(2, 3)] == 7
    # ASCII near-dup pair: 'one' vs 'two' -> 3 edits... but the heads
    # are 40-codepoint prefixes; the differing tail falls at the cut.
    assert (4, 5) in rows

    # Full-vs-simple case-mapping pairs: the expected distances are
    # recomputed here with the SAME fold the engines apply (translate
    # İ->i, Σ->σ, then lower — Python's str.lower is full-mapping like
    # Java's, so the pre-fold is what makes it portable), proving the
    # engine output matches an independent codepoint DP.
    import re

    def head(t):
        t = t.translate(str.maketrans("İΣ", "iσ"))
        return re.sub(r"[^\w ]", "", t.lower(), flags=re.UNICODE)[:40]

    tr = _py_lev(
        head("İSTANBUL ŞEHİR NÜFUS RAPORU GENEL ÖZET BİR"),
        head("İSTANBUL ŞEHİR NÜFUS RAPORU GENEL ÖZET İKİ"),
    )
    el = _py_lev(
        head("ΑΘΗΝΑ ΚΕΝΤΡΙΚΗ ΟΔΟΣ ΑΡΙΘΜΟΣ ΕΝΑ ΤΕΛΟΣ"),
        head("ΑΘΗΝΑ ΚΕΝΤΡΙΚΗ ΟΔΟΣ ΑΡΙΘΜΟΣ ΔΥΟ ΤΕΛΟΣ"),
    )
    assert rows[(9, 10)] == tr
    assert rows[(11, 12)] == el


# ---------------------------------------------------------------------------
# Property: the relabel CTE preserves codepoint edit distance exactly.


def _py_lev(a: str, b: str) -> int:
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        m[i][0] = i
    for j in range(len(b) + 1):
        m[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = min(
                m[i - 1][j] + 1,
                m[i][j - 1] + 1,
                m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return m[-1][-1]


def test_relabel_overflow_fails_loudly():
    """>54 distinct non-ASCII codepoints must ERROR, not silently
    delete overflow codepoints from the relabeled head (round-10
    advice fix)."""
    from tomasz_weight_tracker_spark.functions import (
        LEV_FREE_BYTES,
        sql_codepoint_relabel,
    )

    n = len(LEV_FREE_BYTES) + 1
    head = "".join(chr(0x4E00 + i) for i in range(n))
    con = duckdb.connect()
    con.execute("CREATE TABLE t0(doc_id BIGINT, head VARCHAR)")
    con.execute("INSERT INTO t0 VALUES (0, ?)", [head])
    q = (
        "WITH t0x AS (SELECT doc_id, head FROM t0)"
        + sql_codepoint_relabel("t0x", "t")
        + " SELECT head FROM t"
    )
    with pytest.raises(Exception, match="relabel alphabet exhausted"):
        con.execute(q).fetchall()
    con.close()


def test_relabel_distance_equals_codepoint_dp_property():
    from hypothesis import given, settings, strategies as st

    from tomasz_weight_tracker_spark.functions import sql_codepoint_relabel

    alphabet = "ab1 日本語誤テスト文書éüß漢字中文한국"  # mixed 1–3 byte codepoints

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.text(alphabet=alphabet, min_size=0, max_size=12),
            min_size=2,
            max_size=5,
        )
    )
    def check(heads):
        con = duckdb.connect()
        con.execute("CREATE TABLE t0(doc_id BIGINT, head VARCHAR)")
        con.executemany(
            "INSERT INTO t0 VALUES (?, ?)", list(enumerate(heads))
        )
        q = (
            "WITH t0x AS (SELECT doc_id, head FROM t0)"
            + sql_codepoint_relabel("t0x", "t")
            + """
            SELECT a.doc_id, b.doc_id, levenshtein(a.head, b.head)
            FROM t a JOIN t b ON a.doc_id < b.doc_id
            ORDER BY 1, 2
            """
        )
        got = con.execute(q).fetchall()
        ref = [
            (i, j, _py_lev(heads[i], heads[j]))
            for i in range(len(heads))
            for j in range(i + 1, len(heads))
        ]
        assert got == ref
        con.close()

    check()
