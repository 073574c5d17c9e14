import re

from pyspark.sql import functions as F

from idzebra_spark.functions.tokenizer import MAX_TOKEN_LEN, tokenize, tokenize_array


def _py_tokens(text: str) -> list[str]:
    """Reference tokenizer: the charmap contract from SURVEY.md §7/
    FIXTURES.md §2 (lowercase, split on non-alnum, cap 512)."""
    return [t[:MAX_TOKEN_LEN] for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


GOLDENS = [
    "Hello, World!",
    "",
    "   \n\t ",
    "foo_bar baz-qux 123abc ABC123",
    "int main(void) { return 0; }",
    'x = "a;b;c".split(";")',
    "a" * 600 + " tail",
    "Ünïcode søup émigré",   # non-ascii letters split (charmap is ascii)
    "a1 b2 c3 a1 a1",
    "(((nested)))((parens))",
]


def test_tokenize_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOLDENS)], ["doc_id", "text"]
    )
    got = (
        tokenize(df).orderBy("doc_id", "pos").groupBy("doc_id")
        .agg(F.collect_list("term").alias("terms"))
        .collect()
    )
    got_map = {r["doc_id"]: r["terms"] for r in got}
    for i, text in enumerate(GOLDENS):
        expected = _py_tokens(text)
        assert got_map.get(i, []) == expected, f"doc {i}: {text[:40]!r}"


def test_positions_are_dense_one_based(spark):
    df = spark.createDataFrame([(1, "a, b,, c  d")], ["doc_id", "text"])
    rows = tokenize(df).orderBy("pos").collect()
    assert [(r.term, r.pos) for r in rows] == [
        ("a", 1), ("b", 2), ("c", 3), ("d", 4)
    ]


def test_token_cap(spark):
    df = spark.createDataFrame([(1, "x" * 1000)], ["doc_id", "text"])
    [row] = df.select(tokenize_array(F.col("text")).alias("a")).collect()
    assert len(row.a) == 1 and len(row.a[0]) == MAX_TOKEN_LEN


def test_ascii_charmap_drops_non_latin_pinned(spark):
    """Documented limitation of the default charmap (string.chr has
    alphabet [0-9a-z]): non-Latin text yields NO tokens."""
    from idzebra_spark.functions.tokenizer import tokenize_array
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "данные Daten datos 数据"), (1, "abc défi")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", tokenize_array(F.col("text")).alias("toks")).collect()}
    assert rows[0] == ["daten", "datos"]       # Cyrillic/CJK dropped
    assert rows[1] == ["abc", "d", "fi"]       # é splits in ASCII mode


def test_unicode_charmap_keeps_letters(spark):
    from idzebra_spark.functions.tokenizer import tokenize_array
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "данные Daten datos 数据"), (1, "abc défi")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id",
        tokenize_array(F.col("text"), alphabet="unicode").alias("toks"),
    ).collect()}
    assert rows[0] == ["данные", "daten", "datos", "数据"]
    assert rows[1] == ["abc", "défi"]
