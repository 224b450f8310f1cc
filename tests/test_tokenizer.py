"""Golden tokenizer tests mirroring /root/reference/src/tokenizer.rs:278-390."""

from stractt_spark.functions.tokenizer import (
    split_identifier,
    term_freqs,
    term_positions,
    tokenize_ascii,
    tokenize_code,
    tokenize_identity,
    tokenize_normal,
    tokenize_simple,
)


def test_simple_plain_words():
    # tokenizer.rs: "this is a relatively simple123 test string"
    assert tokenize_simple("this is a relatively simple123 test    string") == [
        "this", "is", "a", "relatively", "simple123", "test", "string",
    ]


def test_simple_punctuation_single_char_tokens():
    # tokenizer.rs tests :294-324
    assert tokenize_simple("example.com") == ["example", ".", "com"]
    assert tokenize_simple("a c++ blog post") == ["a", "c", "+", "+", "blog", "post"]
    assert tokenize_simple("path/test") == ["path", "/", "test"]


def test_simple_unicode_classes():
    # Han / Hiragana / Cyrillic / Arabic are word chars (runs), like the
    # reference lexer classes
    assert tokenize_simple("天気 です") == ["天気", "です"]
    assert tokenize_simple("привет мир") == ["привет", "мир"]
    assert tokenize_simple("مرحبا") == ["مرحبا"]


def test_normal_lowercases_and_stops():
    assert tokenize_normal("Foo.BAR") == ["foo", ".", "bar"]
    assert tokenize_normal("the Foo", stopwords=frozenset({"the"})) == ["foo"]


def test_ascii_matches_simple_on_ascii():
    s = 'fn parse_config(x: &str) -> Result<Cfg> { x.split(".") }'
    assert tokenize_ascii(s) == tokenize_normal(s)


def test_identity():
    assert tokenize_identity("Hello world.COM") == ["Hello world.COM"]


def test_split_identifier():
    assert split_identifier("parseHTTPResponse_fast") == ["parse", "http", "response", "fast"]
    assert split_identifier("camelCase") == ["camel", "case"]
    assert split_identifier("snake_case_x9") == ["snake", "case", "x9"]
    assert split_identifier("__dunder__") == ["dunder"]
    assert split_identifier("ALLCAPS") == ["allcaps"]


def test_code_tokenizer_drops_punct_splits_idents():
    assert tokenize_code("readFileBuffer(docTable)") == [
        "read", "file", "buffer", "doc", "table",
    ]
    assert tokenize_code("x -> y_count", stopwords=frozenset({"y"})) == ["x", "count"]
    # underscore-only token survives as nothing after split
    assert tokenize_code("_") == []


def test_term_freqs_positions():
    toks = ["a", "b", "a", ".", "a"]
    assert term_freqs(toks) == {"a": 3, "b": 1, ".": 1}
    assert term_positions(toks) == {"a": [0, 2, 4], "b": [1], ".": [3]}


def test_sql_token_pattern_parity_formfeed_vtab(spark):
    """One token-pattern constant everywhere: a \\f/\\v-bearing document
    must tokenize identically via Python _ASCII_RE, Spark regexp_extract_all
    and DuckDB regexp_extract_all (the three engines of the oracle gate)."""
    import duckdb

    from stractt_spark.functions.tokenizer import SQL_TOKEN_PATTERN, tokenize_ascii

    text = "alpha\fbeta\vgamma \t del_ta\r\nx+y\f\v z"
    py = tokenize_ascii(text)
    row = spark.createDataFrame([(text,)], "t string").selectExpr(
        f"regexp_extract_all(lower(t), '{SQL_TOKEN_PATTERN}', 0) AS toks"
    ).collect()[0]
    assert list(row["toks"]) == py
    duck = duckdb.connect()
    dres = duck.execute(
        "SELECT regexp_extract_all(lower(?), ?)", [text, SQL_TOKEN_PATTERN]
    ).fetchone()[0]
    assert list(dres) == py
    assert "\f" not in py and "\v" not in py
