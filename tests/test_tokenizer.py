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


def test_simple_greek_hebrew_accented_runs():
    # Greek/Hebrew/accented Latin are \w in regex-syntax (which Logos
    # compiles the reference class through), so they are RUN-class in both
    # engines — the reference's whatlang→Snowball stemming design
    # (tokenizer.rs:24-47,139-155) only works if accented Latin lexes as
    # word runs, which pins \w there to the Unicode definition.
    assert tokenize_simple("αλφα βητα") == ["αλφα", "βητα"]
    assert tokenize_simple("שלום עולם") == ["שלום", "עולם"]
    assert tokenize_simple("schön año élan") == ["schön", "año", "élan"]
    # mixed scripts in one string: each run is one token, punctuation alone
    assert tokenize_simple("get_data(αλφα).解析") == [
        "get_data", "(", "αλφα", ")", ".", "解析",
    ]


def test_simple_literal_pipe_is_word_class():
    # The reference Logos class [\w|\p{Han}|...] contains LITERAL '|'
    # characters (class syntax has no alternation), so "a|b" is ONE token
    # there (tokenizer.rs:206) — and now here.
    assert tokenize_simple("a|b") == ["a|b"]
    assert tokenize_simple("x || y") == ["x", "||", "y"]
    assert tokenize_normal("A|B c") == ["a|b", "c"]


def test_simple_skip_set_is_exact():
    # Reference skip set is exactly [ \t\n\f]+ (tokenizer.rs:210-211):
    # \r, \v and Unicode spaces are NOT skipped — they hit the Error arm
    # and are emitted as single-char tokens consuming a position.
    assert tokenize_simple("a \t\n\f b") == ["a", "b"]
    assert tokenize_simple("a\r\nb") == ["a", "\r", "b"]
    assert tokenize_simple("a\vb") == ["a", "\v", "b"]
    assert tokenize_simple("a b") == ["a", " ", "b"]
    # positions shift accordingly (Error tokens consume positions)
    assert term_positions(tokenize_simple("a\r\nb")) == {
        "a": [0], "\r": [1], "b": [2],
    }


def test_normal_lowercases_after_lexing():
    # The reference LowerCaser is a TOKEN filter (lex original text, then
    # lowercase each token).  'İ'.lower() adds a combining dot (U+0307,
    # not \w) — lowering first would split the token; lowering per token
    # keeps it whole.
    assert tokenize_normal("İstanbul") == ["i̇stanbul"]
    assert len(tokenize_normal("İstanbul")) == 1


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
