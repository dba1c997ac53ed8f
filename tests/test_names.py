from lagoon_spark.ingest.names import avoid_special_chars, no_dup_names, sanitize


def test_sanitize_basic():
    assert avoid_special_chars("hello") == "hello"
    assert avoid_special_chars("") == "_"
    assert avoid_special_chars("1abc") == "_1abc"
    assert avoid_special_chars("name with spaces") == "name_with_spaces"
    assert avoid_special_chars("some symbols > and $") == "some_symbols___and__"
    assert avoid_special_chars("_ok") == "_ok"


def test_sanitize_unicode_letters_kept():
    # Data.Char.isLetter accepts unicode letters; digits are ASCII-only
    assert avoid_special_chars("中文abc") == "中文abc"


def test_dup_headers_fixture_f8():
    # headers foo,Foo,bar,baz,BAR,baZ → foo, Foo_1, bar, baz, BAR_1, baZ_1
    got = no_dup_names(["foo", "Foo", "bar", "baz", "BAR", "baZ"])
    assert got == ["foo", "Foo_1", "bar", "baz", "BAR_1", "baZ_1"]


def test_dedup_cascades():
    assert no_dup_names(["a", "a", "a"]) == ["a", "a_1", "a_2"]
    # sanitized collision: 'a b' and 'a_b' both sanitize to a_b
    assert no_dup_names(["a b", "a_b"]) == ["a_b", "a_b_1"]


def test_truncation_preserves_suffix():
    long = "x" * 100
    out = no_dup_names([long, long], max_id_len=10)
    assert out[0] == "x" * 10
    assert out[1] == "x" * 8 + "_1"
    assert len(out[1]) == 10


def test_sanitize_keeps_capitalization():
    assert sanitize("MyColumn") == "MyColumn"
